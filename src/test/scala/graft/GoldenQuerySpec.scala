package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden-query corpus mirroring the reference's clientpositive suite
  * shapes (groupby1-8, join1-8, input*, cast1, sample*, udf*): each query
  * is expressed on BOTH engine tiers — SQL and DataFrame — and the results
  * must agree row-for-row. This is the §5 test-strategy adaptation: the
  * golden file is replaced by the second, independent formulation. */
class GoldenQuerySpec extends SparkSpec {

  private lazy val views: Unit = Tables.registerAll(spark, sfDir)

  private def check(name: String, sql: String, df: => DataFrame): Unit =
    test(name) {
      views
      val a = spark.sql(sql).collect().map(_.toSeq).toSet
      val b = df.collect().map(_.toSeq).toSet
      assert(a === b, s"SQL and DataFrame tiers disagree for $name")
      assert(a.nonEmpty)
    }

  check("groupby1: sum by key",
    "SELECT o_custkey, sum(o_totalprice) FROM orders GROUP BY o_custkey",
    Tables.orders(spark, sfDir).groupBy($"o_custkey")
      .agg(sum($"o_totalprice")))

  check("groupby2: count + sum with computed key (substr)",
    """SELECT substr(c_name, 10, 1), count(*), sum(c_acctbal)
      |FROM customer GROUP BY substr(c_name, 10, 1)""".stripMargin,
    Tables.customer(spark, sfDir)
      .groupBy(substring($"c_name", 10, 1))
      .agg(count(lit(1)), sum($"c_acctbal")))

  check("groupby5: group by with where",
    """SELECT o_orderpriority, count(*) FROM orders
      |WHERE o_totalprice > 150000 GROUP BY o_orderpriority""".stripMargin,
    Tables.orders(spark, sfDir).filter($"o_totalprice" > 150000)
      .groupBy($"o_orderpriority").agg(count(lit(1))))

  check("join2: chained join with computed key",
    """SELECT count(*) FROM orders a JOIN customer b ON a.o_custkey = b.c_custkey
      |JOIN nation c ON b.c_nationkey + 0 = c.n_nationkey""".stripMargin,
    Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .join(Tables.nation(spark, sfDir),
        $"c_nationkey" + 0 === $"n_nationkey")
      .agg(count(lit(1))))

  check("join outer with filter on outer side",
    """SELECT c.c_custkey, o.o_orderkey FROM customer c
      |LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
      |WHERE c.c_acctbal < 0""".stripMargin,
    Tables.customer(spark, sfDir).as("c")
      .join(Tables.orders(spark, sfDir).as("o"),
        $"c_custkey" === $"o_custkey", "left")
      .filter($"c_acctbal" < 0)
      .select($"c_custkey", $"o_orderkey"))

  check("input: select star subset with limit-free projection",
    "SELECT r_regionkey, r_name FROM region",
    Tables.region(spark, sfDir).select($"r_regionkey", $"r_name"))

  check("cast1: numeric/string conversions",
    """SELECT cast(o_orderkey AS STRING), cast(o_totalprice AS INT),
      |cast('3' AS DOUBLE), cast(o_orderkey AS DOUBLE) FROM orders""".stripMargin,
    Tables.orders(spark, sfDir).select(
      $"o_orderkey".cast("string"), $"o_totalprice".cast("int"),
      lit("3").cast("double"), $"o_orderkey".cast("double")))

  check("sample: deterministic bucket filter",
    "SELECT count(*) FROM lineitem WHERE l_orderkey % 11 = 3",
    Tables.lineitem(spark, sfDir).filter($"l_orderkey" % 11 === 3)
      .agg(count(lit(1))))

  check("udf: string function composition",
    """SELECT upper(concat(substr(c_name, 1, 8), '-', c_mktsegment))
      |FROM customer""".stripMargin,
    Tables.customer(spark, sfDir).select(
      upper(concat(substring($"c_name", 1, 8), lit("-"), $"c_mktsegment"))))

  check("distinct values of a join key",
    "SELECT DISTINCT n_regionkey FROM nation",
    Tables.nation(spark, sfDir).select($"n_regionkey").distinct())

  check("case when buckets",
    """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
      |  WHEN o_totalprice < 200000 THEN 'mid' ELSE 'large' END, count(*)
      |FROM orders GROUP BY 1""".stripMargin,
    Tables.orders(spark, sfDir)
      .groupBy(when($"o_totalprice" < 50000, "small")
        .when($"o_totalprice" < 200000, "mid").otherwise("large"))
      .agg(count(lit(1))))

  check("between and in-list predicates",
    """SELECT count(*) FROM lineitem
      |WHERE l_quantity BETWEEN 10 AND 20
      |  AND l_returnflag IN ('A', 'R')""".stripMargin,
    Tables.lineitem(spark, sfDir)
      .filter($"l_quantity".between(10, 20) &&
        $"l_returnflag".isin("A", "R"))
      .agg(count(lit(1))))

  check("coalesce over outer-join nulls",
    """SELECT c.c_custkey, coalesce(o.o_orderkey, -1)
      |FROM customer c LEFT JOIN orders o
      |ON c.c_custkey = o.o_custkey AND o.o_totalprice > 400000""".stripMargin,
    Tables.customer(spark, sfDir).as("c")
      .join(Tables.orders(spark, sfDir).as("o"),
        $"c_custkey" === $"o_custkey" && $"o_totalprice" > 400000, "left")
      .select($"c_custkey", coalesce($"o_orderkey", lit(-1L))))

  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): org.apache.spark.sql.Column = col(sc.s(args: _*))
  }
}
