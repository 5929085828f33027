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

  check("groupby3: sum/avg/avg-distinct/max/min over a derived numeric",
    """SELECT sum(cast(o_totalprice AS DECIMAL(18,2))),
      |  avg(cast(o_totalprice AS DECIMAL(18,2))),
      |  avg(DISTINCT cast(o_orderkey % 7 AS DECIMAL(18,2))),
      |  max(o_totalprice), min(o_totalprice)
      |FROM orders""".stripMargin,
    Tables.orders(spark, sfDir).agg(
      sum($"o_totalprice".cast("decimal(18,2)")),
      avg($"o_totalprice".cast("decimal(18,2)")),
      expr("avg(DISTINCT cast(o_orderkey % 7 AS DECIMAL(18,2)))"),
      max($"o_totalprice"), min($"o_totalprice")))

  check("groupby4: group by substr of a column",
    """SELECT substr(o_orderpriority, 1, 1), count(*)
      |FROM orders GROUP BY substr(o_orderpriority, 1, 1)""".stripMargin,
    Tables.orders(spark, sfDir)
      .groupBy(substring($"o_orderpriority", 1, 1)).agg(count(lit(1))))

  check("groupby6: select distinct substr",
    "SELECT DISTINCT substr(c_name, 1, 11) FROM customer",
    Tables.customer(spark, sfDir)
      .select(substring($"c_name", 1, 11)).distinct())

  check("groupby8: count(distinct) beside plain aggregates per key",
    """SELECT o_orderstatus, count(DISTINCT o_orderpriority), count(*),
      |  min(o_orderkey)
      |FROM orders GROUP BY o_orderstatus""".stripMargin,
    Tables.orders(spark, sfDir).groupBy($"o_orderstatus")
      .agg(count_distinct($"o_orderpriority"), count(lit(1)),
        min($"o_orderkey")))

  check("groupby1_limit: group by, order by, limit",
    """SELECT o_custkey, count(*) AS n FROM orders
      |GROUP BY o_custkey ORDER BY n DESC, o_custkey LIMIT 10""".stripMargin,
    Tables.orders(spark, sfDir).groupBy($"o_custkey")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"o_custkey").limit(10))

  check("join4: left outer join of two filtered subqueries",
    """SELECT a.c1, a.c2, b.c3, b.c4 FROM
      |  (SELECT o_orderkey AS c1, o_totalprice AS c2 FROM orders
      |   WHERE o_orderkey > 10 AND o_orderkey < 500) a
      |LEFT OUTER JOIN
      |  (SELECT o_orderkey AS c3, o_orderpriority AS c4 FROM orders
      |   WHERE o_orderkey > 300 AND o_orderkey < 700) b
      |ON a.c1 = b.c3""".stripMargin,
    Tables.orders(spark, sfDir)
      .filter($"o_orderkey" > 10 && $"o_orderkey" < 500)
      .select($"o_orderkey".as("c1"), $"o_totalprice".as("c2"))
      .join(Tables.orders(spark, sfDir)
          .filter($"o_orderkey" > 300 && $"o_orderkey" < 700)
          .select($"o_orderkey".as("c3"), $"o_orderpriority".as("c4")),
        $"c1" === $"c3", "left")
      .select($"c1", $"c2", $"c3", $"c4"))

  check("join6: full outer join of two filtered subqueries",
    """SELECT a.c1, b.c3 FROM
      |  (SELECT c_custkey AS c1 FROM customer WHERE c_custkey < 200) a
      |FULL OUTER JOIN
      |  (SELECT c_custkey AS c3 FROM customer
      |   WHERE c_custkey > 100 AND c_custkey < 300) b
      |ON a.c1 = b.c3""".stripMargin,
    Tables.customer(spark, sfDir).filter($"c_custkey" < 200)
      .select($"c_custkey".as("c1"))
      .join(Tables.customer(spark, sfDir)
          .filter($"c_custkey" > 100 && $"c_custkey" < 300)
          .select($"c_custkey".as("c3")),
        $"c1" === $"c3", "full")
      .select($"c1", $"c3"))

  check("join8: outer join nulls filtered back out",
    """SELECT a.c1, b.c3 FROM
      |  (SELECT c_custkey AS c1 FROM customer WHERE c_custkey < 200) a
      |LEFT OUTER JOIN
      |  (SELECT o_custkey AS c3 FROM orders WHERE o_totalprice > 300000) b
      |ON a.c1 = b.c3
      |WHERE b.c3 IS NOT NULL""".stripMargin,
    Tables.customer(spark, sfDir).filter($"c_custkey" < 200)
      .select($"c_custkey".as("c1"))
      .join(Tables.orders(spark, sfDir).filter($"o_totalprice" > 300000)
          .select($"o_custkey".as("c3")),
        $"c1" === $"c3", "left")
      .filter($"c3".isNotNull)
      .select($"c1", $"c3"))

  check("subq: aggregate over a subquery in FROM",
    """SELECT unioninput.okey, count(*) FROM
      |  (SELECT o_orderkey % 100 AS okey FROM orders
      |   WHERE o_totalprice > 100000) unioninput
      |GROUP BY unioninput.okey""".stripMargin,
    Tables.orders(spark, sfDir).filter($"o_totalprice" > 100000)
      .select(($"o_orderkey" % 100).as("okey"))
      .groupBy($"okey").agg(count(lit(1))))

  check("union: union all of two subqueries then aggregated",
    """SELECT src, count(*) FROM (
      |  SELECT 'o' AS src, o_custkey AS k FROM orders WHERE o_custkey < 500
      |  UNION ALL
      |  SELECT 'c' AS src, c_custkey AS k FROM customer WHERE c_custkey < 500
      |) u GROUP BY src""".stripMargin,
    Tables.orders(spark, sfDir).filter($"o_custkey" < 500)
      .select(lit("o").as("src"), $"o_custkey".as("k"))
      .union(Tables.customer(spark, sfDir).filter($"c_custkey" < 500)
        .select(lit("c").as("src"), $"c_custkey".as("k")))
      .groupBy($"src").agg(count(lit(1))))

  check("input_testxpath: array index, struct field, map key access",
    """SELECT t.a[1], t.s.mystring, t.m['key_2'] FROM
      |  (SELECT array(o_orderkey, o_custkey) AS a,
      |     named_struct('mystring', o_orderpriority) AS s,
      |     map('key_2', o_orderstatus) AS m
      |   FROM orders WHERE o_orderkey < 100) t""".stripMargin,
    Tables.orders(spark, sfDir).filter($"o_orderkey" < 100)
      .select(array($"o_orderkey", $"o_custkey").as("a"),
        struct($"o_orderpriority".as("mystring")).as("s"),
        map(lit("key_2"), $"o_orderstatus").as("m"))
      .select($"a".getItem(1), $"s".getField("mystring"),
        $"m".getItem("key_2")))

  check("input_testxpath2: collection sizes under null guards",
    """SELECT size(t.a), size(t.m) FROM
      |  (SELECT array(o_orderkey, o_custkey, o_custkey) AS a,
      |     map(o_orderstatus, o_totalprice) AS m
      |   FROM orders WHERE o_orderkey < 200) t
      |WHERE t.a IS NOT NULL AND NOT (t.m IS NULL)""".stripMargin,
    Tables.orders(spark, sfDir).filter($"o_orderkey" < 200)
      .select(array($"o_orderkey", $"o_custkey", $"o_custkey").as("a"),
        map($"o_orderstatus", $"o_totalprice").as("m"))
      .filter($"a".isNotNull && !$"m".isNull)
      .select(size($"a"), size($"m")))

  check("case_sensitivity: mixed-case identifiers resolve",
    "SELECT N_NAME, n_regionkey FROM nation WHERE N_NATIONKEY < 10",
    Tables.nation(spark, sfDir).filter($"n_nationkey" < 10)
      .select($"n_name", $"n_regionkey"))

  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): org.apache.spark.sql.Column = col(sc.s(args: _*))
  }
}
