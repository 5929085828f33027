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

  // --- round-6 corpus broadening: the shapes from the reference suite the
  // --- first 26 goldens left out (join2/join3 computed-key chains, join5/
  // --- join7/join9 outer-join nests, udf1-udf4 batteries, sample2-7 bucket
  // --- forms, subq2, input9/input11_limit/groupby2_limit)

  check("join2_exact: chained join keyed on the SUM of two joined keys",
    // join2.q: src1 JOIN src2 ON key equal, JOIN src3 ON (key1 + key2 = key3)
    """SELECT src1.o_orderkey, src3.o_orderpriority
      |FROM orders src1 JOIN orders src2 ON src1.o_orderkey = src2.o_orderkey
      |JOIN orders src3 ON src1.o_orderkey + src2.o_orderkey = src3.o_orderkey""".stripMargin,
    Tables.orders(spark, sfDir).as("src1")
      .join(Tables.orders(spark, sfDir).as("src2"),
        col("src1.o_orderkey") === col("src2.o_orderkey"))
      .join(Tables.orders(spark, sfDir).as("src3"),
        col("src1.o_orderkey") + col("src2.o_orderkey") === col("src3.o_orderkey"))
      .select(col("src1.o_orderkey"), col("src3.o_orderpriority")))

  check("join3: three-way join on the same key",
    """SELECT src1.o_custkey, src3.o_orderpriority
      |FROM orders src1 JOIN orders src2 ON src1.o_custkey = src2.o_custkey
      |JOIN orders src3 ON src1.o_custkey = src3.o_custkey
      |WHERE src1.o_orderkey < 100""".stripMargin,
    Tables.orders(spark, sfDir).as("src1")
      .join(Tables.orders(spark, sfDir).as("src2"),
        col("src1.o_custkey") === col("src2.o_custkey"))
      .join(Tables.orders(spark, sfDir).as("src3"),
        col("src1.o_custkey") === col("src3.o_custkey"))
      .filter(col("src1.o_orderkey") < 100)
      .select(col("src1.o_custkey"), col("src3.o_orderpriority")))

  check("join5: right outer join of two filtered subqueries",
    """SELECT a.c1, a.c2, b.c3, b.c4 FROM
      |  (SELECT o_orderkey AS c1, o_orderpriority AS c2 FROM orders
      |   WHERE o_orderkey > 10 AND o_orderkey < 500) a
      |RIGHT OUTER JOIN
      |  (SELECT o_orderkey AS c3, o_orderstatus AS c4 FROM orders
      |   WHERE o_orderkey > 300 AND o_orderkey < 700) b
      |ON a.c1 = b.c3""".stripMargin,
    Tables.orders(spark, sfDir)
      .filter($"o_orderkey" > 10 && $"o_orderkey" < 500)
      .select($"o_orderkey".as("c1"), $"o_orderpriority".as("c2"))
      .join(Tables.orders(spark, sfDir)
          .filter($"o_orderkey" > 300 && $"o_orderkey" < 700)
          .select($"o_orderkey".as("c3"), $"o_orderstatus".as("c4")),
        $"c1" === $"c3", "right")
      .select($"c1", $"c2", $"c3", $"c4"))

  check("join7: full outer then left outer over three filtered subqueries",
    """SELECT a.c1, a.c2, b.c3, b.c4, c.c5, c.c6 FROM
      |  (SELECT c_custkey AS c1, c_mktsegment AS c2 FROM customer
      |   WHERE c_custkey > 10 AND c_custkey < 200) a
      |FULL OUTER JOIN
      |  (SELECT c_custkey AS c3, c_mktsegment AS c4 FROM customer
      |   WHERE c_custkey > 150 AND c_custkey < 250) b ON a.c1 = b.c3
      |LEFT OUTER JOIN
      |  (SELECT c_custkey AS c5, c_mktsegment AS c6 FROM customer
      |   WHERE c_custkey > 200 AND c_custkey < 250) c ON a.c1 = c.c5""".stripMargin,
    Tables.customer(spark, sfDir)
      .filter($"c_custkey" > 10 && $"c_custkey" < 200)
      .select($"c_custkey".as("c1"), $"c_mktsegment".as("c2"))
      .join(Tables.customer(spark, sfDir)
          .filter($"c_custkey" > 150 && $"c_custkey" < 250)
          .select($"c_custkey".as("c3"), $"c_mktsegment".as("c4")),
        $"c1" === $"c3", "full")
      .join(Tables.customer(spark, sfDir)
          .filter($"c_custkey" > 200 && $"c_custkey" < 250)
          .select($"c_custkey".as("c5"), $"c_mktsegment".as("c6")),
        $"c1" === $"c5", "left")
      .select($"c1", $"c2", $"c3", $"c4", $"c5", $"c6"))

  check("join9: join with the filter applied in the select-where (input9 shape)",
    """SELECT src1.l_orderkey, src2.o_orderpriority
      |FROM lineitem src1 JOIN orders src2 ON src1.l_orderkey = src2.o_orderkey
      |WHERE src1.l_returnflag = 'R' AND src2.o_orderstatus = 'F'""".stripMargin,
    Tables.lineitem(spark, sfDir).as("src1")
      .join(Tables.orders(spark, sfDir).as("src2"),
        col("l_orderkey") === col("o_orderkey"))
      .filter($"l_returnflag" === "R" && $"o_orderstatus" === "F")
      .select($"l_orderkey", $"o_orderpriority"))

  check("subq2: where-filter on the group key of an aggregate subquery",
    """SELECT a.k, a.c FROM
      |  (SELECT b.o_custkey AS k, count(1) AS c FROM orders b
      |   GROUP BY b.o_custkey) a
      |WHERE a.k >= 90 AND a.k < 200""".stripMargin,
    Tables.orders(spark, sfDir).as("b")
      .groupBy($"o_custkey".as("k")).agg(count(lit(1)).as("c"))
      .filter($"k" >= 90 && $"k" < 200)
      .select($"k", $"c"))

  check("udf1: LIKE / RLIKE / REGEXP_REPLACE battery",
    """SELECT 'a' LIKE '%a%', 'b' LIKE '%a%', 'ab' LIKE '%a%', 'ab' LIKE '%a_',
      |  'ab' LIKE '_a%', 'ab' LIKE 'a',
      |  '' RLIKE '.*', 'a' RLIKE '[ab]', '' RLIKE '[ab]',
      |  'hadoop' RLIKE '[a-z]*', 'hadoop' RLIKE 'o*',
      |  REGEXP_REPLACE('abc', 'b', 'c'), REGEXP_REPLACE('abc', 'z', 'a'),
      |  REGEXP_REPLACE('abbbb', 'bb', 'b'),
      |  REGEXP_REPLACE('hadoop', '(.)[a-z]*', '$1ive')
      |FROM region WHERE r_regionkey = 0""".stripMargin,
    Tables.region(spark, sfDir).filter($"r_regionkey" === 0)
      .select(lit("a").like("%a%"), lit("b").like("%a%"),
        lit("ab").like("%a%"), lit("ab").like("%a_"),
        lit("ab").like("_a%"), lit("ab").like("a"),
        lit("").rlike(".*"), lit("a").rlike("[ab]"), lit("").rlike("[ab]"),
        lit("hadoop").rlike("[a-z]*"), lit("hadoop").rlike("o*"),
        regexp_replace(lit("abc"), "b", "c"),
        regexp_replace(lit("abc"), "z", "a"),
        regexp_replace(lit("abbbb"), "bb", "b"),
        regexp_replace(lit("hadoop"), "(.)[a-z]*", "$1ive")))

  check("udf2: trim / rtrim / ltrim battery",
    """SELECT '|', trim('  abc  '), '|', rtrim('  abc  '), '|',
      |  ltrim('  abc  '), '|' FROM region WHERE r_regionkey = 0""".stripMargin,
    Tables.region(spark, sfDir).filter($"r_regionkey" === 0)
      .select(lit("|"), trim(lit("  abc  ")), lit("|"),
        rtrim(lit("  abc  ")), lit("|"), ltrim(lit("  abc  ")), lit("|")))

  check("udf3: aggregates over an all-null numeric (Hive CAST('' AS INT))",
    // Hive's CAST('' AS INT) yields NULL; the vintage-faithful spelling
    // under ANSI Spark is try_cast — count 0, sum/avg/min/max NULL
    """SELECT count(try_cast('' AS INT)), sum(try_cast('' AS INT)),
      |  avg(try_cast('' AS INT)), min(try_cast('' AS INT)),
      |  max(try_cast('' AS INT)) FROM orders""".stripMargin,
    Tables.orders(spark, sfDir).agg(
      count(expr("try_cast('' AS INT)")), sum(expr("try_cast('' AS INT)")),
      avg(expr("try_cast('' AS INT)")), min(expr("try_cast('' AS INT)")),
      max(expr("try_cast('' AS INT)"))))

  check("udf4: round / floor / ceil / unary-operator battery",
    """SELECT round(1.0), round(1.5), round(-1.5), floor(1.0), floor(1.5),
      |  floor(-1.5), ceil(1.0), ceil(1.5), ceil(-1.5), ceiling(1.0),
      |  +3, -3, 1+-2, ~1
      |FROM region WHERE r_regionkey = 0""".stripMargin,
    Tables.region(spark, sfDir).filter($"r_regionkey" === 0)
      // SQL 1.0/1.5 literals are DECIMAL(2,1); match that on this tier
      .select(round(lit(1.0).cast("decimal(2,1)")),
        round(lit(1.5).cast("decimal(2,1)")),
        round(lit(-1.5).cast("decimal(2,1)")),
        floor(lit(1.0).cast("decimal(2,1)")),
        floor(lit(1.5).cast("decimal(2,1)")),
        floor(lit(-1.5).cast("decimal(2,1)")),
        ceil(lit(1.0).cast("decimal(2,1)")),
        ceil(lit(1.5).cast("decimal(2,1)")),
        ceil(lit(-1.5).cast("decimal(2,1)")),
        ceil(lit(1.0).cast("decimal(2,1)")),
        lit(3), lit(-3), lit(1) + lit(-2), expr("~1")))

  // sample2/4/5/6/7.q: BUCKET x OUT OF y ON key — Hive buckets an INT key
  // by (key mod y); spelled explicitly so both tiers share the exact
  // deterministic semantics (the TABLESAMPLE(BUCKET..) parse path is
  // covered in SqlSurfaceSpec; Spark's own BUCKET sampling is random-split,
  // not hash-on-column)
  check("sample2: bucket 1 out of 2 on key",
    "SELECT l_orderkey, l_linenumber FROM lineitem WHERE pmod(l_orderkey, 2) = 0",
    Tables.lineitem(spark, sfDir).filter(pmod($"l_orderkey", lit(2)) === 0)
      .select($"l_orderkey", $"l_linenumber"))

  check("sample5: bucket 1 out of 5 on key (no input pruning, sample filter)",
    "SELECT l_orderkey, l_linenumber FROM lineitem WHERE pmod(l_orderkey, 5) = 0",
    Tables.lineitem(spark, sfDir).filter(pmod($"l_orderkey", lit(5)) === 0)
      .select($"l_orderkey", $"l_linenumber"))

  check("sample6: bucket 1 out of 4 on key",
    "SELECT l_orderkey, l_linenumber FROM lineitem WHERE pmod(l_orderkey, 4) = 0",
    Tables.lineitem(spark, sfDir).filter(pmod($"l_orderkey", lit(4)) === 0)
      .select($"l_orderkey", $"l_linenumber"))

  check("sample7: bucket 1 out of 4 on key plus a residual predicate",
    """SELECT l_orderkey, l_linenumber FROM lineitem
      |WHERE pmod(l_orderkey, 4) = 0 AND l_orderkey > 100""".stripMargin,
    Tables.lineitem(spark, sfDir)
      .filter(pmod($"l_orderkey", lit(4)) === 0 && $"l_orderkey" > 100)
      .select($"l_orderkey", $"l_linenumber"))

  check("union_exact: non-aggregated union of differently-filtered projections",
    // union.q: FROM (subquery UNION ALL subquery) SELECT * — the projected
    // union itself is the result, not an aggregate over it
    """SELECT u.k, u.p FROM (
      |  SELECT o_orderkey AS k, o_orderpriority AS p FROM orders
      |  WHERE o_orderkey < 100
      |  UNION ALL
      |  SELECT o_orderkey AS k, o_orderstatus AS p FROM orders
      |  WHERE o_orderkey > 5900
      |) u""".stripMargin,
    Tables.orders(spark, sfDir).filter($"o_orderkey" < 100)
      .select($"o_orderkey".as("k"), $"o_orderpriority".as("p"))
      .union(Tables.orders(spark, sfDir).filter($"o_orderkey" > 5900)
        .select($"o_orderkey".as("k"), $"o_orderstatus".as("p"))))

  check("input9: NULL = NULL filters everything (counted, so the row survives)",
    "SELECT count(*) FROM orders WHERE NULL = NULL",
    Tables.orders(spark, sfDir)
      .filter(lit(null) === lit(null)).agg(count(lit(1))))

  check("input11_limit: filter + deterministic order + limit",
    """SELECT o_orderkey, o_orderpriority FROM orders
      |WHERE o_orderkey < 100 ORDER BY o_orderkey LIMIT 10""".stripMargin,
    Tables.orders(spark, sfDir).filter($"o_orderkey" < 100)
      .select($"o_orderkey", $"o_orderpriority")
      .orderBy($"o_orderkey").limit(10))

  check("groupby2_limit: grouped aggregate ordered and limited",
    """SELECT o_custkey, sum(o_totalprice) AS s FROM orders
      |GROUP BY o_custkey ORDER BY s DESC, o_custkey LIMIT 5""".stripMargin,
    Tables.orders(spark, sfDir).groupBy($"o_custkey")
      .agg(sum($"o_totalprice").as("s"))
      .orderBy($"s".desc, $"o_custkey").limit(5))

  check("input6: IS NULL filter keeps only genuinely null keys",
    """SELECT o_orderkey, nullif(o_orderstatus, 'F') AS s FROM orders
      |WHERE nullif(o_orderstatus, 'F') IS NULL AND o_orderkey < 500""".stripMargin,
    Tables.orders(spark, sfDir)
      .select($"o_orderkey", nullif($"o_orderstatus", lit("F")).as("s"))
      .filter($"s".isNull && $"o_orderkey" < 500))

  check("input8: null arithmetic propagates (4+NULL, key-NULL, NULL+NULL)",
    """SELECT 4 + CAST(NULL AS INT), o_orderkey - CAST(NULL AS BIGINT),
      |  CAST(NULL AS INT) + CAST(NULL AS INT)
      |FROM orders WHERE o_orderkey < 5""".stripMargin,
    Tables.orders(spark, sfDir).filter($"o_orderkey" < 5)
      .select(lit(4) + lit(null).cast("int"),
        $"o_orderkey" - lit(null).cast("bigint"),
        lit(null).cast("int") + lit(null).cast("int")))

  test("input14: TRANSFORM script parity across tiers (SQL vs typed pipe)") {
    // input14.q pipes (key, value) through /bin/cat with CLUSTER BY and
    // filters the mapped output; here both tiers run the same external
    // command over the same rows — SQL TRANSFORM ... USING vs the typed
    // process-pipe operator (F1 streaming mapper) — and must agree
    views
    import org.apache.spark.sql.Encoders
    val a = spark.sql(
      """SELECT tkey, tvalue FROM (
        |  SELECT TRANSFORM(o_orderkey, o_orderpriority)
        |    USING 'tr a-z A-Z' AS (tkey, tvalue)
        |  FROM orders
        |) t WHERE cast(tkey AS BIGINT) < 100""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val lines = Tables.orders(spark, sfDir)
      .selectExpr("concat(o_orderkey, '\t', o_orderpriority)")
      .as(Encoders.STRING)
    val b = graft.pipeline.MrPipeline.pipe(lines, Seq("tr", "a-z", "A-Z"))
      .collect()
      .map { l => val i = l.indexOf('\t'); (l.substring(0, i), l.substring(i + 1)) }
      .filter(_._1.toLong < 100)
      .toSet
    assert(a === b && a.nonEmpty)
  }

  /** The src_thrift-like nested fixture shared by the input_testxpath*
    * goldens, parsed through IO.readXml (S8 StreamXmlRecordReader). */
  private def xpathFrame(): DataFrame = {
    val dir = new java.io.File("target/tmp/xpath_xml")
    dir.mkdirs()
    val xml = (0 until 10).map { i =>
      s"""<rec><id>$i</id>
         |  <lint>${i * 1}</lint><lint>${i * 2}</lint><lint>${i * 3}</lint>
         |  <lintstring><myint>$i</myint><mystring>fld_$i</mystring></lintstring>
         |  <lintstring><myint>${i + 1}</myint><mystring>fld_${i + 1}</mystring></lintstring>
         |  <key_2>val_$i</key_2>
         |</rec>""".stripMargin
    }.mkString("<recs>\n", "\n", "\n</recs>")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/tmp/xpath_xml/recs.xml"), xml)
    graft.sources.IO.readXml(
      spark, "target/tmp/xpath_xml/recs.xml", rowTag = "rec")
  }

  test("input_testxpath via the native XML source (array/struct access)") {
    // input_testxpath.q reads src_thrift and projects lint[1],
    // lintstring[0].mystring, mstringstring['key_2']; here the nested rows
    // come through IO.readXml (S8 StreamXmlRecordReader), and the same
    // projections run on both tiers over the parsed frame
    val parsed = xpathFrame()
    parsed.createOrReplaceTempView("src_xml")
    val a = spark.sql(
      """SELECT lint[1], lintstring[0].mystring, key_2 FROM src_xml""")
      .collect().map(_.toSeq).toSet
    val b = parsed.select($"lint".getItem(1),
        $"lintstring".getItem(0).getField("mystring"), $"key_2")
      .collect().map(_.toSeq).toSet
    spark.catalog.dropTempView("src_xml")
    assert(a === b && a.nonEmpty)
    assert(a.exists(_.head == 2L), "lint[1] of rec 1 must be 2")
  }

  test("input_testxpath3: struct-field projection across an array + map access") {
    // input_testxpath3.q projects mstringstring['key_9'] and
    // src_thrift.lintstring.myint — the field pulled across the WHOLE
    // array (yielding array<int>), not one element. The map column is
    // synthesized from the fixture's key_2 element.
    val parsed = xpathFrame()
    parsed.createOrReplaceTempView("src_xml3")
    val a = spark.sql(
      """SELECT map('key_2', key_2)['key_2'], lintstring.myint
        |FROM src_xml3""".stripMargin)
      .collect().map(_.toSeq).toSet
    val b = parsed.select(
        map(lit("key_2"), $"key_2").getItem("key_2"),
        $"lintstring".getField("myint"))
      .collect().map(_.toSeq).toSet
    spark.catalog.dropTempView("src_xml3")
    assert(a === b && a.nonEmpty)
    assert(a.exists(r => r(1) == Seq(1L, 2L)),
      "rec 1's lintstring.myint must project to [1, 2]")
  }

  check("udf_to_date: string cast to date feeding a grouped count",
    // §2.8 UDFToDate: to_date over the string form of a timestamp, the
    // result grouped — the reference's date extraction idiom
    """SELECT to_date(date_format(o_orderdate, 'yyyy-MM-dd')) AS d,
      |  count(*) AS n
      |FROM orders GROUP BY to_date(date_format(o_orderdate, 'yyyy-MM-dd'))""".stripMargin,
    Tables.orders(spark, sfDir)
      .groupBy(to_date(date_format($"o_orderdate", "yyyy-MM-dd")).as("d"))
      .agg(count(lit(1)).as("n")))

  test("input_testsequencefile: projection round-trips through a SequenceFile") {
    // input_testsequencefile.q: INSERT a (key, value) projection into a
    // table STORED AS SEQUENCEFILE, then read it back unchanged — here the
    // S5/S14 writer/reader pair carries the golden's round-trip contract
    views
    val out = "target/tmp/seqfile_golden"
    rmrf(out)
    val src = spark.sql(
      """SELECT cast(o_orderkey AS STRING) AS key, o_orderpriority AS value
        |FROM orders""".stripMargin)
    graft.sources.IO.writeSequenceFile(src, out)
    val back = graft.sources.IO.readSequenceFile(spark, out)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val direct = src.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(back === direct && back.nonEmpty)
  }

  test("input4_cb_delim/input16: custom-delimiter KV text on both tiers") {
    // input4_cb_delim.q / input16.q load Ctrl-B-delimited text; the serde
    // clause is a delimiter directive, and both engine tiers must split the
    // same bytes the same way (the goldens project VALUE, KEY — reversed)
    rmrf("target/tmp/kv_cb")
    new java.io.File("target/tmp/kv_cb").mkdirs()
    val sep = ""
    val lines = (0 until 50).map(i => s"key_$i${sep}val_$i")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("target/tmp/kv_cb/kv1_cb.txt"),
      lines.mkString("\n").getBytes("UTF-8"))
    val a = graft.sources.IO.readKeyValueText(
        spark, "target/tmp/kv_cb/kv1_cb.txt", sep)
      .select($"val", $"key").collect().map(_.toSeq).toSet
    val b = spark.read.option("sep", sep)
      .csv("target/tmp/kv_cb/kv1_cb.txt").toDF("key", "val")
      .select($"val", $"key").collect().map(_.toSeq).toSet
    assert(a === b && a.size === 50)
  }

  test("input5: TRANSFORM over complex-typed columns") {
    // input5.q pipes (lint, lintstring) — an array<int> and an
    // array<struct> — through /bin/cat with CLUSTER BY; complex types
    // reach the script in their string serialization and come back as the
    // transformed key/value strings
    val parsed = xpathFrame()
    parsed.createOrReplaceTempView("src_xml5")
    val out = spark.sql(
      """SELECT tkey, tvalue FROM (
        |  SELECT TRANSFORM(lint, lintstring) USING 'cat' AS (tkey, tvalue)
        |  FROM src_xml5 CLUSTER BY tkey
        |) t""".stripMargin).collect().map(r => (r.getString(0), r.getString(1)))
    spark.catalog.dropTempView("src_xml5")
    assert(out.length === 10)
    // rec i's lint is [0, 2i, 3i] serialized; spot-check rec 1 came through
    assert(out.exists { case (k, _) => k.contains("2") && k.contains("3") },
      s"serialized arrays must reach the script: ${out.take(3).mkString(";")}")
    assert(out.forall { case (_, v) => v.contains("fld_") },
      "struct fields must survive the round trip")
  }

  test("input14_limit: TRANSFORM output clustered, limited, then filtered") {
    // input14_limit.q: the LIMIT applies inside the mapped subquery, the
    // outer filter after it — with the clustered order made total (ORDER BY)
    // so both tiers pick the same 20 rows deterministically
    views
    import org.apache.spark.sql.Encoders
    val a = spark.sql(
      """SELECT tkey, tvalue FROM (
        |  SELECT TRANSFORM(o_orderkey, o_orderpriority)
        |    USING 'cat' AS (tkey, tvalue)
        |  FROM orders ORDER BY tkey LIMIT 20
        |) t WHERE cast(tkey AS BIGINT) < 100""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val lines = Tables.orders(spark, sfDir)
      .selectExpr("concat(o_orderkey, '\t', o_orderpriority)")
      .as(Encoders.STRING)
    val b = graft.pipeline.MrPipeline.pipe(lines, Seq("cat"))
      .collect()
      .map { l => val i = l.indexOf('\t'); (l.substring(0, i), l.substring(i + 1)) }
      .sortBy(_._1).take(20)
      .filter(_._1.toLong < 100)
      .toSet
    assert(a === b && a.nonEmpty)
  }

  // q57/q58 dual-tier goldens: the LLM-pipeline queries that are plain SQL
  // get the same SQL-vs-DataFrame treatment as the batch corpus above (the
  // DataFrame tier is the production operator the driver oracle gates).
  check("tfidf top terms (q57 twin): SQL tier matches the operator",
    """WITH toks AS (
      |  SELECT doc_id,
      |    explode(filter(split(text, '\\s+'), t -> t <> '')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(1) AS tf FROM toks
      |       GROUP BY doc_id, term),
      |df AS (SELECT term, count(1) AS df FROM tf GROUP BY term),
      |nn AS (SELECT count(1) AS n FROM documents),
      |sc AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |    round(tf.tf * ln(cast(nn.n AS double) / df.df), 6) AS tfidf
      |  FROM tf JOIN df USING (term) CROSS JOIN nn),
      |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
      |        ORDER BY tfidf DESC, term) AS rank FROM sc)
      |SELECT doc_id, rank, term, tf, df, tfidf FROM r
      |WHERE rank <= 3""".stripMargin,
    graft.operators.TextAnalysis.tfidfTopTerms(spark, sfDir))

  check("label centroids (q58 twin): SQL tier matches the operator",
    """WITH e AS (
      |  SELECT label, transform(embedding, x -> cast(x AS double)) AS v
      |  FROM embeddings),
      |x AS (SELECT label, d, x FROM e LATERAL VIEW posexplode(v) t AS d, x)
      |SELECT label, cast(d AS int) AS dim,
      |  round(cast(sum(cast(x AS decimal(28,14))) AS double) / count(1), 6) AS c,
      |  count(1) AS n
      |FROM x GROUP BY label, d""".stripMargin,
    graft.operators.Similarity.labelCentroids(spark, sfDir))

  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): org.apache.spark.sql.Column = col(sc.s(args: _*))
  }
}
