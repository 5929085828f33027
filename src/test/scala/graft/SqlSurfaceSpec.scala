package graft

/** The Hive-vintage SQL surface (SURVEY.md §2.8 + Hive grammar rows of §2):
  * golden-query-style assertions over the fixture views, mirroring the
  * reference's clientpositive corpus shape (groupby*, join*, input*,
  * sample*, udf*). */
class SqlSurfaceSpec extends SparkSpec {

  private lazy val views: Unit = Tables.registerAll(spark, sfDir)

  private def sql(q: String) = { views; spark.sql(q) }

  test("select / where / group by / having / order by / limit") {
    val rows = sql(
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders WHERE o_totalprice > 1000
        |GROUP BY o_orderpriority HAVING count(*) > 10
        |ORDER BY n DESC, o_orderpriority LIMIT 3""".stripMargin).collect()
    assert(rows.length === 3)
    assert(rows.map(_.getLong(1)).sliding(2).forall(s => s(0) >= s(1)))
  }

  test("join variants: inner, left, right, full outer") {
    for (jt <- Seq("JOIN", "LEFT OUTER JOIN", "RIGHT OUTER JOIN",
        "FULL OUTER JOIN")) {
      val n = sql(
        s"""SELECT count(*) FROM customer c $jt orders o
           |ON c.c_custkey = o.o_custkey""".stripMargin)
        .head().getLong(0)
      assert(n > 0, jt)
    }
  }

  test("union all / distinct") {
    val n = sql(
      """SELECT count(*) FROM (
        |  SELECT c_nationkey AS k FROM customer
        |  UNION ALL SELECT s_nationkey FROM supplier)""".stripMargin)
      .head().getLong(0)
    val c = sql("SELECT count(*) FROM customer").head().getLong(0)
    val s = sql("SELECT count(*) FROM supplier").head().getLong(0)
    assert(n === c + s)
    assert(sql("SELECT count(DISTINCT c_nationkey) FROM customer")
      .head().getLong(0) === 25)
  }

  test("distribute by / sort by / cluster by parse and run") {
    assert(sql("SELECT o_custkey FROM orders DISTRIBUTE BY o_custkey SORT BY o_custkey").count() > 0)
    assert(sql("SELECT o_custkey FROM orders CLUSTER BY o_custkey").count() > 0)
  }

  test("scalar function surface of the reference registry") {
    // concat/substr/upper/lower/trim/like/rlike/regexp_replace/round/floor/
    // ceil/cast/size — the FunctionRegistry rows (§2.8)
    val r = sql(
      """SELECT concat(c_name, '!') AS c1, substr(c_name, 1, 8) AS c2,
        |  upper(c_mktsegment) AS c3, lower(c_name) AS c4,
        |  trim('  x  ') AS c5,
        |  c_name LIKE 'Customer%' AS c6, c_name RLIKE '[0-9]+$' AS c7,
        |  regexp_replace(c_name, '[0-9]', '#') AS c8,
        |  round(c_acctbal, 1) AS c9, floor(c_acctbal) AS c10,
        |  ceil(c_acctbal) AS c11, cast(c_custkey AS STRING) AS c12,
        |  size(split(c_name, '#')) AS c13,
        |  c_acctbal + 1 AS c14, -c_acctbal AS c15,
        |  3 % 2 AS c16, 5 & 3 AS c17, 5 | 3 AS c18, 5 ^ 3 AS c19, ~5 AS c20,
        |  c_custkey IS NOT NULL AS c21
        |FROM customer LIMIT 1""".stripMargin).head()
    assert(r.getString(0).startsWith("Customer"))
    assert(r.getBoolean(5))
    assert(r.getInt(15) === 1 && r.getInt(16) === 1 && r.getInt(17) === 7
      && r.getInt(18) === 6 && r.getInt(19) === -6)
  }

  test("tablesample bucket semantics") {
    // deterministic hash-bucket sampling (Hive TABLESAMPLE(BUCKET x OUT OF y
    // ON col)) expressed portably
    val n = sql(
      "SELECT count(*) FROM lineitem WHERE pmod(hash(l_orderkey), 8) = 0")
      .head().getLong(0)
    val total = sql("SELECT count(*) FROM lineitem").head().getLong(0)
    assert(n > 0 && n < total)
    // native TABLESAMPLE also parses and runs
    assert(sql("SELECT * FROM lineitem TABLESAMPLE (10 PERCENT)").count() > 0)
  }

  test("TRANSFORM pipes rows through an external script") {
    val out = sql(
      """SELECT TRANSFORM(o_orderpriority) USING 'tr a-z A-Z'
        |  AS (upper_priority)
        |FROM orders LIMIT 5""".stripMargin)
      .collect().map(_.getString(0))
    assert(out.nonEmpty)
    assert(out.forall(s => s == s.toUpperCase))
  }

  test("create partitioned table + static partition insert + pruning") {
    views
    spark.sql("DROP TABLE IF EXISTS events_part")
    rmrf(new java.io.File("spark-warehouse/events_part"))
    spark.sql(
      """CREATE TABLE events_part
        |  (event_id BIGINT, value DOUBLE, event_type STRING)
        |USING PARQUET PARTITIONED BY (event_type)""".stripMargin)
    spark.sql(
      """INSERT OVERWRITE TABLE events_part PARTITION (event_type)
        |SELECT event_id, value, event_type FROM events""".stripMargin)
    val q = spark.sql(
      "SELECT count(*) FROM events_part WHERE event_type = 'click'")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") ||
      !plan.contains("event_type=error"), "partition pruning expected")
    assert(q.head().getLong(0) > 0)
  }

  test("SQL multi-insert: FROM src INSERT ... INSERT ... (Hive.g:383-392)") {
    // groupby7.q shape: ONE source scan fans out to two insert targets in a
    // single statement; must agree with the DataFrame form (IO.multiInsert)
    views
    Seq("mi_dest1", "mi_dest2").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      rmrf(new java.io.File(s"spark-warehouse/$t"))
    }
    spark.sql("CREATE TABLE mi_dest1 (k BIGINT, s DOUBLE) USING PARQUET")
    spark.sql("CREATE TABLE mi_dest2 (k STRING, n BIGINT) USING PARQUET")
    spark.sql(
      """FROM orders
        |INSERT OVERWRITE TABLE mi_dest1
        |  SELECT o_custkey, sum(o_totalprice) GROUP BY o_custkey
        |INSERT OVERWRITE TABLE mi_dest2
        |  SELECT o_orderpriority, count(*) GROUP BY o_orderpriority""".stripMargin)
    val sql1 = spark.table("mi_dest1").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sql2 = spark.table("mi_dest2").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // DataFrame twin through the one-scan multi-insert operator
    import org.apache.spark.sql.functions._
    val out1 = "target/tmp/mi_df1"
    val out2 = "target/tmp/mi_df2"
    graft.sources.IO.multiInsert(Tables.orders(spark, sfDir), Seq(
      ((df: org.apache.spark.sql.DataFrame) => df.groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice")).as("s")), out1),
      ((df: org.apache.spark.sql.DataFrame) => df.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n")), out2)))
    val df1 = spark.read.parquet(out1).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val df2 = spark.read.parquet(out2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sql1 === df1 && sql1.nonEmpty)
    assert(sql2 === df2 && sql2.nonEmpty)
    Seq("mi_dest1", "mi_dest2").foreach(t => spark.sql(s"DROP TABLE $t"))
  }

  test("SQL multi-insert: three branches incl. a static-partition target (input12.q)") {
    // input12.q: one scan, disjoint filters fan out to three tables, the
    // third a static partition — the branches must tile the source exactly
    views
    Seq("mi3_d1", "mi3_d2", "mi3_d3").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      rmrf(new java.io.File(s"spark-warehouse/$t"))
    }
    spark.sql("CREATE TABLE mi3_d1 (k BIGINT, p STRING) USING PARQUET")
    spark.sql("CREATE TABLE mi3_d2 (k BIGINT, p STRING) USING PARQUET")
    spark.sql(
      """CREATE TABLE mi3_d3 (k BIGINT) USING PARQUET
        |PARTITIONED BY (ds STRING)""".stripMargin)
    spark.sql(
      """FROM orders
        |INSERT OVERWRITE TABLE mi3_d1
        |  SELECT o_orderkey, o_orderpriority WHERE o_orderkey < 100
        |INSERT OVERWRITE TABLE mi3_d2
        |  SELECT o_orderkey, o_orderpriority
        |  WHERE o_orderkey >= 100 AND o_orderkey < 200
        |INSERT OVERWRITE TABLE mi3_d3 PARTITION (ds='2008-04-08')
        |  SELECT o_orderkey WHERE o_orderkey >= 200""".stripMargin)
    val n1 = spark.table("mi3_d1").count()
    val n2 = spark.table("mi3_d2").count()
    val n3 = spark.table("mi3_d3").count()
    val total = spark.table("orders").count()
    assert(n1 > 0 && n2 > 0 && n3 > 0)
    assert(n1 + n2 + n3 === total, "disjoint branches must tile the source")
    // the static partition really landed under ds=2008-04-08
    assert(spark.table("mi3_d3")
      .filter(org.apache.spark.sql.functions.col("ds") === "2008-04-08")
      .count() === n3)
    Seq("mi3_d1", "mi3_d2", "mi3_d3").foreach(t => spark.sql(s"DROP TABLE $t"))
  }

  /** (Re)builds the `srcpart_events` ds/hr-partitioned catalog table the
    * input_part* goldens query — srcpart of the reference suite, with ds/hr
    * derived from event time (hr the half-day bucket, like srcpart's 11/12). */
  private def buildSrcpart(): Unit = {
    views
    spark.sql("DROP TABLE IF EXISTS srcpart_events")
    rmrf(new java.io.File("spark-warehouse/srcpart_events"))
    spark.sql(
      """CREATE TABLE srcpart_events
        |  (event_id BIGINT, event_type STRING, value DOUBLE)
        |USING PARQUET PARTITIONED BY (ds STRING, hr STRING)""".stripMargin)
    spark.sql(
      """INSERT OVERWRITE TABLE srcpart_events PARTITION (ds, hr)
        |SELECT event_id, event_type, value,
        |  date_format(ts, 'yyyy-MM-dd') AS ds,
        |  if(hour(ts) < 12, '00', '12') AS hr
        |FROM events""".stripMargin)
  }

  test("input_part1: ds/hr-partitioned table, one-partition query (dual-tier)") {
    // input_part1.q: srcpart is partitioned by (ds, hr) and the query names
    // one partition of each — the single most common real-user pattern of
    // the reference's Hive layer (ql/parse/PartitionPruner.java:49). Here
    // the DDL form: CREATE ... PARTITIONED BY (ds, hr), dynamic insert
    // deriving ds/hr from the event time, then the one-partition query on
    // both tiers, checked against the unpartitioned source twin.
    buildSrcpart()
    val q = spark.sql(
      """SELECT event_type, count(*) AS n,
        |  cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS s
        |FROM srcpart_events WHERE ds = '2024-01-03' AND hr = '12'
        |GROUP BY event_type""".stripMargin)
    val a = q.collect().map(_.toSeq).toSet
    import org.apache.spark.sql.functions._
    val b = spark.table("srcpart_events")
      .filter(col("ds") === "2024-01-03" && col("hr") === "12")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("s"))
      .collect().map(_.toSeq).toSet
    // source twin over the unpartitioned events view
    val c = sql(
      """SELECT event_type, count(*) AS n,
        |  cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS s
        |FROM events
        |WHERE date_format(ts, 'yyyy-MM-dd') = '2024-01-03'
        |  AND hour(ts) >= 12
        |GROUP BY event_type""".stripMargin).collect().map(_.toSeq).toSet
    assert(a === b && a === c && a.nonEmpty)
    // the partition predicates must prune, not filter rows post-scan
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("2024-01-03"), s"partition pruning expected:\n$plan")
    spark.sql("DROP TABLE srcpart_events")
  }

  test("input_part2: multi-insert branches each prune to their own partition") {
    // input_part2.q: one FROM srcpart fans out to two targets, each branch
    // filtered to a DIFFERENT ds — pruning is per-branch, and each dest
    // holds exactly its branch's partition slice
    buildSrcpart()
    Seq("part2_d1", "part2_d2").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      rmrf(new java.io.File(s"spark-warehouse/$t"))
    }
    spark.sql("CREATE TABLE part2_d1 (event_id BIGINT, et STRING) USING PARQUET")
    spark.sql("CREATE TABLE part2_d2 (event_id BIGINT, et STRING) USING PARQUET")
    spark.sql(
      """FROM srcpart_events
        |INSERT OVERWRITE TABLE part2_d1
        |  SELECT event_id, event_type WHERE ds = '2024-01-03' AND hr = '12'
        |INSERT OVERWRITE TABLE part2_d2
        |  SELECT event_id, event_type WHERE ds = '2024-01-04' AND hr = '12'""".stripMargin)
    import org.apache.spark.sql.functions.col
    def twin(ds: String): Set[Seq[Any]] = spark.table("srcpart_events")
      .filter(col("ds") === ds && col("hr") === "12")
      .select(col("event_id"), col("event_type"))
      .collect().map(_.toSeq).toSet
    val d1 = spark.table("part2_d1").collect().map(_.toSeq).toSet
    val d2 = spark.table("part2_d2").collect().map(_.toSeq).toSet
    assert(d1 === twin("2024-01-03") && d1.nonEmpty)
    assert(d2 === twin("2024-01-04") && d2.nonEmpty)
    assert(d1.intersect(d2).isEmpty, "different partitions, disjoint rows")
    Seq("part2_d1", "part2_d2", "srcpart_events")
      .foreach(t => spark.sql(s"DROP TABLE $t"))
  }

  test("input13: multi-insert with an INSERT OVERWRITE DIRECTORY branch") {
    // input13.q: disjoint filters fan out to two tables, a static
    // partition, AND a raw directory sink — the directory branch is the
    // new surface vs input12 (SQL writes files outside the catalog)
    views
    Seq("in13_d1", "in13_d2", "in13_d3").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      rmrf(new java.io.File(s"spark-warehouse/$t"))
    }
    val dirOut = new java.io.File("target/tmp/in13_dest4").getAbsolutePath
    rmrf(dirOut)
    spark.sql("CREATE TABLE in13_d1 (k BIGINT, p STRING) USING PARQUET")
    spark.sql("CREATE TABLE in13_d2 (k BIGINT, p STRING) USING PARQUET")
    spark.sql(
      """CREATE TABLE in13_d3 (k BIGINT) USING PARQUET
        |PARTITIONED BY (ds STRING, hr STRING)""".stripMargin)
    spark.sql(
      s"""FROM orders
         |INSERT OVERWRITE TABLE in13_d1
         |  SELECT o_orderkey, o_orderpriority WHERE o_orderkey < 100
         |INSERT OVERWRITE TABLE in13_d2
         |  SELECT o_orderkey, o_orderpriority
         |  WHERE o_orderkey >= 100 AND o_orderkey < 200
         |INSERT OVERWRITE TABLE in13_d3 PARTITION (ds='2008-04-08', hr='12')
         |  SELECT o_orderkey WHERE o_orderkey >= 200 AND o_orderkey < 300
         |INSERT OVERWRITE DIRECTORY '$dirOut' USING PARQUET
         |  SELECT o_orderpriority WHERE o_orderkey >= 300""".stripMargin)
    val n1 = spark.table("in13_d1").count()
    val n2 = spark.table("in13_d2").count()
    val n3 = spark.table("in13_d3").count()
    val n4 = spark.read.parquet(dirOut).count()
    val total = spark.table("orders").count()
    assert(n1 > 0 && n2 > 0 && n3 > 0 && n4 > 0)
    assert(n1 + n2 + n3 + n4 === total,
      "disjoint branches incl. the directory sink must tile the source")
    assert(spark.sql("SHOW PARTITIONS in13_d3").collect()
      .map(_.getString(0)).toSeq === Seq("ds=2008-04-08/hr=12"))
    Seq("in13_d1", "in13_d2", "in13_d3").foreach(t => spark.sql(s"DROP TABLE $t"))
  }

  test("groupby7: identical string-coercing aggregate fans out to two targets") {
    // groupby7.q: the SAME sum(SUBSTR(value, 4)) GROUP BY key lands in two
    // insert targets of one FROM — distinct from the disjoint-branch
    // multi-inserts above; the aggregate coerces a numeric substring to a
    // number (c_name 'Customer#000000001' -> 1). Substring-of-digits sums
    // are integer-valued, so the double totals are order-exact.
    views
    Seq("gb7_d1", "gb7_d2").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      rmrf(new java.io.File(s"spark-warehouse/$t"))
    }
    spark.sql("CREATE TABLE gb7_d1 (k BIGINT, s DOUBLE) USING PARQUET")
    spark.sql("CREATE TABLE gb7_d2 (k BIGINT, s DOUBLE) USING PARQUET")
    spark.sql(
      """FROM customer
        |INSERT OVERWRITE TABLE gb7_d1
        |  SELECT c_nationkey, sum(cast(substr(c_name, 10) AS DOUBLE))
        |  GROUP BY c_nationkey
        |INSERT OVERWRITE TABLE gb7_d2
        |  SELECT c_nationkey, sum(cast(substr(c_name, 10) AS DOUBLE))
        |  GROUP BY c_nationkey""".stripMargin)
    val d1 = spark.table("gb7_d1").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val d2 = spark.table("gb7_d2").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    import org.apache.spark.sql.functions._
    val df = Tables.customer(spark, sfDir)
      .groupBy(col("c_nationkey"))
      .agg(sum(substring(col("c_name"), 10, 100000).cast("double")).as("s"))
      .collect().map(r => r.getAs[Number](0).longValue -> r.getDouble(1)).toMap
    assert(d1 === d2 && d1 === df && d1.nonEmpty)
    Seq("gb7_d1", "gb7_d2").foreach(t => spark.sql(s"DROP TABLE $t"))
  }

  test("sample4: bucket-aligned sample is exactly one bucket's files") {
    // sample4.q: TABLESAMPLE(BUCKET 1 OUT OF 2 ON key) over a table
    // CLUSTERED BY key INTO 2 BUCKETS — sampling aligned with bucketing
    // needs no row filter, it IS bucket selection. Spark-first proof:
    // `pmod(hash(key), 2)` is literally the bucket-assignment expression
    // (Murmur3, seed 42) of bucketBy, so the predicate form over the table
    // must equal reading only bucket 0's files.
    views
    spark.sql("DROP TABLE IF EXISTS srcbucket")
    rmrf(new java.io.File("spark-warehouse/srcbucket"))
    import org.apache.spark.sql.functions.col
    graft.sources.IO.writeBucketedTable(
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_linenumber")),
      "srcbucket", "l_orderkey", 2)
    val a = spark.sql(
      """SELECT l_orderkey, l_linenumber FROM srcbucket
        |WHERE pmod(hash(l_orderkey), 2) = 0""".stripMargin)
      .collect().map(_.toSeq).toSet
    val bucket0 = new java.io.File("spark-warehouse/srcbucket").listFiles()
      .filter(_.getName.matches("part-.*_00000\\.c.*\\.parquet"))
      .map(_.getPath)
    assert(bucket0.nonEmpty, "bucket 0 must have at least one file")
    val b = spark.read.parquet(bucket0.toIndexedSeq: _*)
      .collect().map(_.toSeq).toSet
    assert(a === b && a.nonEmpty)
    // and the sample is a strict subset of the table
    assert(a.size < spark.table("srcbucket").count())
    spark.sql("DROP TABLE srcbucket")
  }

  test("case sensitivity and string comparison quirks of the vintage") {
    // string-ordered max/min (A6) — lexicographic, as StringValueMax/Min
    val r = sql(
      "SELECT max(o_orderpriority), min(o_orderpriority) FROM orders").head()
    assert(r.getString(0) >= r.getString(1))
  }
}
