package graft

/** DDL/metadata surface of the reference's Hive vintage — the clientpositive
  * shapes inputddl1-6, show_tables, showparts and input_dynamicserde
  * (ql/src/test/queries/clientpositive/inputddl*.q) — on Spark's native
  * catalog DDL: CREATE (partitioned / bucketed / commented / complex-typed),
  * DESCRIBE [EXTENDED] [PARTITION], SHOW TABLES 'pattern', SHOW PARTITIONS,
  * ALTER TABLE ... DROP PARTITION, and UTF-8 string data. The serde clauses
  * of the vintage (ROW FORMAT DELIMITED ...) are storage directives, not
  * semantics — parquet is this engine's storage tier, so the golden checks
  * the TYPED round trip the serde existed to provide. */
class DdlSurfaceSpec extends SparkSpec {

  private def drop(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $t")
    rmrf(s"spark-warehouse/$t")
  }

  test("inputddl1: create, insert, select star, drop") {
    drop("inputddl1")
    spark.sql("CREATE TABLE inputddl1 (key INT, value STRING) USING PARQUET")
    spark.sql("INSERT INTO inputddl1 VALUES (1, 'one'), (2, 'two')")
    assert(spark.sql("SELECT inputddl1.* FROM inputddl1").count() === 2)
    spark.sql("DROP TABLE inputddl1")
    assert(!spark.catalog.tableExists("inputddl1"))
  }

  test("inputddl2/inputddl3: partition columns surface in DESCRIBE") {
    drop("inputddl2")
    spark.sql(
      """CREATE TABLE inputddl2 (key INT, value STRING)
        |USING PARQUET PARTITIONED BY (ds TIMESTAMP, country STRING)""".stripMargin)
    val desc = spark.sql("DESCRIBE inputddl2").collect()
      .map(r => r.getString(0) -> r.getString(1))
    assert(desc.contains("ds" -> "timestamp") &&
      desc.contains("country" -> "string"))
    assert(desc.map(_._1).contains("# Partition Information"))
    spark.sql("DROP TABLE inputddl2")
  }

  test("inputddl4: complex types, comments, clustered/sorted buckets DDL") {
    drop("inputddl4")
    spark.sql(
      """CREATE TABLE inputddl4 (
        |  viewTime TIMESTAMP, userid INT, page_url STRING,
        |  referrer_url STRING, friends ARRAY<BIGINT>,
        |  properties MAP<STRING, STRING>,
        |  ip STRING COMMENT 'IP Address of the User')
        |USING PARQUET
        |COMMENT 'This is the page view table'
        |PARTITIONED BY (ds STRING, country STRING)
        |CLUSTERED BY (userid) SORTED BY (viewTime) INTO 32 BUCKETS""".stripMargin)
    val desc = spark.sql("DESCRIBE inputddl4").collect()
      .map(r => r.getString(0) -> r.getString(1))
    assert(desc.contains("friends" -> "array<bigint>"))
    assert(desc.contains("properties" -> "map<string,string>"))
    val ext = spark.sql("DESCRIBE EXTENDED inputddl4").collect()
      .map(_.mkString("|")).mkString("\n")
    assert(ext.contains("This is the page view table"), ext)
    assert(ext.contains("32") && ext.toLowerCase.contains("bucket"), ext)
    assert(ext.contains("IP Address of the User"), ext)
    spark.sql("DROP TABLE inputddl4")
  }

  test("inputddl5: UTF-8 data round-trips and compares exactly") {
    drop("inputddl5")
    spark.sql("CREATE TABLE inputddl5 (name STRING) USING PARQUET")
    spark.sql("INSERT INTO inputddl5 VALUES ('邵钮'), ('ascii')")
    val names = spark.sql("SELECT inputddl5.name FROM inputddl5")
      .collect().map(_.getString(0)).toSet
    assert(names === Set("邵钮", "ascii"))
    assert(spark.sql(
      "SELECT count(1) FROM inputddl5 WHERE inputddl5.name = '邵钮'")
      .head().getLong(0) === 1L)
    spark.sql("DROP TABLE inputddl5")
  }

  test("inputddl6/showparts: show partitions, describe partition, drop partition") {
    drop("inputddl6")
    spark.sql(
      """CREATE TABLE inputddl6 (key STRING, value STRING)
        |USING PARQUET PARTITIONED BY (ds STRING)""".stripMargin)
    spark.sql(
      "INSERT INTO inputddl6 PARTITION (ds='2008-04-09') VALUES ('k1','v1')")
    spark.sql(
      "INSERT INTO inputddl6 PARTITION (ds='2008-04-08') VALUES ('k2','v2')")
    val parts = spark.sql("SHOW PARTITIONS inputddl6").collect()
      .map(_.getString(0)).sorted
    assert(parts.toSeq === Seq("ds=2008-04-08", "ds=2008-04-09"))
    assert(spark.sql(
      "DESCRIBE EXTENDED inputddl6 PARTITION (ds='2008-04-08')").count() > 0)
    spark.sql("ALTER TABLE inputddl6 DROP PARTITION (ds='2008-04-08')")
    val after = spark.sql("SHOW PARTITIONS inputddl6").collect()
      .map(_.getString(0))
    assert(after.toSeq === Seq("ds=2008-04-09"))
    assert(spark.table("inputddl6").count() === 1L,
      "dropping the partition must drop its rows")
    spark.sql("DROP TABLE inputddl6")
  }

  test("show_tables: pattern-filtered table listing") {
    Seq("shtb_test1", "shtb_test2").foreach(drop)
    spark.sql(
      """CREATE TABLE shtb_test1 (key STRING, value STRING)
        |USING PARQUET PARTITIONED BY (ds STRING)""".stripMargin)
    spark.sql(
      """CREATE TABLE shtb_test2 (key STRING, value STRING)
        |USING PARQUET PARTITIONED BY (ds STRING)""".stripMargin)
    def shown(pattern: String): Seq[String] =
      spark.sql(s"SHOW TABLES LIKE '$pattern'").collect()
        .map(_.getString(1)).sorted.toSeq
    assert(shown("shtb_*") === Seq("shtb_test1", "shtb_test2"))
    assert(shown("shtb_test1|shtb_test2") ===
      Seq("shtb_test1", "shtb_test2"))
    Seq("shtb_test1", "shtb_test2").foreach(t => spark.sql(s"DROP TABLE $t"))
  }

  test("input3: alter table add columns and rename to") {
    Seq("test3a", "test3b", "test3c").foreach(drop)
    spark.sql("CREATE TABLE test3a (a INT, b FLOAT) USING PARQUET")
    spark.sql(
      """CREATE TABLE test3b (a ARRAY<INT>, b FLOAT, c MAP<FLOAT, INT>)
        |USING PARQUET""".stripMargin)
    spark.sql("ALTER TABLE test3b ADD COLUMNS (x FLOAT)")
    val cols = spark.table("test3b").schema.fieldNames.toSeq
    assert(cols === Seq("a", "b", "c", "x"))
    spark.sql("ALTER TABLE test3b RENAME TO test3c")
    assert(!spark.catalog.tableExists("test3b") &&
      spark.catalog.tableExists("test3c"))
    assert(spark.table("test3c").schema.fieldNames.toSeq ===
      Seq("a", "b", "c", "x"))
    Seq("test3a", "test3c").foreach(t => spark.sql(s"DROP TABLE $t"))
  }

  test("input7: NULL literals insert with column-type coercion") {
    // input7.q: INSERT SELECT NULL, src1.key into (c1 DOUBLE, c2 INT) —
    // the untyped NULL must land as a typed null double
    drop("in7_dest")
    spark.sql("CREATE TABLE in7_dest (c1 DOUBLE, c2 INT) USING PARQUET")
    spark.sql(
      """FROM (SELECT cast(o_orderkey AS INT) AS key FROM
        |  parquet.`/root/testdata/sf0.001/orders.parquet` LIMIT 25) src1
        |INSERT OVERWRITE TABLE in7_dest SELECT NULL, src1.key""".stripMargin)
    val rows = spark.table("in7_dest").collect()
    assert(rows.length === 25)
    assert(rows.forall(_.isNullAt(0)), "NULL must coerce to null double")
    assert(rows.forall(!_.isNullAt(1)))
    spark.sql("DROP TABLE in7_dest")
  }

  test("nullinput: selecting and aggregating an empty table yields no rows") {
    drop("tstnullinut")
    spark.sql("CREATE TABLE tstnullinut (a STRING, b STRING) USING PARQUET")
    assert(spark.sql("SELECT x.* FROM tstnullinut x").count() === 0L)
    assert(spark.sql(
      "SELECT x.a, count(1) FROM tstnullinut x GROUP BY x.a").count() === 0L)
    spark.sql("DROP TABLE tstnullinut")
  }

  test("input_dynamicserde: complex-typed table round-trips through insert") {
    // the vintage's DynamicSerDe golden is a typed round trip of
    // array<int> / array<string> / map<string,string> / int / string —
    // parquet nested types carry the same contract here
    import spark.implicits._
    drop("dynserde")
    spark.sql(
      """CREATE TABLE dynserde (a ARRAY<INT>, b ARRAY<STRING>,
        |  c MAP<STRING,STRING>, d INT, e STRING) USING PARQUET""".stripMargin)
    val src = Seq(
      (Seq(1, 2, 3), Seq("one", "two"), Map("k1" -> "v1"), 7, "s7"),
      (Seq(4, 5), Seq("four"), Map("k2" -> "v2", "k3" -> "v3"), 8, "s8"))
      .toDF("a", "b", "c", "d", "e")
    src.createOrReplaceTempView("dynsrc")
    spark.sql(
      "FROM dynsrc INSERT OVERWRITE TABLE dynserde SELECT a, b, c, d, e")
    val back = spark.sql("SELECT dynserde.* FROM dynserde").collect()
      .map(r => (r.getSeq[Int](0), r.getSeq[String](1),
        r.getMap[String, String](2).toMap, r.getInt(3), r.getString(4)))
      .toSet
    val direct = src.collect()
      .map(r => (r.getSeq[Int](0), r.getSeq[String](1),
        r.getMap[String, String](2).toMap, r.getInt(3), r.getString(4)))
      .toSet
    assert(back === direct && back.size === 2)
    spark.catalog.dropTempView("dynsrc")
    spark.sql("DROP TABLE dynserde")
  }
}
