package graft

import org.apache.spark.sql.functions._

import graft.sources.IO

class IOSpec extends SparkSpec {
  private val tmp = "target/tmp/io"


  test("key-value text round trip with embedded separators") {
    import spark.implicits._
    val df = Seq(("k1", "v1"), ("k2", "v2\twith\ttabs"), ("k3", ""))
      .toDF("key", "val")
    IO.writeKeyValueText(df, s"$tmp/kv")
    val back = IO.readKeyValueText(spark, s"$tmp/kv")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(back === Set(("k1", "v1"), ("k2", "v2\twith\ttabs"), ("k3", "")))
  }

  test("sequence file round trip") {
    import spark.implicits._
    val df = Seq(("a", "1"), ("b", "2")).toDF("key", "val")
    rmrf(new java.io.File(s"$tmp/seq")) // saveAsSequenceFile has no overwrite
    IO.writeSequenceFile(df, s"$tmp/seq")
    val back = IO.readSequenceFile(spark, s"$tmp/seq")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(back === Set(("a", "1"), ("b", "2")))
  }

  test("bzip2 text round trip matches the gzip path (S2 codecs)") {
    // Reference reads bzip2 alongside gzip (io/compress/BZip2Codec.java).
    // Hadoop's pure-Java codec backs both sides; unlike gzip, bzip2 is
    // SPLITTABLE, so at 100 TB it is the compressed-text format that still
    // parallelizes a scan across executors.
    import spark.implicits._
    val lines = (1 to 200).map(i => s"record $i payload")
    val write = (codec: String, dir: String) =>
      spark.createDataset(lines).write.mode("overwrite")
        .option("compression", codec).text(dir)
    write("bzip2", s"$tmp/bz2")
    write("gzip", s"$tmp/gz")
    assert(new java.io.File(s"$tmp/bz2").listFiles()
      .exists(_.getName.endsWith(".bz2")), "expected .bz2 part files")
    val viaBz2 = IO.readText(spark, s"$tmp/bz2")
      .collect().map(_.getString(0)).sorted.toSeq
    val viaGz = IO.readText(spark, s"$tmp/gz")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(viaBz2 === lines.sorted)
    assert(viaBz2 === viaGz, "bzip2 and gzip paths must agree")
  }

  test("lz4 text and zstd parquet round trips match the gzip path (lzo slot)") {
    // The reference ships LzoCodec (io/compress/LzoCodec.java) as its
    // fast-low-ratio codec; lzo itself is GPL-encumbered and obsolete, so
    // the modern equivalents stand in: lz4 for text (Hadoop's Lz4Codec,
    // pure-Java lz4-java backing — no native lib needed) and zstd for
    // parquet (zstd-jni, the Spark-bundled default-candidate at scale).
    import spark.implicits._
    val lines = (1 to 200).map(i => s"record $i payload")
    val write = (codec: String, dir: String) =>
      spark.createDataset(lines).write.mode("overwrite")
        .option("compression", codec).text(dir)
    write("lz4", s"$tmp/lz4")
    write("gzip", s"$tmp/gz_lzo_slot")
    assert(new java.io.File(s"$tmp/lz4").listFiles()
      .exists(_.getName.endsWith(".lz4")), "expected .lz4 part files")
    val viaLz4 = IO.readText(spark, s"$tmp/lz4")
      .collect().map(_.getString(0)).sorted.toSeq
    val viaGz = IO.readText(spark, s"$tmp/gz_lzo_slot")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(viaLz4 === lines.sorted)
    assert(viaLz4 === viaGz, "lz4 and gzip paths must agree")

    val df = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("key", "n")
    df.write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$tmp/zstd_pq")
    assert(new java.io.File(s"$tmp/zstd_pq").listFiles()
      .exists(_.getName.endsWith(".zstd.parquet")), "expected zstd part files")
    val back = spark.read.parquet(s"$tmp/zstd_pq")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(back === Set(("a", 1L), ("b", 2L), ("c", 3L)))
  }

  test("partitioned fan-out write creates one directory per key") {
    val events = Tables.events(spark, sfDir)
    IO.writePartitionedByKey(events, "event_type", s"$tmp/by_type")
    val dirs = new java.io.File(s"$tmp/by_type").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("event_type=click")))
    val back = spark.read.parquet(s"$tmp/by_type")
    assert(back.count() === events.count())
  }

  test("bucketed table join plans without a shuffle on the bucketed side") {
    val orders = Tables.orders(spark, sfDir)
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    rmrf(new java.io.File("spark-warehouse/orders_bucketed"))
    IO.writeBucketedTable(orders, "orders_bucketed", "o_custkey", 4)
    val t = spark.table("orders_bucketed")
    val joined = t.as("a").join(t.as("b"), "o_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed self-join should not shuffle:\n$plan")
    assert(joined.count() > 0)
  }

  test("regex key filter accepts only fully matching keys") {
    import spark.implicits._
    val df = Seq("alpha", "alp", "xalpha", "alpha2").toDF("key")
    val got = IO.regexKeyFilter(df, "key", "alp.*a").collect()
      .map(_.getString(0)).toSet
    // 'xalpha' contains a match but does not fully match (reference uses
    // Matcher.matches); 'alpha2' has a trailing char
    assert(got === Set("alpha"))
  }

  test("percent filter keeps every f-th record per split starting at 0") {
    import spark.implicits._
    val df = spark.range(100).toDF("id").repartition(1)
    val got = IO.percentFilter(df, 10).collect().map(_.getLong(0))
    assert(got.length === 10)
    // exactly one of every 10 records per split, first record included
    val all = df.collect().map(_.getLong(0))
    assert(got.toSeq === all.grouped(10).map(_.head).toSeq)
    intercept[IllegalArgumentException](IO.percentFilter(df, 0))
  }

  test("md5 key filter reproduces the reference MD5Filter hashcode") {
    import spark.implicits._
    // reference algorithm, reimplemented independently: big-endian signed
    // long from the first 8 digest bytes, accept iff hashcode % f == 0
    def refAccept(key: String, f: Int): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
      val h = (0 until 8).foldLeft(0L)((acc, i) =>
        acc | ((d(i) & 0xffL) << (8 * (7 - i))))
      h % f == 0
    }
    val keys = (0 until 500).map(i => s"key$i")
    val df = keys.toDF("key")
    for (f <- Seq(2, 7, 10)) {
      val got = IO.md5KeyFilter(df, "key", f).collect()
        .map(_.getString(0)).toSet
      val want = keys.filter(refAccept(_, f)).toSet
      assert(got === want, s"frequency $f")
      assert(want.nonEmpty && want.size < keys.size)
    }
  }

  test("heterogeneous union aligns schemas by name") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("id", "name")
    val b = Seq((2L, 3.5)).toDF("id", "score")
    val u = IO.unionHeterogeneous(Seq(a, b))
    assert(u.columns.toSet === Set("id", "name", "score"))
    assert(u.count() === 2)
  }

  test("multi-insert runs one scan into many sinks") {
    val src = Tables.orders(spark, sfDir)
    IO.multiInsert(src, Seq(
      (df => df.filter(col("o_orderstatus") === "O"), s"$tmp/mi_open"),
      (df => df.groupBy("o_orderpriority").count(), s"$tmp/mi_counts")))
    val open = spark.read.parquet(s"$tmp/mi_open")
    val counts = spark.read.parquet(s"$tmp/mi_counts")
    assert(open.count() === src.filter(col("o_orderstatus") === "O").count())
    assert(counts.count() === 5)
  }

  test("jdbc round trip through embedded Derby") {
    import spark.implicits._
    rmrf(new java.io.File("target/tmp/derbydb"))
    val url = "jdbc:derby:target/tmp/derbydb;create=true"
    val df = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "name")
    IO.writeJdbc(df, url, "t_people") // Append creates the absent table
    val back = IO.readJdbc(spark, url, "t_people")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back === Set((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    // default mode appends (DBOutputFormat INSERT semantics)...
    IO.writeJdbc(df.filter($"id" <= 1), url, "t_people")
    assert(IO.readJdbc(spark, url, "t_people").count() === 4)
    // ...and Overwrite must be requested explicitly
    IO.writeJdbc(df.filter($"id" <= 1), url, "t_people",
      mode = org.apache.spark.sql.SaveMode.Overwrite)
    assert(IO.readJdbc(spark, url, "t_people").count() === 1)
  }

  test("named side outputs fan out one scan to differently-formatted sinks") {
    import spark.implicits._
    val scans = spark.sparkContext.longAccumulator("scans")
    val counting = udf { (id: Long) => scans.add(1); id }
    val src = spark.range(100).toDF("id")
      .withColumn("id", counting($"id"))
      .withColumn("bucket", $"id" % 3)
    IO.namedOutputs(src, Seq(
      IO.NamedOutput("all", "parquet", s"$tmp/named/all"),
      IO.NamedOutput("small", "json", s"$tmp/named/small",
        _.filter($"bucket" === 0)),
      IO.NamedOutput("wide", "csv", s"$tmp/named/wide",
        _.select(($"id" * 2).as("id2")))))
    // every sink wrote, with its own shape
    assert(spark.read.parquet(s"$tmp/named/all").count() === 100)
    assert(spark.read.json(s"$tmp/named/small").count() === 34)
    assert(spark.read.csv(s"$tmp/named/wide").count() === 100)
    // ONE pass over the source fed all three sinks (cache materialized
    // once; without it the UDF would have run ~300 times)
    assert(scans.value === 100L, s"source scanned ${scans.value / 100.0}x")
    intercept[IllegalArgumentException] {
      IO.namedOutputs(src, Seq(
        IO.NamedOutput("dup", "parquet", s"$tmp/named/d1"),
        IO.NamedOutput("dup", "parquet", s"$tmp/named/d2")))
    }
  }

  test("nline splits carry exactly N ordered lines each") {
    import spark.implicits._
    val path = s"$tmp/nline"
    spark.createDataset((0 until 103).map(i => f"line$i%03d"))
      .coalesce(1).write.mode("overwrite").text(path)
    val df = IO.readNLine(spark, path, 10)
    val perSplit = df.groupBy("split_id").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perSplit.size === 11)
    (0 until 10).foreach(i => assert(perSplit(i) === 10L, s"split $i"))
    assert(perSplit(10) === 3L) // remainder split
    // one split per partition, order preserved within the split
    val parts = df.rdd.mapPartitions(it => Iterator.single(it.toSeq))
      .collect().filter(_.nonEmpty)
    parts.foreach { rows =>
      assert(rows.map(_.getInt(0)).distinct.length === 1)
      val ls = rows.map(_.getString(1))
      assert(ls === ls.sorted, "lines out of order within split")
    }
  }

  test("xml reader yields one row per rowTag element") {
    val path = s"$tmp/xml/recs.xml"
    new java.io.File(s"$tmp/xml").mkdirs()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      """<records>
        |  <rec><id>1</id><name>alpha</name></rec>
        |  <rec><id>2</id><name>beta</name></rec>
        |  <rec><id>3</id><name>gamma &amp; delta</name></rec>
        |</records>""".stripMargin)
    val df = IO.readXml(spark, path, "rec")
    val got = df.collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[String]("name"))).toSet
    assert(got === Set((1L, "alpha"), (2L, "beta"), (3L, "gamma & delta")))
  }

  test("inverted index round-trips conjunctive search against a text scan") {
    import spark.implicits._
    import graft.sources.InvertedIndex
    val docs = Tables.documents(spark, sfDir)
    InvertedIndex.write(docs, s"$tmp/invidx", nShards = 4)
    val got = InvertedIndex.searchAll(spark, s"$tmp/invidx",
      Seq("query", "window")).collect().map(_.getLong(0)).toSet
    // ground truth: direct tokenized scan
    val want = docs.select($"doc_id",
      filter(split(lower($"text"), "\\s+"), t => t =!= "").as("t"))
      .filter(array_contains($"t", "query") && array_contains($"t", "window"))
      .collect().map(_.getLong(0)).toSet
    assert(want.nonEmpty && got === want)
    // sharding: every shard directory belongs to pmod(hash(term), 4)
    val shards = new java.io.File(s"$tmp/invidx").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard=")).map(_.getName)
    assert(shards.nonEmpty && shards.toSet.subsetOf(
      (0 until 4).map(i => s"shard=$i").toSet))
  }

  test("inverted index df-cap records stop terms and rejects them at query") {
    import spark.implicits._
    import graft.sources.InvertedIndex
    val docs = Seq(
      (1L, "common rare1"), (2L, "common rare2"), (3L, "common rare1 x"))
      .toDF("doc_id", "text")
    InvertedIndex.write(docs, s"$tmp/invidx2", nShards = 2, maxDf = 2)
    val got = InvertedIndex.searchAll(spark, s"$tmp/invidx2", Seq("rare1"))
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 3L))
    // 'common' (df=3 > 2) must be rejected, not silently empty
    val e = intercept[IllegalArgumentException] {
      InvertedIndex.searchAll(spark, s"$tmp/invidx2", Seq("common"))
    }
    assert(e.getMessage.contains("df-capped"))
  }

  test("null sink executes without materializing") {
    IO.nullSink(Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count())
  }
}
