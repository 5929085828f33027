package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sources & sinks (SURVEY.md §2.1).
  *
  * Most reference InputFormats/OutputFormats collapse onto `spark.read` /
  * `df.write`; this module pins down the handful with real semantics:
  * key-value text (S3), sequence files (S5/S14), key-partitioned fan-out
  * writes (S15 MultipleOutputs), heterogeneous unions (S17/U2), bucketed
  * sorted tables (the map-side-join layout, J1), JDBC (S7), and the
  * discard/test sinks (S16/S11).
  *
  * Every writer goes through the standard committers — atomic temp-dir +
  * rename (S18) is Spark's default behavior.
  */
object IO {

  /** S2 TextInputFormat: line records. Offsets, when needed, are
    * `monotonically_increasing_id` (per-partition monotone, like byte
    * offsets — not globally dense, same as the reference's). */
  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** S3 KeyValueTextInputFormat: split each line at the first separator. */
  def readKeyValueText(spark: SparkSession, path: String,
      sep: String = "\t"): DataFrame = {
    import spark.implicits._
    val pos = instr($"value", sep)
    spark.read.text(path).select(
      substring_index($"value", sep, 1).as("key"),
      when(pos > 0,
        $"value".substr(pos + lit(sep.length), length($"value")))
        .otherwise(lit("")).as("val"))
  }

  /** S13 TextOutputFormat: `key<sep>value` lines. */
  def writeKeyValueText(df: DataFrame, path: String,
      sep: String = "\t"): Unit =
    df.select(concat_ws(sep, df.columns.toSeq.map(col): _*).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)

  /** S5/S14 SequenceFile round-trip ((String,String) records) — binary KV
    * compat path; Parquet is the engine's native store. */
  def writeSequenceFile(df: DataFrame, path: String): Unit = {
    val rdd = df.rdd.map(r => (r.get(0).toString, r.get(1).toString))
    rdd.saveAsSequenceFile(path)
  }

  def readSequenceFile(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.sequenceFile[String, String](path).toDF("key", "val")
  }

  /** S5 SequenceFileInputFilter.RegexFilter
    * (mapred/SequenceFileInputFilter.java:101): accept records whose key
    * FULLY matches the regex (the reference uses `Matcher.matches()`, not
    * find — anchor accordingly). */
  def regexKeyFilter(df: DataFrame, keyCol: String, regex: String): DataFrame =
    df.filter(col(keyCol).rlike("^(?:" + regex + ")$"))

  /** S5 SequenceFileInputFilter.PercentFilter
    * (mapred/SequenceFileInputFilter.java:145): accept every `frequency`-th
    * record of each split, starting with the first. The reference counts
    * records per record-reader (= per split); the per-partition row number
    * of `monotonically_increasing_id` reproduces exactly that. */
  def percentFilter(df: DataFrame, frequency: Int): DataFrame = {
    require(frequency > 0, s"Negative frequency: $frequency")
    df.filter(
      (monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1))
        % frequency) === 0)
  }

  /** S5 SequenceFileInputFilter.MD5Filter
    * (mapred/SequenceFileInputFilter.java:190): hashcode = first 8 bytes of
    * MD5(key) as a big-endian SIGNED long; accept iff hashcode % frequency
    * == 0. Unlike PercentFilter this is content-deterministic — the same
    * keys survive regardless of split layout, so it composes with joins. */
  def md5KeyFilter(df: DataFrame, keyCol: String, frequency: Int): DataFrame = {
    require(frequency > 0, s"Negative frequency: $frequency")
    val hashcode = expr(
      s"cast(conv(substring(md5(cast(`$keyCol` as string)), 1, 16), 16, -10) as bigint)")
    df.filter(hashcode % frequency === 0)
  }

  /** S15 MultipleOutputs/MultipleOutputFormat: fan rows out to files named
    * by key — `partitionBy` writes one directory per key value. */
  def writePartitionedByKey(df: DataFrame, keyCol: String,
      path: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(keyCol).parquet(path)

  /** Hive-style bucketed+sorted table (CLUSTERED BY ... SORTED BY ... INTO n
    * BUCKETS): the co-partitioned layout that lets joins on the bucket key
    * skip the shuffle (J1 map-side merge join). */
  def writeBucketedTable(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)

  /** S7 DBInputFormat/DBOutputFormat ≙ Spark JDBC. Exercised end-to-end in
    * IOSpec against embedded Derby (on the Spark-image classpath); for a
    * server database pass partitioning options via `props` so the read
    * parallelizes (`partitionColumn`/`lowerBound`/`upperBound`/
    * `numPartitions` — the reference's DBInputFormat splits by LIMIT/OFFSET
    * chunks, DBInputFormat.java:49). */
  def readJdbc(spark: SparkSession, url: String, table: String,
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Default mode is Append — the reference's DBOutputFormat semantics
    * (INSERT rows, create the table when absent); pass
    * `SaveMode.Overwrite` explicitly to replace a table. */
  def writeJdbc(df: DataFrame, url: String, table: String,
      props: java.util.Properties = new java.util.Properties(),
      mode: SaveMode = SaveMode.Append): Unit =
    df.write.mode(mode).jdbc(url, table, props)

  /** S15 MultipleOutputs named side outputs
    * (mapred/lib/MultipleOutputs.java:116): N independently named sinks,
    * each with its own projection/filter, format and path, fed from ONE
    * pass over the source — the source persists across the branch writes
    * (first branch materializes it, the rest read the cached partitions),
    * then unpersists. */
  final case class NamedOutput(name: String, format: String, path: String,
      transform: DataFrame => DataFrame = identity)

  def namedOutputs(src: DataFrame, outputs: Seq[NamedOutput]): Unit = {
    val names = outputs.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate named outputs: ${names.mkString(",")}")
    src.persist()
    try outputs.foreach { o =>
      o.transform(src).write.mode(SaveMode.Overwrite)
        .format(o.format).save(o.path)
    } finally src.unpersist()
  }

  /** S4 NLineInputFormat exact semantics (mapred/lib/NLineInputFormat
    * .java:59): splits of EXACTLY `n` lines each (last split takes the
    * remainder), preserving file order — unlike `repartition`, which only
    * approximates the count. Returns `(split_id, line)` with one split per
    * partition, so a downstream `mapPartitions` sees precisely its N lines
    * in order — the reference's per-mapper batching contract (used to
    * meter external-process invocations). */
  def readNLine(spark: SparkSession, path: String, n: Int): DataFrame = {
    import spark.implicits._
    require(n > 0, s"n must be positive: $n")
    // exact split assignment needs the line count up front (the reference's
    // getSplits also scans for line offsets); cache the raw lines so
    // zipWithIndex's count pass, the total, and the shuffle all read the
    // file ONCE — and the snapshot is consistent if the dir changes under us
    val raw = spark.read.textFile(path).rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lines = raw.zipWithIndex()
    val nSplits = math.max(1, math.ceil(raw.count().toDouble / n).toInt)
    lines
      .map { case (line, idx) => ((idx / n).toInt, (idx, line)) }
      .partitionBy(new org.apache.spark.Partitioner {
        def numPartitions: Int = nSplits
        def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .mapPartitions(_.toSeq.sortBy(_._2._1).iterator.map {
        case (split, (_, line)) => (split, line)
      }, preservesPartitioning = true)
      .toDF("split_id", "line")
  }

  /** S8 StreamXmlRecordReader ≙ Spark's native XML source: one row per
    * `rowTag` element (the reference scans for begin/end tag byte
    * sequences; the XML source does the same split-aware scan, then
    * actually parses the element). */
  def readXml(spark: SparkSession, path: String, rowTag: String): DataFrame =
    spark.read.option("rowTag", rowTag).xml(path)

  /** S16 NullOutputFormat: execute the plan, discard the rows. */
  def nullSink(df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).format("noop").save()

  /** S11 EmptyInputFormat. */
  def empty(spark: SparkSession): DataFrame = spark.emptyDataFrame

  /** S12 TeraGen.RangeInputFormat: synthesized row-number ranges. */
  def range(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).toDF("id")

  /** S17/U2 MultipleInputs: heterogeneous per-source frames, normalized to
    * a common schema and unioned by column name (missing columns null). */
  def unionHeterogeneous(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** D5 multi-insert: one scan feeding N sinks — cache the source once,
    * run each branch (the reference's FROM src INSERT ... INSERT ...). */
  def multiInsert(src: DataFrame,
      branches: Seq[(DataFrame => DataFrame, String)]): Unit = {
    src.persist()
    try branches.foreach { case (f, path) =>
      f(src).write.mode(SaveMode.Overwrite).parquet(path)
    } finally src.unpersist()
  }
}
