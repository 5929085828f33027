package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Continuous tier — the HOP/Quatrain capabilities (SURVEY.md §2.9) on
  * Structured Streaming.
  *
  *  - [[clockSource]]: the unbounded clock/monitor source (S9/S10 —
  *    RealTimeRecordReader / ClockInputFormat) ≙ the `rate` source;
  *  - [[windowedCounts]]: windowed streaming reduce (C2 — every
  *    `mapred.reduce.window` ms reduce the window's input and emit);
  *    HOP windows are processing-time and state-free — tumbling windows +
  *    update mode + watermark give the same per-window emission, with
  *    event-time as a strict superset (C12/C13);
  *  - [[cqAlerts]]: the CQ monitoring query (C11, examples/CQ.java) —
  *    per-host window averages + cross-host mean+2σ anomaly flag;
  *  - [[onlineAggregate]]: online aggregation (C4) — progressive snapshots
  *    of a bounded input at increasing progress fractions, final frame
  *    exact. Chunked file streaming (`maxFilesPerTrigger`) stands in for
  *    HOP's snapshot progress thresholds; `foreachBatch` + complete mode
  *    re-emits the cumulative aggregate per chunk — the SNAPSHOT stream of
  *    OutputFile.Type (progress<1) with the same final answer as batch.
  */
object Continuous {

  /** Unbounded clock-tick source: (timestamp, value=seq). */
  def clockSource(spark: SparkSession, rowsPerSecond: Int = 1): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()

  /** Tumbling-window streaming aggregation over an (ts, event_type, value)
    * stream. Works on any streaming DataFrame with those columns; pair with
    * `outputMode("update")` + a processing-time trigger for HOP parity. */
  def windowedCounts(events: DataFrame, windowDuration: String): DataFrame =
    events
      .withWatermark("ts", windowDuration)
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_v"))

  /** Exact HOP window semantics (C2, ReduceTask.stream():595-629):
    * processing-time windows, no retained state — every trigger interval the
    * reducer runs over ONLY that window's input, emits, and frees it. Here
    * each micro-batch IS the window: `aggregate` is applied to the batch
    * alone (no streaming state), the result is emitted, nothing carries
    * over. Event-time windowed aggregation ([[windowedCounts]]) is the
    * strict superset; this is the parity mode. */
  def perWindowAggregate(
      stream: DataFrame,
      aggregate: DataFrame => DataFrame,
      trigger: Trigger,
      maxRowsPerWindow: Int = 100000)(
      onWindow: (Long, Seq[Row]) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // the collect() is the operator's contract (window results go to a
        // driver-side consumer, like the reference's reducer emit) — but an
        // unexpectedly wide aggregate must fail loudly, not OOM the driver
        val rows = aggregate(batch).limit(maxRowsPerWindow + 1).collect()
        require(rows.length <= maxRowsPerWindow,
          s"window $id aggregate exceeds maxRowsPerWindow=$maxRowsPerWindow; " +
            "aggregate tighter or raise the cap")
        onWindow(id, rows.toSeq)
        ()
      }
      .start()

  /** CQ alert logic (C11): per-key aggregates for one window batch, flagged
    * where the key's average exceeds the cross-key mean + 2σ. Static
    * transform — apply inside `foreachBatch` so the cross-key statistics
    * are computed per emitted window, exactly like the reference's
    * windowed reducer state (CQ.java:482-499). */
  def cqAlerts(windowBatch: DataFrame): DataFrame = {
    val perKey = windowBatch
      .groupBy(col("w_start"), col("key"))
      .agg(avg(col("value")).as("avg_v"))
    val global = perKey.groupBy(col("w_start"))
      .agg(avg(col("avg_v")).as("g_avg"),
        stddev_samp(col("avg_v")).as("g_std"))
    perKey.join(global, "w_start")
      .withColumn("alert",
        col("avg_v") > col("g_avg") + lit(2.0) * coalesce(col("g_std"), lit(0.0)))
      .select(col("w_start"), col("key"), col("avg_v"), col("alert"))
  }

  /** Inter-job pipelining (C7, PipelineMapTask.java:52): job N+1 consumes
    * job N's output live. Where the reference wires two MR jobs through the
    * Quatrain buffer exchange, here stage 1 streams its output to a
    * replayable directory and stage 2 streams from that directory — each
    * micro-batch of stage 1 becomes visible to stage 2 without a batch
    * barrier. Runs both to completion on bounded input (AvailableNow);
    * returns stage 2's final result table name ("pipeline_out"). */
  def chainedQueries(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      midDir: String,
      checkpointDir: String,
      stage1: DataFrame => DataFrame,
      stage2: DataFrame => DataFrame): DataFrame = {
    val q1 = stage1(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(inputDir))
      .writeStream
      .option("checkpointLocation", s"$checkpointDir/stage1")
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", midDir)
      .start()
    q1.awaitTermination()
    val q2 = stage2(spark.readStream.schema(
        spark.read.parquet(midDir).schema)
        .option("maxFilesPerTrigger", "4").parquet(midDir))
      .writeStream
      .option("checkpointLocation", s"$checkpointDir/stage2")
      .trigger(Trigger.AvailableNow())
      .outputMode("complete")
      .format("memory").queryName("pipeline_out")
      .start()
    q2.awaitTermination()
    spark.table("pipeline_out")
  }

  /** Streaming exact dedup: drop records whose fingerprint was already seen
    * within the watermark horizon (state is bounded by the horizon — the
    * only way streaming dedup survives an unbounded stream). Expects
    * columns `ts` (event time) and `fp` (the dedup key, e.g. a
    * fingerprint from TextAnalysis.fingerprints). */
  def streamingDedup(stream: DataFrame, horizon: String): DataFrame =
    stream.withWatermark("ts", horizon).dropDuplicates("fp")

  /** One progressive snapshot: progress fraction + the aggregate-so-far. */
  case class Snapshot(progress: Double, rows: Seq[Row])

  /** Online aggregation over a bounded multi-file input: stream the files
    * `filesPerTrigger` at a time, re-emit the cumulative aggregate after
    * each chunk. Returns all snapshots; the last has progress 1.0 and is
    * bit-equal to the batch answer. */
  def onlineAggregate(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      aggregate: DataFrame => DataFrame,
      filesPerTrigger: Int = 1,
      maxSnapshotRows: Int = 100000): Seq[Snapshot] = {
    val files = new java.io.File(inputDir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val totalChunks = math.ceil(files.toDouble / filesPerTrigger)
    val snapshots = scala.collection.mutable.ArrayBuffer.empty[Snapshot]
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger.toString)
      .parquet(inputDir)
    val query = aggregate(stream).writeStream
      .outputMode("complete")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // snapshot frames are aggregates (bounded by group-key cardinality);
        // cap the driver-side materialization so a mistakenly ungrouped
        // plan fails loudly instead of OOMing the driver
        val rows = batch.limit(maxSnapshotRows + 1).collect()
        require(rows.length <= maxSnapshotRows,
          s"snapshot $id exceeds maxSnapshotRows=$maxSnapshotRows")
        snapshots.synchronized {
          snapshots += Snapshot(
            math.min((id + 1) / totalChunks, 1.0), rows.toSeq)
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    snapshots.toSeq
  }
}
