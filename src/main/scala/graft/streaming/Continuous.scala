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
    * returns stage 2's final result (memory table `queryName`). */
  def chainedQueries(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      midDir: String,
      checkpointDir: String,
      stage1: DataFrame => DataFrame,
      stage2: DataFrame => DataFrame,
      queryName: String = "pipeline_out"): DataFrame = {
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
      .format("memory").queryName(queryName)
      .start()
    q2.awaitTermination()
    spark.table(queryName)
  }

  // ---------------------------------------------------------------------
  // Driver-facing streamed queries (oracle-checked rows for the tier)
  // ---------------------------------------------------------------------

  private val runSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Run `f` with `spark.sql.shuffle.partitions` temporarily lowered to
    * `n` — streaming aggregations pin their STATE STORE partition count to
    * the shuffle-partition setting at first batch, and every micro-batch
    * commits every state partition. The driver-facing bounded runs here
    * aggregate tiny key spaces (window × event-type), so batch-sized
    * shuffle parallelism (32) just multiplies per-trigger state-commit
    * overhead ~4×. Sizing state partitions to the aggregate cardinality is
    * the standard Structured Streaming deployment tuning; at 100 TB the
    * stream's KEY cardinality (not its volume) still governs this knob.
    * Safe per-query because each invocation starts a fresh checkpoint.
    *
    * ASSUMES single-threaded use of the session: the conf set/restore is
    * session-global, so a CONCURRENT query on the same SparkSession could
    * plan with the lowered value or restore out of order. The sequential
    * driver/bench/test harness satisfies this; a multi-tenant session
    * should instead run bounded streams on `spark.newSession()` with the
    * setting applied there (kept out of this helper because the memory
    * sink's temp view and the stage memo are session-scoped). */
  private def withStreamShuffle[T](spark: SparkSession, n: Int)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    // only ever LOWER: a session already running narrower than `n` (tests
    // and bisection runs use 4) must not have its state fan-out raised
    val eff = math.min(scala.util.Try(old.toInt).getOrElse(n), n)
    spark.conf.set(key, eff.toString)
    try f finally spark.conf.set(key, old)
  }

  /** Hadoop FileSystem + Path for a state/staging location. Every
    * existence/mtime probe and recursive delete in this file goes through
    * the Hadoop FS API (like [[DeltaState]] always has) so a state root
    * on HDFS/S3 behaves exactly like the local `target/` harness default
    * — java.io.File probes silently answered "missing" for any
    * non-local URI. Uses a plain Configuration (scheme-resolved), so no
    * SparkSession is needed at call sites that don't have one. */
  private def hfs(path: String): (org.apache.hadoop.fs.FileSystem,
      org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(new org.apache.hadoop.conf.Configuration()), p)
  }

  /** mtime of `path`, or -1 when it does not exist — the freshness
    * probe's one-RPC form (exists + getFileStatus would be two). */
  private def mtimeOrMissing(path: String): Long = {
    val (fs, p) = hfs(path)
    try fs.getFileStatus(p).getModificationTime
    catch { case _: java.io.FileNotFoundException => -1L }
  }

  /** Stage `table` from `dir` as a `files`-file parquet copy under
    * `target/streamstage/` so the file stream source yields real multi-batch
    * incremental execution — the fixture tables are single-file, which would
    * collapse `maxFilesPerTrigger` streaming to one micro-batch. Idempotent
    * per (dir, table): bench laps re-use the staged copy.
    *
    * The relative `target/streamstage/` root is the single-JVM harness
    * convention; on a real cluster the staged dir (and every checkpoint dir
    * below) must live on a shared filesystem (HDFS/S3) visible to all
    * executors — pass-through of the usual Structured Streaming deployment
    * rule, not a new constraint. */
  private[graft] def stageChunks(spark: SparkSession, dir: String, table: String,
      files: Int = 8): String = {
    val key = fixtureKey(dir)
    val out = s"target/streamstage/$key/$table"
    // re-stage when missing OR older than the source table — a regenerated
    // fixture must never stream from a stale copy
    val srcMtime = sourceTableMtime(dir, table)
    val fresh = mtimeOrMissing(s"$out/_SUCCESS") >= srcMtime
    if (!fresh) {
      graft.Tables.tableOf(spark, dir, table)
        .repartition(files).write.mode("overwrite").parquet(out)
      // a rewritten staged copy may carry a changed schema (regenerated
      // fixture) — drop the cached one so the next read re-infers
      schemaCache.remove(out)
    }
    out
  }

  /** Readable fixture-dir slug + path hash: distinct fixture dirs that
    * slug to the same string (/data/sf0.1 vs /data_sf0.1) must not share
    * a staged copy. */
  private def fixtureKey(dir: String): String = {
    val abs = java.nio.file.Paths.get(dir).toAbsolutePath.toString
    dir.replaceAll("[^A-Za-z0-9.]+", "_") +
      f"_${scala.util.hashing.MurmurHash3.stringHash(abs) & 0x7fffffff}%08x"
  }

  /** Newest mtime under `dir/<table>.parquet` — the staleness witness every
    * fixture-staging cache compares its marker against. */
  private def sourceTableMtime(dir: String, table: String): Long = {
    val (fs, p) = hfs(s"$dir/$table.parquet")
    val it = fs.listFiles(p, /*recursive=*/ true)
    var newest = Long.MinValue
    while (it.hasNext) newest = math.max(newest, it.next().getModificationTime)
    if (newest == Long.MinValue) Long.MaxValue else newest
  }

  /** THE fixture-staging registry — the ring fence around what may be
    * cached across runs (VERDICT r18 "what's wrong" #3). A staged family
    * must be a PURE FUNCTION OF THE FIXTURE that models scenario INPUT
    * state (replay chunks standing in for an arrival stream, a shipped
    * index the scenario declares pre-existing) — never computation the
    * operator is being measured on. Everything else (every mutable state
    * dir, every checkpoint) stays per-run. This set is the single
    * allowed-families list: `StagingRegistrySpec` scans the main sources
    * for [[stagedFixtureDir]]/[[stageOrderedChunksCached]] labels and
    * [[stageChunks]] tables and FAILS on any label not registered here,
    * so the staged class cannot quietly grow.
    *
    *  - `events`, `lineitem`, `documents` — [[stageChunks]] multi-file
    *    replay copies of fixture tables (q51-q54, q88 arrival streams);
    *  - `lshinc`, `xmodal` — [[stageOrderedChunksCached]] ascending-id
    *    replay chunks (q99/q117 arrival order = id order);
    *  - `lshseed` — the q99 shipped-corpus seed index (the scenario is a
    *    stream against a DURABLE pre-shipped index);
    *  - `mod10` — [[graft.operators.Dedup.ensureFixtureIndex]]'s shipped
    *    index tag (q94/q118's pre-existing index, the precedent family),
    *    scanned from its call sites by the same spec. */
  private[graft] val stagedFamilies: Set[String] =
    Set("events", "lineitem", "documents", "lshinc", "xmodal", "lshseed",
      "mod10")

  /** Stage fixture-derived REPLAY INPUT once per (fixture dir, label),
    * refreshed when the source table is regenerated OR the caller's
    * derivation changes — the [[stageChunks]] idempotence contract
    * generalized to arbitrary staged artifacts (the q99 seed index, the
    * q99/q117 ordered replay chunks). `build` writes into the returned
    * root; a `_GRAFT_STAGED` marker written LAST makes a torn staging
    * re-run instead of being served. The marker's CONTENT carries
    * `derivation` — the caller's version stamp for the code path that
    * derives the artifact (bumped whenever that pipeline changes), so an
    * operator-code change after staging restages instead of silently
    * probing new-code state against an old-code artifact (ADVICE r18:
    * the mtime-only check could not see code changes). `sourceTable`
    * names the fixture table the artifact derives from. This is harness
    * staging plumbing, not operator work: every per-run mutable STATE
    * dir stays per-run, only the pure function of the fixture is cached
    * — the same line [[stageChunks]] (q51-q54/q88 replay input) and
    * [[graft.operators.Dedup.ensureFixtureIndex]] (the q94 shipped
    * index) already draw. */
  private def stagedFixtureDir(spark: SparkSession, dir: String,
      label: String, derivation: String, sourceTable: String = "documents")(
      build: String => Unit): String = {
    val out = s"target/streamstage/${fixtureKey(dir)}/$label"
    val marker = s"$out/_GRAFT_STAGED"
    val srcMtime = sourceTableMtime(dir, sourceTable)
    val want = s"staged:$derivation"
    def markerContent: Option[String] = {
      val (fs, p) = hfs(marker)
      try {
        val in = fs.open(p)
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](256)
          var n = in.read(tmp)
          while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
          Some(new String(buf.toByteArray,
            java.nio.charset.StandardCharsets.UTF_8).trim)
        } finally in.close()
      } catch { case _: java.io.FileNotFoundException => None }
    }
    val fresh = mtimeOrMissing(marker) >= srcMtime &&
      markerContent.contains(want)
    if (!fresh) {
      deleteRecursively(out)
      val (fs, outP) = hfs(out)
      fs.mkdirs(outP)
      build(out)
      val mOut = fs.create(new org.apache.hadoop.fs.Path(marker), true)
      try mOut.write(
        (want + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally mOut.close()
      // drop cached schemas for the root AND any staged subdir under it —
      // a regenerated fixture may carry a changed schema
      schemaCache.keySet.removeIf(_.startsWith(out))
    }
    out
  }

  /** [[stageOrderedChunks]] behind the [[stagedFixtureDir]] cache: the
    * ordered replay chunks are a pure function of (fixture, chunk count),
    * so re-deriving them per run paid the single-partition ntile window
    * plus `chunks` sequential coalesce(1) writes on every invocation —
    * measurement overhead, not operator work. */
  private def stageOrderedChunksCached(spark: SparkSession, dir: String,
      label: String, df: => DataFrame, chunks: Int): String =
    stagedFixtureDir(spark, dir, s"${label}_c$chunks",
      // the chunking device itself: id-ordered ntile split, 2s mtime lag
      derivation = "orderedchunks-v1") { out =>
      stageOrderedChunks(df, chunks, s"$out/chunks", s"$out/_tmp")
    } + "/chunks"

  /** A per-run mutable STATE dir read: the stored frame when the dir has
    * been appended to, else an empty frame of the same schema — so state
    * dirs materialize on first append instead of paying a schema-bearing
    * empty seed write per run. The explicit schema also skips parquet
    * footer inference on every per-commit state read. */
  private def stateOrEmpty(spark: SparkSession, dir: String,
      schema: StructType): DataFrame =
    if (hfs(dir) match { case (fs, p) => fs.exists(p) })
      spark.read.schema(schema).parquet(dir)
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)

  /** Staged-dir schemas, cached for the JVM's lifetime (plain map, NOT
    * [[graft.StageMemo]] — the bench's cold lap clears the memo to make
    * each operator pay its own shared stages, but schema inference is
    * harness STAGING plumbing, not operator work: a production stream
    * declares its schema once, it doesn't re-infer parquet footers per
    * run). Staged dirs are written once per (dir, table); when stageChunks
    * detects a regenerated source fixture and rewrites a staged copy, it
    * drops the cached entry so a changed schema re-infers. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  private def stagedSchema(spark: SparkSession, staged: String): StructType =
    schemaCache.computeIfAbsent(staged,
      _ => spark.read.parquet(staged).schema)

  /** Stage `df` as `chunks` single-file ascending-`doc_id` parquet chunks
    * with strictly increasing mtimes, so the file stream source replays
    * them oldest-first: batch order = id order — the determinism device
    * that lets ids stand in for arrival time (production ingestion ids are
    * arrival-ordered). Shared by the streamed index dedup (q99) and the
    * streamed cross-modal dedup (q117). */
  private def stageOrderedChunks(df: DataFrame, chunks: Int,
      stagedDir: String, tmpRoot: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    // FIXTURE PLUMBING ONLY: the unpartitioned ntile window funnels the
    // corpus through ONE partition by construction — acceptable here
    // because this stages a test/bench replay, never an operator path. Do
    // not copy this pattern into an operator; rank-then-limit or a keyed
    // window is the scale-safe shape.
    val chunked = df.withColumn("chunk",
      ntile(chunks).over(Window.orderBy(col("doc_id"))) - 1)
    val (fs, stagedP) = hfs(stagedDir)
    fs.mkdirs(stagedP)
    val base = System.currentTimeMillis()
    for (i <- 0 until chunks) {
      val tmp = s"$tmpRoot/tmp$i"
      chunked.filter(col("chunk") === i).drop("chunk")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .filter(_.getPath.getName.endsWith(".parquet"))
      require(part.length == 1, s"expected one staged file, got " +
        part.map(_.getPath.getName).mkString("[", ", ", "]"))
      val dst = new org.apache.hadoop.fs.Path(s"$stagedDir/chunk$i.parquet")
      require(fs.rename(part.head.getPath, dst),
        s"staging rename failed: ${part.head.getPath} -> $dst")
      fs.setTimes(dst, base + i * 2000, -1)
      deleteRecursively(tmp)
    }
  }

  /** Re-execution guard for the foreachBatch state appenders (q88, q99,
    * q117): their per-commit writes are blind `mode("append")` parquet
    * appends — NOT idempotent if Spark ever re-executes a micro-batch.
    * Safe today only because every run starts from a FRESH checkpoint
    * (deleted in `finally`) and a failed batch fails the whole bounded
    * query, so no restart path exists. This require makes that invariant
    * explicit: a re-delivered batchId fails loudly instead of silently
    * double-appending state. Before lifting any of these jobs to a
    * RESTARTABLE stream, key the state versions off the supplied batchId
    * (idempotent overwrite-per-version, the forest/vN pattern) instead of
    * relying on this guard. */
  private def requireFreshBatch(
      lastBatchId: java.util.concurrent.atomic.AtomicLong, id: Long): Unit =
    require(lastBatchId.getAndSet(id) < id,
      s"micro-batch $id re-executed — append-only state writes are not " +
        "idempotent; key state versions off batchId before making this " +
        "stream restartable")

  /** Run independent driver-side actions CONCURRENTLY (guide §2.6) and
    * wait for ALL of them to settle before rethrowing the first failure —
    * callers' finally blocks delete state dirs and unpersist frames, so
    * no action may still be in flight when control returns. Use only for
    * actions whose inputs are already materialized (persisted frames'
    * cached blocks, written state): separate Spark actions do NOT share
    * un-materialized shuffle stages, so racing two consumers of an
    * un-built persisted frame duplicates its whole upstream pipeline
    * (measured on the q117 commit body: +35 jobs/lap and +5 s wall). */
  private def concurrently(work: Seq[() => Unit]): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val settled = work.map(w => Future(w()))
      .map(f => scala.util.Try(Await.result(f, Duration.Inf)))
    settled.foreach(_.get)
  }

  /** Driver-local snapshot rows back to a DataFrame, SINGLE-partition:
    * every streaming operator's returned frame is a bounded driver-side
    * snapshot (collected behind a loud maxRows cap), but
    * `createDataFrame` slices a local list over defaultParallelism — so
    * each downstream consumer (the final orderBy, the cq statistics, the
    * bench's noop write) scheduled 32 near-empty tasks PER STAGE over a
    * few dozen rows (opjobs q54: five 32-task jobs after the stream).
    * One partition is the scale-honest width here: the row count is
    * capped, the data is already on the driver. */
  private def localFrame(spark: SparkSession,
      rows: Seq[Row], schema: StructType): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema).coalesce(1)
  }

  /** Run `body` under a UI/trace job description (guide §1.5): the
    * foreachBatch operators chain many small jobs per commit, and the
    * label is what lets a job-grain trace (StageProbe `opjobs`) say which
    * phase of the commit each job belongs to. Thread-local, so it holds
    * only for actions `body` itself triggers. */
  private def labeled[T](spark: SparkSession, desc: String)(body: => T): T = {
    spark.sparkContext.setJobDescription(desc)
    try body finally spark.sparkContext.setJobDescription(null)
  }

  private[graft] def deleteRecursively(path: String): Unit = {
    val (fs, p) = hfs(path)
    if (fs.exists(p)) { fs.delete(p, /*recursive=*/ true); () }
  }

  /** Shared driver-facing bounded-run shape: start `streaming` into a
    * fresh complete-mode memory sink, run to completion (`AvailableNow`),
    * snapshot the sink into a local frame (capped loudly — memory sinks
    * are aggregates bounded by key cardinality, never stream volume), and
    * ALWAYS drop the temp view + checkpoint so a long session of retries
    * accumulates nothing. State partitions sized to the aggregate via
    * [[withStreamShuffle]]. */
  private def runBoundedToFrame(spark: SparkSession, streaming: DataFrame,
      name: String, ckpt: String, maxRows: Int = 1000000): DataFrame =
    withStreamShuffle(spark, 8) {
      val q = streaming.writeStream
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("memory").queryName(name)
        .start()
      try {
        q.awaitTermination()
        val rows = spark.table(name).limit(maxRows + 1).collect()
        require(rows.length <= maxRows,
          s"$name aggregate exceeds $maxRows rows — widen the window")
        val schemaOut = spark.table(name).schema
        localFrame(spark, rows.toSeq, schemaOut)
      } finally {
        spark.catalog.dropTempView(name)
        deleteRecursively(ckpt) // each invocation is a fresh bounded run
      }
    }

  /** Windowed streaming reduce surfaced to the driver harness (C2, the HOP
    * `mapred.reduce.window` loop, ReduceTask.java:595-629): the events table
    * streamed incrementally (`maxFilesPerTrigger=2` over 8 staged files = 4
    * genuine stateful micro-batches; trigger overhead is fixed per commit,
    * so halving commits halves the scale-independent cost) through an
    * event-time tumbling-window count/sum, run to completion with
    * `AvailableNow`. The
    * final frame is deterministic — event-time windows are
    * chunking-independent — so the same tumbling-window SQL oracle-checks
    * the streaming tier end-to-end (q51).
    *
    * The memory sink in complete mode is the snapshot contract (driver-side
    * frame, like [[onlineAggregate]]): its size is bounded by window-count ×
    * event-type cardinality (time-range/5min × ~5), NOT by the stream
    * volume — at 100 TB the same plan with a parquet sink + append mode +
    * watermark is the production shape ([[windowedCounts]] carries the
    * watermark already; StreamingSpec proves append-mode parity). Sum runs
    * over DECIMAL so the result is shuffle- and chunk-order-independent. */
  def streamedWindowedCounts(spark: SparkSession, dir: String): DataFrame = {
    val staged = stageChunks(spark, dir, "events")
    val schema = stagedSchema(spark, staged)
    val name = s"q51_stream_${runSeq.incrementAndGet()}"
    val ckpt = s"target/streamstage/ckpt/$name"
    val agg = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "2").parquet(staged)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_v"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_v"))
    runBoundedToFrame(spark, agg, name, ckpt)
      .orderBy(col("w_start"), col("event_type"))
  }

  /** Online aggregation surfaced to the driver harness (C4,
    * ReduceTask.java:631-669 / OutputFile.Type SNAPSHOT): the lineitem table
    * streamed 2 files per trigger through the q01 pricing-summary aggregate
    * via [[onlineAggregate]] — progressive cumulative snapshots, final frame
    * exact. Returns the final (progress = 1.0) snapshot as a DataFrame, so
    * the q01 SQL oracle-checks that online aggregation converges to the
    * batch answer (q52). */
  def streamedOnlineSummary(spark: SparkSession, dir: String): DataFrame = {
    val staged = stageChunks(spark, dir, "lineitem")
    val schema = stagedSchema(spark, staged)
    val agg = (df: DataFrame) => df
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)"))
          .cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double").as("sum_base_price"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
    val snaps = withStreamShuffle(spark, 8) {
      onlineAggregate(spark, staged, schema, agg, filesPerTrigger = 2)
    }
    require(snaps.nonEmpty && snaps.last.progress >= 1.0,
      s"online aggregation did not reach progress 1.0 (got ${snaps.map(_.progress)})")
    val outSchema = agg(spark.read.parquet(staged)).schema
    localFrame(spark, snaps.last.rows, outSchema)
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** The CQ monitoring query surfaced to the driver harness (C11,
    * examples/CQ.java:482-499): per (5-minute window, event type) value
    * averages, flagged where a type's average exceeds the cross-type mean
    * plus two sample standard deviations — [[cqAlerts]]'s logic on the
    * event-time window form. This is the BATCH twin ([[streamedCqMonitor]]
    * ships as q54 and must agree with it — StreamingSpec checks parity).
    *
    * Exact cross-engine determinism for the statistics: the per-key average
    * is a DECIMAL sum with ONE double division; the cross-key mean and
    * sum-of-squared-deviations are LEFT FOLDS over the SORTED list of
    * averages (`sort_array` + `aggregate`, ≙ DuckDB `list_sort` +
    * `list_reduce`), so both engines run the identical IEEE operation
    * sequence — order-dependent double aggregation is the one thing a plain
    * AVG/STDDEV over a shuffle cannot promise. The per-window list is
    * bounded by event-type cardinality, not stream volume. */
  def cqMonitor(spark: SparkSession, dir: String): DataFrame =
    cqStats(perKeyWindowAverages(graft.Tables.events(spark, dir)))

  /** [[cqMonitor]] run as a REAL streaming query (q54): the events table
    * streamed incrementally (4 micro-batches, like
    * [[streamedWindowedCounts]]) through the per-(window, key) average — a genuine
    * stateful streaming aggregation in complete mode, run to completion with
    * `AvailableNow` — then the cross-key mean+2σ flagging applied to the
    * emitted window frame, exactly where the reference computes it (the CQ
    * reducer flags over the window's emitted aggregates, CQ.java:482-499).
    * The per-key average is a decimal sum + one double division, so the
    * final streamed frame equals the batch frame and the same SQL oracle
    * gates both. */
  def streamedCqMonitor(spark: SparkSession, dir: String): DataFrame = {
    val staged = stageChunks(spark, dir, "events")
    val schema = stagedSchema(spark, staged)
    val name = s"q54_cq_${runSeq.incrementAndGet()}"
    val ckpt = s"target/streamstage/ckpt/$name"
    cqStats(runBoundedToFrame(spark,
      perKeyWindowAverages(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "2").parquet(staged)),
      name, ckpt))
  }

  /** Per-(5-minute window, event type) value averages — the windowed
    * reducer emission the CQ statistics run over. Decimal sum + ONE double
    * division, so batch and streamed-complete-mode frames are bit-equal. */
  private def perKeyWindowAverages(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "5 minutes"), col("event_type").as("key"))
      .agg((sum(col("value").cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("avg_v"))
      .select(col("window.start").as("w_start"), col("key"), col("avg_v"))

  /** Cross-key mean+2σ alert flags over the emitted per-key window frame
    * (deterministic fold-over-sorted-list statistics — see [[cqMonitor]]). */
  private def cqStats(pk: DataFrame): DataFrame = {
    val g = pk.groupBy(col("w_start"))
      .agg(sort_array(collect_list(col("avg_v"))).as("xs"),
        count(lit(1)).as("n"))
      .withColumn("mu", expr("aggregate(xs, 0D, (a, x) -> a + x) / n"))
      .withColumn("sigma", expr(
        """CASE WHEN n > 1 THEN
          |  sqrt(aggregate(transform(xs, x -> (x - mu) * (x - mu)),
          |       0D, (a, x) -> a + x) / (n - 1))
          |ELSE 0D END""".stripMargin))
      .select(col("w_start"), col("mu"), col("sigma"))
    pk.join(g, "w_start")
      .select(col("w_start"), col("key"), col("avg_v"),
        when(col("avg_v") > col("mu") + lit(2.0) * col("sigma"), 1)
          .otherwise(0).as("alert"))
      .orderBy(col("w_start"), col("key"))
  }

  /** Inter-job pipelining surfaced to the driver harness (C7,
    * PipelineMapTask.java:52): the events table streamed through TWO
    * chained streaming jobs via [[chainedQueries]] — stage 1 filters and
    * projects to a replayable parquet directory whose files stage 2
    * consumes as they appear, aggregating per event type. The final frame
    * is chunking-independent, so plain composed SQL oracle-checks the
    * pipelined path end-to-end (q53). Per-run mid/checkpoint dirs are
    * deleted after the snapshot so repeated invocations stay independent. */
  def streamedPipeline(spark: SparkSession, dir: String): DataFrame = {
    val staged = stageChunks(spark, dir, "events")
    val schema = stagedSchema(spark, staged)
    val run = runSeq.incrementAndGet()
    val mid = s"target/streamstage/mid/run$run"
    val ckpt = s"target/streamstage/ckpt/pipeline$run"
    val name = s"q53_pipeline_$run"
    try withStreamShuffle(spark, 8) {
      val out = chainedQueries(spark, staged, schema, mid, ckpt,
        df => df.filter(col("event_type") =!= "view")
          .select(col("event_type"), col("value")),
        df => df.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_v")),
        queryName = name)
      val rows = out.collect() // grouped by event type: a handful of rows
      val schemaOut = out.schema
      localFrame(spark, rows.toSeq, schemaOut)
        .orderBy(col("event_type"))
    } finally {
      // the view may not exist if stage 1/2 failed before the sink started
      try spark.catalog.dropTempView(name)
      catch { case _: Exception => () }
      deleteRecursively(ckpt)
      deleteRecursively(mid)
    }
  }

  /** A [[streamedCurationFunnel]] run: per-commit cumulative funnel
    * snapshots plus the emitted frame's schema and the run's state root
    * (exposed for state-shape inspection when `keepState` was set — the
    * default run deletes it). */
  private[graft] case class FunnelRun(snapshots: Seq[Snapshot],
      schema: StructType, stateRoot: String)

  /** An append-only ADDITIVE state store with threshold-triggered,
    * crash-safe compaction (VERDICT r16 #1) — the funnel's df/docLen
    * delta dirs and loser set. Layout: generation directories
    * `root/gN`; appends land in the highest COMMITTED generation (g0 is
    * implicitly committed — the store's seed); [[compact]] rewrites the
    * current generation through `fold` (sum the deltas / distinct the
    * set — any aggregation whose output rows are valid input rows) as a
    * staged overwrite of `g(N+1)`, flips visibility with an atomic
    * `_graft_state_commit` marker (the index protocol's rename rule:
    * parquet readers skip `_`-prefixed files), then drops the old
    * generation. A crash before the marker leaves a torn, INVISIBLE
    * g(N+1) — readers and appenders keep using gN, and the next compact
    * harmlessly overwrites the torn stage; a crash after the marker
    * before the delete leaves two committed generations — the reader
    * takes the max and the next compact's GC sweep drops the stale one.
    * Single-writer by contract (the funnel's foreachBatch commits are
    * sequential), like the persisted-index protocol it mirrors.
    *
    * Without compaction the gate's read cost creeps back in
    * file-listing/union form: one increment-sized parquet append per
    * commit, summed in full at EVERY gate read, forever — thousands of
    * files within a year of daily commits. With it, the current
    * generation holds one folded base plus at most `compactEvery`
    * deltas. */
  private[graft] final class DeltaState(spark: SparkSession, root: String,
      fold: DataFrame => DataFrame,
      targetFoldBytes: Long = 128L << 20) {
    require(targetFoldBytes > 0,
      s"targetFoldBytes must be positive: $targetFoldBytes")
    private def fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    private def committedGens: Seq[Int] = {
      val dir = new org.apache.hadoop.fs.Path(root)
      if (!fs.exists(dir)) Seq(0)
      else {
        val gens = fs.listStatus(dir).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.matches("g\\d+"))
          .map(_.getPath.getName.drop(1).toInt)
          .filter(g => g == 0 || fs.exists(new org.apache.hadoop.fs.Path(
            s"$root/g$g/_graft_state_commit")))
        if (gens.isEmpty) Seq(0) else gens
      }
    }
    /** The generation reads and appends resolve to. */
    private[graft] def currentGen: Int = committedGens.max
    private[graft] def dir: String = s"$root/g$currentGen"
    def append(df: DataFrame): Unit =
      df.write.mode("append").parquet(dir)
    def read(): DataFrame = spark.read.parquet(dir)
    /** Fold the current generation into the next and drop the old one —
      * bit-equivalent to reading the unfolded deltas (`fold` must be
      * idempotent over its own output, which sums and distincts are). */
    def compact(): Unit = {
      val g = currentGen
      // fold width sized from the generation's on-disk bytes (the fold's
      // input bounds its output, and the deltas are the same rows the
      // fold emits): one output file per `targetFoldBytes`, floor 1.
      // The r17 hard coalesce(1) serialized the whole folded state
      // through ONE task — fine at fixture/30× megabytes, a single-task
      // bottleneck at a corpus-sized df store (ADVICE r17); the byte
      // estimate keeps the fixture's one-file fan-in bound while letting
      // a corpus-scale fold fan out.
      val bytes = fs.getContentSummary(
        new org.apache.hadoop.fs.Path(dir)).getLength
      val width = math.max(1L,
        (bytes + targetFoldBytes - 1) / targetFoldBytes).toInt
      fold(read()).coalesce(width)
        .write.mode("overwrite").parquet(s"$root/g${g + 1}")
      val tmp = new org.apache.hadoop.fs.Path(
        s"$root/g${g + 1}", "._graft_state_commit.tmp")
      val out = fs.create(tmp, true)
      try out.write(s"folds:g$g".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      val dst = new org.apache.hadoop.fs.Path(
        s"$root/g${g + 1}", "_graft_state_commit")
      if (fs.exists(dst)) fs.delete(dst, false)
      require(fs.rename(tmp, dst),
        s"atomic state-generation marker rename failed under $root")
      for (m <- committedGens if m < g + 1)
        fs.delete(new org.apache.hadoop.fs.Path(s"$root/g$m"), true)
    }
  }

  /** Continuous curation (q88): the q81 funnel as a REAL incremental
    * streaming job — the documents table streamed 2 files per trigger
    * (4 micro-batches) through a `foreachBatch` stage that maintains three
    * APPEND-ONLY state stores and re-emits the cumulative per-source
    * funnel after every commit:
    *  - a flag store `(doc_id, source, digest, f_q, f_lang)` — one compact
    *    row per seen doc, appended once;
    *  - the shingle candidate index `(doc_id, s)` — the same index
    *    [[graft.operators.Dedup.incrementalDedup]] queries;
    *  - the accumulated near-dup loser set, grown per commit by
    *    [[graft.operators.Dedup.incrementalPairsOf]] pairs of the NEW docs
    *    against the accumulated index — per-commit cost tracks the
    *    increment × df-bounded posting lists, never the accumulated
    *    corpus squared.
    * Exact dedup recomputes min-doc_id-per-digest over the flag store each
    * commit and the near-dup loser rule (drop the larger id) names the
    * same doc whichever pair member arrives later, so the cumulative frame
    * converges to the batch answer under ANY arrival order. The final
    * commit EQUALS the batch funnel whenever the df cap never binds
    * mid-stream (fixture max shingle df is 9 ≪ 100, so q81's SQL oracle
    * gates this query bit-for-bit). Where the cap does bind at production
    * scale, at-detection dfs are ≤ the final batch dfs, so the streamed
    * loser set is a SUPERSET of the batch one — strictly better recall,
    * the right failure direction for a dedup gate.
    *
    * State is the dedup INDEX (digests, gated shingles, flag rows), never
    * the corpus text — the footprint production incremental dedup
    * carries; the per-commit emission is the funnel frame, bounded by
    * source cardinality. */
  private[graft] def runStreamedCurationFunnel(spark: SparkSession,
      dir: String, qualityMin: Double = 0.5, lang: String = "en",
      threshold: Double = 0.8, maxDf: Int = 100,
      maxFunnelRows: Int = 100000, filesPerTrigger: Int = 2,
      compactEvery: Int = 8, keepState: Boolean = false,
      gate: String = "auto",
      gateStateBudgetBytes: Long = 32L << 20): FunnelRun = {
    // THE GATE IS SIZE-ADAPTIVE (r17, from the whole-op A/B the r16
    // verdict asked for): the maintained delta-state gate trades a
    // full-index re-aggregation per commit for two delta appends + two
    // delta-sum reads — a trade that WINS when the gate input is
    // data-bound (−12% at the 30× binding cap, SCALE_r17 session A;
    // unboundedly more at 100 TB, where re-aggregating the posting
    // index per commit is absurd) and LOSES when it is job-bound
    // (+17% whole-op at sf0.1, session E: ~12 extra fixture-scale jobs
    // per run against a megabytes-sized aggregation). "auto" picks per
    // commit: while the accumulated index sits under
    // `gateStateBudgetBytes` (~16 B/posting row; default 32 MiB — the
    // measured sf0.1-vs-30× crossover splits at ~4 MB vs ~125 MB) the
    // gate re-aggregates and the delta stores stay EMPTY; the first
    // commit over budget BOOTSTRAPS them by folding the whole
    // accumulated index once (the same aggregation a recomputed commit
    // pays anyway), and every later commit appends increment-sized
    // deltas. "maintained"/"recomputed" pin either shape for
    // attribution (StageProbe `funnelop`); all three are spec-pinned
    // snapshot-identical.
    require(gate == "auto" || gate == "maintained" || gate == "recomputed",
      s"gate must be 'auto', 'maintained' or 'recomputed', got '$gate'")
    require(gateStateBudgetBytes > 0,
      s"gateStateBudgetBytes must be positive: $gateStateBudgetBytes")
    // per-trigger increment width — a PARAMETER since r17 (VERDICT r16
    // #5: the literal 2 drove three state-append widths and the commit
    // count; a deployment widening its triggers had to edit source). It
    // sizes the micro-batches AND the loser/df/len state-append widths
    // below, which must track the increment size, not the shuffle
    // setting. compactEvery ≥ 1 folds the df/len/loser delta stores
    // every N commits ([[DeltaState]] — VERDICT r16 #1); the fixture
    // replay (4 commits at the default width) stays below the default
    // threshold, so q88's per-commit plans are unchanged.
    require(filesPerTrigger >= 1,
      s"filesPerTrigger must be >= 1: $filesPerTrigger")
    require(compactEvery >= 0,
      s"compactEvery must be >= 1 commits, or 0 to disable: $compactEvery")
    val staged = stageChunks(spark, dir, "documents")
    val schema = stagedSchema(spark, staged)
    val run = runSeq.incrementAndGet()
    val stateRoot = s"target/streamstage/funnel/run$run"
    val ckpt = s"target/streamstage/ckpt/funnel$run"
    // ONE kind-partitioned state dir for the two plain append families
    // (the q117/q99 idiom): the flag rows and the shingle index were two
    // separate write jobs + commit protocols per commit; the union write
    // keeps each family's rows identical and readers directory-pruned.
    // The three DeltaState stores below keep their own generation dirs —
    // that protocol owns its layout.
    val stateDir = s"$stateRoot/state"
    val flagsDir = s"$stateDir/kind=flags"
    val indexDir = s"$stateDir/kind=index"
    // MAINTAINED df/docLen state (r16, VERDICT r15 #3): the r15 anatomy
    // measured the per-commit full-index df aggregation at 52% of q88's
    // commit body — yet df counts and per-doc shingle lengths are
    // ADDITIVE under the append-only protocol, so each commit appends
    // the increment's per-shingle delta (s, dc) and per-doc lengths
    // (doc_id, c) and the gate reads a sum over deltas (state rows ~
    // distinct shingles per increment) instead of re-shuffling the full
    // (doc, shingle) posting index. Spec-pinned equal to the recomputed
    // gate (DedupSimilaritySpec's convergence differential). Since r17
    // the three delta stores are [[DeltaState]] generations, compacted
    // every `compactEvery` commits so the gate's file fan-in stays
    // bounded under long-lived streams.
    val losersState = new DeltaState(spark, s"$stateRoot/losers",
      _.distinct())
    val dfState = new DeltaState(spark, s"$stateRoot/df",
      _.groupBy(col("s")).agg(sum(col("dc")).as("dc")))
    val lenState = new DeltaState(spark, s"$stateRoot/len",
      _.groupBy(col("doc_id")).agg(sum(col("c")).as("c")))
    val files = hfs(staged) match { case (fs, p) =>
      fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet")) }
    val totalChunks = math.ceil(files.toDouble / filesPerTrigger)
    val snapshots = scala.collection.mutable.ArrayBuffer.empty[Snapshot]
    @volatile var outSchema: StructType = null
    // withStreamShuffle serves a DIFFERENT purpose here than in the
    // stateful queries: there is no streaming state (append mode +
    // foreachBatch), but the per-commit batch jobs chain ~10 small
    // shuffles and append parquet state — at fixture scale, 32-way tasks
    // and 32-file state appends cost MORE than they parallelize (measured
    // at sf0.1: 36 s at 32 partitions vs 27 s at 8). At production scale
    // the commit's joins are corpus-sized and the session's own shuffle
    // setting should win: the helper only ever LOWERS, so deployments
    // size it by raising this floor, not fighting a hardcode.
    try withStreamShuffle(spark, 8) {
      val lastBatchId = new java.util.concurrent.atomic.AtomicLong(-1L)
      val commitsSinceCompact = new java.util.concurrent.atomic.AtomicInteger(0)
      // auto-gate accounting, driver-side (the funnel is a bounded run:
      // state root and counters are per-run; requireFreshBatch refuses
      // replays within it): accumulated index posting rows, and whether
      // the delta stores were bootstrapped yet
      val idxRowsSeen = new java.util.concurrent.atomic.AtomicLong(0L)
      val bootstrapped = new java.util.concurrent.atomic.AtomicBoolean(
        gate == "maintained")
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", filesPerTrigger.toString)
        .parquet(staged)
        .writeStream
        .outputMode("append")
        .queryName(s"q88_funnel_$run") // listener-visible (StreamingSpec
        // bounds the per-commit cost like q51's)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, id: Long) =>
          if (!batch.isEmpty) {
            requireFreshBatch(lastBatchId, id)
            val docs = batch.select(col("doc_id"), col("source"),
              col("lang"), col("n_chars"), col("text"))
            // per-row flags for the increment, appended once per doc —
            // quality as an ADDED column (withQualityScore), so the flag
            // stage is a zero-shuffle map instead of a per-commit join
            val flagFrame = graft.operators.TextAnalysis
              .withQualityScore(docs)
              .select(col("doc_id"), col("source"), md5(col("text")).as("h"),
                when(col("quality") >= qualityMin, 1).otherwise(0).as("f_q"),
                when(col("lang") === lang, 1).otherwise(0).as("f_lang"))
            // candidate index += the increment's shingles; the SAME
            // materialized frame feeds the df/docLen delta appends below
            // (persist pins one evaluation across the three writes)
            val incSh = graft.operators.Dedup
              .shinglesOf(docs.select(col("doc_id"), col("text")))
              .persist()
            try {
              // the loser frame leaves incrementalPairsOf at shuffle
              // width (8 mostly-empty files per commit that every later
              // emit re-lists); state-append width should track the
              // INCREMENT size — the trigger's input file count — not
              // the shuffle setting. Measured (r15 q88 anatomy, same-
              // session interleaved A/B at sf0.1): ~6% off the whole op.
              // The df/len deltas are increment-sized too.
              val losersCoalesce = filesPerTrigger
              labeled(spark, "q88: flags + index append") {
                flagFrame.withColumn("kind", lit("flags"))
                  .unionByName(incSh.withColumn("kind", lit("index")),
                    allowMissingColumns = true)
                  .coalesce(losersCoalesce) // increment width, as ever
                  .write.mode("append").partitionBy("kind")
                  .parquet(stateDir)
              }
              // explicit schemas on the per-commit state reads: the
              // index/flag dirs grow one file set per commit, and
              // schema-less reads re-infer footers across all of them
              // every commit
              val index = spark.read.schema(incSh.schema).parquet(indexDir)
              // the auto gate's pick (scaladoc above): one cheap count
              // over the persisted increment keeps the accumulated-rows
              // estimate; maintained wins once the index is data-bound
              // once over budget the gate never flips back (the index
              // only grows), so the count is paid only in the cheap
              // under-budget regime — a decade run prices its increments
              // exactly once, at the crossing
              val useMaintained = gate == "maintained" ||
                (gate == "auto" && (bootstrapped.get() ||
                  idxRowsSeen.addAndGet(labeled(spark, "q88: gate count") {
                    incSh.count() }) * 16L >
                    gateStateBudgetBytes))
              if (useMaintained) {
                if (!bootstrapped.getAndSet(true)) {
                  // first over-budget commit: fold the WHOLE accumulated
                  // index into the delta stores once — the same
                  // aggregation the recomputed gate pays per commit —
                  // so later commits append increment-sized deltas onto
                  // complete history
                  dfState.append(index.groupBy(col("s"))
                    .agg(count(lit(1)).as("dc")).coalesce(losersCoalesce))
                  lenState.append(index.groupBy(col("doc_id"))
                    .agg(count(lit(1)).as("c")).coalesce(losersCoalesce))
                } else {
                  dfState.append(incSh.groupBy(col("s"))
                    .agg(count(lit(1)).as("dc")).coalesce(losersCoalesce))
                  lenState.append(incSh.groupBy(col("doc_id"))
                    .agg(count(lit(1)).as("c")).coalesce(losersCoalesce))
                }
              }
              // near-dup losers involving the increment vs the whole
              // index: the posting join still reads the full index (the
              // intersection evidence lives there), but the df gate and
              // docLen come from the MAINTAINED sums — per-commit
              // aggregation input shrinks from every (doc, shingle) row
              // ever shipped to the delta state
              val pairs =
                if (useMaintained)
                  graft.operators.Dedup.incrementalPairsOf(index, incSh,
                    threshold, maxDf, docLenOpt = Some(lenState.read()),
                    dfOpt = Some(dfState.read().groupBy(col("s"))
                      .agg(sum(col("dc")).as("df"))))
                else // the r15 twin: full-index re-aggregation per commit
                  graft.operators.Dedup.incrementalPairsOf(index, incSh,
                    threshold, maxDf)
              labeled(spark, "q88: pairs + losers append") {
                losersState.append(pairs
                  .select(col("d2").as("doc_id"))
                  .coalesce(losersCoalesce))
              }
              if (compactEvery > 0 &&
                  commitsSinceCompact.incrementAndGet() >= compactEvery) {
                commitsSinceCompact.set(0)
                labeled(spark, "q88: state compact") {
                  if (bootstrapped.get) {
                    dfState.compact(); lenState.compact()
                  }
                  losersState.compact()
                }
              }
            } finally { incSh.unpersist(); () }
            // emit the cumulative funnel over the flag store
            val flags = spark.read.schema(flagFrame.schema).parquet(flagsDir)
            val keepers = flags.groupBy(col("h"))
              .agg(min(col("doc_id")).as("doc_id"))
              .select(col("doc_id"), lit(1).as("f_ex"))
            val losers = losersState.read().distinct()
              .withColumn("is_loser", lit(1))
            val out = graft.operators.Curation.funnelAgg(
              flags
                .join(keepers, Seq("doc_id"), "left")
                .join(losers, Seq("doc_id"), "left")
                .select(col("source"),
                  coalesce(col("f_ex"), lit(0)).as("f_ex"),
                  when(col("is_loser").isNull, 1).otherwise(0).as("f_near"),
                  col("f_q"), col("f_lang")))
            outSchema = out.schema
            val rows = labeled(spark, "q88: funnel emit") {
              out.limit(maxFunnelRows + 1).collect()
            }
            require(rows.length <= maxFunnelRows,
              s"funnel commit $id exceeds $maxFunnelRows rows")
            snapshots.synchronized {
              snapshots += Snapshot(
                math.min((id + 1) / totalChunks, 1.0), rows.toSeq)
            }
          }
          ()
        }
        .start()
      q.awaitTermination()
      FunnelRun(snapshots.toSeq, outSchema, stateRoot)
    } finally {
      deleteRecursively(ckpt)
      if (!keepState) deleteRecursively(stateRoot)
    }
  }

  /** The final cumulative frame of [[runStreamedCurationFunnel]] (q88) —
    * oracle-gated by the same SQL as the batch funnel (q81). */
  def streamedCurationFunnel(spark: SparkSession, dir: String,
      qualityMin: Double = 0.5, lang: String = "en",
      maxDf: Int = 100): DataFrame = {
    val run = runStreamedCurationFunnel(spark, dir, qualityMin, lang,
      maxDf = maxDf)
    require(run.snapshots.nonEmpty && run.snapshots.last.progress >= 1.0,
      s"funnel stream did not complete " +
        s"(progress ${run.snapshots.map(_.progress)})")
    localFrame(spark, run.snapshots.last.rows, run.schema)
      .orderBy(col("source"))
  }

  /** Streaming exact dedup: drop records whose fingerprint was already seen
    * within the watermark horizon (state is bounded by the horizon — the
    * only way streaming dedup survives an unbounded stream). Expects
    * columns `ts` (event time) and `fp` (the dedup key, e.g. a
    * fingerprint from TextAnalysis.fingerprints). */
  def streamingDedup(stream: DataFrame, horizon: String): DataFrame =
    stream.withWatermark("ts", horizon).dropDuplicates("fp")

  /** Streaming near-dup ingestion against a DURABLE LSH index (q99) — the
    * continuous form of the daily-batch dedup (q87/q94): documents arrive
    * in micro-batches, each batch is checked against the index the shipped
    * corpus seeded, verdicts are appended, and the batch's own signatures
    * JOIN the index so later arrivals dedup against it. Unlike the
    * df-gated shingle pipeline — whose gate is corpus-relative and
    * therefore changes as the stream grows — every piece of state here is
    * per-document (8 MinHash signatures → 4 band buckets + one digest per
    * doc), so a doc's verdict depends only on WHAT arrived before it,
    * never on how the stream was chopped into batches.
    *
    * Verdict rules mirror [[graft.operators.Dedup]]'s incremental tier:
    * the shipped corpus wins regardless of id (`exact_dup` on digest
    * match, `band_dup` on any shared LSH band bucket), and within the
    * increment the smaller id wins — so with the replay staged in
    * ascending id order (ids stand in for arrival order, the production
    * first-seen-wins rule) the final verdict frame is batch-boundary-free
    * and one batch SQL oracle-checks it.
    *
    * Scale shape: per commit, one batch-sized signature build (shingle
    * explode + 8-way min agg over the BATCH only), two semi-join probes
    * into the band/digest state pinned shuffle_hash (state is
    * corpus-sized; the probe side is batch-sized), and two batch-sized
    * appends. The index grows ~80 bytes/doc — the [[graft.operators.Dedup.writeDedupIndex]]
    * footprint contract — and nothing ever rescans the shipped corpus. */
  def streamedIndexDedup(spark: SparkSession, dir: String,
      chunks: Int = 5, maxVerdictRows: Int = 1000000): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val isInc = pmod(col("doc_id"), lit(10)) === 0
    val run = runSeq.incrementAndGet()
    val stateRoot = s"target/streamstage/lshindex/run$run"
    // per-run dirs hold only the MUTABLE state this run appends; the
    // shipped-corpus seed and the replay chunks are pure functions of the
    // fixture, staged once behind a freshness check (the q94
    // ensureFixtureIndex line) instead of re-derived per invocation —
    // the seed signature build over 90% of the corpus was the largest
    // scale-independent cost of every q99 lap
    // ONE kind-partitioned state dir (the q117 idiom): the three
    // per-commit writes (verdict rows, band increments, hash increments)
    // were three write jobs + three commit protocols per commit; one
    // union write keeps each family's rows identical, readers stay
    // directory-pruned to their kind= subdir, and coalesce(1) keeps the
    // appends increment-width (the band/hash increments previously
    // appended at shuffle width — 8 near-empty files per commit that
    // every later probe re-listed).
    val stateDir = s"$stateRoot/state"
    val bandsDir = s"$stateDir/kind=bands"
    val hashesDir = s"$stateDir/kind=hashes"
    val verdictDir = s"$stateDir/kind=verdicts"
    val ckpt = s"target/streamstage/ckpt/lsh$run"
    val D = graft.operators.Dedup
    try withStreamShuffle(spark, 8) {
      // durable index seeded from the shipped corpus (inc=0 rows win
      // against any increment id)
      // derivation stamp: BUMP when shinglesOf/signaturesOf/bandBuckets
      // (or this seed's 90%-split / schema) change — the staged seed must
      // never outlive the pipeline that derived it (ADVICE r18)
      val seedRoot = stagedFixtureDir(spark, dir, "lshseed",
        derivation = "shingle3-minhashK8-band4-mod10seed-v1") { out =>
        val prior = docs.filter(!isInc)
        D.bandBuckets(D.signaturesOf(D.shinglesOf(prior)))
          .withColumn("inc", lit(0))
          .write.mode("overwrite").parquet(s"$out/bands")
        prior.select(col("doc_id"), md5(col("text")).as("h"))
          .withColumn("inc", lit(0))
          .write.mode("overwrite").parquet(s"$out/hashes")
      }
      val inc = docs.filter(isInc)
      val stagedDir = stageOrderedChunksCached(spark, dir, "lshinc", inc,
        chunks)
      // schema-only empty twins of the two state families — per-run
      // append dirs materialize on first append ([[stateOrEmpty]])
      val e = docs.limit(0)
      val eBands = D.bandBuckets(D.signaturesOf(D.shinglesOf(e)))
        .withColumn("inc", lit(1))
      val eHashes = e.select(col("doc_id"), md5(col("text")).as("h"))
        .withColumn("inc", lit(1))
      // verdict-family schema twin (nullable like the parquet it reads
      // back — the kind= data files carry the other families' columns as
      // nulls, so the final read MUST project by explicit schema)
      val eVerd = StructType(e.select(col("doc_id"),
          lit(0).as("exact_dup"), lit(0).as("band_dup"), lit(0).as("keep"))
        .schema.map(_.copy(nullable = true)))
      val seedBands = spark.read.schema(eBands.schema)
        .parquet(s"$seedRoot/bands")
      val seedHashes = spark.read.schema(eHashes.schema)
        .parquet(s"$seedRoot/hashes")
      val schema = stagedSchema(spark, stagedDir)
      val lastBatchId = new java.util.concurrent.atomic.AtomicLong(-1L)
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(stagedDir)
        .writeStream
        .outputMode("append")
        .queryName(s"q99_lsh_$run")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, id: Long) =>
          if (!batch.isEmpty) {
            requireFreshBatch(lastBatchId, id)
            val b = batch.select(col("doc_id"), col("text")).persist()
            try {
              val bBands = graft.operators.Dedup.bandBuckets(
                graft.operators.Dedup.signaturesOf(
                  graft.operators.Dedup.shinglesOf(b)))
                .withColumn("inc", lit(1)).persist()
              val bHashes = b
                .select(col("doc_id"), md5(col("text")).as("h"))
                .withColumn("inc", lit(1)).persist()
              try {
                // state BEFORE this batch ∪ the batch itself: the
                // o.inc=0-or-smaller-id predicate resolves both the
                // cross-batch and the within-batch precedence. State =
                // the staged seed ∪ this run's appended increments.
                val allBands = seedBands
                  .unionByName(stateOrEmpty(spark, bandsDir, eBands.schema))
                  .unionByName(bBands)
                val allHashes = seedHashes
                  .unionByName(stateOrEmpty(spark, hashesDir, eHashes.schema))
                  .unionByName(bHashes)
                val ex = bHashes.as("n")
                  .join(allHashes.as("o").hint("shuffle_hash"),
                    col("n.h") === col("o.h") && (col("o.inc") === 0 ||
                      col("o.doc_id") < col("n.doc_id")), "left_semi")
                  .select(col("doc_id"))
                val bd = bBands.as("n")
                  .join(allBands.as("o").hint("shuffle_hash"),
                    col("n.band") === col("o.band") &&
                      col("n.bh") === col("o.bh") && (col("o.inc") === 0 ||
                      col("o.doc_id") < col("n.doc_id")), "left_semi")
                  .select(col("doc_id")).distinct()
                val verd = b.select(col("doc_id"))
                  .join(ex.withColumn("ex", lit(1)).hint("shuffle_hash"),
                    Seq("doc_id"), "left")
                  .join(bd.withColumn("bd", lit(1)).hint("shuffle_hash"),
                    Seq("doc_id"), "left")
                  .select(col("doc_id"),
                    when(col("ex").isNotNull, 1).otherwise(0)
                      .as("exact_dup"),
                    when(col("bd").isNotNull, 1).otherwise(0)
                      .as("band_dup"))
                  .withColumn("keep",
                    when(col("exact_dup") + col("band_dup") > 0, 0)
                      .otherwise(1))
                // the commit's three durable writes in ONE union job
                // (kind-partitioned — see stateDir above): the verdict
                // rows, and the index += the WHOLE batch (dups included:
                // later arrivals must match the first-seen copy even
                // when a middle copy was dropped)
                def tagged(df: DataFrame, kind: String) =
                  df.withColumn("kind", lit(kind))
                tagged(verd, "verdicts")
                  .unionByName(tagged(bBands, "bands"),
                    allowMissingColumns = true)
                  .unionByName(tagged(bHashes, "hashes"),
                    allowMissingColumns = true)
                  .coalesce(1)
                  .write.mode("append").partitionBy("kind")
                  .parquet(stateDir)
              } finally { bBands.unpersist(); bHashes.unpersist(); () }
            } finally { b.unpersist(); () }
          }
          ()
        }
        .start()
      q.awaitTermination()
      val out = spark.read.schema(eVerd).parquet(verdictDir)
      val rows = out.limit(maxVerdictRows + 1).collect()
      require(rows.length <= maxVerdictRows,
        s"verdict frame exceeds $maxVerdictRows rows")
      require(rows.length.toLong == inc.count(),
        "one verdict per incoming doc")
      localFrame(spark, rows.toSeq, out.schema)
        .orderBy(col("doc_id"))
    } finally {
      deleteRecursively(ckpt)
      deleteRecursively(stateRoot)
    }
  }

  /** Streamed CROSS-MODAL dedup (q117) — q86's "duplicate in ANY modality"
    * decision as a continuous ingestion job: the whole corpus replays in
    * ascending-id micro-batches; each commit signs the batch in BOTH
    * modalities (MinHash band buckets + exact digest for text, 60-bit
    * blockhash fingerprint for media), probes the durable per-modality
    * indexes for cross- and within-batch matches, folds the new edges into
    * a CONTRACTED star-forest state, and re-emits the cumulative keep/drop
    * frame — revising earlier verdicts when a new arrival glues two
    * existing clusters together (the case per-commit pairwise verdicts
    * structurally miss).
    *
    * The state design that makes this scale: the cluster state is the star
    * FOREST from the previous commit's contraction, never the accumulated
    * pair list — contracting (forest ∪ new edges) yields components
    * identical to contracting every edge ever seen (a forest preserves its
    * graph's connectivity), so per-commit contraction input stays
    * near-spanning-forest-sized no matter how many pairs history holds.
    * This is [[graft.operators.Curation.partitionUnionFind]]'s identity
    * applied across TIME instead of across tasks. And because components
    * and min-id labels depend only on the edge UNION, the final frame is
    * batch-boundary-free by construction: bit-equal to the batch twin
    * [[graft.operators.Curation.crossModalStreamTwin]] on ANY chunking —
    * which is what the oracle checks.
    *
    * Scale shape per commit: two band probes + one digest probe of
    * batch-sized frames against the corpus-sized indexes (pinned
    * shuffle_hash, candidate volume bounded by bucket occupancy — the q22
    * contract), one contraction over forest+new edges, and batch-sized
    * state appends (~100 bytes/doc across the three indexes). Nothing
    * ever rescans ingested corpus text. */
  def streamedCrossModalDedup(spark: SparkSession, dir: String,
      chunks: Int = 4, maxVerdictRows: Int = 1000000): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val run = runSeq.incrementAndGet()
    val stateRoot = s"target/streamstage/crossmodal/run$run"
    // ONE state dir, hive-partitioned by family (kind=bands/hashes/fp/
    // parts): the four per-commit appends were four separate write JOBS
    // plus four commit protocols per commit — fixed per-action cost, the
    // dominant term of the streaming floor after r18 (opjobs: 46 jobs and
    // ~1 s of driver idle per commit). A single union write per commit
    // keeps each family's rows and read schema identical (readers scan
    // only their kind= subdir — directory-pruned, so a probe never pays
    // for another family's bytes), and the former `seen` family IS the
    // hashes family's doc_id column (one row per ingested doc), so it is
    // read from there instead of appended separately (guide §2.4).
    val stateDir = s"$stateRoot/state"
    val bandsDir = s"$stateDir/kind=bands"
    val hashesDir = s"$stateDir/kind=hashes"
    val fpDir = s"$stateDir/kind=fp"
    val partsDir = s"$stateDir/kind=parts"
    val ckpt = s"target/streamstage/ckpt/xmodal$run"
    val D = graft.operators.Dedup
    def textState(b: DataFrame) =
      (D.bandBuckets(D.signaturesOf(D.shinglesOf(b))),
        b.select(col("doc_id"), md5(col("text")).as("h")))
    try withStreamShuffle(spark, 8) {
      // durable state starts EMPTY (unlike q99 there is no pre-shipped
      // corpus — everything arrives streamed): state dirs materialize on
      // first append, reads substitute schema-only empty frames until
      // then ([[stateOrEmpty]]) — replacing six per-run schema-bearing
      // empty seed writes with zero I/O
      val e = docs.limit(0)
      val (eBands, eHashes) = textState(e)
      val eFp = graft.operators.Multimodal.blockhashOf(e)
      val eParts = e.select(col("doc_id"), lit("text").as("modality"))
      val eForest = e.select(col("doc_id").as("d1"), col("doc_id").as("d2"))
      val stagedDir = stageOrderedChunksCached(spark, dir, "xmodal",
        docs.select(col("doc_id"), col("text")), chunks)
      val commitSeq = new java.util.concurrent.atomic.AtomicInteger(0)
      val schema = stagedSchema(spark, stagedDir)
      val lastBatchId = new java.util.concurrent.atomic.AtomicLong(-1L)
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(stagedDir)
        .writeStream
        .outputMode("append")
        .queryName(s"q117_xmodal_$run")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, id: Long) =>
          if (!batch.isEmpty) {
            requireFreshBatch(lastBatchId, id)
            val i = commitSeq.incrementAndGet()
            val b = batch.select(col("doc_id"), col("text")).persist()
            try {
              val (bBands0, bHashes0) = textState(b)
              val bBands = bBands0.persist()
              val bHashes = bHashes0.persist()
              val bFp = graft.operators.Multimodal.blockhashOf(b).persist()
              try {
                // state BEFORE this batch ∪ the batch itself: one probe
                // resolves both cross-batch and within-batch matches
                val allBands = stateOrEmpty(spark, bandsDir, eBands.schema)
                  .unionByName(bBands)
                val allHashes = stateOrEmpty(spark, hashesDir, eHashes.schema)
                  .unionByName(bHashes)
                val allFp = stateOrEmpty(spark, fpDir, eFp.schema)
                  .unionByName(bFp)
                // no per-frame distinct here: every canon() consumer
                // below already sits under a distinct, whose partial
                // (map-side) aggregation dedups the per-shared-bucket
                // pair multiplicity before its exchange — the old inner
                // distincts were a whole extra exchange per edge frame
                // feeding another distinct (guide §2.4)
                def canon(df: DataFrame) = df.select(
                  least(col("n.doc_id"), col("o.doc_id")).as("d1"),
                  greatest(col("n.doc_id"), col("o.doc_id")).as("d2"))
                val tEdges = canon(bBands.as("n")
                  .join(allBands.as("o").hint("shuffle_hash"),
                    col("n.band") === col("o.band") &&
                      col("n.bh") === col("o.bh") &&
                      col("n.doc_id") =!= col("o.doc_id")))
                val dEdges = canon(bHashes.as("n")
                  .join(allHashes.as("o").hint("shuffle_hash"),
                    col("n.h") === col("o.h") &&
                      col("n.doc_id") =!= col("o.doc_id")))
                // 4×15-band blocked Hamming probe (exact for dist ≤ 3 by
                // pigeonhole — Dedup.bandedHammingPairs' blocking, probe
                // form: batch side vs everything, never state × state)
                def fpBands(f: DataFrame) = f.select(col("doc_id"),
                  col("phash"), explode(array((0 until 4).map(bb =>
                    struct(lit(bb).as("band"),
                      expr(s"(phash div cast(pow(2, ${15 * bb}) as bigint))" +
                        " % 32768").as("bh"))): _*)).as("e"))
                  .select(col("doc_id"), col("phash"),
                    col("e.band"), col("e.bh"))
                val mEdges = canon(fpBands(bFp).as("n")
                  .join(fpBands(allFp).as("o").hint("shuffle_hash"),
                    col("n.band") === col("o.band") &&
                      col("n.bh") === col("o.bh") &&
                      col("n.doc_id") =!= col("o.doc_id"))
                  .filter(expr("bit_count(n.phash ^ o.phash) <= 3")))
                // PERSIST the commit's edge frames: each is consumed three
                // times in this body (parts append, the contraction's
                // checkpointed edge set, the contraction's vertex frame) —
                // unpersisted, the three state-probe joins above re-ran
                // once per consumer, tripling the commit's dominant jobs
                val textPairs = tEdges.union(dEdges).distinct().persist()
                val mE = mEdges.distinct().persist()
                try {
                  // OVERLAP the commit's independent actions (guide §2.6)
                  // — measured sequential, 38% of the q117 wall had NO
                  // job running (driver planning/commit gaps between ~10
                  // chained actions per commit). Phase 0 materializes the
                  // two shared edge frames concurrently (the expensive
                  // state probes; disjoint inputs — text reads
                  // bands/hashes, media reads fp). Phase 1 then overlaps
                  // every consumer: all read cached blocks, the state
                  // RELATIONS above pinned their file lists at creation
                  // (a concurrent append cannot leak this batch into its
                  // own probe), and the parquet appends write UUID part
                  // files into four distinct dirs. The verdict snapshot
                  // below stays behind the barrier: it reads the
                  // parts/seen/forest state phase 1 writes.
                  concurrently(Seq(
                    () => labeled(spark, "q117: probe text edges") {
                      textPairs.count(); () },
                    () => labeled(spark, "q117: probe media edges") {
                      mE.count(); () }))
                  concurrently(Seq(
                    // ALL four durable families in ONE union write per
                    // commit (kind-partitioned — see stateDir above): the
                    // bands/hashes/fp index increments, plus the modality
                    // participation rows (feeds n_modalities), appended
                    // before the snapshot reads the parts state. coalesce(1)
                    // keeps each family's append increment-width; the
                    // dynamic-partition writer fans the single task's rows
                    // into the four kind= files.
                    () => labeled(spark, "q117: state append (unified)") {
                      val parts = textPairs
                        .select(explode(array(col("d1"), col("d2")))
                          .as("doc_id")).distinct()
                        .withColumn("modality", lit("text"))
                        .union(mE.select(explode(array(col("d1"), col("d2")))
                            .as("doc_id")).distinct()
                          .withColumn("modality", lit("media")))
                      def tagged(df: DataFrame, kind: String) =
                        df.withColumn("kind", lit(kind))
                      tagged(bBands, "bands")
                        .unionByName(tagged(bHashes, "hashes"),
                          allowMissingColumns = true)
                        .unionByName(tagged(bFp, "fp"),
                          allowMissingColumns = true)
                        .unionByName(tagged(parts, "parts"),
                          allowMissingColumns = true)
                        .coalesce(1)
                        .write.mode("append").partitionBy("kind")
                        .parquet(stateDir)
                    },
                    // contract (previous forest ∪ new edges) — the
                    // previous contraction's star edges stand in for all
                    // prior history. The contraction distincts its edge
                    // input, so the union needs no pre-distinct here.
                    () => labeled(spark, "q117: contract forest") {
                      val prevForest =
                        if (i == 1) eForest
                        else spark.read.schema(eForest.schema)
                          .parquet(s"$stateRoot/forest/v${i - 1}")
                      // CHECKPOINT the contraction input: starContract
                      // reads it twice (the canonical edge set and the
                      // vertex frame), and handed the raw union its
                      // vertex pass re-ran the whole state-probe chain —
                      // measured 12 jobs/1.7-2.1 s per commit for the
                      // forest write, vs 3 jobs/0.2 s over a pinned
                      // input; a persist() did NOT close it (the cached
                      // union still re-planned into probe re-execution),
                      // a LogicalRDD leaf does. Near-forest-sized at any
                      // scale: prior history rides the star forest, new
                      // edges are increment-bounded. Bridge drops the
                      // union's stale origin constraints — the same
                      // Spark 4.1 guard starContract's own checkpoints
                      // need (q86's union shape).
                      val contractIn =
                        org.apache.spark.sql.graft.Bridge
                          .dropOriginConstraints(prevForest
                            .unionByName(textPairs.union(mE))
                            .localCheckpoint())
                      val labels =
                        graft.operators.Curation.connectedComponentsStar(
                          contractIn)
                      labels.filter(col("id") =!= col("label"))
                        .select(col("id").as("d1"), col("label").as("d2"))
                        .write.mode("overwrite")
                        .parquet(s"$stateRoot/forest/v$i")
                    }))
                } finally { textPairs.unpersist(); mE.unpersist(); () }
                // cumulative decision snapshot: every doc seen so far,
                // current cluster/keep/n_modalities (earlier verdicts may
                // legitimately flip when clusters merge)
                labeled(spark, "q117: verdict snapshot") {
                  val forest = spark.read.schema(eForest.schema)
                    .parquet(s"$stateRoot/forest/v$i")
                  val parts = stateOrEmpty(spark, partsDir, eParts.schema)
                    .groupBy(col("doc_id"))
                    .agg(max(when(col("modality") === "text", 1).otherwise(0))
                        .as("in_text"),
                      max(when(col("modality") === "media", 1).otherwise(0))
                        .as("in_media"))
                  // "seen so far" = the hashes family's doc_id column
                  // (exactly one (doc_id, h) row per ingested doc), so no
                  // separate seen family is appended
                  stateOrEmpty(spark, hashesDir, eHashes.schema)
                    .select(col("doc_id"))
                    .join(forest.withColumnRenamed("d1", "doc_id")
                      .hint("shuffle_hash"), Seq("doc_id"), "left")
                    .join(parts.hint("shuffle_hash"), Seq("doc_id"), "left")
                    .select(col("doc_id"),
                      coalesce(col("d2"), col("doc_id")).as("cluster"),
                      when(coalesce(col("d2"), col("doc_id")) === col("doc_id"),
                        1).otherwise(0).as("keep"),
                      (coalesce(col("in_text"), lit(0))
                        + coalesce(col("in_media"), lit(0)))
                        .as("n_modalities"))
                    .write.mode("overwrite")
                    .parquet(s"$stateRoot/verdicts/v$i")
                }
              } finally {
                bBands.unpersist(); bHashes.unpersist(); bFp.unpersist(); ()
              }
            } finally { b.unpersist(); () }
          }
          ()
        }
        .start()
      q.awaitTermination()
      val n = commitSeq.get()
      require(n > 0, "cross-modal stream produced no commits")
      val out = spark.read.parquet(s"$stateRoot/verdicts/v$n")
      val rows = out.limit(maxVerdictRows + 1).collect()
      require(rows.length <= maxVerdictRows,
        s"decision frame exceeds $maxVerdictRows rows")
      require(rows.length.toLong == docs.count(),
        "one decision per ingested doc")
      localFrame(spark, rows.toSeq, out.schema)
        .orderBy(col("doc_id"))
    } finally {
      deleteRecursively(ckpt)
      deleteRecursively(stateRoot)
    }
  }

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
    val files = hfs(inputDir) match { case (fs, p) =>
      fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet")) }
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
