package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Continuous

class StreamingSpec extends SparkSpec {

  test("q51: streamed windowed counts equal the batch tumbling twin") {
    import spark.implicits._
    val streamed = Continuous.streamedWindowedCounts(spark, sfDir)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val batch = Tables.events(spark, sfDir)
      .groupBy(window($"ts", "5 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_v"))
      .select($"window.start", $"event_type", $"n", $"sum_v")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(batch.nonEmpty && streamed === batch)
  }

  test("q51 per-commit trigger duration stays under the pinned bound at sf0.1") {
    // The scale contract of the streaming tier: trigger/commit overhead is
    // FIXED per micro-batch (~0.55 s measured isolated at sf0.1), so the
    // four streaming queries' bench cost is lifecycle, not data. Pin the
    // FASTEST stateful commit's triggerExecution under 6 s (~10x the
    // measured steady state) — a state-store or trigger regression (e.g.
    // state re-scan per batch) slows every commit and blows through the
    // bound, while co-tenant noise inflating individual commits in a
    // shared test run does not. Listener-based so `sbt test` catches the
    // regression rather than a bench-drift investigation.
    import org.apache.spark.sql.streaming.StreamingQueryListener
    import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}
    val progress = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.streaming.StreamingQueryProgress]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        if (e.progress.name != null && e.progress.name.startsWith("q51_stream"))
          progress.add(e.progress)
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    // sf0.1 by design (the bound is pinned at the bench scale factor), but
    // cancel rather than fail where that fixture isn't staged
    val sf01 = "/root/testdata/sf0.1"
    assume(new java.io.File(sf01, "events.parquet").exists(),
      s"sf0.1 fixture not staged at $sf01")
    spark.streams.addListener(listener)
    try {
      assert(Continuous.streamedWindowedCounts(spark, sf01)
        .collect().nonEmpty)
      // the listener bus is async — wait for the commit events to drain
      // (8 staged files / maxFilesPerTrigger=2 = 4 data batches)
      val deadline = System.nanoTime() + 20L * 1000 * 1000 * 1000
      while (progress.size < 4 && System.nanoTime() < deadline)
        Thread.sleep(100)
      import scala.jdk.CollectionConverters._
      val commits = progress.asScala.filter(_.numInputRows > 0).toSeq
      assert(commits.size >= 2,
        s"expected >=2 stateful data commits, saw ${progress.size} progress events")
      // bound the minimum over commits AFTER THE FIRST: a state-growth
      // regression (e.g. a per-batch state re-scan) leaves the first data
      // commit fast (near-empty state) and slows every later one, so this
      // statistic must move — while a single co-tenant burst inflating one
      // commit in a shared test run still cannot flake it
      val durations = commits.sortBy(_.batchId).map { p =>
        val ms = p.durationMs.get("triggerExecution")
        assert(ms != null, s"commit ${p.batchId} missing triggerExecution")
        ms.longValue
      }
      assert(durations.drop(1).min < 6000L,
        s"every post-first stateful commit breached the 6s bound " +
          s"(${durations.mkString(",")}ms) " +
          "— state-store or trigger regression (steady state is ~550ms)")
    } finally spark.streams.removeListener(listener)
  }

  test("q53: chained streaming pipeline equals the composed batch query") {
    import spark.implicits._
    val streamed = Continuous.streamedPipeline(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val batch = Tables.events(spark, sfDir)
      .filter($"event_type" =!= "view")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_v"))
      .orderBy($"event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(batch.nonEmpty && streamed.toSeq === batch.toSeq)
  }

  test("q54: fold-based cq statistics agree with built-in avg/stddev") {
    import spark.implicits._
    val got = Continuous.cqMonitor(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getDouble(2), r.getInt(3))).toMap
    // naive twin with Spark's own avg/stddev_samp (order-dependent sums,
    // fine within a float tolerance)
    val pk = Tables.events(spark, sfDir)
      .groupBy(window($"ts", "5 minutes"), $"event_type".as("key"))
      .agg(avg($"value").as("avg_v"))
      .select($"window.start".as("w_start"), $"key", $"avg_v")
    val g = pk.groupBy($"w_start")
      .agg(avg($"avg_v").as("mu"),
        coalesce(stddev_samp($"avg_v"), lit(0.0)).as("sigma"))
    val want = pk.join(g, "w_start")
      .select($"w_start", $"key", $"avg_v",
        when($"avg_v" > $"mu" + lit(2.0) * $"sigma", 1).otherwise(0)
          .as("alert"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getDouble(2), r.getInt(3))).toMap
    assert(got.keySet === want.keySet && got.nonEmpty)
    got.foreach { case (k, (a, alert)) =>
      val (wa, wAlert) = want(k)
      assert(math.abs(a - wa) < 1e-9 * math.max(1.0, math.abs(wa)), s"avg at $k")
      assert(alert === wAlert, s"alert flag at $k")
    }
    // NB: zero alerts is a legitimate outcome — with ~5 type-averages per
    // window, mean+2σ is a high bar; the per-row flag agreement above is
    // the assertion that matters
  }

  test("q54: streamed cq monitor equals the batch twin") {
    val streamed = Continuous.streamedCqMonitor(spark, sfDir)
      .collect().map(_.toSeq)
    val batch = Continuous.cqMonitor(spark, sfDir)
      .collect().map(_.toSeq)
    // decimal sums + one double division on both paths → bit-equal frames
    assert(batch.nonEmpty && streamed.toSeq === batch.toSeq)
  }

  test("q52: intermediate snapshots match the batch answer on the same file prefix") {
    import spark.implicits._
    // Four chunk files with explicit, strictly increasing mtimes: the file
    // stream source processes oldest-first, so micro-batch k consumes
    // exactly chunks 0..k — every INTERMEDIATE snapshot (not just the final
    // frame) is reproducible and must equal the batch aggregate over that
    // known prefix. This is the HOP early-results contract (OutputFile.Type
    // SNAPSHOT at progress < 1), checked mid-stream.
    val dir = "target/tmp/online_prefix_in"
    rmrf(new java.io.File(dir))
    new java.io.File(dir).mkdirs()
    val src = Tables.events(spark, sfDir)
    val slices = (0 until 4).map(i => src.filter($"user_id" % 4 === i))
    val base = System.currentTimeMillis() - 600000
    slices.zipWithIndex.foreach { case (s, i) =>
      val tmp = s"target/tmp/online_prefix_tmp$i"
      s.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = java.nio.file.Paths.get(s"$dir/chunk$i.parquet")
      java.nio.file.Files.copy(part.toPath, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(base + i * 2000L))
      rmrf(new java.io.File(tmp))
    }
    val agg = (df: org.apache.spark.sql.DataFrame) => df
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_v"))
    val snaps = Continuous.onlineAggregate(spark, dir, src.schema, agg)
    assert(snaps.size === 4)
    def asSet(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    (1 to 4).foreach { k =>
      val want = asSet(agg(slices.take(k).reduce(_ union _)).collect().toSeq)
      assert(asSet(snaps(k - 1).rows) === want,
        s"snapshot $k/4 (progress ${snaps(k - 1).progress})")
    }
    assert(snaps(1).progress === 0.5, "the mid-stream snapshot is the 2/4 one")
  }

  test("q52: online aggregation final frame equals batch pricing summary") {
    val streamed = Continuous.streamedOnlineSummary(spark, sfDir)
      .collect().map(_.toSeq)
    val batch = graft.operators.Relational.pricingSummary(spark, sfDir)
      .collect().map(_.toSeq)
    assert(batch.nonEmpty && streamed.toSeq === batch.toSeq)
  }

  test("windowed streaming counts emit per-window aggregates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val query = Continuous.windowedCounts(events, "10 seconds")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    def t(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    mem.addData((t(1), "click", 1.0), (t(2), "click", 2.0),
      (t(11), "click", 4.0), (t(12), "view", 8.0))
    query.processAllAvailable()
    val rows = spark.table("win_counts").collect()
      .map(r => (r.getAs[Timestamp]("w_start").toString,
        r.getString(1), r.getAs[Long]("n"), r.getAs[Double]("sum_v"))).toSet
    query.stop()
    assert(rows === Set(
      ("2024-01-01 00:00:00.0", "click", 2L, 3.0),
      ("2024-01-01 00:00:10.0", "click", 1L, 4.0),
      ("2024-01-01 00:00:10.0", "view", 1L, 8.0)))
  }

  test("per-window aggregate is state-free (HOP C2 parity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Long, Map[String, Long])]
    val q = Continuous.perWindowAggregate(
      mem.toDF().toDF("k", "v"),
      b => b.groupBy("k").count(),
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)) { (id, rows) =>
      frames.synchronized {
        frames += ((id, rows.map(r => r.getString(0) -> r.getLong(1)).toMap))
      }
    }
    mem.addData(("a", 1.0), ("a", 2.0), ("b", 1.0))
    q.processAllAvailable()
    mem.addData(("a", 3.0))
    q.processAllAvailable()
    q.stop()
    val nonEmpty = frames.filter(_._2.nonEmpty)
    assert(nonEmpty.length === 2)
    // window 2 counts ONLY its own input — no state carried from window 1
    assert(nonEmpty(0)._2 === Map("a" -> 2L, "b" -> 1L))
    assert(nonEmpty(1)._2 === Map("a" -> 1L))
  }

  test("streaming session windows match the batch sessionize (C13)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // a small fixture slice through a real stream; a far-future sentinel
    // event advances the watermark so append mode flushes every session
    val rows = Tables.events(spark, sfDir)
      .filter($"user_id" <= 10)
      .select($"user_id", $"ts", $"value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val sess = mem.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "1 second")
      .groupBy($"user_id", session_window($"ts", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id", $"w.start".as("s_start"), $"n")
    val q = sess.writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    mem.addData(rows.toSeq: _*)
    q.processAllAvailable()
    val maxTs = rows.map(_._2.getTime).max
    mem.addData((999L, new Timestamp(maxTs + 86400000L), 0.0))
    q.processAllAvailable()
    val streamed = spark.table("sess_stream").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    q.stop()
    // batch twin: the SAME expression over the same rows
    val batch = rows.toSeq.toDF("user_id", "ts", "value")
      .groupBy($"user_id", session_window($"ts", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id", $"w.start".as("s_start"), $"n")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      .toSet
    assert(batch.nonEmpty && streamed === batch)
  }

  test("streaming sliding windows match the batch q37 twin (C13)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.events(spark, sfDir)
      .filter($"user_id" <= 10)
      .select($"ts", $"event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)))
    val mem = MemoryStream[(Timestamp, String)]
    val agg = mem.toDF().toDF("ts", "event_type")
      .withWatermark("ts", "1 second")
      .groupBy(window($"ts", "10 minutes", "5 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("w_start"), $"event_type", $"n")
    val q = agg.writeStream.format("memory").queryName("slide_stream")
      .outputMode("append").start()
    mem.addData(rows.toSeq: _*)
    q.processAllAvailable()
    val maxTs = rows.map(_._1.getTime).max
    mem.addData((new Timestamp(maxTs + 86400000L), "sentinel"))
    q.processAllAvailable()
    val streamed = spark.table("slide_stream").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .filter(_._2 != "sentinel").toSet
    q.stop()
    val batch = rows.toSeq.toDF("ts", "event_type")
      .groupBy(window($"ts", "10 minutes", "5 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("w_start"), $"event_type", $"n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(batch.nonEmpty && streamed === batch)
  }

  test("cq monitor flags the anomalous host") {
    import spark.implicits._
    val w = Timestamp.valueOf("2024-01-01 00:00:00")
    val batch = (1 to 9).flatMap(h =>
        Seq((w, s"host$h", 10.0), (w, s"host$h", 12.0))) ++
      Seq((w, "host-hot", 99.0), (w, "host-hot", 101.0))
    val alerts = Continuous.cqAlerts(
      batch.toDF("w_start", "key", "value")).collect()
    val hot = alerts.filter(_.getAs[Boolean]("alert")).map(_.getString(1))
    assert(hot.toSeq === Seq("host-hot"))
  }

  test("streaming dedup drops repeated fingerprints within the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    def t(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val q = Continuous.streamingDedup(
      mem.toDF().toDF("ts", "fp"), "1 minute")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    mem.addData((t(1), "A"), (t(2), "A"), (t(3), "B"))
    q.processAllAvailable()
    mem.addData((t(4), "A"), (t(5), "C"))
    q.processAllAvailable()
    q.stop()
    val fps = spark.table("dedup_out").collect().map(_.getString(1)).sorted
    assert(fps.toSeq === Seq("A", "B", "C"), "duplicates dropped across batches")
  }

  test("streaming top-k twin matches the batch top-k (O8)") {
    import spark.implicits._
    val dir = "target/tmp/topk_in"
    val docs = Tables.documents(spark, sfDir).select($"text")
    docs.repartition(4).write.mode("overwrite").parquet(dir)
    val topk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => df.select(explode(split($"text", "\\s+")).as("word"))
        .filter($"word" =!= "")
        .groupBy($"word").agg(count(lit(1)).as("cnt"))
    val snaps = Continuous.onlineAggregate(spark, dir, docs.schema, topk)
    def top3(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getLong(1)))
        .sortBy { case (w, c) => (-c, w) }.take(3)
    val streaming = top3(snaps.last.rows)
    val batch = top3(topk(docs).collect().toSeq)
    assert(streaming === batch)
    assert(snaps.size > 1, "expected intermediate snapshot top-k frames")
  }

  test("chained streaming queries pipeline stage outputs (C7)") {
    import spark.implicits._
    val in = "target/tmp/chain_in"
    rmrf(new java.io.File("target/tmp/chain_mid"))
    rmrf(new java.io.File("target/tmp/chain_ckpt"))
    val src = Tables.events(spark, sfDir)
    src.repartition(3).write.mode("overwrite").parquet(in)
    val out = Continuous.chainedQueries(
      spark, in, src.schema, "target/tmp/chain_mid", "target/tmp/chain_ckpt",
      df => df.filter($"value" > 10).select($"event_type", $"value"),
      df => df.groupBy($"event_type").agg(count(lit(1)).as("n")))
    val chained = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = src.filter($"value" > 10).groupBy($"event_type")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(chained === batch)
  }

  test("streaming recovers from its checkpoint without re-reading input (C14)") {
    import spark.implicits._
    val in = "target/tmp/chk/in"
    val chk = "target/tmp/chk/state"
    rmrf(new java.io.File("target/tmp/chk"))
    new java.io.File(in).mkdirs()
    def writeBatch(name: String, rows: Seq[String]): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$in/$name"), rows.mkString("\n"))
    val received = scala.collection.mutable.ArrayBuffer.empty[String]
    def start() = spark.readStream.text(in)
      .writeStream.option("checkpointLocation", chk)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        received.synchronized { received ++= df.collect().map(_.getString(0)) }
        ()
      }.start()
    writeBatch("a.txt", (0 until 50).map(i => s"row$i"))
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    assert(received.size === 50)
    // second incarnation resumes from the checkpoint: it must see ONLY the
    // new file — exactly-once over the union of both runs
    writeBatch("b.txt", (50 until 80).map(i => s"row$i"))
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    assert(received.sorted === (0 until 80).map(i => s"row$i").sorted,
      s"got ${received.size} rows (duplicates or loss across restart)")
  }

  test("pii scan composes unchanged with a stream (per-row map, no state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, "mail alice@example.com and 10.0.0.1"),
      (2L, "a perfectly clean row"),
      (3L, "call 555-123-4567"))
    val mem = MemoryStream[(Long, String)]
    val q = graft.operators.Curation.piiScanOf(
        mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("pii_stream")
      .outputMode("append").start()
    mem.addData(rows.toSeq: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("pii_stream").collect()
      .map(_.toSeq).toSet
    val batch = graft.operators.Curation.piiScanOf(
        rows.toDF("doc_id", "text")).collect().map(_.toSeq).toSet
    assert(batch.nonEmpty && streamed === batch,
      "the redaction map must be identical streamed and batch")
  }

  test("q117 per-commit trigger duration stays under the pinned bound at sf0.1") {
    // The cross-modal stream's scale contract: each commit pays the
    // BATCH's signature builds + three banded probes + one contraction
    // over (forest ∪ new edges) — measured ~2.5-3 s per commit at sf0.1
    // (13.7 s total over 4 commits + the ~3 s lifecycle floor). Two
    // regression classes this net catches: re-pairing the accumulated
    // corpus per commit (all-pairs instead of banded probes), and
    // contracting the accumulated PAIR LIST instead of the star forest —
    // both slow EVERY commit, so bounding the MINIMUM over post-first
    // commits at 10 s must trip; a single co-tenant burst cannot flake it.
    import org.apache.spark.sql.streaming.StreamingQueryListener
    import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}
    val progress = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.streaming.StreamingQueryProgress]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        if (e.progress.name != null && e.progress.name.startsWith("q117_xmodal"))
          progress.add(e.progress)
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    val sf01 = "/root/testdata/sf0.1"
    assume(new java.io.File(sf01, "documents.parquet").exists(),
      s"sf0.1 fixture not staged at $sf01")
    spark.streams.addListener(listener)
    try {
      val out = Continuous.streamedCrossModalDedup(spark, sf01)
      assert(out.count() > 0)
      val deadline = System.nanoTime() + 20L * 1000 * 1000 * 1000
      while (progress.size < 4 && System.nanoTime() < deadline)
        Thread.sleep(100)
      import scala.jdk.CollectionConverters._
      val commits = progress.asScala.filter(_.numInputRows > 0).toSeq
      assert(commits.size >= 2,
        s"expected >= 2 data commits, saw ${progress.size} progress events")
      val durations = commits.sortBy(_.batchId).map { p =>
        val ms = p.durationMs.get("triggerExecution")
        assert(ms != null, s"commit ${p.batchId} missing triggerExecution")
        ms.longValue
      }
      assert(durations.drop(1).min < 10000L,
        s"every post-first cross-modal commit breached the 10s bound " +
          s"(${durations.mkString(",")}ms) — per-commit work is no longer " +
          "batch-sized (steady state is ~3s)")
      // the growth-with-history class (contracting the accumulated PAIR
      // LIST instead of the star forest) shows most strongly in the FINAL
      // commit and can leave the minimum intact — bound the median (robust
      // to one co-tenant burst) and the last commit (looser: one burst CAN
      // land on it) separately
      val post = durations.drop(1).sorted
      assert(post(post.size / 2) < 10000L,
        s"median post-first commit breached 10s (${durations.mkString(",")}ms)" +
          " — per-commit cost is growing with history")
      assert(durations.last < 20000L,
        s"final commit breached 20s (${durations.mkString(",")}ms) — " +
          "per-commit cost is growing with accumulated history (the " +
          "accumulated-pair-list regression class)")
    } finally spark.streams.removeListener(listener)
  }

  test("q88 per-commit trigger duration stays under the pinned bound at sf0.1") {
    // The funnel's scale contract: each commit pays the INCREMENT's pair
    // join against the accumulated index (steady ~2.5 s per commit at
    // sf0.1 after the intersection rewrite — 11 s total over 4 commits +
    // lifecycle). A regression that re-pairs the accumulated corpus
    // per commit (the all-pairs mistake the incremental design exists to
    // avoid) slows EVERY commit, so bounding the MINIMUM over post-first
    // commits at 10 s must trip — while a single co-tenant burst in a
    // shared test run cannot flake it.
    import org.apache.spark.sql.streaming.StreamingQueryListener
    import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}
    val progress = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.streaming.StreamingQueryProgress]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        if (e.progress.name != null && e.progress.name.startsWith("q88_funnel"))
          progress.add(e.progress)
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    val sf01 = "/root/testdata/sf0.1"
    assume(new java.io.File(sf01, "documents.parquet").exists(),
      s"sf0.1 fixture not staged at $sf01")
    spark.streams.addListener(listener)
    try {
      val run = Continuous.runStreamedCurationFunnel(spark, sf01)
      assert(run.snapshots.size >= 2)
      val deadline = System.nanoTime() + 20L * 1000 * 1000 * 1000
      while (progress.size < 4 && System.nanoTime() < deadline)
        Thread.sleep(100)
      import scala.jdk.CollectionConverters._
      val commits = progress.asScala.filter(_.numInputRows > 0).toSeq
      assert(commits.size >= 2,
        s"expected >=2 data commits, saw ${progress.size} progress events")
      val durations = commits.sortBy(_.batchId).map { p =>
        val ms = p.durationMs.get("triggerExecution")
        assert(ms != null, s"commit ${p.batchId} missing triggerExecution")
        ms.longValue
      }
      assert(durations.drop(1).min < 10000L,
        s"every post-first funnel commit breached the 10s bound " +
          s"(${durations.mkString(",")}ms) — the per-commit pair join is " +
          "no longer increment-sized (steady state is ~2.5s)")
    } finally spark.streams.removeListener(listener)
  }

  test("q88: streamed curation funnel converges to the batch funnel") {
    val run = Continuous.runStreamedCurationFunnel(spark, sfDir)
    assert(run.snapshots.size >= 2,
      s"expected multiple funnel commits, got ${run.snapshots.size}")
    assert(run.snapshots.last.progress >= 1.0)
    // cumulative emission: per-source n_docs never shrinks across commits
    def bySource(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    run.snapshots.sliding(2).foreach {
      case Seq(a, b) =>
        val (ca, cb) = (bySource(a.rows), bySource(b.rows))
        ca.foreach { case (s, n) =>
          assert(cb.getOrElse(s, 0L) >= n, s"n_docs shrank for source $s") }
      case _ =>
    }
    // the final cumulative frame equals the batch funnel bit for bit: the
    // min-id exact rule and larger-id near-dup loser rule are arrival-
    // order-independent, and the fixture's dfs never reach the cap
    val streamed = run.snapshots.last.rows.map(_.toSeq)
      .sortBy(_.head.toString)
    val batch = graft.operators.Curation.curationFunnel(spark, sfDir)
      .collect().map(_.toSeq).toSeq.sortBy(_.head.toString)
    assert(batch.nonEmpty && streamed === batch)
  }

  test("online aggregation emits progressive snapshots, final frame exact") {
    import spark.implicits._
    // stage the events table as a multi-file bounded input
    val dir = "target/tmp/online_in"
    val src = Tables.events(spark, sfDir)
    src.repartition(4).write.mode("overwrite").parquet(dir)
    val snaps = Continuous.onlineAggregate(
      spark, dir, src.schema,
      df => df.groupBy($"event_type").agg(count(lit(1)).as("n")))
    assert(snaps.nonEmpty)
    assert(snaps.last.progress === 1.0)
    // monotone progress and monotone cumulative counts
    snaps.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a.progress <= b.progress)
        val ca = a.rows.map(r => r.getString(0) -> r.getLong(1)).toMap
        val cb = b.rows.map(r => r.getString(0) -> r.getLong(1)).toMap
        ca.foreach { case (k, v) => assert(cb.getOrElse(k, 0L) >= v) }
      case _ =>
    }
    // final snapshot == batch answer
    val batch = src.groupBy($"event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fin = snaps.last.rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fin === batch)
  }

  test("q99: streamed index dedup is batch-boundary-free and matches its batch twin") {
    import spark.implicits._
    def verdicts(chunks: Int) =
      Continuous.streamedIndexDedup(spark, sfDir, chunks = chunks)
        .collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    val streamed = verdicts(5)
    // chunk-boundary independence: the SAME verdict frame whatever the
    // replay's batch size — the per-doc-state design contract
    assert(verdicts(2) === streamed,
      "verdicts must not depend on micro-batch boundaries")
    // batch twin, directly from the band/digest definitions
    val docs = Tables.documents(spark, sfDir)
    val bands = graft.operators.Dedup.bandBuckets(
      graft.operators.Dedup.signaturesOf(
        graft.operators.Dedup.shinglesOf(docs)))
    def precedent = (col("o.doc_id") % 10 =!= 0) ||
      (col("o.doc_id") < col("n.doc_id"))
    val hx = docs.select($"doc_id", md5($"text").as("h"))
    val ex = hx.as("n").filter($"n.doc_id" % 10 === 0)
      .join(hx.as("o"), $"n.h" === $"o.h" &&
        $"n.doc_id" =!= $"o.doc_id" && precedent, "left_semi")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val bd = bands.as("n").filter($"n.doc_id" % 10 === 0)
      .join(bands.as("o"), $"n.band" === $"o.band" &&
        $"n.bh" === $"o.bh" && $"n.doc_id" =!= $"o.doc_id" && precedent,
        "left_semi")
      .select($"doc_id").distinct().collect().map(_.getLong(0)).toSet
    val incoming = docs.filter($"doc_id" % 10 === 0)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed.map(_._1).toSet === incoming, "one row per incoming doc")
    streamed.foreach { case (id, e, b, keep) =>
      assert(e === (if (ex(id)) 1 else 0), s"exact_dup at doc $id")
      assert(b === (if (bd(id)) 1 else 0), s"band_dup at doc $id")
      assert(keep === (if (e + b > 0) 0 else 1), s"keep rule at doc $id")
    }
    assert(streamed.exists(_._4 == 0) && streamed.exists(_._4 == 1),
      "fixture must exercise both verdicts")
  }

  test("q117: streamed cross-modal dedup converges to the batch twin " +
      "on any chunking") {
    def decisions(chunks: Int) =
      Continuous.streamedCrossModalDedup(spark, sfDir, chunks = chunks)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSeq
    val streamed = decisions(4)
    // batch-boundary independence: the star-forest state makes the final
    // frame a pure function of the edge UNION, so any chunking agrees
    assert(decisions(2) === streamed,
      "decisions must not depend on micro-batch boundaries")
    // and the edge union is the stream-tier batch twin's graph exactly
    val twin = graft.operators.Curation.crossModalStreamTwin(spark, sfDir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSeq
    assert(streamed === twin, "final frame must equal the batch twin")
    // the fixture must exercise the machinery: drops, keeps, and paired
    // docs in each modality
    assert(streamed.exists(_._3 == 0) && streamed.exists(_._3 == 1))
    assert(streamed.exists(_._4 >= 1), "some doc must be paired somewhere")
    // clusters must be real merges (some representative owns >= 2 docs)
    val sizes = streamed.groupBy(_._2).view.mapValues(_.size)
    assert(sizes.values.max >= 2, "fixture must produce a non-trivial cluster")
  }

  test("q117: commits stay batch-sized and the stream makes >= 2 of them") {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}
    val progress = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.streaming.StreamingQueryProgress]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        if (e.progress.name != null && e.progress.name.startsWith("q117_xmodal"))
          progress.add(e.progress)
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      val out = Continuous.streamedCrossModalDedup(spark, sfDir, chunks = 4)
      val n = out.count()
      val deadline = System.nanoTime() + 20L * 1000 * 1000 * 1000
      while (progress.size < 4 && System.nanoTime() < deadline)
        Thread.sleep(100)
      import scala.jdk.CollectionConverters._
      val commits = progress.asScala.filter(_.numInputRows > 0).toSeq
      assert(commits.size === 4,
        s"expected one data commit per staged chunk, saw " +
          commits.sortBy(_.batchId)
            .map(p => s"b${p.batchId}=${p.numInputRows}").mkString(","))
      // per-commit input must be CHUNK-sized, not corpus-sized — the
      // incremental contract (a trigger that merged the staged files
      // would blow this bound). The commit's plan references the streamed
      // batch TWICE by design (probe side ∪ index side), so the leaf
      // metric double-counts: bound at 2× chunk, not 1×.
      val perChunk = (n + 3) / 4
      commits.foreach(p => assert(p.numInputRows <= 2 * perChunk + 2,
        s"commit ${p.batchId} ingested ${p.numInputRows} rows " +
          s"(> 2x chunk ${2 * perChunk + 2})"))
    } finally spark.streams.removeListener(listener)
  }

  test("q88 funnel: all three gate shapes emit identical per-commit " +
      "frames, including an auto gate that crosses mid-stream") {
    // the funnelop probe's convergence contract, pinned at fixture
    // scale: every gate shape reads the same df/docLen VALUES (sums of
    // additive deltas == full re-aggregation), so every cumulative
    // snapshot — not just the final one — must agree
    def snaps(run: Continuous.FunnelRun) =
      run.snapshots.map(_.rows.map(_.toSeq))
    val auto = snaps(Continuous.runStreamedCurationFunnel(spark, sfDir))
    assert(auto.nonEmpty)
    assert(snaps(Continuous.runStreamedCurationFunnel(spark, sfDir,
      gate = "maintained")) === auto)
    assert(snaps(Continuous.runStreamedCurationFunnel(spark, sfDir,
      gate = "recomputed")) === auto)
    // force the auto gate to CROSS mid-stream (the fixture's 4 commits
    // accumulate ~26k posting rows; a ~3-commit budget lands the
    // bootstrap on a commit with real history) and to bootstrap on the
    // FIRST commit (1-byte budget — the maintained-from-start twin):
    // the fold-the-whole-index bootstrap must reproduce the same
    // history the per-commit deltas would have
    val docs = Tables.documents(spark, sfDir)
    val rows = graft.operators.Dedup.shinglesOf(
      docs.select(col("doc_id"), col("text"))).count()
    assert(snaps(Continuous.runStreamedCurationFunnel(spark, sfDir,
      gateStateBudgetBytes = rows * 16L / 2)) === auto)
    assert(snaps(Continuous.runStreamedCurationFunnel(spark, sfDir,
      gateStateBudgetBytes = 1L)) === auto)
  }

  test("DeltaState: folded generations read bit-identically, torn " +
      "generations invisible, fan-in bounded") {
    import spark.implicits._
    val root = s"target/tmp/deltastate${System.nanoTime()}"
    try {
      val st = new Continuous.DeltaState(spark, root,
        _.groupBy($"s").agg(sum($"dc").as("dc")))
      def gate() = st.read().groupBy($"s").agg(sum($"dc").as("df"))
        .orderBy($"s").collect().map(_.toSeq).toSeq
      st.append(Seq(("a", 1L), ("b", 2L)).toDF("s", "dc").coalesce(1))
      st.append(Seq(("a", 3L), ("c", 1L)).toDF("s", "dc").coalesce(1))
      val before = gate()
      st.compact()
      assert(st.currentGen === 1)
      assert(gate() === before,
        "a folded generation must read bit-identically to its deltas")
      // the folded generation is ONE file; the old one is dropped
      assert(new java.io.File(s"$root/g1").listFiles()
        .count(_.getName.endsWith(".parquet")) === 1)
      assert(!new java.io.File(s"$root/g0").exists())
      // appends land in the committed generation; a TORN next
      // generation (files staged, no marker — the crash-before-marker
      // window) is invisible to reads and appends
      st.append(Seq(("b", 1L)).toDF("s", "dc").coalesce(1))
      val after = gate()
      Seq(("z", 99L)).toDF("s", "dc")
        .write.mode("overwrite").parquet(s"$root/g2")
      assert(st.currentGen === 1)
      assert(gate() === after, "a torn generation must serve prior state")
      // the next compact overwrites the torn stage and commits it; a
      // further compact is idempotent over its own output
      st.compact()
      assert(st.currentGen === 2 && gate() === after)
      st.compact()
      assert(gate() === after)
    } finally rmrf(root)
  }

  test("DeltaState: the fold width follows the generation's bytes — " +
      "multi-file generations read identically") {
    import spark.implicits._
    val root = s"target/tmp/deltawide${System.nanoTime()}"
    try {
      // a 1-byte target forces width = ceil(bytes / 1) > 1, the corpus-
      // scale shape the default 128 MiB target produces on a real df
      // store; the r17 hard coalesce(1) could never produce it
      val st = new Continuous.DeltaState(spark, root,
        _.groupBy($"s").agg(sum($"dc").as("dc")), targetFoldBytes = 1L)
      def gate() = st.read().groupBy($"s").agg(sum($"dc").as("df"))
        .orderBy($"s").collect().map(_.toSeq).toSeq
      st.append((1 to 64).map(i => (s"s$i", i.toLong)).toDF("s", "dc")
        .repartition(4))
      st.append((1 to 64).map(i => (s"s$i", 1L)).toDF("s", "dc")
        .repartition(4))
      val before = gate()
      // the width is a BOUND (coalesce), not a forcer: at test scale AQE
      // coalesces the fold's aggregate to one partition, so hold AQE's
      // partition coalescing off for the compact to expose the fan-out
      // the byte target permits — the corpus-scale shape, where the
      // fold's natural width is real and only the r17 coalesce(1)
      // collapsed it
      val key = "spark.sql.adaptive.coalescePartitions.enabled"
      val old = spark.conf.get(key)
      try { spark.conf.set(key, "false"); st.compact() }
      finally spark.conf.set(key, old)
      assert(st.currentGen === 1)
      assert(new java.io.File(s"$root/g1").listFiles()
        .count(_.getName.endsWith(".parquet")) > 1,
        "a byte-sized target must let the fold fan out over several files")
      assert(gate() === before,
        "a multi-file folded generation must read bit-identically")
      // folding again over the multi-file generation stays idempotent
      st.compact()
      assert(gate() === before)
    } finally rmrf(root)
  }

  test("q88 funnel: trigger width is a knob (commit count and state-" +
      "append widths track it) and delta-store compaction changes " +
      "nothing observable") {
    // batch twin for the final frames (q88's oracle contract)
    val batch = graft.operators.Curation.curationFunnel(spark, sfDir)
      .collect().map(_.toSeq).toSeq.sortBy(_.head.toString)
    def parquets(p: String) = {
      val fs = new java.io.File(p).listFiles()
      if (fs == null) 0 else fs.count(_.getName.endsWith(".parquet"))
    }
    // width 1 over the 8 staged chunks: 8 commits, each appending ONE
    // increment-width file per delta store — the append width tracks
    // the trigger knob, not the shuffle setting (gate pinned maintained:
    // the default auto gate keeps the delta stores empty under the
    // fixture's tiny index, which is its own test below)
    val runA = Continuous.runStreamedCurationFunnel(spark, sfDir,
      filesPerTrigger = 1, compactEvery = 0, keepState = true,
      gate = "maintained")
    try {
      assert(runA.snapshots.size === 8)
      assert(parquets(s"${runA.stateRoot}/df/g0") === 8)
      assert(parquets(s"${runA.stateRoot}/len/g0") === 8)
      assert(runA.snapshots.last.rows.map(_.toSeq).toSeq
        .sortBy(_.head.toString) === batch)
    } finally rmrf(runA.stateRoot)
    // width 3 + fold-every-commit: ceil(8/3) = 3 commits, the delta
    // stores end as ONE committed generation holding ONE folded file,
    // and the funnel's emitted frames are unchanged (the gate reads
    // sums either way)
    val runB = Continuous.runStreamedCurationFunnel(spark, sfDir,
      filesPerTrigger = 3, compactEvery = 1, keepState = true,
      gate = "maintained")
    try {
      assert(runB.snapshots.size === 3)
      for (store <- Seq("df", "len")) {
        val gens = new java.io.File(s"${runB.stateRoot}/$store").listFiles()
          .filter(_.isDirectory).map(_.getName).toSeq
        assert(gens === Seq("g3"),
          s"$store should hold exactly the last folded generation, got $gens")
        assert(parquets(s"${runB.stateRoot}/$store/g3") === 1)
      }
      assert(runB.snapshots.last.rows.map(_.toSeq).toSeq
        .sortBy(_.head.toString) === batch)
    } finally rmrf(runB.stateRoot)
    // the DEFAULT auto gate under the fixture's tiny index: recompute
    // mode, delta stores never created — the +17% fixture-scale premium
    // session E measured is not paid below the budget
    val runC = Continuous.runStreamedCurationFunnel(spark, sfDir,
      keepState = true)
    try {
      assert(!new java.io.File(s"${runC.stateRoot}/df").exists())
      assert(!new java.io.File(s"${runC.stateRoot}/len").exists())
      assert(runC.snapshots.last.rows.map(_.toSeq).toSeq
        .sortBy(_.head.toString) === batch)
    } finally rmrf(runC.stateRoot)
  }
}
