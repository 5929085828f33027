package graft

/** StageMemo lifecycle: memoization, LRU eviction under the entry budget
  * (evicted stages are unpersisted, not leaked), and explicit clear(). */
class StageMemoSpec extends SparkSpec {

  private def freshKeys(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix:$i")

  test("memoizes: the build runs once per key and stays pinned") {
    StageMemo.clear()
    import spark.implicits._
    var builds = 0
    val Seq(k) = freshKeys("memo-once", 1)
    def get() = StageMemo(spark, k) { builds += 1; Seq(1, 2, 3).toDF("x") }
    val a = get()
    val b = get()
    assert(builds === 1)
    assert(a eq b)
    assert(a.storageLevel.useMemory || a.storageLevel.useDisk)
    StageMemo.clear()
    assert(StageMemo.size === 0)
    assert(a.storageLevel === org.apache.spark.storage.StorageLevel.NONE)
  }

  test("stats window: hits, misses, evictions, and exclusive nested build time") {
    import spark.implicits._
    StageMemo.clear()
    StageMemo.statsSnapshot(reset = true)
    def slowDf(k: String, ms: Long) = { Thread.sleep(ms); Seq(k).toDF("x") }
    // nested build: the outer stage builds the inner one inside its own
    // build expression (the intersection-builds-shingles shape)
    StageMemo(spark, "st:outer") {
      StageMemo(spark, "st:inner")(slowDf("i", 300))
      slowDf("o", 30)
    }
    StageMemo(spark, "st:inner")(slowDf("i", 300)) // memo hit — no sleep
    val s = StageMemo.statsSnapshot()
    assert(s.hits === 1 && s.misses === 2 && s.evictions === 0)
    val (innerN, innerMs) = s.builds("st:inner")
    val (outerN, outerMs) = s.builds("st:outer")
    assert(innerN === 1 && outerN === 1)
    assert(innerMs >= 300, s"inner build ms $innerMs")
    // exclusive attribution: the outer key must NOT absorb the nested
    // inner build (per-key ms then sum to the window's true build total)
    assert(outerMs < 300, s"outer exclusive ms $outerMs includes the child")
    assert(s.buildMsTotal >= 330 && s.buildMsTotal === innerMs + outerMs)
    val old = StageMemo.maxEntries
    StageMemo.maxEntries = 2
    try {
      StageMemo(spark, "st:evictor")(Seq("e").toDF("x"))
      val s2 = StageMemo.statsSnapshot(reset = true)
      assert(s2.evictions === 1, "the LRU eviction must count in the window")
    } finally {
      StageMemo.maxEntries = old
      StageMemo.clear()
      StageMemo.statsSnapshot(reset = true)
    }
  }

  test("eagerBuild materializes the frame at memo time") {
    import spark.implicits._
    StageMemo.clear()
    StageMemo.statsSnapshot(reset = true)
    val acc = spark.sparkContext.longAccumulator("eager-probe")
    StageMemo.eagerBuild = true
    try {
      val df = StageMemo(spark, "st:eager") {
        Seq(1, 2, 3).toDF("x").filter { _ => acc.add(1); true }
      }
      // the build job already ran: every cache partition is populated
      assert(acc.value === 3L)
      df.write.mode("overwrite").format("noop").save()
      assert(acc.value === 3L, "the consumer must read the cache, not rebuild")
    } finally {
      StageMemo.eagerBuild = false
      StageMemo.clear()
      StageMemo.statsSnapshot(reset = true)
    }
  }

  test("the eviction budget is self-checking against the main-source stage keys") {
    // the budget rationale (2 corpora x per-corpus stages + headroom) used
    // to live in a hand-counted comment — "re-count this list when adding
    // one" is exactly the step a new stage family forgets. Count the keys
    // from the sources instead, so a 13th stage fails HERE until
    // maxEntries grows with it.
    val src = java.nio.file.Paths.get("src/main/scala/graft")
    assume(java.nio.file.Files.isDirectory(src), s"run from the repo root: $src")
    val keyRe = """(?:StageMemo|memo)\(spark, s"([A-Za-z0-9_]+):""".r
    import scala.jdk.CollectionConverters._
    val stream = java.nio.file.Files.walk(src)
    val keys =
      try stream.iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        .flatMap(p => keyRe.findAllMatchIn(new String(
          java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8)).map(_.group(1)))
        .toSet
      finally stream.close()
    assert(keys.size >= 12, s"stage-key scan looks broken, found only: $keys")
    assert(2 * keys.size + 4 <= StageMemo.maxEntries,
      s"${keys.size} per-corpus stage keys ($keys) x 2 bench corpora + 4 " +
        s"headroom exceeds maxEntries=${StageMemo.maxEntries} — a bench lap " +
        "would silently evict a live stage mid-lap; raise maxEntries")
  }

  test("frames stash: memoizes, evicts LRU past its budget, and releases " +
      "evicted/cleared tuples") {
    StageMemo.clear()
    import spark.implicits._
    val old = StageMemo.maxFrameTuples
    StageMemo.maxFrameTuples = 2
    try {
      var builds = Map.empty[String, Int].withDefaultValue(0)
      var released = Set.empty[String]
      def get(k: String) = StageMemo.frames(spark, k) {
        builds += k -> (builds(k) + 1)
        (Seq(k).toDF("x").localCheckpoint(), 42L)
      } { case (df, _) =>
        released += k
        org.apache.spark.sql.graft.Bridge.releaseLocalCheckpoint(df)
      }
      val (aDf, _) = get("fa")
      get("fb"); get("fa") // refresh fa: fb is now LRU
      get("fc") // evicts + releases fb
      assert(StageMemo.frameStashSize === 2)
      assert(released === Set("fb"), "eviction must invoke the release thunk")
      get("fb")
      assert(builds("fb") === 2, "an evicted tuple must rebuild")
      // fa survived both evictions (fc evicted fb, fb's rebuild evicted fa?
      // no: after fc, order is fa, fc; fb's insert evicts fa)
      assert(released === Set("fb", "fa"))
      // the released checkpoint's blocks are gone: an action on the dead
      // frame must fail (checkpoints have no recompute lineage)
      intercept[Exception] { aDf.count() }
      StageMemo.clear()
      assert(StageMemo.frameStashSize === 0)
      assert(released === Set("fa", "fb", "fc"),
        "clear() must release every stashed tuple")
    } finally {
      StageMemo.maxFrameTuples = old
      StageMemo.clear()
    }
  }

  test("the frames-stash budget is self-checking against the framesKey families") {
    // same rationale as the maxEntries self-check: count the distinct
    // framesKey families from the sources (plus their derived dict:
    // companions) so a new stashed family fails HERE until
    // maxFrameTuples grows with it.
    val src = java.nio.file.Paths.get("src/main/scala/graft")
    assume(java.nio.file.Files.isDirectory(src), s"run from the repo root: $src")
    val keyRe = """[Ff]ramesKey = Some\(s"([A-Za-z0-9_]+):""".r
    import scala.jdk.CollectionConverters._
    val stream = java.nio.file.Files.walk(src)
    val families =
      try stream.iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        .flatMap(p => keyRe.findAllMatchIn(new String(
          java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8)).map(_.group(1)))
        .toSet
      finally stream.close()
    assert(families.size >= 4, s"framesKey scan looks broken, found: $families")
    // +1: containmentSketchOf derives a "dict:<key>" companion entry
    assert(2 * (families.size + 1) + 4 <= StageMemo.maxFrameTuples,
      s"${families.size} framesKey families ($families) + the dict " +
        s"companion x 2 bench corpora + 4 headroom exceeds " +
        s"maxFrameTuples=${StageMemo.maxFrameTuples} — a bench lap would " +
        "evict live frames mid-lap; raise maxFrameTuples")
  }

  test("evicts least-recently-used beyond the budget and unpersists it") {
    StageMemo.clear()
    import spark.implicits._
    val old = StageMemo.maxEntries
    StageMemo.maxEntries = 2
    try {
      var builds = Map.empty[String, Int].withDefaultValue(0)
      def get(k: String) = StageMemo(spark, k) {
        builds += k -> (builds(k) + 1); Seq(k).toDF("x")
      }
      val a = get("a"); get("b")
      get("a") // refresh a: b is now the LRU entry
      val c = get("c") // evicts b
      assert(StageMemo.size === 2)
      val b2 = get("b") // rebuilt, evicting a (LRU after c refresh... a)
      assert(builds("b") === 2, "evicted stage must rebuild")
      assert(builds("a") === 1 && builds("c") === 1)
      assert(StageMemo.size === 2)
      // the evicted frame was unpersisted, the retained ones stay pinned
      assert(a.storageLevel === org.apache.spark.storage.StorageLevel.NONE)
      assert(c.storageLevel.useMemory || c.storageLevel.useDisk)
      assert(b2.storageLevel.useMemory || b2.storageLevel.useDisk)
    } finally {
      StageMemo.maxEntries = old
      StageMemo.clear()
    }
  }
}
