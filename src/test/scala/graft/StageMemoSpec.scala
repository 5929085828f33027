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
