package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Document deduplication operators for large-scale training-data pipelines.
  *
  * All hash primitives are md5-based so results are portable across engines
  * (the DuckDB oracle reproduces every pipeline bit-for-bit) and every stage
  * is a plain shuffle-on-key plan — no driver-side state, no O(n²) step
  * without a blocking/banding bound, so each pipeline survives a 100 TB
  * corpus on a real cluster:
  *
  *  - exact: hash-groupBy on the raw text digest (one shuffle);
  *  - ngramJaccard: inverted shingle index self-join with a document-
  *    frequency cap on shingles (bounds join fan-out under skew);
  *  - minhashLsh: constant-size signatures (k md5 minima) → banded bucket
  *    join — candidate generation never compares non-colliding docs;
  *  - simhash: 60-bit fingerprints; near-dup pairs via pigeonhole band
  *    blocking (4×15-bit bands ⇒ exact for hamming distance ≤ 3).
  */
object Dedup {

  /** Word tokens of `text` (whitespace split, empties dropped). */
  private def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= "")

  /** Distinct word 3-shingles per document, keyed by a fixed 16-hex-char
    * md5 prefix: (doc_id, s). Hashing before the distinct/groupBy shuffles
    * caps per-record shuffle width regardless of shingle text length —
    * at corpus scale the shuffle volume is the cost that matters. 64-bit
    * prefix collisions are ~n²/2⁶⁵ (negligible), and the oracle hashes
    * identically so results stay bit-equal. */
  private def shingles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", tokens($"text").as("t"))
      .select($"doc_id", explode(expr(
        """transform(sequence(0, size(t)-3),
          |  i -> substring(md5(concat_ws(' ', t[i], t[i+1], t[i+2])), 1, 16))"""
          .stripMargin))
        .as("s"))
      .distinct()
  }

  /** Exact dedup: group identical texts by digest, keep the smallest doc_id
    * (SURVEY north-star op; hash-groupBy — one shuffle, no skew risk beyond
    * genuinely identical texts). */
  def exact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy(md5($"text").as("h"))
      .agg(min($"doc_id").as("keeper"), count(lit(1)).as("n_copies"))
      .select($"keeper", $"n_copies", $"h")
      .orderBy($"keeper")
  }

  /** N-gram (3-shingle) Jaccard near-dup pairs via an inverted index
    * self-join. `maxDf` drops shingles present in more than that many docs —
    * the standard frequency cap that keeps the candidate join linear in
    * corpus size instead of quadratic in the hottest shingle. */
  def ngramJaccard(spark: SparkSession, dir: String,
      threshold: Double = 0.8, maxDf: Int = 100): DataFrame = {
    import spark.implicits._
    val sh = shingles(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val docLen = sh.groupBy($"doc_id").agg(count(lit(1)).as("c"))
    // Posting-list pair generation: one groupBy on shingle, emit all doc
    // pairs per posting list (bounded by maxDf ⇒ ≤ maxDf²/2 pairs per
    // shingle). Halves the shuffle volume of the classic index self-join
    // and keeps the worst key bounded — the property that matters at scale.
    val inter = sh.groupBy($"s").agg(collect_list($"doc_id").as("ds"))
      .filter(size($"ds") between (2, maxDf))
      .select(explode(expr(
        """flatten(transform(ds, (x, i) ->
          |  transform(slice(ds, i + 2, size(ds)),
          |    y -> struct(least(x, y) as d1, greatest(x, y) as d2))))"""
          .stripMargin)).as("p"))
      .groupBy($"p.d1".as("d1"), $"p.d2".as("d2"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(docLen.as("ca"), $"d1" === $"ca.doc_id")
      .join(docLen.as("cb"), $"d2" === $"cb.doc_id")
      .select($"d1", $"d2",
        round($"i" * lit(1.0) / ($"ca.c" + $"cb.c" - $"i"), 6).as("jaccard"))
      .filter($"jaccard" >= threshold)
      .orderBy($"d1", $"d2")
  }

  /** End-to-end dedup decisions: one row per document with `keep` ∈ {0,1}.
    * A document is dropped iff it near-duplicates (3-shingle Jaccard ≥
    * `threshold`) a smaller-id document — the greedy min-id-representative
    * rule over the pair list (identical texts have Jaccard 1, so exact dups
    * are subsumed). This is the operator a pipeline user actually calls;
    * the building blocks above are its stages. */
  def deduplicate(spark: SparkSession, dir: String,
      threshold: Double = 0.8): DataFrame = {
    import spark.implicits._
    val losers = ngramJaccard(spark, dir, threshold)
      .select($"d2".as("doc_id")).distinct()
    Tables.documents(spark, dir)
      .select($"doc_id")
      .join(losers.withColumn("drop", lit(1)), Seq("doc_id"), "left")
      .select($"doc_id",
        when($"drop".isNotNull, 0).otherwise(1).as("keep"))
      .orderBy($"doc_id")
  }

  private val K = 8 // minhash signature length
  private def sigCol(i: Int): Column =
    min(md5(concat(lit(s"$i:"), col("s")))).as(s"s$i")

  /** Per-document MinHash signatures: k independent md5-keyed minima over the
    * shingle set. Constant per-doc state — scales to any corpus. */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    shingles(spark, dir)
      .groupBy($"doc_id")
      .agg(sigCol(0), (1 until K).map(sigCol): _*)
      .orderBy($"doc_id")
  }

  /** MinHash+LSH near-dup candidates: 4 bands × 2 rows; docs sharing any
    * band bucket become candidates; estimated Jaccard = matching signature
    * fraction. The band join only ever touches colliding buckets — the
    * scale path for near-dedup at 100 TB. */
  def minhashLsh(spark: SparkSession, dir: String,
      minEstJaccard: Double = 0.5): DataFrame = {
    import spark.implicits._
    val sig = minhashSignatures(spark, dir).cache()
    val bands = sig.select($"doc_id", explode(array(
      (0 until K / 2).map(b =>
        struct(lit(b).as("band"),
          md5(concat(col(s"s${2 * b}"), col(s"s${2 * b + 1}"))).as("bh"))): _*
    )).as("e")).select($"doc_id", $"e.band", $"e.bh")
    val cand = bands.as("a").join(bands.as("b"),
        $"a.band" === $"b.band" && $"a.bh" === $"b.bh" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .distinct()
    val matches = (0 until K)
      .map(i => when(col(s"sa.s$i") === col(s"sb.s$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand
      .join(sig.as("sa"), $"d1" === $"sa.doc_id")
      .join(sig.as("sb"), $"d2" === $"sb.doc_id")
      .select($"d1", $"d2", (matches / lit(K.toDouble)).as("est_jaccard"))
      .filter($"est_jaccard" >= minEstJaccard)
      .orderBy($"d1", $"d2")
  }

  /** 60-bit SimHash fingerprint per document: md5 of each distinct token
    * gives a 60-bit hash; fingerprint bit j is the sign of the per-bit vote
    * sum. One shuffle-free pass via the native [[graft.functions.Simhash]]
    * expression (the relational formulation exploded 60× per token — same
    * bits, 60× the shuffle). */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        graft.functions.TextFunctions.simhash(tokens($"text")).as("simhash"))
      .orderBy($"doc_id")
  }

  /** SimHash near-dup pairs with pigeonhole band blocking: 4 bands of 15
    * bits — any pair at hamming distance ≤ 3 must agree on ≥ 1 band, so the
    * blocked join is exact for that threshold while never forming the full
    * cross product. Output is inherently quadratic in the size of a
    * duplicate CLUSTER (k identical docs → k²/2 pairs); run [[exact]] dedup
    * first in a production pipeline so clusters collapse to representatives
    * before near-dup pairing. */
  def simhashPairs(spark: SparkSession, dir: String,
      maxDist: Int = 3): DataFrame = {
    import spark.implicits._
    val fp = simhash(spark, dir).cache()
    val bands = fp.select($"doc_id", $"simhash", explode(array(
      (0 until 4).map(b => struct(lit(b).as("band"),
        expr(s"(simhash div cast(pow(2, ${15 * b}) as bigint)) % 32768")
          .as("bh"))): _*
    )).as("e")).select($"doc_id", $"simhash", $"e.band", $"e.bh")
    bands.as("a").join(bands.as("b"),
        $"a.band" === $"b.band" && $"a.bh" === $"b.bh" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"),
        expr("bit_count(a.simhash ^ b.simhash)").as("dist"))
      .distinct()
      .filter($"dist" <= maxDist)
      .orderBy($"d1", $"d2")
  }
}
