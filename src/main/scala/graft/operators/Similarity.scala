package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions.dot

/** Similarity search over the `embeddings` fixture (`Array[Float]`, dim 64).
  *
  * Dot products run through [[graft.functions.DotProduct]] — a native
  * Catalyst expression that compiles to a primitive loop inside whole-stage
  * codegen (the interpreted `zip_with`+`aggregate` formulation costs ~10×
  * on million-pair joins). Summation order is unchanged, so results stay
  * bit-identical to the DuckDB oracle.
  *
  * Scale story: [[bruteForceTopK]] broadcasts the small query side and
  * scans the corpus once (linear, perfectly parallel); [[cosineNearDup]]
  * is the quadratic all-pairs baseline (correct at fixture scale);
  * [[lshTopK]] is the 100 TB path — deterministic random-hyperplane
  * signatures bucket the corpus so each query only scans its own
  * Hamming-ball buckets.
  */
object Similarity {

  /** Embedding cast to double with precomputed L2 norm. */
  private def vecs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select($"vec_id",
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("norm", sqrt(dot($"v", $"v")))
  }

  /** All-pairs cosine near-duplicates above `threshold` (embedding-cosine
    * near-dup dedup). Quadratic candidate set — correct baseline at fixture
    * scale; production path is [[lshTopK]]-style bucketing first. */
  def cosineNearDup(spark: SparkSession, dir: String,
      threshold: Double = 0.4): DataFrame = {
    import spark.implicits._
    val e = vecs(spark, dir)
    // The threshold lives INSIDE the join condition: the nested-loop join
    // then evaluates the (codegen'd) dot product per candidate pair and
    // materializes only survivors — never the O(n²) intermediate of wide
    // vector rows. Survivors recompute cos in the projection (identical
    // expression ⇒ identical value).
    def cos = round(dot($"a.v", $"b.v") / $"a.norm" / $"b.norm", 6)
    e.as("a").join(e.as("b"),
        $"a.vec_id" < $"b.vec_id" && cos >= threshold)
      .select($"a.vec_id".as("v1"), $"b.vec_id".as("v2"), cos.as("cos"))
      .orderBy($"v1", $"v2")
  }

  /** Brute-force cosine top-k neighbors for a deterministic query subset
    * (`vec_id % 100 = 0`) — the exact-ANN baseline. The small query side is
    * broadcast; the corpus is scanned once. */
  def bruteForceTopK(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val e = vecs(spark, dir)
    val q = e.filter($"vec_id" % 100 === 0)
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"neighbor")
    broadcast(q).as("a").join(e.as("b"), $"a.vec_id" =!= $"b.vec_id")
      .select($"a.vec_id".as("q_id"), $"b.vec_id".as("neighbor"),
        round(dot($"a.v", $"b.v") / $"a.norm" / $"b.norm", 6).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"q_id", $"rank", $"neighbor", $"cos")
      .orderBy($"q_id", $"rank")
  }

  private val PLANES = 8
  private val DIM = 64

  /** Deterministic ±1 hyperplane component for (plane p, dim d): the parity
    * of the first hex digit of md5("p:d") — reproducible on any engine, no
    * RNG state to ship. */
  private def planeComponent(p: Int, d: Int): Double =
    if ((Integer.parseInt(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$p:$d".getBytes("UTF-8")).take(1).map("%02x".format(_))
        .mkString, 16) & 1) == 1) 1.0 else -1.0

  /** Plane p as an array<double> literal column (codegen'd dot again). */
  private def planeCol(p: Int): Column =
    array((0 until DIM).map(d => lit(planeComponent(p, d))): _*)

  /** LSH-bucketed approximate top-k: random-hyperplane sign bits form a
    * bucket key; queries probe their own bucket plus all buckets at Hamming
    * distance 1 (multi-probe). Candidate set per query is a few buckets, not
    * the corpus — the plan that holds at 1000 executors. */
  def lshTopK(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val e = vecs(spark, dir)
    val sigBits: Column = (0 until PLANES).map { p =>
      when(dot($"v", planeCol(p)) > 0, 1L << p).otherwise(0L)
    }.reduce(_ + _)
    val sig = e.withColumn("sig", sigBits)
    // multi-probe: each query also probes all Hamming-distance-1 buckets
    val probes = sig.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"norm".as("qnorm"),
        explode(array(lit(0L) +: (0 until PLANES)
          .map(p => lit(1L << p)): _*)).as("flip"),
        $"sig".as("qsig"))
      .withColumn("probe_sig", expr("qsig ^ flip"))
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"neighbor")
    probes.join(sig.as("b"), $"probe_sig" === $"b.sig" &&
        $"q_id" =!= $"b.vec_id")
      .select($"q_id", $"b.vec_id".as("neighbor"),
        round(dot($"qv", $"b.v") / $"qnorm" / $"b.norm", 6).as("cos"))
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"q_id", $"rank", $"neighbor", $"cos")
      .orderBy($"q_id", $"rank")
  }
}
