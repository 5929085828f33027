package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-linearity smoke: stages an N× copy of the sf dir (key-shifted
  * unions, so joins/dedup see real cardinality growth, not repeated keys)
  * and times representative operators at 1× and N×. An operator whose
  * time grows super-linearly here would melt at 100 TB — this is the
  * measure-don't-guess check behind README's scale numbers.
  *
  * Usage: `sbt "runMain graft.ScaleSmoke [mult]"` (default 10; reads
  * `SPARK_GRAFT_SF_DIR`, default sf0.1; stages under `target/scale/`).
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val staged = s"target/scale/x$mult"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // key-shift mult copies; `perturb` runs with the copy index `_i` still
    // in scope so per-copy transforms (near-dup text, decorrelated vectors)
    // stay next to the staging they modify
    def stage(table: String, keyCols: Seq[String],
        perturb: DataFrame => DataFrame = identity): Unit = {
      val src = spark.read.parquet(s"$sfDir/$table.parquet")
      val maxKeys = keyCols.map(k =>
        k -> (src.agg(max(col(k))).head().getLong(0) + 1L)).toMap
      val copies = src.withColumn("_i",
        explode(lit((0 until mult).toArray)))
      val shifted = keyCols.foldLeft(copies) { (df, k) =>
        df.withColumn(k, col(k) + col("_i") * maxKeys(k))
      }
      perturb(shifted).drop("_i")
        .write.mode("overwrite").parquet(s"$staged/$table.parquet")
    }
    stage("lineitem", Seq("l_orderkey"))
    stage("orders", Seq("o_orderkey"))
    // perturb text so N× docs are near-dups of their source, not exact
    // clones (exact clones would just re-test the 1× structure)
    stage("documents", Seq("doc_id"), _.withColumn("text",
      concat($"text", lit(" uniq"), $"_i")))
    stage("events", Seq("event_id", "user_id"))
    // embeddings: flip a per-(copy, dim) pseudo-random sign pattern so
    // copies are near-orthogonal to their source — near-dup pair structure
    // then grows linearly with mult (exact clones would grow the pair
    // output quadratically, which is the exact-dedup regime, and would
    // re-test bucket skew rather than corpus growth)
    stage("embeddings", Seq("vec_id"), _.withColumn("embedding", expr(
      """transform(embedding, (x, d) ->
        |  CASE WHEN _i = 0 OR pmod(xxhash64(_i * 64 + d), 2) = 0
        |       THEN x ELSE -x END)""".stripMargin)))
    for (t <- Seq("customer", "supplier", "part", "nation", "region"))
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$staged/$t.parquet")

    def time(name: String)(df: => DataFrame): Unit = {
      StageMemo.clear() // each op pays its own shared stages — honest scaling
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"op":"$name","sec":$s%.2f}""")
    }

    for ((label, dir) <- Seq("1x" -> sfDir, s"${mult}x" -> staged)) {
      println(s"== $label ($dir)")
      time(s"pricing_summary_$label")(
        operators.Relational.pricingSummary(spark, dir))
      time(s"global_sort_$label")(
        operators.Relational.globalSort(spark, dir))
      time(s"join_revenue_$label")(
        operators.Relational.revenueByNation(spark, dir))
      time(s"md5_sample_$label")(
        operators.Relational.md5Sample(spark, dir))
      time(s"simhash_$label")(operators.Dedup.simhash(spark, dir))
      time(s"asof_join_$label")(
        operators.TemporalJoins.eventsAsofClicks(spark, dir))
      time(s"range_join_$label")(
        operators.TemporalJoins.eventsInPurchaseHour(spark, dir))
      time(s"sessionize_$label")(
        operators.Relational.sessionize(spark, dir))
      // streaming shape at scale: trigger/commit overhead is fixed per
      // micro-batch, so the 1x -> Nx delta must track data volume only
      // (the key space — windows x event types — is unchanged by staging)
      time(s"stream_windows_$label")(
        streaming.Continuous.streamedWindowedCounts(spark, dir))
      // df caps scale with the corpus so the 1x rare-shingle structure
      // survives the N-fold df inflation of staged copies
      time(s"ngram_jaccard_$label")(operators.Dedup.ngramJaccardOf(
        Tables.documents(spark, dir),
        maxDf = if (dir == sfDir) 100 else 100 * mult))
      // curation five — their 100 TB claims get measured, not just planned
      time(s"decontaminate_$label")(
        operators.Curation.decontaminate(spark, dir))
      time(s"repetition_$label")(
        operators.Curation.repetitionSignals(spark, dir))
      time(s"source_cap_$label")(operators.Curation.sourceCap(spark, dir))
      time(s"bloom_dedup_$label")(operators.Curation.bloomDedup(spark, dir))
      // budget-exceeded path: the Bloom prefilter is skipped and the shard
      // goes straight to the exact semi-join
      time(s"bloom_fallback_$label")(operators.Curation.bloomDedup(spark, dir,
        bloomBudgetBytes = 1L))
      time(s"dedup_clusters_$label")(
        operators.Curation.dedupClusters(spark, dir))
      // the q25-semantics scale path: candidate join bounded by the bucket
      // gate, so 1x -> Nx must track the (linearized) pair structure
      time(s"neardup_lsh_$label")(
        operators.Similarity.cosineNearDupLsh(spark, dir))
      time(s"tfidf_$label")(operators.TextAnalysis.tfidfTopTerms(spark, dir))
    }
    spark.stop()
  }
}
