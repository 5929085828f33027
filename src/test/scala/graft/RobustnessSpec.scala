package graft

import java.nio.file.{Files, Paths}

/** Bad-record handling and compression (SURVEY §4.2: "bad-record skip →
  * PERMISSIVE readers"; §1.4 codecs). */
class RobustnessSpec extends SparkSpec {

  test("permissive reader skips malformed records instead of failing the job") {
    val dir = "target/tmp/badcsv"
    new java.io.File(dir).mkdirs()
    Files.write(Paths.get(s"$dir/part.csv"),
      "1,alpha,10.5\n2,beta\nnot,a,number\n4,delta,7.25\n"
        .getBytes("UTF-8"))
    val schema = "id INT, name STRING, score DOUBLE"
    val ok = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_c")
      .csv(dir)
    val rows = ok.collect()
    assert(rows.length === 4, "permissive keeps all rows")
    // malformed rows surface as nulls, not job failure
    assert(rows.count(_.isNullAt(2)) >= 1)
    // DROPMALFORMED = the reference's SkipBadRecords behavior
    val dropped = spark.read.schema(schema)
      .option("mode", "DROPMALFORMED").csv(dir).collect()
    assert(dropped.length < rows.length)
    assert(dropped.forall(!_.isNullAt(0)))
  }

  test("degenerate inputs: empty corpora and empty join sides stay empty") {
    import spark.implicits._
    import graft.operators.{Dedup, TemporalJoins}
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.ngramJaccardOf(noDocs).count() === 0)
    val left = Seq((1L, "u", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("id", "k", "ts")
    val noRight = Seq.empty[(String, java.sql.Timestamp, Double)]
      .toDF("k", "rts", "v")
    val asof = TemporalJoins.asofJoin(left, noRight, Seq("k"), "ts", "rts",
      Seq("v")).collect()
    // left rows survive with null payloads (left-join semantics)
    assert(asof.length === 1 && asof.head.isNullAt(3))
    assert(TemporalJoins.rangeJoin(left, noRight.select($"k",
      $"rts".as("s"), $"rts".as("e")), Seq("k"), "ts", "s", "e").count() === 0)
  }

  test("new diagnostics tolerate null text, null vectors, empty frames") {
    import spark.implicits._
    import graft.operators.{Similarity, TextAnalysis}
    // tf-idf: null and empty texts contribute no terms; docs made entirely
    // of them disappear from the output (same as the oracle's unnest)
    val docs = Seq((1L, "a b a"), (2L, null.asInstanceOf[String]), (3L, ""))
      .toDF("doc_id", "text")
    val tfidf = TextAnalysis.tfidfTopTermsOf(docs).collect()
    assert(tfidf.map(_.getLong(0)).distinct.toSeq === Seq(1L))
    assert(TextAnalysis.tfidfTopTermsOf(
      Seq.empty[(Long, String)].toDF("doc_id", "text")).count() === 0)
    // centroids: a null vector contributes no (label, d) rows — n counts
    // only real vectors, mirroring the oracle's NULL-skipping WHERE
    val e = Seq((1L, 0, Array(2.0, 4.0)), (2L, 0, null.asInstanceOf[Array[Double]]))
      .toDF("vec_id", "label", "v")
    val cents = Similarity.centroidCoords(e).collect()
      .map(r => r.getInt(1) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(cents === Map(0 -> ((2.0, 1L)), 1 -> ((4.0, 1L))))
    // outliers EXCLUDE the null vector rather than clamp-scoring it as
    // sitting exactly at the centroid (dist 0)
    val outs = Similarity.centroidOutliersOf(e).collect()
    assert(outs.map(_.getLong(2)).toSeq === Seq(1L) &&
      outs.head.getDouble(3) === 0.0)
    // LSH near-dup: empty corpus stays empty end to end
    assert(Similarity.cosineNearDupLshOf(
      Seq.empty[(Long, Array[Double])].toDF("vec_id", "v")).count() === 0)
  }

  test("training-layout tier tolerates null text, empty frames, missing weights") {
    import spark.implicits._
    import graft.operators.{Curation, Dedup, TextAnalysis}
    val docs = Seq((1L, "s", "a b a"), (2L, "s", null.asInstanceOf[String]),
      (3L, "s", "")).toDF("doc_id", "source", "text")
    val empty = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "source", "text")
    // packing / perplexity / vocab growth: null and empty texts pack and
    // score nothing; empty corpora stay empty end to end
    assert(TextAnalysis.packSequencesOf(docs).collect()
      .map(_.getLong(1)).toSeq === Seq(1L))
    assert(TextAnalysis.packSequencesOf(empty).count() === 0)
    assert(TextAnalysis.perplexityOf(docs).collect()
      .map(_.getLong(0)).toSeq === Seq(1L))
    assert(TextAnalysis.perplexityOf(empty).count() === 0)
    assert(TextAnalysis.vocabGrowthOf(empty).count() === 0)
    assert(Dedup.passageDedupOf(docs).count() === 0,
      "a single non-empty doc has no repeated passage")
    assert(Dedup.sourceOverlapOf(docs).count() === 0,
      "one source can never overlap itself")
    // token-pair merges: docs with < 2 tokens contribute no pairs — and
    // must not crash (sequence(1, 0) DESCENDS; the pair branch filters),
    // while their unigrams still count toward the c1/c2 frequencies
    val merges = TextAnalysis.tokenPairMergesOf(
      Seq((1L, "s", "a b a"), (2L, "s", "solo"), (3L, "s", ""),
        (4L, "s", null.asInstanceOf[String]))
        .toDF("doc_id", "source", "text")).collect()
    assert(merges.map(r => (r.getString(1), r.getString(2))).toSet ===
      Set(("a", "b"), ("b", "a")), "only the 2+-token doc pairs up")
    assert(merges.forall(_.getLong(3) === 1L))
    assert(TextAnalysis.tokenPairMergesOf(empty).count() === 0)
    // incremental dedup: an increment of sub-shingle-length docs gets
    // verdict rows (exact dedup still applies), never a crash
    val shorts = Seq((10L, "x y"), (20L, "x y"), (31L, "x y"))
      .toDF("doc_id", "text")
    val inc = Dedup.incrementalDedupOf(shorts,
      org.apache.spark.sql.functions.pmod($"doc_id",
        org.apache.spark.sql.functions.lit(10)) === 0)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(3)))).toMap
    assert(inc.keySet === Set(10L, 20L))
    assert(inc(20L) === ((1, 0)), "exact dup of the smaller-id incoming doc")
    assert(inc(10L) === ((1, 0)), "exact dup of the existing doc 31")
    // pii scan: null text yields null counts but never a row drop — the
    // privacy pass must account for EVERY document
    val pii = Curation.piiScanOf(docs).collect()
    assert(pii.length === 3, "pii scan accounts for every doc")
    // epoch mix: a weight class missing from the policy drops the source
    // (inner-join semantics = weight 0), it does not fail the job
    val mixed = Curation.epochMixOf(
      docs.withColumn("wk", org.apache.spark.sql.functions.lit(7)),
      Seq(0 -> 1.0).toDF("wk", "weight"))
    assert(mixed.count() === 0)
  }

  test("star contraction tolerates self-loops, duplicates, both orientations") {
    import spark.implicits._
    import graft.operators.Curation
    // the same component expressed messily: duplicate pairs, reversed
    // duplicates, and self-loops must not change the answer
    val pairs = Seq(
      (1L, 2L), (2L, 1L), (1L, 2L), // dup + reversed dup
      (2L, 3L),
      (7L, 7L),                     // self-loop-only vertex
      (9L, 8L)
    ).toDF("d1", "d2")
    val labels = Curation.connectedComponentsStar(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 7L, 8L -> 8L, 9L -> 8L))
  }

  test("star contraction accepts union-lineage pair inputs (q86's shape)") {
    import graft.operators.{Curation, Dedup, Multimodal}
    // q86 feeds the contraction a UNION of two real pair stages. On
    // Spark 4.1 a localCheckpoint'ed frame still carries the origin
    // plan's Catalyst constraints (with stale attribute ids), and the
    // loop's self-union threw `key not found: u#N` on exactly this input
    // at the 10x scale smoke. driverEdgeBudget = 0 forces the distributed
    // loop at fixture size, which REPRODUCES the crash pre-fix (verified:
    // a toy union's constraints don't trip it, the genuine pair-stage
    // lineage does) — so this differential is the regression net, and it
    // also pins that both contraction paths label the union identically.
    StageMemo.clear()
    def run(budget: Long) = Curation.crossModalClustersOf(
      Tables.documents(spark, sfDir),
      Dedup.ngramPairs(spark, sfDir, 0.8, 100),
      Multimodal.blockhashPairs(spark, sfDir, 3),
      driverEdgeBudget = budget).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val distributed = run(0)
    assert(distributed.nonEmpty)
    assert(distributed === run(100000), "both paths label identically")
  }

  test("star contraction keeps non-Long integral ids on the driver fast path") {
    import spark.implicits._
    import graft.operators.Curation
    // a small INT-keyed graph takes the count-gated driver union-find; it
    // must neither cast-crash (the fast path unions over boxed Longs) nor
    // change the output schema relative to the distributed path
    val pairs = Seq((1, 2), (2, 3), (9, 8)).toDF("d1", "d2")
    val comp = Curation.connectedComponentsStar(pairs)
    assert(comp.schema("label").dataType ===
      org.apache.spark.sql.types.IntegerType)
    val labels = comp.collect().map(r => (r.getInt(0), r.getInt(1))).toMap
    assert(labels === Map(1 -> 1, 2 -> 1, 3 -> 1, 8 -> 8, 9 -> 8))
    // non-integral ids (string keys) fall back to the type-agnostic
    // distributed contraction regardless of graph size
    val sPairs = Seq(("a", "b"), ("b", "c"), ("z", "y")).toDF("d1", "d2")
    val sLabels = Curation.connectedComponentsStar(sPairs).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(sLabels === Map("a" -> "a", "b" -> "a", "c" -> "a",
      "y" -> "y", "z" -> "y"))
  }

  test("q110-q112 guards: loud refusals and degenerate inputs") {
    import spark.implicits._
    import graft.operators.{Curation, Dedup}
    // misconfigurations fail fast with a named argument, not a bad plan
    val e1 = intercept[IllegalArgumentException](
      Dedup.lshPlanner(spark, sfDir, threshold = 0.5, floor = 0.9))
    assert(e1.getMessage.contains("floor"))
    val e2 = intercept[IllegalArgumentException](
      Curation.trainingManifest(spark, sfDir, nShards = 0))
    assert(e2.getMessage.contains("nShards"))
    // an empty corpus yields an empty manifest-style dedup, not an error
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.normalizedDedupOf(noDocs).count() === 0)
    // null text hashes to a null canonical form and lands in one group
    // (md5(NULL) = NULL on both engines) rather than crashing the scan
    val withNull = Seq((1L, null), (2L, "a b"), (3L, "A  b."))
      .asInstanceOf[Seq[(Long, String)]].toDF("doc_id", "text")
    val groups = Dedup.normalizedDedupOf(withNull).collect()
    assert(groups.map(_.getAs[Long]("n_copies")).sum === 3L)
    assert(groups.exists(r => r.getAs[Long]("keeper") == 2L &&
      r.getAs[Long]("n_copies") == 2L), "2/3 share a canonical form")
  }

  test("k-means over a corpus with no valid vectors returns empty, not error") {
    import spark.implicits._
    import graft.operators.Similarity
    // all-null / null-element / zero-norm vectors are excluded from the
    // working frame; zero seeds must yield the empty assignment with the
    // contract schema (array_min over zero candidates fails analysis)
    val noVecs = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "u")
    val out = Similarity.kmeansOf(noVecs, k = 4, iters = 2)
    assert(out.columns.toSeq === Seq("vec_id", "u", "cluster", "score"))
    assert(out.count() === 0)
  }

  test("gzip text round trip (gzip-aware line reader, S2)") {
    import spark.implicits._
    val dir = "target/tmp/gz"
    val lines = Seq("line one", "line two", "line three")
    spark.createDataset(lines).write.mode("overwrite")
      .option("compression", "gzip").text(dir)
    assert(new java.io.File(dir).listFiles()
      .exists(_.getName.endsWith(".gz")), "expected gzip part files")
    val back = spark.read.text(dir).collect().map(_.getString(0)).sorted
    assert(back.toSeq === lines.sorted)
  }

  test("span/containment audits tolerate empty, null, and short documents") {
    import spark.implicits._
    import graft.operators.Dedup
    // docs shorter than the window, null text, empty text: all surface as
    // zero-coverage rows, never as dropped rows or exceptions
    val docs = Seq((1L, "a b c"), (2L, null.asInstanceOf[String]),
      (3L, ""), (4L, "x y z w v u t s"), (5L, "x y z w v u t s tail"))
      .toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpansOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(spans.keySet === Set(1L, 2L, 3L, 4L, 5L),
      "every document gets a row, including null/empty/short")
    assert(spans(1L) === ((3L, 0L)) && spans(2L) === ((0L, 0L)) &&
      spans(3L) === ((0L, 0L)))
    // the planted shared 8-run is counted for both carriers
    assert(spans(4L)._2 === 8L && spans(5L)._2 === 8L)
    // empty corpus: both audits stay empty without error
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.duplicatedSpansOf(noDocs).count() === 0)
    assert(Dedup.containmentOf(Dedup.shinglesOf(noDocs)).count() === 0)
    // a doc with < 3 tokens yields no shingles, so no containment rows
    val short = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    assert(Dedup.containmentOf(Dedup.shinglesOf(short)).count() === 0)
  }
}
