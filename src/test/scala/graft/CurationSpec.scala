package graft

import org.apache.spark.sql.functions._

import graft.operators.{Relational, TextAnalysis}

/** Training-data curation operators: token-window chunking and
  * deterministic stratified sampling. */
class CurationSpec extends SparkSpec {

  test("chunking windows cover every token with the configured overlap") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 75).map(i => s"t$i").mkString(" ")), // starts 0/20/40/60
      (2L, (1 to 30).map(i => s"t$i").mkString(" ")), // exactly one
      (3L, (1 to 31).map(i => s"t$i").mkString(" ")), // 2 chunks, short tail
      (4L, "one two"),                                // single short chunk
      (5L, "")                                        // no chunks
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(docs, chunkTokens = 30, overlap = 10)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(byDoc(1L).length === 4)
    assert(byDoc(2L).length === 1)
    assert(byDoc(3L).length === 2)
    assert(byDoc(4L).length === 1 && byDoc(4L).head._4 === "one two")
    assert(!byDoc.contains(5L))
    // every chunk carries <= 30 tokens; consecutive chunks share exactly
    // the 10-token overlap; union of chunks = original tokens
    byDoc.filterKeys(_ != 4L).foreach { case (_, chunks) =>
      chunks.foreach { case (_, _, n, text) =>
        assert(text.split(" ").length === n && n <= 30)
      }
      chunks.sliding(2).foreach {
        case Array((_, _, _, a), (_, _, _, b)) =>
          assert(a.split(" ").drop(20).toSeq === b.split(" ").take(10).toSeq)
        case _ =>
      }
    }
    val rebuilt = byDoc(1L).zipWithIndex.flatMap { case ((_, _, _, t), i) =>
      val toks = t.split(" ").toSeq
      if (i == 0) toks else toks.drop(10)
    }
    assert(rebuilt === (1 to 75).map(i => s"t$i"))
  }

  test("stratified sample is deterministic and tracks per-source rates") {
    val a = Relational.stratifiedSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val b = Relational.stratifiedSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(a.toSeq === b.toSeq, "resampling must keep identical rows")
    // rates differ by source: a 50%-rate source must keep more than a
    // 5%-rate one over the full fixture
    val kept = a.groupBy(_._2).view.mapValues(_.size).toMap
    val total = Tables.documents(spark, sfDir)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def frac(src: String) = kept.getOrElse(src, 0).toDouble / total(src)
    // suffix%10 drives the rate: src9/src19 -> 50%, src0/src10 -> 5%
    val high = (frac("src9") + frac("src19")) / 2
    val low = (frac("src0") + frac("src10")) / 2
    assert(high > low, s"high-rate sources ($high) <= low-rate ($low)")
  }
}
