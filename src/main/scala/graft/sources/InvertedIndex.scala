package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** S20 — sharded inverted-index sink, the Spark-native analogue of the
  * reference's Lucene index build (`contrib/index/.../IndexUpdateMapper
  * .java`, `lucene/ShardWriter.java`): map emits (term, doc), a hash
  * partitioner routes terms to shards, reducers write per-shard indexes.
  *
  * Here the index is columnar: one row per term with its sorted posting
  * list, written parquet-partitioned by shard (= `pmod(hash(term), n)`,
  * the reference's shard router). Reads benefit from partition pruning on
  * the shard column plus parquet min/max pruning on the sorted term
  * column — a term lookup touches one shard directory and few row groups.
  *
  * Scale shape: one shuffle on the term key; posting lists are bounded by
  * `maxDf` the same way the dedup pipeline bounds shingles (a
  * stopword-grade term would otherwise materialize a corpus-wide list in
  * one aggregation buffer — Lucene's stopword filtering exists for the
  * same reason). Dropped terms are recorded in a sidecar `_stopterms`
  * directory so the search side can reject queries on them instead of
  * silently returning empty. */
object InvertedIndex {

  private def terms(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(filter(split(lower(col("text")), "\\s+"), t => t =!= ""))
        .as("term"))
      .distinct()

  /** Build and write the sharded index; returns the index path. */
  def write(docs: DataFrame, path: String, nShards: Int = 8,
      maxDf: Int = 1000000): String = {
    val t = terms(docs)
    // two writes consume the df counts (index + stop-term sidecar);
    // persist so the tokenize+distinct+count pipeline runs once, not per job
    val dfCounts = t.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val keep = dfCounts.filter(col("df") <= maxDf).select(col("term"))
      val dropped = dfCounts.filter(col("df") > maxDf)
      t.join(keep, Seq("term"), "left_semi")
        .groupBy(col("term"))
        .agg(sort_array(collect_list(col("doc_id"))).as("postings"),
          count(lit(1)).as("df"))
        .withColumn("shard", pmod(hash(col("term")), lit(nShards)))
        .repartition(col("shard"))
        .sortWithinPartitions(col("term"))
        .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(path)
      dropped.write.mode(SaveMode.Overwrite).parquet(s"$path/_stopterms")
    } finally dfCounts.unpersist()
    path
  }

  /** Conjunctive (AND) term search over a written index: doc ids containing
    * EVERY query term. The scan filters on the term column (pushed to
    * parquet) so only the query terms' row groups are read. Throws if any
    * term was df-capped out of the index — absence must not read as an
    * empty result. */
  def searchAll(spark: SparkSession, path: String,
      queryTerms: Seq[String]): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    val q = queryTerms.map(_.toLowerCase).distinct
    val stop = spark.read.parquet(s"$path/_stopterms")
      .filter(col("term").isin(q: _*)).collect()
    require(stop.isEmpty,
      s"query terms were df-capped out of the index: " +
        stop.map(_.getAs[String]("term")).mkString(","))
    spark.read.parquet(path)
      .filter(col("term").isin(q: _*))
      .select(explode(col("postings")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("hits"))
      .filter(col("hits") === q.size)
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }
}
