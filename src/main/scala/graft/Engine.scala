package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Single place that encodes the execution profile: AQE on (runtime
  * re-planning, skew-join splitting, partition coalescing), shuffle
  * parallelism sized for the local harness (32) but meant to be overridden by
  * `spark.sql.shuffle.partitions` on a real cluster, UTC session time.
  */
object Engine {
  def session(
      appName: String = "graft",
      master: String = "local[*]",
      shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // graft_dot / graft_simhash available on the SQL tier out of the box
    GraftExtensions.register(spark)
    spark
  }
}
