package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.pipeline.MrPipeline

class PipelineSpec extends SparkSpec {

  test("typed wordCount equals the relational wordcount") {
    import spark.implicits._
    val lines = Tables.documents(spark, sfDir).select("text").as[String]
    val typed = MrPipeline.wordCount(lines).collect().toMap
    val sql = Relational.wordCount(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(typed === sql)
  }

  test("secondarySorted presents values in sort order per key") {
    import spark.implicits._
    val orders = Tables.orders(spark, sfDir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .as[(Long, Long, Double)]
    // per customer: first order by (price desc, orderkey) — via typed
    // secondary sort, no per-key buffering in user code
    val firsts = MrPipeline.secondarySorted(
      orders, 4, (t: (Long, Long, Double)) => t._1,
      Ordering.by[(Long, Long, Double), (Double, Long)](t => (-t._3, t._2)))(
      (k, it) => Iterator.single(k -> it.next()._2))
      .collect().toMap
    // oracle: window function
    val expected = Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"o_custkey")
          .orderBy($"o_totalprice".desc, $"o_orderkey")))
      .filter($"rn" === 1)
      .select($"o_custkey", $"o_orderkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(firsts === expected)
  }

  test("pipe streams records through an external process") {
    import spark.implicits._
    val lines = spark.createDataset(Seq("hello world", "graft engine"))
    val out = MrPipeline.pipe(lines, Seq("tr", "a-z", "A-Z"))
      .collect().sorted
    assert(out === Array("GRAFT ENGINE", "HELLO WORLD"))
  }

  test("pipe fails the task on nonzero child exit (Hadoop Streaming contract)") {
    import spark.implicits._
    val lines = spark.createDataset(Seq("a", "b")).repartition(1)
    val e = intercept[org.apache.spark.SparkException] {
      MrPipeline.pipe(lines, Seq("sh", "-c", "head -1; exit 3")).collect()
    }
    assert(e.getMessage.contains("exited 3") ||
      Option(e.getCause).exists(_.getMessage.contains("exited 3")))
    // opt-out keeps partial output without failing
    val partial = MrPipeline.pipe(lines,
      Seq("sh", "-c", "head -1; exit 3"), failOnNonZeroExit = false)
      .collect()
    assert(partial.length === 1)
  }

  test("pipe survives a stderr-chatty child (drain prevents deadlock)") {
    import spark.implicits._
    val lines = spark.createDataset(Seq("x", "y")).repartition(1)
    // ~1 MB of stderr before touching stdin — would deadlock without the
    // stderr drain thread
    val out = MrPipeline.pipe(lines, Seq("sh", "-c",
      "i=0; while [ $i -lt 20000 ]; do echo noisenoisenoisenoisenoise >&2; i=$((i+1)); done; tr x-z X-Z"))
      .collect().sorted
    assert(out === Array("X", "Y"))
  }
}
