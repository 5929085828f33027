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

  test("splitKeyVal honors numKeyFields and missing separators") {
    // reference PipeMapRed.java:338-352 semantics
    assert(MrPipeline.splitKeyVal("a\tb\tc", "\t", 1) === ("a", "b\tc"))
    assert(MrPipeline.splitKeyVal("a\tb\tc", "\t", 2) === ("a\tb", "c"))
    // fewer separators than key fields -> whole line is the key, empty value
    assert(MrPipeline.splitKeyVal("a\tb", "\t", 3) === ("a\tb", ""))
    assert(MrPipeline.splitKeyVal("noseparator", "\t", 1)
      === ("noseparator", ""))
    // multi-char separators find whole occurrences
    assert(MrPipeline.splitKeyVal("a::b::c", "::", 2) === ("a::b", "c"))
  }

  test("pipeKeyed round-trips typed key/value pairs through a child") {
    import spark.implicits._
    val kv = spark.createDataset(Seq("k1" -> "v one", "k2" -> "v two"))
    val out = MrPipeline.pipeKeyed(kv, Seq("cat")).collect().sorted
    assert(out === Array("k1" -> "v one", "k2" -> "v two"))
  }

  test("pipeKeyed splits multi-field keys after the child transform") {
    import spark.implicits._
    // the child uppercases; numKeyFields=2 keeps 'date<tab>user' as the key
    val kv = spark.createDataset(Seq(
      "2026-01-01\tu1" -> "click", "2026-01-02\tu2" -> "view"))
    val out = MrPipeline.pipeKeyed(kv, Seq("tr", "a-z", "A-Z"),
      numKeyFields = 2).collect().sorted
    assert(out === Array(
      "2026-01-01\tU1" -> "CLICK", "2026-01-02\tU2" -> "VIEW"))
  }

  test("pipeKeyed keeps the exit-code contract") {
    import spark.implicits._
    val kv = spark.createDataset(Seq("a" -> "1", "b" -> "2")).repartition(1)
    val e = intercept[org.apache.spark.SparkException] {
      MrPipeline.pipeKeyed(kv, Seq("sh", "-c", "exit 5")).collect()
    }
    assert(e.getMessage.contains("exited 5") ||
      Option(e.getCause).exists(_.getMessage.contains("exited 5")))
  }

  test("cogroupJoin implements custom per-key join semantics") {
    import spark.implicits._
    val purchases = spark.createDataset(Seq(
      ("u1", 10.0), ("u1", 5.0), ("u2", 7.0), ("u4", 1.0)))
    val refunds = spark.createDataset(Seq(
      ("u1", 3.0), ("u3", 2.0)))
    // custom semantics no single join expresses: net spend per user with
    // purchase-count, emitting users from EITHER side (refund-only users
    // appear with zero purchases)
    val net = MrPipeline.cogroupJoin(purchases, refunds)(_._1, _._1) {
      (user, ps, rs) =>
        val bought = ps.map(_._2).toSeq
        val back = rs.map(_._2).sum
        Iterator.single((user, bought.sum - back, bought.size))
    }.collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(net === Map(
      "u1" -> ((12.0, 2)), "u2" -> ((7.0, 1)),
      "u3" -> ((-2.0, 0)), "u4" -> ((1.0, 1))))
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
