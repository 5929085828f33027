package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

class TemporalJoinsSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("asof join picks the most recent right row at or before each left row") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", t("2024-01-01 10:00:00")),
      (2L, "u1", t("2024-01-01 10:05:00")),
      (3L, "u1", t("2024-01-01 09:00:00")), // before any right row
      (4L, "u2", t("2024-01-01 10:00:00"))  // other key
    ).toDF("id", "k", "ts")
    val right = Seq(
      ("u1", t("2024-01-01 09:30:00"), 1.0),
      ("u1", t("2024-01-01 10:02:00"), 2.0),
      ("u2", t("2024-01-01 08:00:00"), 9.0)
    ).toDF("k", "rts", "v")
    val got = TemporalJoins.asofJoin(left, right, Seq("k"), "ts", "rts",
      Seq("rts", "v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
    assert(got === Map(
      1L -> Some(1.0), // 09:30 row
      2L -> Some(2.0), // 10:02 row
      3L -> None,      // nothing earlier
      4L -> Some(9.0)))
  }

  test("asof join strict mode excludes same-instant right rows") {
    import spark.implicits._
    val left = Seq((1L, "u", t("2024-01-01 10:00:00"))).toDF("id", "k", "ts")
    val right = Seq(
      ("u", t("2024-01-01 10:00:00"), 5.0),
      ("u", t("2024-01-01 09:00:00"), 3.0)).toDF("k", "rts", "v")
    def run(strict: Boolean) = TemporalJoins
      .asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v"), strict)
      .collect().head.getDouble(3)
    assert(run(strict = false) === 5.0) // <= includes the 10:00 row
    assert(run(strict = true) === 3.0)  // <  sees only 09:00
  }

  test("range join matches intervals exactly across bin boundaries") {
    import spark.implicits._
    val left = Seq(
      (1L, "u", t("2024-01-01 10:30:00")), // inside
      (2L, "u", t("2024-01-01 10:59:59")), // inside, near end
      (3L, "u", t("2024-01-01 11:00:00")), // AT end -> excluded [start,end)
      (4L, "u", t("2024-01-01 09:59:59")), // before start
      (5L, "x", t("2024-01-01 10:30:00"))  // wrong key
    ).toDF("id", "k", "ts")
    val right = Seq(
      ("u", t("2024-01-01 10:00:00"), t("2024-01-01 11:00:00"))
    ).toDF("k", "s", "e")
    // tiny bins force the interval to span many bins — the containment
    // filter must still be exact
    val got = TemporalJoins.rangeJoin(left, right, Seq("k"), "ts", "s", "e",
      binWidthSec = 60).collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L))
  }

  test("range join equals the naive inequality join on the fixture") {
    import spark.implicits._
    val events = Tables.events(spark, sfDir)
    val windows = events.filter($"event_type" === "purchase")
      .select($"user_id".as("wk"), $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 1 HOUR")).as("w_end"))
    val naive = events.as("e").join(windows,
        $"e.user_id" === $"wk" && $"e.ts" >= $"w_start" && $"e.ts" < $"w_end")
      .select($"event_id", $"w_start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    val binned = TemporalJoins.rangeJoin(
      events.select($"event_id", $"user_id", $"ts"),
      windows.withColumnRenamed("wk", "user_id"),
      Seq("user_id"), "ts", "w_start", "w_end")
      .select($"event_id", $"w_start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(naive.nonEmpty && binned === naive)
  }

  test("asof fixture query matches a window-function twin") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val events = Tables.events(spark, sfDir)
    val got = TemporalJoins.eventsAsofClicks(spark, sfDir)
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    // twin: union trick replaced by a lag-over-clicks formulation
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"is_click")
      .rowsBetween(Window.unboundedPreceding, -1)
    val twin = events
      .withColumn("is_click", when($"event_type" === "click", 1).otherwise(0))
      .withColumn("prev_click_ts",
        last(when($"is_click" === 1, $"ts"), ignoreNulls = true).over(w))
      .filter($"event_id".isNotNull)
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Timestamp]("prev_click_ts"))).toMap
    assert(got.keySet === twin.keySet)
    got.foreach { case (id, ts) => assert(ts === twin(id), s"event $id") }
  }
}
