package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal joins — the two time-series operators a training-data pipeline
  * needs that have no single-expression Spark form: as-of joins ("most
  * recent fact at or before this row") and range joins ("facts whose
  * interval contains this row"). Both are built shuffle-once and
  * bounded-fan-out, per the custom-operator preference order: composed
  * from existing relational operators, no custom physical node needed.
  */
object TemporalJoins {

  /** As-of join: for each left row, the single most recent right row with
    * the same keys and `rightTs` ≤ `leftTs` (strictly < when
    * `strict`). Nulls when no earlier right row exists.
    *
    * Plan shape: union-tag + one window pass — both sides shuffle ONCE on
    * the keys, the shuffle sort orders by (ts, side-tag), and
    * `last(payload, ignoreNulls)` carries the running most-recent right
    * payload. No per-key buffering beyond window state, no range
    * explosion; at any corpus size this is one sort-shuffle. The side
    * tag orders left before right at equal timestamps when strict (so a
    * same-instant fact is invisible), after otherwise. Right rows tied on
    * (keys, ts) resolve deterministically to the greatest payload struct.
    *
    * `right` must carry the key columns, `rightTs`, and `payloadCols`;
    * the output is every `left` column plus the matched `payloadCols`. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, payloadCols: Seq[String],
      strict: Boolean = false): DataFrame = {
    val leftTag = if (strict) 0 else 2
    val lCols = left.columns.toSeq
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_tag", lit(leftTag))
      .withColumn("_p", lit(null).cast(
        right.select(payloadCols.map(col): _*).schema
          .fields.foldLeft(new org.apache.spark.sql.types.StructType())(
            (st, f) => st.add(f))))
    val r = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTs).as("_ts"), lit(1).as("_tag"),
        struct(payloadCols.map(col): _*).as("_p")) ++
        lCols.filterNot(keyCols.contains).map(c => lit(null).cast(
          left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts").asc, col("_tag").asc, col("_p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_match", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_tag") === leftTag)
      .select(lCols.map(col) ++
        payloadCols.map(p => col(s"_match.$p").as(p)): _*)
  }

  /** Range (interval) join: left rows matched to right intervals
    * `[startTs, endTs)` on equal keys. The scalable form: intervals
    * explode to the fixed-width time bins they cover, the join runs as an
    * EQUI-join on (keys, bin), and an exact containment filter finishes —
    * fan-out per interval is `length/binWidth + 1`, so the plan never
    * degenerates to a per-key cross product the way a raw inequality
    * join (nested loop) would. Pick `binWidthSec` near the typical
    * interval length. */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, startTs: String, endTs: String,
      binWidthSec: Long = 3600L): DataFrame = {
    val overlap = (left.columns.toSet - leftTs)
      .intersect(right.columns.toSet -- keyCols)
    require(overlap.isEmpty,
      s"left and right share non-key columns: ${overlap.mkString(",")}")
    val bin: Column => Column = c => floor(unix_timestamp(c) / binWidthSec)
    // alias both sides so the join resolves by qualifier even when left
    // and right descend from the SAME source (self-joins otherwise lean on
    // Spark's ambiguous-self-join repair, which an intervening alias or
    // select can silently defeat)
    val l = left.withColumn("_bin", bin(col(leftTs))).alias("_rjl")
    val r = right.withColumn("_bin",
      explode(sequence(bin(col(startTs)), bin(col(endTs))))).alias("_rjr")
    val cond = keyCols.map(k => col(s"_rjl.$k") === col(s"_rjr.$k"))
      .reduce(_ && _) &&
      col("_rjl._bin") === col("_rjr._bin") &&
      col(s"_rjl.$leftTs") >= col(s"_rjr.$startTs") &&
      col(s"_rjl.$leftTs") < col(s"_rjr.$endTs")
    l.join(r, cond)
      .select(left.columns.toSeq.map(c => col(s"_rjl.$c")) ++
        right.columns.toSeq.filterNot(keyCols.contains)
          .map(c => col(s"_rjr.$c")): _*)
  }

  /** Fixture query (q41): every event joined as-of to the user's most
    * recent STRICTLY-earlier click instant — the "time since last
    * interaction" feature. Clicks aggregate per (user, instant) first so
    * the as-of target is unique. */
  def eventsAsofClicks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir)
    val clicks = events.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts".as("click_ts"))
      .agg(sum($"value".cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .cast("double").as("click_v"))
    asofJoin(
      events.select($"event_id", $"user_id", $"ts"),
      clicks, Seq("user_id"), "ts", "click_ts",
      Seq("click_ts", "click_v"), strict = true)
      .orderBy($"event_id")
  }

  /** Fixture query (q42): events inside the one-hour window after any
    * purchase by the same user — binned range join, bin = window width. */
  def eventsInPurchaseHour(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir)
    val windows = events.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 1 HOUR")).as("w_end"))
    rangeJoin(
      events.select($"event_id", $"user_id", $"ts", $"event_type"),
      windows, Seq("user_id"), "ts", "w_start", "w_end")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_in_window"),
        countDistinct($"event_id").as("n_events"))
      .orderBy($"user_id")
  }
}
