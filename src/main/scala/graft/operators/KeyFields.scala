package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KeyFieldBased sort/partition spec language — the reference's unix-sort
  * flag surface (`mapred/lib/KeyFieldBasedComparator.java:46`,
  * `KeyFieldBasedPartitioner.java:43`): specs like `-k2,3nr -k1` select
  * line fields as (possibly numeric, possibly reversed) sort or partition
  * keys.
  *
  * Field granularity only (the reference also allows `pos.char` character
  * offsets within a field; the fixtures and examples use field boundaries).
  * Each `-k` clause is an independent key: `from` through `to` (1-indexed,
  * inclusive; `to` omitted = through end of line), compared numerically
  * when flagged `n` (unix leading-number parse) and descending when
  * flagged `r`.
  *
  * Spark shape: each clause derives one expression column; sorting is a
  * plain `orderBy` over the derived columns (sampled range partitioning,
  * the TotalOrderPartitioner plan) and partitioning is `repartition` on
  * them (hash, the KeyFieldBasedPartitioner plan) — both declarative, so
  * Catalyst/AQE manage the exchanges. */
object KeyFields {

  /** One `-k` clause. */
  final case class KeySpec(from: Int, to: Option[Int], numeric: Boolean,
      reverse: Boolean)

  private val clause = """-k(\d+)([nr]*)(?:,(\d+)([nr]*))?""".r

  /** Parse a `-k pos1[,pos2][n][r]` spec list, e.g. `-k2,3nr -k1`. */
  def parse(spec: String): Seq[KeySpec] = {
    val toks = spec.trim.split("\\s+").filter(_.nonEmpty)
    require(toks.nonEmpty, "empty key spec")
    toks.toSeq.map {
      case clause(from, f1, to, f2) =>
        val flags = f1 + Option(f2).getOrElse("")
        KeySpec(from.toInt, Option(to).map(_.toInt),
          numeric = flags.contains('n'), reverse = flags.contains('r'))
      case t => throw new IllegalArgumentException(
        s"bad key spec '$t' (expected -kpos1[,pos2][n][r])")
    }
  }

  /** The text of fields `from..to` of `line` (like unix sort's key span). */
  private def span(line: Column, sep: String, s: KeySpec): Column = {
    val fields = split(line, java.util.regex.Pattern.quote(sep))
    val upper = s.to.map(t => lit(t - s.from + 1))
      .getOrElse(size(fields) - (s.from - 1))
    concat_ws(sep, slice(fields, lit(s.from), upper))
  }

  /** The derived comparison column for one clause: the field span, parsed
    * with unix `sort -n` leading-number semantics when numeric. */
  private def keyColumn(line: Column, sep: String, s: KeySpec): Column =
    if (s.numeric)
      coalesce(
        regexp_extract(span(line, sep, s),
          "^\\s*(-?(?:\\d+\\.?\\d*|\\.\\d+))", 1)
          .cast("double"),
        lit(0.0)) // unix sort: a non-numeric key compares as 0
    else span(line, sep, s)

  /** Sort `df` by the spec over its `lineCol` text column —
    * `sort -t<sep> -k...` as a total-order Spark sort. */
  def sorted(df: DataFrame, lineCol: String, sep: String,
      spec: String): DataFrame = {
    val orders = parse(spec).map { s =>
      val c = keyColumn(col(lineCol), sep, s)
      if (s.reverse) c.desc else c.asc
    }
    df.orderBy(orders: _*)
  }

  /** Partition `df` by the spec's key spans (H3 KeyFieldBasedPartitioner:
    * records sharing the key fields land in the same partition). */
  def partitioned(df: DataFrame, lineCol: String, sep: String, spec: String,
      numPartitions: Int): DataFrame = {
    val keys = parse(spec).map(s => span(col(lineCol), sep, s))
    df.repartition(numPartitions, keys: _*)
  }
}
