package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KeyFieldBased sort/partition spec language — the reference's unix-sort
  * flag surface (`mapred/lib/KeyFieldBasedComparator.java:46`,
  * `KeyFieldBasedPartitioner.java:43`): specs like `-k2,3nr -k1` or
  * `-k2.3,2.5` select line fields (optionally narrowed to character spans
  * within a field) as (possibly numeric, possibly reversed) sort or
  * partition keys.
  *
  * Each `-k` clause is an independent key: field `from` through `to`
  * (1-indexed, inclusive; `to` omitted = through end of line), optionally
  * starting at character `pos1.char1` of the first field and ending at
  * character `pos2.char2` of the last (unix sort semantics: chars are
  * 1-indexed within the field; an end char of 0 means the last character
  * of the field). Compared numerically when flagged `n` (unix leading-
  * number parse) and descending when flagged `r`.
  *
  * Spark shape: each clause derives one expression column; sorting is a
  * plain `orderBy` over the derived columns (sampled range partitioning,
  * the TotalOrderPartitioner plan) and partitioning is `repartition` on
  * them (hash, the KeyFieldBasedPartitioner plan) — both declarative, so
  * Catalyst/AQE manage the exchanges. */
object KeyFields {

  /** One `-k` clause. `fromChar`/`toChar` are 1-indexed character offsets
    * within the first/last field of the span (`toChar` None = through the
    * end of the last field). */
  final case class KeySpec(from: Int, to: Option[Int], numeric: Boolean,
      reverse: Boolean, fromChar: Int = 1, toChar: Option[Int] = None)

  private val clause =
    """-k(\d+)(?:\.(\d+))?([nr]*)(?:,(\d+)(?:\.(\d+))?([nr]*))?""".r

  /** Parse a `-k pos1[.char1][,pos2[.char2]][n][r]` spec list, e.g.
    * `-k2,3nr -k1` or `-k2.3,2.5`. */
  def parse(spec: String): Seq[KeySpec] = {
    val toks = spec.trim.split("\\s+").filter(_.nonEmpty)
    require(toks.nonEmpty, "empty key spec")
    toks.toSeq.map {
      case clause(from, fc, f1, to, tc, f2) =>
        val flags = f1 + Option(f2).getOrElse("")
        val fromChar = Option(fc).map(_.toInt).getOrElse(1)
        require(fromChar >= 1, s"start char must be >= 1 in '$spec'")
        KeySpec(from.toInt, Option(to).map(_.toInt),
          numeric = flags.contains('n'), reverse = flags.contains('r'),
          fromChar = fromChar,
          // unix sort: an end char of 0 = last char of the field
          toChar = Option(tc).map(_.toInt).filter(_ > 0))
      case t => throw new IllegalArgumentException(
        s"bad key spec '$t' (expected -kpos1[.char1][,pos2[.char2]][n][r])")
    }
  }

  /** The text of fields `from..to` of `line`, narrowed to the clause's
    * character offsets (like unix sort's key span: the span INCLUDES the
    * separators between its fields, and char offsets count within the
    * first/last field). */
  private def span(line: Column, sep: String, s: KeySpec): Column = {
    val fields = split(line, java.util.regex.Pattern.quote(sep))
    if (s.fromChar == 1 && s.toChar.isEmpty) {
      val upper = s.to.map(t => lit(t - s.from + 1))
        .getOrElse(size(fields) - (s.from - 1))
      concat_ws(sep, slice(fields, lit(s.from), upper))
    } else {
      // unix sort resolves char offsets as LINE positions measured from the
      // field start — an offset past a short field spills into the rest of
      // the line (e.g. -k2.3 on "hh 1 82" starts at the '8'), and the end
      // clips at the line end
      def fieldStart(f: Int): Column = // 1-based char position of field f
        if (f == 1) lit(1)
        else length(concat_ws(sep, slice(fields, lit(1), lit(f - 1)))) +
          lit(sep.length + 1)
      val start = fieldStart(s.from) + lit(s.fromChar - 1)
      val endPos = s.to match {
        case Some(t) => s.toChar match {
          case Some(c) => least(fieldStart(t) + lit(c - 1), length(line))
          case None => // `.0`/omitted end char: exactly the end of field t
            fieldStart(t) + coalesce(length(element_at(fields, t)), lit(0)) -
              lit(1)
        }
        case None => length(line)
      }
      line.substr(start, greatest(endPos - start + lit(1), lit(0)))
    }
  }

  /** The derived comparison column for one clause: the field span, parsed
    * with unix `sort -n` leading-number semantics when numeric. */
  private def keyColumn(line: Column, sep: String, s: KeySpec): Column =
    if (s.numeric) {
      val num = regexp_extract(span(line, sep, s),
        "^\\s*(-?(?:\\d+\\.?\\d*|\\.\\d+))", 1)
      // no leading number extracts as '' — unix sort compares that as 0
      // (ANSI mode would throw on the cast, so gate it explicitly)
      when(num === "", lit(0.0)).otherwise(num.cast("double"))
    } else span(line, sep, s)

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
