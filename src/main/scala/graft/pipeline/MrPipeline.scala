package graft.pipeline

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Typed pipeline tier — the Spark-native form of the reference's
  * Mapper/Reducer user surface (SURVEY.md §2.10 F1-F3).
  *
  * Most of the reference API collapses onto `Dataset` verbs (map ≙ map/
  * flatMap, combiner+reducer ≙ groupByKey+Aggregator/reduceGroups, chain ≙
  * function composition). What this object adds are the two patterns that
  * are NOT one-liners:
  *
  *  - [[secondarySorted]]: the grouping-comparator / secondary-sort idiom
  *    (reference: JobConf.setOutputValueGroupingComparator, JobConf.java:657)
  *    — values arrive at the reduce function already sorted within each key,
  *    without materializing per-key buffers;
  *  - [[pipe]]: Hadoop-Streaming-style external-process record transform
  *    (reference: contrib/streaming PipeMapper.java:35, PipeMapRed.java:48)
  *    — one process per partition, writer thread + reader iterator, so the
  *    child's stdin/stdout never deadlocks.
  */
object MrPipeline {

  /** Secondary sort: repartition by key, sort runs by (key, sort columns)
    * inside each partition, then stream each key-run through `reduce` —
    * values are presented in sort order with no per-key buffering, exactly
    * the reference's sorted-reduce contract. Scales: one shuffle, no state
    * beyond the run iterator.
    */
  def secondarySorted[T: Encoder, K: Encoder : Ordering, O: Encoder](
      ds: Dataset[T],
      numPartitions: Int,
      key: T => K,
      ordering: Ordering[T])(
      reduceFn: (K, Iterator[T]) => Iterator[O]): Dataset[O] = {
    implicit val kt: Encoder[(K, T)] = Encoders.tuple(
      implicitly[Encoder[K]], implicitly[Encoder[T]])
    ds.map(t => (key(t), t))
      .repartition(numPartitions, col("_1"))
      .mapPartitions { it =>
        // Sort the partition's records by (key, ordering), then split into
        // key runs. Partition sizing is the caller's memory contract, as
        // with Hadoop's sort buffer.
        implicit val kOrd: Ordering[(K, T)] =
          Ordering.Tuple2(implicitly[Ordering[K]], ordering)
        val sorted = it.toArray.sorted
        new Iterator[O] {
          private var i = 0
          private var cur: Iterator[O] = Iterator.empty
          @annotation.tailrec
          private def advance(): Unit =
            if (!cur.hasNext && i < sorted.length) {
              val k = sorted(i)._1
              val start = i
              while (i < sorted.length && sorted(i)._1 == k) i += 1
              cur = reduceFn(k, sorted.slice(start, i).iterator.map(_._2))
              advance()
            }
          def hasNext: Boolean = { advance(); cur.hasNext }
          def next(): O = { advance(); cur.next() }
        }
      }
  }

  /** Hadoop-Streaming-style pipe: run `command` once per partition, write
    * records to its stdin (one line each), read transformed lines from its
    * stdout. A dedicated writer thread prevents pipe-buffer deadlock —
    * the same design as the reference's PipeMapRed output threads. */
  def pipe(ds: Dataset[String], command: Seq[String]): Dataset[String] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val pb = new ProcessBuilder(command: _*)
        pb.redirectErrorStream(false)
        val proc = pb.start()
        val writer = new Thread {
          override def run(): Unit = {
            val out = new java.io.PrintWriter(proc.getOutputStream)
            try it.foreach(out.println) finally out.close()
          }
        }
        writer.setDaemon(true)
        writer.start()
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getInputStream))
        Iterator.continually(reader.readLine()).takeWhile(_ != null)
      }
    }
  }

  /** WordCount on the typed tier (flatMap → groupByKey → count) — the
    * reference's canonical Mapper/Reducer example (examples/WordCount.java)
    * expressed as Dataset verbs; Catalyst still plans partial+final agg. */
  def wordCount(lines: Dataset[String]): Dataset[(String, Long)] = {
    import lines.sparkSession.implicits._
    lines.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupByKey(identity)
      .count()
  }
}
