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

  /** Partitions `(K, T)` shuffle keys by K alone while the shuffle sorts by
    * the full (K, sort-order) pair — the grouping-comparator split. */
  private class KeyPartitioner(partitions: Int)
      extends org.apache.spark.Partitioner {
    def numPartitions: Int = partitions
    def getPartition(key: Any): Int =
      java.lang.Math.floorMod(key.asInstanceOf[(Any, Any)]._1.hashCode, partitions)
  }

  /** Secondary sort with the reference's exact execution contract: records
    * shuffle partitioned by key and arrive sorted by (key, `ordering`) via
    * Spark's spilling shuffle sort (`repartitionAndSortWithinPartitions` —
    * external sort, no in-memory materialization of the partition), then
    * each key run streams through `reduceFn`. Values are presented in sort
    * order with no per-key buffering — any partition size works.
    */
  def secondarySorted[T: Encoder, K: Encoder : Ordering,
      O: Encoder : scala.reflect.ClassTag](
      ds: Dataset[T],
      numPartitions: Int,
      key: T => K,
      ordering: Ordering[T])(
      reduceFn: (K, Iterator[T]) => Iterator[O]): Dataset[O] = {
    val spark = ds.sparkSession
    implicit val kOrd: Ordering[(K, T)] =
      Ordering.Tuple2(implicitly[Ordering[K]], ordering)
    val sorted = ds.rdd.map(t => ((key(t), t), null))
      .repartitionAndSortWithinPartitions(new KeyPartitioner(numPartitions))
    val out = sorted.mapPartitions { raw =>
      val buf = raw.map(_._1).buffered
      new Iterator[O] {
        private var cur: Iterator[O] = Iterator.empty
        private var run: Iterator[T] = Iterator.empty
        private def advance(): Unit =
          while (!cur.hasNext && { while (run.hasNext) run.next(); buf.hasNext }) {
            // Hadoop contract: unconsumed values of the previous key are
            // skipped (the run is drained above before moving on).
            val k = buf.head._1
            run = new Iterator[T] {
              def hasNext: Boolean = buf.hasNext &&
                implicitly[Ordering[K]].equiv(buf.head._1, k)
              def next(): T = buf.next()._2
            }
            cur = reduceFn(k, run)
          }
        def hasNext: Boolean = { advance(); cur.hasNext }
        def next(): O = { advance(); cur.next() }
      }
    }
    spark.createDataset(out)
  }

  /** Hadoop-Streaming-style pipe: run `command` once per partition, write
    * records to its stdin (one line each), read transformed lines from its
    * stdout. Dedicated writer and stderr-drain threads prevent pipe-buffer
    * deadlock — the same design as the reference's PipeMapRed output
    * threads — and, matching Hadoop Streaming, a nonzero child exit fails
    * the task (disable with `failOnNonZeroExit = false`). */
  def pipe(ds: Dataset[String], command: Seq[String],
      failOnNonZeroExit: Boolean = true): Dataset[String] = {
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
            try it.foreach(out.println)
            catch { case _: java.io.IOException => () } // child died early
            finally out.close()
          }
        }
        writer.setDaemon(true)
        writer.start()
        // drain stderr so a chatty child can't block on a full pipe;
        // keep a bounded tail for the failure message
        val errTail = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        val errDrain = new Thread {
          override def run(): Unit = {
            val er = new java.io.BufferedReader(
              new java.io.InputStreamReader(proc.getErrorStream))
            var line = er.readLine()
            while (line != null) {
              errTail.add(line)
              while (errTail.size > 20) errTail.poll()
              line = er.readLine()
            }
          }
        }
        errDrain.setDaemon(true)
        errDrain.start()
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getInputStream))
        val lines = Iterator.continually(reader.readLine())
          .takeWhile(_ != null)
        lines ++ {
          // runs after stdout is drained: enforce the exit-status contract
          val code = proc.waitFor()
          if (code != 0 && failOnNonZeroExit)
            throw new RuntimeException(
              s"pipe command '${command.mkString(" ")}' exited $code; " +
                s"stderr tail: ${String.join(" | ", errTail)}")
          Iterator.empty
        }
      }
    }
  }

  /** The reference's stream-output key/value split (PipeMapRed.splitKeyVal,
    * PipeMapRed.java:338-352): the key is everything before the
    * `numKeyFields`-th occurrence of `sep` (so a multi-field key KEEPS its
    * embedded separators), the value everything after it; a line with fewer
    * separators becomes `(line, "")`. */
  private[graft] def splitKeyVal(line: String, sep: String,
      numKeyFields: Int): (String, String) = {
    var pos = line.indexOf(sep)
    var k = 1
    while (k < numKeyFields && pos != -1) {
      pos = line.indexOf(sep, pos + sep.length)
      k += 1
    }
    if (pos == -1) (line, "")
    else (line.substring(0, pos), line.substring(pos + sep.length))
  }

  /** Keyed Hadoop-Streaming pipe with the reference's separator surface
    * (stream.map.output.field.separator / stream.num.map.output.key.fields,
    * PipeMapRed.java:338-352): records are written to the child as
    * `key<sep>value` lines and its output lines are split back into typed
    * `(key, value)` pairs at the `numKeyFields`-th separator. Same
    * per-partition process model and exit-code contract as [[pipe]]. */
  def pipeKeyed(ds: Dataset[(String, String)], command: Seq[String],
      fieldSeparator: String = "\t", numKeyFields: Int = 1,
      failOnNonZeroExit: Boolean = true): Dataset[(String, String)] = {
    import ds.sparkSession.implicits._
    val sep = fieldSeparator
    val n = numKeyFields
    pipe(ds.map { case (k, v) => k + sep + v }, command, failOnNonZeroExit)
      .map(l => splitKeyVal(l, sep, n))
  }

  /** Custom join over co-grouped per-key value streams (SURVEY §2.10 F9 —
    * the reference's pluggable join ops, contrib/data_join
    * DataJoinReducerBase:46): both sides shuffle once on the key and the
    * user function sees the two value iterators per key, free to implement
    * semi/anti/interval/custom-product semantics that don't fit a single
    * join condition. */
  def cogroupJoin[K: Encoder, A: Encoder, B: Encoder, O: Encoder](
      left: Dataset[A], right: Dataset[B])(
      keyA: A => K, keyB: B => K)(
      f: (K, Iterator[A], Iterator[B]) => IterableOnce[O]): Dataset[O] =
    left.groupByKey(keyA).cogroup(right.groupByKey(keyB)) {
      (k, as, bs) => f(k, as, bs).iterator
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
