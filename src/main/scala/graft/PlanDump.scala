package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.util.control.NonFatal

/** Dump `explain("formatted")` for declared queries to files — the
  * optimization-round evidence trail (`plans/rNN/<query>_<tag>.txt`).
  *
  * Usage: `runMain graft.PlanDump <outDir> <tag> [q1,q2,...]`
  * Data dir comes from `SPARK_GRAFT_SF_DIR` (default sf0.1), core count
  * from `SPARK_GRAFT_CPUS` — the same env contract as [[Bench]], so the
  * captured plans are the plans the bench actually runs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.lift(0).getOrElse("plans/r18")
    val tag = args.lift(1).getOrElse("before")
    val only = args.lift(2).map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    ordered.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        Files.write(Paths.get(outDir, s"${name}_$tag.txt"),
          txt.getBytes(StandardCharsets.UTF_8))
        println(s"[plandump] wrote $name")
      } catch {
        case NonFatal(e) =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
