package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session, local[4]). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sfDir = "/root/testdata/sf0.001"

  /** Recursive delete for per-test scratch dirs. */
  protected def rmrf(p: java.io.File): Unit = {
    if (p.isDirectory) p.listFiles().foreach(rmrf)
    p.delete()
    ()
  }
  protected def rmrf(path: String): Unit = rmrf(new java.io.File(path))
}

object SparkSpec {
  lazy val session: SparkSession =
    Engine.session(appName = "graft-test", master = "local[4]",
      shufflePartitions = 4)
}
