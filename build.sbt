ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "quatrainmapreducespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The bench driver tails `sbt "runMain graft.Bench"` stdout for bare JSON
// report lines. sbt's default BufferedOutput wraps every forked-process
// line in "[info] " and appends a "[success] Total time…" trailer, so the
// captured tail never contains parseable JSON (BENCH_r4..r7 all have
// parsed=null). StdoutOutput passes forked stdout through unprefixed, and
// showSuccess=false drops the trailer so the LAST captured line is the
// compact JSON record Bench emits.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// both keys are read by the command engine, not by other settings — the
// unused-key lint can't see that
Global / excludeLintKeys ++= Set(showSuccess, run / outputStrategy)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // forked-JVM heap: the DECLARED bench regime (SPARK_GRAFT_BENCH_HEAP_MB,
  // the pin Bench records heap_pinned against) takes precedence when set;
  // SPARK_DRIVER_MEM stays the scale-session override; default 8g — the
  // regime every round's artifact is compared at. Bench additionally
  // re-execs itself onto the pin if the launcher sized the JVM some other
  // way (three rounds of driver artifacts ran off-pin at ~91 GiB).
  s"-Xmx${sys.env.get("SPARK_GRAFT_BENCH_HEAP_MB").map(_ + "m")
    .orElse(sys.env.get("SPARK_DRIVER_MEM")).getOrElse("8g")}",
)
scalacOptions += "-deprecation"
