package graft

import org.scalatest.funsuite.AnyFunSuite

/** The fixture-staging ring fence (VERDICT r18 #3): artifacts cached
  * ACROSS runs/JVMs under `target/streamstage` / `target/dedupindex` must
  * be pure functions of the fixture modelling scenario INPUT state (replay
  * chunks, shipped indexes), and every such family must be registered in
  * [[graft.streaming.Continuous.stagedFamilies]]. This spec scans the main
  * sources for the staging entry points' labels and fails on any label
  * that is not registered — so moving formerly-timed compute into staging
  * cannot happen quietly: it forces a registry edit, which forces the
  * review this boundary exists for. */
class StagingRegistrySpec extends AnyFunSuite {

  private def mainSources: Seq[String] = {
    val src = java.nio.file.Paths.get("src/main/scala/graft")
    assume(java.nio.file.Files.isDirectory(src), s"run from the repo root: $src")
    import scala.jdk.CollectionConverters._
    val stream = java.nio.file.Files.walk(src)
    try stream.iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .map(p => new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8))
      .toSeq
    finally stream.close()
  }

  test("every staged-fixture label in the sources is registered") {
    // the three staging entry points and where their family label sits:
    //   stageChunks(spark, dir, "<table>")            — replay table copies
    //   stagedFixtureDir(spark, dir, "<label>")       — arbitrary artifacts
    //   stageOrderedChunksCached(spark, dir, "<label>"— ordered replay chunks
    //   ensureFixtureIndex(spark, dir, <df>, "<tag>"  — shipped q94 indexes
    val patterns = Seq(
      """stageChunks\(spark, [A-Za-z]+, "([A-Za-z0-9_]+)"""".r,
      """stagedFixtureDir\(spark, [A-Za-z]+, "([A-Za-z0-9_]+)"""".r,
      """stageOrderedChunksCached\(spark, [A-Za-z]+, "([A-Za-z0-9_]+)"""".r,
      """ensureFixtureIndex\(spark, [A-Za-z]+, [^,]+, "([A-Za-z0-9_]+)"""".r)
    val found = (for {
      src <- mainSources
      re <- patterns
      m <- re.findAllMatchIn(src)
    } yield m.group(1)).toSet
    // self-check: the scan must keep seeing the known call sites — a
    // refactor that changes the call shape must update the regexes here,
    // not silently stop scanning
    assert(found.size >= 5, s"staging-label scan looks broken, found: $found")
    val unregistered = found -- graft.streaming.Continuous.stagedFamilies
    assert(unregistered.isEmpty,
      s"unregistered fixture-staging families: $unregistered — staging is " +
        "only for pure functions of the fixture that model scenario INPUT " +
        "state (replay chunks, shipped indexes), never timed operator " +
        "work; if this new family qualifies, register it in " +
        "Continuous.stagedFamilies with a justifying comment")
  }

  test("the registry carries no dead families") {
    val patterns = Seq(
      """stageChunks\(spark, [A-Za-z]+, "([A-Za-z0-9_]+)"""".r,
      """stagedFixtureDir\(spark, [A-Za-z]+, "([A-Za-z0-9_]+)"""".r,
      """stageOrderedChunksCached\(spark, [A-Za-z]+, "([A-Za-z0-9_]+)"""".r,
      """ensureFixtureIndex\(spark, [A-Za-z]+, [^,]+, "([A-Za-z0-9_]+)"""".r)
    val found = (for {
      src <- mainSources
      re <- patterns
      m <- re.findAllMatchIn(src)
    } yield m.group(1)).toSet
    val dead = graft.streaming.Continuous.stagedFamilies -- found
    assert(dead.isEmpty,
      s"registered staging families with no call site: $dead — drop them " +
        "so the registry stays the exact allowed list")
  }
}
