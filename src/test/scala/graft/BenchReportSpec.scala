package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact contract: the driver tail-captures stdout, so every
  * emitted line must be self-contained JSON, the part lines must stay under
  * 1 KB, the compact total line must recover both totals and every
  * per-query cold number, and the memo rollup must be the VERY LAST line
  * (r10 lost all detailed memo lines to the bounded tail capture). Parsed
  * with Jackson (on the Spark classpath) — the same class of strict parser
  * the driver uses. */
class BenchReportSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  // realistic worst case: the full suite with long query names
  private val names = (1 to 59).map(i => f"q$i%02d_some_longer_query_name_$i")
  private val warm = names.map(n => n -> 1.234)
  private val cold = names.map(n => n -> 12.345)
  private val quietLoad = Bench.LoadReport(32,
    Bench.LapLoad(30.1, 31.9, 33.0, 24.5), Bench.LapLoad(31.0, 29.8, 31.5, 22.0))
  private val sf = "/root/testdata/sf0.1"
  private val warmMemo = StageMemo.Stats(120, 14, 0, Map(
    s"ngraminter:$sf:100" -> (1L, 11200L), s"shingles:$sf" -> (1L, 2400L)))
  private val coldPerQuery = names.map { n =>
    if (n.startsWith("q21")) n -> StageMemo.Stats(0, 2, 0,
      Map(s"ngraminter:$sf:100" -> (1L, 11200L), s"shingles:$sf" -> (1L, 2400L)))
    else n -> StageMemo.Stats(1, 0, 0, Map.empty)
  }
  private val lines =
    Bench.reportLines(sf, warm, cold, quietLoad, warmMemo, coldPerQuery)

  test("every emitted line is self-contained parseable JSON") {
    lines.foreach { l =>
      val node = mapper.readTree(l)
      assert(node.has("metric"), l.take(80))
    }
  }

  test("every line after the first stays under 1 KB") {
    lines.tail.foreach(l =>
      assert(l.length < 1024, s"${l.length} bytes: ${l.take(60)}..."))
  }

  /** The compact total line (second to last — the memo rollup rides after
    * it, and both repeat the headline totals). */
  private def totalLine(ls: Seq[String]) =
    ls.map(mapper.readTree).filter(_.get("metric").asText == "total").last

  test("the memo rollup rides second to last, inside the tail budget") {
    // r10's lesson: the driver keeps a bounded TAIL of stdout, and every
    // memo line emitted before the totals was sheared out of the artifact.
    // The rollup must ride at the very end (followed only by the compact
    // perq_tail line), under the 1 KB budget, carrying counters, top build
    // keys, and both headline totals.
    val last = mapper.readTree(lines(lines.size - 2))
    assert(last.get("metric").asText === "memo_rollup")
    assert(last.toString.length < 1024)
    // ADVICE r11: the counters' window is warm + COLD LAP 1 only (min-of-2
    // totals can come from either lap) — the line must say so itself
    assert(last.get("attribution").asText === "warm+cold_lap1")
    assert(math.abs(last.get("value").asDouble - 59 * 1.234) < 0.05)
    assert(math.abs(last.get("cold_total").asDouble - 59 * 12.345) < 0.05)
    // warm (120 hits) + per-query cold windows (58 hit rows)
    assert(last.get("hits").asLong === 178)
    assert(last.get("misses").asLong === 16)
    assert(last.get("build_ms_total").asLong === 27200)
    val top = last.get("top_builds")
    assert(top.has("ngraminter:sf:100") && top.has("shingles:sf"))
    // warm build + q21's cold build aggregate per key, sorted by ms
    assert(top.get("ngraminter:sf:100").get("ms").asLong === 22400)
    assert(top.get("ngraminter:sf:100").get("n").asLong === 2)
    assert(top.fieldNames().next() === "ngraminter:sf:100")
  }

  test("perq_tail is the very last line: warm AND cold per query survive " +
      "a 2000-char tail capture next to the memo rollup") {
    // r11's gap: the driver artifact keeps only ~2000 chars of stdout, so
    // the 1.5 KB warm dict line never survived next to the 1.5 KB cold
    // dict line — judges had to reach into target/bench.json for warm
    // per-query numbers. The fix: ONE compact centisecond-array line as
    // the absolute last line, both laps, index order = lexicographic query
    // names (the same names CORRECTNESS_r{N}.json keys carry).
    val last = mapper.readTree(lines.last)
    assert(last.get("metric").asText === "perq_tail")
    assert(last.get("order").asText === "query_names_lex_asc")
    assert(last.get("n").asInt === names.size)
    // the absolute last line alone still recovers both headline totals
    // (the property the memo rollup carried when IT was last)
    assert(math.abs(last.get("value").asDouble - 59 * 1.234) < 0.05)
    assert(math.abs(last.get("cold_total").asDouble - 59 * 12.345) < 0.05)
    val warmArr = last.get("warm_cs")
    val coldArr = last.get("cold_cs")
    assert(warmArr.size === names.size && coldArr.size === names.size)
    assert(warmArr.get(0).asInt === 123) // 1.234 s → 123 cs
    assert(coldArr.get(0).asInt === 1235) // 12.345 s → 1235 cs (rounded)
    // the LAST TWO lines (perq_tail + memo_rollup) must fit a 2000-char
    // tail together at full-suite size (117 queries is the real suite;
    // this fixture's 59 names bound the per-entry cost identically)
    val tail = lines.takeRight(2).map(_.length + 1).sum
    assert(tail < 1900, s"last two lines are $tail chars — the driver's " +
      "~2000-char tail capture would shear the rollup")
    // a failed query's -1 marker survives the centisecond encoding
    val failed = Bench.perQueryTailLine(sf, Seq("q01_x" -> -1.0),
      Seq("q01_x" -> 0.574))
    val f = mapper.readTree(failed)
    assert(f.get("warm_cs").get(0).asInt === -1)
    assert(f.get("cold_cs").get(0).asInt === 57)
  }

  test("perq_tail stays inside the tail budget at full-suite width") {
    // 130 queries (headroom over today's 119+new), worst-case magnitudes:
    // warm ~9.99 s (3 digits), cold ~99.99 s (4 digits)
    val wide = (1 to 130).map(i => f"q$i%03d_name" -> 9.99)
    val wideCold = (1 to 130).map(i => f"q$i%03d_name" -> 99.99)
    val line = Bench.perQueryTailLine(sf, wide, wideCold)
    assert(line.length < 1450, s"${line.length} chars")
    assert(mapper.readTree(line).get("cold_cs").size === 130)
  }

  test("the last TWO lines fit the tail together at full-suite width") {
    // The 59-name fixture above under-tests the combined budget: at 130
    // queries perq_tail alone may legitimately reach ~1.4 KB, and the
    // rollup ~1 KB, so the PAIR must be bounded at full width too. Shear
    // order is designed: perq_tail is LAST and repeats both totals, so a
    // pathological capture loses the rollup (attribution) before it loses
    // per-query data — this test pins the realistic-shape pair under the
    // budget: 130 queries, a 10-query 100 s+ cold tail (today's worst
    // real cold is ~11 s), the rest 3-digit centiseconds, and a rollup
    // carrying 8 real-length build keys.
    val warm = (1 to 130).map(i => f"q$i%03d_name" -> 5.43)
    val cold = (1 to 130).map(i =>
      f"q$i%03d_name" -> (if (i <= 10) 123.45 else 9.87))
    val tailLine = Bench.perQueryTailLine(sf, warm, cold)
    val rollup = Bench.memoRollupLine(sf, 130 * 5.43, 130 * 9.87,
      StageMemo.Stats(116, 99, 0,
        (1 to 8).map(i => s"ngraminter:$sf:10$i" -> (16L, 30606L)).toMap),
      Nil)
    val combined = tailLine.length + rollup.length + 2
    assert(combined < 1900, s"perq_tail (${tailLine.length}) + rollup " +
      s"(${rollup.length}) = $combined chars — the driver's ~2000-char " +
      "tail capture would shear into the per-query arrays")
  }

  test("the rollup caps at the top 8 build keys and stays parseable") {
    val wide = StageMemo.Stats(0, 30, 0,
      (1 to 30).map(i => s"stage_with_a_longer_name_$i:$sf:0.8" ->
        (3L, 1000L * i)).toMap)
    val line = Bench.memoRollupLine(sf, 1.0, 2.0, wide, Nil)
    assert(line.length < 1024, s"${line.length} bytes")
    val p = mapper.readTree(line)
    assert(p.get("top_builds").size === 8)
    // the 8 largest by ms survive
    assert(p.get("top_builds").has(s"stage_with_a_longer_name_30:sf:0.8"))
    assert(!p.get("top_builds").has(s"stage_with_a_longer_name_1:sf:0.8"))
    assert(p.get("build_ms_total").asLong === (1 to 30).map(1000L * _).sum)
  }

  test("the final total line recovers totals and all cold entries") {
    val last = totalLine(lines)
    assert(last.get("cold_protocol").asText === "min2")
    assert(math.abs(last.get("value").asDouble - 59 * 1.234) < 0.05)
    assert(math.abs(last.get("cold_total").asDouble - 59 * 12.345) < 0.05)
    val qs = last.get("queries")
    assert(qs.size === 59)
    names.foreach { n =>
      val shortKey = n.takeWhile(_ != '_')
      assert(qs.has(shortKey), shortKey)
      assert(math.abs(qs.get(shortKey).asDouble - 12.345) < 0.01)
    }
  }

  test("part lines reassemble the full-name per-query maps") {
    val warmParts = lines.map(mapper.readTree)
      .filter(_.get("metric").asText == "warm_part")
    val recovered = warmParts.flatMap { p =>
      val it = p.get("queries").properties().iterator()
      var acc = List.empty[(String, Double)]
      while (it.hasNext) { val e = it.next(); acc ::= e.getKey -> e.getValue.asDouble }
      acc
    }.toMap
    assert(recovered.keySet === names.toSet)
  }

  test("failed queries keep their -1 marker through formatting") {
    val ls = Bench.reportLines("/sf", Seq("q01_x" -> -1.0), Seq("q01_x" -> -1.0),
      quietLoad)
    assert(totalLine(ls).get("queries").get("q01").asDouble === -1.0)
  }

  test("part lines and totals carry the load-sentinel fields") {
    val parsed = lines.tail.map(mapper.readTree)
    parsed.filter(p => Set("warm_part", "cold_part", "total_warm", "total")
        .contains(p.get("metric").asText)).foreach { p =>
      Seq("load_before", "load_after", "load_max", "cpu_utilization").foreach(f =>
        assert(p.has(f), s"$f missing: ${p.toString.take(80)}"))
    }
    val last = totalLine(lines)
    assert(last.get("cores").asInt === 32)
    assert(last.get("contended").asBoolean === false)
    assert(math.abs(last.get("load_before").asDouble - 31.0) < 0.01)
    assert(math.abs(last.get("cpu_utilization").asDouble - 22.0) < 0.01)
  }

  test("memo lap lines attribute shared-stage builds with shortened keys") {
    val parsed = lines.map(mapper.readTree)
    val memoWarm = parsed.find(p => p.get("metric").asText == "memo" &&
      p.get("lap").asText == "warm").get
    assert(memoWarm.get("hits").asLong === 120)
    assert(memoWarm.get("misses").asLong === 14)
    assert(memoWarm.get("evictions").asLong === 0)
    assert(memoWarm.get("build_ms_total").asLong === 13600)
    // the corpus dir collapses to "sf" so keys stay short and stable
    val b = memoWarm.get("builds")
    assert(b.has("ngraminter:sf:100") && b.has("shingles:sf"))
    assert(b.get("ngraminter:sf:100").get("ms").asLong === 11200)
    assert(b.get("ngraminter:sf:100").get("n").asLong === 1)
    // the cold lap aggregates the per-query windows
    val memoCold = parsed.find(p => p.get("metric").asText == "memo" &&
      p.get("lap").asText == "cold").get
    assert(memoCold.get("misses").asLong === 2)
    assert(memoCold.get("hits").asLong === 58)
    assert(memoCold.get("build_ms_total").asLong === 13600)
  }

  test("per-query cold memo lines name the query that paid each build") {
    val perQ = lines.map(mapper.readTree)
      .filter(_.get("metric").asText == "memo_cold_query")
    // only queries that actually built a stage get a line
    assert(perQ.size === 1)
    assert(perQ.head.get("q").asText === "q21_some_longer_query_name_21")
    assert(perQ.head.get("build_ms_total").asLong === 13600)
    assert(perQ.head.get("builds").has("ngraminter:sf:100"))
  }

  test("a wide build map packs into <1KB self-contained parts") {
    val wide = StageMemo.Stats(0, 30, 0,
      (1 to 30).map(i => s"stage_with_a_longer_name_$i:$sf:0.8" ->
        (3L, 123456L)).toMap)
    val ls = Bench.memoLines("memo", ""","lap":"warm"""", wide, sf)
    assert(ls.size > 1, "30 keys must split into parts")
    ls.foreach { l =>
      assert(l.length < 1024, s"${l.length} bytes")
      val p = mapper.readTree(l)
      // every part is self-contained: counters repeat on each
      assert(p.get("misses").asLong === 30 && p.has("builds"))
      assert(p.get("of").asInt === ls.size)
    }
    val allKeys = ls.map(mapper.readTree).flatMap { p =>
      val it = p.get("builds").fieldNames(); var acc = List.empty[String]
      while (it.hasNext) acc ::= it.next()
      acc
    }
    assert(allKeys.size === 30 && allKeys.distinct.size === 30)
  }

  test("the memory-regime fields ride every tail-surviving line") {
    // r14's +12.9% warm drift could not be attributed to code vs box
    // because the artifact carried no heap field — the regime must be on
    // the compact total lines AND the rollup (any bounded tail capture
    // retains at least the rollup + perq_tail pair)
    val parsed = lines.map(mapper.readTree)
    parsed.filter(p => Set("total_warm", "memo_rollup")
        .contains(p.get("metric").asText)).foreach { p =>
      assert(p.has("heap_mb"), p.toString.take(80))
      assert(p.has("heap_pinned"), p.toString.take(80))
      // the test JVM really runs at build.sbt's SPARK_DRIVER_MEM fork
      // size; maxMemory is within the same ±15% band the pin check uses
      assert(p.get("heap_mb").asLong > 0)
    }
    assert(totalLine(lines).has("heap_mb"))
    // the rollup still fits the tail budget with the new fields
    val rollup = parsed.find(_.get("metric").asText == "memo_rollup").get
    assert(rollup.toString.length < 1024)
  }

  test("a lap whose 1-min load exceeds 1.5x cores flags contended") {
    // r8's signature: load far above the configured cores while warm reads
    // inflate uniformly — the artifact must say so by itself
    val busy = quietLoad.copy(warm = Bench.LapLoad(49.0, 52.3, 52.3, 11.2))
    assert(busy.contended)
    val ls = Bench.reportLines("/sf", warm, cold, busy)
    assert(totalLine(ls).get("contended").asBoolean === true)
    // a burst CONTAINED inside the lap — quiet endpoints, hot mid-lap
    // sample — still flags: the r8 miss the periodic sampler closes
    val burst = quietLoad.copy(cold = Bench.LapLoad(20.0, 21.0, 55.0, 22.0))
    assert(burst.contended)
    // unavailable metrics (-1) never trip the flag
    val unknown = Bench.LoadReport(32,
      Bench.LapLoad(-1.0, -1.0, -1.0, -1.0), Bench.LapLoad(-1.0, -1.0, -1.0, -1.0))
    assert(!unknown.contended)
  }
}
