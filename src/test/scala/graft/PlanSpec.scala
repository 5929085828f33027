package graft

import graft.operators.{CompositeJoin, Dedup, Relational, Similarity}

/** Physical-plan regression tests: the properties that decide whether a
  * plan survives a 100× scale-up. A green correctness run with a wrong
  * plan (unpruned scan, shuffled dim join, sort-before-count elision) is
  * exactly the failure mode these pin down. */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q01 scan prunes columns and pushes the date filter") {
    val p = plan(Relational.pricingSummary(spark, sfDir))
    val scan = p.linesIterator.find(_.contains("FileScan parquet")).get
    assert(scan.contains("l_shipdate"), "filter column read")
    assert(!scan.contains("l_orderkey"),
      s"unused column not pruned from scan: $scan")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      scan.contains("PushedFilters"), "pushdown expected")
  }

  test("q02 pushes both predicates to the scan") {
    val p = plan(Relational.selectFilter(spark, sfDir))
    assert(p.contains("PushedFilters") &&
      p.contains("o_totalprice") && p.contains("o_orderstatus"))
  }

  test("q03 joins dimensions by broadcast, never shuffle") {
    val p = plan(Relational.revenueByNation(spark, sfDir))
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) === 3)
    assert(!p.contains("SortMergeJoin"),
      "dim joins must not sort-merge at any scale")
  }

  test("q05 global sort range-partitions (TotalOrderPartitioner shape)") {
    val p = plan(Relational.globalSort(spark, sfDir))
    assert(p.contains("rangepartitioning"),
      s"expected sampled range partitioning:\n$p")
  }

  test("aggregations plan partial + final (combiner semantics)") {
    val p = plan(Relational.wordCount(spark, sfDir))
    assert(p.contains("HashAggregate(keys="))
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "expected map-side partial aggregate before the shuffle")
  }

  test("similarity join keeps the native dot product in the plan") {
    val p = plan(Similarity.cosineNearDup(spark, sfDir))
    assert(p.contains("graft_dot"))
    assert(p.contains("BroadcastNestedLoopJoin"),
      "small corpus side should broadcast for the quadratic baseline")
  }

  test("q38 IVF broadcasts the pivot table on both assignment and probe") {
    val p = plan(Similarity.ivfTopK(spark, sfDir))
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) >= 2,
      "pivot cross joins must broadcast the small pivot side")
    // nearest-cell assignment is an aggregate (map-side partial), not a
    // window over the pivot-wide frame
    assert(p.contains("max_by"), s"expected max_by assignment:\n$p")
  }

  test("q39 composite join plans broadcast for the small keyed sources") {
    val p = plan(CompositeJoin.ordersComposite(spark, sfDir))
    assert(!p.contains("CartesianProduct"),
      "composite join must never plan a cartesian product")
    assert(p.contains("FullOuter") || p.contains("full_outer") ||
      p.contains("FullOuterJoin") || p.contains("SortMergeJoin FullOuter"),
      s"outer node must plan a real full outer join:\n$p")
  }

  test("q54 cq monitor plans no cartesian product and bounded collect_list") {
    val p = plan(graft.streaming.Continuous.cqMonitor(spark, sfDir))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"cq monitor must join per-key and global frames on w_start:\n$p")
    // collect_list only appears AFTER the per-(window, key) aggregate, so
    // its buffer is bounded by event-type cardinality, not stream volume
    assert(p.contains("collect_list") || p.contains("sort_array"))
  }

  test("ngram pair stage gates the index with a semi-join before aggregating") {
    val p = Dedup.ngramJaccardOf(
      Tables.documents(spark, sfDir)).queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), "df gate must survive into the physical plan")
    val semiIdx = p.indexOf("LeftSemi")
    val collectIdx = p.indexOf("collect_list")
    assert(collectIdx >= 0 && semiIdx > collectIdx,
      "collect_list (printed above its semi-join input) must consume the gated index")
  }
}
