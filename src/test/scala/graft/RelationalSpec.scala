package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("entry flagship query returns rows") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length === 25) // 25 nations in the fixtures
    assert(rows.forall(_.getAs[Long]("n_orders") > 0))
  }

  test("global sort is totally ordered across partition boundaries") {
    // TeraValidate-style assertion (SURVEY §5: SortValidator/TeraValidate):
    // within-partition order AND cross-partition boundary order.
    val sorted = Relational.globalSort(spark, sfDir)
      .select(col("l_extendedprice"))
    val bounds = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      val a = it.map(_.getDouble(0)).toArray
      if (a.isEmpty) Iterator.empty
      else {
        assert(a.zip(a.tail).forall { case (x, y) => x >= y },
          s"partition $i not sorted")
        Iterator((i, a.head, a.last))
      }
    }.collect().sortBy(_._1)
    bounds.zip(bounds.tail).foreach { case ((_, _, last), (j, first, _)) =>
      assert(last >= first, s"boundary violation before partition $j")
    }
  }

  test("wordcount total equals independent token count") {
    val total = Relational.wordCount(spark, sfDir)
      .agg(sum("cnt")).head().getLong(0)
    val expected = Tables.documents(spark, sfDir)
      .select(col("text")).collect()
      .map(_.getString(0).split("\\s+").count(_.nonEmpty).toLong).sum
    assert(total === expected)
  }

  test("override join prefers the rightmost source") {
    Relational.overrideJoinNation(spark, sfDir).collect().foreach { r =>
      val pop = r.getAs[Long]("pop")
      if (!r.isNullAt(r.fieldIndex("n_supp")))
        assert(pop === r.getAs[Long]("n_supp"))
      else assert(pop === r.getAs[Long]("n_cust"))
    }
  }

  test("N-source override join prefers the rightmost source per key") {
    import spark.implicits._
    val a = Seq((1, "a1"), (2, "a2"), (3, "a3")).toDF("k", "v")
    val b = Seq((2, "b2"), (4, "b4")).toDF("k", "v")
    val c = Seq((3, "c3"), (4, "c4"), (5, "c5")).toDF("k", "v")
    val out = Relational.overrideJoin(
      Seq((a, "v"), (b, "v"), (c, "v")), "k")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out === Map(
      1 -> "a1",  // only in a
      2 -> "b2",  // b overrides a
      3 -> "c3",  // c overrides a
      4 -> "c4",  // c overrides b
      5 -> "c5")) // only in c
  }

  test("topk equals sort-then-take") {
    val topk = Relational.topCustomers(spark, sfDir, 10).collect()
    assert(topk.length === 10)
    val spends = topk.map(_.getAs[Double]("total_spent"))
    assert(spends.zip(spends.tail).forall { case (a, b) => a >= b })
  }

  test("topKDelta classifies entered, exited, moved and stable keys") {
    import spark.implicits._
    val prev = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "rank")
    val cur = Seq(("b", 1), ("a", 2), ("d", 3)).toDF("k", "rank")
    val got = Relational.topKDelta(prev, cur, "k", "rank").collect()
      .map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)), r.getString(3))).toMap
    assert(got("a") === (Some(1), Some(2), "moved"))
    assert(got("b") === (Some(2), Some(1), "moved"))
    assert(got("c") === (Some(3), None, "exited"))
    assert(got("d") === (None, Some(3), "entered"))
    // stable case
    val same = Relational.topKDelta(cur, cur, "k", "rank").collect()
    assert(same.forall(_.getString(3) === "stable"))
  }

  test("topKDelta diffs successive top-k snapshots of the fixture") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // snapshot 1: top-5 customers by spend over orders with key < median;
    // snapshot 2: over all orders — the entered/exited sets partition
    val orders = Tables.orders(spark, sfDir)
    def topk(df: org.apache.spark.sql.DataFrame) = df
      .groupBy($"o_custkey").agg(sum($"o_totalprice").as("s"))
      .withColumn("rank", row_number().over(
        Window.orderBy($"s".desc, $"o_custkey")))
      .filter($"rank" <= 5)
    val median = orders.stat.approxQuantile("o_orderkey", Array(0.5), 0.0)(0)
    val delta = Relational.topKDelta(
      topk(orders.filter($"o_orderkey" < median)), topk(orders),
      "o_custkey", "rank").collect()
    assert(delta.length >= 5)
    val statuses = delta.map(_.getString(3)).toSet
    assert(statuses.subsetOf(Set("entered", "exited", "moved", "stable")))
    // ranks on each side are a permutation of 1..5
    assert(delta.flatMap(r => Option(r.get(2))).map(_.asInstanceOf[Int])
      .sorted.toSeq === (1 to 5))
  }

  test("approximate distinct stays within the sketch error bound") {
    val exact = Relational.distinctByPriority(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Relational.approxDistinct(spark, sfDir).collect().foreach { r =>
      val e = exact(r.getString(0)).toDouble
      val a = r.getLong(1).toDouble
      assert(math.abs(a - e) / e < 0.1,
        s"approx $a vs exact $e for ${r.getString(0)}")
    }
  }

  test("broadcast joins are planned for dimension tables") {
    val plan = Relational.revenueByNation(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast join for nation/region dims:\n$plan")
  }

  test("sessionize splits sessions at exactly the gap, keeps them inside it") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // user 1: second event EXACTLY 5 minutes later -> ONE session
      // (session_window extends on a closed gap; the oracle's strict
      // `> gap` new-session predicate agrees)
      (1L, t("2024-01-01 00:00:00"), 1.0),
      (1L, t("2024-01-01 00:05:00"), 2.0),
      // user 2: one second PAST the gap -> TWO sessions
      (2L, t("2024-01-01 00:00:00"), 3.0),
      (2L, t("2024-01-01 00:05:01"), 4.0),
      // user 3: inside the gap -> ONE session
      (3L, t("2024-01-01 00:00:00"), 5.0),
      (3L, t("2024-01-01 00:04:59"), 6.0)
    ).toDF("user_id", "ts", "value")
    val got = Relational.sessionizeOf(events, "5 minutes").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2)))
    assert(got.toSeq === Seq(
      (1L, "2024-01-01 00:00:00.0", 2L),
      (2L, "2024-01-01 00:00:00.0", 1L),
      (2L, "2024-01-01 00:05:01.0", 1L),
      (3L, "2024-01-01 00:00:00.0", 2L)))
  }
}
