package graft

import graft.functions.Aggregators

class AggregatorsSpec extends SparkSpec {

  test("ValueHistogram matches DataFrame aggregates") {
    import spark.implicits._
    val byType = Tables.events(spark, sfDir)
      .select($"event_type", $"value").as[(String, Double)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new Aggregators.ValueHistogram().toColumn)
      .collect().toMap
    val expected = Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(
        org.apache.spark.sql.functions.count("*").as("n"),
        org.apache.spark.sql.functions.min($"value"),
        org.apache.spark.sql.functions.max($"value"),
        org.apache.spark.sql.functions.avg($"value"))
      .collect()
    expected.foreach { r =>
      val h = byType(r.getString(0))
      assert(h.count === r.getLong(1))
      assert(h.min === r.getDouble(2))
      assert(h.max === r.getDouble(3))
      assert(math.abs(h.avg - r.getDouble(4)) < 1e-9)
      assert(h.median >= h.min && h.median <= h.max)
      assert(h.stddev >= 0)
    }
  }

  test("UniqValueCount degrades to capped counting") {
    import spark.implicits._
    val vals = spark.createDataset(
      Seq("a", "b", "c", "d", "e", "a", "b"))
    val r = vals.groupByKey(_ => 1).agg(
      new Aggregators.UniqValueCount(3).toColumn).collect().head._2
    assert(r.capped)
    assert(r.count === 3)

    val r2 = vals.groupByKey(_ => 1).agg(
      new Aggregators.UniqValueCount(100).toColumn).collect().head._2
    assert(!r2.capped)
    assert(r2.count === 5)
  }
}
