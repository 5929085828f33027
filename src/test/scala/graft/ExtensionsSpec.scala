package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

class ExtensionsSpec extends SparkSpec {

  test("native functions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(dot === 11.0)
    val fp = spark.sql(
      "SELECT graft_simhash(array('spark', 'engine')) AS fp").head().getLong(0)
    assert(fp > 0)
    // identical to the expression used by the Dataset API path
    Tables.registerAll(spark, sfDir)
    val viaSql = spark.sql(
      """SELECT doc_id, graft_simhash(filter(split(text, '\\s+'),
        |  t -> t <> '')) AS simhash
        |FROM documents ORDER BY doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaApi = graft.operators.Dedup.simhash(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSql.toSeq === viaApi.toSeq)
  }

  test("salted two-stage aggregation matches direct groupBy") {
    val direct = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val salted = Relational.saltedCountSum(
      Tables.lineitem(spark, sfDir), "l_returnflag", "l_quantity")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(salted.keySet === direct.keySet)
    salted.foreach { case (k, (n, s)) =>
      assert(n === direct(k)._1)
      assert(math.abs(s - direct(k)._2) < 1e-6)
    }
  }
}
