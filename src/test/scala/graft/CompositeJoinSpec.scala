package graft

import org.apache.spark.sql.functions._

import graft.operators.CompositeJoin
import graft.operators.CompositeJoin._

/** Composite join expression language (reference mapred/join/package.html:
  * 33-66): per-key cross products, positional nulls, rightmost-override,
  * nesting, and the expression parser. */
class CompositeJoinSpec extends SparkSpec {

  private def src(rows: Seq[(Int, String)]) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  test("parser builds the nested tree and rejects junk") {
    assert(parse("inner(a, outer(b, c))") ===
      Inner(Seq(Source("a"), Outer(Seq(Source("b"), Source("c"))))))
    assert(parse("override(a,b,c)") ===
      Override(Seq(Source("a"), Source("b"), Source("c"))))
    intercept[IllegalArgumentException](parse("sideways(a,b)"))
    intercept[IllegalArgumentException](parse("inner(a)"))
    intercept[IllegalArgumentException](parse("inner(a,b)garbage"))
  }

  test("inner join emits the per-key cross product of all child values") {
    val a = src(Seq(1 -> "a1", 1 -> "a2", 2 -> "a3"))
    val b = src(Seq(1 -> "b1", 1 -> "b2", 3 -> "b3"))
    val out = CompositeJoin.run("inner(a, b)", Map("a" -> a, "b" -> b), "k")
      .select(col("k"), col("v.t0"), col("v.t1"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    // key 1: 2x2 cross product; keys 2 and 3 are not in both sources
    assert(out === Set(
      (1, "a1", "b1"), (1, "a1", "b2"), (1, "a2", "b1"), (1, "a2", "b2")))
  }

  test("outer join fills absent children with positional nulls") {
    val a = src(Seq(1 -> "a1", 2 -> "a2"))
    val b = src(Seq(1 -> "b1", 3 -> "b3"))
    val out = CompositeJoin.run("outer(a, b)", Map("a" -> a, "b" -> b), "k")
      .select(col("k"), col("v.t0"), col("v.t1"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(out === Set(
      (1, "a1", "b1"), (2, "a2", null), (3, null, "b3")))
  }

  test("override emits all values of the rightmost source with the key") {
    val a = src(Seq(1 -> "a1", 2 -> "a2", 2 -> "a2x"))
    val b = src(Seq(2 -> "b2", 2 -> "b2x", 3 -> "b3"))
    val out = CompositeJoin.run("override(a, b)", Map("a" -> a, "b" -> b), "k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    // key 2 present in b -> BOTH b values, a's dropped (multi-filter, not
    // a tuple join); keys 1/3 from their only source
    assert(out === Set((1, "a1"), (2, "b2"), (2, "b2x"), (3, "b3")))
  }

  test("nesting composes: inner(outer(a, b), c)") {
    val a = src(Seq(1 -> "a1"))
    val b = src(Seq(2 -> "b2"))
    val c = src(Seq(1 -> "c1", 2 -> "c2", 3 -> "c3"))
    val out = CompositeJoin
      .run("inner(outer(a, b), c)", Map("a" -> a, "b" -> b, "c" -> c), "k")
      .select(col("k"), col("v.t0.t0"), col("v.t0.t1"), col("v.t1"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    // key 3 exists only in c -> dropped by inner (outer(a,b) has no key 3)
    assert(out === Set((1, "a1", null, "c1"), (2, null, "b2", "c2")))
  }

  test("multi-column sources tuple their value columns as a struct") {
    import spark.implicits._
    val a = Seq((1, "x", 10L)).toDF("k", "name", "n")
    val b = src(Seq(1 -> "b1"))
    val out = CompositeJoin.run("inner(a, b)", Map("a" -> a, "b" -> b), "k")
      .select(col("v.t0.name"), col("v.t0.n"), col("v.t1"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq === Seq(("x", 10L, "b1")))
  }

  test("fixture composite query joins open/done orders with customer names") {
    val out = CompositeJoin.ordersComposite(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // spot-invariant: every row's customer exists and cross products are
    // complete — row count equals sum over customers of
    // max(open,1)*max(done,1) restricted to customers with any order
    import spark.implicits._
    val orders = Tables.orders(spark, sfDir)
    val counts = orders.groupBy($"o_custkey")
      .agg(
        sum(when($"o_orderstatus" === "O", 1).otherwise(0)).as("o"),
        sum(when($"o_orderstatus" === "F", 1).otherwise(0)).as("f"))
      .filter($"o" > 0 || $"f" > 0)
      .collect().map(r => math.max(r.getLong(1), 1L) * math.max(r.getLong(2), 1L))
      .sum
    assert(rows.length.toLong === counts)
  }
}
