package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Composite join expression language — the reference's map-side join
  * algebra (`mapred/join/CompositeInputFormat.java:48`, `Parser.java:64`,
  * `package.html:33-66`) re-expressed as a relational combinator tree.
  *
  * Grammar (mirroring `mapred.join.expr`):
  * {{{
  *   expr ::= inner(expr[, expr]*)     // keys present in ALL children
  *          | outer(expr[, expr]*)     // keys present in ANY child
  *          | override(expr[, expr]*)  // values from the RIGHTMOST child
  *          |                          //   that has the key
  *          | <ident>                  // a registered keyed source
  * }}}
  * The reference's `tbl(Class, "path")` leaf maps to a registered source
  * name: callers register `name -> DataFrame` and reference names in the
  * expression.
  *
  * Semantics, per the reference: for a given key each JOIN node emits the
  * CROSS PRODUCT of all values for all child sources at that node
  * (`TupleWritable.java:43` tuples — here a struct with one field per
  * child); `outer` fills absent children with a positional null;
  * `override` is a multi-filter — it emits the VALUES (not tuples) of the
  * rightmost child holding the key (`OverrideRecordReader.java:36`).
  *
  * Scale shape: the reference requires co-partitioned pre-sorted inputs so
  * the join can run map-side. Here each node is a declarative relational
  * join/union on the key, so Catalyst picks the physical strategy —
  * sort-merge with exchange reuse for co-partitioned children, broadcast
  * for small ones, AQE-managed otherwise. Per-key cross products are
  * produced by the join itself (never buffered driver-side), and
  * `override` is one union + one per-key window max — a single shuffle. */
object CompositeJoin {

  sealed trait Expr
  final case class Source(name: String) extends Expr
  final case class Inner(children: Seq[Expr]) extends Expr
  final case class Outer(children: Seq[Expr]) extends Expr
  final case class Override(children: Seq[Expr]) extends Expr

  /** Recursive-descent parser for the expression grammar. */
  def parse(s: String): Expr = {
    val it = s.replaceAll("\\s+", "")
    val (e, rest) = parseExpr(it)
    require(rest.isEmpty, s"trailing input after expression: '$rest'")
    e
  }

  private def parseExpr(s: String): (Expr, String) = {
    val ident = s.takeWhile(c => c.isLetterOrDigit || c == '_')
    require(ident.nonEmpty, s"expected identifier at '$s'")
    val rest = s.drop(ident.length)
    if (rest.startsWith("(")) {
      require(Set("inner", "outer", "override")(ident),
        s"unknown operation '$ident' (expected inner/outer/override)")
      var rem = rest.drop(1)
      val children = Seq.newBuilder[Expr]
      var done = false
      while (!done) {
        val (c, r) = parseExpr(rem)
        children += c
        r.headOption match {
          case Some(',') => rem = r.drop(1)
          case Some(')') => rem = r.drop(1); done = true
          case _ => throw new IllegalArgumentException(
            s"expected ',' or ')' at '$r'")
        }
      }
      val cs = children.result()
      require(cs.size >= 2, s"$ident needs at least 2 children")
      (ident match {
        case "inner" => Inner(cs)
        case "outer" => Outer(cs)
        case "override" => Override(cs)
      }, rem)
    } else (Source(ident), rest)
  }

  /** Evaluate `expr` over registered keyed sources. Each source must carry
    * `keyCol`; its per-row value is the remaining column if there is
    * exactly one, else a struct of the remaining columns. The result is
    * `(keyCol, value)` where join-node values are structs with fields
    * `t0..tn` (one per child, positionally — the TupleWritable shape). */
  def run(expr: Expr, sources: Map[String, DataFrame],
      keyCol: String): DataFrame = eval(expr, sources, keyCol)

  /** Parse-and-run convenience. */
  def run(expr: String, sources: Map[String, DataFrame],
      keyCol: String): DataFrame = run(parse(expr), sources, keyCol)

  private def eval(e: Expr, src: Map[String, DataFrame],
      keyCol: String): DataFrame = e match {
    case Source(name) =>
      val df = src.getOrElse(name,
        throw new IllegalArgumentException(s"unregistered source '$name'"))
      val vals = df.columns.toSeq.filterNot(_ == keyCol)
      require(vals.nonEmpty, s"source '$name' has no value columns")
      val v = if (vals.length == 1) col(vals.head)
        else struct(vals.map(col): _*)
      df.select(col(keyCol).as("k"), v.as("v"))
    case Inner(cs) => joinChildren(cs, src, keyCol, innerJoin = true)
    case Outer(cs) => joinChildren(cs, src, keyCol, innerJoin = false)
    case Override(cs) =>
      // multi-filter: rightmost child holding the key wins; one union +
      // one per-key window max — a single shuffle on the key
      val tagged = cs.zipWithIndex.map { case (c, i) =>
        eval(c, src, keyCol).withColumn("_prio", lit(i))
      }
      val u = tagged.reduce(_ unionByName _)
      val w = Window.partitionBy(col("k"))
      u.withColumn("_max", max(col("_prio")).over(w))
        .filter(col("_prio") === col("_max"))
        .select(col("k"), col("v"))
  }

  /** Fixture query (q39): `inner(outer(open, done), cust)` — open and done
    * orders per customer (both multi-valued ⇒ real per-key cross product),
    * outer-joined with positional nulls, inner-joined with the customer
    * name. The nested tuple is flattened to named leaf columns. */
  def ordersComposite(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
    val sources = Map(
      "open" -> orders.filter($"o_orderstatus" === "O")
        .select($"o_custkey".as("k"), $"o_orderkey".as("o_open")),
      "done" -> orders.filter($"o_orderstatus" === "F")
        .select($"o_custkey".as("k"), $"o_orderkey".as("o_done")),
      "cust" -> Tables.customer(spark, dir)
        .select($"c_custkey".as("k"), $"c_name"))
    run("inner(outer(open, done), cust)", sources, "k")
      .select($"k".as("custkey"),
        $"v.t0.t0".as("o_open"), $"v.t0.t1".as("o_done"),
        $"v.t1".as("c_name"))
      .orderBy($"custkey", $"o_open", $"o_done")
  }

  private def joinChildren(cs: Seq[Expr], src: Map[String, DataFrame],
      keyCol: String, innerJoin: Boolean): DataFrame = {
    val kids = cs.zipWithIndex.map { case (c, i) =>
      eval(c, src, keyCol).select(col("k").as(s"k$i"), col("v").as(s"v$i"))
    }
    val joined = kids.zipWithIndex.reduceLeft[(DataFrame, Int)] {
      case ((acc, _), (next, i)) =>
        // running key: first non-null key seen so far (outer may have nulls)
        val accKey = coalesce((0 until i).map(j => col(s"k$j")): _*)
        (acc.join(next, accKey === col(s"k$i"),
          if (innerJoin) "inner" else "full_outer"), i)
    }._1
    val n = cs.size
    joined.select(
      coalesce((0 until n).map(i => col(s"k$i")): _*).as("k"),
      struct((0 until n).map(i => col(s"v$i").as(s"t$i")): _*).as("v"))
  }
}
