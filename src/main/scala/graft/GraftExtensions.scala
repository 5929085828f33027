package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graft.Bridge

import graft.functions.{DotProduct, Simhash}

/** Engine extension point: registers the native graft expressions as SQL
  * functions so the SQL tier can call them (`graft_dot(a, b)`,
  * `graft_simhash(tokens)`).
  *
  * Two registration paths:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    (the `SparkSessionExtensions` mechanism — cluster-wide, config-only);
  *  - [[GraftExtensions.register]] on an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      dotBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[Simhash].getName, "graft_simhash"),
      simhashBuilder))
    // strict partition pruning (off unless spark.graft.strictPruning=true)
    ext.injectCheckRule(graft.plans.StrictPruning.check)
  }
}

object GraftExtensions {
  private type Expr = org.apache.spark.sql.catalyst.expressions.Expression

  private def arity(name: String, n: Int)(exprs: Seq[Expr]): Unit =
    require(exprs.length == n,
      s"$name requires exactly $n argument(s), got ${exprs.length}")

  private[graft] val dotBuilder: Seq[Expr] => Expr = { exprs =>
    arity("graft_dot", 2)(exprs)
    DotProduct(exprs(0), exprs(1))
  }

  private[graft] val simhashBuilder: Seq[Expr] => Expr = { exprs =>
    arity("graft_simhash", 1)(exprs)
    Simhash(exprs.head)
  }

  /** Register the graft SQL functions into a live session. */
  def register(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "graft_dot", dotBuilder)
    Bridge.registerFunction(spark, "graft_simhash", simhashBuilder)
  }

  private val siblings =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, SparkSession]()

  /** Build (or reuse) a SIBLING session on the running SparkContext with
    * the graft extensions applied. Functions register at runtime
    * ([[register]]) but analyzer CHECK rules (strict pruning) only attach
    * at session build — this is the live-harness path to a guarded session.
    *
    * The sibling is MEMOIZED per base session: repeated calls return the
    * same instance, so SharedState does not accumulate per call, and its
    * catalog persists across calls (it starts fresh relative to the base
    * session — register the tables it should see). Do NOT `stop()` the
    * sibling: it shares the base session's SparkContext, and stopping
    * either session stops the context for both.
    *
    * The swap of the JVM-global active/default sessions is guarded by a
    * lock on the [[SparkSession]] companion, so a concurrent
    * `getOrCreate()` elsewhere cannot observe the cleared window and build
    * an unintended extra session. */
  def siblingSessionWith(spark: SparkSession): SparkSession =
    SparkSession.synchronized {
      // purge memo entries whose base session's context has stopped — a
      // harness that cycles base sessions must not retain one dead sibling
      // (SessionState, analyzer, catalog) per stopped base forever
      siblings.keySet.removeIf(_.sparkContext.isStopped)
      siblings.computeIfAbsent(spark, base => {
        val active = SparkSession.getActiveSession
        val default = SparkSession.getDefaultSession
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        try SparkSession.builder()
          .withExtensions(new GraftExtensions()(_)).getOrCreate()
        finally {
          active.foreach(SparkSession.setActiveSession)
          default.foreach(SparkSession.setDefaultSession)
        }
      })
    }
}
