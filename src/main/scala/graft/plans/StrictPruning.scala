package graft.plans

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.catalyst.expressions.AttributeSet
import org.apache.spark.sql.catalyst.plans.logical.{Filter, InsertIntoStatement, Join, LogicalPlan}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Strict partition pruning — the reference's `hive.partition.pruning=
  * strict` guard (contrib/hive/ql clientnegative/strict_pruning.q; conf in
  * ql/src/java/org/apache/hadoop/hive/conf/HiveConf.java): when enabled, a
  * query that scans a partitioned table WITHOUT any filter on a partition
  * column is rejected at analysis instead of silently scanning every
  * partition.
  *
  * At 100 TB this is a guard worth its weight: a fact table partitioned by
  * day holds thousands of partitions, and the difference between
  * `WHERE ds = '2026-08-13'` and a missing predicate is a four-orders-of-
  * magnitude scan a user almost never meant to run. Catalyst prunes
  * partitions when a predicate exists — this check rejects the plans where
  * there is nothing to prune WITH.
  *
  * Off by default (`spark.graft.strictPruning=true` enables, per session).
  * Registered as an analyzer check rule via [[graft.GraftExtensions]] —
  * it sees the resolved plan before any optimizer rewrite, so WHERE
  * clauses are still present as [[Filter]] nodes. Join conditions count as
  * constraining (a partition-keyed join is how dynamic partition pruning
  * earns its scan), matching the spirit, not just the letter, of the
  * reference guard.
  */
object StrictPruning {
  val confKey = "spark.graft.strictPruning"

  /** The `SparkSessionExtensions.injectCheckRule` builder. */
  def check(spark: SparkSession): LogicalPlan => Unit = plan => {
    val on =
      try spark.conf.get(confKey, "false").toBoolean
      catch { case _: IllegalArgumentException => false }
    if (on) walk(plan, AttributeSet.empty)
  }

  private def walk(p: LogicalPlan, constrained: AttributeSet): Unit = p match {
    case f: Filter =>
      walk(f.child, constrained ++ f.condition.references)
    case j: Join =>
      val refs = j.condition.map(_.references).getOrElse(AttributeSet.empty)
      j.children.foreach(walk(_, constrained ++ refs))
    case i: InsertIntoStatement =>
      // the insert TARGET relation is not a scan — only the source query
      // needs pruning evidence
      walk(i.query, constrained)
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation if fs.partitionSchema.nonEmpty =>
          val partNames =
            fs.partitionSchema.fieldNames.map(_.toLowerCase).toSet
          val partAttrs =
            lr.output.filter(a => partNames.contains(a.name.toLowerCase))
          if (!partAttrs.exists(constrained.contains)) {
            val name = lr.catalogTable.map(_.identifier.unquotedString)
              .getOrElse(fs.location.rootPaths.mkString(","))
            throw new AnalysisException("USER_RAISED_EXCEPTION",
              Map("errorMessage" ->
                (s"GRAFT_STRICT_PRUNING: scan of partitioned table `$name` " +
                  "has no filter on a partition column " +
                  s"(${fs.partitionSchema.fieldNames.mkString(", ")}). " +
                  "Add a partition predicate (or join on the partition key), " +
                  s"or unset $confKey.")))
          }
        case _ =>
      }
    case other => other.children.foreach(walk(_, constrained))
  }
}
