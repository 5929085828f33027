package graft.plans

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{AttributeSet, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, InsertIntoStatement, Join, LogicalPlan, Project, Union}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** The strict-pruning policy rejection. A DEDICATED error condition
  * ([[StrictPruning.errorClass]]): `USER_RAISED_EXCEPTION` is reserved for
  * `raise_error()`, and a caller matching on error class must be able to
  * tell a policy guard from a user-raised error. Built on the protected
  * [[AnalysisException]] constructor with a pre-formatted message, so no
  * registry lookup is involved. */
class StrictPruningViolation(msg: String)
  extends AnalysisException(
    message = msg,
    errorClass = Some(StrictPruning.errorClass),
    messageParameters = Map.empty)

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
  * reference guard — but only when the condition actually references a
  * partition column of the scanned side; a join on non-partition keys is
  * not pruning evidence.
  *
  * Constraint tracking is exprId-based and REMAPPED across aliasing
  * boundaries: a filter on `d` where the subquery projects `ds AS d`
  * constrains `ds` below the Project, and a filter above a Union binds to
  * each branch's corresponding output (branch 2..n attrs get fresh
  * exprIds from deduplication). Both V1 file scans
  * ([[LogicalRelation]]/[[HadoopFsRelation]]) and V2 catalog scans
  * ([[DataSourceV2Relation]] with identity-transform partitioning) are
  * guarded — a partitioned table must not bypass the check just because it
  * arrives through a different connector.
  */
object StrictPruning {
  val confKey = "spark.graft.strictPruning"

  /** Error condition carried by [[StrictPruningViolation]]; callers match
    * on `e.getCondition == StrictPruning.errorClass`. */
  val errorClass = "GRAFT_STRICT_PRUNING"

  /** The `SparkSessionExtensions.injectCheckRule` builder. */
  def check(spark: SparkSession): LogicalPlan => Unit = plan => {
    val on =
      try spark.conf.get(confKey, "false").toBoolean
      catch { case _: IllegalArgumentException => false }
    if (on) walk(plan, AttributeSet.empty)
  }

  private def reject(name: String, partCols: Seq[String]): Nothing =
    throw new StrictPruningViolation(
      s"[$errorClass] scan of partitioned table `$name` " +
        s"has no filter on a partition column (${partCols.mkString(", ")}). " +
        "Add a partition predicate (or join on the partition key), " +
        s"or unset $confKey.")

  /** Constraints crossing a projection bind to the project-list entries
    * they name; below the node they constrain those entries' INPUTS (an
    * alias's child references; a pass-through attribute stays itself). */
  private def remap(outs: Seq[NamedExpression],
      constrained: AttributeSet): AttributeSet =
    AttributeSet(outs.filter(ne => constrained.contains(ne.toAttribute))
      .flatMap(_.references))

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
    case pj: Project =>
      walk(pj.child, remap(pj.projectList, constrained))
    case a: Aggregate =>
      // HAVING filters reference aggregate output; grouping columns pass
      // through the same alias remap as projections
      walk(a.child, remap(a.aggregateExpressions, constrained))
    case u: Union =>
      // Union output attrs carry the FIRST child's exprIds; bind each
      // constraint positionally to every branch's own output
      u.children.foreach { child =>
        val mapped = AttributeSet(u.output.zip(child.output).collect {
          case (out, in) if constrained.contains(out) => in
        })
        walk(child, mapped)
      }
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation if fs.partitionSchema.nonEmpty =>
          val partNames =
            fs.partitionSchema.fieldNames.map(_.toLowerCase).toSet
          val partAttrs =
            lr.output.filter(a => partNames.contains(a.name.toLowerCase))
          if (!partAttrs.exists(constrained.contains))
            reject(lr.catalogTable.map(_.identifier.unquotedString)
                .getOrElse(fs.location.rootPaths.mkString(",")),
              fs.partitionSchema.fieldNames.toSeq)
        case _ =>
      }
    case dsv2: DataSourceV2Relation =>
      // V2 tables declare partitioning as transforms; identity transforms
      // name the partition columns. Anything else (bucket/days/...) still
      // names its source columns — a filter on those is the best available
      // pruning evidence, matching the V1 semantics.
      val partNames = dsv2.table.partitioning().toSeq
        .flatMap(_.references().toSeq.flatMap(_.fieldNames().toSeq))
        .map(_.toLowerCase).toSet
      if (partNames.nonEmpty) {
        val partAttrs =
          dsv2.output.filter(a => partNames.contains(a.name.toLowerCase))
        if (!partAttrs.exists(constrained.contains))
          reject(dsv2.name, partNames.toSeq.sorted)
      }
    case other => other.children.foreach(walk(_, constrained))
  }
}
