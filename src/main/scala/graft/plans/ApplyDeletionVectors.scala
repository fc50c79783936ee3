package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.catalog.GraftTable

/** Analyzer rule making the SQL front door merge-on-read-correct: a
  * catalog relation over a [[graft.catalog.GraftTable]] snapshot that
  * carries deletion vectors is rewritten — at analysis, before any scan
  * is built — into the commit log's tombstone-applied read (parquet scan
  * ANTI JOIN tombstones on (file, position), the same plan the DataFrame
  * plane uses). Output attributes keep the relation's ExprIds, so every
  * already-resolved parent reference survives the substitution.
  *
  * Tombstone-free tables (the overwhelmingly common case) don't match and
  * keep Spark's native V2 parquet scan path untouched — full pushdown,
  * pruning, vectorization. Filters above a rewritten relation still push
  * into the anti-join's streamed (data) side through Catalyst's normal
  * predicate pushdown, and the DV build side broadcasts, so the rewrite
  * costs one broadcast hash anti-join over the same scan — not a
  * different scale shape.
  *
  * Installed via `spark.sql.extensions=graft.functions.GraftExtensions`.
  * Sessions WITHOUT the rule fail loudly instead of resurrecting deleted
  * rows: [[graft.catalog.GraftTable.newScanBuilder]] refuses to bind a
  * raw file scan while tombstones are live.
  */
class ApplyDeletionVectors(spark: SparkSession) extends Rule[LogicalPlan] {

  /** Only READ positions are rewritten. A write/row-level command's
    * target relation must stay the V2 table (the command machinery
    * resolves it to a write or a row-level operation; rewriting it to a
    * Project makes the command unresolvable) — the commit paths are
    * tombstone-aware on their own, and SQL MERGE/UPDATE on a tombstoned
    * table is refused at the table ([[GraftTable]]) with a pointer to
    * `system.rewrite_deletes`.
    */
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case w: org.apache.spark.sql.catalyst.plans.logical.V2WriteCommand =>
      w.withNewQuery(rewriteReads(w.query))
    case m: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable =>
      m.copy(sourceTable = rewriteReads(m.sourceTable))
    case _: org.apache.spark.sql.catalyst.plans.logical.UpdateTable |
         _: org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable => plan
    case other => rewriteReads(other)
  }

  private def rewriteReads(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case r @ DataSourceV2Relation(t: GraftTable, _, _, _, _, _) if t.hasDeletes =>
      val child = t.snapshotRead().queryExecution.analyzed
      val byName = child.output.map(a => a.name -> a).toMap
      Project(r.output.map { o =>
        val a = byName.getOrElse(o.name, throw new IllegalStateException(
          s"deletion-vector rewrite of ${r.table.name()}: column ${o.name} " +
            s"missing from the snapshot read (have ${byName.keys.mkString(", ")})"))
        val e = if (a.dataType == o.dataType) a else Cast(a, o.dataType)
        Alias(e, o.name)(exprId = o.exprId)
      }, child)
  }
}
