package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, OneRowRelation, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.LongType

import graft.catalog.{CommitLog, GraftTable}

/** Metadata-only `count(*)`: a bare, unfiltered, ungrouped
  * `SELECT count(*) FROM <catalog table>` is answered from the
  * manifest's per-file row tags instead of scanning the table — at
  * 100 TB the difference between one manifest read and a full-table
  * pass (the lakehouse OptimizeMetadataOnlyQuery pattern). Strictness
  * is what makes it safe; the rewrite fires ONLY when:
  *
  *  - the aggregate has NO grouping and every output is a plain
  *    `count(*)` (count(col) is null-sensitive, so it never matches);
  *  - the child is the bare (optionally attribute-projected) relation —
  *    any Filter keeps the stock plan;
  *  - the snapshot carries NO merge-on-read tombstones (a DV makes the
  *    file tags an overcount) and EVERY file line carries a row tag
  *    ([[CommitLog.snapshotStats]] returns None otherwise — e.g. a
  *    foreign import without counts declines, never guesses).
  *
  * Time-travel reads qualify too: row tags are per version. Disable
  * with `spark.graft.countStar.enabled=false`.
  */
class CountStarFromManifest(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (spark.conf.get("spark.graft.countStar.enabled", "true") != "true") return plan
    plan.transformUp {
      case agg @ Aggregate(Seq(), aggExprs, child, _) =>
        rewrite(aggExprs, child).getOrElse(agg)
    }
  }

  /** The bare table under optional attribute-only projections; a Filter
    * anywhere disqualifies (stats describe the WHOLE snapshot).
    */
  private def baseTable(plan: LogicalPlan): Option[GraftTable] = plan match {
    case DataSourceV2Relation(t: GraftTable, _, _, _, _, _) => Some(t)
    case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      baseTable(child)
    case _ => None
  }

  private def rewrite(aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    val table = baseTable(child).getOrElse(return None)
    if (table.hasDeletes) return None // tombstones make file tags an overcount
    val log = new CommitLog(spark, table.tableRoot)
    val v = table.pinnedVersion.orElse(log.currentVersion).getOrElse(return None)
    lazy val rows: Option[Long] =
      try snapshotRows(log, v) catch { case scala.util.control.NonFatal(_) => None }
    val outs: Seq[NamedExpression] = aggExprs.map {
      case al @ Alias(
          AggregateExpression(Count(Seq(Literal(1, _))), Complete, false, None, _), _) =>
        Alias(Literal(rows.getOrElse(return None), LongType), al.name)(exprId = al.exprId)
      case _ => return None
    }
    Some(Project(outs, OneRowRelation()))
  }

  private def snapshotRows(log: CommitLog, v: Long): Option[Long] =
    log.snapshotStats(v)._2
}
