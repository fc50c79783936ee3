package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, OneRowRelation, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

import graft.catalog.{CommitLog, GraftTable}

/** Metadata-only aggregates: a bare, unfiltered, ungrouped
  * `SELECT count(*) / min(k) / max(k) FROM <catalog table>` is answered
  * from the manifest — per-file row tags for the count, per-file footer
  * bounds for min/max — instead of scanning the table. At 100 TB that is
  * one manifest read vs a full-table pass (the lakehouse
  * OptimizeMetadataOnlyQuery pattern, extended to bounds). Strictness is
  * what makes it safe; the rewrite fires ONLY when:
  *
  *  - the aggregate has NO grouping and every output is `count(*)`,
  *    `min(col)`, or `max(col)` (count(col) is null-sensitive — never
  *    matches);
  *  - min/max columns are INTEGRAL (footer bounds for strings may be
  *    writer-truncated and doubles have NaN-order edge cases — both
  *    decline rather than risk a wrong byte) and the manifest's bound
  *    tag agrees (`long`);
  *  - the child is the bare (optionally attribute-projected) relation —
  *    any Filter keeps the stock plan;
  *  - the snapshot carries NO merge-on-read tombstones (a DV could
  *    delete the counted rows or the extreme row) and EVERY file line
  *    carries the needed tag ([[CommitLog.snapshotStats]] /
  *    [[CommitLog.snapshotBounds]] return None otherwise — e.g. a
  *    foreign import without stats declines, never guesses).
  *
  * Time-travel reads qualify too: tags are per version. Disable with
  * `spark.graft.countStar.enabled=false`.
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

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def rewrite(aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    val table = baseTable(child).getOrElse(return None)
    if (table.hasDeletes) return None // tombstones make file tags stale
    val log = new CommitLog(spark, table.tableRoot)
    val v = table.pinnedVersion.orElse(log.currentVersion).getOrElse(return None)
    lazy val rows: Option[Long] =
      try log.snapshotStats(v)._2
      catch { case scala.util.control.NonFatal(_) => None }
    val boundCache = scala.collection.mutable.Map.empty[String, Option[(Long, Long)]]
    // footer bounds under the PHYSICAL column name (renamed tables store
    // physical names in files and manifests)
    def bounds(a: AttributeReference): Option[(Long, Long)] =
      boundCache.getOrElseUpdate(a.name, {
        if (!integral(a.dataType)) None
        else try {
          val phys = table.renameMapping.getOrElse(a.name, a.name)
          log.snapshotBounds(v, phys).filter(_.tpe == "long")
            .map(b => (b.min.toLong, b.max.toLong))
        } catch { case scala.util.control.NonFatal(_) => None }
      })
    def asLit(value: Long, dt: DataType): Literal = dt match {
      case ByteType    => Literal(value.toByte, ByteType)
      case ShortType   => Literal(value.toShort, ShortType)
      case IntegerType => Literal(value.toInt, IntegerType)
      case _           => Literal(value, LongType)
    }
    val outs: Seq[NamedExpression] = aggExprs.map {
      case al @ Alias(
          AggregateExpression(Count(Seq(Literal(1, _))), Complete, false, None, _), _) =>
        Alias(Literal(rows.getOrElse(return None), LongType), al.name)(exprId = al.exprId)
      case al @ Alias(
          AggregateExpression(Min(a: AttributeReference), Complete, false, None, _), _) =>
        val (lo, _) = bounds(a).getOrElse(return None)
        Alias(asLit(lo, a.dataType), al.name)(exprId = al.exprId)
      case al @ Alias(
          AggregateExpression(Max(a: AttributeReference), Complete, false, None, _), _) =>
        val (_, hi) = bounds(a).getOrElse(return None)
        Alias(asLit(hi, a.dataType), al.name)(exprId = al.exprId)
      case _ => return None
    }
    Some(Project(outs, OneRowRelation()))
  }
}
