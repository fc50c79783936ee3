package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}

import graft.catalog.{CommitLog, GraftTable, MaterializedView}

/** Optimizer rule planning a matching aggregate over a catalog table
  * onto its incrementally-maintained materialized view
  * ([[graft.catalog.MaterializedView]]) instead of the base scan — the
  * payoff of MV maintenance: at 100 TB a
  * `GROUP BY k` rollup the view already holds answers from
  * |groups| rows instead of a full fact scan.
  *
  * A rewrite fires only when EVERY box is ticked; anything else keeps
  * the stock plan (correct by construction — the view is an
  * optimization, never a semantic dependency):
  *
  *  - the aggregate's child is an un-pinned [[GraftTable]] relation
  *    under (optionally) attribute-only projections and deterministic,
  *    subquery-free filters whose references are all view GROUP columns
  *    (those commute with the aggregate, so the predicate re-applies to
  *    the view's rows verbatim) — time-travel reads never rewrite onto
  *    a head-maintained view;
  *  - the grouping keys are plain columns forming a SUBSET of the
  *    view's group columns: an exact match projects the view straight
  *    through; a strict subset (down to the empty set — a global
  *    aggregate) re-aggregates the view's |groups| rows, with
  *    `count(*)` rolling up as `sum(cnt)` and `sum(x)` as `sum(sum_x)`
  *    — valid precisely because the view restricts itself to additive
  *    aggregates;
  *  - every output is a group column, `count(*)` (the view's `cnt`), or
  *    `sum(col)` over an EXACT-typed column (integer/decimal) the view
  *    maintains — float sums are order-dependent, so rewriting them
  *    could change the last ulp vs. the direct plan and is refused;
  *    no DISTINCT, no FILTER clauses;
  *  - the view is FRESH: its `#mvsrc` cursor equals the source's
  *    current version (staleness check is two metadata reads). A view
  *    behind its source simply doesn't match — refresh and the next
  *    query plans onto it.
  *
  * The substituted subtree keeps the aggregate's output ExprIds (alias
  * projection over the view's scan), so parent operators are untouched.
  * Discovery is O(1) metadata: the source root's `_mvs.json` sidecar
  * lists candidate views. Disable with
  * `spark.graft.mv.rewrite.enabled=false`.
  */
class RewriteToMaterializedView(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (spark.conf.get("spark.graft.mv.rewrite.enabled", "true") != "true") return plan
    plan.transformUp {
      case agg @ Aggregate(groupings, aggExprs, child, _) =>
        rewrite(groupings, aggExprs, child).getOrElse(agg)
    }
  }

  /** The bare table under optional attribute-only projections and
    * deterministic, subquery-free filters, plus the filter conditions
    * collected on the way down. A filter whose references are all GROUP
    * columns commutes with the aggregate, so the query can still serve
    * from the view with the same predicate applied to the view's rows
    * (checked against the view's group set in [[tryView]]).
    */
  private def baseTable(plan: LogicalPlan): Option[(GraftTable, Seq[Expression])] =
    plan match {
      case DataSourceV2Relation(t: GraftTable, _, _, _, _, _) if !t.isPinned =>
        Some((t, Nil))
      case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        baseTable(child)
      case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, child)
          if cond.deterministic && !cond.exists(
            _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression]) =>
        baseTable(child).map { case (t, cs) => (t, cond +: cs) }
      case _ => None
    }

  private def exactSummable(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _: DecimalType => true
      case _ => false
    }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** An INNER equi-join TREE of catalog tables under optional attribute
    * projections and group-commuting filters (above any join or on any
    * side) — the star view's query shape, one fact joined to N dims.
    * Returns the leaf tables with their output sets (for resolving which
    * side each join-key attribute belongs to), the flattened equi-join
    * attribute pairs, and all collected filter conditions. Any non-inner
    * join, non-equi condition, or non-catalog leaf refuses the shape.
    */
  private def baseStar(plan: LogicalPlan): Option[(
      Seq[(GraftTable, org.apache.spark.sql.catalyst.expressions.AttributeSet)],
      Seq[(AttributeReference, AttributeReference)],
      Seq[Expression])] =
    plan match {
      case DataSourceV2Relation(t: GraftTable, _, _, _, _, _) if !t.isPinned =>
        Some((Seq((t, plan.outputSet)), Nil, Nil))
      case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        baseStar(child)
      case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, child)
          if cond.deterministic && !cond.exists(
            _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression]) =>
        baseStar(child).map { case (ts, js, cs) => (ts, js, cond +: cs) }
      case org.apache.spark.sql.catalyst.plans.logical.Join(l, r,
          org.apache.spark.sql.catalyst.plans.Inner, Some(cond), _) =>
        val pairs = conjuncts(cond).map {
          case org.apache.spark.sql.catalyst.expressions.EqualTo(
              a: AttributeReference, b: AttributeReference) => (a, b)
          case _ => return None
        }
        for {
          (lts, ljs, lcs) <- baseStar(l)
          (rts, rjs, rcs) <- baseStar(r)
        } yield (lts ++ rts, ljs ++ rjs ++ pairs, lcs ++ rcs)
      case _ => None
    }

  private def rewrite(groupings: Seq[Expression], aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    val groupAttrs = groupings.map {
      case a: AttributeReference => a
      case _ => return None
    }
    baseTable(child) match {
      case Some((table, conds)) =>
        val root = table.tableRoot
        val candidates = MaterializedView.registered(spark, root)
        if (candidates.isEmpty) return None
        val head = new CommitLog(spark, root).currentVersion.getOrElse(return None)
        candidates.view.flatMap { mvRoot =>
          tryView(mvRoot, root, head, groupAttrs, aggExprs, conds)
        }.headOption
      case None => baseStar(child) match {
        case Some((leaves, joinPairs, conds)) if leaves.size >= 2 =>
          val candidates = leaves.flatMap(l =>
            MaterializedView.registered(spark, l._1.tableRoot)).distinct
          candidates.view.flatMap { mvRoot =>
            tryStarView(mvRoot, leaves, joinPairs, groupAttrs, aggExprs, conds)
          }.headOption
        case _ => None
      }
    }
  }

  /** Star-view match: the query's inner equi-join tree must BE the
    * view's definition — one leaf per relation (the fact + every dim
    * root), each view join spec matched by exactly one query join pair
    * connecting the fact's `fk` attribute to that dim's `dk` attribute
    * (either orientation), NO unmatched join conditions left over — and
    * the view fresh against the fact head and EVERY dim head. Then the
    * serve/fold logic is exactly the single-table one (the view's rows
    * are star-join rows).
    */
  private def tryStarView(mvRoot: String,
      leaves: Seq[(GraftTable, org.apache.spark.sql.catalyst.expressions.AttributeSet)],
      joinPairs: Seq[(AttributeReference, AttributeReference)],
      groupAttrs: Seq[AttributeReference],
      aggExprs: Seq[NamedExpression], conds: Seq[Expression]): Option[LogicalPlan] = {
    if (!MaterializedView.exists(spark, mvRoot)) return None
    val (src, groups, sums, joins) =
      try MaterializedView.definition(spark, mvRoot)
      catch { case scala.util.control.NonFatal(_) => return None }
    if (joins.isEmpty || leaves.size != joins.size + 1 ||
      joinPairs.size != joins.size) return None
    val factIdx = leaves.indexWhere(_._1.tableRoot == src)
    if (factIdx < 0) return None
    val factOut = leaves(factIdx)._2
    // greedily bind each view dim spec to an unused leaf + unused join
    // pair; the star is a tree, so a valid binding is unique when it
    // exists (each pair names exactly one fact-side and one dim-side key)
    var usedLeaves = Set(factIdx)
    var usedPairs = Set.empty[Int]
    joins.foreach { case (dimRoot, fk, dk) =>
      val hit = joinPairs.zipWithIndex.collectFirst {
        case ((a, b), pi) if !usedPairs(pi) && {
          def binds(fa: AttributeReference, da: AttributeReference): Option[Int] =
            if (fa.name == fk && factOut.contains(fa) && da.name == dk)
              leaves.zipWithIndex.collectFirst {
                case ((t, out), li) if !usedLeaves(li) &&
                  t.tableRoot == dimRoot && out.contains(da) => li
              }
            else None
          binds(a, b).orElse(binds(b, a)) match {
            case Some(li) => usedLeaves += li; usedPairs += pi; true
            case None => false
          }
        } => pi
      }
      if (hit.isEmpty) return None
    }
    val factHead = new CommitLog(spark, src).currentVersion.getOrElse(return None)
    val mv = MaterializedView.open(spark, mvRoot)
    if (mv.refreshedVersion != factHead) return None
    val dimHeads = joins.map { case (d, _, _) =>
      new CommitLog(spark, d).currentVersion.getOrElse(return None) }
    if (dimHeads != mv.dimVersions) return None
    // the optimizer infers `isnotnull(<join key>)` on both sides of an
    // inner equi-join; those are IMPLIED by the join itself (the view's
    // rows already exclude null keys), so they drop rather than block.
    // Everything else must commute (group-column references only).
    val keyNames = joins.flatMap { case (_, fk, dk) => Seq(fk, dk) }.toSet
    val real = conds.flatMap(conjuncts).filterNot {
      case org.apache.spark.sql.catalyst.expressions.IsNotNull(a: AttributeReference) =>
        keyNames.contains(a.name)
      case _ => false
    }
    planOnView(mv, groups, sums, groupAttrs, aggExprs, real)
  }

  private def tryView(mvRoot: String, root: String, head: Long,
      groupAttrs: Seq[AttributeReference],
      aggExprs: Seq[NamedExpression],
      conds: Seq[Expression]): Option[LogicalPlan] = {
    if (!MaterializedView.exists(spark, mvRoot)) return None
    val (src, groups, sums, joins) =
      try MaterializedView.definition(spark, mvRoot)
      catch { case scala.util.control.NonFatal(_) => return None }
    if (src != root || joins.nonEmpty) return None
    val mv = MaterializedView.open(spark, mvRoot)
    if (mv.refreshedVersion != head) return None // stale — refresh first
    planOnView(mv, groups, sums, groupAttrs, aggExprs, conds)
  }

  /** The serve/fold core shared by single-table and join views (callers
    * have already matched the definition and checked freshness).
    *
    * Exact group match serves straight off the view; a STRICT SUBSET
    * (including the empty set — a global aggregate) re-aggregates the
    * view's |groups| rows instead of the base table. count(*) rolls up
    * as sum(cnt); sum(x) as sum(sum_x) — additivity is exactly why the
    * view maintains only additive aggregates, so the rollup is
    * value-identical to the direct plan over exact-typed columns.
    */
  private def planOnView(mv: MaterializedView, groups: Seq[String],
      sums: Seq[(String, String)], groupAttrs: Seq[AttributeReference],
      aggExprs: Seq[NamedExpression], conds: Seq[Expression]): Option[LogicalPlan] = {
    val queryGroups = groupAttrs.map(_.name).toSet
    if (!queryGroups.subsetOf(groups.toSet)) return None
    // collected filters must reference GROUP columns only — those
    // commute with the aggregate, so the same predicate over the view's
    // group values selects exactly the groups the direct plan would keep
    if (!conds.forall(_.references.forall(a => groups.contains(a.name))))
      return None
    val exact = queryGroups == groups.toSet
    val sumAlias = sums.toMap
    val mvPlan = mv.read().queryExecution.analyzed
    val mvByName = mvPlan.output.map(a => a.name -> a).toMap
    def as(e: Expression, o: NamedExpression): NamedExpression = {
      val cast = if (e.dataType == o.dataType) e else Cast(e, o.dataType)
      Alias(cast, o.name)(exprId = o.exprId)
    }
    // an additive view column: passed through on exact match, re-summed
    // on rollup
    def fold(e: Expression): Expression =
      if (exact) e else Sum(e).toAggregateExpression()
    // the view-column equivalent of one maintained aggregate call, or
    // None for anything the view cannot serve. A top-level Cast (the
    // `CAST(sum(x) AS DOUBLE)` SQL shape the analyzer folds INTO the
    // aggregate list) is peeled and re-applied — with an intermediate
    // cast to the original aggregate's type so the value path matches
    // the direct plan's exactly.
    def serve(e: Expression): Option[Expression] = e match {
      case AggregateExpression(Count(Seq(Literal(1, _))), Complete, false, None, _) =>
        Some(fold(mvByName("cnt")))
      case ae @ AggregateExpression(s: Sum, Complete, false, None, _) =>
        s.child match {
          case a: AttributeReference
              if sumAlias.contains(a.name) && exactSummable(a.dataType) =>
            val served = fold(mvByName(sumAlias(a.name)))
            Some(if (served.dataType == ae.dataType) served
                 else Cast(served, ae.dataType))
          case _ => None
        }
      case Cast(inner, dt, tz, mode) =>
        serve(inner).map(new Cast(_, dt, tz, mode))
      case _ => None
    }
    val projections: Seq[NamedExpression] = aggExprs.map {
      case a: AttributeReference if groups.contains(a.name) =>
        as(mvByName(a.name), a)
      case al @ Alias(a: AttributeReference, _) if groups.contains(a.name) =>
        as(mvByName(a.name), al)
      case al @ Alias(body, _) =>
        as(serve(body).getOrElse(return None), al)
      case _ => return None
    }
    // group-column filters rebind to the view's attributes (same names,
    // same types) and apply UNDER the projection/re-aggregation
    val base: LogicalPlan =
      if (conds.isEmpty) mvPlan
      else org.apache.spark.sql.catalyst.plans.logical.Filter(
        conds.map(_.transform {
          case a: AttributeReference => mvByName(a.name)
        }).reduce(org.apache.spark.sql.catalyst.expressions.And(_, _)), mvPlan)
    if (exact) Some(Project(projections, base))
    else Some(Aggregate(
      groupAttrs.map(a => mvByName(a.name): Expression), projections, base))
  }
}
