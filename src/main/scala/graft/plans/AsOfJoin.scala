package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** A genuine AS-OF JOIN operator — SURVEY §2.2-D noted "Spark has no
  * native asof"; this is the extension-ladder tier (c) realization:
  * custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`, wired through
  * the planner so EnsureRequirements inserts the hash exchanges and sorts.
  *
  * Semantics: backward as-of LEFT join — for every left row, the single
  * right row with the same key and the greatest right-ts ≤ left-ts
  * (null-extended when none exists).
  *
  * Physical shape (the 100 TB story): both sides hash-partition on the
  * key and sort by (key, ts); each partition pair is then merged in ONE
  * sequential pass with O(1) state (the current best-match row) — same
  * cost profile as a sort-merge join, strictly cheaper than the
  * composed window formulation (union + partition window + filter) and
  * than the generic range-join fallback (BroadcastNestedLoop) Spark
  * would otherwise pick.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTs: Expression,
    rightKey: Expression, rightTs: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.classic.Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.leftKey, p.leftTs, p.rightKey, p.rightTs,
        planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(leftKey: Expression, leftTs: Expression,
    rightKey: Expression, rightTs: Expression,
    left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  /** Co-partition both sides on the key… */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  /** …and sort each partition by (key, ts) so the merge is one pass. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val rightArity = right.output.size
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightArity)
      val rBuf = rIter.buffered
      // O(1) merge state: the best (key-matching, latest-ts) right row so far
      var matchRow: InternalRow = null
      var matchKey: Any = null
      lIter.map { lRow =>
        val lk = lKeyB.eval(lRow)
        val lt = lTsB.eval(lRow)
        if (lk == null || lt == null) {
          // null key/ts matches nothing (same as equi-join null semantics)
          resultProj(joined(lRow, nullRight))
        } else {
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val r = rBuf.head
            val rk = rKeyB.eval(r)
            val rt = rTsB.eval(r)
            if (rk == null || rt == null) {
              // null-keyed right rows can never match; nulls sort first so
              // they are consumed before any comparable key arrives
              rBuf.next()
            } else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) { matchRow = null; matchKey = null; rBuf.next() }
              else if (c == 0 && tsOrd.lteq(rt, lt)) {
                // copy BOTH the row and the key: eval on the sorter's reused
                // UnsafeRow returns views (UTF8String/arrays) into a buffer
                // that the next rBuf.next() overwrites
                matchRow = r.copy()
                matchKey = InternalRow.copyValue(rk)
                rBuf.next()
              } else advancing = false
            }
          }
          val hit = matchRow != null && matchKey != null &&
            keyOrd.compare(matchKey, lk) == 0
          resultProj(joined(lRow, if (hit) matchRow else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Public API: `AsOf.join(left, right, key, leftTs, rightTs)` — resolves
  * the named columns against each side, installs the planner strategy
  * idempotently, and wraps the logical node as a DataFrame.
  */
object AsOf {
  def ensureStrategy(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }

  private def attr(df: DataFrame, name: String): Attribute =
    df.queryExecution.analyzed.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${df.columns.mkString(",")}"))

  /** Backward as-of left join of `left` to `right` on `key`, matching the
    * latest right row with rightTsCol ≤ leftTsCol.
    */
  def join(spark: SparkSession, left: DataFrame, right: DataFrame,
      key: String, leftTsCol: String, rightTsCol: String): DataFrame = {
    ensureStrategy(spark)
    // Re-alias the right side with fresh expression IDs: when both sides
    // derive from the same base relation (the common as-of shape — e.g.
    // purchases vs clicks of one events table) their attributes share IDs,
    // and re-analysis would rewrite one side out from under our key/ts
    // expressions.
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val rAnalyzed = right.queryExecution.analyzed
    val rAliases = rAnalyzed.output.map(a => Alias(a, a.name)())
    val rFresh = Project(rAliases, rAnalyzed)
    val rAttrs = rAliases.map(_.toAttribute)
    def rAttr(name: String): Attribute =
      rAttrs.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${right.columns.mkString(",")}"))
    val plan = AsOfJoinPlan(
      left.queryExecution.analyzed, rFresh,
      attr(left, key), attr(left, leftTsCol),
      rAttr(key), rAttr(rightTsCol))
    GraftSqlShim.ofRows(spark, plan)
  }
}
