package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for the stopword-membership counters in `q_lang_id` /
  * `q_quality_score`: how many elements of a token array belong to a
  * small FIXED word set (with multiplicity — the portable form is
  * `size(filter(toks, t -> t IN (…)))`, which keeps duplicates).
  *
  * The portable form runs one interpreted higher-order filter per
  * language per row — lambda dispatch and a materialized filtered array
  * per (doc, language). This kernel is a compiled scan of the token array
  * against a pre-resolved marker array (the sets are 4 words — a linear
  * probe beats hashing), no intermediate arrays, no lambda dispatch.
  *
  * Semantics equal the SQL `IN` on non-null tokens: exact binary string
  * equality. A null token matches nothing (SQL `null IN (…)` is
  * null/false-y: the filter drops it), so null elements simply don't
  * count — pinned by OptimizedRewriteSpec against the portable filter.
  */
object CountInKernel {

  /** words: the marker set, resolved once at expression construction. */
  case class CountIn(child: Expression, words: Seq[String])
      extends UnaryExpression {

    // resolved marker array, shared across rows (immutable after build)
    @transient private lazy val markers: Array[UTF8String] =
      words.map(UTF8String.fromString).toArray

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(_: StringType, _) if words.nonEmpty =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a non-empty word set")
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> argument, got ${t.catalogString}")
    }
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_count_in"
    override def nullable: Boolean = child.nullable

    def count(arr: ArrayData): Int = {
      val m = markers
      val n = arr.numElements()
      var hits = 0
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val t = arr.getUTF8String(i)
          var j = 0
          while (j < m.length) {
            if (m(j).equals(t)) { hits += 1; j = m.length }
            else j += 1
          }
        }
        i += 1
      }
      hits
    }

    override protected def nullSafeEval(a: Any): Any =
      count(a.asInstanceOf[ArrayData])

    // the loop lives in the expression instance; codegen references it so
    // the call stays inside whole-stage codegen
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("countIn", this,
        classOf[CountIn].getName)
      defineCodeGen(ctx, ev, c => s"$ref.count($c)")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
