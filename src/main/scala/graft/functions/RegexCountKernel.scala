package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native regex match counter. Spark's `regexp_count` is a
  * RuntimeReplaceable for `size(regexp_extract_all(…))` (verified against
  * the 4.1.2 catalyst jar), so it still materializes every match as a
  * string in an array per row just to take the array's size. This kernel
  * runs the same java.util.regex pattern with a counting `find()` loop —
  * identical match semantics (same engine, same non-overlapping
  * left-to-right scan), zero per-match allocation.
  *
  * Used by the audit counters in `q_pii_scrub` / `q_token_count` /
  * `q_quality_score`; counts pinned identical to
  * `size(regexp_extract_all(…))` by OptimizedRewriteSpec.
  */
object RegexCountKernel {

  /** count of non-overlapping matches of a LITERAL pattern. */
  case class RegexCount(child: Expression, pattern: String)
      extends UnaryExpression {

    // compiled once per expression instance, shared across rows — the
    // pattern is a literal, never per-row data
    @transient private lazy val compiled: java.util.regex.Pattern =
      java.util.regex.Pattern.compile(pattern)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.catalogString}")
    }
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_re_count"
    override def nullable: Boolean = child.nullable

    def count(s: UTF8String): Int = {
      val m = compiled.matcher(s.toString)
      var n = 0
      while (m.find()) n += 1
      n
    }

    override protected def nullSafeEval(a: Any): Any =
      count(a.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("reCount", this, classOf[RegexCount].getName)
      defineCodeGen(ctx, ev, c => s"$ref.count($c)")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
