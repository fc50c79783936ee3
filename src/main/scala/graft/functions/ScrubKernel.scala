package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused two-pattern scrub + audit-count kernel for `q_pii_scrub`.
  *
  * The declared semantics are the two-pass form
  * `regexp_replace(regexp_replace(text, P1, T1), P2, T2)` plus the audit
  * counts `size(regexp_extract_all(text, P1))` and
  * `size(regexp_extract_all(text, P2))` — five full regex scans of the
  * row plus two intermediate string builds. This kernel produces
  * `struct(scrubbed, n1, n2)` in ONE combined scan (plus a bounded
  * re-scan of the few P1-matched spans for P2 occurrences inside them),
  * building the output string once.
  *
  * Equivalence to the two-pass form is NOT generic over patterns; it
  * holds for pattern pairs with the two properties the email/phone pair
  * has (pinned by OptimizedRewriteSpec on the pii corpus and on
  * adversarial overlap strings):
  *  1. no-straddle: a P2 match never crosses a P1 match boundary. Here
  *     P2 starts with '+' (local-part char, not a domain char) and
  *     contains '@' nowhere, so a P2 match lies entirely inside or
  *     entirely outside any P1 match.
  *  2. leftmost-subsumption: any P1 match overlapping a P2 match starts
  *     at or before the P2 start (every P2 char is a legal P1 local-part
  *     char, so a P1 match beginning inside a P2 span extends left to
  *     its start). Hence the combined leftmost scan with P1 preferred
  *     finds exactly the P1 matches of a pure P1 scan, and its P2
  *     matches are exactly the P2 matches the second replace pass sees.
  *  3. token inertness: neither replacement token can create or extend a
  *     match of either pattern across a seam (the tokens contain no '@'
  *     following local-part chars and no digits).
  * `n2` counts P2 matches of the ORIGINAL text (the audit semantics):
  * matches lying inside a replaced P1 span are counted by re-scanning
  * that span, matches outside come from the combined scan directly.
  * Patterns must not contain capturing groups (the kernel adds one per
  * branch to dispatch).
  */
object ScrubKernel {

  /** struct(scrubbed, n1, n2) of a two-pattern scrub; patterns and
    * replacement tokens are expression-level literals.
    */
  case class ScrubTwo(child: Expression, p1: String, tok1: String,
      p2: String, tok2: String) extends UnaryExpression {

    @transient private lazy val combined: java.util.regex.Pattern =
      java.util.regex.Pattern.compile(s"($p1)|($p2)")
    @transient private lazy val second: java.util.regex.Pattern =
      java.util.regex.Pattern.compile(p2)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.catalogString}")
    }
    override def dataType: DataType = StructType(Seq(
      StructField("scrubbed", StringType, nullable = false),
      StructField("n1", IntegerType, nullable = false),
      StructField("n2", IntegerType, nullable = false)))
    override def prettyName: String = "graft_pii_scrub"
    override def nullable: Boolean = child.nullable

    def scrub(s: UTF8String): InternalRow = {
      val str = s.toString
      val m = combined.matcher(str)
      val pm = second.matcher(str)
      val sb = new java.lang.StringBuilder(str.length)
      var last = 0
      var n1 = 0
      var n2 = 0
      while (m.find()) {
        sb.append(str, last, m.start())
        if (m.start(1) >= 0) {
          n1 += 1
          sb.append(tok1)
          // P2 occurrences hidden inside this replaced P1 span still
          // count toward the original-text audit total
          pm.region(m.start(), m.end())
          while (pm.find()) n2 += 1
        } else {
          n2 += 1
          sb.append(tok2)
        }
        last = m.end()
      }
      sb.append(str, last, str.length)
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(sb.toString),
        java.lang.Integer.valueOf(n1), java.lang.Integer.valueOf(n2)))
    }

    override protected def nullSafeEval(a: Any): Any =
      scrub(a.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("scrub2", this, classOf[ScrubTwo].getName)
      defineCodeGen(ctx, ev, c => s"$ref.scrub($c)")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
