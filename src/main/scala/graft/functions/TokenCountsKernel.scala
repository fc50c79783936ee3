package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused token counters for `q_token_count`: whitespace tokens and the
  * BPE-ish tokenization in ONE byte walk.
  *
  * The two counts the portable form ran as separate java.util.regex
  * scans:
  *  - ws  = count of `[^ ]+` matches = maximal runs of non-space bytes
  *    (0x20 never occurs inside a UTF-8 multibyte sequence);
  *  - bpe = count of `[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]` matches. Java's
  *    alternation is leftmost-first, and at any position exactly one
  *    branch can match: a letter starts a greedy letter run, a digit a
  *    greedy digit run, any other non-space code point matches the
  *    single-char class (spaces match nothing). So the count is
  *    letter-runs + digit-runs + other non-space code points — counted
  *    per NON-continuation byte so multibyte chars count once, like the
  *    regex's per-char semantics.
  * Pinned against both `graft_re_count` scans by OptimizedRewriteSpec
  * (corpus + edge strings).
  */
object TokenCountsKernel {

  /** Static entry shared by interpreted eval and codegen. */
  def counts(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    var ws = 0
    var bpe = 0
    var i = 0
    var inWs = false     // inside a non-space run
    var cls = 0          // current bpe run class: 1=letter, 2=digit, 0=none
    while (i < n) {
      val b = bytes(i)
      if (b == ' '.toByte) { inWs = false; cls = 0 }
      else {
        if (!inWs) { ws += 1; inWs = true }
        if ((b & 0xc0) != 0x80) { // one decision per code point
          val c =
            if ((b >= 'A'.toByte && b <= 'Z'.toByte) ||
                (b >= 'a'.toByte && b <= 'z'.toByte)) 1
            else if (b >= '0'.toByte && b <= '9'.toByte) 2
            else 3
          if (c == 3) { bpe += 1; cls = 0 }        // single-char token
          else if (c != cls) { bpe += 1; cls = c } // run starts
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      java.lang.Integer.valueOf(ws), java.lang.Integer.valueOf(bpe)))
  }

  case class TokenCounts(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.catalogString}")
    }
    override def dataType: DataType = StructType(Seq(
      StructField("ws", IntegerType, nullable = false),
      StructField("bpe", IntegerType, nullable = false)))
    override def prettyName: String = "graft_token_counts"
    override def nullable: Boolean = child.nullable

    override protected def nullSafeEval(a: Any): Any =
      TokenCountsKernel.counts(a.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.TokenCountsKernel.counts($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
