package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document quality counters for `q_quality_score`.
  *
  * The portable form materializes the whitespace token ARRAY
  * (`regexp_extract_all(text, '[^ ]+')` — one string allocation per
  * token) just to take its size and scan it for stop words, plus a
  * separate regex pass for the punctuation count. This kernel computes
  * `struct(n_tok, punct, stop)` in ONE byte walk:
  *  - n_tok  = number of maximal runs of non-space bytes — exactly the
  *    `[^ ]+` match count (the pattern is anchored on ASCII 0x20, which
  *    never occurs inside a UTF-8 multibyte sequence);
  *  - punct  = code points outside [A-Za-z0-9 ] — counted per
  *    NON-continuation byte, which equals the regex's per-char count for
  *    every plane (a surrogate pair is one regex char and one UTF-8 lead
  *    byte);
  *  - stop   = tokens byte-equal to one of the (ASCII) stop words —
  *    exactly `graft_count_in(toks, csv)` / `size(filter(toks, t -> t IN
  *    set))` over the same tokenization.
  * Pinned row-for-row against the three portable expressions by
  * OptimizedRewriteSpec (corpus + multibyte/edge strings).
  */
object TextQualityKernel {

  case class TextQuality(child: Expression, words: Seq[String])
      extends UnaryExpression {

    @transient private lazy val wordBytes: Array[Array[Byte]] =
      words.map(_.getBytes("UTF-8")).toArray

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.catalogString}")
    }
    override def dataType: DataType = StructType(Seq(
      StructField("n_tok", IntegerType, nullable = false),
      StructField("punct", IntegerType, nullable = false),
      StructField("stop", IntegerType, nullable = false)))
    override def prettyName: String = "graft_text_quality"
    override def nullable: Boolean = child.nullable

    private def isAlnumOrSpace(b: Byte): Boolean =
      b == ' '.toByte ||
        (b >= 'A'.toByte && b <= 'Z'.toByte) ||
        (b >= 'a'.toByte && b <= 'z'.toByte) ||
        (b >= '0'.toByte && b <= '9'.toByte)

    def counts(s: UTF8String): InternalRow = {
      val bytes = s.getBytes
      val n = bytes.length
      var nTok = 0
      var punct = 0
      var stop = 0
      var i = 0
      while (i < n) {
        val b = bytes(i)
        if (b == ' '.toByte) i += 1
        else {
          // token run [i, j)
          val start = i
          var j = i
          while (j < n && bytes(j) != ' '.toByte) {
            val c = bytes(j)
            // one count per code point: skip UTF-8 continuation bytes
            if ((c & 0xc0) != 0x80 && !isAlnumOrSpace(c)) punct += 1
            j += 1
          }
          nTok += 1
          val len = j - start
          var w = 0
          while (w < wordBytes.length) {
            val wb = wordBytes(w)
            if (wb.length == len) {
              var k = 0
              while (k < len && bytes(start + k) == wb(k)) k += 1
              if (k == len) { stop += 1; w = wordBytes.length }
              else w += 1
            } else w += 1
          }
          i = j
        }
      }
      new GenericInternalRow(Array[Any](
        java.lang.Integer.valueOf(nTok), java.lang.Integer.valueOf(punct),
        java.lang.Integer.valueOf(stop)))
    }

    override protected def nullSafeEval(a: Any): Any =
      counts(a.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("textQuality", this, classOf[TextQuality].getName)
      defineCodeGen(ctx, ev, c => s"$ref.counts($c)")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
