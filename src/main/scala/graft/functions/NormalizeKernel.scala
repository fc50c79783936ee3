package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused normalize-and-fingerprint kernel for `q_text_normalize`.
  *
  * The portable form materializes four intermediate strings per row
  * (raw = "  " + [upper(text)|text] + "   ", lower(raw), the
  * space-collapsed norm via a regex pass, the alnum skeleton via a
  * second regex pass) and scans several of them again for lengths and
  * md5s. This kernel computes `struct(n_raw, n_norm, norm_md5,
  * skeleton_md5)` with ONE cased string (via the same
  * UTF8String.toUpperCase/toLowerCase Spark's Upper/Lower call, so
  * locale/supplementary behavior is identical — ß→SS etc.), one
  * byte-level space-collapse+trim pass, and two digests over byte
  * ranges — no regex engine, no intermediate Spark columns.
  *
  * Equivalences relied on (pinned by OptimizedRewriteSpec on the corpus
  * and on adversarial strings):
  *  - the "  "/"   " pads only affect n_raw (+5 chars): after
  *    collapse+trim they vanish along with any adjacent source spaces,
  *    exactly as trimming the collapsed un-padded string does;
  *  - `[ ]+` matches ASCII 0x20 only, so the collapse/trim are exact
  *    byte operations (0x20 never appears in UTF-8 continuations);
  *  - skeleton([^a-z0-9] removed) is insensitive to the space edits, so
  *    it filters the cased-lowered bytes directly; multibyte chars are
  *    removed wholesale (their lead and continuation bytes are all
  *    outside [a-z0-9]).
  */
object NormalizeKernel {

  private val hexDigits = "0123456789abcdef".toCharArray

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def hex32(digest: Array[Byte]): UTF8String = {
    val hex = new Array[Byte](32)
    var b = 0
    while (b < 16) {
      hex(2 * b) = hexDigits((digest(b) >> 4) & 0xf).toByte
      hex(2 * b + 1) = hexDigits(digest(b) & 0xf).toByte
      b += 1
    }
    UTF8String.fromBytes(hex)
  }

  def stats(text: UTF8String, upperFirst: Boolean): InternalRow = {
    // cased = lower(raw-core): lower(upper(text)) for flagged rows
    // (NOT the identity — ß→SS→ss), plain lower(text) otherwise
    val upped = if (upperFirst) text.toUpperCase else text
    val nRaw = upped.numChars() + 5 // the "  " + "   " pads
    val cased = upped.toLowerCase
    val bytes = cased.getBytes
    val n = bytes.length
    // collapse 0x20 runs to one space, trim leading/trailing spaces
    val norm = new Array[Byte](n)
    var w = 0
    var nNorm = 0
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if (b == ' '.toByte) { if (w > 0) pendingSpace = true }
      else {
        if (pendingSpace) { norm(w) = ' '.toByte; w += 1; nNorm += 1; pendingSpace = false }
        norm(w) = b; w += 1
        // count a char per non-continuation byte (0b10xxxxxx)
        if ((b & 0xc0) != 0x80) nNorm += 1
      }
      i += 1
    }
    val digest = md5.get()
    val scratch = new Array[Byte](16)
    digest.update(norm, 0, w)
    digest.digest(scratch, 0, 16)
    val normMd5 = hex32(scratch)
    // skeleton: [a-z0-9] bytes of the cased string (space edits are a
    // subset of what the filter removes, so filtering `bytes` directly
    // equals filtering the normalized form)
    val skel = new Array[Byte](n)
    var k = 0
    i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b >= 'a'.toByte && b <= 'z'.toByte) || (b >= '0'.toByte && b <= '9'.toByte)) {
        skel(k) = b; k += 1
      }
      i += 1
    }
    digest.update(skel, 0, k)
    digest.digest(scratch, 0, 16)
    new GenericInternalRow(Array[Any](
      java.lang.Integer.valueOf(nRaw), java.lang.Integer.valueOf(nNorm),
      normMd5, hex32(scratch)))
  }

  /** struct(n_raw, n_norm, norm_md5, skeleton_md5) of the synthesized
    * noisy-then-normalized text; `upperFirst` is the per-row case-noise
    * flag.
    */
  case class NormStats(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (_: StringType, BooleanType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (string, boolean), got ${l.catalogString}, ${r.catalogString}")
      }
    override def dataType: DataType = StructType(Seq(
      StructField("n_raw", IntegerType, nullable = false),
      StructField("n_norm", IntegerType, nullable = false),
      StructField("norm_md5", StringType, nullable = false),
      StructField("skeleton_md5", StringType, nullable = false)))
    override def prettyName: String = "graft_norm_stats"
    override def nullable: Boolean = left.nullable || right.nullable

    override protected def nullSafeEval(t: Any, u: Any): Any =
      stats(t.asInstanceOf[UTF8String], u.asInstanceOf[Boolean])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (t, u) => s"graft.functions.NormalizeKernel.stats($t, $u)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }
}
