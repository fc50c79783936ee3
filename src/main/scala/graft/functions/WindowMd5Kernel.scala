package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for `q_dedup_substring`'s window pass: the md5 hex
  * digests of every `w`-char window of a text at stride `stride`,
  * computed in one pass.
  *
  * The portable form
  * (`transform(sequence(1, length(text)-w+1, stride), i -> md5(substring(text, i, w)))`)
  * runs an interpreted higher-order transform per row: per window a
  * lambda dispatch, a substring COPY, Spark's md5 expression (another
  * byte copy through commons-codec), and hex encoding through a String.
  * This kernel indexes the UTF-8 char boundaries once, feeds each
  * window's byte range straight into a thread-local MessageDigest, and
  * hex-encodes into the result array — no lambda dispatch, no substring
  * copies (same mechanics as ShingleKernel, which pinned the pattern).
  *
  * Semantics are identical on every row the caller admits (it filters
  * `length(text) >= w`, so the sequence is non-empty): md5 is computed
  * over the UTF-8 bytes of exactly the chars [i, i+w) — windows shorter
  * than w cannot occur because the portable sequence stops at
  * length-w+1. OptimizedRewriteSpec pins row-for-row equality against
  * the portable transform.
  */
object WindowMd5Kernel {

  private val hexDigits = "0123456789abcdef".toCharArray

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static entry shared by interpreted eval and codegen. */
  def windowMd5(text: UTF8String, w: Int, stride: Int): ArrayData = {
    val n = text.numChars()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val bytes = text.getBytes
    val offsets = new Array[Int](n + 1)
    var ci = 0
    var bi = 0
    while (bi < bytes.length) {
      offsets(ci) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    offsets(n) = bytes.length
    val digest = md5.get()
    val scratch = new Array[Byte](16)
    val count = (n - w) / stride + 1
    val out = new Array[Any](count)
    var k = 0
    var i = 0
    while (i <= n - w) {
      digest.update(bytes, offsets(i), offsets(i + w) - offsets(i))
      digest.digest(scratch, 0, 16)
      val hex = new Array[Byte](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = hexDigits((scratch(b) >> 4) & 0xf).toByte
        hex(2 * b + 1) = hexDigits(scratch(b) & 0xf).toByte
        b += 1
      }
      out(k) = UTF8String.fromBytes(hex)
      k += 1
      i += stride
    }
    new GenericArrayData(out)
  }

  /** md5 hex of every chunk starting at char 0, stride, 2·stride … < n —
    * TAIL chunks shorter than w INCLUDED (the q_doc_chunk layout, where
    * the portable form explodes `sequence(1, length(text), stride)` and
    * takes `substring(text, o, w)` of each offset). One pass: char
    * offsets indexed once, each chunk's byte range fed straight to a
    * thread-local digest — the portable form re-scans the string from
    * position 0 for EVERY substring call (O(n²/stride) char stepping)
    * and did so twice per chunk (length + md5).
    */
  def chunkMd5(text: UTF8String, w: Int, stride: Int): ArrayData = {
    val n = text.numChars()
    if (n < 1) return new GenericArrayData(Array.empty[Any])
    val bytes = text.getBytes
    val offsets = new Array[Int](n + 1)
    var ci = 0
    var bi = 0
    while (bi < bytes.length) {
      offsets(ci) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    offsets(n) = bytes.length
    val digest = md5.get()
    val scratch = new Array[Byte](16)
    val count = (n - 1) / stride + 1
    val out = new Array[Any](count)
    var k = 0
    var i = 0
    while (i < n) {
      val end = math.min(i + w, n)
      digest.update(bytes, offsets(i), offsets(end) - offsets(i))
      digest.digest(scratch, 0, 16)
      val hex = new Array[Byte](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = hexDigits((scratch(b) >> 4) & 0xf).toByte
        hex(2 * b + 1) = hexDigits(scratch(b) & 0xf).toByte
        b += 1
      }
      out(k) = UTF8String.fromBytes(hex)
      k += 1
      i += stride
    }
    new GenericArrayData(out)
  }

  /** md5 hex of every stride-aligned chunk incl. the short tail. */
  case class ChunkMd5(child: Expression, w: Int, stride: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: StringType if w >= 1 && stride >= 1 => TypeCheckResult.TypeCheckSuccess
      case _: StringType => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires w >= 1 and stride >= 1, got w=$w stride=$stride")
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.catalogString}")
    }
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_chunk_md5"
    override def nullable: Boolean = child.nullable

    override protected def nullSafeEval(s: Any): Any =
      chunkMd5(s.asInstanceOf[UTF8String], w, stride)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.WindowMd5Kernel.chunkMd5($c, $w, $stride)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** md5 hex of every w-char window at the given stride. */
  case class WindowMd5(child: Expression, w: Int, stride: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: StringType if w >= 1 && stride >= 1 => TypeCheckResult.TypeCheckSuccess
      case _: StringType => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires w >= 1 and stride >= 1, got w=$w stride=$stride")
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.catalogString}")
    }
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_window_md5"
    override def nullable: Boolean = child.nullable

    override protected def nullSafeEval(s: Any): Any =
      windowMd5(s.asInstanceOf[UTF8String], w, stride)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.WindowMd5Kernel.windowMd5($c, $w, $stride)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
