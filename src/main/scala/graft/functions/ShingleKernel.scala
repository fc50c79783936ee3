package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for document fingerprinting (SURVEY §2.2-K
  * `q_doc_fingerprint`): the bottom-k md5 sketch of a text's w-gram
  * character shingles, computed in ONE pass over the string.
  *
  * The portable formulation
  * (`array_join(slice(array_sort(transform(array_distinct(transform(
  * sequence…)))), 1, k), '|')`) materializes the shingle array, a distinct
  * set, the full md5 array, and sorts all of it — O(m log m) per doc with
  * every element running through the interpreted higher-order-function
  * path. This kernel streams the shingles, hashes each, and maintains the
  * k smallest distinct digests in a fixed k-slot buffer — O(m·k), no
  * intermediate arrays, no lambda dispatch. At 100 TB the sketch pass is
  * the full-corpus scan; this keeps it a tight compiled loop.
  *
  * Distinctness falls out of the buffer rule: an incoming digest equal to
  * a held candidate is skipped, one greater than the current k-th is
  * rejected once the buffer is full (a duplicate of an evicted value is
  * by definition > max(buffer), so it can never wrongly re-enter). The
  * buffer therefore always holds the k smallest DISTINCT digests seen —
  * bit-identical output to the portable form (hex strings are ASCII, so
  * JVM String order == UTF8String binary order).
  */
object ShingleKernel {

  private val hexDigits = "0123456789abcdef".toCharArray

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static entry shared by interpreted eval and codegen.
    *
    * Zero allocation per shingle: ONE byte copy of the row's text, char
    * boundaries indexed once (UTF-8 aware), each md5 written into a
    * reused scratch buffer, candidates compared as raw digest bytes
    * (unsigned byte order == hex-string order, md5 hex is monotone in
    * its bytes), hex-encoded only for the ≤ k winners at the end.
    */
  def bottomKMd5(text: UTF8String, w: Int, k: Int): UTF8String = {
    val n = text.numChars()
    if (n < w) return UTF8String.EMPTY_UTF8
    val bytes = text.getBytes
    // offsets(c) = byte index where char c starts; offsets(n) = total
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
    val cand = new Array[Array[Byte]](k) // sorted ascending, sz live slots
    var sz = 0
    var i = 0
    while (i <= n - w) {
      digest.update(bytes, offsets(i), offsets(i + w) - offsets(i))
      digest.digest(scratch, 0, 16)
      if (sz < k || java.util.Arrays.compareUnsigned(scratch, cand(sz - 1)) < 0) {
        // find insertion point; skip exact duplicates of held candidates
        var p = 0
        while (p < sz && java.util.Arrays.compareUnsigned(cand(p), scratch) < 0) p += 1
        if (p >= sz || !java.util.Arrays.equals(cand(p), scratch)) {
          val last = if (sz < k) sz else k - 1
          var j = last
          while (j > p) { cand(j) = cand(j - 1); j -= 1 }
          cand(p) = scratch.clone()
          if (sz < k) sz += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](33 * sz - 1)
    var c = 0
    while (c < sz) {
      val base = 33 * c
      if (c > 0) out(base - 1) = '|'
      val raw = cand(c)
      var b = 0
      while (b < 16) {
        out(base + 2 * b) = hexDigits((raw(b) >> 4) & 0xf).toByte
        out(base + 2 * b + 1) = hexDigits(raw(b) & 0xf).toByte
        b += 1
      }
      c += 1
    }
    UTF8String.fromBytes(out)
  }

  /** bottom-k md5(w-gram shingle) sketch of a string column. */
  case class BottomKShingleMd5(child: Expression, w: Int, k: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: StringType if w >= 1 && k >= 1 => TypeCheckResult.TypeCheckSuccess
      case _: StringType => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires w >= 1 and k >= 1, got w=$w k=$k")
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.catalogString}")
    }
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_bottomk_md5"
    override def nullable: Boolean = child.nullable

    override protected def nullSafeEval(s: Any): Any =
      bottomKMd5(s.asInstanceOf[UTF8String], w, k)

    // the loop lives in the static helper; codegen emits one call, so the
    // expression stays inside whole-stage codegen without inlining 40
    // lines of Janino
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.ShingleKernel.bottomKMd5($c, $w, $k)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column-API surface (same shim as VectorKernels). */
  def bottomKShingleMd5(text: Column, w: Int, k: Int): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      BottomKShingleMd5(org.apache.spark.sql.GraftSqlShim.expression(text), w, k))
}
