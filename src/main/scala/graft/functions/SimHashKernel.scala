package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for the 32-bit SimHash fingerprint half (SURVEY §2.2-K
  * `q_dedup_simhash`): bit j (0-based, j < 32) of the result is 1 iff,
  * summed over the input tokens, the high bit of hex nibble j+1 of
  * md5(prefix ++ token) is more often 1 than 0 (strict majority; a tie
  * leaves the bit 0).
  *
  * This is bit-identical to the portable formulation the oracle mirrors —
  *   explode(tokens) → md5 → explode(sequence(1,32)) →
  *   substring(hex,j,1) IN ('8'..'f') → ±1 → two keyed hash aggs →
  *   sum(CASE pow(2,j-1)) —
  * because "hex nibble's char is in 8..f" is exactly "nibble & 8 != 0" on
  * the raw digest byte, and the per-(doc,j) sum/majority arithmetic here
  * is the same integer arithmetic, just in a local array instead of two
  * shuffles. The portable path explodes |tokens|×32 rows per document and
  * shuffles them twice; at 100 TB the fingerprint pass is a full-corpus
  * scan, so this kernel keeps it a narrow map: one md5 per token, 32
  * counter bumps, zero intermediate rows. (Same native-tier rationale as
  * ShingleKernel / VectorKernels; reference grounding: the curation plane
  * the registry fronts, lambda/aws-dl-fmwrk-data-asset-api/
  * lambda_function.py:56-130.)
  */
object SimHashKernel {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static entry shared by interpreted eval and codegen. `prefix` is the
    * seed prepended to every token before hashing (UTF-8 concat, exactly
    * `md5(prefix || tok)`); null array elements are skipped.
    */
  def simhash32(toks: ArrayData, prefix: Array[Byte]): Long = {
    val digest = md5.get()
    val scratch = new Array[Byte](16)
    val counts = new Array[Int](32)
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      if (!toks.isNullAt(t)) {
        if (prefix.length > 0) digest.update(prefix)
        val tok = toks.getUTF8String(t).getBytes
        digest.update(tok)
        digest.digest(scratch, 0, 16)
        // hex char at 1-based position j covers byte (j-1)/2, high nibble
        // when j is odd; '8'..'f' == high bit of that nibble set
        var j = 0
        while (j < 32) {
          val b = scratch(j >> 1)
          val nib = if ((j & 1) == 0) (b >> 4) & 0xf else b & 0xf
          counts(j) += (if ((nib & 8) != 0) 1 else -1)
          j += 1
        }
      }
      t += 1
    }
    var f = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) > 0) f |= (1L << j)
      j += 1
    }
    f
  }

  /** 32-bit SimHash over an array<string> token column, seeded by `prefix`. */
  case class SimHash32(child: Expression, prefix: String)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${t.catalogString}")
    }
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash32"
    override def nullable: Boolean = child.nullable

    private lazy val prefixBytes =
      prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)

    override protected def nullSafeEval(a: Any): Any =
      simhash32(a.asInstanceOf[ArrayData], prefixBytes)

    // the loop lives in the static helper; codegen emits one call so the
    // expression stays inside whole-stage codegen (ShingleKernel pattern)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val pref = ctx.addReferenceObj("simhashPrefix", prefixBytes, "byte[]")
      defineCodeGen(ctx, ev,
        c => s"graft.functions.SimHashKernel.simhash32($c, $pref)")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column-API surface (same shim as VectorKernels/ShingleKernel). */
  def simhash32(toks: Column, prefix: String): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      SimHash32(org.apache.spark.sql.GraftSqlShim.expression(toks), prefix))
}
