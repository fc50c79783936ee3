package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused int8-quantization statistics for `q_embed_quantize`.
  *
  * The portable formulation runs FIVE interpreted higher-order passes per
  * row (abs-transform + array_max to find the scale, the quantizing
  * transform, the aggregate fold for the sum, array_min, array_max), each
  * materializing an intermediate array through the interpreted HOF path.
  * This kernel computes `struct(mx, q_sum, q_min, q_max)` in two tight
  * scalar loops (one for the max-abs scale, one for the quantized stats)
  * with no intermediate arrays.
  *
  * Semantics are replicated EXACTLY (pinned by OptimizedRewriteSpec
  * against the HOF chain on the embeddings corpus and on degenerate
  * vectors):
  *  - mx = max over non-null |double(x)| (array_max skips null elements;
  *    null when the array is empty or all-null); NaN compares greatest,
  *    like Spark's double ordering.
  *  - mxs = (mx == 0.0) ? 1.0 : mx — the all-zero-vector guard; null
  *    propagates (CASE's ELSE on a null comparison).
  *  - q_i = CAST(round(x_i / mxs * 127) AS BIGINT): Spark's Round on a
  *    double is BigDecimal.valueOf(d).setScale(0, HALF_UP) with NaN/Inf
  *    passed through — reproduced verbatim.
  *  - q_sum = aggregate(q, 0L, a+v): 0 on an empty array; null as soon
  *    as any element is null (the fold propagates null).
  *  - q_min/q_max = array_min/array_max over q, skipping nulls.
  * The round(mx, 6) surfaced as `scale` stays OUTSIDE the kernel (the
  * projection applies Spark's own Round), so that value cannot drift.
  */
object QuantKernel {

  /** Spark Round(double, 0) semantics. */
  private def round0(d: Double): Double =
    if (d.isNaN || d.isInfinite) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  case class VecQuantStats(child: Expression) extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float> argument, got ${t.catalogString}")
    }
    override def dataType: DataType = StructType(Seq(
      StructField("mx", DoubleType, nullable = true),
      StructField("q_sum", LongType, nullable = true),
      StructField("q_min", LongType, nullable = true),
      StructField("q_max", LongType, nullable = true)))
    override def prettyName: String = "graft_vec_quant_stats"
    override def nullable: Boolean = child.nullable

    def stats(a: ArrayData): InternalRow = {
      val n = a.numElements()
      // pass 1: scale = max of non-null |x| (NaN greatest, like Spark)
      var mx = 0.0
      var mxSeen = false
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) {
          val v = math.abs(a.getFloat(i).toDouble)
          if (!mxSeen || java.lang.Double.compare(v, mx) > 0) { mx = v; mxSeen = true }
        }
        i += 1
      }
      val mxOut: Any = if (mxSeen) java.lang.Double.valueOf(mx) else null
      // pass 2: quantized sum/min/max under the zero-guarded scale
      var sum = 0L
      var sumNull = !mxSeen && n > 0  // null scale nulls every element
      var qmin = 0L; var qmax = 0L; var qSeen = false
      if (mxSeen) {
        val mxs = if (mx == 0.0) 1.0 else mx
        i = 0
        while (i < n) {
          if (a.isNullAt(i)) sumNull = true
          else {
            val q = round0(a.getFloat(i).toDouble / mxs * 127.0).toLong
            if (!sumNull) sum += q
            if (!qSeen) { qmin = q; qmax = q; qSeen = true }
            else { if (q < qmin) qmin = q; if (q > qmax) qmax = q }
          }
          i += 1
        }
      }
      new GenericInternalRow(Array[Any](
        mxOut,
        if (sumNull) null else java.lang.Long.valueOf(sum),
        if (qSeen) java.lang.Long.valueOf(qmin) else null,
        if (qSeen) java.lang.Long.valueOf(qmax) else null))
    }

    override protected def nullSafeEval(a: Any): Any =
      stats(a.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("quantStats", this, classOf[VecQuantStats].getName)
      defineCodeGen(ctx, ev, c => s"$ref.stats($c)")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
