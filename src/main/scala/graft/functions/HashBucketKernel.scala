package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native deterministic-draw kernel: the uniform [0, 65536) hash bucket
  * every reproducible sampler keys on (`Sampling`, SURVEY §7.3.5).
  *
  * Bit-identical to the portable formulation
  * `CAST(conv(substring(md5(x), 1, 4), 16, 10) AS INT)` — the first two
  * md5 digest bytes as a big-endian unsigned 16-bit value — but computed
  * straight off the digest: no 32-char hex string materialization, no
  * substring slice, no base-16 string parse per row. At corpus scale the
  * draw runs once per row of a 100 TB table, so the hex round-trip is
  * pure waste on the hot path. Oracles are unchanged (DuckDB keeps the
  * portable spelling; equality is property-tested in KernelParitySpec).
  */
object HashBucketKernel {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 16 bits of md5(utf8 bytes), big-endian unsigned. */
  def bucket(s: UTF8String): Int = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    ((digest(0) & 0xff) << 8) | (digest(1) & 0xff)
  }

  case class HashBucket(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_hash_bucket"

    override protected def nullSafeEval(input: Any): Any =
      bucket(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.HashBucketKernel.bucket($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
