package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType}

/** The V2 function behind hidden-partition `bucket(n, col)` layouts —
  * what lets Spark's storage-partitioned-join machinery recognize two
  * graft tables bucketed on the same key as co-partitioned
  * (`KeyGroupedShuffleSpec` resolves the scan-reported
  * `bucket(n, col)` transform through the table catalog's
  * `FunctionCatalog` and matches both sides by `canonicalName`).
  *
  * MUST agree byte-for-byte with the WRITE-side derivation
  * ([[PartitionTransform.derive]]: `pmod(xxhash64(col), n)`, seed 42):
  * Spark may evaluate this function when it shuffles one join side to
  * match the other's layout (`v2.bucketing.shuffle.enabled`), and a
  * divergent hash would co-locate nothing.
  */
private[graft] object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "graft hidden-partition bucket: pmod(xxhash64(col), n)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (num_buckets, col); got ${inputType.simpleString}")
    val dt = inputType.fields(1).dataType
    new ScalarFunction[java.lang.Long] {
      override def inputTypes(): Array[DataType] =
        Array(inputType.fields(0).dataType, dt)
      override def resultType(): DataType = LongType
      override def name(): String = "bucket"
      override def canonicalName(): String = "graft.bucket"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): java.lang.Long = {
        val n: Long = inputType.fields(0).dataType match {
          case IntegerType => input.getInt(0).toLong
          case _           => input.getLong(0)
        }
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(input.get(1, dt), dt, 42L)
        val m = h % n
        if (m < 0) m + n else m
      }
    }
  }
}
