package org.apache.spark.sql

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType

/** Bridge to Spark's own `InternalRow` → parquet write support (a
  * `private[sql]` class, hence this shim package): lets an executor-side
  * `DataWriter` emit parquet files byte-compatible with Spark's batch
  * writer — same converters, same timestamp/decimal physical types —
  * without re-implementing a row writer. Used by the commit-log
  * streaming sink ([[graft.catalog]]'s `GraftStreamingWrite`).
  */
object GraftParquetWriterShim {

  private final class Builder(path: org.apache.hadoop.fs.Path)
    extends ParquetWriter.Builder[InternalRow, Builder](path) {
    override def self(): Builder = this
    override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }

  /** Open a parquet writer for `schema` at `path`. `sessionConf` is the
    * driver's `sessionState.newHadoopConf()` flattened to key-values and
    * rebuilt task-side — `ParquetWriteSupport.init` reads a handful of
    * session SQL confs (legacy format, timestamp type, rebase modes,
    * field ids) whose absence fails the task, and shipping the real
    * session values keeps sink files byte-compatible with batch commits.
    */
  def newWriter(path: String, schema: StructType,
      sessionConf: Seq[(String, String)]): ParquetWriter[InternalRow] = {
    val conf = new Configuration()
    sessionConf.foreach { case (k, v) => conf.set(k, v) }
    ParquetWriteSupport.setSchema(schema, conf)
    // what ParquetFileFormat.prepareWrite sets before handing the conf to
    // the write support (init asserts on their presence); session values
    // win when the user set them explicitly (then they ride sessionConf)
    def default(k: String, v: String): Unit =
      if (conf.get(k) == null) conf.set(k, v)
    default(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key, "false")
    default(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      SQLConf.ParquetOutputTimestampType.TIMESTAMP_MICROS.toString)
    default(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key, "false")
    default(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key, "true")
    default(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.defaultValueString)
    new Builder(new org.apache.hadoop.fs.Path(path))
      .withConf(conf)
      .withCompressionCodec(org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
  }

  /** Driver-side capture of the session's effective Hadoop+SQL conf. */
  def sessionConfKVs(spark: SparkSession): Seq[(String, String)] = {
    val c = spark.sessionState.newHadoopConf()
    val it = c.iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (it.hasNext) { val e = it.next(); buf += (e.getKey -> e.getValue) }
    buf.toSeq
  }
}
