package graft.catalog

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style SQL metadata tables: `SELECT * FROM <cat>.<db>.<t>.files
  * / .history / .snapshots / .refs / .partitions` — table introspection
  * through the query front door, no procedures needed (the reference
  * fronts the same need with its GET-detail routes, swagger:114). The
  * rows come entirely from the commit-log MANIFEST (names, layout dirs,
  * commit-time `_n`/`_b` tags) — zero data-file opens and zero
  * filesystem listings, so a 100 TB table answers `files`/`partitions`
  * at manifest cost. Served as a [[LocalScan]]: metadata is
  * manifest-sized (file count, not data), exactly the driver-bounded
  * shape a local scan is for.
  */
object GraftMetadataTable {
  val Kinds: Set[String] = Set("files", "history", "snapshots", "refs", "partitions")

  def schemaOf(kind: String): StructType = kind match {
    case "files" => new StructType()
      .add("name", StringType, nullable = false)
      .add("partition", StringType, nullable = false)
      .add("bytes", LongType)
      .add("rows", LongType)
    case "history" | "snapshots" => new StructType()
      .add("version", LongType, nullable = false)
      .add("operation", StringType, nullable = false)
      .add("committed_at", TimestampType, nullable = false)
      .add("data_files", IntegerType, nullable = false)
      .add("dv_files", IntegerType, nullable = false)
      .add("txns", IntegerType, nullable = false)
      .add("partitioned_by", StringType, nullable = false)
    case "refs" => new StructType()
      .add("name", StringType, nullable = false)
      .add("kind", StringType, nullable = false)
      .add("version", LongType, nullable = false)
    case "partitions" => new StructType()
      .add("partition", StringType, nullable = false)
      .add("files", IntegerType, nullable = false)
      .add("bytes", LongType)
      .add("rows", LongType)
    case k => throw new IllegalArgumentException(s"unknown metadata table: $k")
  }

  private def s(x: String) = UTF8String.fromString(x)
  private def opt(x: Option[Long]): Any = x.map(Long.box).orNull

  /** Sum that stays None if ANY member is unknown — a partition whose
    * pre-tag files hide their size must not report a too-small total.
    */
  private def sumOpt(xs: Seq[Option[Long]]): Option[Long] =
    if (xs.exists(_.isEmpty)) None else Some(xs.flatten.sum)

  def rowsOf(spark: SparkSession, root: String, kind: String,
      atVersion: Option[Long] = None): Array[InternalRow] = {
    val log = new CommitLog(spark, root)
    // `t.files VERSION AS OF v` — snapshot-pinned file/partition views;
    // history/snapshots/refs are chain-level and ignore the pin
    def v: Seq[Long] = atVersion.orElse(log.currentVersion).toSeq
    kind match {
      case "files" =>
        v.flatMap(log.fileDetails).map { f =>
          new GenericInternalRow(Array[Any](
            s(f.name), s(f.partition), opt(f.bytes), opt(f.rows)))
        }.toArray
      case "history" | "snapshots" =>
        log.history().map { h =>
          new GenericInternalRow(Array[Any](
            h.version, s(h.operation), h.committedAtMs * 1000L,
            h.dataFiles, h.dvFiles, h.txnCount,
            s(h.partitionColumns.mkString(","))))
        }.toArray
      case "refs" =>
        log.refs.values.toSeq.sortBy(_.name).map { r =>
          new GenericInternalRow(Array[Any](s(r.name), s(r.kind), r.version))
        }.toArray
      case "partitions" =>
        v.flatMap(log.fileDetails)
          .groupBy(_.partition).toSeq.sortBy(_._1).map { case (p, fs) =>
            new GenericInternalRow(Array[Any](
              s(p), fs.length,
              opt(sumOpt(fs.map(_.bytes))), opt(sumOpt(fs.map(_.rows)))))
          }.toArray
      case k => throw new IllegalArgumentException(s"unknown metadata table: $k")
    }
  }
}

final class GraftMetadataTable(spark: SparkSession, tableName: String,
    root: String, kind: String, atVersion: Option[Long] = None)
  extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = GraftMetadataTable.schemaOf(kind)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        // rows materialize at SCAN BUILD (analysis/planning), so the
        // frame serves the manifest state current at query time
        private val data = GraftMetadataTable.rowsOf(spark, root, kind, atVersion)
        override def rows(): Array[InternalRow] = data
        override def readSchema(): StructType = schema()
      }
    }
}
