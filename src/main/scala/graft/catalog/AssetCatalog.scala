package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Registered entities of the lake control plane — the reference's three
  * CRUD resources realized as typed Datasets over parquet.
  *
  * Reference grounding:
  *  - source system: numeric srcSysId + provisioned landing bucket
  *    `{prefix}-{srcSysId}-{region}` (cft/sourceSystem.yaml:15-27)
  *  - target system / data asset: identical CRUD surface
  *    (lambda/aws-dl-fmwrk-target-system-api/lambda_function.py:56-130,
  *    lambda/aws-dl-fmwrk-data-asset-api/lambda_function.py:56-130)
  *  - landing-zone path contract `<asset>/<batch>/init/`
  *    (cft/sourceSystem.yaml:77)
  */
case class SourceSystem(src_sys_id: Long, name: String, region: String,
    modified_ts: java.sql.Timestamp, status: String)
case class TargetSystem(tgt_sys_id: Long, name: String, region: String,
    modified_ts: java.sql.Timestamp, status: String)
case class DataAsset(asset_id: Long, src_sys_id: Long, name: String,
    zone: String, modified_ts: java.sql.Timestamp, status: String)

/** CRUD over a parquet-backed registry table, Spark-native.
  *
  * No table-format jars ship in this environment (SURVEY §7.1), so mutable
  * semantics are realized as read→transform→atomic-rewrite of plain
  * parquet — the same logical plans a MERGE/DELETE would produce on a
  * lakehouse table:
  *  - create  = validated append                    (R1/R5, lambda_function.py:19-32,56-73)
  *  - read    = key-predicate scan (pushdown)       (R3, lambda_function.py:35-38,75-92)
  *  - update  = left-join + conditional projection  (R2/R6, guarded upsert,
  *              ConditionExpression at lambda_function.py:39)
  *  - delete  = left-anti join rewrite              (R4, lambda_function.py:113-130)
  *
  * At scale the rewrite touches only the table's partitions that contain
  * the key range (partition pruning on the key column); the registry
  * tables themselves are small dimension tables — broadcast-joinable
  * against any fact.
  */
class AssetCatalog(spark: SparkSession, root: String) {
  import spark.implicits._

  private def path(table: String) = s"$root/$table"

  def readTable(table: String): DataFrame = spark.read.parquet(path(table))

  // Hadoop FileSystem, not java.io.File: existence must resolve correctly
  // on HDFS/S3A, where File.exists() is unconditionally false
  private def exists(table: String): Boolean =
    ParquetRewrite.fs(spark, path(table)).exists(new Path(path(table)))

  private def rewrite(table: String, df: DataFrame): Unit =
    ParquetRewrite.rewrite(df, path(table))

  /** R1/R5: validated append. Fails fast on duplicate key — the
    * analysis-time validation posture of the reference's gateway
    * validator (swagger:268-271).
    */
  def create[T: org.apache.spark.sql.Encoder](table: String, keyCol: String,
      rows: Dataset[T]): Unit = {
    val batch = rows.toDF()
    require(batch.select(keyCol).distinct().count() == batch.count(),
      s"create: duplicate keys within the batch for $table")
    if (exists(table)) {
      val dup = readTable(table).select(keyCol)
        .join(rows.toDF().select(keyCol), Seq(keyCol), "inner").limit(1).count()
      require(dup == 0, s"create: key already exists in $table")
      rows.toDF().write.mode(SaveMode.Append).parquet(path(table))
    } else rows.toDF().write.parquet(path(table))
  }

  /** R3: point lookup by key — a pushed-down predicate scan. */
  def read(table: String, keyCol: String, key: Long): DataFrame =
    readTable(table).filter(col(keyCol) === key)

  /** R2/R6: guarded upsert — rows whose key exists get the new column
    * values; others pass through unchanged (left join + CASE projection,
    * the MERGE-WHEN-MATCHED plan).
    */
  def update(table: String, keyCol: String, updates: DataFrame): Unit = {
    require(updates.select(keyCol).distinct().count() == updates.count(),
      s"update: duplicate keys in the updates batch for $table")
    val cur = readTable(table)
    val upd = updates.columns.filterNot(_ == keyCol)
    val joined = cur.as("c").join(
      updates.as("u").withColumn("_matched", lit(true)),
      Seq(keyCol), "left")
    val projected = joined.select(cur.columns.map { c =>
      if (c == keyCol) col(keyCol)
      else if (upd.contains(c))
        when(col("_matched"), col(s"u.$c")).otherwise(col(s"c.$c")).as(c)
      else col(s"c.$c").as(c)
    }: _*)
    rewrite(table, projected)
  }

  /** R4: keyed delete — left-anti rewrite. */
  def deleteKeys(table: String, keyCol: String, keys: Seq[Long]): Unit = {
    val ks = keys.toDF(keyCol)
    rewrite(table, readTable(table).join(ks, Seq(keyCol), "left_anti"))
  }

  /** R15: per-source landing bucket name `{prefix}-{srcSysId}-{region}`
    * (cft/sourceSystem.yaml:27) and R17 zone path
    * `<asset>/<batch>/init/` (cft/sourceSystem.yaml:77).
    */
  def landingBucket(prefix: String, srcSysId: Long, region: String): String =
    s"$prefix-$srcSysId-$region"

  def initZonePath(bucket: String, asset: String, batch: String): String =
    s"$bucket/$asset/$batch/init"

  /** Dual-region posture (reference config/globalConfig.json:4-5 carries a
    * primary + secondary region): replicate every registry table under
    * `root` into `secondaryRoot` via the same staged-rewrite commit the
    * primary uses, so a replica is never observable half-written. Returns
    * the table names replicated.
    *
    * At scale each table replicates independently (per-table rewrite =
    * per-table parallel copy job); the registry tables are small dims, so
    * this is metadata-cheap next to the data-plane replication it models.
    */
  def replicate(secondaryRoot: String): Seq[String] = {
    val hfs = ParquetRewrite.fs(spark, root)
    val tables = hfs.listStatus(new Path(root))
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filterNot(n => n.endsWith(".staging") || n.endsWith(".old"))
      .toSeq.sorted
    tables.foreach(t => ParquetRewrite.rewrite(readTable(t), s"$secondaryRoot/$t"))
    tables
  }

  /** Small-file compaction. Streaming ingest and per-batch appends leave
    * a table as thousands of KB-sized parquet files; at 100 TB that turns
    * every scan into open/footer-read overhead and floods the driver's
    * file index. Rewrite the table into `ceil(bytes / targetFileBytes)`
    * files via the same staged-rewrite commit as every other mutation (a
    * reader never observes a half-compacted table). `coalesce`, not
    * `repartition`: compaction must not pay a shuffle — it only narrows
    * the file count.
    *
    * Returns (filesBefore, filesAfter).
    */
  def compact(table: String, targetFileBytes: Long = 128L * 1024 * 1024)
      : (Int, Int) = {
    val p = path(table)
    val hfs = ParquetRewrite.fs(spark, p)
    def dataFiles = hfs.listStatus(new Path(p))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val before = dataFiles
    val bytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    rewrite(table, readTable(table).coalesce(nOut))
    (before.length, dataFiles.length)
  }

  /** Replica parity: primary and secondary hold exactly the same multiset
    * of rows (exceptAll empty both directions — catches missing AND extra).
    */
  def replicaParity(secondaryRoot: String, table: String): Boolean = {
    val a = readTable(table)
    val b = spark.read.parquet(s"$secondaryRoot/$table")
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
  }
}
