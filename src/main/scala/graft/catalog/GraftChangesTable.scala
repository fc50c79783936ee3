package graft.catalog

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `<cat>.<db>.<t>.changes` — the STREAMING change feed of a commit-log
  * table: `spark.readStream.table("graft.db.t.changes")` emits every
  * committed row change as a `_change_type`-tagged row (`insert` /
  * `delete`) stamped with its `_commit_version`, including the changes
  * an insert-only tail cannot express — CoW deletes/updates, merge-on-
  * read tombstones, replaces, compactions. This is the downstream-
  * consumer surface the MoR-tiered write plane needs (reference
  * topology: cft/sourceSystem.yaml:29-63 — processed changes feed
  * consumers): the plain table tail ([[GraftMicroBatchStream]]) refuses
  * non-append commits by design; the change feed is where those commits
  * stream.
  *
  * Semantics:
  *  - offsets are commit versions (same checkpoint contract as the
  *    table tail): exactly-once across restarts because a version range
  *    is re-planned only if its batch never committed, and the per-range
  *    rows are a pure function of the immutable manifests + pool files.
  *  - changes are computed PER COMMIT VERSION via the batch plane's
  *    [[CommitLog.changesBetween]] (v−1, v] diffs — visibility-adjusted,
  *    O(files changed) per version, never O(table) — so a multi-commit
  *    catch-up batch still attributes each row to the version that
  *    changed it and nothing nets away across versions.
  *  - version 1 (the initial commit) streams as the full snapshot tagged
  *    `insert` — the standard initial-load-then-tail contract.
  *  - vacuum retention must cover the slowest consumer's checkpoint,
  *    exactly as for the table tail.
  *
  * Scale: each planned range is staged once as parquet under
  * `<root>/_cdf/<from>_<to>/` by a distributed job (the diff is joins
  * over just the changed files), then read through Spark's vectorized
  * parquet reader; the stage is content-addressed by the version range,
  * so a replayed range reuses its files byte-identically, and ranges at
  * or below the committed offset are pruned on progress. Nothing is ever
  * collected to the driver.
  */
private[graft] final class GraftChangesTable(
    spark: SparkSession,
    tableName: String,
    root: String,
    baseSchema: StructType,
    renames: Map[String, String] = Map.empty)
  extends Table with SupportsRead {

  override def name(): String = tableName
  override lazy val schema: StructType = GraftChangesTable.cdfSchema(baseSchema)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema
        override def toBatch: Batch = throw new IllegalStateException(
          s"$tableName is the streaming change feed (BATCH_READ is not " +
            "declared, so this is defensive); point-in-time batch diffs " +
            "are served by CommitLog.changesBetween")
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new GraftChangeFeedStream(spark, tableName, root, schema, options, renames)
      }
    }
}

private[graft] object GraftChangesTable {
  val ChangeType = "_change_type"
  val CommitVersion = "_commit_version"

  def cdfSchema(base: StructType): StructType =
    // all-nullable: the feed NULL-fills columns a pre-evolution version
    // never had, so no data column may claim non-null through the feed
    StructType(base.fields.map(_.copy(nullable = true)))
      .add(ChangeType, StringType).add(CommitVersion, LongType)
}

/** Micro-batch stream behind [[GraftChangesTable]]. Offset bookkeeping
  * (version offsets, Trigger.AvailableNow head pinning, commit-count
  * admission control) mirrors [[GraftMicroBatchStream]]; only the
  * per-range row derivation differs: added-files-only there, full
  * per-version [[CommitLog.changesBetween]] diffs here.
  */
private[graft] final class GraftChangeFeedStream(
    spark: SparkSession,
    tableName: String,
    root: String,
    schema: StructType,
    options: CaseInsensitiveStringMap,
    renames: Map[String, String] = Map.empty)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val log = new CommitLog(spark, root)
  private val ownRoot = log.tableQualifiedRoot
  private val stageRoot = new Path(root, "_cdf")

  private val maxCommitsPerTrigger: Option[Long] =
    Option(options.get("maxcommitspertrigger")).map { s =>
      val n = s.toLong
      require(n > 0, s"maxCommitsPerTrigger must be positive, got $n")
      n
    }

  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(log.currentVersion.getOrElse(0L))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val head0 = log.currentVersion.getOrElse(0L)
    val head = availableNowCap.fold(head0)(math.min(head0, _))
    val s = versionOf(start)
    GraftVersionOffset(maxCommitsPerTrigger.fold(head)(n => math.min(head, s + n)), ownRoot)
  }

  override def reportLatestOffset(): Offset =
    GraftVersionOffset(log.currentVersion.getOrElse(0L), ownRoot)

  override def initialOffset(): Offset = GraftVersionOffset(0L, ownRoot)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-controlled path")

  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset.parse(json, log)

  private def versionOf(o: Offset): Long = o match {
    case GraftVersionOffset(v, _) => v
    // checkpointed SerializedOffset: same parse (incl. translation) path
    case other => GraftVersionOffset.parse(other.json, log).v
  }

  /** The tagged rows version `v` changed: the full snapshot as inserts
    * for the initial commit, the (v−1, v] manifest diff otherwise.
    */
  private def changesAt(v: Long): DataFrame = {
    val tagged =
      if (v <= 1L)
        log.readVersion(v)
          .withColumn(GraftChangesTable.ChangeType, lit("insert"))
      else log.changesBetween(v - 1, v)
    // renamed tables: the pool carries PHYSICAL names; the feed's
    // contract (like every table read) is LOGICAL names
    val relabeled = renames.foldLeft(tagged) { case (df, (logical, physical)) =>
      if (df.columns.contains(physical)) df.withColumnRenamed(physical, logical)
      else df
    }
    relabeled.withColumn(GraftChangesTable.CommitVersion, lit(v))
  }

  private def fs = HadoopFs.fs(spark, root)

  /** Stage the range's rows once (atomic rename claims the dir; a racing
    * planner for the same range loses the rename and reuses the winner's
    * byte-identical files), then return the staged parquet paths.
    *
    * Schema evolution: the stream's schema is pinned at query start (a
    * DSv2 source cannot widen its output mid-query), so a version whose
    * changes carry columns BEYOND the pinned schema — the source evolved
    * after this stream started — fails LOUDLY with a restart instruction
    * instead of silently dropping the new column (the non-append-tail
    * precedent, [[GraftMicroBatchStream]]). On restart the schema re-pins
    * from the evolved table; versions that PRE-date the evolution then
    * read the new columns as NULL, exactly like the table's own scans.
    */
  private def stagedFiles(s: Long, e: Long): Seq[String] = {
    val f = fs
    val dir = new Path(stageRoot, s"${s}_$e")
    if (!f.exists(dir)) {
      val pinned = schema.fieldNames.toSet
      val perVersion = (s + 1 to e).map { v =>
        val df = changesAt(v)
        val extra = df.columns.filterNot(pinned)
        if (extra.nonEmpty) throw new IllegalStateException(
          s"change feed $tableName: version $v carries columns " +
            s"${extra.mkString(", ")} not in this stream's schema — the " +
            "source table's schema evolved after the stream started. " +
            "Restart the stream (same checkpoint) to pick up the widened " +
            "schema; earlier versions will read the new columns as NULL.")
        df
      }
      val unioned = perVersion.reduce(_.unionByName(_, allowMissingColumns = true))
      // align to the pinned schema: a version that pre-dates an evolution
      // (possible after the restart above re-pins wider) null-fills the
      // columns it never had
      val present = unioned.columns.toSet
      val rows = unioned.select(schema.fields.map { fd =>
        if (present(fd.name)) col(s"`${fd.name}`")
        else lit(null).cast(fd.dataType).as(fd.name)
      }.toSeq: _*)
      val tmp = new Path(stageRoot,
        s"_tmp_${s}_${e}_${java.util.UUID.randomUUID().toString.take(8)}")
      rows.write.mode("overwrite").parquet(tmp.toString)
      f.mkdirs(stageRoot)
      if (!f.rename(tmp, dir)) f.delete(tmp, true): Unit
    }
    f.listStatus(dir).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
  }

  private def parquetBatch(paths: Seq[String]): Batch =
    ParquetTable(s"$tableName-feed", spark, options, paths, Some(schema),
      classOf[ParquetFileFormat]).newScanBuilder(options).build().toBatch

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (versionOf(start), versionOf(end))
    if (e <= s) return Array.empty
    val files =
      try stagedFiles(s, e)
      catch { case ex: java.io.FileNotFoundException =>
        throw new IllegalStateException(
          s"change feed $tableName: a version in ($s, $e] is no longer " +
            "available (vacuumed?). Keep vacuum retention above the slowest " +
            "consumer's checkpoint age, or restart with a fresh checkpoint " +
            "to re-load from the current snapshot.", ex)
      }
    if (files.isEmpty) Array.empty
    else parquetBatch(files).planInputPartitions()
  }

  // staged files are flat (no hive layout) with the schema pinned above,
  // so the factory is file-list independent and built over an empty list
  override def createReaderFactory(): PartitionReaderFactory =
    parquetBatch(Seq.empty).createReaderFactory()

  /** Progress callback: ranges wholly at-or-before the committed offset
    * are never re-planned by this checkpoint, and any other consumer
    * recomputes them identically — prune their staged files.
    */
  override def commit(end: Offset): Unit = {
    val e = versionOf(end)
    val f = fs
    if (f.exists(stageRoot))
      f.listStatus(stageRoot).foreach { st =>
        st.getPath.getName.split('_') match {
          case Array(_, hi) if scala.util.Try(hi.toLong).toOption.exists(_ <= e) =>
            f.delete(st.getPath, true): Unit
          // a crashed stager's tmp dir (lost its rename or died mid-write)
          // ages out here rather than leaking forever; an hour bounds any
          // live stage at this data volume
          case parts if parts.length >= 2 && parts(1) == "tmp" &&
              st.getModificationTime <= System.currentTimeMillis() - 60L * 60 * 1000 =>
            f.delete(st.getPath, true): Unit
          case _ => ()
        }
      }
  }

  override def stop(): Unit = ()
}
