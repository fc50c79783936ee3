package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Stream offset = commit-log version, SELF-DESCRIBING: the json carries
  * the canonical root the offset was recorded against, so a checkpoint
  * re-pointed at a different table (the failover re-anchor — a consumer
  * of a lost primary resumed against its promoted replica) is DETECTED
  * and translated through [[CommitLog.translateSourceOffset]] instead of
  * silently misreading primary version numbers as local ones. Offsets
  * compare by json (the streaming Offset contract), so the rendering is
  * deterministic; plain-decimal legacy checkpoints still parse as local
  * versions of the table being read.
  */
private[graft] case class GraftVersionOffset(v: Long, root: String) extends Offset {
  override def json: String = {
    import org.json4s.JsonDSL._
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(("v" -> v) ~ ("root" -> root)))
  }
}

private[graft] object GraftVersionOffset {
  /** Parse a checkpointed offset. Plain decimal (legacy checkpoints) =
    * a version of the table being read. The object form carries its
    * root: a mismatch with `log`'s own root means the checkpoint was
    * recorded against this table's REPLICATION SOURCE — the failover
    * re-point — and the version translates (exactly, or fails loudly)
    * onto the local numbering.
    */
  def parse(json: String, log: CommitLog): GraftVersionOffset = {
    val t = json.trim
    val own = log.tableQualifiedRoot
    if (!t.startsWith("{")) GraftVersionOffset(t.toLong, own)
    else {
      val j = org.json4s.jackson.JsonMethods.parse(t)
      val v = j \ "v" match {
        case org.json4s.JInt(x)  => x.toLong
        case org.json4s.JLong(x) => x
        case _ => throw new IllegalStateException(
          s"GraftVersionOffset: unparseable checkpoint offset: $t")
      }
      j \ "root" match {
        case org.json4s.JString(r) if r != own =>
          GraftVersionOffset(log.translateSourceOffset(r, v), own)
        case _ => GraftVersionOffset(v, own)
      }
    }
  }
}

/** Micro-batch source tailing a [[CommitLog]] table: each micro-batch is
  * the pool files ADDED between two committed versions, read through
  * Spark's own vectorized parquet reader — so downstream consumers tail
  * the catalog TABLE (`spark.readStream.table("graft.db.t")`), not a raw
  * landing directory (reference topology: S3 event → process → downstream
  * consumers, cft/sourceSystem.yaml:29-63; the Delta/Iceberg streaming-
  * source shape from nothing but the manifest diff).
  *
  * Semantics:
  *  - offsets are commit versions; the checkpoint's offset log makes
  *    delivery exactly-once across restarts (a version range is planned
  *    again only if the batch never committed, and pool files are
  *    immutable, so a replayed range yields identical rows).
  *  - the FIRST batch (from version 0) is the full head snapshot — the
  *    standard initial-load-then-tail contract.
  *  - APPEND commits stream naturally. A commit that REMOVES files
  *    (replace / CoW delete / compact / optimize) or adds merge-on-read
  *    deletion vectors is not expressible as an insert-only feed: the
  *    source fails loudly, unless `ignoreChanges=true`, which emits just
  *    the added files (rewritten rows may re-emit — same contract as
  *    Delta's option of the same name). Point-in-time diffs with delete
  *    rows stay available on the batch plane via
  *    [[CommitLog.changesBetween]].
  *  - vacuum must retain versions at least as old as the slowest
  *    consumer's checkpoint, or a restart inside the dropped window fails
  *    (the lakehouse retention contract).
  *
  * Scale: planning cost is one manifest read per version endpoint —
  * O(files changed), never O(table). The per-batch read is a plain
  * parquet scan over just the added files.
  */
private[graft] final class GraftMicroBatchStream(
    spark: SparkSession,
    tableName: String,
    root: String,
    schema: StructType,
    options: CaseInsensitiveStringMap)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val log = new CommitLog(spark, root)
  private val ownRoot = log.tableQualifiedRoot
  private val dataDir = new Path(root, "data")
  private val ignoreChanges =
    Option(options.get("ignorechanges")).exists(_.toBoolean)

  /** Admission control: cap how many COMMITS one micro-batch may span.
    * On a high-commit-rate table (streaming writers land one commit per
    * batch) an uncapped catch-up batch would read the whole backlog in
    * one shot; the cap keeps batch size — and therefore executor memory
    * and retry cost — bounded, the same knob as Delta's
    * maxFilesPerTrigger but in the engine's own commit currency.
    */
  private val maxCommitsPerTrigger: Option[Long] =
    Option(options.get("maxcommitspertrigger")).map { s =>
      val n = s.toLong
      require(n > 0, s"maxCommitsPerTrigger must be positive, got $n")
      n
    }

  // Trigger.AvailableNow contract: pin the head once, drain up to it in
  // rate-limited batches, then stop — a concurrent writer's commits wait
  // for the next run instead of keeping this one alive forever
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

  /** Spark's parquet V2 scan over an explicit file list: the partition
    * planning and the vectorized reader factory both come from here —
    * nothing bespoke touches row bytes. The reader factory is file-list
    * independent (it reads whatever FilePartition it is handed), so the
    * factory instance is built over an empty list.
    */
  private def parquetBatch(paths: Seq[String]): Batch =
    ParquetTable(s"$tableName-stream", spark, options, paths, Some(schema),
      classOf[ParquetFileFormat]).newScanBuilder(options).build().toBatch

  override def initialOffset(): Offset = GraftVersionOffset(0L, ownRoot)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-controlled path")

  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset.parse(json, log)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  private def versionOf(o: Offset): Long = o match {
    case GraftVersionOffset(v, _) => v
    // checkpointed SerializedOffset: same parse (incl. translation) path
    case other => GraftVersionOffset.parse(other.json, log).v
  }

  private def manifestOf(v: Long): (Set[String], Set[String]) =
    if (v <= 0) (Set.empty, Set.empty)
    else try (log.files(v).toSet, log.dvFiles(v).toSet)
    catch { case e: java.io.FileNotFoundException =>
      throw new IllegalStateException(
        s"streaming $tableName: checkpointed version $v is no longer " +
          "available (vacuumed?). Keep vacuum retention above the slowest " +
          "consumer's checkpoint age, or restart the query with a fresh " +
          "checkpoint to re-load from the current snapshot.", e)
    }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (versionOf(start), versionOf(end))
    if (e <= s) return Array.empty
    val (before, dvBefore) = manifestOf(s)
    val (after, dvAfter) = manifestOf(e)
    if (!ignoreChanges) {
      val removed = before -- after
      if (removed.nonEmpty) throw new IllegalStateException(
        s"streaming $tableName: commits ($s, $e] removed ${removed.size} " +
          "data file(s) (replace / DELETE / compact / optimize). The graft " +
          "streaming source tails APPEND commits; stream the tagged change " +
          s"feed instead (readStream.table(\"$tableName.changes\")), set " +
          "ignoreChanges=true to receive only added files (rewritten rows " +
          "may re-emit), or consume point-in-time diffs via " +
          "CommitLog.changesBetween.")
      if ((dvAfter -- dvBefore).nonEmpty) throw new IllegalStateException(
        s"streaming $tableName: commits ($s, $e] added merge-on-read " +
          "deletion vectors, which an insert-only stream cannot express. " +
          "Stream the tagged change feed instead " +
          s"(readStream.table(\"$tableName.changes\")), fold them in " +
          "(CALL <catalog>.system.rewrite_deletes), or set " +
          "ignoreChanges=true to skip delete propagation.")
    }
    // manifest order (stable across the two reads: carried lines precede
    // appended lines) keeps planned splits deterministic for a replayed range
    if (ignoreChanges) synchronized {
      // a replace commit admitted by ignoreChanges may have CHANGED the
      // partition spec; a factory carrying the old partition schema would
      // fail or misread freshly planned FilePartitions. The header is one
      // parsed manifest read — invalidate and rebuild lazily when it moves.
      cachedFactory.foreach { case (spec, _) =>
        if (spec != log.partitionColumns(e)) cachedFactory = None
      }
    }
    plannedEnd = Some(e)
    val added = log.files(e).filterNot(before)
    if (added.isEmpty) Array.empty
    else parquetBatch(added.map(n => new Path(dataDir, n).toString))
      .planInputPartitions()
  }

  /** Batch-end version of the most recently planned batch: the factory
    * must be built against THIS snapshot, not the head — a backlogged
    * stream replaying an old range on a table whose spec later changed
    * would otherwise pair head-schema readers with old-layout splits.
    */
  @volatile private var plannedEnd: Option[Long] = None

  /** The factory's read/partition schemas come from its OWN file index,
    * so it must see a representative file set: a hive-partitioned pool
    * needs the factory to infer the same partition schema the planning
    * batch embedded in its FilePartitions (an empty list would silently
    * drop the partition columns from every row). The planned batch's
    * END-version list is that representative set (the head only before
    * any planning), and the factory is built ONCE per
    * stream, not per micro-batch: the reader factory is file-list
    * independent (it reads whatever FilePartition it is handed, with
    * types pinned by the table schema), and rebuilding it each trigger
    * would re-list O(head files) on the driver per batch — the
    * growing-table tailing cost this source exists to avoid. The spec is
    * append-stable under the default guard (non-append commits fail the
    * stream); with ignoreChanges=true, [[planInputPartitions]]
    * invalidates this cache whenever a replace commit moved the
    * #partition header, so the factory is rebuilt against the new spec.
    */
  @volatile private var cachedFactory: Option[(Seq[String], PartitionReaderFactory)] = None

  override def createReaderFactory(): PartitionReaderFactory = synchronized {
    cachedFactory match {
      case Some((_, f)) => f
      case None =>
        // build against the version the current batch was PLANNED for
        // (falling back to the head before any planning): a backlogged
        // replay across a later spec change must see the old layout
        val v = plannedEnd.orElse(log.currentVersion)
        val spec = v.map(log.partitionColumns).getOrElse(Seq.empty)
        val f = parquetBatch(v.map(log.filePaths).getOrElse(Seq.empty))
          .createReaderFactory()
        cachedFactory = Some((spec, f))
        f
    }
  }
}
