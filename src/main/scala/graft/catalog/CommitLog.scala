package graft.catalog

import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, input_file_name, lit}

/** Per-file min/max of one column, harvested from the parquet footer at
  * commit time and carried in the manifest line. Values are kept as
  * strings with a type tag so manifests stay a plain text format;
  * comparisons parse per type. Strings compare as UTF-16 `compareTo` on
  * both sides of the pruning test, so pruning is self-consistent (and
  * exact for the ASCII identifiers the registry keys actually use).
  */
private[graft] case class ColStats(tpe: String, min: String, max: String) {
  /** Could any value in [lo, hi] live in a file with these bounds? */
  def overlaps(lo: Any, hi: Any): Boolean =
    ColStats.cmp(tpe, min, hi.toString) <= 0 && ColStats.cmp(tpe, max, lo.toString) >= 0
}

private[graft] object ColStats {
  /** Typed order on the string-tagged values. */
  def cmp(tpe: String, a: String, b: String): Int = tpe match {
    case "long"   => java.lang.Long.compare(a.toLong, b.toLong)
    case "double" => java.lang.Double.compare(a.toDouble, b.toDouble)
    case _        => a.compareTo(b)
  }

  /** Row-group merge: widen `a` to also cover `b`. */
  def widen(a: ColStats, b: ColStats): ColStats = ColStats(a.tpe,
    if (cmp(a.tpe, b.min, a.min) < 0) b.min else a.min,
    if (cmp(a.tpe, b.max, a.max) > 0) b.max else a.max)
}

/** One row of [[CommitLog.history]]: a retained version's metadata. */
case class CommitInfo(version: Long, committedAtMs: Long, dataFiles: Int,
    dvFiles: Int, txnCount: Int, partitionColumns: Seq[String],
    operation: String = "")

/** One named ref of [[CommitLog.refs]]: `kind` is `"tag"` (immutable
  * pointer at a main-table version, pinned against vacuum) or
  * `"branch"` (a mutable fork whose own commit chain lives under
  * `_branches/<name>`); `version` is the tagged version (tag) or the
  * main-table fork point (branch).
  */
case class RefInfo(name: String, kind: String, version: Long)

/** One data-pool file of a version ([[CommitLog.fileDetails]]): name
  * relative to `data/` (absolute for shallow-clone references),
  * `partition` = its layout directory, bytes/rows from manifest tags
  * (None for pre-tag commits).
  */
case class FileDetail(name: String, partition: String,
    bytes: Option[Long], rows: Option[Long])

/** One declared hidden-partition transform (reference: Iceberg partition
  * transforms): rows are laid out by a DERIVED hive partition column
  * computed from `src`, and the derived column never surfaces through
  * [[CommitLog.read]]/[[CommitLog.readWhere]] — queries filter on the
  * SOURCE column and pruning happens through the transform. `kind` is
  * `year|month|day|hour` (zero-padded date renderings, so lexicographic
  * order IS chronological and range predicates prune), `bucket` (xxhash64
  * mod `arg`; equality/IN prune), or `truncate` (width-`arg` prefix /
  * floor-to-multiple; monotone, ranges prune). `srcType` is the source
  * column's DDL type — the probe side casts literals with it so probe
  * hashing/formatting matches the write side exactly.
  */
case class PartitionTransform(kind: String, src: String, srcType: String,
    arg: Long) {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.{functions => F}

  def derivedName: String = kind match {
    case "bucket" | "truncate" => s"_p_${kind}_${arg}_$src"
    case k                     => s"_p_${k}_$src"
  }

  /** Human spec form, the declaration-equality key across commits. */
  def spec: String = kind match {
    case "bucket" | "truncate" => s"$kind($arg, $src)"
    case k                     => s"$k($src)"
  }

  private def numericSrc: Boolean =
    Set("TINYINT", "SMALLINT", "INT", "BIGINT")(srcType.toUpperCase)

  /** The derived partition value of a source-column expression. */
  def derive(c: Column): Column = kind match {
    case "year"     => F.date_format(c, "yyyy")
    case "month"    => F.date_format(c, "yyyy-MM")
    case "day"      => F.date_format(c, "yyyy-MM-dd")
    case "hour"     => F.date_format(c, "yyyy-MM-dd-HH")
    case "bucket"   => F.pmod(F.xxhash64(c), F.lit(arg))
    case "truncate" =>
      if (numericSrc) c - F.pmod(c, F.lit(arg)) else F.substring(c, 1, arg.toInt)
    case other => throw new IllegalArgumentException(
      s"unknown partition transform kind '$other'")
  }

  /** Order-preserving transforms admit range pruning; bucket admits only
    * equality/IN.
    */
  def monotone: Boolean = kind != "bucket"

  /** Manifest stats type tag of the derived column. */
  def derivedTpe: String =
    if (kind == "bucket" || (kind == "truncate" && numericSrc)) "long" else "string"
}

object CommitLog {
  /** Default vacuum retention floor for committed VERSIONS (the streaming-
    * checkpoint handshake): 7 days, the common lakehouse default.
    */
  val DefaultVersionRetentionMs: Long = 7L * 24 * 60 * 60 * 1000

  /** Render a typed cutoff into the manifest-stats comparison domain
    * ([[ColStats.cmp]]): DATE → epoch-day (parquet INT32 days, tagged
    * "long"), TIMESTAMP/Instant → epoch-micros (INT64 micros), numbers
    * and strings as-is. A rendering the file's stats type cannot parse
    * demotes that file to a conservative scan — never a wrong skip.
    */
  private[catalog] def statsComparable(x: Any): String = x match {
    case d: java.sql.Date       => d.toLocalDate.toEpochDay.toString
    case d: java.time.LocalDate => d.toEpochDay.toString
    case t: java.sql.Timestamp =>
      (Math.multiplyExact(Math.floorDiv(t.getTime, 1000L), 1000000L) +
        t.getNanos / 1000).toString
    case i: java.time.Instant =>
      (Math.multiplyExact(i.getEpochSecond, 1000000L) + i.getNano / 1000).toString
    case other => String.valueOf(other)
  }

  private[catalog] def ttlHeader(column: String, retainMs: Long): String = {
    import org.json4s.JsonDSL._
    "#ttl:" + org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        ("col" -> column) ~ ("ms" -> retainMs)))
  }

  /** Per-table-root monitors serializing sidecar read-merge-write cycles
    * ([[CommitLog.setProperties]]) within this JVM, so concurrent
    * property merges on one table never lose each other's keys. (Cross-
    * process writers are covered by the temp-file + atomic-rename
    * publish — a reader can never observe a torn sidecar — and last-
    * writer-wins on the merged map, the same posture as TBLPROPERTIES
    * DDL everywhere.)
    */
  private[catalog] val sidecarLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Monitor for a table root's sidecar writes, keyed by the root's
    * normalized URI path so the CommitLog and catalog-DDL surfaces
    * contend on the same lock.
    */
  private[catalog] def sidecarLock(root: String): Object =
    sidecarLocks.computeIfAbsent(
      new org.apache.hadoop.fs.Path(root).toUri.getPath, _ => new Object)
}

/** Versioned commit log over an immutable parquet file pool — snapshot
  * isolation for the registry's concurrent CRUD with nothing but plain
  * parquet + filesystem rename (no table-format jars ship in this
  * environment, SURVEY §7.1).
  *
  * Layout under one table root:
  * {{{
  *   <root>/data/v00000003-<uuid>-part....parquet   // immutable pool
  *   <root>/_commits/00000003.manifest              // one line per live file
  *   <root>/_tmp/...                                // staging, never read
  * }}}
  *
  * The manifest IS the table: a version's manifest lists exactly the pool
  * files that make up that snapshot. Three line types: `<name>[\tstats]`
  * (a data file), `#txn:<id>` (applied-batch memory), and
  * `-<name>[\tstats]` (a merge-on-read deletion-vector file of
  * (data-file, row-position) tombstones — see [[deleteWhereMoR]]).
  * Invariants:
  *  - pool files are written once and never modified or renamed; only
  *    `vacuum` deletes them, and only when no retained version references
  *    them — so any reader that resolved a manifest keeps reading a
  *    consistent snapshot for the whole retention window, regardless of
  *    how many commits (compactions, rewrites, replications) land
  *    meanwhile. This closes the half-state window the directory-swap
  *    rewrite had (a reader that resolved file paths just before the swap
  *    read a vanishing dir).
  *  - a commit becomes visible atomically via a put-if-absent create of
  *    `_commits/NNNNNNNN.manifest` ([[LogStore]]) — readers see the old
  *    or the new version, never a torn one. The primitive is pluggable
  *    per substrate (POSIX hard-link, HDFS no-replace rename, object-
  *    store conditional PUT) because S3-class stores have NO atomic
  *    rename — and the reference's data plane is per-source S3 buckets
  *    (cft/sourceSystem.yaml:20-27), so rename-assuming commits would
  *    lose one of two racing writers on day one.
  *  - writers race on the version number optimistically: a conditional
  *    create onto an existing manifest returns false, the loser re-reads
  *    the head and retries with the next number (the reference fronts
  *    exactly this concurrent CRUD plane — three lambdas behind one API
  *    Gateway, swagger/aws-dl-fmwrk-swagger-apigateway.yaml:30,114,198).
  *
  * Scale: the manifest grows with file count, not row count; reads list
  * one small file + the named parquet footers. This is the plain-parquet
  * kernel of what Delta/Iceberg do with their logs — the upgrade path is
  * swapping this class out, not re-architecting callers.
  */
class CommitLog(spark: SparkSession, tableRoot: String) {

  /** This table's root path, exactly as constructed — the address
    * sibling tables derive from (e.g. the strict replica's `__dlq`
    * dead-letter twin, [[graft.stream.Replicate.replayDlq]]). Named
    * with the `table` prefix deliberately: a bare `root` member would
    * silently shadow caller-scope vals inside `new CommitLog(...) {}`
    * refinements (the spec seam pattern).
    */
  def tableRootPath: String = tableRoot

  /** The root as a fully-qualified URI (scheme + absolute path): the
    * canonical identity used wherever two handles to ONE table must
    * converge regardless of how each was addressed — sidecar lock keys,
    * replication-source provenance (`#reproot:`), streaming-offset
    * lineage. A relative root and its absolute spelling qualify to the
    * same string, so they share one monitor and one lineage id.
    */
  private[graft] lazy val tableQualifiedRoot: String =
    hfs.makeQualified(new Path(tableRoot)).toString

  private val hfs: FileSystem = HadoopFs.fs(spark, tableRoot)
  private val dataDir = new Path(tableRoot, "data")
  private val commitsDir = new Path(tableRoot, "_commits")
  private val tmpDir = new Path(tableRoot, "_tmp")

  /** Publication seam: put-if-absent of a complete manifest. Overridable
    * for tests; production resolution is per storage scheme (see
    * [[LogStore]] — POSIX link, HDFS rename, object-store conditional
    * put via conf).
    */
  protected def newLogStore(): LogStore = LogStore.forPath(spark, tableRoot)
  private lazy val store: LogStore = newLogStore()

  private def manifestPath(v: Long) = new Path(commitsDir, f"$v%08d.manifest")

  // strict name gate: a stray non-numeric file in _commits/ (editor swap,
  // _SUCCESS marker, half-written temp, the _head.hint pointer) must be
  // ignored, not explode every operation with NumberFormatException
  private val ManifestName = "^(\\d{8,})\\.manifest$".r

  /** Head pointer (`_last_checkpoint` analog): a tiny file naming the
    * newest version its writer published. Purely a HINT — written
    * best-effort after every successful publish, possibly stale (a
    * crash between publish and pointer write, or two racers finishing
    * out of order, leaves it pointing low, never high) — so the head is
    * recovered by probing forward from the hint, not trusted blindly.
    * This turns head discovery from an O(versions) directory listing
    * (10⁵ commits on a streaming table = 10⁵-entry LIST per read, the
    * classic growing-log bottleneck) into one small read plus
    * O(staleness) existence probes.
    */
  private val headHint = new Path(commitsDir, "_head.hint")

  /** Test seam: every metadata-plane access funnels through here
    * (`open` = manifest/hint file read, `list` = _commits listing) so
    * specs can assert the metadata cost of the read path stays O(1) in
    * version count.
    */
  protected def onMetaAccess(kind: String): Unit = ()

  private def committedVersions: Seq[Long] = {
    onMetaAccess("list")
    if (!hfs.exists(commitsDir)) Seq.empty
    else hfs.listStatus(commitsDir).toSeq.map(_.getPath.getName).collect {
      case ManifestName(d) => d.toLong
    }
  }

  private def readHeadHint(): Option[Long] =
    try {
      onMetaAccess("open")
      val in = hfs.open(headHint)
      val body = try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
        new String(out.toByteArray, StandardCharsets.UTF_8)
      } finally in.close()
      Some(body.trim.toLong)
    } catch { case _: Exception => None }

  private def writeHeadHint(v: Long): Unit =
    try LogStore.write(hfs, headHint,
      s"$v\n".getBytes(StandardCharsets.UTF_8))
    catch { case _: Exception => () }   // a lost hint only costs probes

  /** Highest committed version, if any commit exists. O(1) metadata
    * reads on the hinted path: one hint read + forward existence probes
    * from it (versions are consecutive: commits land at head+1 and
    * vacuum drops only the oldest prefix, so the first missing manifest
    * above a live one IS the frontier). Falls back to a full listing
    * when the hint is absent or points below the vacuum horizon.
    */
  def currentVersion: Option[Long] = {
    readHeadHint() match {
      case Some(h) if hfs.exists(manifestPath(h)) =>
        var v = h
        while (hfs.exists(manifestPath(v + 1))) v += 1
        Some(v)
      case _ =>
        val vs = committedVersions
        if (vs.isEmpty) None else Some(vs.max)
    }
  }

  def exists: Boolean = currentVersion.nonEmpty

  /** Raw manifest lines of a committed version: `<name>` or
    * `<name>\t<stats-json>`. The tab-separated stats suffix is optional
    * per line, so pre-stats manifests (and carried-over lines from them)
    * parse unchanged — those files are simply never pruned.
    */
  private def manifestLines(v: Long): Seq[String] = {
    if (v <= 0L) return Seq.empty
    val lines = rawManifestLines(v)
    lines.find(_.startsWith("#xtxn:")) match {
      case None => lines
      case Some(h) =>
        // a cross-table-transaction version is visible only once its
        // single decision file says commit; an aborted (or
        // reader-force-aborted) version is an empty no-op whose
        // effective content is the previous version's ([[CrossTableTxn]])
        val decisionUri = h.stripPrefix("#xtxn:").split('\t').last
        if (CrossTableTxn.resolve(spark, decisionUri))
          lines.filterNot(_.startsWith("#xtxn:"))
        else manifestLines(v - 1)
    }
  }

  /** Pin-time decision resolution ([[CrossTableTxn.pinGroup]]): reading
    * a version's effective lines forces any pending cross-table
    * decision to resolve (committed content observed, or grace-wait
    * then forced abort) — after this call the version's content is
    * immutable, which is what makes a pinned group a stable snapshot.
    */
  private[catalog] def resolveDecision(v: Long): Unit = manifestLines(v): Unit

  private def rawManifestLines(v: Long): Seq[String] = {
    onMetaAccess("open")
    val in = hfs.open(manifestPath(v))
    val body = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    body.split('\n').toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Stage `df` and publish it as a PENDING next version of a
    * cross-table transaction ([[CrossTableTxn]]): the manifest carries
    * `#xtxn:<id>\t<decisionUri>`, so the content is invisible until the
    * transaction's one decision file commits, and an aborted version
    * resolves to the previous version's content. Claims its version
    * through the ordinary optimistic head race — concurrent
    * single-table commits are never blocked and never lost.
    */
  private[graft] def publishPending(df: DataFrame, id: String,
      decisionUri: String, replace: Boolean, maxAttempts: Int = 50): Long = {
    enforceConstraints(df, checkConstraints, "xtxn")
    val newLines = stageToPool(df, "xtxn")
    var attempt = 0
    while (attempt < maxAttempts) {
      val v = currentVersion.getOrElse(0L) + 1
      val prev = currentVersion.map(manifestLines).getOrElse(Seq.empty)
      if (!replace) requireUnpartitioned("publishPending(append)", v, prev)
      val carried =
        if (replace) replaceCarriedData(prev, Some(df.schema)) else prev
      beforePublish(attempt, v)
      if (publish(v, stamped("xtxn",
        s"#xtxn:$id\t$decisionUri" +: (carried ++ newLines)))) return v
      racePause(attempt, v)
      attempt += 1
    }
    throw new java.io.IOException(
      s"publishPending: lost the version race $maxAttempts times under $tableRoot")
  }

  /** Line-type partitions of one already-read manifest — every caller
    * that needs more than one of these parses the manifest ONCE and
    * splits, keeping read-path metadata cost at one open per version.
    * (Pool names are uuid-derived and can never start with `#` or `-`,
    * so the prefixes are unambiguous.)
    */
  private def dataNamesOf(lines: Seq[String]): Seq[String] =
    lines.filterNot(l => l.startsWith("#") || l.startsWith("-"))
      .map(_.split('\t').head)
  private def dvNamesOf(lines: Seq[String]): Seq[String] =
    lines.filter(_.startsWith("-")).map(_.stripPrefix("-").split('\t').head)

  /** Data pool file names (relative to data/) of a committed version.
    * `#`-prefixed manifest lines are metadata (txn markers) and
    * `-`-prefixed lines are deletion-vector files, not data files.
    */
  def files(v: Long): Seq[String] = dataNamesOf(manifestLines(v))

  /** Deletion-vector pool file names of a committed version (`-`-prefixed
    * manifest lines). Each is a parquet file of (data-file name, row
    * position) tombstones — the merge-on-read delete tier (see
    * [[deleteWhereMoR]]).
    */
  def dvFiles(v: Long): Seq[String] = dvNamesOf(manifestLines(v))

  /** Absolute pool-file paths of a committed version — the file list a
    * V2 scan binds to (the snapshot stays immutable under later commits).
    */
  def filePaths(v: Long): Seq[String] =
    files(v).map(n => new Path(dataDir, n).toString)

  /** Per-file column statistics of a committed version (absent for files
    * committed before stats existed — they are treated as unprunable).
    */
  def fileStats(v: Long): Map[String, Map[String, ColStats]] =
    fileStatsOf(manifestLines(v))

  /** Per-file detail of a retained version — the `t.files` metadata
    * table's source. Bytes/rows come from the manifest's commit-time
    * `_b`/`_n` tags (zero filesystem calls — at 100 TB the manifest IS
    * the file listing); pre-tag lines report unknown. `partition` is
    * the file's layout directory (hive `c=v` subdirs, including the
    * hidden `_p_*` transform dirs), empty for flat pools.
    */
  def fileDetails(v: Long): Seq[FileDetail] =
    manifestLines(v).filterNot(l => l.startsWith("#") || l.startsWith("-"))
      .map { line =>
        val p = line.split('\t')
        val (rows, bytes) = if (p.length > 1) lineMeta(p(1)) else (None, None)
        FileDetail(p(0), p(0).split('/').dropRight(1).mkString("/"), bytes, rows)
      }

  private def fileStatsOf(lines: Seq[String]): Map[String, Map[String, ColStats]] =
    lines.filterNot(l => l.startsWith("#") || l.startsWith("-"))
      .flatMap { line =>
      line.split('\t') match {
        case Array(name, json) => Some(name -> parseStats(json))
        case _                 => None
      }
    }.toMap

  /** Partition columns recorded in a version's manifest (`#partition:`
    * header, JSON array), empty for unpartitioned versions. Hive-style
    * layout: data files live under `data/<c1>=<v1>/<c2>=<v2>/...`, the
    * manifest names carry the subdirs, and each partition value rides
    * the file's stats as an exact (min=max) bound — so [[readWhere]]
    * prunes on partition columns through the SAME conjunctive test as
    * footer stats, exactly, before any footer is consulted. This is the
    * manifest analog of the reference's `<asset>/<batch>/init/` landing
    * layout (cft/sourceSystem.yaml:77).
    */
  def partitionColumns(v: Long): Seq[String] = partitionColsOf(manifestLines(v))

  private def partitionColsOf(lines: Seq[String]): Seq[String] =
    lines.find(_.startsWith("#partition:")).map { l =>
      org.json4s.jackson.JsonMethods.parse(l.stripPrefix("#partition:")) match {
        case org.json4s.JArray(vs) => vs.collect { case org.json4s.JString(s) => s }
        case _ => Seq.empty
      }
    }.getOrElse(Seq.empty)

  /** Leaf file name (pool names carry partition subdirs; leaves are
    * uuid-derived and globally unique, so leaf-keyed matching — what the
    * DV tombstones and `input_file_name` discovery produce — stays exact).
    */
  private def leafOf(n: String): String = n.split('/').last

  /** Transaction ids recorded in a version's manifest (`#txn:` header
    * lines). A txn id committed WITH its data is the exactly-once seam
    * for at-least-once writers (foreachBatch redelivery): either the
    * commit landed — and its id is visible — or neither did. Ids are
    * carried forward by every commit (append carries raw lines; replace
    * re-adds the headers), so "was this batch applied" survives
    * compaction and rewrites for the table's lifetime.
    */
  def txns(v: Long): Set[String] =
    manifestLines(v).filter(_.startsWith("#txn:"))
      .map(_.stripPrefix("#txn:")).toSet

  // ---- CHECK constraints ---------------------------------------------------

  /** CHECK constraints in force at a version (`#check:` header: compact
    * JSON object, name -> SQL boolean expression). Constraints are table
    * METADATA, not data: appends carry the header forward with the raw
    * lines, and every replace/compaction/rewrite re-adds it alongside the
    * `#txn:` memory ([[replaceCarried]]). RESTORE reverts the set with
    * the rest of the restored version's manifest — the rollback target's
    * constraints are what its data was admitted under. Grounding: the
    * reference gates every write behind gateway request validation
    * (swagger:26-27 validator, SURVEY.md §2.1 R12); this is the
    * lakehouse-native form — declared once, enforced on the write path.
    */
  def checkConstraints(v: Long): Map[String, String] = checkOf(manifestLines(v))

  /** Head constraints; empty for an uncommitted table. */
  def checkConstraints: Map[String, String] =
    currentVersion.map(checkConstraints).getOrElse(Map.empty)

  private def checkOf(lines: Seq[String]): Map[String, String] =
    lines.find(_.startsWith("#check:")).map { l =>
      org.json4s.jackson.JsonMethods.parse(l.stripPrefix("#check:")) match {
        case org.json4s.JObject(fs) =>
          fs.collect { case (k, org.json4s.JString(s)) => k -> s }.toMap
        case _ => Map.empty[String, String]
      }
    }.getOrElse(Map.empty)

  private def checkHeader(cs: Map[String, String]): String =
    "#check:" + org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        org.json4s.JObject(cs.toList.sortBy(_._1).map {
          case (k, s) => k -> org.json4s.JString(s) })))

  // ---- evolved schema of record ---------------------------------------------

  /** Schema of record after a schema-evolving commit (`#schema:` header:
    * compact Spark schema JSON), written by merge / mergeMoR /
    * applyChangesMoR with `evolve = true`. Manifest-carried so it
    * composes with the whole temporal plane for free: RESTORE to a
    * pre-evolution version reverts the schema with the data, time travel
    * and branches pin it, shallow clones and replicas receive it with
    * the manifest, and replaces/compactions carry it
    * ([[replaceCarried]]). Absent on tables that never evolved — the
    * overwhelmingly common case pays zero read overhead. Consumers:
    * [[graft.catalog.GraftTable.schema]] widens the declared sidecar
    * schema with these columns so the SQL surface (INSERT, MERGE, the
    * `.changes` feed's pinned schema) sees the evolution a library-level
    * evolve performed.
    */
  def evolvedSchemaAt(v: Long): Option[org.apache.spark.sql.types.StructType] =
    schemaOf(manifestLines(v))

  def evolvedSchema: Option[org.apache.spark.sql.types.StructType] =
    currentVersion.flatMap(evolvedSchemaAt)

  private def schemaOf(lines: Seq[String]): Option[org.apache.spark.sql.types.StructType] =
    lines.find(_.startsWith("#schema:")).map(l =>
      org.apache.spark.sql.types.DataType.fromJson(l.stripPrefix("#schema:"))
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  /** Replace any prior `#schema:` header with the post-evolution schema:
    * the pre-evolution columns in their existing order (from the current
    * schema of record, falling back to the data schema for headerless
    * tables) plus the batch's new columns with the batch's types.
    *
    * The header records the USER-level schema: a transform table's data
    * files store the derived `_p_*` layout columns, so the headerless
    * fall-back schema must shed them — a header that recorded a hidden
    * column would EXPOSE it through `GraftTable.schema` (the SQL
    * surface appends evolved-header extras to the declared sidecar) and
    * through the change feed's pinned schema, breaking the
    * hidden-partition contract every other read surface keeps.
    */
  private def evolveHeader(lines: Seq[String], curDataSchema: => org.apache.spark.sql.types.StructType,
      newCols: Seq[String], batch: DataFrame): Seq[String] = {
    if (newCols.isEmpty) lines
    else {
      val hidden = transformsFor(lines).map(_.derivedName).toSet
      val cur0 = schemaOf(lines).getOrElse(curDataSchema)
      val cur = org.apache.spark.sql.types.StructType(
        cur0.fields.filterNot(f => hidden(f.name)))
      val add = newCols.filterNot(cur.fieldNames.contains)
      if (add.isEmpty) lines
      else {
        // a widened column is NULLABLE by definition regardless of the
        // batch's own nullability: every pre-evolution row reads it as
        // NULL (recording non-null would NPE writers that NULL-fill old
        // versions against the evolved schema — e.g. the change feed)
        val widened = org.apache.spark.sql.types.StructType(
          cur.fields ++ add.map(n => batch.schema(n).copy(nullable = true)))
        lines.filterNot(_.startsWith("#schema:")) :+ ("#schema:" + widened.json)
      }
    }
  }

  /** Align an incoming batch's EXISTING columns to the table's recorded
    * types: a narrower-but-losslessly-castable column (an int batch into
    * a long table) upcasts silently; anything else fails LOUDLY. Without
    * this, the name-only schema gate lets a type-drifted batch through,
    * union coercion rewrites the touched files at the coerced type while
    * carried files keep the old one — and the next mergeSchema read of
    * the mixed pool CRASHES (int32 and int64 footers cannot merge): a
    * silently-corrupted-table class of bug. A batch that truly needs a
    * WIDER type goes through ALTER COLUMN TYPE first (the `_widen`
    * plane, q_type_widen) — widening is a table decision, never a merge
    * side effect. Evolution columns (absent from the table) keep the
    * batch's type.
    */
  private def alignTypes(updates: DataFrame,
      tableSchema: org.apache.spark.sql.types.StructType, op: String): DataFrame = {
    val byName = tableSchema.map(f => f.name -> f.dataType).toMap
    var changed = false
    val aligned = updates.schema.fields.map { f =>
      byName.get(f.name) match {
        case Some(t) if t != f.dataType =>
          if (org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(f.dataType, t)) {
            changed = true
            col(s"`${f.name}`").cast(t).as(f.name)
          } else throw new IllegalArgumentException(
            s"$op: column ${f.name} arrives as ${f.dataType.sql} but the " +
              s"table records ${t.sql}; widen the table first (ALTER TABLE " +
              "... ALTER COLUMN ... TYPE) — a merge must not change an " +
              "existing column's type as a side effect")
        case _ => col(s"`${f.name}`")
      }
    }
    if (changed) updates.select(aligned.toSeq: _*) else updates
  }

  /** Headers that must outlive a replace/compaction: applied-batch
    * memory (`#txn:`), declared CHECK constraints (`#check:`), the
    * declared clustering spec (`#cluster:`), the failover generation
    * (`#gen:` — losing it would make a once-promoted table's next
    * publish bounce off its own old fence), and the transform
    * partition spec of record (`#ptspec:`). The ptspec carry keeps the
    * spec of record IN THE MANIFEST across maintenance replaces
    * (compact's tombstoned fold, optimize, fast-forward): dropping it
    * would demote the spec back to the write-behind `_ptspec.json`
    * sidecar, re-opening the crash window the header closes (a
    * transform REPLACE whose sidecar write crashed leaves the OLD spec
    * in the sidecar — a later compact must not resurrect it). A
    * transform replace that DECLARES a new spec supersedes the carried
    * line via `extraHeader` ([[commitTransformed]]); the `#partition:`
    * raw-layout header is intentionally NOT carried — each replace
    * re-declares its own physical layout. Everything else (cursors,
    * clone provenance) is re-derived or re-declared by the rewriting
    * operation itself.
    */
  private def replaceCarried(prev: Seq[String]): Seq[String] =
    prev.filter(l => l.startsWith("#txn:") || l.startsWith("#check:") ||
      l.startsWith("#cluster:") || l.startsWith("#ptspec:") ||
      l.startsWith("#ttl:") || l.startsWith("#schema:") ||
      l.startsWith("#gen:"))

  /** [[replaceCarried]] for replaces that REDEFINE the table's content
    * outright (INSERT OVERWRITE / `commit(replace=true)` / a replace
    * import / a Complete-mode streaming epoch): the evolved `#schema:`
    * header of record survives only while the replacement batch still
    * matches its name→type map — Delta's `overwriteSchema` posture. A
    * replacement with a different column set makes the DATA the schema
    * of record again; carrying the stale header would resurrect dropped
    * evolved columns as phantom NULLs and hide the replacement's
    * genuinely new columns at plan time. Maintenance replaces (compact's
    * fold, optimize, fast-forward, the row-level-op CoW rewrite) preserve
    * shape by construction — their rewrites emit the evolved schema — and
    * keep carrying unconditionally via [[replaceCarried]]. `newSchema` is
    * by-name and consulted ONLY when an evolved header exists, so
    * file-based callers pay a footer read only on the rare evolved-table
    * replace; `None` (schema unknowable — e.g. truncate-to-empty) carries
    * conservatively.
    */
  private def replaceCarriedData(prev: Seq[String],
      newSchema: => Option[org.apache.spark.sql.types.StructType]): Seq[String] = {
    val base = replaceCarried(prev)
    schemaOf(base) match {
      case Some(rec) =>
        // compare USER-level shapes: on a transform table both the
        // batch AND the recorded schema (widened from a data schema
        // that stores the layout) can carry hidden layout columns —
        // excluded on both sides, or every same-shape transform
        // overwrite would spuriously drop the header. The hidden set is
        // the table's ACTUAL derived-column names (same source as
        // evolveHeader), never a name-prefix heuristic: a genuine user
        // column that happens to be named `_p_*` must stay visible to
        // drift detection.
        val hidden = transformsFor(prev).map(_.derivedName).toSet
        def userShape(s: org.apache.spark.sql.types.StructType) =
          s.fields.filterNot(f => hidden(f.name))
            .map(f => f.name -> f.dataType).toMap
        val sameShape = newSchema.forall(ns => userShape(rec) == userShape(ns))
        if (sameShape) base else base.filterNot(_.startsWith("#schema:"))
      case None => base
    }
  }

  // ---- operation tags ------------------------------------------------------

  /** What operation published a version (`#op:` header), empty for
    * manifests that predate the tag. Inert to every reader — pure
    * DESCRIBE HISTORY provenance.
    */
  def operation(v: Long): String = opOf(manifestLines(v)).getOrElse("")

  private def opOf(lines: Seq[String]): Option[String] =
    lines.find(_.startsWith("#op:")).map(_.stripPrefix("#op:"))

  /** Tag a manifest-to-publish with its operation, dropping any stale
    * tag carried from the previous version (each `#op:` describes ITS
    * commit only).
    */
  private def stamped(op: String, lines: Seq[String]): Seq[String] =
    s"#op:$op" +: lines.filterNot(_.startsWith("#op:"))

  // ---- declared clustering -------------------------------------------------

  /** Clustering columns declared at a version (`#cluster:` header, JSON
    * array). Clustering is a LAYOUT hint, not semantics: when declared,
    * every data-writing path range-partitions + sorts incoming batches
    * on these columns before staging, so each pool file carries a tight,
    * pairwise-disjoint footer min/max range and every future range/point
    * read prunes to O(matching files) — the liquid-clustering posture:
    * declared once on the table, honored by writes and maintenance, no
    * manual `optimizeBy` needed to keep layout. Values are never
    * affected; a batch missing a clustering column stages unsorted
    * (conservative, still correct).
    */
  def clusteringColumns(v: Long): Seq[String] = clusterOf(manifestLines(v))

  /** Head clustering spec; empty for an uncommitted or undeclared table. */
  def clusteringColumns: Seq[String] =
    currentVersion.map(clusteringColumns).getOrElse(Seq.empty)

  private def clusterOf(lines: Seq[String]): Seq[String] =
    lines.find(_.startsWith("#cluster:")).map { l =>
      org.json4s.jackson.JsonMethods.parse(l.stripPrefix("#cluster:")) match {
        case org.json4s.JArray(vs) =>
          vs.collect { case org.json4s.JString(s) => s }
        case _ => Seq.empty[String]
      }
    }.getOrElse(Seq.empty)

  private def clusterHeader(cols: Seq[String]): String =
    "#cluster:" + org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        org.json4s.JArray(cols.toList.map(org.json4s.JString(_)))))

  /** Declare (or with `Seq.empty` clear) the table's clustering columns:
    * a metadata-only commit publishing the `#cluster:` header. Legal on
    * a table with NO commits yet (publishes a header-only v1), so the
    * layout contract can be in force from the very first data commit.
    * Existing files are NOT rewritten — `compact()`/`optimize` converge
    * them; new writes cluster immediately.
    */
  def setClustering(cols: Seq[String]): Long = {
    require(cols.distinct == cols, s"setClustering: duplicate columns in $cols")
    var attempt = 0
    while (attempt < 50) {
      val vOpt = currentVersion
      val prev = vOpt.map(manifestLines).getOrElse(Seq.empty)
      val partCols = partitionColsOf(prev)
      val overlap = cols.filter(partCols.contains)
      require(overlap.isEmpty,
        s"setClustering: $overlap are partition columns — constant within " +
          "every file already, clustering them is a no-op by construction")
      if (cols.nonEmpty && dataNamesOf(prev).nonEmpty) {
        val have = readVersion(vOpt.get).columns.toSet
        val missing = cols.filterNot(have)
        require(missing.isEmpty,
          s"setClustering: unknown column(s) $missing (have: ${have.toSeq.sorted})")
      }
      val v = vOpt.getOrElse(0L)
      hfs.mkdirs(commitsDir)
      val lines = prev.filterNot(_.startsWith("#cluster:"))
      val manifest = if (cols.isEmpty) lines else clusterHeader(cols) +: lines
      beforePublish(attempt, v + 1)
      if (publish(v + 1, stamped("set_clustering", manifest))) return v + 1
      racePause(attempt, v + 1)
      attempt += 1
    }
    throw new java.io.IOException(
      s"setClustering: lost the version race 50 times under $tableRoot")
  }

  /** Apply the declared clustering layout to an outgoing batch: range-
    * repartition on (partition cols ++ clustering cols) — disjoint
    * ranges across tasks by construction — then sort within each task,
    * so hive partition splitting keeps per-file clustering-column runs
    * contiguous and footer bounds tight. A batch missing any clustering
    * column (schema evolution) stages as-is: layout is best-effort,
    * correctness never depends on it.
    */
  private def clustered(df: DataFrame, partCols: Seq[String] = Seq.empty,
      numParts: Option[Int] = None): DataFrame = {
    val declared = clusteringColumns
    val have = df.columns.toSet
    if (declared.isEmpty || !declared.forall(have)) return df
    val keys = (partCols.filter(have) ++ declared).map(col)
    // default: UNPINNED range shuffle, so AQE sizes the output files to
    // the batch (a small append → few files, a bulk load → many) — the
    // small-file-hygiene behavior a 100 TB table wants. A pinned count
    // (spark.graft.clusteredWrite.partitions, or the caller's explicit
    // nOut in compact) bypasses AQE coalescing for callers that need a
    // deterministic file fan-out.
    val pinned = numParts.orElse {
      val c = spark.conf.get("spark.graft.clusteredWrite.partitions", "0").toInt
      if (c > 0) Some(c) else None
    }
    val ranged = pinned match {
      case Some(n) => df.repartitionByRange(n, keys: _*)
      case None    => df.repartitionByRange(keys: _*)
    }
    ranged.sortWithinPartitions(keys: _*)
  }

  /** Declare a CHECK constraint: existing data must already satisfy it
    * (one pushed-down scan of the head snapshot), then a metadata-only
    * commit publishes the updated `#check:` header atomically with the
    * unchanged content lines — so the constraint and the proof that the
    * table meets it land together or not at all. From then on every
    * write path validates O(batch) — incoming rows only, never the
    * table. Violation = the expression evaluates to FALSE; NULL passes
    * (SQL-standard CHECK, so `c > 0` admits NULL rows — declare
    * `c IS NOT NULL` separately to reject them). Losing a head race
    * re-validates against the new head, so a row appended mid-call is
    * never grandfathered in unchecked.
    */
  def addConstraint(name: String, exprSql: String): Long = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"addConstraint: bad constraint name '$name'")
    spark.sessionState.sqlParser.parseExpression(exprSql) // fail-fast syntax
    var attempt = 0
    while (attempt < 50) {
      // legal on a table with NO commits yet (header-only v1) — the SQL
      // front door declares constraints right after CREATE TABLE, before
      // the first byte lands
      val vOpt = currentVersion
      val prev = vOpt.map(manifestLines).getOrElse(Seq.empty)
      val existing = checkOf(prev)
      require(!existing.contains(name),
        s"addConstraint: constraint '$name' already exists " +
          s"(${existing(name)}) — drop it first to redefine")
      if (dataNamesOf(prev).nonEmpty) {
        val bad = readVersion(vOpt.get).filter(violates(exprSql)).count()
        if (bad > 0) throw new IllegalStateException(
          s"addConstraint: $bad existing row(s) violate '$name' ($exprSql) " +
            s"under $tableRoot")
      }
      val v = vOpt.getOrElse(0L)
      hfs.mkdirs(commitsDir)
      val lines = prev.filterNot(_.startsWith("#check:"))
      beforePublish(attempt, v + 1)
      if (publish(v + 1, stamped("add_constraint",
          checkHeader(existing + (name -> exprSql)) +: lines)))
        return v + 1
      racePause(attempt, v + 1)
      attempt += 1
    }
    throw new java.io.IOException(
      s"addConstraint: lost the version race 50 times under $tableRoot")
  }

  /** Remove a declared constraint (metadata-only commit; loud on an
    * unknown name — silently "dropping" a typo would leave the real
    * constraint enforcing).
    */
  def dropConstraint(name: String): Long = {
    var attempt = 0
    while (attempt < 50) {
      val v = currentVersion.getOrElse(throw new java.io.FileNotFoundException(
        s"dropConstraint: no committed version under $tableRoot"))
      val existing = checkConstraints(v)
      require(existing.contains(name),
        s"dropConstraint: no constraint named '$name' " +
          s"(have: ${existing.keys.toSeq.sorted.mkString(", ")})")
      val rest = existing - name
      val lines = manifestLines(v).filterNot(_.startsWith("#check:"))
      val manifest = if (rest.isEmpty) lines else checkHeader(rest) +: lines
      beforePublish(attempt, v + 1)
      if (publish(v + 1, stamped("drop_constraint", manifest))) return v + 1
      racePause(attempt, v + 1)
      attempt += 1
    }
    throw new java.io.IOException(
      s"dropConstraint: lost the version race 50 times under $tableRoot")
  }

  /** Violation predicate: NOT coalesce(expr, TRUE) — FALSE rows only. */
  private def violates(exprSql: String): org.apache.spark.sql.Column =
    !org.apache.spark.sql.functions.coalesce(
      org.apache.spark.sql.functions.expr(exprSql).cast("boolean"), lit(true))

  /** Reject `df` when any row violates a constraint in `cs`. One
    * aggregate pass counts violations for EVERY constraint (the error
    * names them all, not just the first); the 3-row sample is gathered
    * only on the failure path. Columns the batch lacks (schema-evolution
    * appends) are padded as typed NULLs from the head schema before
    * evaluation — NULL passes, matching what the padded rows will read
    * back as. O(batch), never O(table), and zero cost when the table
    * declares no constraints.
    */
  private def enforceConstraints(df: DataFrame, cs: Map[String, String],
      op: String): Unit = {
    if (cs.isEmpty) return
    import org.apache.spark.sql.functions.{sum, when}
    val have = df.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val padded = currentVersion.map(readVersion(_).schema.fields.toSeq)
      .getOrElse(Seq.empty)
      .filterNot(f => have(f.name.toLowerCase(java.util.Locale.ROOT)))
      .foldLeft(df)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))
    val named = cs.toSeq.sortBy(_._1)
    val aggs = named.map { case (_, e) =>
      sum(when(violates(e), 1L).otherwise(0L)) }
    val counts = padded.agg(aggs.head, aggs.tail: _*).head()
    val broken = named.zipWithIndex.collect {
      case ((n, e), i) if !counts.isNullAt(i) && counts.getLong(i) > 0 =>
        (n, e, counts.getLong(i))
    }
    if (broken.nonEmpty) {
      val (_, firstExpr, _) = broken.head
      val sample = padded.filter(violates(firstExpr)).limit(3).collect()
        .mkString("; ")
      throw new IllegalStateException(
        s"$op: CHECK constraint violation — " +
          broken.map { case (n, e, c) => s"'$n' ($e): $c row(s)" }
            .mkString(", ") + s"; sample [$sample]")
    }
  }

  /** File-path twin of [[enforceConstraints]] for the staged/pooled
    * write paths (SQL row-level rewrites, streaming epochs): reads the
    * about-to-be-committed parquet once — and only when the table
    * declares constraints at all.
    */
  private def enforceConstraintsOnPaths(paths: Seq[Path],
      cs: Map[String, String], op: String): Unit = {
    if (cs.isEmpty || paths.isEmpty) return
    enforceConstraints(
      spark.read.option("mergeSchema", "true")
        .parquet(paths.map(_.toString): _*),
      cs, op)
  }

  // ---- footer statistics -------------------------------------------------

  /** Row count + min/max per top-level column, merged across the file's
    * row groups, straight from the parquet footer — no data pages are
    * read, so the cost is O(columns), not O(rows). A column whose stats
    * are missing in ANY row group is dropped (conservative: the file
    * stays a candidate for every predicate on that column).
    */
  private def footerInfo(p: Path): (Long, Map[String, ColStats]) = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, hfs.getConf))
    try {
      val rowCount = reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
      val acc = scala.collection.mutable.Map.empty[String, ColStats]
      val bad = scala.collection.mutable.Set.empty[String]
      for (b <- reader.getFooter.getBlocks.asScala;
           c <- b.getColumns.asScala if c.getPath.size == 1) {
        val name = c.getPath.toDotString
        val st = c.getStatistics
        if (st == null || st.isEmpty || !st.hasNonNullValue) bad += name
        else {
          val prim = c.getPrimitiveType
          val tagged: Option[ColStats] = prim.getPrimitiveTypeName match {
            case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 =>
              Some(ColStats("long", st.genericGetMin.toString, st.genericGetMax.toString))
            case PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE =>
              Some(ColStats("double", st.genericGetMin.toString, st.genericGetMax.toString))
            case PrimitiveTypeName.BINARY
                if prim.getLogicalTypeAnnotation ==
                  org.apache.parquet.schema.LogicalTypeAnnotation.stringType() =>
              Some(ColStats("string",
                st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary]
                  .toStringUsingUTF8,
                st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary]
                  .toStringUsingUTF8))
            case _ => None
          }
          tagged match {
            case None => bad += name
            case Some(cs) =>
              acc(name) = acc.get(name).fold(cs)(ColStats.widen(_, cs))
          }
        }
      }
      (rowCount, (acc -- bad).toMap)
    } finally reader.close()
  }

  /** Snapshot read of the current version: the returned DataFrame is bound
    * to that version's immutable pool files, so later commits (or a
    * concurrent compact/replicate) cannot change or tear what it reads.
    */
  def read(): DataFrame = {
    val v = currentVersion.getOrElse(
      throw new java.io.FileNotFoundException(s"no committed version under $tableRoot"))
    val lines = manifestLines(v)   // ONE manifest read serves rows,
    val df = readLines(lines)      // dv names, AND the transform spec
    // hidden-partition transforms: the derived `_p_*` layout columns are
    // internal — the public snapshot never shows them
    val hidden = transformsFor(lines).map(_.derivedName).filter(df.columns.contains)
    if (hidden.isEmpty) df else df.drop(hidden: _*)
  }

  def readVersion(v: Long): DataFrame = readLines(manifestLines(v))

  private def readLines(lines: Seq[String]): DataFrame = {
    val names = dataNamesOf(lines)
    if (names.isEmpty) {
      // a rewrite can legally commit an empty table (e.g. delete-all);
      // an empty-schema frame is the only honest value without a stored schema
      spark.emptyDataFrame
    } else readFiles(names, dvFrameOf(dvNamesOf(lines)), partTypesOf(lines))
  }

  // ---- merge-on-read deletion vectors ------------------------------------

  /** Tombstone schema: which row of which data pool file is deleted.
    * Positions are the file source's `_metadata.row_index` — stable for
    * an immutable parquet file regardless of split planning, which is
    * exactly the invariant the pool guarantees (files are written once,
    * never modified; only vacuum deletes them).
    */
  private val DvKeys = Seq("_graft_del_file", "_graft_del_pos")

  /** Union of a version's deletion-vector files, or None when the
    * version carries no tombstones (the fast path: reads stay the plain
    * parquet scan, zero overhead).
    */
  private def dvFrame(v: Long): Option[DataFrame] = dvFrameOf(dvFiles(v))

  private def dvFrameOf(names: Seq[String]): Option[DataFrame] =
    if (names.isEmpty) None
    else Some(spark.read.parquet(names.map(n => new Path(dataDir, n).toString): _*)
      .select(DvKeys.map(col): _*))

  /** Manifest names are dataDir-relative, EXCEPT shallow-clone lines,
    * which are absolute references into the source's pool
    * ([[cloneFrom]]); `Path(dataDir, n)` resolves both.
    */
  private def isAbsoluteName(n: String): Boolean =
    n.startsWith("/") || n.contains("://")

  /** Parquet reader for pool files: basePath (hive partition-column
    * rehydration) only when every name is dataDir-relative — an
    * absolute shallow-clone reference lives outside this table's root,
    * where a basePath that is not an ancestor is a hard error (clones
    * are always unpartitioned, so basePath is a no-op for them anyway).
    */
  /** Physical read schema for a type-WIDENED table (`_widen.json` marker
    * beside the log, written by ALTER COLUMN ... TYPE): old files keep
    * their narrow physical types, so a merged-schema read would die on
    * the int-vs-bigint conflict. Passing the declared schema explicitly
    * lets the parquet readers promote per file (int32→int64,
    * float→double, decimal widening — native in both the vectorized and
    * row-based readers). None on never-widened tables: their reads stay
    * byte-identical to the historical mergeSchema path.
    */
  private def widenedReadSchema: Option[org.apache.spark.sql.types.StructType] =
    try {
      if (!hfs.exists(new Path(tableRoot, "_widen.json"))) None
      else {
        val sf = new Path(tableRoot, "_schema.json")
        if (!hfs.exists(sf)) None
        else {
          val in = hfs.open(sf)
          val body = try {
            val out = new java.io.ByteArrayOutputStream()
            org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
            new String(out.toByteArray, StandardCharsets.UTF_8)
          } finally in.close()
          Some(ColumnMapping.physicalSchema(
            org.apache.spark.sql.types.DataType.fromJson(body)
              .asInstanceOf[org.apache.spark.sql.types.StructType]))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  private def poolReader(names: Seq[String]): org.apache.spark.sql.DataFrameReader = {
    val r = widenedReadSchema match {
      case Some(s) => spark.read.schema(s)
      case None    => spark.read.option("mergeSchema", "true")
    }
    if (names.exists(isAbsoluteName)) r else r.option("basePath", dataDir.toString)
  }

  /** Data-file read annotated with tombstone join keys: each row carries
    * its pool file LEAF name and its stable row position within that
    * file (leaves are uuid-unique across partition subdirs).
    */
  private def withPos(names: Seq[String]): DataFrame =
    poolReader(names)
      .parquet(names.map(n => new Path(dataDir, n).toString): _*)
      .select(col("*"),
        org.apache.spark.sql.functions.substring_index(
          col("_metadata.file_path"), "/", -1).as(DvKeys.head),
        col("_metadata.row_index").as(DvKeys.last))

  /** Stats-tag type per partition column of a manifest (long / double /
    * string), harvested from the first file line carrying a bound for
    * it. Read-side partition columns are CAST to these types: Spark's
    * path-based partition type inference would otherwise make the
    * column's type depend on WHICH files survive pruning — a digit-only
    * string value set infers as int unless a non-numeric sibling happens
    * to be in the read set, so the same table could read string in one
    * query and int in the next (and a pruned range read would silently
    * drop rows the lexical row filter should keep).
    */
  private def partTypesOf(lines: Seq[String]): Map[String, String] = {
    val cols = partitionColsOf(lines)
    if (cols.isEmpty) Map.empty
    else {
      val stats = fileStatsOf(lines)
      cols.map { c =>
        // legacy manifests (pre schema-typed bounds) tagged each file by
        // the VALUE's lexical shape, so one column can carry mixed tags
        // ("2" → long beside "abc" → string). Any disagreement means the
        // column cannot be numeric: resolve to string, never first-wins —
        // a bigint cast would silently NULL the non-numeric partitions.
        val tags = stats.valuesIterator.flatMap(_.get(c).map(_.tpe)).toSet
        c -> (if (tags.size == 1) tags.head else "string")
      }.toMap
    }
  }

  private def castParts(df: DataFrame, partTypes: Map[String, String]): DataFrame =
    partTypes.foldLeft(df) { case (d, (c, t)) =>
      if (!d.columns.contains(c)) d
      else d.withColumn(c, col(c).cast(t match {
        case "long" => "bigint"; case "double" => "double"; case _ => "string"
      }))
    }

  /** Read `names` with tombstones applied: an ANTI JOIN on (file,
    * position) against the deletion vectors. The DV side is parquet-
    * backed and small by the MoR premise (tombstones, not data), so
    * Spark's size estimate broadcasts it and the scan stays one
    * shuffle-free codegen'd pass; stale tombstones referencing files no
    * longer in `names` simply match nothing. No DVs = the plain scan.
    */
  private def readFiles(names: Seq[String], dv: Option[DataFrame],
      partTypes: Map[String, String] = Map.empty): DataFrame = {
    val base = dv match {
      case None => poolReader(names)
        .parquet(names.map(n => new Path(dataDir, n).toString): _*)
      case Some(d) =>
        val dataCols = poolReader(names)
          .parquet(names.map(n => new Path(dataDir, n).toString): _*).columns.toSeq
        withPos(names).join(d, DvKeys, "left_anti")
          .select(dataCols.map(col): _*)
    }
    castParts(base, partTypes)
  }

  /** Commit `df` as the next version. `replace=false` appends: the new
    * manifest carries the previous version's files plus the new ones.
    * `replace=true` rewrites: the new manifest lists only the new files.
    * Returns the committed version number.
    */
  def commit(df: DataFrame, replace: Boolean): Long = commit(df, replace, None)

  /** Commit with an optional transaction id recorded atomically in the
    * same manifest (`#txn:` header). If the id is already present on the
    * head version, the commit is SKIPPED and the head version returned —
    * redelivered batches become no-ops with no crash window, because the
    * marker and the data land in one atomic manifest publish.
    */
  def commit(df: DataFrame, replace: Boolean, txn: Option[String]): Long =
    commit(df, replace, txn, None)

  /** Commit carrying an additional `#<key>:<value>` manifest header,
    * recorded ATOMICALLY with the content in the same manifest publish; a
    * previous header under the same key is superseded, not accumulated.
    * This is the cursor plane for derived state whose progress marker
    * must never be observable apart from the state itself (e.g. a
    * materialized view's last-folded source version): a crash can leave
    * the pair only wholly-published or wholly-absent.
    */
  def commit(df: DataFrame, replace: Boolean, txn: Option[String],
      header: Option[(String, String)]): Long = {
    txn.foreach { id =>
      currentVersion.foreach { v => if (txns(v).contains(id)) return v }
    }
    // validate BEFORE staging (a rejected batch leaves no pool litter);
    // re-validated in the race loop if the constraint set moved under us
    var validatedCs = checkConstraints
    enforceConstraints(df, validatedCs, "commit")
    val newLines = stageToPool(clustered(df), "commit")
    // race for the head version: stage a manifest for head+1, atomic
    // rename into place; the loser re-reads the head and retries with
    // the SAME pooled file names (carried-over lines keep their stats)
    var attempt = 0
    while (attempt < 50) {
      val v = currentVersion.getOrElse(0L) + 1
      // a replace drops the file lines but MUST carry the txn headers —
      // applied-batch memory outlives any rewrite or compaction
      val prev = currentVersion.map(manifestLines).getOrElse(Seq.empty)
      txn.foreach { id =>
        if (prev.contains(s"#txn:$id")) return v - 1  // lost race to our own id's writer
      }
      if (!replace) requireUnpartitioned("commit(append)", v, prev)
      val curCs = checkOf(prev)
      if (curCs != validatedCs) { // constraint DDL won a race: re-validate
        enforceConstraints(df, curCs, "commit"); validatedCs = curCs
      }
      val carried0 =
        if (replace) replaceCarriedData(prev, Some(df.schema)) else prev
      val carried = header.fold(carried0) { case (k, _) =>
        carried0.filterNot(_.startsWith(s"#$k:"))
      }
      val manifest = carried ++ txn.map(id => s"#txn:$id").toSeq ++
        header.map { case (k, hv) => s"#$k:$hv" }.toSeq ++ newLines
      val opName = header.collect { case ("op", hv) => hv }
        .getOrElse(if (replace) "replace" else "append")
      beforePublish(attempt, v)
      if (publish(v, stamped(opName, manifest))) return v
      racePause(attempt, v)
      attempt += 1
    }
    throw new java.io.IOException(
      s"commit: lost the version race 50 times under $tableRoot")
  }

  /** The value of a version's `#<key>:` manifest header, if present. */
  def headerOf(v: Long, key: String): Option[String] =
    manifestLines(v).find(_.startsWith(s"#$key:")).map(_.stripPrefix(s"#$key:"))

  /** RESTORE (rollback): make the head's content equal an earlier
    * version's, published as a NEW commit whose manifest re-references
    * that version's pool files BY NAME — no data is copied or moved, and
    * history is preserved (the rolled-back versions stay readable and
    * time-travelable until vacuum). Because the new head references the
    * restored files, vacuum keeps them live even after it drops the old
    * manifests. `#txn:` headers on the CURRENT head are carried forward —
    * applied-batch memory must survive a rollback exactly as it survives
    * replace and compaction (a restore that forgot them would let a
    * redelivered streaming batch double-apply). Races through the same
    * optimistic publish loop as `commit`.
    */
  def restore(v: Long): Long = {
    val live = committedVersions
    if (live.isEmpty) throw new java.util.NoSuchElementException(
      s"restore: empty commit log under $tableRoot")
    // fail with intent, not a raw FileNotFoundException from the manifest
    // read: a vacuumed / future / never-committed version is a caller
    // error worth naming (vacuumed versions are gone for good)
    if (!live.contains(v)) throw new IllegalArgumentException(
      s"restore: version $v is not available under $tableRoot " +
        s"(live versions: ${live.min}..${live.max} minus any vacuumed; " +
        "a vacuumed version cannot be restored)")
    // restoring the head would publish a redundant duplicate commit
    if (v == live.max) return v
    val dataLines = manifestLines(v).filterNot(_.startsWith("#txn:"))
    var attempt = 0
    while (attempt < 50) {
      val head = currentVersion.getOrElse(throw new java.util.NoSuchElementException(
        s"restore: empty commit log under $tableRoot"))
      val carried = manifestLines(head).filter(_.startsWith("#txn:"))
      beforePublish(attempt, head + 1)
      if (publish(head + 1, stamped("restore", carried ++ dataLines)))
        return head + 1
      racePause(attempt, head + 1)
      attempt += 1
    }
    throw new java.io.IOException(
      s"restore: lost the version race 50 times under $tableRoot")
  }

  /** Write `df` once into a staging dir, move its part files into the
    * pool under fresh opaque names, and return their manifest lines
    * (name + footer stats). Names are computed BEFORE any version race —
    * only a manifest confers liveness, so they need not embed the
    * finally-committed version; the uuid keeps racing writers' files from
    * clashing. (Computing names inside the retry loop was a real bug: a
    * writer that lost the rename race would publish a manifest listing
    * names that were never created, making that version and every append
    * chaining it unreadable — and vacuum would collect the real files as
    * orphans.) Footer stats ride the manifest line: one footer read per
    * new file at commit time buys every future reader file-level pruning.
    */
  private def stageToPool(df: DataFrame, op: String): Seq[String] = {
    val stage = new Path(tmpDir, java.util.UUID.randomUUID().toString)
    df.write.mode(SaveMode.Overwrite).parquet(stage.toString)
    poolFromStage(stage, op)
  }

  /** Move an already-written staging dir's part files into the pool
    * under fresh opaque names and return their manifest lines — the
    * second half of [[stageToPool]], split out so writers that produce
    * their files through other machinery (the V2 batch write behind SQL
    * MERGE/UPDATE) share the same pooling discipline.
    */
  private def poolFromStage(stage: Path, op: String): Seq[String] = {
    // one footer read per part yields BOTH the row count and the stats;
    // zero-row parts (Spark writes schema-only files for empty partitions
    // of union/anti-join plans) are dropped here — they would pollute
    // every future manifest as stats-less, never-prunable entries
    val parts = hfs.listStatus(stage)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
      .map(f => (f.getPath, f.getLen, footerInfo(f.getPath)))
      .filter { case (_, _, (rows, _)) => rows > 0 }
    val uuid = java.util.UUID.randomUUID().toString.take(8)
    hfs.mkdirs(dataDir)
    hfs.mkdirs(commitsDir)
    val lines = parts.zipWithIndex.map { case ((src, len, (rows, st)), i) =>
      val name = f"$uuid-part$i%05d.parquet"
      if (!hfs.rename(src, new Path(dataDir, name)))
        throw new java.io.IOException(s"$op: could not move $src into the pool")
      s"$name\t${statsJson(st, rows, len)}"
    }
    hfs.delete(stage, true)
    lines.toSeq
  }

  /** Hive %xx escape decoding for partition-dir values (Spark escapes
    * path-hostile chars when writing `c=v` dirs; `+` is NOT a space in
    * this dialect, so URLDecoder would mistranslate).
    */
  private def unescapePathValue(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 3 <= s.length) {
        try { out.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar); i += 3 }
        catch { case _: NumberFormatException => out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Exact per-file stats from a hive partition subpath (`c1=v1/c2=v2`):
    * each value is its own min=max bound, so partition pruning rides the
    * ordinary stats test. The stats TYPE comes from the writer's schema
    * (`colType`), never from the value's lexical shape: a STRING column
    * holding digit-only values ("2") must keep lexicographic bounds, or
    * range pruning disagrees with the row filter ("2" BETWEEN "10" AND
    * "30" lexically, yet numeric pruning would skip the file — silently
    * missing rows; mixed values would even crash the numeric parse). A
    * `__HIVE_DEFAULT_PARTITION__` (null) value yields no bound — the
    * file simply stays unprunable on that column, conservative as ever.
    */
  private def partValueStats(subdirs: Seq[String],
      colType: Map[String, String]): Map[String, ColStats] =
    subdirs.flatMap { seg =>
      seg.split("=", 2) match {
        case Array(c, raw) if raw != "__HIVE_DEFAULT_PARTITION__" =>
          val v = unescapePathValue(raw)
          Some(c -> ColStats(colType.getOrElse(c, "string"), v, v))
        case _ => None
      }
    }.toMap

  /** Manifest stats tag for a partition column's Catalyst type: integral
    * → "long", fractional/decimal → "double", everything else (string,
    * date, timestamp — ISO renderings order lexically) → "string".
    */
  private def partColTypes(df: DataFrame,
      partitionCols: Seq[String]): Map[String, String] = {
    import org.apache.spark.sql.types._
    partitionCols.map { c =>
      c -> (df.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => "long"
        case FloatType | DoubleType | _: DecimalType       => "double"
        case _                                             => "string"
      })
    }.toMap
  }

  /** Stage `df` hive-partitioned by `partitionCols` and pool the parts
    * UNDER their partition subdirs (manifest names carry the subpath).
    * Stats = footer stats of the data columns + exact partition-value
    * bounds, so one conjunctive test serves both pruning tiers.
    */
  private def stagePartitioned(df: DataFrame, partitionCols: Seq[String],
      op: String): Seq[String] = {
    require(partitionCols.nonEmpty, s"$op: empty partition column list")
    val missing = partitionCols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"$op: partition columns $missing not in ${df.columns.toSeq}")
    val colType = partColTypes(df, partitionCols)
    val stage = new Path(tmpDir, java.util.UUID.randomUUID().toString)
    // Optimized write (opt-in): without it, EVERY writing task opens a
    // file in EVERY partition value it holds — at 1000 tasks × 1000
    // partition values that is 10^6 near-empty files per commit, the
    // classic partitioned-ingest failure. The pre-shuffle clusters rows
    // by partition value first (one exchange), collapsing the count to
    // ~one file per value. Deliberately opt-in: clustering by partition
    // value serializes each value into one task, which is the wrong
    // trade for skewed values or few-partition writes — and the default
    // keeps file counts byte-identical for existing callers.
    val toStage =
      if (spark.conf.getOption("spark.graft.optimizedWrite.enabled")
          .exists(_.toBoolean))
        df.repartition(partitionCols.map(c => col(s"`$c`")): _*)
      else df
    toStage.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*)
      .parquet(stage.toString)
    val stageUri = stage.toUri.getPath
    val it = hfs.listFiles(stage, true)
    val parts = scala.collection.mutable.ArrayBuffer.empty[(Path, Long, Seq[String])]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) {
        val rel = f.getPath.toUri.getPath.stripPrefix(stageUri).stripPrefix("/")
        parts += ((f.getPath, f.getLen, rel.split('/').dropRight(1).toSeq))
      }
    }
    val uuid = java.util.UUID.randomUUID().toString.take(8)
    hfs.mkdirs(dataDir)
    hfs.mkdirs(commitsDir)
    val lines = parts.sortBy(_._1.getName).zipWithIndex.map {
      case ((src, len, subdirs), i) =>
        val (rows, st) = footerInfo(src)
        if (rows == 0L) { hfs.delete(src, false); None }
        else {
          val name = (subdirs :+ f"$uuid-part$i%05d.parquet").mkString("/")
          val dest = new Path(dataDir, name)
          hfs.mkdirs(dest.getParent)
          if (!hfs.rename(src, dest))
            throw new java.io.IOException(s"$op: could not move $src into the pool")
          val merged = st ++ partValueStats(subdirs, colType)
          Some(s"$name\t${statsJson(merged, rows, len)}")
        }
    }.flatten
    hfs.delete(stage, true)
    lines.toSeq
  }

  /** Commit `df` hive-partitioned by `partitionCols` as the next version
    * (the partitioned twin of [[commit]]). Appends require the head's
    * partition spec to match; a replace may change it. The spec rides
    * the manifest as a `#partition:` header, carried across appends and
    * MoR deletes. The CoW mutators ([[merge]]/[[deleteKeys]]/
    * [[rewriteWhere]]) are all partition-aware — touched files restage
    * under their subdirs, untouched files carry by name; the delete
    * TIER of choice on partitioned tables remains MoR
    * ([[deleteWhereMoR]], O(rows)) with [[rewriteDeletes]] as the
    * partition-aware fold. Only flat APPENDS refuse
    * ([[requireUnpartitioned]]) — mixing layouts is a correctness
    * error.
    */
  def commitPartitioned(df: DataFrame, partitionCols: Seq[String],
      replace: Boolean, txn: Option[String] = None,
      op: Option[String] = None,
      extraHeader: Option[String] = None): Long = {
    txn.foreach { id =>
      currentVersion.foreach { v => if (txns(v).contains(id)) return v }
    }
    currentVersion.filter(_ => !replace).foreach { v =>
      val prevLines = manifestLines(v)
      val existing = partitionColsOf(prevLines)
      // an empty-spec head is only appendable when it holds NO data
      // files: hive subdir lines over flat lines mix directory depths
      require(existing == partitionCols ||
          (existing.isEmpty && dataNamesOf(prevLines).isEmpty),
        s"commitPartitioned: head is ${if (existing.isEmpty) "flat"
          else s"partitioned by $existing"}, append by $partitionCols " +
          "would mix layouts (replace=true may change the spec)")
    }
    var validatedCs = checkConstraints
    enforceConstraints(df, validatedCs, "commitPartitioned")
    val newLines = stagePartitioned(clustered(df, partitionCols),
      partitionCols, "commitPartitioned")
    val header = "#partition:" + org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        org.json4s.JArray(partitionCols.map(org.json4s.JString(_)).toList)))
    var attempt = 0
    while (attempt < 50) {
      val v = currentVersion.getOrElse(0L) + 1
      val prev = currentVersion.map(manifestLines).getOrElse(Seq.empty)
      txn.foreach { id =>
        if (prev.contains(s"#txn:$id")) return v - 1
      }
      // re-check the spec against the CURRENT head on every attempt: a
      // concurrent replace can change/drop the spec between the entry
      // check and this publish, and appending our header over the racer's
      // file lines would mix directory layouts under data/ (the other
      // commit paths all re-run requireUnpartitioned in-loop; this is
      // the partitioned mirror of that discipline)
      if (!replace) {
        val headCols = partitionColsOf(prev)
        // same rule as the entry check: a racer that replaced the table
        // FLAT (empty spec, data lines present) must also refuse — an
        // empty spec alone is only safe over an empty table
        require(headCols == partitionCols ||
            (headCols.isEmpty && dataNamesOf(prev).isEmpty),
          s"commitPartitioned: head layout changed by a concurrent commit " +
            s"(now ${if (headCols.isEmpty) "flat" else s"partitioned by $headCols"}); " +
            s"append by $partitionCols would mix layouts")
      }
      val curCs = checkOf(prev)
      if (curCs != validatedCs) {
        enforceConstraints(df, curCs, "commitPartitioned"); validatedCs = curCs
      }
      // shape-aware carry: a partitioned INSERT OVERWRITE that changes
      // the column set drops the stale evolved `#schema:` header like
      // the flat path; the RLO restage and other shape-preserving
      // replaces match the recorded map and keep it
      val carried0 =
        if (replace) replaceCarriedData(prev, Some(df.schema))
        else prev.filterNot(_.startsWith("#partition:"))
      // an extra header (e.g. #ptspec:) supersedes its prior same-key
      // line — it rides the SAME atomic publish as the data it describes
      val carried = extraHeader match {
        case Some(h) =>
          val key = h.takeWhile(_ != ':') + ":"
          carried0.filterNot(_.startsWith(key))
        case None => carried0
      }
      val manifest = header +: (extraHeader.toSeq ++ carried ++
        txn.map(id => s"#txn:$id").toSeq ++ newLines)
      beforePublish(attempt, v)
      if (publish(v, stamped(
        op.getOrElse(if (replace) "replace" else "append"), manifest))) return v
      racePause(attempt, v)
      attempt += 1
    }
    throw new java.io.IOException(
      s"commitPartitioned: lost the version race 50 times under $tableRoot")
  }

  /** Commit EXPLICITLY NAMED staged parquet files (not a whole staging
    * dir) as the next version, with optional txn dedup — the streaming
    * sink's entry point: only files named by task COMMIT messages pool,
    * so a speculative or failed attempt's orphan in the same epoch dir
    * can never leak into the table (it ages out under vacuum's
    * in-flight guard instead). A txn id already on the head makes the
    * whole call a no-op returning the head — epoch redelivery inserts
    * nothing twice. An empty `paths` with `replace=true` is a legal
    * truncate-to-empty (Complete-mode epoch with no rows).
    */
  private[catalog] def commitPooledFiles(paths: Seq[Path], replace: Boolean,
      txn: Option[String]): Long = {
    txn.foreach { id =>
      currentVersion.foreach { v => if (txns(v).contains(id)) return v }
    }
    if (paths.isEmpty && !replace) return currentVersion.getOrElse(0L)
    // validate BEFORE the pool move: a rejected epoch leaves its files
    // where the writer staged them (the stage dir ages out), not in the
    // pool masquerading as committable content
    var validatedCs = checkConstraints
    enforceConstraintsOnPaths(paths, validatedCs, "commitPooledFiles")
    val uuid = java.util.UUID.randomUUID().toString.take(8)
    hfs.mkdirs(dataDir)
    hfs.mkdirs(commitsDir)
    val newLines = paths.sortBy(_.getName)
      .map(p => (p, hfs.getFileStatus(p).getLen, footerInfo(p)))
      .filter { case (_, _, (rows, _)) => rows > 0 }
      .zipWithIndex.map { case ((src, len, (rows, st)), i) =>
        val name = f"$uuid-part$i%05d.parquet"
        if (!hfs.rename(src, new Path(dataDir, name)))
          throw new java.io.IOException(s"commitPooledFiles: could not move $src")
        s"$name\t${statsJson(st, rows, len)}"
      }
    val pooledPaths = newLines.map(l => new Path(dataDir, l.split('\t').head))
    var attempt = 0
    while (attempt < 50) {
      val v = currentVersion.getOrElse(0L) + 1
      val prev = currentVersion.map(manifestLines).getOrElse(Seq.empty)
      txn.foreach { id =>
        if (prev.contains(s"#txn:$id")) return v - 1
      }
      if (!replace) requireUnpartitioned("commitPooledFiles(append)", v, prev)
      val curCs = checkOf(prev)
      if (curCs != validatedCs) { // constraint DDL won a race: re-validate
        enforceConstraintsOnPaths(pooledPaths, curCs, "commitPooledFiles")
        validatedCs = curCs
      }
      val carried = if (replace) replaceCarriedData(prev,
        pooledPaths.headOption.map(p => spark.read.parquet(p.toString).schema))
      else prev
      beforePublish(attempt, v)
      if (publish(v, stamped(if (replace) "replace" else "append",
        carried ++ txn.map(id => s"#txn:$id").toSeq ++ newLines))) return v
      racePause(attempt, v)
      attempt += 1
    }
    throw new java.io.IOException(
      s"commitPooledFiles: lost the version race 50 times under $tableRoot")
  }

  /** Import externally-produced parquet files WITH row-level deletes in
    * ONE atomic commit: each source file pools byte-identical under a
    * fresh name, and its deleted row indices land as native MoR
    * `(file, pos)` tombstones in the SAME manifest — the commit-log
    * spelling of an imported format's deletion vectors (Delta DVs map
    * here 1:1, [[DeltaInterop.importDelta]]). No data file is decoded
    * or rewritten: cost is O(bytes copied) + O(rows deleted), vs. the
    * O(table) re-encode a materializing import pays — and no
    * intermediate version ever shows the deleted rows resurrected.
    * Reads apply the tombstones exactly as [[deleteWhereMoR]]'s
    * ([[readFiles]] anti-join); [[rewriteDeletes]]/[[compact]] fold
    * them away later. Zero-row source files are skipped (with their
    * deletes) like every other pooling path.
    */
  def commitFilesWithDeletes(srcs: Seq[(Path, Seq[Long])], replace: Boolean): Long = {
    import spark.implicits._
    val pairs = srcs.flatMap { case (p, dels) =>
      dels.map(x => (p.toUri.getPath, x))
    }
    commitCopiedWithTombstones(srcs.map(_._1),
      if (pairs.isEmpty) None else Some(pairs.toDF("_graft_src", "_graft_del_pos")),
      replace)
  }

  /** Core of the tombstone-carrying import: pool `srcs` byte-identical
    * and map `tombs` — rows of `(_graft_src: scheme-stripped source
    * path, _graft_del_pos: row index)` — through the copy's name
    * assignment into native MoR tombstones, staged DISTRIBUTED in the
    * same atomic publish. The DataFrame shape is what lets an imported
    * format's delete files (Iceberg position deletes can be
    * arbitrarily large) flow executor-side; only the file-name mapping
    * (one row per file) is driver-resident and broadcast.
    */
  private[graft] def commitCopiedWithTombstones(srcs: Seq[Path],
      tombs: Option[DataFrame], replace: Boolean): Long = {
    require(srcs.nonEmpty, "commitCopiedWithTombstones: no source files")
    import spark.implicits._
    // CHECK constraints validate the LIVE rows of the import — tombstoned
    // rows never surface, so a deleted violator cannot fail the batch.
    // Validation reads the SOURCE files (pre-copy: a rejected import
    // leaves no pool litter) and re-runs inside the race loop if the
    // constraint set moved under us, like commit()/commitStaged.
    def liveRows: DataFrame = {
      val base = spark.read.option("mergeSchema", "true")
        .parquet(srcs.map(_.toString): _*)
      tombs match {
        case None => base
        case Some(t) =>
          base
            .withColumn("_graft_src", org.apache.spark.sql.functions
              .regexp_replace(col("_metadata.file_path"),
                HadoopFs.UriPrefixRx, ""))
            .withColumn("_graft_del_pos", col("_metadata.row_index"))
            .join(t.select(col("_graft_src"),
              col("_graft_del_pos").cast("long").as("_graft_del_pos")),
              Seq("_graft_src", "_graft_del_pos"), "left_anti")
            .drop("_graft_src", "_graft_del_pos")
      }
    }
    var validatedCs = checkConstraints
    def validate(cs: Map[String, String]): Unit =
      if (cs.nonEmpty) enforceConstraints(liveRows, cs, "commitCopiedWithTombstones")
    validate(validatedCs)
    val uuid = java.util.UUID.randomUUID().toString.take(8)
    hfs.mkdirs(dataDir)
    hfs.mkdirs(commitsDir)
    val pooled = srcs.zipWithIndex.flatMap { case (src, i) =>
      val srcFs = HadoopFs.fs(spark, src.toString)
      val name = f"$uuid-part$i%05d.parquet"
      val dst = new Path(dataDir, name)
      if (!org.apache.hadoop.fs.FileUtil.copy(srcFs, src, hfs, dst, false, hfs.getConf))
        throw new java.io.IOException(s"commitCopiedWithTombstones: copy of $src failed")
      val (rows, st) = footerInfo(dst)
      if (rows == 0L) { hfs.delete(dst, false); None }
      else Some((src.toUri.getPath, name,
        s"$name\t${statsJson(st, rows, hfs.getFileStatus(dst).getLen)}"))
    }
    val dataLines = pooled.map(_._3)
    val tombLines = tombs match {
      case None => Seq.empty
      case Some(t) =>
        val mapDf = pooled.map { case (srcNorm, name, _) => (srcNorm, name) }
          .toDF("_graft_src", DvKeys.head)
        val keyed = t
          .join(org.apache.spark.sql.functions.broadcast(mapDf), Seq("_graft_src"))
          .select(col(DvKeys.head),
            col("_graft_del_pos").cast("long").as(DvKeys.last))
        val staged = stageToPool(keyed, "importDeletes")
        staged.map("-" + _)
    }
    var attempt = 0
    while (attempt < 50) {
      val v = currentVersion.getOrElse(0L) + 1
      val prev = currentVersion.map(manifestLines).getOrElse(Seq.empty)
      if (!replace) requireUnpartitioned("commitCopiedWithTombstones(append)", v, prev)
      val curCs = checkOf(prev)
      if (curCs != validatedCs) { // constraint DDL won a race: re-validate
        validate(curCs); validatedCs = curCs
      }
      val carried = if (replace) replaceCarriedData(prev,
        pooled.headOption.map { case (_, name, _) =>
          spark.read.parquet(new Path(dataDir, name).toString).schema })
      else prev
      beforePublish(attempt, v)
      if (publish(v, stamped("import",
        carried ++ dataLines ++ tombLines))) return v
      racePause(attempt, v)
      attempt += 1
    }
    throw new java.io.IOException(
      s"commitCopiedWithTombstones: lost the version race 50 times under $tableRoot")
  }

  /** Incremental physical replication from `src` (this log is the
    * replica): copy ONLY the pool files the replica does not already
    * hold, then publish the source head's manifest as the replica's
    * next version carrying a `#repsrc:<srcVersion>` cursor header. Pool
    * names are uuid-unique and files immutable, so presence-by-name IS
    * the diff — a sync ships O(changed bytes + changed files), never
    * O(table): carried files are already in the replica's pool from
    * earlier syncs, and the cursor short-circuits an in-sync pair to a
    * metadata read. Manifest semantics (partition headers, MoR
    * tombstone lines, txn memory, per-file stats) carry verbatim, so
    * the replica is byte-equivalent, layout included. Absolute pool
    * references (shallow clones) are localized: the file copies into
    * the replica's own pool and the line rewrites to the relative name,
    * so a replica never depends on the primary region's storage. A
    * partial copy (crash, or the primary vacuuming a superseded file
    * mid-sync) is self-healing — nothing publishes until every
    * referenced file is present, and the next sync re-copies only
    * what's missing. Returns the new replica version, or None when
    * already in sync.
    */
  def replicateFrom(src: CommitLog): Option[Long] = {
    val head = src.currentVersion.getOrElse(return None)
    val cursor = currentVersion.flatMap(v => headerOf(v, "repsrc")).map(_.toLong)
    if (cursor.contains(head)) return None
    val lines = src.manifestLines(head)
    // a FENCED source is a superseded primary: its lineage forked from
    // the promoted table's the moment the fence landed, so syncing from
    // it would propagate exactly the split-brain the fence exists to
    // stop. A source AT the fenced generation is fine — that's a
    // resynced replica legitimately serving a cascade.
    src.fenceEpoch.foreach { e =>
      require(genOf(lines) >= e,
        s"replicateFrom: the replication source is FENCED at epoch $e " +
          s"(its head carries generation ${genOf(lines)}) — a promoted " +
          "replica superseded it during failover; sync from the promoted " +
          "table instead")
    }
    def isAbs(n: String) = n.startsWith("/") || n.contains("://")
    hfs.mkdirs(dataDir)
    hfs.mkdirs(commitsDir)
    val outLines = lines.map { l =>
      if (l.startsWith("#")) l
      else {
        val tomb = l.startsWith("-")
        val body = if (tomb) l.drop(1) else l
        val parts = body.split('\t')
        val n = parts(0)
        val local = if (isAbs(n)) leafOf(n) else n
        val dst = new Path(dataDir, local)
        if (!hfs.exists(dst)) {
          val sp = if (isAbs(n)) new Path(n) else new Path(src.dataDir, n)
          if (local.contains('/')) hfs.mkdirs(dst.getParent)
          if (!org.apache.hadoop.fs.FileUtil.copy(src.hfs, sp, hfs, dst, false,
              hfs.getConf))
            throw new java.io.IOException(s"replicateFrom: copy of $n failed")
        }
        val rebuilt = (local +: parts.drop(1).toSeq).mkString("\t")
        if (tomb) "-" + rebuilt else rebuilt
      }
    }
    val base = outLines.filterNot(l => l.startsWith("#repsrc:") ||
      l.startsWith("#repmap:") || l.startsWith("#reproot:"))
    // a transform-partitioned source's layout declaration rides along —
    // without it the replica would EXPOSE the hidden `_p_*` columns and
    // lose its transform pruning
    if (src.hfs.exists(src.ptspecFile))
      org.apache.hadoop.fs.FileUtil.copy(src.hfs, src.ptspecFile, hfs,
        ptspecFile, false, hfs.getConf): Unit
    // beside the cursor, record WHICH source versions this sync folds
    // (`#repmap:<lo>-<hi>`) and the source's canonical identity
    // (`#reproot:`): the translation table a failed-over streaming
    // consumer re-anchors its primary-version checkpoint through
    // ([[translateSourceOffset]])
    val syncHeaders = Seq(s"#repsrc:$head",
      s"#repmap:${cursor.getOrElse(0L) + 1}-$head",
      s"#reproot:${src.tableQualifiedRoot}")
    var attempt = 0
    while (attempt < 50) {
      val v = currentVersion.getOrElse(0L) + 1
      beforePublish(attempt, v)
      if (publish(v, stamped("replicate", syncHeaders ++ base)))
        return Some(v)
      racePause(attempt, v)
      attempt += 1
    }
    throw new java.io.IOException(
      s"replicateFrom: lost the version race 50 times under $tableRoot")
  }

  // ---- replica promotion & generation fencing ------------------------------

  private val fenceFile = new Path(tableRoot, "_fence.json")

  /** Failover generation carried by a manifest (`#gen:` header): bumped
    * by every [[promote]], 0 for tables that never took part in a
    * failover. The generation is the fencing token — see [[fenceEpoch]].
    */
  private def genOf(lines: Seq[String]): Long =
    lines.find(_.startsWith("#gen:"))
      .map(_.stripPrefix("#gen:").trim.toLong).getOrElse(0L)

  /** Head failover generation; 0 for never-promoted tables. */
  def generation: Long =
    currentVersion.map(v => genOf(manifestLines(v))).getOrElse(0L)

  /** The fence epoch stamped at this root (`_fence.json`), if any: a
    * durable mark that a REPLICA of this table was promoted at that
    * generation, superseding this root as the writable copy. Every
    * publish whose manifest generation does not clear the fence is
    * refused loudly (see [[promote]] for the full failover story).
    * Written atomically and read fresh per publish; an unreadable fence
    * fails LOUD — it is a safety device, never best-effort on the read
    * side.
    */
  def fenceEpoch: Option[Long] =
    if (!hfs.exists(fenceFile)) None
    else {
      val in = hfs.open(fenceFile)
      val body = try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
        new String(out.toByteArray, StandardCharsets.UTF_8)
      } finally in.close()
      org.json4s.jackson.JsonMethods.parse(body) \ "epoch" match {
        case org.json4s.JInt(e)  => Some(e.toLong)
        case org.json4s.JLong(e) => Some(e)
        case _ => throw new IllegalStateException(
          s"fenceEpoch: unparseable _fence.json under $tableRoot: $body")
      }
    }

  /** Stamp (or raise) the fence at this root — called by the PROMOTED
    * side against its old primary, or by an operator when the lost
    * region rejoins. Monotone: a lower epoch never overwrites a higher
    * one (replayed promotions are idempotent).
    */
  private[graft] def writeFence(epoch: Long, by: String): Unit = {
    if (fenceEpoch.exists(_ >= epoch)) return
    import org.json4s.JsonDSL._
    LogStore.writeAtomic(hfs, fenceFile,
      org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(
          ("epoch" -> epoch) ~ ("by" -> by)))
        .getBytes(StandardCharsets.UTF_8))
  }

  /** The publish-time fence gate: a manifest clears the fence only when
    * its generation proves it descends from (or IS) the promoted
    * lineage — a `replicate` sync at-or-above the fence epoch (reverse
    * resync from the promoted table), or any publish STRICTLY above it
    * (a new promotion of this root). Everything else — in particular an
    * ordinary commit from a rejoined stale primary, or a direct write
    * to a resynced replica — bounces loudly instead of forking history.
    */
  private def enforceFence(lines: Seq[String]): Unit =
    fenceEpoch.foreach { e =>
      val g = genOf(lines)
      val ok = if (opOf(lines).contains("replicate")) g >= e else g > e
      if (!ok) throw new IllegalStateException(
        s"publish: table under $tableRoot is FENCED at epoch $e (this " +
          s"manifest carries generation $g) — a replica was promoted and " +
          "owns the write path now. Writes here would fork a lineage the " +
          "promoted table never sees. Write to the promoted table; or " +
          "re-register this root as a replica (replicateFrom the promoted " +
          "table clears the fence at its generation); or promote THIS root " +
          "to take ownership back.")
    }

  /** PROMOTE this replica to a writable primary — the failover the
    * dual-region posture exists for (the reference declares a primary
    * and a secondary region, config/globalConfig.json:4-5; promotion is
    * what makes the secondary matter when the primary region is lost):
    *
    *  1. drop the `#repsrc:` cursor — the table stops being a sync
    *     target and every mutation surface accepts writes;
    *  2. bump the GENERATION (`#gen:` header, monotone across
    *     failovers) — the fencing token all later publishes carry;
    *  3. best-effort FENCE the old primary's root (`_fence.json` at the
    *     new generation): from the moment the fence is visible, the
    *     stale primary refuses commits AND refuses to serve as a
    *     replication source, so split-brain writes are impossible. The
    *     fence write is best-effort BY DESIGN — the old region being
    *     unreachable is WHY we are failing over; promotion must never
    *     depend on it. `fenced=false` in the result tells the operator
    *     to stamp the fence when the region rejoins
    *     ([[writeFence]] via `CALL graft.system.promote_replica` on
    *     rejoin is idempotent).
    *
    * Reverse resync when the region returns: re-register the old
    * primary as a replica — `replicateFrom(promoted)` clears its fence
    * check (the synced manifest carries the promoted generation) and
    * reaches parity incrementally; promoting IT back bumps the
    * generation again and fences the other side — generations only ever
    * grow, so every root always knows which lineage is current.
    *
    * DOCUMENTED LIMIT — the fence arbitrates PRIMARY-vs-REPLICA, not
    * replica-vs-replica: concurrently promoting TWO replicas of one
    * lost primary yields two writable generation-1 lineages, because
    * with the primary region gone there is no shared coordination
    * point to arbitrate through (the classic multi-region consensus
    * gap; no table format solves it storage-side). The runbook
    * discipline is one promotion target per failover; a losing replica
    * is retired by fencing it explicitly ([[writeFence]] at the
    * winner's generation) or re-registering it as a replica of the
    * winner.
    *
    * Returns (promotedVersion, generation, oldPrimaryFenced).
    */
  def promote(fenceOldPrimary: Option[CommitLog] = None): (Long, Long, Boolean) = {
    var attempt = 0
    while (attempt < 50) {
      val head = currentVersion.getOrElse(throw new IllegalStateException(
        s"promote: no committed version under $tableRoot"))
      val lines = manifestLines(head)
      require(lines.exists(_.startsWith("#repsrc:")),
        s"promote: table under $tableRoot carries no #repsrc cursor — it " +
          "is not a replica (already writable); promotion is a " +
          "replica-only operation")
      val newGen = math.max(genOf(lines), fenceEpoch.getOrElse(0L)) + 1
      // the promote commit sheds the sync bookkeeping (#repsrc cursor,
      // #repmap window, #reproot provenance) — the HISTORY manifests
      // keep every sync's repmap, which is what offset translation walks
      val base = lines.filterNot(l =>
        l.startsWith("#repsrc:") || l.startsWith("#gen:") ||
          l.startsWith("#repmap:") || l.startsWith("#reproot:"))
      beforePublish(attempt, head + 1)
      if (publish(head + 1, stamped("promote", s"#gen:$newGen" +: base))) {
        val fenced = fenceOldPrimary match {
          case None => false
          case Some(old) =>
            try { old.writeFence(newGen, tableRoot); true }
            catch { case scala.util.control.NonFatal(_) => false }
        }
        return (head + 1, newGen, fenced)
      }
      racePause(attempt, head + 1)
      attempt += 1
    }
    throw new java.io.IOException(
      s"promote: lost the version race 50 times under $tableRoot")
  }

  /** Re-anchor a streaming checkpoint across a failover: map an offset
    * recorded against this table's REPLICATION SOURCE (`srcRoot`,
    * checkpointed source version `srcVersion`) onto THIS table's own
    * version numbering. Each [[replicateFrom]] sync commit records the
    * source-version window it folds (`#repmap:<lo>-<hi>`) and the
    * source's canonical identity (`#reproot:`); a checkpoint sitting
    * exactly on a sync boundary (`srcVersion == hi` of some sync, or 0)
    * translates EXACTLY — the local sync version's file set is
    * byte-equivalent to the source's at that version, so the consumer
    * resumes with no duplicates and no gaps. Anything else fails LOUDLY
    * with the operator instruction, never silently re-reads:
    *  - a checkpoint INSIDE a fold window (the sync coalesced versions
    *    `lo..hi` into one local commit) cannot resume exactly;
    *  - a checkpoint AHEAD of the last synced version names data the
    *    replica never received (the failover's RPO window);
    *  - a root this table never synced from is not translatable at all.
    *
    * Cost: one manifest read per local version, once per stream restart
    * — O(local commits), no data I/O. (Consumers reach this through
    * [[GraftVersionOffset]]: offsets self-describe their root, so simply
    * re-pointing a `readStream.table` / `.changes` query at the promoted
    * table with the SAME checkpoint triggers the translation.)
    */
  private[graft] def translateSourceOffset(srcRoot: String, srcVersion: Long): Long = {
    if (srcVersion <= 0L) return 0L
    def norm(s: String): String = {
      val p = new Path(s)
      val q = if (p.toUri.getScheme == null) hfs.makeQualified(p) else p
      q.toString.stripSuffix("/")
    }
    val want = norm(srcRoot)
    val head = currentVersion.getOrElse(0L)
    var maxHi = 0L
    var sawSource = false
    var fold: Option[(Long, Long, Long)] = None
    var v = 1L
    while (v <= head) {
      headerOf(v, "repmap").foreach { m =>
        val fromWant = headerOf(v, "reproot").forall(r => norm(r.trim) == want)
        if (fromWant) m.trim.split('-') match {
          case Array(loS, hiS) =>
            val (lo, hi) = (loS.toLong, hiS.toLong)
            sawSource = true
            if (hi > maxHi) maxHi = hi
            if (srcVersion == hi) return v
            if (srcVersion >= lo && srcVersion < hi && fold.isEmpty)
              fold = Some((v, lo, hi))
          case _ => ()
        }
      }
      v += 1
    }
    fold match {
      case Some((lv, lo, hi)) => throw new IllegalStateException(
        s"translateSourceOffset: the checkpoint sits at source version " +
          s"$srcVersion of $want, INSIDE the window $lo-$hi that this " +
          s"table's sync commit $lv folded into one local version — the " +
          "replica cannot resume exactly there. Restart the consumer with " +
          "a fresh checkpoint to re-load from this table's current " +
          "snapshot (rows emitted before the failover will re-emit), or " +
          s"rewind the checkpoint to the sync boundary $hi's upstream " +
          "offset if the sink is idempotent.")
      case None if !sawSource => throw new IllegalStateException(
        s"translateSourceOffset: table under $tableRoot carries no " +
          s"replication sync from $want — this checkpoint belongs to a " +
          "different lineage. Point the consumer at a replica of that " +
          "table, or restart with a fresh checkpoint.")
      case None => throw new IllegalStateException(
        s"translateSourceOffset: the checkpoint sits at source version " +
          s"$srcVersion of $want, AHEAD of the last version this table " +
          s"synced ($maxHi) — the failover lost that window (RPO > 0). " +
          "Restart the consumer with a fresh checkpoint to re-load from " +
          "this table's current snapshot, and reconcile the sink for the " +
          s"un-replicated source versions ${maxHi + 1}-$srcVersion.")
    }
  }

  /** The copy-on-write mutators stage FLAT pool files; on a partitioned
    * head that would mix directory depths under `data/` and break
    * partition inference. They refuse loudly instead of corrupting the
    * layout — the partitioned delete tier is [[deleteWhereMoR]] /
    * [[deleteKeysMoR]] + [[rewriteDeletes]].
    */
  private def requireUnpartitioned(op: String, v: Long, lines: Seq[String]): Unit =
    require(partitionColsOf(lines).isEmpty,
      s"$op: table under $tableRoot is hive-partitioned; use the MoR delete " +
        "tier (deleteWhereMoR/deleteKeysMoR + rewriteDeletes) or rebuild with " +
        "commitPartitioned(replace = true)")

  /** Fresh staging directory under the table's `_tmp` for an external
    * writer (the SQL row-level-operation write stages here, then commits
    * via [[commitStaged]]). Unreferenced leftovers from crashed writers
    * age out under vacuum's in-flight guard like any orphan.
    */
  def newStageDir(tag: String): String =
    new Path(tmpDir, s"$tag-${java.util.UUID.randomUUID().toString}").toString

  /** Publish the parquet files previously written into `stageDir` (via
    * [[newStageDir]]) as the next commit. `replace=true` is the
    * row-level-operation contract: the staged files ARE the table's new
    * content. Same optimistic version race as [[commit]]; `#txn:`
    * headers carry forward across the replace.
    */
  def commitStaged(stageDir: String, replace: Boolean): Long = {
    val newLines = poolFromStage(new Path(stageDir), "commitStaged")
    val newPaths = newLines.map(l => new Path(dataDir, l.split('\t').head))
    var validatedCs = checkConstraints
    enforceConstraintsOnPaths(newPaths, validatedCs, "commitStaged")
    var attempt = 0
    while (attempt < 50) {
      val v = currentVersion.getOrElse(0L) + 1
      val prev = currentVersion.map(manifestLines).getOrElse(Seq.empty)
      if (!replace) requireUnpartitioned("commitStaged(append)", v, prev)
      val curCs = checkOf(prev)
      if (curCs != validatedCs) { // constraint DDL won a race: re-validate
        enforceConstraintsOnPaths(newPaths, curCs, "commitStaged")
        validatedCs = curCs
      }
      val carried = if (replace) replaceCarried(prev) else prev
      beforePublish(attempt, v)
      if (publish(v, stamped(if (replace) "replace" else "append",
        carried ++ newLines))) return v
      racePause(attempt, v)
      attempt += 1
    }
    throw new java.io.IOException(
      s"commitStaged: lost the version race 50 times under $tableRoot")
  }

  /** Zero-copy SHALLOW CLONE: publish this (empty) table's v1 as a
    * manifest whose file lines reference the SOURCE's pool files by
    * ABSOLUTE path, stats tags carried verbatim — no data moves, the
    * clone costs one manifest write regardless of table size (the
    * experiment-branch primitive at 100 TB). Absolute names resolve at
    * every read site because `Path(parent, child)` yields the child
    * when the child is absolute; the clone's own writers pool into its
    * OWN data dir, so the clone diverges naturally — a keyed CoW merge
    * rewrites a touched source file into the clone's pool and carries
    * the rest by absolute name, and [[compact]] is the full
    * materializer (after it, no line references the source). Vacuum on
    * the CLONE never touches source files (it walks only its own pool);
    * vacuum on the SOURCE is clone-aware — cloning registers an atomic
    * marker under each referenced root's `_clones/`, and [[vacuum]]
    * keeps files any registered clone's retained versions still
    * reference ([[cloneLiveNames]]) — so a source vacuum cannot break a
    * live branch (the caveat the Delta/Iceberg shallow-clone contracts
    * leave open). Markers self-clean once the branch is dropped or
    * fully materialized (compact + branch vacuum).
    *
    * Refusals: a hive-partitioned source (partition rehydration needs a
    * single `basePath`, which absolute cross-root names break — CTAS /
    * INSERT OVERWRITE materializes instead) and a source carrying MoR
    * tombstones (fold with `rewrite_deletes` first; cloning DV lines
    * would alias tombstones across roots). The clone target must be
    * uncommitted.
    */
  def cloneFrom(srcRoot: String, versionAsOf: Option[Long] = None): Long = {
    require(currentVersion.isEmpty,
      s"cloneFrom: target $tableRoot already has commits")
    val src = new CommitLog(spark, srcRoot)
    // time-travel clone: branch off any RETAINED source version — the
    // clone pins that snapshot's files, immune to later source commits
    val v = versionAsOf.getOrElse(
      src.currentVersion.getOrElse(throw new java.io.FileNotFoundException(
        s"cloneFrom: no committed version under $srcRoot")))
    require(src.committedVersions.contains(v),
      s"cloneFrom: version $v is not retained under $srcRoot " +
        s"(have: ${src.committedVersions.sorted.mkString(", ")})")
    require(src.partitionColumns(v).isEmpty,
      s"cloneFrom: $srcRoot is hive-partitioned; shallow clone cannot span " +
        "partition roots — materialize with CTAS / INSERT OVERWRITE")
    require(src.dvFiles(v).isEmpty,
      s"cloneFrom: $srcRoot carries merge-on-read deletion vectors; fold " +
        "them first: CALL <catalog>.system.rewrite_deletes")
    val srcData = new Path(srcRoot, "data")
    val absLines = src.manifestLines(v)
      .filterNot(l => l.startsWith("#") || l.startsWith("-"))
      .map { l =>
        val i = l.indexOf('\t')
        val (name, rest) = if (i < 0) (l, "") else (l.substring(0, i), l.substring(i))
        s"${new Path(srcData, name)}$rest"
      }
    // register this clone at EVERY root it references (clone-of-clone
    // lines can point past the immediate source at the original pool),
    // so those roots' vacuums keep referenced files live — one atomic
    // marker file per (root, clone), no shared mutable registry.
    // Markers land BEFORE the manifest publishes: a crash in between
    // leaves an unreferenced marker that self-cleans on the source's
    // next vacuum, whereas the reverse order would leave a published,
    // readable clone that one source vacuum permanently breaks.
    absLines.iterator.flatMap(l => dataRootOf(l.split('\t').head))
      .map(r => r.stripSuffix("/data")).toSet[String]
      .foreach(registerCloneAt(_, tableRoot))
    // declarative table metadata FORKS with the data: CHECK constraints,
    // clustering, TTL policy, the evolved schema of record, and the
    // transform spec all describe the snapshot being cloned — dropping
    // them would hand back a clone that accepts rows the source refuses,
    // loses a library-evolved column from its schema, or exposes a
    // transform layout's hidden `_p_*` columns. `#txn:` memory is NOT
    // carried: the clone is a new table; streams writing to it start
    // their own exactly-once ledger.
    val metaCarried = src.manifestLines(v).filter(l =>
      l.startsWith("#check:") || l.startsWith("#cluster:") ||
        l.startsWith("#ttl:") || l.startsWith("#schema:") ||
        l.startsWith("#ptspec:"))
    // provenance header (inert to every reader): names the branch point
    if (!publish(1, stamped("clone",
        s"#clone:$srcRoot@$v" +: (metaCarried ++ absLines)))) throw new java.io.IOException(
      s"cloneFrom: lost the v1 race under $tableRoot")
    // a concurrent source vacuum may have dropped a time-travel target
    // version while this clone was in flight (the head always survives
    // keepVersions >= 1); fail loudly rather than hand back a branch
    // whose files may already be collected
    if (!src.committedVersions.contains(v)) throw new java.io.IOException(
      s"cloneFrom: source version $v of $srcRoot was vacuumed mid-clone; " +
        "the branch may reference collected files — re-clone from a retained version")
    1L
  }

  /** Data-dir root of an absolute pool reference (None for this table's
    * own relative names): the path up to and including its `/data`
    * segment. Partition values escape `/` (%2F), so the LAST `/data/`
    * is unambiguous.
    */
  private def dataRootOf(n: String): Option[String] =
    if (!isAbsoluteName(n)) None
    else {
      val i = n.lastIndexOf("/data/")
      if (i < 0) None else Some(n.substring(0, i + 5))
    }

  /** Drop an atomic clone marker under `srcRoot/_clones/` naming
    * `cloneRoot` — the registry [[vacuum]] consults to keep files a
    * live clone still references out of the dead set. One file per
    * clone, create-only: concurrent clones never contend.
    */
  private def registerCloneAt(srcRoot: String, cloneRoot: String): Unit = {
    val dir = new Path(srcRoot, "_clones")
    hfs.mkdirs(dir)
    val name = java.net.URLEncoder.encode(cloneRoot, "UTF-8")
    val marker = new Path(dir, name)
    if (!hfs.exists(marker))
      LogStore.write(hfs, marker, cloneRoot.getBytes("UTF-8"))
  }

  /** Relative names of THIS table's pool files still referenced by ANY
    * retained version of a registered clone (not just its head — the
    * clone's own time travel must survive a source vacuum). Markers
    * whose clone root has vanished (branch dropped) or no longer
    * references this table anywhere (materialized via compact, old
    * versions vacuumed) are deregistered on the way — the registry is
    * self-cleaning, O(live clones × their retained versions) manifest
    * reads, all driver-side metadata.
    */
  private def cloneLiveNames(markerCleanCutoff: Long): Set[String] = {
    val dir = new Path(tableRoot, "_clones")
    if (!hfs.exists(dir)) return Set.empty
    // scheme-insensitive comparison: a clone spelled "file:/wh/t" and a
    // vacuum constructed with "/wh/t" are the same table — raw string
    // prefix would silently deregister a live branch
    val myData = dataDir.toUri.getPath
    val live = scala.collection.mutable.Set.empty[String]
    hfs.listStatus(dir).foreach { m =>
      val cloneRoot = java.net.URLDecoder.decode(m.getPath.getName, "UTF-8")
      val clone = new CommitLog(spark, cloneRoot)
      val refs = clone.committedVersions.flatMap(clone.manifestLines)
        .filterNot(l => l.startsWith("#") || l.startsWith("-"))
        .map(_.split('\t').head)
        .filter(isAbsoluteName)
        .map(n => new Path(n).toUri.getPath)
        .filter(_.startsWith(myData + "/"))
        .map(_.stripPrefix(myData + "/"))
      // a marker with no references is stale (dropped or materialized
      // branch) — UNLESS it is young: cloneFrom registers BEFORE its v1
      // publishes, so an in-flight clone's marker must survive the scan
      // (same in-flight guard as the pool-file collection)
      if (refs.isEmpty) {
        if (m.getModificationTime <= markerCleanCutoff)
          hfs.delete(m.getPath, false): Unit
      } else live ++= refs
    }
    live.toSet
  }

  // ---- hidden partition transforms -----------------------------------------
  //
  // Iceberg-style hidden partitioning on the commit log: a declared
  // transform (`_ptspec.json` sidecar) derives a `_p_*` hive partition
  // column at write time, [[read]] hides it, and [[readWhere]] prunes
  // FILES from predicates on the SOURCE column — the user never knows
  // the layout exists. Pruning rides the manifest's per-file stats
  // (partition values land as exact min=max bounds at stage time), so
  // it is pure driver-side metadata: zero file opens for skipped files.

  private val ptspecFile = new Path(tableRoot, "_ptspec.json")

  private val TransformRe = "^\\s*([A-Za-z]+)\\s*\\(([^)]*)\\)\\s*$".r

  /** Parse `"days(ts)"` / `"bucket(8, k)"` / `"truncate(4, name)"`
    * against a schema (the source type is recorded so probes cast
    * literals exactly as the write derived).
    */
  private def parseTransform(df: DataFrame, s: String): PartitionTransform =
    parseTransformOn(df.schema, s)

  private def parseTransformOn(schema: org.apache.spark.sql.types.StructType,
      s: String): PartitionTransform =
    s match {
      case TransformRe(kind0, args) =>
        val kind = kind0.toLowerCase(java.util.Locale.ROOT).stripSuffix("s")
        val parts = args.split(",").map(_.trim).filter(_.nonEmpty)
        def typed(src: String): String = {
          require(schema.fieldNames.contains(src),
            s"partition transform '$s': no column '$src' in ${schema.fieldNames.toSeq}")
          schema(src).dataType.sql
        }
        kind match {
          case "year" | "month" | "day" | "hour" =>
            require(parts.length == 1, s"$kind takes one column, got '$s'")
            val t = PartitionTransform(kind, parts(0), typed(parts(0)), 0L)
            require(Set("DATE", "TIMESTAMP", "TIMESTAMP_NTZ")(t.srcType.toUpperCase),
              s"$kind needs a date/timestamp column; '${t.src}' is ${t.srcType}")
            t
          case "bucket" | "truncate" =>
            require(parts.length == 2 && parts(0).forall(_.isDigit) &&
              parts(0).toLong > 0,
              s"$kind takes (positive count, column), got '$s'")
            PartitionTransform(kind, parts(1), typed(parts(1)), parts(0).toLong)
          case other => throw new IllegalArgumentException(
            s"unknown partition transform '$other' in '$s' " +
              "(have: years months days hours bucket truncate)")
        }
      case _ => throw new IllegalArgumentException(
        s"cannot parse partition transform '$s' (want kind(args))")
    }

  /** Declared hidden-partition transforms, empty when the table is not
    * transform-partitioned.
    *
    * The spec of record is the HEAD MANIFEST's `#ptspec:` header — it
    * lands in the same atomic publish as the (re-)laid-out data
    * ([[commitTransformed]]), so spec and layout can never disagree,
    * even across a crash mid-commit on a transform REPLACE. The
    * `_ptspec.json` sidecar is a write-behind cache and the pre-header
    * format's home: consulted only when no header exists at the head.
    */
  def partitionTransforms: Seq[PartitionTransform] =
    transformsFor(
      try currentVersion.map(manifestLines).getOrElse(Seq.empty)
      catch { case scala.util.control.NonFatal(_) => Seq.empty })

  /** Transform spec for a manifest already in hand — callers on the read
    * path pass their own lines, so the spec costs ZERO extra metadata
    * reads (head discovery stays O(1) reads).
    */
  private def transformsFor(lines: Seq[String]): Seq[PartitionTransform] =
    lines.find(_.startsWith("#ptspec:")) match {
      case Some(l) => parsePtspecJson(l.stripPrefix("#ptspec:"))
      case None =>
        if (!hfs.exists(ptspecFile)) Seq.empty
        else {
          val in = hfs.open(ptspecFile)
          val txt = try {
            val out = new java.io.ByteArrayOutputStream()
            org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
            new String(out.toByteArray, StandardCharsets.UTF_8)
          } finally in.close()
          parsePtspecJson(txt)
        }
    }

  private def parsePtspecJson(txt: String): Seq[PartitionTransform] =
    org.json4s.jackson.JsonMethods.parse(txt) match {
      case org.json4s.JArray(items) => items.map { j =>
        implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
        PartitionTransform(
          (j \ "kind").extract[String], (j \ "src").extract[String],
          (j \ "srcType").extract[String], (j \ "arg").extract[Long])
      }
      case _ => Seq.empty
    }

  private def ptspecJson(ts: Seq[PartitionTransform]): String = {
    import org.json4s.JsonDSL._
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(ts.map(t =>
        ("kind" -> t.kind) ~ ("src" -> t.src) ~ ("srcType" -> t.srcType) ~
          ("arg" -> t.arg))))
  }

  private def writePtspec(ts: Seq[PartitionTransform]): Unit =
    LogStore.write(hfs, ptspecFile, ptspecJson(ts).getBytes(StandardCharsets.UTF_8))

  /** Declare hidden-partition transforms for a (possibly still empty)
    * table from its schema — the catalog's `CREATE TABLE ...
    * PARTITIONED BY (months(c), bucket(8, k))` seam. Writes land through
    * [[commitTransformed]]; reads hide the layout.
    */
  def declareTransforms(schema: org.apache.spark.sql.types.StructType,
      specs: Seq[String]): Seq[PartitionTransform] = {
    require(specs.nonEmpty, "declareTransforms: empty transform list")
    val parsed = specs.map(parseTransformOn(schema, _))
    writePtspec(parsed)
    parsed
  }

  /** Transform twin of [[commitStagedPartitioned]] for the SQL row-level
    * rewrite on a hidden-partitioned table: the flat staged rows are
    * re-derived and re-laid-out under the declared transforms, so the
    * layout (and every later read's pruning) survives SQL MERGE/UPDATE.
    */
  def commitStagedTransformed(stageDir: String): Long = {
    val ts = partitionTransforms
    require(ts.nonEmpty, s"commitStagedTransformed: no declared transforms " +
      s"under $tableRoot")
    val stage = new Path(stageDir)
    val hasParts = hfs.exists(stage) && hfs.listStatus(stage)
      .exists(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val df0 =
      if (hasParts) spark.read.parquet(stage.toString)
      else read().where(org.apache.spark.sql.functions.lit(false))
    val names = ts.map(_.derivedName)
    val df = applyTransforms(df0).repartition(names.map(n => col(s"`$n`")): _*)
    val ver = commitPartitioned(df, names, replace = true,
      extraHeader = Some("#ptspec:" + ptspecJson(ts)))
    hfs.delete(stage, true)
    ver
  }

  /** (Re)compute every declared derived column whose source is present —
    * the recompute seam keeping [[merge]]/[[updateWhere]] layout-correct
    * when a write touches a transform's source column (a stale derived
    * value would land rows in the wrong partition and silently corrupt
    * pruning).
    */
  private def applyTransforms(df: DataFrame): DataFrame = {
    val ts = partitionTransforms
    ts.filter(t => df.columns.contains(t.src))
      .foldLeft(df)((d, t) => d.withColumn(t.derivedName, t.derive(col(s"`${t.src}`"))))
  }

  /** Commit `df` hidden-partitioned by `specs` (e.g. `Seq("days(ts)",
    * "bucket(16, user_id)")`). The first commit declares the layout;
    * appends must redeclare the same specs (a different layout needs
    * `replace = true`, which re-lays-out wholesale). The derived `_p_*`
    * columns are internal: [[read]]/[[readWhere]] hide them.
    */
  def commitTransformed(df: DataFrame, specs: Seq[String], replace: Boolean,
      txn: Option[String] = None): Long = {
    require(specs.nonEmpty, "commitTransformed: empty transform list")
    val parsed = specs.map(parseTransform(df, _))
    val existing = partitionTransforms
    if (existing.nonEmpty && !replace)
      require(existing.map(_.spec) == parsed.map(_.spec),
        s"commitTransformed(append): declared layout is " +
          s"${existing.map(_.spec).mkString(", ")}; got " +
          s"${parsed.map(_.spec).mkString(", ")} — appends must match " +
          "(replace=true re-lays-out)")
    val derived = parsed.foldLeft(df)((d, t) =>
      d.withColumn(t.derivedName, t.derive(col(s"`${t.src}`"))))
    // cluster by the derived values before the partitioned write: without
    // it every task opens a file in every partition value it holds — at
    // 1000 tasks × 1000 values that is 10^6 near-empty files per commit.
    // Transforms are DESIGNED to bound value counts (buckets hash-balance,
    // time grains batch), so one exchange for ~one file per value is the
    // right default here, unlike raw commitPartitioned's opt-in.
    val names = parsed.map(_.derivedName)
    // the spec rides the SAME atomic manifest publish as the laid-out
    // data (`#ptspec:` header): spec and layout can never disagree, even
    // across a crash mid-replace — a reader of the new head sees the new
    // spec, a reader of the old head the old one
    val ver = commitPartitioned(derived.repartition(names.map(n => col(s"`$n`")): _*),
      names, replace, txn,
      extraHeader = Some("#ptspec:" + ptspecJson(parsed)))
    // sidecar = write-behind cache (pre-header readers + cheap probes);
    // written only AFTER the data publish succeeds, so a failed commit
    // can never leave a NEW spec declared over OLD-layout data — and if
    // THIS write crashes, the header above is still the spec of record
    writePtspec(parsed)
    ver
  }

  /** Split a predicate into conjuncts (`Or`/`Not` stay whole: they never
    * prune, the row filter handles them).
    */
  private def conjunctsOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjunctsOf(l) ++ conjunctsOf(r)
    case x => Seq(x)
  }

  private def attNameOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[String] = e match {
    case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => Some(a.name)
    case a: org.apache.spark.sql.catalyst.expressions.AttributeReference => Some(a.name)
    case _ => None
  }

  /** Derived-value rendering of a foldable probe expression, cast
    * through the RECORDED source type so hashing/formatting matches the
    * write side byte-for-byte (the correctness seam — an int and a long
    * hash differently). One 1-row local job per bound: driver-side
    * metadata cost, never touches the table.
    */
  private def derivedOf(t: PartitionTransform,
      e: org.apache.spark.sql.catalyst.expressions.Expression): Option[String] = {
    val row = spark.range(1)
      .select(t.derive(org.apache.spark.sql.GraftSqlShim.column(e)
        .cast(t.srcType)).cast("string").as("d"))
      .head()
    if (row.isNullAt(0)) None else Option(row.getString(0))
  }

  /** File names of the current version surviving transform pruning for
    * `cond` — the observability seam the specs pin file-skip counts on.
    */
  private[graft] def prunedCandidates(cond: org.apache.spark.sql.Column)
      : Seq[String] = {
    import org.apache.spark.sql.catalyst.{expressions => E}
    val v = currentVersion.getOrElse(throw new java.io.FileNotFoundException(
      s"no committed version under $tableRoot"))
    val lines = manifestLines(v)
    val names = dataNamesOf(lines)
    val specs = transformsFor(lines)
    if (names.isEmpty) return names
    val stats = fileStatsOf(lines)
    // a Spark-4 Column is a ColumnNode tree, not a catalyst expression:
    // resolve it the honest way — analyze a Filter over this snapshot
    // and lift the RESOLVED condition (attributes bound, literals
    // type-coerced/foldable) out of the plan. Driver-side, no execution.
    val resolved = readVersion(v).filter(cond).queryExecution.analyzed
      .collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
      }
    if (resolved.isEmpty) return names
    // the literal side is any sub-expression the optimizer could fold
    // (Literal, Cast(Literal), arithmetic over them)
    def isLit(e: E.Expression): Boolean = e.foldable
    val conj = conjunctsOf(resolved.get)
    var candidates = names
    specs.foreach { t =>
      // (lo, hi) bounds on the DERIVED value, None = unbounded side
      val bounds: Seq[(Option[String], Option[String])] = conj.flatMap {
        case E.EqualTo(a, l) if attNameOf(a).contains(t.src) && isLit(l) =>
          derivedOf(t, l).map(d => (Some(d), Some(d)))
        case E.EqualTo(l, a) if attNameOf(a).contains(t.src) && isLit(l) =>
          derivedOf(t, l).map(d => (Some(d), Some(d)))
        case E.EqualNullSafe(a, l) if attNameOf(a).contains(t.src) && isLit(l) =>
          derivedOf(t, l).map(d => (Some(d), Some(d)))
        case E.In(a, vs) if attNameOf(a).contains(t.src) && vs.nonEmpty &&
            vs.forall(isLit) =>
          // ONE local job derives the whole IN list (a per-element probe
          // would launch len(IN) driver jobs — the 1000-element IN trap)
          val ds = spark.range(1)
            .select(org.apache.spark.sql.functions.explode(
              org.apache.spark.sql.functions.array(vs.map(x =>
                org.apache.spark.sql.GraftSqlShim.column(x)
                  .cast(t.srcType)): _*)).as("x"))
            .select(t.derive(col("x")).cast("string").as("d"))
            .collect().map(r => Option(r.getString(0)))
          if (ds.exists(_.isEmpty) || ds.isEmpty) None
          else {
            // range over the derived values: loose for bucket but always
            // correct (overlaps is a per-file interval test)
            val sorted = ds.flatten.toSeq
              .sortWith(ColStats.cmp(t.derivedTpe, _, _) < 0)
            Some((Some(sorted.head), Some(sorted.last)))
          }
        case E.GreaterThanOrEqual(a, l) if attNameOf(a).contains(t.src) &&
            isLit(l) && t.monotone => derivedOf(t, l).map(d => (Some(d), None))
        case E.GreaterThan(a, l) if attNameOf(a).contains(t.src) &&
            isLit(l) && t.monotone => derivedOf(t, l).map(d => (Some(d), None))
        case E.LessThanOrEqual(a, l) if attNameOf(a).contains(t.src) &&
            isLit(l) && t.monotone => derivedOf(t, l).map(d => (None, Some(d)))
        case E.LessThan(a, l) if attNameOf(a).contains(t.src) &&
            isLit(l) && t.monotone => derivedOf(t, l).map(d => (None, Some(d)))
        // reversed comparisons: lit OP col flips the bound side
        case E.GreaterThanOrEqual(l, a) if attNameOf(a).contains(t.src) &&
            isLit(l) && t.monotone => derivedOf(t, l).map(d => (None, Some(d)))
        case E.GreaterThan(l, a) if attNameOf(a).contains(t.src) &&
            isLit(l) && t.monotone => derivedOf(t, l).map(d => (None, Some(d)))
        case E.LessThanOrEqual(l, a) if attNameOf(a).contains(t.src) &&
            isLit(l) && t.monotone => derivedOf(t, l).map(d => (Some(d), None))
        case E.LessThan(l, a) if attNameOf(a).contains(t.src) &&
            isLit(l) && t.monotone => derivedOf(t, l).map(d => (Some(d), None))
        case _ => None
      }
      bounds.foreach { case (lo, hi) =>
        candidates = candidates.filter { n =>
          stats.get(n).flatMap(_.get(t.derivedName)).forall { s =>
            lo.forall(b => ColStats.cmp(s.tpe, s.max, b) >= 0) &&
              hi.forall(b => ColStats.cmp(s.tpe, s.min, b) <= 0)
          }
        }
      }
    }
    // tier 2: direct per-file footer min/max on ANY column — clustered /
    // naturally-ordered tables skip files with no transform declared.
    // The probe value is the RESOLVED literal's internal rendering, which
    // matches how the manifest stats were tagged (timestamps as micros,
    // dates as epoch days, strings as UTF-16-comparable text); a
    // rendering the stat's type tag cannot parse never prunes.
    def rendered(e: E.Expression): Option[String] =
      try e.eval(null) match {
        case null => None
        case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
        case n @ (_: java.lang.Long | _: java.lang.Integer |
                  _: java.lang.Short | _: java.lang.Byte |
                  _: java.lang.Double | _: java.lang.Float) =>
          Some(String.valueOf(n))
        case _ => None
      } catch { case scala.util.control.NonFatal(_) => None }
    def safeFor(tpe: String, s: String): Boolean = tpe match {
      case "long"   => s.matches("-?\\d+")
      case "double" => s.matches("-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?")
      case _        => true
    }
    val colBounds: Seq[(String, Option[String], Option[String])] = conj.flatMap {
      case E.EqualTo(a, l) if attNameOf(a).isDefined && isLit(l) =>
        rendered(l).map(d => (attNameOf(a).get, Some(d), Some(d)))
      case E.EqualTo(l, a) if attNameOf(a).isDefined && isLit(l) =>
        rendered(l).map(d => (attNameOf(a).get, Some(d), Some(d)))
      case E.GreaterThanOrEqual(a, l) if attNameOf(a).isDefined && isLit(l) =>
        rendered(l).map(d => (attNameOf(a).get, Some(d), None))
      case E.GreaterThan(a, l) if attNameOf(a).isDefined && isLit(l) =>
        rendered(l).map(d => (attNameOf(a).get, Some(d), None))
      case E.LessThanOrEqual(a, l) if attNameOf(a).isDefined && isLit(l) =>
        rendered(l).map(d => (attNameOf(a).get, None, Some(d)))
      case E.LessThan(a, l) if attNameOf(a).isDefined && isLit(l) =>
        rendered(l).map(d => (attNameOf(a).get, None, Some(d)))
      case E.GreaterThanOrEqual(l, a) if attNameOf(a).isDefined && isLit(l) =>
        rendered(l).map(d => (attNameOf(a).get, None, Some(d)))
      case E.GreaterThan(l, a) if attNameOf(a).isDefined && isLit(l) =>
        rendered(l).map(d => (attNameOf(a).get, None, Some(d)))
      case E.LessThanOrEqual(l, a) if attNameOf(a).isDefined && isLit(l) =>
        rendered(l).map(d => (attNameOf(a).get, Some(d), None))
      case E.LessThan(l, a) if attNameOf(a).isDefined && isLit(l) =>
        rendered(l).map(d => (attNameOf(a).get, Some(d), None))
      case _ => None
    }
    colBounds.foreach { case (c, lo, hi) =>
      candidates = candidates.filter { n =>
        stats.get(n).flatMap(_.get(c)).forall { s =>
          lo.forall(b => !safeFor(s.tpe, b) || ColStats.cmp(s.tpe, s.max, b) >= 0) &&
            hi.forall(b => !safeFor(s.tpe, b) || ColStats.cmp(s.tpe, s.min, b) <= 0)
        }
      }
    }
    candidates
  }

  /** Filtered snapshot read with hidden-partition pruning: predicates on
    * transform SOURCE columns skip whole files via the manifest's
    * derived-value bounds (equality/IN through bucket; ranges through
    * the order-preserving transforms), then `cond` applies exactly
    * row-wise. On a non-transformed table this is just `read().filter`.
    */
  def readWhere(cond: org.apache.spark.sql.Column): DataFrame = {
    val v = currentVersion.getOrElse(throw new java.io.FileNotFoundException(
      s"no committed version under $tableRoot"))
    val lines = manifestLines(v)
    val specs = transformsFor(lines)
    def hide(df: DataFrame): DataFrame = {
      val hidden = specs.map(_.derivedName).filter(df.columns.contains)
      if (hidden.isEmpty) df else df.drop(hidden: _*)
    }
    if (dataNamesOf(lines).isEmpty) return hide(readVersion(v).filter(cond))
    val candidates = prunedCandidates(cond)
    if (candidates.isEmpty) hide(readVersion(v).filter(cond).limit(0))
    else hide(readFiles(candidates, dvFrameOf(dvNamesOf(lines)),
      partTypesOf(lines)).filter(cond))
  }

  // ---- named refs: tags, branches, write-audit-publish ---------------------
  //
  // A ref is one tiny file under `_refs/<name>` holding `kind\tversion`,
  // published with the same conditional-create primitive as manifests
  // (concurrent creates of one name: exactly one wins). Tags pin a main
  // version against vacuum (reference: Iceberg snapshot tags). Branches
  // are shallow clones under `_branches/<name>` — zero-copy forks whose
  // writers pool into their own dir, vacuum-safe through the `_clones/`
  // markers [[cloneFrom]] registers — and [[fastForward]] is the
  // write-audit-publish close: the branch's state becomes the main head
  // in one conditional publish, its new files adopted by rename
  // (metadata-only, O(changed files)), refusing unless main is still at
  // the fork point.

  private val refsDir = new Path(tableRoot, "_refs")
  private def branchDir(name: String) = new Path(tableRoot, s"_branches/$name")

  /** Branch roots live INSIDE the table dir (next to `data/`, invisible
    * to main readers); the catalog needs the path to serve
    * `VERSION AS OF '<branch>'`.
    */
  private[catalog] def branchRootPath(name: String): String =
    branchDir(name).toString

  // names must be path-safe and never parse as a bare version number
  // (`VERSION AS OF '7'` must stay numeric time travel)
  private val RefName = "^[A-Za-z][A-Za-z0-9._-]{0,63}$".r
  private def requireRefName(name: String): Unit =
    require(RefName.matches(name),
      s"ref name '$name' must match ${RefName.regex} (start with a letter)")

  // in-flight branch-create claims (see [[createBranch]]'s two-phase
  // publish); never listed as refs
  private def pendingRefsDir = new Path(refsDir, ".pending")

  /** All named refs of this table. */
  def refs: Map[String, RefInfo] =
    if (!hfs.exists(refsDir)) Map.empty
    else hfs.listStatus(refsDir).toSeq.filter(_.isFile)
      .flatMap(st => ref(st.getPath.getName))
      .map(r => r.name -> r).toMap

  /** One named ref, if it exists. */
  def ref(name: String): Option[RefInfo] = {
    val p = new Path(refsDir, name)
    if (!hfs.exists(p)) None
    else {
      val in = hfs.open(p)
      val txt = try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
        new String(out.toByteArray, StandardCharsets.UTF_8)
      } finally in.close()
      txt.trim.split('\t') match {
        case Array(kind, v) => Some(RefInfo(name, kind, v.toLong))
        case _              => None // torn/foreign file: ignore, never explode
      }
    }
  }

  /** Create an immutable tag at `version` (default: head). The tagged
    * version is pinned: [[vacuum]] keeps it and its files regardless of
    * `keepVersions` until the tag is dropped.
    */
  def createTag(name: String, version: Option[Long] = None): Long = {
    requireRefName(name)
    val v = version.getOrElse(currentVersion.getOrElse(
      throw new java.io.FileNotFoundException(
        s"createTag: no committed version under $tableRoot")))
    require(committedVersions.contains(v),
      s"createTag: version $v is not retained under $tableRoot " +
        s"(have: ${committedVersions.sorted.mkString(", ")})")
    hfs.mkdirs(refsDir)
    if (!store.putIfAbsent(new Path(refsDir, name),
        s"tag\t$v".getBytes(StandardCharsets.UTF_8)))
      throw new IllegalArgumentException(
        s"createTag: ref '$name' already exists under $tableRoot")
    // a concurrent vacuum may have read refs BEFORE this tag landed and
    // collected v — fail loudly rather than hand back a dangling tag
    if (!hfs.exists(manifestPath(v))) {
      hfs.delete(new Path(refsDir, name), false)
      throw new java.io.IOException(
        s"createTag: version $v of $tableRoot was vacuumed mid-create; " +
          "re-tag a retained version")
    }
    v
  }

  /** Fork a zero-copy branch at `version` (default: head): a shallow
    * clone under `_branches/<name>` whose writers pool into their own
    * dir ([[cloneFrom]] semantics and refusals — the main table must be
    * unpartitioned and DV-free). Main's declared CHECK constraints and
    * clustering carry onto the branch so audited writes meet the same
    * contracts they'll be published under.
    */
  def createBranch(name: String, version: Option[Long] = None): Long = {
    requireRefName(name)
    require(ref(name).isEmpty,
      s"createBranch: ref '$name' already exists under $tableRoot")
    val root = branchDir(name)
    // Each create clones into its OWN `.tmp-*` dir and only touches the
    // shared branch dir AFTER winning the atomic ref: the old in-place
    // clone raced destructively — creator B's pre-clean of branchDir
    // could wipe creator A's in-flight clone, and the putIfAbsent
    // loser's cleanup deleted the winner's just-registered dir, leaving
    // a ref on a missing root. Crashed creators' tmp dirs age out below.
    sweepBranchTmp()
    val v = version.getOrElse(currentVersion.getOrElse(
      throw new java.io.FileNotFoundException(
        s"createBranch: no committed version under $tableRoot")))
    // every pool root the fork will reference (same derivation as
    // cloneFrom's marker registration) — needed to move/retire the
    // vacuum-protection markers when the tmp clone renames into place
    val srcData = new Path(tableRoot, "data")
    val roots = manifestLines(v)
      .filterNot(l => l.startsWith("#") || l.startsWith("-"))
      .map { l =>
        val n = l.split('\t').head
        if (isAbsoluteName(n)) n else new Path(srcData, n).toString
      }
      .flatMap(dataRootOf).map(_.stripSuffix("/data")).toSet
    val tmp = new Path(tableRoot,
      s"_branches/.tmp-$name-${java.util.UUID.randomUUID().toString.take(8)}")
    val bl = new CommitLog(spark, tmp.toString)
    def dropTmp(): Unit = {
      roots.foreach(deregisterCloneAt(_, tmp.toString))
      hfs.delete(tmp, true): Unit
    }
    try {
      bl.cloneFrom(tableRoot, Some(v)): Unit
      // table contracts ride along (one manifest write, no data scan — the
      // rows already satisfied them on main at the fork point)
      val hdr = manifestLines(v).filter(l =>
        l.startsWith("#check:") || l.startsWith("#cluster:"))
      if (hdr.nonEmpty)
        bl.publish(2, bl.stamped("clone", hdr ++ bl.manifestLines(1))): Unit
    } catch { case e: Throwable => dropTmp(); throw e }
    // Two-phase publish so a visible ref ALWAYS implies its root exists
    // (readers never race the rename): (1) an atomic PENDING claim under
    // `_refs/.pending/` makes the shared branch root exclusively ours,
    // (2) the fully-built clone renames into place, (3) the real ref
    // publishes LAST. Every step is putIfAbsent/rename — no torn writes.
    // A crashed creator's claim ages out with its tmp dir (sweep above).
    hfs.mkdirs(pendingRefsDir)
    val claim = new Path(pendingRefsDir, name)
    if (!store.putIfAbsent(claim,
        s"branch\t$v".getBytes(StandardCharsets.UTF_8))) {
      dropTmp()
      throw new IllegalArgumentException(
        s"createBranch: a create of '$name' is already in flight under " +
          s"$tableRoot (a crashed creator's claim ages out within an hour)")
    }
    // Holding the claim, the final root is exclusively ours. Final-root
    // markers land BEFORE the rename so vacuum protection never lapses
    // (the tmp markers still resolve until the swap completes); a
    // ref-less orphan dir from a crashed creator clears here, under the
    // claim, where no live create can be inside it.
    roots.foreach(registerCloneAt(_, root.toString))
    if (hfs.exists(root)) hfs.delete(root, true)
    if (!hfs.rename(tmp, root)) {
      roots.foreach(deregisterCloneAt(_, root.toString))
      dropTmp()
      hfs.delete(claim, false): Unit
      throw new java.io.IOException(
        s"createBranch: could not move $tmp into place as $root")
    }
    roots.foreach(deregisterCloneAt(_, tmp.toString))
    // root complete and in place: publish the ref (a tag created under
    // the same name while we built loses us the race — roll back fully)
    hfs.mkdirs(refsDir)
    if (!store.putIfAbsent(new Path(refsDir, name),
        s"branch\t$v".getBytes(StandardCharsets.UTF_8))) {
      roots.foreach(deregisterCloneAt(_, root.toString))
      hfs.delete(root, true): Unit
      hfs.delete(claim, false): Unit
      throw new IllegalArgumentException(
        s"createBranch: ref '$name' already exists under $tableRoot")
    }
    hfs.delete(claim, false): Unit
    v
  }

  /** Remove `.tmp-*` branch-clone dirs and `.pending` create claims
    * older than an hour (a live [[createBranch]] completes in seconds;
    * an aged tmp or claim is a crashed creator), retiring the clone
    * markers the tmp dirs registered.
    */
  private def sweepBranchTmp(): Unit = {
    if (hfs.exists(pendingRefsDir)) {
      val claimCutoff = System.currentTimeMillis() - 60L * 60 * 1000
      hfs.listStatus(pendingRefsDir).foreach { st =>
        if (st.isFile && st.getModificationTime <= claimCutoff)
          hfs.delete(st.getPath, false): Unit
      }
    }
    val dir = new Path(tableRoot, "_branches")
    if (!hfs.exists(dir)) return
    val cutoff = System.currentTimeMillis() - 60L * 60 * 1000
    hfs.listStatus(dir).foreach { st =>
      if (st.isDirectory && st.getPath.getName.startsWith(".tmp-") &&
          st.getModificationTime <= cutoff) {
        val dead = new CommitLog(spark, st.getPath.toString)
        dead.currentVersion.foreach { dv =>
          dead.manifestLines(dv)
            .filterNot(l => l.startsWith("#") || l.startsWith("-"))
            .flatMap(l => dataRootOf(l.split('\t').head))
            .map(_.stripSuffix("/data")).toSet[String]
            .foreach(deregisterCloneAt(_, st.getPath.toString))
        }
        hfs.delete(st.getPath, true): Unit
      }
    }
  }

  /** Retire one clone marker — the inverse of [[registerCloneAt]]. */
  private def deregisterCloneAt(srcRoot: String, cloneRoot: String): Unit = {
    val marker = new Path(new Path(srcRoot, "_clones"),
      java.net.URLEncoder.encode(cloneRoot, "UTF-8"))
    hfs.delete(marker, false): Unit
  }

  /** The commit log of a branch — the write handle for the audit stage
    * of write-audit-publish.
    *
    * [[createBranch]] publishes the ref LAST (after the fully-built
    * clone renames into the branch root), so a visible branch ref
    * always implies its root exists — no reader ever waits on a rename
    * in flight. A ref over a missing root is therefore a real
    * inconsistency (manual deletion, partial restore) and errors
    * loudly, immediately.
    */
  def branchLog(name: String): CommitLog = {
    val r = ref(name).getOrElse(throw new IllegalArgumentException(
      s"branchLog: no ref '$name' under $tableRoot"))
    require(r.kind == "branch", s"branchLog: ref '$name' is a ${r.kind}")
    val root = branchDir(name)
    if (!hfs.exists(root)) throw new IllegalStateException(
      s"branchLog: ref '$name' exists but its root $root does not — " +
        "the root was removed out-of-band; drop the ref and re-create")
    new CommitLog(spark, root.toString)
  }

  /** Drop a ref. For a branch the whole fork dir goes too; its
    * `_clones/` marker on this table self-cleans at the next vacuum.
    */
  def dropRef(name: String): Unit = {
    val r = ref(name).getOrElse(throw new IllegalArgumentException(
      s"dropRef: no ref '$name' under $tableRoot"))
    hfs.delete(new Path(refsDir, name), false): Unit
    if (r.kind == "branch") hfs.delete(branchDir(name), true): Unit
  }

  /** Publish a branch's state as the main head — the WAP close. Refuses
    * unless main is still exactly at the branch's fork point (a true
    * fast-forward; anything else needs a re-branch or a keyed merge).
    * The branch's own pool files are validated against main's CHECK
    * constraints (O(new files), never O(table)) and adopted by rename;
    * unchanged files were main's all along (absolute refs fold back to
    * relative names). One conditional manifest publish makes the switch
    * atomic; losing it to a concurrent commit rolls the renames back
    * and leaves the branch intact. Success consumes the branch.
    */
  def fastForward(name: String): Long = {
    val r = ref(name).getOrElse(throw new IllegalArgumentException(
      s"fastForward: no ref '$name' under $tableRoot"))
    require(r.kind == "branch", s"fastForward: ref '$name' is a ${r.kind}")
    val bl = branchLog(name)
    val bv = bl.currentVersion.getOrElse(throw new IllegalStateException(
      s"fastForward: branch '$name' has no commits"))
    val lines = bl.manifestLines(bv)
    require(partitionColsOf(lines).isEmpty,
      s"fastForward: branch '$name' is hive-partitioned; publish cannot " +
        "span partition roots — materialize with INSERT OVERWRITE instead")
    require(dvNamesOf(lines).isEmpty,
      s"fastForward: branch '$name' carries merge-on-read deletion " +
        "vectors whose tombstones bind to branch-local file names; fold " +
        "them first: CALL <catalog>.system.rewrite_deletes on the branch")
    val head = currentVersion.getOrElse(throw new java.io.FileNotFoundException(
      s"fastForward: no committed version under $tableRoot"))
    if (head != r.version) throw new IllegalStateException(
      s"fastForward: $tableRoot advanced past the '$name' fork point " +
        s"(${r.version} -> $head) — not a fast-forward; re-branch from the " +
        "head or bring the changes over with a keyed merge")
    val bData = new Path(branchDir(name), "data")
    val myData = dataDir.toUri.getPath
    // split the branch's data lines into its OWN pool files (relative
    // names — the audited new/rewritten data) and references back into
    // main's pool (absolute — untouched since the fork)
    val dataLines = lines.filterNot(_.startsWith("#"))
    val own = dataNamesOf(dataLines).filterNot(isAbsoluteName)
    enforceConstraintsOnPaths(own.map(n => new Path(bData, n)),
      checkOf(manifestLines(head)), s"fastForward('$name')")
    hfs.mkdirs(dataDir)
    val moved = scala.collection.mutable.ArrayBuffer.empty[(Path, Path)]
    def rollback(): Unit = moved.foreach { case (src, dst) => hfs.rename(dst, src) }
    own.foreach { n =>
      val (src, dst) = (new Path(bData, n), new Path(dataDir, n))
      if (!hfs.rename(src, dst)) {
        rollback()
        throw new java.io.IOException(
          s"fastForward: could not adopt $src into $dataDir")
      }
      moved += ((src, dst))
    }
    val rewritten = dataLines.map { l =>
      val i = l.indexOf('\t')
      val (n0, rest) = if (i < 0) (l, "") else (l.substring(0, i), l.substring(i))
      val p = if (isAbsoluteName(n0)) new Path(n0).toUri.getPath else n0
      if (isAbsoluteName(n0) && p.startsWith(myData + "/"))
        p.stripPrefix(myData + "/") + rest
      else l
    }
    // clone-of-clone chains: a line may still point at a THIRD root;
    // register main there so that root's vacuum keeps the file live
    dataNamesOf(rewritten).filter(isAbsoluteName)
      .flatMap(dataRootOf).map(_.stripSuffix("/data")).toSet[String]
      .foreach(registerCloneAt(_, tableRoot))
    // standing table contracts stay MAIN's (txn memory, constraints,
    // clustering); the branch ships data, not DDL
    val carried = replaceCarried(manifestLines(head))
    if (!publish(head + 1, stamped("fast_forward", carried ++ rewritten))) {
      rollback()
      throw new IllegalStateException(
        s"fastForward: a concurrent commit advanced $tableRoot past $head " +
          s"— not a fast-forward anymore; re-branch and retry")
    }
    hfs.delete(new Path(refsDir, name), false): Unit
    hfs.delete(branchDir(name), true): Unit
    head + 1
  }

  /** Partitioned twin of [[commitStaged]] for the SQL row-level rewrite:
    * Spark's V2 parquet batch write stages FLAT files (it cannot lay out
    * hive dirs), so the staged rows are read back and re-staged under
    * `partitionCols` subdirs before the replace publishes. Costs one
    * extra write of the post-merge rows — the price of keeping the
    * partition layout (and its pruning) through SQL MERGE/UPDATE instead
    * of refusing; the file-pruned single-write path is the DataFrame
    * plane ([[merge]]). An empty stage is a legal truncate-to-empty
    * (the schema comes from the current head).
    */
  def commitStagedPartitioned(stageDir: String, partitionCols: Seq[String]): Long = {
    val stage = new Path(stageDir)
    val hasParts = hfs.exists(stage) && hfs.listStatus(stage)
      .exists(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val df =
      if (hasParts) spark.read.parquet(stage.toString)
      // readVersion, not read(): a transform-partitioned head must keep
      // its derived layout columns through the empty-truncate restage
      else readVersion(currentVersion.getOrElse(
        throw new java.io.FileNotFoundException(
          s"commitStagedPartitioned: no committed version under $tableRoot")))
        .where(org.apache.spark.sql.functions.lit(false))
    val ver = commitPartitioned(df, partitionCols, replace = true)
    hfs.delete(stage, true)
    ver
  }

  /** Publish version `v` with exactly these manifest lines, through the
    * store's conditional create. False = lost the race; the caller
    * re-reads the head and retries. No rename of the manifest name is
    * ever involved, so the protocol holds on substrates without atomic
    * rename (object stores) given a conditional-put [[LogStore]].
    */
  private def publish(v: Long, lines: Seq[String]): Boolean = {
    enforceFence(lines)   // a fenced stale primary must bounce, not fork
    hfs.mkdirs(commitsDir)
    val won = store.putIfAbsent(manifestPath(v), LogStore.lines(lines))
    if (won) {
      writeHeadHint(v)   // best-effort; stale-low is self-healing
      maintainBloomIndexes(v, lines)
      maintainAnnIndexes(v, lines)
      autoEnforceTtl(lines)
      autoRewriteDeletes(lines)
      autoCompact(lines)
      autoVacuum()
    }
    won
  }

  private val compacting: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)

  /** Maintenance knob resolution: the SESSION conf wins (operator
    * override), else the table's own TBLPROPERTIES sidecar — the
    * declared-once-on-the-table posture: a retention or compaction
    * policy set via `ALTER TABLE ... SET TBLPROPERTIES` is honored by
    * EVERY writer session, not just the one that remembered to set a
    * conf. Props are read once per CommitLog handle (a knob changed
    * mid-handle applies from the next handle — maintenance hooks are
    * best-effort by contract).
    */
  private lazy val tableProps: Map[String, String] =
    try GraftTableCatalog.readProps(spark, tableRoot)
    catch { case scala.util.control.NonFatal(_) => Map.empty }

  /** Declare (merge into) this table's `TBLPROPERTIES` sidecar
    * (`_props.json` — the same file the V2 catalog's `ALTER TABLE ...
    * SET TBLPROPERTIES` writes), for tables addressed by root rather
    * than by catalog identifier. The table-scoped way to declare
    * maintenance policies ([[maintenanceConf]]): a knob set here is
    * honored by EVERY writer session and never leaks into other tables'
    * commits the way a session conf does. Props are read once per
    * CommitLog handle — set them before the handle's first
    * maintenance-triggering publish, or use a fresh handle.
    */
  def setProperties(props: Map[String, String]): Unit =
    // the read-merge-write cycle serializes per table root within this
    // JVM (concurrent merges must not lose each other's keys) and the
    // publish is temp-file + atomic rename (a racing reader must never
    // parse a torn sidecar and silently latch empty props for its
    // handle's lifetime)
    CommitLog.sidecarLock(tableQualifiedRoot).synchronized {
      val merged = (try GraftTableCatalog.readProps(spark, tableRoot)
        catch { case scala.util.control.NonFatal(_) => Map.empty[String, String] }) ++ props
      LogStore.writeAtomic(hfs, new Path(tableRoot, "_props.json"),
        org.json4s.jackson.JsonMethods.compact(
          org.json4s.jackson.JsonMethods.render(
            org.json4s.JObject(merged.toList.sortBy(_._1).map {
              case (k, v) => k -> org.json4s.JString(v)
            }))).getBytes(StandardCharsets.UTF_8))
    }

  private def maintenanceConf(key: String, default: String): String =
    spark.conf.getOption(key).orElse(tableProps.get(key)).getOrElse(default)

  /** Best-effort publish-time small-file compaction (opt-in:
    * `spark.graft.autoCompact.minSmallFiles=N`; unset/0 disables): once
    * a commit leaves >= N data files below
    * `spark.graft.autoCompact.targetBytes` (default 128 MB) in the new
    * manifest, run the incremental [[compact]] — the lakehouse
    * auto-compaction posture, closing the maintenance loop the TTL and
    * index hooks already cover so a streaming writer's small files fold
    * without a scheduler. The small-file census reads the manifest's
    * commit-time `_b` byte tags — ZERO filesystem calls on the hook's
    * fast path. Conservative by construction: a snapshot carrying
    * merge-on-read tombstones is skipped (its debt folds through
    * [[rewriteDeletes]] on the owner's schedule — the hook must never
    * escalate a cheap append into a full-table rewrite), failures
    * degrade to the manual `compact()` path, and the reentrancy guard
    * keeps the compaction's own publish from recursing.
    */
  private def autoCompact(lines: Seq[String]): Boolean = {
    if (compacting.get()) return false
    try {
      val minSmall =
        maintenanceConf("spark.graft.autoCompact.minSmallFiles", "0").toInt
      if (minSmall <= 0) return false
      if (dvNamesOf(lines).nonEmpty) return false
      val target = maintenanceConf("spark.graft.autoCompact.targetBytes",
        String.valueOf(128L * 1024 * 1024)).toLong
      val small = lines.count { l =>
        if (l.startsWith("#") || l.startsWith("-")) false
        else {
          val p = l.split('\t')
          !isAbsoluteName(p.head) && p.length > 1 &&
            lineMeta(p(1))._2.exists(_ < target)
        }
      }
      if (small < minSmall) return false
      compacting.set(true)
      try { val (b, a) = compact(target); a < b }
      finally compacting.set(false)
    } catch { case scala.util.control.NonFatal(_) => false }
  }

  // reentrancy guard: maintenance triggered from a vacuum-adjacent
  // publish must not re-enter the sweep
  private val vacuumRunning: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)

  /** Best-effort publish-time vacuum (opt-in:
    * `spark.graft.vacuum.retentionMs=N`, session conf or TBLPROPERTIES;
    * unset/0 disables): versions older than the declared retention drop
    * — and their unreferenced pool files, `_tmp` staging orphans,
    * superseded index builds, and consumer-released `_cdf` staging
    * reclaim — as commits land, the last maintenance plane that still
    * required an operator's cron. The fast path is ONE metadata probe
    * (the oldest retained manifest's mtime); the full sweep runs only
    * when the window has actually released a version. `keepVersions` is
    * derived so every version younger than the horizon is retained:
    * the policy reclaims only what the declared window has released,
    * and every guard [[vacuum]] itself enforces — tag pins, the clone
    * registry, the in-flight file-age floor, the young-version refusal
    * — stays in force (a refusal, like any hook failure, degrades
    * silently to the manual `vacuum()` path).
    */
  private def autoVacuum(): Boolean = {
    if (vacuumRunning.get()) return false
    try {
      val retention =
        maintenanceConf("spark.graft.vacuum.retentionMs", "0").toLong
      if (retention <= 0) return false
      val versions = committedVersions.sorted
      if (versions.length <= 1) return false
      val horizon = System.currentTimeMillis() - retention
      if (commitTime(versions.head) > horizon) return false // oldest still young
      // mirror vacuum's own pin set: a tag-pinned version past the
      // horizon is NOT droppable, so it must not keep the hook from
      // short-circuiting — otherwise every publish after the pin pays a
      // full sweep (recursive listing + live-set build) that reclaims
      // nothing
      val pinned = refs.valuesIterator.collect {
        case r if r.kind == "tag" => r.version
      }.toSet
      val droppable = versions.dropRight(1)
        .count(v => !pinned(v) && commitTime(v) <= horizon)
      if (droppable == 0) return false
      vacuumRunning.set(true)
      try {
        val (m, f) = vacuum(keepVersions = versions.length - droppable,
          minVersionAgeMs = retention)
        m + f > 0
      } finally vacuumRunning.set(false)
    } catch { case scala.util.control.NonFatal(_) => false }
  }

  // reentrancy guard: the fold's own publish must not recurse
  private val deleteFolding: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)

  /** Best-effort publish-time tombstone fold (opt-in:
    * `spark.graft.rewriteDeletes.maxDebtRatio=R`, session conf or
    * TBLPROPERTIES; unset/0 disables): once a commit leaves
    * deletion-vector rows >= R × the live data rows, run
    * [[rewriteDeletes]] — closing the one maintenance plane the
    * auto-compact / auto-TTL / index hooks did not yet cover. Without
    * it the standing-CDC-replica steady state degrades monotonically:
    * [[applyChangesMoR]] appends (file,pos) tombstones every drained
    * version and folding was manual-only (`CALL
    * graft.system.rewrite_deletes`), so a replica drained every few
    * minutes accumulates unbounded anti-join read debt until an
    * operator remembers. The debt census reads the manifest's
    * commit-time `_n` row tags on the `-`-prefixed DV lines vs the data
    * lines — ZERO filesystem calls on the fast path. Same contract as
    * the sibling hooks: the triggering commit already stands, ANY
    * failure degrades to the (still-correct) merge-on-read scan plus
    * the manual fold path, and the reentrancy guard keeps the fold's
    * own publish from recursing. Composes with [[autoCompact]]: that
    * hook deliberately skips tombstoned snapshots, but the FOLD's
    * publish carries no DV lines, so its small-file census runs — a
    * replica past both thresholds folds and compacts in one publish
    * cascade.
    */
  private def autoRewriteDeletes(lines: Seq[String]): Boolean = {
    if (deleteFolding.get()) return false
    try {
      val ratio = maintenanceConf(
        "spark.graft.rewriteDeletes.maxDebtRatio", "0").toDouble
      if (ratio <= 0) return false
      def rowsOf(l: String): Long = {
        val p = l.split('\t')
        if (p.length > 1) lineMeta(p(1))._1.getOrElse(0L) else 0L
      }
      val debt = lines.filter(_.startsWith("-"))
        .map(l => rowsOf(l.stripPrefix("-"))).sum
      if (debt == 0L) return false
      val data = lines
        .filterNot(l => l.startsWith("#") || l.startsWith("-"))
        .map(rowsOf).sum
      // the declared ratio is debt vs LIVE rows: stored rows still count
      // their already-tombstoned copies, so dividing by `data` would
      // understate the ratio (debt/(live+debt)) exactly when debt is
      // heaviest and the fold matters most
      val live = math.max(data - debt, 1L)
      if (debt.toDouble < ratio * live.toDouble) return false
      deleteFolding.set(true)
      try { rewriteDeletes(): Unit; true }
      finally deleteFolding.set(false)
    } catch { case scala.util.control.NonFatal(_) => false }
  }

  // reentrancy guard: the enforcement's own publish must not recurse
  private val ttlEnforcing: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)

  /** Best-effort publish-time TTL enforcement (opt-in:
    * `spark.graft.ttl.autoEnforce=true`): a table carrying a standing
    * `#ttl:` policy expires its aged rows as commits land — the declared
    * "engine applies retention" posture with no scheduler in the loop
    * (reference grounding: asset registries carry lifecycle config the
    * platform, not an operator, applies). Same contract as the index
    * hooks above: the triggering commit already stands, enforcement is
    * usually a metadata-only manifest edit (stats-tier whole-file drops),
    * and ANY failure degrades to the manual `CALL enforce_ttl` path —
    * never a failed commit, never a wrong answer.
    */
  private def autoEnforceTtl(lines: Seq[String]): Boolean = {
    if (ttlEnforcing.get()) return false
    try {
      if (maintenanceConf("spark.graft.ttl.autoEnforce", "false") != "true")
        return false
      if (!lines.exists(_.startsWith("#ttl:"))) return false
      // deterministic-maintenance escape hatch: `spark.graft.ttl.asOfMs`
      // pins the enforcement clock (tests, replayed pipelines, frozen
      // benchmarks); production leaves it unset = wall clock
      val asOf = maintenanceConf("spark.graft.ttl.asOfMs", "").trim match {
        case "" => System.currentTimeMillis()
        case s  => s.toLong
      }
      ttlEnforcing.set(true)
      try { val (d, r) = enforceTtl(asOf); d + r > 0 }
      finally ttlEnforcing.set(false)
    } catch { case scala.util.control.NonFatal(_) => false }
  }

  /** Apply every maintenance policy this table DECLARES (session conf
    * or TBLPROPERTIES) against the CURRENT head — the cold-table
    * companion to the publish-time hooks. Every hook fires only on the
    * commit path, so a table that stops receiving writes right after a
    * heavy MoR/CDC burst keeps its tombstone debt, small files, and
    * expired-TTL rows forever; one `maintain()` call (or `CALL
    * graft.system.maintain_all(ns)` walking a whole namespace) services
    * that debt under the exact same opt-in knobs, reentrancy guards,
    * zero-FS-call censuses, and degrade-to-manual contracts the hooks
    * use — a table with no declared policy is NEVER touched. The order
    * mirrors the publish cascade (TTL can create tombstones and small
    * files; the fold's rewrite feeds the small-file census; vacuum
    * last reclaims what the others superseded), re-reading the head
    * between planes because each one may publish. Returns the planes
    * that acted.
    */
  def maintain(): Seq[String] = {
    if (currentVersion.isEmpty) return Seq.empty
    val acted = scala.collection.mutable.ArrayBuffer.empty[String]
    def headLines = currentVersion.map(manifestLines).getOrElse(Seq.empty)
    if (autoEnforceTtl(headLines)) acted += "ttl"
    if (autoRewriteDeletes(headLines)) acted += "rewrite_deletes"
    if (autoCompact(headLines)) acted += "compact"
    if (autoVacuum()) acted += "vacuum"
    acted.toSeq
  }

  /** Pool files among `lines` that CONTAIN at least one of `keys`:
    * footer-stats range overlap first (no I/O, pure driver metadata the
    * manifest already holds), then an exact semi-join with
    * `input_file_name()` over just the candidates, reduced to ONE
    * aggregated row (`collect_set` of file names, map-side combined) —
    * per-file rows never materialize on the driver, and the fetched
    * array is bounded by the candidate count, which is itself bounded
    * by `refineCap`: past the cap the exact refinement is skipped and
    * the stats-overlap set stands as the touched set (correct — a
    * candidate with no matched key is rewritten byte-identical — at the
    * price of extra rewrite, the right trade once the refinement scan
    * itself would rival the rewrite it prunes).
    */
  /** Candidate-count ceiling above which touched-file discovery trusts
    * footer stats alone (no exact refinement scan). Overridable for
    * tests and for tables whose clustering makes stats near-exact.
    */
  protected def touchRefineCap: Int = 4096

  /** Ceiling on driver-fetched distinct file NAMES ([[collectNames]]).
    * The manifest itself is driver-resident O(files), so any in-bounds
    * fetch is dominated by state the driver already holds; the cap is a
    * loud backstop against a runaway set (a 100 TB table at 128 MB
    * files is ~10⁶ names — the default leaves 4× headroom). Overridable
    * for tests.
    */
  protected def nameCollectCap: Int = 4 * 1024 * 1024

  /** Distinct values of `c`, fetched as ROWS with a map-side-combined
    * distinct — never `collect_set` into one giant array cell (a single
    * row whose one value holds every name trips driver single-object
    * limits long before the same names as a row stream would). Throws
    * loudly past [[nameCollectCap]] instead of OOMing the driver.
    */
  private def collectNames(df: DataFrame, c: String, what: String): Set[String] = {
    val cap = nameCollectCap
    val rows = df.select(col(c)).filter(col(c).isNotNull)
      .distinct().limit(cap + 1).collect()
    if (rows.length > cap) throw new IllegalStateException(
      s"$what: more than $cap distinct file names under $tableRoot — " +
        "refusing to materialize the set on the driver; compact the table " +
        "or raise nameCollectCap")
    rows.iterator.map(_.getString(0)).toSet
  }

  private def findTouched(lines: Seq[String], stats: Map[String, Map[String, ColStats]],
      keys: DataFrame, keyCol: String, refineCap: Int = touchRefineCap,
      partTypes: Map[String, String] = Map.empty): Set[String] = {
    val bounds = keys.agg(org.apache.spark.sql.functions.min(keyCol),
      org.apache.spark.sql.functions.max(keyCol)).head()
    if (bounds.isNullAt(0)) Set.empty
    else {
      val (lo, hi) = (bounds.get(0), bounds.get(1))
      val candidates = lines.filterNot(l => l.startsWith("#") || l.startsWith("-"))
        .map(_.split('\t').head).filter { n =>
          stats.get(n).flatMap(_.get(keyCol)).forall(_.overlaps(lo, hi))
        }
      if (candidates.isEmpty) Set.empty
      else if (candidates.length > refineCap) candidates.toSet
      else {
        // the refine scan yields LEAF paths (input_file metadata); on a
        // hive-partitioned pool the manifest names carry subdirs, so map
        // leaves back (leaves are uuid-unique across partition subdirs).
        // basePath keeps partition columns readable when keyCol IS one,
        // and the castParts pin makes their type match the key frame's
        // instead of drifting with path inference over the read set.
        val byLeaf = candidates.map(n => leafOf(n) -> n).toMap
        collectNames(
          castParts(poolReader(candidates)
            .parquet(candidates.map(n => new Path(dataDir, n).toString): _*),
            partTypes)
            .withColumn("_graft_file", input_file_name())
            .join(keys, Seq(keyCol), "semi"),
          "_graft_file", "findTouched")
          .flatMap(p => byLeaf.get(leafOf(p)))
      }
    }
  }

  // ---- manifest stats encoding (json4s ships with Spark) -----------------

  /** Per-line stats json: column bounds plus the file's exact row count
    * (`_n`) and byte size (`_b`), both known for free at commit time (the
    * footer is already open, the FileStatus already listed). They make
    * [[snapshotStats]] a pure manifest read — the planner's size/row
    * estimates never re-list the pool. `_n`/`_b` are JSON numbers, which
    * [[parseStats]]'s object-only collect skips, so old manifests and new
    * readers interoperate both ways.
    */
  private def statsJson(st: Map[String, ColStats], rows: Long, bytes: Long): String = {
    import org.json4s._
    import org.json4s.JsonDSL._
    val fields = JField("_n", JInt(rows)) :: JField("_b", JInt(bytes)) ::
      st.toSeq.sortBy(_._1).map { case (c, s) =>
        JField(c, ("t" -> s.tpe) ~ ("mn" -> s.min) ~ ("mx" -> s.max))
      }.toList
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(JObject(fields)))
  }

  /** (_n, _b) of one stats json, absent on pre-tag manifests. */
  private def lineMeta(json: String): (Option[Long], Option[Long]) =
    org.json4s.jackson.JsonMethods.parse(json) match {
      case org.json4s.JObject(fields) =>
        val m = fields.toMap
        def num(k: String): Option[Long] = m.get(k).collect {
          case org.json4s.JInt(n) => n.toLong
        }
        (num("_n"), num("_b"))
      case _ => (None, None)
    }

  /** Exact (bytes, rows) of a retained version. Bytes/rows come from the
    * manifest's commit-time `_n`/`_b` tags — zero filesystem calls on the
    * planner path (at 100 TB, re-listing the pool per query would be the
    * cost this avoids); a pre-tag line falls back to one FileStatus call
    * and reports rows as unknown. Rows are also unknown when the version
    * carries merge-on-read tombstones (visible rows < stored rows).
    */
  def snapshotStats(v: Long): (Long, Option[Long]) = {
    val lines = manifestLines(v)
    var bytes = 0L; var rows = 0L; var rowsKnown = dvNamesOf(lines).isEmpty
    lines.iterator.filterNot(l => l.startsWith("#") || l.startsWith("-")).foreach { l =>
      val parts = l.split('\t')
      val (n, b) = if (parts.length > 1) lineMeta(parts(1)) else (None, None)
      bytes += b.getOrElse(
        hfs.getFileStatus(new Path(dataDir, parts(0))).getLen)
      n match { case Some(x) => rows += x; case None => rowsKnown = false }
    }
    (bytes, if (rowsKnown) Some(rows) else None)
  }

  /** Exact snapshot-wide bounds of `column` from the manifest's per-file
    * footer stats, or None unless EVERY data file of version `v` carries
    * a bound for it and the snapshot has no merge-on-read tombstones (a
    * DV could delete the extreme row). A file whose footer omitted the
    * bound — all-NULL column, pre-stats commit, foreign import — makes
    * the whole answer None: metadata answers are exact or absent, never
    * a guess.
    */
  private[graft] def snapshotBounds(v: Long, column: String): Option[ColStats] = {
    val lines = manifestLines(v)
    if (dvNamesOf(lines).nonEmpty) return None
    val names = dataNamesOf(lines)
    if (names.isEmpty) return None
    val stats = fileStatsOf(lines)
    val bounds = names.map(n => stats.get(n).flatMap(_.get(column)))
    if (bounds.exists(_.isEmpty)) return None
    Some(bounds.flatten.reduce(ColStats.widen))
  }

  private def parseStats(json: String): Map[String, ColStats] =
    org.json4s.jackson.JsonMethods.parse(json) match {
      case org.json4s.JObject(fields) => fields.collect {
        case (c, org.json4s.JObject(f)) =>
          val m = f.toMap
          def str(k: String) = m(k) match {
            case org.json4s.JString(s) => s
            case other                 => other.values.toString
          }
          c -> ColStats(str("t"), str("mn"), str("mx"))
      }.toMap
      case _ => Map.empty
    }

  /** File-skipping range read: rows of the current version with `column`
    * in [lo, hi], scanning ONLY the pool files whose footer min/max
    * overlap the range — the plain-parquet kernel of Delta/Iceberg data
    * skipping. On a range-clustered 100 TB table this turns a full scan
    * into a handful of file reads; files without recorded stats are
    * conservatively scanned. An empty candidate set short-circuits to an
    * empty frame without touching storage.
    */
  def readBetween(column: String, lo: Any, hi: Any): DataFrame =
    readWhere(Seq((column, lo, hi)))

  /** Conjunctive multi-column file-skipping read: rows with EVERY listed
    * column in its [lo, hi] range, scanning only pool files whose footer
    * stats overlap ALL the ranges — a file is pruned as soon as ONE
    * dimension rules it out, so selectivity multiplies across dimensions.
    * On a 1-D range-clustered table only the cluster column prunes; after
    * [[optimizeZOrder]] every z-ordered dimension carries narrow per-file
    * bounds and a 2-D selective query touches ~(sel_x × sel_y) of the
    * files instead of ~sel_x.
    */
  def readWhere(ranges: Seq[(String, Any, Any)]): DataFrame = {
    require(ranges.nonEmpty, "readWhere: at least one (column, lo, hi) range")
    val v = currentVersion.getOrElse(throw new java.io.FileNotFoundException(
      s"no committed version under $tableRoot"))
    val lines = manifestLines(v)   // one parse serves stats, data, dv names
    val stats = fileStatsOf(lines)
    val names = dataNamesOf(lines)
    val candidates = names.filter { n =>
      ranges.forall { case (c, lo, hi) =>
        stats.get(n).flatMap(_.get(c)).forall(_.overlaps(lo, hi))
      }
    }
    val pred = ranges.map { case (c, lo, hi) => col(c).between(lit(lo), lit(hi)) }
      .reduce(_ && _)
    if (names.isEmpty) readVersion(v)
    // all files pruned: zero-row frame with the table schema, no scan
    // (OptimizeLimitZero folds the limit-0 into an empty relation)
    else if (candidates.isEmpty) readVersion(v).filter(pred).limit(0)
    else readFiles(candidates, dvFrameOf(dvNamesOf(lines)), partTypesOf(lines))
      .filter(pred)
  }

  /** Copy-on-write MERGE (upsert by key): rows of `updates` replace
    * same-key rows and new keys append — but only the pool files that
    * actually CONTAIN a matched key are rewritten; every untouched file is
    * carried into the new manifest by name, stats intact. Touched files
    * are found in two steps: footer-stats range overlap first (no I/O),
    * then an exact semi-join over just the candidate files — so a merge
    * into a range-clustered table costs O(files touched), not O(table),
    * which is what makes daily upserts viable at 100 TB. On a
    * hive-partitioned table the rewrite restages under the partition
    * subdirs (layout and `#partition` header survive); when the merge
    * key is a partition column, the partition-value stats prune the
    * touched set to exactly the hit partitions before any I/O.
    *
    * Concurrency: optimistic — the merge is computed against a head
    * snapshot and published at head+1; if another writer lands first, the
    * whole merge recomputes against the new head (lost work is bounded by
    * the touched-file rewrite). Updates must carry the table's schema;
    * with `evolve = true` the batch may ALSO carry new columns — the
    * table schema widens in the same commit (existing rows read the new
    * columns as NULL through the pool's mergeSchema read; untouched
    * files are never rewritten for a schema change). The upstream-
    * added-a-field case a long-lived CDC pipeline hits first.
    */
  def merge(updates0: DataFrame, keyCol: String, maxAttempts: Int = 5,
      evolve: Boolean = false): Long = {
    // hidden-partition transforms: derive the layout columns for the
    // incoming rows — callers hand SOURCE columns only, never `_p_*`
    val updates = applyTransforms(updates0)
    require(updates.select(keyCol).distinct().count() == updates.count(),
      s"merge: duplicate keys in the updates batch")
    var validatedCs: Map[String, String] = null
    var attempt = 0
    while (attempt < maxAttempts) {
      val v = currentVersion.getOrElse(throw new java.io.FileNotFoundException(
        s"no committed version under $tableRoot"))
      val lines = manifestLines(v)
      val partCols = partitionColsOf(lines)
      val partTypes = partTypesOf(lines)
      val curSchema = readVersion(v).schema
      val cols = curSchema.fieldNames.toSeq
      val newCols = if (evolve) updates.columns.filterNot(cols.contains).toSeq
        else Seq.empty
      if (evolve) {
        val missing = cols.filterNot(updates.columns.contains)
        require(missing.isEmpty, "merge(evolve): updates must still carry " +
          s"every existing column (missing $missing); evolution ADDS columns")
      } else require(updates.columns.toSet == cols.toSet,
        s"merge: updates schema ${updates.columns.toSeq} != table schema $cols")
      val upd = alignTypes(updates, curSchema, "merge")
      val outCols = cols ++ newCols
      val curCs = checkOf(lines)
      if (curCs != validatedCs) { // only the incoming rows can newly violate
        enforceConstraints(upd, curCs, "merge"); validatedCs = curCs
      }
      val keys = upd.select(keyCol).distinct()
      val touched = findTouched(lines, fileStats(v), keys, keyCol, partTypes = partTypes)
      val keptLines = lines.filterNot(l => touched(l.split('\t').head))
      val merged =
        if (touched.isEmpty) upd.select(outCols.map(col): _*)
        // tombstones apply BEFORE the key anti-join: a MoR-deleted row
        // must not resurrect through the rewrite; under evolution the
        // survivors pad the new columns with NULL (allowMissingColumns)
        else readFiles(touched.toSeq.sorted, dvFrame(v), partTypes)
          .join(keys, Seq(keyCol), "left_anti")
          .select(cols.map(col): _*)
          .unionByName(upd.select(outCols.map(col): _*),
            allowMissingColumns = true)
      // pool the rewrite, then publish at exactly v+1: losing the race
      // means the snapshot we merged against is stale, so recompute (the
      // orphaned pool files age out under vacuum's in-flight guard).
      // A hive-partitioned head restages under its partition subdirs
      // (the #partition header rides keptLines), so an upsert into one
      // partition rewrites only that partition's touched files and the
      // layout survives — no flatten, no full-table rewrite.
      val newLines =
        if (partCols.isEmpty) stageToPool(merged, "merge")
        else stagePartitioned(merged, partCols, "merge")
      beforePublish(attempt, v + 1)
      if (publish(v + 1, stamped("merge",
        evolveHeader(keptLines, curSchema, newCols, upd) ++
          newLines))) return v + 1
      racePause(attempt, v + 1)
      attempt += 1
    }
    throw new java.io.IOException(
      s"merge: lost the head race $maxAttempts times under $tableRoot")
  }

  /** Copy-on-write keyed DELETE: drop every row whose `keyCol` is in
    * `keys0`, rewriting ONLY the pool files that contain one (same
    * two-step touched-file discovery and optimistic head+1 publish as
    * [[merge]]). A delete that touches nothing returns the current
    * version without committing — no write amplification for misses.
    * Combined with an aged [[vacuum]] this is the right-to-erasure path:
    * once old versions expire, no surviving pool file holds the key.
    */
  def deleteKeys(keys0: DataFrame, keyCol: String, maxAttempts: Int = 5): Long = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val v = currentVersion.getOrElse(throw new java.io.FileNotFoundException(
        s"no committed version under $tableRoot"))
      val lines = manifestLines(v)
      val partCols = partitionColsOf(lines)
      val partTypes = partTypesOf(lines)
      val cols = readVersion(v).columns.toSeq
      val keys = keys0.select(keyCol).distinct()
      val touched = findTouched(lines, fileStats(v), keys, keyCol, partTypes = partTypes)
      if (touched.isEmpty) return v
      val keptLines = lines.filterNot(l => touched(l.split('\t').head))
      val survivors = readFiles(touched.toSeq.sorted, dvFrame(v), partTypes)
        .join(keys, Seq(keyCol), "left_anti")
        .select(cols.map(col): _*)
      // partitioned survivors restage under their subdirs (see merge)
      val newLines =
        if (partCols.isEmpty) stageToPool(survivors, "delete")
        else stagePartitioned(survivors, partCols, "delete")
      beforePublish(attempt, v + 1)
      if (publish(v + 1, stamped("delete", keptLines ++ newLines))) return v + 1
      racePause(attempt, v + 1)
      attempt += 1
    }
    throw new java.io.IOException(
      s"delete: lost the head race $maxAttempts times under $tableRoot")
  }

  /** Copy-on-write rewrite of exactly the files containing rows matching
    * `cond`, replacing them with their survivors plus (optionally)
    * `extra` rows, in ONE atomic commit — the engine behind the SQL
    * catalog's `DELETE FROM ... WHERE` and filter-overwrite
    * ([[GraftTableCatalog]]). Unlike [[deleteKeys]] (equality on one key
    * column), the predicate is arbitrary, so touched-file discovery is a
    * predicate-pushed scan over the snapshot (parquet row-group stats
    * prune the probe) reduced to a single `collect_set` row of file
    * names — metadata-scale on the driver, never row-scale. Untouched
    * files are carried by name; `#` headers (txn memory) survive.
    */
  def rewriteWhere(cond: org.apache.spark.sql.Column, extra: Option[DataFrame],
      maxAttempts: Int = 5, op: String = "rewrite"): Long = {
    import org.apache.spark.sql.functions.coalesce
    var attempt = 0
    while (attempt < maxAttempts) {
      val v = currentVersion.getOrElse(throw new java.io.FileNotFoundException(
        s"no committed version under $tableRoot"))
      val lines = manifestLines(v)
      val partCols = partitionColsOf(lines)
      val partTypes = partTypesOf(lines)
      val names = files(v)
      val dv = dvFrame(v)
      // discovery runs over the VISIBLE snapshot: a file whose only
      // matching rows are already tombstoned is not touched (no rewrite).
      // Discovery yields LEAF names (what input-file metadata exposes);
      // they normalize to manifest names, exactly (leaves are uuid-unique).
      // castParts pins partition-column types so a predicate on a string
      // partition column compares lexically, matching the stats tier.
      val touchedLeaves: Set[String] =
        if (names.isEmpty) Set.empty
        else collectNames(
          castParts(dv.fold(withPos(names))(d =>
            withPos(names).join(d, DvKeys, "left_anti")), partTypes)
            .filter(cond),
          DvKeys.head, "rewriteWhere")
      val touched = names.filter(n => touchedLeaves(leafOf(n))).toSet
      if (touched.isEmpty && extra.isEmpty) return v
      val keptLines = lines.filterNot(l =>
        !l.startsWith("#") && !l.startsWith("-") && touched(l.split('\t').head))
      // partitioned snapshots restage survivors and extras UNDER their
      // `c=v` subdirs — predicate CoW keeps the layout like merge does
      def stage(df: DataFrame): Seq[String] =
        if (partCols.isEmpty) stageToPool(df, "rewriteWhere")
        else stagePartitioned(df, partCols, "rewriteWhere")
      val survivorLines =
        if (touched.isEmpty) Seq.empty
        else {
          val cols = readVersion(v).columns.toSeq
          val survivors = readFiles(touched.toSeq.sorted, dv, partTypes)
            // SQL DELETE semantics: rows where the predicate is NULL survive
            .filter(!coalesce(cond, lit(false)))
            .select(cols.map(col): _*)
          stage(survivors)
        }
      // survivors cannot newly violate; only the injected rows can
      extra.foreach(enforceConstraints(_, checkOf(lines), "rewriteWhere"))
      // injected rows on a transform-partitioned table carry SOURCE
      // columns only — derive their layout columns before staging
      val extraLines = extra.map(e => stage(applyTransforms(e))).getOrElse(Seq.empty)
      beforePublish(attempt, v + 1)
      if (publish(v + 1, stamped(op,
        keptLines ++ survivorLines ++ extraLines))) return v + 1
      racePause(attempt, v + 1)
      attempt += 1
    }
    throw new java.io.IOException(
      s"rewriteWhere: lost the head race $maxAttempts times under $tableRoot")
  }

  /** `DELETE FROM ... WHERE cond` as a predicate CoW commit. */
  def deleteWhere(cond: org.apache.spark.sql.Column, maxAttempts: Int = 5): Long =
    rewriteWhere(cond, None, maxAttempts, op = "delete")

  /** `UPDATE ... SET col = expr ... WHERE cond` as a predicate CoW
    * commit: only the files containing a matching row are rewritten —
    * matched rows re-stage with the set-expressions applied, the other
    * rows of touched files copy through byte-identical, and every
    * untouched file is carried by name. O(files touched), never
    * O(table): the tier a point update against a large append-mostly
    * table (an audit-log status correction) needs, vs. a whole-table
    * replace that rewrites every byte for one row.
    *
    * Race-safe by construction: each attempt pins the CURRENT head,
    * re-discovers touched files against it, and publishes head+1 with
    * the untouched names carried forward — so an append that wins a
    * version mid-update is re-read and survives the retry (a replace
    * commit, by contrast, stages the stale snapshot once and erases the
    * racer on retry). All set-expressions evaluate against the ORIGINAL
    * row (simultaneous-assignment SQL UPDATE semantics), and a NULL
    * predicate leaves the row unchanged. A no-match update returns the
    * current version without committing.
    */
  def updateWhere(cond: org.apache.spark.sql.Column,
      sets: Seq[(String, org.apache.spark.sql.Column)],
      maxAttempts: Int = 5): Long = {
    import org.apache.spark.sql.functions.{coalesce, when}
    var attempt = 0
    while (attempt < maxAttempts) {
      val v = currentVersion.getOrElse(throw new java.io.FileNotFoundException(
        s"no committed version under $tableRoot"))
      val lines = manifestLines(v)
      val partCols = partitionColsOf(lines)
      val partTypes = partTypesOf(lines)
      val names = files(v)
      val dv = dvFrame(v)
      // discovery over the VISIBLE snapshot, as in rewriteWhere: a file
      // whose only matching rows are tombstoned is not rewritten.
      val touchedLeaves: Set[String] =
        if (names.isEmpty) Set.empty
        else collectNames(
          castParts(dv.fold(withPos(names))(d =>
            withPos(names).join(d, DvKeys, "left_anti")), partTypes)
            .filter(cond),
          DvKeys.head, "updateWhere")
      val touched = names.filter(n => touchedLeaves(leafOf(n))).toSet
      if (touched.isEmpty) return v
      val keptLines = lines.filterNot(l =>
        !l.startsWith("#") && !l.startsWith("-") && touched(l.split('\t').head))
      val cols = readVersion(v).columns.toSeq
      val matched = coalesce(cond, lit(false))
      val setMap = sets.toMap
      // one pass over touched files: every column's new value is chosen
      // against the pre-update row, so SET a=b, b=a swaps correctly
      val rewritten = readFiles(touched.toSeq.sorted, dv, partTypes)
        .select(cols.map { c =>
          setMap.get(c) match {
            case Some(e) => when(matched, e).otherwise(col(c)).as(c)
            case None    => col(c)
          }
        }: _*)
      // validate the rewrite output (only SET rows can newly violate,
      // but the pass is O(touched files) either way — and zero when the
      // table declares no constraints)
      enforceConstraints(rewritten, checkOf(lines), "updateWhere")
      // a SET on a hidden-partition transform's SOURCE column must
      // re-derive the layout column, or the row stays filed under its
      // old partition and pruning silently goes wrong
      val relaid = applyTransforms(rewritten)
      val stagedLines =
        if (partCols.isEmpty) stageToPool(relaid, "updateWhere")
        else stagePartitioned(relaid, partCols, "updateWhere")
      beforePublish(attempt, v + 1)
      if (publish(v + 1, stamped("update", keptLines ++ stagedLines))) return v + 1
      racePause(attempt, v + 1)
      attempt += 1
    }
    throw new java.io.IOException(
      s"updateWhere: lost the head race $maxAttempts times under $tableRoot")
  }

  /** Merge-on-read UPDATE (update vectors): tombstone the old positions
    * of every visible row matching `cond` AND append the updated copies,
    * in ONE atomic commit — no data file is rewritten. Write cost is
    * O(rows updated) (one pooled file of updated rows + one
    * deletion-vector file), not O(files touched × file size): the tier
    * frequent small updates against a 100 TB table need (the audit-log
    * status-correction pattern), where copy-on-write ([[updateWhere]])
    * rewrites a 128 MB file to change one row. This is the Delta/Iceberg
    * DV + re-insert shape composed from the engine's existing planes:
    * the tombstones ride the [[deleteWhereMoR]] read path, the appended
    * rows are ordinary pool files, and the single manifest publish keeps
    * delete+insert atomic — a reader sees the old rows or the new rows,
    * never both, never neither.
    *
    * Set-expressions evaluate against the ORIGINAL row (simultaneous-
    * assignment UPDATE semantics); matching runs against the VISIBLE
    * snapshot, so re-updating a tombstoned row writes nothing. CHECK
    * constraints validate the updated rows; hidden-partition transforms
    * re-derive their layout columns; a SET on a partition column re-files
    * the row under its new partition directory. The read debt folds
    * through the same maintenance ops as MoR deletes
    * ([[rewriteDeletes]] / [[compact]] / [[optimizeBy]]). A no-match
    * update returns the current version without committing. Same
    * optimistic head+1 publish as [[merge]].
    */
  def updateWhereMoR(cond: org.apache.spark.sql.Column,
      sets: Seq[(String, org.apache.spark.sql.Column)],
      maxAttempts: Int = 5): Long = {
    import org.apache.spark.sql.functions.coalesce
    var attempt = 0
    while (attempt < maxAttempts) {
      val v = currentVersion.getOrElse(throw new java.io.FileNotFoundException(
        s"no committed version under $tableRoot"))
      val lines = manifestLines(v)
      val partCols = partitionColsOf(lines)
      val partTypes = partTypesOf(lines)
      val names = files(v)
      if (names.isEmpty) return v
      val visible = dvFrame(v).fold(withPos(names))(d =>
        withPos(names).join(d, DvKeys, "left_anti"))
      // matched rows carry their (file, pos) keys AND their data columns:
      // one frame feeds both the tombstones and the updated copies (the
      // deterministic filter + stable row_index make the two passes agree).
      // A NONdeterministic predicate (rand(), current_timestamp) would
      // let the two jobs tombstone one row set and append another inside
      // the "atomic" commit — pin the match set once in that case.
      val matched0 = castParts(visible, partTypes).filter(coalesce(cond, lit(false)))
      val condDeterministic = matched0.queryExecution.analyzed.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.deterministic
      }.forall(identity)
      val matched = if (condDeterministic) matched0 else matched0.localCheckpoint()
      val dvStaged = stageToPool(matched.select(DvKeys.map(col): _*), "updateWhereMoR")
      if (dvStaged.isEmpty) return v
      val cols = readVersion(v).columns.toSeq
      val setMap = sets.toMap
      val updated = matched.select(cols.map { c =>
        setMap.get(c) match {
          case Some(e) => e.as(c)
          case None    => col(s"`$c`")
        }
      }: _*)
      enforceConstraints(updated, checkOf(lines), "updateWhereMoR")
      val relaid = applyTransforms(updated)
      val dataStaged =
        if (partCols.isEmpty) stageToPool(relaid, "updateWhereMoR")
        else stagePartitioned(relaid, partCols, "updateWhereMoR")
      beforePublish(attempt, v + 1)
      if (publish(v + 1, stamped("update_mor",
        lines ++ dataStaged ++ dvStaged.map("-" + _)))) return v + 1
      racePause(attempt, v + 1)
      attempt += 1
    }
    throw new java.io.IOException(
      s"updateWhereMoR: lost the head race $maxAttempts times under $tableRoot")
  }

  /** Merge-on-read DELETE: record (file, position) tombstones for every
    * visible row matching `cond` — NO data file is rewritten. The write
    * cost is O(rows deleted), not O(files touched × file size), which is
    * the tier a 100 TB table needs for frequent small deletes (GDPR
    * erasure drips, late-data retractions) where copy-on-write
    * ([[deleteWhere]]) would rewrite a 128 MB file per tombstoned row.
    * Reads apply tombstones as a broadcast anti-join ([[readFiles]]);
    * the read debt is bounded by [[rewriteDeletes]] / [[compact]] /
    * [[optimizeBy]], all of which fold tombstones in and drop them.
    *
    * Matching runs against the VISIBLE snapshot (existing tombstones
    * applied), so re-deleting an already-deleted row writes nothing and
    * the change feed never reports a double delete. A delete that
    * matches nothing returns the current version without committing.
    * Same optimistic head+1 publish as [[merge]].
    */
  def deleteWhereMoR(cond: org.apache.spark.sql.Column, maxAttempts: Int = 5): Long = {
    import org.apache.spark.sql.functions.coalesce
    var attempt = 0
    while (attempt < maxAttempts) {
      val v = currentVersion.getOrElse(throw new java.io.FileNotFoundException(
        s"no committed version under $tableRoot"))
      val names = files(v)
      if (names.isEmpty) return v
      val visible = dvFrame(v).fold(withPos(names))(d =>
        withPos(names).join(d, DvKeys, "left_anti"))
      val tombs = visible.filter(coalesce(cond, lit(false)))
        .select(DvKeys.map(col): _*)
      val staged = stageToPool(tombs, "deleteWhereMoR")
      if (staged.isEmpty) return v
      beforePublish(attempt, v + 1)
      if (publish(v + 1, stamped("delete_mor",
        manifestLines(v) ++ staged.map("-" + _)))) return v + 1
      racePause(attempt, v + 1)
      attempt += 1
    }
    throw new java.io.IOException(
      s"deleteWhereMoR: lost the head race $maxAttempts times under $tableRoot")
  }

  /** Merge-on-read keyed DELETE: tombstone every visible row whose
    * `keyCol` is in `keys0`. Footer stats bound the probe the same way
    * they bound [[deleteKeys]] — only files whose [min,max] overlaps the
    * key range are scanned for positions — but nothing is rewritten.
    */
  def deleteKeysMoR(keys0: DataFrame, keyCol: String, maxAttempts: Int = 5): Long = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val v = currentVersion.getOrElse(throw new java.io.FileNotFoundException(
        s"no committed version under $tableRoot"))
      val names = files(v)
      if (names.isEmpty) return v
      val keys = keys0.select(keyCol).distinct()
      val bounds = keys.agg(org.apache.spark.sql.functions.min(keyCol),
        org.apache.spark.sql.functions.max(keyCol)).head()
      if (bounds.isNullAt(0)) return v
      val stats = fileStats(v)
      val candidates = names.filter { n =>
        stats.get(n).flatMap(_.get(keyCol))
          .forall(_.overlaps(bounds.get(0), bounds.get(1)))
      }
      if (candidates.isEmpty) return v
      val visible = dvFrame(v).fold(withPos(candidates))(d =>
        withPos(candidates).join(d, DvKeys, "left_anti"))
      val tombs = visible.join(keys, Seq(keyCol), "semi")
        .select(DvKeys.map(col): _*)
      val staged = stageToPool(tombs, "deleteKeysMoR")
      if (staged.isEmpty) return v
      beforePublish(attempt, v + 1)
      if (publish(v + 1, stamped("delete_mor",
        manifestLines(v) ++ staged.map("-" + _)))) return v + 1
      racePause(attempt, v + 1)
      attempt += 1
    }
    throw new java.io.IOException(
      s"deleteKeysMoR: lost the head race $maxAttempts times under $tableRoot")
  }

  /** Merge-on-read MERGE (merge vectors): tombstone the old positions of
    * every visible row whose `keyCol` matches the batch AND append the
    * whole updates batch (replaced rows + new-key inserts), in ONE atomic
    * commit — no data file is rewritten. Write cost is O(rows in the
    * batch) (one pooled file of applied rows + one deletion-vector file),
    * not O(files touched × file size): the tier a continuously-applied
    * CDC upsert against a 100 TB table needs (the reference's guarded
    * upsert, reference lambda_function.py:33-44, run as a stream), where
    * copy-on-write [[merge]] rewrites a 128 MB file per small batch.
    *
    * Composition of proven planes: the tombstone probe is
    * [[deleteKeysMoR]]'s footer-stats-bounded semi-join (only files whose
    * [min,max] overlaps the batch's key range are scanned for positions),
    * the appended rows are ordinary pool files with CHECK constraints and
    * hidden-partition transforms applied ([[updateWhereMoR]]'s write
    * side), and the single manifest publish keeps delete+insert atomic —
    * a reader sees the pre-merge rows or the post-merge rows, never both.
    * The read debt folds through [[rewriteDeletes]] / [[compact]] /
    * [[optimizeBy]] like every MoR commit; [[changesBetween]] nets the
    * merge as tombstone-deletes + added-file inserts with no special
    * casing. An empty batch returns the current version without
    * committing. Same optimistic head+1 publish as [[merge]].
    */
  def mergeMoR(updates0: DataFrame, keyCol: String, maxAttempts: Int = 5,
      evolve: Boolean = false): Long = {
    val updates = applyTransforms(updates0)
    require(updates.select(keyCol).distinct().count() == updates.count(),
      s"mergeMoR: duplicate keys in the updates batch")
    var validatedCs: Map[String, String] = null
    var attempt = 0
    while (attempt < maxAttempts) {
      val v = currentVersion.getOrElse(throw new java.io.FileNotFoundException(
        s"no committed version under $tableRoot"))
      val lines = manifestLines(v)
      val partCols = partitionColsOf(lines)
      val partTypes = partTypesOf(lines)
      val curSchema = readVersion(v).schema
      val cols = curSchema.fieldNames.toSeq
      // schema evolution mirrors [[merge]]: with evolve=true the batch
      // may add new columns — appended rows carry them, existing files
      // stay untouched and read the new columns as NULL (mergeSchema)
      val newCols = if (evolve) updates.columns.filterNot(cols.contains).toSeq
        else Seq.empty
      if (evolve) {
        val missing = cols.filterNot(updates.columns.contains)
        require(missing.isEmpty, "mergeMoR(evolve): updates must still " +
          s"carry every existing column (missing $missing); evolution ADDS columns")
      } else require(updates.columns.toSet == cols.toSet,
        s"mergeMoR: updates schema ${updates.columns.toSeq} != table schema $cols")
      val upd = alignTypes(updates, curSchema, "mergeMoR")
      val outCols = cols ++ newCols
      val curCs = checkOf(lines)
      if (curCs != validatedCs) { // only the incoming rows can newly violate
        enforceConstraints(upd, curCs, "mergeMoR"); validatedCs = curCs
      }
      val keys = upd.select(keyCol).distinct()
      val names = files(v)
      // tombstone the old positions of matched keys — footer stats bound
      // the probe to the overlapping files before any row I/O
      val dvStaged: Seq[String] =
        if (names.isEmpty) Seq.empty
        else {
          val bounds = keys.agg(org.apache.spark.sql.functions.min(keyCol),
            org.apache.spark.sql.functions.max(keyCol)).head()
          val stats = fileStats(v)
          val candidates =
            if (bounds.isNullAt(0)) Seq.empty[String]
            else names.filter { n =>
              stats.get(n).flatMap(_.get(keyCol))
                .forall(_.overlaps(bounds.get(0), bounds.get(1)))
            }
          if (candidates.isEmpty) Seq.empty
          else {
            val visible = dvFrame(v).fold(withPos(candidates))(d =>
              withPos(candidates).join(d, DvKeys, "left_anti"))
            stageToPool(visible.join(keys, Seq(keyCol), "semi")
              .select(DvKeys.map(col): _*), "mergeMoR")
          }
        }
      val applied = upd.select(outCols.map(col): _*)
      val dataStaged =
        if (partCols.isEmpty) stageToPool(applied, "mergeMoR")
        else stagePartitioned(applied, partCols, "mergeMoR")
      if (dvStaged.isEmpty && dataStaged.isEmpty) return v
      beforePublish(attempt, v + 1)
      if (publish(v + 1, stamped("merge_mor",
        evolveHeader(lines, curSchema, newCols, upd) ++
          dataStaged ++ dvStaged.map("-" + _)))) return v + 1
      racePause(attempt, v + 1)
      attempt += 1
    }
    throw new java.io.IOException(
      s"mergeMoR: lost the head race $maxAttempts times under $tableRoot")
  }

  /** Apply one change-data set — tombstone these keys, append these
    * rows — as merge-on-read vectors in ONE atomic, txn-guarded publish:
    * the replication primitive a change-feed consumer needs
    * ([[graft.stream.Replicate]]). A CDC version's emission is
    * delete-rows + insert-rows over a keyed table (an update is its
    * key in both sets; a CoW file rewrite re-lists survivors as
    * delete+insert pairs that net to identity), and applying both sides
    * in one commit makes the target transition atomic: a reader sees the
    * source version fully applied or not at all, never a torn middle.
    *
    * Exactly-once: `txn` (the SOURCE commit version, stamped by the
    * feed) is checked against the head manifest inside the race loop and
    * recorded atomically with the change — a redelivered micro-batch
    * (restart, retry storm) skips versions whose ids already landed,
    * the same `#txn:` seam every streaming writer here uses. The id is
    * recorded EVEN when the change set nets to nothing, so "was this
    * version applied" never depends on whether it happened to be empty.
    *
    * Write cost is O(rows changed) — the tombstone probe is
    * [[deleteKeysMoR]]'s footer-stats-bounded semi-join, the appended
    * rows are ordinary pool files with CHECK constraints and
    * hidden-partition transforms applied — never O(table). The read debt
    * folds through [[rewriteDeletes]] / [[compact]] like every MoR
    * commit. Reference grounding: the R2 guarded upsert
    * (lambda_function.py:33-44) applied continuously downstream of the
    * processed-changes feed (cft/sourceSystem.yaml:29-63).
    */
  def applyChangesMoR(deleteKeys0: DataFrame, inserts0: DataFrame,
      keyCol: String, txn: Option[String] = None,
      maxAttempts: Int = 5, evolve: Boolean = false): Long = {
    val inserts = applyTransforms(inserts0)
    var validatedCs: Map[String, String] = null
    var attempt = 0
    while (attempt < maxAttempts) {
      val v = currentVersion.getOrElse(throw new java.io.FileNotFoundException(
        s"no committed version under $tableRoot"))
      val lines = manifestLines(v)
      txn.foreach { id => if (lines.contains(s"#txn:$id")) return v }
      val partCols = partitionColsOf(lines)
      val curSchema = readVersion(v).schema
      val cols = curSchema.fieldNames.toSeq
      // schema evolution mirrors [[mergeMoR]]: with evolve=true the batch
      // may add new columns — a CDC replica must track its source through
      // the source's own evolving merges ([[graft.stream.Replicate]])
      val newCols = if (evolve) inserts.columns.filterNot(cols.contains).toSeq
        else Seq.empty
      if (evolve) {
        val missing = cols.filterNot(inserts.columns.contains)
        require(missing.isEmpty, "applyChangesMoR(evolve): inserts must " +
          s"still carry every existing column (missing $missing); " +
          "evolution ADDS columns")
      } else require(inserts.columns.toSet == cols.toSet,
        s"applyChangesMoR: inserts schema ${inserts.columns.toSeq} != " +
          s"table schema $cols")
      val ins = alignTypes(inserts, curSchema, "applyChangesMoR")
      val outCols = cols ++ newCols
      val curCs = checkOf(lines)
      if (curCs != validatedCs) { // only the incoming rows can newly violate
        enforceConstraints(ins, curCs, "applyChangesMoR"); validatedCs = curCs
      }
      val keys = deleteKeys0.select(keyCol).distinct()
      val names = files(v)
      val dvStaged: Seq[String] =
        if (names.isEmpty) Seq.empty
        else {
          val bounds = keys.agg(org.apache.spark.sql.functions.min(keyCol),
            org.apache.spark.sql.functions.max(keyCol)).head()
          val stats = fileStats(v)
          val candidates =
            if (bounds.isNullAt(0)) Seq.empty[String]
            else names.filter { n =>
              stats.get(n).flatMap(_.get(keyCol))
                .forall(_.overlaps(bounds.get(0), bounds.get(1)))
            }
          if (candidates.isEmpty) Seq.empty
          else {
            val visible = dvFrame(v).fold(withPos(candidates))(d =>
              withPos(candidates).join(d, DvKeys, "left_anti"))
            stageToPool(visible.join(keys, Seq(keyCol), "semi")
              .select(DvKeys.map(col): _*), "applyChangesMoR")
          }
        }
      val applied = ins.select(outCols.map(col): _*)
      val dataStaged =
        if (partCols.isEmpty) stageToPool(applied, "applyChangesMoR")
        else stagePartitioned(applied, partCols, "applyChangesMoR")
      // an empty change set without a txn id is a true no-op; WITH one,
      // the id must still land (skip-on-redelivery has no other memory)
      if (dvStaged.isEmpty && dataStaged.isEmpty && txn.isEmpty) return v
      beforePublish(attempt, v + 1)
      if (publish(v + 1, stamped("cdc_apply",
        evolveHeader(lines, curSchema, newCols, ins) ++
          txn.map(id => s"#txn:$id").toSeq ++
          dataStaged ++ dvStaged.map("-" + _)))) return v + 1
      racePause(attempt, v + 1)
      attempt += 1
    }
    throw new java.io.IOException(
      s"applyChangesMoR: lost the head race $maxAttempts times under $tableRoot")
  }

  /** Fold tombstones into the data: rewrite ONLY the data files that
    * carry at least one tombstone (their visible rows survive), carry
    * every untouched file by name, and drop all deletion-vector lines —
    * the maintenance op that converts accumulated read debt back into
    * clean scans. Touched-file discovery is one distributed distinct-agg
    * over the DV files reduced to a file-name list (metadata-scale on
    * the driver, same plane as [[rewriteWhere]]'s discovery). Returns
    * (dvFilesFolded, dataFilesRewritten); a table with no tombstones is
    * a no-op.
    */
  def rewriteDeletes(maxAttempts: Int = 5): (Int, Int) = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val v = currentVersion.getOrElse(throw new java.io.FileNotFoundException(
        s"no committed version under $tableRoot"))
      val dvN = dvFiles(v)
      if (dvN.isEmpty) return (0, 0)
      val dv = dvFrame(v).get
      val targets = collectNames(dv, DvKeys.head, "rewriteDeletes")
      // stale tombstones may name files a later op already removed;
      // tombstones carry LEAF names, manifests may carry partition subdirs
      val touched = files(v).filter(n => targets(leafOf(n))).toSet
      val lines = manifestLines(v)
      val partCols = partitionColsOf(lines)
      val keptLines = lines.filterNot(l => l.startsWith("-") ||
        (!l.startsWith("#") && touched(l.split('\t').head)))
      // a partitioned table's survivors restage UNDER their partition
      // subdirs (basePath read keeps the columns; partitionBy re-lays
      // them out) so the fold never flattens the layout
      val survivorLines =
        if (touched.isEmpty) Seq.empty
        else if (partCols.nonEmpty)
          // schema-typed partition cast matters doubly here: the fold
          // REWRITES survivors, so an inference-drifted type would bake
          // the wrong column type back into the pool files
          stagePartitioned(readFiles(touched.toSeq.sorted, Some(dv),
            partTypesOf(lines)), partCols, "rewriteDeletes")
        else stageToPool(readFiles(touched.toSeq.sorted, Some(dv)), "rewriteDeletes")
      beforePublish(attempt, v + 1)
      if (publish(v + 1, stamped("rewrite_deletes",
        keptLines ++ survivorLines))) return (dvN.length, touched.size)
      racePause(attempt, v + 1)
      attempt += 1
    }
    throw new java.io.IOException(
      s"rewriteDeletes: lost the head race $maxAttempts times under $tableRoot")
  }

  /** Expire every row with `column` strictly below `cutoff` — the
    * data-lifecycle (TTL / retention) maintenance op, priced by what the
    * manifest already knows instead of what a DELETE would scan:
    *
    *  - a file whose footer max is below the cutoff DROPS from the
    *    manifest with ZERO data I/O — on a time-ordered 100 TB table
    *    (ingest is append-mostly, so files are naturally time-clustered,
    *    and `setClustering`/`optimizeBy` on the time column tighten the
    *    rest) retention becomes a metadata edit, not a table scan;
    *  - a file entirely at-or-above the cutoff carries by name, unread;
    *  - only STRADDLERS (footer range crosses the cutoff, or no recorded
    *    bound — all-NULL column, foreign import) rewrite their surviving
    *    visible rows, CoW-style, under the declared partition layout.
    *
    * One atomic publish covers drops + rewrites: readers see pre- or
    * post-retention, never a torn middle. SQL DELETE semantics for the
    * boundary: a NULL `column` never expires. Deletion vectors are
    * honored on the straddler rewrite (tombstoned rows do not revive);
    * tombstone keys naming dropped files go stale harmlessly — the same
    * tolerance [[rewriteDeletes]] documents. Type discipline at the
    * stats tier: the cutoff compares under each FILE's recorded stats
    * type, and an incomparable rendering demotes the file to straddler
    * (conservative scan) rather than guessing. Dropped versions stay
    * time-travelable until [[vacuum]], like every commit.
    *
    * Returns (filesDropped, filesRewritten); (0, 0) = nothing to expire,
    * no commit published.
    */
  def expireBefore(column: String, cutoff: Any,
      maxAttempts: Int = 5): (Int, Int) = {
    import org.apache.spark.sql.functions.coalesce
    val cut = CommitLog.statsComparable(cutoff)
    var attempt = 0
    while (attempt < maxAttempts) {
      val v = currentVersion.getOrElse(throw new java.io.FileNotFoundException(
        s"no committed version under $tableRoot"))
      val lines = manifestLines(v)
      val partCols = partitionColsOf(lines)
      val partTypes = partTypesOf(lines)
      val names = files(v)
      val stats = fileStats(v)
      def cmpSafe(tpe: String, edge: String): Option[Int] =
        scala.util.Try(ColStats.cmp(tpe, edge, cut)).toOption
      val dead = names.filter { n =>
        stats.get(n).flatMap(_.get(column))
          .exists(s => cmpSafe(s.tpe, s.max).exists(_ < 0))
      }.toSet
      val live = names.filter { n =>
        !dead(n) && stats.get(n).flatMap(_.get(column))
          .exists(s => cmpSafe(s.tpe, s.min).exists(_ >= 0))
      }.toSet
      // Set lookups: the manifest filter below is O(lines), not
      // O(lines × straddlers) — at 100 TB the manifest is the file list
      val straddle = names.filterNot(n => dead(n) || live(n))
      val straddleSet = straddle.toSet
      if (dead.isEmpty && straddle.isEmpty) return (0, 0)
      val keptLines = lines.filterNot { l =>
        !l.startsWith("#") && !l.startsWith("-") && {
          val n = l.split('\t').head; dead(n) || straddleSet(n)
        }
      }
      val survivorLines =
        if (straddle.isEmpty) Seq.empty
        else {
          val dv = dvFrame(v)
          val cols = readVersion(v).columns.toSeq
          val survivors = readFiles(straddle.sorted, dv, partTypes)
            // NULL retention column survives (SQL DELETE semantics)
            .filter(!coalesce(col(column) < lit(cutoff), lit(false)))
            .select(cols.map(col): _*)
          if (partCols.isEmpty) stageToPool(survivors, "expire")
          else stagePartitioned(survivors, partCols, "expire")
        }
      beforePublish(attempt, v + 1)
      if (publish(v + 1, stamped("expire", keptLines ++ survivorLines)))
        return (dead.size, straddle.size)
      racePause(attempt, v + 1)
      attempt += 1
    }
    throw new java.io.IOException(
      s"expireBefore: lost the head race $maxAttempts times under $tableRoot")
  }

  /** Declare a standing TTL retention policy (`#ttl:` header, carried
    * through replaces/compaction like `#cluster:`): rows whose `column`
    * falls more than `retainMs` behind enforcement time are expirable by
    * [[enforceTtl]]. A policy is table METADATA — declared once, honored
    * by maintenance — matching the reference's per-asset retention
    * posture (asset registries carry lifecycle config; the engine, not a
    * human, applies it). `retainMs <= 0` clears the policy.
    */
  def setTtl(column: String, retainMs: Long): Long = {
    var attempt = 0
    while (attempt < 50) {
      val vOpt = currentVersion
      val prev = vOpt.map(manifestLines).getOrElse(Seq.empty)
      if (retainMs > 0 && dataNamesOf(prev).nonEmpty) {
        val have = readVersion(vOpt.get).columns.toSet
        require(have.contains(column),
          s"setTtl: unknown column $column (have: ${have.toSeq.sorted})")
      }
      val v = vOpt.getOrElse(0L)
      hfs.mkdirs(commitsDir)
      val lines = prev.filterNot(_.startsWith("#ttl:"))
      val manifest =
        if (retainMs <= 0) lines
        else CommitLog.ttlHeader(column, retainMs) +: lines
      beforePublish(attempt, v + 1)
      if (publish(v + 1, stamped("set_ttl", manifest))) return v + 1
      racePause(attempt, v + 1)
      attempt += 1
    }
    throw new java.io.IOException(
      s"setTtl: lost the version race 50 times under $tableRoot")
  }

  /** The TTL policy in force at the head: (column, retainMs). */
  def ttlPolicy: Option[(String, Long)] =
    currentVersion.map(manifestLines).getOrElse(Seq.empty)
      .find(_.startsWith("#ttl:")).flatMap { l =>
        org.json4s.jackson.JsonMethods.parse(l.stripPrefix("#ttl:")) match {
          case org.json4s.JObject(fields) =>
            val m = fields.toMap
            for {
              c <- m.get("col").collect { case org.json4s.JString(s) => s }
              ms <- m.get("ms").collect { case org.json4s.JInt(n) => n.toLong }
            } yield (c, ms)
          case _ => None
        }
      }

  /** Enforce the declared TTL policy as of `nowMs` (caller-supplied —
    * maintenance stays deterministic and testable; a scheduler passes
    * wall clock). The typed cutoff derives from the retention column's
    * schema type: DATE expires by calendar day, TIMESTAMP by instant,
    * integral columns are read as epoch millis. No policy = no-op.
    */
  def enforceTtl(nowMs: Long): (Int, Int) = ttlPolicy match {
    case None => (0, 0)
    case Some((c, ms)) =>
      val v = currentVersion.getOrElse(return (0, 0))
      if (files(v).isEmpty) return (0, 0)
      import org.apache.spark.sql.types._
      val cutoff: Any = readVersion(v).schema(c).dataType match {
        case DateType => java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(Math.floorDiv(nowMs - ms, 86400000L)))
        case TimestampType | TimestampNTZType =>
          new java.sql.Timestamp(nowMs - ms)
        case LongType | IntegerType => nowMs - ms
        case other => throw new IllegalArgumentException(
          s"enforceTtl: unsupported retention column type $other for $c " +
            "(DATE, TIMESTAMP, or epoch-millis integral)")
      }
      expireBefore(c, cutoff)
  }

  /** Range-cluster the head snapshot on `column` (the 1-D OPTIMIZE /
    * cluster-by maintenance op): rewrite into `ceil(bytes/target)` files
    * partitioned AND sorted by `column`, as a replace commit. After this,
    * every file covers a disjoint range, so [[readBetween]] and the
    * touched-file discovery of [[merge]]/[[deleteKeys]] hit the minimum
    * file set — clustering is what converts footer stats into actual
    * pruning. Same snapshot guarantees as [[compact]]: maintenance and
    * the query plane never race. Returns (filesBefore, filesAfter).
    */
  def optimizeBy(column: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val v = currentVersion.getOrElse(
      throw new java.io.FileNotFoundException(s"no committed version under $tableRoot"))
    val names = files(v)
    val partCols = partitionColumns(v)
    require(!partCols.contains(column),
      s"optimizeBy: $column is a partition column — constant within every " +
        "c=v dir, clustering on it is a no-op")
    val bytes = names.map(n => hfs.getFileStatus(new Path(dataDir, n)).getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val keys = partCols.map(col) :+ col(column)
    // on a partitioned table the cluster keys LEAD with the partition
    // columns: each shuffle range then holds one partition's value slab,
    // and the hive re-stage keeps the c=v layout — partition-local
    // clustering, never a flat rewrite
    val clustered = readVersion(v)
      .repartitionByRange(nOut, keys: _*)
      .sortWithinPartitions(keys: _*)
    if (partCols.isEmpty)
      commit(clustered, replace = true, None, Some("op" -> "optimize"))
    else commitPartitioned(clustered, partCols, replace = true,
      op = Some("optimize"))
    (names.length, currentFileCount)
  }

  /** Z-order cluster the head snapshot on `columns` (the multi-dimension
    * OPTIMIZE ZORDER maintenance op): rows are range-partitioned and
    * sorted by the Morton interleave of the columns' bits, so each output
    * file covers a small HYPER-RECTANGLE of the value space instead of a
    * slab of one dimension — after this, footer stats are narrow on EVERY
    * z-ordered column at once and a [[readWhere]] selective on two
    * dimensions prunes multiplicatively (1-D clustering can only prune on
    * its own column). This is how a 100 TB fact table serves both
    * `WHERE k1 BETWEEN …` and `WHERE k1 … AND k2 …` from one layout.
    *
    * Each column is scaled to a bit-bucket, then bit i of column j lands
    * at interleaved position `i*k + j`. Two scaling modes:
    *
    *  - `quantileBuckets = 0` (default): min/max LINEAR scaling to 16
    *    bits — one tiny agg, ideal for roughly uniform value spaces.
    *    Under heavy skew this collapses: one outlier stretches the
    *    range and every normal value lands in bucket 0, so the skewed
    *    dimension stops pruning.
    *  - `quantileBuckets = 2^b` (e.g. 256): EQUI-DEPTH scaling — each
    *    column's bucket boundaries are its own approximate quantiles,
    *    so every bucket holds ~the same row count no matter how skewed
    *    the distribution (the documented skew escape hatch, shipped).
    *    The per-row bucket is a codegen'd fold over the broadcast
    *    cutpoint array — still no UDF.
    *
    * The z-value is pure codegen'd shift/mask arithmetic and is dropped
    * before the replace commit, so the table schema is untouched.
    * Non-castable values scale to bucket 0: clustering quality degrades,
    * correctness never (stats pruning remains conservative per file).
    */
  def optimizeZOrder(columns: Seq[String],
      targetFileBytes: Long = 128L * 1024 * 1024,
      quantileBuckets: Int = 0): (Int, Int) = {
    require(columns.size >= 2, "optimizeZOrder: need >= 2 columns (use optimizeBy for 1)")
    require(quantileBuckets == 0 ||
      (quantileBuckets >= 2 && quantileBuckets <= 65536 &&
        (quantileBuckets & (quantileBuckets - 1)) == 0),
      s"quantileBuckets must be 0 (linear) or a power of two in [2, 65536], got $quantileBuckets")
    val v = currentVersion.getOrElse(
      throw new java.io.FileNotFoundException(s"no committed version under $tableRoot"))
    val partCols = partitionColumns(v)
    require(!columns.exists(partCols.contains),
      s"optimizeZOrder: ${columns.filter(partCols.contains)} are partition " +
        "columns — constant within every c=v dir, z-ordering them is a no-op")
    val names = files(v)
    val bytes = names.map(n => hfs.getFileStatus(new Path(dataDir, n)).getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val snap = readVersion(v)
    val k = columns.size
    val (scaled, bits) =
      if (quantileBuckets == 0) {
        val boundAggs = columns.flatMap(c => Seq(
          org.apache.spark.sql.functions.min(col(c).cast("double")),
          org.apache.spark.sql.functions.max(col(c).cast("double"))))
        val bounds = snap.agg(boundAggs.head, boundAggs.tail: _*).head()
        (columns.zipWithIndex.map { case (c, j) =>
          val (mn, mx) = (bounds.get(2 * j), bounds.get(2 * j + 1))
          if (mn == null || mx == null || mn == mx) lit(0L)
          else {
            val lo = mn.asInstanceOf[Double]
            val span = mx.asInstanceOf[Double] - lo
            org.apache.spark.sql.functions.coalesce(
              org.apache.spark.sql.functions.floor(
                (col(c).cast("double") - lit(lo)) / lit(span) * lit(65535.0)), lit(0L))
          }
        }, 16)
      } else {
        import org.apache.spark.sql.functions.{aggregate, array, floor, when}
        val b = java.lang.Integer.numberOfTrailingZeros(quantileBuckets)
        val probs = (1 until quantileBuckets).map(_.toDouble / quantileBuckets).toArray
        (columns.map { c =>
          // per-column equi-depth cutpoints (approx, one pass per column
          // over the numeric projection; nulls and non-castables excluded
          // and bucketed to 0)
          val cuts = snap.select(col(c).cast("double").as("_graft_q"))
            .na.drop().stat
            .approxQuantile("_graft_q", probs, 0.25 / quantileBuckets)
            .distinct.sorted
          if (cuts.isEmpty) lit(0L)
          else {
            val raw = aggregate(array(cuts.map(lit(_)).toIndexedSeq: _*), lit(0L),
              (acc, cut) => acc + when(col(c).cast("double") > cut, 1L).otherwise(0L))
            // the sketch may return far fewer distinct cutpoints than
            // requested (few distinct values, coarse error): stretch the
            // observed bucket range over the FULL bit width, or the top
            // interleave bits would sit constant and the dimension would
            // not participate in the file split
            floor(raw * lit(((1L << b) - 1).toDouble) / lit(cuts.length.toDouble))
              .cast("long")
          }
        }, b)
      }
    val zval = (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      scaled.zipWithIndex.foldLeft(acc) { case (a, (c, j)) =>
        a.bitwiseOR(org.apache.spark.sql.functions.shiftleft(
          org.apache.spark.sql.functions.shiftright(c, i).bitwiseAND(lit(1L)),
          i * k + j))
      }
    }
    // partitioned tables z-cluster WITHIN each partition: the shuffle
    // keys lead with the partition columns so each range holds one
    // partition's z-slab, and the hive re-stage keeps the c=v layout —
    // pruning on the partition column and on the z-ordered dimensions
    // compose instead of one destroying the other
    val keys = partCols.map(col) :+ col("_graft_z")
    val clustered = snap.withColumn("_graft_z", zval)
      .repartitionByRange(nOut, keys: _*)
      .sortWithinPartitions(keys: _*)
      .drop("_graft_z")
    if (partCols.isEmpty)
      commit(clustered, replace = true, None, Some("op" -> "optimize"))
    else commitPartitioned(clustered, partCols, replace = true,
      op = Some("optimize"))
    (names.length, currentFileCount)
  }

  /** Change data feed between two committed versions (`fromV` exclusive,
    * `toV` inclusive): pool files are immutable, so the row-level diff is
    * exactly the files the manifests stopped/started referencing — rows
    * of added files are `insert`s, rows of dropped files are `delete`s,
    * tagged in `_change_type`. A downstream consumer (replica, index,
    * rollup) incrementally maintains itself at a cost that scales with
    * CHANGED files, never with table history — the Delta CDF shape from
    * nothing but the manifest diff.
    *
    * Caveat (shared by every CDF without per-row ids): a copy-on-write
    * rewrite re-lists the unchanged rows of a touched file as a
    * delete+insert pair of identical rows; [[merge]]/[[deleteKeys]]
    * minimize that by rewriting only files that truly contain a matched
    * key. Both versions must still be within the vacuum retention window.
    */
  def changesBetween(fromV: Long, toV: Long): DataFrame = {
    require(fromV <= toV, s"changesBetween: fromV $fromV > toV $toV")
    val from = files(fromV).toSet
    val to = files(toV).toSet
    val fromDvN = dvFiles(fromV).toSet
    val toDvN = dvFiles(toV).toSet
    def dvOf(ns: Set[String]): Option[DataFrame] =
      if (ns.isEmpty) None
      else Some(spark.read.parquet(ns.toSeq.sorted
        .map(n => new Path(dataDir, n).toString): _*).select(DvKeys.map(col): _*))
    val fromDv = dvOf(fromDvN)
    val toDv = dvOf(toDvN)
    val added = (to -- from).toSeq.sorted
    val removed = (from -- to).toSeq.sorted
    val common = from.intersect(to)
    // file-set diffs carry the coarse changes, VISIBILITY-adjusted: an
    // added file's rows already tombstoned at toV were never visible, and
    // a removed file's rows already tombstoned at fromV were already gone
    val fileParts = Seq(
      (added, toDv, "insert", toV),
      (removed, fromDv, "delete", fromV)).collect {
      case (ns, dv, tag, v) if ns.nonEmpty =>
        readFiles(ns, dv, partTypesOf(manifestLines(v)))
          .withColumn("_change_type", lit(tag))
    }
    // tombstone diffs on files present at BOTH ends: a DV file added in
    // the window deletes the positions it names (unless they were
    // already dead at fromV — stacked tombstones must not double-
    // report); one dropped in the window (RESTORE across a MoR delete)
    // resurrects them (unless still dead at toV). Scans are bounded to
    // the files the tombstones actually name — the change feed's cost
    // stays O(changed), never O(table).
    def dvDiffRows(diff: Option[DataFrame], stillDead: Option[DataFrame],
        tag: String): Option[DataFrame] = diff.map { d =>
      val targets = collectNames(d, DvKeys.head, "changesBetween")
        .intersect(common).toSeq.sorted
      val effective = stillDead.fold(d)(sd => d.join(sd, DvKeys, "left_anti"))
      if (targets.isEmpty) None
      else Some(withPos(targets).join(effective, DvKeys, "semi")
        .drop(DvKeys: _*).withColumn("_change_type", lit(tag)))
    }.flatten
    val newDvDeletes = dvDiffRows(dvOf(toDvN -- fromDvN), fromDv, "delete")
    val droppedDvInserts = dvDiffRows(dvOf(fromDvN -- toDvN), toDv, "insert")
    val parts = fileParts ++ newDvDeletes.toSeq ++ droppedDvInserts.toSeq
    if (parts.isEmpty)
      readVersion(toV).withColumn("_change_type", lit("insert")).limit(0)
    else parts.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Drop versions older than the newest `keepVersions`, then delete pool
    * files no retained manifest references. The retention window is the
    * reader contract: a snapshot stays readable as long as its version is
    * retained (same posture as a lakehouse VACUUM).
    *
    * `minFileAgeMs` protects in-flight commits: a concurrent writer pools
    * its data files BEFORE its manifest rename publishes them, so an
    * unreferenced-but-young pool file may belong to a commit about to
    * land — deleting it would let that commit succeed while referencing
    * vanished files. Only unreferenced files older than the threshold are
    * collected (the lakehouse VACUUM retention pattern); pass 0 only when
    * no writer can be in flight.
    *
    * `minVersionAgeMs` is the CONSUMER retention floor — the handshake
    * with streaming checkpoints. A [[GraftMicroBatchStream]] consumer's
    * checkpoint names a commit version; vacuuming a version a lagging
    * consumer still needs makes its restart fail (the stream's
    * checkpointed-version-vacuumed error). Since the table cannot
    * enumerate its consumers' checkpoints, the guard is temporal: vacuum
    * REFUSES — loudly, before dropping anything — to drop a version
    * committed within the horizon (default 7 days, the common lakehouse
    * retention default). Override by passing a smaller horizon (0 forces)
    * only when no consumer can be lagging more than that far behind; a
    * forced drop shifts the failure to the consumer's own restart error.
    * Returns (manifestsDeleted, filesDeleted).
    */
  def vacuum(keepVersions: Int = 1,
             minFileAgeMs: Long = 15L * 60 * 1000,
             minVersionAgeMs: Long = CommitLog.DefaultVersionRetentionMs): (Int, Int) = {
    require(keepVersions >= 1, "vacuum must retain at least the head version")
    val versions = committedVersions.sorted
    // tagged versions are pinned: a tag is a durable promise that its
    // snapshot stays readable, so it joins the keep set regardless of
    // keepVersions (drop the tag to release it)
    val pinned = refs.valuesIterator.collect {
      case r if r.kind == "tag" => r.version
    }.toSet
    val (drop0, keep0) = versions.splitAt(math.max(0, versions.length - keepVersions))
    val (kept, drop) = drop0.partition(pinned)
    val keep = kept ++ keep0
    val horizon = System.currentTimeMillis() - minVersionAgeMs
    val young = drop.filter(v => commitTime(v) > horizon)
    if (young.nonEmpty) throw new IllegalStateException(
      s"vacuum: refusing to drop version(s) ${young.mkString(", ")} under $tableRoot " +
        s"— committed within the retention horizon (minVersionAgeMs=$minVersionAgeMs). " +
        "A streaming consumer whose checkpoint still points inside this window " +
        "would fail on restart once its version is gone. Pass a smaller " +
        "minVersionAgeMs (0 forces) only when no consumer can lag that far.")
    val cutoff = System.currentTimeMillis() - minFileAgeMs
    // deletion-vector files are pool files too: collecting a referenced
    // DV would resurrect its tombstoned rows. Files a registered shallow
    // clone still references join the live set ([[cloneLiveNames]]) —
    // a source vacuum must not break an unmaterialized branch; young
    // empty markers (in-flight clones) survive under the same cutoff.
    val live = keep.flatMap(v => files(v) ++ dvFiles(v)).toSet ++ cloneLiveNames(cutoff)
    // delete manifests FIRST so no reader can resolve a version whose
    // files are about to go
    drop.foreach(v => hfs.delete(manifestPath(v), false))
    // recursive walk: partitioned pools nest files under c=v subdirs,
    // and liveness is keyed by the dataDir-relative name
    val dead: Seq[Path] =
      if (!hfs.exists(dataDir)) Seq.empty
      else {
        val base = dataDir.toUri.getPath
        val it = hfs.listFiles(dataDir, true)
        val acc = scala.collection.mutable.ArrayBuffer.empty[Path]
        while (it.hasNext) {
          val f = it.next()
          val rel = f.getPath.toUri.getPath.stripPrefix(base).stripPrefix("/")
          if (f.isFile && !live(rel) && f.getModificationTime <= cutoff)
            acc += f.getPath
        }
        acc.toSeq
      }
    dead.foreach(p => hfs.delete(p, false))
    // `_tmp` staging orphans — zero-row writer files, redelivered-epoch
    // restages (txn dedup returns before pooling), crashed attempts — are
    // never referenced by any manifest, so they'd otherwise accumulate
    // forever on long-running streams. A staging entry whose NEWEST
    // descendant mtime is past the in-flight guard cannot belong to a
    // commit still in progress (pooling renames files OUT of _tmp before
    // the manifest publishes): collect it whole.
    var tmpDead = 0
    if (hfs.exists(tmpDir)) hfs.listStatus(tmpDir).foreach { entry =>
      def newestMtime(p: Path): Long = {
        val st = hfs.getFileStatus(p)
        if (st.isFile) st.getModificationTime
        else (st.getModificationTime +:
          hfs.listStatus(p).map(c => newestMtime(c.getPath)).toSeq).max
      }
      if (newestMtime(entry.getPath) <= cutoff) {
        val files =
          if (entry.isFile) 1
          else {
            val it = hfs.listFiles(entry.getPath, true); var n = 0
            while (it.hasNext) { it.next(); n += 1 }; n
          }
        if (hfs.delete(entry.getPath, true)) tmpDead += files
      }
    }
    // superseded index builds (bloom/ANN) retire HERE, not at rebuild:
    // the rebuild marks them `_superseded` and the same in-flight age
    // guard keeps a mid-probe reader's version dir alive through the
    // swap — closing the probe-during-rebuild race without a window
    var idxDead = 0
    val idxBase = new Path(tableRoot, "_index")
    if (hfs.exists(idxBase)) hfs.listStatus(idxBase).foreach { kind =>
      if (kind.isDirectory) hfs.listStatus(kind.getPath).foreach { colDir =>
        if (colDir.isDirectory) hfs.listStatus(colDir.getPath).foreach { vd =>
          val marker = new Path(vd.getPath, "_superseded")
          if (vd.isDirectory && hfs.exists(marker) &&
              hfs.getFileStatus(marker).getModificationTime <= cutoff) {
            val it = hfs.listFiles(vd.getPath, true); var n = 0
            while (it.hasNext) { it.next(); n += 1 }
            if (hfs.delete(vd.getPath, true)) idxDead += n
          }
        }
      }
    }
    // abandoned change-feed staging (`_cdf/<from>_<to>/`): a live
    // consumer prunes its ranges at progress-commit; a checkpoint that
    // died mid-read leaves ranges nothing will claim. They are content-
    // addressed and recomputed identically on demand, so aging them out
    // is purely reclamation — BUT age alone cannot distinguish an
    // abandoned range from one a live SLOW consumer's planned
    // micro-batch still holds paths into (deleting that one fails its
    // task with FileNotFoundException, and the re-derive only happens
    // after a stream restart). The guard is the same consumer handshake
    // minVersionAgeMs already encodes: a range whose hi version is
    // still RETAINED could legally serve a lagging consumer, so it
    // survives; once its versions drop from the log no consumer can
    // read it anyway (its restart fails on the vacuumed version first).
    // minVersionAgeMs = 0 is the operator's existing "no consumer can
    // lag" escape hatch and forces aged ranges out regardless.
    var cdfDead = 0
    val cdfBase = new Path(tableRoot, "_cdf")
    val oldestRetained = keep.headOption.getOrElse(Long.MaxValue)
    if (hfs.exists(cdfBase)) hfs.listStatus(cdfBase).foreach { rangeDir =>
      def newest(p: Path): Long = {
        val st = hfs.getFileStatus(p)
        if (st.isFile) st.getModificationTime
        else (st.getModificationTime +:
          hfs.listStatus(p).map(c => newest(c.getPath)).toSeq).max
      }
      val hi = scala.util.Try(
        rangeDir.getPath.getName.split('_').last.toLong).toOption
      val consumerSafe = minVersionAgeMs <= 0 || hi.exists(_ < oldestRetained)
      if (consumerSafe && newest(rangeDir.getPath) <= cutoff) {
        val it = hfs.listFiles(rangeDir.getPath, true); var n = 0
        while (it.hasNext) { it.next(); n += 1 }
        if (hfs.delete(rangeDir.getPath, true)) cdfDead += n
      }
    }
    (drop.length, dead.length + tmpDead + idxDead + cdfDead)
  }

  // ---- ANALYZE (optimizer statistics) ------------------------------------

  /** ANALYZE: one aggregation pass over the head snapshot harvesting
    * per-column NDV (HLL approximation) and null counts — plus, for
    * numeric AND date columns (dates through their epoch-day double
    * encoding), EQUI-HEIGHT HISTOGRAMS (33 approx-percentile
    * endpoints in the same pass, then ONE more pass computing the
    * per-interval NDVs with the HLL-per-interval aggregate), and for
    * string columns lexicographic bounds + a count-min frequency
    * sketch — into
    * `_stats.json` beside the table: the column-level statistics
    * cost-based join reordering needs on top of the manifest's exact
    * row/byte counts. Histograms are what save CBO from the uniform-NDV
    * assumption on skewed or range-disjoint keys: an NDV-only estimate
    * of a join between mostly-disjoint key ranges is |a||b|/max(ndv)
    * while the histogram sees the near-empty overlap (PlanSpec pins the
    * resulting build-side flip). Atomic-typed columns only (complex
    * types carry no planner-meaningful NDV). The sidecar records the
    * analyzed version; like every engine's ANALYZE, the numbers go stale
    * as commits land and remain estimates, never correctness inputs.
    * Returns (version analyzed, columns analyzed).
    */
  def analyze(histograms: Boolean = true, histBins: Int = 32): (Long, Int) = {
    import org.apache.spark.sql.functions.{approx_count_distinct, array, count, count_min_sketch, max, min, percentile_approx, sum, unix_date, unix_micros, when}
    val v = currentVersion.getOrElse(throw new java.io.FileNotFoundException(
      s"analyze: no committed version under $tableRoot"))
    val df = readVersion(v)
    import org.apache.spark.sql.types._
    val cols = df.schema.fields.collect {
      case f if (f.dataType match {
        case _: NumericType | StringType | BooleanType | DateType |
             TimestampType | TimestampNTZType | BinaryType => true
        case _ => false
      }) => f.name
    }.toSeq
    // numeric AND date columns additionally harvest min/max (always —
    // catalyst's join estimation treats a missing range on a
    // range-comparable key as a NullValueInterval, i.e. DISJOINT,
    // estimating every such join to 0 rows) and, when asked, equi-height
    // histogram endpoints. Dates ride the numeric path through their
    // EPOCH-DAY double encoding (unix_date) — exactly the internal
    // representation catalyst's ValueInterval/histogram math runs
    // DateType estimation on, so o_orderdate-style partition/join keys
    // get real range intersection instead of the uniform-NDV guess.
    val numCols: Seq[String] = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }.toSeq
    val dateCols: Seq[String] = df.schema.fields.collect {
      case f if f.dataType == DateType => f.name
    }.toSeq
    // timestamps encode as EPOCH MICROSECONDS — catalyst's internal
    // TimestampType representation, which is also how FilterEstimation /
    // join estimation convert timestamp literals to doubles, so ranges
    // and histogram endpoints land in the same coordinate system
    // (seconds-encoded stats would misestimate by 10^6). NTZ casts to
    // TIMESTAMP first (numerically identical under the engine's fixed
    // UTC session timezone).
    val tsCols: Seq[String] = df.schema.fields.collect {
      case f if f.dataType == TimestampType || f.dataType == TimestampNTZType => f.name
    }.toSeq
    val rangeCols: Seq[String] = numCols ++ dateCols ++ tsCols
    def asDouble(c: String): org.apache.spark.sql.Column =
      if (dateCols.contains(c)) unix_date(col(s"`$c`")).cast("double")
      else if (tsCols.contains(c))
        unix_micros(col(s"`$c`").cast("timestamp")).cast("double")
      else col(s"`$c`").cast("double")
    // string columns harvest lexicographic bounds + a count-min frequency
    // sketch (the registry/status-string shape: NDV says how many
    // distinct values, the sketch says how OFTEN each one occurs —
    // equality-selectivity ground truth on skewed string keys). Bounds
    // and sketch live in the sidecar only; catalyst's ValueInterval does
    // not range-compare strings, so nothing nonsensical is served to it.
    val strCols: Seq[String] = df.schema.fields.collect {
      case f if f.dataType == StringType => f.name
    }.toSeq
    val histCols: Seq[String] = if (histograms) rangeCols else Seq.empty
    val probs = array((0 to histBins).map(i => lit(i.toDouble / histBins)): _*)
    val aggs = cols.flatMap(c => Seq(
      approx_count_distinct(col(s"`$c`")),
      sum(when(col(s"`$c`").isNull, 1L).otherwise(0L)))) ++
      rangeCols.flatMap(c => Seq(min(asDouble(c)), max(asDouble(c)))) ++
      histCols.map(c => percentile_approx(asDouble(c), probs, lit(10000))) ++
      strCols.flatMap(c => Seq(
        min(col(s"`$c`")), max(col(s"`$c`")),
        count_min_sketch(col(s"`$c`"), lit(0.01d), lit(0.99d), lit(42)))) // ~10 KB/col
    val row = df.agg(count(lit(1)), aggs: _*).head()
    val rows = row.getLong(0)
    val mmBase = 1 + 2 * cols.size
    val minMax: Map[String, (Double, Double)] = rangeCols.zipWithIndex.flatMap {
      case (c, j) =>
        if (row.isNullAt(mmBase + 2 * j) || row.isNullAt(mmBase + 2 * j + 1)) None
        else Some(c -> ((row.getDouble(mmBase + 2 * j), row.getDouble(mmBase + 2 * j + 1))))
    }.toMap
    val histBase = mmBase + 2 * rangeCols.size
    val strBase = histBase + histCols.size
    // (col → (min, max, base64 count-min sketch)) for non-all-null strings
    val strStats: Map[String, (String, String, String)] =
      strCols.zipWithIndex.flatMap { case (c, j) =>
        val b = strBase + 3 * j
        if (row.isNullAt(b) || row.isNullAt(b + 1)) None
        else Some(c -> ((row.getString(b), row.getString(b + 1),
          java.util.Base64.getEncoder.encodeToString(
            row.getAs[Array[Byte]](b + 2)))))
      }.toMap
    // (col, endpoints) for columns that had any non-null value
    val histEps: Seq[(String, Seq[Double])] = histCols.zipWithIndex.flatMap {
      case (c, j) =>
        if (row.isNullAt(histBase + j)) None
        else Some(c -> row.getSeq[Double](histBase + j).toSeq)
    }
    // pass 2: per-interval NDV for every histogram column, ONE aggregate
    // (the same HLL-per-interval machinery Spark's own ANALYZE uses)
    val histNdvs: Map[String, Seq[Long]] =
      if (histEps.isEmpty) Map.empty
      else {
        import org.apache.spark.sql.catalyst.expressions.{CreateArray, Literal}
        import org.apache.spark.sql.catalyst.expressions.aggregate.ApproxCountDistinctForIntervals
        val nAggs = histEps.map { case (c, eps) =>
          org.apache.spark.sql.GraftSqlShim.column(
            new ApproxCountDistinctForIntervals(
              org.apache.spark.sql.GraftSqlShim.expression(asDouble(c)),
              CreateArray(eps.map(Literal(_))), 0.05).toAggregateExpression())
        }
        val r2 = df.agg(nAggs.head, nAggs.tail: _*).head()
        histEps.zipWithIndex.map { case ((c, _), j) =>
          c -> r2.getSeq[Long](j).toSeq
        }.toMap
      }
    import org.json4s._
    import org.json4s.JsonDSL._
    val colFields = cols.zipWithIndex.map { case (c, i) =>
      val ndv = row.getLong(1 + 2 * i)
      val nulls = if (row.isNullAt(2 + 2 * i)) 0L else row.getLong(2 + 2 * i)
      val base0: JObject = ("ndv" -> ndv) ~ ("nulls" -> nulls)
      val base = minMax.get(c) match {
        case Some((lo, hi)) => base0 ~ ("min" -> lo) ~ ("max" -> hi)
        case None => base0
      }
      val withHist = histEps.collectFirst { case (`c`, eps) => eps } match {
        case Some(eps) if histNdvs.contains(c) =>
          base ~ ("eps" -> eps) ~ ("indv" -> histNdvs(c))
        case _ => base
      }
      val withStr = strStats.get(c) match {
        case Some((lo, hi, cms)) =>
          withHist ~ ("smin" -> lo) ~ ("smax" -> hi) ~ ("cms" -> cms)
        case None => withHist
      }
      JField(c, withStr)
    }.toList
    val json = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        ("version" -> v) ~ ("rows" -> rows) ~ ("columns" -> JObject(colFields))))
    LogStore.write(hfs, new Path(tableRoot, "_stats.json"),
      json.getBytes(StandardCharsets.UTF_8))
    (v, cols.size)
  }

  /** The `_stats.json` sidecar, if [[analyze]] ever ran:
    * (analyzedVersion, rows, col → (ndv, nullCount)).
    */
  def analyzedStats(): Option[(Long, Long, Map[String, (Long, Long)])] = {
    val f = new Path(tableRoot, "_stats.json")
    if (!hfs.exists(f)) None
    else {
      val in = hfs.open(f)
      val body = try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
        new String(out.toByteArray, StandardCharsets.UTF_8)
      } finally in.close()
      org.json4s.jackson.JsonMethods.parse(body) match {
        case org.json4s.JObject(fields) =>
          val m = fields.toMap
          for {
            org.json4s.JInt(v) <- m.get("version")
            org.json4s.JInt(r) <- m.get("rows")
          } yield {
            val cols = m.get("columns") match {
              case Some(org.json4s.JObject(cf)) => cf.collect {
                case (c, org.json4s.JObject(cv)) =>
                  val cm = cv.toMap
                  def num(k: String) = cm.get(k).collect {
                    case org.json4s.JInt(n) => n.toLong }.getOrElse(0L)
                  c -> (num("ndv"), num("nulls"))
              }.toMap
              case _ => Map.empty[String, (Long, Long)]
            }
            (v.toLong, r.toLong, cols)
          }
        case _ => None
      }
    }
  }

  /** Equi-height histograms from the `_stats.json` sidecar, if the last
    * [[analyze]] harvested them:
    * (analyzedVersion, col → (binHeight, endpoints, perIntervalNdv)).
    * Height = non-null rows / bins, the catalyst equi-height contract.
    */
  def analyzedHistograms(): Option[(Long, Map[String, (Double, Seq[Double], Seq[Long])])] = {
    val f = new Path(tableRoot, "_stats.json")
    if (!hfs.exists(f)) return None
    val in = hfs.open(f)
    val body = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    org.json4s.jackson.JsonMethods.parse(body) match {
      case org.json4s.JObject(fields) =>
        val m = fields.toMap
        for {
          org.json4s.JInt(v) <- m.get("version")
          org.json4s.JInt(rows) <- m.get("rows")
        } yield {
          val hists = m.get("columns") match {
            case Some(org.json4s.JObject(cf)) => cf.collect {
              case (c, org.json4s.JObject(cv)) if cv.exists(_._1 == "eps") =>
                val cm = cv.toMap
                val eps = cm.get("eps") match {
                  case Some(org.json4s.JArray(vs)) => vs.collect {
                    case org.json4s.JDouble(x) => x
                    case org.json4s.JInt(x) => x.toDouble
                    case org.json4s.JDecimal(x) => x.toDouble
                  }
                  case _ => Nil
                }
                val indv = cm.get("indv") match {
                  case Some(org.json4s.JArray(vs)) => vs.collect {
                    case org.json4s.JInt(x) => x.toLong
                    case org.json4s.JDouble(x) => x.toLong
                  }
                  case _ => Nil
                }
                val nulls = cm.get("nulls").collect {
                  case org.json4s.JInt(n) => n.toLong }.getOrElse(0L)
                val height =
                  if (indv.isEmpty) 0.0
                  else (rows.toLong - nulls).toDouble / indv.size
                c -> ((height, eps: Seq[Double], indv: Seq[Long]))
            }.filter { case (_, (_, eps, indv)) =>
              eps.size == indv.size + 1 && indv.nonEmpty }.toMap
            case _ => Map.empty[String, (Double, Seq[Double], Seq[Long])]
          }
          (v.toLong, hists)
        }
      case _ => None
    }
  }

  /** Numeric-column min/max (as doubles) from `_stats.json`:
    * (analyzedVersion, col → (min, max)). Served beside NDV so catalyst
    * range intersection works — a numeric join key with no range is a
    * NullValueInterval and the whole join estimates to zero.
    */
  def analyzedMinMax(): Option[(Long, Map[String, (Double, Double)])] = {
    val f = new Path(tableRoot, "_stats.json")
    if (!hfs.exists(f)) return None
    val in = hfs.open(f)
    val body = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    org.json4s.jackson.JsonMethods.parse(body) match {
      case org.json4s.JObject(fields) =>
        val m = fields.toMap
        for (org.json4s.JInt(v) <- m.get("version")) yield {
          def dbl(j: org.json4s.JValue): Option[Double] = j match {
            case org.json4s.JDouble(x) => Some(x)
            case org.json4s.JInt(x) => Some(x.toDouble)
            case org.json4s.JDecimal(x) => Some(x.toDouble)
            case _ => None
          }
          val mm = m.get("columns") match {
            case Some(org.json4s.JObject(cf)) => cf.flatMap {
              case (c, org.json4s.JObject(cv)) =>
                val cm = cv.toMap
                for {
                  lo <- cm.get("min").flatMap(dbl)
                  hi <- cm.get("max").flatMap(dbl)
                } yield c -> ((lo, hi))
              case _ => None
            }.toMap
            case _ => Map.empty[String, (Double, Double)]
          }
          (v.toLong, mm)
        }
      case _ => None
    }
  }

  /** String-column statistics from `_stats.json`: (analyzedVersion,
    * col → (lexicographic min, max, count-min frequency sketch)). The
    * sketch answers `estimateCount(value)` within ~1% of rows at 99%
    * confidence — per-value equality selectivity on skewed string keys
    * (status codes, registry ids), which NDV alone cannot express.
    */
  def analyzedStringStats(): Option[(Long,
      Map[String, (String, String, org.apache.spark.util.sketch.CountMinSketch)])] = {
    val f = new Path(tableRoot, "_stats.json")
    if (!hfs.exists(f)) return None
    val in = hfs.open(f)
    val body = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    org.json4s.jackson.JsonMethods.parse(body) match {
      case org.json4s.JObject(fields) =>
        val m = fields.toMap
        for (org.json4s.JInt(v) <- m.get("version")) yield {
          val ss = m.get("columns") match {
            case Some(org.json4s.JObject(cf)) => cf.flatMap {
              case (c, org.json4s.JObject(cv)) =>
                val cm = cv.toMap
                def str(k: String) = cm.get(k).collect {
                  case org.json4s.JString(s) => s }
                for (lo <- str("smin"); hi <- str("smax"); b64 <- str("cms"))
                  yield c -> ((lo, hi,
                    org.apache.spark.util.sketch.CountMinSketch.readFrom(
                      new java.io.ByteArrayInputStream(
                        java.util.Base64.getDecoder.decode(b64)))))
              case _ => None
            }.toMap
            case _ =>
              Map.empty[String, (String, String, org.apache.spark.util.sketch.CountMinSketch)]
          }
          (v.toLong, ss)
        }
      case _ => None
    }
  }

  /** Per-file Bloom-filter index on `column`: one pass over the current
    * snapshot aggregates a Bloom filter of `xxhash64(column)` PER POOL
    * FILE (Spark's own `BloomFilterAggregate`, codegen-hashed, filters
    * serialized only at shuffle edges), written as a parquet index table
    * under `_index/bloom/<column>/v<version>/` plus a tiny `_meta.json`
    * pinning the column's type. Footer min/max stats prune RANGES well
    * only on clustered data; a point lookup on a high-cardinality,
    * unclustered column (every file's [min,max] spans the key space)
    * prunes nothing — the Bloom index answers exactly that: at 100 TB a
    * `key = x` lookup touches the handful of files whose filter fires
    * instead of every file. Pool files are immutable, so an index row
    * stays valid as long as its file is referenced by ANY version —
    * carried files keep their filters across commits; files added after
    * the build are simply unindexed (conservatively scanned) until the
    * next build. Filters are sized by the LARGEST file's manifest row
    * count at `fpp` (small files get a lower effective fpp — wasted
    * bytes, never wrong answers). Returns (indexedVersion, filesIndexed).
    */
  def buildBloomIndex(column: String, fpp: Double = 0.01): (Long, Int) = {
    require(fpp > 0 && fpp < 1, s"buildBloomIndex: fpp $fpp out of (0,1)")
    val v = currentVersion.getOrElse(throw new java.io.FileNotFoundException(
      s"buildBloomIndex: no committed version under $tableRoot"))
    val lines = manifestLines(v)
    val names = dataNamesOf(lines)
    require(names.nonEmpty, s"buildBloomIndex: $tableRoot is empty")
    val dt = readVersion(v).schema.find(_.name == column).getOrElse(
      throw new IllegalArgumentException(
        s"buildBloomIndex: no column `$column` in $tableRoot")).dataType
    val perFileRows = lines.iterator
      .filterNot(l => l.startsWith("#") || l.startsWith("-"))
      .flatMap { l =>
        val p = l.split('\t'); if (p.length > 1) lineMeta(p(1))._1 else None
      }.toSeq
    val numItems = math.max(1024L,
      if (perFileRows.nonEmpty) perFileRows.max else 1000000L)
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(numItems, fpp)
    val index = bloomEntries(column, names, numItems, numBits)
    val idxRoot = new Path(tableRoot, s"_index/bloom/$column")
    val idxDir = new Path(idxRoot, s"v$v")
    index.write.mode("overwrite").parquet(idxDir.toString)
    import org.json4s.JsonDSL._
    LogStore.write(hfs, new Path(idxDir, "_meta.json"),
      org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(
        ("version" -> v) ~ ("type" -> dt.sql) ~ ("fpp" -> fpp)))
        .getBytes(StandardCharsets.UTF_8))
    // superseded builds retire via VACUUM, not here: a probe that
    // already resolved the old version dir keeps index-grade pruning
    // through the rebuild — the rebuild only MARKS old dirs, and vacuum
    // collects marked dirs past the same in-flight age guard as _tmp
    if (hfs.exists(idxRoot)) hfs.listStatus(idxRoot).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("v") && n.drop(1).forall(_.isDigit) && n.drop(1).toLong != v) {
        val marker = new Path(st.getPath, "_superseded")
        if (!hfs.exists(marker))
          LogStore.write(hfs, marker, "retired".getBytes(StandardCharsets.UTF_8))
      }
    }
    (v, names.length)
  }

  /** One (name, bf) row per pool file in `names`: Spark's own
    * `BloomFilterAggregate` of `xxhash64(column)` grouped by file —
    * shared by the full build and the per-commit incremental maintain.
    * The (qualified path → manifest name) mapping rides as a
    * broadcastable frame: it must survive partition subdirs, and the
    * names list is already manifest-resident.
    */
  private def bloomEntries(column: String, names: Seq[String],
      numItems: Long, numBits: Long): DataFrame = {
    import spark.implicits._
    val nameOf = names.map { n =>
      val p = new Path(dataDir, n)
      hfs.makeQualified(p).toString -> n
    }.toDF("path", "name")
    val hashed = org.apache.spark.sql.functions.xxhash64(col(s"`$column`"))
    val bloomAgg = org.apache.spark.sql.GraftSqlShim.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        org.apache.spark.sql.GraftSqlShim.expression(hashed),
        org.apache.spark.sql.catalyst.expressions.Literal(numItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
        .toAggregateExpression())
    poolReader(names)
      .parquet(names.map(n => new Path(dataDir, n).toString): _*)
      .select(col("_metadata.file_path").as("path"), col(s"`$column`"))
      .groupBy(col("path"))
      .agg(bloomAgg.as("bf"))
      .join(org.apache.spark.sql.functions.broadcast(nameOf), "path")
      .select(col("name"), col("bf"))
  }

  /** Best-effort incremental index maintenance after a successful
    * publish: the commit's NEW pool files (vs. the previous manifest)
    * get their per-file Bloom filters APPENDED into every live
    * `_index/bloom/<col>` dir, so point lookups keep pruning new data
    * without a manual rebuild — previously every post-build commit
    * degraded its files to conservative scans. Cost: one pass over the
    * new files per indexed column, paid only by tables whose owner
    * opted into an index (and skippable via
    * `spark.graft.bloomIndex.autoMaintain=false`). STRICTLY best
    * effort: the commit already stands, and any failure (schema drift,
    * a concurrent rebuild retiring the dir) leaves the new files
    * conservatively scanned — never a wrong answer, by the
    * unknown-file-scans contract of [[readEquals]].
    */
  private def maintainBloomIndexes(v: Long, lines: Seq[String]): Unit = {
    try {
      if (spark.conf.get("spark.graft.bloomIndex.autoMaintain", "true") != "true") return
      val base = new Path(tableRoot, "_index/bloom")
      if (!hfs.exists(base)) return
      val prev =
        if (v <= 1) Set.empty[String]
        else dataNamesOf(rawManifestLines(v - 1)).toSet
      val newLines = lines
        .filterNot(l => l.startsWith("#") || l.startsWith("-"))
        .filterNot(l => prev(l.split('\t').head))
      val newNames = newLines.map(_.split('\t').head)
        .filterNot(n => n.startsWith("/") || n.contains("://"))
      if (newNames.isEmpty) return
      val rowsOf = newLines.flatMap { l =>
        val p = l.split('\t'); if (p.length > 1) lineMeta(p(1))._1 else None
      }
      val numItems = math.max(1024L, if (rowsOf.nonEmpty) rowsOf.max else 1000000L)
      hfs.listStatus(base).map(_.getPath.getName).foreach { column =>
        bloomIndexFor(column).foreach { case (_, _, fpp, dir) =>
          val numBits = org.apache.spark.util.sketch.BloomFilter
            .optimalNumOfBits(numItems, fpp)
          // appended parts ride the SAME index dir (the probe reads the
          // dir wholesale); filters may be sized differently per batch —
          // each file's filter is probed independently, so that's fine
          bloomEntries(column, newNames, numItems, numBits)
            .write.mode("append").parquet(dir.toString)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Best-effort incremental ANN-index maintenance after a successful
    * publish (bloom pattern above): the commit's NEW pool files' vectors
    * are assigned to their nearest TRAINED centroid and appended into
    * the live `_index/ann/<col>` assignments — so post-build vectors
    * probe through the index instead of falling to the conservative
    * unindexed-tail scan. Vectors whose ids are ALREADY assigned (CoW
    * rewrites re-committing old rows) are left alone — no duplicate
    * assignments, and an UPDATED vector keeps its original cluster (the
    * standing approximation until the next full build). Skippable via
    * `spark.graft.annIndex.autoMaintain=false`; STRICTLY best effort —
    * any failure leaves the new vectors conservatively scanned, never a
    * wrong answer.
    */
  private def maintainAnnIndexes(v: Long, lines: Seq[String]): Unit = {
    try {
      if (spark.conf.get("spark.graft.annIndex.autoMaintain", "true") != "true") return
      val base = new Path(tableRoot, "_index/ann")
      if (!hfs.exists(base)) return
      val prev =
        if (v <= 1) Set.empty[String]
        else dataNamesOf(rawManifestLines(v - 1)).toSet
      val newNames = lines
        .filterNot(l => l.startsWith("#") || l.startsWith("-"))
        .map(_.split('\t').head)
        .filterNot(prev)
        .filterNot(n => n.startsWith("/") || n.contains("://"))
      if (newNames.isEmpty) return
      hfs.listStatus(base).map(_.getPath.getName).foreach { column =>
        AnnIndex.metaOf(spark, tableRoot, column).foreach { case (_, idCol, dir) =>
          AnnIndex.load(spark, tableRoot, column).foreach { case (_, cents, assigns) =>
            val fresh = readFiles(newNames.sorted, None)
              .select(col(idCol).cast("long").as("vec_id"),
                col(column).as("embedding"))
            graft.ops.KMeansIvf.assign(fresh, cents)
              .select(col("vec_id"), col("c_id"))
              .join(assigns.select(col("vec_id")), Seq("vec_id"), "left_anti")
              .write.mode("append")
              .parquet(new Path(dir, "assignments").toString)
          }
        }
        // drift policy: once post-build vectors outgrow the trained
        // baseline past the threshold, the FROZEN centroids no longer
        // describe the corpus and per-nprobe recall decays silently —
        // retrain here, at publish, with the same (k, iters). Amortized:
        // a 0.5 threshold retrains at most once per 1.5× growth. Opt
        // out via conf; `detail` still reports the ratio either way.
        val staleRatio =
          spark.conf.get("spark.graft.annIndex.staleRatio", "0.5").toDouble
        if (spark.conf.get("spark.graft.annIndex.autoRetrain", "true") == "true" &&
            AnnIndex.staleness(spark, tableRoot, column).exists(_ > staleRatio))
          AnnIndex.paramsOf(spark, tableRoot, column).foreach {
            case (k, iters, idCol) =>
              AnnIndex.build(spark, tableRoot, column, idCol, k, iters): Unit
          }
      }
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Newest Bloom index for `column`: (builtVersion, columnTypeDDL, fpp,
    * index directory), or None if never built.
    */
  private def bloomIndexFor(column: String): Option[(Long, String, Double, Path)] = {
    val idxRoot = new Path(tableRoot, s"_index/bloom/$column")
    if (!hfs.exists(idxRoot)) return None
    val vs = hfs.listStatus(idxRoot).toSeq.map(_.getPath.getName).collect {
      case n if n.startsWith("v") && n.drop(1).nonEmpty &&
        n.drop(1).forall(_.isDigit) => n.drop(1).toLong
    }
    if (vs.isEmpty) None
    else {
      val best = vs.max
      val dir = new Path(idxRoot, s"v$best")
      val metaPath = new Path(dir, "_meta.json")
      if (!hfs.exists(metaPath)) None
      else {
        val in = hfs.open(metaPath)
        val body = try {
          val out = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
          new String(out.toByteArray, StandardCharsets.UTF_8)
        } finally in.close()
        org.json4s.jackson.JsonMethods.parse(body) match {
          case org.json4s.JObject(fields) =>
            val m = fields.toMap
            val fpp = m.get("fpp").collect {
              case org.json4s.JDouble(x) => x
              case org.json4s.JDecimal(x) => x.toDouble
            }.getOrElse(0.01)
            m.get("type").collect {
              case org.json4s.JString(t) => (best, t, fpp, dir)
            }
          case _ => None
        }
      }
    }
  }

  /** Columns carrying a Bloom point-lookup index, with the version each
    * index was built at — the DESCRIBE DETAIL surface for [[readEquals]]
    * consumers (files added after that version scan conservatively).
    */
  def bloomIndexedColumns: Seq[(String, Long)] = {
    val idxBase = new Path(tableRoot, "_index/bloom")
    if (!hfs.exists(idxBase)) Seq.empty
    else hfs.listStatus(idxBase).toSeq.flatMap { colDir =>
      val col = colDir.getPath.getName
      val vs = hfs.listStatus(colDir.getPath).toSeq.map(_.getPath.getName)
        .collect { case n if n.startsWith("v") && n.drop(1).nonEmpty &&
          n.drop(1).forall(_.isDigit) => n.drop(1).toLong }
      if (vs.isEmpty) None else Some(col -> vs.max)
    }.sortBy(_._1)
  }

  /** Bloom-indexed point-lookup read: rows of the current version where
    * every `(column, value)` predicate holds, scanning only the pool
    * files that BOTH the footer min/max stats and (when an index exists)
    * the per-file Bloom filters admit. The Bloom probe itself is a
    * distributed job over the index table — filter bytes never
    * centralize on the driver; only (file, verdict) booleans do, O(files)
    * like the manifest read that is already resident. Unindexed files
    * (added after the last build, or never indexed) scan conservatively;
    * answers are exact either way because the row filter always applies.
    */
  def readEquals(preds: Seq[(String, Any)]): DataFrame = {
    require(preds.nonEmpty, "readEquals: at least one (column, value)")
    val v = currentVersion.getOrElse(throw new java.io.FileNotFoundException(
      s"no committed version under $tableRoot"))
    val lines = manifestLines(v)
    val stats = fileStatsOf(lines)
    val names = dataNamesOf(lines)
    val rowPred = preds.map { case (c, x) => col(s"`$c`") === lit(x) }
      .reduce(_ && _)
    if (names.isEmpty) return readVersion(v)
    var candidates = names.filter { n =>
      preds.forall { case (c, x) =>
        stats.get(n).flatMap(_.get(c)).forall(_.overlaps(x, x))
      }
    }
    preds.foreach { case (c, x) =>
      if (candidates.nonEmpty) bloomIndexFor(c).foreach { case (_, ddl, _, dir) =>
        try {
          val dt = org.apache.spark.sql.types.DataType.fromDDL(ddl)
          // hash the probe value EXACTLY as the build hashed the column:
          // xxhash64 over the column's own type (an int and a long hash
          // differently — the cast is the correctness seam)
          val hash = spark.range(1)
            .select(org.apache.spark.sql.functions.xxhash64(lit(x).cast(dt)))
            .head().getLong(0)
          val might = org.apache.spark.sql.functions.udf { (bf: Array[Byte]) =>
            org.apache.spark.util.sketch.BloomFilter
              .readFrom(new java.io.ByteArrayInputStream(bf)).mightContainLong(hash)
          }
          val verdicts = spark.read.parquet(dir.toString)
            .select(col("name"), might(col("bf")).as("pass"))
            .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
          candidates = candidates.filter(n => verdicts.getOrElse(n, true))
        } catch {
          // the resolved index dir can race away mid-probe (a concurrent
          // rebuild retires superseded versions): any probe failure
          // degrades to "no index" — the conservative scan the design
          // guarantees — never to an error or a wrong answer
          case scala.util.control.NonFatal(_) => ()
        }
      }
    }
    if (candidates.isEmpty) readVersion(v).filter(rowPred).limit(0)
    else readFiles(candidates, dvFrameOf(dvNamesOf(lines)), partTypesOf(lines))
      .filter(rowPred)
  }


  /** Post-lost-race pause: back off briefly while the version this
    * writer just raced for is STILL unpublished — the claim-holder is
    * mid-materialization (conditional-PUT stores claim first, write
    * after). Without a pause the whole retry budget can burn in
    * microseconds of spinning while the holder is descheduled; with it
    * the budget spans seconds of REAL contention. No pause when the
    * head already moved past the target — that loss is progress and the
    * retry should recompute immediately.
    */
  private def racePause(attempt: Int, targeted: Long): Unit =
    if (currentVersion.getOrElse(0L) < targeted)
      Thread.sleep(math.min(100L, 1L << math.min(attempt, 7)))

  /** Test seam: runs just before each publish attempt, letting a spec
    * inject a racing writer's manifest deterministically. */
  protected def beforePublish(attempt: Int, v: Long): Unit = ()

  /** Time travel: the newest version whose manifest was published at or
    * before `tsMillis` (manifest publication IS the commit instant — the
    * rename/link that made the version visible). Within the vacuum
    * retention window this gives lakehouse-style `AS OF` reads: audits
    * ("what did the registry say when batch X ran?") without any copy.
    */
  def versionAsOf(tsMillis: Long): Option[Long] = {
    if (!hfs.exists(commitsDir)) return None
    val vs = hfs.listStatus(commitsDir).toSeq.flatMap { st =>
      st.getPath.getName match {
        case ManifestName(d) if st.getModificationTime <= tsMillis => Some(d.toLong)
        case _ => None
      }
    }
    if (vs.isEmpty) None else Some(vs.max)
  }

  def readAsOf(tsMillis: Long): DataFrame = readVersion(versionAsOf(tsMillis)
    .getOrElse(throw new java.io.FileNotFoundException(
      s"no version committed at or before $tsMillis under $tableRoot")))

  /** Publication instant of a committed version (its manifest mtime). */
  def commitTime(v: Long): Long = hfs.getFileStatus(manifestPath(v)).getModificationTime

  /** Table history from the retained manifests, newest first: per version
    * the commit instant, file/tombstone counts, txn ids, and partition
    * spec — the DESCRIBE HISTORY surface, O(retained versions) manifest
    * reads and nothing else.
    */
  def history(): Seq[CommitInfo] =
    committedVersions.sorted.reverse.map { v =>
      val lines = manifestLines(v)
      CommitInfo(v, commitTime(v), dataNamesOf(lines).length,
        dvNamesOf(lines).length,
        lines.count(_.startsWith("#txn:")),
        partitionColsOf(lines),
        opOf(lines).getOrElse(""))
    }

  /** File count of the current manifest (compaction bookkeeping). */
  def currentFileCount: Int = currentVersion.map(files(_).length).getOrElse(0)

  /** Versioned INCREMENTAL small-file compaction: bin-pack only the
    * files smaller than `targetFileBytes` (plus any shallow-clone
    * absolute references — compact is the clone materializer) into
    * `ceil(packedBytes / targetFileBytes)` pool files as a NEW version,
    * carrying every already-right-sized file by name — so a daily
    * compact on a 100 TB table costs O(small files since last compact),
    * not O(table), and converges: a second run with no new small files
    * is a no-op. A snapshot carrying merge-on-read tombstones takes the
    * full fold-and-rewrite instead (the read applies the DVs, the
    * replace retires them — incremental carry would have to keep DV
    * lines correct across a partial rewrite for no maintenance gain).
    * Readers holding any retained version keep reading exactly their
    * snapshot throughout. Returns (filesBefore, filesAfter).
    */
  def compact(targetFileBytes: Long = 128L * 1024 * 1024,
      maxAttempts: Int = 5): (Int, Int) = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val v = currentVersion.getOrElse(
        throw new java.io.FileNotFoundException(s"no committed version under $tableRoot"))
      val lines = manifestLines(v)
      val names = files(v)
      val partCols = partitionColsOf(lines)
      if (dvNamesOf(lines).nonEmpty) {
        // tombstoned snapshot: full rewrite, which also folds the DVs
        if (partCols.nonEmpty)
          commitPartitioned(readVersion(v), partCols, replace = true,
            op = Some("compact"))
        else {
          val bytes = names.map(n => hfs.getFileStatus(new Path(dataDir, n)).getLen).sum
          val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
          commit(readVersion(v).coalesce(nOut), replace = true, None,
            Some("op" -> "compact"))
        }
        return (names.length, currentFileCount)
      }
      val sized = names.map(n => (n, hfs.getFileStatus(new Path(dataDir, n)).getLen))
      val candidates = sized.collect {
        case (n, b) if b < targetFileBytes || isAbsoluteName(n) => n
      }
      // convergence: a LONE small file in its partition (or the whole
      // flat pool) cannot be packed with anything — rewriting it gains
      // no file count and would make every maintenance run a rewrite.
      // Absolute (clone) references always pack: materializing is the
      // point even when the partition holds just one.
      val pack = candidates.groupBy(n =>
          n.split('/').dropRight(1).mkString("/")).values
        .filter(g => g.length > 1 || g.exists(isAbsoluteName))
        .flatten.toSeq
      if (pack.isEmpty) return (names.length, names.length)
      val packSet = pack.toSet
      val packBytes = sized.collect { case (n, b) if packSet(n) => b }.sum
      val nOut = math.max(1, math.ceil(packBytes.toDouble / targetFileBytes).toInt)
      val keptLines = lines.filterNot(l => packSet(l.split('\t').head))
      // declared clustering: the pack rewrite is the convergence point —
      // files written before the declaration (or restaged by CoW ops)
      // come out range-clustered here
      val hasCluster = clusterOf(lines).nonEmpty
      val newLines =
        if (partCols.isEmpty) {
          val packed = readFiles(pack.sorted, None)
          stageToPool(
            if (hasCluster) clustered(packed, numParts = Some(nOut))
            else packed.coalesce(nOut), "compact")
        } else {
          val packed = readFiles(pack.sorted, None, partTypesOf(lines))
          stagePartitioned(
            if (hasCluster) clustered(packed, partCols, Some(nOut))
            else packed.repartition(nOut, partCols.map(col): _*),
            partCols, "compact")
        }
      beforePublish(attempt, v + 1)
      if (publish(v + 1, stamped("compact",
        keptLines ++ newLines))) return (names.length, currentFileCount)
      racePause(attempt, v + 1)
      attempt += 1
    }
    throw new java.io.IOException(
      s"compact: lost the head race $maxAttempts times under $tableRoot")
  }
}
