package graft.catalog

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
  * files that make up that snapshot. Invariants:
  *  - pool files are written once and never modified or renamed; only
  *    `vacuum` deletes them, and only when no retained version references
  *    them — so any reader that resolved a manifest keeps reading a
  *    consistent snapshot for the whole retention window, regardless of
  *    how many commits (compactions, rewrites, replications) land
  *    meanwhile. This closes the half-state window the directory-swap
  *    rewrite had (a reader that resolved file paths just before the swap
  *    read a vanishing dir).
  *  - a commit becomes visible atomically via `FileSystem.rename` of the
  *    staged manifest into `_commits/NNNNNNNN.manifest` — readers see the
  *    old or the new version, never a torn one (no-replace semantics come
  *    from HDFS rename; see `publish` for the local-fs posture).
  *  - writers race on the version number optimistically: rename onto an
  *    existing manifest returns false, the loser re-reads the head and
  *    retries with the next number (the reference fronts exactly this
  *    concurrent CRUD plane — three lambdas behind one API Gateway,
  *    swagger/aws-dl-fmwrk-swagger-apigateway.yaml:30,114,198).
  *
  * Scale: the manifest grows with file count, not row count; reads list
  * one small file + the named parquet footers. This is the plain-parquet
  * kernel of what Delta/Iceberg do with their logs — the upgrade path is
  * swapping this class out, not re-architecting callers.
  */
class CommitLog(spark: SparkSession, tableRoot: String) {

  private val hfs: FileSystem = HadoopFs.fs(spark, tableRoot)
  private val dataDir = new Path(tableRoot, "data")
  private val commitsDir = new Path(tableRoot, "_commits")
  private val tmpDir = new Path(tableRoot, "_tmp")

  private def manifestPath(v: Long) = new Path(commitsDir, f"$v%08d.manifest")

  // strict name gate: a stray non-numeric file in _commits/ (editor swap,
  // _SUCCESS marker, half-written temp) must be ignored, not explode every
  // operation with NumberFormatException
  private val ManifestName = "^(\\d{8,})\\.manifest$".r

  private def committedVersions: Seq[Long] =
    if (!hfs.exists(commitsDir)) Seq.empty
    else hfs.listStatus(commitsDir).toSeq.map(_.getPath.getName).collect {
      case ManifestName(d) => d.toLong
    }

  /** Highest committed version, if any commit exists. */
  def currentVersion: Option[Long] = {
    val vs = committedVersions
    if (vs.isEmpty) None else Some(vs.max)
  }

  def exists: Boolean = currentVersion.nonEmpty

  /** Pool file names (relative to data/) of a committed version. */
  def files(v: Long): Seq[String] = {
    val in = hfs.open(manifestPath(v))
    val body = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    body.split('\n').toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Snapshot read of the current version: the returned DataFrame is bound
    * to that version's immutable pool files, so later commits (or a
    * concurrent compact/replicate) cannot change or tear what it reads.
    */
  def read(): DataFrame = readVersion(currentVersion.getOrElse(
    throw new java.io.FileNotFoundException(s"no committed version under $tableRoot")))

  def readVersion(v: Long): DataFrame = {
    val names = files(v)
    if (names.isEmpty) {
      // a rewrite can legally commit an empty table (e.g. delete-all);
      // an empty-schema frame is the only honest value without a stored schema
      spark.emptyDataFrame
    } else
      // mergeSchema: an append commit may carry evolved (wider) rows —
      // without the union-of-footers schema, whether a new column shows up
      // would depend on WHICH file Spark samples (silent column loss).
      // Cost is one footer read per pool file, bounded by compaction; a
      // manifest-stored schema would amortize it (the Delta/Iceberg move)
      // if registry file counts ever made footer reads noticeable.
      spark.read.option("mergeSchema", "true")
        .parquet(names.map(n => new Path(dataDir, n).toString): _*)
  }

  /** Commit `df` as the next version. `replace=false` appends: the new
    * manifest carries the previous version's files plus the new ones.
    * `replace=true` rewrites: the new manifest lists only the new files.
    * Returns the committed version number.
    */
  def commit(df: DataFrame, replace: Boolean): Long = {
    // 1. write the data once, into a staging dir in the same filesystem
    val stage = new Path(tmpDir, java.util.UUID.randomUUID().toString)
    df.write.mode(SaveMode.Overwrite).parquet(stage.toString)
    val parts = hfs.listStatus(stage)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath).sortBy(_.getName)
    // 2. move the data into the pool ONCE, under names computed before the
    //    version race — names are opaque (only a manifest confers
    //    liveness), so they need not embed the finally-committed version;
    //    the uuid keeps racing writers' files from clashing. Computing the
    //    names inside the retry loop was a real bug: a writer that lost the
    //    rename race would publish a manifest listing names that were never
    //    created (the files sat in the pool under the FIRST attempt's
    //    names), making that version and every append chaining it
    //    unreadable — and vacuum would collect the real files as orphans.
    val uuid = java.util.UUID.randomUUID().toString.take(8)
    hfs.mkdirs(dataDir)
    hfs.mkdirs(commitsDir)
    val moved = parts.zipWithIndex.map { case (_, i) =>
      f"$uuid-part$i%05d.parquet"
    }
    parts.zip(moved).foreach { case (src, name) =>
      if (!hfs.rename(src, new Path(dataDir, name)))
        throw new java.io.IOException(s"commit: could not move $src into the pool")
    }
    // 3. race for the head version: stage a manifest for head+1, atomic
    //    rename into place; the loser re-reads the head and retries with
    //    the SAME pooled file names
    var attempt = 0
    while (attempt < 50) {
      val v = currentVersion.getOrElse(0L) + 1
      val manifest = (if (replace) Seq.empty
                      else currentVersion.map(files).getOrElse(Seq.empty)) ++ moved
      val mTmp = new Path(tmpDir, s"$uuid-$attempt.manifest")
      val out = hfs.create(mTmp, true)
      try out.write((manifest.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
      finally out.close()
      beforePublish(attempt, v)
      if (publish(mTmp, manifestPath(v))) {
        hfs.delete(stage, true)
        return v
      }
      hfs.delete(mTmp, false)
      attempt += 1
    }
    throw new java.io.IOException(
      s"commit: lost the version race 50 times under $tableRoot")
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
    * Returns (manifestsDeleted, filesDeleted).
    */
  def vacuum(keepVersions: Int = 1,
             minFileAgeMs: Long = 15L * 60 * 1000): (Int, Int) = {
    require(keepVersions >= 1, "vacuum must retain at least the head version")
    val versions = committedVersions.sorted
    val (drop, keep) = versions.splitAt(math.max(0, versions.length - keepVersions))
    val live = keep.flatMap(files).toSet
    // delete manifests FIRST so no reader can resolve a version whose
    // files are about to go
    drop.foreach(v => hfs.delete(manifestPath(v), false))
    val cutoff = System.currentTimeMillis() - minFileAgeMs
    val dead =
      if (!hfs.exists(dataDir)) Seq.empty
      else hfs.listStatus(dataDir).toSeq
        .filter(f => !live(f.getPath.getName) && f.getModificationTime <= cutoff)
        .map(_.getPath)
    dead.foreach(p => hfs.delete(p, false))
    (drop.length, dead.length)
  }

  /** Atomic no-replace publish of a staged manifest. On HDFS, `rename`
    * itself fails when the destination exists — the real concurrency
    * guard. POSIX rename REPLACES the destination, so on the local
    * filesystem the manifest is published via `Files.createLink`, which
    * the kernel guarantees to fail with EEXIST if the destination already
    * exists — a genuinely atomic lose-the-race primitive, no TOCTOU
    * window. (A cloud object store would use a conditional-put log store
    * here, the same split lakehouse formats make.)
    */
  private def publish(mTmp: Path, dst: Path): Boolean =
    if (hfs.getUri.getScheme == "file") {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(dst.toUri.getPath),
          java.nio.file.Paths.get(mTmp.toUri.getPath))
        hfs.delete(mTmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else if (hfs.exists(dst)) false else hfs.rename(mTmp, dst)

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

  /** File count of the current manifest (compaction bookkeeping). */
  def currentFileCount: Int = currentVersion.map(files(_).length).getOrElse(0)

  /** Versioned small-file compaction: rewrite the head snapshot into
    * `ceil(bytes / targetFileBytes)` pool files as a NEW version (replace
    * commit; `coalesce`, no shuffle). Unlike the in-place directory-swap
    * compact, a reader holding any retained version keeps reading exactly
    * its snapshot throughout — the maintenance op and the query plane
    * never race. Returns (filesBefore, filesAfter).
    */
  def compact(targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val v = currentVersion.getOrElse(
      throw new java.io.FileNotFoundException(s"no committed version under $tableRoot"))
    val names = files(v)
    val bytes = names.map(n => hfs.getFileStatus(new Path(dataDir, n)).getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    commit(readVersion(v).coalesce(nOut), replace = true)
    (names.length, currentFileCount)
  }
}
