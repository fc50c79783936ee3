package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.catalog.CommitLog

/** Continuous CDC replication: consume a commit-log table's streaming
  * change feed (`<table>.changes` — [[graft.catalog.GraftChangesTable]])
  * and apply it onto a TARGET commit-log table keyed by `keyCol`, so the
  * target tracks the source through arbitrary mutation commits — appends,
  * CoW deletes/updates, merge-on-read vectors, compactions — not just
  * inserts. This is the reference's downstream-consumer topology closed
  * end-to-end (cft/sourceSystem.yaml:29-63: processed changes feed
  * consumers; lambda_function.py:33-44: the guarded upsert, run as a
  * stream): change feed out of one table, exactly-once upsert into the
  * next.
  *
  * Semantics and scale:
  *  - each micro-batch groups its rows by `_commit_version` and applies
  *    versions IN ORDER, one atomic [[CommitLog.applyChangesMoR]] per
  *    source version: tombstone the version's `delete`-tagged keys +
  *    append its `insert`-tagged rows in ONE publish. A key in both sets
  *    (an update, or a CoW file rewrite re-listing survivors) nets
  *    correctly because tombstones bind to the target's PRE-apply
  *    visible rows while inserts append fresh copies.
  *  - exactly-once: the txn id is derived from the SOURCE VERSION (not
  *    the micro-batch id), so redelivery is idempotent even if a restart
  *    re-plans different version ranges into different batches; a crash
  *    mid-batch resumes at the first unapplied version.
  *  - cost per version is O(rows changed): the tombstone probe is
  *    footer-stats-bounded, the append is batch-sized, and the target's
  *    read debt folds through rewriteDeletes/compact on the target's own
  *    maintenance schedule (or automatically past a declared
  *    `spark.graft.rewriteDeletes.maxDebtRatio`) — at 100 TB the replica
  *    pays for the CHANGE stream, never for table scans.
  */
object Replicate {

  /** Apply one change-feed micro-batch (possibly spanning several source
    * versions) onto `target`. Factored out of [[run]] so specs can drive
    * redelivery/crash seams directly. `txnScope` namespaces the txn ids
    * — use the SOURCE TABLE identity, unique per feed: two feeds fanning
    * into one target with distinct scopes interleave exactly-once, while
    * a scope collision makes the second feed's same-numbered source
    * version dedup as "already applied" (the txn guard's documented
    * failure mode for a mis-scoped fan-in — silent skip, never a double
    * apply or a torn batch).
    *
    * Schema evolution is the replica's choice: with `evolve = true` (the
    * tracking default) a source `merge(evolve = true)` widens the feed
    * (after the stream re-pins its schema — the feed fails loudly
    * mid-query, see [[graft.catalog.GraftChangesTable]]) and each
    * version applies with `evolve = true`, so the target widens in step.
    * With `evolve = false` the replica is STRICT: an unexpected extra
    * column — from the feed or a caller-assembled batch on this surface
    * — bounces loudly instead of silently widening the replica's schema
    * of record.
    */
  def applyChangeBatch(target: CommitLog, keyCol: String, batch0: DataFrame,
      txnScope: String, evolve: Boolean = true): Unit = {
    import graft.catalog.GraftChangesTable.{ChangeType, CommitVersion}
    // the batch is re-read per version (version list + deletes +
    // inserts); cache it so a multi-version catch-up batch scans the
    // staged change files once, not 3 × |versions| times
    val batch = batch0.persist()
    try {
      val dataCols = batch.columns.filterNot(c =>
        c == ChangeType || c == CommitVersion).toSeq
      // bounded: one row per source version in this batch's offset range
      val versions = batch.select(CommitVersion).distinct()
        .collect().map(_.getLong(0)).sorted
      for (v <- versions) {
        val sub = batch.filter(col(CommitVersion) === v)
        val dels = sub.filter(col(ChangeType) === "delete").select(keyCol)
        val ins = sub.filter(col(ChangeType) === "insert")
          .select(dataCols.map(col): _*)
        val txn = Some(s"cdc-$txnScope-$v")
        try {
          if (!target.exists) target.commit(ins, replace = false, txn): Unit
          else target.applyChangesMoR(dels, ins, keyCol, txn, evolve = evolve): Unit
        } catch {
          case e: IllegalArgumentException if !evolve && Option(e.getMessage)
              .exists(_.contains("applyChangesMoR: inserts schema")) =>
            // STRICT-mode bounce: dead-letter the refused version —
            // rows, version, scope, reason — before propagating, so the
            // operator inspects and replays ([[replayDlq]]) instead of
            // re-draining blind. Keyed by (scope, version) like the
            // apply itself, so a restarted drain re-bouncing the same
            // version never duplicates the capture; capture failures
            // must not mask the bounce.
            try {
              val dlq = new CommitLog(sub.sparkSession, target.tableRootPath + "__dlq")
              dlq.commit(
                sub.withColumn("_dlq_scope",
                  org.apache.spark.sql.functions.lit(txnScope))
                  .withColumn("_dlq_reason",
                    org.apache.spark.sql.functions.lit(
                      Option(e.getMessage).getOrElse("schema refusal"))),
                replace = false, Some(s"dlq-$txnScope-$v")): Unit
            } catch { case scala.util.control.NonFatal(ce) =>
              // the capture failing means the bounced rows are NOT
              // preserved — say so LOUDLY before propagating the bounce
              // (a silent swallow here would lose exactly the drifted
              // rows the DLQ exists to keep)
              Console.err.println(
                s"[graft] DLQ capture FAILED for scope $txnScope " +
                  s"version $v under ${target.tableRootPath}__dlq: " +
                  s"${ce.getMessage}. The bounced rows were NOT " +
                  "dead-lettered; resolve the refusal and re-drain from " +
                  "the checkpoint (the source version is still unapplied).")
            }
            throw e
        }
      }
    } finally batch.unpersist(): Unit
  }

  /** Replay a STRICT replica's dead-letter queue (`<targetRoot>__dlq`,
    * populated by [[applyChangeBatch]]'s bounce capture) after the
    * operator resolved the drift — widened the target, or chose to
    * absorb (`evolve = true`, the default here: replay is an explicit
    * operator decision, the strict gate already did its job). Captured
    * versions re-apply IN ORDER per scope through the same txn-guarded
    * path as the live drain, so versions that somehow landed since
    * dedup instead of double-applying; on full success the REPLAYED
    * entries are deleted SELECTIVELY (a MoR delete keyed on
    * (scope, version) — the captures stay in DLQ history until vacuum).
    * A capture dead-lettered by a still-running drain between this
    * call's read and its truncate does not match the delete predicate
    * and survives for the next replay — a blind truncate would wipe it
    * while its `dlq-` txn id lived on in the carried headers, making the
    * drain's re-bounce dedup as already-captured and losing the entry
    * permanently. Returns the number of (scope, version) entries
    * replayed.
    */
  def replayDlq(s: SparkSession, targetRoot: String, keyCol: String,
      evolve: Boolean = true): Long =
    replayDlqSeam(s, targetRoot, keyCol, evolve)(())

  /** [[replayDlq]] with a post-read seam so specs can land a CONCURRENT
    * capture between the replay's read and its selective truncate — the
    * lost-capture race the keyed truncate exists to close.
    */
  private[graft] def replayDlqSeam(s: SparkSession, targetRoot: String,
      keyCol: String, evolve: Boolean = true)(afterRead: => Unit): Long = {
    import graft.catalog.GraftChangesTable.CommitVersion
    val dlq = new CommitLog(s, targetRoot + "__dlq")
    if (!dlq.exists) return 0L
    val rows = dlq.read()
    // a replayed (truncated-to-empty) queue reads back schemaless
    if (!rows.columns.contains("_dlq_scope")) return 0L
    val entries = rows.select("_dlq_scope", CommitVersion).distinct().count()
    if (entries == 0L) return 0L
    afterRead
    val target = new CommitLog(s, targetRoot)
    val scopes = rows.select("_dlq_scope").distinct()
      .collect().map(_.getString(0)).sorted
    for (sc <- scopes) {
      val scoped = rows.filter(col("_dlq_scope") === sc)
        .drop("_dlq_scope", "_dlq_reason")
      applyChangeBatch(target, keyCol, scoped, sc, evolve)
    }
    // `rows` pinned its file list when it was read, so these are exactly
    // the replayed entries even if a drain captured more since
    val replayedKeys = rows.select("_dlq_scope", CommitVersion).distinct()
      .collect().map(r => s"${r.getString(0)}:${r.getLong(1)}").toSeq
    dlq.deleteWhereMoR(
      org.apache.spark.sql.functions.concat_ws(":",
        col("_dlq_scope"), col(CommitVersion)).isin(replayedKeys: _*)): Unit
    entries
  }

  /** The feed's loud schema-evolution refusal, wherever Structured
    * Streaming buried it in the failure's cause chain.
    */
  private def isFeedEvolution(t: Throwable): Boolean =
    t != null && (Option(t.getMessage)
      .exists(_.contains("schema evolved after the stream started")) ||
      isFeedEvolution(t.getCause))

  /** Drain `srcTable`'s change feed into the commit-log table at
    * `targetRoot` (Trigger.AvailableNow — one catch-up run; schedule it,
    * or swap the trigger, for continuous tailing). `srcTable` is the
    * catalog identifier WITHOUT the `.changes` suffix. Returns after the
    * feed is drained; restarts resume from `checkpoint` exactly-once.
    * `options` pass to the feed scan (`maxCommitsPerTrigger` bounds each
    * micro-batch's version window); with `Trigger.Once` + a commit cap,
    * one call replicates a bounded version prefix — the controlled-stop
    * seam the mid-pipeline-evolution proof drives.
    *
    * A mid-drain SOURCE SCHEMA EVOLUTION — the first schema event every
    * long-lived pipeline hits — is absorbed IN THIS CALL when
    * `evolve = true`: the feed's pinned schema refuses the widened
    * version loudly, and `run` restarts the drain from the same
    * checkpoint (the restart re-pins the widened schema; already-applied
    * versions dedup by txn), bounded by `maxSchemaRestarts` so a
    * poisoned feed still fails loudly instead of spinning. A STRICT
    * replica (`evolve = false`) does NOT auto-restart: the refusal
    * propagates — bouncing schema drift is exactly what strict mode is
    * for.
    *
    * FAILOVER RE-POINT — pass a fresh `scope`: when the drain's source
    * is lost and the query is re-pointed at a PROMOTED REPLICA (same
    * checkpoint — the offsets translate through
    * [[graft.catalog.CommitLog.translateSourceOffset]]), the feed's
    * `_commit_version` numbers switch to the replica's OWN numbering,
    * which restarts low (one local version per sync). Under the default
    * scope (= `srcTable`, unchanged if the promoted table kept the
    * name) those low version numbers collide with already-applied
    * PRIMARY version numbers, and the txn guard dedups the NEW versions
    * as already-applied — a silent gap. Pass `scope =
    * Some(<promoted table's root or any fresh id>)` on the re-point so
    * the promoted lineage's versions apply under their own txn
    * namespace.
    */
  def run(s: SparkSession, srcTable: String, targetRoot: String,
      keyCol: String, checkpoint: String,
      options: Map[String, String] = Map.empty,
      trigger: Trigger = Trigger.AvailableNow(),
      evolve: Boolean = true,
      maxSchemaRestarts: Int = 3,
      scope: Option[String] = None): Unit = {
    val target = new CommitLog(s, targetRoot)
    // `restarts` bounds CONSECUTIVE unproductive restarts, not lifetime
    // evolutions: a long-lived continuous drain legitimately absorbs one
    // evolution per source widening, so the counter resets whenever the
    // drain made progress (the target advanced) since the last restart —
    // only a genuinely poisoned feed, restarting without ever committing
    // a batch, exhausts the bound and fails loudly.
    var restarts = 0
    var seenVersion = target.currentVersion.getOrElse(0L)
    while (true) {
      try {
        val q = s.readStream.options(options).table(srcTable + ".changes")
          .writeStream
          .foreachBatch { (b: DataFrame, _: Long) =>
            applyChangeBatch(target, keyCol, b, scope.getOrElse(srcTable), evolve)
          }
          .option("checkpointLocation", checkpoint)
          .trigger(trigger)
          .start()
        q.awaitTermination()
        return
      } catch {
        case e: Throwable if evolve && isFeedEvolution(e) =>
          val now = target.currentVersion.getOrElse(0L)
          if (now > seenVersion) restarts = 0
          seenVersion = now
          restarts += 1   // re-pin the widened schema and resume the drain
          if (restarts > maxSchemaRestarts) throw e
      }
    }
  }
}
