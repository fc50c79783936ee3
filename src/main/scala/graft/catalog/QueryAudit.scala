package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** READ-path audit: one event per executed query — (key, run, wall_ms,
  * rows, plan_fingerprint, status, ts) — appended to a commit-log table.
  * The reference audits EVERY handler invocation including reads
  * (`insert_event_to_dynamoDb` fires in `read_source` at
  * lambda/aws-dl-fmwrk-source-system-api/lambda_function.py:86 exactly
  * as in the write handlers :67,:105,:124); the engine's R18 surface
  * ([[AssetCatalog.createAudited]], [[AuditLog]]) covered catalog
  * WRITES only — this is its lakehouse-native completion for queries.
  *
  * Two recording surfaces:
  *  - [[record]] — the explicit hook for harnesses that know the query
  *    key, wall time, and row count (the Verify/Bench shape).
  *  - [[QueryAudit.install]] — a [[QueryExecutionListener]] that audits
  *    every execution tagged with the session conf
  *    `spark.graft.audit.key` (set it before running, clear it after;
  *    untagged executions — including the audit's own internal commits
  *    — are skipped, which both bounds noise and breaks the
  *    listener→commit→listener recursion).
  *
  * Exactly-once: the event commits under txn id `qaudit-<run>-<key>`,
  * so a redelivered recording (listener retry, a multi-action query
  * firing several executions under one tag, a crashed harness re-run
  * with the same run id) dedups instead of double-counting — the same
  * guard the write-side audit uses. The plan fingerprint is the
  * Bench-normalized physical shape (node names + output columns, no
  * exprIds/literals/file lists), so drift adjudication can join audit
  * history on it: a timing move with an UNCHANGED fingerprint is load,
  * a changed fingerprint is a plan regression.
  *
  * Scale: one append commit per audited query — O(1) manifest write,
  * no table scans; the log is an ordinary commit-log table, so
  * retention/compaction ride the declared-maintenance planes.
  */
final class QueryAudit(spark: SparkSession, root: String) {

  private[catalog] val log = new CommitLog(spark, root)

  /** Append one query event, exactly-once per (run, key). */
  def record(key: String, run: String, wallMs: Long, rows: Long,
      planFingerprint: String, status: String = "success"): Unit = {
    import spark.implicits._
    val df = Seq((key, run, wallMs, rows, planFingerprint, status))
      .toDF("key", "run", "wall_ms", "rows", "plan_fingerprint", "status")
      .withColumn("ts", date_trunc("second", current_timestamp()))
    log.commit(df, replace = false, Some(s"qaudit-$run-$key")): Unit
  }

  /** Snapshot read of the audit events. */
  def events: DataFrame = log.read()
}

object QueryAudit {

  /** Session conf naming the query key the NEXT executions belong to;
    * empty/absent = do not audit. */
  val KeyConf = "spark.graft.audit.key"

  /** Session conf naming the run id (the exactly-once scope); defaults
    * to "adhoc". */
  val RunConf = "spark.graft.audit.run"

  /** The Bench-normalized physical-plan fingerprint: node names +
    * output column names down the pre-AQE physical tree — stable
    * across data regens, moved exactly by plan-shape changes.
    */
  def planFingerprint(qe: QueryExecution): String =
    try {
      val sb = new StringBuilder
      qe.sparkPlan.foreach { n =>
        sb.append(n.nodeName).append('(')
          .append(n.output.map(_.name).mkString(",")).append(");")
      }
      java.security.MessageDigest.getInstance("MD5")
        .digest(sb.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
    } catch { case scala.util.control.NonFatal(_) => "" }

  /** Install the read-audit listener on `spark`, appending to the
    * commit-log table at `root`. Returns the listener (unregister with
    * `spark.listenerManager.unregister`). Failures to record are LOUD
    * on stderr but never fail the audited query — observability must
    * not take down the read path.
    */
  def install(spark: SparkSession, root: String): QueryExecutionListener = {
    val listener = new QueryExecutionListener {
      private def recordTagged(qe: QueryExecution, durationNs: Long,
          status: String): Unit = {
        val s = qe.sparkSession
        val key = s.conf.get(KeyConf, "")
        if (key.isEmpty) return
        try {
          val run = s.conf.get(RunConf, "adhoc")
          // root-node output rows when the executed plan exposes them;
          // -1 (unknown) otherwise — the explicit record() surface is
          // the accurate-rows path
          val rows = qe.executedPlan.metrics.get("numOutputRows")
            .map(_.value).getOrElse(-1L)
          new QueryAudit(spark, root).record(key, run, durationNs / 1000000L,
            rows, planFingerprint(qe), status)
        } catch {
          case scala.util.control.NonFatal(e) =>
            Console.err.println(s"[graft] query-audit append FAILED for " +
              s"key $key under $root: ${e.getMessage} — the query result " +
              "stands, the audit event is lost")
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = recordTagged(qe, durationNs, "success")
      override def onFailure(funcName: String, qe: QueryExecution,
          error: Exception): Unit = recordTagged(qe, 0L, "failure")
    }
    spark.listenerManager.register(listener)
    listener
  }
}
