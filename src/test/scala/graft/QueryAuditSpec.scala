package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{CommitLog, QueryAudit}

/** Read-path audit (R18 completed for queries): every executed query key
  * lands EXACTLY ONE event (key, run, wall_ms, rows, plan_fingerprint,
  * status, ts) in a commit-log audit table — reads audited like writes,
  * the reference's posture (`read_source` audits via
  * insert_event_to_dynamoDb at lambda_function.py:86 exactly as the
  * write handlers do).
  */
class QueryAuditSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val warehouse =
    java.nio.file.Files.createTempDirectory("graft_qaud_wh").toString

  spark.conf.set("spark.sql.catalog.qa",
    classOf[graft.catalog.GraftTableCatalog].getName)
  spark.conf.set("spark.sql.catalog.qa.warehouse", warehouse)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS qa.db")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("explicit record(): exactly-once per (run, key); redelivery dedups") {
    val root = tmp("graft_qaud")
    val aud = new QueryAudit(spark, root)
    aud.record("q_project", "run1", 42L, 100L, "abc123def456")
    aud.record("q_agg_group", "run1", 10L, 7L, "fffeeedddccc")
    // redelivered recording (same run+key) must dedup, not double-count
    aud.record("q_project", "run1", 99L, 100L, "abc123def456")
    val ev = aud.events
    assert(ev.count() == 2L, "redelivery must dedup under the txn header")
    assert(ev.select("key").as[String].collect().toSet ==
      Set("q_project", "q_agg_group"))
    // a NEW run records the same key again — the scope is (run, key)
    aud.record("q_project", "run2", 41L, 100L, "abc123def456")
    assert(aud.events.count() == 3L)
    assert(ev.columns.toSet == Set("key", "run", "wall_ms", "rows",
      "plan_fingerprint", "status", "ts"))
  }

  test("listener audits tagged executions exactly-once; untagged (and " +
      "the audit's own commits) are skipped") {
    val root = tmp("graft_qaud_l")
    val listener = QueryAudit.install(spark, root)
    try {
      spark.sql("CREATE TABLE qa.db.t (k BIGINT, v STRING)")
      spark.sql("INSERT INTO qa.db.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")

      // untagged execution: no audit
      spark.table("qa.db.t").count()
      org.apache.spark.GraftTestBus.flush(spark.sparkContext)
      assert(!new CommitLog(spark, root).exists,
        "untagged executions must not audit")

      // tagged: one event per key, even across several actions
      spark.conf.set(QueryAudit.RunConf, "runL")
      spark.conf.set(QueryAudit.KeyConf, "k_count")
      assert(spark.table("qa.db.t").count() == 3L)
      spark.table("qa.db.t").count()   // second action, same key+run
      org.apache.spark.GraftTestBus.flush(spark.sparkContext)
      spark.conf.set(QueryAudit.KeyConf, "k_filter")
      spark.table("qa.db.t").filter(col("k") > 1L).collect()
      org.apache.spark.GraftTestBus.flush(spark.sparkContext)
      spark.conf.set(QueryAudit.KeyConf, "")

      // drain any stragglers the nested audit commits enqueued
      org.apache.spark.GraftTestBus.flush(spark.sparkContext)
      val ev = new QueryAudit(spark, root).events
      val byKey = ev.groupBy("key").count().as[(String, Long)].collect().toMap
      assert(byKey == Map("k_count" -> 1L, "k_filter" -> 1L),
        s"exactly one event per key wanted, got $byKey")
      val row = ev.filter(col("key") === "k_filter").head()
      assert(row.getAs[String]("run") == "runL")
      assert(row.getAs[String]("status") == "success")
      assert(row.getAs[String]("plan_fingerprint").nonEmpty,
        "the event carries the normalized plan fingerprint")
    } finally {
      spark.conf.set(QueryAudit.KeyConf, "")
      spark.listenerManager.unregister(listener)
    }
  }

  test("CALL query_history returns the latest events, newest first") {
    val root = s"$warehouse/db/qh"
    val aud = new QueryAudit(spark, root)
    aud.record("q_a", "r1", 5L, 10L, "aaaa")
    aud.record("q_b", "r1", 6L, 20L, "bbbb")
    aud.record("q_c", "r1", 7L, 30L, "cccc")
    val rows = spark.sql(
      "CALL qa.system.query_history('db.qh', 2)").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("q_a", "q_b", "q_c")))
    assert(rows.forall(_.getString(5) == "success"))
    val all = spark.sql("CALL qa.system.query_history('db.qh', 10)").collect()
    assert(all.length == 3)
    // and the unbounded surface is plain SQL over the same table
    assert(spark.sql("SELECT count(*) FROM qa.db.qh").head().getLong(0) == 3L)
  }
}
