package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{AssetCatalog, AuditLog, CommitLog, CrossTableTxn, SourceSystem}

/** Atomic cross-table commit (R18: entity write + audit event in one
  * transaction). The contract under test: a crash ANYWHERE between the
  * first stage and the final decision leaves either both tables' rows
  * visible or neither — never half a transaction — while concurrent
  * single-table commits race the same versions and are never lost.
  */
class CrossTableTxnSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_xtxn").toString

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("entity + audit land atomically and both read back") {
    val root = freshRoot()
    val cat = new AssetCatalog(spark, root)
    val audit = new AuditLog(spark, s"$root/audit")
    cat.createAudited("source_system", "src_sys_id", Seq(
      SourceSystem(1L, "crm", "r", ts("2026-01-01 00:00:00"), "active")).toDS(),
      audit, "req-1", "create")
    assert(cat.read("source_system", "src_sys_id", 1L).count() == 1)
    assert(audit.lookup("req-1", "create").count() == 1)
    // and again on the now-existing tables (append path)
    cat.createAudited("source_system", "src_sys_id", Seq(
      SourceSystem(2L, "erp", "r", ts("2026-01-02 00:00:00"), "active")).toDS(),
      audit, "req-2", "create")
    assert(cat.readTable("source_system").count() == 2)
    assert(audit.events.count() == 2)
  }

  test("crash between the two pending publishes: NEITHER table shows the txn") {
    val root = freshRoot()
    spark.conf.set("spark.graft.xtxn.graceMs", "50")
    try {
      val logA = new CommitLog(spark, s"$root/a")
      logA.commit(Seq(1L).toDF("k"), replace = false)
      val logB = new CommitLog(spark, s"$root/b") {
        override protected def beforePublish(attempt: Int, v: Long): Unit =
          throw new RuntimeException("simulated crash before second publish")
      }
      val boom = intercept[RuntimeException] {
        CrossTableTxn.commitAll(spark, s"$root/_xtxn", Seq(
          (logA, Seq(2L).toDF("k"), false),
          (logB, Seq(20L).toDF("k"), false)))
      }
      assert(boom.getMessage.contains("simulated crash"))
      // A's pending version exists on disk but must resolve INVISIBLE
      // (a fresh reader grace-waits, then forces the abort decision)
      val readerA = new CommitLog(spark, s"$root/a")
      assert(readerA.currentVersion.contains(2L))
      assert(readerA.read().as[Long].collect().toSeq == Seq(1L),
        "half-committed txn content leaked into table a")
      // B never published anything
      assert(new CommitLog(spark, s"$root/b").currentVersion.isEmpty)
      // life goes on: a later append builds on the pre-txn content
      readerA.commit(Seq(3L).toDF("k"), replace = false)
      assert(readerA.read().as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    } finally spark.conf.unset("spark.graft.xtxn.graceMs")
  }

  test("concurrent single-table commit racing a pending publish: both survive") {
    val root = freshRoot()
    val logA = new CommitLog(spark, s"$root/a")
    logA.commit(Seq(1L).toDF("k"), replace = false)
    @volatile var injected = false
    val racingA = new CommitLog(spark, s"$root/a") {
      override protected def beforePublish(attempt: Int, v: Long): Unit =
        if (!injected) {
          injected = true
          new CommitLog(spark, s"$root/a").commit(Seq(99L).toDF("k"), replace = false)
        }
    }
    val logB = new CommitLog(spark, s"$root/b")
    val vs = CrossTableTxn.commitAll(spark, s"$root/_xtxn", Seq(
      (racingA, Seq(2L).toDF("k"), false),
      (logB, Seq(20L).toDF("k"), false)))
    assert(injected && vs.length == 2)
    assert(logA.read().as[Long].collect().sorted.toSeq == Seq(1L, 2L, 99L),
      "the racing append and the txn content must both land")
    assert(logB.read().as[Long].collect().toSeq == Seq(20L))
  }

  test("snapshot-group pin: a commitAll racing the pin is fully visible " +
      "or fully invisible, and later commits never move the pinned read") {
    val root = freshRoot()
    val a = new CommitLog(spark, s"$root/a")
    a.commit(Seq(1L).toDF("k"), replace = false)
    val b = new CommitLog(spark, s"$root/b")
    b.commit(Seq(10L).toDF("k"), replace = false)
    // the torn-read interleave a naive reader suffers: resolve A's head,
    // then a whole commitAll lands on BOTH tables before B's head is
    // resolved — without the group pin that reader sees the txn's B-side
    // and not its A-side
    @volatile var injected = false
    val aSpy = new CommitLog(spark, s"$root/a") {
      override def currentVersion: Option[Long] = {
        val v = super.currentVersion
        if (!injected) {
          injected = true
          CrossTableTxn.commitAll(spark, s"$root/_xtxn", Seq(
            (new CommitLog(spark, s"$root/a"), Seq(2L).toDF("k"), false),
            (new CommitLog(spark, s"$root/b"), Seq(20L).toDF("k"), false))): Unit
        }
        v
      }
    }
    val pinned = CrossTableTxn.pinGroup(Seq(aSpy, b))
    assert(injected)
    val va = a.readVersion(pinned(0)).as[Long].collect().toSet
    val vb = b.readVersion(pinned(1)).as[Long].collect().toSet
    assert((va.contains(2L), vb.contains(20L)) match {
      case (true, true) | (false, false) => true
      case _ => false
    }, s"the pin straddled the transaction: a=$va b=$vb")
    // with this ordering (the txn fully lands between the passes) the
    // stabilized pin must include it — the retry absorbed the race
    assert(va == Set(1L, 2L) && vb == Set(10L, 20L))
    // later commits never move the pinned read (snapshot isolation
    // ACROSS the group, not just per table)
    a.commit(Seq(3L).toDF("k"), replace = false)
    assert(a.readVersion(pinned(0)).as[Long].collect().toSet == va)
    // plain single-table reads are unaffected by the pinning machinery
    assert(a.read().as[Long].collect().toSet == va + 3L)
  }

  test("snapshot-group pin with no concurrent traffic returns the heads") {
    val root = freshRoot()
    val a = new CommitLog(spark, s"$root/a")
    a.commit(Seq(1L).toDF("k"), replace = false)
    val b = new CommitLog(spark, s"$root/b")
    b.commit(Seq(10L).toDF("k"), replace = false)
    b.commit(Seq(11L).toDF("k"), replace = false)
    assert(CrossTableTxn.pinGroup(Seq(a, b)) == Seq(1L, 2L))
  }

  test("a reader force-aborts a stalled txn; the same tables commit cleanly after") {
    val root = freshRoot()
    spark.conf.set("spark.graft.xtxn.graceMs", "30")
    try {
      val log = new CommitLog(spark, s"$root/t")
      log.commit(Seq(1L).toDF("k"), replace = false)
      // a coordinator that published one pending manifest then stalled
      // forever (no decision file): readers must not hang or leak rows
      val id = java.util.UUID.randomUUID().toString
      val decision = s"$root/_xtxn/$id.decision"
      graft.catalog.HadoopFs.fs(spark, root)
        .mkdirs(new org.apache.hadoop.fs.Path(s"$root/_xtxn"))
      log.publishPending(Seq(2L).toDF("k"), id, decision, replace = false)
      val reader = new CommitLog(spark, s"$root/t")
      assert(reader.read().as[Long].collect().toSeq == Seq(1L))
      // the forced decision is durable: abort
      val fs = graft.catalog.HadoopFs.fs(spark, root)
      assert(fs.exists(new org.apache.hadoop.fs.Path(decision)))
      // a later cross-table txn on the same table succeeds at fresh versions
      val other = new CommitLog(spark, s"$root/u")
      CrossTableTxn.commitAll(spark, s"$root/_xtxn", Seq(
        (log, Seq(5L).toDF("k"), false),
        (other, Seq(50L).toDF("k"), false)))
      assert(log.read().as[Long].collect().sorted.toSeq == Seq(1L, 5L))
      assert(other.read().as[Long].collect().toSeq == Seq(50L))
    } finally spark.conf.unset("spark.graft.xtxn.graceMs")
  }
}
