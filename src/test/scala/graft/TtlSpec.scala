package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.CommitLog

/** TTL / retention enforcement: fully-expired files drop from the
  * manifest with zero data I/O, only boundary files rewrite survivors,
  * NULLs and deletion vectors keep SQL DELETE semantics, and the
  * declared `#ttl:` policy survives replaces/compaction like every
  * other table-metadata header.
  */
class TtlSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_ttl").toString

  /** Three single-file appends with disjoint key ranges: [1,100],
    * [101,200], [201,300] — stats-reasoning fixture, as in
    * DeletionVectorSpec.
    */
  private def seeded(root: String): CommitLog = {
    val log = new CommitLog(spark, root)
    def batch(lo: Long, hi: Long) =
      (lo to hi).toDF("k").withColumn("v", col("k") * 10L).coalesce(1)
    log.commit(batch(1, 100), replace = false)
    log.commit(batch(101, 200), replace = false)
    log.commit(batch(201, 300), replace = false)
    log
  }

  test("fully-expired files drop metadata-only; only the straddler rewrites") {
    val log = seeded(freshRoot())
    val before = log.files(3L)
    val (dropped, rewritten) = log.expireBefore("k", 150L)
    assert((dropped, rewritten) == (1, 1))
    val after = log.files(4L)
    // the live file carries BY NAME (no data I/O); the dead file is
    // gone; the straddler was replaced by a fresh survivor file
    assert(after.contains(before(2)), "live file must carry by name")
    assert(!after.contains(before(0)), "dead file must drop")
    assert(!after.contains(before(1)), "straddler must be rewritten")
    assert(log.read().select("k").as[Long].collect().sorted.toSeq ==
      (150L to 300L))
  }

  test("nothing to expire is a no-op: no commit published") {
    val log = seeded(freshRoot())
    assert(log.expireBefore("k", 1L) == ((0, 0)))
    assert(log.currentVersion.contains(3L))
  }

  test("NULL retention column survives (SQL DELETE semantics)") {
    val root = freshRoot()
    val log = new CommitLog(spark, root)
    log.commit(Seq(Option(5L), None, Option(250L)).toDF("k").coalesce(1),
      replace = false)
    val (dropped, rewritten) = log.expireBefore("k", 150L)
    // single mixed file: stats straddle the cutoff, so it rewrites
    assert((dropped, rewritten) == (0, 1))
    assert(log.read().select("k").as[Option[Long]].collect().toSet ==
      Set(None, Option(250L)))
  }

  test("deletion vectors honored: tombstoned rows do not revive on rewrite") {
    val log = seeded(freshRoot())
    log.deleteKeysMoR(Seq(160L).toDF("k"), "k")
    val (dropped, rewritten) = log.expireBefore("k", 150L)
    assert((dropped, rewritten) == (1, 1))
    val ks = log.read().select("k").as[Long].collect().sorted.toSeq
    assert(!ks.contains(160L), "tombstoned row revived by the TTL rewrite")
    assert(ks == (150L to 300L).filterNot(_ == 160L))
  }

  test("declared policy: enforceTtl derives a DATE cutoff; header survives compaction") {
    val root = freshRoot()
    val log = new CommitLog(spark, root)
    val days = (0 until 12).map(d =>
      (d.toLong, java.sql.Date.valueOf(java.time.LocalDate.of(2000, 1, 1).plusDays(d * 30L))))
    log.commit(days.toDF("k", "day").repartition(1), replace = false)
    log.setTtl("day", 90L * 86400000L)
    assert(log.ttlPolicy.contains(("day", 90L * 86400000L)))
    // as-of 2000-12-31 (UTC epoch arithmetic — TZ-independent) →
    // cutoff 2000-10-02; the 30-day ladder keeps its last two rungs
    val asOf = java.time.LocalDate.of(2000, 12, 31).toEpochDay * 86400000L
    val (dropped, rewritten) = log.enforceTtl(asOf)
    assert(dropped + rewritten >= 1)
    val kept = log.read().select("k").as[Long].collect().sorted.toSeq
    val cutoff = java.time.LocalDate.of(2000, 12, 31).minusDays(90)
    val expect = days.collect {
      case (k, d) if !d.toLocalDate.isBefore(cutoff) => k }
    assert(kept == expect, s"kept=$kept expect=$expect cutoff=$cutoff")
    // the policy is table metadata: a full compaction must carry it
    log.compact()
    assert(log.ttlPolicy.contains(("day", 90L * 86400000L)),
      "#ttl: header lost through compact")
    // clearing works
    log.setTtl("day", 0L)
    assert(log.ttlPolicy.isEmpty)
  }

  test("no policy: enforceTtl is a no-op") {
    val log = seeded(freshRoot())
    assert(log.enforceTtl(System.currentTimeMillis()) == ((0, 0)))
    assert(log.currentVersion.contains(3L))
  }

  test("auto-enforce: a commit past the cutoff triggers the drop; failure degrades safely") {
    val root = freshRoot()
    val log = new CommitLog(spark, root)
    val now = System.currentTimeMillis()
    // ancient rows: the epoch-ms retention column sits far past any
    // wall-clock cutoff, so the standing policy can expire them whole
    log.commit((1L to 100L).toDF("k").coalesce(1), replace = false)
    log.setTtl("k", 86400000L)   // retain 1 day
    spark.conf.set("spark.graft.ttl.autoEnforce", "true")
    try {
      // the commit triggers publish-time enforcement: the ancient file
      // drops in the hook's follow-up commit, no operator in the loop
      val live = now + 10L * 86400000L
      log.commit(Seq(live).toDF("k").coalesce(1), replace = false)
      assert(log.read().select("k").as[Long].collect().toSeq == Seq(live))
      assert(log.operation(log.currentVersion.get) == "expire",
        "enforcement must land as its own expire commit after the append")

      // failure degrades safely: a policy on a STRING column makes
      // enforceTtl throw (unsupported type) — the hook must swallow it
      // and the triggering commit must stand
      val root2 = freshRoot()
      val log2 = new CommitLog(spark, root2)
      log2.commit(Seq(("x", 1L)).toDF("s", "k").coalesce(1), replace = false)
      log2.setTtl("s", 1L)
      log2.commit(Seq(("y", 2L)).toDF("s", "k").coalesce(1), replace = false)
      assert(log2.read().count() == 2, "commit must stand when the hook fails")
      intercept[IllegalArgumentException] {   // the manual path still reports
        log2.enforceTtl(System.currentTimeMillis())
      }
    } finally spark.conf.unset("spark.graft.ttl.autoEnforce")
  }

  test("SQL surface: CALL set_ttl / enforce_ttl / expire_before") {
    val warehouse = java.nio.file.Files.createTempDirectory("graft_ttl_wh").toString
    spark.conf.set("spark.sql.catalog.gttl",
      classOf[graft.catalog.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gttl.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gttl.db")
    spark.sql("CREATE TABLE gttl.db.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gttl.db.t SELECT id, CAST(id AS STRING) FROM range(0, 100)")
    spark.sql("INSERT INTO gttl.db.t SELECT id, CAST(id AS STRING) FROM range(100, 200)")
    val r = spark.sql(
      "CALL gttl.system.expire_before('db.t', 'k', '100')")
      .collect().head
    // range() slices are contiguous per task, so the first INSERT's
    // files are all fully-expired: dropped ≥ 1, nothing straddles
    assert(r.getInt(0) >= 1 && r.getInt(1) == 0, r.toString)
    assert(spark.table("gttl.db.t").count() == 100)
    spark.sql("CALL gttl.system.set_ttl('db.t', 'k', 1)")
    val log = new CommitLog(spark, s"$warehouse/db/t")
    assert(log.ttlPolicy.contains(("k", 1L)))
    // integral retention column reads as epoch millis: as-of 151 with
    // retain 1 ms expires k < 150 — the remaining file straddles
    val e = spark.sql(
      "CALL gttl.system.enforce_ttl('db.t', 151)")
      .collect().head
    assert(e.getInt(0) + e.getInt(1) >= 1, e.toString)
    assert(spark.table("gttl.db.t").count() == 50)
  }
}
