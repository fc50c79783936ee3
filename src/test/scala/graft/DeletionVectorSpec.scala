package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{CommitLog, DeltaInterop}

/** Merge-on-read deletion vectors: tombstones instead of rewrites for
  * the delete path, applied on read as an anti-join, folded back into
  * data by maintenance, visible once (and only once) in the change feed,
  * and honored by every read surface including the SQL catalog.
  */
class DeletionVectorSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_dv").toString

  /** Three single-file append commits with disjoint key ranges, so footer
    * stats give each data file a known [lo, hi] and tests can reason
    * about exactly which files a delete touches.
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

  private def keys(log: CommitLog): Seq[Long] =
    log.read().select("k").as[Long].collect().sorted.toSeq

  test("MoR delete tombstones rows without rewriting any data file") {
    val log = seeded(freshRoot())
    val before = log.files(3L)
    val v = log.deleteWhereMoR(col("k") <= 50)
    assert(v == 4L)
    // zero write amplification: the data file set is byte-identical
    assert(log.files(v) == before)
    assert(log.dvFiles(v).nonEmpty)
    assert(keys(log) == (51L to 300L))
    // snapshot isolation: the pre-delete version still reads in full
    assert(log.readVersion(3L).count() == 300)
  }

  test("re-deleting already-invisible rows commits nothing") {
    val log = seeded(freshRoot())
    val v = log.deleteWhereMoR(col("k") <= 50)
    assert(log.deleteWhereMoR(col("k") <= 50) == v)
    // and a delete matching nothing at all also commits nothing
    assert(log.deleteWhereMoR(col("k") > 10_000) == v)
  }

  test("keyed MoR delete removes exactly the given keys") {
    val log = seeded(freshRoot())
    val v = log.deleteKeysMoR(Seq(5L, 150L, 300L, 999L).toDF("k"), "k")
    assert(log.files(v) == log.files(3L))
    assert(keys(log) == ((1L to 300L).toSet -- Set(5L, 150L, 300L)).toSeq.sorted)
  }

  test("tombstone-applied read is a broadcast anti-join, data side unshuffled") {
    val log = seeded(freshRoot())
    log.deleteWhereMoR(col("k") <= 50)
    val plan = log.read().queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("merge upserts a tombstoned key exactly once (no resurrection)") {
    val log = seeded(freshRoot())
    log.deleteWhereMoR(col("k") <= 50)
    log.merge(Seq((2L, -20L), (60L, -600L)).toDF("k", "v"), "k")
    val m = log.read().as[(Long, Long)].collect().groupBy(_._1)
    // deleted key re-inserted by the merge: exactly one row, the new value
    assert(m(2L).toSeq == Seq((2L, -20L)))
    assert(m(60L).toSeq == Seq((60L, -600L)))
    // a deleted key the merge never mentioned stays deleted
    assert(!m.contains(30L))
    assert(log.read().count() == 251)   // 250 survivors + k=2 back; k=60 updates in place
  }

  test("rewriteDeletes folds tombstones into ONLY the touched files") {
    val log = seeded(freshRoot())
    val dataBefore = log.files(3L)
    log.deleteWhereMoR(col("k") <= 50)   // touches only the first file
    val (dvs, rewritten) = log.rewriteDeletes()
    assert(dvs == 1 && rewritten == 1)
    val head = log.currentVersion.get
    assert(log.dvFiles(head).isEmpty)
    // the two untouched files are carried by NAME, stats intact
    assert(dataBefore.drop(1).forall(log.files(head).contains))
    assert(!log.files(head).contains(dataBefore.head))
    assert(keys(log) == (51L to 300L))
    // folding twice is a no-op
    assert(log.rewriteDeletes() == ((0, 0)))
  }

  test("auto rewriteDeletes folds tombstone debt past the declared ratio") {
    val log = seeded(freshRoot())
    spark.conf.set("spark.graft.rewriteDeletes.maxDebtRatio", "0.1")
    try {
      // 10 tombstones on 300 live rows = 3.3% debt: below the ratio, the
      // MoR snapshot stands untouched (never escalate a cheap delete)
      val v1 = log.deleteWhereMoR(col("k") <= 10)
      assert(log.currentVersion.contains(v1), "below-ratio debt must not fold")
      assert(log.dvFiles(v1).nonEmpty)
      // 40 more crosses 10%: the hook folds in its own publish cascade
      log.deleteWhereMoR(col("k") <= 50)
      val head = log.currentVersion.get
      assert(log.dvFiles(head).isEmpty,
        s"debt past the ratio must auto-fold; still carries ${log.dvFiles(head)}")
      assert(log.operation(head) == "rewrite_deletes")
      assert(keys(log) == (51L to 300L))
    } finally spark.conf.unset("spark.graft.rewriteDeletes.maxDebtRatio")
  }

  test("auto rewriteDeletes failure degrades to the merge-on-read scan") {
    val root = freshRoot()
    // a log whose fold always dies — the hook must swallow it: the
    // triggering commit stands and the DV-applied read stays correct
    val log = new CommitLog(spark, root) {
      override def rewriteDeletes(maxAttempts: Int): (Int, Int) =
        throw new RuntimeException("fold outage (spec-injected)")
    }
    def batch(lo: Long, hi: Long) =
      (lo to hi).toDF("k").withColumn("v", col("k") * 10L).coalesce(1)
    log.commit(batch(1, 100), replace = false)
    spark.conf.set("spark.graft.rewriteDeletes.maxDebtRatio", "0.05")
    try {
      val v = log.deleteWhereMoR(col("k") <= 50)   // 50% debt >> 5%
      assert(log.currentVersion.contains(v), "fold failure must not block the commit")
      assert(log.dvFiles(v).nonEmpty, "failed fold degrades to tombstoned read")
      assert(keys(log) == (51L to 100L))
      // the manual path still folds once the outage clears
      assert(new CommitLog(spark, root).rewriteDeletes() == ((1, 1)))
    } finally spark.conf.unset("spark.graft.rewriteDeletes.maxDebtRatio")
  }

  test("auto fold composes with auto-compact: fold publish re-arms the " +
      "small-file census its DV lines were suppressing") {
    val log = seeded(freshRoot())   // three ~100-row single-file commits
    spark.conf.set("spark.graft.rewriteDeletes.maxDebtRatio", "0.1")
    spark.conf.set("spark.graft.autoCompact.minSmallFiles", "2")
    try {
      // the delete's own publish skips auto-compact (DV lines present),
      // then crosses the debt ratio: fold fires, and the FOLD's dv-free
      // publish runs the small-file census — one cascade, clean result
      log.deleteWhereMoR(col("k") <= 150)
      val head = log.currentVersion.get
      assert(log.dvFiles(head).isEmpty)
      assert(log.operation(head) == "compact",
        s"fold publish should cascade into compact, got '${log.operation(head)}'")
      assert(log.currentFileCount == 1,
        s"expected one compacted file, have ${log.currentFileCount}")
      assert(keys(log) == (151L to 300L))
    } finally {
      spark.conf.unset("spark.graft.rewriteDeletes.maxDebtRatio")
      spark.conf.unset("spark.graft.autoCompact.minSmallFiles")
    }
  }

  test("compact folds tombstones and drops the DV lines") {
    val log = seeded(freshRoot())
    log.deleteWhereMoR(col("k") % 2 === 0)
    log.compact()
    val head = log.currentVersion.get
    assert(log.dvFiles(head).isEmpty)
    assert(keys(log) == (1L to 300L by 2))
  }

  test("vacuum keeps referenced DV files live; collects them after the fold") {
    val root = freshRoot()
    val log = seeded(root)
    val v = log.deleteWhereMoR(col("k") <= 50)
    val dvNames = log.dvFiles(v)
    log.vacuum(keepVersions = 1, minFileAgeMs = 0, minVersionAgeMs = 0)
    // head references the DV — it must survive and still apply
    assert(dvNames.forall(n => java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "data", n))))
    assert(keys(log) == (51L to 300L))
    log.rewriteDeletes()
    log.vacuum(keepVersions = 1, minFileAgeMs = 0, minVersionAgeMs = 0)
    // no retained version references the DV any more
    assert(dvNames.forall(n => !java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "data", n))))
    assert(keys(log) == (51L to 300L))
  }

  test("change feed: each tombstone batch reports its deletes exactly once") {
    val log = seeded(freshRoot())
    log.deleteWhereMoR(col("k") <= 50)            // v4
    log.deleteWhereMoR(col("k").between(51, 60))  // v5 — stacked second DV
    val d1 = log.changesBetween(3L, 4L)
    assert(d1.select("_change_type").distinct().as[String].collect().toSeq == Seq("delete"))
    assert(d1.select("k").as[Long].collect().sorted.toSeq == (1L to 50L))
    // the second window must NOT re-report the first window's deletes
    val d2 = log.changesBetween(4L, 5L)
    assert(d2.select("k").as[Long].collect().sorted.toSeq == (51L to 60L))
    assert(log.changesBetween(3L, 5L).select("k").as[Long]
      .collect().sorted.toSeq == (1L to 60L))
  }

  test("change feed: RESTORE across MoR deletes reports the resurrections") {
    val log = seeded(freshRoot())
    log.deleteWhereMoR(col("k") <= 50)            // v4
    log.deleteWhereMoR(col("k").between(51, 60))  // v5
    val v6 = log.restore(3L)
    assert(keys(log) == (1L to 300L))
    val back = log.changesBetween(5L, v6)
    assert(back.select("_change_type").distinct().as[String].collect().toSeq == Seq("insert"))
    assert(back.select("k").as[Long].collect().sorted.toSeq == (1L to 60L))
    // end-to-end the table is unchanged: the 3→6 feed is empty
    assert(log.changesBetween(3L, v6).count() == 0)
  }

  test("file-skipping reads apply tombstones") {
    val log = seeded(freshRoot())
    log.deleteKeysMoR((120L to 130L).toDF("k"), "k")
    assert(log.readBetween("k", 100, 200).select("k").as[Long].collect().sorted.toSeq ==
      ((100L to 200L).toSet -- (120L to 130L)).toSeq.sorted)
  }

  test("delta export of a tombstoned table keeps only the visible rows readable") {
    val root = freshRoot()
    val log = seeded(root)
    log.deleteWhereMoR(col("k") > 250)
    val dest = freshRoot() + "/delta"
    DeltaInterop.exportDelta(spark, root, dest)
    assert(DeltaInterop.readDelta(spark, dest).select("k").as[Long]
      .collect().sorted.toSeq == (1L to 250L))
  }

  // ---- SQL catalog front door --------------------------------------------

  private val warehouse =
    java.nio.file.Files.createTempDirectory("graft_dv_wh").toString
  spark.conf.set("spark.sql.catalog.gdv", classOf[graft.catalog.GraftTableCatalog].getName)
  spark.conf.set("spark.sql.catalog.gdv.warehouse", warehouse)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS gdv.db")

  test("SQL reads apply tombstones through the analyzer rule") {
    spark.sql("CREATE TABLE gdv.db.t (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gdv.db.t SELECT id, id * 10 FROM range(1, 301)")
    new CommitLog(spark, s"$warehouse/db/t").deleteWhereMoR(col("k") <= 50)
    assert(spark.sql("SELECT count(*) AS c FROM gdv.db.t").as[Long].head() == 250L)
    assert(spark.sql("SELECT min(k) AS mn FROM gdv.db.t").as[Long].head() == 51L)
    // filters still reach the data side below the anti-join
    val plan = spark.sql("SELECT v FROM gdv.db.t WHERE k = 60")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan)
    // SQL MERGE/UPDATE refuses until tombstones are folded in
    val e = intercept[Exception] {
      spark.sql("UPDATE gdv.db.t SET v = 0 WHERE k = 60")
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("rewrite_deletes") ||
        Option(e.getCause).exists(_.getMessage.contains("rewrite_deletes"))))
    val folded = spark.sql("CALL gdv.system.rewrite_deletes('db.t')").collect()
    assert(folded.head.getInt(0) == 1)
    // after the fold: plain scan again, UPDATE works
    spark.sql("UPDATE gdv.db.t SET v = 0 WHERE k = 60")
    assert(spark.sql("SELECT v FROM gdv.db.t WHERE k = 60").as[Long].head() == 0L)
    assert(spark.sql("SELECT count(*) AS c FROM gdv.db.t").as[Long].head() == 250L)
  }

  test("MoR update tombstones old positions and appends updated copies in one commit") {
    val log = seeded(freshRoot())
    val before = log.files(3L)
    val v = log.updateWhereMoR(col("k") <= 50, Seq("v" -> (col("v") + 1L)))
    assert(v == 4L)
    // O(rows changed) in files written: every pre-update data file is
    // still referenced BY NAME, plus exactly the appended pool file(s)
    // and the tombstone DV — never a rewrite of a touched 100-row file
    assert(before.forall(log.files(v).contains),
      "MoR update must not rewrite or drop any existing data file")
    val appended = log.files(v).filterNot(before.contains)
    assert(appended.nonEmpty && log.dvFiles(v).nonEmpty)
    // read = simultaneous-assignment UPDATE semantics, old rows invisible
    val got = log.read().select("k", "v").as[(Long, Long)].collect().toMap
    assert(got.size == 300)
    assert((1L to 50L).forall(k => got(k) == k * 10 + 1), s"updated rows wrong")
    assert((51L to 300L).forall(k => got(k) == k * 10), s"untouched rows changed")
    // no-match update commits nothing
    assert(log.updateWhereMoR(col("k") > 10000, Seq("v" -> lit(0L))) == v)
    // the change feed reports the update as delete+insert of exactly the
    // matched rows (O(changes), nets correctly in incremental views)
    val feed = log.changesBetween(3L, v)
      .groupBy("_change_type").count().as[(String, Long)].collect().toMap
    assert(feed == Map("delete" -> 50L, "insert" -> 50L), s"feed wrong: $feed")
    // maintenance folds the update debt: tombstones gone, values keep
    log.rewriteDeletes()
    val head = log.currentVersion.get
    assert(log.dvFiles(head).isEmpty)
    val folded = log.read().select("k", "v").as[(Long, Long)].collect().toMap
    assert(folded == got, "rewriteDeletes changed visible rows")
  }

  test("MoR merge tombstones matched keys and appends the batch in one commit") {
    val log = seeded(freshRoot())
    val before = log.files(3L)
    // 21 key updates (40..60) + 20 new-key inserts (301..320), one batch
    val batch = ((40L to 60L) ++ (301L to 320L)).toDF("k")
      .withColumn("v", lit(-1L))
    val v = log.mergeMoR(batch, "k")
    assert(v == 4L)
    // O(rows in the batch) in files written: every pre-merge data file is
    // still referenced BY NAME plus the appended pool file(s) and the
    // tombstone DV — never a rewrite of a touched file (the CoW tier's cost)
    assert(before.forall(log.files(v).contains),
      "MoR merge must not rewrite or drop any existing data file")
    assert(log.files(v).exists(!before.contains(_)) && log.dvFiles(v).nonEmpty)
    val got = log.read().select("k", "v").as[(Long, Long)].collect().toMap
    assert(got.size == 320)
    assert(((40L to 60L) ++ (301L to 320L)).forall(k => got(k) == -1L),
      "merged rows wrong")
    assert(((1L to 39L) ++ (61L to 300L)).forall(k => got(k) == k * 10),
      "untouched rows changed")
    // empty batch commits nothing
    assert(log.mergeMoR(batch.limit(0), "k") == v)
    // duplicate keys in the batch are rejected whole
    intercept[IllegalArgumentException] {
      log.mergeMoR(batch.unionAll(batch.limit(1)), "k")
    }
    // the change feed nets the merge as delete of the 21 replaced rows +
    // insert of all 41 applied rows — no special casing for merge_mor
    val feed = log.changesBetween(3L, v)
      .groupBy("_change_type").count().as[(String, Long)].collect().toMap
    assert(feed == Map("delete" -> 21L, "insert" -> 41L), s"feed wrong: $feed")
    // re-merging the same keys tombstones the APPENDED copies, not the originals
    log.mergeMoR(batch.withColumn("v", lit(-2L)), "k")
    val got2 = log.read().select("k", "v").as[(Long, Long)].collect().toMap
    assert(got2.size == 320 &&
      ((40L to 60L) ++ (301L to 320L)).forall(k => got2(k) == -2L),
      "re-merge lost or duplicated rows")
    // maintenance folds the merge debt: tombstones gone, values keep
    log.rewriteDeletes()
    val head = log.currentVersion.get
    assert(log.dvFiles(head).isEmpty)
    val folded = log.read().select("k", "v").as[(Long, Long)].collect().toMap
    assert(folded == got2, "rewriteDeletes changed visible rows")
  }

  test("MoR update re-applies cleanly over existing tombstones and stacks with MoR delete") {
    val log = seeded(freshRoot())
    log.deleteWhereMoR(col("k") <= 20)
    val v = log.updateWhereMoR(col("k") <= 40, Seq("v" -> lit(-1L)))
    // rows already tombstoned are NOT resurrected by the update
    val got = log.read().select("k", "v").as[(Long, Long)].collect().toMap
    assert(got.size == 280 && !got.contains(1L))
    assert((21L to 40L).forall(k => got(k) == -1L))
    assert((41L to 300L).forall(k => got(k) == k * 10))
    // updating an updated row tombstones the APPENDED copy, not the original
    log.updateWhereMoR(col("v") === -1L, Seq("v" -> lit(-2L)))
    val got2 = log.read().select("k", "v").as[(Long, Long)].collect().toMap
    assert((21L to 40L).forall(k => got2(k) == -2L), s"re-update lost rows")
    assert(got2.size == 280)
    assert(v == 5L)
  }

  test("audit-log status correction over the MoR tier costs O(rows changed) files") {
    val root = freshRoot()
    val audit = new graft.catalog.AuditLog(spark, root)
    (1 to 8).foreach(i => audit.append(s"req_$i", "insert", "fn",
      Map("a" -> "b"), "{}"))
    val log = new CommitLog(spark, root)
    val before = log.files(log.currentVersion.get)
    audit.setStatus("req_3", "insert", "failed", mor = true)
    val head = log.currentVersion.get
    // every one of the 8 appended event files is carried BY NAME — the
    // correction wrote one tombstone + one corrected-row file
    assert(before.forall(log.files(head).contains),
      "MoR status correction must not rewrite any audit event file")
    assert(log.dvFiles(head).nonEmpty)
    val got = audit.lookup("req_3", "insert").select("status").as[String].collect()
    assert(got.toSeq == Seq("failed"))
    assert(audit.events.count() == 8)
  }

  test("CALL update_where drives both UPDATE tiers from the SQL surface") {
    val warehouse = freshRoot()
    spark.conf.set("spark.sql.catalog.gupd", classOf[graft.catalog.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gupd.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gupd.db")
    spark.sql("CREATE TABLE gupd.db.u AS SELECT id AS k, id * 10 AS v, " +
      "concat('s', id % 3) AS tag FROM range(0, 300)")
    val log = new CommitLog(spark, s"$warehouse/db/u")
    val before = log.files(log.currentVersion.get)
    // MoR tier: tombstones + corrected copies, no file rewritten
    spark.sql("CALL gupd.system.update_where('db.u', 'k < 50 AND tag = ''s0''', " +
      "'v = v + 1; tag = upper(tag)', 'mor')").collect()
    val head = log.currentVersion.get
    assert(before.forall(log.files(head).contains), "mor tier rewrote a file")
    assert(log.dvFiles(head).nonEmpty)
    val got = spark.sql("SELECT k, v, tag FROM gupd.db.u ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.length == 300)
    got.foreach { case (k, v, tag) =>
      if (k < 50 && k % 3 == 0) assert(v == k * 10 + 1 && tag == "S0", s"row $k wrong")
      else assert(v == k * 10 && tag == s"s${k % 3}", s"untouched row $k changed")
    }
    // CoW tier from the same surface; simultaneous-assignment swap
    spark.sql("CALL gupd.system.update_where('db.u', 'k = 100', " +
      "'v = k; k = v', 'cow')").collect()
    val r100 = spark.sql("SELECT k, v FROM gupd.db.u WHERE k = 1000").collect()
    assert(r100.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1000L, 100L)),
      "cow tier must apply simultaneous-assignment SET semantics")
    // the debt folds
    spark.sql("CALL gupd.system.rewrite_deletes('db.u')").collect()
    assert(log.dvFiles(log.currentVersion.get).isEmpty)
    assert(spark.sql("SELECT count(*) FROM gupd.db.u").head().getLong(0) == 300)
  }

  test("CALL delete_where drives both DELETE tiers from the SQL surface") {
    val warehouse = freshRoot()
    spark.conf.set("spark.sql.catalog.gdel", classOf[graft.catalog.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdel.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdel.db")
    spark.sql("CREATE TABLE gdel.db.d AS SELECT id AS k, id * 10 AS v " +
      "FROM range(0, 300)")
    val log = new CommitLog(spark, s"$warehouse/db/d")
    val before = log.files(log.currentVersion.get)
    // MoR tier: position tombstones only — every data file carries by name
    spark.sql("CALL gdel.system.delete_where('db.d', 'k < 50', 'mor')").collect()
    val head = log.currentVersion.get
    assert(before.forall(log.files(head).contains), "mor tier rewrote a file")
    assert(log.dvFiles(head).nonEmpty)
    assert(spark.sql("SELECT count(*) FROM gdel.db.d").head().getLong(0) == 250L)
    // CoW tier from the same surface: matching files rewrite, DV count unchanged
    spark.sql("CALL gdel.system.delete_where('db.d', 'k >= 290', 'cow')").collect()
    val head2 = log.currentVersion.get
    assert(log.dvFiles(head2).size == log.dvFiles(head).size,
      "cow tier must not add tombstones")
    assert(spark.sql("SELECT count(*) FROM gdel.db.d").head().getLong(0) == 240L)
    // the MoR debt folds and the visible rows keep
    spark.sql("CALL gdel.system.rewrite_deletes('db.d')").collect()
    assert(log.dvFiles(log.currentVersion.get).isEmpty)
    val ks = spark.sql("SELECT k FROM gdel.db.d").as[Long].collect().sorted
    assert(ks.toSeq == (50L until 290L).toSeq)
    // mode is validated
    val bad = intercept[Exception] {
      spark.sql("CALL gdel.system.delete_where('db.d', 'k = 1', 'zap')").collect()
    }
    assert(String.valueOf(bad.getMessage).contains("'cow' or 'mor'"), bad.getMessage)
  }

  test("MoR update on a hive-partitioned table re-files partition-column SETs") {
    val root = freshRoot()
    val log = new CommitLog(spark, root)
    val df = (1L to 300L).toDF("k")
      .withColumn("v", col("k") * 10L)
      .withColumn("grp", concat(lit("g"), col("k") % 3))
    log.commitPartitioned(df, Seq("grp"), replace = true)
    val before = log.files(log.currentVersion.get)
    // SET touches the PARTITION column: corrected copies must land under
    // their NEW partition directory while old positions tombstone
    val v = log.updateWhereMoR(col("k") <= 30, Seq("grp" -> lit("gX")))
    assert(before.forall(log.files(v).contains),
      "partitioned MoR update must not rewrite any existing data file")
    val moved = log.files(v).filterNot(before.contains)
    assert(moved.nonEmpty && moved.forall(_.contains("grp=gX")),
      s"corrected copies must re-file under the new partition dir: $moved")
    val got = log.read().select("k", "grp").as[(Long, String)].collect().toMap
    assert(got.size == 300)
    assert((1L to 30L).forall(k => got(k) == "gX"))
    assert((31L to 300L).forall(k => got(k) == s"g${k % 3}"))
    // equivalence: the CoW tier over an identical table yields the same
    // snapshot, and folding the MoR debt converges them byte-for-byte
    val root2 = freshRoot()
    val log2 = new CommitLog(spark, root2)
    log2.commitPartitioned(df, Seq("grp"), replace = true)
    log2.updateWhere(col("k") <= 30, Seq("grp" -> lit("gX")))
    def snap(l: CommitLog) = l.read().select("k", "v", "grp")
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(snap(log) == snap(log2), "MoR and CoW tiers must agree")
    log.rewriteDeletes()
    assert(log.dvFiles(log.currentVersion.get).isEmpty)
    assert(snap(log) == snap(log2), "the fold must preserve the snapshot")
  }
}
