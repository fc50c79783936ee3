package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.CommitLog

/** Zero-copy shallow clone: the clone's v1 manifest references the
  * source's pool files by absolute path (no data moves), reads and
  * stats-pruning behave identically, writers diverge into the clone's
  * own pool, and compact is the full materializer. Source-side isolation
  * both ways is the contract: appends to either side never show on the
  * other.
  */
class CloneSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def sample(from: Int, to: Int): DataFrame =
    (from to to).map(i => (i.toLong, s"v$i")).toDF("k", "v")

  private def localDataFiles(root: String): Seq[String] = {
    val d = java.nio.file.Paths.get(root, "data")
    if (!java.nio.file.Files.exists(d)) Seq.empty
    else {
      val s = java.nio.file.Files.walk(d)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(p =>
          java.nio.file.Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet")).map(_.toString).toList
      } finally s.close()
    }
  }

  test("shallow clone: zero data files copied, identical rows, stats pruning intact") {
    val srcRoot = tmp("graft_clone_src")
    val dstRoot = tmp("graft_clone_dst") + "/t"
    val src = new CommitLog(spark, srcRoot)
    src.commit(sample(1, 100), replace = true)
    src.commit(sample(101, 200), replace = false)

    val dst = new CommitLog(spark, dstRoot)
    assert(dst.cloneFrom(srcRoot) == 1L)

    // no data moved: the clone's pool is empty, every name is absolute
    assert(localDataFiles(dstRoot).isEmpty)
    val v1 = dst.currentVersion.get
    assert(dst.files(v1).nonEmpty && dst.files(v1).forall(_.startsWith("/")),
      dst.files(v1).take(2))
    assert(dst.read().as[(Long, String)].collect().sorted.toSeq ==
      src.read().as[(Long, String)].collect().sorted.toSeq)

    // carried stats tags keep footer-range pruning (and exact planner
    // stats) working on the clone without touching a footer
    val pruned = dst.readBetween("k", 1, 50)
    assert(pruned.inputFiles.length < dst.files(v1).length)
    assert(pruned.count() == 50)
    val (bytes, rows) = dst.snapshotStats(v1)
    assert(bytes > 0 && rows.contains(200L))
  }

  test("clone and source diverge independently; keyed CoW pools locally") {
    val srcRoot = tmp("graft_clone_div_src")
    val dstRoot = tmp("graft_clone_div_dst")
    val src = new CommitLog(spark, srcRoot)
    src.commit(sample(1, 100), replace = true)
    val dst = new CommitLog(spark, dstRoot)
    dst.cloneFrom(srcRoot)

    // append on the source is invisible to the clone, and vice versa
    src.commit(sample(101, 110), replace = false)
    dst.commit(sample(201, 205), replace = false)
    assert(src.read().count() == 110)
    assert(dst.read().count() == 105)
    assert(src.read().filter($"k" > 200L).isEmpty)

    // a keyed merge rewrites the touched (source-absolute) file into the
    // clone's OWN pool and never mutates the source
    val srcFilesBefore = localDataFiles(srcRoot).toSet
    dst.merge(Seq((1L, "CLONE")).toDF("k", "v"), "k")
    assert(localDataFiles(srcRoot).toSet == srcFilesBefore, "merge wrote into the source pool")
    assert(dst.read().filter($"k" === 1L).select("v").as[String].head() == "CLONE")
    assert(src.read().filter($"k" === 1L).select("v").as[String].head() == "v1")
  }

  test("compact materializes: afterwards no line references the source") {
    val srcRoot = tmp("graft_clone_mat_src")
    val dstRoot = tmp("graft_clone_mat_dst")
    val src = new CommitLog(spark, srcRoot)
    src.commit(sample(1, 100), replace = true)
    val dst = new CommitLog(spark, dstRoot)
    dst.cloneFrom(srcRoot)

    dst.compact()
    val v = dst.currentVersion.get
    assert(dst.files(v).nonEmpty && dst.files(v).forall(!_.startsWith("/")),
      "compact must pull every referenced row into the clone's own pool")
    assert(dst.read().count() == 100)
    // fully self-contained: deleting the source no longer breaks the clone
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(srcRoot))
    assert(dst.read().count() == 100)
  }

  test("source vacuum keeps files a live clone references; full materialization frees them") {
    val srcRoot = tmp("graft_clone_vac_src")
    val src = new CommitLog(spark, srcRoot)
    src.commit(sample(1, 100), replace = true)              // v1 — the cloned files
    val dst = new CommitLog(spark, tmp("graft_clone_vac_dst"))
    dst.cloneFrom(srcRoot)

    // the source replaces its content: v1's files are unreferenced BY THE
    // SOURCE but still referenced by the clone — an aggressive vacuum
    // must keep them live (the registry, not luck)
    src.commit(sample(201, 300), replace = true)            // v2
    val (_, collected) = src.vacuum(keepVersions = 1, minFileAgeMs = 0, minVersionAgeMs = 0)
    assert(collected == 0, s"clone-referenced files were collected ($collected)")
    assert(dst.read().count() == 100, "the clone must survive a source vacuum")

    // full materialization = compact (pull rows local) + branch vacuum
    // (drop the absolute-referencing clone versions); then the source
    // vacuum finally collects and the registry self-cleans
    dst.compact()
    dst.vacuum(keepVersions = 1, minFileAgeMs = 0, minVersionAgeMs = 0)
    val (_, collected2) = src.vacuum(keepVersions = 1, minFileAgeMs = 0, minVersionAgeMs = 0)
    assert(collected2 >= 1, "materialized clone must release the source's files")
    assert(dst.read().count() == 100)
    assert(src.read().count() == 100)
    assert(!java.nio.file.Files.list(java.nio.file.Paths.get(srcRoot, "_clones"))
      .iterator().hasNext, "registry must self-clean once nothing is referenced")
  }

  test("time-travel clone pins a historical snapshot, immune to later source commits") {
    val srcRoot = tmp("graft_clone_tt_src")
    val src = new CommitLog(spark, srcRoot)
    src.commit(sample(1, 100), replace = true)          // v1
    src.commit(sample(101, 150), replace = false)       // v2

    val dst = new CommitLog(spark, tmp("graft_clone_tt_dst"))
    dst.cloneFrom(srcRoot, versionAsOf = Some(1L))
    assert(dst.read().count() == 100)
    src.commit(sample(151, 160), replace = false)       // later source growth
    assert(dst.read().count() == 100, "the clone must pin its snapshot")

    assert(intercept[IllegalArgumentException] {
      new CommitLog(spark, tmp("graft_clone_tt_bad")).cloneFrom(srcRoot, Some(99L))
    }.getMessage.contains("not retained"))
  }

  test("refusals: partitioned source, tombstoned source, non-empty target") {
    val partRoot = tmp("graft_clone_part")
    val part = new CommitLog(spark, partRoot)
    part.commitPartitioned(
      (1 to 20).map(i => (i.toLong, s"c${i % 2}")).toDF("k", "cat"),
      Seq("cat"), replace = true)
    assert(intercept[IllegalArgumentException] {
      new CommitLog(spark, tmp("graft_clone_t1")).cloneFrom(partRoot)
    }.getMessage.contains("hive-partitioned"))

    val dvRoot = tmp("graft_clone_dv")
    val dv = new CommitLog(spark, dvRoot)
    dv.commit(sample(1, 50), replace = true)
    dv.deleteKeysMoR(Seq(1L).toDF("k"), "k")
    assert(intercept[IllegalArgumentException] {
      new CommitLog(spark, tmp("graft_clone_t2")).cloneFrom(dvRoot)
    }.getMessage.contains("deletion vectors"))

    val okRoot = tmp("graft_clone_ok")
    new CommitLog(spark, okRoot).commit(sample(1, 10), replace = true)
    val busy = new CommitLog(spark, tmp("graft_clone_busy"))
    busy.commit(sample(1, 5), replace = true)
    assert(intercept[IllegalArgumentException] {
      busy.cloneFrom(okRoot)
    }.getMessage.contains("already has commits"))
  }

  test("clone forks declarative metadata: evolved schema, constraints, TTL") {
    val srcRoot = tmp("graft_clone_meta") + "/src"
    val src = new CommitLog(spark, srcRoot)
    src.commit(sample(1, 10), replace = false)
    src.mergeMoR(Seq((11L, "v11", 1.5)).toDF("k", "v", "w"), "k", evolve = true)
    src.rewriteDeletes()   // clone refuses tombstoned sources
    src.addConstraint("k_pos", "k > 0")
    src.setTtl("k", 123456L)

    val dstRoot = tmp("graft_clone_meta") + "/dst"
    val dst = new CommitLog(spark, dstRoot)
    dst.cloneFrom(srcRoot)
    assert(dst.evolvedSchema.exists(_.fieldNames.contains("w")),
      "clone must fork the evolved schema of record")
    assert(dst.checkConstraints == Map("k_pos" -> "k > 0"),
      "clone must fork CHECK constraints")
    assert(dst.ttlPolicy.contains(("k", 123456L)),
      "clone must fork the TTL policy")
    // forked metadata ENFORCES on the clone: a violating insert bounces
    intercept[Exception] {
      dst.commit(Seq((-1L, "bad", 0.0)).toDF("k", "v", "w"), replace = false)
    }
    // and streams into the clone start their OWN txn ledger (#txn: not carried)
    assert(!java.nio.file.Files.readString(java.nio.file.Paths.get(
      s"$dstRoot/_commits/00000001.manifest")).contains("#txn:"))
  }

  test("CALL graft.system.clone through the catalog, sidecars ride along") {
    val warehouse = tmp("graft_clone_wh")
    spark.conf.set("spark.sql.catalog.gc", classOf[graft.catalog.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gc.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gc.db")
    spark.sql("CREATE TABLE gc.db.src (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gc.db.src SELECT id, concat('v', id) FROM range(0, 100)")

    val r = spark.sql("CALL gc.system.clone('db.src', 'db.dst')").collect().head
    assert(r.getLong(0) == 1L && r.getInt(1) > 0)
    assert(spark.sql("SELECT count(*) FROM gc.db.dst").as[Long].head() == 100)
    // declared schema sidecar came along: column order/type preserved
    assert(spark.sql("SELECT * FROM gc.db.dst").columns.toSeq == Seq("k", "v"))
    assert(localDataFiles(s"$warehouse/db/dst").isEmpty)

    // divergence through SQL: insert into the clone only
    spark.sql("INSERT INTO gc.db.dst VALUES (999, 'x')")
    assert(spark.sql("SELECT count(*) FROM gc.db.dst").as[Long].head() == 101)
    assert(spark.sql("SELECT count(*) FROM gc.db.src").as[Long].head() == 100)
  }
}
