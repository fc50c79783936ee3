package graft

import graft.catalog.CommitLog
import org.scalatest.funsuite.AnyFunSuite

/** Per-file Bloom-filter point-lookup index: build over a snapshot,
  * probe with `readEquals`, and pin the contracts that matter at scale —
  * zero false negatives (every present key's rows come back exactly),
  * real file-skipping on a high-cardinality unclustered column (footer
  * min/max alone cannot prune it), absent keys short-circuit, carried
  * files keep their filters across later commits, and unindexed new
  * files scan conservatively instead of silently dropping rows.
  */
class BloomIndexSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_bloom").toString

  /** 8 files, ids striped so every file's [min,max] spans ~the whole key
    * space — the layout where footer stats prune nothing and only a
    * content index helps.
    */
  private def stripedTable(root: String, n: Int = 4000): CommitLog = {
    val log = new CommitLog(spark, root)
    val df = spark.range(0, n).select(
      $"id".as("k"),
      ($"id" % 97).as("bucket"),
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("u"), $"id").as("tag"))
      .repartition(8)   // round-robin: every file spans the id range
    log.commit(df, replace = true)
    log
  }

  test("build + probe: present keys return exact rows, fewer files scanned") {
    val log = stripedTable(tmp())
    val (v, filesIndexed) = log.buildBloomIndex("k")
    assert(v == 1L && filesIndexed == 8)

    // footer stats alone cannot prune a striped layout; the bloom index
    // must cut the scan to ~1 file (fpp 1% on 8 files)
    var pruned = 0
    (0L until 200L by 29L).foreach { key =>
      val q = log.readEquals(Seq("k" -> key))
      val got = q.collect()
      assert(got.length == 1, s"key $key")
      assert(got.head.getAs[String]("tag") == s"u$key")
      val pf = q.inputFiles.length
      if (pf < 8) pruned += 1
      assert(pf >= 1)
    }
    assert(pruned >= 5, s"bloom should prune most striped lookups, pruned=$pruned")
  }

  test("absent key: no file admits it, read short-circuits to zero rows") {
    val log = stripedTable(tmp())
    log.buildBloomIndex("k")
    val out = log.readEquals(Seq("k" -> 999999L))
    assert(out.count() == 0)
  }

  test("string column index hashes by the column's own type") {
    val log = stripedTable(tmp())
    log.buildBloomIndex("tag")
    val got = log.readEquals(Seq("tag" -> "u1234")).collect()
    assert(got.length == 1 && got.head.getAs[Long]("k") == 1234L)
    assert(log.readEquals(Seq("tag" -> "nope")).count() == 0)
  }

  test("carried files keep filters; files added after the build scan conservatively") {
    val root = tmp()
    val log = stripedTable(root)
    log.buildBloomIndex("k")
    // auto-maintain OFF: this test pins the CONSERVATIVE fallback the
    // whole design guarantees for unindexed files
    spark.conf.set("spark.graft.bloomIndex.autoMaintain", "false")
    try {
      // append NEW rows (unindexed file): lookups on them must still work
      log.commit(Seq((100000L, 3L, "late")).toDF("k", "bucket", "tag"), replace = false)
      val late = log.readEquals(Seq("k" -> 100000L)).collect()
      assert(late.length == 1 && late.head.getAs[String]("tag") == "late")
      // old keys still prune: only indexed files that might contain + the
      // one unindexed file are scanned
      val old = log.readEquals(Seq("k" -> 77L))
      assert(old.count() == 1)
      assert(old.inputFiles.length < 9, s"expected pruning, got ${old.inputFiles.length}")
    } finally spark.conf.unset("spark.graft.bloomIndex.autoMaintain")
  }

  test("auto-maintain: post-build commits index their new files at commit time") {
    val root = tmp()
    val log = stripedTable(root)
    log.buildBloomIndex("k")
    // a striped append AFTER the build — its files get filters appended
    // into the live index dir by the commit itself (no rebuild)
    log.commit(spark.range(50000, 54000).select(
      $"id".as("k"), ($"id" % 97).as("bucket"),
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("u"), $"id").as("tag"))
      .repartition(4), replace = false)
    // a key in the NEW batch prunes instead of scanning all 12 files
    val fresh = log.readEquals(Seq("k" -> 50017L))
    assert(fresh.collect().map(_.getAs[String]("tag")).toSeq == Seq("u50017"))
    assert(fresh.inputFiles.length < 6,
      s"maintained filters must prune new files too: ${fresh.inputFiles.length}")
    // zero false negatives across old AND new batches
    ((0L until 4000L by 997L) ++ (50000L until 54000L by 991L)).foreach { key =>
      assert(log.readEquals(Seq("k" -> key)).count() == 1, s"key $key")
    }
    // absent keys still short-circuit through both filter generations
    assert(log.readEquals(Seq("k" -> 999999L)).count() == 0)
  }

  test("multi-predicate readEquals prunes on each indexed column") {
    val log = stripedTable(tmp())
    log.buildBloomIndex("k")
    log.buildBloomIndex("tag")
    val got = log.readEquals(Seq("k" -> 55L, "tag" -> "u55")).collect()
    assert(got.length == 1)
    assert(log.readEquals(Seq("k" -> 55L, "tag" -> "u54")).count() == 0)
  }

  test("rebuild marks the superseded index; vacuum retires it; probes never lapse") {
    val root = tmp()
    val log = stripedTable(root)
    log.buildBloomIndex("k")
    log.commit(Seq((200000L, 1L, "x2")).toDF("k", "bucket", "tag"), replace = false)
    val (v2, n2) = log.buildBloomIndex("k")
    assert(v2 == 2L && n2 == 9)
    // the rebuild does NOT delete the old build — a concurrent probe that
    // already resolved v1 keeps index-grade pruning through the swap; v1
    // only carries the retirement marker
    val idxRoot = new java.io.File(s"$root/_index/bloom/k")
    def dirs = idxRoot.listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("v1", "v2"), dirs.toString)
    assert(new java.io.File(s"$root/_index/bloom/k/v1/_superseded").exists())
    assert(!new java.io.File(s"$root/_index/bloom/k/v2/_superseded").exists())
    // new probes serve from v2 and still prune
    assert(log.readEquals(Seq("k" -> 200000L)).count() == 1)
    // vacuum past the age guard collects the marked dir, keeps v2
    log.vacuum(keepVersions = 1, minFileAgeMs = 0L, minVersionAgeMs = 0L): Unit
    assert(dirs == Set("v2"), dirs.toString)
    assert(log.readEquals(Seq("k" -> 200000L)).count() == 1)
  }

  test("CALL graft.system.build_bloom_index works through the catalog") {
    val warehouse = java.nio.file.Files.createTempDirectory("graft_bloomwh").toString
    spark.conf.set("spark.sql.catalog.gb", classOf[graft.catalog.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gb.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gb.db")
    spark.sql("CREATE TABLE gb.db.bt AS SELECT id AS k, id % 5 AS b FROM range(0, 100)")
    val row = spark.sql("CALL gb.system.build_bloom_index('db.bt', 'k')").head()
    assert(row.getLong(0) == 1L && row.getInt(1) >= 1)
    val log = new CommitLog(spark, s"$warehouse/db/bt")
    assert(log.readEquals(Seq("k" -> 42L)).count() == 1)
  }

  test("CALL detail reports the metadata snapshot including bloom indexes") {
    val warehouse = java.nio.file.Files.createTempDirectory("graft_dtlwh").toString
    spark.conf.set("spark.sql.catalog.gdt", classOf[graft.catalog.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdt.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdt.db")
    spark.sql("CREATE TABLE gdt.db.dt AS SELECT id AS k, id % 3 AS b FROM range(0, 300)")
    spark.sql("CALL gdt.system.build_bloom_index('db.dt', 'k')").collect()
    val r = spark.sql("CALL gdt.system.detail('db.dt')").head()
    assert(r.getLong(0) == 1L)                       // version
    assert(r.getInt(1) >= 1 && r.getInt(2) == 0)     // files, dv_files
    assert(r.getLong(3) > 0L && r.getLong(4) == 300L) // bytes, rows
    assert(r.getString(5) == "")                     // unpartitioned
    assert(r.getLong(6) == -1L)                      // never analyzed
    assert(r.getString(7) == "k@v1", r.getString(7)) // bloom index
    assert(r.getString(8) == "")                     // no ann index
  }

  test("tombstoned rows never resurrect through an indexed read") {
    val root = tmp()
    val log = stripedTable(root)
    log.buildBloomIndex("k")
    log.deleteWhereMoR(org.apache.spark.sql.functions.col("k") === 77L)
    assert(log.readEquals(Seq("k" -> 77L)).count() == 0)
    assert(log.readEquals(Seq("k" -> 78L)).count() == 1)
  }
}
