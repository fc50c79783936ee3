package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.CommitLog

/** Z-order clustering: proves the layout, not just the rows. A 2-D
  * selective read over a 1-D range-clustered table prunes only on the
  * cluster column; the same read over the Z-ordered table prunes on both
  * dimensions and must open strictly fewer files — `inputFiles` of the
  * returned frame IS the post-pruning scan set, so the assertion measures
  * exactly what a 100 TB executor fleet would read.
  */
class ZOrderSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_zorder").toString

  // 256×256 grid, one row per (x, y): x and y are independent and
  // uniform, the adversarial case for 1-D clustering
  private def grid() = spark.range(65536).select(
    (col("id") % 256).as("x"),
    (col("id") / 256).cast("long").as("y"),
    col("id").as("payload"))

  private def mkTable(): (CommitLog, Long) = {
    val log = new CommitLog(spark, freshRoot())
    log.commit(grid(), replace = false)
    // target ≈ 1/64 of the table so both layouts rewrite into the same
    // file count and only the ORDER differs
    val bytes = log.filePaths(log.currentVersion.get)
      .map(p => new java.io.File(new java.net.URI(p).getPath).length).sum
    (log, math.max(1L, bytes / 64))
  }

  private val query = Seq(("x", 0L, 31L), ("y", 0L, 31L))  // 1/8 × 1/8

  test("2-D selective read prunes multiplicatively after Z-order, not after 1-D clustering") {
    val (log, target) = mkTable()
    val (_, nLinear) = log.optimizeBy("x", target)
    val linearFiles = log.readWhere(query).inputFiles.length
    val linearRows = log.readWhere(query).count()

    val (_, nZ) = log.optimizeZOrder(Seq("x", "y"), target)
    val zFiles = log.readWhere(query).inputFiles.length
    val zRows = log.readWhere(query).count()

    assert(linearRows == 1024 && zRows == 1024, "layout must not change the rows")
    assert(nLinear > 8 && nZ > 8, s"need enough files for pruning to matter: $nLinear, $nZ")
    // x-slab layout: y stats span everything, only the 1/8 x-range prunes
    assert(linearFiles >= nLinear / 12,
      s"1-D layout pruned too well ($linearFiles of $nLinear) — test premise broken")
    // z-layout: files are hyper-rectangles; the 1/64-area query region
    // must hit a small corner of them, beating the x-slab count
    assert(zFiles < linearFiles,
      s"Z-order opened $zFiles files vs $linearFiles for the 1-D layout")
    assert(zFiles <= math.max(4, nZ / 12),
      s"Z-order pruning too weak: $zFiles of $nZ files for a 1/64 region")
  }

  test("Z-order rewrite preserves the table: same rows, same schema, no helper column") {
    val (log, target) = mkTable()
    log.optimizeZOrder(Seq("x", "y"), target)
    val out = log.read()
    assert(out.columns.toSeq == Seq("x", "y", "payload"), out.columns.mkString(","))
    assert(out.count() == 65536)
    assert(out.agg(sum(col("payload"))).head().getLong(0) == 65535L * 65536 / 2)
  }

  test("readWhere conjunction is consistent with a brute-force filter") {
    val (log, target) = mkTable()
    log.optimizeZOrder(Seq("x", "y"), target)
    val pruned = log.readWhere(Seq(("x", 100L, 140L), ("y", 7L, 9L)))
      .select("payload").collect().map(_.getLong(0)).sorted
    val brute = grid().filter(col("x").between(100, 140) && col("y").between(7, 9))
      .select("payload").collect().map(_.getLong(0)).sorted
    assert(pruned.sameElements(brute))
  }

  test("CALL graft.system.optimize with a column list Z-orders through the catalog") {
    val wh = java.nio.file.Files.createTempDirectory("graft_zcat").toString
    spark.conf.set("spark.sql.catalog.zc", "graft.catalog.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.zc.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS zc.db")
      grid().createOrReplaceTempView("zorder_grid_src")
      spark.sql("CREATE TABLE zc.db.zgrid AS SELECT * FROM zorder_grid_src")
      val r = spark.sql("CALL zc.system.optimize('db.zgrid', 'x, y')").collect().head
      assert(r.getInt(1) >= 1, r.toString)
      assert(spark.sql("SELECT count(*) FROM zc.db.zgrid").head().getLong(0) == 65536)
    } finally {
      spark.sql("DROP TABLE IF EXISTS zc.db.zgrid")
      spark.conf.unset("spark.sql.catalog.zc")
      spark.conf.unset("spark.sql.catalog.zc.warehouse")
    }
  }
}
