package graft

import graft.catalog.{CommitLog, MaterializedView}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental materialized-view maintenance over the change data feed:
  * every refresh must equal a from-scratch recompute of the aggregate at
  * the source head — across appends, CoW deletes, MoR deletion vectors,
  * and group drain — while processing only O(changes) rows (the property
  * that makes the view viable against a 100 TB source).
  */
class MaterializedViewSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def freshSource(): (CommitLog, String) = {
    val root = tmp("graft_mv_src")
    val log = new CommitLog(spark, root)
    val df = spark.range(0, 300).select(
      $"id".as("k"),
      concat(lit("g"), $"id" % 5).as("grp"),
      ($"id" * 10).cast("double").as("x"))
    log.commit(df, replace = true)
    (log, root)
  }

  /** Ground truth: full recompute at the source head. */
  private def recompute(log: CommitLog): Map[String, (Long, BigDecimal)] =
    log.read().groupBy("grp")
      .agg(count(lit(1)).as("cnt"), sum(col("x").cast("decimal(38,6)")).as("sx"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), BigDecimal(r.getDecimal(2))))
      .toMap

  private def viewState(mv: MaterializedView): Map[String, (Long, BigDecimal)] =
    mv.read().collect()
      .map(r => r.getAs[String]("grp") ->
        (r.getAs[Long]("cnt"), BigDecimal(r.getAs[java.math.BigDecimal]("sum_x"))))
      .toMap

  test("create equals full aggregate; no-op refresh processes zero rows") {
    val (srcLog, srcRoot) = freshSource()
    val mv = MaterializedView.create(spark, tmp("graft_mv"), srcRoot,
      Seq("grp"), Seq("x" -> "sum_x"))
    assert(viewState(mv) == recompute(srcLog))
    val (v, n) = mv.refresh()
    assert(v == 1L && n == 0L)
  }

  test("append then refresh: view equals recompute, delta is O(changes)") {
    val (srcLog, srcRoot) = freshSource()
    val mv = MaterializedView.create(spark, tmp("graft_mv"), srcRoot,
      Seq("grp"), Seq("x" -> "sum_x"))
    srcLog.commit(Seq((1000L, "g1", 70.0), (1001L, "g9", 5.5))
      .toDF("k", "grp", "x"), replace = false)
    val (_, n) = mv.refresh()
    assert(n == 2L, s"refresh must process only the 2 appended rows, got $n")
    assert(viewState(mv) == recompute(srcLog))
    // the brand-new group g9 appeared
    assert(viewState(mv).contains("g9"))
  }

  test("CoW delete then refresh: removed rows subtract; drained groups drop") {
    val (srcLog, srcRoot) = freshSource()
    val mv = MaterializedView.create(spark, tmp("graft_mv"), srcRoot,
      Seq("grp"), Seq("x" -> "sum_x"))
    // drain g2 entirely, partially shrink g3
    srcLog.deleteWhere(col("grp") === "g2" || (col("grp") === "g3" && col("k") < 100))
    mv.refresh()
    val st = viewState(mv)
    assert(st == recompute(srcLog))
    assert(!st.contains("g2"), "drained group must leave the view")
    assert(st.contains("g3"))
  }

  test("MoR deletion vectors flow through the feed into the view") {
    val (srcLog, srcRoot) = freshSource()
    val mv = MaterializedView.create(spark, tmp("graft_mv"), srcRoot,
      Seq("grp"), Seq("x" -> "sum_x"))
    srcLog.deleteWhereMoR(col("k") % 3 === 0)
    mv.refresh()
    assert(viewState(mv) == recompute(srcLog))
  }

  test("multiple refreshes accumulate correctly; cursor survives reopen") {
    val (srcLog, srcRoot) = freshSource()
    val mvRoot = tmp("graft_mv")
    MaterializedView.create(spark, mvRoot, srcRoot, Seq("grp"), Seq("x" -> "sum_x"))
    srcLog.commit(Seq((2000L, "g0", 1.0)).toDF("k", "grp", "x"), replace = false)
    val mv1 = MaterializedView.open(spark, mvRoot)
    mv1.refresh()
    srcLog.deleteWhere(col("k") === 2000L)
    srcLog.commit(Seq((3000L, "g4", 2.0)).toDF("k", "grp", "x"), replace = false)
    val mv2 = MaterializedView.open(spark, mvRoot)
    val (v, _) = mv2.refresh()
    assert(v == srcLog.currentVersion.get)
    assert(viewState(mv2) == recompute(srcLog))
    // already-current reopen: zero-row refresh
    assert(MaterializedView.open(spark, mvRoot).refresh()._2 == 0L)
  }

  test("CALL create_mv / refresh_mv drive the view through the catalog") {
    val warehouse = java.nio.file.Files.createTempDirectory("graft_mvwh").toString
    spark.conf.set("spark.sql.catalog.gm", classOf[graft.catalog.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gm.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gm.db")
    spark.sql("CREATE TABLE gm.db.src AS " +
      "SELECT id AS k, concat('g', id % 3) AS grp, CAST(id AS DOUBLE) AS x FROM range(0, 90)")
    val created = spark.sql(
      "CALL gm.system.create_mv('db.src', 'db.src_mv', 'grp', 'x:sum_x')").head()
    assert(created.getLong(0) == 1L)
    spark.sql("INSERT INTO gm.db.src VALUES (1000, 'g0', 500.0)")
    val refreshed = spark.sql("CALL gm.system.refresh_mv('db.src_mv')").head()
    assert(refreshed.getLong(0) == 2L && refreshed.getLong(1) == 1L)
    val mv = MaterializedView.open(spark, s"$warehouse/db/src_mv")
    val g0 = mv.read().filter(col("grp") === "g0").head()
    assert(g0.getAs[Long]("cnt") == 31L)
    // the view reads through the catalog too (it IS a commit-log table)
    assert(spark.sql("SELECT count(*) FROM gm.db.src_mv").head().getLong(0) == 3L)
  }

  test("cursor is atomic with the fold: a lost sidecar write never double-folds") {
    val (srcLog, srcRoot) = freshSource()
    val mvRoot = tmp("graft_mv")
    MaterializedView.create(spark, mvRoot, srcRoot, Seq("grp"), Seq("x" -> "sum_x"))
    srcLog.commit(Seq((2000L, "g0", 7.0)).toDF("k", "grp", "x"), replace = false)
    val mv = MaterializedView.open(spark, mvRoot)
    mv.refresh()
    val good = viewState(mv)
    // simulate the crash window the sidecar had: the fold committed but
    // the _mv.json cursor write was lost (roll it back to version 1)
    val fs = graft.catalog.HadoopFs.fs(spark, mvRoot)
    val p = new org.apache.hadoop.fs.Path(mvRoot, "_mv.json")
    val body = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val rolledBack = body.replaceAll("\"version\":\\d+", "\"version\":1")
    assert(rolledBack != body)
    graft.catalog.LogStore.write(fs, p, rolledBack.getBytes("UTF-8"))
    // a re-opened view trusts the #mvsrc header in its own commit, not
    // the stale sidecar: refresh is a no-op, counts do not double
    val reopened = MaterializedView.open(spark, mvRoot)
    assert(reopened.refreshedVersion == srcLog.currentVersion.get)
    assert(reopened.refresh()._2 == 0L)
    assert(viewState(reopened) == good)
  }

  test("join view: a dim commit racing the incremental fold never mixes dim versions") {
    // fact(fk, grp-irrelevant) joins dim(pk, grp); the view groups by the
    // DIM's grp column, so a dim change visibly re-labels groups
    val factRoot = tmp("graft_mv_jf")
    val dimRoot = tmp("graft_mv_jd")
    val factLog = new CommitLog(spark, factRoot)
    val dimLog = new CommitLog(spark, dimRoot)
    factLog.commit(spark.range(0, 100).select(
      ($"id" % 10).as("fk"), ($"id" * 1.0).cast("double").as("x")), replace = true)
    dimLog.commit(spark.range(0, 10).select(
      $"id".as("pk"), concat(lit("g"), $"id" % 3).as("grp")), replace = true)
    val mvRoot = tmp("graft_mv_race")
    val mv = MaterializedView.create(spark, mvRoot, factRoot,
      Seq("grp"), Seq("x" -> "sum_x"), Seq((dimRoot, "fk", "pk")))
    // ground truth against the PRE-commit dim (the version the cursor pins)
    def truth(dimV: Long): Map[String, (Long, BigDecimal)] =
      factLog.read().join(dimLog.readVersion(dimV), $"fk" === $"pk")
        .groupBy("grp")
        .agg(count(lit(1)).as("cnt"), sum(col("x").cast("decimal(38,6)")).as("sum_x"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), BigDecimal(r.getDecimal(2))))
        .toMap
    val preDimV = dimLog.currentVersion.get
    // fact moves (so refresh takes the INCREMENTAL path), and the dim
    // commit lands in the exact window between the staleness check and
    // the fold — the race the dim-version pin closes
    factLog.commit(Seq((3L, 1000.0), (7L, 500.0)).toDF("fk", "x"), replace = false)
    mv.afterStalenessCheck = () => {
      dimLog.commit(spark.range(0, 10).select(
        $"id".as("pk"), lit("gNEW").as("grp")), replace = true)
      mv.afterStalenessCheck = () => ()
    }
    mv.refresh()
    // the fold must equal the recompute against the PINNED dim — never a
    // mix of old-dim folded state and new-dim delta rows
    assert(viewState(mv) == truth(preDimV),
      "racing dim commit leaked into the incremental fold")
    // the NEXT refresh sees the cursor mismatch and recomputes fully
    mv.refresh()
    assert(viewState(mv) == truth(dimLog.currentVersion.get),
      "post-race refresh must recompute against the new dim")
    assert(viewState(mv).keySet == Set("gNEW"))
  }

  test("dim-move recompute reports rows from manifest tags — never a second source scan") {
    val factRoot = tmp("graft_mv_1scan_f")
    val dimRoot = tmp("graft_mv_1scan_d")
    val factLog = new CommitLog(spark, factRoot)
    val dimLog = new CommitLog(spark, dimRoot)
    factLog.commit(spark.range(0, 100).select(
      ($"id" % 10).as("fk"), ($"id" * 1.0).cast("double").as("x")), replace = true)
    dimLog.commit(spark.range(0, 10).select(
      $"id".as("pk"), concat(lit("g"), $"id" % 3).as("grp")), replace = true)
    val mv = MaterializedView.create(spark, tmp("graft_mv_1scan"), factRoot,
      Seq("grp"), Seq("x" -> "sum_x"), Seq((dimRoot, "fk", "pk")))
    // clean-manifest dim move: the reported count must equal the
    // manifest's commit-time row tags (metadata, not a scan)
    dimLog.commit(spark.range(0, 10).select(
      $"id".as("pk"), lit("gA").as("grp")), replace = true)
    assert(mv.refresh() == (factLog.currentVersion.get, 100L))
    // tombstoned source: exact visible rows are NOT knowable from the
    // manifest — a metadata answer must say so (−1), while a hidden
    // second scan would "helpfully" return the exact 99. The sentinel IS
    // the proof the second scan is gone.
    factLog.deleteWhereMoR($"fk" === 0L && $"x" === 0.0)
    dimLog.commit(spark.range(0, 10).select(
      $"id".as("pk"), lit("gB").as("grp")), replace = true)
    val (v, n) = mv.refresh()
    assert(v == factLog.currentVersion.get && n == -1L,
      s"dim-move refresh over a tombstoned source must report -1 (metadata), got $n")
    // and the recomputed view itself is still exact
    assert(viewState(mv).keySet == Set("gB"))
    assert(viewState(mv)("gB")._1 == 99L)
  }

  test("update-in-place (merge) nets out through delete+insert change rows") {
    val (srcLog, srcRoot) = freshSource()
    val mv = MaterializedView.create(spark, tmp("graft_mv"), srcRoot,
      Seq("grp"), Seq("x" -> "sum_x"))
    // CoW merge: bump x for two keys (same groups, new sums)
    srcLog.merge(Seq((10L, "g0", 12345.0), (11L, "g1", 54321.0))
      .toDF("k", "grp", "x"), "k")
    mv.refresh()
    assert(viewState(mv) == recompute(srcLog))
  }
}
