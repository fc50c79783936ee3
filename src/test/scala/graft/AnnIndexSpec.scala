package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{AnnIndex, CommitLog}

/** Persisted k-means IVF index (`_index/ann/` sidecar): a probe in a
  * later session must reuse the trained centroids + assignments from
  * disk, be EXACT at nprobe = k, stay conservative on vectors committed
  * after the build, and retire superseded builds.
  */
class AnnIndexSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_ann").toString + "/t"

  /** 120 deterministic dim-8 float vectors with mild cluster structure. */
  private def vectors(n: Int = 120): DataFrame =
    spark.range(0, n).select(
      $"id".as("vec_id"),
      expr("transform(sequence(0, 7), j -> " +
        "CAST(pmod(id * (j + 3), 17) + 5 * pmod(id, 4) AS FLOAT))").as("embedding"))

  private def topIds(df: DataFrame): Seq[Long] =
    df.select("vec_id").as[Long].collect().toSeq

  test("probe at nprobe = k equals brute force, reloaded purely from disk") {
    val root = freshRoot()
    val log = new CommitLog(spark, root)
    log.commit(vectors(), replace = true)
    val (v, k) = AnnIndex.build(spark, root, "embedding", "vec_id", k = 6, iters = 3)
    assert(v == 1L && k == 6)
    // "another session": nothing held in memory — probe resolves the
    // sidecar from disk on every call
    val got = topIds(AnnIndex.probe(spark, root, "embedding", "vec_id",
      anchorId = 3L, nprobe = 6, topk = 10))
    val truth = topIds(graft.ops.KMeansIvf.bruteForce(spark,
      log.read().select(col("vec_id"), col("embedding")), 3L, 10))
    assert(got == truth, s"nprobe=k must be exact: $got vs $truth")
    // small nprobe returns a subset-quality result: all real ids, k known
    val approx = topIds(AnnIndex.probe(spark, root, "embedding", "vec_id",
      3L, nprobe = 2, topk = 10))
    assert(approx.size == 10 && approx.forall(id => id >= 0 && id < 120))
    assert((approx.toSet & truth.toSet).nonEmpty)
  }

  test("vectors committed after the build are scanned conservatively") {
    val root = freshRoot()
    val log = new CommitLog(spark, root)
    log.commit(vectors(), replace = true)
    AnnIndex.build(spark, root, "embedding", "vec_id", k = 6, iters = 2)
    // append a NEW vector identical to the anchor's embedding with
    // auto-maintain OFF — absent from the assignments, it must still
    // surface (cosine = 1.0) even at nprobe = 1
    val anchorEmb = log.read().filter(col("vec_id") === 3L)
      .select("embedding").as[Seq[Float]].head()
    spark.conf.set("spark.graft.annIndex.autoMaintain", "false")
    try log.commit(Seq((999L, anchorEmb)).toDF("vec_id", "embedding"),
      replace = false): Unit
    finally spark.conf.unset("spark.graft.annIndex.autoMaintain")
    assert(!AnnIndex.load(spark, root, "embedding").get._3
      .select("vec_id").as[Long].collect().contains(999L),
      "conf off must leave the new vector unindexed")
    val top = AnnIndex.probe(spark, root, "embedding", "vec_id",
      3L, nprobe = 1, topk = 3)
      .as[(Long, Double)].collect()
    val twin = top.find(_._1 == 999L)
    assert(twin.exists(t => math.abs(t._2 - 1.0) < 1e-6),
      s"later-added twin vector must surface at cosine 1.0 despite being " +
        s"absent from the index: ${top.toSeq}")
  }

  test("auto-maintain: post-build commits index their vectors at publish") {
    val root = freshRoot()
    val log = new CommitLog(spark, root)
    log.commit(vectors(), replace = true)
    AnnIndex.build(spark, root, "embedding", "vec_id", k = 6, iters = 2)
    // append 40 new vectors: publish must assign them to trained
    // centroids — indexed, not the conservative unindexed tail
    log.commit(vectors(160).filter(col("vec_id") >= 120L), replace = false)
    def assigns() = AnnIndex.load(spark, root, "embedding").get._3
    val ids = assigns().select("vec_id").as[Long].collect().toSet
    assert((120L until 160L).forall(ids), "new vectors must be assigned")
    assert(assigns().count() == assigns().select("vec_id").distinct().count(),
      "no duplicate assignments")
    // a CoW rewrite re-commits EXISTING rows in new files — left-anti
    // must keep them from re-assigning (no duplicates)
    log.deleteWhere(col("vec_id") % 7L === 0L): Unit
    assert(assigns().count() == assigns().select("vec_id").distinct().count(),
      "CoW rewrite must not duplicate assignments")
    // probe parity over the grown, mutated corpus: nprobe = k is exact
    val got = topIds(AnnIndex.probe(spark, root, "embedding", "vec_id",
      3L, nprobe = 6, topk = 10))
    val truth = topIds(graft.ops.KMeansIvf.bruteForce(spark,
      log.read().select(col("vec_id"), col("embedding")), 3L, 10))
    assert(got == truth, s"auto-maintained index must stay exact: $got vs $truth")
  }

  test("CALL build_ann_index persists through the catalog; detail reports it") {
    val warehouse = java.nio.file.Files.createTempDirectory("graft_annwh").toString
    spark.conf.set("spark.sql.catalog.gann",
      classOf[graft.catalog.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gann.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gann.db")
    spark.sql("CREATE TABLE gann.db.emb AS SELECT id AS vec_id, " +
      "transform(sequence(0, 7), j -> CAST(pmod(id * (j + 3), 17) AS FLOAT)) " +
      "AS embedding FROM range(0, 100)")
    val r = spark.sql(
      "CALL gann.system.build_ann_index('db.emb', 'embedding', 'vec_id', 4, 2)").head()
    assert(r.getLong(0) == 1L && r.getInt(1) == 4)
    val d = spark.sql("CALL gann.system.detail('db.emb')").head()
    assert(d.getString(8) == "embedding@v1", d.getString(8))
    // a sub-threshold post-build wave: the index keeps serving (no
    // retrain at 0.3 < 0.5) and detail REPORTS the drift ratio
    spark.sql("INSERT INTO gann.db.emb SELECT id AS vec_id, " +
      "transform(sequence(0, 7), j -> CAST(pmod(id * (j + 3), 17) AS FLOAT)) " +
      "AS embedding FROM range(100, 130)")
    val d2 = spark.sql("CALL gann.system.detail('db.emb')").head()
    assert(d2.getString(8) == "embedding@v1(drift 0.3)", d2.getString(8))
    // the persisted index probes across "sessions" (pure disk reload)
    val got = AnnIndex.probe(spark, s"$warehouse/db/emb", "embedding", "vec_id",
      anchorId = 7L, nprobe = 4, topk = 5)
    assert(got.count() == 5)
  }

  /** Deterministic dim-8 vectors from a DIRECTIONALLY distinct family
    * (mass on dims 0-1, noise elsewhere) — far from the original build
    * in both L2 (k-means space) and cosine (probe metric).
    */
  private def shiftedVectors(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).select(
      $"id".as("vec_id"),
      expr("transform(sequence(0, 7), j -> CAST(CASE WHEN j < 2 " +
        "THEN 200 + pmod(id * (j + 5), 13) " +
        "ELSE pmod(id * (j + 5), 3) END AS FLOAT))").as("embedding"))

  test("drift policy: a post-build wave flips staleness; auto-retrain restores recall") {
    val root = freshRoot()
    val log = new CommitLog(spark, root)
    // ids 0 and 68 are all-zero vectors (cosine NaN, which Spark orders
    // above every number) — degenerate for a recall comparison, out
    log.commit(vectors(100).filter("vec_id NOT IN (0, 68)"), replace = true)
    AnnIndex.build(spark, root, "embedding", "vec_id", k = 4, iters = 3)
    assert(AnnIndex.staleness(spark, root, "embedding").contains(0.0))

    // a wave from a SHIFTED distribution with retrain OFF: auto-maintain
    // assigns it to the frozen centroids and the index goes stale
    spark.conf.set("spark.graft.annIndex.autoRetrain", "false")
    try {
      log.commit(shiftedVectors(1000, 1080), replace = false)
      val stale = AnnIndex.staleness(spark, root, "embedding").get
      assert(stale > 0.5, s"80 post-build vectors on a 98-vector build: $stale")
      assert(AnnIndex.load(spark, root, "embedding").map(_._1).contains(1L),
        "retrain off: the frozen build must still serve")

      // retrain ON: the next publish crosses the threshold and rebuilds
      // at the new head with the original (k, iters)
      spark.conf.set("spark.graft.annIndex.autoRetrain", "true")
      log.commit(shiftedVectors(1080, 1100), replace = false)
      assert(AnnIndex.staleness(spark, root, "embedding").contains(0.0),
        "auto-retrain must reset the drift baseline")
      assert(AnnIndex.load(spark, root, "embedding").map(_._1)
        .contains(log.currentVersion.get), "index must be rebuilt at the head")

      // the retrained centroids OWN the shifted region: a small-nprobe
      // probe anchored there now returns the exact top-k
      val got = topIds(AnnIndex.probe(spark, root, "embedding", "vec_id",
        anchorId = 1005L, nprobe = 2, topk = 5))
      val truth = topIds(graft.ops.KMeansIvf.bruteForce(spark,
        log.read().select(col("vec_id"), col("embedding")), 1005L, 5))
      assert(got == truth,
        s"retrained index must place centroids in the shifted region: $got vs $truth")
    } finally spark.conf.unset("spark.graft.annIndex.autoRetrain")
  }

  test("rebuild marks the superseded index; vacuum retires it; probes never lapse") {
    val root = freshRoot()
    val log = new CommitLog(spark, root)
    log.commit(vectors(60), replace = true)
    AnnIndex.build(spark, root, "embedding", "vec_id", k = 4, iters = 2)
    log.commit(vectors(90), replace = true)
    val (v2, _) = AnnIndex.build(spark, root, "embedding", "vec_id", k = 4, iters = 2)
    assert(v2 == 2L)
    val fs = graft.catalog.HadoopFs.fs(spark, root)
    def dirs = fs.listStatus(new org.apache.hadoop.fs.Path(root, "_index/ann/embedding"))
      .map(_.getPath.getName).toSeq.sorted
    // the rebuild does NOT delete the old build — a probe that already
    // resolved v1 keeps serving through the swap; v1 is only marked
    assert(dirs == Seq("v1", "v2"), s"old build must stay until vacuum: $dirs")
    assert(fs.exists(new org.apache.hadoop.fs.Path(root,
      "_index/ann/embedding/v1/_superseded")))
    assert(AnnIndex.load(spark, root, "embedding").map(_._1).contains(2L),
      "new probes resolve the newest build")
    assert(AnnIndex.probe(spark, root, "embedding", "vec_id",
      3L, nprobe = 4, topk = 5).count() == 5)
    // vacuum past the age guard collects the marked dir, keeps v2
    log.vacuum(keepVersions = 1, minFileAgeMs = 0L, minVersionAgeMs = 0L): Unit
    assert(dirs == Seq("v2"), s"vacuum must retire the marked build: $dirs")
    assert(AnnIndex.probe(spark, root, "embedding", "vec_id",
      3L, nprobe = 4, topk = 5).count() == 5)
  }
}
