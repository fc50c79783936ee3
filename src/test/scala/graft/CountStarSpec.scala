package graft

import org.apache.spark.sql.catalyst.plans.logical.OneRowRelation
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.CommitLog

/** Metadata-only `count(*)` ([[graft.plans.CountStarFromManifest]]):
  * a bare unfiltered count over a catalog table must plan to a
  * one-row literal (no scan) with the exact manifest row count, track
  * mutations, and DECLINE — falling back to the correct scanning plan —
  * under filters, grouping, count(col), and merge-on-read tombstones.
  * Unique catalog: `gcs`.
  */
class CountStarSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val warehouse: String = {
    val w = java.nio.file.Files.createTempDirectory("graft_cswh").toString
    spark.conf.set("spark.sql.catalog.gcs", classOf[graft.catalog.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcs.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcs.db")
    w
  }

  private def metadataOnly(df: org.apache.spark.sql.DataFrame): Boolean = {
    val p = df.queryExecution.optimizedPlan
    p.exists(_.isInstanceOf[OneRowRelation]) && !p.exists {
      case _: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => true
      case _: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation => true
      case _ => false
    }
  }

  test("bare count(*) answers from the manifest and tracks mutations") {
    warehouse
    spark.sql("CREATE TABLE gcs.db.t AS SELECT id AS k, id % 7 AS m FROM range(0, 1000)")
    val q = spark.sql("SELECT count(*) AS n FROM gcs.db.t")
    assert(metadataOnly(q), s"expected metadata-only plan:\n${q.queryExecution.optimizedPlan}")
    assert(q.head().getLong(0) == 1000L)
    spark.sql("INSERT INTO gcs.db.t VALUES (9999, 0)")
    assert(spark.sql("SELECT count(*) FROM gcs.db.t").head().getLong(0) == 1001L,
      "manifest is re-read per plan — the count must track the append")
    spark.sql("DELETE FROM gcs.db.t WHERE k >= 900 AND k < 9999")
    val afterDelete = spark.sql("SELECT count(*) AS n FROM gcs.db.t")
    assert(afterDelete.head().getLong(0) == 901L, "CoW delete restages with fresh tags")
    assert(metadataOnly(afterDelete))
    // time travel: version-pinned stats
    val v1 = spark.sql("SELECT count(*) AS n FROM gcs.db.t VERSION AS OF 1")
    assert(v1.head().getLong(0) == 1000L)
    assert(metadataOnly(v1))
  }

  test("min/max on integral columns answer from the manifest bounds") {
    val q = spark.sql(
      "SELECT count(*) AS n, min(k) AS lo, max(k) AS hi FROM gcs.db.t")
    assert(metadataOnly(q),
      s"count+min+max must be metadata-only:\n${q.queryExecution.optimizedPlan}")
    val r = q.head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((901L, 0L, 9999L)), r.toString)
    // value parity with the scanning plan
    spark.conf.set("spark.graft.countStar.enabled", "false")
    val direct = try spark.sql(
      "SELECT count(*) AS n, min(k) AS lo, max(k) AS hi FROM gcs.db.t").head()
    finally spark.conf.set("spark.graft.countStar.enabled", "true")
    assert(direct.toString == r.toString)
  }

  test("filters, grouping, count(col), and non-integral bounds decline") {
    spark.sql("CREATE TABLE gcs.db.s AS " +
      "SELECT id AS k, concat('v', id) AS name, id * 1.5 AS f FROM range(0, 50)")
    for (q <- Seq(
        "SELECT count(*) FROM gcs.db.t WHERE k > 10",
        "SELECT m, count(*) FROM gcs.db.t GROUP BY m",
        "SELECT count(k) FROM gcs.db.t",
        "SELECT count(*), sum(k) FROM gcs.db.t",
        "SELECT min(name) FROM gcs.db.s",  // string bounds can truncate
        "SELECT max(f) FROM gcs.db.s")) {  // double bounds have NaN edges
      assert(!metadataOnly(spark.sql(q)), s"must keep the scanning plan: $q")
    }
    // and the declined plans still answer correctly
    assert(spark.sql("SELECT count(k) FROM gcs.db.t").head().getLong(0) == 901L)
    assert(spark.sql("SELECT min(name) FROM gcs.db.s").head().getString(0) == "v0")
  }

  test("merge-on-read tombstones disqualify the stats; the scan stays exact") {
    spark.sql("CREATE TABLE gcs.db.mor AS SELECT id AS k FROM range(0, 100)")
    new CommitLog(spark, s"$warehouse/db/mor")
      .deleteWhereMoR(org.apache.spark.sql.functions.col("k") % 10 === 0): Unit
    val q = spark.sql("SELECT count(*) AS n FROM gcs.db.mor")
    assert(!metadataOnly(q), "DV-bearing snapshot must not serve from file tags")
    assert(q.head().getLong(0) == 90L, "the DV-applied scan count is the truth")
  }

  test("conf off keeps the stock plan") {
    spark.conf.set("spark.graft.countStar.enabled", "false")
    try assert(!metadataOnly(spark.sql("SELECT count(*) FROM gcs.db.t")))
    finally spark.conf.set("spark.graft.countStar.enabled", "true")
  }
}
