package graft

import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.scalatest.funsuite.AnyFunSuite

/** The materialized-view QUERY-REWRITE rule
  * ([[graft.plans.RewriteToMaterializedView]]): a matching, exact-typed
  * aggregate over a catalog table must plan onto its FRESH view (no
  * Aggregate left in the optimized plan) with values identical to the
  * direct plan; staleness, float sums, and shape mismatches must keep
  * the stock plan.
  */
class MvRewriteSpec extends AnyFunSuite {
  import SparkTestSession._

  private val warehouse =
    java.nio.file.Files.createTempDirectory("graft_mvr_wh").toString
  spark.conf.set("spark.sql.catalog.gmr",
    classOf[graft.catalog.GraftTableCatalog].getName)
  spark.conf.set("spark.sql.catalog.gmr.warehouse", warehouse)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS gmr.db")

  private def aggCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.size

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def withRewriteOff[T](f: => T): T = {
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    try f finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
  }

  test("fresh view: aggregate plans onto the MV with value parity") {
    spark.sql("CREATE TABLE gmr.db.fact AS SELECT id AS k, " +
      "concat('g', id % 5) AS grp, id * 3 AS x, CAST(id AS DOUBLE) AS fx " +
      "FROM range(0, 1000)")
    spark.sql("CALL gmr.system.create_mv('db.fact', 'db.fact_mv', 'grp', 'x:sum_x')")
    val q = "SELECT grp, count(*) AS n, sum(x) AS sx FROM gmr.db.fact GROUP BY grp"
    val rewritten = spark.sql(q)
    assert(aggCount(rewritten) == 0,
      s"expected MV rewrite, plan:\n${rewritten.queryExecution.optimizedPlan}")
    // optimize INSIDE the conf scope — plans are lazy
    val (directAggs, directRows) =
      withRewriteOff { val d = spark.sql(q); (aggCount(d), rows(d)) }
    assert(directAggs == 1, "conf off must keep the stock aggregate")
    assert(rows(rewritten) == directRows, "rewritten values must equal direct")
  }

  test("stale view keeps the stock plan; refresh restores the rewrite") {
    spark.sql("CREATE TABLE gmr.db.fact2 AS SELECT id AS k, " +
      "concat('g', id % 3) AS grp, id AS x FROM range(0, 300)")
    spark.sql("CALL gmr.system.create_mv('db.fact2', 'db.fact2_mv', 'grp', 'x:sum_x')")
    val q = "SELECT grp, count(*) AS n, sum(x) AS sx FROM gmr.db.fact2 GROUP BY grp"
    assert(aggCount(spark.sql(q)) == 0)
    spark.sql("INSERT INTO gmr.db.fact2 VALUES (9999, 'g0', 777)")
    val stale = spark.sql(q)
    assert(aggCount(stale) == 1, "stale view must NOT serve the query")
    // and the un-rewritten read sees the new row
    assert(stale.collect().map(_.getLong(1)).sum == 301L)
    spark.sql("CALL gmr.system.refresh_mv('db.fact2_mv')")
    val again = spark.sql(q)
    assert(aggCount(again) == 0, "refreshed view must serve the query again")
    val directRows = withRewriteOff(rows(spark.sql(q)))
    assert(rows(again) == directRows)
  }

  /** Every table scanned by the OPTIMIZED plan — catalog relations show
    * as DataSourceV2ScanRelation (pushdown runs inside the optimizer);
    * the MV's own path-based read shows as a LogicalRelation over its
    * root path.
    */
  private def scannedRoots(df: org.apache.spark.sql.DataFrame): Set[String] = {
    def tbl(t: org.apache.spark.sql.connector.catalog.Table): String = t match {
      case g: graft.catalog.GraftTable => g.tableRoot
      case t => t.name()
    }
    val roots = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        Seq(tbl(r.table))
      case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        Seq(tbl(s.relation.table))
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
    }.flatten.toSet
    assert(roots.nonEmpty, s"no scans found:\n${df.queryExecution.optimizedPlan}")
    roots
  }

  test("rollup: grouping by a subset re-aggregates the view, not the base") {
    spark.sql("CREATE TABLE gmr.db.fact3 AS SELECT concat('a', id % 4) AS a, " +
      "concat('b', id % 7) AS b, id * 2 AS x FROM range(0, 1000)")
    spark.sql("CALL gmr.system.create_mv('db.fact3', 'db.fact3_mv', 'a,b', 'x:sum_x')")
    val q = "SELECT a, count(*) AS n, sum(x) AS sx FROM gmr.db.fact3 GROUP BY a"
    val rolled = spark.sql(q)
    assert(scannedRoots(rolled).forall(_.contains("fact3_mv")),
      s"subset grouping must read ONLY the view:\n${rolled.queryExecution.optimizedPlan}")
    assert(aggCount(rolled) == 1, "rollup keeps one (tiny) re-aggregate")
    val directRows = withRewriteOff(rows(spark.sql(q)))
    assert(rows(rolled) == directRows, "rolled-up values must equal direct")
  }

  test("rollup: a global aggregate folds the whole view") {
    val q = "SELECT count(*) AS n, sum(x) AS sx FROM gmr.db.fact3"
    val rolled = spark.sql(q)
    assert(scannedRoots(rolled).forall(_.contains("fact3_mv")),
      s"global aggregate must read ONLY the view:\n${rolled.queryExecution.optimizedPlan}")
    val got = rolled.collect().head
    assert(got.getLong(0) == 1000L && got.getLong(1) == 999000L,
      s"rollup parity: $got")
  }

  test("rollup: stays correct across a mutate + refresh cycle") {
    spark.sql("DELETE FROM gmr.db.fact3 WHERE b = 'b3'")
    val q = "SELECT a, count(*) AS n, sum(x) AS sx FROM gmr.db.fact3 GROUP BY a"
    val stale = spark.sql(q)
    assert(scannedRoots(stale).exists(r => r.contains("fact3") && !r.contains("fact3_mv")),
      s"stale view must NOT serve the rollup; scanned=${scannedRoots(stale)}\n" +
        s"${stale.queryExecution.optimizedPlan}")
    spark.sql("CALL gmr.system.refresh_mv('db.fact3_mv')")
    val again = spark.sql(q)
    assert(scannedRoots(again).forall(_.contains("fact3_mv")))
    assert(rows(again) == withRewriteOff(rows(spark.sql(q))))
  }

  test("filters on group columns still serve from the view; others don't") {
    // exact grouping + group-column predicate: rewrite, predicate applied
    // to the view's rows
    val qf = "SELECT a, b, count(*) AS n, sum(x) AS sx FROM gmr.db.fact3 " +
      "WHERE b IN ('b1', 'b4') GROUP BY a, b"
    val filtered = spark.sql(qf)
    assert(scannedRoots(filtered).forall(_.contains("fact3_mv")),
      s"group-column filter must still serve from the view:\n" +
        s"${filtered.queryExecution.optimizedPlan}")
    assert(rows(filtered) == withRewriteOff(rows(spark.sql(qf))))
    // rollup + filter: subset grouping under a group-column predicate
    val qr = "SELECT a, count(*) AS n, sum(x) AS sx FROM gmr.db.fact3 " +
      "WHERE b <> 'b2' GROUP BY a"
    val rolled = spark.sql(qr)
    assert(scannedRoots(rolled).forall(_.contains("fact3_mv")),
      s"filtered rollup must serve from the view:\n" +
        s"${rolled.queryExecution.optimizedPlan}")
    assert(rows(rolled) == withRewriteOff(rows(spark.sql(qr))))
    // predicate on a NON-group column: the view cannot serve it
    val qx = "SELECT a, count(*) AS n FROM gmr.db.fact3 WHERE x > 10 GROUP BY a"
    assert(scannedRoots(spark.sql(qx)).exists(r =>
      r.contains("fact3") && !r.contains("fact3_mv")),
      "non-group-column filter must keep the stock plan")
  }

  test("HAVING applies above the rewritten aggregate") {
    // fact group sums are 298500 + 600*i for grp g_i — the threshold
    // keeps exactly g2, g3, g4
    val q = "SELECT grp, sum(x) AS sx FROM gmr.db.fact GROUP BY grp " +
      "HAVING sum(x) > 299650"
    val df = spark.sql(q)
    assert(aggCount(df) == 0,
      s"HAVING must not block the rewrite:\n${df.queryExecution.optimizedPlan}")
    val got = df.collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("g2", "g3", "g4"), s"HAVING must filter the view rows: $got")
    assert(rows(df) == withRewriteOff(rows(spark.sql(q))))
  }

  test("float sums, extra aggregates, and other groupings keep the stock plan") {
    // double-typed sum: order-dependent — never rewritten
    assert(aggCount(spark.sql(
      "SELECT grp, sum(fx) AS s FROM gmr.db.fact GROUP BY grp")) == 1)
    // aggregate the view does not maintain
    assert(aggCount(spark.sql(
      "SELECT grp, max(x) AS m FROM gmr.db.fact GROUP BY grp")) == 1)
    // different grouping key
    assert(aggCount(spark.sql(
      "SELECT k, count(*) AS n FROM gmr.db.fact GROUP BY k")) == 1)
    // count(col) is null-sensitive, not the view's cnt
    assert(aggCount(spark.sql(
      "SELECT grp, count(x) AS n FROM gmr.db.fact GROUP BY grp")) == 1)
  }

  test("join view: the fact-dim join-aggregate plans onto the MV, both orientations") {
    spark.sql("CREATE TABLE gmr.db.jf AS SELECT id AS fk, id * 2 AS amt " +
      "FROM range(0, 1000)")
    spark.sql("CREATE TABLE gmr.db.jd AS SELECT id AS pk, " +
      "concat('n', id % 7) AS nat FROM range(0, 50)")
    spark.sql("CALL gmr.system.create_mv_join('db.jf', 'db.jd', 'db.jf_mv', " +
      "'fk', 'pk', 'nat', 'amt:sum_amt')")
    val q = "SELECT nat, count(*) AS n, sum(amt) AS sa FROM gmr.db.jf f " +
      "JOIN gmr.db.jd d ON f.fk = d.pk GROUP BY nat"
    val rewritten = spark.sql(q)
    assert(aggCount(rewritten) == 0,
      s"expected join-MV rewrite, plan:\n${rewritten.queryExecution.optimizedPlan}")
    assert(rows(rewritten) == withRewriteOff(rows(spark.sql(q))),
      "join-MV rewrite must be value-identical to the direct join plan")
    // swapped sides match the same view
    val q2 = "SELECT nat, count(*) AS n, sum(amt) AS sa FROM gmr.db.jd d " +
      "JOIN gmr.db.jf f ON d.pk = f.fk GROUP BY nat"
    assert(aggCount(spark.sql(q2)) == 0,
      s"swapped orientation must also rewrite:\n${spark.sql(q2).queryExecution.optimizedPlan}")
    // a global rollup over the join re-aggregates the view's rows
    val g = spark.sql("SELECT count(*) AS n, sum(amt) AS sa FROM gmr.db.jf f " +
      "JOIN gmr.db.jd d ON f.fk = d.pk")
    // no leaf may be a catalog-table scan (the view reads as a raw
    // parquet relation) — the base fact AND dim scans are both gone
    assert(g.queryExecution.optimizedPlan.collectLeaves().forall {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        !r.relation.table.isInstanceOf[graft.catalog.GraftTable]
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        !r.table.isInstanceOf[graft.catalog.GraftTable]
      case _ => true
    }, s"global join rollup must read only the view:\n${g.queryExecution.optimizedPlan}")
    assert(rows(g) == withRewriteOff(rows(spark.sql(
      "SELECT count(*) AS n, sum(amt) AS sa FROM gmr.db.jf f " +
        "JOIN gmr.db.jd d ON f.fk = d.pk"))))
  }

  test("join view: fact appends refresh incrementally; a dim change recomputes") {
    val q = "SELECT nat, count(*) AS n, sum(amt) AS sa FROM gmr.db.jf f " +
      "JOIN gmr.db.jd d ON f.fk = d.pk GROUP BY nat"
    // fact moves: stale view keeps the stock join plan until refresh
    spark.sql("INSERT INTO gmr.db.jf VALUES (3, 1000), (999999, 5)")
    assert(aggCount(spark.sql(q)) == 1, "stale view must keep the stock plan")
    val r = spark.sql("CALL gmr.system.refresh_mv('db.jf_mv')").head()
    assert(r.getLong(1) == 2L, s"incremental refresh folds 2 change rows: $r")
    assert(aggCount(spark.sql(q)) == 0, "refresh must restore the rewrite")
    assert(rows(spark.sql(q)) == withRewriteOff(rows(spark.sql(q))),
      "post-refresh view must match the direct plan (dangling fk joins nothing)")
    // dim moves: stale again; refresh recomputes FULLY and re-pins both cursors
    spark.sql("INSERT INTO gmr.db.jd VALUES (999999, 'n_new')")
    assert(aggCount(spark.sql(q)) == 1, "a moved dim must invalidate the rewrite")
    spark.sql("CALL gmr.system.refresh_mv('db.jf_mv')").collect()
    assert(aggCount(spark.sql(q)) == 0, "dim-change refresh must restore the rewrite")
    val got = rows(spark.sql(q))
    assert(got == withRewriteOff(rows(spark.sql(q))),
      s"full recompute must fold the new dim row (fk 999999 now joins): $got")
    assert(spark.sql(q).collect().exists(_.getString(0) == "n_new"),
      "the new dim group must appear after the recompute")
  }

  test("star view: a two-dim star aggregate plans onto the MV with no base scan") {
    spark.sql("CREATE TABLE gmr.db.sf AS SELECT id % 40 AS k1, id % 7 AS k2, " +
      "id * 3 AS amt FROM range(0, 2000)")
    spark.sql("CREATE TABLE gmr.db.sd1 AS SELECT id AS pk1, " +
      "concat('n', id % 5) AS nat FROM range(0, 40)")
    spark.sql("CREATE TABLE gmr.db.sd2 AS SELECT id AS pk2, " +
      "concat('b', id % 3) AS brand FROM range(0, 7)")
    spark.sql("CALL gmr.system.create_mv_star('db.sf', 'db.sf_mv', " +
      "'db.sd1:k1:pk1;db.sd2:k2:pk2', 'nat,brand', 'amt:sum_amt')")
    val q = "SELECT nat, brand, count(*) AS n, sum(amt) AS sa FROM gmr.db.sf f " +
      "JOIN gmr.db.sd1 d1 ON f.k1 = d1.pk1 " +
      "JOIN gmr.db.sd2 d2 ON f.k2 = d2.pk2 GROUP BY nat, brand"
    val rewritten = spark.sql(q)
    assert(aggCount(rewritten) == 0,
      s"expected star-MV rewrite, plan:\n${rewritten.queryExecution.optimizedPlan}")
    assert(rows(rewritten) == withRewriteOff(rows(spark.sql(q))),
      "star-MV rewrite must be value-identical to the direct star plan")
    // dim order in the query flipped relative to the view definition
    val q2 = "SELECT nat, brand, count(*) AS n, sum(amt) AS sa FROM gmr.db.sf f " +
      "JOIN gmr.db.sd2 d2 ON f.k2 = d2.pk2 " +
      "JOIN gmr.db.sd1 d1 ON f.k1 = d1.pk1 GROUP BY nat, brand"
    assert(aggCount(spark.sql(q2)) == 0,
      s"flipped dim order must also rewrite:\n${spark.sql(q2).queryExecution.optimizedPlan}")
    // a rollup to one dim's group column re-aggregates the view
    val g = spark.sql("SELECT nat, count(*) AS n, sum(amt) AS sa FROM gmr.db.sf f " +
      "JOIN gmr.db.sd1 d1 ON f.k1 = d1.pk1 " +
      "JOIN gmr.db.sd2 d2 ON f.k2 = d2.pk2 GROUP BY nat")
    assert(g.queryExecution.optimizedPlan.collectLeaves().forall {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        !r.relation.table.isInstanceOf[graft.catalog.GraftTable]
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        !r.table.isInstanceOf[graft.catalog.GraftTable]
      case _ => true
    }, s"star rollup must read only the view:\n${g.queryExecution.optimizedPlan}")
    assert(rows(g) == withRewriteOff(rows(g)))
    // a PARTIAL star (one dim missing) must keep the stock plan
    assert(aggCount(spark.sql("SELECT nat, count(*) AS n FROM gmr.db.sf f " +
      "JOIN gmr.db.sd1 d1 ON f.k1 = d1.pk1 GROUP BY nat")) == 1,
      "a one-dim query must not serve from the two-dim star view")
    // a moved dim invalidates; refresh recomputes and restores the rewrite
    spark.sql("INSERT INTO gmr.db.sd2 VALUES (99, 'bNEW')")
    assert(aggCount(spark.sql(q)) == 1, "a moved star dim must invalidate the rewrite")
    spark.sql("CALL gmr.system.refresh_mv('db.sf_mv')").collect()
    assert(aggCount(spark.sql(q)) == 0, "refresh must restore the star rewrite")
    assert(rows(spark.sql(q)) == withRewriteOff(rows(spark.sql(q))))
  }
}
