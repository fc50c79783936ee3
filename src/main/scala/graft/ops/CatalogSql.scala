package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL through the V2 `TableCatalog` plugin ([[graft.catalog.GraftTableCatalog]]):
  * the commit-log tables addressed BY CATALOG NAME from plain `spark.sql`
  * — no temp views — proving the named-table front door end-to-end
  * (CREATE NAMESPACE → CTAS into the commit log → multi-table join
  * through `graft.<ns>.<table>` identifiers). The reference routes every
  * entity through one backend by name (swagger/aws-dl-fmwrk-swagger-
  * apigateway.yaml:30,114,198); this is that addressing realized as a
  * Spark catalog.
  *
  * Scale: the catalog read path is Spark's own parquet V2 scan over the
  * snapshot file list, so the join below broadcasts nation/region and
  * pushes the aggregate down exactly as the temp-view twin does.
  */
object CatalogSql {

  /** Deterministic per-dataset warehouse: Verify and Bench land on the
    * same path for the same input dir, so the catalog instance (cached
    * per session by name) never sees a conflicting location.
    */
  private def warehouseFor(d: String): String =
    "/tmp/graft_warehouse_" + java.lang.Integer.toHexString(d.hashCode & 0x7fffffff)

  private def ensureTables(s: SparkSession, d: String): Unit = {
    s.conf.set("spark.sql.catalog.graft", classOf[graft.catalog.GraftTableCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.warehouse", warehouseFor(d))
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.tpch")
    SqlSurface.registerViews(s, d, Seq("customer", "nation", "region"))
    for (t <- Seq("customer", "nation", "region")) {
      // idempotent setup: rebuild only when the catalog copy is absent or
      // out of row-count sync with the source dir (the bench invokes each
      // query twice; re-CTAS-ing three tables per run would bill catalog
      // LOADS as query time)
      val fresh =
        try s.sql(s"SELECT count(*) FROM graft.tpch.$t").head().getLong(0) ==
          s.table(t).count()
        catch { case _: Exception => false }
      if (!fresh) {
        s.sql(s"DROP TABLE IF EXISTS graft.tpch.$t")
        s.sql(s"CREATE TABLE graft.tpch.$t AS SELECT * FROM $t"): Unit
      }
    }
  }

  /** Customer balance rollup per region/nation, every table addressed
    * through the catalog (a 3-way join across commit-log tables).
    */
  private def sqlCatalogTable(s: SparkSession, d: String): DataFrame = {
    ensureTables(s, d)
    s.sql(
      """SELECT r_name, n_name, count(*) AS n_cust,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM graft.tpch.customer
        |JOIN graft.tpch.nation ON c_nationkey = n_nationkey
        |JOIN graft.tpch.region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_catalog_table" -> sqlCatalogTable _,
  )

  val oracle: Map[String, String] = Map(
    "q_sql_catalog_table" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
  )
}
