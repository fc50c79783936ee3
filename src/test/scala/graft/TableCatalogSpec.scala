package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.CommitLog

/** The V2 TableCatalog front door: `spark.sql` addressing CommitLog
  * tables by catalog name — DDL, DML, time travel, and the CoW shape of
  * SQL DELETE all through the parser, no temp views anywhere.
  */
class TableCatalogSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val warehouse =
    java.nio.file.Files.createTempDirectory("graft_wh_spec").toString

  spark.conf.set("spark.sql.catalog.g", classOf[graft.catalog.GraftTableCatalog].getName)
  spark.conf.set("spark.sql.catalog.g.warehouse", warehouse)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")

  test("create table, insert, select back through catalog names") {
    spark.sql("CREATE TABLE g.db.kv (k BIGINT, v STRING)")
    // an empty declared table reads as zero rows WITH its schema
    val empty = spark.sql("SELECT * FROM g.db.kv")
    assert(empty.columns.toSeq == Seq("k", "v") && empty.count() == 0)
    spark.sql("INSERT INTO g.db.kv VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO g.db.kv VALUES (3, 'c')")
    assert(spark.sql("SELECT * FROM g.db.kv ORDER BY k").as[(Long, String)]
      .collect().toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // predicate pushdown survives the catalog: the scan is Spark's own
    // parquet V2 scan over the snapshot file list
    val plan = spark.sql("SELECT v FROM g.db.kv WHERE k = 2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("k"), plan)
  }

  test("insert overwrite replaces content in one commit; version as of sees history") {
    spark.sql("CREATE TABLE g.db.hist (k BIGINT, v STRING)")
    spark.sql("INSERT INTO g.db.hist VALUES (1, 'old')")
    spark.sql("INSERT OVERWRITE g.db.hist VALUES (2, 'new')")
    assert(spark.sql("SELECT * FROM g.db.hist").as[(Long, String)]
      .collect().toSeq == Seq((2L, "new")))
    assert(spark.sql("SELECT * FROM g.db.hist VERSION AS OF 1").as[(Long, String)]
      .collect().toSeq == Seq((1L, "old")))
    // a time-travel snapshot refuses writes
    val e = intercept[Exception] {
      spark.sql("INSERT INTO g.db.hist VERSION AS OF 1 VALUES (9, 'x')")
    }
    assert(e != null)
  }

  test("SQL DELETE WHERE is a copy-on-write commit touching only matching files") {
    spark.sql("CREATE TABLE g.db.cow (k BIGINT, v STRING)")
    // three single-file commits with disjoint key ranges
    for (lo <- Seq(0L, 100L, 200L)) {
      spark.range(lo, lo + 50).select($"id".as("k"),
          org.apache.spark.sql.functions.format_string("r%03d", $"id").as("v"))
        .coalesce(1).createOrReplaceTempView("batch_cow")
      spark.sql("INSERT INTO g.db.cow SELECT * FROM batch_cow"): Unit
    }
    val log = new CommitLog(spark, s"$warehouse/db/cow")
    val before = log.files(log.currentVersion.get).toSet
    assert(before.size == 3)
    spark.sql("DELETE FROM g.db.cow WHERE k >= 100 AND k < 110")
    val after = log.files(log.currentVersion.get).toSet
    // the two untouched files survive BY NAME; only the middle file is rewritten
    assert((before & after).size == 2, s"expected 2 carried files, got ${before & after}")
    assert(spark.sql("SELECT count(*) AS c FROM g.db.cow").as[Long].head() == 140L)
    assert(spark.sql("SELECT count(*) AS c FROM g.db.cow WHERE k >= 100 AND k < 110")
      .as[Long].head() == 0L)
    // DELETE without WHERE empties the table but keeps the declared schema
    spark.sql("DELETE FROM g.db.cow")
    val emptied = spark.sql("SELECT * FROM g.db.cow")
    assert(emptied.count() == 0 && emptied.columns.toSeq == Seq("k", "v"))
  }

  test("CTAS, alter add column, rename, drop, and listings") {
    Seq((1L, "x"), (2L, "y")).toDF("k", "v").createOrReplaceTempView("ctas_src")
    spark.sql("CREATE TABLE g.db.ctas AS SELECT * FROM ctas_src")
    assert(spark.sql("SELECT * FROM g.db.ctas ORDER BY k").as[(Long, String)]
      .collect().toSeq == Seq((1L, "x"), (2L, "y")))
    spark.sql("ALTER TABLE g.db.ctas ADD COLUMN score DOUBLE")
    spark.sql("INSERT INTO g.db.ctas VALUES (3, 'z', 0.5)")
    val rows = spark.sql("SELECT k, v, score FROM g.db.ctas ORDER BY k")
      .as[(Long, String, Option[Double])].collect().toSeq
    assert(rows == Seq((1L, "x", None), (2L, "y", None), (3L, "z", Some(0.5))),
      s"pre-evolution rows must read NULL for the added column: $rows")
    // the rename target resolves inside the table's catalog (no prefix)
    spark.sql("ALTER TABLE g.db.ctas RENAME TO db.ctas2")
    assert(spark.sql("SELECT count(*) AS c FROM g.db.ctas2").as[Long].head() == 3L)
    val tables = spark.sql("SHOW TABLES IN g.db").select("tableName")
      .as[String].collect().toSet
    assert(tables.contains("ctas2") && !tables.contains("ctas"))
    spark.sql("DROP TABLE g.db.ctas2")
    assert(!spark.sql("SHOW TABLES IN g.db").select("tableName")
      .as[String].collect().contains("ctas2"))
    val nss = spark.sql("SHOW NAMESPACES IN g").select("namespace")
      .as[String].collect().toSet
    assert(nss.contains("db"))
  }

  test("catalog writes and commit-log DataFrame API see one log") {
    spark.sql("CREATE TABLE g.db.shared (k BIGINT, v STRING)")
    spark.sql("INSERT INTO g.db.shared VALUES (1, 'sql')")
    val log = new CommitLog(spark, s"$warehouse/db/shared")
    log.commit(Seq((2L, "api")).toDF("k", "v"), replace = false)
    assert(spark.sql("SELECT * FROM g.db.shared ORDER BY k").as[(Long, String)]
      .collect().toSeq == Seq((1L, "sql"), (2L, "api")))
    // MERGE stays on the DataFrame plane, visible to SQL immediately
    log.merge(Seq((1L, "merged"), (3L, "new")).toDF("k", "v"), "k")
    assert(spark.sql("SELECT * FROM g.db.shared ORDER BY k").as[(Long, String)]
      .collect().toSeq == Seq((1L, "merged"), (2L, "api"), (3L, "new")))
  }
}
