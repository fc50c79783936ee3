package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL metadata tables ([[graft.catalog.GraftMetadataTable]]):
  * `SELECT * FROM <cat>.db.t.files/.history/.snapshots/.refs/.partitions`
  * — manifest-backed introspection through the query front door.
  * Unique catalog name: `gmt`.
  */
class MetadataTablesSpec extends AnyFunSuite {
  import SparkTestSession._

  private val warehouse =
    java.nio.file.Files.createTempDirectory("graft_mtwh").toString

  spark.conf.set("spark.sql.catalog.gmt", classOf[graft.catalog.GraftTableCatalog].getName)
  spark.conf.set("spark.sql.catalog.gmt.warehouse", warehouse)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS gmt.db")

  spark.sql("CREATE TABLE gmt.db.t (k BIGINT, part STRING) PARTITIONED BY (part)")
  spark.sql("INSERT INTO gmt.db.t SELECT id, CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END FROM range(0, 100)")
  spark.sql("INSERT INTO gmt.db.t VALUES (100, 'even')")

  test("files: one row per manifest file, layout dir + tags exposed") {
    val rows = spark.sql("SELECT name, partition, bytes, rows FROM gmt.db.t.files")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(1).matches("part=(even|odd)")),
      "every file must carry its hive layout dir")
    assert(rows.forall(r => r.getLong(2) > 0 && r.getLong(3) > 0),
      "commit-time byte/row tags must surface")
    assert(rows.map(_.getLong(3)).sum == 101L, "row tags must total the table")
  }

  test("partitions: per-layout-dir rollup of files/bytes/rows") {
    val rows = spark.sql(
      "SELECT partition, files, bytes, rows FROM gmt.db.t.partitions ORDER BY partition")
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("part=even", "part=odd"))
    assert(rows.map(_.getLong(3)).sum == 101L)
    assert(rows.forall(_.getInt(1) >= 1))
  }

  test("history and snapshots: versions newest-first with operations") {
    val h = spark.sql(
      "SELECT version, operation, data_files FROM gmt.db.t.history").collect()
    assert(h.map(_.getLong(0)).toSeq == h.map(_.getLong(0)).sortBy(-_).toSeq)
    assert(h.length >= 2, "two INSERTs = two versions")
    assert(h.forall(_.getString(1).nonEmpty))
    // snapshots is the same relation under the Iceberg-familiar name
    assert(spark.sql("SELECT count(*) FROM gmt.db.t.snapshots").head().getLong(0)
      == h.length)
    // committed_at is a real timestamp, usable in predicates
    assert(spark.sql(
      "SELECT count(*) FROM gmt.db.t.history WHERE committed_at > TIMESTAMP '2020-01-01'")
      .head().getLong(0) == h.length)
  }

  test("refs: tags and branches surface with kind and version") {
    // branches need a flat (non-hive-partitioned) table
    spark.sql("CREATE TABLE gmt.db.flat (k BIGINT)")
    spark.sql("INSERT INTO gmt.db.flat SELECT id FROM range(0, 10)")
    spark.sql("CALL gmt.system.create_tag('db.flat', 'v1', -1)")
    spark.sql("CALL gmt.system.create_branch('db.flat', 'audit', -1)")
    val refs = spark.sql(
      "SELECT name, kind, version FROM gmt.db.flat.refs ORDER BY name").collect()
    assert(refs.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("audit", "branch"), ("v1", "tag")))
    assert(refs.forall(_.getLong(2) >= 1L))
  }

  test("metadata joins with the data plane in one query") {
    // files-per-partition vs distinct keys per partition — metadata and
    // data compose through the same SQL session
    val df = spark.sql(
      """SELECT d.part, m.files, count(*) AS n
        |FROM gmt.db.t d JOIN gmt.db.t.partitions m
        |  ON m.partition = concat('part=', d.part)
        |GROUP BY d.part, m.files ORDER BY d.part""".stripMargin).collect()
    assert(df.map(_.getString(0)).toSeq == Seq("even", "odd"))
    assert(df.map(_.getLong(2)).sum == 101L)
  }

  test("unknown suffix or missing parent still resolve as errors") {
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM gmt.db.t.bogus").collect()
    }
    assert(e1.getMessage.contains("bogus") || e1.getMessage.contains("TABLE_OR_VIEW"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM gmt.db.nope.files").collect()
    }
    assert(e2.getMessage.contains("nope") || e2.getMessage.contains("TABLE_OR_VIEW"))
  }

  test("files time-travels: VERSION AS OF pins the snapshot's file list") {
    val all = spark.sql("SELECT sum(rows) FROM gmt.db.t.files").head().getLong(0)
    val v1 = spark.sql("SELECT sum(rows) FROM gmt.db.t.files VERSION AS OF 1")
      .head().getLong(0)
    assert(all == 101L && v1 == 100L,
      s"v1 must show the pre-append snapshot (got head=$all v1=$v1)")
  }

  test("transform table: partitions roll up the hidden _p_* layout") {
    spark.sql("CREATE TABLE gmt.db.bt (k BIGINT, v DOUBLE) PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO gmt.db.bt SELECT id, id * 1.0 FROM range(0, 400)")
    val parts = spark.sql(
      "SELECT partition, rows FROM gmt.db.bt.partitions ORDER BY partition").collect()
    assert(parts.length == 4)
    assert(parts.forall(_.getString(0).startsWith("_p_bucket_4_k=")))
    assert(parts.map(_.getLong(1)).sum == 400L)
  }
}
