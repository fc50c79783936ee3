package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{CommitLog, IcebergInterop}

/** Iceberg export: a CommitLog snapshot leaves as an Iceberg-v2 layout
  * (metadata JSON + Avro manifest list + Avro manifest) whose resolved
  * file list equals the snapshot — and whose files carry the rows.
  */
class IcebergInteropSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("export → spec-path re-read: file list equals snapshot, rows survive") {
    val root = tmp("graft_ice_src")
    val log = new CommitLog(spark, root)
    log.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), replace = true)
    log.commit(Seq((3L, "c")).toDF("k", "v"), replace = false)

    val dest = tmp("graft_ice_dst")
    val n = IcebergInterop.exportIceberg(spark, root, dest)
    assert(n == log.files(log.currentVersion.get).length)

    // resolve through the format itself: hint → metadata → manifest list
    // (avro) → manifest (avro) → file paths
    val listed = IcebergInterop.readFileList(spark, dest)
    assert(listed.size == n)
    assert(listed.forall(_.contains("/data/")), listed.mkString(", "))
    // the exported files ARE the snapshot bytes: same names as the pool
    assert(listed.map(_.split('/').last).toSet ==
      log.files(log.currentVersion.get).toSet)
    // and scanning the resolved list yields the table
    assert(spark.read.parquet(listed: _*).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))

    // metadata sanity per the public spec: v2, one snapshot, main ref
    val meta = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dest/metadata/v1.metadata.json")))
    assert(meta.contains("\"format-version\" : 2") || meta.contains("\"format-version\":2"))
    assert(meta.contains("manifest-list"))
    assert(meta.contains("\"main\""))
  }

  test("merge-on-read tombstones export as v2 position deletes: no rewrite, no leak") {
    import org.apache.spark.sql.functions.col
    val root = tmp("graft_ice_mor")
    val log = new CommitLog(spark, root)
    log.commit((1L to 10L).map(k => (k, s"v$k")).toDF("k", "v"), replace = true)
    log.deleteWhereMoR(col("k") <= 3L)

    val dest = tmp("graft_ice_mor_dst")
    IcebergInterop.exportIceberg(spark, root, dest)
    // NO materialization: the exported data files are the pool bytes
    val listed = IcebergInterop.readFileList(spark, dest)
    assert(listed.map(_.split('/').last).toSet ==
      log.files(log.currentVersion.get).toSet,
      "MoR export must byte-copy the data files, not rewrite them")
    // the deletes ride the format's own position-delete tier: the raw
    // data files still hold all 10 rows, the format-level read masks 3
    assert(spark.read.parquet(listed: _*).count() == 10)
    assert(IcebergInterop.readIceberg(spark, dest)
      .select("k").as[Long].collect().toSet == (4L to 10L).toSet)
    // and the delete tier imports back as native MoR tombstones
    val imported = tmp("graft_ice_mor_imp") + "/t"
    IcebergInterop.importIceberg(spark, dest, imported)
    val ilog = new CommitLog(spark, imported)
    assert(ilog.dvFiles(ilog.currentVersion.get).nonEmpty,
      "position deletes must import as native tombstones, not a rewrite")
    assert(ilog.read().select("k").as[Long].collect().toSet == (4L to 10L).toSet)
    // fold-in proves the tombstones are real: rewriteDeletes drops them
    ilog.rewriteDeletes()
    assert(ilog.dvFiles(ilog.currentVersion.get).isEmpty)
    assert(ilog.read().select("k").as[Long].collect().toSet == (4L to 10L).toSet)
  }

  test("CALL export_iceberg / import_iceberg round a table through the open format") {
    val warehouse = tmp("graft_ice_wh")
    spark.conf.set("spark.sql.catalog.gi", classOf[graft.catalog.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gi.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gi.db")
    spark.sql("CREATE TABLE gi.db.src (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gi.db.src VALUES (1, 'a'), (2, 'b'), (3, 'c')")

    val dest = tmp("graft_ice_call")
    val exported = spark.sql(s"CALL gi.system.export_iceberg('db.src', '$dest')")
      .collect().head.getInt(0)
    assert(exported > 0)
    val v = spark.sql(s"CALL gi.system.import_iceberg('$dest', 'db.back')")
      .collect().head.getLong(0)
    assert(v == 1L)
    assert(spark.sql("SELECT * FROM gi.db.back").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("renamed-column table exports via name-mapping and reads back logical") {
    val warehouse = tmp("graft_ice_ren_wh")
    spark.conf.set("spark.sql.catalog.gi", classOf[graft.catalog.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gi.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gi.db")
    spark.sql("CREATE TABLE gi.db.ren (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gi.db.ren VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE gi.db.ren RENAME COLUMN v TO label")

    val dest = tmp("graft_ice_ren_dst")
    spark.sql(s"CALL gi.system.export_iceberg('db.ren', '$dest')").collect()

    // the metadata carries the spec's indirection: logical schema +
    // name-mapping from the files' physical column to the field id
    val body = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dest/metadata/v1.metadata.json")), "UTF-8")
    assert(body.contains("schema.name-mapping.default"), body.take(400))
    assert(body.contains("label"), "schema must carry the LOGICAL name")

    // spec-path read resolves physical "v" under logical "label"
    val back = IcebergInterop.readIceberg(spark, dest)
    assert(back.columns.toSet == Set("k", "label"), back.columns.toSeq)
    assert(back.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
  }

  test("hive-partitioned tables materialize on export: partition values survive") {
    val root = tmp("graft_ice_part")
    val log = new CommitLog(spark, root)
    log.commitPartitioned(
      Seq((1L, "c0"), (2L, "c1"), (3L, "c0")).toDF("k", "cat"), Seq("cat"),
      replace = true)
    val dest = tmp("graft_ice_part_dst")
    IcebergInterop.exportIceberg(spark, root, dest)
    val rows = IcebergInterop.readIceberg(spark, dest)
      .select("k", "cat").as[(Long, String)].collect().toSet
    // a byte-copy would have dropped `cat` (it lives in the path, not
    // the file bytes) — the export must carry it as a data column
    assert(rows == Set((1L, "c0"), (2L, "c1"), (3L, "c0")), rows)

    val back = tmp("graft_ice_part_back")
    IcebergInterop.importIceberg(spark, dest, back)
    assert(new CommitLog(spark, back).read().select("k", "cat")
      .as[(Long, String)].collect().toSet == rows)
  }

  test("array columns map to Iceberg list types with assigned ids") {
    val root = tmp("graft_ice_arr")
    val log = new CommitLog(spark, root)
    log.commit(Seq((1L, Seq(0.5f, 0.25f))).toDF("id", "emb"), replace = true)
    val dest = tmp("graft_ice_arr_dst")
    IcebergInterop.exportIceberg(spark, root, dest)
    val meta = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dest/metadata/v1.metadata.json")))
    assert(meta.contains("list") && meta.contains("element-id"), meta)
    assert(IcebergInterop.readFileList(spark, dest).nonEmpty)
  }
}
