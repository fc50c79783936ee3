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

  test("a library-evolved table exports with the widened schema in metadata") {
    val root = tmp("graft_ice_evo")
    val log = new CommitLog(spark, root)
    log.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1),
      replace = false)
    log.mergeMoR(Seq((2L, "B", 7.5)).toDF("k", "v", "w"), "k", evolve = true)
    log.rewriteDeletes()
    val dest = tmp("graft_ice_evo_dst")
    IcebergInterop.exportIceberg(spark, root, dest)
    val meta = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dest/metadata/v1.metadata.json")))
    assert(meta.contains("\"w\""), "evolved column must be in the exported schema")
    val listed = IcebergInterop.readFileList(spark, dest)
    // spec semantics: a file missing a schema column reads it as NULL
    assert(spark.read.option("mergeSchema", "true").parquet(listed: _*)
      .select("k", "v", "w").as[(Long, String, Option[Double])]
      .collect().toSet == Set((1L, "a", None), (2L, "B", Some(7.5))))
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

  test("equality deletes apply by sequence number and import as position tombstones") {
    import org.apache.avro.Schema
    import org.apache.avro.file.{DataFileReader, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
    import org.apache.hadoop.fs.Path
    val fs = graft.catalog.HadoopFs.fs(spark, "/tmp")

    // a clean export: data manifest at sequence 1
    val root = tmp("graft_ice_eq_src")
    val log = new CommitLog(spark, root)
    log.commit((1L to 10L).map(k => (k, s"g${k % 3}")).toDF("k", "grp"),
      replace = true)
    val dest = tmp("graft_ice_eq_dst")
    IcebergInterop.exportIceberg(spark, root, dest)

    // two equality-delete files on column k (schema field id 1):
    // seq 2 (applies: data seq 1 < 2) and seq 1 (must NOT apply — the
    // spec requires the data sequence be STRICTLY lower)
    def writeDelete(name: String, ks: Seq[Long]): String = {
      val stage = s"$dest/.eq_stage"
      ks.map(Tuple1(_)).toDF("k").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      val part = fs.listStatus(new Path(stage))
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet")).head.getPath
      val dst = new Path(s"$dest/data/$name")
      if (!fs.rename(part, dst)) throw new java.io.IOException(s"stage $name")
      fs.delete(new Path(stage), true)
      dst.toString
    }
    val eq2 = writeDelete("eq-seq2.parquet", Seq(3L, 4L, 8L))
    val eq1 = writeDelete("eq-seq1.parquet", Seq(5L))

    // delete manifest with explicit sequence numbers + equality_ids
    val entrySchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"snapshot_id","type":["null","long"],"default":null},
        |{"name":"sequence_number","type":["null","long"],"default":null},
        |{"name":"file_sequence_number","type":["null","long"],"default":null},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |  {"name":"content","type":"int"},
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"record_count","type":"long"},
        |  {"name":"file_size_in_bytes","type":"long"},
        |  {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null}
        |]}}]}""".stripMargin)
    val metaDir = new Path(dest, "metadata")
    val m1Path = new Path(metaDir, "eq-m1.avro")
    locally {
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](entrySchema))
      val out = fs.create(m1Path, true)
      w.create(entrySchema, out)
      def entry(path: String, seq: Long, count: Long): GenericRecord = {
        val df = new GenericData.Record(entrySchema.getField("data_file").schema())
        df.put("content", 2)                       // EQUALITY_DELETES
        df.put("file_path", path)
        df.put("file_format", "PARQUET")
        df.put("record_count", count)
        df.put("file_size_in_bytes", 1L)
        val idsSchema = entrySchema.getField("data_file").schema()
          .getField("equality_ids").schema().getTypes.get(1)
        df.put("equality_ids", new GenericData.Array[Integer](idsSchema,
          java.util.List.of(Integer.valueOf(1))))
        val e = new GenericData.Record(entrySchema)
        e.put("status", 1)
        e.put("snapshot_id", 1L)
        e.put("sequence_number", seq)
        e.put("file_sequence_number", seq)
        e.put("data_file", df)
        e
      }
      w.append(entry(eq2, 2L, 3L))
      w.append(entry(eq1, 1L, 1L))
      w.close()
    }

    // new manifest list = old entries (reread generically) + the delete
    // manifest; new metadata v2 points at it; hint advances
    def slurpJson(p: Path): com.fasterxml.jackson.databind.node.ObjectNode = {
      val in = fs.open(p)
      val body = try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
        out.toByteArray
      } finally in.close()
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    }
    val meta1 = slurpJson(new Path(metaDir, "v1.metadata.json"))
    val snap = meta1.get("snapshots").elements().next()
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val oldListPath = new Path(snap.get("manifest-list").asText)
    val tmpAvro = java.io.File.createTempFile("graft_eq_list", ".avro")
    java.nio.file.Files.copy(java.nio.file.Paths.get(oldListPath.toUri.getPath),
      tmpAvro.toPath, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val listReader = new DataFileReader[GenericRecord](tmpAvro,
      new GenericDatumReader[GenericRecord]())
    val listSchema: Schema = listReader.getSchema
    val oldRecs: List[GenericRecord] = {
      import scala.jdk.CollectionConverters._
      try listReader.iterator().asScala.toList finally listReader.close()
    }
    val newListPath = new Path(metaDir, "snap-eq-2.avro")
    locally {
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](listSchema))
      val out = fs.create(newListPath, true)
      w.create(listSchema, out)
      oldRecs.foreach(w.append)
      val dm = new GenericData.Record(listSchema)
      dm.put("manifest_path", m1Path.toString)
      dm.put("manifest_length", fs.getFileStatus(m1Path).getLen)
      dm.put("partition_spec_id", 0)
      dm.put("content", 1)
      dm.put("sequence_number", 2L)
      dm.put("min_sequence_number", 1L)
      dm.put("added_snapshot_id", snap.get("snapshot-id").asLong)
      dm.put("added_files_count", 2)
      dm.put("existing_files_count", 0)
      dm.put("deleted_files_count", 0)
      dm.put("added_rows_count", 4L)
      dm.put("existing_rows_count", 0L)
      dm.put("deleted_rows_count", 0L)
      w.append(dm)
      w.close()
    }
    snap.put("manifest-list", newListPath.toString): Unit
    meta1.put("last-sequence-number", 2L): Unit
    graft.catalog.LogStore.write(fs, new Path(metaDir, "v2.metadata.json"),
      new com.fasterxml.jackson.databind.ObjectMapper()
        .writerWithDefaultPrettyPrinter().writeValueAsBytes(meta1))
    graft.catalog.LogStore.write(fs, new Path(metaDir, "version-hint.text"),
      "2".getBytes("UTF-8"))

    // seq-2 deletes apply (3,4,8 gone); the seq-1 delete of k=5 does NOT
    // (data files are at seq 1 — not strictly lower)
    val expected = (1L to 10L).toSet -- Set(3L, 4L, 8L)
    assert(IcebergInterop.readIceberg(spark, dest)
      .select("k").as[Long].collect().toSet == expected)
    // import: byte-copy + equality deletes resolved to native tombstones
    val imported = tmp("graft_ice_eq_imp") + "/t"
    IcebergInterop.importIceberg(spark, dest, imported)
    val ilog = new CommitLog(spark, imported)
    assert(ilog.dvFiles(ilog.currentVersion.get).nonEmpty,
      "equality deletes must import as native position tombstones")
    assert(ilog.read().select("k").as[Long].collect().toSet == expected)
    tmpAvro.delete(): Unit
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

  /** One delete-file entry for [[appendDeleteManifest]]: `content` 1 =
    * position deletes, 2 = equality deletes (ids required).
    */
  private case class DelEntry(path: String, content: Int, seq: Long,
      count: Long, ids: Seq[Int] = Seq.empty)

  /** Surgically append ONE delete manifest to an exported Iceberg table
    * (new manifest list = old entries + the delete manifest, metadata v2,
    * hint advanced) — the writer-side machinery the engine deliberately
    * lacks, needed to FORGE foreign tables carrying v2 delete tiers.
    */
  private def appendDeleteManifest(dest: String, entries: Seq[DelEntry]): Unit = {
    import org.apache.avro.Schema
    import org.apache.avro.file.{DataFileReader, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
    import org.apache.hadoop.fs.Path
    val fs = graft.catalog.HadoopFs.fs(spark, dest)
    val entrySchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"snapshot_id","type":["null","long"],"default":null},
        |{"name":"sequence_number","type":["null","long"],"default":null},
        |{"name":"file_sequence_number","type":["null","long"],"default":null},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |  {"name":"content","type":"int"},
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"record_count","type":"long"},
        |  {"name":"file_size_in_bytes","type":"long"},
        |  {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null}
        |]}}]}""".stripMargin)
    val metaDir = new Path(dest, "metadata")
    def slurpJson(p: Path): com.fasterxml.jackson.databind.node.ObjectNode = {
      val in = fs.open(p)
      val body = try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
        out.toByteArray
      } finally in.close()
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    }
    val hint = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dest/metadata/version-hint.text")), "UTF-8").trim
    val meta = slurpJson(new Path(metaDir, s"v$hint.metadata.json"))
    val snap = meta.get("snapshots").elements().next()
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val maxSeq = entries.map(_.seq).max
    val mPath = new Path(metaDir, s"del-m$maxSeq.avro")
    locally {
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](entrySchema))
      w.create(entrySchema, fs.create(mPath, true))
      entries.foreach { de =>
        val df = new GenericData.Record(entrySchema.getField("data_file").schema())
        df.put("content", de.content)
        df.put("file_path", de.path)
        df.put("file_format", "PARQUET")
        df.put("record_count", de.count)
        df.put("file_size_in_bytes", 1L)
        if (de.ids.nonEmpty) {
          val idsSchema = entrySchema.getField("data_file").schema()
            .getField("equality_ids").schema().getTypes.get(1)
          df.put("equality_ids", new GenericData.Array[Integer](idsSchema,
            java.util.List.of(de.ids.map(Integer.valueOf): _*)))
        }
        val e = new GenericData.Record(entrySchema)
        e.put("status", 1)
        e.put("snapshot_id", snap.get("snapshot-id").asLong)
        e.put("sequence_number", de.seq)
        e.put("file_sequence_number", de.seq)
        e.put("data_file", df)
        w.append(e)
      }
      w.close()
    }
    val oldListPath = new Path(snap.get("manifest-list").asText)
    val tmpAvro = java.io.File.createTempFile("graft_eqnm_list", ".avro")
    java.nio.file.Files.copy(java.nio.file.Paths.get(oldListPath.toUri.getPath),
      tmpAvro.toPath, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val listReader = new DataFileReader[GenericRecord](tmpAvro,
      new GenericDatumReader[GenericRecord]())
    val listSchema: Schema = listReader.getSchema
    val oldRecs: List[GenericRecord] = {
      import scala.jdk.CollectionConverters._
      try listReader.iterator().asScala.toList finally listReader.close()
    }
    val newListPath = new Path(metaDir, s"snap-del-$maxSeq.avro")
    locally {
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](listSchema))
      w.create(listSchema, fs.create(newListPath, true))
      oldRecs.foreach(w.append)
      val dm = new GenericData.Record(listSchema)
      dm.put("manifest_path", mPath.toString)
      dm.put("manifest_length", fs.getFileStatus(mPath).getLen)
      dm.put("partition_spec_id", 0)
      dm.put("content", 1)
      dm.put("sequence_number", maxSeq)
      dm.put("min_sequence_number", entries.map(_.seq).min)
      dm.put("added_snapshot_id", snap.get("snapshot-id").asLong)
      dm.put("added_files_count", entries.size)
      dm.put("existing_files_count", 0)
      dm.put("deleted_files_count", 0)
      dm.put("added_rows_count", entries.map(_.count).sum)
      dm.put("existing_rows_count", 0L)
      dm.put("deleted_rows_count", 0L)
      w.append(dm)
      w.close()
    }
    snap.put("manifest-list", newListPath.toString): Unit
    meta.put("last-sequence-number", maxSeq): Unit
    val next = hint.toInt + 1
    graft.catalog.LogStore.write(fs, new Path(metaDir, s"v$next.metadata.json"),
      new com.fasterxml.jackson.databind.ObjectMapper()
        .writerWithDefaultPrettyPrinter().writeValueAsBytes(meta))
    graft.catalog.LogStore.write(fs, new Path(metaDir, "version-hint.text"),
      next.toString.getBytes("UTF-8"))
    tmpAvro.delete(): Unit
  }

  /** Stage a single-file parquet under the table's data dir. */
  private def stageParquet(dest: String, name: String,
      df: org.apache.spark.sql.DataFrame): String = {
    import org.apache.hadoop.fs.Path
    val fs = graft.catalog.HadoopFs.fs(spark, dest)
    val stage = s"$dest/.del_stage"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = fs.listStatus(new Path(stage))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet")).head.getPath
    val dst = new Path(s"$dest/data/$name")
    if (!fs.rename(part, dst)) throw new java.io.IOException(s"stage $name")
    fs.delete(new Path(stage), true)
    dst.toString
  }

  test("name-mapped equality AND position deletes resolve through the mapping") {
    import org.apache.spark.sql.functions.col
    // a RENAMED table: files store the physical name `v`, the export's
    // metadata maps field id → [v, label]
    val warehouse = tmp("graft_ice_eqnm_wh")
    spark.conf.set("spark.sql.catalog.gieq", classOf[graft.catalog.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gieq.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gieq.db")
    spark.sql("CREATE TABLE gieq.db.eqr (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gieq.db.eqr SELECT id AS k, concat('x', id) AS v " +
      "FROM range(1, 11)")
    spark.sql("ALTER TABLE gieq.db.eqr RENAME COLUMN v TO label")
    val dest = tmp("graft_ice_eqnm_dst")
    spark.sql(s"CALL gieq.system.export_iceberg('db.eqr', '$dest')").collect()
    val body = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dest/metadata/v1.metadata.json")), "UTF-8")
    assert(body.contains("schema.name-mapping.default"), body.take(400))
    // the renamed field's id, from the metadata (schema names it `label`)
    val metaJson = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
    val fieldId = {
      import scala.jdk.CollectionConverters._
      val schemaId = metaJson.get("current-schema-id").asInt
      metaJson.get("schemas").elements().asScala
        .find(_.get("schema-id").asInt == schemaId).get
        .get("fields").elements().asScala
        .find(_.get("name").asText == "label").get.get("id").asInt
    }
    // position delete: kill the row k=1 wherever it physically lives
    val raw = spark.read.parquet(
      IcebergInterop.readFileList(spark, dest): _*)
    val (delPath, delPos) = raw
      .select(col("_metadata.file_path"), col("_metadata.row_index"))
      .where(col("k") === 1L).as[(String, Long)].head()
    import spark.implicits._
    val posFile = stageParquet(dest, "del-pos.parquet",
      Seq((delPath, delPos)).toDF("file_path", "pos"))
    // two equality-delete files at seq 2: one under the PHYSICAL file
    // column name (pre-rename writer), one under the LOGICAL name
    // (post-rename writer) — the mapping must resolve BOTH spellings
    val eqPhys = stageParquet(dest, "del-eq-phys.parquet",
      Seq("x3", "x8").toDF("v"))
    val eqLog = stageParquet(dest, "del-eq-log.parquet",
      Seq("x5").toDF("label"))
    appendDeleteManifest(dest, Seq(
      DelEntry(posFile, content = 1, seq = 2L, count = 1L),
      DelEntry(eqPhys, content = 2, seq = 2L, count = 2L, ids = Seq(fieldId)),
      DelEntry(eqLog, content = 2, seq = 2L, count = 1L, ids = Seq(fieldId))))

    val expected = (2L to 10L).toSet -- Set(3L, 5L, 8L)
    assert(IcebergInterop.readIceberg(spark, dest)
      .select("k").as[Long].collect().toSet == expected)
    // name-mapped import takes the materializing path: logical columns,
    // deletes folded in
    val imported = tmp("graft_ice_eqnm_imp") + "/t"
    IcebergInterop.importIceberg(spark, dest, imported)
    val ilog = new CommitLog(spark, imported)
    assert(ilog.read().columns.toSet == Set("k", "label"))
    assert(ilog.read().select("k").as[Long].collect().toSet == expected)
  }

  test("equality deletes reach rows in data files that span a column rename") {
    import org.apache.spark.sql.functions.col
    // files written BEFORE a rename store the old physical name `v`;
    // a post-rename writer stores `label`. The merged data schema shows
    // BOTH columns; the delete must kill matching rows in EITHER era
    // (a first-present resolve left the other era's rows NULL there and
    // resurrected them).
    val warehouse = tmp("graft_ice_span_wh")
    spark.conf.set("spark.sql.catalog.gisp", classOf[graft.catalog.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gisp.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gisp.db")
    spark.sql("CREATE TABLE gisp.db.sp (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gisp.db.sp SELECT id AS k, concat('x', id) AS v " +
      "FROM range(1, 11)")
    spark.sql("ALTER TABLE gisp.db.sp RENAME COLUMN v TO label")
    val dest = tmp("graft_ice_span_dst")
    spark.sql(s"CALL gisp.system.export_iceberg('db.sp', '$dest')").collect()
    val body = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dest/metadata/v1.metadata.json")), "UTF-8")
    val metaJson = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
    val fieldId = {
      import scala.jdk.CollectionConverters._
      val schemaId = metaJson.get("current-schema-id").asInt
      metaJson.get("schemas").elements().asScala
        .find(_.get("schema-id").asInt == schemaId).get
        .get("fields").elements().asScala
        .find(_.get("name").asText == "label").get.get("id").asInt
    }
    import spark.implicits._
    // the post-rename era: a foreign writer lands rows 11..15 under the
    // CURRENT name `label` (content=0 data file at seq 2)
    val newEra = stageParquet(dest, "data-newera.parquet",
      (11L to 15L).map(i => (i, s"x$i")).toDF("k", "label"))
    // one equality-delete file at seq 3 naming values from BOTH eras
    val eqDel = stageParquet(dest, "del-eq-span.parquet",
      Seq("x3", "x12").toDF("label"))
    appendDeleteManifest(dest, Seq(
      DelEntry(newEra, content = 0, seq = 2L, count = 5L),
      DelEntry(eqDel, content = 2, seq = 3L, count = 2L, ids = Seq(fieldId))))
    val got = IcebergInterop.readIceberg(spark, dest)
    // both eras' deleted rows are gone...
    assert(got.select("k").as[Long].collect().toSet ==
      ((1L to 15L).toSet -- Set(3L, 12L)),
      "the delete must reach rows in both naming eras")
    // ...and both eras' VALUES surface under the logical column
    assert(got.select("label").as[String].collect().toSet ==
      ((1L to 15L).toSet -- Set(3L, 12L)).map(i => s"x$i"),
      "rename-spanning reads must coalesce both physical columns")
  }

  test("URI normalization strips authority: column regex ≡ Path.toUri.getPath") {
    // Iceberg metadata on S3A/HDFS records fully-qualified URIs with an
    // authority (bucket, namenode); the pooled-file map in
    // commitCopiedWithTombstones keys by Path.toUri.getPath, which drops
    // it. The column-side regex MUST agree on every spelling or the
    // tombstone join silently matches nothing and deletes resurrect.
    val cases = Seq(
      "s3a://bucket/wh/t/data/f.parquet",
      "hdfs://nn:8020/wh/t/data/f.parquet",
      "file:///wh/t/data/f.parquet",
      "file:/wh/t/data/f.parquet",
      "/wh/t/data/f.parquet")
    cases.foreach { u =>
      val stripped = u.replaceFirst(IcebergInterop.SchemeRx, "")
      val getPath = new org.apache.hadoop.fs.Path(u).toUri.getPath
      assert(stripped == getPath, s"'$u': regex '$stripped' != getPath '$getPath'")
      assert(stripped == "/wh/t/data/f.parquet", stripped)
    }
  }
}
