package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{CommitLog, DeltaInterop, HadoopFs, LogStore}

// checkpoint-parquet row shape (public protocol: one nullable struct per
// action type); top-level so the Product encoder derives cleanly
case class CpAdd(path: String, partitionValues: Map[String, String])
case class CpMeta(schemaString: String, partitionColumns: Seq[String])
case class CpRow(add: Option[CpAdd], metaData: Option[CpMeta])
// DV-bearing variant: add.deletionVector as the protocol's struct
case class CpDv(storageType: String, pathOrInlineDv: String,
    offset: Option[Int], sizeInBytes: Int, cardinality: Long)
case class CpAddDv(path: String, partitionValues: Map[String, String],
    deletionVector: Option[CpDv])
case class CpRowDv(add: Option[CpAddDv], metaData: Option[CpMeta])

/** Interop with the open Delta format, tested against hand-written logs
  * that follow the PUBLIC protocol spec (delta.io PROTOCOL.md) — the
  * connector jars are deliberately absent, so these logs ARE the
  * compatibility contract under test.
  */
class DeltaInteropSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("graft_delta").toString

  private def fs = HadoopFs.fs(spark, "/tmp")

  /** Write `df` as exactly one parquet file named `name` under `table`. */
  private def writeFile(table: String, name: String,
      df: org.apache.spark.sql.DataFrame): Unit = {
    val stage = s"$table/.stage_${name.replace('/', '_')}"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = fs.listStatus(new Path(stage))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet")).head.getPath
    val dst = new Path(table, name)
    fs.mkdirs(dst.getParent)
    if (!fs.rename(part, dst)) throw new java.io.IOException(s"stage $name")
    fs.delete(new Path(stage), true): Unit
  }

  private def writeLog(table: String, version: Long, actions: Seq[String]): Unit = {
    fs.mkdirs(new Path(table, "_delta_log"))
    LogStore.write(fs, new Path(table, f"_delta_log/$version%020d.json"),
      (actions.mkString("\n") + "\n").getBytes("UTF-8"))
  }

  private val protocol = """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
  private def metaData(schemaJson: String, partCols: Seq[String] = Seq.empty) =
    s"""{"metaData":{"id":"00000000-0000-0000-0000-000000000000",""" +
      s""""format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
        .writeValueAsString(schemaJson)},""" +
      s""""partitionColumns":[${partCols.map("\"" + _ + "\"").mkString(",")}],""" +
      """"configuration":{}}}"""
  private def add(path: String, pv: String = "{}") =
    s"""{"add":{"path":"$path","partitionValues":$pv,"size":1,"modificationTime":1,"dataChange":true}}"""
  private def remove(path: String) =
    s"""{"remove":{"path":"$path","dataChange":true}}"""

  test("hand-written Delta log: add/remove replay and VERSION AS OF") {
    val table = freshDir()
    val schema = Seq((1L, "a")).toDF("k", "v").schema
    writeFile(table, "f1.parquet", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    writeFile(table, "f2.parquet", Seq((3L, "c")).toDF("k", "v"))
    writeFile(table, "f3.parquet", Seq((4L, "d")).toDF("k", "v"))
    writeLog(table, 0L, Seq(protocol, metaData(schema.json),
      add("f1.parquet"), add("f2.parquet")))
    writeLog(table, 1L, Seq(add("f3.parquet"), remove("f2.parquet")))
    val head = DeltaInterop.readDelta(spark, table).as[(Long, String)].collect().sorted
    assert(head.toSeq == Seq((1L, "a"), (2L, "b"), (4L, "d")),
      s"head must see f1+f3 (f2 removed): ${head.toSeq}")
    val v0 = DeltaInterop.readDelta(spark, table, versionAsOf = Some(0L))
      .as[(Long, String)].collect().sorted
    assert(v0.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("partitioned Delta table: partitionValues rehydrate typed partition columns") {
    val table = freshDir()
    // Delta strips partition columns from the data files; schemaString
    // still declares them
    val full = Seq((1L, "x", 7L)).toDF("k", "v", "p").schema
    writeFile(table, "p=7/part0.parquet", Seq((1L, "x"), (2L, "y")).toDF("k", "v"))
    writeFile(table, "p=8/part0.parquet", Seq((3L, "z")).toDF("k", "v"))
    writeLog(table, 0L, Seq(protocol, metaData(full.json, Seq("p")),
      add("p=7/part0.parquet", """{"p":"7"}"""),
      add("p=8/part0.parquet", """{"p":"8"}""")))
    val rows = DeltaInterop.readDelta(spark, table)
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(rows == Seq((1L, "x", 7L), (2L, "y", 7L), (3L, "z", 8L)), rows.toString)
  }

  test("checkpoint parquet + _last_checkpoint: replay starts at the checkpoint") {
    val table = freshDir()
    val schema = Seq((1L, "a")).toDF("k", "v").schema
    writeFile(table, "f1.parquet", Seq((1L, "a")).toDF("k", "v"))
    writeFile(table, "f2.parquet", Seq((2L, "b")).toDF("k", "v"))
    writeFile(table, "f3.parquet", Seq((3L, "c")).toDF("k", "v"))
    // checkpoint at version 1 holds the live set {f1, f2}; the JSON
    // commits at or below it have been vacuumed away entirely
    val cpStage = s"$table/.cp_stage"
    Seq(
      CpRow(None, Some(CpMeta(schema.json, Seq.empty))),
      CpRow(Some(CpAdd("f1.parquet", Map.empty)), None),
      CpRow(Some(CpAdd("f2.parquet", Map.empty)), None),
    ).toDF().coalesce(1).write.mode("overwrite").parquet(cpStage)
    val part = fs.listStatus(new Path(cpStage))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet")).head.getPath
    fs.mkdirs(new Path(table, "_delta_log"))
    if (!fs.rename(part, new Path(table, f"_delta_log/${1L}%020d.checkpoint.parquet")))
      throw new java.io.IOException("checkpoint stage")
    fs.delete(new Path(cpStage), true)
    LogStore.write(fs, new Path(table, "_delta_log/_last_checkpoint"),
      """{"version":1,"size":3}""".getBytes("UTF-8"))
    writeLog(table, 2L, Seq(add("f3.parquet"), remove("f1.parquet")))
    val rows = DeltaInterop.readDelta(spark, table).as[(Long, String)]
      .collect().sorted.toSeq
    assert(rows == Seq((2L, "b"), (3L, "c")),
      s"checkpoint live set minus f1 plus f3: $rows")
  }

  test("hive-partitioned commit-log table materializes on Delta export") {
    val commitRoot = freshDir() + "/tp"
    val log = new CommitLog(spark, commitRoot)
    log.commitPartitioned(
      Seq((1L, "c0"), (2L, "c1"), (3L, "c0")).toDF("k", "cat"), Seq("cat"),
      replace = true)
    val dest = freshDir() + "/delta_part"
    DeltaInterop.exportDelta(spark, commitRoot, dest)
    // a byte-copy would have dropped `cat` (path-carried, not in bytes)
    val back = DeltaInterop.readDelta(spark, dest)
    assert(back.select("k", "cat").as[(Long, String)].collect().toSet ==
      Set((1L, "c0"), (2L, "c1"), (3L, "c0")))
  }

  /** Serialize deleted row indices as the protocol's "portable"
    * RoaringBitmapArray: LE magic, LE long bucket count, then per
    * 32-bit bucket an LE key + a standard portable RoaringBitmap.
    */
  private def portableDv(rows: Seq[Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    def leInt(v: Int): Unit = {
      dos.write(v & 0xff); dos.write((v >> 8) & 0xff)
      dos.write((v >> 16) & 0xff); dos.write((v >>> 24) & 0xff)
    }
    leInt(1681511377)
    val byKey = rows.groupBy(r => (r >>> 32).toInt).toSeq.sortBy(_._1)
    var n = byKey.size.toLong
    for (_ <- 0 until 8) { dos.write((n & 0xff).toInt); n >>= 8 }
    byKey.foreach { case (key, vs) =>
      leInt(key)
      org.roaringbitmap.RoaringBitmap
        .bitmapOf(vs.map(v => (v & 0xFFFFFFFFL).toInt).sorted: _*)
        .serialize(dos)
    }
    dos.flush()
    bos.toByteArray
  }

  /** Write a `.bin` DV file (version byte, then at offset 1:
    * [size BE][data][crc32 BE]) and return (offset, sizeInBytes).
    */
  private def writeDvFile(path: Path, data: Array[Byte]): (Int, Int) = {
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    dos.writeByte(1)
    dos.writeInt(data.length)
    dos.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(data)
    dos.writeInt(crc.getValue.toInt)
    dos.flush()
    fs.mkdirs(path.getParent)
    LogStore.write(fs, path, bos.toByteArray)
    (1, data.length)
  }

  private def dvAdd(path: String, dvJson: String) =
    s"""{"add":{"path":"$path","partitionValues":{},"size":1,""" +
      s""""modificationTime":1,"dataChange":true,"deletionVector":$dvJson}}"""

  test("a library-evolved table exports with the widened schema (old rows NULL)") {
    val commitRoot = freshDir() + "/tevo"
    val log = new CommitLog(spark, commitRoot)
    log.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1),
      replace = false)
    log.mergeMoR(Seq((2L, "B", 7.5)).toDF("k", "v", "w"), "k", evolve = true)
    log.rewriteDeletes()  // fold so the flat byte-copy path exports
    val dest = freshDir() + "/delta_evo"
    DeltaInterop.exportDelta(spark, commitRoot, dest)
    // Delta semantics: pre-evolution files simply lack the column and
    // read it as NULL — byte-copy plus the widened metaData schema
    val back = DeltaInterop.readDelta(spark, dest)
    assert(back.columns.toSeq.sorted == Seq("k", "v", "w"))
    assert(back.select("k", "v", "w").as[(Long, String, Option[Double])]
      .collect().toSet == Set((1L, "a", None), (2L, "B", Some(7.5))))
  }

  test("deletion vectors: u/i storage decode, masked reads, native-tombstone import") {
    import org.apache.spark.sql.types._
    val table = freshDir()
    val schema = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    // three files with KNOWN row order (local Seq → one input partition)
    writeFile(table, "f1.parquet",
      (0L until 10L).map(i => (i, s"a$i")).toDF("k", "v"))
    writeFile(table, "f2.parquet",
      (10L until 15L).map(i => (i, s"a$i")).toDF("k", "v"))
    writeFile(table, "f3.parquet",
      (20L until 25L).map(i => (i, s"a$i")).toDF("k", "v"))
    // f1: on-disk DV, storageType "u" (prefix + Z85 uuid), deletes rows 1,3,7
    val uuid = java.util.UUID.randomUUID()
    val uuidBytes = java.nio.ByteBuffer.allocate(16)
      .putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits).array
    val (off1, size1) = writeDvFile(
      new Path(table, s"ab/deletion_vector_$uuid.bin"), portableDv(Seq(1L, 3L, 7L)))
    val dv1 = s"""{"storageType":"u","pathOrInlineDv":"ab${graft.catalog.Z85.encode(uuidBytes)}",""" +
      s""""offset":$off1,"sizeInBytes":$size1,"cardinality":3}"""
    // f2: inline DV (Z85 of the portable bytes), deletes row 0 (k=10)
    val inline = portableDv(Seq(0L))
    val dv2 = s"""{"storageType":"i","pathOrInlineDv":"${graft.catalog.Z85.encode(inline)}",""" +
      s""""sizeInBytes":${inline.length},"cardinality":1}"""
    writeLog(table, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      metaData(schema.json),
      dvAdd("f1.parquet", dv1), dvAdd("f2.parquet", dv2), add("f3.parquet")))
    val expected = ((0L until 10L).toSet -- Set(1L, 3L, 7L)) ++
      (11L until 15L) ++ (20L until 25L)
    // the DV-masked read
    assert(DeltaInterop.readDelta(spark, table)
      .select("k").as[Long].collect().toSet == expected)
    // import: files byte-copied, DVs land as native MoR tombstones —
    // NOT a materializing rewrite
    val imported = freshDir() + "/t"
    val v = DeltaInterop.importDelta(spark, table, imported)
    val log = new CommitLog(spark, imported)
    assert(log.files(v).length == 3, "all three data files must pool byte-copied")
    assert(log.dvFiles(v).nonEmpty, "DVs must import as native MoR tombstones")
    assert(log.read().select("k").as[Long].collect().toSet == expected)
    // round trip: export (materializes because tombstones exist) re-reads
    val dest = freshDir() + "/delta"
    DeltaInterop.exportDelta(spark, imported, dest)
    assert(DeltaInterop.readDelta(spark, dest)
      .select("k").as[Long].collect().toSet == expected)
  }

  test("deletion vectors: DV update (remove+add of the same file) and storageType p") {
    import org.apache.spark.sql.types._
    val table = freshDir()
    val schema = StructType(Seq(StructField("k", LongType)))
    writeFile(table, "f1.parquet", (0L until 6L).map(i => Tuple1(i)).toDF("k"))
    writeLog(table, 0L, Seq(protocol, metaData(schema.json), add("f1.parquet")))
    // commit 1: delete k=2 — remove BEFORE the re-add (add must win)
    val binA = freshDir() + "/dvA.bin"
    val (offA, sizeA) = writeDvFile(new Path(binA), portableDv(Seq(2L)))
    writeLog(table, 1L, Seq(remove("f1.parquet"), dvAdd("f1.parquet",
      s"""{"storageType":"p","pathOrInlineDv":"$binA","offset":$offA,""" +
        s""""sizeInBytes":$sizeA,"cardinality":1}""")))
    assert(DeltaInterop.readDelta(spark, table).as[Long].collect().toSet ==
      Set(0L, 1L, 3L, 4L, 5L))
    // commit 2: DV grows to {2,4} — add BEFORE remove this time
    val binB = freshDir() + "/dvB.bin"
    val (offB, sizeB) = writeDvFile(new Path(binB), portableDv(Seq(2L, 4L)))
    writeLog(table, 2L, Seq(dvAdd("f1.parquet",
      s"""{"storageType":"p","pathOrInlineDv":"$binB","offset":$offB,""" +
        s""""sizeInBytes":$sizeB,"cardinality":2}"""), remove("f1.parquet")))
    assert(DeltaInterop.readDelta(spark, table).as[Long].collect().toSet ==
      Set(0L, 1L, 3L, 5L))
    // time travel still sees the older DV state
    assert(DeltaInterop.readDelta(spark, table, Some(1L)).as[Long].collect().toSet ==
      Set(0L, 1L, 3L, 4L, 5L))
  }

  test("deletion vectors survive in a checkpoint: the DV-bearing add replays") {
    val table = freshDir()
    val schema = Seq((1L, "a")).toDF("k", "v").schema
    writeFile(table, "f1.parquet",
      (0L until 6L).map(i => (i, s"a$i")).toDF("k", "v"))
    // the ONLY record of f1's DV is the checkpoint (its commit vacuumed)
    val inline = portableDv(Seq(1L, 4L))
    val cpStage = s"$table/.cp_stage"
    Seq(
      CpRowDv(None, Some(CpMeta(schema.json, Seq.empty))),
      CpRowDv(Some(CpAddDv("f1.parquet", Map.empty,
        Some(CpDv("i", graft.catalog.Z85.encode(inline), None,
          inline.length, 2L)))), None),
    ).toDF().coalesce(1).write.mode("overwrite").parquet(cpStage)
    val part = fs.listStatus(new Path(cpStage))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet")).head.getPath
    fs.mkdirs(new Path(table, "_delta_log"))
    if (!fs.rename(part, new Path(table, f"_delta_log/${1L}%020d.checkpoint.parquet")))
      throw new java.io.IOException("checkpoint stage")
    fs.delete(new Path(cpStage), true)
    LogStore.write(fs, new Path(table, "_delta_log/_last_checkpoint"),
      """{"version":1,"size":2}""".getBytes("UTF-8"))
    assert(DeltaInterop.readDelta(spark, table).select("k").as[Long]
      .collect().toSet == Set(0L, 2L, 3L, 5L))
    // and the native-tombstone import path decodes the checkpointed DV too
    val imported = freshDir() + "/t"
    DeltaInterop.importDelta(spark, table, imported)
    val log = new CommitLog(spark, imported)
    assert(log.dvFiles(log.currentVersion.get).nonEmpty)
    assert(log.read().select("k").as[Long].collect().toSet == Set(0L, 2L, 3L, 5L))
  }

  test("modern-feature tables refuse loudly by feature name") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType)))

    // column mapping (mode=name) READS: files store the physical name,
    // the schema's physicalName metadata binds it to the logical column
    val cmTable = freshDir()
    writeFile(cmTable, "f1.parquet",
      Seq((1L, "a"), (2L, "b")).toDF("k", "col-9f2a"))
    val cmSchema = StructType(Seq(
      StructField("k", LongType, nullable = true,
        new MetadataBuilder().putLong("delta.columnMapping.id", 1L)
          .putString("delta.columnMapping.physicalName", "k").build()),
      StructField("w", StringType, nullable = true,
        new MetadataBuilder().putLong("delta.columnMapping.id", 2L)
          .putString("delta.columnMapping.physicalName", "col-9f2a").build())))
    writeLog(cmTable, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"00000000-0000-0000-0000-000000000001",""" +
        s""""format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${new com.fasterxml.jackson.databind.ObjectMapper()
          .writeValueAsString(cmSchema.json)},""" +
        s""""partitionColumns":[],""" +
        s""""configuration":{"delta.columnMapping.mode":"name"}}}""",
      """{"add":{"path":"f1.parquet","partitionValues":{},"size":1,""" +
        """"modificationTime":0,"dataChange":true}}"""))
    val cm = DeltaInterop.readDelta(spark, cmTable)
    assert(cm.columns.toSeq == Seq("k", "w"), cm.columns.toSeq)
    assert(cm.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))

    // v3 protocol with unknown reader features
    val featTable = freshDir()
    writeFile(featTable, "f1.parquet", Seq(1L).toDF("k"))
    writeLog(featTable, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}""",
      metaData(schema.json),
      """{"add":{"path":"f1.parquet","partitionValues":{},"size":1,""" +
        """"modificationTime":0,"dataChange":true}}"""))
    val ft = intercept[UnsupportedOperationException] {
      DeltaInterop.readDelta(spark, featTable)
    }
    assert(ft.getMessage.contains("v2Checkpoint"), ft.getMessage)

    // timestampNtz alone is admitted (the Spark reader handles the type)
    val ntzTable = freshDir()
    writeFile(ntzTable, "f1.parquet", Seq(1L).toDF("k"))
    writeLog(ntzTable, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["timestampNtz"],"writerFeatures":["timestampNtz"]}}""",
      metaData(schema.json),
      """{"add":{"path":"f1.parquet","partitionValues":{},"size":1,""" +
        """"modificationTime":0,"dataChange":true}}"""))
    assert(DeltaInterop.readDelta(spark, ntzTable).as[Long].collect().toSeq == Seq(1L))
  }

  test("native tombstones export as deletion vectors: byte-copy out, tombstones back") {
    import org.apache.spark.sql.functions.col
    val commitRoot = freshDir() + "/t"
    val log = new CommitLog(spark, commitRoot)
    log.commit((1L to 12L).map(k => (k, s"v$k")).toDF("k", "v").repartition(3),
      replace = true)
    log.deleteWhereMoR(col("k") % 4 === 0)
    val expected = (1L to 12L).filterNot(_ % 4 == 0).toSet
    val dest = freshDir() + "/delta"
    DeltaInterop.exportDelta(spark, commitRoot, dest)
    // data files byte-copied under their pool names — NO materialization
    val exported = fs.listStatus(new Path(dest))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName).toSet
    assert(exported == log.files(log.currentVersion.get).toSet,
      "MoR export must byte-copy the pool files, not rewrite them")
    // the log carries the DV tier: feature-gated protocol, "u" descriptor,
    // and the .bin payload on disk
    val body = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dest, "_delta_log", f"${0L}%020d.json")), "UTF-8")
    assert(body.contains("\"deletionVectors\"") && body.contains("\"storageType\":\"u\""))
    assert(fs.listStatus(new Path(dest))
      .exists(_.getPath.getName.startsWith("deletion_vector_")))
    // format-level read masks the tombstoned rows
    assert(DeltaInterop.readDelta(spark, dest)
      .select("k").as[Long].collect().toSet == expected)
    // and the DV imports back as native MoR tombstones (byte-copy again)
    val imported = freshDir() + "/t2"
    DeltaInterop.importDelta(spark, dest, imported)
    val ilog = new CommitLog(spark, imported)
    assert(ilog.dvFiles(ilog.currentVersion.get).nonEmpty)
    assert(ilog.read().select("k").as[Long].collect().toSet == expected)
  }

  test("export → read back → import: rows and schema survive both directions") {
    val commitRoot = freshDir() + "/t"
    val log = new CommitLog(spark, commitRoot)
    log.commit(Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("k", "v", "w"), replace = false)
    log.commit(Seq((3L, "c", 3.5)).toDF("k", "v", "w"), replace = false)
    val dest = freshDir() + "/delta"
    DeltaInterop.exportDelta(spark, commitRoot, dest)
    // our own protocol reader accepts the exported log
    val back = DeltaInterop.readDelta(spark, dest)
    assert(back.schema.fieldNames.toSeq == Seq("k", "v", "w"))
    assert(back.as[(Long, String, Double)].collect().sorted.toSeq ==
      Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)))
    // and the log is the minimal shape any Delta reader accepts:
    // protocol + metaData + one add per live file, version 0
    val body = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dest, "_delta_log",
        f"${0L}%020d.json")), "UTF-8")
    assert(body.contains("\"protocol\"") && body.contains("\"metaData\"")
      && body.linesIterator.count(_.contains("\"add\"")) == log.files(2L).length)
    // round back into a fresh commit-log table
    val imported = freshDir() + "/t2"
    DeltaInterop.importDelta(spark, dest, imported)
    assert(new CommitLog(spark, imported).read().as[(Long, String, Double)]
      .collect().sorted.toSeq == Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)))
  }
}
