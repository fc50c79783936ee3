package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{CommitLog, DeltaInterop, HadoopFs, LogStore}

// checkpoint-parquet row shape (public protocol: one nullable struct per
// action type); top-level so the Product encoder derives cleanly
case class CpAdd(path: String, partitionValues: Map[String, String])
case class CpMeta(schemaString: String, partitionColumns: Seq[String])
case class CpRow(add: Option[CpAdd], metaData: Option[CpMeta])

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

  test("modern-feature tables refuse loudly by feature name") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType)))

    // deletion vectors: DV-bearing add action
    val dvTable = freshDir()
    writeFile(dvTable, "f1.parquet", Seq(1L).toDF("k"))
    writeLog(dvTable, 0L, Seq(protocol, metaData(schema.json),
      """{"add":{"path":"f1.parquet","partitionValues":{},"size":1,""" +
        """"modificationTime":0,"dataChange":true,""" +
        """"deletionVector":{"storageType":"u","pathOrInlineDv":"x","offset":1,""" +
        """"sizeInBytes":40,"cardinality":2}}}"""))
    val dv = intercept[UnsupportedOperationException] {
      DeltaInterop.readDelta(spark, dvTable)
    }
    assert(dv.getMessage.contains("deletionVectors"), dv.getMessage)

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
