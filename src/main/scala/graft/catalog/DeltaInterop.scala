package graft.catalog

import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Interop with the open Delta Lake table format, implemented from the
  * PUBLIC protocol spec (delta.io PROTOCOL.md) rather than the connector
  * jars (absent in this environment): assets arrive and leave real lakes
  * as Delta/Iceberg tables, so the commit log needs an import/export
  * path even though its own manifest format is deliberately simpler.
  *
  *  - '''read''': replay `_delta_log` — optional parquet checkpoint
  *    named by `_last_checkpoint`, then the JSON commits after it, in
  *    version order; `metaData.schemaString` is Spark's own StructType
  *    JSON, `add`/`remove` actions resolve to the live file set
  *    (last action per path wins), `partitionValues` rehydrate the
  *    partition columns Delta strips from the data files.
  *  - '''import''': a read materialized into a [[CommitLog]] commit.
  *  - '''export''': pool files copied under the destination + a
  *    version-0 JSON commit (protocol 1/2, metaData, one `add` per
  *    file) — the minimal log any Delta reader accepts.
  *
  * All log processing is metadata-scale on the driver (file lists and
  * schemas — the same plane Delta's own snapshot replay runs on); row
  * data only ever moves through distributed parquet scans/writes.
  */
object DeltaInterop {

  private val mapper = new ObjectMapper()

  private case class Meta(schema: StructType, partitionCols: Seq[String])

  /** One replayed snapshot: table schema, partition columns, and the
    * live data files with their partition values.
    */
  private case class Snapshot(meta: Meta, files: Seq[(String, Map[String, Option[String]])])

  private def logDir(table: String) = new Path(table, "_delta_log")

  private def versionOf(name: String): Option[Long] = {
    val base = name.stripSuffix(".json")
    if (name.endsWith(".json") && base.forall(_.isDigit)) Some(base.toLong) else None
  }

  private def parseMeta(node: JsonNode): Meta = Meta(
    DataType.fromJson(node.get("schemaString").asText).asInstanceOf[StructType],
    Option(node.get("partitionColumns")).map(_.elements().asScala.map(_.asText).toSeq)
      .getOrElse(Seq.empty))

  private def partValues(node: JsonNode): Map[String, Option[String]] =
    Option(node.get("partitionValues")).map { pv =>
      pv.fields().asScala.map(e =>
        e.getKey -> (if (e.getValue.isNull) None else Some(e.getValue.asText))).toMap
    }.getOrElse(Map.empty)

  /** Field-metadata key carrying the parquet column name a column-mapped
    * Delta table stores a field under (public protocol; present in both
    * `name` and `id` modes — id mode additionally tags parquet field ids,
    * but physical-name matching reads both correctly for files Delta
    * writers produce).
    */
  private val PhysicalNameKey = "delta.columnMapping.physicalName"
  private val ColumnIdKey = "delta.columnMapping.id"

  /** Reader features this replay actually honors. Everything else must
    * refuse BY NAME: silently replaying a table whose reader contract we
    * don't implement returns wrong rows (a deletion-vector table would
    * resurrect deleted rows). `timestampNtz` only gates a TYPE the Spark
    * parquet reader handles natively; `columnMapping` is implemented in
    * [[readDelta]] via the fields' physical names.
    */
  private val SupportedReaderFeatures = Set("timestampNtz", "columnMapping")

  private def refuse(feature: String, where: String): Nothing =
    throw new UnsupportedOperationException(
      s"importDelta: table uses the Delta reader feature '$feature' ($where), " +
        "which this replay does not implement — importing would return wrong " +
        "rows. Rewrite the table without the feature (e.g. REORG TABLE ... " +
        "APPLY (PURGE) for deletion vectors) and re-export, then import.")

  private def checkProtocol(p: JsonNode): Unit = {
    val feats = Option(p.get("readerFeatures"))
      .map(_.elements().asScala.map(_.asText).toSet).getOrElse(Set.empty)
    val unsupported = feats -- SupportedReaderFeatures
    if (unsupported.nonEmpty)
      refuse(unsupported.toSeq.sorted.mkString(","), "protocol readerFeatures")
  }

  private def snapshot(spark: SparkSession, table: String,
      versionAsOf: Option[Long]): Snapshot = {
    val fs = HadoopFs.fs(spark, table)
    val dir = logDir(table)
    require(fs.exists(dir), s"not a Delta table (no _delta_log): $table")

    // checkpoint base: only usable when not time-traveling below it
    val lastCp = new Path(dir, "_last_checkpoint")
    val cpVersion: Option[Long] =
      if (!fs.exists(lastCp)) None
      else {
        val in = fs.open(lastCp)
        val body = try {
          val out = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
          new String(out.toByteArray, StandardCharsets.UTF_8)
        } finally in.close()
        val v = mapper.readTree(body).get("version").asLong
        if (versionAsOf.exists(_ < v)) None else Some(v)
      }

    var meta: Option[Meta] = None
    val live = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, Option[String]]]

    cpVersion.foreach { v =>
      // checkpoint parquet: one row per action, nested structs; driver
      // fetch is metadata-scale (the file list itself)
      val cp = new Path(dir, f"$v%020d.checkpoint.parquet")
      val cpDf = spark.read.parquet(cp.toString)
      def structFields(col: String): Seq[String] =
        cpDf.schema.find(_.name == col).map(_.dataType) match {
          case Some(st: StructType) => st.fieldNames.toSeq
          case _ => Seq.empty
        }
      // feature guards mirror the JSON replay: a checkpoint can be the
      // ONLY place these actions survive (the commits they rode in may
      // be below the checkpoint horizon)
      if (structFields("protocol").contains("readerFeatures") &&
          cpDf.selectExpr("protocol.readerFeatures AS rf").filter("rf IS NOT NULL")
            .collect().exists(r => r.getSeq[String](0)
              .exists(f => !SupportedReaderFeatures.contains(f))))
        refuse("readerFeatures (checkpoint)", "protocol readerFeatures")
      if (structFields("add").contains("deletionVector") &&
          cpDf.selectExpr("add.deletionVector AS dv").filter("dv IS NOT NULL").count() > 0)
        refuse("deletionVectors", "checkpoint add action")
      val rows = cpDf
        .selectExpr("add.path AS add_path", "add.partitionValues AS add_pv",
          "metaData.schemaString AS schema_string", "metaData.partitionColumns AS part_cols")
        .collect()
      rows.foreach { r =>
        if (!r.isNullAt(r.fieldIndex("schema_string"))) {
          meta = Some(Meta(
            DataType.fromJson(r.getString(r.fieldIndex("schema_string")))
              .asInstanceOf[StructType],
            Option(r.getSeq[String](r.fieldIndex("part_cols"))).getOrElse(Seq.empty)))
        }
        if (!r.isNullAt(r.fieldIndex("add_path"))) {
          val pv = Option(r.getMap[String, String](r.fieldIndex("add_pv")))
            .map(_.toMap.map { case (k, v2) => k -> Option(v2) }).getOrElse(Map.empty)
          live(r.getString(r.fieldIndex("add_path"))) = pv
        }
      }
    }

    val versions = fs.listStatus(dir).toSeq
      .flatMap(s => versionOf(s.getPath.getName).map(_ -> s.getPath))
      .filter { case (v, _) => v > cpVersion.getOrElse(-1L) &&
        versionAsOf.forall(v <= _) }
      .sortBy(_._1)
    require(versions.nonEmpty || cpVersion.nonEmpty,
      s"empty Delta log under $table" +
        versionAsOf.map(v => s" at or below version $v").getOrElse(""))

    versions.foreach { case (_, p) =>
      val in = fs.open(p)
      val body = try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
        new String(out.toByteArray, StandardCharsets.UTF_8)
      } finally in.close()
      body.split('\n').iterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
        val action = mapper.readTree(line)
        if (action.has("protocol")) checkProtocol(action.get("protocol"))
        else if (action.has("metaData")) {
          meta = Some(parseMeta(action.get("metaData")))
        } else if (action.has("add")) {
          val a = action.get("add")
          // a DV-bearing add can appear even below reader version 3 in
          // the wild; never rely on the protocol action alone
          if (a.hasNonNull("deletionVector")) refuse("deletionVectors", "add action")
          live(a.get("path").asText) = partValues(a)
        } else if (action.has("remove")) {
          live.remove(action.get("remove").get("path").asText): Unit
        }
        // txn/commitInfo actions carry no file-set state here
      }
    }

    Snapshot(meta.getOrElse(throw new IllegalStateException(
      s"Delta log under $table has no metaData action")), live.toSeq)
  }

  /** Read a Delta table (optionally `VERSION AS OF`) into a DataFrame:
    * live parquet files scanned distributed, partition columns restored
    * from `partitionValues` per partition group.
    */
  def readDelta(spark: SparkSession, table: String,
      versionAsOf: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    val snap = snapshot(spark, table, versionAsOf)
    val partCols = snap.meta.partitionCols
    // column mapping (mode name/id): fields carry the PHYSICAL name the
    // parquet files store under; partitionValues are keyed by it too.
    // Unmapped tables have no metadata and physical == logical.
    def phys(name: String): String = {
      val f = snap.meta.schema(name)
      if (f.metadata.contains(PhysicalNameKey))
        f.metadata.getString(PhysicalNameKey)
      else f.name
    }
    // a plain logical-named schema for the returned frame (metadata
    // stripped so downstream writes don't propagate the mapping keys)
    val outSchema = StructType(snap.meta.schema.map(f =>
      StructField(f.name, f.dataType, f.nullable)))
    val dataSchema = StructType(snap.meta.schema
      .filterNot(f => partCols.contains(f.name))
      .map(f => StructField(phys(f.name), f.dataType, f.nullable)))
    if (snap.files.isEmpty)
      return spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        outSchema)
    // group files by partition tuple; each group scans as one parquet
    // read with its partition values rehydrated as typed literals, then
    // the groups union — group count = partition count (metadata-scale)
    val byPart = snap.files.groupBy(_._2).toSeq
    val frames = byPart.map { case (pv, files) =>
      val paths = files.map { case (rel, _) => new Path(table, rel).toString }
      val base = spark.read.schema(dataSchema).parquet(paths: _*)
      partCols.foldLeft(base) { (df, c) =>
        val tpe = snap.meta.schema(c).dataType
        val v = pv.get(phys(c)).orElse(pv.get(c)).flatten.orNull
        df.withColumn(phys(c), lit(v).cast(tpe))
      }.select(snap.meta.schema.map(f =>
        col(s"`${phys(f.name)}`").as(f.name)): _*)
    }
    frames.reduce(_.unionByName(_))
  }

  /** Import a Delta table into a [[CommitLog]] table (one commit). */
  def importDelta(spark: SparkSession, deltaTable: String, commitRoot: String,
      replace: Boolean = true): Long =
    new CommitLog(spark, commitRoot).commit(readDelta(spark, deltaTable), replace = replace)

  /** Export the head of a [[CommitLog]] table as a minimal Delta table:
    * data files copied byte-identical (no recompute, no shuffle), one
    * version-0 commit listing them. Any Delta reader ≥ protocol (1,2)
    * accepts the result.
    */
  def exportDelta(spark: SparkSession, commitRoot: String, dest: String): Int = {
    val log = new CommitLog(spark, commitRoot)
    val v = log.currentVersion.getOrElse(throw new java.io.FileNotFoundException(
      s"no committed version under $commitRoot"))
    val schema = log.readVersion(v).schema
    val fs = HadoopFs.fs(spark, dest)
    val destPath = new Path(dest)
    fs.mkdirs(destPath)
    val srcFs = HadoopFs.fs(spark, commitRoot)
    val names: Seq[String] =
      if (log.dvFiles(v).isEmpty && log.partitionColumns(v).isEmpty) {
        // no tombstones, flat layout: pool files ARE the table bytes —
        // copy, don't recompute
        val ns = log.files(v)
        ns.foreach { n =>
          val src = new Path(new Path(commitRoot, "data"), n)
          if (!FileUtil.copy(srcFs, src, fs, new Path(destPath, n), false, fs.getConf))
            throw new java.io.IOException(s"exportDelta: copy of $n failed")
        }
        ns
      } else {
        // merge-on-read tombstones don't exist in the Delta dialect we
        // emit (a byte-copy would resurrect deleted rows), and a
        // hive-partitioned pool's files don't CONTAIN the partition
        // column (it lives in the path — a byte-copy would silently
        // drop it): materialize the visible snapshot instead (one
        // distributed write; partition columns become data columns)
        val stage = new Path(destPath, "_graft_export_stage")
        log.readVersion(v).write.mode("overwrite").parquet(stage.toString)
        val parts = fs.listStatus(stage)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .map(_.getPath).sortBy(_.getName)
        val moved = parts.map { p =>
          if (!fs.rename(p, new Path(destPath, p.getName)))
            throw new java.io.IOException(s"exportDelta: move of ${p.getName} failed")
          p.getName
        }
        fs.delete(stage, true)
        moved.toSeq
      }
    def esc(s: String): String = mapper.writeValueAsString(s)
    // a declared-schema sidecar with column renames exports as a
    // COLUMN-MAPPED Delta table (mode=name): the emitted schema carries
    // the logical names with `delta.columnMapping.physicalName` pointing
    // at the name the (byte-copied) files actually store — the public
    // protocol's own spelling of the indirection this commit log keeps
    // in its sidecar, so a rename never forces a rewrite on export
    // either. Tables without renames keep the minimal (1,2) log; a
    // rename-free declared schema still REPLACES the file-derived one,
    // which is what drops DROPPED columns from the exported contract.
    val declared: Option[StructType] = {
      val sidecar = new Path(commitRoot, "_schema.json")
      if (!srcFs.exists(sidecar)) None
      else {
        val in = srcFs.open(sidecar)
        val body = try {
          val out = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
          new String(out.toByteArray, StandardCharsets.UTF_8)
        } finally in.close()
        Some(DataType.fromJson(body).asInstanceOf[StructType])
      }
    }
    val renames = declared.map(ColumnMapping.renames).getOrElse(Map.empty)
    val (outSchema, configJson, protocol) =
      if (renames.isEmpty) {
        (declared.map(s => StructType(s.map(f =>
          StructField(f.name, f.dataType, f.nullable)))).getOrElse(schema),
          """{}""",
          """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""")
      } else {
        val d = declared.get
        val mapped = StructType(d.fields.zipWithIndex.map { case (f, i) =>
          StructField(f.name, f.dataType, f.nullable,
            new org.apache.spark.sql.types.MetadataBuilder()
              .putLong(ColumnIdKey, i + 1L)
              .putString(PhysicalNameKey, ColumnMapping.physicalName(f))
              .build())
        })
        (mapped,
          s"""{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"${d.length}"}""",
          // columnMapping's protocol floor per the public spec
          """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""")
      }
    val metaData =
      s"""{"metaData":{"id":${esc(java.util.UUID.randomUUID().toString)},""" +
        s""""format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${esc(outSchema.json)},""" +
        s""""partitionColumns":[],"configuration":$configJson}}"""
    val adds = names.map { n =>
      val st = fs.getFileStatus(new Path(destPath, n))
      s"""{"add":{"path":${esc(n)},"partitionValues":{},"size":${st.getLen},""" +
        s""""modificationTime":${st.getModificationTime},"dataChange":true}}"""
    }
    fs.mkdirs(logDir(dest))
    LogStore.write(fs, new Path(logDir(dest), f"${0L}%020d.json"),
      ((protocol +: metaData +: adds).mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    names.length
  }
}
