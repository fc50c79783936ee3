package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.CommitLog

/** Hidden partition transforms through the SQL front door:
  * `CREATE TABLE ... PARTITIONED BY (months(c) / bucket(n, k))` declares
  * the layout, every INSERT derives it, SELECT never sees the `_p_*`
  * columns, and SQL UPDATE re-lays the staged rewrite out so pruning
  * survives. Unique catalog name: `gpt`.
  */
class SqlPartitionTransformSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val warehouse: String = {
    val w = java.nio.file.Files.createTempDirectory("graft_ptwh").toString
    spark.conf.set("spark.sql.catalog.gpt", classOf[graft.catalog.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gpt.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gpt.db")
    w
  }

  test("CREATE + INSERT + SELECT: layout derived and hidden end-to-end") {
    warehouse
    spark.sql("CREATE TABLE gpt.db.ev (k BIGINT, ts TIMESTAMP, v DOUBLE) " +
      "PARTITIONED BY (months(ts))")
    spark.sql("INSERT INTO gpt.db.ev VALUES " +
      "(1, TIMESTAMP '2024-01-05 10:00:00', 1.0), " +
      "(2, TIMESTAMP '2024-02-06 10:00:00', 2.0), " +
      "(3, TIMESTAMP '2024-03-07 10:00:00', 3.0)")
    assert(spark.table("gpt.db.ev").columns.sorted.toSeq == Seq("k", "ts", "v"),
      "derived layout column must stay hidden from SQL")
    val log = new CommitLog(spark, s"$warehouse/db/ev")
    assert(log.partitionTransforms.map(_.spec) == Seq("month(ts)"))
    assert(log.files(log.currentVersion.get).exists(_.contains("_p_month_ts=2024-02")),
      log.files(log.currentVersion.get).toString)
    // appends keep the layout; a month-range predicate prunes at the log
    spark.sql("INSERT INTO gpt.db.ev VALUES (4, TIMESTAMP '2024-03-20 10:00:00', 4.0)")
    val total = log.files(log.currentVersion.get).length
    val cand = log.prunedCandidates(
      col("ts") >= lit("2024-03-01 00:00:00").cast("timestamp"))
    assert(cand.length < total, s"${cand.length} of $total")
    assert(spark.sql("SELECT sum(v) FROM gpt.db.ev WHERE ts >= TIMESTAMP '2024-03-01'")
      .head().getDouble(0) == 7.0)
    // DESCRIBE-honesty: the table reports its transform partitioning
    val parts = spark.sessionState.catalogManager.catalog("gpt")
      .asInstanceOf[graft.catalog.GraftTableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "ev"))
      .partitioning().map(_.toString).toSeq
    assert(parts == Seq("months(ts)"), parts.toString)
  }

  test("bucket table: INSERT OVERWRITE re-lays, UPDATE keeps the layout") {
    warehouse
    spark.sql("CREATE TABLE gpt.db.bk (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO gpt.db.bk SELECT id, CAST(id AS DOUBLE) FROM range(0, 100)")
    val log = new CommitLog(spark, s"$warehouse/db/bk")
    assert(log.files(log.currentVersion.get).length == 4)
    assert(log.prunedCandidates(col("k") === 7L).length == 1)
    spark.sql("UPDATE gpt.db.bk SET v = -1.0 WHERE k = 7")
    // the SQL rewrite must re-derive + re-lay-out (still 4 buckets, and
    // equality still prunes to one file)
    assert(log.files(log.currentVersion.get).length == 4,
      log.files(log.currentVersion.get).toString)
    assert(log.prunedCandidates(col("k") === 7L).length == 1)
    assert(spark.sql("SELECT v FROM gpt.db.bk WHERE k = 7").head().getDouble(0) == -1.0)
    assert(spark.table("gpt.db.bk").count() == 100)
    spark.sql("INSERT OVERWRITE gpt.db.bk SELECT id, 0.5 FROM range(0, 8)")
    assert(spark.table("gpt.db.bk").count() == 8)
    assert(!spark.table("gpt.db.bk").columns.exists(_.startsWith("_p_")))
    // DELETE is predicate CoW: layout survives
    spark.sql("DELETE FROM gpt.db.bk WHERE k >= 4")
    assert(spark.table("gpt.db.bk").count() == 4)
  }

  test("CALL set_partition_transforms retrofits and evolves the layout explicitly") {
    warehouse
    spark.sql("CREATE TABLE gpt.db.ev2 AS SELECT id AS k, " +
      "CAST(CONCAT('2024-0', CAST(id % 3 + 1 AS STRING), '-15') AS TIMESTAMP) AS ts " +
      "FROM range(0, 90)")
    val log = new CommitLog(spark, s"$warehouse/db/ev2")
    assert(log.partitionTransforms.isEmpty)
    // retrofit months(ts) onto the flat table
    spark.sql("CALL gpt.system.set_partition_transforms('db.ev2', 'months(ts)')")
    assert(log.partitionTransforms.map(_.spec) == Seq("month(ts)"))
    assert(log.files(log.currentVersion.get).length == 3)
    assert(log.prunedCandidates(
      col("ts") >= lit("2024-03-01 00:00:00").cast("timestamp")).length == 1)
    assert(spark.table("gpt.db.ev2").count() == 90)
    // evolve to bucket(2, k): one explicit re-layout, values unchanged
    spark.sql("CALL gpt.system.set_partition_transforms('db.ev2', 'bucket(2, k)')")
    assert(log.partitionTransforms.map(_.spec) == Seq("bucket(2, k)"))
    assert(log.files(log.currentVersion.get).length == 2)
    assert(spark.table("gpt.db.ev2").count() == 90)
    assert(log.history().head.operation == "replace")
    // identity-partitioned tables refuse the plane switch
    spark.sql("CREATE TABLE gpt.db.idp (k BIGINT, c STRING) PARTITIONED BY (c)")
    val ex = intercept[Exception] {
      spark.sql("CALL gpt.system.set_partition_transforms('db.idp', 'bucket(2, k)')")
    }
    assert(ex.getMessage.contains("identity-partitioned"), ex.getMessage)
  }

  test("renamed non-source column: UPDATE/MERGE keep the hidden layout") {
    warehouse
    spark.sql("CREATE TABLE gpt.db.rbk (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO gpt.db.rbk SELECT id, CAST(id AS DOUBLE) FROM range(0, 100)")
    // the transform SOURCE can never rename (ALTER refuses), so a rename
    // of any other column composes with the row-level re-derivation
    spark.sql("ALTER TABLE gpt.db.rbk RENAME COLUMN v TO amount")
    spark.sql("UPDATE gpt.db.rbk SET amount = -1.0 WHERE k = 7")
    val log = new CommitLog(spark, s"$warehouse/db/rbk")
    assert(log.files(log.currentVersion.get).length == 4,
      log.files(log.currentVersion.get).toString)
    assert(log.prunedCandidates(col("k") === 7L).length == 1,
      "bucket pruning must survive the renamed rewrite")
    assert(spark.sql("SELECT amount FROM gpt.db.rbk WHERE k = 7")
      .head().getDouble(0) == -1.0)
    assert(spark.table("gpt.db.rbk").count() == 100)
    // files still store the PHYSICAL name (no silent materialization)
    val cols = spark.read.parquet(
      log.files(log.currentVersion.get).map(n => s"$warehouse/db/rbk/data/$n"): _*)
      .columns.toSet
    assert(cols.contains("v") && !cols.contains("amount"), cols.toString)
  }

  test("ALTER refuses to rename or drop a transform source column") {
    warehouse
    spark.sql("CREATE TABLE gpt.db.alt (k BIGINT, ts TIMESTAMP, v DOUBLE) " +
      "PARTITIONED BY (days(ts))")
    spark.sql("INSERT INTO gpt.db.alt VALUES (1, TIMESTAMP '2024-03-01 10:00:00', 1.0)")
    val ex1 = intercept[Exception] {
      spark.sql("ALTER TABLE gpt.db.alt RENAME COLUMN ts TO event_ts")
    }
    assert(ex1.getMessage.contains("transform source"), ex1.getMessage)
    val ex2 = intercept[Exception] {
      spark.sql("ALTER TABLE gpt.db.alt DROP COLUMN ts")
    }
    assert(ex2.getMessage.contains("transform source"), ex2.getMessage)
    // non-source columns still evolve freely
    spark.sql("ALTER TABLE gpt.db.alt RENAME COLUMN v TO value")
    assert(spark.table("gpt.db.alt").columns.sorted.toSeq == Seq("k", "ts", "value"))
  }

  test("mixing identity and transform partitioning refuses") {
    warehouse
    val ex = intercept[Exception] {
      spark.sql("CREATE TABLE gpt.db.mix (k BIGINT, c STRING, ts TIMESTAMP) " +
        "PARTITIONED BY (c, months(ts))")
    }
    assert(ex.getMessage.contains("one plane"), ex.getMessage)
  }

  test("streaming ingest derives and keeps the hidden transform layout") {
    warehouse
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    spark.sql("CREATE TABLE gpt.db.st (k BIGINT, ts TIMESTAMP, v DOUBLE) " +
      "PARTITIONED BY (days(ts))")
    val in = MemoryStream[(Long, String, Double)](spark)
    val cp = java.nio.file.Files.createTempDirectory("gpt_cp").toString
    val q = in.toDF().toDF("k", "ts0", "v")
      .select(col("k"), to_timestamp(col("ts0")).as("ts"), col("v"))
      .writeStream.option("checkpointLocation", cp)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .toTable("gpt.db.st")
    try {
      in.addData((1L, "2024-03-01 10:00:00", 1.0), (2L, "2024-03-02 10:00:00", 2.0))
      q.processAllAvailable()
      in.addData((3L, "2024-03-02 12:00:00", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val log = new CommitLog(spark, s"$warehouse/db/st")
    assert(spark.table("gpt.db.st").count() == 3)
    assert(!spark.table("gpt.db.st").columns.exists(_.startsWith("_p_")))
    val files = log.files(log.currentVersion.get)
    assert(files.forall(_.contains("_p_day_ts=")), files.toString)
    val d2 = col("ts") >= lit("2024-03-02 00:00:00").cast("timestamp")
    assert(log.readWhere(d2).count() == 2)
    assert(log.prunedCandidates(d2).length < files.length)
    // per-epoch txn memory still dedups redeliveries
    assert(log.txns(log.currentVersion.get).exists(_.startsWith("stream-")),
      log.txns(log.currentVersion.get).toString)
  }

  test("streaming tail of a transform table serves the logical schema") {
    warehouse
    spark.sql("CREATE TABLE gpt.db.tl (k BIGINT, ts TIMESTAMP, v DOUBLE) " +
      "PARTITIONED BY (days(ts))")
    spark.sql("INSERT INTO gpt.db.tl VALUES " +
      "(1, TIMESTAMP '2024-03-01 10:00:00', 1.0), " +
      "(2, TIMESTAMP '2024-03-02 10:00:00', 2.0)")
    val out = java.nio.file.Files.createTempDirectory("gpt_tl_out").toString
    val cp = java.nio.file.Files.createTempDirectory("gpt_tl_cp").toString
    val q = spark.readStream.table("gpt.db.tl").writeStream
      .format("parquet").option("path", out).option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(out)
    assert(got.columns.sorted.toSeq == Seq("k", "ts", "v"), got.columns.toSeq)
    assert(got.count() == 2)
  }

  test("Delta/Iceberg export of a transform table ships the LOGICAL schema") {
    warehouse
    spark.sql("CREATE TABLE gpt.db.ex (k BIGINT, ts TIMESTAMP, v DOUBLE) " +
      "PARTITIONED BY (days(ts))")
    spark.sql("INSERT INTO gpt.db.ex VALUES " +
      "(1, TIMESTAMP '2024-03-01 10:00:00', 1.0), " +
      "(2, TIMESTAMP '2024-03-02 10:00:00', 2.0)")
    val dd = java.nio.file.Files.createTempDirectory("gpt_dexp").toString
    graft.catalog.DeltaInterop.exportDelta(spark, s"$warehouse/db/ex", dd): Unit
    val delta = spark.read.parquet(
      new java.io.File(dd).listFiles.filter(_.getName.endsWith(".parquet"))
        .map(_.getPath): _*)
    assert(delta.columns.sorted.toSeq == Seq("k", "ts", "v"), delta.columns.toSeq)
    assert(delta.count() == 2)
    val di = java.nio.file.Files.createTempDirectory("gpt_iexp").toString
    graft.catalog.IcebergInterop.exportIceberg(spark, s"$warehouse/db/ex", di): Unit
    val ice = spark.read.parquet(s"$di/data")
    assert(ice.columns.sorted.toSeq == Seq("k", "ts", "v"), ice.columns.toSeq)
    assert(ice.count() == 2)
  }

  test("CTAS with a transform layout") {
    warehouse
    spark.sql("CREATE TABLE gpt.db.ct PARTITIONED BY (truncate(1, s)) AS " +
      "SELECT CAST(id AS BIGINT) AS k, substr('abcde', CAST(id % 5 AS INT) + 1, 1) AS s " +
      "FROM range(0, 50)")
    val log = new CommitLog(spark, s"$warehouse/db/ct")
    assert(log.partitionTransforms.map(_.spec) == Seq("truncate(1, s)"))
    assert(log.files(log.currentVersion.get).length == 5)
    assert(log.prunedCandidates(col("s") === "c").length == 1)
    assert(spark.sql("SELECT count(*) FROM gpt.db.ct WHERE s = 'c'").head().getLong(0) == 10)
  }
}
