package graft

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming reads OVER commit-log tables: downstream consumers tail the
  * catalog table (`spark.readStream.table`), not a raw landing directory —
  * offsets are commit versions, so delivery is exactly-once across
  * restarts, and non-append commits fail loudly unless opted into.
  */
class CommitLogStreamSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val warehouse =
    java.nio.file.Files.createTempDirectory("graft_stream_wh").toString

  spark.conf.set("spark.sql.catalog.gs", classOf[graft.catalog.GraftTableCatalog].getName)
  spark.conf.set("spark.sql.catalog.gs.warehouse", warehouse)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS gs.db")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  /** Drain the table's new commits into a parquet sink, to completion. */
  private def runOnce(table: String, out: String, cp: String,
      opts: Map[String, String] = Map.empty): Unit = {
    val reader = spark.readStream
    opts.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.table(table).writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("two commits stream exactly once across a restart") {
    spark.sql("CREATE TABLE gs.db.ev (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gs.db.ev VALUES (1, 'a'), (2, 'b')")
    val (out, cp) = (tmp("graft_sink"), tmp("graft_cp"))

    runOnce("gs.db.ev", out, cp)
    assert(spark.read.parquet(out).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))

    // second commit lands while no query is running; the restarted query
    // resumes from the checkpointed version and sees ONLY the new batch
    spark.sql("INSERT INTO gs.db.ev VALUES (3, 'c')")
    runOnce("gs.db.ev", out, cp)
    val all = spark.read.parquet(out).as[(Long, String)].collect().toSeq
    assert(all.size == 3, s"exactly-once violated: $all")
    assert(all.toSet == Set((1L, "a"), (2L, "b"), (3L, "c")))

    // an idle restart (no new commits) emits nothing
    runOnce("gs.db.ev", out, cp)
    assert(spark.read.parquet(out).count() == 3)
  }

  test("non-append commit fails the stream; ignoreChanges opts into added-only") {
    spark.sql("CREATE TABLE gs.db.mut (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gs.db.mut VALUES (1, 'a'), (2, 'b')")
    val (out, cp) = (tmp("graft_sink"), tmp("graft_cp"))
    runOnce("gs.db.mut", out, cp)
    assert(spark.read.parquet(out).count() == 2)

    // CoW DELETE removes a file from the manifest → insert-only feed
    // cannot express it → loud failure naming the escape hatches
    spark.sql("DELETE FROM gs.db.mut WHERE k = 1")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce("gs.db.mut", out, cp)
    }
    val msg = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf(_)).mkString(" | ")
    assert(msg.contains("removed") && msg.contains("ignoreChanges"), msg)

    // with ignoreChanges the non-append commit passes through as its
    // ADDED files only (here the deleted row's file simply disappears —
    // rewritten survivors re-emit when they share a file, a documented
    // Delta-parity contract) and the stream proceeds
    runOnce("gs.db.mut", out, cp, Map("ignoreChanges" -> "true"))
    val rows = spark.read.parquet(out).as[(Long, String)].collect().toSeq
    assert(rows.count(_ == (1L, "a")) == 1, s"initial rows must not re-emit: $rows")

    // and the source keeps tailing appends normally afterwards
    spark.sql("INSERT INTO gs.db.mut VALUES (4, 'd')")
    runOnce("gs.db.mut", out, cp)
    val later = spark.read.parquet(out).as[(Long, String)].collect().toSeq
    assert(later.count(_ == (4L, "d")) == 1, s"append after skip lost/duped: $later")
  }

  test("ignoreChanges replace that changes the partition spec rebuilds the reader factory") {
    val root = tmp("graft_respec")
    val log = new graft.catalog.CommitLog(spark, root)
    log.commitPartitioned(
      Seq((1L, "a"), (2L, "b")).toDF("k", "cat"), Seq("cat"), replace = true)
    val cp = tmp("graft_cp")
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = spark.readStream.format("graft")
      .option("ignoreChanges", "true").load(root)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = df.select("k", "cat").as[(Long, String)].collect()
        seen.synchronized { seen ++= rows }: Unit
      }
      .option("checkpointLocation", cp)
      .start()
    try {
      q.processAllAvailable()
      assert(seen.toSet == Set((1L, "a"), (2L, "b")), seen.toSeq)
      // a replace to a FLAT layout mid-stream drops the #partition
      // header; the reader factory cached against the partitioned spec
      // must be rebuilt, or the flat FilePartitions of this batch fail
      // or misread (r8 advice). Same stream instance — no restart.
      log.commit(Seq((3L, "c"), (4L, "d")).toDF("k", "cat"), replace = true)
      q.processAllAvailable()
      assert(seen.toSet == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")), seen.toSeq)
    } finally q.stop()
  }

  test("maxCommitsPerTrigger bounds each micro-batch to its commit window") {
    spark.sql("CREATE TABLE gs.db.rate (k BIGINT)")
    (1 to 4).foreach(i => spark.sql(s"INSERT INTO gs.db.rate VALUES ($i)"))
    val cp = tmp("graft_cp")
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream
      .option("maxCommitsPerTrigger", "1")
      .table("gs.db.rate")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batchSizes.synchronized { batchSizes += df.count() }: Unit
      }
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // 4 commits, 1 commit per trigger → 4 batches of exactly 1 row;
    // an uncapped run would take the whole backlog as ONE initial batch
    assert(batchSizes.toSeq == Seq(1L, 1L, 1L, 1L), batchSizes.toSeq)
  }

  test("streaming a renamed table binds the physical files to the logical schema") {
    spark.sql("CREATE TABLE gs.db.renstream (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gs.db.renstream VALUES (1, 'a')")
    spark.sql("ALTER TABLE gs.db.renstream RENAME COLUMN v TO label")
    spark.sql("INSERT INTO gs.db.renstream VALUES (2, 'b')")
    val (out, cp) = (tmp("graft_sink"), tmp("graft_cp"))
    // pre- and post-rename files both store the PHYSICAL column 'v';
    // the stream must plan under the physical schema and surface rows
    // under the LOGICAL name
    runOnce("gs.db.renstream", out, cp)
    val got = spark.read.parquet(out)
    assert(got.columns.toSet == Set("k", "label"), got.columns.toSeq)
    assert(got.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    spark.sql("INSERT INTO gs.db.renstream VALUES (3, 'c')")
    runOnce("gs.db.renstream", out, cp)
    assert(spark.read.parquet(out).count() == 3)
  }

  test("vacuum retention floor protects a lagging streaming checkpoint") {
    spark.sql("CREATE TABLE gs.db.vacfloor (k BIGINT)")
    spark.sql("INSERT INTO gs.db.vacfloor VALUES (1)")
    val (out, cp) = (tmp("graft_sink"), tmp("graft_cp"))
    runOnce("gs.db.vacfloor", out, cp)   // checkpoint now points at v1
    // the consumer goes offline; the table keeps committing
    spark.sql("INSERT INTO gs.db.vacfloor VALUES (2)")
    spark.sql("INSERT INTO gs.db.vacfloor VALUES (3)")
    val log = new graft.catalog.CommitLog(spark, s"$warehouse/db/vacfloor")

    // DEFAULT settings: versions this young sit inside the retention
    // horizon — vacuum refuses loudly and drops NOTHING
    val refuse = intercept[IllegalStateException] {
      log.vacuum(keepVersions = 1, minFileAgeMs = 0)
    }
    assert(refuse.getMessage.contains("retention horizon"), refuse.getMessage)
    assert(log.history().map(_.version).min == 1L, "refusal must drop nothing")

    // so the lagging consumer resumes cleanly from its checkpoint
    runOnce("gs.db.vacfloor", out, cp)
    assert(spark.read.parquet(out).count() == 3)

    // FORCED vacuum (horizon 0) drops the checkpointed window → the
    // consumer's restart hits the source's existing loud error
    spark.sql("INSERT INTO gs.db.vacfloor VALUES (4)")
    log.vacuum(keepVersions = 1, minFileAgeMs = 0, minVersionAgeMs = 0)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce("gs.db.vacfloor", out, cp)
    }
    val msg = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf(_)).mkString(" | ")
    assert(msg.contains("no longer available") && msg.contains("vacuum"), msg)
  }

  test("change feed streams append + CoW delete + MoR update as tagged batches, exactly-once") {
    import org.apache.spark.sql.functions.{col, lit}
    spark.sql("CREATE TABLE gs.db.cdf (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gs.db.cdf VALUES (1, 'a'), (2, 'b')")   // v1
    val (out, cp) = (tmp("graft_sink"), tmp("graft_cp"))

    // initial load: the full snapshot streams as inserts stamped v1
    runOnce("gs.db.cdf.changes", out, cp)
    def rows() = spark.read.parquet(out)
      .select("k", "v", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(rows().toSet == Set((1L, "a", "insert", 1L), (2L, "b", "insert", 1L)),
      rows().toString)

    // consumer offline: a CoW DELETE (v2) and a MoR UPDATE (v3) land —
    // exactly the commits the insert-only table tail refuses
    spark.sql("DELETE FROM gs.db.cdf WHERE k = 1")
    val log = new graft.catalog.CommitLog(spark, s"$warehouse/db/cdf")
    log.updateWhereMoR(col("k") === 2L, Seq("v" -> lit("B")))

    // the restarted feed drains BOTH as per-version tagged batches; the
    // raw rows are CoW-file-granular (an untouched survivor file emits
    // nothing; a rewritten one re-lists survivors as delete+insert
    // pairs — the documented contract), so assert the per-version NET
    runOnce("gs.db.cdf.changes", out, cp)
    val later = rows().filter(_._4 > 1L)
    assert(later.groupBy(identity).forall(_._2.size == 1), s"duplicates: $later")
    def netAt(v: Long) = later.filter(_._4 == v)
      .groupBy(r => (r._1, r._2)).view.mapValues(g =>
        g.count(_._3 == "insert") - g.count(_._3 == "delete"))
      .filter(_._2 != 0).toMap
    assert(netAt(2L) == Map((1L, "a") -> -1), s"CoW delete net wrong: $later")
    assert(netAt(3L) == Map((2L, "b") -> -1, (2L, "B") -> 1),
      s"MoR update net wrong: $later")

    // idle restart emits nothing (exactly-once across the checkpoint)
    val drained = rows().size
    runOnce("gs.db.cdf.changes", out, cp)
    assert(rows().size == drained, rows().toString)

    // replaying inserts minus deletes reconstructs the visible table
    val net = rows().groupBy(r => (r._1, r._2)).view.mapValues(g =>
      g.count(_._3 == "insert") - g.count(_._3 == "delete")).toMap
    val visible = net.collect { case ((k, v), n) if n > 0 => (k, v) }.toSet
    assert(visible == Set((2L, "B")), net.toString)
  }

  test("change feed batch read refuses; time travel on .changes refuses") {
    spark.sql("CREATE TABLE gs.db.cdfb (k BIGINT)")
    spark.sql("INSERT INTO gs.db.cdfb VALUES (1)")
    // batch capability is not declared, so Spark refuses at analysis —
    // point-in-time batch diffs live on CALL table_changes instead
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gs.db.cdfb.changes").collect()
    }
    assert(String.valueOf(e.getMessage).contains("does not support batch scan"),
      e.getMessage)
    val t = intercept[Exception] {
      spark.sql("SELECT * FROM gs.db.cdfb.changes VERSION AS OF 1").collect()
    }
    assert(String.valueOf(t.getMessage).contains("commit versions"), t.getMessage)
  }

  test("first batch is the full snapshot; version offsets appear in the checkpoint") {
    spark.sql("CREATE TABLE gs.db.snap (k BIGINT)")
    spark.sql("INSERT INTO gs.db.snap VALUES (1)")
    spark.sql("INSERT INTO gs.db.snap VALUES (2)")
    spark.sql("INSERT INTO gs.db.snap VALUES (3)")
    val (out, cp) = (tmp("graft_sink"), tmp("graft_cp"))
    runOnce("gs.db.snap", out, cp)   // three commits, ONE initial load
    assert(spark.read.parquet(out).as[Long].collect().toSet == Set(1L, 2L, 3L))
    // the committed offset is the commit version plus the root it was
    // recorded against (the failover re-anchor identity) — both
    // human-auditable in the checkpoint
    val offsets = new java.io.File(s"$cp/offsets").listFiles().map(f =>
      new String(java.nio.file.Files.readAllBytes(f.toPath)))
    val last = offsets.flatMap(_.linesIterator.toSeq.lastOption.map(_.trim))
    assert(last.exists(l => l.contains("\"v\":3") && l.contains("/db/snap")),
      offsets.mkString("\n---\n"))
  }
}
