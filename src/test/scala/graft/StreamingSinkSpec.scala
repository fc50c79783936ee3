package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Native streaming SINK into commit-log tables
  * (`df.writeStream.toTable("graft.db.t")`): per-epoch append/replace
  * commits with txn-id exactly-once, closing the loop with the
  * commit-tail source — a table as both ends of a streaming topology.
  */
class StreamingSinkSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val warehouse =
    java.nio.file.Files.createTempDirectory("graft_sink_wh").toString

  spark.conf.set("spark.sql.catalog.gw", classOf[graft.catalog.GraftTableCatalog].getName)
  spark.conf.set("spark.sql.catalog.gw.warehouse", warehouse)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS gw.db")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("append mode: each epoch is one append commit; rows accumulate exactly once") {
    spark.sql("CREATE TABLE gw.db.sink (k BIGINT, v STRING)")
    val in = MemoryStream[(Long, String)](spark)
    val cp = tmp("gw_cp")
    val q = in.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append())
      .toTable("gw.db.sink")
    try {
      in.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM gw.db.sink").as[(Long, String)]
        .collect().toSet == Set((1L, "a"), (2L, "b")))
      in.addData((3L, "c"))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM gw.db.sink").as[(Long, String)]
        .collect().toSet == Set((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()

    // epochs committed with txn memory: the table's history shows appends
    val log = new graft.catalog.CommitLog(spark, s"$warehouse/db/sink")
    val head = log.currentVersion.get
    assert(log.txns(head).exists(_.startsWith("stream-")), log.txns(head))

    // the commit-tail SOURCE reads back what the sink wrote (full loop)
    val out = tmp("gw_loop_out")
    val cp2 = tmp("gw_loop_cp")
    val q2 = spark.readStream.table("gw.db.sink").writeStream
      .format("parquet").option("path", out).option("checkpointLocation", cp2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() == 3)
  }

  test("restart with the same checkpoint continues; replayed epochs dedup by txn id") {
    spark.sql("CREATE TABLE gw.db.once (k BIGINT)")
    val in = MemoryStream[Long](spark)
    val cp = tmp("gw_cp")
    val q = in.toDF().toDF("k").writeStream
      .option("checkpointLocation", cp).outputMode(OutputMode.Append())
      .toTable("gw.db.once")
    try { in.addData(1L, 2L); q.processAllAvailable() } finally q.stop()

    // restart the SAME source from the same checkpoint: only the
    // unconsumed tail lands, nothing re-lands
    in.addData(3L)
    val q2 = in.toDF().toDF("k").writeStream
      .option("checkpointLocation", cp).outputMode(OutputMode.Append())
      .toTable("gw.db.once")
    try { q2.processAllAvailable() } finally q2.stop()
    val rows = spark.sql("SELECT k FROM gw.db.once").as[Long].collect().toSeq
    assert(rows.sorted == Seq(1L, 2L, 3L), s"exactly-once violated: $rows")

    // the epoch-replay seam itself: a txn id already on the head makes
    // the re-commit a wholesale no-op (crash between sink commit and
    // checkpoint write → Spark re-runs the epoch → same txn id)
    val log = new graft.catalog.CommitLog(spark, s"$warehouse/db/once")
    val head = log.currentVersion.get
    val replayTxn = log.txns(head).find(_.startsWith("stream-")).get
    val v = log.commit(Seq(99L).toDF("k"), replace = false, Some(replayTxn))
    assert(v == head, "replayed txn must not commit")
    assert(!spark.sql("SELECT k FROM gw.db.once").as[Long].collect().contains(99L))
  }

  test("complete mode: one replace commit per epoch (running aggregate table)") {
    spark.sql("CREATE TABLE gw.db.agg (v STRING, n BIGINT)")
    val in = MemoryStream[String](spark)
    val cp = tmp("gw_cp")
    val q = in.toDF().toDF("v").groupBy("v").agg(count(lit(1)).as("n"))
      .writeStream.option("checkpointLocation", cp)
      .outputMode(OutputMode.Complete())
      .toTable("gw.db.agg")
    try {
      in.addData("a", "a", "b")
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM gw.db.agg").as[(String, Long)]
        .collect().toSet == Set(("a", 2L), ("b", 1L)))
      in.addData("b")
      q.processAllAvailable()
      // Complete rewrote the WHOLE table — no stale ("b", 1) row survives
      assert(spark.sql("SELECT * FROM gw.db.agg").as[(String, Long)]
        .collect().toSet == Set(("a", 2L), ("b", 2L)))
    } finally q.stop()
  }

  test("streaming write into a partitioned table refuses loudly") {
    spark.sql("CREATE TABLE gw.db.part (k BIGINT, cat STRING) PARTITIONED BY (cat)")
    val in = MemoryStream[(Long, String)](spark)
    val cp = tmp("gw_cp")
    val e = intercept[Exception] {
      val q = in.toDF().toDF("k", "cat").writeStream
        .option("checkpointLocation", cp).outputMode(OutputMode.Append())
        .toTable("gw.db.part")
      try { in.addData((1L, "x")); q.processAllAvailable() } finally q.stop()
    }
    val msg = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf(_)).mkString(" | ")
    assert(msg.contains("hive-partitioned"), msg)
  }
}
