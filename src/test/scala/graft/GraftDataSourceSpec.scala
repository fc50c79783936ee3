package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.CommitLog

/** `format("graft")` path addressing: the same GraftTable the catalog
  * serves, reached without a catalog — batch read with time travel,
  * batch write, streaming tail, streaming sink.
  */
class GraftDataSourceSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("batch read + versionAsOf; batch write append through the format") {
    val root = tmp("graft_ds")
    val log = new CommitLog(spark, root)
    log.commit(Seq((1L, "a")).toDF("k", "v"), replace = true)
    log.commit(Seq((2L, "b")).toDF("k", "v"), replace = false)

    assert(spark.read.format("graft").load(root).as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "b")))
    assert(spark.read.format("graft").option("versionAsOf", 1).load(root)
      .as[(Long, String)].collect().toSet == Set((1L, "a")))

    Seq((3L, "c")).toDF("k", "v").write.format("graft").mode("append").save(root)
    assert(log.read().count() == 3)
    // predicate pushdown survives path addressing
    val plan = spark.read.format("graft").load(root).filter($"k" === 2L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("k"), plan)
  }

  test("path read of a sidecar-less partitioned table rehydrates from the manifest header") {
    // written via CommitLog.commitPartitioned directly — no catalog, no
    // _partition.json sidecar. The manifest #partition header must drive
    // basePath rehydration, or every partition-column cell reads NULL
    // (r8 advice: silent wrong results)
    val root = tmp("graft_ds_part")
    val log = new CommitLog(spark, root)
    log.commitPartitioned(
      (1 to 60).map(i => (i.toLong, s"cat${i % 3}")).toDF("k", "cat"),
      Seq("cat"), replace = true)
    val byPath = spark.read.format("graft").load(root)
    assert(byPath.columns.toSet == Set("k", "cat"))
    assert(byPath.filter($"cat".isNull).count() == 0,
      "partition column must rehydrate from the c=v layout, not NULL")
    assert(byPath.filter($"cat" === "cat1").count() == 20)
  }

  test("streaming tail and streaming sink through the format") {
    val src = tmp("graft_ds_src")
    val dst = tmp("graft_ds_dst")
    new CommitLog(spark, src).commit(Seq(1L, 2L).toDF("k"), replace = true)
    new CommitLog(spark, dst).commit(spark.emptyDataset[Long].toDF("k"), replace = true)

    val in = MemoryStream[Long](spark)
    val cpSink = tmp("graft_ds_cp1")
    val q = in.toDF().toDF("k").writeStream.format("graft")
      .option("path", dst).option("checkpointLocation", cpSink)
      .outputMode(OutputMode.Append()).start()
    try { in.addData(7L, 8L); q.processAllAvailable() } finally q.stop()
    assert(new CommitLog(spark, dst).read().as[Long].collect().toSet == Set(7L, 8L))

    val out = tmp("graft_ds_out")
    val cpTail = tmp("graft_ds_cp2")
    val q2 = spark.readStream.format("graft").load(src)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cpTail)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.read.parquet(out).as[Long].collect().toSet == Set(1L, 2L))
  }
}
