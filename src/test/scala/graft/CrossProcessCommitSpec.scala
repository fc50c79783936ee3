package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.CommitLog

/** A second OS process appending to the same commit-log table. The
  * in-JVM contention tests (CatalogSpec, LogStoreSpec) share a lock
  * table by construction; only a forked JVM proves the publish
  * primitive itself — hard-link EEXIST on the local substrate — is the
  * thing doing the arbitration. Done-criteria: the multiset union of
  * both writers' rows survives, no commit is lost, versions are
  * contiguous and monotone.
  */
class CrossProcessCommitSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("two JVMs appending concurrently: all commits land, versions stay contiguous") {
    val root = java.nio.file.Files.createTempDirectory("graft_xproc").toString + "/t"
    val marker = java.nio.file.Paths.get(root + ".worker-up")
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val inherited = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments
    import scala.jdk.CollectionConverters._
    val cmd = (Seq(javaBin) ++ inherited.asScala ++ Seq(
      "-cp", System.getProperty("java.class.path"),
      "graft.AppendWorker", root, marker.toString, "100", "8")).asJava
    val proc = new ProcessBuilder(cmd).inheritIO().start()
    try {
      // overlap for real: hold this JVM's commits until the worker is up
      val deadline = System.currentTimeMillis() + 120000
      while (!java.nio.file.Files.exists(marker) && proc.isAlive
          && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(java.nio.file.Files.exists(marker), "worker JVM never came up")
      val log = new CommitLog(spark, root)
      for (i <- 0 until 8) log.commit(Seq(200L + i).toDF("k"), replace = false)
      assert(proc.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
        "worker JVM did not finish")
      assert(proc.exitValue() == 0, s"worker exited ${proc.exitValue()}")
      // no lost commit in either process: both multisets fully present
      val rows = log.read().as[Long].collect().sorted.toSeq
      assert(rows == ((100L until 108L) ++ (200L until 208L)).sorted,
        s"lost commit(s): $rows")
      // versions contiguous and monotone: 16 commits → head 16, every
      // manifest 1..16 present (nobody overwrote anybody)
      assert(log.currentVersion.contains(16L))
      for (v <- 1L to 16L) assert(log.files(v).nonEmpty, s"manifest $v missing")
      // append chain intact: each version carries exactly one more file
      assert((1L to 16L).map(log.files(_).length) == (1 to 16))
    } finally { if (proc.isAlive) proc.destroyForcibly(): Unit }
  }
}

/** Forked-JVM worker: its own SparkSession, its own CommitLog instance,
  * nothing shared with the test JVM but the filesystem.
  */
object AppendWorker {
  def main(args: Array[String]): Unit = {
    val Array(root, marker, baseStr, nStr) = args
    val base = baseStr.toLong
    val n = nStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-append-worker")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val log = new CommitLog(spark, root)
    java.nio.file.Files.write(java.nio.file.Paths.get(marker),
      "up\n".getBytes("UTF-8"))
    for (i <- 0 until n)
      log.commit(Seq(base + i).toDF("k"), replace = false): Unit
    spark.stop()
  }
}
