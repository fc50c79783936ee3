package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.CommitLog

/** `#op:` operation provenance: every publish path tags its manifest
  * with the operation that produced it (stale tags never carry), and
  * `history()` / `CALL graft.system.history` surface it — the DESCRIBE
  * HISTORY operation column. Inert to all readers.
  */
class OpHistorySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("the full mutation plane tags its versions; history reports newest-first") {
    val root = java.nio.file.Files.createTempDirectory("graft_oph").toString + "/t"
    val log = new CommitLog(spark, root)
    log.commit(Seq((1L, 10)).toDF("k", "q"), replace = false)               // 1 append
    log.commit(Seq((1L, 10), (2L, 20), (3L, 30), (4L, 40), (5L, 50))
      .toDF("k", "q"), replace = true)                                      // 2 replace
    log.merge(Seq((1L, 99)).toDF("k", "q"), "k")                            // 3 merge
    log.deleteWhere(col("k") === 2L)                                        // 4 delete
    log.updateWhere(col("k") === 3L, Seq("q" -> lit(0)))                    // 5 update
    log.deleteWhereMoR(col("k") === 4L)                                     // 6 delete_mor
    log.compact()                                                           // 7 compact (DV fold)
    log.restore(2L)                                                         // 8 restore
    log.setClustering(Seq("k"))                                             // 9 set_clustering
    log.addConstraint("q_nn", "q IS NOT NULL")                              // 10 add_constraint
    log.dropConstraint("q_nn")                                              // 11 drop_constraint
    val got = log.history().map(h => (h.version, h.operation))
    assert(got == Seq(
      11L -> "drop_constraint", 10L -> "add_constraint", 9L -> "set_clustering",
      8L -> "restore", 7L -> "compact", 6L -> "delete_mor", 5L -> "update",
      4L -> "delete", 3L -> "merge", 2L -> "replace", 1L -> "append"), got.toString)
    assert(log.operation(3L) == "merge")
  }

  test("clone, replicate, and optimize tag too") {
    val base = java.nio.file.Files.createTempDirectory("graft_oph2").toString
    val src = new CommitLog(spark, base + "/src")
    src.commit(spark.range(0, 200).select((col("id") * 7 % 200).as("k")),
      replace = false)
    val clone = new CommitLog(spark, base + "/clone")
    clone.cloneFrom(base + "/src")
    assert(clone.history().head.operation == "clone")
    val rep = new CommitLog(spark, base + "/rep")
    rep.replicateFrom(src): Unit
    assert(rep.history().head.operation == "replicate")
    src.optimizeBy("k"): Unit
    assert(src.history().head.operation == "optimize")
    assert(src.history().last.operation == "append")
  }
}
