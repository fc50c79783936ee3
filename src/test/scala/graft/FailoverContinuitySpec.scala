package graft

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{CommitLog, GraftVersionOffset}
import graft.stream.Replicate

/** Streaming-consumer failover continuity: a `readStream.table` consumer
  * or a `.changes` CDC drain checkpointed against a PRIMARY resumes
  * against its PROMOTED REPLICA with no duplicates and no gaps — the
  * round-16 promote/fence DR plane extended to the consumers. Offsets
  * self-describe their root ([[graft.catalog.GraftVersionOffset]]); each
  * `replicateFrom` sync records the source-version window it folds
  * (`#repmap`) and its source identity (`#reproot`); re-pointing the
  * SAME checkpoint at the promoted table translates the primary-version
  * offset exactly at sync boundaries and fails LOUDLY everywhere else
  * (never a silent re-read). Reference grounding: the dual-region
  * posture (config/globalConfig.json:4-5) and the downstream-consumer
  * topology (cft/sourceSystem.yaml:29-63) those consumers live in.
  */
class FailoverContinuitySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val warehouse =
    java.nio.file.Files.createTempDirectory("graft_fo_wh").toString

  spark.conf.set("spark.sql.catalog.fo",
    classOf[graft.catalog.GraftTableCatalog].getName)
  spark.conf.set("spark.sql.catalog.fo.warehouse", warehouse)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS fo.db")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def logOf(t: String) = new CommitLog(spark, s"$warehouse/db/$t")

  private def runOnce(table: String, out: String, cp: String): Unit = {
    val q = spark.readStream.table(table).writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def causeMessages(t: Throwable): String = {
    val sb = new StringBuilder
    var c: Throwable = t
    while (c != null) { sb.append(Option(c.getMessage).getOrElse("")); c = c.getCause }
    sb.toString
  }

  test("translateSourceOffset: exact at sync boundaries, loud everywhere else") {
    val prim = new CommitLog(spark, tmp("fo_tr_prim"))
    prim.commit(Seq((1L, "a")).toDF("k", "v"), replace = false) // src v1
    prim.commit(Seq((2L, "b")).toDF("k", "v"), replace = false) // src v2
    val rep = new CommitLog(spark, tmp("fo_tr_rep"))
    rep.replicateFrom(prim)                                     // local 1 = src 1-2
    prim.commit(Seq((3L, "c")).toDF("k", "v"), replace = false) // src v3
    rep.replicateFrom(prim)                                     // local 2 = src 3-3

    val p = prim.tableQualifiedRoot
    assert(rep.translateSourceOffset(p, 0L) == 0L)
    assert(rep.translateSourceOffset(p, 2L) == 1L)
    assert(rep.translateSourceOffset(p, 3L) == 2L)

    val inside = intercept[IllegalStateException] {
      rep.translateSourceOffset(p, 1L)
    }
    assert(inside.getMessage.contains("INSIDE the window"),
      s"fold-window translation must refuse loudly: ${inside.getMessage}")

    val ahead = intercept[IllegalStateException] {
      rep.translateSourceOffset(p, 9L)
    }
    assert(ahead.getMessage.contains("AHEAD"), s"RPO window: ${ahead.getMessage}")

    val alien = intercept[IllegalStateException] {
      rep.translateSourceOffset("file:/nowhere/else", 2L)
    }
    assert(alien.getMessage.contains("no replication sync"),
      s"foreign lineage must refuse: ${alien.getMessage}")

    // translation survives PROMOTION (the history keeps every repmap)
    rep.promote(Some(prim))
    assert(rep.translateSourceOffset(p, 2L) == 1L)

    // legacy plain-decimal checkpoints parse as local versions
    assert(GraftVersionOffset.parse("7", rep).v == 7L)
    // self-describing offsets round-trip
    val o = GraftVersionOffset(2L, rep.tableQualifiedRoot)
    assert(GraftVersionOffset.parse(o.json, rep) == o)
  }

  test("readStream.table consumer survives failover: same checkpoint, " +
      "re-pointed at the promoted replica, no dups, no gaps") {
    spark.sql("CREATE TABLE fo.db.prim (k BIGINT, v STRING)")
    spark.sql("INSERT INTO fo.db.prim VALUES (1, 'a'), (2, 'b')") // v1
    spark.sql("INSERT INTO fo.db.prim VALUES (3, 'c')")           // v2
    val prim = logOf("prim")
    val (out, cp) = (tmp("fo_sink"), tmp("fo_cp"))

    runOnce("fo.db.prim", out, cp) // checkpoint now at primary v2
    assert(spark.read.parquet(out).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))

    // replica syncs land on version boundaries; then the region is lost
    spark.sql("CREATE TABLE fo.db.prom (k BIGINT, v STRING)")
    val prom = logOf("prom")
    prom.replicateFrom(prim)                                      // local 1 = src 1-2
    spark.sql("INSERT INTO fo.db.prim VALUES (4, 'd')")           // v3
    prom.replicateFrom(prim)                                      // local 2 = src 3-3
    val (_, gen, fenced) = prom.promote(Some(prim))
    assert(gen == 1L && fenced)
    prom.commit(Seq((5L, "e")).toDF("k", "v"), replace = false)   // post-failover write

    // SAME checkpoint, re-pointed at the promoted table: the offset
    // (primary v2) translates to local 1 and the drain resumes exactly
    // where it left off — (4,'d') from the synced window plus the
    // post-failover (5,'e'), nothing re-emitted
    runOnce("fo.db.prom", out, cp)
    val all = spark.read.parquet(out).as[(Long, String)].collect().toSeq
    assert(all.size == 5, s"dup or gap across the failover seam: $all")
    assert(all.toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")))

    // and the seam holds for the NEXT restart too (offsets now local)
    prom.commit(Seq((6L, "f")).toDF("k", "v"), replace = false)
    runOnce("fo.db.prom", out, cp)
    assert(spark.read.parquet(out).count() == 6)
  }

  test("a checkpoint inside a fold window fails LOUDLY, never re-reads") {
    spark.sql("CREATE TABLE fo.db.prim2 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO fo.db.prim2 VALUES (1, 'a')")  // v1
    val (out, cp) = (tmp("fo_sink2"), tmp("fo_cp2"))
    runOnce("fo.db.prim2", out, cp)                       // checkpoint at v1
    spark.sql("INSERT INTO fo.db.prim2 VALUES (2, 'b')")  // v2

    spark.sql("CREATE TABLE fo.db.prom2 (k BIGINT, v STRING)")
    val prom = logOf("prom2")
    prom.replicateFrom(logOf("prim2"))                    // local 1 = src 1-2 (fold)
    prom.promote(Some(logOf("prim2")))

    val e = intercept[Exception] { runOnce("fo.db.prom2", out, cp) }
    assert(causeMessages(e).contains("INSIDE the window"),
      s"expected the loud fold-window refusal, got: ${causeMessages(e)}")
    // nothing was silently re-read into the sink
    assert(spark.read.parquet(out).count() == 1)
  }

  test(".changes CDC drain survives failover: translated offsets + a " +
      "fresh txn scope resume the apply exactly-once") {
    spark.sql("CREATE TABLE fo.db.cprim (k BIGINT, v STRING)")
    spark.sql("INSERT INTO fo.db.cprim VALUES (1, 'a'), (2, 'b')") // v1
    val cprim = logOf("cprim")
    cprim.updateWhereMoR(
      org.apache.spark.sql.functions.col("k") === 1L,
      Seq("v" -> org.apache.spark.sql.functions.lit("A")))         // v2
    val (tgt, cp) = (tmp("fo_cdc_tgt"), tmp("fo_cdc_cp"))
    Replicate.run(spark, "fo.db.cprim", tgt, "k", cp)              // applied through v2
    val tgtLog = new CommitLog(spark, tgt)
    assert(tgtLog.read().select("k", "v").as[(Long, String)].collect().toSet ==
      Set((1L, "A"), (2L, "b")))

    // failover: replica synced to the boundary, promoted, then mutated
    spark.sql("CREATE TABLE fo.db.cprom (k BIGINT, v STRING)")
    val cprom = logOf("cprom")
    cprom.replicateFrom(cprim)                                     // local 1 = src 1-2
    cprom.promote(Some(cprim))                                     // local 2
    cprom.commit(Seq((3L, "c")).toDF("k", "v"), replace = false)   // local 3
    cprom.updateWhereMoR(
      org.apache.spark.sql.functions.col("k") === 2L,
      Seq("v" -> org.apache.spark.sql.functions.lit("B")))         // local 4

    // SAME checkpoint, re-pointed + fresh scope (the replica's local
    // version numbering restarts low — reusing the primary's scope
    // could collide with already-applied txn ids, the documented trap)
    Replicate.run(spark, "fo.db.cprom", tgt, "k", cp,
      scope = Some(cprom.tableQualifiedRoot))
    val rows = tgtLog.read().select("k", "v").as[(Long, String)].collect().toSeq
    assert(rows.size == 3, s"dup or gap across the failover seam: $rows")
    assert(rows.toSet == Set((1L, "A"), (2L, "B"), (3L, "c")))
    assert(rows.toSet ==
      cprom.read().select("k", "v").as[(Long, String)].collect().toSet)
  }
}
