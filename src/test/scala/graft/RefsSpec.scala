package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{CommitLog, LogStore}

/** Named refs on the commit log: immutable tags (vacuum-pinned
  * versions, `VERSION AS OF '<tag>'`), zero-copy branches (shallow
  * clones under `_branches/`), and [[CommitLog.fastForward]] — the
  * write-audit-publish close: atomic single-manifest publish, new files
  * adopted by rename, refusing on main divergence, MoR tombstones, or
  * a violation of MAIN's standing CHECK contract; a lost publish race
  * rolls the adopted files back and leaves the branch intact.
  * Unique catalog name for the SQL tests: `gref`.
  */
class RefsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString + "/t"

  test("tags pin a version against vacuum; dropping the tag releases it") {
    val log = new CommitLog(spark, freshRoot("refs_tag"))
    log.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), replace = false)
    log.createTag("v1_audit")
    log.commit(Seq((3L, "c")).toDF("k", "s"), replace = false)
    log.commit(Seq((9L, "z")).toDF("k", "s"), replace = true)
    assert(log.refs == Map("v1_audit" -> graft.catalog.RefInfo("v1_audit", "tag", 1L)))
    // keep only the head; v1 is tagged (pinned), v2 is not (collected)
    val (manifests, _) = log.vacuum(keepVersions = 1, minFileAgeMs = 0L,
      minVersionAgeMs = 0L)
    assert(manifests == 1, "only the untagged v2 may drop")
    assert(log.readVersion(1L).as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "a"), (2L, "b")), "tagged snapshot must stay readable post-vacuum")
    intercept[Exception] { log.readVersion(2L).collect() }
    log.dropRef("v1_audit")
    val (m2, _) = log.vacuum(keepVersions = 1, minFileAgeMs = 0L, minVersionAgeMs = 0L)
    assert(m2 == 1, "dropping the tag releases the pin")
    // a tag name can never shadow numeric time travel
    intercept[IllegalArgumentException] { log.createTag("7") }
  }

  test("write-audit-publish: branch isolates, fast-forward publishes atomically") {
    val root = freshRoot("refs_wap")
    val log = new CommitLog(spark, root)
    log.commit((1L to 100L).map(i => (i, i * 10.0)).toDF("k", "v"), replace = false)
    assert(log.createBranch("audit") == 1L)
    val br = log.branchLog("audit")
    // audit-stage corrections: CoW delete + update on the BRANCH
    br.deleteWhere(col("k") > 90L): Unit
    br.updateWhere(col("k") % 2 === 0, Seq("v" -> (col("v") + 1.0))): Unit
    br.commit(Seq((200L, 0.5)).toDF("k", "v"), replace = false): Unit
    // main is byte-identical until publish
    assert(log.read().count() == 100)
    assert(log.currentVersion.contains(1L))
    val v = log.fastForward("audit")
    assert(v == 2L)
    val got = log.read().as[(Long, Double)].collect().toMap
    assert(got.size == 91 && got(200L) == 0.5 && got(2L) == 21.0 &&
      got(3L) == 30.0 && !got.contains(91L))
    assert(log.history().head.operation == "fast_forward")
    // the branch is consumed; time travel to the pre-publish head holds
    assert(log.refs.isEmpty)
    assert(log.readVersion(1L).count() == 100)
    // every adopted file lives in MAIN's pool: no manifest line may
    // reference the (deleted) branch dir
    assert(log.files(v).forall(!_.contains("_branches/")), log.files(v).toString)
  }

  test("fast-forward refuses divergence, MoR tombstones, and a dropped-contract violation") {
    val root = freshRoot("refs_guard")
    val log = new CommitLog(spark, root)
    log.addConstraint("v_pos", "v > 0")
    log.commit(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), replace = false)

    // (a) main moved past the fork point -> refuse, branch intact
    log.createBranch("b1")
    log.commit(Seq((3L, 3.0)).toDF("k", "v"), replace = false)
    val ex = intercept[IllegalStateException] { log.fastForward("b1") }
    assert(ex.getMessage.contains("fork point"), ex.getMessage)
    assert(log.branchLog("b1").read().count() == 2, "branch must survive a refusal")
    log.dropRef("b1")

    // (b) branch carries MoR deletion vectors -> refuse until folded
    log.createBranch("b2")
    val b2 = log.branchLog("b2")
    b2.deleteWhereMoR(col("k") === 1L): Unit
    val ex2 = intercept[IllegalArgumentException] { log.fastForward("b2") }
    assert(ex2.getMessage.contains("deletion"), ex2.getMessage)
    b2.rewriteDeletes(): Unit
    assert(log.fastForward("b2") == log.currentVersion.get)
    assert(log.read().as[(Long, Double)].collect().sorted.toSeq ==
      Seq((2L, 2.0), (3L, 3.0)))

    // (c) the branch drops MAIN's CHECK locally and writes a violation:
    // publish must still refuse — the table's contract is main's
    log.createBranch("b3")
    val b3 = log.branchLog("b3")
    assert(b3.checkConstraints == Map("v_pos" -> "v > 0"),
      "branch must inherit main's standing contracts")
    b3.dropConstraint("v_pos")
    b3.commit(Seq((4L, -9.0)).toDF("k", "v"), replace = false): Unit
    val ex3 = intercept[IllegalStateException] { log.fastForward("b3") }
    assert(ex3.getMessage.contains("v_pos"), ex3.getMessage)
    assert(log.read().filter(col("v") < 0).count() == 0)
  }

  test("a lost publish race rolls the adopted files back; the branch survives") {
    val root = freshRoot("refs_race")
    // main handle whose conditional put lets a competitor commit FIRST
    // at the exact fast-forward target version — the narrowest window
    val racer = new CommitLog(spark, root)
    val log: CommitLog = new CommitLog(spark, root) {
      private var armed = true
      override protected def newLogStore(): LogStore = {
        val inner = super.newLogStore()
        (dst: Path, content: Array[Byte]) => {
          if (armed && dst.getName == "00000002.manifest") {
            armed = false
            racer.commit(Seq((777L, 7.0)).toDF("k", "v"), replace = false): Unit
          }
          inner.putIfAbsent(dst, content)
        }
      }
    }
    log.commit(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), replace = false)
    log.createBranch("audit")
    val br = log.branchLog("audit")
    br.updateWhere(col("k") === 1L, Seq("v" -> lit(99.0))): Unit
    val ex = intercept[IllegalStateException] { log.fastForward("audit") }
    assert(ex.getMessage.contains("concurrent"), ex.getMessage)
    // the competitor's commit won and survives; main never saw the branch
    assert(racer.read().as[(Long, Double)].collect().toMap ==
      Map(1L -> 1.0, 2L -> 2.0, 777L -> 7.0))
    // the branch is fully intact (its rewritten file moved back home)
    assert(log.branchLog("audit").read().as[(Long, Double)].collect().toMap ==
      Map(1L -> 99.0, 2L -> 2.0))
    // ... and a retry from a fresh fork still lands the correction
    log.dropRef("audit")
    log.createBranch("audit2")
    log.branchLog("audit2").updateWhere(col("k") === 1L, Seq("v" -> lit(99.0))): Unit
    log.fastForward("audit2"): Unit
    assert(racer.read().as[(Long, Double)].collect().toMap ==
      Map(1L -> 99.0, 2L -> 2.0, 777L -> 7.0))
  }

  test("SQL surface: VERSION AS OF ref name, refs/fast_forward procedures") {
    val w = java.nio.file.Files.createTempDirectory("graft_refwh").toString
    spark.conf.set("spark.sql.catalog.gref", classOf[graft.catalog.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gref.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gref.db")
    spark.sql("CREATE TABLE gref.db.t AS " +
      "SELECT id AS k, CAST(id * 10.0 AS DOUBLE) AS v FROM range(1, 11)")
    spark.sql("CALL gref.system.create_tag('db.t', 'launch', -1)")
    spark.sql("CALL gref.system.create_branch('db.t', 'fix', -1)")
    val log = new CommitLog(spark, s"$w/db/t")
    log.branchLog("fix").updateWhere(col("k") === 5L, Seq("v" -> lit(0.0))): Unit
    // branch read via SQL; main and tag untouched
    assert(spark.sql("SELECT v FROM gref.db.t VERSION AS OF 'fix' WHERE k = 5")
      .head().getDouble(0) == 0.0)
    assert(spark.sql("SELECT v FROM gref.db.t WHERE k = 5").head().getDouble(0) == 50.0)
    val refs = spark.sql("CALL gref.system.refs('db.t')").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(refs == Seq("fix" -> "branch", "launch" -> "tag"), refs.toString)
    val v = spark.sql("CALL gref.system.fast_forward('db.t', 'fix')")
      .head().getLong(0)
    assert(spark.sql("SELECT v FROM gref.db.t WHERE k = 5").head().getDouble(0) == 0.0)
    // the tag still serves the pre-fix snapshot
    assert(spark.sql("SELECT v FROM gref.db.t VERSION AS OF 'launch' WHERE k = 5")
      .head().getDouble(0) == 50.0)
    assert(spark.sql(s"SELECT v FROM gref.db.t VERSION AS OF $v WHERE k = 5")
      .head().getDouble(0) == 0.0)
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM gref.db.t VERSION AS OF 'nope'").collect()
    }
    assert(err.getMessage.contains("neither"), err.getMessage)
    spark.sql("CALL gref.system.drop_ref('db.t', 'launch')")
    assert(new CommitLog(spark, s"$w/db/t").refs.isEmpty)
  }

  test("concurrent createBranch of one name: one winner, intact branch, no litter") {
    val root = freshRoot("refs_race")
    new CommitLog(spark, root)
      .commit(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), replace = false)
    // Two independent creators race the same name. Each clones into its
    // OWN tmp dir, so neither can wipe the other's in-flight files; the
    // atomic ref decides, the loser's cleanup touches only its tmp.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val gate = new java.util.concurrent.CountDownLatch(1)
    def attempt() = pool.submit(new java.util.concurrent.Callable[Option[Throwable]] {
      def call(): Option[Throwable] = {
        gate.await()
        try { new CommitLog(spark, root).createBranch("audit"): Unit; None }
        catch { case t: Throwable => Some(t) }
      }
    })
    val (f1, f2) = (attempt(), attempt())
    gate.countDown()
    val failures = Seq(f1.get(), f2.get()).flatten
    pool.shutdown()
    assert(failures.size == 1, s"exactly one creator must win; failures: $failures")
    assert(failures.head.isInstanceOf[IllegalArgumentException], failures.head.toString)
    val log = new CommitLog(spark, root)
    assert(log.refs("audit").kind == "branch")
    assert(log.branchLog("audit").read().count() == 2,
      "the winner's branch must be complete — no ref on a missing/torn root")
    // the loser cleaned its tmp clone and markers; only the branch remains
    val names = graft.catalog.HadoopFs.fs(spark, root)
      .listStatus(new Path(root, "_branches")).map(_.getPath.getName).toSeq
    assert(names == Seq("audit"), s"no .tmp litter may remain: $names")
    // winner's vacuum-protection marker names the FINAL root, not its tmp
    val markers = graft.catalog.HadoopFs.fs(spark, root)
      .listStatus(new Path(root, "_clones"))
      .map(m => java.net.URLDecoder.decode(m.getPath.getName, "UTF-8")).toSeq
    assert(markers.exists(_.endsWith("_branches/audit")), markers.toString)
    assert(!markers.exists(_.contains(".tmp-")), markers.toString)
  }

  test("ref publishes last: a visible branch ref always implies its root") {
    val root = freshRoot("refs_order")
    val log = new CommitLog(spark, root)
    log.commit(Seq((1L, "a")).toDF("k", "s"), replace = false)
    val fs = graft.catalog.HadoopFs.fs(spark, root)
    // a crashed creator's claim (post-claim, pre-rename crash) blocks a
    // fresh create of the same name...
    val claim = new Path(root, "_refs/.pending/wap")
    fs.mkdirs(claim.getParent)
    LogStore.write(fs, claim, "branch\t1".getBytes("UTF-8"))
    val err = intercept[IllegalArgumentException] { log.createBranch("wap") }
    assert(err.getMessage.contains("in flight"), err.getMessage)
    assert(log.ref("wap").isEmpty,
      "an in-flight claim must never be visible as a ref")
    // ...until it ages out (the next create's sweep clears it)
    fs.setTimes(claim, System.currentTimeMillis() - 2L * 60 * 60 * 1000, -1)
    log.createBranch("wap"): Unit
    assert(log.refs("wap").kind == "branch")
    assert(log.branchLog("wap").read().count() == 1)
    assert(!fs.exists(claim), "a finished create must consume its claim")
    // a ref whose root was removed out-of-band errors loudly and
    // immediately — no bounded wait (the publish order makes a missing
    // root a real inconsistency, never a create in flight)
    fs.delete(new Path(root, "_branches/wap"), true)
    val t0 = System.nanoTime()
    val orphan = intercept[IllegalStateException] { log.branchLog("wap") }
    assert((System.nanoTime() - t0) < 2000000000L,
      "orphan detection must not stall on a poll loop")
    assert(orphan.getMessage.contains("out-of-band"), orphan.getMessage)
  }
}
