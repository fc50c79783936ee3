package graft

import java.util.concurrent.{ConcurrentHashMap, CyclicBarrier}

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{CommitLog, HadoopFs, LocalLinkLogStore, LogStore}

/** The commit protocol on a rename-free substrate. S3-class object
  * stores have no atomic rename (client-side copy+delete, destination
  * silently replaced) — the reference's data plane is exactly such
  * buckets (cft/sourceSystem.yaml:20-27). These tests drive CommitLog
  * through mock stores that expose ONLY an object-store PUT:
  *
  *  - [[S3SimStore]]: a conditional PUT (If-None-Match semantics —
  *    server-side atomic claim, object appears complete or not at all).
  *    Racing writers must BOTH land, on distinct versions.
  *  - [[OverwritePutStore]]: an unconditional exists-then-PUT — the
  *    TOCTOU a rename-assuming protocol degrades to on S3. The test
  *    forces the interleaving and proves a commit is LOST, pinning why
  *    the LogStore seam exists.
  */
class LogStoreSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_logstore").toString + "/t"

  /** Object-store conditional PUT: an atomic server-side claim per key,
    * then the object materializes complete (a real S3 conditional PUT
    * is one atomic operation; the claim table stands in for the
    * server's arbitration). No rename, no link, no POSIX semantics.
    */
  private class S3SimStore extends LogStore {
    val claims = new ConcurrentHashMap[String, Boolean]()
    def putIfAbsent(dst: Path, content: Array[Byte]): Boolean = {
      val fs = HadoopFs.fs(spark, dst.toString)
      if (fs.exists(dst)) return false
      if (claims.putIfAbsent(dst.toString, true) != null) return false
      // a real S3 PUT materializes the object atomically — it is never
      // listable half-written. Emulate that visibility rule: buffer the
      // body under a dot-name no reader matches, then an atomic move
      // (this is the SERVER's internal materialization, not a protocol
      // step — the protocol under test only ever calls putIfAbsent)
      val tmp = new Path(dst.getParent, s".${dst.getName}.put")
      LogStore.write(fs, tmp, content)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(dst.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      true
    }
  }

  /** The broken protocol: check-then-PUT with no server-side condition.
    * The barrier parks every caller between its existence check and its
    * write, forcing the classic lost-update interleaving.
    */
  private class OverwritePutStore(barrier: CyclicBarrier) extends LogStore {
    def putIfAbsent(dst: Path, content: Array[Byte]): Boolean = {
      val fs = HadoopFs.fs(spark, dst.toString)
      val absent = !fs.exists(dst)
      barrier.await()
      if (!absent) false
      // serialize the post-barrier writes so the clobber is a clean
      // last-writer-wins (interleaved byte writes would just add noise)
      else this.synchronized { LogStore.write(fs, dst, content); true }
    }
  }

  private def logWith(root: String, s: LogStore): CommitLog =
    new CommitLog(spark, root) {
      override protected def newLogStore(): LogStore = s
    }

  test("conditional-put store: 8 racing writers all land on distinct versions, no rename anywhere") {
    val root = freshRoot()
    val store = new S3SimStore
    val frames = (1L to 8L).map(i => Seq(i).toDF("k"))
    val versions = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = frames.map { df =>
      new Thread(() =>
        try versions.add(logWith(root, store).commit(df, replace = false)): Unit
        catch { case t: Throwable => failures.add(t): Unit })
    }
    threads.foreach(_.start())
    // generous: 8 concurrent Spark write jobs can crawl when the full
    // suite saturates the box — a premature join turns load into a
    // spurious missing-version failure
    threads.foreach(_.join(600000))
    assert(threads.forall(!_.isAlive), "a racing commit is still running after 10 min")
    assert(failures.isEmpty, s"commit threw: ${failures.peek()}")
    import scala.jdk.CollectionConverters._
    assert(versions.asScala.toSeq.sorted == (1L to 8L),
      "every writer must land its own monotone version")
    assert(logWith(root, store).read().as[Long].collect().sorted.toSeq == (1L to 8L),
      "no writer's rows may be lost on the rename-free substrate")
  }

  test("unconditional PUT loses a racing commit — the failure mode the seam guards against") {
    val root = freshRoot()
    // seed v1 through a correct store so both racers contend for v2
    logWith(root, new S3SimStore).commit(Seq(0L).toDF("k"), replace = false)
    val barrier = new CyclicBarrier(2)
    val store = new OverwritePutStore(barrier)
    val versions = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val threads = Seq(1L, 2L).map { i =>
      new Thread(() =>
        versions.add(logWith(root, store).commit(Seq(i).toDF("k"), replace = false)): Unit)
    }
    threads.foreach(_.start())
    threads.foreach(_.join(600000))
    assert(threads.forall(!_.isAlive), "a racing commit is still running after 10 min")
    import scala.jdk.CollectionConverters._
    // both writers believe they committed v2 — the defining symptom
    assert(versions.asScala.toSeq == Seq(2L, 2L),
      s"expected the forced double-claim of v2, got ${versions.asScala.toSeq}")
    val survived = logWith(root, new S3SimStore).read().as[Long].collect().sorted.toSeq
    assert(survived.length == 2 && survived.head == 0L,
      s"exactly one racer's row should survive the clobber, got $survived")
  }

  test("putIfAbsent contract: one winner, loser leaves the winner's content intact") {
    for (mk <- Seq[() => LogStore](
        () => new S3SimStore,
        () => new LocalLinkLogStore(HadoopFs.fs(spark, "/tmp")))) {
      val store = mk()
      val dst = new Path(freshRoot(), "00000001.manifest")
      HadoopFs.fs(spark, dst.toString).mkdirs(dst.getParent)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (1 to 6).map { i =>
        new Thread(() =>
          if (store.putIfAbsent(dst, s"writer-$i\n".getBytes("UTF-8"))) {
            wins.incrementAndGet(): Unit
          })
      }
      threads.foreach(_.start())
      threads.foreach(_.join(60000))
      assert(wins.get() == 1, s"${store.getClass.getSimpleName}: exactly one writer must win")
      val body = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dst.toUri.getPath)), "UTF-8")
      assert(body.matches("writer-\\d\n"), s"torn/concatenated manifest: $body")
    }
  }
}
