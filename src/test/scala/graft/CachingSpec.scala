package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `Caching.withCached` materialization tiers (SURVEY §7.1 scoped-cache
  * posture): all three modes must produce identical results; `reliable`
  * must actually write to the configured checkpoint directory (the
  * executor-loss-safe tier); unrecognized modes must fail loudly instead
  * of silently downgrading fault tolerance.
  */
class CachingSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val confKey = "spark.graft.cache.materialize"

  private def withMode[A](mode: Option[String])(body: => A): A = {
    val prev = spark.conf.getOption(confKey)
    mode.foreach(spark.conf.set(confKey, _))
    if (mode.isEmpty) spark.conf.unset(confKey)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
  }

  private def base = Tables.nation(spark, sfDir)
    .select(col("n_nationkey"), col("n_regionkey"))

  // a multi-consumer shape — the reason withCached exists
  private def consumeTwice(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("n_regionkey").count()
      .join(df.select("n_regionkey").distinct(), Seq("n_regionkey"))

  private def expected =
    consumeTwice(base).orderBy("n_regionkey").as[(Long, Long)].collect().toSeq

  test("default and explicit local mode materialize the same result") {
    val d = withMode(None)(ops.Caching.withCached(base)(consumeTwice))
      .orderBy("n_regionkey").as[(Long, Long)].collect().toSeq
    val l = withMode(Some("local"))(ops.Caching.withCached(base)(consumeTwice))
      .orderBy("n_regionkey").as[(Long, Long)].collect().toSeq
    assert(d == expected && l == expected)
  }

  test("reliable mode checkpoints to the configured directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft_chk")
    stream.Stateful.deleteOnExit(dir.toFile)
    val prevDir = Option(spark.sparkContext.getCheckpointDir).flatten
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      val r = withMode(Some("reliable"))(ops.Caching.withCached(base)(consumeTwice))
        .orderBy("n_regionkey").as[(Long, Long)].collect().toSeq
      assert(r == expected)
      // the checkpoint actually landed in reliable storage
      def count(f: java.io.File): Int =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.map(count).sum
        else 1
      assert(count(dir.toFile) > 0, "reliable checkpoint dir is empty")
    } finally prevDir.foreach(spark.sparkContext.setCheckpointDir)
  }

  test("lineage mode keeps the full recomputable plan, same result") {
    val r = withMode(Some("lineage"))(ops.Caching.withCached(base)(consumeTwice))
    assert(r.orderBy("n_regionkey").as[(Long, Long)].collect().toSeq == expected)
    // lineage mode intentionally leaves the subplan persisted — release it
    spark.sharedState.cacheManager.clearCache()
  }

  test("an unrecognized materialize mode fails loudly") {
    val e = intercept[IllegalArgumentException] {
      withMode(Some("relaible"))(ops.Caching.withCached(base)(consumeTwice))
    }
    assert(e.getMessage.contains("relaible"))
  }
}
