package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Hidden-bucket storage-partitioned joins: two tables laid out
  * `PARTITIONED BY (bucket(n, k))` report `bucket(n, k)`
  * key-grouping (resolved through the catalog's `FunctionCatalog` —
  * [[graft.catalog.GraftBucketFunction]]) and join with ZERO shuffle
  * exchanges under `spark.sql.sources.v2.bucketing.enabled` — the
  * Iceberg-style bucket join, on a layout the user never sees.
  * Unique catalog name: `gbk`.
  */
class BucketJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  private val warehouse =
    java.nio.file.Files.createTempDirectory("graft_bkwh").toString

  spark.conf.set("spark.sql.catalog.gbk", classOf[graft.catalog.GraftTableCatalog].getName)
  spark.conf.set("spark.sql.catalog.gbk.warehouse", warehouse)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS gbk.db")

  spark.sql("CREATE TABLE gbk.db.fa (k BIGINT, v DOUBLE) PARTITIONED BY (bucket(4, k))")
  spark.sql("INSERT INTO gbk.db.fa SELECT id, id * 1.5 FROM range(0, 1000)")
  spark.sql("CREATE TABLE gbk.db.fb (k BIGINT, w DOUBLE) PARTITIONED BY (bucket(4, k))")
  spark.sql("INSERT INTO gbk.db.fb SELECT id, id * 0.5 FROM range(0, 600)")

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) =>
      k -> (try Some(spark.conf.get(k)) catch { case _: Exception => None })
    }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def spjOn(body: => Unit): Unit = withConfs(
    "spark.sql.sources.v2.bucketing.enabled" -> "true",
    "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")(body)

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private val joinSql =
    """SELECT a.k, a.v, b.w FROM gbk.db.fa a JOIN gbk.db.fb b ON a.k = b.k
      |ORDER BY a.k""".stripMargin

  test("co-bucketed join plans with zero shuffle exchanges") {
    spjOn {
      val df = spark.sql(joinSql)
      val p = planOf(df)
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucket SPJ must not shuffle either side:\n$p")
      val rows = df.collect()
      assert(rows.length == 600)
      assert(rows.head.getLong(0) == 0L && rows.last.getLong(0) == 599L)
      // values match the conf-off (shuffled) plan exactly
      val spj = rows.map(_.toSeq).toSeq
      withConfs("spark.sql.sources.v2.bucketing.enabled" -> "false") {
        assert(spark.sql(joinSql).collect().map(_.toSeq).toSeq == spj)
      }
    }
  }

  test("mismatched bucket counts fall back to a correct shuffled join") {
    spark.sql("CREATE TABLE gbk.db.f8 (k BIGINT, w DOUBLE) PARTITIONED BY (bucket(8, k))")
    spark.sql("INSERT INTO gbk.db.f8 SELECT id, id * 2.0 FROM range(0, 600)")
    spjOn {
      val df = spark.sql(
        "SELECT a.k, a.v, b.w FROM gbk.db.fa a JOIN gbk.db.f8 b ON a.k = b.k")
      assert(df.count() == 600)
    }
  }

  test("unbucketed side shuffles by the bucket function; bucketed side stays put") {
    spark.sql("CREATE TABLE gbk.db.plain (k BIGINT, w DOUBLE)")
    spark.sql("INSERT INTO gbk.db.plain SELECT id, id * 3.0 FROM range(0, 600)")
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.shuffle.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(
        """SELECT a.k, a.v, b.w FROM gbk.db.fa a JOIN gbk.db.plain b ON a.k = b.k
          |ORDER BY a.k""".stripMargin)
      val rows = df.collect()
      assert(rows.length == 600)
      assert(rows.map(r => (r.getLong(0), r.getDouble(2))).take(3).toSeq ==
        Seq((0L, 0.0), (1L, 3.0), (2L, 6.0)))
      // the bucketed scan stays put; the plain side is shuffled INTO the
      // bucket layout by evaluating the catalog's bucket function — the
      // join itself pays zero hashpartitioning exchanges
      val p = planOf(df)
      assert(p.contains(
        "Exchange keygroupedpartitioning(transformexpression(graft.catalog.GraftBucketFunction"),
        s"plain side must shuffle by the catalog bucket function:\n$p")
      assert(!p.contains("Exchange hashpartitioning"),
        s"neither join side may hash-shuffle:\n$p")
    }
  }

  test("conf off keeps stock planning and the same values") {
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val p = planOf(spark.sql(joinSql))
      assert(p.contains("Exchange hashpartitioning"), p)
    }
  }
}
