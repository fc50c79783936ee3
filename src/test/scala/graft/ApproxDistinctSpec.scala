package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.2-E `q_agg_approx_distinct`: the HLL sketch is engine-specific
  * (no DuckDB oracle), so correctness is an accuracy bound — each approx
  * count must land within ±5% of the exact distinct count. Checked at all
  * three scale factors so the bound holds across cardinality regimes.
  */
class ApproxDistinctSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def check(sfDir: String): Unit = {
    val approx = ops.Aggregates.queries("q_agg_approx_distinct")(spark, sfDir)
      .collect().head
    val exact = Tables.events(spark, sfDir).agg(
      countDistinct(col("user_id")).as("u"),
      countDistinct(col("event_id")).as("e")).collect().head
    val pairs = Seq(
      ("user_id", approx.getLong(approx.fieldIndex("approx_users")),
        exact.getLong(0)),
      ("event_id", approx.getLong(approx.fieldIndex("approx_events")),
        exact.getLong(1)))
    pairs.foreach { case (colName, a, e) =>
      assert(e > 0, s"$sfDir/$colName: exact distinct is zero")
      val relErr = math.abs(a - e).toDouble / e
      assert(relErr <= 0.05,
        s"$sfDir/$colName: approx=$a exact=$e rel_err=$relErr > 0.05")
    }
  }

  test("HLL sketches on disjoint halves union to the whole-corpus estimate") {
    // the property that makes the distinct sketch a DISTRIBUTED
    // aggregate: register-wise max over partial sketches equals the
    // one-pass sketch, so partition count / batch boundaries can never
    // change the estimate (same law CmSketchSpec pins for count-min)
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    li.createOrReplaceTempView("li_hll")
    val whole = spark.sql(
      "SELECT hll_sketch_estimate(hll_sketch_agg(l_suppkey)) FROM li_hll")
      .collect()(0).getLong(0)
    val merged = spark.sql(
      """SELECT hll_sketch_estimate(hll_union(a, b)) FROM
        |  (SELECT hll_sketch_agg(l_suppkey) AS a FROM li_hll
        |   WHERE l_orderkey % 2 = 0),
        |  (SELECT hll_sketch_agg(l_suppkey) AS b FROM li_hll
        |   WHERE l_orderkey % 2 = 1)""".stripMargin)
      .collect()(0).getLong(0)
    assert(merged == whole,
      s"union-of-halves estimate $merged != one-pass estimate $whole")
    val exact = li.select(countDistinct(col("l_suppkey"))).collect()(0).getLong(0)
    assert(math.abs(whole - exact).toDouble / exact <= 0.05)
  }

  test("approx_count_distinct within ±5% of exact at sf0.001") {
    check("/root/testdata/sf0.001")
  }

  test("approx_count_distinct within ±5% of exact at sf0.01") {
    check("/root/testdata/sf0.01")
  }

  test("approx_count_distinct within ±5% of exact at sf0.1") {
    check("/root/testdata/sf0.1")
  }

  test("approx_count_distinct within ±5% of exact at sf10 (100× bench scale)") {
    // gated like the sf10 tooling: runs only where the scale-proof data
    // has been generated (tools/run_main.sh graft.GenScale ... 100)
    val sf10 = "target/testdata-sf10"
    assume(new java.io.File(s"$sf10/events.parquet").exists(),
      s"$sf10 not generated on this box")
    check(sf10)
  }
}
