package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.2-E `q_agg_approx_percentile`: the quantile summary is
  * engine-specific (no DuckDB oracle), so correctness is an accuracy
  * bound against the exact-percentile twin — each approximate quartile
  * must land within ±1% of `q_agg_percentile`'s value, at two scale
  * factors (the sketch's rank error is ≤ n/10000 by the accuracy knob;
  * the value bound is far looser than that on this distribution).
  */
class ApproxPercentileSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def quartiles(key: String, sfDir: String): Map[String, Seq[Double]] =
    ops.Stats.queries(key)(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap

  private def check(sfDir: String): Unit = {
    val approx = quartiles("q_agg_approx_percentile", sfDir)
    val exact = quartiles("q_agg_percentile", sfDir)
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    for ((g, as) <- approx; (a, e) <- as.zip(exact(g))) {
      assert(e > 0, s"$sfDir/$g: exact quartile is zero")
      val relErr = math.abs(a - e) / e
      assert(relErr <= 0.01, s"$sfDir/$g: approx=$a exact=$e rel_err=$relErr")
    }
  }

  test("approx_percentile quartiles within ±1% of exact at sf0.001") {
    check("/root/testdata/sf0.001")
  }

  test("approx_percentile quartiles within ±1% of exact at sf0.01") {
    check("/root/testdata/sf0.01")
  }

  test("approx_percentile quartiles within ±1% of exact at sf0.1") {
    check("/root/testdata/sf0.1")
  }

  test("approx_percentile quartiles within ±1% of exact at sf10 (100× bench scale)") {
    // gated like the sf10 tooling: runs only where the scale-proof data
    // has been generated (tools/run_main.sh graft.GenScale ... 100)
    val sf10 = "target/testdata-sf10"
    assume(new java.io.File(s"$sf10/lineitem.parquet").exists(),
      s"$sf10 not generated on this box")
    check(sf10)
  }
}
