package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-min sketch accuracy bound (SURVEY §2.2-E approx family): the
  * sketch is engine-specific (no DuckDB oracle), so correctness is its
  * one-sided error contract — estimate ≥ true count always (counters
  * only ever over-count on hash collisions), and overcount ≤ eps·N for
  * the fixed seed — checked for EVERY key at all three scale factors.
  */
class CmSketchSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val eps = 0.001

  private def check(sfDir: String): Unit = {
    val li = Tables.lineitem(spark, sfDir)
    val sketch = ops.Stats.countMin(li, "l_suppkey", eps, 0.99, seed = 42)
    val exact = li.groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val slack = math.ceil(eps * n).toLong
    exact.foreach { case (key, truth) =>
      val est = ops.Stats.cmsEstimate(sketch, key)
      assert(est >= truth, s"$sfDir key=$key: CMS under-counted $est < $truth")
      assert(est <= truth + slack,
        s"$sfDir key=$key: overcount ${est - truth} > eps*N=$slack")
    }
    // a key never inserted estimates at most the collision slack
    val phantom = ops.Stats.cmsEstimate(sketch, -1L)
    assert(phantom <= slack, s"$sfDir phantom key estimated $phantom > $slack")
  }

  test("count-min estimates bound every supplier count at sf0.001") {
    check("/root/testdata/sf0.001")
  }
  test("count-min estimates bound every supplier count at sf0.01") {
    check("/root/testdata/sf0.01")
  }
  test("count-min estimates bound every supplier count at sf0.1") {
    check("/root/testdata/sf0.1")
  }

  test("sketches built on partitioned halves merge to the full corpus sketch") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val whole = ops.Stats.countMin(li, "l_suppkey", eps, 0.99, seed = 7)
    val a = ops.Stats.countMin(li.filter(col("l_orderkey") % 2 === 0),
      "l_suppkey", eps, 0.99, seed = 7)
    val b = ops.Stats.countMin(li.filter(col("l_orderkey") % 2 === 1),
      "l_suppkey", eps, 0.99, seed = 7)
    def read(x: Array[Byte]) = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(x))
    val merged = read(a).mergeInPlace(read(b))
    val wholeS = read(whole)
    val keys = li.select("l_suppkey").distinct().collect().map(_.getLong(0))
    keys.foreach { k =>
      assert(merged.estimateCount(k) == wholeS.estimateCount(k),
        s"key $k: merged half-sketches disagree with the one-pass sketch")
    }
  }
}
