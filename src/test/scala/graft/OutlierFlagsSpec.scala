package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The exact 3-sigma flag (graft.ops.DataQuality.outlierFlags) against a
  * driver-side BigInt brute force of the cross-multiplied inequality
  * `(v·n − S)²·(n−1) > 9·n·(n·Q − S²)` — the two formulations must agree
  * row-for-row. The engine side computes a per-group ⌊3σn⌋ threshold via
  * an integer sqrt built from column expressions (double seed + Newton +
  * ±2 correction); BigInt has no such rounding seams, so any isqrt
  * off-by-one would surface here.
  */
class OutlierFlagsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def bruteForce(rows: Seq[(String, Long)]): Map[(String, Long), Boolean] = {
    val byG = rows.groupBy(_._1)
    byG.flatMap { case (g, vs) =>
      val n = BigInt(vs.size)
      val s = vs.map(t => BigInt(t._2)).sum
      val q = vs.map(t => BigInt(t._2) * BigInt(t._2)).sum
      vs.map { case (_, v) =>
        val d = BigInt(v) * n - s
        val out = n > 1 && d * d * (n - 1) > 9 * n * (n * q - s * s)
        (g, v) -> out
      }
    }
  }

  private def engine(rows: Seq[(String, Long)]): Map[(String, Long), Boolean] = {
    val df = rows.toDF("g", "v0")
      .select(col("g"), expr("CAST(v0 AS DECIMAL(38,0))").as("v"))
    graft.ops.DataQuality.outlierFlags(df)
      .select(col("g"), col("v").cast("long"), col("is_out"))
      .as[(String, Long, Boolean)].collect()
      .map { case (g, v, o) => (g, v) -> o }.toMap
  }

  private def check(rows: Seq[(String, Long)]): Unit = {
    val exp = bruteForce(rows)
    val got = engine(rows)
    assert(got.keySet == exp.keySet)
    val diff = exp.keys.filter(k => exp(k) != got(k)).toSeq.sortBy(_.toString)
    assert(diff.isEmpty,
      s"flag mismatch on $diff: expected ${diff.map(exp)}, engine ${diff.map(got)}")
  }

  test("an obvious spike is flagged, the bulk is not") {
    val rows = (1L to 50L).map(i => ("a", 1000L + (i % 7))) :+ (("a", 1000000L))
    val exp = bruteForce(rows)
    assert(exp(("a", 1000000L)), "brute force itself must call the spike an outlier")
    check(rows)
  }

  test("singleton and constant groups flag nothing") {
    // n=1: σ undefined → never an outlier (threshold lane must not
    // divide by zero); constant group: σ=0 and every d=0 → no flags
    check(Seq(("solo", 42L)) ++ (1L to 10L).map(_ => ("const", 7L)))
  }

  test("large-magnitude values take the integer-Newton isqrt lane") {
    // spread ~1e9 over 60 rows pushes T² = 9n²σ²·n/(n−1) far beyond 2^52,
    // so the double sqrt seed alone is not exact and the Newton steps +
    // correction must land the true ⌊√t2⌋
    val rows = (0L until 60L).map(i => ("big", i * 33333333L)) ++
      Seq(("big", 99999999999L))
    check(rows)
  }

  test("randomized groups agree with the BigInt brute force") {
    val rnd = new scala.util.Random(20260813L)
    for (round <- 1 to 8) {
      val rows = (1 to 6).flatMap { gi =>
        val n = 1 + rnd.nextInt(40)
        val scale = Seq(10L, 1000L, 1000000L, 100000000L)(rnd.nextInt(4))
        (1 to n).map(_ => (s"g$gi-$round", rnd.between(-scale, scale)))
      }
      check(rows)
    }
  }

  test("boundary: a value exactly at the 3-sigma threshold is NOT an outlier") {
    // construct a group where 9·n·(n·Q − S²) is a perfect square times
    // (n−1): v ∈ {0,0,0,18} (n=4, S=18, Q=324): nQ−S² = 1296−324 = 972,
    // T² = 9·4·972/3 = 11664 = 108², d(18) = 4·18−18 = 54 ≤ 108 → inlier;
    // d(0) = 18 → inlier. Exact-equality seams must not round to "out".
    check(Seq(("b", 0L), ("b", 0L), ("b", 0L), ("b", 18L)))
  }
}
