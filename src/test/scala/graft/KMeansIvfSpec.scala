package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Trained IVF (ops.KMeansIvf) — property-based correctness, since the
  * iterative training state is not SQL-expressible for the DuckDB oracle:
  *  1. Lloyd inertia is non-increasing (the textbook convergence
  *     guarantee; a sign-flipped distance or a wrong mean breaks it),
  *  2. every vector lands in exactly one cluster,
  *  3. probe recall vs brute force is monotone in nprobe and exact at
  *     nprobe = k (searching all clusters IS brute force).
  */
class KMeansIvfSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir
  private val k = 8

  private lazy val vectors = Tables.embeddings(spark, sfDir)
  private lazy val (cents, inertia) = ops.KMeansIvf.train(spark, vectors, k, 4)

  test("Lloyd inertia is non-increasing over iterations") {
    assert(inertia.size == 4)
    inertia.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a * (1 + 1e-9), s"inertia increased: $inertia")
    }
    assert(inertia.last > 0.0)   // corpus is not degenerate
  }

  test("every vector is assigned to exactly one of the k trained clusters") {
    val a = ops.KMeansIvf.assign(vectors, cents)
    val n = vectors.count()
    assert(a.count() == n)
    assert(a.select("vec_id").distinct().count() == n)
    assert(a.select("c_id").distinct().count() <= k)
  }

  test("probe recall is monotone in nprobe and exact at nprobe = k") {
    val truth = ops.KMeansIvf.bruteForce(spark, vectors, 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    def recall(nprobe: Int): Double = {
      val got = ops.KMeansIvf.probe(spark, vectors, cents, 0L, nprobe, 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      truth.intersect(got).size.toDouble / truth.size
    }
    val r1 = recall(1); val r4 = recall(4); val rk = recall(k)
    assert(r1 <= r4 + 1e-9 && r4 <= rk + 1e-9, s"recall not monotone: $r1 $r4 $rk")
    assert(rk == 1.0, s"nprobe=k must equal brute force, recall=$rk")
    assert(r1 > 0.0, s"single-probe recall is zero — clusters are useless")
  }
}
