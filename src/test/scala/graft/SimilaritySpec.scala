package graft

import org.scalatest.funsuite.AnyFunSuite

/** Known-answer tests for the vector kernels on tiny hand-built
  * embeddings (anchor = vec_id 0 by construction of the queries).
  */
class SimilaritySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def writeTmpSf(vecs: (Long, Seq[Float], Int)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_simspec").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  // 64-dim basis-ish vectors with known geometry
  private def unit(i: Int): Seq[Float] =
    Seq.tabulate(64)(j => if (j == i) 1f else 0f)

  test("dot and cosine vs anchor: identical=1, orthogonal=0, scaled dot") {
    val d = writeTmpSf(
      (0L, unit(0), 0),
      (1L, unit(0).map(_ * 2f), 0),        // same direction, scaled
      (2L, unit(1), 1))                    // orthogonal
    val out = ops.Similarity.queries("q_sim_dot")(spark, d)
      .select("vec_id", "dot", "cosine").as[(Long, Double, Double)]
      .collect().sortBy(_._1)
    assert(out(0) == ((0L, 1.0, 1.0)))
    assert(out(1) == ((1L, 2.0, 1.0)))
    assert(out(2) == ((2L, 0.0, 0.0)))
  }

  test("topk orders by cosine desc with vec_id tie-break, excludes anchor") {
    val d = writeTmpSf(
      (0L, unit(0), 0),
      (1L, unit(0), 0),                              // cos 1
      (2L, unit(0).zip(unit(1)).map(p => p._1 + p._2), 0), // cos ~0.707
      (3L, unit(1), 1),                              // cos 0
      (4L, unit(0), 0))                              // cos 1 (tie with 1)
    val out = ops.Similarity.queries("q_sim_topk")(spark, d)
      .select("vec_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 4L, 2L, 3L))
  }

  test("embed-cosine near-dup pairs above threshold only") {
    val d = writeTmpSf(
      (0L, unit(0), 0), (1L, unit(0), 0), (2L, unit(1), 1))
    val out = ops.Similarity.queries("q_dedup_embed_cosine")(spark, d)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(out == Set((0L, 1L)))   // only the parallel pair ≥ 0.30
  }

  test("knn vote returns majority label of neighbors") {
    // anchor 0 plus 6 neighbors: 4 with label 7, 2 with label 3
    val d = writeTmpSf(
      (0L, unit(0), 0),
      (1L, unit(0), 7), (2L, unit(0), 7), (3L, unit(0), 7),
      (4L, unit(0), 7), (5L, unit(1), 3), (6L, unit(1), 3))
    val out = ops.Similarity.queries("q_label_knn")(spark, d)
      .select("anchor_id", "pred_label").as[(Long, Int)].collect().toMap
    assert(out(0L) == 7)
  }
}
