package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trained IVF: Lloyd's k-means over the embedding corpus + an
  * nprobe-parameterized cluster probe.
  *
  * `q_ann_ivf` (Similarity.scala) is the declared, oracle-checked IVF
  * *shape* — broadcast centroids → narrow assign → probe one cluster. Its
  * centroids are seed vectors, which keeps the oracle expressible in SQL
  * but leaves the partitioning quality untrained. This is the production
  * delta: real centroids from k-means, so clusters follow the data and a
  * small nprobe recovers most of the true neighbors.
  *
  * Scale design (100 TB): each Lloyd iteration is one broadcast of k·dim
  * floats + one narrow assignment map + one aggregation keyed on
  * (centroid, position) — no all-pairs anything, and the per-iteration
  * state (the centroid table) is k rows. `localCheckpoint` truncates the
  * iteration lineage so 10 iterations don't stack 10 plans. Assignment
  * distance uses the codegen'd `graft_vec_dot` kernel via the identity
  * ‖a−c‖² = a·a + c·c − 2·a·c (one fused loop per pair, no intermediate
  * arrays).
  *
  * Training is engine-specific iterative state (like the HLL sketch, not
  * SQL-expressible for the DuckDB oracle) — correctness is property-based
  * in KMeansIvfSpec: Lloyd inertia is non-increasing, probe recall is
  * monotone in nprobe, and nprobe = k recovers brute force exactly.
  */
object KMeansIvf {

  private def dotE(a: String, b: String): String = s"graft_vec_dot($a, $b)"

  /** Squared L2 via the dot kernel: ‖a−c‖² = a·a + c·c − 2·a·c. */
  private def d2Col = expr(dotE("embedding", "embedding")) +
    expr(dotE("c_emb", "c_emb")) - lit(2.0) * expr(dotE("embedding", "c_emb"))

  /** Assign every vector to its nearest centroid (min L2, tie → min c_id). */
  def assign(vectors: DataFrame, centroids: DataFrame): DataFrame =
    vectors.crossJoin(broadcast(centroids))
      .withColumn("d2", d2Col)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("d2").asc, col("c_id").asc)))
      .filter(col("rn") === 1)
      .drop("rn")

  /** Lloyd's k-means. Deterministic init (the k lowest vec_ids), `iters`
    * update steps. Returns the trained centroid table (c_id, c_emb) and
    * the inertia (sum of squared distances) measured after each update —
    * non-increasing by construction, which the spec asserts.
    *
    * One Spark job per iteration: the inertia of the centroids ENTERING an
    * iteration is harvested from that iteration's assignment pass via
    * `Dataset.observe` (an `Observation` accumulates sum(d2) inside the
    * update job — no separate collect/job per iteration), and iteration
    * i+1's observation IS the post-update-i inertia because Lloyd re-runs
    * the same assignment. Only the final update needs one extra
    * measurement job, since no later iteration re-assigns against it.
    */
  def train(spark: SparkSession, vectors: DataFrame, k: Int, iters: Int)
      : (DataFrame, Seq[Double]) = {
    graft.functions.VectorKernels.ensureRegistered(spark)
    val v = vectors.select(col("vec_id"), col("embedding"))
    var cents = v.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("c_id"), col("embedding").as("c_emb"))
      .localCheckpoint(eager = true)
    val observed = Seq.newBuilder[Double]
    for (_ <- 1 to iters) {
      val obs = org.apache.spark.sql.Observation()
      val a = assign(v, cents)
        .observe(obs, sum(col("d2")).cast("double").as("sse"))
      // element-wise mean per centroid: explode to (c_id, pos, x), average,
      // fold back into an array<float> in position order. One shuffle keyed
      // on (c_id, pos) — k·dim groups, partial-aggregated map-side.
      cents = a.select(col("c_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("c_id"), col("pos"))
        .agg(avg(col("x").cast("double")).as("m"))
        .groupBy(col("c_id"))
        .agg(expr(
          "transform(array_sort(collect_list(struct(pos, m))), s -> CAST(s.m AS FLOAT))")
          .as("c_emb"))
        .localCheckpoint(eager = true)   // truncate per-iteration lineage
      observed += obs.get("sse").asInstanceOf[Double]
    }
    val finalSse = assign(v, cents).agg(sum(col("d2")).cast("double"))
      .collect()(0).getDouble(0)
    // observed = SSE of the centroids entering each iteration: init, then
    // after update 1, …, after update iters-1. Drop the init reading and
    // append the final update's dedicated measurement → exactly the
    // after-each-update series the previous two-jobs-per-iteration
    // implementation produced.
    (cents, observed.result().drop(1) :+ finalSse)
  }

  /** IVF search: rank centroids by distance to the anchor, exhaustively
    * search the `nprobe` closest clusters for the cosine top-k. At
    * nprobe = k this degenerates to brute force (the spec's exactness
    * anchor); small nprobe is the 100 TB operating point — a scan of
    * ~nprobe/k of the corpus.
    */
  def probe(spark: SparkSession, vectors: DataFrame, centroids: DataFrame,
      anchorId: Long, nprobe: Int, topk: Int): DataFrame = {
    graft.functions.VectorKernels.ensureRegistered(spark)
    val v = vectors.select(col("vec_id"), col("embedding"))
    val anchor = v.filter(col("vec_id") === anchorId)
      .select(col("embedding").as("a_emb"))
    val probed = anchor.crossJoin(broadcast(centroids))
      .withColumn("d2",
        expr(dotE("a_emb", "a_emb")) + expr(dotE("c_emb", "c_emb"))
          - lit(2.0) * expr(dotE("a_emb", "c_emb")))
      .orderBy(col("d2").asc, col("c_id").asc)
      .limit(nprobe)
      .select(col("c_id"))
    assign(v, centroids)
      .join(broadcast(probed), Seq("c_id"))
      .filter(col("vec_id") =!= anchorId)
      .crossJoin(broadcast(anchor))
      .withColumn("cosine", expr(s"graft_vec_cosine(embedding, a_emb)"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(topk)
      .select(col("vec_id"), col("cosine"))
  }

  /** Brute-force cosine top-k (the recall ground truth). */
  def bruteForce(spark: SparkSession, vectors: DataFrame, anchorId: Long,
      topk: Int): DataFrame = {
    graft.functions.VectorKernels.ensureRegistered(spark)
    val v = vectors.select(col("vec_id"), col("embedding"))
    val anchor = v.filter(col("vec_id") === anchorId)
      .select(col("embedding").as("a_emb"))
    v.filter(col("vec_id") =!= anchorId)
      .crossJoin(broadcast(anchor))
      .withColumn("cosine", expr(s"graft_vec_cosine(embedding, a_emb)"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(topk)
      .select(col("vec_id"), col("cosine"))
  }
}
