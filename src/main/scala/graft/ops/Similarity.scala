package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** SURVEY §2.2-K / north-star — vector similarity over `embeddings`
  * (`Array[Float]`, dim 64). All math runs through the native codegen
  * kernels in graft.functions.VectorKernels (custom Catalyst
  * `Expression`s with `doGenCode`) — no UDF, no driver-side collect.
  *
  * Scale design (100 TB): brute-force top-k (`q_sim_topk`) broadcasts the
  * anchor and is a single narrow map + TakeOrderedAndProject — linear,
  * shuffle-free, the right baseline. The IVF variant (`q_ann_ivf`) is the
  * scale path: a tiny broadcast centroid table partitions the corpus into
  * clusters (one narrow map + rank), and the search probes only the
  * anchor's cluster — at 1000 executors that's a pruned scan of ~1/k of
  * the data instead of all of it. The pairwise query
  * (`q_dedup_embed_cosine`) is bounded (vec_id<100) — its production
  * shape is LSH/IVF bucketing first, exact cosine only within buckets.
  */
object Similarity {

  /** dot/cosine via the native codegen kernels (graft.functions.
    * VectorKernels) — bit-identical to the portable
    * `aggregate(zip_with(…))` fold (sequential DOUBLE accumulation in
    * index order, so the DuckDB positional-sum oracle still hash-matches)
    * but compiled to a tight loop inside whole-stage codegen.
    */
  private def dotE(a: String, b: String): String = s"graft_vec_dot($a, $b)"
  private def cosE(a: String, b: String): String = s"graft_vec_cosine($a, $b)"

  /** Per-vector dot+cosine vs the anchor (vec_id=0), anchor broadcast. */
  private def simBase(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorKernels.ensureRegistered(s)
    val e = embeddings(s, d)
    val anchor = e.filter(col("vec_id") === 0).select(col("embedding").as("a_emb"))
    e.crossJoin(broadcast(anchor))
      .withColumn("dot", expr(dotE("embedding", "a_emb")))
      .withColumn("cos_raw", expr(cosE("embedding", "a_emb")))
  }

  /** Dot product + cosine of every vector vs anchor vec_id=0. */
  private def simDot(s: SparkSession, d: String): DataFrame =
    simBase(s, d)
      .select(col("vec_id"), round(col("dot"), 4).as("dot"),
        round(col("cos_raw"), 4).as("cosine"))
      .orderBy(col("vec_id"))

  /** Brute-force cosine top-10 vs anchor (rounded sim, vec_id tie-break) —
    * plans as a broadcast + TakeOrderedAndProject: no shuffle.
    */
  private def simTopk(s: SparkSession, d: String): DataFrame =
    simBase(s, d)
      .filter(col("vec_id") =!= 0)
      .withColumn("cosine", round(col("cos_raw"), 4))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), col("cosine"))

  /** Embedding-cosine near-dup: all pairs among vec_id<100 with
    * cosine ≥ 0.30 (bounded pairwise; production shape = bucket first).
    */
  private def embedCosinePairs(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorKernels.ensureRegistered(s)
    val e = embeddings(s, d).filter(col("vec_id") < 100)
      .select(col("vec_id"), col("embedding"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos_raw", expr(cosE("a.embedding", "b.embedding")))
      .filter(col("cos_raw") >= 0.30)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(col("cos_raw"), 4).as("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** IVF-style ANN: centroids = vectors 0..7 (broadcast); every vector is
    * assigned to its max-cosine centroid (tie → min centroid id); the
    * anchor's cluster is then searched exhaustively for the top-10.
    */
  private def annIvf(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorKernels.ensureRegistered(s)
    val e = embeddings(s, d)
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    // assignments feed both the anchor-cluster probe and the join — scoped
    // cache, released once the probe result is materialized
    Caching.withCached(
      e.crossJoin(broadcast(cents))
        .withColumn("cos_vc", expr(cosE("embedding", "c_emb")))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("vec_id")).orderBy(col("cos_vc").desc, col("c_id").asc)))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("c_id"))) { assign =>
      val anchorCluster = assign.filter(col("vec_id") === 0)
        .select(col("c_id").as("anchor_c"))
      val anchor = e.filter(col("vec_id") === 0).select(col("embedding").as("a_emb"))
      assign
        .join(broadcast(anchorCluster), col("c_id") === col("anchor_c"))
        .filter(col("vec_id") =!= 0)
        .join(e, Seq("vec_id"))
        .crossJoin(broadcast(anchor))
        .withColumn("cosine", round(expr(cosE("embedding", "a_emb")), 4))
        .orderBy(col("cosine").desc, col("vec_id").asc)
        .limit(10)
        .select(col("vec_id"), col("cosine"))
    }
  }

  /** kNN label vote: majority label among the top-20 most-similar vectors
    * for each anchor vec_id ∈ {0..4} (tie → min label). The ranking key is
    * the 4dp-ROUNDED cosine (ties broken by vec_id): the native kernel and
    * the oracle's positional double sum are bit-identical, so after
    * rounding the rank order — and therefore the k-boundary cut — is the
    * same in both engines, making the key hash-checkable (round-1 had it
    * unit-test-only out of float-rank caution).
    */
  private def labelKnn(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorKernels.ensureRegistered(s)
    val e = embeddings(s, d)
    val anchors = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("anchor_id"), col("embedding").as("a_emb"))
    val scored = e.crossJoin(broadcast(anchors))
      .filter(col("vec_id") =!= col("anchor_id"))
      .withColumn("cos", round(expr(cosE("embedding", "a_emb")), 4))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("anchor_id")).orderBy(col("cos").desc, col("vec_id").asc)))
      .filter(col("rn") <= 20)
    scored.groupBy(col("anchor_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("anchor_id")).orderBy(col("votes").desc, col("label").asc)))
      .filter(col("rk") === 1)
      .select(col("anchor_id"), col("label").as("pred_label"), col("votes"))
      .orderBy(col("anchor_id"))
  }

  /** Int8 scalar quantization of embeddings (per-vector max-abs scale):
    * the vector-compression step a 100 TB embedding store runs before
    * ANN — 4× smaller than float32, dot products stay integer until the
    * final rescale. All computed with array higher-order functions (no
    * explode, no shuffle): one narrow codegen'd map per vector.
    */
  /** Shared int8 quantization pipeline (max-abs scale): mx, the
    * zero-vector-guarded divisor mxs, and the quantized array under
    * `outCol`. ONE definition so `q_embed_quantize` (the proven-exact
    * oracle key) and `q_ann_lsh` (whose integer-exactness argument rests
    * on this exact map) cannot drift apart.
    */
  private def withQuantized(df: DataFrame, outCol: String): DataFrame =
    df.withColumn("mx",
        expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"))
      // an all-zero vector has mx=0 → x/mx would be NaN (Spark tolerates,
      // DuckDB errors casting to BIGINT): divide by 1 instead, every
      // quantized value is then exactly 0
      .withColumn("mxs", expr("CASE WHEN mx = 0.0 THEN 1.0 ELSE mx END"))
      .withColumn(outCol,
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) / mxs * 127) AS BIGINT))"))

  /** Embedding-store QA: L2-norm distribution histogram (unit-bucket
    * counts + per-bucket min/max). Degenerate norms (zeros, magnitude
    * outliers) are how broken encoder runs surface in a 10¹⁰-vector
    * store; one narrow kernel map + a small keyed agg audits it in a
    * single pass. norm = sqrt(dot(e,e)) through the codegen kernel —
    * bit-identical to the oracle's positional fold, sqrt correctly
    * rounded in both engines.
    */
  private def embedNorms(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorKernels.ensureRegistered(s)
    embeddings(s, d)
      .withColumn("norm", expr(s"sqrt(${dotE("embedding", "embedding")})"))
      .groupBy(floor(col("norm")).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n_vecs"),
        round(min(col("norm")), 4).as("min_norm"),
        round(max(col("norm")), 4).as("max_norm"))
      .orderBy(col("bucket"))
  }

  private def embedQuantize(s: SparkSession, d: String): DataFrame = {
    // graft_vec_quant_stats fuses the five interpreted HOF passes the
    // portable form ran per row (abs-transform + array_max, quantizing
    // transform, aggregate fold, array_min, array_max) into one compiled
    // kernel; round(mx, 6) stays outside so `scale` runs through Spark's
    // own Round. Values pinned by OptimizedRewriteSpec (corpus +
    // degenerate vectors); q_ann_lsh keeps the withQuantized map.
    graft.functions.VectorKernels.ensureRegistered(s)
    embeddings(s, d)
      .withColumn("sc", expr("graft_vec_quant_stats(embedding)"))
      .select(
        col("vec_id"),
        round(col("sc.mx"), 6).as("scale"),
        col("sc.q_sum").as("q_sum"),
        col("sc.q_min").as("q_min"),
        col("sc.q_max").as("q_max"))
      .orderBy(col("vec_id"))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Deterministic ±1 hyperplane weights: sign from the first md5 nibble
    * of "j_i" — reproducible in any engine, no RNG state to ship. The
    * oracle recomputes the same values inline.
    */
  private val lshW: Seq[Seq[Int]] =
    Seq.tabulate(4, 64)((j, i) => if (md5Hex(s"${j}_${i}").charAt(0) < '8') 1 else -1)

  /** LSH-bucketed ANN (the second scale path next to IVF): 4-bit
    * random-hyperplane signature per vector, computed over the INT8-
    * QUANTIZED embedding (q_embed_quantize's proven-exact integer map) so
    * every sign bit is an integer-sum comparison — exact in any engine,
    * no float-boundary flips. Probing is multi-probe: the anchor's bucket
    * plus its 4 Hamming-1 neighbors (5/16 of the corpus), exact cosine
    * only within the candidates.
    *
    * Scale: signature assignment is a narrow per-row map — NO shuffle,
    * no training, no centroid state (the advantage over IVF); the probe
    * is a broadcast-filtered scan + TakeOrderedAndProject. At 10¹⁰
    * vectors with more bits (e.g. 16, banded) the same plan prunes
    * 1-in-thousands instead of 5-in-16.
    */
  private[graft] def lshSignatures(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorKernels.ensureRegistered(s)
    var q = withQuantized(embeddings(s, d), "qv")
    for (j <- 0 until 4) {
      q = q.withColumn(s"w$j", typedlit(lshW(j)))
        .withColumn(s"b$j", when(expr(
          s"aggregate(zip_with(qv, w$j, (a, b) -> a * CAST(b AS BIGINT)), " +
            "CAST(0 AS BIGINT), (acc, x) -> acc + x)") >= 0, 1).otherwise(0))
    }
    q.withColumn("sig", expr("b0 + 2*b1 + 4*b2 + 8*b3"))
      .select(col("vec_id"), col("embedding"), col("sig"))
  }

  private[graft] def lshProbe(sg: DataFrame): DataFrame = {
    val anchor = sg.filter(col("vec_id") === 0)
      .select(col("sig").as("a_sig"), col("embedding").as("a_emb"))
    sg.crossJoin(broadcast(anchor))
      .filter(col("vec_id") =!= 0)
      .filter(expr("sig = a_sig OR sig = (a_sig ^ 1) OR sig = (a_sig ^ 2)" +
        " OR sig = (a_sig ^ 4) OR sig = (a_sig ^ 8)"))
      .withColumn("cosine", round(expr(cosE("embedding", "a_emb")), 4))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), col("sig"), col("cosine"))
  }

  private def annLsh(s: SparkSession, d: String): DataFrame =
    // signatures feed both the anchor lookup and the candidate filter —
    // scoped cache, released after the probe materializes
    Caching.withCached(lshSignatures(s, d))(lshProbe)

  /** Random-projection dimensionality reduction: 64-dim embeddings →
    * 8 signed-sum components, signs derived from a deterministic integer
    * formula of (dim, component) so both engines build the SAME
    * projection matrix from nothing. The pre-index compression step of
    * an ANN pipeline (Johnson–Lindenstrauss shape). Long output
    * (vec_id, j, p) keeps the oracle compare scalar. Narrow per-row map
    * — 8×64 multiply-adds per row, no shuffle at any scale.
    */
  /** Portable HOF formulation of one projection component — the semantics
    * spec the native kernel must match (OptimizedRewriteSpec asserts
    * row-for-row equality).
    */
  private[graft] val embedProjectPortableE =
    """aggregate(
      |  zip_with(embedding, sequence(0, size(embedding)-1),
      |    (v, i) -> CAST(v AS DOUBLE) *
      |              CAST(((i*31 + j*17) % 2)*2 - 1 AS DOUBLE)),
      |  CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)""".stripMargin

  private def embedProject(s: SparkSession, d: String): DataFrame = {
    // all 8 components in ONE compiled pass over the vector (the portable
    // form runs 8 interpreted HOF folds per row — see ProjectKernel); the
    // posexplode then duplicates 8 doubles downstream, never the 64-float
    // embedding. Values bit-identical (OptimizedRewriteSpec).
    graft.functions.VectorKernels.ensureRegistered(s)
    embeddings(s, d)
      .select(col("vec_id"),
        posexplode(expr("graft_vec_project(embedding, 8)")).as(Seq("j", "p_raw")))
      .select(col("vec_id"), col("j"), round(col("p_raw"), 4).as("p"))
      .orderBy("vec_id", "j")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_project"     -> embedProject _,
    "q_sim_dot"           -> simDot _,
    "q_sim_topk"          -> simTopk _,
    "q_dedup_embed_cosine" -> embedCosinePairs _,
    "q_ann_ivf"           -> annIvf _,
    "q_ann_lsh"           -> annLsh _,
    "q_label_knn"         -> labelKnn _,
    "q_embed_quantize"    -> embedQuantize _,
    "q_embed_norms"       -> embedNorms _,
  )

  /** Positional-sum oracle fragments: i runs 1..64 in order, products and
    * accumulation all in DOUBLE — mirrors the Spark fold exactly.
    */
  val oracle: Map[String, String] = Map(
    "q_embed_project" ->
      """SELECT vec_id, CAST(j AS INT) AS j,
        |  round(sum(CAST(embedding[i] AS DOUBLE)
        |            * ((((i-1)*31 + j*17) % 2)*2 - 1)), 4) AS p
        |FROM embeddings, UNNEST(range(1, 65)) AS u(i), UNNEST(range(0, 8)) AS w(j)
        |GROUP BY vec_id, j ORDER BY vec_id, j""".stripMargin,
    "q_embed_quantize" ->
      """WITH m AS (
        |  SELECT vec_id AS mid, max(abs(CAST(embedding[i] AS DOUBLE))) AS mx
        |  FROM embeddings, UNNEST(range(1, 65)) AS u(i) GROUP BY vec_id),
        |q AS (
        |  SELECT e.vec_id, m.mx,
        |    CAST(round(CAST(e.embedding[i] AS DOUBLE)
        |      / (CASE WHEN m.mx = 0 THEN 1.0 ELSE m.mx END) * 127) AS BIGINT) AS qi
        |  FROM embeddings e JOIN m ON e.vec_id = m.mid, UNNEST(range(1, 65)) AS u(i))
        |SELECT vec_id, round(mx, 6) AS scale, CAST(sum(qi) AS BIGINT) AS q_sum,
        |  min(qi) AS q_min, max(qi) AS q_max
        |FROM q GROUP BY vec_id, mx ORDER BY vec_id""".stripMargin,
    "q_embed_norms" ->
      """WITH n AS (
        |  SELECT vec_id,
        |    sqrt(sum(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) AS norm
        |  FROM embeddings, UNNEST(range(1, 65)) AS u(i)
        |  GROUP BY vec_id)
        |SELECT CAST(floor(norm) AS INT) AS bucket, count(*) AS n_vecs,
        |  round(min(norm), 4) AS min_norm, round(max(norm), 4) AS max_norm
        |FROM n GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_label_knn" ->
      """WITH a AS (
        |  SELECT vec_id AS anchor_id, embedding AS a_emb
        |  FROM embeddings WHERE vec_id < 5),
        |s AS (
        |  SELECT a.anchor_id, v.vec_id, max(v.label) AS label,
        |    round(sum(CAST(v.embedding[i] AS DOUBLE) * CAST(a.a_emb[i] AS DOUBLE))
        |      / (sqrt(sum(CAST(v.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)))
        |         * sqrt(sum(CAST(a.a_emb[i] AS DOUBLE) * CAST(a.a_emb[i] AS DOUBLE)))), 4) AS cos
        |  FROM embeddings v, a, UNNEST(range(1, 65)) AS u(i)
        |  WHERE v.vec_id <> a.anchor_id
        |  GROUP BY a.anchor_id, v.vec_id),
        |top AS (
        |  SELECT anchor_id, label FROM (
        |    SELECT anchor_id, label,
        |      row_number() OVER (PARTITION BY anchor_id ORDER BY cos DESC, vec_id ASC) AS rn
        |    FROM s) WHERE rn <= 20),
        |vt AS (
        |  SELECT anchor_id, label, count(*) AS votes FROM top GROUP BY 1, 2)
        |SELECT anchor_id, label AS pred_label, votes FROM (
        |  SELECT anchor_id, label, votes,
        |    row_number() OVER (PARTITION BY anchor_id ORDER BY votes DESC, label ASC) AS rk
        |  FROM vt) WHERE rk = 1 ORDER BY anchor_id""".stripMargin,
    "q_sim_dot" ->
      """WITH a AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
        |s AS (
        |  SELECT v.vec_id,
        |    sum(CAST(v.embedding[i] AS DOUBLE) * CAST(a.e[i] AS DOUBLE)) AS dot,
        |    sum(CAST(v.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)) AS ne,
        |    sum(CAST(a.e[i] AS DOUBLE) * CAST(a.e[i] AS DOUBLE)) AS na
        |  FROM embeddings v, a, UNNEST(range(1, 65)) AS u(i)
        |  GROUP BY v.vec_id)
        |SELECT vec_id, round(dot, 4) AS dot,
        |  round(dot/(sqrt(ne)*sqrt(na)), 4) AS cosine
        |FROM s ORDER BY vec_id""".stripMargin,
    "q_sim_topk" ->
      """WITH a AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
        |s AS (
        |  SELECT v.vec_id,
        |    sum(CAST(v.embedding[i] AS DOUBLE) * CAST(a.e[i] AS DOUBLE)) AS dot,
        |    sum(CAST(v.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)) AS ne,
        |    sum(CAST(a.e[i] AS DOUBLE) * CAST(a.e[i] AS DOUBLE)) AS na
        |  FROM embeddings v, a, UNNEST(range(1, 65)) AS u(i)
        |  WHERE v.vec_id <> 0 GROUP BY v.vec_id)
        |SELECT vec_id, round(dot/(sqrt(ne)*sqrt(na)), 4) AS cosine
        |FROM s ORDER BY cosine DESC, vec_id ASC LIMIT 10""".stripMargin,
    "q_dedup_embed_cosine" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100),
        |p AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    sum(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)) AS dot,
        |    sum(CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)) AS nsa,
        |    sum(CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)) AS nsb
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id, UNNEST(range(1, 65)) AS u(i)
        |  GROUP BY 1, 2)
        |SELECT vec_a, vec_b, round(dot/(sqrt(nsa)*sqrt(nsb)), 4) AS cosine
        |FROM p WHERE dot/(sqrt(nsa)*sqrt(nsb)) >= 0.30
        |ORDER BY vec_a, vec_b""".stripMargin,
    "q_ann_lsh" ->
      """WITH m AS (
        |  SELECT vec_id AS mid, max(abs(CAST(embedding[i] AS DOUBLE))) AS mx
        |  FROM embeddings, UNNEST(range(1, 65)) AS u(i) GROUP BY vec_id),
        |q AS (
        |  SELECT e.vec_id, i,
        |    CAST(round(CAST(e.embedding[i] AS DOUBLE)
        |      / (CASE WHEN m.mx = 0 THEN 1.0 ELSE m.mx END) * 127) AS BIGINT) AS qi
        |  FROM embeddings e JOIN m ON e.vec_id = m.mid, UNNEST(range(1, 65)) AS u(i)),
        |bits AS (
        |  SELECT vec_id, j,
        |    CASE WHEN sum(CASE WHEN substring(md5(concat(j, '_', i - 1)), 1, 1) < '8'
        |                       THEN qi ELSE -qi END) >= 0 THEN 1 ELSE 0 END AS bit
        |  FROM q, UNNEST(range(0, 4)) AS v(j)
        |  GROUP BY vec_id, j),
        |sg AS (
        |  SELECT vec_id, CAST(sum(bit * (1 << j)) AS INT) AS sig FROM bits GROUP BY vec_id),
        |asig AS (SELECT sig AS a_sig FROM sg WHERE vec_id = 0),
        |a AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
        |cand AS (
        |  SELECT s.vec_id, s.sig FROM sg s, asig
        |  WHERE s.vec_id <> 0 AND (s.sig = a_sig OR s.sig = xor(a_sig, 1)
        |    OR s.sig = xor(a_sig, 2) OR s.sig = xor(a_sig, 4) OR s.sig = xor(a_sig, 8))),
        |sc AS (
        |  SELECT v.vec_id, cand.sig,
        |    sum(CAST(v.embedding[i] AS DOUBLE) * CAST(a.e[i] AS DOUBLE)) AS dot,
        |    sum(CAST(v.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)) AS ne,
        |    sum(CAST(a.e[i] AS DOUBLE) * CAST(a.e[i] AS DOUBLE)) AS na
        |  FROM embeddings v JOIN cand ON v.vec_id = cand.vec_id, a, UNNEST(range(1, 65)) AS u(i)
        |  GROUP BY v.vec_id, cand.sig)
        |SELECT vec_id, sig, round(dot/(sqrt(ne)*sqrt(na)), 4) AS cosine
        |FROM sc ORDER BY cosine DESC, vec_id ASC LIMIT 10""".stripMargin,
    "q_ann_ivf" ->
      """WITH c AS (SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings WHERE vec_id < 8),
        |vc AS (
        |  SELECT v.vec_id, c.c_id,
        |    sum(CAST(v.embedding[i] AS DOUBLE) * CAST(c.c_emb[i] AS DOUBLE))
        |      / (sqrt(sum(CAST(v.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)))
        |         * sqrt(sum(CAST(c.c_emb[i] AS DOUBLE) * CAST(c.c_emb[i] AS DOUBLE)))) AS cos_vc
        |  FROM embeddings v, c, UNNEST(range(1, 65)) AS u(i)
        |  GROUP BY v.vec_id, c.c_id),
        |assign AS (
        |  SELECT vec_id, c_id FROM (
        |    SELECT vec_id, c_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY cos_vc DESC, c_id ASC) AS rn
        |    FROM vc) WHERE rn = 1),
        |a AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
        |cl AS (SELECT c_id FROM assign WHERE vec_id = 0),
        |s AS (
        |  SELECT v.vec_id,
        |    sum(CAST(v.embedding[i] AS DOUBLE) * CAST(a.e[i] AS DOUBLE)) AS dot,
        |    sum(CAST(v.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)) AS ne,
        |    sum(CAST(a.e[i] AS DOUBLE) * CAST(a.e[i] AS DOUBLE)) AS na
        |  FROM embeddings v
        |    JOIN assign ON v.vec_id = assign.vec_id
        |    JOIN cl ON assign.c_id = cl.c_id, a, UNNEST(range(1, 65)) AS u(i)
        |  WHERE v.vec_id <> 0 GROUP BY v.vec_id)
        |SELECT vec_id, round(dot/(sqrt(ne)*sqrt(na)), 4) AS cosine
        |FROM s ORDER BY cosine DESC, vec_id ASC LIMIT 10""".stripMargin,
  )
}
