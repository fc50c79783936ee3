package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Deterministic content-hash sampling — the training-data mixing
  * primitive. `TABLESAMPLE`/`df.sample` are nondeterministic (seed ×
  * partitioning), useless for reproducible corpus construction; hashing
  * the content into [0,1) and thresholding gives a sample that is (a)
  * stable across runs, engines, and partition counts, (b) consistent —
  * raising the rate strictly grows the sample, (c) join-free. Grounding:
  * NS training-data pipeline (corpus mixing); SURVEY §7.3.5's ban on
  * nondeterministic operators in declared queries.
  *
  * Scale: a narrow per-row filter on a hash prefix — no shuffle, no
  * state, applies identically to 500 docs or 10¹⁰.
  */
object Sampling {

  /** Uniform draw in [0, 65536): first 16 md5 bits of the content, via
    * the native `graft_hash_bucket` kernel — bit-identical to the
    * portable `CAST(conv(substring(md5(text),1,4),16,10) AS INT)` the
    * oracles keep (KernelParitySpec proves the equality), without the
    * per-row hex-string round-trip.
    */
  private val bucketE = "graft_hash_bucket(text)"

  private def registered(s: SparkSession): SparkSession = {
    graft.functions.VectorKernels.ensureRegistered(s); s
  }

  /** ~25% deterministic sample of documents (hash bucket < 16384/65536),
    * summarized per lang for a compact oracle check.
    */
  private def sampleHash(s: SparkSession, d: String): DataFrame =
    documents(registered(s), d)
      .filter(expr(bucketE) < 16384)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_ids"))
      .orderBy(col("lang"))

  /** Per-language mixing quota: en down-sampled to ~25%, everything else
    * kept at ~75% — the "re-balance the dominant language" shape of
    * corpus mixing, still fully deterministic.
    */
  private def sampleMix(s: SparkSession, d: String): DataFrame =
    documents(registered(s), d)
      .filter(expr(
        s"CASE WHEN lang = 'en' THEN $bucketE < 16384 ELSE $bucketE < 49152 END"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_ids"))
      .orderBy(col("lang"))

  /** Hash bucket over the order key — same md5-prefix construction as
    * `bucketE`, keyed on the stable primary key so the draw is a pure
    * function of the row's identity.
    */
  private val keyBucketE = "graft_hash_bucket(CAST(o_orderkey AS STRING))"

  /** Probability-proportional-to-size sampling: an order is kept with
    * probability `o_totalprice / max(o_totalprice)` — the importance-
    * sampling shape (weight big examples in, keep a trace of the tail)
    * — but fully deterministic: the uniform draw is the key's hash
    * bucket. The acceptance test multiplies instead of dividing
    * (`bucket · wmax < 65536 · price`): one IEEE multiply per side,
    * bit-identical in any engine, no float-division boundary. The
    * one-row max broadcasts; the filter stays a narrow map over the
    * fact table.
    */
  private def sampleWeighted(s: SparkSession, d: String): DataFrame = {
    val o = orders(registered(s), d)
    val wmax = o.agg(max(col("o_totalprice")).as("wmax"))
    o.join(broadcast(wmax),
        expr(keyBucketE).cast("double") * col("wmax") <
          lit(65536.0) * col("o_totalprice"), "inner")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), sum(col("o_orderkey")).as("sum_keys"))
      .orderBy(col("o_orderpriority"))
  }

  /** Rebalance the corpus to a TARGET language mix (per-mille targets:
    * en 400, others 150) — the "make the training mix match the recipe"
    * step. The largest achievable output keeps 100% of the BINDING
    * language (min nₛ/pₛ) and down-samples every other to rate
    * pₛ·n_b/(p_b·nₛ). All arithmetic is integer: the binding language is
    * argmin of `n·10⁶ div p` (lang tie-break), and acceptance is the
    * cross-multiplied `bucket·p_b·nₛ < 65536·pₛ·n_b` — products peak
    * ~6.5e16 at 10⁹ docs/lang, inside BIGINT. Shape: 5-row stats +
    * 1-row binding constraint broadcast onto an unshuffled corpus
    * filter, then a small rollup. Fully deterministic at every SF and
    * partitioning.
    */
  private def sampleTargetMix(s: SparkSession, d: String): DataFrame = {
    val targets = Seq(("en", 400L), ("de", 150L), ("es", 150L),
      ("fr", 150L), ("zh", 150L))
    val t = s.createDataFrame(targets).toDF("lang", "p")
    val stats = documents(s, d).groupBy(col("lang"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(t), Seq("lang"))
    val binding = stats
      .select(col("n").as("nb"), col("p").as("pb"),
        expr("n * 1000000L div p").as("q"), col("lang").as("bl"))
      .orderBy(col("q"), col("bl"))
      .limit(1)
      .select(col("nb"), col("pb"))
    documents(registered(s), d)
      .join(broadcast(stats), Seq("lang"))
      .crossJoin(broadcast(binding))
      .filter(expr(bucketE).cast("bigint") * col("pb") * col("n") <
        lit(65536L) * col("p") * col("nb"))
      .groupBy(col("lang"))
      .agg(max(col("n")).as("n_docs"), count(lit(1)).as("n_kept"),
        sum(col("doc_id")).as("sum_ids"))
      .orderBy(col("lang"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sample_hash"       -> sampleHash _,
    "q_sample_mix"        -> sampleMix _,
    "q_sample_weighted"   -> sampleWeighted _,
    "q_sample_target_mix" -> sampleTargetMix _,
  )

  private val bucketSql =
    "CAST(('0x' || substring(md5(text), 1, 4))::INT AS INT)"

  val oracle: Map[String, String] = Map(
    "q_sample_hash" ->
      s"""SELECT lang, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_ids
         |FROM documents WHERE $bucketSql < 16384
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_sample_mix" ->
      s"""SELECT lang, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_ids
         |FROM documents
         |WHERE CASE WHEN lang = 'en' THEN $bucketSql < 16384
         |           ELSE $bucketSql < 49152 END
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_sample_weighted" ->
      """WITH w AS (SELECT max(o_totalprice) AS wmax FROM orders)
        |SELECT o_orderpriority, count(*) AS n_orders,
        |       CAST(sum(o_orderkey) AS BIGINT) AS sum_keys
        |FROM orders, w
        |WHERE CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::INT
        |           AS DOUBLE) * wmax < 65536.0 * o_totalprice
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_sample_target_mix" ->
      s"""WITH t(lang, p) AS (VALUES ('en', 400), ('de', 150), ('es', 150),
         |                           ('fr', 150), ('zh', 150)),
         |st AS (
         |  SELECT d.lang, count(*) AS n, max(p) AS p
         |  FROM documents d JOIN t ON d.lang = t.lang GROUP BY d.lang),
         |b AS (
         |  SELECT n AS nb, p AS pb FROM st
         |  ORDER BY (n * 1000000) // p, lang LIMIT 1)
         |SELECT d.lang, max(st.n) AS n_docs, count(*) AS n_kept,
         |       CAST(sum(doc_id) AS BIGINT) AS sum_ids
         |FROM documents d JOIN st ON d.lang = st.lang, b
         |WHERE CAST($bucketSql AS BIGINT) * pb * n < 65536 * p * nb
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
  )
}
