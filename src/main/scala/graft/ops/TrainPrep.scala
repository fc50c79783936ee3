package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** SURVEY §2.2-K — corpus-preparation operators a training-data pipeline
  * runs between "raw crawl" and "tokenized batches" (north-star scope;
  * grounding: the reference's data-asset plane registers exactly these
  * corpus tables, lambda/aws-dl-fmwrk-data-asset-api/lambda_function.py:
  * 56-130).
  *
  * Scale notes (100 TB):
  *  - incremental dedup is ONE anti-join keyed on the content digest —
  *    the daily-crawl-vs-corpus shape; the corpus side is a digest-only
  *    projection (32 bytes/doc), so a 10⁹-doc corpus is ~30 GB of keys,
  *    shuffled once, or bucketed on `h` to make every nightly run
  *    exchange-free (see `q_join_bucketed` for the layout mechanics).
  *  - stratified sampling is a per-group rank over a hash ordering —
  *    one shuffle on the group key; Spark's WindowGroupLimit pushes the
  *    rank≤k filter below the sort so only k rows per group survive the
  *    exchange.
  *  - tf-idf is two hash aggregations over the exploded token stream
  *    (map-side partial combine collapses each partition's token runs
  *    before the shuffle) + a broadcast of the tiny per-lang doc counts.
  *  - chunking and packing are narrow per-row maps; packing adds one
  *    windowed prefix-sum per source — the same partitioned-cumsum shape
  *    as `q_win_running`, no global window anywhere.
  */
object TrainPrep {

  /** Incremental corpus dedup: the "new batch vs existing corpus" shape.
    * Corpus = doc_id % 5 != 0, incoming batch = doc_id % 5 == 0 (a
    * scale-independent 80/20 split of the same table). Keep batch docs
    * whose md5(text) digest is unseen in the corpus, deduping within the
    * batch by the same min-doc_id survivor rule as `q_doc_dedup_exact`.
    */
  private def dedupIncremental(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).withColumn("h", md5(col("text")))
    val corpus = docs.filter(col("doc_id") % 5 =!= 0).select(col("h"))
    docs.filter(col("doc_id") % 5 === 0)
      .join(corpus, Seq("h"), "left_anti")
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("h"))
      .orderBy(col("doc_id"))
  }

  /** Stratified sample: k=20 docs per language, chosen by md5(doc_id)
    * rank — deterministic across runs/engines/partitionings (same
    * rationale as Sampling.scala's hash gates), and exactly k per
    * stratum, which a threshold sample cannot guarantee.
    */
  private def sampleStratified(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .filter(col("rk") <= 20)
      .select(col("doc_id"), col("lang"), col("rk"))
      .orderBy(col("lang"), col("rk"))

  /** Top-5 terms per language by tf-idf with a LINEAR idf (tf · N/df):
    * every arithmetic step (int→double cast, one multiply, one divide)
    * is IEEE-exact-or-correctly-rounded and association-identical in
    * both engines, so ranking doubles are bit-identical — the ln() form
    * is a one-line substitution but can half-ulp-tie across libm
    * implementations (SURVEY §7.3.3 discipline).
    */
  private def tfidfTerms(s: SparkSession, d: String): DataFrame = {
    import TextExprs.toksE
    val docs = documents(s, d)
    val toks = docs.select(col("doc_id"), col("lang"), explode(expr(toksE)).as("term"))
    val stats = toks.groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
    val nDocs = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs_lang"))
    stats.join(broadcast(nDocs), Seq("lang"))
      .withColumn("score_raw",
        col("tf").cast("double") * col("n_docs_lang") / col("df"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang"))
          .orderBy(col("score_raw").desc, col("term"))))
      .filter(col("rk") <= 5)
      .select(col("lang"), col("term"), col("tf"), col("df"),
        round(col("score_raw"), 4).as("tfidf"), col("rk"))
      .orderBy(col("lang"), col("rk"))
  }

  /** Fixed-window chunking with overlap (chunk 100 chars, stride 80) —
    * the context-window splitter. Exploding the OFFSET list (not the
    * chunk list) keeps the pre-explode row narrow; the chunk index is
    * offset arithmetic. Output is digests, not text, so the result of a
    * 100 TB run is fingerprint-sized.
    */
  private def docChunk(s: SparkSession, d: String): DataFrame = {
    // Round-18: the portable form computed substring(text, o, 100) TWICE
    // per chunk (length + md5), and every substring call re-steps the
    // string's chars from position 0 — O(n²/stride) per doc.
    // graft_chunk_md5 hashes all chunks (incl. the short tail) in one
    // pass with the char offsets indexed once; chunk_ix falls out of
    // posexplode, and chunk_len is offset arithmetic on the pre-explode
    // length instead of a third substring walk. Row-for-row parity
    // pinned by OptimizedRewriteSpec; oracle unchanged.
    graft.functions.VectorKernels.ensureRegistered(s)
    documents(s, d)
      .filter(length(col("text")) >= 1)
      .select(col("doc_id"), length(col("text")).as("n"),
        posexplode(expr("graft_chunk_md5(text, 100, 80)")).as(Seq("p", "h")))
      .select(
        col("doc_id"),
        col("p").cast("long").as("chunk_ix"),
        least(lit(100), col("n") - col("p") * 80).cast("int").as("chunk_len"),
        col("h"))
      .orderBy(col("doc_id"), col("chunk_ix"))
  }

  /** Sequence packing, concat-and-cut semantics: per source, documents
    * are laid end-to-end in doc_id order on a token tape cut into
    * 256-token blocks; a doc belongs to the block where it starts
    * (pack = start_offset div 256 — exclusive prefix sum, integer-exact).
    * This is the GPT-style block assignment, expressible as one
    * partitioned window cumsum + narrow arithmetic.
    */
  private def packSequences(s: SparkSession, d: String): DataFrame = {
    import TextExprs.toksE
    documents(s, d)
      .withColumn("n_tok", size(expr(toksE)).cast("long"))
      .withColumn("cum", sum(col("n_tok")).over(
        Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("pack_id", expr("(cum - n_tok) div 256"))
      .groupBy(col("source"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("pack_tokens"))
      .orderBy(col("source"), col("pack_id"))
  }

  /** Train/eval decontamination — the benchmark-leakage check every
    * training pipeline runs before eval: flag eval-split documents
    * (doc_id % 10 = 0) sharing any word 5-gram with the train split,
    * reporting how many of the doc's distinct 5-grams are contaminated.
    *
    * Scale: explode + distinct + one equi-join keyed on the n-gram — the
    * same digest-keyed shape as `q_dedup_incremental` (at 100 TB hash the
    * n-gram to a fixed digest and bucket the train set on it so the
    * nightly check is exchange-free on the corpus side).
    */
  private def decontaminate(s: SparkSession, d: String): DataFrame = {
    import TextExprs.toksE
    val ngramsE =
      "array_distinct(transform(sequence(1, size(toks)-4), " +
        "i -> concat_ws(' ', slice(toks, i, 5))))"
    // NOTE (round-17 optimization pass): caching this exploded ngram set
    // so the corpus pipeline runs once was tried and MEASURED WORSE at
    // sf10 (uncached double-compute 157 s vs cached 99/274/391 s across
    // three passes — the corpus-sized deserialized block set thrashes
    // memory exactly as guide §5 warns). The doc_id filters push below
    // the explode to the scan, so each branch tokenizes only its own
    // split — the "double pass" is two cheap scans, not double tokenize.
    //
    // Round-18: a 16-byte md5-digest join key (VERDICT's "digest-keyed
    // equi-join" suggestion) was TRIED and measured BOTH ways: on the old
    // single-row-group fixture (scans serialized to 3 tasks, exchanges
    // relatively dominant) it won 29.4 -> 27.6 s; on the fixed multi-file
    // layout (scans 32-way parallel, like a real table) it LOST
    // 16.1 -> 22.1 s min-of-2 — the per-n-gram md5+unhex (~145 M hashes)
    // costs more than the ~2x narrower exchange saves once the scan side
    // parallelizes. REVERTED to the string join; at true 100 TB the
    // digest becomes right again only when network dominates compute,
    // which is a cluster-shape call, not a local-measurable one.
    val g = documents(s, d)
      .select(col("doc_id"), expr(toksE).as("toks"))
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"), explode(expr(ngramsE)).as("ng"))
    val train = g.filter(col("doc_id") % 10 =!= 0).select(col("ng")).distinct()
    g.filter(col("doc_id") % 10 === 0)
      .join(train, Seq("ng"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_decontaminate"     -> decontaminate _,
    "q_dedup_incremental" -> dedupIncremental _,
    "q_sample_stratified" -> sampleStratified _,
    "q_tfidf_terms"       -> tfidfTerms _,
    "q_doc_chunk"         -> docChunk _,
    "q_pack_sequences"    -> packSequences _,
  )

  val oracle: Map[String, String] = Map(
    "q_decontaminate" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_extract_all(text, '[^ ]+') AS t FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id, ng
        |  FROM d, UNNEST([array_to_string(t[i:i+4], ' ') FOR i IN range(1, len(t)-3)]) AS u(ng)
        |  WHERE len(t) >= 5),
        |tr AS (SELECT DISTINCT ng FROM g WHERE doc_id % 10 <> 0)
        |SELECT g.doc_id, count(*) AS n_contaminated
        |FROM g JOIN tr ON g.ng = tr.ng
        |WHERE g.doc_id % 10 = 0
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    "q_dedup_incremental" ->
      """WITH corpus AS (
        |  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 5 <> 0)
        |SELECT min(doc_id) AS doc_id, md5(text) AS h
        |FROM documents
        |WHERE doc_id % 5 = 0
        |  AND md5(text) NOT IN (SELECT h FROM corpus)
        |GROUP BY md5(text) ORDER BY doc_id""".stripMargin,
    "q_sample_stratified" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rk
        |  FROM documents)
        |SELECT doc_id, lang, rk FROM r WHERE rk <= 20 ORDER BY lang, rk""".stripMargin,
    "q_tfidf_terms" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(regexp_extract_all(text, '[^ ]+')) AS term
        |  FROM documents),
        |stats AS (
        |  SELECT lang, term, count(*) AS tf, count(DISTINCT doc_id) AS df
        |  FROM toks GROUP BY lang, term),
        |n AS (SELECT lang, count(*) AS n_docs_lang FROM documents GROUP BY lang),
        |ranked AS (
        |  SELECT s.lang, term, tf, df,
        |    CAST(tf AS DOUBLE) * n_docs_lang / df AS score_raw,
        |    CAST(row_number() OVER (PARTITION BY s.lang
        |      ORDER BY CAST(tf AS DOUBLE) * n_docs_lang / df DESC, term) AS INT) AS rk
        |  FROM stats s JOIN n ON s.lang = n.lang)
        |SELECT lang, term, tf, df, round(score_raw, 4) AS tfidf, rk
        |FROM ranked WHERE rk <= 5 ORDER BY lang, rk""".stripMargin,
    "q_doc_chunk" ->
      """SELECT doc_id,
        |  (o - 1) // 80 AS chunk_ix,
        |  CAST(len(substring(text, o, 100)) AS INT) AS chunk_len,
        |  md5(substring(text, o, 100)) AS h
        |FROM documents, UNNEST(range(1, len(text) + 1, 80)) AS u(o)
        |WHERE len(text) >= 1
        |ORDER BY doc_id, chunk_ix""".stripMargin,
    "q_pack_sequences" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT source, n_tok,
        |    sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT source, CAST((cum - n_tok) // 256 AS BIGINT) AS pack_id,
        |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS pack_tokens
        |FROM c GROUP BY source, pack_id ORDER BY source, pack_id""".stripMargin,
  )
}
