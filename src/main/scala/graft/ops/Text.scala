package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** SURVEY §2.2-K — text analysis over `documents` (north-star
  * LLM-training-data pipeline ops; grounding: the reference's data-asset
  * plane, lambda/aws-dl-fmwrk-data-asset-api/lambda_function.py:56-130,
  * whose registered assets are exactly the documents a pipeline curates).
  *
  * Scale notes (100 TB): every query here is a narrow projection of
  * `documents` followed by either a per-row map (stats, lang-id, quality,
  * token counts — embarrassingly parallel, whole-stage codegen'd built-in
  * functions only, no UDFs) or a hash aggregation keyed on doc_id/hash
  * (dedup, fingerprint — one shuffle on a high-cardinality key, no skew).
  * The only quadratic op, `q_doc_near_dup`, is deliberately bounded
  * (doc_id<100) — its unbounded scale path is `q_dedup_minhash` (LSH) in
  * Dedup.scala, which replaces the O(n²) shingle self-join with banded
  * bucket joins.
  */
object Text {

  import TextExprs.{toksE, shinglesE, shinglesSql}

  // ONE word list per language; the SQL IN-list (oracle mirrors) and the
  // graft_count_in kernel CSV are both RENDERED from it, so the two
  // formulations cannot drift (round-17 ADVICE #3: the old regex-strip
  // of the SQL literal would silently corrupt a word containing an
  // apostrophe, a paren, or a comma)
  private val stopWordsEn = Seq("the", "a", "and", "of")
  private val stopWordsDe = Seq("der", "die", "das", "und")
  private val stopWordsEs = Seq("el", "la", "de", "y")
  private val stopWordsFr = Seq("le", "les", "et", "en")

  private def inList(words: Seq[String]) =
    words.map(w => s"'$w'").mkString("(", ",", ")")
  private val stopEn = inList(stopWordsEn)
  private val stopDe = inList(stopWordsDe)
  private val stopEs = inList(stopWordsEs)
  private val stopFr = inList(stopWordsFr)

  private def stopCount(words: Seq[String]) = {
    // the kernel CSV has no escaping: refuse words its comma-split (or the
    // single-quoted SQL rendering) would corrupt, instead of diverging
    require(words.forall(w => !w.contains(",") && !w.contains("'")),
      s"stop words must be comma- and quote-free for the kernel CSV: $words")
    s"graft_count_in(toks, '${words.mkString(",")}')"
  }

  /** Per-language corpus stats: doc count, avg chars, avg whitespace
    * tokens.
    */
  private def textStats(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorKernels.ensureRegistered(s)
    documents(s, d)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 4).as("avg_chars"),
        // round-18: size(regexp_extract_all(…)) materialized every token
        // as a string just to count them; the byte-walk kernel counts
        // the same [^ ]+ runs with zero allocation
        round(avg(expr("graft_token_counts(text).ws")), 4).as("avg_tokens"))
      .orderBy(col("lang"))
  }

  /** Stopword-frequency language ID heuristic: score each candidate
    * language by its marker-word hits, argmax with fixed priority
    * (en>de>es>fr) for determinism; report confusion counts vs the
    * labeled `lang`.
    */
  private def langId(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorKernels.ensureRegistered(s)
    documents(s, d)
      .withColumn("toks", expr(toksE))
      .withColumn("s_en", expr(stopCount(stopWordsEn)))
      .withColumn("s_de", expr(stopCount(stopWordsDe)))
      .withColumn("s_es", expr(stopCount(stopWordsEs)))
      .withColumn("s_fr", expr(stopCount(stopWordsFr)))
      .withColumn("predicted",
        expr("""CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
               |     WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
               |     WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END""".stripMargin))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("predicted"))
  }

  /** Quality scoring: length, punctuation-density, and stopword-ratio
    * signals combined into a [0,1] score, histogrammed by decile bucket.
    * Decimal-cast before the avg keeps the cross-engine hash stable
    * (SURVEY §7.3.3).
    */
  private def qualityScore(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorKernels.ensureRegistered(s)
    // Round-18: graft_text_quality computes all three signals in ONE byte
    // walk — the old pipeline materialized the whitespace token ARRAY
    // (one string allocation per token) just to size and membership-scan
    // it, plus a second regex pass for the punctuation count. Same
    // tokenization, same counts (pinned by OptimizedRewriteSpec).
    documents(s, d)
      .withColumn("q3",
        expr(s"graft_text_quality(text, '${stopWordsEn.mkString(",")}')"))
      .withColumn("quality", round(
        expr("""0.4 * least(CAST(q3.n_tok AS DOUBLE)/200.0, 1.0)
               | + 0.3 * (1.0 - least(CAST(q3.punct AS DOUBLE)/greatest(length(text), 1)*5.0, 1.0))
               | + 0.3 * least(CAST(q3.stop AS DOUBLE)/greatest(q3.n_tok, 1)*4.0, 1.0)""".stripMargin), 4))
      .groupBy(floor(col("quality") * 10).cast("int").as("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(sum(col("quality").cast(DecimalType(8, 4))).cast("double") / count(lit(1)), 4)
          .as("avg_quality"))
      .orderBy(col("bucket"))
  }

  /** Repetition quality signal (the Gopher-rules shape): per doc, the
    * fraction of word bigrams taken by the single most frequent bigram —
    * high values flag boilerplate/degenerate text a curation pipeline
    * drops. Non-distinct bigrams by construction (repetition IS the
    * signal; the dedup queries use the distinct set).
    *
    * Scale: explode + two hash aggregations keyed on (doc_id, bigram) /
    * doc_id — high-cardinality keys, map-side combine, no skew. The
    * ratio is int/int division — correctly rounded and engine-exact.
    */
  private def qualityRepetition(s: SparkSession, d: String): DataFrame = {
    // the statistic never crosses document boundaries, so the scale-correct
    // shape is a narrow per-row map, not explode + two corpus-wide
    // aggregation exchanges: the native BigramKernel counts a row's
    // bigrams in one compiled pass (n_bigrams = size-1 is the explode's
    // row count; values pinned identical by OptimizedRewriteSpec), leaving the
    // final ORDER BY as the only exchange at any scale.
    graft.functions.VectorKernels.ensureRegistered(s)
    documents(s, d)
      .select(col("doc_id"), expr(toksE).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        (size(col("toks")) - 1).cast("long").as("n_bigrams"),
        expr("graft_bigram_top(toks)").as("top_count"))
      .select(col("doc_id"), col("n_bigrams"), col("top_count"),
        round(col("top_count").cast("double") / col("n_bigrams"), 4).as("top_frac"))
      .orderBy(col("doc_id"))
  }

  /** Token counting per source: whitespace tokens and a BPE-ish regex
    * tokenization (letter runs / digit runs / single punctuation).
    */
  private def tokenCount(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorKernels.ensureRegistered(s)
    documents(s, d)
      // round-18: graft_token_counts computes BOTH tokenizations in one
      // byte walk — the r17 form ran two java.util.regex counting scans
      // (already allocation-free, but still two regex-engine passes);
      // counts pinned identical by OptimizedRewriteSpec
      .withColumn("tc", expr("graft_token_counts(text)"))
      .withColumn("ws_tok", col("tc.ws"))
      .withColumn("bpe_tok", col("tc.bpe"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ws_tok")).as("sum_ws_tokens"),
        sum(col("bpe_tok")).as("sum_bpe_tokens"))
      .orderBy(col("source"))
  }

  /** Document fingerprinting: bottom-4 sketch of md5(5-gram shingle) —
    * a deterministic, mergeable content signature (the bottom-k sketch is
    * the set-similarity primitive behind winnowing/minhash; at 100 TB the
    * per-doc sketch is 4 fixed strings, so fingerprint comparison is a
    * cheap equi-join instead of a text scan).
    */
  /** Portable HOF formulation of the bottom-4 sketch — the semantics
    * spec the native kernel must match (ShingleKernelSpec asserts
    * equality row-for-row).
    */
  private[graft] def fingerprintPortable =
    array_join(
      slice(array_sort(expr(s"transform($shinglesE, x -> md5(x))")), 1, 4), "|")

  private def docFingerprint(s: SparkSession, d: String): DataFrame =
    // no explode, no shuffle, no window — the sketch of a 100 TB corpus
    // is one narrow map, and the native one-pass kernel (ShingleKernel)
    // replaces the interpreted HOF pipeline (shingle array → distinct →
    // md5 array → full sort) with a streaming bottom-k buffer
    documents(s, d)
      .select(col("doc_id"),
        graft.functions.ShingleKernel.bottomKShingleMd5(col("text"), 5, 4)
          .as("fingerprint"))
      .orderBy(col("doc_id"))

  /** Exact dedup: md5(text) groups, survivor = min doc_id (deterministic
    * rule, NOT dropDuplicates — SURVEY §7.3.5). One hash-shuffle on the
    * digest; at 100 TB the digest groupBy is the canonical exact-dedup.
    */
  private def docDedupExact(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("h"))
      .orderBy(col("doc_id"))

  /** Near-dup pairs by 5-gram shingle Jaccard ≥ 0.25 among same-lang docs,
    * bounded to doc_id < 100 (the declared query is the correctness spec;
    * the LSH path in Dedup.scala is the scale path — SURVEY §7.4.4).
    */
  private def docNearDup(s: SparkSession, d: String): DataFrame =
    // the shingle set feeds three consumers (sizes + both self-join sides);
    // without a cache each consumer re-runs the explode over the corpus —
    // the dominant cost at scale. Scoped: blocks release on return.
    Caching.withCached(
      documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), col("lang"), explode(expr(shinglesE)).as("sh"))) { sh =>
      val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = sh.as("a")
        .join(sh.as("b"),
          col("a.sh") === col("b.sh") && col("a.lang") === col("b.lang") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("i"))
      inter
        .join(sz.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sz.as("sb"), col("doc_b") === col("sb.doc_id"))
        .withColumn("jaccard",
          col("i").cast("double") / (col("sa.n") + col("sb.n") - col("i")))
        .filter(col("jaccard") >= 0.25)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 3).as("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    }

  /** Canonical text normalization — the first step of every curation
    * pipeline (and the precondition of exact dedup: un-normalized
    * duplicates hash apart). The synthetic corpus is already clean, so
    * the query synthesizes a noisy variant (padding + deterministic case
    * noise keyed on doc_id), then normalizes: lowercase → collapse
    * whitespace runs → trim. Emits audit lengths plus md5 of the
    * normalized form and of the alphanumeric skeleton (the key fuzzy
    * matchers join on). Narrow per-row map, codegen'd built-ins only.
    */
  private def textNormalize(s: SparkSession, d: String): DataFrame = {
    // Round-18: graft_norm_stats fuses the pad/case-noise construction,
    // the lower + space-collapse + trim normalization, both audit
    // lengths, and both md5s into one kernel pass — the portable form
    // built four intermediate strings and ran two regex passes per row.
    // Row-for-row parity pinned by OptimizedRewriteSpec (corpus +
    // multibyte/sharp-s/space-run adversarial strings); oracle unchanged.
    graft.functions.VectorKernels.ensureRegistered(s)
    documents(s, d)
      .withColumn("st", expr("graft_norm_stats(text, doc_id % 2 = 0)"))
      .select(col("doc_id"),
        col("st.n_raw").as("n_raw"),
        col("st.n_norm").as("n_norm"),
        col("st.norm_md5").as("norm_md5"),
        col("st.skeleton_md5").as("skeleton_md5"))
      .orderBy("doc_id")
  }

  /** Soft (canonicalized) exact dedup: documents collapse when their
    * alphanumeric skeleton matches — lowercase, all non-alphanumerics
    * dropped — so case, punctuation, and whitespace variants of the same
    * text dedup together where raw md5(text) would miss them. The step
    * between exact dedup and MinHash in every curation pipeline; same
    * single hash-shuffle shape as q_doc_dedup_exact, survivor = min
    * doc_id.
    */
  private def docDedupSoft(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(md5(regexp_replace(lower(col("text")), "[^a-z0-9]", ""))
        .as("skeleton_md5"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_members"))
      .select(col("doc_id"), col("skeleton_md5"), col("n_members"))
      .orderBy("doc_id")

  /** EXACT corpus heavy hitters: every token whose global frequency
    * exceeds 1/30 of the whole corpus — the vocabulary-pruning /
    * boilerplate-detection primitive ("which tokens dominate the crawl").
    * Two hash aggregations (per-term counts, global total) and a
    * broadcast of the one-row total; the threshold compares by integer
    * cross-multiplication (`cnt * 30 > total`), no division, so there is
    * no float boundary to disagree on. Unlike sketch-based heavy hitters
    * this is exact, yet still one shuffle of (term, partial-count) pairs
    * — map-side combine makes the shuffled volume the vocabulary size,
    * not the corpus size.
    */
  private def heavyHitters(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d).select(explode(expr(toksE)).as("term"))
    val counts = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    // total = sum over the vocabulary-sized histogram, NOT a second
    // corpus scan — both consumers share one exchange (ReuseExchange),
    // so the 100 TB corpus is read and exploded exactly once
    val total = counts.agg(sum(col("cnt")).as("total"))
    counts.join(broadcast(total),
        col("cnt") * lit(30) > col("total"), "inner")
      .select(col("term"), col("cnt"))
      .orderBy(col("cnt").desc, col("term"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_heavy_hitters"   -> heavyHitters _,
    "q_doc_dedup_soft"  -> docDedupSoft _,
    "q_text_normalize"  -> textNormalize _,
    "q_text_stats"      -> textStats _,
    "q_lang_id"         -> langId _,
    "q_quality_score"   -> qualityScore _,
    "q_quality_repetition" -> qualityRepetition _,
    "q_token_count"     -> tokenCount _,
    "q_doc_fingerprint" -> docFingerprint _,
    "q_doc_dedup_exact" -> docDedupExact _,
    "q_doc_near_dup"    -> docNearDup _,
  )

  val oracle: Map[String, String] = Map(
    "q_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_extract_all(text, '[^ ]+')) AS term
        |  FROM documents),
        |c AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term)
        |SELECT term, cnt FROM c
        |WHERE cnt * 30 > (SELECT count(*) FROM toks)
        |ORDER BY cnt DESC, term""".stripMargin,
    "q_doc_dedup_soft" ->
      """SELECT min(doc_id) AS doc_id,
        |  md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS skeleton_md5,
        |  count(*) AS n_members
        |FROM documents
        |GROUP BY md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
        |ORDER BY doc_id""".stripMargin,
    "q_text_normalize" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    '  ' || CASE WHEN doc_id % 2 = 0 THEN upper(text) ELSE text END || '   ' AS raw
        |  FROM documents),
        |n AS (SELECT doc_id, raw,
        |        trim(regexp_replace(lower(raw), '[ ]+', ' ', 'g')) AS norm FROM r)
        |SELECT doc_id, CAST(len(raw) AS INT) AS n_raw, CAST(len(norm) AS INT) AS n_norm,
        |  md5(norm) AS norm_md5,
        |  md5(regexp_replace(norm, '[^a-z0-9]', '', 'g')) AS skeleton_md5
        |FROM n ORDER BY doc_id""".stripMargin,
    "q_text_stats" ->
      """SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars,
        |  round(avg(len(regexp_extract_all(text, '[^ ]+'))), 4) AS avg_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_lang_id" ->
      s"""WITH sc AS (
         |  SELECT lang,
         |    len(list_filter(regexp_extract_all(text, '[^ ]+'), t -> t IN $stopEn)) AS s_en,
         |    len(list_filter(regexp_extract_all(text, '[^ ]+'), t -> t IN $stopDe)) AS s_de,
         |    len(list_filter(regexp_extract_all(text, '[^ ]+'), t -> t IN $stopEs)) AS s_es,
         |    len(list_filter(regexp_extract_all(text, '[^ ]+'), t -> t IN $stopFr)) AS s_fr
         |  FROM documents)
         |SELECT lang,
         |  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
         |       WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
         |       WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS predicted,
         |  count(*) AS n_docs
         |FROM sc GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin,
    "q_quality_score" ->
      s"""WITH q AS (
         |  SELECT round(
         |    0.4 * least(CAST(len(regexp_extract_all(text, '[^ ]+')) AS DOUBLE)/200.0, 1.0)
         |    + 0.3 * (1.0 - least(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE)/greatest(len(text), 1)*5.0, 1.0))
         |    + 0.3 * least(CAST(len(list_filter(regexp_extract_all(text, '[^ ]+'), t -> t IN $stopEn)) AS DOUBLE)
         |                  / greatest(len(regexp_extract_all(text, '[^ ]+')), 1) * 4.0, 1.0), 4) AS quality
         |  FROM documents)
         |SELECT CAST(floor(quality*10) AS INT) AS bucket, count(*) AS n_docs,
         |  round(CAST(sum(CAST(quality AS DECIMAL(8,4))) AS DOUBLE)/count(*), 4) AS avg_quality
         |FROM q GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_quality_repetition" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    unnest([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS g
        |  FROM (SELECT doc_id, regexp_extract_all(text, '[^ ]+') AS t FROM documents)
        |  WHERE len(t) >= 2),
        |c AS (SELECT doc_id, g, count(*) AS cnt FROM b GROUP BY doc_id, g)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
        |  CAST(max(cnt) AS BIGINT) AS top_count,
        |  round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 4) AS top_frac
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_token_count" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(regexp_extract_all(text, '[^ ]+'))) AS BIGINT) AS sum_ws_tokens,
        |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))) AS BIGINT) AS sum_bpe_tokens
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_doc_fingerprint" ->
      s"""WITH sh AS (
         |  SELECT DISTINCT doc_id, md5(sh) AS h
         |  FROM documents, UNNEST($shinglesSql) AS u(sh)),
         |r AS (SELECT doc_id, h, row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rn FROM sh)
         |SELECT doc_id, string_agg(h, '|' ORDER BY h) AS fingerprint
         |FROM r WHERE rn <= 4 GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_doc_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, md5(text) AS h
        |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin,
    "q_doc_near_dup" ->
      s"""WITH sh AS (
         |  SELECT DISTINCT doc_id, lang, sh
         |  FROM documents, UNNEST($shinglesSql) AS u(sh) WHERE doc_id < 100),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.lang = b.lang AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  round(CAST(i AS DOUBLE)/(sa.n + sb.n - i), 3) AS jaccard
         |FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
         |WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= 0.25
         |ORDER BY doc_a, doc_b""".stripMargin,
  )
}
