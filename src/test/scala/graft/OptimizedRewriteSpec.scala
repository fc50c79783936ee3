package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 optimization parity: every rewritten operator must produce
  * EXACTLY the rows of the formulation it replaced (the optimization
  * round's contract — speed may change, values may not).
  *
  *  - `graft_vec_project` (native kernel) vs the interpreted
  *    `aggregate(zip_with(…))` fold it replaced in `q_embed_project`;
  *  - `graft_bigram_top` (native kernel) vs the explode + two-aggregation
  *    pipeline it replaced in `q_quality_repetition`;
  *  - the concat-built request envelope vs the `to_json` form it replaced
  *    in `meta_envelope_json` (byte-for-byte, it feeds a hash oracle).
  */
class OptimizedRewriteSpec extends AnyFunSuite {
  import SparkTestSession._

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.schema.map(f => (f.name, f.dataType)) ===
      b.schema.map(f => (f.name, f.dataType)))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("graft_vec_project equals the portable HOF fold on every embedding") {
    graft.functions.VectorKernels.ensureRegistered(spark)
    val kernel = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        posexplode(expr("graft_vec_project(embedding, 8)")).as(Seq("j", "p")))
    val portable = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), explode(expr("sequence(0, 7)")).as("j"), col("embedding"))
      .select(col("vec_id"), col("j"),
        expr(graft.ops.Similarity.embedProjectPortableE).as("p"))
    assertSameRows(kernel, portable)
  }

  test("graft_vec_project keeps the k-row shape on null/empty/null-element vectors") {
    graft.functions.VectorKernels.ensureRegistered(spark)
    import spark.implicits._
    val rows = Seq(
      (1L, Some(Seq(Some(1.0f), Some(2.0f)))),
      (2L, None),                                  // null vector
      (3L, Some(Seq.empty[Option[Float]])),        // empty vector
      (4L, Some(Seq(Some(1.0f), None)))            // null element
    ).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val out = rows.select(col("vec_id"),
      posexplode(expr("graft_vec_project(embedding, 8)")).as(Seq("j", "p")))
    // every vector — including the degenerate ones — emits exactly 8 rows
    val counts = out.groupBy("vec_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === Map(1L -> 8L, 2L -> 8L, 3L -> 8L, 4L -> 8L))
    // and the degenerate ones emit NULL projections, like the portable fold
    assert(out.filter(col("vec_id") =!= 1 && col("p").isNotNull).count() === 0)
    assert(out.filter(col("vec_id") === 1 && col("p").isNull).count() === 0)
  }

  test("graft_bigram_top equals the explode + two-aggregation pipeline") {
    graft.functions.VectorKernels.ensureRegistered(spark)
    import graft.ops.TextExprs
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), expr(TextExprs.toksE).as("toks"))
      .filter(size(col("toks")) >= 2)
    val kernel = base.select(col("doc_id"),
      (size(col("toks")) - 1).cast("long").as("n_bigrams"),
      expr("graft_bigram_top(toks)").as("top_count"))
    val portable = base
      .select(col("doc_id"), explode(expr(TextExprs.bigramsE)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"), max(col("cnt")).as("top_count"))
    assertSameRows(kernel, portable)
  }

  test("graft_bigram_top counts repeated bigrams, not repeated tokens") {
    graft.functions.VectorKernels.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq(
      ("a b a b a", 2L),   // "a b" ×2, "b a" ×2
      ("x x x x", 3L),     // "x x" ×3
      ("p q r", 1L)
    ).toDF("text", "expected")
      .select(expr("regexp_extract_all(text, '[^ ]+', 0)").as("toks"), col("expected"))
      .select(expr("graft_bigram_top(toks)").as("top"), col("expected"))
    assert(df.filter(col("top") =!= col("expected")).count() === 0)
  }

  test("graft_count_in equals size(filter(t IN set)) for every stop set") {
    graft.functions.VectorKernels.ensureRegistered(spark)
    val sets = Seq(
      "('the','a','and','of')"   -> "the,a,and,of",
      "('der','die','das','und')" -> "der,die,das,und",
      "('el','la','de','y')"      -> "el,la,de,y",
      "('le','les','et','en')"    -> "le,les,et,en")
    val base = Tables.documents(spark, sfDir)
      .select(expr(graft.ops.TextExprs.toksE).as("toks"))
    sets.foreach { case (inList, csvList) =>
      val diff = base.select(
        expr(s"graft_count_in(toks, '$csvList')").as("k"),
        size(expr(s"filter(toks, t -> t IN $inList)")).as("p"))
        .filter(col("k") =!= col("p"))
      assert(diff.isEmpty, s"mismatch for $inList")
    }
  }

  test("graft_re_count equals size(regexp_extract_all) on every document") {
    graft.functions.VectorKernels.ensureRegistered(spark)
    val pats = Seq("[^ ]+", "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]", "[^A-Za-z0-9 ]",
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}", "[+]1-555-[0-9]{4}")
    pats.foreach { p =>
      val diff = Tables.documents(spark, sfDir).select(
        expr(s"graft_re_count(text, '$p')").as("k"),
        size(expr(s"regexp_extract_all(text, '$p', 0)")).as("o"))
        .filter(col("k") =!= col("o"))
      assert(diff.isEmpty, s"mismatch for pattern $p")
    }
  }

  test("graft_window_md5 equals the portable transform on every document") {
    graft.functions.VectorKernels.ensureRegistered(spark)
    val base = Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= 40)
    val kernel = base.select(col("doc_id"),
      explode(expr("graft_window_md5(text, 40, 20)")).as("h"))
    val portable = base.select(col("doc_id"),
      explode(expr("transform(sequence(1, length(text) - 39, 20), " +
        "i -> md5(substring(text, i, 40)))")).as("h"))
    assertSameRows(kernel, portable)
  }

  test("graft_window_md5 handles multi-byte chars and stride tails like the transform") {
    graft.functions.VectorKernels.ensureRegistered(spark)
    import spark.implicits._
    // 45 chars with multi-byte umlauts: windows at 1 and 21 only; plus a
    // text of exactly w chars (one window) and one just under (none —
    // callers filter those, the kernel returns empty)
    val texts = Seq(
      "ä" * 45,
      ("abcdefghij" * 4) + "klmno",
      "x" * 40,
      "y" * 39)
    val df = texts.toDF("text")
    val kernel = df.filter(length(col("text")) >= 40).select(col("text"),
      explode(expr("graft_window_md5(text, 40, 20)")).as("h"))
    val portable = df.filter(length(col("text")) >= 40).select(col("text"),
      explode(expr("transform(sequence(1, length(text) - 39, 20), " +
        "i -> md5(substring(text, i, 40)))")).as("h"))
    assertSameRows(kernel, portable)
  }

  test("concat-built envelope is byte-identical to the to_json form") {
    val concatForm = graft.ops.Meta.queries("meta_envelope_json")(spark, sfDir)
    val jsonForm = graft.ops.Meta.envelopeJsonPortable(spark, sfDir)
    assertSameRows(concatForm, jsonForm)
  }

  test("envelope parity holds for control-char and unicode event types") {
    // round-17 ADVICE #1: the old two-replace escape matched to_json only
    // because fixtures carry no control chars. Pin the hardened escape on
    // a synthetic events table full of them.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_env_adv")
    val evil = Seq(
      "plain", "with \"quotes\"", "back\\slash", "tab\there", "new\nline",
      "cr\rreturn", "bell\u0007", "nul\u0000nul", "esc\u001B[0m",
      "form\ffeed", "backsp\bace", "unit\u001Fsep", "\u0001\u0002\u0003",
      "mixé üñíçødé ✓", "quote\"and\\and\ncombo")
    evil.zipWithIndex
      .map { case (et, i) => (i.toLong, (1700000000000000L + i), i.toLong * 7, et,
        1.5 * i, s"""{"k":$i}""") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(dir.resolve("events.parquet").toString)
    try {
      val concatForm = graft.ops.Meta.queries("meta_envelope_json")(spark, dir.toString)
      val jsonForm = graft.ops.Meta.envelopeJsonPortable(spark, dir.toString)
      assertSameRows(concatForm, jsonForm)
      assert(concatForm.count() === evil.length.toLong)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile): Unit
  }

  /** graft_token_counts vs the two regex counting scans it fuses, on a
    * frame with a `text` column.
    */
  private def assertTokenCountsParity(df: DataFrame): Unit = {
    val kernel = df.withColumn("tc", expr("graft_token_counts(text)"))
      .select(col("text"), col("tc.ws").as("ws"), col("tc.bpe").as("bpe"))
    val portable = df.select(col("text"),
      expr("graft_re_count(text, '[^ ]+')").as("ws"),
      expr("graft_re_count(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')").as("bpe"))
    assertSameRows(kernel, portable)
  }

  test("graft_token_counts equals both regex scans on the corpus") {
    graft.functions.VectorKernels.ensureRegistered(spark)
    assertTokenCountsParity(Tables.documents(spark, sfDir).select(col("text")))
  }

  test("graft_token_counts equals both regex scans on edge strings") {
    graft.functions.VectorKernels.ensureRegistered(spark)
    import spark.implicits._
    assertTokenCountsParity(Seq(
      "", " ", "abc", "abc123", "123abc!", "a1!b2?c", "!!!", "a!!!b",
      "mixé üñíçødé ✓ 42", "CamelCase09end.", "tab\tx", "a b  c   d",
      "0xDEAD beef42", "...12ab..cd34...").toDF("text"))
  }

  /** graft_text_quality vs the three portable expressions it fuses, on a
    * frame with a `text` column.
    */
  private def assertQualityParity(df: DataFrame): Unit = {
    import graft.ops.TextExprs.toksE
    val kernel = df
      .withColumn("q3", expr("graft_text_quality(text, 'the,a,and,of')"))
      .select(col("text"), col("q3.n_tok").as("n_tok"),
        col("q3.punct").as("punct"), col("q3.stop").as("stop"))
    val portable = df
      .withColumn("toks", expr(toksE))
      .select(col("text"), size(col("toks")).as("n_tok"),
        expr("graft_re_count(text, '[^A-Za-z0-9 ]')").as("punct"),
        expr("graft_count_in(toks, 'the,a,and,of')").as("stop"))
    assertSameRows(kernel, portable)
  }

  test("graft_text_quality equals the token-array pipeline on the corpus") {
    graft.functions.VectorKernels.ensureRegistered(spark)
    assertQualityParity(Tables.documents(spark, sfDir).select(col("text")))
  }

  test("graft_text_quality equals the token-array pipeline on edge strings") {
    graft.functions.VectorKernels.ensureRegistered(spark)
    import spark.implicits._
    assertQualityParity(Seq(
      "", " ", "   ", "the", " the ", "the the the", "thee the and-of",
      "a  b   c", "punct!.; only", "mixé üñíçødé ✓ the", "tabs\tand\nnewlines the",
      "of", "ofa a of", "trailing the").toDF("text"))
  }

  /** graft_norm_stats vs the four-intermediate-string portable form on a
    * (doc_id, text) frame.
    */
  private def assertNormParity(df: DataFrame): Unit = {
    val kernel = df
      .withColumn("st", expr("graft_norm_stats(text, doc_id % 2 = 0)"))
      .select(col("doc_id"), col("st.n_raw").as("n_raw"), col("st.n_norm").as("n_norm"),
        col("st.norm_md5").as("norm_md5"), col("st.skeleton_md5").as("skeleton_md5"))
    val portable = df
      .withColumn("raw", concat(lit("  "),
        when(pmod(col("doc_id"), lit(2)) === 0, upper(col("text")))
          .otherwise(col("text")),
        lit("   ")))
      .withColumn("norm", trim(regexp_replace(lower(col("raw")), "[ ]+", " ")))
      .select(col("doc_id"),
        length(col("raw")).as("n_raw"), length(col("norm")).as("n_norm"),
        md5(col("norm")).as("norm_md5"),
        md5(regexp_replace(col("norm"), "[^a-z0-9]", "")).as("skeleton_md5"))
    assertSameRows(kernel, portable)
  }

  test("graft_norm_stats equals the portable normalize pipeline on the corpus") {
    graft.functions.VectorKernels.ensureRegistered(spark)
    assertNormParity(Tables.documents(spark, sfDir).select(col("doc_id"), col("text")))
  }

  test("graft_norm_stats equals the portable pipeline on adversarial strings") {
    graft.functions.VectorKernels.ensureRegistered(spark)
    import spark.implicits._
    val rows = Seq(
      "", " ", "   ", "a", " a ", "a  b   c", "  lead", "trail   ",
      "UPPER lower MiXeD", "straße and STRASSE",      // sharp-s case round-trip
      "éàü ÇØÅ multibyte", "İstanbul dotted I",       // case changes byte length
      "digits 0129 and punct !?;", "tabs\tstay\ttabs",// [ ]+ is space-only
      "x" + " " * 50 + "y")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    assertNormParity(rows.toDF("doc_id", "text"))
  }

  test("graft_chunk_md5 pipeline equals the explode + double-substring form") {
    graft.functions.VectorKernels.ensureRegistered(spark)
    def base = Tables.documents(spark, sfDir).filter(length(col("text")) >= 1)
    val kernel = base
      .select(col("doc_id"), length(col("text")).as("n"),
        posexplode(expr("graft_chunk_md5(text, 100, 80)")).as(Seq("p", "h")))
      .select(col("doc_id"), col("p").cast("long").as("chunk_ix"),
        least(lit(100), col("n") - col("p") * 80).cast("int").as("chunk_len"),
        col("h"))
    val portable = base
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(1, length(text), 80)")).as("o"))
      .select(col("doc_id"),
        expr("(o - 1) div 80").as("chunk_ix"),
        length(expr("substring(text, o, 100)")).as("chunk_len"),
        md5(expr("substring(text, o, 100)")).as("h"))
    assertSameRows(kernel, portable)
  }

  test("graft_chunk_md5 handles multibyte, exact-boundary and tiny texts") {
    graft.functions.VectorKernels.ensureRegistered(spark)
    import spark.implicits._
    val texts = Seq(
      "a",                      // single char
      "x" * 80,                 // exactly one stride
      "x" * 81,                 // stride + 1 → 2 chunks, 1-char tail
      "x" * 100,                // exactly w
      "x" * 180,                // w + stride
      "é" * 250 + "✓" * 9,      // multibyte across chunk boundaries
      "y" * 1000)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "text").filter(length(col("text")) >= 1)
    val kernel = df
      .select(col("doc_id"), length(col("text")).as("n"),
        posexplode(expr("graft_chunk_md5(text, 100, 80)")).as(Seq("p", "h")))
      .select(col("doc_id"), col("p").cast("long").as("chunk_ix"),
        least(lit(100), col("n") - col("p") * 80).cast("int").as("chunk_len"), col("h"))
    val portable = df
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(1, length(text), 80)")).as("o"))
      .select(col("doc_id"), expr("(o - 1) div 80").as("chunk_ix"),
        length(expr("substring(text, o, 100)")).as("chunk_len"),
        md5(expr("substring(text, o, 100)")).as("h"))
    assertSameRows(kernel, portable)
  }

  /** The fused quant-stats struct vs the five-HOF chain it replaced in
    * q_embed_quantize — on a given array<float> column named `embedding`.
    */
  private def assertQuantParity(df: DataFrame): Unit = {
    val kernel = df.withColumn("sc", expr("graft_vec_quant_stats(embedding)"))
      .select(col("embedding"),
        round(col("sc.mx"), 6).as("scale"), col("sc.q_sum").as("q_sum"),
        col("sc.q_min").as("q_min"), col("sc.q_max").as("q_max"))
    val portable = df
      .withColumn("mx",
        expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"))
      .withColumn("mxs", expr("CASE WHEN mx = 0.0 THEN 1.0 ELSE mx END"))
      .withColumn("q",
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) / mxs * 127) AS BIGINT))"))
      .select(col("embedding"),
        round(col("mx"), 6).as("scale"),
        expr("aggregate(q, CAST(0 AS BIGINT), (a, v) -> a + v)").as("q_sum"),
        expr("array_min(q)").cast("long").as("q_min"),
        expr("array_max(q)").cast("long").as("q_max"))
    assertSameRows(kernel.drop("embedding"), portable.drop("embedding"))
  }

  test("graft_vec_quant_stats equals the five-HOF chain on every embedding") {
    graft.functions.VectorKernels.ensureRegistered(spark)
    assertQuantParity(Tables.embeddings(spark, sfDir).select(col("embedding")))
  }

  test("graft_vec_quant_stats equals the five-HOF chain on degenerate vectors") {
    graft.functions.VectorKernels.ensureRegistered(spark)
    import spark.implicits._
    val rows = Seq(
      Some(Seq(Some(1.5f), Some(-2.5f), Some(0.25f))),
      Some(Seq(Some(0.0f), Some(0.0f))),             // all-zero: mxs guard
      Some(Seq(Some(-0.0f))),                        // negative zero
      Some(Seq.empty[Option[Float]]),                // empty array
      Some(Seq(Some(1.0f), None, Some(2.0f))),       // null element
      Some(Seq(None)),                               // all-null
      None)                                          // null vector
      .toDF("embedding")
      .select(col("embedding").cast("array<float>"))
    assertQuantParity(rows)
    // null vector stays null through the kernel
    val n = Seq[Option[Seq[Float]]](None).toDF("embedding")
      .select(col("embedding").cast("array<float>"))
      .select(expr("graft_vec_quant_stats(embedding)").as("sc"))
    assert(n.filter(col("sc").isNull).count() === 1)
  }

  /** The fused scrub struct vs the two-pass regexp_replace + audit-count
    * formulation it replaced in q_pii_scrub — on a given text column.
    */
  private def assertScrubParity(df: DataFrame): Unit = {
    import graft.ops.Privacy.{emailRe, phoneRe}
    val kernel = df.withColumn("sc",
        expr(s"graft_pii_scrub(t, '$emailRe', '[EMAIL]', '$phoneRe', '[PHONE]')"))
      .select(col("t"), col("sc.scrubbed").as("scrubbed"),
        col("sc.n1").as("n1"), col("sc.n2").as("n2"))
    val portable = df.select(
      col("t"),
      regexp_replace(regexp_replace(col("t"), emailRe, "[EMAIL]"),
        phoneRe, "[PHONE]").as("scrubbed"),
      expr(s"graft_re_count(t, '$emailRe')").as("n1"),
      expr(s"graft_re_count(t, '$phoneRe')").as("n2"))
    assertSameRows(kernel, portable)
  }

  test("graft_pii_scrub equals the two-pass replace + counts on the pii corpus") {
    graft.functions.VectorKernels.ensureRegistered(spark)
    val pii = Tables.documents(spark, sfDir)
      .withColumn("t", concat(
        col("text"),
        lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit(" cc admin"), col("doc_id").cast("string"),
            lit("@mail.example.org"))).otherwise(lit("")),
        lit(" or call +1-555-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
      .select(col("t"))
    assertScrubParity(pii)
  }

  test("graft_pii_scrub equals the two-pass form on adversarial overlap strings") {
    graft.functions.VectorKernels.ensureRegistered(spark)
    import spark.implicits._
    val rows = Seq(
      "",                                          // empty
      "no pii here at all",
      "plain a@b.com email",
      "plain +1-555-1234 phone",
      "+1-555-0000@example.com",                   // phone IS the email local part
      "x+1-555-9999@y.org tail",                   // phone embedded inside a local part
      "a@b.comm+1-555-1234",                       // phone adjacent to a greedy TLD
      "+1-555-1234 a@b.com +1-555-7777",           // interleaved
      "a@b.com+1-555-1234@c.net",                  // two candidate emails sharing a phone
      "call +1-555-12345 now",                     // 5 digits: still matches the first 4
      "+1-555-123",                                // too short: no phone
      "user@sub.domain.example.co.uk and +1-555-0001",
      "@no.local.part +1-555-2222 trailing@",
      "+1-555-3333+1-555-4444",                    // adjacent phones
      "e1@a.io e2@b.io e3@c.io")                   // many emails
      .toDF("t")
    assertScrubParity(rows)
    // null text stays null through the kernel
    import graft.ops.Privacy.{emailRe, phoneRe}
    val n = Seq[Option[String]](None).toDF("t")
      .select(expr(s"graft_pii_scrub(t, '$emailRe', '[EMAIL]', '$phoneRe', '[PHONE]')").as("sc"))
    assert(n.filter(col("sc").isNull).count() === 1)
  }
}
