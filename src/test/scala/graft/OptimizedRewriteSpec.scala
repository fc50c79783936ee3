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
}
