package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-built inputs with known answers for the text/dedup kernels —
  * verifies the algorithms themselves, independent of the DuckDB oracle.
  */
class TextDedupSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def docsDF(rows: (Long, String, String, String)*) =
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))

  private def writeTmpSf(rows: (Long, String, String, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_textspec").toString
    docsDF(rows: _*).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("exact dedup keeps min doc_id per identical text") {
    val d = writeTmpSf(
      (1L, "same text here", "en", "s"),
      (2L, "same text here", "en", "s"),
      (3L, "different text", "en", "s"))
    val out = ops.Text.queries("q_doc_dedup_exact")(spark, d)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 3L))
  }

  test("near-dup finds identical docs with jaccard 1.0 and skips unrelated") {
    val d = writeTmpSf(
      (1L, "spark engine query plan optimizer runs fast", "en", "s"),
      (2L, "spark engine query plan optimizer runs fast", "en", "s"),
      (3L, "zzzz qqqq wwww xxxx yyyy vvvv uuuu tttt", "en", "s"))
    val out = ops.Text.queries("q_doc_near_dup")(spark, d)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("minhash LSH surfaces exact duplicates as candidates (jaccard 1.0)") {
    val d = writeTmpSf(
      (1L, "the quick brown fox jumps over the lazy dog again", "en", "s"),
      (2L, "the quick brown fox jumps over the lazy dog again", "en", "s"),
      (3L, "completely unrelated content with other words entirely", "en", "s"))
    val out = ops.Dedup.queries("q_dedup_minhash")(spark, d)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(out.contains((1L, 2L, 1.0)))
    assert(!out.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical docs have hamming 0") {
    val d = writeTmpSf(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "s"),
      (2L, "alpha beta gamma delta epsilon zeta", "en", "s"))
    val out = ops.Dedup.queries("q_dedup_simhash")(spark, d)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect()
    assert(out.toSeq == Seq((1L, 2L, 0)))
  }

  test("cluster dedup groups a chained near-dup component under one representative") {
    // A≈B and B≈C but pairwise (A,C) may or may not surface — the whole
    // point of the component step: one survivor for the CHAIN, not per pair
    val d = writeTmpSf(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "s"),
      (2L, "alpha beta gamma delta epsilon zeta", "en", "s"),
      (3L, "alpha beta gamma delta epsilon zeta", "en", "s"),
      (4L, "totally different words in this document here", "en", "s"),
      (5L, "totally different words in this document here", "en", "s"),
      (6L, "nothing like any other text qq ww ee rr tt", "en", "s"))
    val out = ops.Dedup.queries("q_dedup_clusters")(spark, d)
      .select("doc_id", "rep", "csize").as[(Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (4L, 4L, 2L), (5L, 4L, 2L)))
    // invariants any clustering must satisfy: the representative is a
    // member of its own cluster with itself as rep (fixpoint), and no
    // singleton clusters (nodes only exist via edges)
    val byRep = out.groupBy(_._2)
    byRep.foreach { case (rep, members) =>
      assert(members.exists(_._1 == rep), s"rep $rep not in its own cluster")
      assert(members.forall(_._3 == members.size.toLong))
      assert(members.size >= 2)
      assert(rep == members.map(_._1).min, s"rep $rep is not the min member")
    }
  }

  test("token counts: whitespace vs BPE-ish regex") {
    val d = writeTmpSf((1L, "ab cd, ef12 gh", "en", "s"))
    val row = ops.Text.queries("q_token_count")(spark, d).collect().head
    assert(row.getAs[Long]("sum_ws_tokens") == 4)   // ab | cd, | ef12 | gh
    assert(row.getAs[Long]("sum_bpe_tokens") == 6)  // ab cd , ef 12 gh
  }

  test("fingerprint is 4 sorted md5 hashes and stable across runs") {
    val d = writeTmpSf((1L, "stable fingerprint input text", "en", "s"))
    val fp1 = ops.Text.queries("q_doc_fingerprint")(spark, d)
      .select("fingerprint").as[String].collect().head
    val fp2 = ops.Text.queries("q_doc_fingerprint")(spark, d)
      .select("fingerprint").as[String].collect().head
    assert(fp1 == fp2)
    val parts = fp1.split('|')
    assert(parts.length == 4 && parts.sorted.sameElements(parts))
    assert(parts.forall(_.matches("[0-9a-f]{32}")))
  }

  test("language id picks the language with most marker hits") {
    val d = writeTmpSf(
      (1L, "der hund und die katze das haus", "de", "s"),
      (2L, "the cat and the dog of a house", "en", "s"))
    val out = ops.Text.queries("q_lang_id")(spark, d)
      .select("lang", "predicted").as[(String, String)].collect().toSet
    assert(out == Set(("de", "de"), ("en", "en")))
  }
}
