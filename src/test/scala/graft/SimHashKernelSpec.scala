package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SimHashKernel

/** The native one-pass SimHash kernel must be bit-identical to the
  * portable 32×-explode formulation it replaced in Dedup.dedupSimhash
  * (which is also what the DuckDB oracle mirrors) — on the real corpus
  * and on adversarial token arrays.
  */
class SimHashKernelSpec extends AnyFunSuite {
  import SparkTestSession._

  /** The pre-kernel formulation, verbatim: md5 hex nibble high-bit ±1
    * votes, per-bit majority, sum of pow(2, j-1).
    */
  private def portable(toks: DataFrame): DataFrame = {
    val hexHigh = "('8','9','a','b','c','d','e','f')"
    toks
      .select(col("id"), explode(col("toks")).as("tok"))
      .withColumn("h1", md5(col("tok")))
      .withColumn("h2", md5(concat(lit("x"), col("tok"))))
      .withColumn("j", explode(expr("sequence(1, 32)")))
      .withColumn("i1", expr(s"CASE WHEN substring(h1, j, 1) IN $hexHigh THEN 1 ELSE -1 END"))
      .withColumn("i2", expr(s"CASE WHEN substring(h2, j, 1) IN $hexHigh THEN 1 ELSE -1 END"))
      .groupBy(col("id"), col("j"))
      .agg(sum(col("i1")).as("s1"), sum(col("i2")).as("s2"))
      .withColumn("b1", expr("CASE WHEN s1 > 0 THEN CAST(pow(2, j-1) AS BIGINT) ELSE CAST(0 AS BIGINT) END"))
      .withColumn("b2", expr("CASE WHEN s2 > 0 THEN CAST(pow(2, j-1) AS BIGINT) ELSE CAST(0 AS BIGINT) END"))
      .groupBy(col("id"))
      .agg(sum(col("b1")).cast("long").as("p1"), sum(col("b2")).cast("long").as("p2"))
  }

  private def native(toks: DataFrame): DataFrame = toks
    .select(col("id"),
      SimHashKernel.simhash32(col("toks"), "").as("f1"),
      SimHashKernel.simhash32(col("toks"), "x").as("f2"))

  private def assertEqual(toks: DataFrame): Unit = {
    val joined = native(toks).join(portable(toks), "id")
    assert(joined.filter(col("f1") =!= col("p1") || col("f2") =!= col("p2")).count() == 0)
  }

  test("kernel == portable 32x-explode form on the documents corpus") {
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("id"),
        // TextExprs.toksE, inlined (private[ops])
        array_distinct(expr("regexp_extract_all(text, '[^ ]+', 0)")).as("toks"))
    assertEqual(toks)
    // sanity: fingerprints are non-trivial 32-bit values, not all zero
    val nz = native(toks).filter(col("f1") =!= 0L && col("f2") =!= 0L).count()
    assert(nz > 0)
  }

  test("edge arrays: single token, tie votes, multibyte, duplicates") {
    val rows = Seq(
      (1L, Seq("solitary")),                       // one token = its own majority
      (2L, Seq("a", "b")),                          // 2 voters → ties possible (tie = 0 bit)
      (3L, Seq("héllo", "wörld", "déjà")),          // multibyte UTF-8 through md5
      (4L, Seq("dup", "dup", "other")),             // duplicates vote twice, same both sides
      (5L, Seq("抽出", "テスト", "文字列")))
    val toks = spark.createDataFrame(rows).toDF("id", "toks")
    assertEqual(toks)
  }

  test("empty array → zero fingerprint; null array stays null") {
    val empty = spark.createDataFrame(Seq((1L, Seq.empty[String]))).toDF("id", "toks")
    val r = native(empty).head()
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L)
    val n = spark.createDataFrame(Seq(Tuple1(1L))).toDF("id")
      .select(SimHashKernel.simhash32(
        when(lit(false), array(lit("x"))), "").as("f"))
    assert(n.head().isNullAt(0))
  }

  test("row coverage: empty-token docs are excluded, as in the explode form") {
    // the portable/oracle form drops token-less docs (UNNEST of an empty
    // array emits no rows); the kernel path must filter them rather than
    // fingerprint them as (0,0) — else two empty docs become a Hamming-0
    // "near-dup" pair the oracle never reports. Inner-join equality can't
    // catch that; compare the doc SETS both directions.
    val rows = Seq(
      (1L, Seq("shared", "tokens", "here")),
      (2L, Seq("shared", "tokens", "here")),
      (3L, Seq.empty[String]),                       // no tokens at all
      (4L, Seq.empty[String]))                       // second empty doc
    val toks = spark.createDataFrame(rows).toDF("id", "toks")
    val kernelPath = native(toks.filter(size(col("toks")) > 0))  // as Dedup does
    val portablePath = portable(toks)
    assert(kernelPath.select("id").exceptAll(portablePath.select("id")).count() == 0)
    assert(portablePath.select("id").exceptAll(kernelPath.select("id")).count() == 0)
    assert(kernelPath.filter(col("id").isin(3L, 4L)).count() == 0)
  }

  test("SQL-registered name matches the Column API") {
    graft.functions.VectorKernels.ensureRegistered(spark)
    val d = spark.createDataFrame(Seq((1L, Seq("the", "quick", "brown"))))
      .toDF("id", "toks")
      .withColumn("via_sql", expr("graft_simhash32(toks, 'x')"))
      .withColumn("via_col", SimHashKernel.simhash32(col("toks"), "x"))
    assert(d.filter(col("via_sql") =!= col("via_col")).count() == 0)
  }
}
