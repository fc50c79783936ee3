package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ShingleKernel

/** The native bottom-k shingle-md5 kernel must be row-for-row identical
  * to the portable HOF formulation it replaces (Text.fingerprintPortable)
  * — on the real corpus and on adversarial edge strings.
  */
class ShingleKernelSpec extends AnyFunSuite {
  import SparkTestSession._

  private def both(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("native", ShingleKernel.bottomKShingleMd5(col("text"), 5, 4))
    .withColumn("portable", graft.ops.Text.fingerprintPortable)

  test("kernel == portable HOF sketch on the documents corpus") {
    val d = both(spark.read.parquet(s"$sfDir/documents.parquet"))
    val diff = d.filter(col("native") =!= col("portable")).count()
    assert(diff == 0)
    // sanity: sketches are non-trivial (4 hex digests, pipe-joined)
    val sample = d.select(col("native")).head().getString(0)
    assert(sample.split('|').length == 4 && sample.length == 4 * 32 + 3)
  }

  test("edge strings: short, exact-width, duplicate shingles, multibyte") {
    val rows = Seq(
      "",                      // below width → empty sketch
      "abcd",                  // still below width
      "abcde",                 // exactly one shingle
      "aaaaaaaaaa",            // one distinct shingle repeated
      "ababababab",            // two distinct shingles alternating
      "héllo wörld déjà vu",   // multibyte chars — numChars, not bytes
      "抽出テスト用の日本語文字列です")
    val d = both(spark.createDataFrame(rows.map(Tuple1(_))).toDF("text"))
    assert(d.filter(col("native") =!= col("portable")).count() == 0)
    // the repeated-shingle case must collapse to ONE digest, proving the
    // buffer dedups rather than filling all 4 slots with copies
    val rep = both(spark.createDataFrame(Seq(Tuple1("aaaaaaaaaa"))).toDF("text"))
      .head().getString(1)
    assert(!rep.contains("|") && rep.length == 32)
  }

  test("SQL-registered name matches the Column API") {
    graft.functions.VectorKernels.ensureRegistered(spark)
    val d = spark.createDataFrame(Seq(Tuple1("the quick brown fox jumps")))
      .toDF("text")
      .withColumn("via_sql", expr("graft_bottomk_md5(text, 5, 4)"))
      .withColumn("via_col", ShingleKernel.bottomKShingleMd5(col("text"), 5, 4))
    assert(d.filter(col("via_sql") =!= col("via_col")).count() == 0)
  }

  test("null text stays null") {
    val d = spark.createDataFrame(Seq(Tuple1("x" * 10))).toDF("text")
      .select(ShingleKernel.bottomKShingleMd5(
        when(lit(false), col("text")), 5, 4).as("fp"))
    assert(d.head().isNullAt(0))
  }
}
