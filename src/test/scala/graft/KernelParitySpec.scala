package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native `graft_hash_bucket` kernel must be BIT-IDENTICAL to the
  * portable md5-prefix formulation the DuckDB oracles keep — the draw
  * decides sample membership, so a single differing bucket silently
  * changes every sampler's output.
  */
class KernelParitySpec extends AnyFunSuite {
  import SparkTestSession._

  private val portable =
    "CAST(conv(substring(md5(%s), 1, 4), 16, 10) AS INT)"

  test("graft_hash_bucket equals the portable md5-prefix draw on every document") {
    graft.functions.VectorKernels.ensureRegistered(spark)
    val df = Tables.documents(spark, sfDir).select(
      expr("graft_hash_bucket(text)").as("k"),
      expr(portable.format("text")).as("p"))
    assert(df.filter(col("k") =!= col("p") || col("k").isNull).count() == 0)
    val mm = df.agg(min(col("k")), max(col("k"))).collect()(0)
    assert(mm.getInt(0) >= 0 && mm.getInt(1) < 65536)
  }

  test("graft_hash_bucket equals the portable draw on numeric keys cast to string") {
    graft.functions.VectorKernels.ensureRegistered(spark)
    val df = Tables.orders(spark, sfDir).select(
      expr("graft_hash_bucket(CAST(o_orderkey AS STRING))").as("k"),
      expr(portable.format("CAST(o_orderkey AS STRING)")).as("p"))
    assert(df.filter(col("k") =!= col("p")).count() == 0)
  }

  test("graft_hash_bucket propagates null and rejects non-string input") {
    graft.functions.VectorKernels.ensureRegistered(spark)
    import spark.implicits._
    val row = Seq(Option.empty[String], Some("x")).toDF("s")
      .select(expr("graft_hash_bucket(s)").as("k")).collect()
    assert(row.exists(_.isNullAt(0)) && row.exists(!_.isNullAt(0)))
    val err = intercept[Exception] {
      Seq(1).toDF("i").select(expr("graft_hash_bucket(i)")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
