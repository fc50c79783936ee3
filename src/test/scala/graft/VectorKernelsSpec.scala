package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorKernels

/** The native vector kernels: correctness on known geometry, equivalence
  * with the portable higher-order-function fold (bit-for-bit), SQL-name
  * registration, and type checking.
  */
class VectorKernelsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val foldDot =
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"

  private def vecs = Seq(
    (Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),
    (Seq(0.1f, -0.2f, 0.3f), Seq(-0.4f, 0.5f, 0.125f)),
    (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f))).toDF("a", "b")

  test("graft_vec_dot matches the portable fold bit-for-bit") {
    VectorKernels.ensureRegistered(spark)
    val out = vecs.select(
      expr("graft_vec_dot(a, b)").as("native"), expr(foldDot).as("fold"))
      .as[(Double, Double)].collect()
    out.foreach { case (n, f) => assert(n == f) }
    assert(out.head._1 == (4.0 + 10.0 + 18.0))
  }

  test("graft_vec_cosine: parallel=1, orthogonal=0, and matches composed form") {
    VectorKernels.ensureRegistered(spark)
    val out = Seq((Seq(2f, 0f), Seq(5f, 0f)), (Seq(1f, 0f), Seq(0f, 3f)))
      .toDF("a", "b")
      .select(expr("graft_vec_cosine(a, b)")).as[Double].collect()
    assert(out(0) == 1.0 && out(1) == 0.0)
    val eq = vecs.select(
      expr("graft_vec_cosine(a, b)").as("native"),
      (expr("graft_vec_dot(a, b)") /
        (sqrt(expr("graft_vec_dot(a, a)")) * sqrt(expr("graft_vec_dot(b, b)")))).as("composed"))
      .as[(Double, Double)].collect()
    eq.foreach { case (n, c) => assert(n == c) }
  }

  test("null elements and length mismatches yield NULL, matching the fold") {
    VectorKernels.ensureRegistered(spark)
    val df = Seq(
      (Seq(Option(1f), None), Seq(Option(3f), Option(4f))),     // null element
      (Seq(Option(1f), Option(2f)), Seq(Option(3f), Option(4f))) // clean
    ).toDF("a", "b")
    val out = df.select(
      expr("graft_vec_dot(a, b)").as("native"), expr(foldDot).as("fold"))
      .as[(Option[Double], Option[Double])].collect()
    assert(out(0) == ((None, None)))
    assert(out(1)._1 == out(1)._2 && out(1)._1.contains(11.0))
    val mism = Seq((Seq(1f, 2f, 5f), Seq(3f, 4f))).toDF("a", "b")
      .select(expr("graft_vec_dot(a, b)")).as[Option[Double]].collect()
    assert(mism.head.isEmpty)
  }

  test("two kernel calls in one projection survive whole-stage codegen") {
    VectorKernels.ensureRegistered(spark)
    // non-nullable arrays exercise the shared-codegen-scope path that a
    // fixed local variable name would break (Janino redefinition error)
    val df = spark.range(100).selectExpr(
      "array(CAST(id AS FLOAT), CAST(id+1 AS FLOAT)) AS a",
      "array(CAST(id+2 AS FLOAT), CAST(id+3 AS FLOAT)) AS b")
    val out = df.selectExpr(
      "graft_vec_dot(a, b)", "graft_vec_dot(b, a)", "graft_vec_cosine(a, b)")
      .as[(Double, Double, Double)].collect()
    assert(out.length == 100)
    out.foreach { case (d1, d2, c) => assert(d1 == d2 && c <= 1.0 && c > 0.8) }
  }

  test("Column-based kernel API works without SQL registration") {
    val df = Seq((Seq(1f, 2f), Seq(3f, 4f))).toDF("a", "b")
    val out = df.select(VectorKernels.vecDot($"a", $"b")).as[Double].collect()
    assert(out.head == 11.0)
  }

  test("kernels reject non-float-array inputs at analysis time") {
    VectorKernels.ensureRegistered(spark)
    val bad = Seq((1, 2)).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(expr("graft_vec_dot(a, b)")).collect()
    }
  }

  test("GraftExtensions injects kernels into a fresh session") {
    val s2 = spark.newSession()
    new graft.functions.GraftExtensions()
    // same registry path as spark.sql.extensions config at session build
    VectorKernels.ensureRegistered(s2)
    import s2.implicits._
    val r = Seq((Seq(1f, 1f), Seq(1f, 1f))).toDF("a", "b")
      .select(expr("graft_vec_dot(a, b)")).as[Double].collect()
    assert(r.head == 2.0)
  }
}
