package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables._

/** SURVEY §2.2-J — the user-extension surface: scalar UDF, typed
  * Aggregator UDAF, and generator (UDTF-style row expansion).
  *
  * Production guidance (SURVEY §4.3): UDFs are black boxes to Catalyst —
  * they block codegen fusion and predicate pushdown — so built-ins are
  * preferred everywhere else in this engine; these queries exist to prove
  * the extension points work and stay oracle-consistent.
  */
object Extensibility {

  /** Scalar Scala UDF used inside a group-by (price banding). */
  private def udfScalar(s: SparkSession, d: String): DataFrame = {
    val priceBand = udf((p: Double) =>
      if (p < 100000) "low" else if (p < 300000) "mid" else "high")
    orders(s, d)
      .groupBy(priceBand(col("o_totalprice")).as("band"))
      .agg(count(lit(1)).as("n"))
      .orderBy("band")
  }

  /** Buffer for the geometric-mean Aggregator: Σln(x) and n. */
  case class GeoBuf(sumLog: Double, n: Long)

  /** Typed Aggregator UDAF: geometric mean via log-sum buffer (merge-able
    * across partitions — the map-side partials combine associatively).
    */
  object GeoMean extends Aggregator[Double, GeoBuf, Double] {
    def zero: GeoBuf = GeoBuf(0.0, 0L)
    def reduce(b: GeoBuf, x: Double): GeoBuf =
      GeoBuf(b.sumLog + math.log(x), b.n + 1)
    def merge(a: GeoBuf, b: GeoBuf): GeoBuf =
      GeoBuf(a.sumLog + b.sumLog, a.n + b.n)
    def finish(b: GeoBuf): Double =
      if (b.n == 0) Double.NaN else math.exp(b.sumLog / b.n)
    def bufferEncoder: Encoder[GeoBuf] = Encoders.product[GeoBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Geometric mean of extended price per return flag. Float-summation
    * order differs across engines, so the result is rounded to 4dp
    * (relative error of the log-sum is ~1e-15 — far inside the rounding).
    */
  private def udafCustom(s: SparkSession, d: String): DataFrame = {
    val geoMean = udaf(GeoMean)
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(round(geoMean(col("l_extendedprice")), 4).as("geo_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** Generator / UDTF surface: expand each order into k=1..(key%3+1)
    * rows via explode(sequence(...)).
    */
  private def udtfGenerate(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderkey") < 1000)
      .select(col("o_orderkey"),
        explode(sequence(lit(1L), col("o_orderkey") % 3 + 1)).as("seq_n"))
      .orderBy("o_orderkey", "seq_n")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_udf_scalar"    -> udfScalar _,
    "q_udaf_custom"   -> udafCustom _,
    "q_udtf_generate" -> udtfGenerate _,
  )

  val oracle: Map[String, String] = Map(
    "q_udf_scalar" ->
      """SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
        |            WHEN o_totalprice < 300000 THEN 'mid'
        |            ELSE 'high' END AS band,
        |  count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY band""".stripMargin,
    "q_udaf_custom" ->
      """SELECT l_returnflag, round(exp(avg(ln(l_extendedprice))), 4) AS geo_price, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_udtf_generate" ->
      """SELECT o_orderkey, unnest(range(1, o_orderkey % 3 + 2)) AS seq_n
        |FROM orders WHERE o_orderkey < 1000
        |ORDER BY o_orderkey, seq_n""".stripMargin,
  )
}
