package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Statistical aggregates (SURVEY §2.2-E extension): moments, correlation,
  * and exact interpolated percentiles. Grounding: NS analytics surface —
  * the quality/curation pipeline (cap outliers, score distributions)
  * needs distributional stats as first-class aggregates.
  *
  * Determinism note (SURVEY §7.3.3): stddev/var/corr/covar are
  * intrinsically floating-point; both engines use numerically stable
  * single-pass moment updates, so cross-engine drift is ≤ ulp-scale —
  * neutralized by rounding (2dp on magnitude-10⁴ outputs, 6dp on
  * unit-scale corr) and by grouping on a low-cardinality key so each
  * group's aggregation is over a large, well-conditioned set.
  *
  * Scale: both queries are single-shuffle partial+final aggregations on a
  * 3-value key; percentile is the only memory-heavy one (exact percentile
  * buffers per group — at 100 TB switch to approx_percentile with an
  * accuracy knob, same API shape).
  */
object Stats {

  private def aggStats(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
        round(var_samp(col("l_extendedprice")), 2).as("var_price"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qty_price"))
      .orderBy(col("l_returnflag"))

  /** Interpolated percentiles over DOUBLE money values drift by an ulp
    * between engines (different interpolation arithmetic), which flips
    * cent-rounding on boundary medians. Interpolating over integer CENTS
    * makes every step exact in binary double on both engines — identical
    * results regardless of each engine's formula — then rescales.
    */
  private def aggPercentile(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .withColumn("price_c", expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      .withColumn("qty_c", expr("CAST(round(l_quantity * 100) AS BIGINT)"))
      .groupBy(col("l_returnflag"))
      .agg(
        // three scalar columns, not one array column: list-typed outputs
        // crash the driver's pandas row-sort (round-1 red)
        round(expr("percentile(price_c, 0.25D)") / 100, 2).as("price_q25"),
        round(expr("percentile(price_c, 0.5D)") / 100, 2).as("price_q50"),
        round(expr("percentile(price_c, 0.75D)") / 100, 2).as("price_q75"),
        round(expr("percentile(qty_c, 0.5D)") / 100, 2).as("median_qty"))
      .orderBy(col("l_returnflag"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_stats"      -> aggStats _,
    "q_agg_percentile" -> aggPercentile _,
  )

  val oracle: Map[String, String] = Map(
    "q_agg_stats" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(stddev_samp(l_extendedprice), 2) AS sd_price,
        |  round(var_samp(l_extendedprice), 2) AS var_price,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.25) / 100, 2) AS price_q25,
        |  round(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5) / 100, 2) AS price_q50,
        |  round(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.75) / 100, 2) AS price_q75,
        |  round(quantile_cont(CAST(round(l_quantity * 100) AS BIGINT), 0.5) / 100, 2) AS median_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
