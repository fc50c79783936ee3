package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** SURVEY §2.2-E — aggregations. Two-phase hash aggregation (map-side
  * partial + final) is Catalyst's default; every query here groups on
  * low-cardinality keys so the shuffle after partial agg is tiny even at
  * 100 TB input.
  *
  * Determinism (SURVEY §7.3.3): money/quantity doubles are cast to
  * decimal per-row BEFORE summing (decimal sums are exact and
  * order-independent); per-row multi-column arithmetic is done in double
  * (IEEE-deterministic per row) then cast to decimal for the sum; final
  * outputs surfaced as double. Averages = exact decimal sum cast to
  * double, divided by count (one deterministic double division).
  */
object Aggregates {

  private def dec(c: String) = col(c).cast(DecimalType(18, 2))

  /** Flagship (M0): TPC-H Q1-style pricing summary — scan → filter →
    * groupBy(returnflag, linestatus) → 8 aggregates → sort.
    */
  def aggGroup(s: SparkSession, d: String): DataFrame = {
    // exact decimal per-row products (source doubles are 2dp money values,
    // so the 2dp casts are lossless; decimal × decimal stays exact)
    val ext  = col("l_extendedprice").cast(DecimalType(12, 2))
    val disc = col("l_discount").cast(DecimalType(4, 2))
    val tax  = col("l_tax").cast(DecimalType(4, 2))
    val one  = lit(1).cast(DecimalType(3, 2))
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(ext * (one - disc)).cast("double").as("sum_disc_price"),
        sum(ext * (one - disc) * (one + tax)).cast("double").as("sum_charge"),
        (sum(dec("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec("l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
        (sum(dec("l_discount")).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Ungrouped global aggregate. */
  private def aggGlobal(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(
      sum(dec("l_extendedprice")).cast("double").as("sum_price"),
      (sum(dec("l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
      min(col("l_quantity")).as("min_qty"),
      max(col("l_quantity")).as("max_qty"),
      count(lit(1)).as("n"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_group"  -> aggGroup _,
    "q_agg_global" -> aggGlobal _,
  )

  val oracle: Map[String, String] = Map(
    "q_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_global" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        |  min(l_quantity) AS min_qty,
        |  max(l_quantity) AS max_qty,
        |  count(*) AS n
        |FROM lineitem""".stripMargin,
  )
}
