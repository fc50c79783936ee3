package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** SURVEY §2.2-C — projection / filter / predicate semantics.
  *
  * Grounding: the reference's echo-projection (lambda_function.py:68-73)
  * and key-predicate reads (:35-38); the full relational surface is the
  * north-star inventory. All predicates here are Catalyst `Column`
  * expressions → pushed into the parquet scan, never evaluated post-hoc.
  */
object Relational {

  /** Subset + rename + computed column. Money arithmetic is done in
    * decimal (exact, order-independent) and surfaced as double.
    */
  private def project(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(
      col("c_custkey").as("custkey"),
      col("c_name").as("name"),
      lower(col("c_mktsegment")).as("segment"),
      (col("c_acctbal").cast(DecimalType(12, 2)) * lit("1.1").cast(DecimalType(2, 1)))
        .cast("double").as("acctbal_uplift"))
      .orderBy("custkey")

  /** Compound predicates: AND/OR/NOT, BETWEEN, IN. */
  private def filterCompound(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(
        col("l_quantity").between(10, 20) &&
        col("l_returnflag").isin("A", "R") &&
        !(col("l_linestatus") === "O") &&
        (col("l_discount") < 0.03 || col("l_tax") > 0.06))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
        "l_discount", "l_tax")
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
      // order by every output column for a total order (identical dup
      // rows then hash the same regardless of relative order)
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
        "l_discount", "l_tax")

  /** Three-valued logic: `=` vs IS DISTINCT FROM (`<=>`) vs IS NULL over a
    * synthesized nullable column.
    */
  private def filterNullSemantics(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .withColumn("maybe",
        when(col("l_returnflag") === "N", lit(null: String))
          .otherwise(col("l_returnflag")))
      .agg(
        count(when(col("maybe") === "A", 1)).as("n_eq"),
        count(when(!(col("maybe") <=> lit("A")), 1)).as("n_distinct_from"),
        count(when(col("maybe").isNull, 1)).as("n_null"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_project"               -> project _,
    "q_filter_compound"       -> filterCompound _,
    "q_filter_null_semantics" -> filterNullSemantics _,
  )

  val oracle: Map[String, String] = Map(
    "q_project" ->
      """SELECT c_custkey AS custkey, c_name AS name, lower(c_mktsegment) AS segment,
        |  CAST(CAST(c_acctbal AS DECIMAL(12,2)) * CAST(1.1 AS DECIMAL(2,1)) AS DOUBLE) AS acctbal_uplift
        |FROM customer ORDER BY custkey""".stripMargin,
    "q_filter_compound" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_discount, l_tax
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20
        |  AND l_returnflag IN ('A','R')
        |  AND NOT (l_linestatus = 'O')
        |  AND (l_discount < 0.03 OR l_tax > 0.06)
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag, l_discount, l_tax""".stripMargin,
    "q_filter_null_semantics" ->
      """SELECT
        |  count(*) FILTER (maybe = 'A') AS n_eq,
        |  count(*) FILTER (maybe IS DISTINCT FROM 'A') AS n_distinct_from,
        |  count(*) FILTER (maybe IS NULL) AS n_null
        |FROM (SELECT CASE WHEN l_returnflag = 'N' THEN NULL ELSE l_returnflag END AS maybe
        |      FROM lineitem)""".stripMargin,
  )
}
