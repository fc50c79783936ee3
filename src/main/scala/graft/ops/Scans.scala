package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** SURVEY §2.2-B — scans with pushdown/pruning. The declared keys return
  * O(1) aggregate summaries so the measured cost is the scan itself.
  *
  * Grounding: the reference's data plane is file-based S3 landing zones
  * (cft/sourceSystem.yaml:20-27, path contract :77); our analog is
  * columnar parquet with Catalyst column pruning + predicate pushdown —
  * at 100 TB, `scan_pruned` must show PushedFilters + a 2-column
  * ReadSchema or it reads 50× too much data.
  */
object Scans {

  /** Full-scan checksum of the fact table. */
  private def scanParquet(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(
      count(lit(1)).as("n_rows"),
      sum(col("l_orderkey")).as("sum_okey"),
      sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"))

  /** Pruned scan: 2-column projection + shipdate range predicate, both of
    * which must reach the parquet reader.
    */
  private def scanPruned(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_shipdate"))
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_orderkey")).as("sum_okey"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double")
          .as("sum_price"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scan_parquet" -> scanParquet _,
    "scan_pruned"  -> scanPruned _,
  )

  val oracle: Map[String, String] = Map(
    "scan_parquet" ->
      """SELECT count(*) AS n_rows, CAST(sum(l_orderkey) AS BIGINT) AS sum_okey,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem""".stripMargin,
    "scan_pruned" ->
      """SELECT count(*) AS n_rows, CAST(sum(l_orderkey) AS BIGINT) AS sum_okey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'""".stripMargin,
  )
}
