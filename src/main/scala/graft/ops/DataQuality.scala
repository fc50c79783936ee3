package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Data-quality / entity-resolution checks — the validation plane around
  * a data-lake registry (grounding: the reference's required-field
  * validation surface, lambda/aws-dl-fmwrk-source-system-api/
  * lambda_function.py:27-45, generalized from schema presence to content
  * quality).
  *
  * Scale notes (100 TB):
  *  - fuzzy lookup is a broadcast probe + one narrow codegen'd
  *    levenshtein map + TakeOrderedAndProject — the same shuffle-free
  *    shape as `q_sim_topk`, with edit distance standing in for cosine.
  *    At corpus scale the production path prunes first (length band,
  *    q-gram prefilter) and scores only candidates; the declared query
  *    is the exact-scoring spec.
  *  - the hour-spine completeness check generates the spine from a
  *    2-value global aggregate (broadcast), anti-ish left-joins the
  *    observed hours (tiny distinct set), and rolls up per day — every
  *    stage is bounded by calendar size, not data size.
  */
object DataQuality {

  /** Fuzzy point lookup: nearest customer names to a typo'd probe key by
    * levenshtein distance (integer — engine-exact), custkey tie-break.
    * The "find the entity despite the typo" shape of entity resolution.
    */
  private def fuzzyLookup(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select(col("c_custkey"), col("c_name"),
        levenshtein(col("c_name"), lit("Custoner#000000042")).as("dist"))
      .orderBy(col("dist").asc, col("c_custkey").asc)
      .limit(10)

  /** Ingestion-completeness check: for every day in the observed span,
    * how many hours have NO events — zero-filled so the output is one
    * row per calendar day at every data size.
    */
  private def dateGaps(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(date_trunc("hour", col("ts")).as("h"))
    val spine = e.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(explode(expr("sequence(lo, hi, INTERVAL 1 HOUR)")).as("h"))
    spine
      .join(e.distinct().withColumn("present", lit(1)), Seq("h"), "left")
      .groupBy(date_trunc("day", col("h")).cast("date").as("day"))
      .agg(sum(when(col("present").isNull, 1).otherwise(0)).as("n_missing_hours"))
      .orderBy(col("day"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fuzzy_lookup" -> fuzzyLookup _,
    "q_date_gaps"    -> dateGaps _,
  )

  val oracle: Map[String, String] = Map(
    "q_fuzzy_lookup" ->
      """SELECT c_custkey, c_name,
        |  CAST(levenshtein(c_name, 'Custoner#000000042') AS INT) AS dist
        |FROM customer ORDER BY dist ASC, c_custkey ASC LIMIT 10""".stripMargin,
    "q_date_gaps" ->
      """WITH e AS (SELECT DISTINCT date_trunc('hour', ts) AS h FROM events),
        |b AS (SELECT min(h) AS lo, max(h) AS hi FROM e),
        |spine AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b)
        |SELECT CAST(date_trunc('day', spine.h) AS DATE) AS day,
        |  CAST(sum(CASE WHEN e.h IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_hours
        |FROM spine LEFT JOIN e ON spine.h = e.h
        |GROUP BY day ORDER BY day""".stripMargin,
  )
}
