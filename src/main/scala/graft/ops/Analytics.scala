package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Product-analytics shapes over the event stream — the ordered
  * conversion funnel and cohort retention. These are the two queries
  * every event-lake consumer runs daily; the reference's event plane
  * (cft/sourceSystem.yaml:29-63 routes landing events through SNS to the
  * data plane) implies exactly this consumption tier downstream.
  *
  * Scale posture: both queries reduce the event stream with ONE hash
  * aggregation keyed on `user_id` before anything else touches it — the
  * 100 TB event table collapses to one row (funnel) or one row per
  * active day (retention) per user, map-side partial aggregation doing
  * the heavy lifting. The retention self-join runs on the SAME key the
  * aggregate was shuffled on, so the exchange is reused, not repeated.
  * Timestamps are second-truncated first (ns parquet vs µs Spark —
  * same discipline as StreamingBatch).
  */
object Analytics {

  private def secTs = date_trunc("second", col("ts"))

  /** Ordered funnel view → click → purchase: a user reaches stage k only
    * if the k-th event's FIRST occurrence is strictly after the first
    * occurrence that qualified stage k-1 (min-timestamp ordering — the
    * standard "ordered funnel" semantics, deterministic because ties are
    * excluded by the strict inequality identically in both engines).
    * One pass: per-user conditional min timestamps, then a tiny stage
    * histogram. No self-join, no window — the event table is touched
    * exactly once.
    */
  private def funnel(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", secTs)).as("t_view"),
        min(when(col("event_type") === "click", secTs)).as("t_click"),
        min(when(col("event_type") === "purchase", secTs)).as("t_purchase"))
      .select(
        when(col("t_view").isNull, 0)
          .when(col("t_click").isNull || col("t_click") <= col("t_view"), 1)
          .when(col("t_purchase").isNull || col("t_purchase") <= col("t_click"), 2)
          .otherwise(3).as("stage"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("stage"))

  /** Cohort retention: cohort = calendar day of a user's first event;
    * report distinct users per (cohort, day-offset) at the canonical
    * offsets 0/1/7/14. The naive shape (distinct days, per-user min,
    * join back on user_id) shuffles the fact table twice — distinct
    * partitions on (user, day), the join needs (user). Instead ONE
    * aggregation keyed on user_id carries both the cohort (min day) and
    * the active-day set: `collect_set(day)` is bounded by the calendar
    * (≤ retention horizon, ~tens of entries), combines map-side, and
    * makes the offset computation a narrow explode — no join, no second
    * fact shuffle, at any corpus size.
    */
  private def retention(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort"), collect_set(col("day")).as("days"))
      .select(col("cohort"), explode(col("days")).as("day"))
      .select(col("cohort"), datediff(col("day"), col("cohort")).as("day_offset"))
      .filter(col("day_offset").isin(0, 1, 7, 14))
      .groupBy(col("cohort"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort"), col("day_offset"))

  /** Power-of-two minute bands as an explicit integer CASE ladder.
    * `2^ceil(log2(lag+1))` is the obvious spelling, but Spark computes
    * log2 as ln(x)/ln(2) — NOT exact at powers of two, so a lag of
    * exactly 8 minutes could band differently across engines. The
    * ladder is pure integer comparison; the calendar bounds it at 16
    * rungs. Shared verbatim with the oracle SQL.
    */
  private[ops] val lagBandSql: String =
    (0 to 16).map(k => s"WHEN lag_min < ${1L << k} THEN ${1L << k}")
      .mkString("CASE ", " ", s" ELSE ${1L << 17} END")

  /** Conversion lag: minutes from a user's FIRST view to their first
    * purchase after it, bucketed into power-of-two minute bands (how
    * long the funnel takes, not just whether it completes). Same
    * one-aggregation shape as the funnel; lag and band are integer
    * arithmetic on epoch seconds — engine-exact boundaries.
    */
  private def conversionLag(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view",
          unix_timestamp(secTs))).as("t_view"),
        min(when(col("event_type") === "purchase",
          unix_timestamp(secTs))).as("t_purchase"))
      .filter(col("t_view").isNotNull && col("t_purchase") > col("t_view"))
      .select(expr("(t_purchase - t_view) div 60").as("lag_min"))
      .select(expr(s"CAST($lagBandSql AS BIGINT)").as("lag_band_min"))
      .groupBy(col("lag_band_min"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("lag_band_min"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_funnel"     -> funnel _,
    "q_events_retention"  -> retention _,
    "q_events_conversion" -> conversionLag _,
  )

  val oracle: Map[String, String] = Map(
    "q_events_funnel" ->
      """WITH per_user AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view'
        |             THEN date_trunc('second', ts) END) AS t_view,
        |    min(CASE WHEN event_type = 'click'
        |             THEN date_trunc('second', ts) END) AS t_click,
        |    min(CASE WHEN event_type = 'purchase'
        |             THEN date_trunc('second', ts) END) AS t_purchase
        |  FROM events GROUP BY user_id)
        |SELECT stage, count(*) AS n_users FROM (
        |  SELECT CASE WHEN t_view IS NULL THEN 0
        |              WHEN t_click IS NULL OR t_click <= t_view THEN 1
        |              WHEN t_purchase IS NULL OR t_purchase <= t_click THEN 2
        |              ELSE 3 END AS stage
        |  FROM per_user) GROUP BY stage ORDER BY stage""".stripMargin,
    "q_events_conversion" ->
      s"""WITH per_user AS (
         |  SELECT user_id,
         |    -- epoch() is DOUBLE and DuckDB's // on doubles is plain
         |    -- division: cast to BIGINT first so // floors like Spark div
         |    min(CASE WHEN event_type = 'view'
         |             THEN CAST(epoch(date_trunc('second', ts)) AS BIGINT) END) AS t_view,
         |    min(CASE WHEN event_type = 'purchase'
         |             THEN CAST(epoch(date_trunc('second', ts)) AS BIGINT) END) AS t_purchase
         |  FROM events GROUP BY user_id),
         |lags AS (
         |  SELECT (t_purchase - t_view) // 60 AS lag_min
         |  FROM per_user
         |  WHERE t_view IS NOT NULL AND t_purchase > t_view)
         |SELECT CAST($lagBandSql AS BIGINT) AS lag_band_min, count(*) AS n_users
         |FROM lags GROUP BY 1 ORDER BY lag_band_min""".stripMargin,
    "q_events_retention" ->
      """WITH active AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        |  FROM events),
        |first AS (SELECT user_id, min(day) AS cohort FROM active GROUP BY user_id),
        |off AS (
        |  SELECT cohort, CAST(date_diff('day', cohort, day) AS INT) AS day_offset
        |  FROM active JOIN first USING (user_id))
        |SELECT cohort, day_offset, count(*) AS n_users
        |FROM off WHERE day_offset IN (0, 1, 7, 14)
        |GROUP BY cohort, day_offset
        |ORDER BY cohort, day_offset""".stripMargin,
  )
}
