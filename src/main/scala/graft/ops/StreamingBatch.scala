package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** SURVEY §2.2-I (declared keys) — event-time windowing with batch
  * semantics on the bounded events table. The same expressions run
  * incrementally under Structured Streaming (see graft.stream.*); here
  * they execute as batch plans so the DuckDB oracle can check them.
  *
  * Grounding: the reference's event-driven ingestion topology
  * (cft/sourceSystem.yaml:29-63) — S3→SNS→lambda becomes file-source →
  * window agg → sink.
  *
  * All timestamps are second-truncated first (ns parquet vs µs Spark).
  */
object StreamingBatch {

  private def secTs = date_trunc("second", col("ts"))

  /** Tumbling 1-hour windows × event_type. */
  private def tumbling(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(secTs, "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("sum_val"))
      .select(col("w.start").as("ws"), col("w.end").as("we"),
        col("event_type"), col("n"), col("sum_val"))
      .orderBy("ws", "event_type")

  /** Sliding 1-hour windows every 30 minutes (each event in 2 windows). */
  private def sliding(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(secTs, "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"))
      .orderBy("ws", "event_type")

  /** Session windows: 10-minute inactivity gap per user.
    * Spark semantics: sessions MERGE when the next event's start is <=
    * the current session end (inclusive) — a gap of exactly 10min still
    * extends the session; only a strictly larger gap starts a new one.
    * The oracle's gaps-and-islands uses `>` accordingly.
    */
  private def session(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(session_window(secTs, "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("sum_val"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_val"))
      .orderBy("user_id", "session_start")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_tumbling" -> tumbling _,
    "q_stream_sliding"  -> sliding _,
    "q_stream_session"  -> session _,
  )

  val oracle: Map[String, String] = Map(
    "q_stream_tumbling" ->
      """SELECT date_trunc('hour', ts) AS ws,
        |       date_trunc('hour', ts) + INTERVAL 1 HOUR AS we,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_val
        |FROM (SELECT date_trunc('second', ts) AS ts, event_type, value FROM events)
        |GROUP BY 1, 2, 3 ORDER BY ws, event_type""".stripMargin,
    "q_stream_sliding" ->
      """WITH e AS (SELECT time_bucket(INTERVAL 30 MINUTE, CAST(date_trunc('second', ts) AS TIMESTAMP)) AS b,
        |                  event_type FROM events),
        |w AS (SELECT unnest([b, b - INTERVAL 30 MINUTE]) AS ws, event_type FROM e)
        |SELECT ws, event_type, count(*) AS n FROM w
        |GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin,
    "q_stream_session" ->
      """WITH e0 AS (SELECT user_id, date_trunc('second', ts) AS ts, value FROM events),
        |e AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN LAG(ts) OVER w IS NULL OR ts - LAG(ts) OVER w > INTERVAL 10 MINUTE
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM e0 WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM e)
        |SELECT user_id, min(ts) AS session_start,
        |       max(ts) + INTERVAL 10 MINUTE AS session_end,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_val
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
  )
}
