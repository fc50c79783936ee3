package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** SURVEY §2.2-F — window functions.
  *
  * Determinism: every window ORDER BY carries a unique tie-breaker
  * (o_orderkey / event_id); running money sums accumulate in decimal
  * (exact) and surface as double. Partition keys (customer, user) keep
  * state bounded per key at 100 TB; only `q_win_ntile` uses a global
  * (unpartitioned) window, which is inherently single-reducer — kept as
  * the semantics spec, with `q_win_ntile_dist` as the distributed
  * (broadcast-cutoff) formulation that actually runs at scale.
  */
object Windows {

  /** row_number / rank / dense_rank per customer by totalprice. */
  private def rank_(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders(s, d).select(
        col("o_orderkey"), col("o_custkey"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"))
      .orderBy("o_custkey", "rn")
  }

  /** lag/lead value deltas per user over event time. */
  private def lagLead(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(date_trunc("second", col("ts")), col("event_id"))
    events(s, d).select(
        col("event_id"), col("user_id"), col("value"),
        (col("value") - lag(col("value"), 1).over(w)).as("delta_prev"),
        (lead(col("value"), 1).over(w) - col("value")).as("delta_next"))
      .orderBy("event_id")
  }

  /** Running revenue per customer (exact decimal accumulation). */
  private def running(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast("double").as("running_rev"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** 3-row moving average of event value per user. */
  private def moving(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(date_trunc("second", col("ts")), col("event_id"))
      .rowsBetween(-2, 0)
    events(s, d).select(
        col("event_id"), col("user_id"),
        (sum(col("value").cast(DecimalType(12, 2))).over(w).cast("double") /
          count(col("value")).over(w)).as("moving_avg"))
      .orderBy("event_id")
  }

  /** Value-range frame: orders within $100 below the current price. */
  private def rangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"))
      .rangeBetween(-100L, 0L)
    orders(s, d).select(
        col("o_orderkey"), col("o_custkey"),
        count(lit(1)).over(w).as("n_in_range"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast("double").as("sum_in_range"))
      .orderBy("o_orderkey")
  }

  /** ntile / percent_rank / cume_dist over customers by balance.
    * Unpartitioned window: single-reducer by construction.
    */
  private def ntile_(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    customer(s, d).select(
        col("c_custkey"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy("c_custkey")
  }

  /** Distributed quartile assignment — the scale-safe formulation of
    * q_win_ntile (which stays as the rank-based semantics spec). Exact
    * percentile cutoffs over integer cents (one partial+final aggregation;
    * the cents trick from Stats.aggPercentile makes the interpolation
    * bit-identical across engines), broadcast to a narrow CASE map. No
    * global window, no single-reducer stage; at 100 TB swap `percentile`
    * for `approx_percentile` — the plan shape is unchanged. Buckets are
    * value-based (ties share a bucket), which is exactly the property that
    * makes the assignment order-independent and therefore distributable.
    */
  private def ntileDist(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
      .withColumn("bal_c", expr("CAST(round(c_acctbal * 100) AS BIGINT)"))
    val cuts = c.agg(
      expr("percentile(bal_c, 0.25D)").as("q1"),
      expr("percentile(bal_c, 0.5D)").as("q2"),
      expr("percentile(bal_c, 0.75D)").as("q3"))
    c.crossJoin(broadcast(cuts))
      .select(col("c_custkey"), col("c_acctbal"),
        (lit(1)
          + when(col("bal_c") > col("q1"), 1).otherwise(0)
          + when(col("bal_c") > col("q2"), 1).otherwise(0)
          + when(col("bal_c") > col("q3"), 1).otherwise(0)).as("quartile"))
      .orderBy("c_custkey")
  }

  /** first_value / last_value with an explicit full-partition frame. */
  private def firstLast(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(s, d).select(
        col("o_orderkey"), col("o_custkey"),
        first(col("o_orderkey")).over(w).as("first_ok"),
        last(col("o_orderkey")).over(w).as("last_ok"))
      .orderBy("o_orderkey")
  }

  /** cume_dist / percent_rank per customer by totalprice — the
    * relative-standing pair completing the ranking family. The window is
    * fully ordered (orderkey tiebreak), so both rationals are
    * deterministic; k/n and (rank-1)/(n-1) divide identically under IEEE
    * in both engines, rounded at the output edge. Same keyed-window
    * shuffle shape as q_win_rank — per-key state, no global sort.
    */
  private def cume(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders(s, d).select(
        col("o_orderkey"), col("o_custkey"),
        round(cume_dist().over(w), 6).as("cd"),
        round(percent_rank().over(w), 6).as("pr"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Gap-based sessionization: a session BREAKS when a user's gap from
    * the previous event exceeds 30 minutes; session id = running count
    * of breaks (the lag → flag → cumulative-sum composition every
    * funnel pipeline builds, and the id-assigning complement of the
    * `session_window` AGGREGATE in q_stream_session). One keyed-window
    * shuffle + one hash agg; per-user state only — scales like any keyed
    * window. Fully-ordered (event_id tiebreak) so ids are deterministic.
    */
  private def sessionize(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .withColumn("ts", date_trunc("second", col("ts")))
      .withColumn("brk",
        when(col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long") > 1800
          || lag(col("ts"), 1).over(w).isNull, 1).otherwise(0))
      .withColumn("sess_id", sum(col("brk")).over(run))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("sum_val"))
      .orderBy("user_id", "sess_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_win_sessionize"  -> sessionize _,
    "q_win_cume"        -> cume _,
    "q_win_rank"        -> rank_ _,
    "q_win_lag_lead"    -> lagLead _,
    "q_win_running"     -> running _,
    "q_win_moving"      -> moving _,
    "q_win_range_frame" -> rangeFrame _,
    "q_win_ntile"       -> ntile_ _,
    "q_win_ntile_dist"  -> ntileDist _,
    "q_win_first_last"  -> firstLast _,
  )

  val oracle: Map[String, String] = Map(
    "q_win_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, date_trunc('second', ts) AS ts, value
        |           FROM events),
        |f AS (SELECT user_id, event_id, ts, value,
        |        CASE WHEN lag(ts) OVER w IS NULL
        |               OR date_diff('second', lag(ts) OVER w, ts) > 1800
        |             THEN 1 ELSE 0 END AS brk
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT user_id, ts, value,
        |        CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        |      FROM f)
        |SELECT user_id, sess_id, min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_val
        |FROM g GROUP BY user_id, sess_id ORDER BY user_id, sess_id""".stripMargin,
    "q_win_cume" ->
      """SELECT o_orderkey, o_custkey,
        |  round(CUME_DIST() OVER w, 6) AS cd,
        |  round(PERCENT_RANK() OVER w, 6) AS pr
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_rank" ->
      """SELECT o_orderkey, o_custkey,
        |  ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
        |ORDER BY o_custkey, rn""".stripMargin,
    "q_win_lag_lead" ->
      """SELECT event_id, user_id, value,
        |  value - LAG(value, 1) OVER w AS delta_prev,
        |  LEAD(value, 1) OVER w - value AS delta_next
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY date_trunc('second', ts), event_id)
        |ORDER BY event_id""".stripMargin,
    "q_win_running" ->
      """SELECT o_orderkey, o_custkey, o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_rev
        |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q_win_moving" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) / COUNT(value) OVER w AS moving_avg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY date_trunc('second', ts), event_id
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q_win_range_frame" ->
      """SELECT o_orderkey, o_custkey, COUNT(*) OVER w AS n_in_range,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_in_range
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
        |             RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "q_win_ntile" ->
      """SELECT c_custkey, c_acctbal,
        |  NTILE(4) OVER w AS quartile, PERCENT_RANK() OVER w AS pr, CUME_DIST() OVER w AS cd
        |FROM customer
        |WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_custkey""".stripMargin,
    "q_win_ntile_dist" ->
      """WITH c AS (SELECT c_custkey, c_acctbal,
        |             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c FROM customer),
        |cuts AS (SELECT quantile_cont(bal_c, 0.25) AS q1, quantile_cont(bal_c, 0.5) AS q2,
        |                quantile_cont(bal_c, 0.75) AS q3 FROM c)
        |SELECT c_custkey, c_acctbal,
        |  CAST(1 + CAST(bal_c > q1 AS INT) + CAST(bal_c > q2 AS INT)
        |         + CAST(bal_c > q3 AS INT) AS INT) AS quartile
        |FROM c, cuts ORDER BY c_custkey""".stripMargin,
    "q_win_first_last" ->
      """SELECT o_orderkey, o_custkey,
        |  FIRST_VALUE(o_orderkey) OVER w AS first_ok,
        |  LAST_VALUE(o_orderkey) OVER w AS last_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,
  )
}
