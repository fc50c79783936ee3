package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{AsOf, AsOfJoinExec}

/** The native as-of join operator: merge semantics on hand-built frames
  * (match, no-match, key switch, multiple candidates → latest wins) and
  * physical-plan shape (AsOfJoinExec actually planned).
  */
class AsOfJoinSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val trades = Seq(
    (1L, 10L, ts("2026-01-01 10:00:05")),
    (2L, 10L, ts("2026-01-01 10:00:30")),
    (3L, 20L, ts("2026-01-01 10:00:10")),
    (4L, 30L, ts("2026-01-01 10:00:10"))   // no quotes for key 30
  ).toDF("trade_id", "sym", "t_ts")

  private val quotes = Seq(
    (10L, ts("2026-01-01 10:00:00"), 1.0),
    (10L, ts("2026-01-01 10:00:20"), 2.0),  // latest ≤ trade 2, after trade 1
    (10L, ts("2026-01-01 10:00:40"), 3.0),  // future — never matched
    (20L, ts("2026-01-01 10:00:10"), 5.0)   // equal ts — matches (≤)
  ).toDF("sym", "q_ts", "px")

  test("backward as-of: latest right row with ts <= left ts, per key") {
    val out = AsOf.join(spark, trades, quotes, "sym", "t_ts", "q_ts")
      .toDF("trade_id", "sym", "t_ts", "r_sym", "q_ts", "px")
      .select("trade_id", "px").as[(Long, Option[Double])]
      .collect().toMap
    assert(out == Map(
      1L -> Some(1.0),   // only the 10:00:00 quote is ≤ 10:00:05
      2L -> Some(2.0),   // 10:00:20 beats 10:00:00; 10:00:40 is future
      3L -> Some(5.0),   // equal timestamp matches
      4L -> None))       // key 30 has no quotes → null-extended
  }

  test("the plan contains the custom AsOfJoinExec operator") {
    val df = AsOf.join(spark, trades, quotes, "sym", "t_ts", "q_ts")
    val hasExec = df.queryExecution.executedPlan.collect {
      case e: AsOfJoinExec => e
    }.nonEmpty ||
      df.queryExecution.executedPlan.toString.contains("AsOfJoin")
    assert(hasExec)
  }

  test("as-of over empty right side null-extends every left row") {
    val out = AsOf.join(spark, trades, quotes.filter($"sym" === -1),
      "sym", "t_ts", "q_ts")
      .toDF("trade_id", "sym", "t_ts", "r_sym", "q_ts", "px")
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
    assert(out.size == 4 && out.values.forall(_.isEmpty))
  }
}
