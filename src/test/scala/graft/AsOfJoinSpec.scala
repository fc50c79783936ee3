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

  test("string keys survive the sorter's buffer reuse (matchKey is copied)") {
    // many string keys force multiple right rows through the reused
    // UnsafeRow buffer; each left row must still get ITS key's quote
    val n = 50
    val lts = ts("2026-01-01 10:00:30")
    val rts = ts("2026-01-01 10:00:00")
    val l = (1 to n).map(i => (i.toLong, f"sym$i%03d", lts)).toDF("trade_id", "sym", "t_ts")
    val r = (1 to n).map(i => (f"sym$i%03d", rts, i.toDouble)).toDF("sym", "q_ts", "px")
    val out = AsOf.join(spark, l, r, "sym", "t_ts", "q_ts")
      .toDF("trade_id", "sym", "t_ts", "r_sym", "q_ts", "px")
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
    assert(out.size == n)
    (1 to n).foreach(i => assert(out(i.toLong) == Some(i.toDouble), s"trade $i"))
  }

  test("null keys and null timestamps match nothing and do not crash") {
    val l = Seq(
      (1L, Option(10L), Option(ts("2026-01-01 10:00:30"))),
      (2L, None: Option[Long], Option(ts("2026-01-01 10:00:30"))),  // null key
      (3L, Option(10L), None: Option[Timestamp])                    // null ts
    ).toDF("trade_id", "sym", "t_ts")
    val r = Seq(
      (Option(10L), Option(ts("2026-01-01 10:00:00")), 1.0),
      (None: Option[Long], Option(ts("2026-01-01 09:00:00")), 9.0), // null key row
      (Option(10L), None: Option[Timestamp], 8.0)                   // null ts row
    ).toDF("sym", "q_ts", "px")
    val out = AsOf.join(spark, l, r, "sym", "t_ts", "q_ts")
      .toDF("trade_id", "sym", "t_ts", "r_sym", "q_ts", "px")
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
    assert(out == Map(1L -> Some(1.0), 2L -> None, 3L -> None))
  }

  test("as-of over empty right side null-extends every left row") {
    val out = AsOf.join(spark, trades, quotes.filter($"sym" === -1),
      "sym", "t_ts", "q_ts")
      .toDF("trade_id", "sym", "t_ts", "r_sym", "q_ts", "px")
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
    assert(out.size == 4 && out.values.forall(_.isEmpty))
  }
}
