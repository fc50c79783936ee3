package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** Skew-mitigated join: the manual salting pattern for hot keys.
  *
  * At 100 TB a handful of hot join keys (one viral user, one default
  * asset id) concentrate a shuffle partition onto one task and stall the
  * stage. AQE's skew-join split handles this for sort-merge joins, but
  * not for every shape (stream-static joins, aggregations keyed on the
  * hot key, pre-4.x clusters) — so the engine also carries the explicit
  * pattern: probe side salts its key into S sub-keys, build side
  * replicates each row S times (one per salt), the equi-join runs on
  * (key, salt), and results are provably identical to the unsalted join
  * while the hot key's rows spread across S tasks.
  *
  * Grounding: NS scale mandate; the declared query joins
  * lineitem ⋈ orders on orderkey with S=8 and aggregates — the oracle is
  * the PLAIN join, proving salt-equivalence.
  */
object SkewJoin {

  val SaltBuckets = 8

  /** Salt the probe side: deterministic sub-key in [0, S). The seq column
    * is null-coalesced so a null sequence value doesn't null the salt and
    * silently drop a row the plain join would keep (null KEYS are fine —
    * they match nothing in either formulation).
    */
  def saltProbe(df: DataFrame, key: String, seqCol: String): DataFrame =
    df.withColumn("_salt",
      pmod(col(key) + coalesce(col(seqCol), lit(0)), lit(SaltBuckets)).cast("int"))

  /** Replicate the build side once per salt value. */
  def replicateBuild(df: DataFrame): DataFrame =
    df.withColumn("_salt", explode(expr(s"sequence(0, ${SaltBuckets - 1})")))

  /** Declared query: salted lineitem ⋈ orders, revenue per order
    * priority — must equal the plain join (the oracle runs the plain
    * form).
    */
  private def joinSkewSalted(s: SparkSession, d: String): DataFrame = {
    val probe = saltProbe(
      lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_discount")),
      "l_orderkey", "l_linenumber")
    val build = replicateBuild(
      orders(s, d).select(col("o_orderkey"), col("o_orderpriority")))
    probe.join(build,
        probe("l_orderkey") === build("o_orderkey") &&
          probe("_salt") === build("_salt"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4))).cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_skew_salted" -> joinSkewSalted _,
  )

  val oracle: Map[String, String] = Map(
    "q_join_skew_salted" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
  )
}
