package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** SURVEY §2.2-G — sorts, limits, top-k, set operations, deduplication.
  *
  * Scale posture: ordered-limit compiles to TakeOrderedAndProject (per-
  * partition top-k + driver merge of k·partitions rows — no global sort);
  * set ops shuffle once on the full row; keyed dedup is the
  * row_number()==1 pattern (one shuffle on the dedup key) rather than
  * dropDuplicates (nondeterministic survivor).
  */
object SortSetOps {

  /** Multi-key sort: desc + asc_nulls_last + unique tie-break. */
  private def sortMulti(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .withColumn("bal_band",
        when(col("c_acctbal") < 0, lit(null: java.lang.Long))
          .otherwise(floor(col("c_acctbal") / 1000)))
      .select("c_custkey", "c_nationkey", "bal_band")
      .orderBy(col("c_nationkey").desc, col("bal_band").asc_nulls_last,
        col("c_custkey").asc)

  /** Ordered limit. */
  private def limit_(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select("o_orderkey", "o_orderdate", "o_totalprice")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .limit(15)

  /** Top-k by price (TakeOrderedAndProject). */
  private def topk(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** UNION ALL of two overlapping selections (duplicates preserved). */
  private def unionAll(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val a = o.filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderstatus")
    val b = o.filter(col("o_totalprice") > 350000)
      .select("o_orderkey", "o_orderstatus")
    a.union(b).orderBy("o_orderkey", "o_orderstatus")
  }

  /** Set UNION (distinct). */
  private def unionDistinct(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val a = o.filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderstatus")
    val b = o.filter(col("o_totalprice") > 350000)
      .select("o_orderkey", "o_orderstatus")
    a.union(b).distinct().orderBy("o_orderkey", "o_orderstatus")
  }

  /** INTERSECT of two key sets. */
  private def intersect_(s: SparkSession, d: String): DataFrame = {
    val building = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("key"))
    val highValue = orders(s, d).filter(col("o_totalprice") > 250000)
      .select(col("o_custkey").as("key"))
    building.intersect(highValue).orderBy("key")
  }

  /** EXCEPT (set difference, distinct semantics). */
  private def except_(s: SparkSession, d: String): DataFrame = {
    val building = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("key"))
    val highValue = orders(s, d).filter(col("o_totalprice") > 250000)
      .select(col("o_custkey").as("key"))
    building.except(highValue).orderBy("key")
  }

  /** DISTINCT rows over a projection. */
  private def distinctRows(s: SparkSession, d: String): DataFrame =
    customer(s, d).select("c_nationkey", "c_mktsegment").distinct()
      .orderBy("c_nationkey", "c_mktsegment")

  /** Keyed dedup with a deterministic survivor rule (min ts, then min
    * event_id) — NOT dropDuplicates, whose survivor is arbitrary.
    */
  private def dedupKeyed(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(date_trunc("second", col("ts")), col("event_id"))
    events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        date_trunc("second", col("ts")).as("ts"), col("value"))
      .orderBy("user_id", "event_type")
  }

  /** Schema-evolution union: an OLD batch lacking a column unions with a
    * NEW batch carrying it (`unionByName(allowMissingColumns = true)`) —
    * the lake-append shape right after a column is added. Missing values
    * surface as NULL by NAME, never positional misalignment (plain
    * `union` would zip columns by position and silently cross-wire).
    */
  private def unionEvolved(s: SparkSession, d: String): DataFrame = {
    val old = orders(s, d).filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
    val evolved = orders(s, d).filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    old.unionByName(evolved, allowMissingColumns = true)
      .groupBy(coalesce(col("o_orderpriority"), lit("(pre-evolution)"))
        .as("priority"))
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sum_keys"))
      .orderBy(col("priority"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_union_evolved"  -> unionEvolved _,
    "q_sort_multi"     -> sortMulti _,
    "q_limit"          -> limit_ _,
    "q_topk"           -> topk _,
    "q_union_all"      -> unionAll _,
    "q_union_distinct" -> unionDistinct _,
    "q_intersect"      -> intersect_ _,
    "q_except"         -> except_ _,
    "q_distinct_rows"  -> distinctRows _,
    "q_dedup_keyed"    -> dedupKeyed _,
  )

  val oracle: Map[String, String] = Map(
    "q_union_evolved" ->
      """WITH u AS (
        |  SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, o_orderpriority
        |  FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT coalesce(o_orderpriority, '(pre-evolution)') AS priority,
        |       count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS sum_keys
        |FROM u GROUP BY 1 ORDER BY priority""".stripMargin,
    "q_sort_multi" ->
      """SELECT c_custkey, c_nationkey,
        |  CASE WHEN c_acctbal < 0 THEN NULL ELSE CAST(floor(c_acctbal / 1000) AS BIGINT) END AS bal_band
        |FROM customer
        |ORDER BY c_nationkey DESC, bal_band ASC NULLS LAST, c_custkey ASC""".stripMargin,
    "q_limit" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
        |ORDER BY o_orderdate ASC, o_orderkey ASC LIMIT 15""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q_union_all" ->
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 350000
        |ORDER BY o_orderkey, o_orderstatus""".stripMargin,
    "q_union_distinct" ->
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
        |UNION
        |SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 350000
        |ORDER BY o_orderkey, o_orderstatus""".stripMargin,
    "q_intersect" ->
      """SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey AS key FROM orders WHERE o_totalprice > 250000
        |ORDER BY key""".stripMargin,
    "q_except" ->
      """SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT
        |SELECT o_custkey AS key FROM orders WHERE o_totalprice > 250000
        |ORDER BY key""".stripMargin,
    "q_distinct_rows" ->
      """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "q_dedup_keyed" ->
      """SELECT user_id, event_type, event_id, date_trunc('second', ts) AS ts, value
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |        ORDER BY date_trunc('second', ts), event_id) AS rn FROM events)
        |WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,
  )
}
