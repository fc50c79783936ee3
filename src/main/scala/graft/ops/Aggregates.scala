package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** SURVEY §2.2-E — aggregations. Two-phase hash aggregation (map-side
  * partial + final) is Catalyst's default; every query here groups on
  * low-cardinality keys so the shuffle after partial agg is tiny even at
  * 100 TB input.
  *
  * Determinism (SURVEY §7.3.3): money/quantity doubles are cast to
  * decimal per-row BEFORE summing (decimal sums are exact and
  * order-independent); per-row multi-column arithmetic is done in double
  * (IEEE-deterministic per row) then cast to decimal for the sum; final
  * outputs surfaced as double. Averages = exact decimal sum cast to
  * double, divided by count (one deterministic double division).
  */
object Aggregates {

  private def dec(c: String) = col(c).cast(DecimalType(18, 2))

  /** Flagship (M0): TPC-H Q1-style pricing summary — scan → filter →
    * groupBy(returnflag, linestatus) → 8 aggregates → sort.
    */
  def aggGroup(s: SparkSession, d: String): DataFrame = {
    // exact decimal per-row products (source doubles are 2dp money values,
    // so the 2dp casts are lossless; decimal × decimal stays exact)
    val ext  = col("l_extendedprice").cast(DecimalType(12, 2))
    val disc = col("l_discount").cast(DecimalType(4, 2))
    val tax  = col("l_tax").cast(DecimalType(4, 2))
    val one  = lit(1).cast(DecimalType(3, 2))
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        // ROUND the exact scale-4/6 decimal sums to 2dp BEFORE the double
        // cast: a scale-6 sum s converts through unscaled s*1e6, which
        // passes 2^53 around s≈9e9 — DuckDB's int128→double cast then
        // double-rounds while java BigDecimal rounds once, and the oracle
        // compare diverges in the last ulps (first seen at sf1). 2dp
        // keeps the conversion exact to s≈9e13 on both engines. ROUND,
        // not a rescaling cast: DuckDB's decimal downscale cast TRUNCATES
        // (1.006 → 1.00) while Spark's rounds — ROUND is half-up on both.
        round(sum(ext * (one - disc)), 2).cast("double").as("sum_disc_price"),
        round(sum(ext * (one - disc) * (one + tax)), 2).cast("double")
          .as("sum_charge"),
        (sum(dec("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec("l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
        (sum(dec("l_discount")).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Ungrouped global aggregate. */
  private def aggGlobal(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(
      sum(dec("l_extendedprice")).cast("double").as("sum_price"),
      (sum(dec("l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
      min(col("l_quantity")).as("min_qty"),
      max(col("l_quantity")).as("max_qty"),
      count(lit(1)).as("n"))

  /** HAVING: post-aggregation group filter. */
  private def aggHaving(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec("o_totalprice")).cast("double").as("revenue"))
      .filter(col("n_orders") >= 12)
      .orderBy("o_custkey")

  /** COUNT(DISTINCT) — Catalyst expands to two-phase distinct agg. */
  private def aggDistinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy((col("l_orderkey") % 10).as("bucket"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        count(lit(1)).as("n_rows"))
      .orderBy("bucket")

  /** HLL sketch distinct — engine-specific, no oracle (unit test asserts
    * ±5% of exact at all three SFs; SURVEY §2.2-E). rsd=0.02 sizes the
    * sketch so the ±5% product bound is a 2.5-sigma event instead of the
    * default 0.05's ONE-sigma — which at sf0.1's 1.5k-user cardinality
    * actually landed at 6.7% error. Cost: a ~32 KB fixed-size sketch per
    * column instead of ~4 KB — still constant-memory partial aggregation,
    * unchanged shuffle shape at any scale.
    */
  private def aggApproxDistinct(s: SparkSession, d: String): DataFrame =
    events(s, d).agg(
      approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
      approx_count_distinct(col("event_id"), 0.02).as("approx_events"))

  /** ROLLUP over nation × market segment. */
  private def aggRollup(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d); val n = nation(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
      .orderBy(col("gid"), col("n_name").asc_nulls_first,
        col("c_mktsegment").asc_nulls_first)
  }

  /** CUBE over order priority × status. Pre-aggregated: CUBE's Expand
    * replicates every input row 4× into the grouping exchange, so the
    * cube runs over the |priority×status|-row base aggregate instead of
    * the fact table — count/sum are associative (decimal partials stay
    * exact), a data-null grouping value is still its own group at both
    * levels, and grouping_id depends only on the grouping columns, so
    * values are identical (oracle-pinned) while the Expand touches ~15
    * rows at any scale.
    */
  private def aggCube(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n0"), sum(dec("o_totalprice")).as("rev0"))
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(sum(col("n0")).as("n"),
        sum(col("rev0")).cast("double").as("revenue"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)

  /** Explicit GROUPING SETS via the SQL surface. */
  private def aggGroupingSets(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d); val n = nation(s, d)
    // per-call unique view name, dropped once the plan is resolved (sql()
    // analyzes eagerly) — no shared mutable state on the session
    val view = s"v_cust_nation_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .createOrReplaceTempView(view)
    try s.sql(
      s"""SELECT n_name, c_mktsegment, count(*) AS n, grouping_id() AS gid
         |FROM $view
         |GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
         |ORDER BY gid, n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""".stripMargin)
    finally s.catalog.dropTempView(view): Unit
  }

  /** Pivot event_type → summed value columns per user bucket. */
  private def aggPivot(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy((col("user_id") % 10).as("bucket"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(sum(col("value").cast(DecimalType(12, 2))).cast("double"))
      .orderBy("bucket")

  /** argmax family: per return-flag, the orderkey holding the maximum
    * extended price — the deterministic formulation of `max_by`, whose
    * native tie behavior is UNDEFINED in both engines, so the tie rule
    * (smallest key among maxima) is explicit: per-group maxima broadcast
    * back, min key over the attaining rows. max() of shared doubles is
    * bit-exact cross-engine, so the equality probe is safe. Two bounded
    * aggregations + one broadcast join — no row-scale shuffle beyond the
    * group-by at any SF.
    */
  private def aggArgmax(s: SparkSession, d: String): DataFrame = {
    val l = lineitem(s, d)
    val m = l.groupBy(col("l_returnflag").as("rf"))
      .agg(max(col("l_extendedprice")).as("max_price"))
    l.join(broadcast(m),
        col("l_returnflag") === col("rf") &&
          col("l_extendedprice") === col("max_price"))
      .groupBy(col("l_returnflag"), col("max_price"))
      .agg(min(col("l_orderkey")).as("argmax_orderkey"))
      .orderBy(col("l_returnflag"))
  }

  /** Boolean aggregate family: universal/existential predicates and a
    * filtered count per group — the data-quality assertions every gate
    * expresses (`bool_and` = "all rows satisfy", `bool_or` = "any row
    * trips", `count_if` = "how many violate"). Predicates are exact
    * (integer/threshold comparisons), so no rounding is needed anywhere.
    */
  private def aggBool(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        bool_and(col("l_quantity") > 0).as("all_qty_pos"),
        bool_or(col("l_discount") > 0.05).as("any_big_disc"),
        count_if(col("l_tax") === 0).as("n_tax_free"))
      .orderBy("l_returnflag")

  /** Ordered string aggregation (the LISTAGG / string_agg reporting
    * shape): nation names per region, comma-joined. `collect_list` is
    * order-free by contract — parallelism decides arrival — so the
    * order is forced by `array_sort` BEFORE the join, making the string
    * deterministic at any partition count (names are ASCII, so binary
    * sort order agrees across engines).
    */
  private def aggString(s: SparkSession, d: String): DataFrame =
    nation(s, d).join(broadcast(region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(expr("array_join(array_sort(collect_list(n_name)), ',')").as("nations"),
        count(lit(1)).as("n_nations"))
      .orderBy(col("r_name"))

  /** The bounded-state twin of [[aggString]]: per group, the K
    * lexicographically-first members plus the TOTAL count — never the
    * whole group in one aggregation buffer. `collect_list` sees only the
    * rows the windowed rank admitted (the CASE yields null past K and
    * collect_list drops nulls), so group state is ≤ K regardless of
    * group size; the window sort itself spills, it does not buffer the
    * group in an agg cell. This is the escape hatch SCALING.md names for
    * `q_agg_string`'s O(group) `array_sort(collect_list)` memory — at
    * 100 TB a hot group would otherwise hold its whole membership on one
    * reducer.
    */
  private def aggStringCapped(s: SparkSession, d: String): DataFrame =
    nation(s, d).join(broadcast(region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .withColumn("rn",
        expr("row_number() OVER (PARTITION BY r_name ORDER BY n_name)"))
      .groupBy(col("r_name"))
      .agg(
        expr("array_join(array_sort(collect_list(CASE WHEN rn <= 3 THEN n_name END)), ',')")
          .as("top_nations"),
        count(lit(1)).as("n_nations"))
      .orderBy(col("r_name"))

  /** UNPIVOT (melt): the wide lineitem measures reshaped to long
    * (metric, value) rows — `pivot`'s inverse, the normalization step
    * before generic per-metric aggregation. `stack` is a Generate (narrow,
    * no shuffle); the only exchange is the 3-row metric rollup. Decimal
    * casts before the stack keep the sums engine-exact.
    */
  private def aggUnpivot(s: SparkSession, d: String): DataFrame =
    // aggregate-then-unpivot: stacking first generates 3× the fact rows
    // into the metric aggregation, but sum/count distribute over the
    // melt — one narrow pass computes the three decimal sums (map-side
    // partials, exact), and the stack melts the single aggregate row.
    // Values identical (oracle-pinned): per-metric n = count(*) because
    // stack emits every metric for every row, and each sum skips nulls
    // exactly as the per-metric sum did.
    lineitem(s, d)
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(12, 2))).as("s_qty"),
        sum(col("l_extendedprice").cast(DecimalType(12, 2))).as("s_price"),
        sum(col("l_discount").cast(DecimalType(12, 2))).as("s_disc"))
      .select(expr(
        """stack(3,
          |  'qty',   n, s_qty,
          |  'price', n, s_price,
          |  'disc',  n, s_disc) AS (metric, n, sum_dec)""".stripMargin))
      .select(col("metric"), col("n"), col("sum_dec").cast("double").as("sum_val"))
      .orderBy(col("metric"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_unpivot"         -> aggUnpivot _,
    "q_agg_string"          -> aggString _,
    "q_agg_string_capped"   -> aggStringCapped _,
    "q_agg_group"           -> aggGroup _,
    "q_agg_global"          -> aggGlobal _,
    "q_agg_having"          -> aggHaving _,
    "q_agg_distinct"        -> aggDistinct _,
    "q_agg_approx_distinct" -> aggApproxDistinct _,
    "q_agg_rollup"          -> aggRollup _,
    "q_agg_cube"            -> aggCube _,
    "q_agg_grouping_sets"   -> aggGroupingSets _,
    "q_agg_pivot"           -> aggPivot _,
    "q_agg_argmax"          -> aggArgmax _,
    "q_agg_bool"            -> aggBool _,
  )

  val oracle: Map[String, String] = Map(
    "q_agg_unpivot" ->
      """WITH long AS (
        |  SELECT 'qty' AS metric, CAST(l_quantity AS DECIMAL(12,2)) AS val FROM lineitem
        |  UNION ALL
        |  SELECT 'price', CAST(l_extendedprice AS DECIMAL(12,2)) FROM lineitem
        |  UNION ALL
        |  SELECT 'disc', CAST(l_discount AS DECIMAL(12,2)) FROM lineitem)
        |SELECT metric, count(*) AS n, CAST(sum(val) AS DOUBLE) AS sum_val
        |FROM long GROUP BY metric ORDER BY metric""".stripMargin,
    "q_agg_string" ->
      """SELECT r_name,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  count(*) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_agg_string_capped" ->
      """SELECT r_name,
        |  string_agg(CASE WHEN rn <= 3 THEN n_name END, ',' ORDER BY n_name) AS top_nations,
        |  count(*) AS n_nations
        |FROM (SELECT r_name, n_name,
        |        row_number() OVER (PARTITION BY r_name ORDER BY n_name) AS rn
        |      FROM nation JOIN region ON n_regionkey = r_regionkey)
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_global" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        |  min(l_quantity) AS min_qty,
        |  max(l_quantity) AS max_qty,
        |  count(*) AS n
        |FROM lineitem""".stripMargin,
    "q_agg_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 12
        |ORDER BY o_custkey""".stripMargin,
    "q_agg_distinct" ->
      """SELECT l_orderkey % 10 AS bucket, count(DISTINCT l_suppkey) AS n_supp, count(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_agg_rollup" ->
      """SELECT n_name, c_mktsegment, count(*) AS n, GROUPING_ID(n_name, c_mktsegment) AS gid
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY ROLLUP (n_name, c_mktsegment)
        |ORDER BY gid, n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""".stripMargin,
    "q_agg_cube" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  GROUPING_ID(o_orderpriority, o_orderstatus) AS gid
        |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
        |ORDER BY gid, o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin,
    "q_agg_grouping_sets" ->
      """SELECT n_name, c_mktsegment, count(*) AS n, GROUPING_ID(n_name, c_mktsegment) AS gid
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
        |ORDER BY gid, n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""".stripMargin,
    "q_agg_pivot" ->
      """SELECT user_id % 10 AS bucket,
        |  CAST(sum(CASE WHEN event_type='click' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS click,
        |  CAST(sum(CASE WHEN event_type='error' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS error,
        |  CAST(sum(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS purchase,
        |  CAST(sum(CASE WHEN event_type='signup' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS signup,
        |  CAST(sum(CASE WHEN event_type='view' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS view
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_agg_argmax" ->
      """WITH m AS (SELECT l_returnflag AS rf, max(l_extendedprice) AS max_price
        |           FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, max_price, min(l_orderkey) AS argmax_orderkey
        |FROM lineitem JOIN m ON l_returnflag = rf AND l_extendedprice = max_price
        |GROUP BY l_returnflag, max_price ORDER BY l_returnflag""".stripMargin,
    "q_agg_bool" ->
      """SELECT l_returnflag,
        |  bool_and(l_quantity > 0) AS all_qty_pos,
        |  bool_or(l_discount > 0.05) AS any_big_disc,
        |  CAST(count(*) FILTER (WHERE l_tax = 0) AS BIGINT) AS n_tax_free
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
