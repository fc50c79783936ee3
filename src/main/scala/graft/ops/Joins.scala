package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** SURVEY §2.2-D — every join shape.
  *
  * Scale posture: dimension tables (region 5 / nation 25 / supplier 100
  * rows at any sf) are always broadcast — no shuffle of the fact side.
  * Fact⋈fact joins (orders⋈customer, lineitem⋈orders) shuffle on the
  * join key and rely on AQE for skew; the as-of join is the union+window
  * formulation (single shuffle, O(n log n)) instead of the naive
  * per-row range join (O(n·m)).
  */
object Joins {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** Inner join: revenue per customer. Orders pre-aggregate by the join
    * key BEFORE the join (guide: aggregate before you shuffle) — the join
    * and downstream see |customers| rows instead of |orders|, and the
    * aggregation exchange carries partial (key, decimal, count) rows.
    * Identical values: c_custkey is the customer key, so grouping the
    * joined rows by (c_custkey, c_name) == grouping orders by o_custkey;
    * inner semantics drop unmatched keys on either side in both forms.
    */
  private def inner(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d); val c = customer(s, d)
    o.groupBy(col("o_custkey"))
      .agg(sum(dec(o("o_totalprice"))).as("rev0"), count(lit(1)).as("n_orders"))
      .join(c, col("o_custkey") === c("c_custkey"), "inner")
      .select(c("c_custkey"), c("c_name"),
        col("rev0").cast("double").as("revenue"), col("n_orders"))
      .orderBy("c_custkey")
  }

  /** Left outer: every customer, order count (0 when none).
    * NOTE (round-17 optimization pass): the [[inner]]-style pre-aggregation
    * was tried here and MEASURED WORSE at sf10 (same-box A/B min-of-N:
    * 13.2 s original vs 16.9 s pre-aggregated; the r16 idle record agrees
    * at 7.8 s) — unlike the inner key, this shape's join+aggregate
    * pipeline already runs the narrow sort-merge + exchange-free aggregate,
    * so the extra aggregation pass only added cost. Kept as measured.
    */
  private def left(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d); val o = orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(c("c_custkey"), c("c_name"))
      .agg(count(o("o_orderkey")).as("n_orders"),
        coalesce(sum(dec(o("o_totalprice"))).cast("double"), lit(0.0)).as("revenue"))
      .orderBy("c_custkey")
  }

  /** Right outer: mirror of left (orders on the left side). Same
    * round-17 note as [[left]]: pre-aggregation measured worse (9.6 s
    * original vs 13.6 s pre-aggregated at sf10, min-of-N) — kept as
    * measured.
    */
  private def right(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d); val c = customer(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"), "right")
      .groupBy(c("c_custkey"), c("c_name"))
      .agg(count(o("o_orderkey")).as("n_orders"),
        coalesce(sum(dec(o("o_totalprice"))).cast("double"), lit(0.0)).as("revenue"))
      .orderBy("c_custkey")
  }

  /** Full outer on deliberately part-disjoint key sets. */
  private def full(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).filter(col("c_custkey") < 800)
      .select(col("c_custkey"), col("c_name"))
    val o = orders(s, d).filter(col("o_custkey") >= 400)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    c.join(o, c("c_custkey") === o("o_custkey"), "full")
      .select(
        coalesce(c("c_custkey"), o("o_custkey")).as("key"),
        c("c_name").as("name"),
        o("n_orders").as("n_orders"))
      .orderBy("key")
  }

  /** Left semi = EXISTS. */
  private def semi(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d); val o = orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name").orderBy("c_custkey")
  }

  /** Left anti = NOT EXISTS (vs high-value orders, so the result is
    * non-empty — every customer has *some* order in this data).
    */
  private def anti(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val o = orders(s, d).filter(col("o_totalprice") > 300000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name").orderBy("c_custkey")
  }

  /** Cartesian product of the two smallest dims. */
  private def cross(s: SparkSession, d: String): DataFrame =
    region(s, d).crossJoin(nation(s, d))
      .select("r_regionkey", "r_name", "n_nationkey", "n_name")
      .orderBy("r_regionkey", "n_nationkey")

  /** Explicit broadcast hint on the dim side; rows identical to the
    * unhinted plan — the hint only pins the physical strategy.
    */
  private def bcast(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d); val n = nation(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "inner")
      .groupBy(n("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        sum(dec(c("c_acctbal"))).cast("double").as("sum_bal"))
      .orderBy("n_name")
  }

  /** Equi key + inequality residual. */
  private def theta(s: SparkSession, d: String): DataFrame = {
    val l = lineitem(s, d); val p = part(s, d)
    l.join(broadcast(p),
        l("l_partkey") === p("p_partkey") && l("l_extendedprice") > p("p_retailprice"),
        "inner")
      .groupBy(p("p_brand"))
      .agg(count(lit(1)).as("n"),
        sum(dec(l("l_extendedprice"))).cast("double").as("sum_price"))
      .orderBy("p_brand")
  }

  /** Interval self-join: same user, follower event within (ts, ts+5min].
    * Equi on user_id (hash-partitionable) + range residual; timestamps
    * second-truncated on both engines (ns vs µs parquet precision).
    */
  private def range(s: SparkSession, d: String): DataFrame = {
    val e1 = events(s, d).select(col("user_id").as("u1"),
      date_trunc("second", col("ts")).as("t1"))
    val e2 = events(s, d).select(col("user_id").as("u2"),
      date_trunc("second", col("ts")).as("t2"))
    e1.join(e2,
        col("u1") === col("u2") && col("t2") > col("t1") &&
        col("t2") <= col("t1") + expr("INTERVAL 5 MINUTES"), "inner")
      .groupBy(col("u1").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("user_id")
  }

  /** Binned range join — the scale pattern for range predicates with NO
    * equi key (where `q_join_range` leans on user_id, this pairs events
    * across ALL users). A naive plan is a nested-loop product; binning
    * time into window-width buckets turns it into an equi-join: the probe
    * side explodes into the ≤2 buckets its 60s window covers, the build
    * side keys by its own bucket, the join is hash/sort-merge on the
    * bucket, and the exact interval check is a residual filter. Each
    * qualifying pair is found exactly once (the follower's single bucket
    * is covered by exactly one of the probe's two). The oracle is the
    * declarative inequality join — proving the decomposition is lossless.
    */
  private def rangeBinned(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
      .select(col("event_type"), date_trunc("second", col("ts")).as("t"))
      .withColumn("se", unix_timestamp(col("t")))
    val probe = e.select(col("event_type"), col("se"),
      explode(array(expr("se div 60"), expr("se div 60 + 1"))).as("bin"))
    val build = e.select(col("se").as("se2"), expr("se2 div 60").as("bin"))
    probe.join(build, Seq("bin"))
      .filter(col("se2") > col("se") && col("se2") <= col("se") + 60)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("event_type"))
  }

  /** As-of join: for each purchase event, the latest same-user click at or
    * before it. Spark has no native as-of; the scalable formulation is the
    * union + last-ignoring-nulls window (one shuffle on user_id), not the
    * O(n·m) range join + re-aggregate.
    */
  private def asof(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"),
        date_trunc("second", col("ts")).as("ts"), col("event_type"))
    // RANGE frame (not ROWS): at larger scale factors a click and a
    // purchase can share the same truncated second; the range frame
    // includes all ts-peers regardless of event_id order, and max() makes
    // the pick order-independent — exactly the oracle's correlated max
    val w = Window.partitionBy("user_id").orderBy(col("ts"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("asof_click_ts",
        max(when(col("event_type") === "click", col("ts"))).over(w))
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "asof_click_ts")
      .orderBy("event_id")
  }

  /** The same as-of semantics through the NATIVE operator
    * (graft.plans.AsOfJoinExec: custom LogicalPlan + Strategy + one-pass
    * partition merge) instead of the composed window formulation —
    * two real tables, planner-inserted exchanges/sorts, O(1) merge state.
    */
  private def asofNative(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("event_id"), col("user_id"),
      date_trunc("second", col("ts")).as("ts"), col("event_type"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
    graft.plans.AsOf.join(s, purchases, clicks, "user_id", "ts", "click_ts")
      .toDF("event_id", "user_id", "ts", "r_user_id", "click_ts")
      .select("event_id", "user_id", "ts", "click_ts")
      .orderBy("event_id")
  }

  /** 4-way chain: lineitem ⋈ orders ⋈ customer ⋈ nation (Q5-ish). */
  private def multiway(s: SparkSession, d: String): DataFrame = {
    val l = lineitem(s, d); val o = orders(s, d)
    val c = customer(s, d); val n = nation(s, d)
    val rev = (l("l_extendedprice").cast(DecimalType(12, 2)) *
      (lit(1).cast(DecimalType(3, 2)) - l("l_discount").cast(DecimalType(4, 2))))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(n("n_name"))
      .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** Supplier-dimension revenue (TPC-H Q5/Q20 shape): lineitem ⋈ supplier
    * ⋈ nation, revenue per supplier nation — covers the one test table no
    * other key touches. nation (25 rows, SF-invariant) broadcasts
    * explicitly; supplier scales with SF so it takes the shuffle
    * equi-join (AQE still picks broadcast when a given SF's supplier fits
    * under the threshold — don't pin a hint that breaks at 100 TB).
    */
  private def supplierRevenue(s: SparkSession, d: String): DataFrame = {
    val l = lineitem(s, d); val su = supplier(s, d); val n = nation(s, d)
    val rev = (l("l_extendedprice").cast(DecimalType(12, 2)) *
      (lit(1).cast(DecimalType(3, 2)) - l("l_discount").cast(DecimalType(4, 2))))
    // lineitem pre-aggregates by the join key before the join (guide:
    // aggregate before you shuffle): the supplier join sees |suppliers|
    // partial rows, not |lineitem| — values identical because s_suppkey
    // is the supplier key (per-nation sums of per-supplier sums are the
    // same exact decimals; each joined partial row IS one distinct
    // supplier, so countDistinct is unchanged).
    l.groupBy(col("l_suppkey"))
      .agg(sum(rev).as("rev0"), count(lit(1)).as("n0"))
      .join(su, col("l_suppkey") === su("s_suppkey"))
      .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
      .groupBy(n("n_name"))
      .agg(sum(col("rev0")).cast("double").as("supp_revenue"),
        countDistinct(su("s_suppkey")).as("n_suppliers"),
        sum(col("n0")).as("n_items"))
      .orderBy("n_name")
  }

  /** Runtime bloom-filter semi-join reduction (the declared twin of the
    * PlanSpec injection assertion): a selective predicate on orders makes
    * Catalyst build a bloom filter over the surviving join keys and
    * evaluate it on the lineitem side BEFORE the shuffle — at 100 TB this
    * turns a fact⋈filtered-dim join from shuffle-bound into scan-bound,
    * with zero semantic change (the exact join still runs on the
    * survivors; false positives only cost bytes). Confs are scoped to a
    * CHILD SESSION (shared SparkContext, isolated SQLConf) so no other
    * query — concurrent or later — can ever observe them, and the plan
    * is executed eagerly inside the scope (injection happens at
    * execution-time optimization, so the scope must cover it); broadcast
    * is disabled so the shuffle join the filter exists for is actually
    * exercised.
    */
  private def bloomFiltered(s: SparkSession, d: String): DataFrame = {
    val s2 = s.newSession()
    Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
      .foreach { case (k, v) => s2.conf.set(k, v) }
    val l = lineitem(s2, d)
    val o = orders(s2, d).filter(col("o_orderpriority") === "1-URGENT")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(o("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(l("l_quantity").cast(DecimalType(12, 2))).cast("double").as("sum_qty"))
      .orderBy("o_orderpriority")
      .localCheckpoint(eager = true)
  }

  /** Null-safe equality join (`<=>`): NULL keys MATCH each other, where
    * `=` silently drops every row whose key is null — the semantics gap
    * that loses data when a nullable surrogate key joins. Keys are made
    * nullable by NULLIFing one nation; the rollup reports the null-match
    * population beside the regular matches.
    *
    * Scale design: a literal row-level `<=>` join is quadratic TWICE
    * over — the NULL bucket pairs every NULLed customer with every
    * NULLed supplier, and each non-null nation is itself an all-pairs
    * cross product (Σ|C_k|·|S_k| grows with SF², measured 643× and
    * then 165× on 100× data at sf10) — for a 2-row rollup that is pure
    * arithmetic per key. So both sides AGGREGATE FIRST (count + key-sum
    * per nullable key, one narrow scan + hash agg each), the `<=>` join
    * runs on the |keys|-row aggregates — null-safe matching exercised
    * exactly where the semantics live, NULL group included, still a
    * hash-partitionable equi-join to the planner — and the pair
    * population is recovered in CLOSED FORM: `n_pairs = n_c·n_s`,
    * `key_sum = n_s·Σc + n_c·Σs` (each custkey appears once per
    * matching supplier and vice versa), summed per null/non-null
    * bucket. Values are IDENTICAL to the row-level `<=>` join (same
    * oracle) at cost LINEAR in the data.
    */
  /** Row-level twin of [[nullsafe]], NOT a timed key: executes the
    * genuine many-to-many `<=>` join (every NULLed customer × every
    * NULLed supplier, plus the per-nation cross products) and rolls the
    * pairs up to the identical 2-row answer. Kept so the row-level
    * null-safe join EXECUTION path stays pinned in the suite (PlanSpec
    * asserts value equality with the closed-form plan) after the timed
    * key moved to aggregate-first arithmetic — fine at test SF,
    * quadratic at scale by construction.
    */
  private[graft] def nullsafeRowLevel(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(col("c_custkey"),
      expr("nullif(c_nationkey, 3)").as("ck"))
    val su = supplier(s, d).select(col("s_suppkey"),
      expr("nullif(s_nationkey, 3)").as("sk"))
    c.join(su, col("ck") <=> col("sk"))
      .groupBy(col("ck").isNull.as("null_key"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("c_custkey") + col("s_suppkey")).as("key_sum"))
      .orderBy(col("null_key"))
  }

  private def nullsafe(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(col("c_custkey"),
      expr("nullif(c_nationkey, 3)").as("ck"))
      .groupBy(col("ck"))
      .agg(count(lit(1)).as("n_c"), sum(col("c_custkey")).as("sum_c"))
    val su = supplier(s, d).select(col("s_suppkey"),
      expr("nullif(s_nationkey, 3)").as("sk"))
      .groupBy(col("sk"))
      .agg(count(lit(1)).as("n_s"), sum(col("s_suppkey")).as("sum_s"))
    c.join(su, col("ck") <=> col("sk"))
      .groupBy(col("ck").isNull.as("null_key"))
      .agg(sum(col("n_c") * col("n_s")).as("n_pairs"),
        sum(col("n_s") * col("sum_c") + col("n_c") * col("sum_s")).as("key_sum"))
      .orderBy(col("null_key"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_nullsafe"  -> nullsafe _,
    "q_join_inner"     -> inner _,
    "q_join_bloom_filtered" -> bloomFiltered _,
    "q_join_left"      -> left _,
    "q_join_right"     -> right _,
    "q_join_full"      -> full _,
    "q_join_semi"      -> semi _,
    "q_join_anti"      -> anti _,
    "q_join_cross"     -> cross _,
    "q_join_broadcast" -> bcast _,
    "q_join_theta"     -> theta _,
    "q_join_range"     -> range _,
    "q_join_range_binned" -> rangeBinned _,
    "q_join_asof"      -> asof _,
    "q_join_asof_native" -> asofNative _,
    "q_join_multiway"  -> multiway _,
    "q_supplier_revenue" -> supplierRevenue _,
  )

  val oracle: Map[String, String] = Map(
    "q_join_nullsafe" ->
      """SELECT c.ck IS NULL AS null_key, count(*) AS n_pairs,
        |  CAST(sum(c_custkey + s_suppkey) AS BIGINT) AS key_sum
        |FROM (SELECT c_custkey, nullif(c_nationkey, 3) AS ck FROM customer) c
        |JOIN (SELECT s_suppkey, nullif(s_nationkey, 3) AS sk FROM supplier) s
        |  ON c.ck IS NOT DISTINCT FROM s.sk
        |GROUP BY 1 ORDER BY null_key""".stripMargin,
    "q_join_bloom_filtered" ->
      """SELECT o.o_orderpriority, count(*) AS n_items,
        |  CAST(sum(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT'
        |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin,
    "q_join_inner" ->
      """SELECT c.c_custkey, c.c_name,
        |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_custkey, c.c_name ORDER BY c.c_custkey""".stripMargin,
    "q_join_left" ->
      """SELECT c.c_custkey, c.c_name, count(o.o_orderkey) AS n_orders,
        |  COALESCE(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS revenue
        |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY c.c_custkey, c.c_name ORDER BY c.c_custkey""".stripMargin,
    "q_join_right" ->
      """SELECT c.c_custkey, c.c_name, count(o.o_orderkey) AS n_orders,
        |  COALESCE(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS revenue
        |FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_custkey, c.c_name ORDER BY c.c_custkey""".stripMargin,
    "q_join_full" ->
      """SELECT COALESCE(c.c_custkey, o.o_custkey) AS key, c.c_name AS name, o.n_orders AS n_orders
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 800) c
        |FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders
        |                 WHERE o_custkey >= 400 GROUP BY o_custkey) o
        |ON c.c_custkey = o.o_custkey
        |ORDER BY key""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_cross" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin,
    "q_join_broadcast" ->
      """SELECT n.n_name, count(*) AS n_cust,
        |  CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,
    "q_join_theta" ->
      """SELECT p.p_brand, count(*) AS n,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem l JOIN part p
        |  ON l.l_partkey = p.p_partkey AND l.l_extendedprice > p.p_retailprice
        |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin,
    "q_join_range" ->
      """SELECT e1.u AS user_id, count(*) AS n_pairs
        |FROM (SELECT user_id AS u, date_trunc('second', ts) AS t FROM events) e1
        |JOIN (SELECT user_id AS u, date_trunc('second', ts) AS t FROM events) e2
        |  ON e1.u = e2.u AND e2.t > e1.t AND e2.t <= e1.t + INTERVAL 5 MINUTE
        |GROUP BY e1.u ORDER BY user_id""".stripMargin,
    "q_join_range_binned" ->
      """WITH e AS (SELECT event_type, date_trunc('second', ts) AS t FROM events)
        |SELECT a.event_type, count(*) AS n_pairs
        |FROM e a JOIN e b ON b.t > a.t AND b.t <= a.t + INTERVAL 60 SECOND
        |GROUP BY a.event_type ORDER BY a.event_type""".stripMargin,
    "q_join_asof_native" ->
      """WITH p AS (SELECT event_id, user_id, date_trunc('second', ts) AS ts
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, date_trunc('second', ts) AS click_ts
        |      FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.ts, c.click_ts
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts >= c.click_ts
        |ORDER BY p.event_id""".stripMargin,
    "q_join_asof" ->
      """SELECT p.event_id, p.user_id, date_trunc('second', p.ts) AS ts,
        |  (SELECT max(date_trunc('second', c.ts)) FROM events c
        |   WHERE c.user_id = p.user_id AND c.event_type = 'click'
        |     AND date_trunc('second', c.ts) <= date_trunc('second', p.ts)) AS asof_click_ts
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin,
    "q_join_multiway" ->
      """SELECT n.n_name,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
        |           (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,
    "q_supplier_revenue" ->
      """SELECT n.n_name,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
        |           (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS supp_revenue,
        |  count(DISTINCT s.s_suppkey) AS n_suppliers,
        |  count(*) AS n_items
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,
  )
}
