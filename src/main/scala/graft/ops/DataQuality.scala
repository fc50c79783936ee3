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

  /** Referential-integrity audit: orphan fact keys per FK edge of the
    * lake's schema (the pre-training-run sanity gate — a join downstream
    * silently DROPS orphans, so they must be counted before they vanish).
    * Each edge is one left-anti join + global count: the anti join
    * shuffles on the key like any join and the output is one row per
    * edge — bounded by schema size, not data size.
    */
  private def dqReferential(s: SparkSession, d: String): DataFrame = {
    val checks = Seq(
      ("customer.c_nationkey -> nation.n_nationkey",
        customer(s, d), "c_nationkey", nation(s, d), "n_nationkey"),
      ("lineitem.l_orderkey -> orders.o_orderkey",
        lineitem(s, d), "l_orderkey", orders(s, d), "o_orderkey"),
      ("lineitem.l_suppkey -> supplier.s_suppkey",
        lineitem(s, d), "l_suppkey", supplier(s, d), "s_suppkey"),
      ("orders.o_custkey -> customer.c_custkey",
        orders(s, d), "o_custkey", customer(s, d), "c_custkey"))
    checks.map { case (rel, fact, fk, parent, pk) =>
      fact.select(col(fk).as("k"))
        .join(parent.select(col(pk).as("k")), Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .select(lit(rel).as("relation"), col("n_orphans"))
    }.reduce(_.unionByName(_)).orderBy(col("relation"))
  }

  /** Candidate-key uniqueness audit: rows vs distinct key values per
    * declared candidate key. Not vacuous on this corpus — lineitem's
    * composite (l_orderkey, l_linenumber) carries synthetic duplicates,
    * so `n_excess` is the duplication the dedup plane must absorb. One
    * partial+final distinct aggregation per key — single shuffle each.
    */
  private def dqUniqueness(s: SparkSession, d: String): DataFrame = {
    val checks = Seq(
      ("customer.c_custkey", customer(s, d), Seq("c_custkey")),
      ("lineitem.(l_orderkey,l_linenumber)", lineitem(s, d),
        Seq("l_orderkey", "l_linenumber")),
      ("orders.o_orderkey", orders(s, d), Seq("o_orderkey")))
    checks.map { case (name, df, cols) =>
      df.agg(count(lit(1)).as("n_rows"),
          countDistinct(col(cols.head), cols.tail.map(col): _*).as("n_distinct"))
        .select(lit(name).as("candidate_key"), col("n_rows"), col("n_distinct"),
          (col("n_rows") - col("n_distinct")).as("n_excess"))
    }.reduce(_.unionByName(_)).orderBy(col("candidate_key"))
  }

  /** Freshness audit: per order-priority stream, the newest record's
    * date and its lag in days behind the corpus watermark — "which feeds
    * are stale" measured against the data's own max, never the wall
    * clock (deterministic at every SF). Two bounded aggregations: a
    * per-key max and a 1-row global watermark broadcast back — O(keys)
    * output at any input size.
    */
  private def dqFreshness(s: SparkSession, d: String): DataFrame = {
    // midnight timestamps → explicit date cast keeps both engines in
    // calendar-day arithmetic (no boundary-crossing ambiguity)
    val o = orders(s, d).select(col("o_orderpriority"),
      col("o_orderdate").cast("date").as("od"))
    val wm = o.agg(max(col("od")).as("watermark"))
    o.groupBy(col("o_orderpriority"))
      .agg(max(col("od")).as("latest"))
      .crossJoin(broadcast(wm))
      .select(col("o_orderpriority"), col("latest"),
        datediff(col("watermark"), col("latest")).as("days_behind"))
      .orderBy(col("o_orderpriority"))
  }

  /** Three-sigma outlier audit per group — EXACT. Float mean/stddev
    * would make the |v−μ| > 3σ comparison engine-dependent for values
    * near the boundary (summation order alone shifts μ by ULPs), so the
    * test stays in integer arithmetic on cents. The naive
    * cross-multiplied form `(v·n − S)²·(n−1) > 9·n·(n·Q − S²)` is cubic
    * in n (overflows DECIMAL(38,0) near n ≈ 1e8 rows/group at ~1e7-cent
    * magnitudes), so the comparison is split: the per-GROUP threshold
    *
    *   K = ⌊3·σ·n⌋ = isqrt(⌊9·n·(n·Q − S²)/(n−1)⌋)
    *
    * is computed once per group (quadratic in n: n·Q and S² stay inside
    * DECIMAL(38,0) up to n ≈ 2e11 rows/group — ~sf100k, the 100 TB
    * point), and each row is flagged by the linear-in-n integer test
    * `|v·n − S| > K` — exactly ⇔ |v−μ| > 3σ because |v·n − S| is an
    * integer and K = ⌊3σn⌋. isqrt runs as plain column expressions
    * (double seed + two integer Newton steps + exact ±2 correction) on
    * the 3-row stats aggregate. Beyond the DECIMAL(38,0) envelope the
    * audit FAILS LOUDLY instead of undercounting: under ANSI the
    * overflow itself throws; under legacy null-on-overflow semantics
    * the explicit raise_error guard below fires.
    *
    * Shape: one 3-row stats aggregate (map-side combined) broadcast
    * back onto the unshuffled fact, flag per row, tiny rollup — the
    * fact table is never shuffled.
    */
  /** Per-row exact 3-sigma flag over `(g, v)` with v DECIMAL(38,0) —
    * the kernel of [[dqOutliers]], factored out so its integer-sqrt
    * threshold algebra is unit-testable against a BigInt brute force.
    * Returns the input plus `n`, `sv`, `kk` (the per-group ⌊3σn⌋
    * threshold) and `is_out`.
    */
  private[graft] def outlierFlags(c: DataFrame): DataFrame = {
    // exact floor-division of non-negative decimals: (a − a mod b)/b.
    // Decimal division keeps 6 fractional digits but the quotients here
    // are ≤ ~1e19 — far inside the 32 integer digits that survive.
    def fdiv(a: String, b: String) =
      s"CAST((($a) - pmod(($a), ($b))) / ($b) AS DECIMAL(38,0))"
    val two52 = "4503599627370496"   // doubles are exact below 2^52
    val stats = c.groupBy(col("g")).agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("v")).as("sv"),
        sum(expr("v * v")).as("sq"))
      // m = n·Q − S² = n(n−1)σ² ≥ 0 (Cauchy–Schwarz); the largest term anywhere
      .withColumn("m", expr("n * sq - sv * sv"))
      // ⌊T²⌋ with T² = 9nm/(n−1) = 9m + 9m/(n−1); 9m is an integer so the
      // floor lands only on the second term. NULL for n=1 (σ undefined).
      .withColumn("t2", expr(
        s"CASE WHEN n > 1 THEN 9 * m + ${fdiv("9 * m", "n - 1")} END"))
      // isqrt(t2): below 2^52 the double seed is exact to ±1; above, the
      // seed is inflated past the double rounding error (≤ ~1100 at 1e38)
      // so integer Newton converges from above in two steps
      .withColumn("k0", expr(
        s"CAST(floor(sqrt(CAST(t2 AS DOUBLE))) AS DECIMAL(38,0)) + " +
          s"CASE WHEN t2 >= $two52 THEN 4096 ELSE 0 END"))
      .withColumn("k1", expr(
        s"CASE WHEN t2 >= $two52 THEN ${fdiv(s"k0 + ${fdiv("t2", "k0")}", "2")} ELSE k0 END"))
      .withColumn("k2", expr(
        s"CASE WHEN t2 >= $two52 THEN ${fdiv(s"k1 + ${fdiv("t2", "k1")}", "2")} ELSE k1 END"))
      .withColumn("kk", expr(
        """CASE WHEN t2 IS NULL THEN NULL
          |     WHEN (k2 + 1) * (k2 + 1) <= t2 THEN k2 + 1
          |     WHEN k2 * k2 <= t2 THEN k2
          |     WHEN (k2 - 1) * (k2 - 1) <= t2 THEN k2 - 1
          |     ELSE k2 - 2 END""".stripMargin))
      .select(col("g"), col("n"), col("sv"), col("kk"))
    c.join(broadcast(stats), Seq("g"))
      .withColumn("d", expr("abs(v * n - sv)"))
      .withColumn("is_out", expr(
        """CASE WHEN n <= 1 THEN false
          |     WHEN d IS NULL OR kk IS NULL
          |       THEN raise_error('q_dq_outliers: DECIMAL(38,0) overflow — group too large for the exact 3-sigma audit')
          |     ELSE d > kk END""".stripMargin))
  }

  private def dqOutliers(s: SparkSession, d: String): DataFrame = {
    val c = lineitem(s, d).select(col("l_returnflag").as("g"),
      expr("CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))").as("v"))
    outlierFlags(c)
      .groupBy(col("g"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("is_out"), 1L).otherwise(0L)).as("n_outliers"),
        min(when(col("is_out"), col("v"))).cast("bigint").as("min_out_cents"),
        max(when(col("is_out"), col("v"))).cast("bigint").as("max_out_cents"))
      .select(col("g").as("l_returnflag"), col("n_rows"), col("n_outliers"),
        col("min_out_cents"), col("max_out_cents"))
      .orderBy(col("l_returnflag"))
  }

  /** Ingestion-rate anomaly audit: hours whose event count runs 20%+
    * above the trailing-24-observed-hour average — the feed-health alarm
    * beside `q_date_gaps`' completeness check. The raw stream collapses
    * to ONE hourly rollup first (calendar-bounded: ≤ 8,760 rows/year
    * however large the corpus), so the trailing window runs over
    * metadata-scale data; the spike test cross-multiplies
    * (`cnt·20 > trailing_sum`, i.e. cnt > 1.2·mean) — pure BIGINT, no
    * float average to disagree on. Requires a full 24-hour lookback
    * before judging (the first day is calibration).
    */
  private def dqAnomaly(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("h")).rowsBetween(-24, -1)
    hourly
      .withColumn("trail_sum", sum(col("cnt")).over(w))
      .withColumn("n_trail", count(col("cnt")).over(w))
      .filter(col("n_trail") === 24 &&
        col("cnt") * 20 > col("trail_sum"))
      .select(col("h"), col("cnt"), col("trail_sum"))
      .orderBy(col("h"))
  }

  /** Ingestion cast-safety audit: `try_cast` the untyped string column
    * to its target type, counting rejects instead of failing the batch —
    * the reject-row pattern of every typed-landing pipeline (a plain
    * CAST either throws under ANSI or silently nulls without a count).
    * A deterministic third of the synthesized feed is corrupted with a
    * non-numeric prefix; the audit reports rejects and the checksum of
    * what parsed. Narrow per-row map + small rollup.
    */
  private def dqCastSafety(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .withColumn("raw", expr(
        "CASE WHEN o_orderkey % 3 = 0 THEN 'id-' || CAST(o_orderkey AS STRING) " +
          "ELSE CAST(o_orderkey AS STRING) END"))
      .withColumn("parsed", expr("try_cast(raw AS BIGINT)"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("parsed").isNull, 1L).otherwise(0L)).as("n_rejected"),
        sum(col("parsed")).as("sum_parsed"))
      .orderBy(col("o_orderpriority"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dq_cast_safety" -> dqCastSafety _,
    "q_dq_anomaly"     -> dqAnomaly _,
    "q_fuzzy_lookup"   -> fuzzyLookup _,
    "q_date_gaps"      -> dateGaps _,
    "q_dq_referential" -> dqReferential _,
    "q_dq_uniqueness"  -> dqUniqueness _,
    "q_dq_freshness"   -> dqFreshness _,
    "q_dq_outliers"    -> dqOutliers _,
  )

  val oracle: Map[String, String] = Map(
    "q_dq_freshness" ->
      """WITH o AS (SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS od FROM orders),
        |wm AS (SELECT max(od) AS watermark FROM o)
        |SELECT o_orderpriority, max(od) AS latest,
        |  CAST(date_diff('day', max(od), (SELECT watermark FROM wm)) AS INT) AS days_behind
        |FROM o GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_fuzzy_lookup" ->
      """SELECT c_custkey, c_name,
        |  CAST(levenshtein(c_name, 'Custoner#000000042') AS INT) AS dist
        |FROM customer ORDER BY dist ASC, c_custkey ASC LIMIT 10""".stripMargin,
    "q_dq_referential" ->
      """SELECT * FROM (
        |  SELECT 'customer.c_nationkey -> nation.n_nationkey' AS relation,
        |    (SELECT count(*) FROM customer c
        |     WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS n_orphans
        |  UNION ALL
        |  SELECT 'lineitem.l_orderkey -> orders.o_orderkey',
        |    (SELECT count(*) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |  UNION ALL
        |  SELECT 'lineitem.l_suppkey -> supplier.s_suppkey',
        |    (SELECT count(*) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
        |  UNION ALL
        |  SELECT 'orders.o_custkey -> customer.c_custkey',
        |    (SELECT count(*) FROM orders o
        |     WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |) ORDER BY relation""".stripMargin,
    "q_dq_uniqueness" ->
      """SELECT * FROM (
        |  SELECT 'customer.c_custkey' AS candidate_key, count(*) AS n_rows,
        |    count(DISTINCT c_custkey) AS n_distinct,
        |    count(*) - count(DISTINCT c_custkey) AS n_excess
        |  FROM customer
        |  UNION ALL
        |  SELECT 'lineitem.(l_orderkey,l_linenumber)', count(*),
        |    count(DISTINCT (l_orderkey, l_linenumber)),
        |    count(*) - count(DISTINCT (l_orderkey, l_linenumber))
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'orders.o_orderkey', count(*),
        |    count(DISTINCT o_orderkey),
        |    count(*) - count(DISTINCT o_orderkey)
        |  FROM orders
        |) ORDER BY candidate_key""".stripMargin,
    "q_dq_cast_safety" ->
      """WITH t AS (
        |  SELECT o_orderpriority,
        |    TRY_CAST(CASE WHEN o_orderkey % 3 = 0
        |                  THEN 'id-' || CAST(o_orderkey AS VARCHAR)
        |                  ELSE CAST(o_orderkey AS VARCHAR) END AS BIGINT) AS parsed
        |  FROM orders)
        |SELECT o_orderpriority, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN parsed IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_rejected,
        |  CAST(sum(parsed) AS BIGINT) AS sum_parsed
        |FROM t GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_dq_anomaly" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS h, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |win AS (
        |  SELECT h, cnt,
        |    sum(cnt) OVER (ORDER BY h ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
        |      AS trail_sum,
        |    count(cnt) OVER (ORDER BY h ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
        |      AS n_trail
        |  FROM hourly)
        |SELECT h, cnt, CAST(trail_sum AS BIGINT) AS trail_sum
        |FROM win WHERE n_trail = 24 AND cnt * 20 > trail_sum
        |ORDER BY h""".stripMargin,
    "q_dq_outliers" ->
      """WITH c AS (
        |  SELECT l_returnflag AS g,
        |    CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS HUGEINT) AS v
        |  FROM lineitem),
        |st AS (
        |  SELECT g, CAST(count(*) AS HUGEINT) AS n, sum(v) AS sv, sum(v * v) AS sq
        |  FROM c GROUP BY g),
        |flagged AS (
        |  SELECT c.g, v,
        |    (v * n - sv) * (v * n - sv) * (n - 1) > 9 * n * (n * sq - sv * sv) AS is_out
        |  FROM c JOIN st ON c.g = st.g)
        |SELECT g AS l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN is_out THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  CAST(min(CASE WHEN is_out THEN v END) AS BIGINT) AS min_out_cents,
        |  CAST(max(CASE WHEN is_out THEN v END) AS BIGINT) AS max_out_cents
        |FROM flagged GROUP BY g ORDER BY g""".stripMargin,
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
