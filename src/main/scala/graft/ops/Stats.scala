package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Statistical aggregates (SURVEY §2.2-E extension): moments, correlation,
  * and exact interpolated percentiles. Grounding: NS analytics surface —
  * the quality/curation pipeline (cap outliers, score distributions)
  * needs distributional stats as first-class aggregates.
  *
  * Determinism note (SURVEY §7.3.3): stddev/var/corr/covar are
  * intrinsically floating-point; both engines use numerically stable
  * single-pass moment updates, so cross-engine drift is ≤ ulp-scale —
  * neutralized by rounding (2dp on magnitude-10⁴ outputs, 6dp on
  * unit-scale corr) and by grouping on a low-cardinality key so each
  * group's aggregation is over a large, well-conditioned set.
  *
  * Scale: both queries are single-shuffle partial+final aggregations on a
  * 3-value key; percentile is the only memory-heavy one (exact percentile
  * buffers per group — at 100 TB switch to approx_percentile with an
  * accuracy knob, same API shape).
  */
object Stats {

  private def aggStats(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
        round(var_samp(col("l_extendedprice")), 2).as("var_price"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qty_price"))
      .orderBy(col("l_returnflag"))

  /** Interpolated percentiles over DOUBLE money values drift by an ulp
    * between engines (different interpolation arithmetic), which flips
    * cent-rounding on boundary medians. Interpolating over integer CENTS
    * makes every step exact in binary double on both engines — identical
    * results regardless of each engine's formula — then rescales.
    */
  private def aggPercentile(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .withColumn("price_c", expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      .withColumn("qty_c", expr("CAST(round(l_quantity * 100) AS BIGINT)"))
      .groupBy(col("l_returnflag"))
      .agg(
        // three scalar columns, not one array column: list-typed outputs
        // crash the driver's pandas row-sort (round-1 red)
        round(expr("percentile(price_c, 0.25D)") / 100, 2).as("price_q25"),
        round(expr("percentile(price_c, 0.5D)") / 100, 2).as("price_q50"),
        round(expr("percentile(price_c, 0.75D)") / 100, 2).as("price_q75"),
        round(expr("percentile(qty_c, 0.5D)") / 100, 2).as("median_qty"))
      .orderBy(col("l_returnflag"))

  /** Distributed-exact percentile twin of `q_agg_percentile` (same output,
    * same oracle). `percentile()` buffers every value per group — with a
    * 3-value group key that is 3 giant buffers on 3 tasks, the same
    * cannot-scale-out shape as a global window. This formulation is the
    * canonical distributed exact percentile:
    *
    *   1. value histogram — groupBy (group, metric, CENTS value) count:
    *      the only pass over the raw data, shuffled on a HIGH-cardinality
    *      key, partial-agg combined map-side;
    *   2. cumulative ranks — a TWO-LEVEL prefix sum over the histogram:
    *      per-bucket subtotals (bucket = v div 2¹⁶) take a small window
    *      over ~hundreds of bucket rows, and the within-bucket running
    *      sum windows over partitions bounded by the bucket width — no
    *      single task ever sees a whole group's histogram, even when
    *      distinct values approach the key range (the cents histogram of
    *      a 100 TB price column is ~10⁷ rows per group; one flat window
    *      would put them all on one reducer). The composed rank
    *      `b_off + in_off` is integer-identical to the flat window;
    *   3. quartile targets — rank t = (n-1)·k/4 held as integer
    *      quarter-rank units (t, lo = t div 4, rem = t mod 4);
    *   4. bracketing join — the ≤12 target rows broadcast against the
    *      histogram (equi on group+metric, rank-range residual);
    *   5. interpolate v_lo + (v_hi − v_lo)·rem/4 — integers and a
    *      power-of-two divide, so the double is bit-identical to
    *      `percentile()`'s lower + (higher−lower)·frac.
    */
  private def aggPercentileDist(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val long = lineitem(s, d)
      .withColumn("price_c", expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      .withColumn("qty_c", expr("CAST(round(l_quantity * 100) AS BIGINT)"))
      .select(col("l_returnflag").as("g"),
        expr("stack(2, 'price', price_c, 'qty', qty_c) AS (metric, v)"))
    // ONE pass over the raw data: the histogram feeds both the cumulative
    // ranks and (re-aggregated) the per-key totals, so lineitem is
    // scanned once and the histogram shuffle is reused, not recomputed
    val hist0 = long.groupBy(col("g"), col("metric"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("bucket", expr("v div 65536"))
    // two-level prefix sum: bucket offsets (tiny window) + within-bucket
    // running sums (partitions bounded by the 2^16 bucket width)
    val bucketOffsets = hist0.groupBy(col("g"), col("metric"), col("bucket"))
      .agg(sum(col("cnt")).as("bcnt"))
      .withColumn("b_off", sum(col("bcnt")).over(
        Window.partitionBy(col("g"), col("metric")).orderBy(col("bucket")))
        - col("bcnt"))
      .select(col("g"), col("metric"), col("bucket"), col("b_off"))
    val hist = hist0
      .withColumn("in_off", sum(col("cnt")).over(
        Window.partitionBy(col("g"), col("metric"), col("bucket"))
          .orderBy(col("v"))))
      .join(broadcast(bucketOffsets), Seq("g", "metric", "bucket"))
      .withColumn("cum_hi", col("b_off") + col("in_off"))
      .withColumn("cum_lo", col("cum_hi") - col("cnt"))
    val targets = hist0.groupBy(col("g"), col("metric"))
      .agg(sum(col("cnt")).as("n"))
      .withColumn("k", explode(when(col("metric") === "price",
        typedlit(Seq(1, 2, 3))).otherwise(typedlit(Seq(2)))))
      .withColumn("t", (col("n") - 1) * col("k"))
      .withColumn("lo_rank", expr("t div 4"))
      .withColumn("rem", col("t") % 4)
      .withColumn("hi_rank", expr("CASE WHEN rem = 0 THEN t div 4 ELSE t div 4 + 1 END"))
    // one bracketing join resolves BOTH bounds: disjunctive rank-range
    // filter, then a conditional max per bound
    hist.join(broadcast(targets), Seq("g", "metric"))
      .filter((col("cum_lo") <= col("lo_rank") && col("lo_rank") < col("cum_hi")) ||
        (col("cum_lo") <= col("hi_rank") && col("hi_rank") < col("cum_hi")))
      .groupBy(col("g"), col("metric"), col("k"), col("rem"))
      .agg(
        max(when(col("cum_lo") <= col("lo_rank") && col("lo_rank") < col("cum_hi"),
          col("v"))).as("v_lo"),
        max(when(col("cum_lo") <= col("hi_rank") && col("hi_rank") < col("cum_hi"),
          col("v"))).as("v_hi"))
      .withColumn("r", round(
        (col("v_lo") + (col("v_hi") - col("v_lo")) * col("rem") / lit(4.0)) / 100, 2))
      .groupBy(col("g"))
      .agg(
        max(when(col("metric") === "price" && col("k") === 1, col("r"))).as("price_q25"),
        max(when(col("metric") === "price" && col("k") === 2, col("r"))).as("price_q50"),
        max(when(col("metric") === "price" && col("k") === 3, col("r"))).as("price_q75"),
        max(when(col("metric") === "qty" && col("k") === 2, col("r"))).as("median_qty"))
      .select(col("g").as("l_returnflag"), col("price_q25"), col("price_q50"),
        col("price_q75"), col("median_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** Deterministic mode (most frequent value) per group. The built-in
    * `mode()` breaks frequency ties arbitrarily in both engines — useless
    * for differential testing AND for reproducible pipelines — so the
    * declared formulation is count + rank with an explicit value
    * tie-break, which is simultaneously the distributed shape (two keyed
    * hash aggregations, no per-group buffering).
    */
  private def aggMode(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("l_returnflag"))
          .orderBy(col("n").desc, col("l_quantity").asc)))
      .filter(col("rk") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("n"))
      .orderBy(col("l_returnflag"))
  }

  /** Sketch percentile — the 100 TB operating point next to the exact
    * twins: `approx_percentile` keeps a FIXED-SIZE quantile summary per
    * group (accuracy knob 10000 ⇒ rank error ≤ n/10000) instead of
    * buffering every value, so the per-group memory is constant at any
    * scale and the aggregation stays a single partial+final shuffle.
    * The sketch is engine-specific (like the HLL key) → no DuckDB oracle;
    * ApproxPercentileSpec bounds it against the exact quartiles at two
    * scale factors.
    */
  private def aggApproxPercentile(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .withColumn("price_c", expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("approx_percentile(price_c, 0.25D, 10000)") / 100, 2).as("price_q25"),
        round(expr("approx_percentile(price_c, 0.5D, 10000)") / 100, 2).as("price_q50"),
        round(expr("approx_percentile(price_c, 0.75D, 10000)") / 100, 2).as("price_q75"))
      .orderBy(col("l_returnflag"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_stats"           -> aggStats _,
    "q_agg_percentile"      -> aggPercentile _,
    "q_agg_percentile_dist" -> aggPercentileDist _,
    "q_agg_approx_percentile" -> aggApproxPercentile _,
    "q_agg_mode"            -> aggMode _,
  )

  /** Count-min sketch over a keyed column — the point-frequency sketch
    * completing the approx trio beside HLL (`q_agg_approx_distinct`,
    * distincts) and the quantile sketch (`q_agg_approx_percentile`).
    * The SQL aggregate merges partial sketches map-side like any
    * aggregation, so building one is a single pass at any scale; the
    * returned bytes are the mergeable serialized form (union across
    * batches/partitions by construction). Deterministic for a fixed
    * seed. NOTE: terminal action — the sketch is a driver-side value by
    * design (kilobytes), like any aggregate a caller collects.
    * One-sided error: estimate ≥ true count, and ≤ true + eps·N with
    * probability `confidence` (CmSketchSpec pins the bound at 3 SFs).
    */
  def countMin(df: DataFrame, column: String, eps: Double,
      confidence: Double, seed: Int): Array[Byte] =
    df.agg(expr(s"count_min_sketch($column, CAST($eps AS DOUBLE), " +
        s"CAST($confidence AS DOUBLE), $seed)"))
      .collect()(0).getAs[Array[Byte]](0)

  /** Probe a serialized count-min sketch for an item's estimated count. */
  def cmsEstimate(sketch: Array[Byte], item: Long): Long =
    org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(sketch))
      .estimateCount(item)

  val oracle: Map[String, String] = Map(
    "q_agg_stats" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(stddev_samp(l_extendedprice), 2) AS sd_price,
        |  round(var_samp(l_extendedprice), 2) AS var_price,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.25) / 100, 2) AS price_q25,
        |  round(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5) / 100, 2) AS price_q50,
        |  round(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.75) / 100, 2) AS price_q75,
        |  round(quantile_cont(CAST(round(l_quantity * 100) AS BIGINT), 0.5) / 100, 2) AS median_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // the distributed twin must produce byte-identical results to the
    // buffered form — one oracle text, two physical strategies
    "q_agg_percentile_dist" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.25) / 100, 2) AS price_q25,
        |  round(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5) / 100, 2) AS price_q50,
        |  round(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.75) / 100, 2) AS price_q75,
        |  round(quantile_cont(CAST(round(l_quantity * 100) AS BIGINT), 0.5) / 100, 2) AS median_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_mode" ->
      """WITH c AS (
        |  SELECT l_returnflag, l_quantity, count(*) AS n
        |  FROM lineitem GROUP BY l_returnflag, l_quantity),
        |r AS (
        |  SELECT l_returnflag, l_quantity, n,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY n DESC, l_quantity ASC) AS rk
        |  FROM c)
        |SELECT l_returnflag, l_quantity AS mode_qty, n
        |FROM r WHERE rk = 1 ORDER BY l_returnflag""".stripMargin,
  )
}
