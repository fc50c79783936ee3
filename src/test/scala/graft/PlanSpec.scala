package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions for the scale-critical queries.
  *
  * CORRECTNESS proves the right rows come back at test SF; these tests
  * prove the PLAN is the one that survives a 100× scale-up — filters and
  * projections reach the parquet reader, small sides broadcast, the
  * distributed ntile really has no single-reducer window, top-k never
  * sorts the full relation, and exact dedup is one hash shuffle rather
  * than a join. A regression that silently flips one of these (a lost
  * pushdown after a refactor, a broadcast that becomes a shuffle) passes
  * the value oracle but fails here.
  */
class PlanSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir

  /** Plan string including the initial adaptive plan (pre-execution). */
  private def planStr(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Plan string with AQE off: whole-stage-codegen stages are only
    * collapsed into the printed plan pre-execution when AQE is disabled
    * (under AQE they appear per query stage at runtime), so codegen
    * assertions must read the non-adaptive plan.
    */
  private def planStrNoAqe(build: => DataFrame): String = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try planStr(build)
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sfDir)

  private val joinNodes =
    "SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|CartesianProduct|BroadcastNestedLoopJoin".r

  test("q_sql_catalog_table: catalog-addressed join broadcasts the dims like the view twin") {
    // the V2 catalog must not cost plan quality: nation/region (25/5
    // rows) broadcast, and the scans are Spark's parquet V2 reader over
    // the snapshot file lists (BatchScan), not some opaque relation
    val p = planStr(q("q_sql_catalog_table"))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"both dims should broadcast through the catalog:\n$p")
    assert(p.contains("BatchScan"), s"catalog reads must be V2 batch scans:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffle join for 25-row dims:\n$p")
  }

  test("scan_pruned pushes the shipdate predicate into the parquet scan") {
    val p = planStr(q("scan_pruned"))
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate") ||
      p.contains("GreaterThanOrEqual(`l_shipdate`"), s"shipdate filter not pushed:\n$p")
  }

  test("scan_pruned reads only the 3 referenced columns (column pruning)") {
    val p = planStr(q("scan_pruned"))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema:")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_extendedprice")
      && readSchema.contains("l_shipdate"), readSchema)
    // the fat columns must NOT be read
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_quantity"),
      s"unpruned scan: $readSchema")
  }

  test("q_join_broadcast plans a broadcast hash join (no shuffle of the fact side)") {
    val p = planStr(q("q_join_broadcast"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"dim join fell back to shuffle:\n$p")
  }

  test("q_agg_argmax broadcasts the per-group maxima back (no fact-fact shuffle join)") {
    val p = planStr(q("q_agg_argmax"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"maxima probe fell back to shuffle:\n$p")
  }

  test("q_pii_scrub / q_text_normalize are pure narrow maps (no join, no mid-plan agg)") {
    for (name <- Seq("q_pii_scrub", "q_text_normalize")) {
      val p = planStr(q(name))
      assert(joinNodes.findFirstIn(p).isEmpty, s"$name grew a join:\n$p")
      assert(!p.contains("HashAggregate"), s"$name grew an aggregate:\n$p")
    }
  }

  test("q_win_ntile_dist has no window operator at all (cutoffs broadcast to a narrow map)") {
    val p = planStr(q("q_win_ntile_dist"))
    assert(!p.contains("Window"), s"distributed ntile regressed to a window:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"cutoffs not broadcast:\n$p")
  }

  test("q_topk / q_sim_topk plan TakeOrderedAndProject (never a full global sort)") {
    for (name <- Seq("q_topk", "q_sim_topk")) {
      val p = planStr(q(name))
      assert(p.contains("TakeOrderedAndProject"), s"$name sorts globally:\n$p")
    }
  }

  test("q_sim_dot runs the native kernels inside whole-stage codegen") {
    val p = planStrNoAqe(q("q_sim_dot"))
    assert(p.contains("graft_vec_dot") && p.contains("graft_vec_cosine"), p)
    // the projection evaluating the kernels must be codegen'd (starred) —
    // a doGenCode regression (e.g. Janino compile failure) silently falls
    // back to interpreted eval and drops the star
    val kernelLine = p.linesIterator.find(_.contains("graft_vec_dot")).getOrElse("")
    assert(kernelLine.contains("*("), s"kernel projection not codegen'd: $kernelLine")
  }

  test("q_doc_dedup_exact is a single hash aggregation — no join anywhere") {
    val p = planStr(q("q_doc_dedup_exact"))
    assert(joinNodes.findFirstIn(p).isEmpty, s"exact dedup grew a join:\n$p")
    assert(p.contains("HashAggregate"), p)
  }

  test("q_agg_group aggregates map-side first (partial + final HashAggregate)") {
    val p = planStr(q("q_agg_group"))
    val nAggs = "HashAggregate".r.findAllIn(p).size
    assert(nAggs >= 2, s"no partial aggregation ($nAggs HashAggregate nodes):\n$p")
    assert(p.contains("partial_"), s"no map-side combine:\n$p")
  }

  test("q_join_skew_salted joins on the salted key and never goes cartesian") {
    val p = planStr(q("q_join_skew_salted"))
    assert(p.contains("_salt"), s"salt column missing from plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"salted join planned as a product:\n$p")
  }

  test("q_join_bucketed sort-merge-joins with ZERO exchange (bucket co-location)") {
    // force the SMJ path (at test SF the planner would broadcast instead,
    // which is also shuffle-free but not the property under test)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = planStr(q("q_join_bucketed"))
      assert(p.contains("SortMergeJoin"), p)
      // no Exchange may feed the join: both sides read pre-bucketed
      val afterJoin = p.substring(p.indexOf("SortMergeJoin"))
      assert(!afterJoin.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$p")
      assert(afterJoin.contains("SelectedBucketsCount") || afterJoin.contains("Bucketed: true"),
        s"scan is not bucket-aware:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q_dedup_minhash / q_dedup_simhash candidate joins are equi-joins, not products") {
    for (name <- Seq("q_dedup_minhash", "q_dedup_simhash")) {
      val p = planStr(q(name))
      assert(!p.contains("CartesianProduct"),
        s"$name regressed to all-pairs:\n$p")
    }
  }

  test("q_sample_stratified prunes the per-group rank below the sort (WindowGroupLimit)") {
    val p = planStr(q("q_sample_stratified"))
    assert(p.contains("WindowGroupLimit"),
      s"rank<=k filter not pushed below the window sort:\n$p")
  }

  test("q_ann_lsh probe is join-free: narrow signature map + top-k, no shuffle join") {
    // the declared query localCheckpoints the shared signature subplan
    // (plan becomes an opaque RDD scan), so assert on the uncached pipeline
    val p = planStr(graft.ops.Similarity.lshProbe(
      graft.ops.Similarity.lshSignatures(spark, sfDir)))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"LSH probe grew a shuffle join:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"probe sorts globally:\n$p")
  }

  test("q_join_range_binned equi-joins on the bin — never a nested-loop product") {
    val p = planStr(q("q_join_range_binned"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"binned range join regressed to a product:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"no equi join on the bin:\n$p")
  }

  private def withConfs(confs: (String, String)*)(body: => Unit): Unit = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed shuffle join at runtime (automatic complement to manual salting)") {
    // one hot key holds ~90% of the probe side; with the skew thresholds
    // scaled down to test size, AQE must mark the sort-merge join
    // skew-handled after execution — the runtime behavior q_join_skew_salted
    // encodes manually, proven live
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      import org.apache.spark.sql.functions._
      val left = spark.range(200000).select(
        when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id")).as("k"), col("id").as("v"))
      val right = spark.range(100).select(col("id").as("k"), col("id").as("w"))
      val joined = left.join(right, "k")
      // collect() (not count()) so THIS plan executes and finalizes its
      // adaptive stages. Hot key 0: 180000 ids with id%10!=0 plus id=0
      // itself; cold keys: ids 10..90 step 10 land in right's 0..99 range
      assert(joined.collect().length == 180001 + 9)
      val p = planStr(joined)
      assert(p.contains("skew=true"), s"AQE did not split the skewed partition:\n$p")
    }
  }

  test("dynamic partition pruning: a selective dim filter prunes the fact's partitions") {
    // the partition-layout complement to the bloom filter below: when the
    // fact is PARTITIONED on the join key, the dim-side filter turns into
    // a partition predicate at runtime and unselected partition DIRECTORIES
    // are never opened — at 100 TB the difference between scanning one
    // day's partitions and scanning the lake
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    stream.Stateful.deleteOnExit(new java.io.File(dir))
    spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    // the dim must NOT be constant-foldable (a literal dim collapses into
    // a static partition filter before DPP ever runs), so it comes off
    // disk with a runtime filter
    import spark.implicits._
    Seq(("click", 1L), ("view", 0L)).toDF("etype", "w")
      .write.mode("overwrite").parquet(s"$dir-dim")
    val dim = spark.read.parquet(s"$dir-dim").filter(col("w") === 1L)
    withConfs(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10000") {
      val joined = fact.join(dim, fact("event_type") === dim("etype"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val p = planStr(joined)
      assert(p.contains("dynamicpruning"),
        s"no dynamic partition pruning in the plan:\n$p")
      // and the pruned plan still computes the right thing
      assert(joined.collect().map(r => r.getString(0)).toSeq == Seq("click"))
    }
  }

  test("runtime bloom filter from the selective dim side prunes the fact scan") {
    // a selective filter on orders injects a bloom filter evaluated on the
    // lineitem side BEFORE the join — the runtime row-pruning that makes a
    // 100 TB fact⋈filtered-dim join scan-bound instead of shuffle-bound
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB") {
      import org.apache.spark.sql.functions._
      val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") && p.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n$p")
    }
  }

  test("q_events_funnel / q_events_retention touch the event table exactly once, join-free") {
    for (key <- Seq("q_events_funnel", "q_events_retention")) {
      val p = planStr(q(key))
      assert(joinNodes.findFirstIn(p).isEmpty, s"$key has a join:\n$p")
      assert(!p.contains("Window"), s"$key has a window operator:\n$p")
      // one scan of events, one fact-sized exchange (on user_id); the
      // remaining exchanges move post-aggregate row counts only
      assert(p.linesIterator.count(_.contains("FileScan")) == 1,
        s"$key scans events more than once:\n$p")
      assert(p.linesIterator.count(_.contains("Exchange hashpartitioning(user_id")) == 1,
        s"$key must shuffle the fact side exactly once:\n$p")
      // that shuffle is fed by a map-side partial aggregate
      assert(p.contains("partial_min"), s"$key lost map-side combine:\n$p")
    }
  }

  test("q_heavy_hitters reads the corpus once; the total broadcasts against the vocabulary") {
    val p = planStr(q("q_heavy_hitters"))
    // the global total is sum() over the histogram, not a second corpus
    // scan — ReuseExchange collapses the shared subplan post-execution,
    // but even pre-AQE the plan must not contain a second Generate/scan
    // pair beyond the reused aggregate subtree feeding both consumers
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"threshold side not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"q_heavy_hitters must never shuffle-join or go cartesian:\n$p")
    val df = q("q_heavy_hitters")
    df.collect()
    val reused = df.queryExecution.executedPlan.toString
    assert(reused.contains("ReusedExchange") ||
      reused.linesIterator.count(_.contains("FileScan")) == 1,
      s"corpus scanned twice (exchange not reused):\n$reused")
  }

  test("q_dq_outliers: stats broadcast back, the fact side never shuffles before the flag") {
    val p = planStr(q("q_dq_outliers"))
    assert(p.contains("BroadcastHashJoin"), s"stats not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"fact side shuffled for the stats join:\n$p")
  }

  test("q_dq_anomaly aggregates to hours BEFORE any window runs") {
    // the trailing window must see the calendar-bounded hourly rollup,
    // never raw events: in the plan tree the (single-partition, tiny)
    // window sits strictly ABOVE the hash aggregate on the hour key
    val p = planStr(q("q_dq_anomaly"))
    val lines = p.linesIterator.toSeq
    val winAt = lines.indexWhere(_.contains("Window"))
    val aggAt = lines.indexWhere(_.contains("HashAggregate"))
    assert(winAt >= 0 && aggAt > winAt,
      s"window not fed by the hourly pre-aggregation:\n$p")
  }

  test("q_sql_lateral decorrelates: ranked window + equi-join, never a nested loop") {
    // a correlated LATERAL (ORDER BY … LIMIT) naively executes as a
    // per-outer-row subquery — a nested loop over the fact table.
    // Catalyst must rewrite it to a ranked window (WindowGroupLimit
    // prunes below the sort) joined back on the correlation key.
    val p = planStr(q("q_sql_lateral"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"LATERAL fell back to a nested loop:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"rank filter not pruned below the sort:\n$p")
  }

  test("q_agg_percentile_dist: no window ever partitions on (g, metric) alone over the value histogram") {
    // the cumulative rank must be the two-level form: within-bucket
    // windows partition by (g, metric, bucket) — bounded by the 2^16
    // bucket width — and only the tiny bucket-subtotal window runs on
    // (g, metric). A flat window over the histogram would put a whole
    // group's distinct values on one reducer at 100 TB.
    val p = planStr(q("q_agg_percentile_dist"))
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty, s"no window found:\n$p")
    val overValues = windows.filter(_.contains("v#"))
    assert(overValues.nonEmpty, "expected a within-bucket window ordered by v")
    assert(overValues.forall(_.contains("bucket")),
      s"value-ordered window not bucket-partitioned:\n${overValues.mkString("\n")}")
  }

  test("q_sample_weighted: acceptance filter is a narrow map over an unshuffled fact side") {
    // walk the plan TREE, not the printed lines: print order of the BNLJ's
    // children is a formatting choice, and a line-sliced window can go
    // vacuously empty under an AQE/plan-print change
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val top = q("q_sample_weighted").queryExecution.executedPlan
    val plan = top match {   // collect() does not descend into the AQE wrapper
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    val bnljs = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(bnljs.nonEmpty, s"one-row max not broadcast:\n$plan")
    // the streamed (fact) child must carry no shuffle below the join: the
    // sample is decided row-local, the only shuffle is the post-filter rollup
    bnljs.foreach { j =>
      val streamed = j.buildSide match {
        case BuildLeft  => j.right
        case BuildRight => j.left
      }
      val shuffles = streamed.collect { case e: ShuffleExchangeLike => e }
      assert(shuffles.isEmpty,
        s"fact side shuffled before the acceptance filter:\n$plan")
    }
  }

  test("q_cdc_apply: winners come from one partial+final max_by agg, no window") {
    // the change feed must be collapsed with a map-side-combining
    // aggregation, never a row_number window (which would sort-shuffle
    // the whole feed into per-key reducers before discarding losers)
    val p = planStr(q("q_cdc_apply"))
    assert(!p.contains("Window"), s"CDC winners must not use a window:\n$p")
    assert(p.contains("partial_max_by"),
      s"feed collapse must combine map-side:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"exactly one keyed shuffle (the agg); apply join must reuse/broadcast:\n$p")
  }

  test("q_join_interval: overlap counts come from rank arithmetic — b is aggregated before any join") {
    // the output is per-order COUNTS, so no pair row may exist: lineitem
    // must collapse to the endpoint histogram (a hash aggregation) below
    // every join, and the probes onto orders must broadcast the tiny
    // cumulative calendar — any pairs-producing plan (month-bin equi-join
    // included) carries a quadratic-in-density intermediate at 100×
    val p = planStr(q("q_join_interval"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval join fell back to all-pairs:\n$p")
    // the histogram is materialized once (calendar-sized localCheckpoint)
    // before the probe plan is built, so lineitem must not appear under
    // any join — the only relation rows flowing through a join are orders
    assert(!p.contains("lineitem"),
      s"lineitem rows reached the probe join — pairs plan is back:\n$p")
    assert(p.contains("ExistingRDD"),
      s"cumulative calendar should be the pre-materialized histogram:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"cumulative-calendar probes onto orders must broadcast:\n$p")
  }

  test("q_join_interval: rank arithmetic matches the retired row-level binned pairs join") {
    // keeps a genuine row-level interval-join execution pinned: the
    // month-binned equi-join materializes every overlapping pair and must
    // produce exactly the counts the closed-form plan derives
    val fast = q("q_join_interval").collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairs = graft.ops.Temporal.intervalJoinBinned(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fast.nonEmpty, "interval join returned no rows at test SF")
    assert(fast.toSeq == pairs.toSeq,
      s"arithmetic plan diverged from the pairs join: ${fast.toSeq.diff(pairs.toSeq).take(5)}")
  }

  test("q_join_nullsafe: closed-form pair arithmetic matches the row-level <=> join") {
    // keeps a genuine many-to-many null-safe-equality join execution
    // pinned after the timed key moved to aggregate-first arithmetic:
    // the row-level <=> join (NULL bucket included) must produce exactly
    // the (n_pairs, key_sum) rollup the closed form derives
    val fast = q("q_join_nullsafe").collect()
      .map(r => (r.getBoolean(0), r.getLong(1), r.getLong(2)))
    val rows = graft.ops.Joins.nullsafeRowLevel(spark, sfDir).collect()
      .map(r => (r.getBoolean(0), r.getLong(1), r.getLong(2)))
    assert(fast.length == 2, s"expected the 2-row null/non-null rollup: ${fast.toSeq}")
    assert(fast.toSeq == rows.toSeq,
      s"closed form diverged from the row-level <=> join: " +
        s"${fast.toSeq} vs ${rows.toSeq}")
  }

  test("q_join_spj: closed-form pair arithmetic matches the row-level nation join") {
    val fast = q("q_join_spj").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val rows = graft.ops.CatalogSql.joinSpjRowLevel(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(fast.nonEmpty, "SPJ rollup returned no rows at test SF")
    assert(fast.toSeq == rows.toSeq,
      s"closed form diverged from the row-level join: " +
        s"${fast.toSeq.diff(rows.toSeq).take(3)}")
  }

  test("catalog tables report exact stats; a 5-way join broadcasts every small side unhinted") {
    val warehouse = java.nio.file.Files.createTempDirectory("graft_cbo_wh").toString
    spark.conf.set("spark.sql.catalog.cbo", classOf[graft.catalog.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.cbo.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cbo.db")
    import spark.implicits._
    // five tables, three orders of magnitude apart
    spark.range(0, 200000).select($"id".as("k"),
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("payload-padding-payload-padding-"),
          $"id".cast("string")).as("pad"))
      .write.saveAsTable("cbo.db.fact")
    spark.range(0, 2000).select(($"id" % 2000).as("k"), ($"id" % 50).as("d1k"))
      .write.saveAsTable("cbo.db.mid")
    spark.range(0, 50).select($"id".as("d1k"), ($"id" % 10).as("d2k"))
      .write.saveAsTable("cbo.db.dim1")
    spark.range(0, 10).select($"id".as("d2k"), ($"id" % 3).as("d3k"))
      .write.saveAsTable("cbo.db.dim2")
    spark.range(0, 3).select($"id".as("d3k"),
        org.apache.spark.sql.functions.lit("x").as("tag"))
      .write.saveAsTable("cbo.db.dim3")

    // (a) EXACT planner statistics from the manifest — no re-listing, no guess
    val factStats = spark.table("cbo.db.fact").queryExecution.optimizedPlan.stats
    assert(factStats.rowCount.contains(BigInt(200000)),
      s"fact rowCount must be exact from the manifest: ${factStats.rowCount}")
    assert(spark.table("cbo.db.dim2").queryExecution.optimizedPlan.stats
      .rowCount.contains(BigInt(10)))

    // (b) ANALYZE adds ndv/null column stats to the reported statistics
    spark.sql("CALL cbo.system.analyze('db.mid')").collect()
    val midStats = spark.table("cbo.db.mid").queryExecution.optimizedPlan.stats
    val d1kAttr = midStats.attributeStats.toSeq
      .find(_._1.name == "d1k").map(_._2)
    assert(d1kAttr.exists(_.distinctCount.exists(n => n >= 40 && n <= 60)),
      s"analyze must surface d1k ndv≈50: ${midStats.attributeStats}")

    // (c) the 5-way star joins with every dim broadcast and the fact
    // table never on a build side — from sizes alone, zero hints
    val p = planStr(spark.sql(
      """SELECT count(*) AS n FROM cbo.db.fact f
        |JOIN cbo.db.mid m ON f.k = m.k
        |JOIN cbo.db.dim1 a ON m.d1k = a.d1k
        |JOIN cbo.db.dim2 b ON a.d2k = b.d2k
        |JOIN cbo.db.dim3 c ON b.d3k = c.d3k""".stripMargin))
    val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj == 4, s"all four small sides must broadcast (got $bhj):\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"no shuffle join belongs in this star:\n$p")
  }

  test("exact stats narrow under partition filters and scale under projection") {
    val warehouse = java.nio.file.Files.createTempDirectory("graft_stats_wh").toString
    spark.conf.set("spark.sql.catalog.swh", classOf[graft.catalog.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.swh.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS swh.db")
    spark.sql("CREATE TABLE swh.db.pt (k BIGINT, pad STRING, cat STRING) PARTITIONED BY (cat)")
    spark.sql("INSERT INTO swh.db.pt SELECT id, repeat('x', 100), " +
      "concat('c', id % 4) FROM range(0, 4000)")

    def scanBytes(df: org.apache.spark.sql.DataFrame): BigInt =
      df.queryExecution.optimizedPlan.collectLeaves().head.stats.sizeInBytes

    // whole-snapshot scan: exact manifest bytes, exact rows
    val full = spark.table("swh.db.pt")
    val log = new graft.catalog.CommitLog(spark, s"$warehouse/db/pt")
    val (exactBytes, exactRows) = log.snapshotStats(log.currentVersion.get)
    assert(scanBytes(full) == BigInt(exactBytes))
    assert(full.queryExecution.optimizedPlan.stats.rowCount
      .contains(BigInt(exactRows.get)))

    // a PARTITION filter is consumed by pushdown without appearing in
    // pushedFilters, and the stock FileScan estimate totals the UNPRUNED
    // index — the shim must report the pruned partitions' bytes (~1/4)
    val pruned = full.filter(org.apache.spark.sql.functions.col("cat") === "c1")
    assert(scanBytes(pruned) * 2 < BigInt(exactBytes),
      s"partition-pruned scan must report pruned bytes: ${scanBytes(pruned)} vs $exactBytes")

    // a narrow projection keeps the exact row count but scales bytes —
    // a 1-of-3-column read of a wide table must look broadcastable
    val projected = full.select("k")
    assert(scanBytes(projected) < BigInt(exactBytes),
      s"projected scan must scale bytes: ${scanBytes(projected)} vs $exactBytes")
  }

  test("q_win_interpolate: both fill frames reuse one sort (no exchange between windows)") {
    // wPrev and wNext share (event_type, h) ordering; Spark must plan
    // Window←Project←Window←Sort — a second Sort/Exchange between the two
    // Window nodes would double the series shuffle for no reason
    val p = planStr(q("q_win_interpolate"))
    val lines = p.linesIterator.toVector
    val winIdx = lines.zipWithIndex.collect {
      case (l, i) if l.trim.startsWith("+- Window") || l.trim.startsWith(":- Window") => i
    }
    assert(winIdx.length == 2, s"expected exactly 2 window nodes:\n$p")
    val between = lines.slice(winIdx.min + 1, winIdx.max)
    assert(between.nonEmpty && !between.exists(l => l.contains("Sort") || l.contains("Exchange")),
      s"re-sort/shuffle between the two fill windows:\n$p")
  }

  test("ANALYZE histograms fix join estimates the uniform-NDV guess gets wrong") {
    // Two 400k-row tables with IDENTICAL row counts and key NDVs whose
    // key RANGES barely overlap (1000 of 400k keys). The uniform-NDV
    // join estimate is |a|·|b|/max(ndv) ≈ 400k rows — 400× the truth.
    // Equi-height histograms see the near-empty overlap. CBO runs in an
    // isolated session (shared-suite conf hygiene).
    val warehouse = java.nio.file.Files.createTempDirectory("graft_hist_wh").toString
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.hcbo", classOf[graft.catalog.GraftTableCatalog].getName)
    s.conf.set("spark.sql.catalog.hcbo.warehouse", warehouse)
    s.conf.set("spark.sql.cbo.enabled", "true")
    // plan statistics are computed LAZILY under the thread's active
    // session's SQLConf — pin it to the CBO session for the duration
    // (restored below; suites sharing the base session are unaffected
    // because cbo lives only in this session's conf)
    val prevActive = org.apache.spark.sql.SparkSession.getActiveSession
    org.apache.spark.sql.SparkSession.setActiveSession(s)
    try {
    s.sql("CREATE NAMESPACE IF NOT EXISTS hcbo.db")
    import org.apache.spark.sql.functions.{concat, lit, md5}
    def pad = concat(md5(org.apache.spark.sql.functions.col("id").cast("string")),
      md5(concat(lit("s"), org.apache.spark.sql.functions.col("id").cast("string"))))
    s.range(0, 400000).select(org.apache.spark.sql.functions.col("id").as("k"),
      pad.as("pad")).write.saveAsTable("hcbo.db.ha")
    s.range(0, 400000).select((org.apache.spark.sql.functions.col("id") + 399000L).as("k"),
      pad.as("pad")).write.saveAsTable("hcbo.db.hb")
    s.sql("CALL hcbo.system.analyze('db.ha')").collect()
    s.sql("CALL hcbo.system.analyze('db.hb')").collect()

    // the histogram itself surfaces in catalyst attributeStats
    val kStat = s.table("hcbo.db.ha").queryExecution.optimizedPlan.stats
      .attributeStats.toSeq.find(_._1.name == "k").map(_._2)
    assert(kStat.exists(_.histogram.isDefined),
      s"ANALYZE must surface an equi-height histogram on k: $kStat")

    // join-size estimate: histograms ≈ truth (1000 rows), not 400k
    val est = s.sql(
      """SELECT * FROM hcbo.db.ha a JOIN hcbo.db.hb b ON a.k = b.k""")
      .queryExecution.optimizedPlan.stats.rowCount
    assert(est.exists(_ < BigInt(40000)),
      s"histogram estimate must see the near-empty range overlap: $est")

    // control: same tables analyzed WITHOUT histograms — the NDV-uniform
    // estimate is ~|a| and wrong by two orders of magnitude
    new graft.catalog.CommitLog(s, s"$warehouse/db/ha").analyze(histograms = false)
    new graft.catalog.CommitLog(s, s"$warehouse/db/hb").analyze(histograms = false)
    s.catalog.refreshTable("hcbo.db.ha"); s.catalog.refreshTable("hcbo.db.hb")
    val estNdv = s.sql(
      """SELECT * FROM hcbo.db.ha a JOIN hcbo.db.hb b ON a.k = b.k""")
      .queryExecution.optimizedPlan.stats.rowCount
    assert(estNdv.exists(_ > BigInt(100000)),
      s"NDV-uniform control must overestimate the disjoint join: $estNdv")

    // the estimate flips a real planning decision: with histograms the
    // tiny join result broadcasts into the second join; without, the
    // 400k-row guess forces a shuffle join
    val q =
      """SELECT count(*) AS n FROM hcbo.db.ha a
        |JOIN hcbo.db.hb b ON a.k = b.k
        |JOIN hcbo.db.hb c ON a.pad = c.pad""".stripMargin
    val pNdv = s.sql(q).queryExecution.executedPlan.toString
    assert(pNdv.contains("SortMergeJoin [pad"),
      s"the NDV-only 400k-row guess must keep the pad join a shuffle join:\n$pNdv")
    s.sql("CALL hcbo.system.analyze('db.ha')").collect()
    s.sql("CALL hcbo.system.analyze('db.hb')").collect()
    s.catalog.refreshTable("hcbo.db.ha"); s.catalog.refreshTable("hcbo.db.hb")
    val pHist = s.sql(q).queryExecution.executedPlan.toString
    assert(pHist.contains("BroadcastHashJoin [pad") && !pHist.contains("SortMergeJoin [pad"),
      s"histogram estimate must broadcast the tiny first-join result " +
        s"into the pad join:\n$pHist")
    } finally {
      prevActive match {
        case Some(p) => org.apache.spark.sql.SparkSession.setActiveSession(p)
        case None => org.apache.spark.sql.SparkSession.clearActiveSession()
      }
    }
  }

  test("ANALYZE date histograms: disjoint o_orderdate-style ranges fix the join estimate") {
    // Date keys are the most common lake partition/join columns and ride
    // the numeric stats path through their epoch-day encoding: two
    // tables whose date ranges overlap on only 1000 of 200k days must
    // estimate the join near the truth, not at the uniform-NDV guess.
    val warehouse = java.nio.file.Files.createTempDirectory("graft_dhist_wh").toString
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.dcbo", classOf[graft.catalog.GraftTableCatalog].getName)
    s.conf.set("spark.sql.catalog.dcbo.warehouse", warehouse)
    s.conf.set("spark.sql.cbo.enabled", "true")
    val prevActive = org.apache.spark.sql.SparkSession.getActiveSession
    org.apache.spark.sql.SparkSession.setActiveSession(s)
    try {
      s.sql("CREATE NAMESPACE IF NOT EXISTS dcbo.db")
      s.sql("CREATE TABLE dcbo.db.da AS SELECT date_add(DATE'1970-01-01', " +
        "CAST(id AS INT)) AS dk, id AS v FROM range(0, 200000)")
      s.sql("CREATE TABLE dcbo.db.db AS SELECT date_add(DATE'1970-01-01', " +
        "CAST(id + 199000 AS INT)) AS dk, id AS v FROM range(0, 200000)")
      s.sql("CALL dcbo.system.analyze('db.da')").collect()
      s.sql("CALL dcbo.system.analyze('db.db')").collect()
      // the histogram surfaces on the DATE column in catalyst stats
      val dStat = s.table("dcbo.db.da").queryExecution.optimizedPlan.stats
        .attributeStats.toSeq.find(_._1.name == "dk").map(_._2)
      assert(dStat.exists(_.histogram.isDefined),
        s"ANALYZE must surface an equi-height histogram on a date key: $dStat")
      assert(dStat.exists(cs => cs.min.isDefined && cs.max.isDefined),
        s"date key must carry a range (NullValueInterval = zero-row joins): $dStat")
      val est = s.sql("SELECT * FROM dcbo.db.da a JOIN dcbo.db.db b ON a.dk = b.dk")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(est.exists(r => r > 0 && r < BigInt(20000)),
        s"date histogram must see the near-empty range overlap (truth 1000): $est")
      // control: NDV+range only (no histograms) — the overlapping-range
      // uniform estimate is ~|a|, two orders of magnitude over the truth
      new graft.catalog.CommitLog(s, s"$warehouse/db/da").analyze(histograms = false)
      new graft.catalog.CommitLog(s, s"$warehouse/db/db").analyze(histograms = false)
      s.catalog.refreshTable("dcbo.db.da"); s.catalog.refreshTable("dcbo.db.db")
      val estNdv = s.sql("SELECT * FROM dcbo.db.da a JOIN dcbo.db.db b ON a.dk = b.dk")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(estNdv.exists(_ > BigInt(50000)),
        s"NDV-uniform control must overestimate the disjoint date join: $estNdv")
    } finally {
      prevActive match {
        case Some(pv) => org.apache.spark.sql.SparkSession.setActiveSession(pv)
        case None => org.apache.spark.sql.SparkSession.clearActiveSession()
      }
    }
  }

  test("ANALYZE timestamp ranges ride catalyst's epoch-micros coordinate system") {
    // the stat min/max for a TimestampType key must be EPOCH MICROS —
    // catalyst converts timestamp literals/values through their internal
    // micros representation, so a seconds-encoded stat misestimates by
    // 10^6. Disjoint hour ranges must estimate the join near zero.
    val warehouse = java.nio.file.Files.createTempDirectory("graft_tshist_wh").toString
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.tcbo", classOf[graft.catalog.GraftTableCatalog].getName)
    s.conf.set("spark.sql.catalog.tcbo.warehouse", warehouse)
    s.conf.set("spark.sql.cbo.enabled", "true")
    val prevActive = org.apache.spark.sql.SparkSession.getActiveSession
    org.apache.spark.sql.SparkSession.setActiveSession(s)
    try {
      s.sql("CREATE NAMESPACE IF NOT EXISTS tcbo.db")
      s.sql("CREATE TABLE tcbo.db.ta AS SELECT timestamp_micros(CAST(id * 1000000 AS BIGINT)) " +
        "AS tk, id AS v FROM range(0, 100000)")
      s.sql("CREATE TABLE tcbo.db.tb AS SELECT timestamp_micros(CAST((id + 99000) * 1000000 AS BIGINT)) " +
        "AS tk, id AS v FROM range(0, 100000)")
      s.sql("CALL tcbo.system.analyze('db.ta')").collect()
      s.sql("CALL tcbo.system.analyze('db.tb')").collect()
      val tStat = s.table("tcbo.db.ta").queryExecution.optimizedPlan.stats
        .attributeStats.toSeq.find(_._1.name == "tk").map(_._2)
      assert(tStat.exists(cs => cs.min.isDefined && cs.histogram.isDefined),
        s"ANALYZE must surface range + histogram on a timestamp key: $tStat")
      // the served min must be micros-scaled (~0), the max ~1e11 micros —
      // a seconds encoding would cap at ~2e5 and break interval math
      assert(tStat.exists(_.max.exists(_.toString.toDouble > 1e10)),
        s"timestamp stats must be epoch-MICROS-encoded: ${tStat.map(_.max)}")
      val est = s.sql("SELECT * FROM tcbo.db.ta a JOIN tcbo.db.tb b ON a.tk = b.tk")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(est.exists(r => r > 0 && r < BigInt(10000)),
        s"timestamp histogram must see the near-empty overlap (truth 1000): $est")
    } finally {
      prevActive match {
        case Some(pv) => org.apache.spark.sql.SparkSession.setActiveSession(pv)
        case None => org.apache.spark.sql.SparkSession.clearActiveSession()
      }
    }
  }

  test("ANALYZE string stats: lexicographic bounds + count-min frequency sketch") {
    val root = java.nio.file.Files.createTempDirectory("graft_strstats").toString
    val log = new graft.catalog.CommitLog(spark, root)
    import spark.implicits._
    import org.apache.spark.sql.functions.{concat, lit, when, col}
    // skewed status-string shape: one dominant value + a long tail
    log.commit(spark.range(0, 10000).select(
      when(col("id") < 9000, lit("FULFILLED"))
        .otherwise(concat(lit("rare_"), col("id"))).as("status"),
      col("id").as("v")), replace = true)
    log.analyze()
    val (_, ss) = log.analyzedStringStats().get
    val (lo, hi, cms) = ss("status")
    assert(lo == "FULFILLED" && hi.startsWith("rare_9"),
      s"lexicographic bounds wrong: ($lo, $hi)")
    val hot = cms.estimateCount("FULFILLED")
    assert(hot >= 9000 && hot <= 9000 + 200,
      s"sketch must count the dominant value within eps*n: $hot")
    assert(cms.estimateCount("rare_9500") <= 200,
      s"tail value must stay near its true count of 1")
    // numeric min/max untouched by the string harvest
    assert(log.analyzedMinMax().get._2("v") == ((0.0, 9999.0)))
  }
}
