package graft.ops

import org.apache.spark.sql.DataFrame

/** Scoped caching for multi-consumer subplans.
  *
  * A bare `persist()` inside a query builder has no paired release: the
  * Verify/Bench harnesses clearCache() per query, but a library consumer
  * running many queries in one session accumulates cached blocks until
  * the executors evict under pressure. `withCached` persists the subplan,
  * builds the result, eagerly materializes it (so the job runs while the
  * cache is alive and the result stops referencing the cached plan), then
  * unpersists.
  *
  * The materialization tier is chosen by `spark.graft.cache.materialize`:
  *  - `local` (default): `localCheckpoint` — fastest (executor-local
  *    blocks), but NOT fault-tolerant: on a real cluster an executor loss
  *    permanently kills the truncated-lineage result. The right tier for
  *    single-host and for results consumed immediately.
  *  - `reliable`: `checkpoint` to the SparkContext's configured
  *    checkpoint directory (HDFS/S3 on a cluster) — survives executor
  *    loss; costs a write to reliable storage. Requires
  *    `SparkContext.setCheckpointDir` to have been called.
  *  - `lineage`: no truncation at all — the result keeps its full plan
  *    and recomputes through the (still-persisted) subplan; fault
  *    tolerance by recomputation, the classic Spark posture. The subplan's
  *    blocks are NOT eagerly released — the session's cache manager
  *    (clearCache / LRU eviction / ContextCleaner) owns the release, which
  *    is the trade for keeping the result recomputable.
  */
private[graft] object Caching {
  def withCached(df: DataFrame)(f: DataFrame => DataFrame): DataFrame = {
    val mode = df.sparkSession.conf.get("spark.graft.cache.materialize", "local")
    mode match {
      case "lineage" =>
        f(df.persist())
      case "reliable" =>
        val cached = df.persist()
        try f(cached).checkpoint(eager = true)
        finally { cached.unpersist(): Unit }
      case "local" =>
        val cached = df.persist()
        try f(cached).localCheckpoint(eager = true)
        finally { cached.unpersist(): Unit }
      case other =>
        // a typo ("relaible") must not silently drop the fault tolerance
        // the user asked for
        throw new IllegalArgumentException(
          s"spark.graft.cache.materialize must be local|reliable|lineage, got '$other'")
    }
  }
}
