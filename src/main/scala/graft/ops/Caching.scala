package graft.ops

import org.apache.spark.sql.DataFrame

/** Scoped caching for multi-consumer subplans.
  *
  * A bare `persist()` inside a query builder has no paired release: the
  * Verify/Bench harnesses clearCache() per query, but a library consumer
  * running many queries in one session accumulates cached blocks until
  * the executors evict under pressure. `withCached` persists the subplan,
  * builds the result, eagerly materializes it (`localCheckpoint` runs the
  * job while the cache is alive AND truncates the result's lineage so it
  * no longer references the cached plan), then unpersists. The checkpoint
  * blocks of the small result are reference-tracked by Spark's
  * ContextCleaner and vanish when the returned DataFrame is unreferenced.
  */
private[ops] object Caching {
  def withCached(df: DataFrame)(f: DataFrame => DataFrame): DataFrame = {
    val cached = df.persist()
    try f(cached).localCheckpoint(eager = true)
    finally { cached.unpersist(): Unit }
  }
}
