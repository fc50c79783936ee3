package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._
import graft.stream.{Ingest, Stateful}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * One dispatch table multiplexing every declared operator, mirroring the
  * reference's mono-backend routing (swagger:30,114,198 + the per-entity
  * router at lambda_function.py:132-162): query key → DataFrame builder.
  */
object SparkEntry {

  /** Flagship query (SURVEY §7.2 M0): TPC-H Q1-style pricing summary.
    * Driver smoke-checks rows>0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.aggGroup(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Meta.queries, Meta.oracle),
      (Scans.queries, Scans.oracle),
      (Relational.queries, Relational.oracle),
      (Joins.queries, Joins.oracle),
      (Aggregates.queries, Aggregates.oracle),
      (Windows.queries, Windows.oracle),
      (SortSetOps.queries, SortSetOps.oracle),
      (Scalars.queries, Scalars.oracle),
      (Extensibility.queries, Extensibility.oracle),
      (StreamingBatch.queries, StreamingBatch.oracle),
      (Ingest.queries, Ingest.oracle),
      (Stateful.queries, Stateful.oracle),
      (Text.queries, Text.oracle),
      (Dedup.queries, Dedup.oracle),
      (Similarity.queries, Similarity.oracle),
      (Multimodal.queries, Multimodal.oracle),
      (SkewJoin.queries, SkewJoin.oracle),
      (Stats.queries, Stats.oracle),
      (SqlSurface.queries, SqlSurface.oracle),
      (CatalogSql.queries, CatalogSql.oracle),
      (BinaryFuncs.queries, BinaryFuncs.oracle),
      (Sampling.queries, Sampling.oracle),
      (Privacy.queries, Privacy.oracle),
      (Bucketed.queries, Bucketed.oracle),
      (TrainPrep.queries, TrainPrep.oracle),
      (DataQuality.queries, DataQuality.oracle),
      (Analytics.queries, Analytics.oracle),
      (Temporal.queries, Temporal.oracle),
    )

  /** One entry per implemented operator from SURVEY.md §2.2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  // Map ++ silently drops colliding keys — a duplicate across modules
  // would shadow an operator without any failure signal
  require(modules.map(_._1.size).sum == queries.size,
    "duplicate query keys across operator modules")

  /** DuckDB-dialect oracle SQL per declared key (SURVEY §7.3 determinism
    * rules). Keys absent here get the driver's weaker rows-only check.
    */
  val oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)

  /** Untimed fixture builders per key: a key listed here must materialize
    * a catalog-table copy of its inputs before it can measure anything
    * (partitioned / hidden-bucket CTAS). The bench invokes the setup
    * OUTSIDE the timed region — standard benchmark discipline: the
    * one-time table build is layout cost, the key measures the query.
    * Each query function keeps its own freshness guard, so Verify and
    * standalone invocations still work without this pass.
    */
  val setups: Map[String, (SparkSession, String) => Unit] =
    CatalogSql.setups ++ Bucketed.setups
}
