package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns, SupportsPushDownVariantExtractions, SupportsReportStatistics, Statistics, VariantExtraction}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

/** Forwarding ScanBuilder that keeps the built-in parquet builder's FULL
  * pushdown surface (columns, Catalyst filters, aggregates, variant
  * extractions — `SupportsPushDownCatalystFilters` is `private[sql]`,
  * hence this shim package) while letting the catalog attach a streaming
  * path to the built Scan. Batch plans stay byte-identical to a direct
  * ParquetScan: every pushdown call lands on the delegate, and `toBatch`
  * of the wrapped Scan IS the delegate's batch.
  */
final class GraftForwardingScanBuilder(
    delegate: ParquetScanBuilder,
    stream: String => MicroBatchStream)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns
  with SupportsPushDownCatalystFilters
  with SupportsPushDownAggregates
  with SupportsPushDownVariantExtractions {

  override def pruneColumns(requiredSchema: StructType): Unit =
    delegate.pruneColumns(requiredSchema)
  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    delegate.pushFilters(filters)
  override def pushedFilters: Array[Predicate] = delegate.pushedFilters
  override def pushAggregation(aggregation: Aggregation): Boolean =
    delegate.pushAggregation(aggregation)
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    delegate.supportCompletePushDown(aggregation)
  override def pushVariantExtractions(
      extractions: Array[VariantExtraction]): Array[Boolean] =
    delegate.pushVariantExtractions(extractions)

  override def build(): Scan = new GraftStreamableScan(delegate.build(), stream)
}

/** Scan wrapper: batch reads delegate untouched (statistics included, so
  * join-side broadcast estimation sees the real file sizes); streaming
  * reads get the catalog's commit-tailing [[MicroBatchStream]].
  */
final class GraftStreamableScan(delegate: Scan, stream: String => MicroBatchStream)
  extends Scan with SupportsReportStatistics {
  override def readSchema(): StructType = delegate.readSchema()
  override def description(): String = delegate.description()
  override def toBatch: Batch = delegate.toBatch
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    stream(checkpointLocation)
  override def supportedCustomMetrics() = delegate.supportedCustomMetrics()
  override def reportDriverMetrics() = delegate.reportDriverMetrics()
  override def columnarSupportMode() = delegate.columnarSupportMode()
  override def estimateStatistics(): Statistics = delegate match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes() = java.util.OptionalLong.empty()
      override def numRows() = java.util.OptionalLong.empty()
    }
  }
}
