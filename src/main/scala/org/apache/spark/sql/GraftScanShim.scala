package org.apache.spark.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns, SupportsPushDownVariantExtractions, SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeV2Filtering, Statistics, VariantExtraction}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning => ConnectorKeyGroupedPartitioning, Partitioning => ConnectorPartitioning, UnknownPartitioning => ConnectorUnknownPartitioning}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.execution.PartitionedFileUtil
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.FileScan
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.internal.SQLConf
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
/** Snapshot-exact planner statistics for a commit-log table: bytes and
  * rows from the manifest's commit-time tags, per-column NDV/null counts
  * and equi-height histograms (col → (binHeight, endpoints, binNdvs))
  * from the table's ANALYZE sidecar (empty when never analyzed).
  */
final case class GraftExactStats(sizeInBytes: Long, numRows: Option[Long],
    colStats: Map[String, (Long, Long)],
    histograms: Map[String, (Double, Seq[Double], Seq[Long])] = Map.empty,
    minMax: Map[String, (Double, Double)] = Map.empty)

final class GraftForwardingScanBuilder(
    delegate: ParquetScanBuilder,
    stream: String => MicroBatchStream,
    exactStats: () => Option[GraftExactStats] = () => None,
    batchRefusal: Option[String] = None,
    totalCols: Int = 0,
    keyedSession: Option[SparkSession] = None,
    bucketKeyed: Option[(String, Int, SparkSession)] = None,
    partitionColNames: Set[String] = Set.empty)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns
  with SupportsPushDownCatalystFilters
  with SupportsPushDownAggregates
  with SupportsPushDownVariantExtractions {

  // a pushed aggregate turns the scan's rows into per-footer aggregate
  // rows — splitting files or reporting key-grouped row partitioning
  // over them would be wrong, so the keyed batch stands down
  private var aggPushed = false
  // column pruning keeps the exact ROW count but shrinks bytes — scale
  // proportionally so a 2-column projection of a wide table still
  // broadcasts when it truly fits
  private var colRatio = 1.0

  override def pruneColumns(requiredSchema: StructType): Unit = {
    if (totalCols > 0 && requiredSchema.fields.length < totalCols)
      colRatio = math.max(1, requiredSchema.fields.length).toDouble / totalCols
    delegate.pruneColumns(requiredSchema)
  }
  // partition filters are CONSUMED by the file index (they appear in
  // neither pushedFilters nor the returned post-scan set), so a pruned
  // scan must never report whole-snapshot stats — track the consumption
  // here rather than trusting the built scan to expose it. Tracked
  // PER-FILTER by identity: a delegate that fully absorbs a DATA filter
  // also shortens the post-scan set, and that absorption must not
  // discard exact stats (Spark retains pushed data predicates in the
  // Filter node above the scan, so whole-snapshot stats stay right);
  // only an absorbed filter touching a declared partition (or derived
  // `_p_*` layout) column means the file index pruned.
  private var partFiltersConsumed = false
  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    val postScan = delegate.pushFilters(filters)
    val kept = postScan.toSet
    val absorbed = filters.filterNot(kept)
    if (absorbed.exists(_.references.exists(a =>
        partitionColNames.exists(_.equalsIgnoreCase(a.name)))))
      partFiltersConsumed = true
    postScan
  }
  override def pushedFilters: Array[Predicate] = delegate.pushedFilters
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val pushed = delegate.pushAggregation(aggregation)
    if (pushed) aggPushed = true
    pushed
  }
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    delegate.supportCompletePushDown(aggregation)
  override def pushVariantExtractions(
      extractions: Array[VariantExtraction]): Array[Boolean] =
    delegate.pushVariantExtractions(extractions)

  override def build(): Scan = {
    val built = delegate.build()
    // Exact stats are served even under data-filter pushdown: parquet
    // pushdown is best-effort (row-group granularity), so Spark RETAINS
    // every pushed predicate in the Filter node above the scan — the
    // scan's stats must describe its UNFILTERED output and catalyst's
    // FilterEstimation applies the selectivity exactly once (with the
    // ANALYZE ndv/histograms when present). Dropping stats here instead
    // blinded CBO on any join, whose implied isnotnull always pushes.
    // An aggregate pushdown DOES change the scan's output cardinality
    // (footer count/min-max returns group rows, not table rows) — table
    // stats would be nonsense there, so only that case stands down.
    val stats =
      if (aggPushed) None
      else {
        val scaled = exactStats().map(s => s.copy(sizeInBytes =
          math.max(1L, (s.sizeInBytes * colRatio).toLong)))
        built match {
          // partition filters never appear in pushedFilters (the file
          // index consumes them) and the stock FileScan estimate uses
          // the UNPRUNED index total — list the pruned files instead,
          // so a one-partition read of a year-partitioned dim still
          // broadcasts. Row count drops to unknown (bytes are exact per
          // file; rows per partition are not tracked here).
          case f: org.apache.spark.sql.execution.datasources.v2.FileScan
              if partFiltersConsumed || f.partitionFilters.nonEmpty =>
            val prunedBytes = f.fileIndex
              .listFiles(f.partitionFilters, f.dataFilters)
              .iterator.flatMap(_.files).map(_.getLen).sum
            scaled.map(s => s.copy(
              sizeInBytes = math.max(1L, (prunedBytes * colRatio).toLong),
              numRows = None))
          // a consumed partition filter on a non-file scan leaves no way
          // to re-list the pruned set — stand down rather than inflate
          case _ if partFiltersConsumed => None
          case _ => scaled
        }
      }
    new GraftStreamableScan(built, stream, stats, batchRefusal,
      keyed = if (aggPushed) None else keyedSession,
      bucketKeyed = if (aggPushed) None else bucketKeyed)
  }
}

/** A [[FilePartition]] that also names the hive-partition value every row
  * in it carries — the V2 storage-partitioned-join handshake
  * ([[HasPartitionKey]]). Extending FilePartition (rather than wrapping)
  * keeps the stock parquet [[PartitionReaderFactory]] binary-compatible:
  * it pattern-matches on FilePartition and reads these untouched.
  */
final class GraftKeyedFilePartition(
    idx: Int, fileArr: Array[PartitionedFile], key: InternalRow)
  extends FilePartition(idx, fileArr) with HasPartitionKey {
  override def partitionKey(): InternalRow = key
}

/** Batch planner that groups a hive-partitioned file scan's splits BY
  * PARTITION VALUE and tags each split group with its key, instead of
  * bin-packing splits across partition directories the way the stock
  * [[FileScan]] does. With `spark.sql.sources.v2.bucketing.enabled=true`
  * Spark's `EnsureRequirements` then recognizes two graft tables
  * partitioned on the same columns as co-partitioned and plans their
  * join — and any aggregation keyed on the partition columns — WITHOUT a
  * shuffle (`KeyGroupedShuffleSpec` compatibility), the V2 equivalent of
  * a bucketed join: at 100 TB this deletes the dominant exchange of a
  * fact-fact join that was laid out for it. Row bytes still flow through
  * the delegate's vectorized reader factory; only the task grouping
  * changes. Splitting within a partition stays allowed (same-key splits
  * are re-merged per key by Spark's grouping), so a giant partition does
  * not lose within-partition read parallelism on non-join scans.
  */
final class GraftKeyedBatch(fs: FileScan, spark: SparkSession) extends Batch {
  override def planInputPartitions(): Array[InputPartition] = {
    val dirs = fs.fileIndex.listFiles(fs.partitionFilters, fs.dataFilters)
    val maxSplit = FilePartition.maxSplitBytes(spark, dirs)
    val out = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
    dirs.foreach { dir =>
      val key = dir.values.copy()
      val splits = dir.files.flatMap { f =>
        PartitionedFileUtil.splitFiles(f, f.getPath, isSplitable = true,
          maxSplit, key)
      }.sortBy(-_.length)
      FilePartition.getFilePartitions(spark, splits, maxSplit).foreach { fp =>
        out += new GraftKeyedFilePartition(out.length, fp.files, key)
      }
    }
    out.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    fs.createReaderFactory()
}

/** Bucket twin of [[GraftKeyedBatch]] for hidden-partition
  * `bucket(n, col)` tables: split groups are keyed on the BUCKET ID
  * parsed from each file's `_p_bucket_n_col=<id>/` layout directory
  * (the scan schema carries no partition columns — the derived column
  * is engine-internal, so rows read content-only through the stock
  * parquet factory). With both join sides bucketed on the same key and
  * count, Spark plans the fact-fact join with zero exchanges — the
  * Iceberg-style bucket join.
  */
final class GraftBucketKeyedBatch(fs: FileScan, spark: SparkSession,
    src: String, n: Int) extends Batch {
  override def planInputPartitions(): Array[InputPartition] = {
    val seg = (java.util.regex.Pattern.quote(s"_p_bucket_${n}_$src=") +
      "([0-9]+)/").r
    val dirs = fs.fileIndex.listFiles(fs.partitionFilters, fs.dataFilters)
    val maxSplit = FilePartition.maxSplitBytes(spark, dirs)
    val byBucket = dirs.flatMap(_.files).groupBy(f =>
      seg.findFirstMatchIn(f.getPath.toString).map(_.group(1).toLong))
    require(!byBucket.contains(None),
      "GraftBucketKeyedBatch: a file lost its bucket layout segment between " +
        "planning and batch construction")
    val out = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
    byBucket.toSeq.sortBy(_._1.get).foreach { case (id, files) =>
      val key = InternalRow(id.get)
      val splits = files.flatMap { f =>
        PartitionedFileUtil.splitFiles(f, f.getPath, isSplitable = true,
          maxSplit, InternalRow.empty)
      }.sortBy(-_.length)
      FilePartition.getFilePartitions(spark, splits, maxSplit).foreach { fp =>
        out += new GraftKeyedFilePartition(out.length, fp.files, key)
      }
    }
    out.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    fs.createReaderFactory()
}

/** Scan wrapper: batch reads delegate untouched; streaming reads get the
  * catalog's commit-tailing [[MicroBatchStream]]. Statistics prefer the
  * commit log's EXACT snapshot numbers (manifest row/byte tags + ANALYZE
  * ndv/null sidecar) when the scan is the whole snapshot — this is what
  * lets join planning broadcast the truly-small side and lets
  * cost-based join reorder see real row counts instead of
  * compressed-bytes guesses; a filtered/aggregated scan falls back to
  * the delegate's post-pruning estimate.
  */
final class GraftStreamableScan(private var delegate: Scan,
    stream: String => MicroBatchStream,
    exact: Option[GraftExactStats] = None,
    batchRefusal: Option[String] = None,
    keyed: Option[SparkSession] = None,
    bucketKeyed: Option[(String, Int, SparkSession)] = None)
  extends Scan with SupportsReportStatistics with SupportsReportPartitioning
  with SupportsRuntimeV2Filtering {
  override def readSchema(): StructType = delegate.readSchema()
  override def description(): String = delegate.description()

  /** Dynamic partition pruning for commit-log tables. Spark's stock V2
    * parquet scan implements no runtime-filtering interface, so a
    * hive-partitioned V2 table would scan EVERY partition of a fact
    * table joined to a filtered dim — the exact case DPP exists for (at
    * 100 TB, the difference between reading 3 partitions and 3000).
    * Declaring the partition columns filterable makes the
    * `PartitionPruning` rule plant a dynamic IN-subquery on the join
    * key; at execution [[filter]] receives the materialized key set and
    * folds it into the delegate ParquetScan's partition filters (the
    * file index consumes them as directory-level pruning), after which
    * Spark re-plans input partitions against the pruned listing.
    * Non-IN/EQ or non-partition predicates are ignored — pruning may
    * only ever narrow the file list, never change semantics.
    */
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    delegate match {
      case f: FileScan if f.fileIndex.partitionSchema.nonEmpty =>
        f.fileIndex.partitionSchema.map(c =>
          org.apache.spark.sql.connector.expressions.FieldReference.column(c.name)).toArray
      case _ => Array.empty
    }

  override def filter(predicates: Array[Predicate]): Unit = delegate match {
    case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
      import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, In, Literal}
      import org.apache.spark.sql.connector.expressions.{LiteralValue, NamedReference}
      val partSchema = p.fileIndex.partitionSchema
      def attr(ref: NamedReference) =
        partSchema.find(_.name == ref.fieldNames.last)
          .map(f => AttributeReference(f.name, f.dataType, nullable = true)())
      val exprs = predicates.toSeq.flatMap { pr =>
        (pr.name, pr.children.toSeq) match {
          case ("IN", (ref: NamedReference) +: rest)
              if rest.nonEmpty && rest.forall(_.isInstanceOf[LiteralValue[_]]) =>
            attr(ref).map(a => In(a,
              rest.map { case lv: LiteralValue[_] => Literal(lv.value, lv.dataType) }))
          case ("=", Seq(ref: NamedReference, lv: LiteralValue[_])) =>
            attr(ref).map(a => EqualTo(a, Literal(lv.value, lv.dataType)))
          case _ => None
        }
      }
      if (exprs.nonEmpty)
        delegate = p.copy(partitionFilters = p.partitionFilters ++ exprs)
    case _ => ()
  }

  /** The keyed (storage-partitioned-join) path engages only for a
    * hive-partitioned file scan in a session that opted into V2
    * bucketing — with the conf off, the stock bin-packed planning is
    * kept so scan parallelism is never silently reduced to the
    * partition count.
    */
  private def keyedScan: Option[(FileScan, SparkSession)] = keyed.collect {
    case sp if SQLConf.get.v2BucketingEnabled => delegate match {
      case f: FileScan if f.fileIndex.partitionSchema.nonEmpty => (f, sp)
      case _ => null
    }
  }.filter(_ != null)

  /** The hidden-bucket SPJ path: a transform-partitioned table's scan
    * carries no partition schema (the derived `_p_bucket_n_col` column
    * is engine-internal), so co-location is keyed on the BUCKET ID
    * parsed from each file's layout directory. Engages only under the
    * same V2-bucketing opt-in as the identity path; a file missing its
    * bucket segment stands the whole path down (correct, just shuffled).
    */
  private def bucketScan: Option[(FileScan, String, Int, SparkSession)] =
    bucketKeyed.collect {
      case (src, n, sp) if SQLConf.get.v2BucketingEnabled => delegate match {
        case f: FileScan if f.fileIndex.partitionSchema.isEmpty => (f, src, n, sp)
        case _ => null
      }
    }.filter(_ != null)

  /** Distinct bucket ids, or None when there are no files or ANY file
    * lacks the layout segment (stand down — correct, just shuffled).
    */
  private def bucketIdsOf(f: FileScan, src: String, n: Int): Option[Set[Long]] = {
    val seg = (java.util.regex.Pattern.quote(s"_p_bucket_${n}_$src=") +
      "([0-9]+)/").r
    val tagged = f.fileIndex.listFiles(f.partitionFilters, f.dataFilters)
      .flatMap(_.files)
      .map(st => seg.findFirstMatchIn(st.getPath.toString).map(_.group(1).toLong))
    if (tagged.isEmpty || tagged.exists(_.isEmpty)) None
    else Some(tagged.flatten.toSet)
  }

  override def outputPartitioning(): ConnectorPartitioning = keyedScan match {
    case Some((f, _)) =>
      val dirs = f.fileIndex.listFiles(f.partitionFilters, f.dataFilters)
      if (dirs.isEmpty) new ConnectorUnknownPartitioning(0)
      else new ConnectorKeyGroupedPartitioning(
        f.fileIndex.partitionSchema.map(c => Expressions.identity(c.name))
          .toArray[org.apache.spark.sql.connector.expressions.Expression],
        dirs.length)
    case None => bucketScan match {
      case Some((f, src, n, _)) =>
        bucketIdsOf(f, src, n) match {
          case Some(ids) if ids.nonEmpty =>
            new ConnectorKeyGroupedPartitioning(
              Array[org.apache.spark.sql.connector.expressions.Expression](
                Expressions.bucket(n, src)),
              ids.size)
          case _ => new ConnectorUnknownPartitioning(0)
        }
      case None => new ConnectorUnknownPartitioning(0)
    }
  }

  // a batch refusal set by the table means binding THIS raw scan would
  // return wrong rows (e.g. renamed columns with no rewrite rule in the
  // session) — streaming is unaffected because the micro-batch stream
  // does its own (physical-schema) planning
  override def toBatch: Batch = {
    batchRefusal.foreach(msg => throw new IllegalStateException(msg))
    keyedScan match {
      case Some((f, sp)) => new GraftKeyedBatch(f, sp)
      case None => bucketScan match {
        case Some((f, src, n, sp)) if bucketIdsOf(f, src, n).isDefined =>
          new GraftBucketKeyedBatch(f, sp, src, n)
        case _ => delegate.toBatch
      }
    }
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    stream(checkpointLocation)
  override def supportedCustomMetrics() = delegate.supportedCustomMetrics()
  override def reportDriverMetrics() = delegate.reportDriverMetrics()
  override def columnarSupportMode() = delegate.columnarSupportMode()

  override def estimateStatistics(): Statistics = exact match {
    case Some(st) => new Statistics {
      override def sizeInBytes() = java.util.OptionalLong.of(st.sizeInBytes)
      override def numRows() = st.numRows
        .map(java.util.OptionalLong.of).getOrElse(java.util.OptionalLong.empty())
      override def columnStats()
          : java.util.Map[org.apache.spark.sql.connector.expressions.NamedReference,
            org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
        val m = new java.util.HashMap[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
        st.colStats.foreach { case (c, (ndv, nulls)) =>
          // equi-height histogram, when ANALYZE harvested one — catalyst
          // join/filter estimation prefers it over the uniform-NDV guess
          val hist: java.util.Optional[
              org.apache.spark.sql.connector.read.colstats.Histogram] =
            st.histograms.get(c) match {
              case Some((h, eps, ndvs)) => java.util.Optional.of(
                new org.apache.spark.sql.connector.read.colstats.Histogram {
                  override def height() = h
                  override def bins() = Array.tabulate(ndvs.size) { i =>
                    new org.apache.spark.sql.connector.read.colstats.HistogramBin {
                      override def lo() = eps(i)
                      override def hi() = eps(i + 1)
                      override def ndv() = ndvs(i)
                    }
                  }
                })
              case None => java.util.Optional.empty()
            }
          // numeric range as boxed doubles: catalyst's ValueInterval
          // needs SOME range on numeric keys (absence = NullValueInterval
          // = "disjoint" = zero-row join estimates), and its toDouble
          // goes through toString, so a Double serves every numeric type
          val (mmLo, mmHi) = st.minMax.get(c) match {
            case Some((lo, hi)) => (
              java.util.Optional.of(java.lang.Double.valueOf(lo): Object),
              java.util.Optional.of(java.lang.Double.valueOf(hi): Object))
            case None =>
              (java.util.Optional.empty[Object](), java.util.Optional.empty[Object]())
          }
          m.put(org.apache.spark.sql.connector.expressions.FieldReference.column(c),
            new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
              override def distinctCount() = java.util.OptionalLong.of(ndv)
              override def nullCount() = java.util.OptionalLong.of(nulls)
              override def min() = mmLo
              override def max() = mmHi
              override def histogram() = hist
            })
        }
        m
      }
    }
    case None => delegate match {
      case s: SupportsReportStatistics => s.estimateStatistics()
      case _ => new Statistics {
        override def sizeInBytes() = java.util.OptionalLong.empty()
        override def numRows() = java.util.OptionalLong.empty()
      }
    }
  }
}
