package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory, Scan, Statistics, SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.types.StructType

/** Storage-partitioned-join surface for graft's bucketed layout.
  *
  * A graft bucketed table places every row in `pmod(xxhash64(keys), n)`
  * (TableStore.bucketExpr) and encodes the bucket in the file path — i.e.
  * the on-disk layout IS a `KeyGroupedPartitioning` over `bucket(n, keys)`.
  * Reporting that through DSv2 lets Spark's EnsureRequirements plan joins
  * between co-bucketed tables with NO exchange on either side (Iceberg's
  * storage-partitioned join, SPARK-37375): at 100 TB a fact-fact join's
  * two full-table shuffles are the dominant cost, and co-bucketed layouts
  * make them disappear entirely.
  *
  * The wrapper delegates everything to the stock parquet scan and only
  * regroups its planned file splits by bucket id, attaching the bucket as
  * the partition key ([[HasPartitionKey]]); split boundaries (row-group
  * ranges) are preserved. Only engaged when
  * `spark.sql.sources.v2.bucketing.enabled` is true, so stock plans are
  * untouched otherwise. A file outside the bucket layout fails loudly —
  * misgrouping would silently break join co-partitioning.
  */
object KeyGroupedScanBridge {

  /** FilePartition that also carries its bucket id as the partition key. */
  final class KeyedFilePartition(index: Int, files: Array[PartitionedFile],
      key: InternalRow) extends FilePartition(index, files) with HasPartitionKey {
    override def partitionKey(): InternalRow = key
  }

  /** Forwarded size/row estimates (the join planner's broadcast decision
    * reads them): a wrapper that hides the parquet scan's
    * SupportsReportStatistics silently re-prices the table at
    * `defaultSizeInBytes` — a small bucketed dim then never broadcasts. */
  def forwardStats(inner: Scan): Statistics = inner match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes() = java.util.OptionalLong.empty()
      override def numRows() = java.util.OptionalLong.empty()
    }
  }

  final class BucketKeyGroupedScan(inner: Scan, numBuckets: Int,
      bucketKeys: Seq[String], bucketOf: String => Option[Long]) extends Scan
      with SupportsReportPartitioning with SupportsReportStatistics {
    override def estimateStatistics(): Statistics = forwardStats(inner)
    override def readSchema(): StructType = inner.readSchema()
    override def description(): String =
      s"KeyGrouped(bucket($numBuckets, ${bucketKeys.mkString(",")})) ${inner.description()}"
    override def outputPartitioning(): Partitioning =
      new KeyGroupedPartitioning(
        Array(Expressions.bucket(numBuckets, bucketKeys: _*)), numBuckets)
    override def toBatch: Batch = new Batch {
      private val innerBatch = inner.toBatch
      override def planInputPartitions(): Array[InputPartition] = {
        val splits = innerBatch.planInputPartitions().flatMap {
          case fp: FilePartition => fp.files
          case other => throw new IllegalStateException(
            s"expected FilePartition from parquet scan, got $other")
        }
        splits.groupBy { pf =>
          bucketOf(pf.filePath.toString).getOrElse(throw new IllegalStateException(
            s"file outside bucket layout: ${pf.filePath}"))
        }.toArray.sortBy(_._1).zipWithIndex.map { case ((b, files), i) =>
          new KeyedFilePartition(i, files, InternalRow(b))
        }
      }
      override def createReaderFactory(): PartitionReaderFactory =
        innerBatch.createReaderFactory()
    }
    override def supportedCustomMetrics() = inner.supportedCustomMetrics()
    override def reportDriverMetrics() = inner.reportDriverMetrics()
    override def columnarSupportMode() = inner.columnarSupportMode()
  }
}
