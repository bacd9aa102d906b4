package org.apache.spark.sql.graftbridge

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** DataFrame over an explicit list of parquet files with MANIFEST-LEVEL file
  * skipping: the scan's pushed data filters are handed to a pruning callback
  * that drops files whose stats prove no row can match — the Iceberg/Delta
  * `FileIndex` pattern (Delta's TahoeFileIndex plays the same role). Bridge
  * package purely for `private[sql]` access to `HadoopFsRelation`; all
  * pruning logic lives in graft.store.FileStats. */
object StatsScanBridge {

  /** One file the scan may read: (path, size bytes, modification time). */
  final case class FileRef(path: String, bytes: Long, modTime: Long)

  /** `list` resolves pushed data filters to the surviving files — called
    * LAZILY when Spark plans the scan, so a sharded manifest can run it as
    * a distributed metadata scan and the driver only ever holds the files
    * that survive pruning (`list(Nil)` = the full set, for unfiltered scans
    * and `inputFiles`). `sizeBytes` feeds the optimizer's size estimate
    * without enumerating anything. */
  def dataFrame(spark: SparkSession, root: String, sizeBytes: Long,
      schema: StructType,
      list: Seq[Expression] => Seq[FileRef]): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val index = new FileIndex {
      override def rootPaths: Seq[Path] = Seq(new Path(root))
      override def listFiles(partitionFilters: Seq[Expression],
          dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
        Seq(PartitionDirectory(InternalRow.empty, list(dataFilters).map(f =>
          new FileStatus(f.bytes, false, 1, 0, f.modTime, new Path(f.path))).toArray))
      override def inputFiles: Array[String] = list(Nil).map(_.path).toArray
      override def refresh(): Unit = ()
      override def sizeInBytes: Long = sizeBytes
      override def partitionSchema: StructType = StructType(Nil)
    }
    val relation = HadoopFsRelation(
      location = index,
      partitionSchema = StructType(Nil),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(classic)
    classic.baseRelationToDataFrame(relation)
  }
}
