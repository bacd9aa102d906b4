package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Bridge to the V1 `FileFormat` per-file reader builder: a
  * `PartitionedFile => Iterator[InternalRow]` closure that is self-contained
  * (it broadcasts the Hadoop conf internally) and designed to be shipped to
  * executors — exactly what `FileScanRDD` executes. The graft streaming
  * source uses it to read the parquet files of a micro-batch without
  * re-implementing a parquet reader. Lives under `org.apache.spark.sql` for
  * access symmetry with the other bridges; no logic. */
object FileReadBridge {

  /** Output row layout is `dataSchema ++ partitionSchema` — the V1 reader
    * appends each file's `PartitionedFile.partitionValues` after the data
    * columns (hive-layout recovery for the streaming source). */
  def parquetReadFn(spark: SparkSession, dataSchema: StructType,
      partitionSchema: StructType = StructType(Nil))
      : PartitionedFile => Iterator[InternalRow] = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val conf = classic.sessionState.newHadoopConfWithOptions(Map.empty)
    new ParquetFileFormat().buildReaderWithPartitionValues(
      classic, dataSchema, partitionSchema, dataSchema, Nil,
      // rows, not ColumnarBatch: the streaming reader hands rows straight to
      // the micro-batch scan (no whole-stage batch consumer above it)
      Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> "false"), conf)
  }

  /** Spark's OWN scan-task sizing for a list of (path, bytes, modTime)
    * files: dynamic max-split-bytes (maxPartitionBytes capped by
    * bytes-per-core), per-file range splitting, and open-cost-padded
    * first-fit packing — `FileSourceScanExec`'s exact partition layout,
    * reused instead of re-derived. */
  def packFilePartitions(spark: SparkSession,
      files: Seq[(String, Long, Long, InternalRow)]): Seq[Seq[PartitionedFile]] = {
    import org.apache.hadoop.fs.{FileStatus, Path}
    import org.apache.spark.sql.execution.PartitionedFileUtil
    import org.apache.spark.sql.execution.datasources.{FilePartition, FileStatusWithMetadata}
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val openCost = classic.sessionState.conf.filesOpenCostInBytes
    val maxSplit: Long = FilePartition.maxSplitBytes(classic,
      files.map(_._2 + openCost).sum: Long)
    val splits = files.flatMap { case (p, bytes, mod, partValues) =>
      val st = new FileStatus(bytes, false, 1, 0, mod, new Path(p))
      PartitionedFileUtil.splitFiles(FileStatusWithMetadata(st), st.getPath,
        isSplitable = true, maxSplit, partValues)
    }
    FilePartition.getFilePartitions(classic, splits, maxSplit)
      .map(_.files.toSeq)
  }

  /** The V1 reader contract smuggles `ColumnarBatch` objects through
    * `Iterator[InternalRow]` when batch output is enabled (FileScanRDD
    * unwraps them the same way); normalize to plain rows. */
  def rows(readFn: PartitionedFile => Iterator[InternalRow],
      f: PartitionedFile): Iterator[InternalRow] =
    readFn(f).asInstanceOf[Iterator[Any]].flatMap {
      case b: org.apache.spark.sql.vectorized.ColumnarBatch =>
        scala.jdk.CollectionConverters.IteratorHasAsScala(b.rowIterator()).asScala
      case r: InternalRow => Iterator.single(r)
    }
}
