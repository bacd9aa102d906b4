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

  def parquetReadFn(spark: SparkSession, schema: StructType)
      : PartitionedFile => Iterator[InternalRow] = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val conf = classic.sessionState.newHadoopConfWithOptions(Map.empty)
    new ParquetFileFormat().buildReaderWithPartitionValues(
      classic, schema, StructType(Nil), schema, Nil,
      // rows, not ColumnarBatch: the streaming reader hands rows straight to
      // the micro-batch scan (no whole-stage batch consumer above it)
      Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> "false"), conf)
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
