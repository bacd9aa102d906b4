package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Bridge to Spark's `private[sql]` ParquetTable so the graft catalog can
  * serve snapshots through the stock V2 parquet read path (vectorized
  * reader, pushdown, pruning) instead of re-implementing a FileTable.
  * Lives under `org.apache.spark.sql` purely for access; no logic. */
object ParquetTableBridge {
  def create(name: String, spark: SparkSession, paths: Seq[String],
      schema: StructType, options: Map[String, String] = Map.empty): Table = {
    val opts = new java.util.HashMap[String, String]()
    options.foreach { case (k, v) => opts.put(k, v) }
    ParquetTable(name,
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      new CaseInsensitiveStringMap(opts), paths, Some(schema),
      classOf[ParquetFileFormat])
  }
}
