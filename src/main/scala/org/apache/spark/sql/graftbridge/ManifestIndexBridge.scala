package org.apache.spark.sql.graftbridge

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.execution.datasources.{PartitioningAwareFileIndex, PartitionSpec}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 parquet table over MANIFEST-KNOWN files (r15).
  *
  * [[ParquetTableBridge.create]] hands Spark a path list and Spark's
  * FileTable builds an `InMemoryFileIndex` over it — which re-LISTS every
  * path (`bulkListLeafFiles`, a distributed job above the parallel-
  * discovery threshold) on EVERY scan construction, i.e. on every
  * planning pass of every query. Profiled at a 1,500-file sharded table:
  * ~2.5-4 s per pass, ~90% of the whole optimization. The manifest
  * already records every live file's (path, bytes, modTime) precisely so
  * scans can build `FileStatus`es without touching the filesystem (the
  * V1 [[StatsScanBridge]] has always done this); this bridge is the DSv2
  * twin: a [[PartitioningAwareFileIndex]] seeded from the manifest refs,
  * under a [[ParquetTable]] whose only change is that index. Bridge
  * package purely for `private[sql]` access. */
object ManifestIndexBridge {

  private final class ManifestFileIndex(
      spark: org.apache.spark.sql.classic.SparkSession,
      refs: Seq[StatsScanBridge.FileRef])
      extends PartitioningAwareFileIndex(spark, Map.empty, None) {
    private val statuses = refs.map(r =>
      new FileStatus(r.bytes, false, 1, 0, r.modTime, new Path(r.path)))
    // rootPaths are the FILE paths themselves, exactly like the path-list
    // InMemoryFileIndex this replaces: allFiles() resolves each root
    // through leafFiles (file roots), a file-reuse append / COW commit
    // spanning many snap dirs stays whole, and the plan string's
    // "(N paths)" keeps meaning the PLANNED FILE COUNT (the shape every
    // plan audit greps) — including "(0 paths)" for a provably-empty scan.
    override def rootPaths: Seq[Path] = statuses.map(_.getPath)
    override def refresh(): Unit = ()
    override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec
    override val leafFiles: scala.collection.mutable.LinkedHashMap[Path, FileStatus] = {
      val m = new scala.collection.mutable.LinkedHashMap[Path, FileStatus]()
      statuses.foreach(s => m.put(s.getPath, s))
      m
    }
    override val leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
      statuses.groupBy(_.getPath.getParent)
        .map { case (d, fs) => d -> fs.toArray }
    override val sizeInBytes: Long = refs.iterator.map(_.bytes).sum
  }

  /** A [[ParquetTable]] whose file index is the manifest refs verbatim —
    * every inherited behavior (scan builder, pushdown, vectorized read)
    * is stock; only the filesystem walk is gone. */
  private final class ManifestParquetTable(name: String,
      spark: org.apache.spark.sql.classic.SparkSession,
      options: CaseInsensitiveStringMap, root: String,
      refs: Seq[StatsScanBridge.FileRef], schema: StructType)
      extends ParquetTable(name, spark, options, refs.map(_.path),
        Some(schema), classOf[ParquetFileFormat]) {
    override lazy val fileIndex: PartitioningAwareFileIndex =
      new ManifestFileIndex(spark, refs)
  }

  def create(name: String, spark: SparkSession, root: String,
      refs: Seq[StatsScanBridge.FileRef], schema: StructType,
      options: Map[String, String] = Map.empty): Table = {
    val opts = new java.util.HashMap[String, String]()
    options.foreach { case (k, v) => opts.put(k, v) }
    new ManifestParquetTable(name,
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      new CaseInsensitiveStringMap(opts), root, refs, schema)
  }
}
