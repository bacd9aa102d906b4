package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

import graft.sources.DdbExportReader
import graft.store.TableStore

/** Full-snapshot load: the pipeline's initial-load leg (reference
  * README.md:159-166 steps 1-6 — export, transform, commit). Composes the
  * export reader with a snapshot commit; CDC then continues from the
  * committed snapshot via [[CdcApply]] /
  * [[graft.streaming.StreamingOps.cdcApplyStream]].
  */
object SnapshotLoad {

  /** Decode `exportPath` and commit it as the next snapshot of `store`.
    * Returns the committed snapshot id. */
  def run(spark: SparkSession, exportPath: String, store: TableStore,
      target: Option[StructType] = None,
      partitionBy: Seq[String] = Nil,
      keyColumns: Seq[String] = Nil): Long = {
    val typed = DdbExportReader.read(spark, exportPath, target, keyColumns)
    store.commitSnapshot(typed, partitionBy)
  }
}
