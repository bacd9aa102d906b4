package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.model.DdbAttr

/** File reader for DynamoDB PITR exports — the on-disk form the pipeline's
  * initial load consumes (`dynamodb:ExportTableToPointInTime` +
  * `DescribeExport`, reference src/dynamodb-zero-etl-s3tables.ts:135-137):
  * newline-delimited `{"Item": {...}}` AttributeValue JSON, possibly
  * gzip-compressed (Spark's text source decompresses by extension).
  *
  * Scale: `spark.read.text` splits uncompressed files across executors; the
  * decode is a pure projection (DdbAttr), so the whole load is one
  * distributed pass.
  */
object DdbExportReader {

  /** Read and decode an export file/directory. With no `target` schema the
    * relational schema is inferred from the data (`glue:CreateTable` analog —
    * one extra distributed pass). `keyColumns` are validated like the
    * reference's synth-time table checks (src:58-66). */
  def read(spark: SparkSession, path: String,
      target: Option[StructType] = None,
      keyColumns: Seq[String] = Nil): DataFrame = {
    val raw = spark.read.text(path).select(col("value").as("json"))
    val schema = target.getOrElse(DdbAttr.inferSchema(spark, raw))
    DdbAttr.decode(raw, schema, keyColumns)
  }

  /** Streaming form — the continuous half of the integration's loop
    * (export/CDC files land → decode → merge → queryable, reference
    * src:211-215; README.md:159-166): watch `path` for new
    * AttributeValue-JSON files and decode each micro-batch with the same
    * projection as the batch reader. Structured Streaming needs the schema up
    * front; infer it once from an initial batch read (`glue:CreateTable`),
    * then evolution mid-stream is [[graft.etl.CdcApply]]'s job. Change
    * records carry their `seq`/`op` as ordinary N/S attributes of the item.
    * Scale: the file source lists incrementally and the decode is a pure
    * per-row projection — no state, no shuffle. */
  def readStream(spark: SparkSession, path: String, target: StructType,
      keyColumns: Seq[String] = Nil): DataFrame = {
    val raw = spark.readStream.text(path).select(col("value").as("json"))
    DdbAttr.decode(raw, target, keyColumns)
  }
}
