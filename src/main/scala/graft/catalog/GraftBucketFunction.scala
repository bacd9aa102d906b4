package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, XxHash64}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType}

/** The `bucket(n, keys...)` V2 function backing storage-partitioned joins.
  *
  * Spark resolves a reported `bucket` partition transform against the
  * table's catalog ([[org.apache.spark.sql.connector.catalog.FunctionCatalog]]),
  * binding the transform's arguments — `(numBuckets: Int, key columns...)` —
  * to this function. Two scans whose transforms bind to the same
  * `canonicalName` with equal bucket counts are co-partitioned, which is
  * what lets EnsureRequirements drop both exchanges of a join between
  * co-bucketed graft tables.
  *
  * `produceResult` MUST agree with the write path's placement
  * (TableStore.bucketExpr = `pmod(xxhash64(keys), n)`) — it evaluates the
  * same XxHash64 expression over the key fields — so Spark may also use it
  * to shuffle a non-bucketed side INTO graft's bucketing
  * (`spark.sql.sources.v2.bucketing.shuffle.enabled`).
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, keys...): pmod(xxhash64(keys...), n) — graft bucketed layout"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2,
      s"bucket(numBuckets, keys...) needs at least 2 args, got $inputType")
    require(inputType.fields.head.dataType == IntegerType,
      s"bucket: first argument must be the integer bucket count, got $inputType")
    new Bound(inputType)
  }

  private final class Bound(inputType: StructType)
      extends ScalarFunction[java.lang.Long] {
    // hash the key fields (ordinals 1..n of the function input row) exactly
    // as TableStore.bucketExpr does on the write path (seed 42)
    @transient private lazy val hasher = XxHash64(
      inputType.fields.toSeq.zipWithIndex.drop(1).map { case (f, i) =>
        BoundReference(i, f.dataType, f.nullable)
      }, 42L)
    override def inputTypes(): Array[DataType] = inputType.fields.map(_.dataType)
    override def resultType(): DataType = LongType
    override def isResultNullable: Boolean = false
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    override def produceResult(input: InternalRow): java.lang.Long = {
      val n = input.getInt(0)
      val h = hasher.eval(input).asInstanceOf[Long]
      ((h % n) + n) % n
    }
  }
}
