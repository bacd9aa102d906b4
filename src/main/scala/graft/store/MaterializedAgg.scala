package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Incrementally-maintained aggregate tables (materialized `GROUP BY`
  * views) over bucketed tables — the analytics-side companion of
  * [[SecondaryIndex]]: where the reference's provisioned pipeline keeps a
  * lake COPY of the table fresh (README.md:12), a real deployment keeps
  * dashboards fresh over it, and re-scanning 100 TB per refresh is the
  * cost this removes.
  *
  * The view is `SELECT groupKeys, COUNT(*), SUM(c)... GROUP BY groupKeys`
  * materialized as a graft table bucketed on the GROUP keys. CREATE is one
  * distributed aggregation — the only O(base) pass. REFRESH replays the
  * base changelog with UPDATE PRE-images: post-images contribute +row,
  * pre-images (DELETE / UPDATE_PRE) contribute −row, the signed deltas
  * aggregate per group (one shuffle over O(changed rows)), and only the
  * agg-table buckets holding affected groups rewrite. SUM/COUNT retract
  * exactly — the reason only them: MIN/MAX cannot un-see a retracted
  * extremum without re-scanning the group, so they are refused at create.
  *
  * Exactness: sum columns must be integral or decimal (double addition is
  * non-associative, so incremental retraction would drift from a fresh
  * recompute — refused loudly). SQL NULL semantics are preserved: per sum
  * column the view tracks the non-null count and reads the sum back as
  * NULL when no non-null value remains; groups whose row count reaches 0
  * leave the table. */
object MaterializedAgg {

  private val BaseVersionProp = "graft.agg.base-version"
  private val SumColsProp = "graft.agg.sum-cols"

  def aggStore(base: TableStore, name: String): TableStore = {
    require(TableStore.RefNameOk.pattern.matcher(name).matches(),
      s"aggregate view name must match [A-Za-z0-9._-]{1,128}, got '$name'")
    new TableStore(base.spark, s"${base.root}/agg/$name")
  }

  private def sumCol(c: String) = s"sum_$c"
  private def nnCol(c: String) = s"nn_$c"

  /** Internal materialized row shape: groupKeys ++ (sum_c, nn_c)* ++ _cnt. */
  private def aggExprs(sumCols: Seq[String]): Seq[Column] =
    sumCols.flatMap(c => Seq(
      sum(c).as(sumCol(c)),
      count(col(c)).as(nnCol(c)))) :+ count(lit(1)).as("_cnt")

  /** Materialize the view from the base's current snapshot. */
  def create(base: TableStore, name: String, groupBy: Seq[String],
      sumCols: Seq[String], numBuckets: Int = 16): Long = {
    val bv = base.currentVersion()
    require(bv >= 0, "cannot materialize over an empty table")
    val bm = base.manifest(bv)
    require(bm.bucketKeys.nonEmpty,
      "materialized aggregates require a bucketed (keyed) base table " +
        "(the changelog needs key identity)")
    require(groupBy.nonEmpty, "materialized aggregate needs GROUP BY keys")
    val unknown = (groupBy ++ sumCols).filterNot(bm.schema.fieldNames.contains)
    require(unknown.isEmpty, s"aggregate references unknown columns: $unknown")
    sumCols.foreach { c =>
      bm.schema(c).dataType match {
        case LongType | org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.ByteType | _: DecimalType => ()
        case other => throw new IllegalArgumentException(
          s"SUM($c) over $other cannot retract exactly (non-associative " +
            "addition); cast to DECIMAL in the base or exclude the column")
      }
    }
    val st = aggStore(base, name)
    require(st.currentVersion() < 0, s"aggregate view '$name' already exists")
    val exprs = aggExprs(sumCols)
    st.commitBucketed(
      base.readSnapshot(bv).groupBy(groupBy.map(col): _*)
        .agg(exprs.head, exprs.tail: _*),
      groupBy, numBuckets,
      props = Map(BaseVersionProp -> bv.toString,
        SumColsProp -> sumCols.mkString(",")))
    bv
  }

  /** Advance the view to the base's current snapshot: signed-delta
    * aggregation over the changelog, merged into only the buckets holding
    * affected groups. Idempotent when the base hasn't moved. */
  def refresh(base: TableStore, name: String): Long = {
    val st = aggStore(base, name)
    val av = st.currentVersion()
    require(av >= 0, s"aggregate view '$name' does not exist; create it first")
    val am = st.manifest(av)
    val fromV = am.props(BaseVersionProp).toLong
    val toV = base.currentVersion()
    if (toV == fromV) return fromV
    require(base.existingVersions().contains(fromV),
      s"materialized base snapshot $fromV expired; rebuild the view " +
        "(pin the snapshot with a tag to prevent this)")
    val keys = am.bucketKeys
    val sumCols = am.props(SumColsProp).split(',').filter(_.nonEmpty).toSeq
    val changes = base.readChangelog(fromV, toV, updatePreImages = true)

    val signed = changes.withColumn("_g_sign",
      when(col("_change_type").isin("INSERT", "UPDATE_POST"), lit(1L))
        .otherwise(lit(-1L)))
    val deltaExprs = sumCols.flatMap(c => Seq(
      sum(when(col(c).isNotNull, col(c) * col("_g_sign"))
        .otherwise(lit(null))).as(sumCol(c)),
      sum(when(col(c).isNotNull, col("_g_sign")).otherwise(lit(0L)))
        .as(nnCol(c)))) :+ sum(col("_g_sign")).as("_cnt")
    val delta = signed.groupBy(keys.map(col): _*)
      .agg(deltaExprs.head, deltaExprs.tail: _*)

    val touched = delta
      .select(TableStore.bucketExpr(keys, am.numBuckets).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq.sorted
    if (touched.isEmpty) {
      st.commitIncremental(st.readSnapshot(av).limit(0), Nil,
        expectedParent = Some(av),
        props = am.props + (BaseVersionProp -> toV.toString))
      return toV
    }
    // merge = union of (existing partials, delta partials) re-aggregated
    // per group — NOT a join: GROUP BY treats a NULL group key as one
    // group, while a key-equality join would split it into two rows. SUM
    // over partials also preserves SQL NULL semantics for free (a stored
    // all-NULL sum stays NULL until a non-null delta arrives).
    val valueCols = sumCols.flatMap(c => Seq(sumCol(c), nnCol(c))) :+ "_cnt"
    val shape = keys.map(col) ++ valueCols.map(c =>
      col(c).cast(am.schema(c).dataType).as(c))
    val combined = st.readBuckets(touched, av).select(shape: _*)
      .unionByName(delta.select(shape: _*))
    val mergeExprs = valueCols.map(c =>
      // cast keeps the CREATE-time column type: sum() widens decimals per
      // merge, and commitIncremental rejects schema drift
      sum(col(c)).cast(am.schema(c).dataType).as(c))
    val merged = combined.groupBy(keys.map(col): _*)
      .agg(mergeExprs.head, mergeExprs.tail: _*)
      .filter(col("_cnt") > 0L)
    st.commitIncremental(merged, touched, expectedParent = Some(av),
      props = am.props + (BaseVersionProp -> toV.toString))
    toV
  }

  /** The view with SQL aggregate semantics restored: `SUM(c)` is NULL for
    * groups with no non-null value; the bookkeeping columns drop out. */
  def read(base: TableStore, name: String): DataFrame = {
    val st = aggStore(base, name)
    val am = st.manifest(st.currentVersion())
    val sumCols = am.props(SumColsProp).split(',').filter(_.nonEmpty).toSeq
    val keys = am.bucketKeys
    st.readSnapshot().select(keys.map(col) ++ sumCols.map(c =>
      when(col(nnCol(c)) > 0L, col(sumCol(c)))
        .otherwise(lit(null)).as(sumCol(c))) :+ col("_cnt"): _*)
  }

  /** Delete the view (files + manifests); the base is untouched. */
  def drop(base: TableStore, name: String): Boolean = {
    require(TableStore.RefNameOk.pattern.matcher(name).matches(),
      s"aggregate view name must match [A-Za-z0-9._-]{1,128}, got '$name'")
    val p = new org.apache.hadoop.fs.Path(s"${base.root}/agg/$name")
    val fs = p.getFileSystem(base.spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }
}
