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

  /** The base-table tag pinning the snapshot the view reflects: refresh
    * replays the changelog FROM that snapshot, so expiry must not collect
    * it mid-cadence. Same discipline as [[SecondaryIndex]]: pins are
    * VERSIONED (`agg-pin-<name>-v<snapshot>`) and move make-before-break,
    * and pin matching is EXACT so view "foo" can never release "foo-v2"'s
    * pin (the ADVICE r8 prefix-match hazard). */
  private def pinName(name: String): String = s"agg-pin-$name"
  private def pinTagName(name: String, v: Long): String =
    s"agg-pin-$name-v$v"

  private[graft] def dropPins(base: TableStore, name: String,
      keep: Option[Long] = None): Unit = {
    val exact = pinName(name)
    val versioned =
      ("^" + java.util.regex.Pattern.quote(exact) + "-v\\d+$").r.pattern
    base.listRefs().map(_.name)
      .filter(n => n == exact || versioned.matcher(n).matches())
      .filterNot(n => keep.exists(v => n == pinTagName(name, v)))
      .foreach(base.dropTag)
  }

  private def movePin(base: TableStore, name: String, toV: Long): Unit = {
    if (base.refVersion(pinTagName(name, toV)).isEmpty)
      base.createTag(pinTagName(name, toV), toV)
    dropPins(base, name, keep = Some(toV))
  }

  def aggStore(base: TableStore, name: String): TableStore = {
    require(TableStore.RefNameOk.pattern.matcher(name).matches(),
      s"aggregate view name must match [A-Za-z0-9._-]{1,128}, got '$name'")
    new TableStore(base.spark, s"${base.root}/agg/$name")
  }

  /** Names of every aggregate view registered under `<base-root>/agg/`. */
  def list(base: TableStore): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"${base.root}/agg")
    val fs = p.getFileSystem(base.spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => aggStore(base, n).currentVersion() >= 0).sorted.toSeq
  }

  /** Introspection row per view: (name, group keys, sum columns,
    * materialized base version, current base version) — `stale` = the
    * versions differ. */
  def status(base: TableStore): Seq[(String, String, String, Long, Long)] = {
    val cur = base.currentVersion()
    list(base).map { n =>
      val st = aggStore(base, n)
      val am = st.manifest(st.currentVersion())
      (n, am.bucketKeys.mkString(","),
        am.props.getOrElse(SumColsProp, ""),
        am.props(BaseVersionProp).toLong, cur)
    }
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
    requireMain(base)
    val bv = base.currentVersion()
    require(bv >= 0, "cannot materialize over an empty table")
    val bm = base.manifest(bv)
    require(bm.bucketKeys.nonEmpty,
      "materialized aggregates require a bucketed (keyed) base table " +
        "(the changelog needs key identity)")
    require(groupBy.nonEmpty, "materialized aggregate needs GROUP BY keys")
    val unknown = (groupBy ++ sumCols).filterNot(bm.schema.fieldNames.contains)
    require(unknown.isEmpty, s"aggregate references unknown columns: $unknown")
    // the view's internal bookkeeping names must not collide with group
    // keys (groupBy("sum_n").agg(sum("n").as("sum_n")) would be ambiguous)
    val internal = sumCols.flatMap(c => Seq(sumCol(c), nnCol(c))) :+ "_cnt"
    val clash = internal.filter(groupBy.contains)
    require(clash.isEmpty,
      s"group keys collide with the view's internal columns: $clash " +
        "(rename the base column or exclude it)")
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
    movePin(base, name, bv)
    bv
  }

  /** Advance the view to the base's current snapshot: signed-delta
    * aggregation over the changelog, merged into only the buckets holding
    * affected groups. Idempotent when the base hasn't moved. */
  /** Aggregate views (like secondary indexes) are derivatives of MAIN:
    * they live under the shared `<root>/agg/` tree and record watermarks
    * in main's snapshot numbering, while a branch view's versions overlap
    * main's numbering past the fork — a refresh against a branch head
    * would corrupt the shared view for every main reader. Branch commits
    * reach the view after publish, through the next main refresh. */
  private def requireMain(base: TableStore): Unit =
    require(base.branch.isEmpty,
      s"materialized aggregates are maintained against MAIN, not branch " +
        s"'${base.branch.getOrElse("")}'; publish the branch first")

  def refresh(base: TableStore, name: String): Long = {
    requireMain(base)
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
    // UN-JOINED changelog halves: the signed-delta aggregation needs no
    // INSERT/UPDATE/DELETE classification — a pre-image row contributes
    // −row, a post-image row +row, and carry-over rows from
    // content-preserving rewrites cancel inside the partial aggregation.
    // Skipping readChangelog's keyed full-outer join (its heaviest
    // operation — a shuffle join over every row of every changed file)
    // turns refresh into two file-pruned reads + ONE map-side-combined
    // aggregation of O(changed-file rows) → O(changed groups) partials.
    val (preF, postF) = base.changelogFrames(fromV, toV)
    val signed = preF.withColumn("_g_sign", lit(-1L))
      .unionByName(postF.withColumn("_g_sign", lit(1L)))
    // sign by NEGATION, not multiplication: -decimal(p,s) keeps (p,s)
    // while decimal × bigint inflates to (38,s), whose later cast back to
    // the stored type could overflow-to-null silently
    val deltaExprs = sumCols.flatMap(c => Seq(
      sum(when(col(c).isNotNull,
        when(col("_g_sign") > 0, col(c)).otherwise(-col(c)))
        .otherwise(lit(null))).as(sumCol(c)),
      sum(when(col(c).isNotNull, col("_g_sign")).otherwise(lit(0L)))
        .as(nnCol(c)))) :+ sum(col("_g_sign")).as("_cnt")
    // Drop all-zero delta rows: a content-preserving base rewrite
    // (compaction, z-order, DV/eq purge) shows up in the file-diff
    // changelog as DELETE+INSERT pairs of identical rows, whose signed
    // contributions cancel exactly — without this filter a full base
    // compaction would rewrite every view bucket with identical content.
    // A group row is a no-op iff every tracked partial nets to zero (a
    // NULL sum delta means no non-null contribution at all).
    val noop = sumCols.map(c =>
      (col(sumCol(c)).isNull || col(sumCol(c)) === lit(0)) &&
        col(nnCol(c)) === lit(0L))
      .foldLeft(col("_cnt") === lit(0L))(_ && _)
    // The changelog replay (file diff + keyed join) feeds two separate
    // actions — the touched-bucket collect and the commit's write job —
    // persist the O(changed groups) delta so the replay runs once.
    val delta = signed.groupBy(keys.map(col): _*)
      .agg(deltaExprs.head, deltaExprs.tail: _*)
      .filter(!noop).persist()
    try {
      val touched = delta
        .select(TableStore.bucketExpr(keys, am.numBuckets).as("b"))
        .distinct().collect().map(_.getLong(0)).toSeq.sorted
      if (touched.isEmpty) {
        // base moved but no group changed semantically (metadata-only,
        // compaction, purge): just advance the watermark
        st.commitIncremental(st.readSnapshot(av).limit(0), Nil,
          expectedParent = Some(av),
          props = am.props + (BaseVersionProp -> toV.toString))
        movePin(base, name, toV)
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
      movePin(base, name, toV)
      toV
    } finally { delta.unpersist(); () }
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
    requireMain(base)
    require(TableStore.RefNameOk.pattern.matcher(name).matches(),
      s"aggregate view name must match [A-Za-z0-9._-]{1,128}, got '$name'")
    dropPins(base, name) // release the materialized-snapshot pins
    val p = new org.apache.hadoop.fs.Path(s"${base.root}/agg/$name")
    val fs = p.getFileSystem(base.spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }
}
