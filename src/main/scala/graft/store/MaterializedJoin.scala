package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally-maintained JOIN views (materialized fact⋈dim): the
  * denormalized read table every analytics deployment keeps next to the
  * zero-ETL copy (reference README.md:170-173 — the join its example
  * queries pay on every dashboard load), maintained at O(changed keys)
  * instead of re-joined per query or re-built per refresh.
  *
  * Shape: `SELECT l.*, r.<cols> FROM L <inner|left> JOIN R ON l.k = r.k`
  * where L is a keyed (bucketed) fact table and R is a dim table KEYED ON
  * the join columns (its bucket keys — one live row per key, the CDC-table
  * contract). The view is a graft table bucketed on L's primary keys, so
  * it has exactly one row per live fact row and row-level maintenance is
  * the engine's own equality upsert.
  *
  * REFRESH is delta-keyed, two-sided:
  *  - fact-side: the PKs of L rows that actually changed — per-row
  *    MULTISET netting over L's un-joined changelog frames, so a
  *    compaction carry-over nets to zero;
  *  - dim-side: ΔR's changed join-key values (netted on the PROJECTED dim
  *    columns — a dim rewrite touching un-projected columns is a no-op);
  *    the fact rows joining them are read FROM an AUTO-CREATED COVERING
  *    secondary index on L's join columns (ALL-projection GSI: every fact
  *    column rides in the index, clustered by join key) — scattered dim
  *    churn costs O(changed keys' index buckets), never a fact pass (hash
  *    bucketing puts 1% of dim keys in EVERY fact bucket, so a PK
  *    fetch-back would degenerate to a full read); when the join column
  *    IS the fact PK the index is skipped and the fact itself prunes;
  *  - the affected rows re-join against R@to and apply to the view as ONE
  *    equality upsert: PUT rows for keys that still join, REMOVE masks
  *    for keys that vanished.
  *
  * A span that churns most of either table routes to a full recompute
  * (same `spark.graft.agg.refresh.rescanFraction` pricing as
  * [[MaterializedAgg]]); spans of only content-preserving commits advance
  * the watermarks as pure metadata. Both base snapshots are pinned by
  * versioned make-before-break tags on their own stores. */
object MaterializedJoin {

  private val LVersionProp = "graft.join.l-version"
  private val RVersionProp = "graft.join.r-version"
  private val RRootProp = "graft.join.r-root"
  private val LKeysProp = "graft.join.l-keys"
  private val RKeysProp = "graft.join.r-keys"
  private val RColsProp = "graft.join.r-cols"
  private val TypeProp = "graft.join.type"
  private val IdxProp = "graft.join.l-index"
  private val OpCol = "_g_jop"

  private[graft] def jIdxName(name: String) = s"join-$name"
  private def pinTag(name: String, v: Long) = s"join-pin-$name-v$v"
  private def rPinTag(lRoot: String, name: String, v: Long) =
    s"join-pin-${math.abs(lRoot.hashCode)}-$name-v$v"

  private def movePin(st: TableStore, prefix: String, mk: Long => String,
      toV: Long): Unit = {
    if (st.refVersion(mk(toV)).isEmpty) st.createTag(mk(toV), toV)
    val exact =
      ("^" + java.util.regex.Pattern.quote(prefix) + "-v\\d+$").r.pattern
    st.listRefs().map(_.name)
      .filter(n => exact.matcher(n).matches())
      .filterNot(_ == mk(toV)).foreach(st.dropTag)
  }

  def viewStore(l: TableStore, name: String): TableStore = {
    require(TableStore.RefNameOk.pattern.matcher(name).matches(),
      s"join view name must match [A-Za-z0-9._-]{1,128}, got '$name'")
    new TableStore(l.spark, s"${l.root}/join/$name")
  }

  /** Names of every join view registered under `<fact-root>/join/`. */
  def list(l: TableStore): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"${l.root}/join")
    val fs = p.getFileSystem(l.spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => viewStore(l, n).currentVersion() >= 0).sorted.toSeq
  }

  /** (name, rRoot, joinType, materialized L version, current L version,
    * materialized R version, current R version) — stale = either differs. */
  def status(l: TableStore): Seq[(String, String, String, Long, Long,
      Long, Long)] =
    list(l).map { n =>
      val st = viewStore(l, n)
      val p = st.manifest(st.currentVersion()).props
      val r = new TableStore(l.spark, p(RRootProp))
      (n, p(RRootProp), p(TypeProp), p(LVersionProp).toLong,
        l.currentVersion(), p(RVersionProp).toLong, r.currentVersion())
    }

  /** One view's matching-relevant facts, for the transparent join rewrite
    * ([[graft.catalog.JoinViewRewriteRule]]). */
  final case class ViewMeta(name: String, rRoot: String,
      lKeys: Seq[String], rKeys: Seq[String], rCols: Seq[String],
      joinType: String, lVersion: Long, rVersion: Long, viewVersion: Long)

  private[graft] def viewMeta(l: TableStore, name: String)
      : Option[ViewMeta] = {
    val st = viewStore(l, name)
    val v = st.currentVersion()
    if (v < 0) None
    else {
      val p = st.manifest(v).props
      def csv(k: String) = p.getOrElse(k, "").split(',')
        .filter(_.nonEmpty).toSeq
      Some(ViewMeta(name, p(RRootProp), csv(LKeysProp), csv(RKeysProp),
        csv(RColsProp), p(TypeProp), p(LVersionProp).toLong,
        p(RVersionProp).toLong, v))
    }
  }

  private[graft] def viewMetas(l: TableStore): Seq[ViewMeta] =
    list(l).flatMap(viewMeta(l, _))

  private def requireMain(st: TableStore, what: String): Unit =
    require(st.branch.isEmpty,
      s"join views are maintained against MAIN $what, not branch " +
        s"'${st.branch.getOrElse("")}'; publish the branch first")

  /** The join content under the two snapshots — R's join columns renamed
    * before the join so same-named keys never collide, and only L's
    * columns plus the projected dim columns survive. Plain `===` keeps SQL
    * join semantics (NULL keys never match; LEFT keeps the fact row). */
  private def joined(lDf: DataFrame, rDf: DataFrame, lKeys: Seq[String],
      rKeys: Seq[String], rCols: Seq[String], joinType: String,
      lCols: Seq[String]): DataFrame = {
    val rr = rKeys.zipWithIndex.foldLeft(
      rDf.select((rKeys ++ rCols).map(col): _*)) { case (df, (k, i)) =>
        df.withColumnRenamed(k, s"_g_rk_$i")
      }
    val cond = lKeys.zipWithIndex.map { case (k, i) =>
      col(k) === col(s"_g_rk_$i")
    }.reduce(_ && _)
    lDf.join(rr, cond, joinType).select((lCols ++ rCols).map(col): _*)
  }

  def create(l: TableStore, name: String, r: TableStore,
      lKeys: Seq[String], rKeys: Seq[String], rCols: Seq[String],
      joinType: String = "inner", numBuckets: Int = -1): Long = {
    requireMain(l, "fact"); requireMain(r, "dim")
    require(joinType == "inner" || joinType == "left",
      s"join view type must be inner or left, got '$joinType'")
    val lv = l.currentVersion(); val rv = r.currentVersion()
    require(lv >= 0 && rv >= 0, "cannot join empty tables")
    val lm = l.manifest(lv); val rm = r.manifest(rv)
    require(lm.bucketKeys.nonEmpty,
      "join views need a keyed (bucketed) fact table")
    require(rKeys.nonEmpty && rm.bucketKeys == rKeys,
      s"the dim side must be KEYED ON the join columns (bucket keys " +
        s"${rm.bucketKeys} vs join $rKeys) — one live row per key")
    require(lKeys.size == rKeys.size && lKeys.nonEmpty,
      "join column lists must be non-empty and of equal length")
    require(lKeys.forall(lm.schema.fieldNames.contains),
      s"join columns $lKeys not all in the fact schema")
    val badR = (rCols).filterNot(rm.schema.fieldNames.contains)
    require(badR.isEmpty, s"projected dim columns not in schema: $badR")
    require(rCols.intersect(rKeys).isEmpty,
      "projected dim columns must not repeat the join key (the fact side " +
        "already carries it)")
    require(rCols.intersect(lm.schema.fieldNames.toSeq).isEmpty,
      s"projected dim columns collide with fact columns: " +
        s"${rCols.intersect(lm.schema.fieldNames.toSeq)}")
    lKeys.zip(rKeys).foreach { case (a, b) =>
      require(lm.schema(a).dataType == rm.schema(b).dataType,
        s"join column type mismatch: $a ${lm.schema(a).dataType} vs " +
          s"$b ${rm.schema(b).dataType}")
    }
    // refresh nets changed rows by grouping on the full row — map values
    // are not groupable, so they cannot ride a join view
    val mapped = (lm.schema.fields.map(f => f.name -> f.dataType) ++
      rCols.map(c => c -> rm.schema(c).dataType)).collect {
        case (n, _: org.apache.spark.sql.types.MapType) => n
      }
    require(mapped.isEmpty,
      s"map-typed columns cannot ride a join view (row netting groups " +
        s"on them): ${mapped.toSeq}")
    val st = viewStore(l, name)
    require(st.currentVersion() < 0, s"join view '$name' already exists")
    // store-API sessions get the transparent rewrites too
    graft.catalog.AggViewRewrite.install(l.spark)
    val nb = if (numBuckets > 0) numBuckets else lm.numBuckets
    // dim-churn rebuilds read the fact rows joining the changed dim keys
    // FROM a COVERING index on the join columns (DynamoDB's ALL-projection
    // GSI: every fact column rides in the index, bucketed by join key) —
    // scattered dim churn costs O(changed keys' index buckets), never a
    // fact pass (hash-bucketed facts put 1% of dim keys in EVERY fact
    // bucket, so a PK fetch-back degenerates to a full read). The storage
    // trade is the GSI trade: one extra fact copy, clustered by join key.
    // When the join column IS the PK, the fact's own bucketing serves the
    // lookup and no index is built.
    val needIdx = lKeys != lm.bucketKeys
    if (needIdx &&
        !SecondaryIndex.list(l).contains(jIdxName(name)))
      SecondaryIndex.create(l, jIdxName(name), lKeys,
        projection = lm.schema.fieldNames.toSeq
          .filterNot(c => lKeys.contains(c) || lm.bucketKeys.contains(c)),
        nb)
    try {
      st.commitBucketed(
        joined(l.readSnapshot(lv), r.readSnapshot(rv), lKeys, rKeys,
          rCols, joinType, lm.schema.fieldNames.toSeq),
        lm.bucketKeys, nb,
        props = Map(LVersionProp -> lv.toString,
          RVersionProp -> rv.toString, RRootProp -> r.root,
          LKeysProp -> lKeys.mkString(","), RKeysProp -> rKeys.mkString(","),
          RColsProp -> rCols.mkString(","), TypeProp -> joinType) ++
          (if (needIdx) Map(IdxProp -> jIdxName(name)) else Map.empty))
    } catch { case e: Throwable =>
      if (needIdx)
        try { SecondaryIndex.drop(l, jIdxName(name)); () }
        catch { case _: Exception => () }
      throw e
    }
    movePin(l, s"join-pin-$name", pinTag(name, _), lv)
    movePin(r, s"join-pin-${math.abs(l.root.hashCode)}-$name",
      rPinTag(l.root, name, _), rv)
    lv
  }

  /** PKs (or key values) whose rows CHANGED in the span — per-row multiset
    * netting over the un-joined changelog halves projected to `cols`, so
    * content-preserving rewrites cancel; the output is the distinct
    * `keyCols` of net-changed rows. */
  private def nettedKeys(st: TableStore, fromV: Long, toV: Long,
      cols: Seq[String], keyCols: Seq[String]): DataFrame = {
    val (pre, post) = st.changelogFrames(fromV, toV)
    pre.select(cols.map(col): _*).withColumn("_g_sign", lit(-1L))
      .unionByName(post.select(cols.map(col): _*)
        .withColumn("_g_sign", lit(1L)))
      .groupBy(cols.map(col): _*).agg(sum(col("_g_sign")).as("_net"))
      .filter(col("_net") =!= 0L)
      .select(keyCols.map(col): _*).distinct()
  }

  def refresh(l: TableStore, name: String): Long = {
    requireMain(l, "fact")
    val st = viewStore(l, name)
    val vv = st.currentVersion()
    require(vv >= 0, s"join view '$name' does not exist; create it first")
    val vm = st.manifest(vv)
    val p = vm.props
    val r = new TableStore(l.spark, p(RRootProp))
    val fromL = p(LVersionProp).toLong; val fromR = p(RVersionProp).toLong
    val toL = l.currentVersion(); val toR = r.currentVersion()
    if (toL == fromL && toR == fromR) return toL
    require(l.existingVersions().contains(fromL),
      s"materialized fact snapshot $fromL expired; rebuild the view")
    require(r.existingVersions().contains(fromR),
      s"materialized dim snapshot $fromR expired; rebuild the view")
    val lKeys = p(LKeysProp).split(',').filter(_.nonEmpty).toSeq
    val rKeys = p(RKeysProp).split(',').filter(_.nonEmpty).toSeq
    val rCols = p(RColsProp).split(',').filter(_.nonEmpty).toSeq
    val joinType = p(TypeProp)
    val lm = l.manifest(toL)
    val pk = vm.bucketKeys
    def newProps = p + (LVersionProp -> toL.toString,
      RVersionProp -> toR.toString)
    def finish(): Long = {
      movePin(l, s"join-pin-$name", pinTag(name, _), toL)
      movePin(r, s"join-pin-${math.abs(l.root.hashCode)}-$name",
        rPinTag(l.root, name, _), toR)
      toL
    }
    def contentPreserving(st2: TableStore, a: Long, b: Long): Boolean = {
      val have = st2.existingVersions().toSet
      (a + 1 to b).forall(v => have(v) && st2.manifest(v).props
        .get(TableStore.ContentPreservingProp).contains("true"))
    }
    if (contentPreserving(l, fromL, toL) && contentPreserving(r, fromR, toR)) {
      st.commitIncremental(st.readSnapshot(vv).limit(0), Nil,
        expectedParent = Some(vv), props = newProps)
      return finish()
    }
    // ---- route: delta-keyed upsert vs full recompute ------------------
    val rescanFrac = l.spark.conf
      .getOption("spark.graft.agg.refresh.rescanFraction")
      .map(_.toDouble).getOrElse(0.5)
    def frac(st2: TableStore, a: Long, b: Long): Double =
      if (a == b) 0.0
      else {
        val (ad, rm2) = st2.changelogFileDiff(a, b)
        math.max(ad.size, rm2.size).toDouble /
          math.max(1L, st2.manifest(b).nFiles).toDouble
      }
    // a fact schema evolution or rebucket in the span changes the view's
    // own shape — the row-level delta cannot express that; rebuild under
    // the CURRENT fact layout
    val drift = vm.schema.fieldNames.toSeq !=
        lm.schema.fieldNames.toSeq ++ rCols ||
      vm.bucketKeys != lm.bucketKeys
    if (drift ||
        math.max(frac(l, fromL, toL), frac(r, fromR, toR)) >= rescanFrac) {
      st.commitBucketed(
        joined(l.readSnapshot(toL), r.readSnapshot(toR), lKeys, rKeys,
          rCols, joinType, lm.schema.fieldNames.toSeq),
        lm.bucketKeys, vm.numBuckets, expectedParent = Some(vv),
        props = newProps)
      return finish()
    }
    // ---- affected fact rows, from the side that can prune -------------
    // fact-side: netted PKs → their OWN buckets (PK-clustered, the fact
    // read prunes well). dim-side: netted dim keys → the COVERING index's
    // buckets (join-key-clustered) — the full fact rows ride in the index,
    // so scattered dim churn never re-reads the fact (hash bucketing puts
    // 1% of dim keys in every fact bucket; a PK fetch-back would
    // degenerate to a full pass, measured 12.8 s vs the index's targeted
    // read on the 1.5M-row bench fixture).
    val lAll = lm.schema.fieldNames.toSeq
    val kL: Option[DataFrame] =
      if (toL == fromL) None
      else Some(nettedKeys(l, fromL, toL, lAll, pk).persist())
    val dkOpt: Option[DataFrame] =
      if (toR == fromR) None
      else {
        val dk0 = nettedKeys(r, fromR, toR, (rKeys ++ rCols).distinct, rKeys)
        Some(rKeys.zip(lKeys).foldLeft(dk0) { case (df, (rk, lk)) =>
          df.withColumnRenamed(rk, lk)
        }.persist())
      }
    try {
      val rowsL: Option[DataFrame] = kL.map { k =>
        val buckets = k
          .select(TableStore.bucketExpr(pk, lm.numBuckets).as("b"))
          .distinct().collect().map(_.getLong(0)).toSeq
        MaterializedAgg.nsJoin(l.readBuckets(buckets, toL), k, pk,
          "left_semi")
      }
      val rowsR: Option[DataFrame] = dkOpt.map { dk =>
        val src = p.get(IdxProp) match {
          case Some(idx) =>
            // lockstep refresh (O(Δfact)), then read ONLY the index
            // buckets the changed dim keys hash into
            SecondaryIndex.refresh(l, idx)
            val ist = SecondaryIndex.indexStore(l, idx)
            val im = ist.manifest(ist.currentVersion())
            val buckets = dk
              .select(TableStore.bucketExpr(lKeys, im.numBuckets).as("b"))
              .distinct().collect().map(_.getLong(0)).toSeq
            ist.readBuckets(buckets).select(lAll.map(col): _*)
          case None => // join key IS the fact PK: prune the fact itself
            val buckets = dk
              .select(TableStore.bucketExpr(pk, lm.numBuckets).as("b"))
              .distinct().collect().map(_.getLong(0)).toSeq
            l.readBuckets(buckets, toL)
        }
        MaterializedAgg.nsJoin(src, dk, lKeys, "left_semi")
      }
      // dedupe overlap deterministically: the fact-read copy wins (the
      // index may already reflect a commit past toL under a racing writer)
      val lAff = ((rowsL, rowsR) match {
        case (Some(a), Some(b)) =>
          Some(a.unionByName(
            MaterializedAgg.nsJoin(b, kL.get, pk, "left_anti")))
        case (a, b) => a.orElse(b)
      }).get.persist()
      val affected = lAff.select(pk.map(col): _*).distinct()
        .unionByName(kL.map(_.select(pk.map(col): _*))
          .getOrElse(lAff.limit(0).select(pk.map(col): _*)))
        .distinct().persist()
      try {
        if (affected.count() == 0) {
          st.commitIncremental(st.readSnapshot(vv).limit(0), Nil,
            expectedParent = Some(vv), props = newProps)
          return finish()
        }
        val newRows = joined(lAff, r.readSnapshot(toR), lKeys, rKeys,
          rCols, joinType, lAll)
        // one equality upsert: PUT keys that still join, REMOVE the rest
        // (facts deleted — in kL but not in any read — and inner-join
        // facts whose dim match vanished)
        val vSchema = vm.schema
        val removed = MaterializedAgg.nsJoin(affected, newRows.select(
          pk.map(col): _*), pk, "left_anti")
        val removedPadded = vSchema.fieldNames.foldLeft(removed) { (df, c) =>
          if (pk.contains(c)) df
          else df.withColumn(c, lit(null).cast(vSchema(c).dataType))
        }.select(vSchema.fieldNames.map(col): _*)
          .withColumn(OpCol, lit("REMOVE"))
        val winners = newRows.select(vSchema.fieldNames.map(col): _*)
          .withColumn(OpCol, lit("PUT"))
          .unionByName(removedPadded)
        st.upsertEq(winners, opCol = OpCol, removeOp = "REMOVE",
          expectedParent = Some(vv), props = newProps)
        finish()
      } finally { affected.unpersist(); lAff.unpersist(); () }
    } finally {
      kL.foreach(_.unpersist())
      dkOpt.foreach(_.unpersist())
      ()
    }
  }

  /** The materialized join, current as of the last refresh. */
  def read(l: TableStore, name: String): DataFrame =
    viewStore(l, name).readSnapshot()

  /** Delete the view, its covering index, and both snapshot pins. */
  def drop(l: TableStore, name: String): Boolean = {
    requireMain(l, "fact")
    val st = viewStore(l, name)
    if (st.currentVersion() >= 0) {
      val p = st.manifest(st.currentVersion()).props
      p.get(IdxProp).foreach { idx =>
        try { SecondaryIndex.drop(l, idx); () }
        catch { case _: Exception => () }
      }
      p.get(RRootProp).foreach { rr =>
        try {
          val r = new TableStore(l.spark, rr)
          val prefix = s"join-pin-${math.abs(l.root.hashCode)}-$name"
          val exact =
            ("^" + java.util.regex.Pattern.quote(prefix) + "-v\\d+$").r.pattern
          r.listRefs().map(_.name).filter(n => exact.matcher(n).matches())
            .foreach(r.dropTag)
        } catch { case _: Exception => () }
      }
    }
    val prefix = s"join-pin-$name"
    val exact =
      ("^" + java.util.regex.Pattern.quote(prefix) + "-v\\d+$").r.pattern
    l.listRefs().map(_.name).filter(n => exact.matcher(n).matches())
      .foreach(l.dropTag)
    val pth = new org.apache.hadoop.fs.Path(s"${l.root}/join/$name")
    val fs = pth.getFileSystem(l.spark.sparkContext.hadoopConfiguration)
    fs.delete(pth, true)
  }
}
