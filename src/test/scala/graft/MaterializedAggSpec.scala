package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.store.{MaterializedAgg, TableStore}

/** Incrementally-maintained aggregate views ([[MaterializedAgg]]): every
  * refresh is checked against a recompute-from-scratch oracle over the
  * base's CURRENT snapshot, across each delete/upsert route the store
  * supports (COW incremental, positional MOR, equality, prefix equality),
  * plus the SQL NULL / vanishing-group semantics and the bucket-rewrite
  * economy
  * that makes refresh O(changed groups) at scale. */
class MaterializedAggSpec extends SparkSuite {
  import spark.implicits._

  private def freshStore() =
    new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft_magg").toString)

  /** (id, grp, n, d): id is the bucket key, grp the GROUP BY key, n a long
    * sum column, d a decimal sum column nullable by construction. */
  private def baseRows(n: Int): DataFrame =
    (1L to n.toLong).map { k =>
      val d: Option[BigDecimal] =
        if (k % 5 == 0) None else Some(BigDecimal(k).setScale(2) / 4)
      (k, s"g${k % 7}", k * 3, d)
    }.toDF("id", "grp", "n", "d")
      .withColumn("d", col("d").cast("decimal(18,2)"))

  /** What the view SHOULD contain for the base's current snapshot. */
  private def recompute(base: TableStore): Seq[String] =
    canon(base.readSnapshot().groupBy("grp")
      .agg(sum("n").as("sum_n"), sum("d").as("sum_d"),
        count(lit(1)).as("_cnt"))
      .select(col("grp"), col("sum_n"),
        col("sum_d").cast("decimal(28,2)"), col("_cnt")))

  private def viewRows(base: TableStore): Seq[String] =
    canon(MaterializedAgg.read(base, "v")
      .select(col("grp"), col("sum_n"),
        col("sum_d").cast("decimal(28,2)"), col("_cnt")))

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("create materializes the aggregate; read restores SQL semantics") {
    val base = freshStore()
    base.commitBucketed(baseRows(300), Seq("id"), 8)
    MaterializedAgg.create(base, "v", Seq("grp"), Seq("n", "d"),
      numBuckets = 4)
    assert(viewRows(base) == recompute(base))
    // the view itself is a bucketed graft table on the group keys
    val st = MaterializedAgg.aggStore(base, "v")
    assert(st.manifest(st.currentVersion()).bucketKeys == Seq("grp"))
  }

  test("refresh parity across COW / positional-MOR / equality routes") {
    val base = freshStore()
    base.commitBucketed(baseRows(400), Seq("id"), 8)
    MaterializedAgg.create(base, "v", Seq("grp"), Seq("n", "d"), 4)

    // COW incremental: update n for ids %10==3, delete %10==7, insert new
    val next = base.readSnapshot()
      .filter(col("id") % 10 =!= 7)
      .withColumn("n", when(col("id") % 10 === 3, col("n") + 1000)
        .otherwise(col("n")))
      .unionByName(Seq((9001L, "g2", 5L, Some(BigDecimal("1.25"))),
        (9002L, "g9", 7L, None)).toDF("id", "grp", "n", "d")
        .withColumn("d", col("d").cast("decimal(18,2)")))
    base.commitIncremental(next, (0L until 8L).toSeq)
    MaterializedAgg.refresh(base, "v")
    assert(viewRows(base) == recompute(base))

    // positional MOR upsert: shift some rows to a different group
    base.upsertMor(base.readSnapshot().filter(col("id") % 10 === 4)
      .withColumn("grp", lit("g_moved")).withColumn("op", lit("PUT")))
    MaterializedAgg.refresh(base, "v")
    assert(viewRows(base) == recompute(base))

    // equality upsert + full-key equality delete
    base.upsertEq(base.readSnapshot().filter(col("id") % 10 === 5)
      .withColumn("n", col("n") * 2).withColumn("op", lit("PUT")))
    base.deleteEq(Seq(2L, 12L, 22L, 9001L).toDF("id"))
    MaterializedAgg.refresh(base, "v")
    assert(viewRows(base) == recompute(base))
  }

  test("refresh parity across a PREFIX equality delete on a composite key") {
    val base = freshStore()
    base.commitBucketed(
      (1L to 200L).flatMap(pk => (1 to 3).map(sk =>
        (pk, sk, s"g${pk % 5}", pk * sk)))
        .toDF("pk", "sk", "grp", "n"),
      Seq("pk", "sk"), 8)
    MaterializedAgg.create(base, "v", Seq("grp"), Seq("n"), 4)
    base.deleteEq((1L to 200L).filter(_ % 4 == 0).toDF("pk"))
    MaterializedAgg.refresh(base, "v")
    def rec = canon(base.readSnapshot().groupBy("grp")
      .agg(sum("n").as("sum_n"), count(lit(1)).as("_cnt")))
    assert(canon(MaterializedAgg.read(base, "v")
      .select("grp", "sum_n", "_cnt")) == rec)
  }

  test("SUM NULL semantics: all-null group reads NULL, retraction restores it") {
    val base = freshStore()
    base.commitBucketed(Seq(
      (1L, "a", 1L, None), (2L, "a", 2L, None),
      (3L, "b", 3L, Some(BigDecimal("7.50"))))
      .toDF("id", "grp", "n", "d")
      .withColumn("d", col("d").cast("decimal(18,2)")), Seq("id"), 4)
    MaterializedAgg.create(base, "v", Seq("grp"), Seq("n", "d"), 2)
    def dOf(g: String) = MaterializedAgg.read(base, "v")
      .filter(col("grp") === g).select("sum_d").head()
    assert(dOf("a").isNullAt(0), "all-null group must read SUM = NULL")
    // a non-null value arrives in 'a'…
    base.commitIncremental(base.readSnapshot().unionByName(
      Seq((4L, "a", 4L, Some(BigDecimal("2.25")))).toDF("id", "grp", "n", "d")
        .withColumn("d", col("d").cast("decimal(18,2)"))), (0L until 4L).toSeq)
    MaterializedAgg.refresh(base, "v")
    assert(dOf("a").getDecimal(0) == new java.math.BigDecimal("2.25"))
    // …and is retracted again: the stored sum must return to NULL, not 0
    base.deleteEq(Seq(4L).toDF("id"))
    MaterializedAgg.refresh(base, "v")
    assert(dOf("a").isNullAt(0),
      "retracting the last non-null value must restore SUM = NULL")
    assert(viewRows(base) == recompute(base))
  }

  test("a group retracted to zero rows leaves the view") {
    val base = freshStore()
    base.commitBucketed(baseRows(100), Seq("id"), 4)
    MaterializedAgg.create(base, "v", Seq("grp"), Seq("n", "d"), 2)
    // g3 = ids where id % 7 == 3
    base.deleteEq((1L to 100L).filter(_ % 7 == 3).toDF("id"))
    MaterializedAgg.refresh(base, "v")
    assert(MaterializedAgg.read(base, "v")
      .filter(col("grp") === "g3").count() == 0L,
      "emptied group must leave the view")
    assert(viewRows(base) == recompute(base))
  }

  test("group-key UPDATE moves mass between groups (pre-image retraction)") {
    val base = freshStore()
    base.commitBucketed(baseRows(150), Seq("id"), 4)
    MaterializedAgg.create(base, "v", Seq("grp"), Seq("n", "d"), 2)
    base.upsertMor(base.readSnapshot().filter(col("grp") === "g1")
      .withColumn("grp", lit("g2")).withColumn("op", lit("PUT")))
    MaterializedAgg.refresh(base, "v")
    assert(MaterializedAgg.read(base, "v")
      .filter(col("grp") === "g1").count() == 0L)
    assert(viewRows(base) == recompute(base))
  }

  test("refresh rewrites ONLY the agg buckets holding affected groups") {
    val base = freshStore()
    base.commitBucketed(baseRows(300), Seq("id"), 8)
    MaterializedAgg.create(base, "v", Seq("grp"), Seq("n", "d"),
      numBuckets = 8)
    val st = MaterializedAgg.aggStore(base, "v")
    val before = st.manifest(st.currentVersion()).inlineFiles.toSet
    // touch exactly one group → one agg bucket
    base.upsertEq(base.readSnapshot().filter(col("id") === 10L)
      .withColumn("n", col("n") + 1).withColumn("op", lit("PUT")))
    MaterializedAgg.refresh(base, "v")
    val after = st.manifest(st.currentVersion()).inlineFiles.toSet
    val touchedBucket = Seq("g3").toDF("grp")
      .select(TableStore.bucketExpr(Seq("grp"), 8).as("b")).head().getLong(0)
    val inherited = before.intersect(after)
    assert(inherited.nonEmpty, "untouched agg buckets must be inherited")
    val rewritten = after -- before
    // every fresh file belongs to the single affected agg bucket
    assert(rewritten.forall(_.contains(s"_gbucket=$touchedBucket")),
      s"refresh rewrote buckets beyond the affected group: $rewritten")
    assert(viewRows(base) == recompute(base))
  }

  test("content-preserving base rewrite advances the watermark ONLY") {
    val base = freshStore()
    base.commitBucketed(baseRows(200), Seq("id"), 8)
    MaterializedAgg.create(base, "v", Seq("grp"), Seq("n", "d"), 4)
    val st = MaterializedAgg.aggStore(base, "v")
    val files0 = st.manifest(st.currentVersion()).inlineFiles.toSet
    // compaction rewrites every base file with identical content: the
    // signed deltas cancel, so refresh must not rewrite a single view
    // bucket — just move the base-version watermark forward
    base.compact(targetFiles = 1)
    MaterializedAgg.refresh(base, "v")
    val m1 = st.manifest(st.currentVersion())
    assert(m1.inlineFiles.toSet == files0,
      "compaction must not rewrite view buckets (all-zero deltas)")
    assert(viewRows(base) == recompute(base))
  }

  test("the view rides the CDC maintenance cadence and stays fresh") {
    import graft.streaming.StreamingOps
    val base = freshStore()
    base.commitBucketed(baseRows(120), Seq("id"), 4)
    MaterializedAgg.create(base, "v", Seq("grp"), Seq("n", "d"), 2)
    base.deleteEq((1L to 120L).filter(_ % 9 == 0).toDF("id"))
    StreamingOps.maintain(base,
      StreamingOps.CdcMaintenance(keepSnapshots = 1, maxDvFiles = 0))
    // maintenance refreshed the view BEFORE purging/expiring — it is
    // fresh, and the pinned base snapshot never expired mid-pass
    val st = MaterializedAgg.aggStore(base, "v")
    val am = st.manifest(st.currentVersion())
    assert(am.props("graft.agg.base-version").toLong ==
      base.currentVersion() ||
      // maintenance commits landing AFTER the refresh (purge, compaction)
      // leave the view one content-identical step behind — refresh again
      // nets zero
      viewRows(base) == recompute(base))
    assert(viewRows(base) == recompute(base))
  }

  test("idempotent refresh: base unmoved means no new view commit") {
    val base = freshStore()
    base.commitBucketed(baseRows(50), Seq("id"), 4)
    MaterializedAgg.create(base, "v", Seq("grp"), Seq("n", "d"), 2)
    val st = MaterializedAgg.aggStore(base, "v")
    val v0 = st.currentVersion()
    MaterializedAgg.refresh(base, "v")
    assert(st.currentVersion() == v0, "no-op refresh must not commit")
  }

  test("refusals: double sums, unbucketed base, unknown cols, duplicates") {
    val base = freshStore()
    base.commitBucketed(baseRows(20).withColumn("f", col("n") * 1.5),
      Seq("id"), 2)
    val e1 = intercept[IllegalArgumentException](
      MaterializedAgg.create(base, "bad", Seq("grp"), Seq("f"), 2))
    assert(e1.getMessage.contains("retract"))
    val e2 = intercept[IllegalArgumentException](
      MaterializedAgg.create(base, "bad", Seq("grp"), Seq("nope"), 2))
    assert(e2.getMessage.contains("unknown"))
    MaterializedAgg.create(base, "v", Seq("grp"), Seq("n"), 2)
    val e3 = intercept[IllegalArgumentException](
      MaterializedAgg.create(base, "v", Seq("grp"), Seq("n"), 2))
    assert(e3.getMessage.contains("exists"))
    val flat = freshStore()
    flat.commitSnapshot(baseRows(20))
    val e4 = intercept[IllegalArgumentException](
      MaterializedAgg.create(flat, "v", Seq("grp"), Seq("n"), 2))
    assert(e4.getMessage.contains("bucketed"))
  }

  test("pin survives expiry; a force-dropped pin refuses with rebuild msg") {
    val base = freshStore()
    base.commitBucketed(baseRows(60), Seq("id"), 4)
    MaterializedAgg.create(base, "v", Seq("grp"), Seq("n", "d"), 2)
    base.commitIncremental(base.readSnapshot()
      .withColumn("n", col("n") + 1), (0L until 4L).toSeq)
    base.commitIncremental(base.readSnapshot()
      .withColumn("n", col("n") + 1), (0L until 4L).toSeq)
    // the agg pin tag holds the materialized snapshot against expiry, so
    // a vacuum mid-cadence cannot strand the view
    base.vacuum(keepSnapshots = 1)
    MaterializedAgg.refresh(base, "v")
    assert(viewRows(base) == recompute(base))
    // …but an operator force-dropping the pin then expiring loses the
    // changelog base: refresh must refuse loudly, not silently rebuild
    base.commitIncremental(base.readSnapshot()
      .withColumn("n", col("n") + 1), (0L until 4L).toSeq)
    base.listRefs().map(_.name).filter(_.startsWith("agg-pin-"))
      .foreach(base.dropTag)
    base.vacuum(keepSnapshots = 1)
    val e = intercept[IllegalArgumentException](
      MaterializedAgg.refresh(base, "v"))
    assert(e.getMessage.contains("expired"))
  }

  // ---------------------------------------------------------------- MIN/MAX

  /** Full recompute oracle incl. MIN/MAX. */
  private def recomputeMm(base: TableStore): Seq[String] =
    canon(base.readSnapshot().groupBy("grp")
      .agg(sum("n").as("sum_n"), min("d").as("min_d"), max("d").as("max_d"),
        count(lit(1)).as("_cnt"))
      .select(col("grp"), col("sum_n"), col("min_d"), col("max_d"),
        col("_cnt")))

  private def viewMm(base: TableStore): Seq[String] =
    canon(MaterializedAgg.read(base, "mm")
      .select("grp", "sum_n", "min_d", "max_d", "_cnt"))

  test("min/max: create + monotonic inserts merge without any rescan") {
    val base = freshStore()
    base.commitBucketed(baseRows(200), Seq("id"), 8)
    MaterializedAgg.create(base, "mm", Seq("grp"), Seq("n"), 4,
      minMaxCols = Seq("d"))
    assert(viewMm(base) == recomputeMm(base))
    // inserts only — extremes extend monotonically (a smaller min arrives)
    base.commitIncremental(base.readSnapshot().unionByName(
      Seq((9001L, "g1", 1L, Some(BigDecimal("-5.00"))),
        (9002L, "g1", 2L, Some(BigDecimal("999.00"))))
        .toDF("id", "grp", "n", "d")
        .withColumn("d", col("d").cast("decimal(18,2)"))),
      (0L until 8L).toSeq)
    MaterializedAgg.refresh(base, "mm")
    assert(viewMm(base) == recomputeMm(base))
  }

  test("min/max: retracting the extremum dirties the group and rescans") {
    val base = freshStore()
    base.commitBucketed(baseRows(200), Seq("id"), 8)
    MaterializedAgg.create(base, "mm", Seq("grp"), Seq("n"), 4,
      minMaxCols = Seq("d"))
    // g2's max d = the largest id ≡ 2 (mod 7), not divisible by 5 — find
    // and delete exactly that row
    val maxRow = base.readSnapshot().filter(col("grp") === "g2")
      .orderBy(col("d").desc_nulls_last).select("id").head().getLong(0)
    base.deleteEq(Seq(maxRow).toDF("id"))
    MaterializedAgg.refresh(base, "mm")
    assert(viewMm(base) == recomputeMm(base))
    // and the min side: delete g4's minimum
    val minRow = base.readSnapshot().filter(col("grp") === "g4")
      .orderBy(col("d").asc_nulls_last).select("id").head().getLong(0)
    base.deleteEq(Seq(minRow).toDF("id"))
    MaterializedAgg.refresh(base, "mm")
    assert(viewMm(base) == recomputeMm(base))
  }

  test("min/max: retracting ONE of two duplicate minima keeps the min " +
      "(multiset netting, not set except)") {
    val base = freshStore()
    base.commitBucketed(Seq(
      (1L, "a", 1L, Some(BigDecimal("2.00"))),
      (2L, "a", 2L, Some(BigDecimal("2.00"))), // duplicate min
      (3L, "a", 3L, Some(BigDecimal("9.00"))))
      .toDF("id", "grp", "n", "d")
      .withColumn("d", col("d").cast("decimal(18,2)")), Seq("id"), 4)
    MaterializedAgg.create(base, "mm", Seq("grp"), Seq("n"), 2,
      minMaxCols = Seq("d"))
    base.deleteEq(Seq(1L).toDF("id"))
    MaterializedAgg.refresh(base, "mm")
    val r = MaterializedAgg.read(base, "mm").select("min_d", "max_d").head()
    assert(r.getDecimal(0) == new java.math.BigDecimal("2.00"),
      "the surviving duplicate must keep the min")
    assert(r.getDecimal(1) == new java.math.BigDecimal("9.00"))
    assert(viewMm(base) == recomputeMm(base))
  }

  test("min/max: compaction carry-over of the extremum row is NOT dirty " +
      "and the watermark-only property survives") {
    val base = freshStore()
    base.commitBucketed(baseRows(200), Seq("id"), 8)
    MaterializedAgg.create(base, "mm", Seq("grp"), Seq("n"), 4,
      minMaxCols = Seq("d"))
    val st = MaterializedAgg.aggStore(base, "mm")
    val files0 = st.manifest(st.currentVersion()).inlineFiles.toSet
    base.compact(targetFiles = 1)
    MaterializedAgg.refresh(base, "mm")
    assert(st.manifest(st.currentVersion()).inlineFiles.toSet == files0,
      "carry-over extremum rows must net to zero, not dirty the group")
    assert(viewMm(base) == recomputeMm(base))
  }

  test("min/max: all-null group reads NULL; value arrives and retracts") {
    val base = freshStore()
    base.commitBucketed(Seq(
      (1L, "z", 1L, Option.empty[BigDecimal]),
      (2L, "z", 2L, None))
      .toDF("id", "grp", "n", "d")
      .withColumn("d", col("d").cast("decimal(18,2)")), Seq("id"), 2)
    MaterializedAgg.create(base, "mm", Seq("grp"), Seq("n"), 2,
      minMaxCols = Seq("d"))
    def mm() = MaterializedAgg.read(base, "mm")
      .filter(col("grp") === "z").select("min_d", "max_d").head()
    assert(mm().isNullAt(0) && mm().isNullAt(1))
    base.commitIncremental(base.readSnapshot().unionByName(
      Seq((3L, "z", 3L, Some(BigDecimal("7.00")))).toDF("id", "grp", "n", "d")
        .withColumn("d", col("d").cast("decimal(18,2)"))), (0L until 2L).toSeq)
    MaterializedAgg.refresh(base, "mm")
    assert(mm().getDecimal(0) == new java.math.BigDecimal("7.00"))
    base.deleteEq(Seq(3L).toDF("id"))
    MaterializedAgg.refresh(base, "mm")
    assert(mm().isNullAt(0) && mm().isNullAt(1),
      "retracting the only non-null value must restore MIN/MAX = NULL")
    assert(viewMm(base) == recomputeMm(base))
  }

  test("min/max: update that MOVES a value dirties via net, not raw pre") {
    val base = freshStore()
    base.commitBucketed(baseRows(150), Seq("id"), 4)
    MaterializedAgg.create(base, "mm", Seq("grp"), Seq("n"), 2,
      minMaxCols = Seq("d"))
    // raise every g5 minimum: the old min is net-retracted, the group
    // rescans, and the new min comes from the surviving values
    val minRow = base.readSnapshot().filter(col("grp") === "g5")
      .orderBy(col("d").asc_nulls_last).select("id").head().getLong(0)
    base.upsertMor(base.readSnapshot().filter(col("id") === minRow)
      .withColumn("d", lit(BigDecimal("100000.00")).cast("decimal(18,2)"))
      .withColumn("op", lit("PUT")))
    MaterializedAgg.refresh(base, "mm")
    assert(viewMm(base) == recomputeMm(base))
  }

  test("min/max: the covering index is auto-created, listed, and dropped " +
      "with the view; refusals are loud") {
    val base = freshStore()
    base.commitBucketed(baseRows(60), Seq("id"), 4)
    MaterializedAgg.create(base, "mm", Seq("grp"), Seq("n"), 2,
      minMaxCols = Seq("d"))
    assert(graft.store.SecondaryIndex.list(base).contains("agg-mm-mm"))
    assert(MaterializedAgg.status(base).exists(s => s._1 == "mm" &&
      s._4 == "d"))
    MaterializedAgg.drop(base, "mm")
    assert(!graft.store.SecondaryIndex.list(base).contains("agg-mm-mm"),
      "the covering index must go with the view")
    // refusal: grouping by the primary key cannot carry min/max
    val e = intercept[IllegalArgumentException](
      MaterializedAgg.create(base, "bad", Seq("id"), Nil, 2,
        minMaxCols = Seq("d")))
    assert(e.getMessage.contains("covering index"))
  }

  test("sharded-tier base: view refresh stays incremental across eq deletes") {
    spark.conf.set("spark.graft.manifest.inlineThreshold", "16")
    try {
      val base = freshStore()
      base.commitBucketed(baseRows(4000), Seq("id"), 32)
      assert(base.manifest(base.currentVersion()).isSharded,
        "fixture must be on the sharded metadata tier")
      MaterializedAgg.create(base, "v", Seq("grp"), Seq("n", "d"), 4)
      base.deleteEq((1L to 4000L).filter(_ % 11 == 0).toDF("id"))
      base.upsertEq(base.readSnapshot().filter(col("id") % 13 === 0)
        .withColumn("n", col("n") + 5).withColumn("op", lit("PUT")))
      MaterializedAgg.refresh(base, "v")
      assert(viewRows(base) == recompute(base))
    } finally spark.conf.unset("spark.graft.manifest.inlineThreshold")
  }

  test("drop removes the view; the base is untouched") {
    val base = freshStore()
    base.commitBucketed(baseRows(30), Seq("id"), 4)
    MaterializedAgg.create(base, "v", Seq("grp"), Seq("n"), 2)
    val n0 = base.readSnapshot().count()
    assert(MaterializedAgg.drop(base, "v"))
    assert(MaterializedAgg.aggStore(base, "v").currentVersion() < 0)
    assert(base.readSnapshot().count() == n0)
  }

  // ---- COUNT(DISTINCT) via companion views --------------------------------

  private def dcRecompute(base: TableStore): Seq[String] =
    canon(base.readSnapshot().groupBy("grp")
      .agg(sum("n").as("sum_n"), countDistinct(col("d")).as("dc_d"),
        count(lit(1)).as("_cnt"))
      .select(col("grp"), col("sum_n"), col("dc_d"), col("_cnt")))

  private def dcViewRows(base: TableStore): Seq[String] =
    canon(MaterializedAgg.read(base, "dv")
      .select(col("grp"), col("sum_n"), col("dc_d"), col("_cnt")))

  test("count-distinct companion: parity across routes, retraction to zero") {
    val base = freshStore()
    base.commitBucketed(baseRows(400), Seq("id"), 8)
    MaterializedAgg.create(base, "dv", Seq("grp"), Seq("n"), 4,
      distinctCols = Seq("d"))
    assert(MaterializedAgg.list(base).contains("dv__dc_d"),
      "the companion view must exist")
    assert(dcViewRows(base) == dcRecompute(base))

    // retract SOME carriers of shared values (d repeats every 4·5·7 ids —
    // duplicates exist), plus whole-group moves
    base.deleteEq((1L to 400L).filter(k => k % 10 == 3).toDF("id"))
    MaterializedAgg.refresh(base, "dv")
    assert(dcViewRows(base) == dcRecompute(base))

    // flip every remaining d of one group to NULL: its distinct count
    // must retract to ZERO while the group row survives (_cnt > 0)
    base.upsertMor(base.readSnapshot().filter(col("grp") === "g1")
      .withColumn("d", lit(null).cast("decimal(18,2)"))
      .withColumn("op", lit("PUT")))
    MaterializedAgg.refresh(base, "dv")
    assert(dcViewRows(base) == dcRecompute(base))
    val g1 = MaterializedAgg.read(base, "dv").filter(col("grp") === "g1")
      .select("dc_d", "_cnt").head()
    assert(g1.getLong(0) == 0L && g1.getLong(1) > 0L,
      s"all-NULL group must read dc=0 with live _cnt, got $g1")

    // companion cannot be dropped out from under the parent
    val e = intercept[IllegalArgumentException](
      MaterializedAgg.drop(base, "dv__dc_d"))
    assert(e.getMessage.contains("companion"))
    // ...but drops with it
    MaterializedAgg.drop(base, "dv")
    assert(!MaterializedAgg.list(base).exists(_.startsWith("dv")),
      "companions must drop with the parent view")
  }

  test("refresh-vs-recompute routing: a scattered span recomputes, a " +
      "bucket-local span replays — parity either way") {
    val base = freshStore()
    base.commitBucketed(baseRows(600), Seq("id"), 8)
    MaterializedAgg.create(base, "v", Seq("grp"), Seq("n", "d"), 4)
    def viewFiles(): Set[String] = {
      val st = MaterializedAgg.aggStore(base, "v")
      st.manifest(st.currentVersion()).inlineFiles.toSet
    }
    // scattered eq delete touches every bucket → changed fraction 1.0 →
    // the router recomputes: NO view file of the previous snapshot
    // survives (full rewrite), and content matches the oracle
    base.deleteEq((1L to 600L).filter(_ % 7 == 0).toDF("id"))
    val before = viewFiles()
    MaterializedAgg.refresh(base, "v")
    assert(viewRows(base) == recompute(base))
    assert(viewFiles().intersect(before).isEmpty,
      "scattered span must route to full recompute (no inherited files)")
    // bucket-local change → replay: untouched view buckets inherit
    base.upsertMor(base.readSnapshot().filter(col("id") === 8)
      .withColumn("n", col("n") + 1).withColumn("op", lit("PUT")))
    val before2 = viewFiles()
    MaterializedAgg.refresh(base, "v")
    assert(viewRows(base) == recompute(base))
    assert(viewFiles().intersect(before2).nonEmpty,
      "bucket-local span must replay incrementally (files inherited)")
    // the routing threshold is a conf: forcing rescanFraction to 0 turns
    // even the local span into a recompute, still content-exact
    base.upsertMor(base.readSnapshot().filter(col("id") === 16)
      .withColumn("n", col("n") + 1).withColumn("op", lit("PUT")))
    spark.conf.set("spark.graft.agg.refresh.rescanFraction", "0.0")
    try {
      val before3 = viewFiles()
      MaterializedAgg.refresh(base, "v")
      assert(viewRows(base) == recompute(base))
      assert(viewFiles().intersect(before3).isEmpty,
        "rescanFraction=0 must force the recompute route")
    } finally spark.conf.unset("spark.graft.agg.refresh.rescanFraction")
  }
}
