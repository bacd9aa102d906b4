package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.store.{AnnIndex, SecondaryIndex, TableStore}

/** Persisted IVF ANN index ([[graft.store.AnnIndex]], VERDICT r11 next #2):
  * cells trained once at create, frozen across refreshes; maintenance is
  * the GSI replay with cell derivation as the projection; point top-k reads
  * a STRICT SUBSET of the index files (the probed cells' buckets) and never
  * touches the base table. */
class AnnIndexSpec extends SparkSuite {
  import spark.implicits._

  private val dim = 8

  /** Deterministic corpus in two well-separated direction families, so
    * recall is structural: ids 0..199 point near axis (id%4), with a tiny
    * id-dependent wobble on a different axis; clones of the query are
    * power-of-two scalings (bit-identical normalization). */
  private def corpus(n: Int) = (0L until n.toLong).map { id =>
    val v = new Array[Float](dim)
    v((id % 4).toInt) = 1.0f
    v(4 + (id % 3).toInt) = 0.01f * ((id % 7) + 1)
    (id, v)
  }.toDF("vec_id", "embedding")

  private def clones(qv: Array[Float], ids: Seq[Long]) =
    ids.map { j =>
      (10000000L + j, qv.map(x => x * math.pow(2.0, j.toDouble).toFloat))
    }.toDF("vec_id", "embedding")

  private def freshStore() = new TableStore(spark,
    Files.createTempDirectory("graft_ann").toString)

  test("create + point top-k: planted clones found at cosine 1.0; the " +
      "query reads a strict subset of index files and zero base files") {
    val store = freshStore()
    val qv = Array.fill(dim)(0f); qv(0) = 1f; qv(5) = 0.5f
    store.commitBucketed(
      corpus(200).unionByName(clones(qv, 1L to 5L))
        .unionByName(Seq((999L, qv)).toDF("vec_id", "embedding")),
      Seq("vec_id"), 8)
    AnnIndex.create(store, "ann", "embedding", clusters = 8, iters = 3,
      numBuckets = 8)
    val top = AnnIndex.topk(store, "ann", qv, k = 6, nProbe = 2,
      excludeId = Some(999L))
    val idxFiles = top.inputFiles.toSet
    val allIdx = SecondaryIndex.indexStore(store, "ann")
      .readSnapshot().inputFiles.toSet
    assert(idxFiles.nonEmpty && idxFiles.subsetOf(allIdx) &&
      idxFiles.size < allIdx.size,
      s"point query must read a strict subset of index files: " +
        s"${idxFiles.size} of ${allIdx.size}")
    assert(!top.inputFiles.exists(_.contains(s"${store.root}/data")),
      "point query must never touch the base table")
    val rows = top.collect().map(r => (r.getLong(0), r.getDouble(1)))
    val planted = rows.filter(_._1 >= 10000000L)
    assert(planted.map(_._1).toSeq == (1L to 5L).map(10000000L + _),
      s"planted set missing from top-k: ${rows.toSeq}")
    assert(planted.forall(_._2 == 1.0),
      s"clone cosine must be exactly 1.0: ${planted.toSeq}")
  }

  test("refresh assigns new vectors into FROZEN cells incrementally and " +
      "retracts deletes; centroids never retrain") {
    val store = freshStore()
    val qv = Array.fill(dim)(0f); qv(1) = 1f; qv(6) = 0.25f
    store.commitBucketed(
      corpus(200).unionByName(Seq((999L, qv)).toDF("vec_id", "embedding")),
      Seq("vec_id"), 8)
    AnnIndex.create(store, "ann", "embedding", clusters = 8, iters = 3)
    val idx = SecondaryIndex.indexStore(store, "ann")
    val centsBefore = idx.manifest(idx.currentVersion())
      .props("graft.ann.centroids")
    // live feed: plant clones, delete a corpus vector, refresh
    store.upsertEq(clones(qv, 1L to 4L).withColumn("op", lit("PUT")))
    store.deleteEq(Seq(Tuple1(7L)).toDF("vec_id"))
    val iv0 = idx.currentVersion()
    AnnIndex.refresh(store, "ann")
    assert(idx.currentVersion() > iv0, "refresh must commit")
    assert(idx.manifest(idx.currentVersion()).props("graft.ann.centroids")
      == centsBefore, "refresh must never retrain centroids")
    // the refreshed index serves the planted set...
    val top = AnnIndex.topk(store, "ann", qv, k = 5, nProbe = 2,
      excludeId = Some(999L))
    val got = top.collect().map(_.getLong(0)).filter(_ >= 10000000L).toSeq
    assert(got == (1L to 4L).map(10000000L + _),
      s"refresh must land the planted clones in the query's cell: $got")
    // ...and the deleted key is OUT of the index entirely
    assert(idx.readSnapshot().filter(col("vec_id") === 7L).count() == 0,
      "deleteEq retraction must leave the index")
    // a second refresh with no base movement is a no-op
    assert(AnnIndex.refresh(store, "ann") == store.currentVersion())
  }

  test("the blanket GSI cadence refresh routes ANN indexes through the " +
      "cell projection (kind prop dispatch)") {
    val store = freshStore()
    store.commitBucketed(corpus(100), Seq("vec_id"), 4)
    AnnIndex.create(store, "ann", "embedding", clusters = 4, iters = 2)
    store.upsertEq(Seq((5000L, Array.fill(dim)(0.5f), "PUT"))
      .toDF("vec_id", "embedding", "op"))
    // the generic entry point — what StreamingOps.maintain calls
    SecondaryIndex.refresh(store, "ann")
    val idx = SecondaryIndex.indexStore(store, "ann")
    assert(idx.readSnapshot().filter(col("vec_id") === 5000L).count() == 1,
      "generic refresh must have applied the ANN projection")
    assert(SecondaryIndex.status(store).exists(s => s._1 == "ann" &&
      s._3 == store.currentVersion()), "status must show the index current")
  }

  test("the maintenance CADENCE keeps the ANN index fresh: compaction " +
      "(content-preserving) is a watermark-only advance, real churn " +
      "replays through the cell projection") {
    val store = freshStore()
    val qv = Array.fill(dim)(0f); qv(3) = 1f
    store.commitBucketed(corpus(200), Seq("vec_id"), 4)
    AnnIndex.create(store, "ann", "embedding", clusters = 4, iters = 2)
    val idx = SecondaryIndex.indexStore(store, "ann")
    // live feed: new vectors + a compaction, then ONE cadence pass
    store.upsertEq(clones(qv, 1L to 3L).withColumn("op", lit("PUT")))
    store.compact(targetFiles = 2)
    graft.streaming.StreamingOps.maintain(store,
      graft.streaming.StreamingOps.CdcMaintenance(everyNCommits = 1,
        keepSnapshots = 3))
    assert(SecondaryIndex.status(store)
      .exists(s => s._1 == "ann" && s._3 == store.currentVersion()),
      "the cadence must leave the ANN index at the base head")
    val got = AnnIndex.topk(store, "ann", qv, k = 3, nProbe = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(got == (1L to 3L).map(10000000L + _),
      s"cadence-refreshed index must serve the planted set: $got")
    // a second pass with nothing new is a no-op for the index store
    val iv = idx.currentVersion()
    graft.streaming.StreamingOps.maintain(store,
      graft.streaming.StreamingOps.CdcMaintenance(everyNCommits = 1,
        keepSnapshots = 3))
    assert(SecondaryIndex.status(store)
      .exists(s => s._1 == "ann" && s._3 == store.currentVersion()))
    assert(idx.currentVersion() <= iv + 1,
      "an idle cadence must not rebuild the ANN index")
  }

  test("SQL procedure surface: create_ann_index trains and builds; the " +
      "GENERIC refresh_index advances it; ann_topk_view serves the point " +
      "query as a temp view") {
    val w = Files.createTempDirectory("graft_annsql").toString
    spark.conf.set("spark.sql.catalog.ann_cat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ann_cat.warehouse", w)
    val store = new TableStore(spark, s"$w/analytics/vecs")
    val qv = Array.fill(dim)(0f); qv(2) = 1f; qv(7) = 0.125f
    store.commitBucketed(
      corpus(150).unionByName(Seq((999L, qv)).toDF("vec_id", "embedding")),
      Seq("vec_id"), 8)
    spark.sql("CALL ann_cat.system.create_ann_index('analytics.vecs', " +
      "'emb', 'embedding', 8, 2)")
    store.upsertEq(clones(qv, 1L to 3L).withColumn("op", lit("PUT")))
    spark.sql("CALL ann_cat.system.refresh_index('analytics.vecs', 'emb')")
    val vn = spark.sql("CALL ann_cat.system.ann_topk_view(" +
      "'analytics.vecs', 'emb', 999L, 4, 2)").head().getString(0)
    val got = spark.sql(
      s"SELECT vec_id FROM $vn ORDER BY cos_sim DESC, vec_id")
      .collect().map(_.getLong(0)).toSeq
    assert(got.take(3) == (1L to 3L).map(10000000L + _),
      s"SQL-served top-k must lead with the planted clones: $got")
  }

  test("create is refused on unkeyed or non-long-keyed bases; topk on a " +
      "missing index fails actionably") {
    val store = freshStore()
    store.commitBucketed(corpus(50)
      .withColumn("vec_id", col("vec_id").cast("string")),
      Seq("vec_id"), 4)
    val e = intercept[IllegalArgumentException](
      AnnIndex.create(store, "ann", "embedding"))
    assert(e.getMessage.contains("LONG primary key"))
    val e2 = intercept[IllegalArgumentException](
      AnnIndex.topk(store, "nope", Array.fill(dim)(1f), 5))
    assert(e2.getMessage.contains("does not exist"))
  }
}
