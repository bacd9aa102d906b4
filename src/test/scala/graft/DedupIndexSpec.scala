package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.store.{DedupIndex, SecondaryIndex, TableStore}

/** Persisted MinHash-LSH dedup index ([[graft.store.DedupIndex]], r13 —
  * the incremental-ingest twin of the ANN index): the banded signature
  * table materializes once, rides the GSI changelog replay on the
  * maintenance cadence, and a new batch dedups against the corpus via a
  * bucket-targeted band-key join — never a corpus re-scan, never
  * all-pairs. */
class DedupIndexSpec extends SparkSuite {
  import spark.implicits._

  /** Deterministic 30-token documents over a HUGE token space: a shifted
    * window of doc j collides with doc i only when 1000003·(i−j) ≡ 7919·δ
    * (mod 1e9+7) for |δ| < 30 — probability ~6e-8 per pair, so distinct
    * docs share no trigrams while a suffixed variant keeps J ≈ 0.93.
    * (A small modulus here silently manufactures shifted-copy docs —
    * the first draft's 211 made docs 76 apart near-duplicates.) */
  private def docText(i: Long): String =
    (0 until 30).map(t =>
      s"w${(i * 1000003L + t * 7919L) % 1000000007L}").mkString(" ")

  private def corpus(n: Int) =
    (0L until n.toLong).map(i => (i, docText(i))).toDF("doc_id", "text")

  private def freshStore() = new TableStore(spark,
    Files.createTempDirectory("graft_dedup_idx").toString)

  test("create + nearDups: batch variants match their corpus sources; the " +
      "probe reads a strict subset of index buckets and zero corpus files") {
    val store = freshStore()
    store.commitBucketed(corpus(300), Seq("doc_id"), 8)
    DedupIndex.create(store, "lsh", "text", maxSet = Int.MaxValue,
      numBuckets = 32)
    // one-doc batch: a variant of doc 7 (suffix keeps J = 28/31 ≈ 0.9)
    val batch = Seq((9007L, docText(7) + " zz zz")).toDF("doc_id", "text")
    val out = DedupIndex.nearDups(store, "lsh", batch, threshold = 0.5)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((9007L, 7L)),
      s"the variant must match exactly its source: ${rows.toSeq}")
    // plan shape: index buckets only (strict subset — 16 band keys cannot
    // cover 32 buckets), and the corpus data tree untouched
    val idxFiles = SecondaryIndex.indexStore(store, "lsh")
      .readSnapshot().inputFiles.toSet
    val read = out.inputFiles.toSet
    assert(read.nonEmpty && read.subsetOf(idxFiles) && read.size < idxFiles.size,
      s"bucket-targeted read expected: ${read.size} of ${idxFiles.size}")
    assert(!out.inputFiles.exists(_.contains(s"${store.root}/data")),
      "the batch probe must never touch the corpus table")
    // integer evidence: 30 tokens → 28 trigrams; the 2-token suffix adds
    // exactly 2 windows → |A∩B| = 28, |A∪B| = 30
    val ev = out.collect().head
    assert(ev.getLong(2) == 28L && ev.getLong(3) == 30L,
      s"exact gram evidence expected (28, 30): ${ev.toSeq}")
    assert(!ev.getBoolean(4),
      "unbounded maxSet keeps every gram — evidence is exact, not sketched")
    // the same probe against a CAPPED index: the KMV sketches truncate at
    // max_set, so the integer evidence is an estimate and says so
    DedupIndex.create(store, "lsh8", "text", maxSet = 8, numBuckets = 32)
    val est = DedupIndex.nearDups(store, "lsh8", batch, threshold = 0.5)
      .collect()
    assert(est.nonEmpty && est.forall(_.getBoolean(4)),
      s"capped KMV evidence must be flagged sketched: ${est.map(_.toSeq).toSeq}")
  }

  test("incremental refresh: upserted docs join the band table, deleted " +
      "docs leave it; the un-refreshed index serves the OLD snapshot; " +
      "point churn takes the REPLAY route (untouched buckets inherited)") {
    val store = freshStore()
    store.commitBucketed(corpus(200), Seq("doc_id"), 8)
    // buckets sized to the churn (create scaladoc): 2 changed docs touch
    // ≤ 64 of 256 buckets < the 128 rebuild gate → incremental replay
    DedupIndex.create(store, "lsh", "text", maxSet = Int.MaxValue,
      numBuckets = 256)
    val batch = Seq((9011L, docText(11) + " qq qq"),
      (9150L, docText(150) + " qq qq")).toDF("doc_id", "text")
    // live feed: a NEW near-dup source lands (doc 11's zz variant) and
    // doc 150 is deleted
    store.upsertEq(Seq((5011L, docText(11) + " zz zz"))
      .toDF("doc_id", "text").withColumn("op", lit("PUT")))
    store.deleteEq(Seq(Tuple1(150L)).toDF("doc_id"))
    // BEFORE refresh the index still answers the indexed snapshot
    val stale = DedupIndex.nearDups(store, "lsh", batch, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stale == Set((9011L, 11L), (9150L, 150L)),
      s"pre-refresh index serves the indexed snapshot: $stale")
    val idx = SecondaryIndex.indexStore(store, "lsh")
    val filesBefore = idx.manifest(idx.currentVersion()).inlineFiles.toSet
    DedupIndex.refresh(store, "lsh")
    val filesAfter = idx.manifest(idx.currentVersion()).inlineFiles.toSet
    assert(filesBefore.intersect(filesAfter).size * 2 > filesBefore.size,
      s"point churn must take the bucket-targeted REPLAY (most files " +
        s"inherited): kept ${filesBefore.intersect(filesAfter).size} of " +
        s"${filesBefore.size}")
    val fresh = DedupIndex.nearDups(store, "lsh", batch, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fresh == Set((9011L, 11L), (9011L, 5011L)),
      s"post-refresh: new source indexed, deleted source gone: $fresh")
    // idempotent: a second refresh with no base movement is a no-op
    assert(DedupIndex.refresh(store, "lsh") == store.currentVersion())
  }

  test("the blanket GSI cadence routes dedup indexes through the band " +
      "projection (kind dispatch) and keeps them fresh under maintenance") {
    val store = freshStore()
    store.commitBucketed(corpus(150), Seq("doc_id"), 4)
    DedupIndex.create(store, "lsh", "text", numBuckets = 8)
    store.upsertEq(Seq((5000L, docText(42) + " zz zz"))
      .toDF("doc_id", "text").withColumn("op", lit("PUT")))
    store.compact(targetFiles = 2)
    graft.streaming.StreamingOps.maintain(store,
      graft.streaming.StreamingOps.CdcMaintenance(everyNCommits = 1,
        keepSnapshots = 3))
    assert(SecondaryIndex.status(store).exists(s => s._1 == "lsh" &&
      s._3 == store.currentVersion()),
      "the cadence must leave the dedup index at the base head")
    val got = DedupIndex.nearDups(store, "lsh",
      Seq((9042L, docText(42) + " qq qq")).toDF("doc_id", "text"), 0.5)
      .collect().map(_.getLong(1)).toSet
    assert(got == Set(42L, 5000L),
      s"cadence-refreshed index must serve both sources: $got")
  }

  test("SQL procedure surface: create_dedup_index builds; the GENERIC " +
      "refresh_index advances it; dedup_near_view serves a batch table") {
    val w = Files.createTempDirectory("graft_dedupsql").toString
    spark.conf.set("spark.sql.catalog.ddx_cat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ddx_cat.warehouse", w)
    val store = new TableStore(spark, s"$w/analytics/docs")
    store.commitBucketed(corpus(120), Seq("doc_id"), 4)
    spark.sql("CALL ddx_cat.system.create_dedup_index('analytics.docs', " +
      "'lsh', 'text', 3, 2147483647, 8)")
    store.upsertEq(Seq((5033L, docText(33) + " zz zz"))
      .toDF("doc_id", "text").withColumn("op", lit("PUT")))
    spark.sql("CALL ddx_cat.system.refresh_index('analytics.docs', 'lsh')")
    val batchStore = new TableStore(spark, s"$w/analytics/incoming")
    batchStore.commitBucketed(Seq((9033L, docText(33) + " qq qq"))
      .toDF("doc_id", "text"), Seq("doc_id"), 2)
    val vn = spark.sql("CALL ddx_cat.system.dedup_near_view(" +
      "'analytics.docs', 'lsh', 'analytics.incoming', 0.5D)")
      .head().getString(0)
    val got = spark.sql(
      s"SELECT corpus_id FROM $vn ORDER BY corpus_id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(33L, 5033L),
      s"SQL-served near-dups must cover original + refreshed variant: $got")
  }

  test("COMPOSITE (PK,SK) keys: create/refresh/probe carry the full key " +
      "tuple; derived numBuckets keeps the declared cadence on replay") {
    val store = freshStore()
    val docs = (0L until 160L)
      .map(i => (i, i % 4, docText(i))).toDF("doc_id", "part", "text")
    store.commitBucketed(docs, Seq("doc_id", "part"), 8)
    // declared cadence of 2 docs/refresh → derived buckets 4×16×2 = 128
    DedupIndex.create(store, "lshc", "text", maxSet = Int.MaxValue,
      expectedBatch = 2)
    val idx = SecondaryIndex.indexStore(store, "lshc")
    assert(idx.manifest(idx.currentVersion()).numBuckets == 128,
      "expectedBatch=2 must derive 4×Bands×2 = 128 buckets")
    // live churn: one new near-dup source lands, then refresh — the
    // declared-cadence sizing must keep this on the REPLAY route
    store.upsertEq(Seq((5033L, 5033L % 4, docText(33) + " zz zz"))
      .toDF("doc_id", "part", "text").withColumn("op", lit("PUT")))
    val filesBefore = idx.manifest(idx.currentVersion()).inlineFiles.toSet
    DedupIndex.refresh(store, "lshc")
    val filesAfter = idx.manifest(idx.currentVersion()).inlineFiles.toSet
    assert(filesBefore.intersect(filesAfter).size * 2 > filesBefore.size,
      s"the derived default must keep a cadence-sized batch on replay: " +
        s"kept ${filesBefore.intersect(filesAfter).size} of ${filesBefore.size}")
    // composite probe: the batch carries BOTH key columns; output
    // flattens to batch_*/corpus_* and matches on the full tuple
    val batch = Seq((9033L, 1L, docText(33) + " qq qq"))
      .toDF("doc_id", "part", "text")
    val out = DedupIndex.nearDups(store, "lshc", batch, 0.5)
    assert(out.columns.take(4).toSeq ==
      Seq("batch_doc_id", "batch_part", "corpus_doc_id", "corpus_part"))
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set((9033L, 1L, 33L, 1L), (9033L, 1L, 5033L, 1L)),
      s"composite probe must match both sources on the full tuple: $got")
    // the probe stays bucket-targeted off the corpus
    assert(!DedupIndex.nearDups(store, "lshc", batch, 0.5)
      .inputFiles.exists(_.contains(s"${store.root}/data")),
      "the composite probe must never touch the corpus table")
  }

  test("refusals: unkeyed bases, duplicate create, missing index") {
    val store = freshStore()
    store.commitSnapshot(corpus(20))
    val e = intercept[IllegalArgumentException](
      DedupIndex.create(store, "lsh", "text"))
    assert(e.getMessage.contains("unkeyed"))
    val keyed = freshStore()
    keyed.commitBucketed(corpus(20), Seq("doc_id"), 2)
    DedupIndex.create(keyed, "lsh", "text")
    assert(intercept[IllegalArgumentException](
      DedupIndex.create(keyed, "lsh", "text"))
      .getMessage.contains("already exists"))
    assert(intercept[IllegalArgumentException](
      DedupIndex.nearDups(keyed, "nope",
        Seq((1L, "a b c d")).toDF("doc_id", "text"), 0.5))
      .getMessage.contains("does not exist"))
  }
}
