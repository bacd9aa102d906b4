package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.functions.VecKernels
import graft.ops.LlmCommon._
import graft.ops.Relational.Q

/** Similarity search + multimodal columns (SURVEY.md §2.J).
  *
  * Scale design: brute-force cosine is one broadcast (the query vector) +
  * a map-side JIT'd scoring pass + TakeOrderedAndProject — no shuffle of the
  * corpus. The IVF/LSH variant prunes the corpus to the query's multi-band
  * buckets before scoring, the 100 TB path (bucket column becomes a
  * partition key on disk, turning probes into partition pruning).
  */
object LlmSim {

  /** Map-side cosine scoring of (vec_id, embedding, qv) rows through the
    * JIT'd [[VecKernels]] fold — same sequential double accumulation as the
    * DuckDB oracle's LIST_DOT_PRODUCT, so hash parity holds; the interpreted
    * HOF formulation it replaces was measured ~5× slower. */
  private def scoreCosine(rows: DataFrame): DataFrame = {
    import rows.sparkSession.implicits._
    rows.select(col("vec_id"), col("embedding"), col("qv"))
      .as[(Long, Array[Float], Array[Float])]
      .mapPartitions { it =>
        it.map { case (id, v, q) => (id, VecKernels.cosine(v, q)) }
      }
      .toDF("vec_id", "cos_raw")
  }

  /** Brute-force cosine top-k against the vec_id=0 query vector
    * (SURVEY `sim_search_topk`). Rounded to 6 dp so engine-side ulp noise in
    * the double fold can't flip the ranking, with vec_id tie-break. */
  private val simSearchTopk: Q = (s, d) => {
    val emb = load(s, d, "embeddings")
    val qv = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    scoreCosine(emb.crossJoin(broadcast(qv)).filter(col("vec_id") =!= 0))
      .select(col("vec_id"), round(col("cos_raw"), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc_nulls_last, col("vec_id").asc_nulls_first)
      .limit(20)
  }

  /** Bucket-pruned ANN (SURVEY §2.J extension `sim_search_ivf`): multi-band
    * sign-LSH — `bands` independent 2^rowsPerBand bucketings (same shape as
    * the MinHash/embedding-dedup banding) — so bucket count scales with r,
    * not the corpus; only vectors sharing a band bucket with the query are
    * scored. Multi-probe (flip each bit within a band) widens recall without
    * widening the scan. Everything stays distributed: the query row is a
    * broadcast 1-row side, never collected. */
  def lshTopK(emb: DataFrame, queryId: Long, k: Int, dim: Int,
      bands: Int = 8, rowsPerBand: Int = 16): DataFrame = {
    import emb.sparkSession.implicits._
    val pl = VecKernels.planes(bands * rowsPerBand, dim)
    val vecs = emb.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val banded = vecs.mapPartitions { it =>
      it.flatMap { case (id, v) =>
        VecKernels.bandBuckets(v, pl, bands, rowsPerBand)
          .iterator.zipWithIndex.map { case (bk, b) => (id, b, bk) }
      }
    }.toDF("vec_id", "band", "bkey")
    // query probes: its own bucket per band plus every 1-bit flip
    val probes = vecs.filter(col("vec_id") === queryId).mapPartitions { it =>
      it.flatMap { case (_, v) =>
        VecKernels.bandBuckets(v, pl, bands, rowsPerBand)
          .iterator.zipWithIndex.flatMap { case (bk, b) =>
            (bk, b) +: (0 until rowsPerBand).map(j => (bk ^ (1L << j), b))
          }.map { case (pk, b) => (b, pk) }
      }
    }.toDF("pband", "pkey")
    val candIds = banded.join(broadcast(probes),
        col("band") === col("pband") && col("bkey") === col("pkey"))
      .filter(col("vec_id") =!= queryId)
      .select("vec_id").distinct()
    val qv = emb.filter(col("vec_id") === queryId).select(col("embedding").as("qv"))
    val cand = emb.join(candIds, "vec_id").crossJoin(broadcast(qv))
    scoreCosine(cand)
      .select(col("vec_id"), round(col("cos_raw"), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc_nulls_last, col("vec_id").asc_nulls_first)
      .limit(k)
  }

  /** DETERMINISTIC ANN oracle construction (VERDICT r4 #6), shared by the
    * LSH and k-means IVF entries: the fixture has no natural neighbors above
    * cosine 0.60, so 20 clones of the vec_id=0 query vector are planted at
    * magnitudes 2¹..2²⁰ under ids 10,000,001+. Power-of-two scaling keeps
    * every hyperplane sign bit identical (sign(2ʲx) = sign(x)) AND
    * normalizes bit-identically (the division is exact), so every clone
    * shares the query's LSH buckets and its k-means cell — recall on the
    * planted set is structural, not probabilistic — and both engines compute
    * cosine EXACTLY 1.0. The true top-20 is therefore the planted set in id
    * order, and the DuckDB brute-force oracle agrees bit-for-bit (the
    * 0.60-vs-1.0 margin absorbs any float-vs-double evaluation order). */
  private def clones(base: DataFrame, from: Int, to: Int): DataFrame =
    base.filter(col("vec_id") === 0)
      .select(explode(sequence(lit(from), lit(to))).as("j"), col("embedding"))
      .select((lit(10000000L) + col("j")).as("vec_id"),
        transform(col("embedding"),
          x => x * pow(lit(2.0), col("j")).cast("float")).as("embedding"))

  private def plantClones(base: DataFrame): DataFrame =
    base.unionByName(clones(base, 1, 20))

  private val simSearchIvf: Q = (s, d) =>
    lshTopK(plantClones(load(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"))), queryId = 0L, k = 20, dim = 64)

  /** Spherical k-means trainer — the implementation moved to
    * [[graft.store.AnnIndex.kmeansCentroids]] (the persisted IVF index
    * trains with the same code); this in-query surface delegates. */
  def kmeansCentroids(unit: org.apache.spark.sql.Dataset[(Long, Array[Double])],
      clusters: Int, iters: Int): Array[Array[Double]] =
    graft.store.AnnIndex.kmeansCentroids(unit, clusters, iters)

  /** k-means-IVF ANN (north-star extension `sim_search_ivf_kmeans`): the
    * classic IVF index — spherical k-means partitions the corpus into
    * `clusters` cells; a probe scores ONLY the `nProbe` cells whose centroids
    * are nearest the query. Complements the LSH variant (`sim_search_ivf`):
    * k-means cells adapt to the data distribution where LSH buckets are
    * data-oblivious. The query row stays distributed (1-row dataset →
    * broadcast join), and at scale the cluster id becomes the on-disk
    * partition key exactly like the LSH bucket (PlanShapeSpec demonstrates
    * that pruning shape). */
  def kmeansIvfTopK(emb: DataFrame, queryId: Long, k: Int, clusters: Int = 16,
      iters: Int = 4, nProbe: Int = 2): DataFrame = {
    import emb.sparkSession.implicits._
    val sc = emb.sparkSession.sparkContext
    val unit = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) => (id, VecKernels.normalize(v)) })
    val cents = kmeansCentroids(unit, clusters, iters)
    val bc = sc.broadcast(cents)
    val assigned = unit.mapPartitions { it =>
      val cs = bc.value
      it.map { case (id, v) => (id, VecKernels.nearestCentroid(v, cs)) }
    }.toDF("vec_id", "cluster")
    // the query's nProbe nearest cells, computed distributed (1-row side)
    val probes = unit.filter(_._1 == queryId).mapPartitions { it =>
      val cs = bc.value
      it.flatMap { case (_, q) =>
        cs.indices.sortBy(c => (-VecKernels.dotD(q, cs(c)), c)).take(nProbe)
      }
    }.toDF("cluster")
    val candIds = assigned.join(broadcast(probes), "cluster")
      .filter(col("vec_id") =!= queryId)
      .select("vec_id")
    val qv = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qv"))
    scoreCosine(emb.join(candIds, "vec_id").crossJoin(broadcast(qv)))
      .select(col("vec_id"), round(col("cos_raw"), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc_nulls_last, col("vec_id").asc_nulls_first)
      .limit(k)
  }

  /** Same [[plantClones]] construction through the k-means index: clones
    * land in the query's cell (bit-identical normalized vectors, same argmax
    * with lowest-index tie-break), which nProbe ≥ 1 always probes — recall
    * of the planted top-20 is structural whatever the clustering converges
    * to. */
  private val simSearchIvfKmeans: Q = (s, d) =>
    kmeansIvfTopK(plantClones(load(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"))), queryId = 0L, k = 20)

  /** PERSISTED IVF index end-to-end (`sim_search_ann_index`,
    * [[graft.store.AnnIndex]], VERDICT r11 next #2): the corpus plus half
    * the planted clones become a keyed graft table; `AnnIndex.create`
    * trains the cells once and materializes the cell-bucketed index; a
    * live-feed upsert lands the OTHER half of the planted set; the cadence
    * `refresh` assigns the new vectors into the frozen cells incrementally
    * (O(changed rows + touched cell buckets), never a corpus re-cluster);
    * and the point query reads ONLY the probed cells' buckets. Same
    * structural-recall construction as the in-query IVF entries, so the
    * DuckDB brute-force oracle is exact: every power-of-two clone
    * normalizes bit-identically to the query, lands in its cell at create
    * AND at refresh, and scores cosine exactly 1.0. */
  private val simSearchAnnIndex: Q = (s, d) => {
    val base = load(s, d, "embeddings").select(col("vec_id"), col("embedding"))
    val store = new graft.store.TableStore(s, graft.util.Scratch.dir("ann_idx"))
    store.commitBucketed(base.unionByName(clones(base, 1, 10)),
      Seq("vec_id"), 16)
    graft.store.AnnIndex.create(store, "ann", "embedding",
      clusters = 16, iters = 4)
    store.upsertEq(clones(base, 11, 20).withColumn("op", lit("PUT")))
    graft.store.AnnIndex.refresh(store, "ann")
    graft.store.AnnIndex.topkById(store, "ann", queryId = 0L, k = 20,
      nProbe = 2)
  }

  /** Planted NEIGHBORHOOD — near-duplicates, NOT exact clones (VERDICT r12
    * next #2b): vec 0 plus a per-element float ADDITIVE shift `j * 0.001`,
    * so cosine lands near-but-below 1.0 and recall is a real measurement,
    * not structural. Float arithmetic mirrors DuckDB's
    * `x + CAST(0.001 * j AS FLOAT)` bit-for-bit (double product, one
    * float round, one float add), so the brute-force oracle agrees. */
  private def neighbors(base: DataFrame, from: Int, to: Int): DataFrame =
    base.filter(col("vec_id") === 0)
      .select(explode(sequence(lit(from), lit(to))).as("j"), col("embedding"))
      .select((lit(20000000L) + col("j")).as("vec_id"),
        transform(col("embedding"),
          x => x + (lit(0.001) * col("j")).cast("float")).as("embedding"))

  /** ANN RECALL oracle (`sim_search_ann_recall`): the emitted rows are the
    * exact brute-force top-10 over corpus + planted neighborhood (DuckDB
    * computes the same), and the in-query require() holds the PERSISTED
    * index to recall@10 ≥ 0.8 at nProbe 2 of 16 cells against that truth —
    * so the correctness row fails if either the exact ranking or the
    * index's recall regresses. The neighbors differ from the query by a
    * tiny additive shift, so they cluster into the query's cell without
    * being bit-identical — recall is earned by the probe, not planted. */
  private val simSearchAnnRecall: Q = (s, d) => {
    import s.implicits._
    val base = load(s, d, "embeddings").select(col("vec_id"), col("embedding"))
    val corpus = base.unionByName(neighbors(base, 1, 12))
    val qv = corpus.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val brute = scoreCosine(
        corpus.crossJoin(broadcast(qv)).filter(col("vec_id") =!= 0))
      .select(col("vec_id"), round(col("cos_raw"), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc_nulls_last, col("vec_id").asc_nulls_first)
      .limit(10)
    val store = new graft.store.TableStore(s,
      graft.util.Scratch.dir("ann_recall"))
    store.commitBucketed(corpus, Seq("vec_id"), 16)
    graft.store.AnnIndex.create(store, "ann", "embedding",
      clusters = 16, iters = 4)
    val qvec = corpus.filter(col("vec_id") === 0)
      .select(col("embedding")).as[Array[Float]].head()
    val annIds = graft.store.AnnIndex
      .topk(store, "ann", qvec, k = 10, nProbe = 2, excludeId = Some(0L))
      .select("vec_id").as[Long].collect().toSet
    val truth = brute.select("vec_id").as[Long].collect()
    val recall = truth.count(annIds.contains).toDouble / truth.length
    require(recall >= 0.8,
      s"ANN recall@10 = $recall < 0.8 at nProbe 2/16 (found " +
        s"${truth.count(annIds.contains)} of ${truth.length})")
    brute
  }

  /** INDEX-SERVED batch ANN (`sim_search_ann_batch`, r16, VERDICT r15
    * next #5): a 100-query batch probes the PERSISTED IVF index —
    * map-side cell assignment of the batch (the create-time kernel),
    * bucket-targeted read of the probed cells' union, broadcast
    * cell-equi-join, per-query rank window — O(batch × nProbe ×
    * corpus/cells), no driver loop, no brute force. The batch clusters
    * on 8 base vectors (the realistic repeated/clustered serving shape),
    * so the probed union stays a STRICT SUBSET of the 64 cells and the
    * index read a strict subset of its files (require()d). Exactness is
    * structural: each query's top-5 — itself plus its four
    * power-of-two-scaled clones, all cosine exactly 1.0 — normalizes
    * bit-identically, lands in the query's own nearest cell, and nProbe
    * ≥ 1 always probes it; DuckDB brute force computes the same ranking. */
  private val simSearchAnnBatch: Q = (s, d) => {
    val base = load(s, d, "embeddings").select(col("vec_id"), col("embedding"))
    // 4 clones per base vector i < 8: vec_id = 10000000 + i*100 + j
    val planted = base.filter(col("vec_id") < 8)
      .select(col("vec_id"), explode(sequence(lit(1), lit(4))).as("j"),
        col("embedding"))
      .select((lit(10000000L) + col("vec_id") * 100 + col("j")).as("vec_id"),
        transform(col("embedding"),
          x => x * pow(lit(2.0), col("j")).cast("float")).as("embedding"))
    val store = new graft.store.TableStore(s,
      graft.util.Scratch.dir("ann_batch"))
    store.commitBucketed(base.unionByName(planted), Seq("vec_id"), 16)
    graft.store.AnnIndex.create(store, "ann", "embedding",
      clusters = 64, iters = 4)
    val queries = base.filter(col("vec_id") < 8)
      .select(col("vec_id").as("bv"), col("embedding"))
      .crossJoin(s.range(0, 100).select(col("id").as("q_id")))
      .filter(col("bv") === col("q_id") % 8)
      .select(col("q_id"), col("embedding").as("qv"))
    val out = graft.store.AnnIndex.topkBatch(store, "ann", queries,
      "q_id", "qv", k = 5, nProbe = 2)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos_sim"))
    // the index-side read must be a STRICT SUBSET of the index's files,
    // and nothing of the BASE corpus store may be read (the batch side
    // legitimately reads the raw embeddings source)
    val idxStore = graft.store.SecondaryIndex.indexStore(store, "ann")
    val idxFiles = idxStore.manifest(idxStore.currentVersion())
      .inlineFiles.toSet
    val read = out.inputFiles.toSet
    val idxRead = read.filter(idxFiles)
    require(idxRead.nonEmpty && idxRead.size < idxFiles.size,
      s"batch probe must read a STRICT SUBSET of the index's " +
        s"${idxFiles.size} files, read ${idxRead.size}")
    require(!read.exists(f => f.startsWith(store.root) &&
      !f.contains("/index/")),
      "the batch probe must never touch the base corpus store")
    out
  }

  /** FILTERED + adaptively-widened batch ANN
    * (`sim_search_ann_batch_filtered`, r17, VERDICT r16 next #1):
    * [[simSearchAnnBatch]]'s fixture under the common `WHERE <key pred>
    * ORDER BY cos LIMIT k` batch shape — the key predicate keeps only the
    * planted clones, applied EXACTLY to the probed cells' index rows
    * before the per-query rank, and `widenToFill` guarantees k rows per
    * query even where the filter empties a probed cell (the under-fill
    * trap the single-query path closed in r15). Each query's filtered
    * top-4 is its own four bit-identically-normalized clones (cosine
    * exactly 1.0, living in the query's first-probed cell), so the serve
    * is exact and DuckDB brute force over the planted subset recomputes
    * it. The k-fill is require()d for all 100 queries. */
  private val simSearchAnnBatchFiltered: Q = (s, d) => {
    val base = load(s, d, "embeddings").select(col("vec_id"), col("embedding"))
    val planted = base.filter(col("vec_id") < 8)
      .select(col("vec_id"), explode(sequence(lit(1), lit(4))).as("j"),
        col("embedding"))
      .select((lit(10000000L) + col("vec_id") * 100 + col("j")).as("vec_id"),
        transform(col("embedding"),
          x => x * pow(lit(2.0), col("j")).cast("float")).as("embedding"))
    val store = new graft.store.TableStore(s,
      graft.util.Scratch.dir("ann_batch_f"))
    store.commitBucketed(base.unionByName(planted), Seq("vec_id"), 16)
    graft.store.AnnIndex.create(store, "ann", "embedding",
      clusters = 64, iters = 4)
    val queries = base.filter(col("vec_id") < 8)
      .select(col("vec_id").as("bv"), col("embedding"))
      .crossJoin(s.range(0, 100).select(col("id").as("q_id")))
      .filter(col("bv") === col("q_id") % 8)
      .select(col("q_id"), col("embedding").as("qv"))
    val out = graft.store.AnnIndex.topkBatch(store, "ann", queries,
      "q_id", "qv", k = 4, nProbe = 2,
      keyFilter = Some(col("vec_id") >= 10000000L), widenToFill = true)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos_sim"))
    // k-FILL contract: every one of the 100 queries returns exactly k
    // rows under the filter (an under-filled result is the trap)
    val counts = out.groupBy(col("q_id"))
      .agg(count(lit(1)).as("n")).collect()
    require(counts.length == 100 && counts.forall(_.getLong(1) == 4L),
      s"filtered batch must fill k=4 for all 100 queries, got " +
        s"${counts.length} queries, min fill " +
        s"${if (counts.isEmpty) 0 else counts.map(_.getLong(1)).min}")
    out
  }

  /** Batch top-k (SURVEY §2.J extension `sim_search_batch`): k nearest
    * corpus vectors for EACH of a set of query vectors — the realistic ANN
    * serving shape. The query set broadcasts (small side), scoring is one
    * map-side JIT'd pass over the corpus (no corpus shuffle), and per-query
    * top-k is a rank window whose partial `WindowGroupLimit` runs before the
    * exchange — each map task forwards at most k rows per query.
    *
    * This is the EXHAUSTIVE (exact) shape: every query still scores the
    * whole corpus. A large batch against a 100 TB corpus should probe the
    * persisted index instead — [[graft.store.AnnIndex.topkBatch]] (r16)
    * reads only the batch's probed cells' buckets, O(batch × nProbe ×
    * corpus/cells), with the same per-query output shape.
    *
    * Reducer skew guard (VERDICT r5 #8): a single per-`q_id` window funnels
    * each query through ONE reducer, and at 100 TB the partial group limit
    * still leaves k × nMapTasks rows per query on that reducer. With
    * `salts > 1` the rank runs in two phases — per (q_id, map-side salt)
    * first (salts reducers per query, each seeing ≤ k rows per map task),
    * then a final per-q_id rank over at most salts × k survivors. The
    * global top-k of a union is contained in the union of per-salt top-ks,
    * so the result is IDENTICAL to the single-phase rank. */
  def batchTopK(emb: DataFrame, nQueries: Int, k: Int,
      salts: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos_raw").desc, col("vec_id").asc)
    batchTopKPhase1(emb, nQueries, k, salts)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"),
        round(col("cos_raw"), 6).as("cos_sim"))
      .orderBy(col("q_id").asc_nulls_first, col("rank").asc_nulls_first)
  }

  /** Scoring + the salted pre-rank: returns ≤ salts × k candidate rows per
    * query (exactly the final window's input — exposed so tests can assert
    * the bound). The salt is `spark_partition_id() % salts`, assigned
    * MAP-SIDE so the partial WindowGroupLimit keeps its ≤ k rows per
    * (map task, query) guarantee under the composite key. */
  private[graft] def batchTopKPhase1(emb: DataFrame, nQueries: Int, k: Int,
      salts: Int): DataFrame = {
    import emb.sparkSession.implicits._
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val scored = emb.filter(col("vec_id") >= nQueries)
      .crossJoin(broadcast(queries))
      .select(col("q_id"), col("vec_id"), col("embedding"), col("qv"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .mapPartitions { it =>
        it.map { case (q, id, v, qv) => (q, id, VecKernels.cosine(v, qv)) }
      }
      .toDF("q_id", "vec_id", "cos_raw")
    if (salts <= 1) scored
    else {
      val w1 = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id", "_salt")
        .orderBy(col("cos_raw").desc, col("vec_id").asc)
      scored
        .withColumn("_salt", pmod(spark_partition_id().cast("long"), lit(salts.toLong)))
        .withColumn("_r1", row_number().over(w1))
        .filter(col("_r1") <= k)
        .drop("_salt", "_r1")
    }
  }

  private val simSearchBatch: Q = (s, d) =>
    batchTopK(load(s, d, "embeddings"), nQueries = 5, k = 10)

  /** Multimodal passthrough (SURVEY `multimodal_schema`): binary payload +
    * embedding vector + typed metadata survive a partitioned sink roundtrip;
    * scalar projections are oracled. */
  private val multimodalSchema: Q = (s, d) => {
    val docs = load(s, d, "documents")
    val emb = load(s, d, "embeddings")
    val joined = docs.join(emb, col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        col("embedding"), struct(col("lang"), col("source")).as("meta"))
    val out = graft.util.Scratch.dir("mm")
    joined.write.mode("overwrite").partitionBy().parquet(out)
    s.read.parquet(out)
      .select(col("doc_id"), length(col("payload")).as("n_bytes"),
        size(col("embedding")).as("dim"),
        col("meta.lang").as("lang"), col("meta.source").as("source"))
      .orderBy(col("doc_id").asc_nulls_first)
  }

  /** REAL media decode (SURVEY §2.J extension `multimodal_decode`,
    * VERDICT r6 #5 — fake math deleted): the JDK's `javax.imageio` decodes
    * PNG without external media libs, so the kernel decodes actual image
    * bytes. The test corpus carries no media, so a first map-side kernel
    * RENDERS a deterministic tiny RGB image per document (pixel values are
    * a closed-form function of doc_id/x/y) and encodes it to real PNG
    * bytes; the decode kernel then parses those bytes back with
    * `ImageIO.read` and emits header fields + pixel aggregates. PNG is
    * lossless, so the DuckDB oracle reproduces the aggregates from the
    * closed form alone — if the decoder were fake (or lossy), width,
    * height, pixel_sum, and bright_px would all hash-mismatch.
    *
    * Shape at 100 TB: both kernels are map-only typed `mapPartitions`
    * batches over a binary column — the exact plumbing a real
    * decode/feature-extract stage has (no shuffle, no driver traffic). */
  private val multimodalDecode: Q = (s, d) => {
    import s.implicits._
    val docs = load(s, d, "documents").select(col("doc_id")).as[Long]
    docs.mapPartitions(_.map(id => (id, PxKernel.renderPng(id))))
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h, sum, bright) = PxKernel.decodeAgg(bytes)
          (id, w, h, sum, bright)
        }
      }.toDF("doc_id", "width", "height", "pixel_sum", "bright_px")
      .orderBy(col("doc_id").asc_nulls_first)
  }

  /** Real image RESIZE (brief §multimodal: decode / resize / frame-sample):
    * decode the PNG, nearest-neighbor downsample to a fixed 16x12 thumbnail
    * with explicit integer source mapping (sx = x*w/16 — exactly
    * reproducible, unlike interpolating scalers), aggregate the thumbnail.
    * The oracle evaluates the same mapping in SQL over the closed-form
    * pixels. Map-only mapPartitions, no shuffle. */
  private val multimodalResize: Q = (s, d) => {
    import s.implicits._
    load(s, d, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, PxKernel.renderPng(id))))
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          val (ow, oh) = (16, 12)
          var sum = 0L
          var bright = 0L
          var x = 0
          while (x < ow) {
            var y = 0
            while (y < oh) {
              val p = img.getRGB(x * img.getWidth / ow, y * img.getHeight / oh)
              sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
              if (((p >> 16) & 0xff) > 127) bright += 1
              y += 1
            }
            x += 1
          }
          (id, ow, oh, sum, bright)
        }
      }.toDF("doc_id", "out_w", "out_h", "pixel_sum", "bright_px")
      .orderBy(col("doc_id").asc_nulls_first)
  }

  /** Real FRAME-SAMPLE (brief §multimodal): each document carries a
    * synthetic multi-frame container — `[n][len,png]...` with every frame a
    * real PNG — and the kernel parses the container, samples k=min(3,n)
    * evenly-spaced frames, decodes ONLY those, and aggregates their pixels.
    * This is the video-keyframe shape: the decode cost tracks sampled
    * frames, not container size. Map-only; the oracle re-derives the
    * sampled indices and pixel sums from the closed form. */
  private val multimodalFrames: Q = (s, d) => {
    import s.implicits._
    load(s, d, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val n = 1 + (id % 5).toInt
        val frames = (0 until n).map(f => PxKernel.renderPng(id * 31 + f))
        val bos = new java.io.ByteArrayOutputStream()
        val dos = new java.io.DataOutputStream(bos)
        dos.writeInt(n)
        frames.foreach { b => dos.writeInt(b.length); dos.write(b) }
        (id, bos.toByteArray)
      })
      .mapPartitions { it =>
        it.map { case (id, blob) =>
          val dis = new java.io.DataInputStream(
            new java.io.ByteArrayInputStream(blob))
          val n = dis.readInt()
          val k = math.min(3, n)
          val sampled = (0 until k).map(i => i * (n / k)).toSet
          var sum = 0L
          var f = 0
          while (f < n) {
            val len = dis.readInt()
            val bytes = new Array[Byte](len)
            dis.readFully(bytes)
            if (sampled.contains(f)) sum += PxKernel.decodeAgg(bytes)._3
            f += 1
          }
          (id, n, k, sum, sampled.toSeq.sorted.mkString(","))
        }
      }.toDF("doc_id", "n_frames", "n_sampled", "frame_pixel_sum", "frames_csv")
      .orderBy(col("doc_id").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "sim_search_topk" -> simSearchTopk,
    "sim_search_ivf" -> simSearchIvf,
    "sim_search_ivf_kmeans" -> simSearchIvfKmeans,
    "sim_search_ann_index" -> simSearchAnnIndex,
    "sim_search_ann_recall" -> simSearchAnnRecall,
    "sim_search_batch" -> simSearchBatch,
    "sim_search_ann_batch" -> simSearchAnnBatch,
    "sim_search_ann_batch_filtered" -> simSearchAnnBatchFiltered,
    "multimodal_schema" -> multimodalSchema,
    "multimodal_decode" -> multimodalDecode,
    "multimodal_resize" -> multimodalResize,
    "multimodal_frames" -> multimodalFrames,
  )

  /** One brute-force oracle for both IVF entries: the planted set is the
    * true top-20 (cosine exactly 1.0) whichever index finds it. */
  private val plantedTopKOracle: String =
    """WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
      |planted AS (
      |  SELECT 10000000 + j AS vec_id,
      |         LIST_TRANSFORM(q.embedding,
      |           x -> x * CAST(POWER(2, j) AS FLOAT)) AS embedding
      |  FROM q, generate_series(1, 20) t(j)),
      |corpus AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL SELECT vec_id, embedding FROM planted),
      |qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0)
      |SELECT c.vec_id,
      |  ROUND(LIST_DOT_PRODUCT(CAST(c.embedding AS DOUBLE[]), qv.v) /
      |    (SQRT(LIST_DOT_PRODUCT(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))) *
      |     SQRT(LIST_DOT_PRODUCT(qv.v, qv.v))), 6) AS cos_sim
      |FROM corpus c, qv
      |WHERE c.vec_id <> 0
      |ORDER BY cos_sim DESC NULLS LAST, vec_id ASC NULLS FIRST
      |LIMIT 20""".stripMargin

  val oracles: Map[String, String] = Map(
    "sim_search_ivf" -> plantedTopKOracle,
    "sim_search_ivf_kmeans" -> plantedTopKOracle,
    "sim_search_ann_index" -> plantedTopKOracle,

    "sim_search_ann_batch" ->
      """WITH qs AS (
        |  SELECT t.g AS q_id, CAST(e.embedding AS DOUBLE[]) AS qv
        |  FROM generate_series(0, 99) t(g)
        |  JOIN embeddings e ON e.vec_id = t.g % 8),
        |planted AS (
        |  SELECT 10000000 + e.vec_id * 100 + j AS vec_id,
        |         LIST_TRANSFORM(e.embedding,
        |           x -> x * CAST(POWER(2, j) AS FLOAT)) AS embedding
        |  FROM embeddings e, generate_series(1, 4) t(j)
        |  WHERE e.vec_id < 8),
        |corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL SELECT vec_id, embedding FROM planted),
        |scored AS (
        |  SELECT qs.q_id, c.vec_id,
        |    ROUND(LIST_DOT_PRODUCT(CAST(c.embedding AS DOUBLE[]), qs.qv) /
        |      (SQRT(LIST_DOT_PRODUCT(CAST(c.embedding AS DOUBLE[]),
        |                             CAST(c.embedding AS DOUBLE[]))) *
        |       SQRT(LIST_DOT_PRODUCT(qs.qv, qs.qv))), 6) AS cos_sim
        |  FROM corpus c, qs),
        |ranked AS (
        |  SELECT q_id, vec_id, cos_sim,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY cos_sim DESC NULLS LAST, vec_id ASC) AS INT) AS rank
        |  FROM scored)
        |SELECT q_id, rank, vec_id, cos_sim FROM ranked WHERE rank <= 5
        |ORDER BY q_id ASC NULLS FIRST, rank ASC NULLS FIRST""".stripMargin,

    "sim_search_ann_batch_filtered" ->
      """WITH qs AS (
        |  SELECT t.g AS q_id, CAST(e.embedding AS DOUBLE[]) AS qv
        |  FROM generate_series(0, 99) t(g)
        |  JOIN embeddings e ON e.vec_id = t.g % 8),
        |planted AS (
        |  SELECT 10000000 + e.vec_id * 100 + j AS vec_id,
        |         LIST_TRANSFORM(e.embedding,
        |           x -> x * CAST(POWER(2, j) AS FLOAT)) AS embedding
        |  FROM embeddings e, generate_series(1, 4) t(j)
        |  WHERE e.vec_id < 8),
        |scored AS (
        |  SELECT qs.q_id, c.vec_id,
        |    ROUND(LIST_DOT_PRODUCT(CAST(c.embedding AS DOUBLE[]), qs.qv) /
        |      (SQRT(LIST_DOT_PRODUCT(CAST(c.embedding AS DOUBLE[]),
        |                             CAST(c.embedding AS DOUBLE[]))) *
        |       SQRT(LIST_DOT_PRODUCT(qs.qv, qs.qv))), 6) AS cos_sim
        |  FROM planted c, qs),
        |ranked AS (
        |  SELECT q_id, vec_id, cos_sim,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY cos_sim DESC NULLS LAST, vec_id ASC) AS INT) AS rank
        |  FROM scored)
        |SELECT q_id, rank, vec_id, cos_sim FROM ranked WHERE rank <= 4
        |ORDER BY q_id ASC NULLS FIRST, rank ASC NULLS FIRST""".stripMargin,

    "sim_search_ann_recall" ->
      """WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
        |planted AS (
        |  SELECT 20000000 + j AS vec_id,
        |         LIST_TRANSFORM(q.embedding,
        |           x -> x + CAST(0.001 * j AS FLOAT)) AS embedding
        |  FROM q, generate_series(1, 12) t(j)),
        |corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL SELECT vec_id, embedding FROM planted),
        |qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0)
        |SELECT c.vec_id,
        |  ROUND(LIST_DOT_PRODUCT(CAST(c.embedding AS DOUBLE[]), qv.v) /
        |    (SQRT(LIST_DOT_PRODUCT(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))) *
        |     SQRT(LIST_DOT_PRODUCT(qv.v, qv.v))), 6) AS cos_sim
        |FROM corpus c, qv
        |WHERE c.vec_id <> 0
        |ORDER BY cos_sim DESC NULLS LAST, vec_id ASC NULLS FIRST
        |LIMIT 10""".stripMargin,

    "sim_search_topk" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |  ROUND(LIST_DOT_PRODUCT(CAST(embedding AS DOUBLE[]), q.qv) /
        |    (SQRT(LIST_DOT_PRODUCT(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) *
        |     SQRT(LIST_DOT_PRODUCT(q.qv, q.qv))), 6) AS cos_sim
        |FROM embeddings, q
        |WHERE vec_id <> 0
        |ORDER BY cos_sim DESC NULLS LAST, vec_id ASC NULLS FIRST
        |LIMIT 20""".stripMargin,

    "multimodal_schema" ->
      """SELECT doc_id, CAST(n_chars AS INT) AS n_bytes, CAST(LEN(embedding) AS INT) AS dim,
        |       lang, source
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    "sim_search_batch" ->
      """WITH q AS (
        |  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.q_id, e.vec_id,
        |    LIST_DOT_PRODUCT(CAST(e.embedding AS DOUBLE[]), q.qv) /
        |      (SQRT(LIST_DOT_PRODUCT(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
        |       SQRT(LIST_DOT_PRODUCT(q.qv, q.qv))) AS cos_raw
        |  FROM embeddings e, q WHERE e.vec_id >= 5),
        |ranked AS (
        |  SELECT q_id, vec_id, cos_raw,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY cos_raw DESC, vec_id ASC) AS INT) AS rank
        |  FROM scored)
        |SELECT q_id, rank, vec_id, ROUND(cos_raw, 6) AS cos_sim
        |FROM ranked WHERE rank <= 10
        |ORDER BY q_id ASC NULLS FIRST, rank ASC NULLS FIRST""".stripMargin,

    // The closed-form pixel function the Spark side RENDERS into real PNG
    // bytes; the Spark values come back through an actual ImageIO decode,
    // so parity here proves the decode (PNG is lossless RGB).
    "multimodal_resize" ->
      """WITH px AS (
        |  SELECT doc_id,
        |    CAST(8 + (doc_id % 9) AS INT) AS w,
        |    CAST(8 + ((doc_id * 7) % 9) AS INT) AS h
        |  FROM documents),
        |m AS (
        |  SELECT p.doc_id, (x.x * p.w) // 16 AS sx, (y.y * p.h) // 12 AS sy
        |  FROM px p, generate_series(0, 15) x(x), generate_series(0, 11) y(y))
        |SELECT doc_id, CAST(16 AS INT) AS out_w, CAST(12 AS INT) AS out_h,
        |  CAST(SUM(((doc_id + 31*sx + 17*sy) % 256) + ((sx*sy + doc_id) % 256) +
        |           ((sx + sy + 2*doc_id) % 256)) AS BIGINT) AS pixel_sum,
        |  CAST(SUM(CASE WHEN ((doc_id + 31*sx + 17*sy) % 256) > 127
        |           THEN 1 ELSE 0 END) AS BIGINT) AS bright_px
        |FROM m GROUP BY doc_id
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    "multimodal_frames" ->
      """WITH f AS (
        |  SELECT doc_id, CAST(1 + (doc_id % 5) AS INT) AS n,
        |         CAST(LEAST(3, 1 + (doc_id % 5)) AS INT) AS k
        |  FROM documents),
        |frames AS (
        |  SELECT doc_id, doc_id*31 + i.i * (n // k) AS fid
        |  FROM f, generate_series(0, 2) i(i) WHERE i.i < k),
        |cells AS (
        |  SELECT d.doc_id, d.fid, x.x, y.y,
        |         8 + (d.fid % 9) AS w, 8 + ((d.fid * 7) % 9) AS h
        |  FROM frames d, generate_series(0, 16) x(x), generate_series(0, 16) y(y)),
        |px AS (
        |  SELECT doc_id,
        |    SUM(((fid + 31*x + 17*y) % 256) + ((x*y + fid) % 256) +
        |        ((x + y + 2*fid) % 256)) AS s
        |  FROM cells WHERE x < w AND y < h GROUP BY doc_id)
        |SELECT f.doc_id, f.n AS n_frames, f.k AS n_sampled,
        |  CAST(px.s AS BIGINT) AS frame_pixel_sum,
        |  ARRAY_TO_STRING(LIST_TRANSFORM(RANGE(0, f.k),
        |    i -> i * (f.n // f.k)), ',') AS frames_csv
        |FROM f JOIN px ON f.doc_id = px.doc_id
        |ORDER BY f.doc_id ASC NULLS FIRST""".stripMargin,

    "multimodal_decode" ->
      """WITH px AS (
        |  SELECT doc_id,
        |    CAST(8 + (doc_id % 9) AS INT) AS w,
        |    CAST(8 + ((doc_id * 7) % 9) AS INT) AS h
        |  FROM documents),
        |cells AS (
        |  SELECT p.doc_id, p.w, p.h, x.x, y.y
        |  FROM px p, generate_series(0, 16) x(x), generate_series(0, 16) y(y)
        |  WHERE x.x < p.w AND y.y < p.h)
        |SELECT doc_id, w AS width, h AS height,
        |  CAST(SUM(((doc_id + 31*x + 17*y) % 256) + ((x*y + doc_id) % 256) +
        |           ((x + y + 2*doc_id) % 256)) AS BIGINT) AS pixel_sum,
        |  CAST(SUM(CASE WHEN ((doc_id + 31*x + 17*y) % 256) > 127
        |           THEN 1 ELSE 0 END) AS BIGINT) AS bright_px
        |FROM cells GROUP BY doc_id, w, h
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
  )
}

/** Executor-side pixel kernel shared by the multimodal queries: renders the
  * closed-form test image to REAL PNG bytes and decodes real PNG bytes back
  * to pixel aggregates via the JDK's `javax.imageio` (no external media
  * libs). Serializable so mapPartitions closures can reference it. */
private[ops] object PxKernel extends Serializable {

  /** Deterministic w×h RGB image for `id` (w,h ≤ 16), encoded as PNG.
    * Pixel (x,y) = closed form of (id,x,y) — the DuckDB oracles recompute
    * aggregates from the same form, so parity proves the decode. */
  def renderPng(id: Long): Array[Byte] = {
    val w = 8 + (id % 9).toInt
    val h = 8 + ((id * 7) % 9).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) {
        val r = ((id + 31L * x + 17L * y) % 256).toInt
        val g = ((1L * x * y + id) % 256).toInt
        val b = ((x + y + 2L * id) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        y += 1
      }
      x += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode PNG bytes → (width, height, sum of all channels, count of
    * pixels with red > 127). */
  def decodeAgg(bytes: Array[Byte]): (Int, Int, Long, Long) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0L
    var bright = 0L
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) {
        val p = img.getRGB(x, y)
        sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        if (((p >> 16) & 0xff) > 127) bright += 1
        y += 1
      }
      x += 1
    }
    (w, h, sum, bright)
  }
}
