package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.ops.LlmCommon._
import graft.ops.Relational.Q

/** Deduplication family for training-data pipelines (SURVEY.md §2.J +
  * BASELINE.json north star): exact, MinHash+LSH, SimHash, blocked n-gram
  * Jaccard, and embedding-cosine near-dup.
  *
  * Scale design (100 TB):
  *  - every variant is candidate-generation-by-key (hash, LSH band, SimHash
  *    chunk, block) followed by an equi self-join on that key — never an
  *    all-pairs comparison;
  *  - signatures are fixed-width (64 longs / 1 long), so shuffle volume is
  *    O(docs), not O(text);
  *  - band keys are salted by band index, keeping bucket skew bounded; AQE
  *    skew-join handles residual hot buckets.
  */
object LlmDedup {

  /** Exact dedup via content hash + keep-first (SURVEY `dedup_exact`). */
  private val dedupExact: Q = (s, d) =>
    load(s, d, "documents")
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("content_hash").asc_nulls_first)

  // ------------------------------------------------------------------ MinHash

  private[graft] val NumHashes = 64
  private[graft] val Bands = 16
  private[graft] val RowsPerBand = NumHashes / Bands

  /** doc_id, minhash signature (64 longs), SORTED distinct-shingle-hash set.
    *
    * Map-only typed kernel ([[graft.functions.TextKernels]]): a per-doc
    * signature needs no cross-row aggregation, so this is one JIT'd pass
    * with zero shuffle — the 100 TB shape. The shingle set stays sorted for
    * the codegen'd merge-scan intersection used during verification. Docs
    * with no shingles are dropped.
    *
    * `maxSet` bounds the per-doc verification set (SCALE.md; ADVICE r2 #8):
    * the signature is still computed over ALL shingles (map-side, free), but
    * `sh_set` keeps only the `maxSet` SMALLEST hashes — a KMV
    * (k-minimum-values) sketch. Hash order is uniform-random over shingles,
    * so the k smallest are a deterministic uniform sample shared by both
    * sides of a pair, and |A'∩B'|/|A'∪B'| on the sketches estimates the true
    * Jaccard. The verify-join shuffle drops from O(total shingles) to
    * O(docs · maxSet) — the difference between shuffling a document's whole
    * shingle inventory and a fixed-width sketch at 100 TB. */
  def minhashSignatures(docs: DataFrame, shingleLen: Int = 3,
      maxSet: Int = Int.MaxValue): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.functions.TextKernels
    val params = hashParams(NumHashes)
    val as = params.map(_._1).toArray
    val bs = params.map(_._2).toArray
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val shs = TextKernels.shingleHashes(TextKernels.tokenize(text), shingleLen)
          if (shs.isEmpty) None
          else {
            // shs is sorted ascending: the first maxSet entries ARE the KMV sketch
            val kept = if (shs.length > maxSet) java.util.Arrays.copyOf(shs, maxSet)
              else shs
            Some((id, TextKernels.minhashSig(shs, as, bs), kept))
          }
        }
      }
      .toDF("doc_id", "sig", "sh_set")
  }

  /** [[minhashSignatures]] for ARBITRARY key columns (VERDICT r13 next
    * #3): the kernel runs as a scalar over `textCol`, so key columns of
    * any arity and type ride through untouched — the same pattern
    * [[graft.store.AnnIndex]] uses for cell assignment. Same tokenizer,
    * shingle hashes, hash family, and KMV cap as the typed kernel, so
    * signatures (and the band keys derived from them) are IDENTICAL to
    * the sweep's. Rows with a NULL/shingle-less text are dropped; key
    * nulls are the caller's filter (a composite key may legitimately
    * carry a nullable component the caller wants kept). */
  def minhashSignaturesKeyed(docs: DataFrame, keyCols: Seq[String],
      textCol: String, shingleLen: Int = 3,
      maxSet: Int = Int.MaxValue): DataFrame = {
    import graft.functions.TextKernels
    val params = hashParams(NumHashes)
    val as = params.map(_._1).toArray
    val bs = params.map(_._2).toArray
    val kernel = udf((text: String) => {
      val shs = TextKernels.shingleHashes(TextKernels.tokenize(text), shingleLen)
      if (shs.isEmpty) None
      else {
        val kept = if (shs.length > maxSet) java.util.Arrays.copyOf(shs, maxSet)
          else shs
        Some((TextKernels.minhashSig(shs, as, bs), kept))
      }
    })
    docs.filter(col(textCol).isNotNull)
      .withColumn("_g_sig", kernel(col(textCol)))
      .filter(col("_g_sig").isNotNull)
      .select(keyCols.map(col) :+ col("_g_sig._1").as("sig") :+
        col("_g_sig._2").as("sh_set"): _*)
  }

  /** LSH band keys of a signature frame: (doc_id, band, bkey) — one row
    * per (doc, band), `bkey` = xxhash64 over the band ordinal + its sig
    * slice (the band rides INSIDE the hash, so `bkey` alone is already a
    * near-collision-free composite; [[minhashPairs]] still joins on the
    * (band, bkey) pair for exactness, while [[graft.store.DedupIndex]]
    * keys its persisted band table on `bkey` — any cross-band xxhash64
    * collision only adds a candidate the verification re-checks). Shared
    * so the in-query pipeline and the persisted index derive IDENTICAL
    * band keys. */
  private[graft] def bandedSignatures(sigs: DataFrame,
      carryCols: Seq[String] = Nil,
      keyCols: Seq[String] = Seq("doc_id")): DataFrame =
    sigs.select(keyCols.map(col) ++ carryCols.map(col) :+ col("sig") :+
        explode(transform(sequence(lit(0), lit(Bands - 1)), b => struct(
          b.as("band"),
          xxhash64(concat_ws("_", (b.as("x") :: (0 until RowsPerBand).map(r =>
            element_at(col("sig"), b * RowsPerBand + r + 1)).toList): _*))
            .as("bkey")))).as("bk"): _*)
      .select(keyCols.map(col) ++ carryCols.map(col) :+
        col("bk.band").as("band") :+ col("bk.bkey").as("bkey"): _*)

  /** Near-dup pairs: shingles → minhash → LSH banding → candidate pairs →
    * Jaccard verification (SURVEY `dedup_fuzzy_minhash`).
    *
    * With the default unbounded `maxSet` the verification is EXACT; at
    * 100 TB pass a cap (e.g. 256) and verification runs on KMV sketches
    * (see [[minhashSignatures]]) — banding math unchanged, shuffle bounded. */
  def minhashPairs(docs: DataFrame, threshold: Double,
      maxSet: Int = Int.MaxValue): DataFrame = {
    // signatures feed both banding sides and both verification joins; persist
    // so the shingle-explode + 64-way min aggregation runs once, not 4x
    val sigs = minhashSignatures(docs, maxSet = maxSet)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = bandedSignatures(sigs)
    val cand = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val sets = sigs.select(col("doc_id"), col("sh_set"))
    cand
      .join(sets.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("sh_set", "set_a"), Seq("doc_a"))
      .join(sets.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("sh_set", "set_b"), Seq("doc_b"))
      // KMV pairwise estimator at cutoff maxSet (ADVICE r4): numerator AND
      // denominator restricted to the k smallest union hashes, so capped
      // sketches sample both docs at the same hash depth — unbiased for
      // size-asymmetric pairs. Uncapped (k = MaxValue) this IS exact Jaccard.
      .withColumn("jaccard",
        graft.functions.SortedKmvJaccard(col("set_a"), col("set_b"), maxSet))
      .filter(col("jaccard") >= threshold)
      // Output the evidence as EXACT integers (|A∩B|, |A∪B|) instead of the
      // rounded double ratio: a 64-bit-hashed shingle set has the same
      // pairwise intersection sizes as the raw shingle-string sets (no
      // collisions at fixture scale), so a DuckDB oracle can reproduce these
      // values with plain list arithmetic — no float rounding to diverge on.
      // (Capped runs emit sketch-set sizes; the registered entry is uncapped.)
      .withColumn("_inter",
        graft.functions.SortedIntersectCount(col("set_a"), col("set_b")))
      .select(col("doc_a"), col("doc_b"),
        col("_inter").cast("long").as("inter_grams"),
        (size(col("set_a")) + size(col("set_b")) - col("_inter"))
          .cast("long").as("union_grams"))
      .orderBy(col("doc_a").asc_nulls_first, col("doc_b").asc_nulls_first)
  }

  private val dedupFuzzyMinhash: Q = (s, d) =>
    minhashPairs(load(s, d, "documents"), threshold = 0.5)

  /** Pure-SQL twin of [[minhashPairs]] (same shingles, banding math and
    * threshold — outputs are asserted identical in LlmOpsSpec): signatures
    * come from the [[graft.functions.SketchAggs.MinHashAgg]] typed aggregator
    * registered as a UDAF (partial/final merge ⇒ map-side combine), and
    * verification calls the codegen'd `sorted_intersect_count` through its
    * SQL registration ([[graft.functions.GraftFunctions]]) — the surface a
    * `spark.sql` / catalog user gets. */
  private val dedupMinhashSql: Q = (s, d) => {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    s.udf.register("graft_minhash64", org.apache.spark.sql.functions.udaf(
      new graft.functions.SketchAggs.MinHashAgg(NumHashes),
      org.apache.spark.sql.Encoders.scalaLong))
    val prepped = load(s, d, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val shs = graft.functions.TextKernels.shingleHashes(
            graft.functions.TextKernels.tokenize(text), 3)
          if (shs.isEmpty) None else Some((id, shs))
        }
      }
      .toDF("doc_id", "sh_set")
    prepped.createOrReplaceTempView("graft_mh_sets")
    s.sql(s"""
      WITH sigs AS (
        SELECT doc_id, graft_minhash64(sh) AS sig
        FROM (SELECT doc_id, explode(sh_set) AS sh FROM graft_mh_sets)
        GROUP BY doc_id),
      banded AS (
        SELECT doc_id, bk.band AS band, bk.bkey AS bkey
        FROM sigs LATERAL VIEW explode(transform(sequence(0, ${Bands - 1}),
          b -> struct(b AS band,
            xxhash64(concat_ws('_', b,
              ${(0 until RowsPerBand).map(r =>
                s"element_at(sig, b*$RowsPerBand+${r + 1})").mkString(", ")}
            )) AS bkey))) t AS bk),
      cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM banded x JOIN banded y
          ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
      verified AS (
        SELECT doc_a, doc_b,
          sorted_intersect_count(sa.sh_set, sb.sh_set) AS inter,
          size(sa.sh_set) AS na, size(sb.sh_set) AS nb
        FROM cand
        JOIN graft_mh_sets sa ON sa.doc_id = doc_a
        JOIN graft_mh_sets sb ON sb.doc_id = doc_b)
      SELECT doc_a, doc_b,
        CAST(inter AS BIGINT) AS inter_grams,
        CAST(na + nb - inter AS BIGINT) AS union_grams
      FROM verified
      WHERE 2 * inter >= na + nb - inter
      ORDER BY doc_a ASC NULLS FIRST, doc_b ASC NULLS FIRST""")
  }

  // -------------------------------------------------------------- clustering

  /** Connected components over a near-dup pair graph → per-doc cluster id
    * (SURVEY §2.J extension `dedup_clusters`): what a real training-data
    * pipeline does after pair detection — group transitive duplicates and
    * keep one representative per cluster.
    *
    * Algorithm: distributed min-label propagation. Each doc starts labeled
    * with its own id; every iteration each doc takes the minimum label among
    * itself and its neighbors; converges in O(component diameter) rounds
    * (near-dup components are shallow — dups of a common source). Each round
    * is one join + one aggregation, and `localCheckpoint` truncates the
    * growing lineage so planning cost stays constant — the standard iterative
    * Spark shape. The driver loops; the DATA never leaves the cluster (the
    * only driver value is the changed-row count). */
  def connectedComponents(pairs: DataFrame, vertices: DataFrame,
      maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Only edge-incident vertices can ever change label — a singleton keeps
    // its own id forever — so the iteration runs on the active subgraph
    // (O(pair endpoints) rows, a tiny fraction of the corpus in any real
    // near-dup workload) and singletons union back in at the end. `edges`
    // carries both directions, so `src` alone covers every endpoint.
    val active = edges.select(col("src").as("doc_id")).distinct()
      .localCheckpoint(true)
    var labels = active.select(col("doc_id"), col("doc_id").as("cluster"))
    var iter = 0
    var changed = 1L
    val sc = pairs.sparkSession.sparkContext
    // checkpoint-block bookkeeping (ADVICE r3 + VERDICT r4 wrong #3): each
    // round's lazy localCheckpoint caches a generation of the label RDD;
    // once round N's blocks are saved (the count below), round N-1's are
    // superseded — free EXACTLY that generation, identified by its own RDD
    // id (LogicalRDD), never by diffing the session's global persistent-RDD
    // registry, so a concurrent query's cached blocks can never be swept.
    var prevRoundId: Option[Int] = None
    while (changed > 0 && iter < maxIters) {
      // ONE driver action per round (VERDICT r2 #4: a separate join+count
      // convergence check doubled the work and made this the slowest bench
      // query): own-label rows ride the union tagged `own`, so min(own
      // label) IS the previous label and a row changed iff the overall min
      // undercuts it. The checkpoint is LAZY — the changed-count below is
      // the job that computes the round, saves the checkpoint blocks (lineage
      // truncation, constant planning cost), and counts, all in one pass.
      val viaNeighbor = edges.join(labels, edges("src") === labels("doc_id"))
        .select(col("dst").as("doc_id"), col("cluster"), lit(false).as("own"))
      val next = labels.withColumn("own", lit(true)).unionByName(viaNeighbor)
        .groupBy("doc_id").agg(
          min(col("cluster")).as("cluster"),
          min(when(col("own"), col("cluster"))).as("prev"))
        .localCheckpoint(eager = false)
      changed = next.filter(col("cluster") < col("prev")).count()
      prevRoundId.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      prevRoundId = org.apache.spark.sql.graftbridge.RddBridge
        .checkpointedRddId(next)
      labels = next.select(col("doc_id"), col("cluster"))
      iter += 1
    }
    edges.unpersist()
    val singletons = vertices.select(col("doc_id"))
      .join(active, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster"))
    labels.unionByName(singletons)
  }

  /** MinHash near-dup pairs → transitive clusters; emits every doc with its
    * cluster id plus the cluster size (singletons included — the keep-list). */
  def dupClusters(docs: DataFrame, threshold: Double): DataFrame = {
    val pairs = minhashPairs(docs, threshold)
    val labels = connectedComponents(pairs, docs.select(col("doc_id")))
    val sizes = labels.groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "cluster")
      .select(col("doc_id"), col("cluster").as("cluster_id"), col("cluster_size"))
      .orderBy(col("doc_id").asc_nulls_first)
  }

  private val dedupClusters: Q = (s, d) =>
    dupClusters(load(s, d, "documents"), threshold = 0.5)

  // ------------------------------------------------------------------ SimHash

  /** 64-bit SimHash per document: sign of the per-bit vote of token hashes.
    * Map-only typed kernel — zero shuffle (see minhashSignatures). */
  def simhash(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.functions.TextKernels
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val toks = TextKernels.tokenize(text)
          if (toks.isEmpty) None else Some((id, TextKernels.simhash64(toks)))
        }
      }
      .toDF("doc_id", "simhash")
  }

  /** Near-dup pairs with Hamming distance ≤ 3 (SURVEY §2.J extension
    * `dedup_simhash`). Pigeonhole blocking: distance ≤ 3 over 4 chunks of 16
    * bits ⇒ at least one chunk identical, so candidates come from an
    * equi-join on (chunk index, chunk value) — no all-pairs scan. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val fp = simhash(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val chunks = fp.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(c => struct(
          lit(c).as("chunk"),
          shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xffffL)).as("cval"))): _*))
          .as("ck"))
      .select(col("doc_id"), col("simhash"),
        col("ck.chunk").as("chunk"), col("ck.cval").as("cval"))
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.cval") === col("y.cval") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
          .cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("doc_a").asc_nulls_first, col("doc_b").asc_nulls_first)
  }

  private val dedupSimhash: Q = (s, d) => simhashPairs(load(s, d, "documents"))

  // ---------------------------------------------------------- n-gram Jaccard

  /** Prefix-filtered pairwise n-gram Jaccard (SURVEY §2.J extension
    * `dedup_ngram_jaccard`), PPJoin-style:
    *
    *  1. one cheap aggregate computes each gram's document frequency;
    *  2. each doc emits only its PREFIX — its |A| - ⌈t·|A|⌉ + 1 globally
    *     rarest grams (order: df asc, gram asc) — as candidate keys;
    *  3. candidates come from an equi-join on (lang, prefix gram);
    *  4. exact Jaccard verification via the codegen'd sorted-merge
    *     intersection.
    *
    * All three PPJoin filters are LOSSLESS for threshold t:
    *  - prefix: J(A,B) ≥ t ⟹ |A∩B| ≥ ⌈t·|A|⌉, so the smallest common gram
    *    (global order) sits inside both prefixes;
    *  - length: J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|), so t·|B| ≤ |A| (and
    *    symmetrically) or the pair can't qualify;
    *  - positional: overlap ≤ min(|A|-posA, |B|-posB) + 1 for a shared gram
    *    at canonical positions posA/posB, which must reach
    *    α = ⌈t/(1+t)·(|A|+|B|)⌉ (J ≥ t ⟺ |A∩B| ≥ α).
    * Output is therefore identical to the all-pairs form. Unlike the previous
    * (lang, length-bucket) blocking, block size is governed by gram document
    * frequency, not corpus size — the join stays near-linear at 100 TB
    * (candidate-pair reduction at sf0.1 measured in NOTES.md). */
  def ngramJaccardPairs(docs: DataFrame, n: Int, threshold: Double): DataFrame = {
    // grams as sorted 64-bit hashes: the self-join shuffles 8 bytes/gram and
    // verification is a codegen'd two-pointer merge scan
    import docs.sparkSession.implicits._
    val prepped = docs.select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        it.map { case (id, lang, text) =>
          (id, lang, graft.functions.TextKernels.shingleHashes(
            graft.functions.TextKernels.tokenize(text), n))
        }
      }
      .toDF("doc_id", "lang", "grams")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exploded = prepped.select(col("doc_id"), col("lang"),
      size(col("grams")).as("n_grams"), explode(col("grams")).as("gram"))
    val dfreq = exploded.groupBy("gram").agg(count(lit(1)).as("df"))
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df").asc, col("gram").asc)
    val prefix = exploded.join(dfreq, "gram")
      .withColumn("_rn", row_number().over(rankW))
      .filter(col("_rn") <=
        col("n_grams") - ceil(lit(threshold) * col("n_grams")).cast("int") + 1)
      .select(col("doc_id"), col("lang"), col("gram"),
        col("n_grams"), col("_rn").as("pos"))
    val alpha = ceil(lit(threshold / (1 + threshold)) *
      (col("x.n_grams") + col("y.n_grams")))
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.gram") === col("y.gram") && col("x.lang") === col("y.lang") &&
          col("x.doc_id") < col("y.doc_id") &&
          // length filter
          col("x.n_grams") >= lit(threshold) * col("y.n_grams") &&
          col("y.n_grams") >= lit(threshold) * col("x.n_grams") &&
          // positional filter
          least(col("x.n_grams") - col("x.pos"), col("y.n_grams") - col("y.pos"))
            + 1 >= alpha)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val sets = prepped.select(col("doc_id"), col("grams"))
    cand
      .join(sets.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("grams", "set_a"), Seq("doc_a"))
      .join(sets.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("grams", "set_b"), Seq("doc_b"))
      .withColumn("_inter",
        graft.functions.SortedIntersectCount(col("set_a"), col("set_b")))
      .withColumn("jaccard", // |A∪B| = |A|+|B|-|A∩B|: skip building the union
        col("_inter").cast("double") /
          (size(col("set_a")) + size(col("set_b")) - col("_inter")))
      .filter(col("jaccard") >= threshold)
      // exact-integer evidence columns (see minhashPairs): hashed-shingle
      // intersections equal raw-shingle intersections, so a DuckDB oracle
      // reproduces them without any float column in the compared output
      .select(col("doc_a"), col("doc_b"),
        col("_inter").cast("long").as("inter_grams"),
        (size(col("set_a")) + size(col("set_b")) - col("_inter"))
          .cast("long").as("union_grams"))
      .orderBy(col("doc_a").asc_nulls_first, col("doc_b").asc_nulls_first)
  }

  /** Registered at (n=3, t=0.5): trigram shingles — the same shingle size the
    * MinHash path uses — at the standard near-dup threshold. The previous
    * (n=2, t=0.3) operating point is degenerate on any corpus with a small
    * n-gram vocabulary (this fixture: 931 distinct bigrams across 5000 docs,
    * median df 285), where NO exact gram blocking can prune: at sf0.1 it
    * leaves ~1.6M candidates vs 32k here — with the identical 79 verified
    * pairs found at either setting (NOTES.md). */
  private val dedupNgramJaccard: Q = (s, d) =>
    ngramJaccardPairs(load(s, d, "documents"), n = 3, threshold = 0.5)

  // ------------------------------------------------------- embedding near-dup

  // sign-LSH bucketing + cosine live in graft.functions.VecKernels (typed
  // JIT'd kernels); the former column-expression forms were interpreted HOFs
  // and ~5× slower (NOTES.md).

  /** Embedding near-dup pairs (SURVEY §2.J extension `dedup_embedding`):
    * multi-band sign-LSH (the MinHash-banding shape applied to hyperplane
    * sign bits) → exact cosine verification of candidate pairs.
    *
    * Scale design: `bands` independent 2^rowsPerBand bucketings replace the
    * single small bucketing whose buckets grow with the corpus — block size
    * is set by r, so raise rowsPerBand at larger corpora and the per-bucket
    * join stays near-linear, while more bands buy recall (1-(1-p^r)^b).
    * Only (vec_id, band, bkey) rides the banding shuffle — vectors join back
    * in for the O(candidates) verification, both via the JIT'd
    * [[graft.functions.VecKernels]] (the HOF dot product is interpreted and
    * was measured ~5× slower). */
  def embeddingDupPairs(emb: DataFrame, dim: Int, threshold: Double,
      bands: Int = 16, rowsPerBand: Int = 16): DataFrame = {
    import emb.sparkSession.implicits._
    import graft.functions.VecKernels
    val pl = VecKernels.planes(bands * rowsPerBand, dim)
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = vecs.mapPartitions { it =>
      it.flatMap { case (id, v) =>
        VecKernels.bandBuckets(v, pl, bands, rowsPerBand)
          .iterator.zipWithIndex.map { case (bk, b) => (id, b, bk) }
      }
    }.toDF("vec_id", "band", "bkey")
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    val side = vecs.toDF("vec_id", "embedding")
    cand
      .join(side.withColumnRenamed("vec_id", "vec_a")
        .withColumnRenamed("embedding", "emb_a"), Seq("vec_a"))
      .join(side.withColumnRenamed("vec_id", "vec_b")
        .withColumnRenamed("embedding", "emb_b"), Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"), col("emb_a"), col("emb_b"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .mapPartitions { it =>
        it.map { case (a, b, ea, eb) => (a, b, VecKernels.cosine(ea, eb)) }
      }
      .toDF("vec_a", "vec_b", "cos_raw")
      .filter(col("cos_raw") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos_raw"), 6).as("cos_sim"))
      .orderBy(col("vec_a").asc_nulls_first, col("vec_b").asc_nulls_first)
  }

  /** Registered entry: the driver fixture has NO natural pairs at cosine
    * ≥ 0.9 (brute-force max is 0.60 at sf0.1), so a bare run proves nothing.
    * We plant deterministic near-dups in-query (pattern of
    * `scan_ddb_export`'s in-query fixture): every 25th vector is cloned at
    * 2× magnitude under `vec_id + 10,000,000`. Scaling by an exact power of
    * two keeps every hyperplane sign bit identical (sign(2·x)=sign(x)), so
    * the clone lands in the SAME LSH buckets as its source in every band —
    * recall on the planted pairs is deterministic, not probabilistic — and
    * its verified cosine is 1.0 up to one rounding. The 0.60-vs-0.9 margin
    * means the DuckDB brute-force oracle agrees on exactly the planted set
    * regardless of float-vs-double evaluation order. IDs only in the output:
    * no float column to hash-diverge across engines. */
  private val dedupEmbedding: Q = (s, d) => {
    val base = load(s, d, "embeddings").select(col("vec_id"), col("embedding"))
    // vec_id < 10M guard: planted ids are base+10,000,000, so cloning only
    // sub-10M sources keeps planted ids collision-free under ANY future
    // fixture id range (ADVICE r3) — and both engines apply the same guard.
    val planted = base.filter(col("vec_id") % 25 === 0 && col("vec_id") < 10000000L)
      .select((col("vec_id") + 10000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    embeddingDupPairs(base.unionByName(planted), dim = 64, threshold = 0.9)
      .select(col("vec_a"), col("vec_b"))
  }

  /** PERSISTED dedup index end-to-end (`dedup_index_incremental`,
    * [[graft.store.DedupIndex]] — the r13 incremental-ingest serving path:
    * the one-shot sweep re-bands the whole corpus per run; a pipeline
    * ingesting batches against a growing corpus wants the banded signature
    * table MATERIALIZED and cadence-maintained). The corpus becomes a
    * keyed graft table and the index trains once (uncapped sketches —
    * exact verification, so the DuckDB brute-force oracle agrees on
    * integers); a live-feed upsert lands `zz`-suffixed variants of the
    * long documents and the GSI-replay refresh assigns their band rows
    * incrementally; then a NEVER-COMMITTED `qq` batch queries the index —
    * matches must surface against BOTH the original docs and the
    * incrementally-indexed `zz` variants, proving the refresh, at
    * O(batch) cost (bucket-targeted index read, no corpus scan). Long
    * docs only (> 200 chars): the suffix then moves Jaccard to ≥ ~0.82
    * where 16×4 banding recall is ≥ 1 − 7e-5 and deterministic under the
    * fixed hash family — same argument as the sweep's oracle. Like the
    * sweep, this leans on the fixture's BIMODAL similarity (every natural
    * pair at J ≥ 0.5 sits at J ≥ 0.9, so no batch-vs-corpus pair lands in
    * the mid-recall band the brute-force oracle would count and banding
    * could miss); a future corpus with genuine mid-similarity pairs would
    * need the oracle restricted to banding-certain pairs. */
  private val dedupIndexIncremental: Q = (s, d) => {
    val docs = load(s, d, "documents").select(col("doc_id"), col("text"))
    val store = new graft.store.TableStore(s,
      graft.util.Scratch.dir("dedup_idx"))
    store.commitBucketed(docs, Seq("doc_id"), 16)
    graft.store.DedupIndex.create(store, "lsh", "text",
      shingleLen = 3, maxSet = Int.MaxValue, numBuckets = 16)
    val longDocs = docs.filter(length(col("text")) > 200 &&
      col("doc_id") < 40)
    store.upsertEq(longDocs.select(
      (col("doc_id") + 100000L).as("doc_id"),
      concat(col("text"), lit(" zz zz")).as("text"))
      .withColumn("op", lit("PUT")))
    graft.store.DedupIndex.refresh(store, "lsh")
    val batch = longDocs.select(
      (col("doc_id") + 200000L).as("doc_id"),
      concat(col("text"), lit(" qq qq")).as("text"))
    graft.store.DedupIndex.nearDups(store, "lsh", batch, threshold = 0.5)
  }

  /** [[dedupIndexIncremental]] over a COMPOSITE (PK,SK) base
    * (`dedup_index_composite`, VERDICT r13 next #3): the corpus keys on
    * `(doc_id, part)`, the banded rows carry the full tuple, and the
    * batch probe matches on it — the output flattens to
    * batch_doc_id/batch_part/corpus_doc_id/corpus_part. Same fixture
    * geometry and banding-recall argument as the single-key oracle. */
  private val dedupIndexComposite: Q = (s, d) => {
    val docs = load(s, d, "documents").select(col("doc_id"),
      (col("doc_id") % 4).as("part"), col("text"))
    val store = new graft.store.TableStore(s,
      graft.util.Scratch.dir("dedup_idxc"))
    store.commitBucketed(docs, Seq("doc_id", "part"), 16)
    graft.store.DedupIndex.create(store, "lshc", "text",
      shingleLen = 3, maxSet = Int.MaxValue, numBuckets = 16)
    val longDocs = docs.filter(length(col("text")) > 200 &&
      col("doc_id") < 40)
    store.upsertEq(longDocs.select(
      (col("doc_id") + 100000L).as("doc_id"),
      (col("doc_id") % 4).as("part"),
      concat(col("text"), lit(" zz zz")).as("text"))
      .withColumn("op", lit("PUT")))
    graft.store.DedupIndex.refresh(store, "lshc")
    val batch = longDocs.select(
      (col("doc_id") + 200000L).as("doc_id"),
      (col("doc_id") % 4).as("part"),
      concat(col("text"), lit(" qq qq")).as("text"))
    graft.store.DedupIndex.nearDups(store, "lshc", batch, threshold = 0.5)
  }

  val queries: Map[String, Q] = Map(
    "dedup_exact" -> dedupExact,
    "dedup_fuzzy_minhash" -> dedupFuzzyMinhash,
    "dedup_minhash_sql" -> dedupMinhashSql,
    "dedup_clusters" -> dedupClusters,
    "dedup_simhash" -> dedupSimhash,
    "dedup_ngram_jaccard" -> dedupNgramJaccard,
    "dedup_embedding" -> dedupEmbedding,
    "dedup_index_incremental" -> dedupIndexIncremental,
    "dedup_index_composite" -> dedupIndexComposite,
  )

  /** Shared oracle scaffolding: DuckDB-side trigram sets per document.
    * Tokenization mirrors TextKernels.tokenize (lowercase, `\s+` split,
    * drop empties); trigram strings stand in for the engine's 64-bit
    * shingle hashes — pairwise intersection/union sizes are identical
    * because hashing is injective on the fixture vocabulary. */
  private val oracleGramsCte: String =
    """toks AS (
      |  SELECT doc_id, lang,
      |    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS tk
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, lang,
      |    list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
      |                   for i in range(1, len(tk) - 1)]) AS gs
      |  FROM toks WHERE len(tk) >= 3)""".stripMargin

  /** Brute-force exact trigram-Jaccard pairs at t = 0.5 (2·|A∩B| ≥ |A∪B|,
    * pure integer arithmetic — no float in the filter or the output).
    * Valid as the LSH oracle because every fixture pair at t ≥ 0.5 has
    * J ≥ 0.9, where 16-band×4-row recall is 1 − (1−0.9⁴)¹⁶ ≈ 1 − 4e-8 and
    * deterministic under the engine's fixed hash family (verified: LSH and
    * brute force emit the identical 25-pair set at sf0.01). */
  private val oracleMinhashPairs: String =
    s"""WITH $oracleGramsCte,
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    len(list_intersect(a.gs, b.gs)) AS inter,
       |    len(a.gs) AS na, len(b.gs) AS nb
       |  FROM grams a JOIN grams b ON a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter_grams,
       |  CAST(na + nb - inter AS BIGINT) AS union_grams
       |FROM pairs WHERE 2 * inter >= na + nb - inter
       |ORDER BY doc_a ASC NULLS FIRST, doc_b ASC NULLS FIRST""".stripMargin

  /** `(a*b) mod 2^64` in DuckDB HUGEINT without 128-bit overflow: split `a`
    * into 32-bit halves so every partial product stays below 2^96. */
  private def sqlMulMod64(a: String, b: String): String =
    s"((((($a) >> 32) * $b) % 4294967296::HUGEINT) * 4294967296::HUGEINT" +
      s" + (($a) % 4294967296::HUGEINT) * $b) % 18446744073709551616::HUGEINT"

  private def sqlXorShift(z: String, s: Int): String = s"xor($z, ($z) >> $s)"

  /** TextKernels.hash64 (FNV-1a 64 + splitmix64 finalizer) transliterated to
    * DuckDB HUGEINT arithmetic — byte-exact on the ASCII fixture (validated
    * token-by-token against the JVM kernel). The FNV fold rides list_reduce
    * with the offset basis prepended as the accumulator seed; the three
    * splitmix xorshift-multiply rounds are chained CTE stages. */
  private val oracleSimhash: String = {
    val fnv = "list_reduce(list_prepend(14695981039346656037::HUGEINT, " +
      "[unicode(c)::HUGEINT for c in string_split(tok, '')]), " +
      "(h, b) -> " + sqlMulMod64("xor(h, b)", "1099511628211::HUGEINT") + ")"
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tk
       |  FROM documents),
       |tok AS (SELECT doc_id, unnest(tk) AS tok FROM toks WHERE len(tk) >= 1),
       |h1 AS (SELECT doc_id, $fnv AS h FROM tok),
       |h2 AS (SELECT doc_id,
       |  (h + 11400714819323198485::HUGEINT) % 18446744073709551616::HUGEINT AS z
       |  FROM h1),
       |h3 AS (SELECT doc_id,
       |  ${sqlMulMod64(sqlXorShift("z", 30), "13787848793156543929::HUGEINT")} AS z
       |  FROM h2),
       |h4 AS (SELECT doc_id,
       |  ${sqlMulMod64(sqlXorShift("z", 27), "10723151780598845931::HUGEINT")} AS z
       |  FROM h3),
       |th AS (SELECT doc_id, xor(z, z >> 31) AS h FROM h4),
       |votes AS (
       |  SELECT doc_id, b.b AS b,
       |    SUM(CASE WHEN (h >> b.b) % 2 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM th, (SELECT unnest(range(64)) AS b) b
       |  GROUP BY doc_id, b.b),
       |fp AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN v > 0 AND b < 32 THEN (1::BIGINT << b) ELSE 0 END)
       |      AS BIGINT) AS lo,
       |    CAST(SUM(CASE WHEN v > 0 AND b >= 32 THEN (1::BIGINT << (b - 32)) ELSE 0 END)
       |      AS BIGINT) AS hi
       |  FROM votes GROUP BY doc_id)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS BIGINT)
       |    AS hamming
       |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
       |ORDER BY doc_a ASC NULLS FIRST, doc_b ASC NULLS FIRST""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "dedup_fuzzy_minhash" -> oracleMinhashPairs,
    "dedup_minhash_sql" -> oracleMinhashPairs,

    // Brute-force 64-bit SimHash Hamming pairs. Valid as the oracle for the
    // pigeonhole-blocked engine path because the blocking is LOSSLESS at
    // maxHamming = 3: distance ≤ 3 over 4 disjoint 16-bit chunks forces at
    // least one identical chunk, so every qualifying pair survives blocking.
    "dedup_simhash" -> oracleSimhash,

    // PPJoin is lossless (prefix/length/positional filters only prune pairs
    // that cannot reach t), so brute force within the lang block IS the
    // operator's contract — not just a fixture coincidence.
    "dedup_ngram_jaccard" ->
      s"""WITH $oracleGramsCte,
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    len(list_intersect(a.gs, b.gs)) AS inter,
         |    len(a.gs) AS na, len(b.gs) AS nb
         |  FROM grams a JOIN grams b
         |    ON a.lang = b.lang AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter_grams,
         |  CAST(na + nb - inter AS BIGINT) AS union_grams
         |FROM pairs WHERE 2 * inter >= na + nb - inter
         |ORDER BY doc_a ASC NULLS FIRST, doc_b ASC NULLS FIRST""".stripMargin,

    // Connected components as a recursive transitive closure over the same
    // brute-force pair set; min reachable id = the engine's min-label
    // propagation fixpoint. Singletons (docs in no pair) keep their own id.
    "dedup_clusters" ->
      s"""WITH RECURSIVE $oracleGramsCte,
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    len(list_intersect(a.gs, b.gs)) AS inter,
         |    len(a.gs) AS na, len(b.gs) AS nb
         |  FROM grams a JOIN grams b ON a.doc_id < b.doc_id),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  WHERE 2 * inter >= na + nb - inter
         |  UNION
         |  SELECT doc_b, doc_a FROM pairs WHERE 2 * inter >= na + nb - inter),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r
         |  JOIN edges e ON r.dst = e.src WHERE e.dst <> r.src),
         |labels AS (
         |  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
         |  FROM reach GROUP BY src),
         |lab AS (
         |  SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id),
         |sizes AS (
         |  SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY 1)
         |SELECT lab.doc_id, lab.cluster_id, sizes.cluster_size
         |FROM lab JOIN sizes USING (cluster_id)
         |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    "dedup_embedding" ->
      """WITH base AS (SELECT vec_id, embedding FROM embeddings),
        |planted AS (
        |  SELECT vec_id + 10000000 AS vec_id,
        |         LIST_TRANSFORM(embedding, x -> x * 2) AS embedding
        |  FROM base WHERE vec_id % 25 = 0 AND vec_id < 10000000),
        |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM planted)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        |WHERE LIST_DOT_PRODUCT(a.embedding, a.embedding) > 0
        |  AND LIST_DOT_PRODUCT(b.embedding, b.embedding) > 0
        |  AND LIST_DOT_PRODUCT(a.embedding, b.embedding)
        |      / (SQRT(LIST_DOT_PRODUCT(a.embedding, a.embedding))
        |         * SQRT(LIST_DOT_PRODUCT(b.embedding, b.embedding))) >= 0.9
        |ORDER BY vec_a ASC NULLS FIRST, vec_b ASC NULLS FIRST""".stripMargin,

    "dedup_exact" ->
      """SELECT SHA256(text) AS content_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1
        |ORDER BY content_hash ASC NULLS FIRST""".stripMargin,

    "dedup_index_incremental" ->
      """WITH longd AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE length(text) > 200 AND doc_id < 40),
        |corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 100000, text || ' zz zz' FROM longd),
        |batch AS (
        |  SELECT doc_id + 200000 AS doc_id, text || ' qq qq' AS text
        |  FROM longd),
        |tc AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS tk
        |  FROM corpus),
        |gc AS (
        |  SELECT doc_id,
        |    list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
        |                   for i in range(1, len(tk) - 1)]) AS gs
        |  FROM tc WHERE len(tk) >= 3),
        |tb AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS tk
        |  FROM batch),
        |gb AS (
        |  SELECT doc_id,
        |    list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
        |                   for i in range(1, len(tk) - 1)]) AS gs
        |  FROM tb WHERE len(tk) >= 3),
        |pairs AS (
        |  SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
        |    len(list_intersect(b.gs, c.gs)) AS inter,
        |    len(b.gs) AS nb, len(c.gs) AS nc
        |  FROM gb b CROSS JOIN gc c)
        |SELECT batch_id, corpus_id, CAST(inter AS BIGINT) AS inter_grams,
        |  CAST(nb + nc - inter AS BIGINT) AS union_grams,
        |  (nb >= 2147483647 OR nc >= 2147483647) AS sketched
        |FROM pairs WHERE 2 * inter >= nb + nc - inter
        |ORDER BY batch_id ASC NULLS FIRST, corpus_id ASC NULLS FIRST""".stripMargin,

    "dedup_index_composite" ->
      """WITH longd AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE length(text) > 200 AND doc_id < 40),
        |corpus AS (
        |  SELECT doc_id, doc_id % 4 AS part, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, doc_id % 4, text || ' zz zz' FROM longd),
        |batch AS (
        |  SELECT doc_id + 200000 AS doc_id, doc_id % 4 AS part,
        |    text || ' qq qq' AS text
        |  FROM longd),
        |tc AS (
        |  SELECT doc_id, part,
        |    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS tk
        |  FROM corpus),
        |gc AS (
        |  SELECT doc_id, part,
        |    list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
        |                   for i in range(1, len(tk) - 1)]) AS gs
        |  FROM tc WHERE len(tk) >= 3),
        |tb AS (
        |  SELECT doc_id, part,
        |    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS tk
        |  FROM batch),
        |gb AS (
        |  SELECT doc_id, part,
        |    list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
        |                   for i in range(1, len(tk) - 1)]) AS gs
        |  FROM tb WHERE len(tk) >= 3),
        |pairs AS (
        |  SELECT b.doc_id AS batch_doc_id, b.part AS batch_part,
        |    c.doc_id AS corpus_doc_id, c.part AS corpus_part,
        |    len(list_intersect(b.gs, c.gs)) AS inter,
        |    len(b.gs) AS nb, len(c.gs) AS nc
        |  FROM gb b CROSS JOIN gc c)
        |SELECT batch_doc_id, batch_part, corpus_doc_id, corpus_part,
        |  CAST(inter AS BIGINT) AS inter_grams,
        |  CAST(nb + nc - inter AS BIGINT) AS union_grams,
        |  (nb >= 2147483647 OR nc >= 2147483647) AS sketched
        |FROM pairs WHERE 2 * inter >= nb + nc - inter
        |ORDER BY batch_doc_id ASC NULLS FIRST, batch_part ASC NULLS FIRST,
        |  corpus_doc_id ASC NULLS FIRST, corpus_part ASC NULLS FIRST""".stripMargin,
  )
}
