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

  private val NumHashes = 64
  private val Bands = 16
  private val RowsPerBand = NumHashes / Bands

  /** doc_id, minhash signature (64 longs), SORTED distinct-shingle-hash set.
    *
    * Map-only typed kernel ([[graft.functions.TextKernels]]): a per-doc
    * signature needs no cross-row aggregation, so this is one JIT'd pass
    * with zero shuffle — the 100 TB shape. The shingle set stays sorted for
    * the codegen'd merge-scan intersection used during verification. Docs
    * with no shingles are dropped. */
  def minhashSignatures(docs: DataFrame, shingleLen: Int = 3): DataFrame = {
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
          else Some((id, TextKernels.minhashSig(shs, as, bs), shs))
        }
      }
      .toDF("doc_id", "sig", "sh_set")
  }

  /** Near-dup pairs: shingles → minhash → LSH banding → candidate pairs →
    * exact-Jaccard verification (SURVEY `dedup_fuzzy_minhash`).
    *
    * The verification join uses the exact shingle-hash sets; at 100 TB those
    * would be capped/sketched (or re-derived from text for candidates only) —
    * the banding math is unchanged. */
  def minhashPairs(docs: DataFrame, threshold: Double): DataFrame = {
    // signatures feed both banding sides and both verification joins; persist
    // so the shingle-explode + 64-way min aggregation runs once, not 4x
    val sigs = minhashSignatures(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sigs.select(col("doc_id"), col("sig"),
        explode(transform(sequence(lit(0), lit(Bands - 1)), b => struct(
          b.as("band"),
          xxhash64(concat_ws("_", (b.as("x") :: (0 until RowsPerBand).map(r =>
            element_at(col("sig"), b * RowsPerBand + r + 1)).toList): _*))
            .as("bkey")))).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
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
      .withColumn("_inter",
        graft.functions.SortedIntersectCount(col("set_a"), col("set_b")))
      .withColumn("jaccard", // |A∪B| = |A|+|B|-|A∩B|: skip building the union
        col("_inter").cast("double") /
          (size(col("set_a")) + size(col("set_b")) - col("_inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("doc_a").asc_nulls_first, col("doc_b").asc_nulls_first)
  }

  private val dedupFuzzyMinhash: Q = (s, d) =>
    minhashPairs(load(s, d, "documents"), threshold = 0.5)

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
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("doc_a").asc_nulls_first, col("doc_b").asc_nulls_first)
  }

  private val dedupSimhash: Q = (s, d) => simhashPairs(load(s, d, "documents"))

  // ---------------------------------------------------------- n-gram Jaccard

  /** Blocked pairwise n-gram Jaccard (SURVEY §2.J extension
    * `dedup_ngram_jaccard`): block on (lang, token-count bucket) so the
    * quadratic comparison only runs inside small blocks. */
  def ngramJaccardPairs(docs: DataFrame, n: Int, threshold: Double): DataFrame = {
    // grams as 64-bit hashes: array_intersect/union over longs is far
    // cheaper than over strings, and the self-join shuffles 8 bytes/gram
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
      .withColumn("bucket", (size(col("grams")) / 32).cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    prepped.as("x").join(prepped.as("y"),
        col("x.lang") === col("y.lang") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .withColumn("_inter",
        graft.functions.SortedIntersectCount(col("x.grams"), col("y.grams")))
      .withColumn("jaccard", // |A∪B| = |A|+|B|-|A∩B|: skip building the union
        col("_inter").cast("double") /
          (size(col("x.grams")) + size(col("y.grams")) - col("_inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("doc_a").asc_nulls_first, col("doc_b").asc_nulls_first)
  }

  private val dedupNgramJaccard: Q = (s, d) =>
    ngramJaccardPairs(load(s, d, "documents"), n = 2, threshold = 0.3)

  // ------------------------------------------------------- embedding near-dup

  /** Deterministic pseudo-random hyperplanes for sign-bit LSH. */
  private[ops] def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 7L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  private[ops] def dotLit(vec: Column, plane: Seq[Double]): Column =
    // loop-based fold: an unrolled 64-term sum per plane blows past the
    // JIT/codegen method-size limits and falls back to interpreted eval
    aggregate(zip_with(vec, typedLit(plane), (u, w) => u.cast("double") * w),
      lit(0.0), (acc, x) => acc + x)

  /** Sign-bit LSH bucket id over `nPlanes` hyperplanes. */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int): Column =
    hyperplanes(nPlanes, dim).zipWithIndex.map { case (p, i) =>
      when(dotLit(vec, p) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))

  private[ops] def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) = aggregate(
      zip_with(x, y, (u, v) => u.cast("double") * v.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Embedding near-dup pairs (SURVEY §2.J extension `dedup_embedding`):
    * 12-bit sign-LSH buckets → exact cosine within bucket. */
  def embeddingDupPairs(emb: DataFrame, dim: Int, threshold: Double): DataFrame = {
    val bucketed = emb.select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), nPlanes = 12, dim).as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bucketed.as("x").join(bucketed.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .withColumn("cos_sim", cosine(col("x.embedding"), col("y.embedding")))
      .filter(col("cos_sim") >= threshold)
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        round(col("cos_sim"), 6).as("cos_sim"))
      .orderBy(col("vec_a").asc_nulls_first, col("vec_b").asc_nulls_first)
  }

  private val dedupEmbedding: Q = (s, d) =>
    embeddingDupPairs(load(s, d, "embeddings"), dim = 64, threshold = 0.9)

  val queries: Map[String, Q] = Map(
    "dedup_exact" -> dedupExact,
    "dedup_fuzzy_minhash" -> dedupFuzzyMinhash,
    "dedup_simhash" -> dedupSimhash,
    "dedup_ngram_jaccard" -> dedupNgramJaccard,
    "dedup_embedding" -> dedupEmbedding,
  )

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT SHA256(text) AS content_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1
        |ORDER BY content_hash ASC NULLS FIRST""".stripMargin,
  )
}
