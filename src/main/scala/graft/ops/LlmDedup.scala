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

  /** doc_id, minhash signature (64 longs), distinct-shingle-hash set. */
  def minhashSignatures(docs: DataFrame, shingleLen: Int = 3): DataFrame = {
    val sh = docs
      .select(col("doc_id"), explode(shingles(tokens(col("text")), shingleLen)).as("sh"))
      .select(col("doc_id"), hash32(col("sh")).as("h"))
    val mins = hashParams(NumHashes).zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % MinhashPrime).as(s"m$i")
    }
    sh.groupBy(col("doc_id"))
      .agg(mins.head, (mins.tail :+ collect_set(col("h")).as("sh_set")): _*)
      .select(col("doc_id"),
        array((0 until NumHashes).map(i => col(s"m$i")): _*).as("sig"),
        col("sh_set"))
  }

  /** Near-dup pairs: shingles → minhash → LSH banding → candidate pairs →
    * exact-Jaccard verification (SURVEY `dedup_fuzzy_minhash`).
    *
    * The verification join uses the exact shingle-hash sets; at 100 TB those
    * would be capped/sketched (or re-derived from text for candidates only) —
    * the banding math is unchanged. */
  def minhashPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sigs = minhashSignatures(docs)
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
      .withColumn("jaccard",
        size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
          size(array_union(col("set_a"), col("set_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("doc_a").asc_nulls_first, col("doc_b").asc_nulls_first)
  }

  private val dedupFuzzyMinhash: Q = (s, d) =>
    minhashPairs(load(s, d, "documents"), threshold = 0.5)

  // ------------------------------------------------------------------ SimHash

  /** 64-bit SimHash per document: sign of the per-bit weighted sum of token
    * hashes. */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
    val bitSums = (0 until 64).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L)) * 2 - 1).as(s"b$j"))
    val withSums = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 64).map(j =>
      when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    withSums.select(col("doc_id"), fp.as("simhash"))
  }

  /** Near-dup pairs with Hamming distance ≤ 3 (SURVEY §2.J extension
    * `dedup_simhash`). Pigeonhole blocking: distance ≤ 3 over 4 chunks of 16
    * bits ⇒ at least one chunk identical, so candidates come from an
    * equi-join on (chunk index, chunk value) — no all-pairs scan. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val fp = simhash(docs)
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
    val prepped = docs.select(col("doc_id"), col("lang"),
        shingles(tokens(col("text")), n).as("grams"))
      .withColumn("bucket", (size(col("grams")) / 32).cast("int"))
    prepped.as("x").join(prepped.as("y"),
        col("x.lang") === col("y.lang") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .withColumn("jaccard",
        size(array_intersect(col("x.grams"), col("y.grams"))).cast("double") /
          size(array_union(col("x.grams"), col("y.grams"))))
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
    plane.zipWithIndex.map { case (w, i) =>
      element_at(vec, i + 1).cast("double") * w
    }.reduce(_ + _)

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
