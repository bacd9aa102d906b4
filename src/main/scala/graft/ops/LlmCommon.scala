package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column builders for the LLM-pipeline packs (SURVEY.md §2.J).
  * Pure Catalyst expressions — tokenization, shingling and hashing all stay
  * inside whole-stage codegen; nothing touches the driver.
  */
object LlmCommon {

  /** Whitespace tokens of lowercased text (`\S+`, so no empty tokens —
    * DuckDB's regexp_extract_all parity). */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("\\S+"), lit(0))

  /** Distinct word n-gram shingles. Guarded for docs shorter than n. */
  def shingles(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*))
    array_distinct(when(size(toks) >= n, grams).otherwise(array()))
  }

  /** 32-bit-ranged shingle hash (fits multiply-shift minhashing in a Long
    * without overflow). */
  def hash32(c: Column): Column = xxhash64(c).bitwiseAND(lit(0xffffffffL))

  /** Mersenne prime 2^61-1 for the universal-hash family. */
  val MinhashPrime: Long = 2305843009213693951L

  /** Deterministic (a, b) parameters for `numHashes` universal hash
    * functions h_i(x) = (a_i * x + b_i) mod P. */
  def hashParams(numHashes: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numHashes)((rnd.nextInt(Int.MaxValue - 1).toLong + 1L,
      rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Per-language stopword lists for the language-ID heuristic. Kept tiny and
    * hard-pinned so the DuckDB oracle can embed the same literals. */
  val StopwordsByLang: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "une"),
    "zh" -> Seq("de", "shi", "le", "bu", "wo", "you", "zai"),
  )
}
