package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.ops.LlmCommon._
import graft.ops.Relational.Q
import graft.util.Det._

/** Text analysis for training-data pipelines (SURVEY.md §2.J + north-star
  * extensions): corpus stats, token counting, quality scoring, language-ID
  * heuristic, content fingerprinting.
  *
  * Everything is per-row projection + one hash aggregation — at 100 TB these
  * are single-pass, map-side-combinable scans with no skew risk.
  */
object LlmText {

  private def toks(c: Column): Column = tokens(c)

  /** Corpus stats per source (SURVEY `text_stats`). */
  private val textStats: Q = (s, d) =>
    load(s, d, "documents")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(toks(col("text"))).cast("long")).as("total_tokens"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy(col("source").asc_nulls_first)

  /** Token counting, whitespace + BPE-ish regex (north-star extension
    * `text_tokens`): word pieces are runs of letters, digits, or single
    * non-alphanumeric glyphs — a cheap proxy for byte-pair token counts. */
  private val textTokens: Q = (s, d) =>
    load(s, d, "documents")
      .select(
        col("doc_id"),
        size(toks(col("text"))).as("ws_tokens"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("bpe_ish_tokens"),
        col("n_chars"))
      .orderBy(col("doc_id").asc_nulls_first)

  /** Quality scoring (north-star extension `text_quality`): length,
    * mean-token-length and stopword-ratio blended into a 0..1000000 score.
    *
    * All outputs are exact integers (scaled by 1e6 via integer division):
    * a blended *float* score sits one ulp from a rounding boundary on some
    * row at every scale (bit-divergence between engines observed at sf0.1),
    * while integer arithmetic is boundary-free in both engines. */
  private val textQuality: Q = (s, d) => {
    val allStop = StopwordsByLang.flatMap(_._2).distinct
    val t = toks(col("text"))
    val nTok = size(t).cast("long")
    val sumLen = aggregate(t, lit(0L), (acc, x) => acc + length(x))
    val nDist = size(array_distinct(t)).cast("long")
    val nStop = size(array_intersect(t, array(allStop.map(lit): _*))).cast("long")
    load(s, d, "documents")
      .withColumn("n_tokens", nTok)
      .withColumn("sum_len", sumLen)
      .withColumn("n_dist", nDist)
      .withColumn("n_stop", nStop)
      .select(col("doc_id"), col("n_tokens"),
        when(col("n_tokens") > 0,
          expr("1000000L * sum_len div n_tokens")).otherwise(lit(0L))
          .as("mean_token_len_e6"),
        when(col("n_dist") > 0,
          expr("1000000L * n_stop div n_dist")).otherwise(lit(0L))
          .as("stopword_ratio_e6"),
        // 0.4·min(n_chars,500)/500 + 0.3·n_stop/n_dist + 0.3·min(sum_len, 8·n_tokens)/(8·n_tokens)
        when(col("n_tokens") > 0 && col("n_dist") > 0,
          expr("""(400000L * least(n_chars, 500L) div 500L)
                 | + (300000L * n_stop div n_dist)
                 | + (300000L * least(sum_len, 8L * n_tokens) div (8L * n_tokens))"""
            .stripMargin)).otherwise(lit(0L)).as("quality_score_e6"))
      .orderBy(col("doc_id").asc_nulls_first)
  }

  /** Language-ID heuristic (north-star extension `text_langid`): stopword-hit
    * argmax with a fixed tie-break priority (en > es > de > fr > zh > und). */
  private val textLangid: Q = (s, d) => {
    val t = array_distinct(toks(col("text")))
    val hits = StopwordsByLang.map { case (lang, words) =>
      lang -> size(array_intersect(t, array(words.map(lit): _*)))
    }
    val hitCols = hits.map { case (lang, c) => c.as(s"hits_$lang") }
    val best = hits.foldLeft((lit("und"), lit(0))) {
      case ((bestLang, bestHits), (lang, c)) =>
        (when(c > bestHits, lit(lang)).otherwise(bestLang),
          when(c > bestHits, c).otherwise(bestHits))
    }
    load(s, d, "documents")
      .select((col("doc_id") +: col("lang").as("labeled_lang") +: hitCols :+
        best._1.as("predicted_lang")): _*)
      .orderBy(col("doc_id").asc_nulls_first)
  }

  /** Content fingerprint (north-star extension `text_fingerprint`):
    * order-independent bag-of-words digest — md5 over the sorted distinct
    * token set — plus the distinct-token count. Word-order-insensitive
    * companion to `dedup_exact`. */
  private val textFingerprint: Q = (s, d) => {
    val sorted = array_sort(array_distinct(toks(col("text"))))
    load(s, d, "documents")
      .select(col("doc_id"),
        md5(concat_ws(" ", sorted)).as("fingerprint"),
        size(sorted).as("n_distinct_tokens"))
      .orderBy(col("doc_id").asc_nulls_first)
  }

  /** Repetition metrics over any frame with (doc_id, text) — factored out so
    * tests can feed planted repetitive docs. All outputs are exact integers
    * (scaled 1e6, integer division) for cross-engine hash parity:
    *   - `dup_token_frac_e6`   — 1 - distinct/total tokens (Gopher-style
    *     duplicate-token fraction);
    *   - `top_bigram_frac_e6`  — share of bigram-occurrence characters in the
    *     HEAVIEST bigram, where weight = occurrences × length. This is a
    *     length-weighted variant of Gopher's "fraction of characters in the
    *     most common 2-gram": a rare-but-long bigram can outweigh the modal
    *     one. Chosen deliberately — maximizing a single integer weight needs
    *     no tie-break rule, so both engines agree exactly, and character
    *     mass (not raw count) is what the filter actually thresholds on;
    *   - `dup_bigram_frac_e6`  — share of bigram-occurrence characters in
    *     bigrams occurring ≥2 times (Gopher "characters in duplicated
    *     n-grams").
    * Denominator is total bigram-occurrence characters, so both fractions are
    * closed in [0, 1e6].
    *
    * Scale: map-only projection, zero shuffle, no skew. Per-row cost is
    * O(distinct-bigrams × doc-length) from the nested HOF scan — ~10⁶ ops for
    * a 1k-token web doc, fine for corpus filtering; for book-length outliers,
    * cap with substring(text, 1, N) upstream rather than shuffling an
    * explode+groupBy formulation (which would move the whole corpus). */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val nTok = size(t).cast("long")
    val nDist = size(array_distinct(t)).cast("long")
    val bg = when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + 1))))
      .otherwise(array().cast("array<string>"))
    docs
      .withColumn("n_tokens", nTok)
      .withColumn("n_dist", nDist)
      .withColumn("_bg", bg)
      // one counting pass per distinct bigram: (count, count×length) pairs,
      // from which both the all-bigram and the duplicated-only character
      // masses derive without re-scanning
      .withColumn("_cw", transform(array_distinct(col("_bg")), x =>
        struct(size(filter(col("_bg"), y => y === x)).cast("long").as("c"),
          length(x).cast("long").as("l"))))
      .withColumn("_occ", transform(col("_cw"),
        p => p.getField("c") * p.getField("l")))
      .withColumn("_dup_occ", transform(col("_cw"), p =>
        when(p.getField("c") >= 2, p.getField("c") * p.getField("l"))
          .otherwise(lit(0L))))
      .withColumn("bg_chars",
        coalesce(aggregate(col("_occ"), lit(0L), (a, x) => a + x), lit(0L)))
      .withColumn("top_chars", coalesce(array_max(col("_occ")), lit(0L)))
      .withColumn("dup_chars",
        coalesce(aggregate(col("_dup_occ"), lit(0L), (a, x) => a + x), lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        when(col("n_tokens") > 0,
          expr("1000000L * (n_tokens - n_dist) div n_tokens")).otherwise(lit(0L))
          .as("dup_token_frac_e6"),
        when(col("bg_chars") > 0,
          expr("1000000L * top_chars div bg_chars")).otherwise(lit(0L))
          .as("top_bigram_frac_e6"),
        when(col("bg_chars") > 0,
          expr("1000000L * dup_chars div bg_chars")).otherwise(lit(0L))
          .as("dup_bigram_frac_e6"))
  }

  /** Gopher-style repetition filters (north-star extension
    * `text_repetition`): see [[repetitionStats]]. */
  private val textRepetition: Q = (s, d) =>
    repetitionStats(load(s, d, "documents"))
      .orderBy(col("doc_id").asc_nulls_first)

  /** Deterministic engine-portable train/val/test assignment (north-star
    * extension `split_train_test`): bucket = first hex byte of
    * md5(doc_id-as-string), split by byte thresholds 0xcc/0xe6 →
    * 204/26/26 of 256 ≈ 79.7% / 10.2% / 10.2%. The assignment is a pure
    * function of the row key — stable under re-partitioning, re-ingestion,
    * cluster size, and engine (md5 hex is identical everywhere), which is the
    * property a training pipeline needs so that test docs NEVER migrate into
    * train between runs. Map-only, zero shuffle. */
  private val splitTrainTest: Q = (s, d) => {
    val bucket = substring(md5(col("doc_id").cast("string")), 1, 2)
    load(s, d, "documents")
      .select(col("doc_id"), bucket.as("hash_bucket"),
        when(bucket < "cc", lit("train"))
          .when(bucket < "e6", lit("val"))
          .otherwise(lit("test")).as("split"))
      .orderBy(col("doc_id").asc_nulls_first)
  }

  /** Pretraining sequence packing (north-star extension
    * `pipeline_pack_sequences`): concatenate documents in (source, doc_id)
    * order and cut the token stream at fixed context-length boundaries
    * (C = 512) — the standard packing model where documents split across
    * sequence boundaries rather than leaving pad waste. Emits, per doc, its
    * token interval in the stream and the first/last sequence it lands in —
    * what a packing writer needs to materialize shards.
    *
    * Scale: one window (running sum) per source partition — identical
    * shuffle shape to `win_running_sum`; all arithmetic is exact integers.
    * Sources are independent streams, so at 100 TB each packs in parallel;
    * skew follows source size, the same partitioning knob as any per-source
    * window. */
  private val pipelinePackSequences: Q = (s, d) => {
    val C = 512L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    load(s, d, "documents")
      .withColumn("n_tokens", size(toks(col("text"))).cast("long"))
      .withColumn("start_offset",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("start_offset"),
        expr(s"start_offset div $C").as("first_seq"),
        when(col("n_tokens") > 0,
          expr(s"(start_offset + n_tokens - 1) div $C"))
          .otherwise(expr(s"start_offset div $C")).as("last_seq"))
      .orderBy(col("doc_id").asc_nulls_first)
  }

  /** Sliding-window token chunking (north-star extension `text_chunk`): the
    * RAG / long-context ingestion shape — 128-token windows with a 96-token
    * stride (32 overlap), one output row per chunk, chunk content carried as
    * an md5 digest (comparator-safe; the text itself regenerates from
    * doc_id + chunk_id). Map-side generate — `explode` runs inside the scan
    * stage, no shuffle, no skew beyond doc length. */
  private val textChunk: Q = (s, d) => {
    val size_ = 128
    val step = 96
    val t = toks(col("text"))
    load(s, d, "documents")
      .withColumn("n_tokens", size(t).cast("long"))
      .withColumn("chunk_id", explode(when(col("n_tokens") > 0,
        sequence(lit(0L), expr(s"(n_tokens - 1) div $step")))
        .otherwise(array().cast("array<long>"))))
      .select(col("doc_id"), col("chunk_id"),
        least(lit(size_.toLong), col("n_tokens") - col("chunk_id") * step)
          .as("n_chunk_tokens"),
        md5(concat_ws(" ",
          slice(t, (col("chunk_id") * step + 1).cast("int"), lit(size_))))
          .as("chunk_md5"))
      .orderBy(col("doc_id").asc_nulls_first, col("chunk_id").asc_nulls_first)
  }

  /** End-to-end corpus cleaning (north-star composite
    * `pipeline_clean_corpus`): the flow a real training-data pipeline runs
    * over raw documents —
    *   1. language gate (labeled lang = en),
    *   2. quality gate (the exact integer score of `text_quality` ≥ 500k),
    *   3. exact dedup keeping the lowest doc_id per content hash
    * — emitting the keep-list with its quality metadata. The near-dup stage
    * (`dedup_fuzzy_minhash` pairs → `dedup_clusters` representatives)
    * composes the same way but isn't SQL-expressible, so the ORACLED
    * pipeline stops at exact dedup.
    *
    * Scale: one scan (filters and scoring are a map-side projection — the
    * gates prune BEFORE any shuffle) + one shuffle on the content hash for
    * the keep-first window. No collect, no cross-stage barrier. */
  private val pipelineCleanCorpus: Q = (s, d) => {
    val allStop = StopwordsByLang.flatMap(_._2).distinct
    val t = toks(col("text"))
    val scored = load(s, d, "documents")
      .filter(col("lang") === "en")
      .withColumn("n_tokens", size(t).cast("long"))
      .withColumn("sum_len", aggregate(t, lit(0L), (acc, x) => acc + length(x)))
      .withColumn("n_dist", size(array_distinct(t)).cast("long"))
      .withColumn("n_stop",
        size(array_intersect(t, array(allStop.map(lit): _*))).cast("long"))
      .withColumn("quality_score_e6",
        when(col("n_tokens") > 0 && col("n_dist") > 0,
          expr("""(400000L * least(n_chars, 500L) div 500L)
                 | + (300000L * n_stop div n_dist)
                 | + (300000L * least(sum_len, 8L * n_tokens) div (8L * n_tokens))"""
            .stripMargin)).otherwise(lit(0L)))
      .filter(col("quality_score_e6") >= 500000L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sha2(col("text"), 256)).orderBy(col("doc_id").asc)
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("quality_score_e6"))
      .orderBy(col("doc_id").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "text_stats" -> textStats,
    "text_tokens" -> textTokens,
    "text_quality" -> textQuality,
    "text_langid" -> textLangid,
    "text_fingerprint" -> textFingerprint,
    "text_repetition" -> textRepetition,
    "split_train_test" -> splitTrainTest,
    "pipeline_pack_sequences" -> pipelinePackSequences,
    "text_chunk" -> textChunk,
    "pipeline_clean_corpus" -> pipelineCleanCorpus,
  )

  private def stopList(lang: String): String =
    StopwordsByLang.toMap.apply(lang).map(w => s"'$w'").mkString("[", ", ", "]")

  private val allStopList: String =
    StopwordsByLang.flatMap(_._2).distinct.map(w => s"'$w'").mkString("[", ", ", "]")

  val oracles: Map[String, String] = Map(
    "text_stats" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(LEN(REGEXP_EXTRACT_ALL(LOWER(text), '\S+'))) AS BIGINT) AS total_tokens,
        |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
        |  COUNT(DISTINCT lang) AS n_langs
        |FROM documents GROUP BY source
        |ORDER BY source ASC NULLS FIRST""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(LEN(REGEXP_EXTRACT_ALL(LOWER(text), '\S+')) AS INT) AS ws_tokens,
        |  CAST(LEN(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS bpe_ish_tokens,
        |  n_chars
        |FROM documents ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    "text_quality" ->
      s"""WITH t AS (
         |  SELECT doc_id, n_chars,
         |    REGEXP_EXTRACT_ALL(LOWER(text), '\\S+') AS toks
         |  FROM documents
         |), m AS (
         |  SELECT doc_id, n_chars,
         |    CAST(LEN(toks) AS BIGINT) AS n_tokens,
         |    CAST(COALESCE(LIST_SUM(LIST_TRANSFORM(toks, x -> LENGTH(x))), 0) AS BIGINT) AS sum_len,
         |    CAST(LEN(LIST_DISTINCT(toks)) AS BIGINT) AS n_dist,
         |    CAST(LEN(LIST_INTERSECT(toks, $allStopList)) AS BIGINT) AS n_stop
         |  FROM t
         |)
         |SELECT doc_id, n_tokens,
         |  CASE WHEN n_tokens > 0 THEN 1000000 * sum_len // n_tokens ELSE 0 END AS mean_token_len_e6,
         |  CASE WHEN n_dist > 0 THEN 1000000 * n_stop // n_dist ELSE 0 END AS stopword_ratio_e6,
         |  CASE WHEN n_tokens > 0 AND n_dist > 0 THEN
         |    (400000 * LEAST(n_chars, 500) // 500)
         |    + (300000 * n_stop // n_dist)
         |    + (300000 * LEAST(sum_len, 8 * n_tokens) // (8 * n_tokens))
         |  ELSE 0 END AS quality_score_e6
         |FROM m ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    "text_langid" -> {
      val hitExprs = LlmCommon.StopwordsByLang.map { case (lang, _) =>
        s"CAST(LEN(LIST_INTERSECT(t, ${stopList(lang)})) AS INT) AS hits_$lang"
      }.mkString(",\n|    ")
      val folded = LlmCommon.StopwordsByLang.map(_._1).foldLeft(("'und'", "0")) {
        case ((bl, bh), lang) =>
          (s"CASE WHEN hits_$lang > $bh THEN '$lang' ELSE $bl END",
            s"CASE WHEN hits_$lang > $bh THEN hits_$lang ELSE $bh END")
      }._1
      s"""WITH d AS (
         |  SELECT doc_id, lang AS labeled_lang,
         |    LIST_DISTINCT(REGEXP_EXTRACT_ALL(LOWER(text), '\\S+')) AS t
         |  FROM documents
         |), h AS (
         |  SELECT doc_id, labeled_lang,
         |    $hitExprs
         |  FROM d
         |)
         |SELECT doc_id, labeled_lang, hits_en, hits_es, hits_de, hits_fr, hits_zh,
         |  $folded AS predicted_lang
         |FROM h ORDER BY doc_id ASC NULLS FIRST""".stripMargin
    },

    "pipeline_clean_corpus" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, n_chars, text,
         |    REGEXP_EXTRACT_ALL(LOWER(text), '\\S+') AS toks
         |  FROM documents WHERE lang = 'en'
         |), m AS (
         |  SELECT doc_id, source, n_chars, text,
         |    CAST(LEN(toks) AS BIGINT) AS n_tokens,
         |    CAST(COALESCE(LIST_SUM(LIST_TRANSFORM(toks, x -> LENGTH(x))), 0) AS BIGINT) AS sum_len,
         |    CAST(LEN(LIST_DISTINCT(toks)) AS BIGINT) AS n_dist,
         |    CAST(LEN(LIST_INTERSECT(toks, $allStopList)) AS BIGINT) AS n_stop
         |  FROM t
         |), q AS (
         |  SELECT doc_id, source, text, n_tokens,
         |    CASE WHEN n_tokens > 0 AND n_dist > 0 THEN
         |      (400000 * LEAST(n_chars, 500) // 500)
         |      + (300000 * n_stop // n_dist)
         |      + (300000 * LEAST(sum_len, 8 * n_tokens) // (8 * n_tokens))
         |    ELSE 0 END AS quality_score_e6
         |  FROM m
         |), k AS (
         |  SELECT doc_id, source, n_tokens, quality_score_e6,
         |    ROW_NUMBER() OVER (PARTITION BY SHA256(text) ORDER BY doc_id ASC) AS rn
         |  FROM q WHERE quality_score_e6 >= 500000
         |)
         |SELECT doc_id, source, n_tokens, quality_score_e6
         |FROM k WHERE rn = 1
         |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, REGEXP_EXTRACT_ALL(LOWER(text), '\S+') AS toks
        |  FROM documents
        |), b AS (
        |  SELECT doc_id,
        |    CAST(LEN(toks) AS BIGINT) AS n_tokens,
        |    CAST(LEN(LIST_DISTINCT(toks)) AS BIGINT) AS n_dist,
        |    CASE WHEN LEN(toks) >= 2 THEN
        |      LIST_TRANSFORM(RANGE(1, LEN(toks)), i -> toks[i] || ' ' || toks[i+1])
        |    ELSE CAST([] AS VARCHAR[]) END AS bg
        |  FROM t
        |), o AS (
        |  SELECT doc_id, n_tokens, n_dist,
        |    LIST_TRANSFORM(LIST_DISTINCT(bg),
        |      x -> CAST(LEN(LIST_FILTER(bg, y -> y = x)) * LENGTH(x) AS BIGINT)) AS occ,
        |    LIST_TRANSFORM(LIST_DISTINCT(bg),
        |      x -> CASE WHEN LEN(LIST_FILTER(bg, y -> y = x)) >= 2
        |        THEN CAST(LEN(LIST_FILTER(bg, y -> y = x)) * LENGTH(x) AS BIGINT)
        |        ELSE 0 END) AS dup_occ
        |  FROM b
        |), m AS (
        |  SELECT doc_id, n_tokens, n_dist,
        |    CAST(COALESCE(LIST_SUM(occ), 0) AS BIGINT) AS bg_chars,
        |    CAST(COALESCE(LIST_AGGREGATE(occ, 'max'), 0) AS BIGINT) AS top_chars,
        |    CAST(COALESCE(LIST_SUM(dup_occ), 0) AS BIGINT) AS dup_chars
        |  FROM o
        |)
        |SELECT doc_id, n_tokens,
        |  CASE WHEN n_tokens > 0 THEN 1000000 * (n_tokens - n_dist) // n_tokens ELSE 0 END AS dup_token_frac_e6,
        |  CASE WHEN bg_chars > 0 THEN 1000000 * top_chars // bg_chars ELSE 0 END AS top_bigram_frac_e6,
        |  CASE WHEN bg_chars > 0 THEN 1000000 * dup_chars // bg_chars ELSE 0 END AS dup_bigram_frac_e6
        |FROM m ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    "pipeline_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(LEN(REGEXP_EXTRACT_ALL(LOWER(text), '\S+')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
        |  FROM t
        |)
        |SELECT doc_id, source, n_tokens, start_offset,
        |  start_offset // 512 AS first_seq,
        |  CASE WHEN n_tokens > 0 THEN (start_offset + n_tokens - 1) // 512
        |       ELSE start_offset // 512 END AS last_seq
        |FROM c ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    "text_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, REGEXP_EXTRACT_ALL(LOWER(text), '\S+') AS toks
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, toks, CAST(LEN(toks) AS BIGINT) AS n_tokens,
        |    UNNEST(RANGE(0, CASE WHEN LEN(toks) > 0
        |      THEN (LEN(toks) - 1) // 96 + 1 ELSE 0 END)) AS chunk_id
        |  FROM t
        |)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(LEAST(128, n_tokens - chunk_id * 96) AS BIGINT) AS n_chunk_tokens,
        |  MD5(ARRAY_TO_STRING(toks[chunk_id * 96 + 1 : chunk_id * 96 + 128], ' ')) AS chunk_md5
        |FROM c ORDER BY doc_id ASC NULLS FIRST, chunk_id ASC NULLS FIRST""".stripMargin,

    "split_train_test" ->
      """WITH b AS (
        |  SELECT doc_id, SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) AS hash_bucket
        |  FROM documents)
        |SELECT doc_id, hash_bucket,
        |  CASE WHEN hash_bucket < 'cc' THEN 'train'
        |       WHEN hash_bucket < 'e6' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        |  MD5(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(REGEXP_EXTRACT_ALL(LOWER(text), '\S+'))), ' ')) AS fingerprint,
        |  CAST(LEN(LIST_DISTINCT(REGEXP_EXTRACT_ALL(LOWER(text), '\S+'))) AS INT) AS n_distinct_tokens
        |FROM documents ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
  )
}
