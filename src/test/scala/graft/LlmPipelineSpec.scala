package graft

import org.apache.spark.sql.functions._

import graft.ops.LlmPipeline

/** Corpus-hygiene operators (LlmPipeline): planted contamination, scrub
  * semantics, normalization canonical forms, stratified-sample invariants. */
class LlmPipelineSpec extends SparkSuite {
  import spark.implicits._

  private val thirteen = (1 to 13).map(i => s"w$i").mkString(" ")

  test("decontaminate flags a doc sharing one 13-gram, not a clean doc") {
    val bench = Seq((100L, s"alpha $thirteen omega")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"prefix tokens here $thirteen and a tail"), // contains the run
      (2L, (1 to 40).map(i => s"clean$i").mkString(" ")), // disjoint vocab
      (3L, "too short for any thirteen gram")) // < 13 tokens
      .toDF("doc_id", "text")
    val out = LlmPipeline.decontaminate(corpus, bench, 13)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._4 && byId(1L)._3 >= 1)
    assert(!byId(2L)._4 && byId(2L)._3 == 0)
    // short doc survives explode_outer with zero grams, zero hits
    assert(byId(3L) == ((3L, 0L, 0L, false)))
    assert(out.length == 3)
  }

  test("decontaminate counts distinct shared grams once each") {
    // corpus doc repeats the benchmark run twice -> grams are de-duplicated
    // per doc, so the shared 13-grams count once each, not twice
    val bench = Seq((100L, thirteen)).toDF("doc_id", "text")
    val corpus = Seq((1L, s"$thirteen $thirteen")).toDF("doc_id", "text")
    val Array((id, _, hits, flag)) =
      LlmPipeline.decontaminate(corpus, bench, 13)
        .as[(Long, Long, Long, Boolean)].collect()
    assert(id == 1L && flag)
    // "$thirteen $thirteen" has 14 distinct 13-grams; only the pure run
    // (w1..w13) exists in the benchmark
    assert(hits == 1L)
  }

  test("normalized collapses case, punctuation, and whitespace runs") {
    val rows = Seq(
      "  Hello,   World!! 123 ",
      "hello world 123",
      "HELLO---world...123").toDF("text")
      .select(LlmPipeline.normalized(col("text")).as("n"))
      .as[String].collect()
    assert(rows.toSet == Set("hello world 123"))
  }

  test("normalized of all-punctuation text is the empty string") {
    val Array(n) = Seq("!!! ... ???").toDF("text")
      .select(LlmPipeline.normalized(col("text")).as("n")).as[String].collect()
    assert(n == "")
  }

  test("scrubbed redacts email, phone, and IPv4 with correct counts") {
    val text = "mail a.b%c@ex-mple.org or x@y.io call 555-123-4567 " +
      "from 192.168.0.1 not 1234-567-8901 keep plain words"
    val df = Seq(text).toDF("text")
    val Array((e, p, i)) = df.select(
      LlmPipeline.piiCounts(col("text")): _*).as[(Int, Int, Int)].collect()
    assert((e, p, i) == ((2, 1, 1)))
    val Array(s) =
      df.select(LlmPipeline.scrubbed(col("text")).as("s")).as[String].collect()
    assert(s.contains("<EMAIL>") && s.contains("<PHONE>") && s.contains("<IP>"))
    assert(!s.contains("@") && !s.contains("192.168.0.1") &&
      !s.contains("555-123-4567"))
    // 1234-567-8901 has a 4-digit head: \b boundary rejects it as a phone
    assert(s.contains("1234-567-8901"))
    assert(s.endsWith("keep plain words"))
  }

  test("sample_stratified: k per stratum, dense ranks, deterministic") {
    val q = SparkEntry.queries("sample_stratified")
    val out = q(spark, sfDir).as[(Long, String, Int)].collect()
    val docs = Tables.load(spark, sfDir, "documents")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val byLang = out.groupBy(_._2)
    assert(byLang.keySet == docs.keySet.filter(l => docs(l) > 0))
    byLang.foreach { case (lang, rows) =>
      assert(rows.length == math.min(25L, docs(lang)).toInt, s"stratum $lang")
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
    // pure function of the row key: a second run returns identical rows
    assert(q(spark, sfDir).as[(Long, String, Int)].collect().toSeq == out.toSeq)
  }

  test("sample_stratified plan uses WindowGroupLimit below the exchange") {
    val plan = SparkEntry.queries("sample_stratified")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }

  test("pipeline_decontaminate registered query is stable and complete") {
    val out = SparkEntry.queries("pipeline_decontaminate")(spark, sfDir)
      .as[(Long, Long, Long, Boolean)].collect()
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    val nBench = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 41 === 0).count()
    assert(out.length == (nDocs - nBench).toInt)
    assert(out.forall(r => r._3 <= r._2)) // hits never exceed gram count
  }

  test("pipeline_interleave: any prefix holds each source at ~1/stride density") {
    val rows = SparkEntry.queries("pipeline_interleave")(spark, sfDir)
      .as[(Long, String, Long, Long, Long)].collect()
    // stride scheduling invariant: source i's docs with mix_pos <= P number
    // exactly min(count_i, floor(P / stride_i)) — the mix ratio is a
    // certainty, not a statistical tendency
    val perSource = rows.groupBy(_._2)
    val p = 30L
    perSource.foreach { case (src, docs) =>
      val stride = docs.head._3
      val inPrefix = docs.count(_._5 <= p)
      val expect = math.min(docs.length.toLong, p / stride)
      assert(inPrefix == expect,
        s"$src stride=$stride prefix<=$p: got $inPrefix, want $expect")
    }
  }

  test("pipeline_shuffle: reproducible keys, uniform-ish shards, no global window") {
    val df = SparkEntry.queries("pipeline_shuffle")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"shuffle must not plan a window:\n$plan")
    val collected = df.collect()
    val again = SparkEntry.queries("pipeline_shuffle")(spark, sfDir).collect()
    assert(collected.sameElements(again), "shuffle order must be reproducible")
    val shards = collected.map(_.getLong(1)).groupBy(identity).view.mapValues(_.length)
    assert(shards.keys.toSet.subsetOf((0L to 7L).toSet))
    assert(shards.values.min * 3 >= shards.values.max,
      s"md5 shards badly skewed: ${shards.toMap}")
  }
}
