package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps
import graft.util.SkewJoin

/** Cluster-robustness pieces: salted joins for hot keys, and streaming CDC
  * recovery across restarts from the same checkpoint. */
class SkewAndRecoverySpec extends SparkSuite {
  import spark.implicits._

  test("salted join equals the plain join on a skewed key distribution") {
    // 10k rows where one key owns 50% — the classic hot-partition shape
    val large = spark.range(10000)
      .select((when(col("id") % 2 === 0, 1L).otherwise(col("id") % 50)).as("k"),
        col("id").as("payload"))
    val small = (0L until 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = large.join(small, Seq("k"))
    val salted = SkewJoin.saltedInnerJoin(large, small, Seq("k"), salt = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("planted hot band bucket: AQE splits the banded self-join, no unbounded straggler") {
    // 10% of the corpus is ONE identical document: every band key of those
    // clones collides, so the banded self-join has a genuinely hot bucket
    // (the quadratic clone cluster). The run must (a) produce exactly the
    // clone-pair set at threshold 1.0 and (b) show AQE recognizing and
    // splitting the skewed partition rather than one straggler task
    // absorbing the whole cluster.
    val overrides = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4096",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2048",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      // partition coalescing (1 MB default min size) would merge the whole
      // small shuffle into one partition BEFORE skew detection can see it
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // many small reducers so the hot key DOMINATES its partition (skew
      // detection is per reduce partition, and the uniform keys spread thin)
      "spark.sql.shuffle.partitions" -> "64",
      // the downstream distinct() wants hash partitioning; without force,
      // AQE declines the split because it would add a shuffle — at a real
      // hot bucket that trade is exactly the one to take
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")
    val saved = overrides.keys.map(k => k -> spark.conf.getOption(k)).toMap
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    // per-task shuffle-read sizes, to bound the straggler spread
    val taskBytes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          taskBytes.add(t.taskMetrics.shuffleReadMetrics.totalBytesRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val nDocs = 500
      val nClones = 300
      val docs = spark.range(0, nDocs).select(col("id").as("doc_id"),
        when(col("id") < nClones,
          lit("the exact same document body repeated verbatim across the corpus"))
          .otherwise(concat(lit("unique document body number "), col("id"),
            lit(" with its own distinct trailing words "), col("id") * 7))
          .as("text"))
      val pairs = graft.ops.LlmDedup.minhashPairs(docs, threshold = 1.0)
      val pairsDf = pairs.select("doc_a", "doc_b")
      // collect pairsDf ITSELF: .as[...] would spawn a fresh QueryExecution
      // and leave pairsDf's adaptive plan unexecuted (isFinalPlan=false)
      val got = pairsDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // documented candidate count: the hot bucket contributes exactly the
      // clone cluster's C(nClones,2) pairs
      val expected = (for {
        a <- 0L until nClones.toLong
        b <- (a + 1) until nClones.toLong
      } yield (a, b)).toSet
      assert(got == expected,
        s"pairs: got ${got.size}, expected ${expected.size} (C($nClones,2))")
      // listener events are async; give the bus a moment to drain
      Thread.sleep(500)
      // evidence 1: the adaptive plan marks the banded self-join's skewed
      // partition as split (skew=true on the shuffle join node)
      val plan = pairsDf.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the planted hot bucket:\n${plan.take(4000)}")
      // evidence 2: across ALL shuffle stages of the run, no single task
      // absorbed the bulk of the bytes — the quadratic cluster's reads are
      // spread over several tasks rather than one straggler
      val reads = taskBytes.toArray(Array.empty[java.lang.Long]).map(_.toLong)
        .filter(_ > 0).sorted
      assert(reads.nonEmpty, "no shuffle reads observed")
      assert(reads.last.toDouble / reads.sum < 0.5,
        s"one task read ${reads.last} of ${reads.sum} total shuffle bytes " +
          s"(top reads: ${reads.takeRight(5).mkString(",")})")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("batchTopK salted two-phase rank: identical results, bounded per-query reducer input") {
    // 1k queries over a small corpus: the salted pre-rank must leave at most
    // salts x k rows per query for the final window, and the result must be
    // IDENTICAL to the single-phase rank (global top-k is contained in the
    // union of per-salt top-ks).
    val dim = 8
    val n = 4000
    val nQueries = 1000
    val k = 3
    val emb = spark.range(0, n).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(dim)),
        i => (pmod(col("id") * i * 2654435761L, lit(1000L)) / 1000.0).cast("float"))
        .as("embedding"))
      .repartition(8)
    val salted = graft.ops.LlmSim.batchTopK(emb, nQueries, k, salts = 4)
    val single = graft.ops.LlmSim.batchTopK(emb, nQueries, k, salts = 1)
    val a = salted.collect().toSeq
    val b = single.collect().toSeq
    assert(a == b, s"salted rank diverged: ${a.take(3)} vs ${b.take(3)}")
    // the final window's input is bounded by salts x k per query
    val phase1 = graft.ops.LlmSim.batchTopKPhase1(emb, nQueries, k, salts = 4)
    val perQuery = phase1.groupBy("q_id").count()
      .agg(max("count")).as[Long].head()
    assert(perQuery <= 4L * k,
      s"phase-1 left $perQuery rows for one query (> salts*k = ${4 * k})")
    assert(a.size == nQueries * k)
  }

  test("streaming CDC recovers from checkpoint: second run applies only new files") {
    // file source: offsets are replayable across restarts (MemoryStream's
    // are not), so this exercises real recovery semantics
    val store = new graft.store.TableStore(spark,
      Files.createTempDirectory("graft_cdc_recovery").toString)
    store.commitSnapshot(Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v"))
    val checkpoint = Files.createTempDirectory("graft_cdc_recovery_ckpt").toString
    val changeDir = Files.createTempDirectory("graft_cdc_changes").toString
    val schema = "k LONG, s STRING, v DOUBLE, seq LONG, op STRING"
    def changeStream = spark.readStream.schema(schema).json(changeDir)

    // run 1: one change file
    Files.writeString(java.nio.file.Paths.get(changeDir, "b1.json"),
      """{"k":1,"s":"a2","v":11.0,"seq":1,"op":"MODIFY"}""")
    val q1 = StreamingOps.cdcApplyStream(changeStream, store, Seq("k"), checkpoint)
    q1.awaitTermination(); q1.stop()
    assert(store.currentVersion() == 1L)

    // run 2: fresh query, same checkpoint, one NEW file — only it applies
    Files.writeString(java.nio.file.Paths.get(changeDir, "b2.json"),
      """{"k":3,"s":"c","v":30.0,"seq":2,"op":"INSERT"}""")
    val q2 = StreamingOps.cdcApplyStream(changeStream, store, Seq("k"), checkpoint)
    q2.awaitTermination(); q2.stop()

    val rows = store.readSnapshot().as[(Long, String, Double)].collect().toSet
    assert(rows == Set((1L, "a2", 11.0), (2L, "b", 20.0), (3L, "c", 30.0)))
    // exactly one commit per applied batch: base + run1 + run2
    assert(store.currentVersion() == 2L)
  }
}
