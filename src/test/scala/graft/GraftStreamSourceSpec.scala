package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.store.TableStore

/** The graft-table Structured-Streaming source: snapshot versions as offsets,
  * micro-batches reading exactly the files added by new commits. */
class GraftStreamSourceSpec extends SparkSuite {
  import spark.implicits._

  private def freshStore(): TableStore = {
    val dir = java.nio.file.Files.createTempDirectory("graft_streamsrc").toString
    new TableStore(spark, dir)
  }

  private def readTable(store: TableStore, opts: Map[String, String] = Map.empty) = {
    val r = spark.readStream.format(classOf[graft.sources.GraftTableProvider].getName)
      .option("path", store.root)
    opts.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  test("micro-batches consume exactly the files added by each commit") {
    val store = freshStore()
    store.commitSnapshot((1L to 40L).map(i => (i, s"v$i")).toDF("k", "v"))
    val q = readTable(store).writeStream.format("memory")
      .queryName("feed_inc").start()
    try {
      q.processAllAvailable()
      assert(spark.table("feed_inc").count() == 40)
      store.commitAppend((41L to 55L).map(i => (i, s"v$i")).toDF("k", "v"))
      q.processAllAvailable()
      assert(spark.table("feed_inc").count() == 55)
      // incrementality: the second batch carried ONLY the appended rows
      val lastBatchRows = q.recentProgress.filter(_.numInputRows > 0).last.numInputRows
      assert(lastBatchRows == 15, s"last batch read $lastBatchRows rows, not the 15 appended")
      val all = spark.table("feed_inc").as[(Long, String)].collect().sorted
      assert(all.toSeq == (1L to 55L).map(i => (i, s"v$i")))
    } finally q.stop()
  }

  test("start-version=latest emits only commits after stream start") {
    val store = freshStore()
    store.commitSnapshot((1L to 30L).map(i => (i, i * 2)).toDF("k", "x"))
    val q = readTable(store, Map("streaming.start-version" -> "latest"))
      .writeStream.format("memory").queryName("feed_latest").start()
    try {
      q.processAllAvailable()
      assert(spark.table("feed_latest").count() == 0, "base rows must not replay")
      store.commitAppend(Seq((100L, 7L), (101L, 9L)).toDF("k", "x"))
      q.processAllAvailable()
      assert(spark.table("feed_latest").as[(Long, Long)].collect().sorted.toSeq ==
        Seq((100L, 7L), (101L, 9L)))
    } finally q.stop()
  }

  test("rewrite commits fail the stream unless skip-rewrites is set") {
    val store = freshStore()
    store.commitSnapshot((1L to 20L).map(i => (i, s"v$i")).toDF("k", "v"))
    val q = readTable(store).writeStream.format("memory")
      .queryName("feed_rw").start()
    try {
      q.processAllAvailable()
      store.compact(targetFiles = 1) // rewrites every file
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(e.getMessage.contains("rewrites data files") ||
        Option(e.getCause).exists(_.getMessage.contains("rewrites data files")))
    } finally q.stop()
    // with skip-rewrites: the compaction is skipped wholesale, later appends flow
    val q2 = readTable(store, Map("streaming.skip-rewrites" -> "true",
        "streaming.start-version" -> "latest"))
      .writeStream.format("memory").queryName("feed_rw2").start()
    try {
      q2.processAllAvailable()
      store.compact(targetFiles = 2)
      store.commitAppend(Seq((100L, "new")).toDF("k", "v"))
      q2.processAllAvailable()
      assert(spark.table("feed_rw2").as[(Long, String)].collect().toSeq ==
        Seq((100L, "new")))
    } finally q2.stop()
  }

  test("equality-delete commits fail the stream unless skip-deletes") {
    import org.apache.spark.sql.functions.col
    val store = freshStore()
    store.commitBucketed((1L to 20L).map(i => (i, s"v$i")).toDF("k", "v"),
      keys = Seq("k"), numBuckets = 4)
    val q = readTable(store).writeStream.format("memory")
      .queryName("feed_eq").start()
    try {
      q.processAllAvailable()
      store.deleteEq(Seq(3L).toDF("k"))
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(e).exists(m => m.contains("delete vectors")),
        chain(e).mkString("|"))
    } finally q.stop()
    // skip-deletes: the eq commit's post-image-free delete is ignored,
    // later appends flow
    val q2 = readTable(store, Map("streaming.skip-deletes" -> "true",
        "streaming.start-version" -> "latest"))
      .writeStream.format("memory").queryName("feed_eq2").start()
    try {
      q2.processAllAvailable()
      store.deleteEq(Seq(4L).toDF("k"))
      store.commitAppend(Seq((100L, "new")).toDF("k", "v"))
      q2.processAllAvailable()
      assert(spark.table("feed_eq2").as[(Long, String)].collect().toSeq
        .contains((100L, "new")))
    } finally q2.stop()
  }

  test("delete-vector commits fail the stream unless skip-deletes; DV'd genesis refuses") {
    import org.apache.spark.sql.functions.col
    val store = freshStore()
    store.commitSnapshot((1L to 20L).map(i => (i, s"v$i")).toDF("k", "v"))
    val q = readTable(store).writeStream.format("memory")
      .queryName("feed_dv").start()
    try {
      q.processAllAvailable()
      store.deleteMor(col("k") === 3L)
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(e.getMessage.contains("delete vectors") ||
        Option(e.getCause).exists(_.getMessage.contains("delete vectors")))
    } finally q.stop()
    // skip-deletes: DV commits are ignored, later appends flow
    val q2 = readTable(store, Map("streaming.skip-deletes" -> "true",
        "streaming.start-version" -> "latest"))
      .writeStream.format("memory").queryName("feed_dv2").start()
    try {
      q2.processAllAvailable()
      store.deleteMor(col("k") === 4L)
      store.commitAppend(Seq((100L, "new")).toDF("k", "v"))
      q2.processAllAvailable()
      assert(spark.table("feed_dv2").as[(Long, String)].collect().toSeq ==
        Seq((100L, "new")))
    } finally q2.stop()
    // genesis over a DV'd snapshot refuses: the raw file scan cannot apply
    // DVs (history vacuumed down to the DV-carrying snapshot)
    val store2 = freshStore()
    store2.commitSnapshot((1L to 10L).map(i => (i, s"v$i")).toDF("k", "v"))
    store2.deleteMor(col("k") === 1L)
    store2.vacuum(keepSnapshots = 1)
    val e2 = intercept[Exception] {
      val q3 = readTable(store2).writeStream.format("memory")
        .queryName("feed_dv3").start()
      try q3.processAllAvailable() finally q3.stop()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e2).exists(_.contains("delete vectors")), chain(e2).mkString("|"))
    // after purge (+ expiry of the DV'd snapshot) genesis streams clean
    store2.purgeDeletes()
    store2.vacuum(keepSnapshots = 1)
    val q4 = readTable(store2).writeStream.format("memory")
      .queryName("feed_dv4").start()
    try {
      q4.processAllAvailable()
      assert(spark.table("feed_dv4").count() == 9)
    } finally q4.stop()
  }

  test("max-versions-per-trigger paces a backlog into per-commit batches") {
    val store = freshStore()
    store.commitSnapshot(Seq((1L, "a")).toDF("k", "v"))
    store.commitAppend(Seq((2L, "b")).toDF("k", "v"))
    store.commitAppend(Seq((3L, "c")).toDF("k", "v"))
    val q = readTable(store, Map("streaming.max-versions-per-trigger" -> "1"))
      .writeStream.format("memory").queryName("feed_paced")
      .trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(60000)
      assert(spark.table("feed_paced").as[(Long, String)].collect().sorted.toSeq ==
        Seq((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
  }

  test("micro-batch planning bin-packs small files by bytes, not file count") {
    val store = freshStore()
    store.commitSnapshot((1L to 2000L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(12))
    val m = store.manifest(0)
    assert(m.inlineFiles.size >= 8, "fixture should produce many small files")
    val stream = new graft.sources.GraftMicroBatchStream(store.root, m.schema,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("path", store.root)))
    val parts = stream.planInputPartitions(
      graft.sources.GraftOffset(-1), graft.sources.GraftOffset(0))
    assert(parts.length < m.inlineFiles.size,
      s"${parts.length} partitions for ${m.inlineFiles.size} tiny files — not packed")
    val ranges = parts.map(
      _.asInstanceOf[graft.sources.GraftFilePartition].files.size).sum
    assert(ranges == m.inlineFiles.size, "every file must appear in exactly one range")
  }

  test("checkpointed restart resumes from committed offsets") {
    val store = freshStore()
    store.commitSnapshot((1L to 10L).map(i => (i, s"v$i")).toDF("k", "v"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_stream_out").toString
    def run(): Unit = {
      val q = readTable(store).writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(out).count() == 10)
    store.commitAppend((11L to 15L).map(i => (i, s"v$i")).toDF("k", "v"))
    // restart against the SAME checkpoint: the source resumes at the
    // committed version — a from-scratch replay would duplicate the base
    run()
    val all = spark.read.parquet(out).as[(Long, String)].collect().sorted
    assert(all.toSeq == (1L to 15L).map(i => (i, s"v$i")),
      "restart must deliver exactly the appended commit, no replays")
  }

  test("graft-table sink: source-to-sink roundtrip, incremental continuation, no replays") {
    val src = freshStore()
    val dstRoot = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sink_ckpt").toString
    src.commitSnapshot((1L to 30L).map(i => (i, s"v$i")).toDF("k", "v"))
    src.commitAppend((31L to 40L).map(i => (i, s"v$i")).toDF("k", "v"))
    def pump(): Unit = {
      val q = readTable(src).writeStream
        .format(classOf[graft.sources.GraftTableProvider].getName)
        .option("path", dstRoot).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination(120000) finally q.stop()
    }
    pump()
    val dst = new TableStore(spark, dstRoot)
    assert(dst.readSnapshot().as[(Long, String)].collect().sorted.toSeq ==
      (1L to 40L).map(i => (i, s"v$i")))
    // continuation from the same checkpoint: only the new commit flows
    src.commitAppend(Seq((41L, "v41")).toDF("k", "v"))
    val versionsBefore = dst.currentVersion()
    pump()
    assert(dst.readSnapshot().as[(Long, String)].collect().sorted.toSeq ==
      (1L to 41L).map(i => (i, s"v$i")))
    assert(dst.currentVersion() == versionsBefore + 1,
      "continuation must add exactly one commit, not replay history")
  }

  test("graft-table sink: a replayed epoch is a no-op (exactly-once ledger)") {
    val dstRoot = java.nio.file.Files.createTempDirectory("graft_sink2").toString
    val sink = new graft.sources.GraftTableSink(
      Map("path" -> dstRoot, "sink.id" -> "q2"))
    val batch = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    sink.addBatch(0, batch)
    val dst = new TableStore(spark, dstRoot)
    assert(dst.currentVersion() == 0 && dst.readSnapshot().count() == 2)
    sink.addBatch(0, batch) // failure replay of the same epoch
    assert(dst.currentVersion() == 0, "replayed epoch must not re-commit")
    assert(dst.readSnapshot().count() == 2)
    sink.addBatch(1, Seq((3L, "c")).toDF("k", "v"))
    assert(dst.currentVersion() == 1 && dst.readSnapshot().count() == 3)
  }

  test("graft-table sink: crash between table commit and ledger `done` is recovered") {
    // epoch committed to the table, `done` never recorded — the replay must
    // recognize ITS OWN commit by fingerprint, and a FOREIGN commit in the
    // same window must not be mistaken for it.
    val dstRoot = java.nio.file.Files.createTempDirectory("graft_sink4").toString
    val sink = new graft.sources.GraftTableSink(
      Map("path" -> dstRoot, "sink.id" -> "q4"))
    sink.addBatch(0, Seq((1L, "a")).toDF("k", "v"))
    val dst = new TableStore(spark, dstRoot)
    val ledger = new org.apache.hadoop.fs.Path(dstRoot, "_stream_sink/q4")
    val fs = ledger.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def plant(name: String): Unit = fs.create(
      new org.apache.hadoop.fs.Path(ledger, name), false).close()
    // crash AFTER epoch 1's commit (fingerprinted), BEFORE `done`
    dst.commitAppend(Seq((2L, "b")).toDF("k", "v"),
      props = Map(graft.sources.GraftTableSink.EpochProp -> "q4:1"))
    plant("intent-1-0")
    sink.addBatch(1, Seq((2L, "b")).toDF("k", "v")) // replay
    assert(dst.currentVersion() == 1, "landed epoch must not re-apply")
    assert(dst.readSnapshot().count() == 2)
    // crash BEFORE epoch 2's commit landed, and a FOREIGN (maintenance)
    // commit fills the window: the replay must still APPLY the batch
    plant("intent-2-1")
    dst.compact(targetFiles = 1) // foreign commit, no fingerprint
    sink.addBatch(2, Seq((3L, "c")).toDF("k", "v"))
    assert(dst.readSnapshot().as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")),
      "foreign commit in the crash window must not swallow the epoch")
  }

  test("sink crash torture: both crash orders in BOTH modes — no duplicate, no loss") {
    for (mode <- Seq("append", "cdc")) {
      val dstRoot = java.nio.file.Files
        .createTempDirectory(s"graft_sink_t_$mode").toString
      val qid = s"tq_$mode"
      val params = Map("path" -> dstRoot, "sink.id" -> qid) ++
        (if (mode == "cdc")
          Map("sink.mode" -> "cdc", "sink.keys" -> "k", "sink.buckets" -> "4")
        else Map.empty)
      def batch(ks: Seq[Long]): org.apache.spark.sql.DataFrame =
        if (mode == "cdc")
          ks.map(k => (k, s"v$k", 1L, "INSERT")).toDF("k", "v", "seq", "op")
        else ks.map(k => (k, s"v$k")).toDF("k", "v")
      val sink = new graft.sources.GraftTableSink(params)
      sink.addBatch(0, batch(1L to 10L))
      val dst = new TableStore(spark, dstRoot)
      val ledger = new org.apache.hadoop.fs.Path(dstRoot, s"_stream_sink/$qid")
      val fs = ledger.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def plant(name: String): Unit = fs.create(
        new org.apache.hadoop.fs.Path(ledger, name), false).close()

      // crash order A: intent durable, the epoch's COMMIT never landed —
      // the replay must APPLY the batch (losing it would drop data)
      plant(s"intent-1-${dst.currentVersion()}")
      sink.addBatch(1, batch(Seq(11L)))
      assert(dst.readSnapshot().count() == 11, s"[$mode] lost the batch")
      assert(dst.readSnapshot().filter($"k" === 11L).count() == 1)

      // crash order B: the epoch's commit LANDED (fingerprinted), the done
      // marker did not — the replay must SKIP (re-applying would duplicate)
      val pre = dst.currentVersion()
      val props = Map(graft.sources.GraftTableSink.EpochProp -> s"$qid:2")
      if (mode == "cdc")
        graft.streaming.StreamingOps.applyCdcBatch(
          batch(Seq(12L)), dst, Seq("k"), 4, props = props)
      else dst.commitAppend(batch(Seq(12L)), props = props)
      plant(s"intent-2-$pre")
      val vAfterCommit = dst.currentVersion()
      sink.addBatch(2, batch(Seq(12L)))
      assert(dst.currentVersion() == vAfterCommit,
        s"[$mode] landed epoch re-applied")
      assert(dst.readSnapshot().filter($"k" === 12L).count() == 1,
        s"[$mode] duplicate or lost row for the landed epoch")
      assert(dst.readSnapshot().count() == 12)
    }
  }

  test("streaming source over a SHARDED table plans batches off the shard diff") {
    spark.conf.set("spark.graft.manifest.inlineThreshold", "4")
    spark.conf.set("spark.graft.manifest.filesPerShard", "4")
    try {
      val store = freshStore()
      store.commitSnapshot(
        (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v").repartition(10))
      assert(store.manifest(0).isSharded)
      val q = readTable(store).writeStream.format("memory")
        .queryName("shard_feed").start()
      try {
        q.processAllAvailable()
        assert(spark.table("shard_feed").count() == 100)
        // append onto the sharded table: only the new files stream
        store.commitAppend(
          (101L to 110L).map(i => (i, s"v$i")).toDF("k", "v").repartition(2))
        assert(store.manifest(1).isSharded)
        q.processAllAvailable()
        assert(spark.table("shard_feed").count() == 110)
        assert(spark.table("shard_feed").select("k").as[Long]
          .collect().toSet == (1L to 110L).toSet)
      } finally q.stop()
    } finally {
      spark.conf.unset("spark.graft.manifest.inlineThreshold")
      spark.conf.unset("spark.graft.manifest.filesPerShard")
    }
  }

  test("bootstrap-epoch crash window: intent with pre-version -1 is recognized on replay") {
    // the FIRST epoch of an empty table records `intent-0--1`; a crash
    // between its commit and the done marker must not double-apply
    val dstRoot = java.nio.file.Files.createTempDirectory("graft_sinkb").toString
    val dst = new TableStore(spark, dstRoot)
    dst.commitSnapshot(Seq((1L, "a")).toDF("k", "v"),
      props = Map(graft.sources.GraftTableSink.EpochProp -> "qb:0"))
    val ledger = new org.apache.hadoop.fs.Path(dstRoot, "_stream_sink/qb")
    val fs = ledger.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(ledger)
    fs.create(new org.apache.hadoop.fs.Path(ledger, "intent-0--1"), false).close()
    val sink = new graft.sources.GraftTableSink(
      Map("path" -> dstRoot, "sink.id" -> "qb"))
    sink.addBatch(0, Seq((1L, "a")).toDF("k", "v"))
    assert(dst.currentVersion() == 0, "bootstrap epoch double-applied")
    assert(dst.readSnapshot().count() == 1)
  }

  test("ledger prunes to a high-water marker instead of growing per epoch") {
    val dstRoot = java.nio.file.Files.createTempDirectory("graft_sinkp").toString
    val sink = new graft.sources.GraftTableSink(
      Map("path" -> dstRoot, "sink.id" -> "qp"))
    (0L to 3L).foreach(e => sink.addBatch(e, Seq((e, s"v$e")).toDF("k", "v")))
    val ledger = new org.apache.hadoop.fs.Path(dstRoot, "_stream_sink/qp")
    val fs = ledger.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(ledger).map(_.getPath.getName).toSet
    assert(names.contains("done-3"), names.toString)
    assert(!names.exists(n => n.startsWith("done-") && n != "done-3"),
      s"stale done markers survive: $names")
    assert(!names.exists(n => n.startsWith("intent-") && !n.startsWith("intent-3-")),
      s"stale intents survive: $names")
    // replay of a pruned (old) epoch is still a no-op via the high-water mark
    val dst = new TableStore(spark, dstRoot)
    val v = dst.currentVersion()
    sink.addBatch(1, Seq((1L, "v1")).toDF("k", "v"))
    assert(dst.currentVersion() == v, "pruned epoch replayed")
  }

  test("vacuum keeps manifests pinned by an unfinalized sink intent") {
    val root = java.nio.file.Files.createTempDirectory("graft_sinkv").toString
    val store = new TableStore(spark, root)
    store.commitSnapshot(Seq((1L, "a")).toDF("k", "v"))
    (2L to 4L).foreach(i => store.commitAppend(Seq((i, s"v$i")).toDF("k", "v")))
    // unfinalized intent pinned at pre-version 1: its replay scans manifests
    // > 1 for the commit fingerprint, so vacuum must not expire v2/v3 even
    // though keep_snapshots=1 would
    val ledger = new org.apache.hadoop.fs.Path(root, "_stream_sink/qv")
    val fs = ledger.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(ledger)
    fs.create(new org.apache.hadoop.fs.Path(ledger, "intent-7-1"), false).close()
    store.vacuum(keepSnapshots = 1)
    assert(store.existingVersions() == Seq(2L, 3L),
      "vacuum expired manifests a pending sink replay needs")
    // once the stream finalizes the epoch, the pin lifts
    fs.create(new org.apache.hadoop.fs.Path(ledger, "done-7"), false).close()
    store.vacuum(keepSnapshots = 1)
    assert(store.existingVersions() == Seq(3L))
    assert(store.readSnapshot().count() == 4)
  }

  test("vacuumNoncurrent racing a sink intent replay: evidence pinned, replay skips, no double-apply (VERDICT r6 #8)") {
    val root = java.nio.file.Files.createTempDirectory("graft_sinkvn").toString
    val store = new TableStore(spark, root)
    store.commitSnapshot(Seq((1L, "a")).toDF("k", "v"))
    // epoch 1's commit LANDED (fingerprinted) but the done marker did not —
    // the crash window an aggressive noncurrent expiry could erase
    store.commitAppend(Seq((2L, "b")).toDF("k", "v"),
      props = Map(graft.sources.GraftTableSink.EpochProp -> "qvn:1"))
    store.commitAppend(Seq((3L, "c")).toDF("k", "v"))
    val ledger = new org.apache.hadoop.fs.Path(root, "_stream_sink/qvn")
    val fs = ledger.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(ledger)
    fs.create(new org.apache.hadoop.fs.Path(ledger, "intent-1-0"), false).close()
    // noncurrentMs = 0: every superseded snapshot is expirable RIGHT NOW —
    // but the clamp must keep the manifests the pending replay scans
    // (everything newer than the intent's pre-version 0)
    store.vacuumNoncurrent(0L, nowMs = System.currentTimeMillis() + 60000)
    assert(store.existingVersions() == Seq(1L, 2L),
      s"expiry erased replay evidence: ${store.existingVersions()}")
    // the replay now runs against the post-vacuum store: it must find its
    // fingerprint and SKIP, not double-apply
    val sink = new graft.sources.GraftTableSink(
      Map("path" -> root, "sink.id" -> "qvn"))
    val vBefore = store.currentVersion()
    sink.addBatch(1, Seq((2L, "b")).toDF("k", "v"))
    assert(store.currentVersion() == vBefore, "landed epoch double-applied")
    assert(store.readSnapshot().filter($"k" === 2L).count() == 1)
    // finalized: the pin lifts and noncurrent expiry proceeds
    store.vacuumNoncurrent(0L, nowMs = System.currentTimeMillis() + 60000)
    assert(store.existingVersions() == Seq(2L))
    assert(store.readSnapshot().count() == 3)
  }

  test("graft-table sink in cdc mode merges change batches per epoch") {
    val dstRoot = java.nio.file.Files.createTempDirectory("graft_sink3").toString
    val sink = new graft.sources.GraftTableSink(Map(
      "path" -> dstRoot, "sink.mode" -> "cdc", "sink.keys" -> "k",
      "sink.buckets" -> "4", "sink.id" -> "q3"))
    sink.addBatch(0,
      (1L to 10L).map(i => (i, s"v$i", 1L, "INSERT")).toDF("k", "v", "seq", "op"))
    sink.addBatch(1, Seq((3L, "V3", 2L, "MODIFY"),
      (4L, null.asInstanceOf[String], 2L, "REMOVE")).toDF("k", "v", "seq", "op"))
    val dst = new TableStore(spark, dstRoot)
    val out = dst.readSnapshot().as[(Long, String)].collect().toMap
    assert(out.size == 9 && out(3L) == "V3" && !out.contains(4L))
  }

  test("hive-partitioned tables stream with recovered partition values (VERDICT r6 #3)") {
    val store = freshStore()
    // partition column in the MIDDLE of the schema: the reader appends
    // recovered values last, so declared order must be projected back
    val df = Seq((1L, "O", "a"), (2L, "F", "b"), (3L, "O", "c"))
      .toDF("k", "status", "v")
    store.commitSnapshot(df, Seq("status"))
    val q = readTable(store).writeStream.format("memory")
      .queryName("feed_hive").start()
    try {
      q.processAllAvailable()
      val got = spark.table("feed_hive").as[(Long, String, String)]
        .collect().sortBy(_._1)
      assert(got.toSeq == Seq((1L, "O", "a"), (2L, "F", "b"), (3L, "O", "c")))
      // appends keep flowing, including a NULL partition value
      store.commitAppend(Seq((4L, "P", "d"),
        (5L, null.asInstanceOf[String], "e")).toDF("k", "status", "v"))
      q.processAllAvailable()
      assert(spark.table("feed_hive").count() == 5)
      assert(spark.table("feed_hive").filter($"status" === "P")
        .select("k").as[Long].head() == 4L)
      assert(spark.table("feed_hive").filter($"status".isNull)
        .select("k").as[Long].head() == 5L)
    } finally q.stop()
  }

  test("partition values with hive-escaped and '+' glyphs match the batch read") {
    // URLDecoder would turn '+' into a space; Spark's own unescapePathName
    // must be used so stream and batch agree byte-for-byte
    val store = freshStore()
    val df = Seq((1L, "pt+br", "a"), (2L, "es 41%", "b")).toDF("k", "lang", "v")
    store.commitSnapshot(df, Seq("lang"))
    val batch = store.readSnapshot().as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq
    val q = readTable(store).writeStream.format("memory")
      .queryName("feed_plus").start()
    try {
      q.processAllAvailable()
      val got = spark.table("feed_plus").as[(Long, String, String)]
        .collect().sortBy(_._1).toSeq
      assert(got == batch, s"stream $got vs batch $batch")
      assert(got.map(_._2).toSet == Set("pt+br", "es 41%"))
    } finally q.stop()
  }

  test("partial offsets pin their diff base; offset json round-trips it") {
    import graft.sources.GraftOffset
    // three formats parse; base survives a json round-trip; legacy 2-part
    // offsets resolve to UnknownBase
    assert(GraftOffset.parse("7") == GraftOffset(7))
    assert(GraftOffset.parse("7:3") == GraftOffset(7, 3))
    assert(GraftOffset.parse("7:3").baseVersion == GraftOffset.UnknownBase)
    assert(GraftOffset.parse("7:3:5") == GraftOffset(7, 3, 5))
    assert(GraftOffset.parse(GraftOffset(7, 3, 5).json()) == GraftOffset(7, 3, 5))
    assert(GraftOffset(7, 3, 5).json() == "7:3:5")
    // ordering ignores the base (it is identity, not position)
    assert(GraftOffset(7, 3, 5).before(GraftOffset(7, 4, 6)))
    assert(!GraftOffset(7, 3, 5).before(GraftOffset(7, 3, 9)))
  }

  test("non-positive admission caps fail at stream construction, not by stalling") {
    val store = freshStore()
    store.commitSnapshot(Seq((1L, "a")).toDF("k", "v"))
    Seq("streaming.max-bytes-per-trigger" -> "0",
        "streaming.max-versions-per-trigger" -> "-1").foreach { case (k, v) =>
      val q = readTable(store, Map(k -> v)).writeStream.format("memory")
        .queryName(s"feed_badcap_${k.hashCode.abs}").start()
      try {
        val e = intercept[StreamingQueryException] { q.processAllAvailable() }
        def msg(t: Throwable): String =
          Option(t.getMessage).getOrElse("") +
            Option(t.getCause).map(msg).getOrElse("")
        assert(msg(e).contains("must be > 0"), msg(e))
      } finally q.stop()
    }
  }

  test("stream refuses a partition-layout change across streamed versions") {
    val store = freshStore()
    store.commitSnapshot(Seq((1L, "a", "x")).toDF("k", "p", "v")) // plain
    store.commitSnapshot(Seq((2L, "b", "y")).toDF("k", "p", "v"), Seq("p"))
    val q = readTable(store).writeStream.format("memory")
      .queryName("feed_mixlayout").start()
    try {
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      def msg(t: Throwable): String =
        Option(t.getMessage).getOrElse("") +
          Option(t.getCause).map(msg).getOrElse("")
      assert(msg(e).contains("changed the partition layout"), msg(e))
    } finally q.stop()
  }

  test("byte cap paces the genesis snapshot across triggers, exactly-once over a restart (VERDICT r6 #6)") {
    val store = freshStore()
    store.commitSnapshot(
      (1L to 400L).map(i => (i, s"v$i")).toDF("k", "v").repartition(8))
    val nFiles = store.manifest(0).nFiles
    assert(nFiles >= 8)
    // end-to-end: a tiny cap admits one file per micro-batch, full content
    val q = readTable(store, Map("streaming.max-bytes-per-trigger" -> "1"))
      .writeStream.format("memory").queryName("feed_bytes").start()
    try {
      q.processAllAvailable()
      assert(spark.table("feed_bytes").count() == 400)
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 2,
        s"genesis consumed in $batches batch(es) despite the byte cap")
    } finally q.stop()

    // planner-level exactly-once across a RESTART mid-genesis: a FRESH
    // stream instance continues from a partial offset — no gap, no overlap
    import graft.sources.{GraftFilePartition, GraftMicroBatchStream, GraftOffset}
    def mkStream() = new GraftMicroBatchStream(store.root,
      store.manifest(0).schema,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Map.of(
        "path", store.root, "streaming.max-bytes-per-trigger", "1")))
    def splits(st: GraftMicroBatchStream, a: GraftOffset, b: GraftOffset) =
      st.planInputPartitions(a, b).flatMap(
        _.asInstanceOf[GraftFilePartition].files.map(f =>
          (f.urlEncodedPath, f.start, f.length))).toSeq
    val s1 = mkStream()
    val o1 = s1.latestOffset(GraftOffset(-1), null).asInstanceOf[GraftOffset]
    assert(o1.filesConsumed > 0 && o1.filesConsumed < nFiles,
      s"first trigger should stop mid-genesis, got $o1")
    val first = splits(s1, GraftOffset(-1), o1)
    val s2 = mkStream() // the restart
    var cur = o1
    val rest = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
    var guard = 0
    while (cur.filesConsumed >= 0 && guard < nFiles + 5) {
      val nxt = s2.latestOffset(cur, null).asInstanceOf[GraftOffset]
      rest ++= splits(s2, cur, nxt)
      cur = nxt; guard += 1
    }
    val whole = splits(mkStream(), GraftOffset(-1), GraftOffset(0))
    val stitched = first ++ rest
    assert(stitched.sorted == whole.sorted,
      s"restart stitched ${stitched.size} splits vs ${whole.size} in one batch")
  }

  test("stream schema NULL-pads files written before a schema evolution") {
    val store = freshStore()
    store.commitSnapshot((1L to 5L).map(i => (i, s"v$i")).toDF("k", "v"))
    store.commitSchemaOnly(org.apache.spark.sql.types.StructType(
      store.manifest(store.currentVersion()).schema.fields :+
        org.apache.spark.sql.types.StructField("extra",
          org.apache.spark.sql.types.LongType)))
    store.commitAppend((6L to 8L).map(i => (i, s"v$i", i * 10)).toDF("k", "v", "extra"))
    val q = readTable(store).writeStream.format("memory")
      .queryName("feed_evolve").start()
    try {
      q.processAllAvailable()
      val got = spark.table("feed_evolve").as[(Long, String, Option[Long])]
        .collect().sortBy(_._1)
      assert(got.toSeq == (1L to 5L).map(i => (i, s"v$i", None)) ++
        (6L to 8L).map(i => (i, s"v$i", Some(i * 10))))
    } finally q.stop()
  }
}
