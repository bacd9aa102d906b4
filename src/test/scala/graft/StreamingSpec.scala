package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingOps

/** Structured Streaming twins (SURVEY §5.2.4): MemoryStream-driven window
  * results, watermark late-data drops, stateful running aggregates, and the
  * foreachBatch CDC loop. */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  case class Ev(ts: Timestamp, event_type: String, user_id: Long, value: Double)

  test("tumbling window aggregates by event-time hour") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingOps.tumbling(in.toDF())
      .writeStream.format("memory").queryName("tumb_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(
        Ev(ts("2024-01-01 10:05:00"), "click", 1, 1.0),
        Ev(ts("2024-01-01 10:55:00"), "click", 2, 2.0),
        Ev(ts("2024-01-01 11:05:00"), "click", 1, 4.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT window_start, n, sum_value FROM tumb_out ORDER BY window_start")
        .as[(Timestamp, Long, Double)].collect()
      assert(rows.toSeq == Seq(
        (ts("2024-01-01 10:00:00"), 2L, 3.0),
        (ts("2024-01-01 11:00:00"), 1L, 4.0)))
    } finally q.stop()
  }

  test("watermark drops events later than 10 minutes behind the max ts") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingOps.tumbling(in.toDF())
      .writeStream.format("memory").queryName("late_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(Ev(ts("2024-01-01 10:05:00"), "click", 1, 1.0))
      q.processAllAvailable()
      // advance watermark far past hour 10
      in.addData(Ev(ts("2024-01-01 13:00:00"), "click", 1, 1.0))
      q.processAllAvailable()
      // late arrival for hour 10: behind watermark -> dropped
      in.addData(Ev(ts("2024-01-01 10:10:00"), "click", 9, 100.0))
      q.processAllAvailable()
      // close remaining windows so everything emittable is emitted
      in.addData(Ev(ts("2024-01-01 23:00:00"), "click", 1, 1.0))
      q.processAllAvailable()
      val hour10 = spark.sql(
        "SELECT n, sum_value FROM late_out WHERE window_start = TIMESTAMP '2024-01-01 10:00:00'")
        .as[(Long, Double)].collect()
      assert(hour10.toSeq == Seq((1L, 1.0))) // the late row never lands
    } finally q.stop()
  }

  test("session windows split on 30-minute gaps per user") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingOps.session(in.toDF())
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(
        Ev(ts("2024-01-01 10:00:00"), "click", 1, 1.0),
        Ev(ts("2024-01-01 10:10:00"), "click", 1, 2.0),
        Ev(ts("2024-01-01 11:30:00"), "click", 1, 3.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT session_start, session_end, n FROM sess_out ORDER BY session_start")
        .as[(Timestamp, Timestamp, Long)].collect()
      assert(rows.toSeq == Seq(
        (ts("2024-01-01 10:00:00"), ts("2024-01-01 10:40:00"), 2L),
        (ts("2024-01-01 11:30:00"), ts("2024-01-01 12:00:00"), 1L)))
    } finally q.stop()
  }

  test("stateful running aggregate accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamingOps.EventRow]
    val q = StreamingOps.statefulRunning(in.toDS())
      .writeStream.format("memory").queryName("run_out")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(StreamingOps.EventRow(1, 1, 10.0), StreamingOps.EventRow(1, 2, 5.0))
      q.processAllAvailable()
      in.addData(StreamingOps.EventRow(1, 3, 1.0))
      q.processAllAvailable()
      val last = spark.sql(
        "SELECT running_events, running_value FROM run_out WHERE running_events = 3")
        .as[(Long, Double)].collect()
      assert(last.toSeq == Seq((3L, 16.0)))
    } finally q.stop()
  }

  case class P(p_id: Long, p_user: Long, p_ts: Timestamp)
  case class C(c_id: Long, c_user: Long, c_ts: Timestamp)

  test("stream-stream interval join attributes clicks within 30 minutes") {
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[P]
    val cIn = MemoryStream[C]
    val q = StreamingOps.intervalJoin(pIn.toDF(), cIn.toDF())
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode(OutputMode.Append()).start()
    try {
      cIn.addData(
        C(100, 1, ts("2024-01-01 10:00:00")), // 20 min before -> joins
        C(101, 1, ts("2024-01-01 09:00:00")), // 80 min before -> outside
        C(102, 2, ts("2024-01-01 10:10:00"))) // other user -> no join
      pIn.addData(P(1, 1, ts("2024-01-01 10:20:00")))
      q.processAllAvailable()
      // advance both watermarks so joined rows are finalized
      pIn.addData(P(9, 9, ts("2024-01-01 13:00:00")))
      cIn.addData(C(199, 9, ts("2024-01-01 13:00:00")))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT p_id, c_id FROM ssj_out WHERE p_id = 1 ORDER BY c_id")
        .as[(Long, Long)].collect()
      assert(rows.toSeq == Seq((1L, 100L)))
    } finally q.stop()
  }

  test("foreachBatch CDC loop merges change batches into the table store") {
    implicit val sqlCtx = spark.sqlContext
    val store = new graft.store.TableStore(spark,
      Files.createTempDirectory("graft_stream_cdc").toString)
    store.commitSnapshot(Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v"))
    val in = MemoryStream[(Long, String, Double, Long, String)]
    val checkpoint = Files.createTempDirectory("graft_stream_ckpt").toString
    val changes = in.toDF().toDF("k", "s", "v", "seq", "op")
    // data must land BEFORE start: AvailableNow snapshots available offsets
    // at query start, so later addData may be silently skipped (flaky)
    in.addData((1L, "a2", 11.0, 1L, "MODIFY"), (2L, null, 0.0, 2L, "REMOVE"),
      (3L, "c", 30.0, 3L, "INSERT"))
    val q = StreamingOps.cdcApplyStream(changes, store, Seq("k"), checkpoint)
    try {
      q.awaitTermination() // AvailableNow: terminates when drained
      val rows = store.readSnapshot().as[(Long, String, Double)].collect().toSet
      assert(rows == Set((1L, "a2", 11.0), (3L, "c", 30.0)))
      assert(store.currentVersion() == 1L)
    } finally q.stop()
  }

  test("schemaless dynamic CDC loop widens types and adds attributes mid-stream") {
    import graft.model.DdbAttr
    def writeLines(dir: java.nio.file.Path, name: String,
        df: org.apache.spark.sql.DataFrame): Unit = {
      val lines = df.select(DdbAttr.encodeLine(df.schema).as("json")).as[String].collect()
      Files.write(dir.resolve(name), lines.mkString("\n").getBytes("UTF-8"))
    }
    val store = new graft.store.TableStore(spark,
      Files.createTempDirectory("graft_dyn_store").toString)
    store.commitBucketed(
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("k", "s", "amount"),
      Seq("k"), numBuckets = 4)
    val changeDir = Files.createTempDirectory("graft_dyn_changes")
    val ckpt = Files.createTempDirectory("graft_dyn_ckpt").toString

    // batch 1: plain long-range update — stays long
    writeLines(changeDir, "cdc-000.json",
      Seq((1L, "a2", 11L, 1L, "MODIFY")).toDF("k", "s", "amount", "seq", "op"))
    val q1 = StreamingOps.cdcApplyStreamDynamic(
      spark, changeDir.toString, store, Seq("k"), ckpt, numBuckets = 4)
    try q1.awaitTermination() finally q1.stop()
    assert(store.manifest(store.currentVersion())
      .schema("amount").dataType == org.apache.spark.sql.types.LongType)

    // batch 2: the N outgrows long AND a brand-new attribute appears —
    // no schema was ever declared anywhere; the loop must widen on its own
    val big = BigDecimal("99999999999999999999")
    writeLines(changeDir, "cdc-001.json",
      Seq((2L, "b2", big, "web", 2L, "MODIFY"))
        .toDF("k", "s", "amount", "chan", "seq", "op")
        .select(col("k"), col("s"), col("amount").cast("decimal(38,0)").as("amount"),
          col("chan"), col("seq"), col("op")))
    val mBefore = store.manifest(store.currentVersion())
    val q2 = StreamingOps.cdcApplyStreamDynamic(
      spark, changeDir.toString, store, Seq("k"), ckpt, numBuckets = 4)
    try q2.awaitTermination() finally q2.stop()

    val m = store.manifest(store.currentVersion())
    assert(m.schema("amount").dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType],
      s"amount not widened: ${m.schema("amount").dataType}")
    assert(m.schema.fieldNames.contains("chan"))
    // widening stayed INCREMENTAL: untouched buckets' files inherited
    val touched = Seq(2L).toDF("k")
      .select(graft.store.TableStore.bucketExpr(Seq("k"), 4).as("b"))
      .as[Long].collect().toSet
    val untouched = mBefore.inlineFiles.filter(f =>
      !touched.contains(graft.store.TableStore.bucketOfFile(f).get))
    assert(untouched.nonEmpty)
    untouched.foreach(f => assert(m.inlineFiles.contains(f),
      s"mid-stream widening rewrote untouched file $f"))
    val rows = store.readSnapshot()
      .select(col("k"), col("s"), col("amount").cast("string"), col("chan"))
      .as[(Long, String, String, Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(rows(1L) == (("a2", "11", None)))
    assert(rows(2L) == (("b2", big.toString, Some("web"))))
    assert(rows(3L) == (("c", "30", None)))
  }

  test("maintenance policy keeps a long-running CDC feed bounded") {
    val store = new graft.store.TableStore(spark,
      Files.createTempDirectory("graft_cdc_maint").toString)
    val keys = Seq("k")
    val policy = StreamingOps.CdcMaintenance(
      everyNCommits = 4, maxFilesPerBucket = 2, keepSnapshots = 2)
    store.commitBucketed((1L to 40L).map(i => (i, s"v$i")).toDF("k", "v"),
      keys, numBuckets = 4)
    // 14 micro-batches, each MODIFYing a rotating pair of keys — every
    // bucket keeps accreting files; the policy must keep counts bounded
    var expected = (1L to 40L).map(i => (i, s"v$i")).toDF("k", "v")
    for (i <- 1 to 14) {
      val batch = Seq(
        (i.toLong % 40 + 1, s"u$i", i.toLong, "MODIFY"),
        ((i.toLong * 7) % 40 + 1, s"w$i", i.toLong, "MODIFY"))
        .toDF("k", "v", "seq", "op")
      StreamingOps.applyCdcBatch(batch, store, keys, numBuckets = 4,
        maintenance = Some(policy))
      expected = graft.etl.CdcApply(expected, batch, keys)
    }
    val m = store.manifest(store.currentVersion())
    val perBucket = m.inlineFiles.groupBy(f =>
      graft.store.TableStore.bucketOfFile(f).get).values.map(_.size)
    // between maintenance points at most everyNCommits batches add one file
    // per touched bucket on top of the compacted floor
    val bound = policy.maxFilesPerBucket + policy.everyNCommits
    assert(perBucket.forall(_ <= bound),
      s"unbounded bucket growth: ${perBucket.toSeq.sorted.reverse}")
    // snapshot expiry kept manifests bounded too
    assert(store.existingVersions().size <= policy.keepSnapshots + policy.everyNCommits,
      s"manifests not expiring: ${store.existingVersions()}")
    // disk holds only what surviving manifests reference (file-level sweep)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val onDisk = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(store.root, "data"), true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    val referenced = store.existingVersions()
      .flatMap(v => store.manifest(v).inlineFiles).toSet
    assert(onDisk <= referenced.size,
      s"dead files on disk: $onDisk vs ${referenced.size} referenced")
    // and the data is still exactly the LWW-merged expectation
    assert(store.readSnapshot().count() == expected.count())
    assert(store.readSnapshot().exceptAll(expected).count() == 0)
  }

  test("secondary indexes ride the maintenance cadence: a streaming table's GSI converges without a manual refresh") {
    val store = new graft.store.TableStore(spark,
      Files.createTempDirectory("graft_cdc_gsi").toString)
    val keys = Seq("k")
    // aggressive expiry: keepSnapshots=1 would expire the indexed base
    // snapshot mid-loop without the pin tag refresh moves forward
    val policy = StreamingOps.CdcMaintenance(
      everyNCommits = 3, maxFilesPerBucket = 2, keepSnapshots = 1)
    store.commitBucketed(
      (1L to 60L).map(i => (i, s"c${i % 7}", i * 2L)).toDF("k", "cust", "n"),
      keys, numBuckets = 4)
    graft.store.SecondaryIndex.create(store, "by_cust", Seq("cust"),
      numBuckets = 2)
    assert(store.listRefs().exists(_.name.startsWith("idx-pin-by_cust")),
      "create must pin the indexed base snapshot")
    for (i <- 1 to 10) {
      val batch = Seq(
        (i.toLong % 60 + 1, s"c${(i + 3) % 7}", i.toLong, i.toLong, "MODIFY"),
        (200L + i, s"c${i % 7}", 0L, i.toLong, "INSERT"))
        .toDF("k", "cust", "n", "seq", "op")
      StreamingOps.applyCdcBatch(batch, store, keys, numBuckets = 4,
        maintenance = Some(policy))
    }
    // final pass so the assertion isn't cadence-phase-dependent
    StreamingOps.maintain(store, policy)
    // the index reflects the CURRENT base snapshot — no manual CALL ever ran
    val st = graft.store.SecondaryIndex.status(store)
    assert(st.size == 1 && st.head._3 == st.head._4,
      s"index stale after the maintenance loop: $st")
    // content parity with a from-scratch projection of the base
    val got = graft.store.SecondaryIndex
      .lookup(store, "by_cust", col("cust") === "c3", Seq("k", "cust"))
      .collect().map(_.mkString("|")).sorted.toSeq
    val want = store.readSnapshot().filter(col("cust") === "c3")
      .select("k", "cust").collect().map(_.mkString("|")).sorted.toSeq
    assert(got == want, "index content diverged from the base")
    // expiry DID run (keepSnapshots=1) yet the pinned base survived — the
    // pin is what kept the changelog replayable across the whole loop
    assert(store.existingVersions().size < 10,
      s"expiry never ran: ${store.existingVersions()}")
  }

  test("merge-on-read CDC loop matches the COW loop with O(changed) writes") {
    def mkStore() = new graft.store.TableStore(spark,
      Files.createTempDirectory("graft_cdc_mor").toString)
    val keys = Seq("k")
    val seed = (1L to 200L).map(i => (i, s"v$i", i * 10L)).toDF("k", "v", "n")
    val cow = mkStore(); cow.commitBucketed(seed, keys, numBuckets = 8)
    val mor = mkStore(); mor.commitBucketed(seed, keys, numBuckets = 8)
    val files0 = mor.manifest(mor.currentVersion()).inlineFiles.toSet
    var morBytes = 0L
    for (i <- 1 to 5) {
      // same-key multi-update in one batch (seq order must win), deletes,
      // inserts of fresh keys
      val batch = Seq(
        (i.toLong * 3 % 200 + 1, s"a$i", 1L, 1L, "MODIFY"),
        (i.toLong * 3 % 200 + 1, s"b$i", 2L, 2L, "MODIFY"), // higher seq wins
        (i.toLong * 7 % 200 + 1, null.asInstanceOf[String], 0L, 3L, "REMOVE"),
        (1000L + i, s"new$i", -1L, 4L, "INSERT"))
        .toDF("k", "v", "n", "seq", "op")
        .select(col("k"), col("v"), (col("n") * 100).as("n"), col("seq"), col("op"))
      StreamingOps.applyCdcBatch(batch, cow, keys, numBuckets = 8)
      StreamingOps.applyCdcBatchMor(batch, mor, keys, numBuckets = 8)
      val mm = mor.manifest(mor.currentVersion())
      morBytes += (mm.totalBytes - mor.manifest(mm.parent).totalBytes).max(0L) +
        mm.dvRefs.map(_.bytes).sum
    }
    // content parity, both loops, after 5 batches
    val a = cow.readSnapshot().orderBy("k").collect().map(_.toSeq).toSeq
    val b = mor.readSnapshot().orderBy("k").collect().map(_.toSeq).toSeq
    assert(a == b, "MOR loop diverged from the COW loop")
    // the MOR base never rewrote a pre-existing file
    val mFinal = mor.manifest(mor.currentVersion())
    assert(files0.subsetOf(mFinal.inlineFiles.toSet),
      "MOR loop must inherit every seed file")
    assert(mFinal.hasDvs, "MOR loop should carry delete vectors")
    // idempotence: re-applying the last batch leaves content unchanged
    val last = Seq((1005L, "new5", -100L, 4L, "INSERT"),
      (5L * 3 % 200 + 1, s"a5", 100L, 1L, "MODIFY"),
      (5L * 3 % 200 + 1, s"b5", 200L, 2L, "MODIFY"),
      (5L * 7 % 200 + 1, null.asInstanceOf[String], 0L, 3L, "REMOVE"))
      .toDF("k", "v", "n", "seq", "op")
    StreamingOps.applyCdcBatchMor(last, mor, keys, numBuckets = 8)
    val b2 = mor.readSnapshot().orderBy("k").collect().map(_.toSeq).toSeq
    assert(b2 == b, "re-applied batch must be content-neutral")
  }

  test("MOR CDC maintenance purges stacked delete vectors on cadence") {
    val store = new graft.store.TableStore(spark,
      Files.createTempDirectory("graft_cdc_morm").toString)
    val keys = Seq("k")
    val policy = StreamingOps.CdcMaintenance(everyNCommits = 4,
      maxFilesPerBucket = 4, keepSnapshots = 2, maxDvFiles = 2)
    store.commitBucketed((1L to 100L).map(i => (i, s"v$i")).toDF("k", "v"),
      keys, numBuckets = 4)
    var expected = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
    for (i <- 1 to 12) {
      val batch = Seq((i.toLong % 100 + 1, s"u$i", i.toLong, "MODIFY"))
        .toDF("k", "v", "seq", "op")
      StreamingOps.applyCdcBatchMor(batch, store, keys, numBuckets = 4,
        maintenance = Some(policy))
      expected = graft.etl.CdcApply(expected, batch, keys)
    }
    val m = store.manifest(store.currentVersion())
    assert(m.dvRefs.size <= policy.maxDvFiles + policy.everyNCommits,
      s"DVs not purging: ${m.dvRefs.size} files")
    assert(store.readSnapshot().exceptAll(expected).count() == 0)
    assert(store.readSnapshot().count() == expected.count())
  }

  test("MOR CDC loop falls back to COW for schema evolution") {
    val store = new graft.store.TableStore(spark,
      Files.createTempDirectory("graft_cdc_morf").toString)
    store.commitBucketed((1L to 20L).map(i => (i, s"v$i")).toDF("k", "v"),
      Seq("k"), numBuckets = 2)
    // batch carries a NEW column: must route through the COW loop and widen
    val batch = Seq((1L, "u1", "web", 1L, "MODIFY"))
      .toDF("k", "v", "channel", "seq", "op")
    StreamingOps.applyCdcBatchMor(batch, store, Seq("k"), numBuckets = 2)
    val m = store.manifest(store.currentVersion())
    assert(m.schema.fieldNames.contains("channel"), "schema must widen")
    assert(!m.hasDvs, "evolution batch must take the COW path")
    val row = store.readSnapshot().filter(col("k") === 1L).head()
    assert(row.getAs[String]("channel") == "web")
    assert(store.readSnapshot().filter(col("channel").isNull).count() == 19L)
  }

  test("end-to-end continuous pipeline: export files land -> decode -> incremental CDC apply") {
    // the integration's actual loop (reference src:211-215; README.md:159-166):
    // initial export batch-loads the table, then CDC files stream in and are
    // LWW-merged with partition-targeted commits.
    import org.apache.spark.sql.types._
    import graft.model.DdbAttr
    import graft.sources.DdbExportReader

    def writeLines(dir: java.nio.file.Path, name: String,
        df: org.apache.spark.sql.DataFrame): Unit = {
      val lines = df.select(DdbAttr.encodeLine(df.schema).as("json")).as[String].collect()
      Files.write(dir.resolve(name), lines.mkString("\n").getBytes("UTF-8"))
    }

    // 1. initial full export → decode → bucketed snapshot load
    val baseDf = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "s", "v")
    val exportDir = Files.createTempDirectory("graft_e2e_export")
    writeLines(exportDir, "export-000.json", baseDf)
    val store = new graft.store.TableStore(spark,
      Files.createTempDirectory("graft_e2e_store").toString)
    store.commitBucketed(
      DdbExportReader.read(spark, exportDir.toString, Some(baseDf.schema), Seq("k")),
      Seq("k"), numBuckets = 4)

    // 2. CDC files land; seq/op ride as ordinary N/S attributes of each item
    val changeSchema = StructType(Seq(
      StructField("k", LongType), StructField("s", StringType),
      StructField("v", DoubleType), StructField("seq", LongType),
      StructField("op", StringType)))
    val changeDir = Files.createTempDirectory("graft_e2e_changes")
    val ckpt = Files.createTempDirectory("graft_e2e_ckpt").toString
    val batch1 = Seq(
      (1L, "a2", 11.0, 1L, "MODIFY"),
      (2L, null.asInstanceOf[String], 0.0, 2L, "REMOVE"),
      (9L, "new", 90.0, 3L, "INSERT")).toDF("k", "s", "v", "seq", "op")
    writeLines(changeDir, "cdc-000.json", batch1)
    val q1 = StreamingOps.cdcApplyStream(
      DdbExportReader.readStream(spark, changeDir.toString, changeSchema, Seq("k")),
      store, Seq("k"), ckpt, numBuckets = 4)
    try q1.awaitTermination() finally q1.stop()
    val expected1 = graft.etl.CdcApply(baseDf, batch1, Seq("k"))
    assert(store.readSnapshot().count() == expected1.count())
    assert(store.readSnapshot().exceptAll(expected1).count() == 0)

    // 3. more files land; a restarted AvailableNow run consumes ONLY the new
    // file (checkpointed offsets) and commits partition-targeted
    val batch2 = Seq((3L, "c2", 31.0, 4L, "MODIFY")).toDF("k", "s", "v", "seq", "op")
    writeLines(changeDir, "cdc-001.json", batch2)
    val vBefore = store.currentVersion()
    val filesBefore = store.manifest(vBefore).inlineFiles.toSet
    val q2 = StreamingOps.cdcApplyStream(
      DdbExportReader.readStream(spark, changeDir.toString, changeSchema, Seq("k")),
      store, Seq("k"), ckpt, numBuckets = 4)
    try q2.awaitTermination() finally q2.stop()
    val expected2 = graft.etl.CdcApply(expected1, batch2, Seq("k"))
    assert(store.currentVersion() == vBefore + 1, "restart re-applied or skipped batches")
    assert(store.readSnapshot().count() == expected2.count())
    assert(store.readSnapshot().exceptAll(expected2).count() == 0)
    // the incremental commit reused untouched buckets' files from the prior manifest
    assert(store.manifest(store.currentVersion()).inlineFiles.exists(filesBefore.contains),
      "no file reuse across the CDC commit")
  }

  test("auto CDC routing: scattered batch -> eq, local batch -> mor, drift -> cow") {
    def mkStore() = new graft.store.TableStore(spark,
      Files.createTempDirectory("graft_cdc_auto").toString)
    val keys = Seq("k")
    val seed = (1L to 2000L).map(i => (i, s"v$i")).toDF("k", "v")
    val auto = mkStore(); auto.commitBucketed(seed, keys, numBuckets = 16)
    val cow = mkStore(); cow.commitBucketed(seed, keys, numBuckets = 16)
    def route(s: graft.store.TableStore) =
      s.manifest(s.currentVersion()).props.get("graft.cdc.route")
    // SCATTERED batch: keys hash into most buckets -> the router must pick
    // the zero-base-read equality path
    val scattered = (0L until 64L).map(i => (i * 31L % 2000L + 1, s"s$i", 1L, "MODIFY"))
      .toDF("k", "v", "seq", "op")
    StreamingOps.applyCdcBatchAuto(scattered, auto, keys, numBuckets = 16)
    StreamingOps.applyCdcBatch(scattered, cow, keys, numBuckets = 16)
    assert(route(auto).contains("eq"), s"scattered batch routed ${route(auto)}")
    // BUCKET-LOCAL batch: every key hashes into few buckets -> positional
    // MOR (cheap candidate scan, cheaper read tax)
    val oneBucket = (1L to 2000L).toDF("k")
      .filter(graft.store.TableStore.bucketExpr(keys, 16) === 0L)
      .as[Long].take(5).toSeq
    val local = oneBucket.map(k => (k, s"l$k", 2L, "MODIFY"))
      .toDF("k", "v", "seq", "op")
    StreamingOps.applyCdcBatchAuto(local, auto, keys, numBuckets = 16)
    StreamingOps.applyCdcBatch(local, cow, keys, numBuckets = 16)
    assert(route(auto).contains("mor"), s"local batch routed ${route(auto)}")
    // SCHEMA DRIFT: a new column must fall back to the COW evolution loop
    val evolved = Seq((1L, "e1", 99L, 3L, "MODIFY"))
      .toDF("k", "v", "extra", "seq", "op")
    StreamingOps.applyCdcBatchAuto(evolved, auto, keys, numBuckets = 16)
    StreamingOps.applyCdcBatch(evolved, cow, keys, numBuckets = 16)
    assert(route(auto).contains("cow"), s"evolving batch routed ${route(auto)}")
    // content parity with the pure-COW loop over the mixed routed sequence
    val a = auto.readSnapshot().select("k", "v", "extra")
      .as[(Long, String, Option[Long])].collect().toSet
    val c = cow.readSnapshot().select("k", "v", "extra")
      .as[(Long, String, Option[Long])].collect().toSet
    assert(a == c, "routed loop diverged from the COW loop")
  }
}
