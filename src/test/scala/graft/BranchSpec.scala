package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.GraftCatalog
import graft.store.TableStore

/** Writable branches over the refs layer (VERDICT r7 #7): fork as a
  * metadata copy, commit in isolation, publish via fast-forward — the
  * write-audit-publish workflow on the zero-ETL target (S3 Tables is
  * Iceberg underneath, reference README.md:12; Iceberg branch semantics).
  * Vacuum must treat branch-referenced files as live, and maintenance that
  * deletes shared state is refused on a branch view. */
class BranchSpec extends SparkSuite {
  import spark.implicits._

  private def freshStore() =
    new TableStore(spark, Files.createTempDirectory("graft_branch").toString)

  test("branch commits are invisible on main until fast-forward") {
    val store = freshStore()
    store.commitSnapshot(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val mainV = store.currentVersion()
    val ref = store.createBranch("audit")
    assert(ref.forkVersion == mainV)

    val br = store.forBranch("audit")
    assert(br.currentVersion() == mainV)
    br.commitAppend(Seq((3L, "c"), (4L, "d")).toDF("k", "v"))

    // staged on the branch, invisible on main
    assert(br.readSnapshot().count() == 4)
    assert(store.readSnapshot().count() == 2)
    assert(store.currentVersion() == mainV)
    assert(store.listBranches().map(_.name) == Seq("audit"))

    // publish: pure metadata, main absorbs the branch commit verbatim
    val head = store.fastForward("audit")
    assert(head == mainV + 1)
    assert(store.currentVersion() == head)
    assert(store.readSnapshot().count() == 4)
    // every pre-existing data file inherited byte-identical (same paths)
    val mainFiles = store.manifest(head).inlineFiles.toSet
    assert(br.manifest(head).inlineFiles.toSet == mainFiles)
    // fork point advanced: the branch stays fast-forwardable
    assert(store.branchMeta("audit").forkVersion == head)
  }

  test("fast-forward refuses diverged histories") {
    val store = freshStore()
    store.commitSnapshot(Seq((1L, "a")).toDF("k", "v"))
    store.createBranch("wip")
    store.forBranch("wip").commitAppend(Seq((2L, "b")).toDF("k", "v"))
    // main moves on independently -> divergence
    store.commitAppend(Seq((9L, "z")).toDF("k", "v"))
    val e = intercept[IllegalArgumentException](store.fastForward("wip"))
    assert(e.getMessage.contains("not a fast-forward"))
    // the refused publish left main untouched
    assert(store.readSnapshot().as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (9L, "z")))
  }

  test("vacuum keeps branch-referenced files; branch view refuses vacuum") {
    val store = freshStore()
    store.commitSnapshot(Seq((1L, "a")).toDF("k", "v"))
    store.createBranch("keepme")
    val br = store.forBranch("keepme")
    br.commitAppend(Seq((2L, "branch-only")).toDF("k", "v"))
    // advance main twice so the fork-point snapshot falls out of the keep
    // window, then vacuum: branch data (and the files its fork inherits)
    // must survive because branch manifests pin them
    store.commitAppend(Seq((3L, "m1")).toDF("k", "v"))
    store.commitAppend(Seq((4L, "m2")).toDF("k", "v"))
    store.vacuum(keepSnapshots = 1)
    assert(br.readSnapshot().as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "branch-only")))
    val e = intercept[IllegalArgumentException](br.vacuum(keepSnapshots = 1))
    assert(e.getMessage.contains("main table store"))
    // dropping the branch releases the pin: the next vacuum reclaims the
    // branch-only file, main unaffected
    store.dropBranch("keepme")
    store.vacuum(keepSnapshots = 1)
    assert(!store.branchExists("keepme"))
    assert(store.readSnapshot().count() == 3)
  }

  test("branches on the sharded manifest tier: fork, commit, publish, vacuum") {
    spark.conf.set("spark.graft.manifest.inlineThreshold", "8")
    try {
      val store = freshStore()
      store.commitBucketed(
        (1L to 5000L).map(i => (i, s"v$i")).toDF("k", "v"),
        keys = Seq("k"), numBuckets = 16)
      assert(store.manifest(store.currentVersion()).isSharded)
      store.createBranch("shb")
      val br = store.forBranch("shb")
      val before = TableStore.driverMaterializations.get()
      br.commitAppend(Seq((9001L, "staged")).toDF("k", "v"))
      br.upsertEq(Seq((5L, "eq-upd", "U")).toDF("k", "v", "op"))
      assert(TableStore.driverMaterializations.get() == before,
        "branch commits on the sharded tier materialized a driver file list")
      // isolation both ways, then a pure-metadata publish of SHARDED
      // manifests (shard refs are absolute paths into main's shard tree)
      assert(store.readSnapshot().count() == 5000)
      store.fastForward("shb")
      val out = store.readSnapshot().as[(Long, String)].collect().toMap
      assert(out(9001L) == "staged" && out(5L) == "eq-upd" && out.size == 5001)
      // vacuum with branch survivors on the sharded sweep path
      store.commitAppend(Seq((9002L, "post")).toDF("k", "v"))
      store.vacuum(keepSnapshots = 1)
      assert(store.forBranch("shb").readSnapshot().count() == 5001)
      assert(store.readSnapshot().count() == 5002)
    } finally spark.conf.unset("spark.graft.manifest.inlineThreshold")
  }

  test("tag and branch names share a namespace; collisions are refused") {
    val store = freshStore()
    store.commitSnapshot(Seq((1L, "a")).toDF("k", "v"))
    store.createTag("pinned")
    store.createBranch("feature")
    assert(intercept[IllegalArgumentException](store.createBranch("pinned"))
      .getMessage.contains("tag"))
    assert(intercept[IllegalArgumentException](store.createTag("feature"))
      .getMessage.contains("branch"))
    assert(intercept[IllegalStateException](store.createBranch("feature"))
      .getMessage.contains("already exists"))
  }

  test("SQL write-audit-publish: wap conf, branch read, fast_forward") {
    val warehouse = Files.createTempDirectory("graft_wap_wh").toString
    spark.conf.set("spark.sql.catalog.wap_cat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.wap_cat.warehouse", warehouse)
    val store = new TableStore(spark, s"$warehouse/analytics/events")
    store.commitSnapshot(Seq((1L, "base"), (2L, "base")).toDF("k", "src"))

    spark.sql("CALL wap_cat.system.create_branch('analytics.events', 'stage')")
    spark.conf.set("spark.graft.wap.branch", "stage")
    try {
      spark.sql(
        "INSERT INTO wap_cat.analytics.events VALUES (3, 'staged'), (4, 'staged')")
      spark.catalog.refreshTable("wap_cat.analytics.events")
      // inside the WAP session the table reads as the branch
      assert(spark.sql("SELECT COUNT(*) FROM wap_cat.analytics.events")
        .head().getLong(0) == 4)
    } finally spark.conf.unset("spark.graft.wap.branch")
    spark.catalog.refreshTable("wap_cat.analytics.events")

    // outside the WAP session: main unchanged, branch readable by name
    assert(spark.sql("SELECT COUNT(*) FROM wap_cat.analytics.events")
      .head().getLong(0) == 2)
    assert(spark.sql(
      "SELECT COUNT(*) FROM wap_cat.analytics.events VERSION AS OF 'stage'")
      .head().getLong(0) == 4)
    // $refs lists the branch with its head
    val refs = spark.sql(
      "SELECT name, kind, version FROM wap_cat.analytics.`events$refs`")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(refs.contains(("stage", "BRANCH", 1L)), refs.toSeq.toString)

    spark.sql("CALL wap_cat.system.fast_forward('analytics.events', 'stage')")
    spark.catalog.refreshTable("wap_cat.analytics.events")
    assert(spark.sql("SELECT COUNT(*) FROM wap_cat.analytics.events")
      .head().getLong(0) == 4)
  }

  test("WAP session serves explicit pre-fork VERSION AS OF (snapshot id + tag)") {
    val warehouse = Files.createTempDirectory("graft_wapv_wh").toString
    spark.conf.set("spark.sql.catalog.wapv_cat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.wapv_cat.warehouse", warehouse)
    val store = new TableStore(spark, s"$warehouse/analytics/tt")
    store.commitSnapshot(Seq((1L, "v0")).toDF("k", "v"))
    store.createTag("audited")
    store.commitAppend(Seq((2L, "v1")).toDF("k", "v"))
    store.createBranch("stage")
    spark.conf.set("spark.graft.wap.branch", "stage")
    try {
      spark.sql("INSERT INTO wapv_cat.analytics.tt VALUES (3, 'staged')")
      // the branch sequence only holds the fork copy + branch commits —
      // an explicit PRE-FORK version must still resolve (ADVICE r8 medium:
      // this failed with a missing-manifest error before)
      assert(spark.sql(
        "SELECT COUNT(*) FROM wapv_cat.analytics.tt VERSION AS OF 0")
        .head().getLong(0) == 1)
      assert(spark.sql(
        "SELECT COUNT(*) FROM wapv_cat.analytics.tt VERSION AS OF 'audited'")
        .head().getLong(0) == 1)
      // post-fork branch-only versions still serve from the branch
      val bh = store.forBranch("stage").currentVersion()
      assert(spark.sql(
        s"SELECT COUNT(*) FROM wapv_cat.analytics.tt VERSION AS OF $bh")
        .head().getLong(0) == 3)
    } finally spark.conf.unset("spark.graft.wap.branch")
  }

  // ------------------------------------------------------------- rebase

  private def bucketedBase(store: TableStore, n: Int): Unit =
    store.commitBucketed(
      spark.range(n).select(col("id").as("k"),
        concat(lit("v"), col("id")).as("v")),
      keys = Seq("k"), numBuckets = 4)

  test("rebase then publish after main advances (continuous-feed WAP loop)") {
    val store = freshStore()
    bucketedBase(store, 100)
    store.createBranch("audit")
    val br = store.forBranch("audit")
    // staged on the branch: one update, one delete
    br.upsertEq(Seq((5L, "staged-5", "U")).toDF("k", "v", "op"))
    br.deleteEq(Seq(6L).toDF("k"))
    // main advances under the audit — the continuous-CDC reality: a
    // concurrent feed re-inserts k=6 and adds k=200
    store.upsertEq(Seq((6L, "main-6", "U"), (200L, "main-200", "I"))
      .toDF("k", "v", "op"))
    // the publish rightly refuses diverged histories...
    assert(intercept[IllegalArgumentException](store.fastForward("audit"))
      .getMessage.contains("not a fast-forward"))
    // ...and rebase unblocks it: replay the branch deltas on the new head
    val newHead = store.rebaseBranch("audit")
    assert(store.branchMeta("audit").forkVersion == store.currentVersion())
    // branch readable (and auditable) on the new base BEFORE publishing
    val staged = br.readSnapshot().as[(Long, String)].collect().toMap
    assert(staged(5L) == "staged-5")
    // rebase semantics: the branch's delete happens-AFTER main's
    // concurrent re-insert, so k=6 stays deleted (the LWW outcome)
    assert(!staged.contains(6L))
    assert(staged(200L) == "main-200") // main's concurrent insert visible
    val pub = store.fastForward("audit")
    assert(pub == newHead)
    val out = store.readSnapshot().as[(Long, String)].collect().toMap
    assert(out == staged)
    assert(out.size == 100) // 100 base - 1 delete + 1 main insert
    assert(out(0L) == "v0" && out(99L) == "v99")
  }

  test("rebase with no branch commits re-forks at main's head") {
    val store = freshStore()
    bucketedBase(store, 10)
    store.createBranch("idle")
    store.upsertEq(Seq((500L, "late", "I")).toDF("k", "v", "op"))
    val head = store.rebaseBranch("idle")
    assert(head == store.currentVersion())
    assert(store.branchMeta("idle").forkVersion == head)
    assert(store.forBranch("idle").readSnapshot().count() == 11)
    assert(store.fastForward("idle") == head) // idempotent no-op publish
  }

  test("rebase refuses true conflicts; branch intact after refusal") {
    // positional deletes against a file main has since rewritten
    val store = freshStore()
    bucketedBase(store, 100)
    store.createBranch("wip")
    val br = store.forBranch("wip")
    br.deleteMor(col("k") === 5L)
    store.compact() // main rewrites every file the branch's DV addresses
    val e = intercept[IllegalArgumentException](store.rebaseBranch("wip"))
    assert(e.getMessage.contains("row conflict"), e.getMessage)
    // the refused rebase left the branch exactly as it was
    assert(br.readSnapshot().count() == 99)
    // bucket-layout divergence
    val store2 = freshStore()
    bucketedBase(store2, 100)
    store2.createBranch("wip2")
    store2.forBranch("wip2").commitAppend(Seq((500L, "x")).toDF("k", "v"))
    store2.rebucket(8)
    val e2 = intercept[IllegalArgumentException](store2.rebaseBranch("wip2"))
    assert(e2.getMessage.contains("bucket layout"), e2.getMessage)
  }

  test("branch compaction replays when main only appended") {
    val store = freshStore()
    bucketedBase(store, 200)
    store.createBranch("opt")
    val br = store.forBranch("opt")
    br.upsertEq(Seq((3L, "upd", "U")).toDF("k", "v", "op"))
    br.compact() // rewrite on the branch — fine while main keeps the files
    store.upsertEq(Seq((900L, "main", "I")).toDF("k", "v", "op"))
    store.rebaseBranch("opt")
    store.fastForward("opt")
    val out = store.readSnapshot().as[(Long, String)].collect().toMap
    assert(out(3L) == "upd" && out(900L) == "main" && out.size == 201)
  }

  test("changelog stays consistent across a rebased publish carrying eq commits") {
    val store = freshStore()
    bucketedBase(store, 50)
    val fork = store.currentVersion()
    store.createBranch("cdc")
    val br = store.forBranch("cdc")
    br.upsertEq(Seq((7L, "b7", "U"), (300L, "b300", "I")).toDF("k", "v", "op"))
    store.upsertEq(Seq((8L, "m8", "U")).toDF("k", "v", "op"))
    store.rebaseBranch("cdc")
    val head = store.fastForward("cdc")
    // net diff fork -> published head: both sides' changes, exactly once
    val log = store.readChangelog(fork, head)
      .select("_change_type", "k", "v").as[(String, Long, String)]
      .collect().toSet
    assert(log == Set(("UPDATE", 7L, "b7"), ("INSERT", 300L, "b300"),
      ("UPDATE", 8L, "m8")), s"changelog diverged: $log")
  }

  test("crash-interrupted rebase repairs on the next fast-forward") {
    val store = freshStore()
    bucketedBase(store, 20)
    store.createBranch("crash")
    val br = store.forBranch("crash")
    br.upsertEq(Seq((1L, "b1", "U")).toDF("k", "v", "op"))
    store.upsertEq(Seq((2L, "m2", "U")).toDF("k", "v", "op"))
    // simulate a crash BEFORE any replayed manifest landed: a pending
    // marker naming versions that don't exist must roll back harmlessly
    val pendingPath = new org.apache.hadoop.fs.Path(
      s"${store.root}/manifest/branches/crash/rebase-pending.json")
    val fs = pendingPath.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val out = fs.create(pendingPath, false)
    out.write("""{"new":[90,91],"drop":[],"toFork":99}""".getBytes("UTF-8"))
    out.close()
    // next rebase+publish repairs and completes the real flow
    store.rebaseBranch("crash")
    store.fastForward("crash")
    assert(!fs.exists(pendingPath))
    val outMap = store.readSnapshot().as[(Long, String)].collect().toMap
    assert(outMap(1L) == "b1" && outMap(2L) == "m2" && outMap.size == 20)
  }

  test("branch retention: aged branches expire, their exclusive files fall to vacuum") {
    val store = freshStore()
    bucketedBase(store, 100)
    val now = System.currentTimeMillis()
    // an old abandoned branch with unpublished staged data
    store.createBranch("abandoned", nowMs = now - 10_000_000L)
    val ab = store.forBranch("abandoned")
    ab.commitAppend(Seq((9001L, "staged-never-published")).toDF("k", "v"))
    // age the staged commit too (manifest committedAtMs is fresh — rewrite
    // the branch head manifest with an old timestamp to simulate idleness)
    val abHead = ab.currentVersion()
    val abM = ab.manifest(abHead)
    val mp = new org.apache.hadoop.fs.Path(
      s"${store.root}/manifest/branches/abandoned/v$abHead.json")
    val f = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(mp, false)
    val out = f.create(mp, false)
    out.write(abM.copy(committedAtMs = now - 9_000_000L).toJson.getBytes("UTF-8"))
    out.close()
    // the rewrite above is out-of-band mutation no production path does —
    // drop the process-wide manifest memo entry so the aged timestamp is read
    TableStore.invalidateMeta(store.root + "#abandoned")
    // a fresh branch and an aged-but-published one
    store.createBranch("active")
    store.createBranch("published", nowMs = now - 10_000_000L)
    // without force, the aged unpublished branch is refused...
    val e = intercept[IllegalStateException](
      store.expireBranches(maxAgeMs = 1_000_000L, nowMs = now))
    assert(e.getMessage.contains("unpublished"))
    // ...with force it expires; young and published-idle branches: the
    // young one survives, the aged commit-less one goes too
    val dropped = store.expireBranches(maxAgeMs = 1_000_000L, force = true,
      nowMs = now)
    assert(dropped.toSet == Set("abandoned", "published"), dropped.toString)
    assert(store.listBranches().map(_.name) == Seq("active"))
    // the abandoned branch's exclusive file is reclaimed by the next vacuum
    store.commitAppend(Seq((1000L, "post")).toDF("k", "v"))
    store.vacuum(keepSnapshots = 1)
    assert(store.readSnapshot().count() == 101)
    // the staged-only snap dir is gone from disk
    val dataDir = new org.apache.hadoop.fs.Path(s"${store.root}/data")
    val staged = f.listStatus(dataDir).map(_.getPath.getName)
    assert(abM.inlineFiles.exists(p => !f.exists(
      new org.apache.hadoop.fs.Path(p))),
      s"abandoned branch's staged file still on disk: $staged")
  }

  test("rebase on the sharded tier: zero driver file materializations") {
    spark.conf.set("spark.graft.manifest.inlineThreshold", "8")
    try {
      val store = freshStore()
      store.commitBucketed(
        (1L to 5000L).map(i => (i, s"v$i")).toDF("k", "v"),
        keys = Seq("k"), numBuckets = 16)
      assert(store.manifest(store.currentVersion()).isSharded)
      store.createBranch("shr")
      val br = store.forBranch("shr")
      br.upsertEq(Seq((5L, "b5", "U"), (9001L, "b9001", "I")).toDF("k", "v", "op"))
      store.upsertEq(Seq((6L, "m6", "U")).toDF("k", "v", "op"))
      val before = TableStore.driverMaterializations.get()
      store.rebaseBranch("shr")
      store.fastForward("shr")
      assert(TableStore.driverMaterializations.get() == before,
        "rebase materialized a driver file list on the sharded tier")
      val out = store.readSnapshot().as[(Long, String)].collect().toMap
      assert(out(5L) == "b5" && out(9001L) == "b9001" && out(6L) == "m6")
      assert(out.size == 5001)
    } finally spark.conf.unset("spark.graft.manifest.inlineThreshold")
  }

  test("index/agg maintenance is refused on a branch view, skipped by " +
      "the cadence, and catches up after publish") {
    import graft.store.{MaterializedAgg, SecondaryIndex}
    import graft.streaming.StreamingOps
    val store = freshStore()
    store.commitBucketed(
      (1L to 200L).map(k => (k, s"g${k % 5}", k * 2)).toDF("k", "g", "n"),
      keys = Seq("k"), numBuckets = 8)
    SecondaryIndex.create(store, "by_g", Seq("g"), Seq("n"), 4)
    MaterializedAgg.create(store, "v", Seq("g"), Seq("n"), 4)
    store.createBranch("feed")
    val br = store.forBranch("feed")
    br.upsertEq(Seq((7L, "g_new", 700L, "PUT"), (201L, "g_new", 4L, "PUT"))
      .toDF("k", "g", "n", "op"))
    // direct refresh against a branch head must refuse loudly: the shared
    // index/agg trees record watermarks in MAIN's numbering, which the
    // branch's post-fork versions overlap
    assert(intercept[IllegalArgumentException](
      SecondaryIndex.refresh(br, "by_g")).getMessage.contains("MAIN"))
    assert(intercept[IllegalArgumentException](
      MaterializedAgg.refresh(br, "v")).getMessage.contains("MAIN"))
    // a branch CDC loop's maintenance pass SKIPS the derivative refresh
    // instead of dying (or corrupting): watermarks stay at the fork state
    StreamingOps.maintain(br, StreamingOps.CdcMaintenance(keepSnapshots = 5))
    val aggSt = MaterializedAgg.aggStore(store, "v")
    val am = aggSt.manifest(aggSt.currentVersion())
    assert(am.props("graft.agg.base-version").toLong == 0L,
      "branch maintenance must not advance the shared view watermark")
    // after publish the branch commits reach the derivatives through a
    // normal main-side refresh
    store.fastForward("feed")
    SecondaryIndex.refresh(store, "by_g")
    MaterializedAgg.refresh(store, "v")
    val expect = store.readSnapshot().groupBy("g")
      .agg(sum("n").as("sum_n"), count(lit(1)).as("_cnt"))
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(MaterializedAgg.read(store, "v").select("g", "sum_n", "_cnt")
      .collect().map(_.mkString("|")).sorted.toSeq == expect)
    assert(SecondaryIndex.lookup(store, "by_g", col("g") === "g_new")
      .count() == 2L)
  }
}
