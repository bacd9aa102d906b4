package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.GraftCatalog
import graft.store.{MaterializedAgg, MaterializedJoin, TableStore}

/** Plan-time metadata caching (VERDICT r11 next #1): committed manifests
  * are immutable, so [[TableStore.manifest]] memoizes process-wide and the
  * derivative registries snapshot-cache per base root — repeated rewritten
  * queries must do ZERO manifest IO inside the optimizer, while every
  * lifecycle path that deletes or renumbers metadata (DROP TABLE, view
  * drops, branch drop/rebase, expiry) invalidates so nothing stale ever
  * serves. */
class MetaCacheSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse = {
    val w = Files.createTempDirectory("graft_mcache").toString
    spark.conf.set("spark.sql.catalog.mc_cat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mc_cat.warehouse", w)
    w
  }

  private def salesRows(from: Long, to: Long) =
    (from to to).map(k => (k, s"g${k % 5}", k * 2)).toDF("id", "grp", "n")

  test("repeated rewritten queries are pure memo hits: zero manifest loads " +
      "(manifestLoads pinned — the VERDICT r11 #1 contract)") {
    val store = new TableStore(spark, s"$warehouse/analytics/mc_sales")
    store.commitBucketed(salesRows(1, 400), Seq("id"), 4)
    MaterializedAgg.create(store, "by_grp", Seq("grp"), sumCols = Seq("n"),
      numBuckets = 2)
    val q = "SELECT grp, SUM(n) AS s FROM mc_cat.analytics.mc_sales GROUP BY grp"
    // warm: the first planning pass populates the manifest memo and the
    // registry snapshot
    val first = spark.sql(q)
    val rows1 = first.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(graft.catalog.AggViewRewrite.served(first),
      "fixture error: the GROUP BY must answer from the view")
    val before = TableStore.manifestLoads.get()
    (1 to 3).foreach { _ =>
      val df = spark.sql(q)
      assert(graft.catalog.AggViewRewrite.served(df))
      assert(df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        == rows1)
    }
    val delta = TableStore.manifestLoads.get() - before
    assert(delta == 0,
      s"repeated rewritten planning re-read $delta manifests — the " +
        "process-wide memo contract is broken")
  }

  test("the caches respect new commits: DML + refresh serve NEW content, " +
      "never a stale snapshot") {
    val store = new TableStore(spark, s"$warehouse/analytics/mc_live")
    store.commitBucketed(salesRows(1, 300), Seq("id"), 4)
    MaterializedAgg.create(store, "by_grp", Seq("grp"), sumCols = Seq("n"),
      numBuckets = 2)
    val q = "SELECT grp, SUM(n) AS s FROM mc_cat.analytics.mc_live GROUP BY grp"
    val stale = spark.sql(q).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // base DML through the store, then the cadence refresh — both are
    // commits, both must punch through every memo
    store.upsertEq(Seq((1L, "g1", 999999L, "PUT")).toDF("id", "grp", "n", "op"),
      opCol = "op", removeOp = "REMOVE")
    MaterializedAgg.refresh(store, "by_grp")
    val fresh = spark.sql(q)
    assert(graft.catalog.AggViewRewrite.served(fresh),
      "refreshed view must serve the repeated query")
    val freshRows = fresh.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(freshRows("g1") == stale("g1") - 2L + 999999L,
      s"served a stale snapshot: ${freshRows("g1")} vs base-truth " +
        s"${stale("g1") - 2L + 999999L}")
  }

  test("DROP TABLE invalidates: recreate at the same root serves the new " +
      "table, not cached metadata (the drop-and-recreate fixture reality)") {
    val root = s"$warehouse/analytics/mc_cycle"
    val s1 = new TableStore(spark, root)
    s1.commitBucketed(salesRows(1, 100), Seq("id"), 4)
    MaterializedAgg.create(s1, "by_grp", Seq("grp"), sumCols = Seq("n"),
      numBuckets = 2)
    assert(spark.sql("SELECT SUM(n) FROM mc_cat.analytics.mc_cycle")
      .head().getLong(0) == (1L to 100L).map(_ * 2).sum)
    spark.sql("DROP TABLE mc_cat.analytics.mc_cycle")
    // same root, DIFFERENT content and no view — every cached manifest,
    // span fact, and registry snapshot under the root must be gone
    val s2 = new TableStore(spark, root)
    s2.commitBucketed(salesRows(1000, 1049), Seq("id"), 4)
    spark.catalog.refreshTable("mc_cat.analytics.mc_cycle")
    val out = spark.sql("SELECT SUM(n) AS s FROM mc_cat.analytics.mc_cycle")
    assert(!graft.catalog.AggViewRewrite.served(out),
      "no view exists on the recreated table — a registry snapshot leaked " +
        "across DROP TABLE")
    assert(out.head().getLong(0) == (1000L to 1049L).map(_ * 2).sum)
  }

  test("root epoch: an OUT-OF-PROCESS drop+recreate never serves a " +
      "renumbered manifest from the memo (VERDICT r12 next #4)") {
    val root = s"$warehouse/analytics/mc_epoch"
    val s1 = new TableStore(spark, root)
    s1.commitSnapshot(Seq((1L, "old")).toDF("k", "v"))
    assert(s1.readSnapshot().count() == 1) // memo holds (root, epoch1, 0)
    // simulate a SECOND driver: raw-filesystem delete + a fresh handle's
    // recreate — no in-process lifecycle path runs, invalidateMeta never
    // fires, and v0.json is REUSED with different content
    val dir = new org.apache.hadoop.fs.Path(root)
    val hfs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(hfs.delete(dir, true))
    new TableStore(spark, root).commitSnapshot(
      Seq((10L, "new"), (11L, "new")).toDF("k", "v"))
    // a fresh handle (the other driver's reader) keys the memo under the
    // RE-STAMPED epoch: the stale (old-epoch, 0) entry cannot serve
    val s3 = new TableStore(spark, root)
    assert(s3.manifest(0).nFiles > 0)
    assert(s3.readSnapshot().count() == 2,
      "a renumbered manifest served from the stale memo entry")
    assert(s3.readSnapshot().select("v").as[String].collect().toSet
      == Set("new"))
  }

  test("spark.graft.meta.manifestCache=false bypasses the memo entirely " +
      "(the multi-driver long-lived-handle opt-out, ADVICE r12)") {
    val root = s"$warehouse/analytics/mc_nocache"
    val s1 = new TableStore(spark, root)
    s1.commitSnapshot(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    spark.conf.set("spark.graft.meta.manifestCache", "false")
    try {
      val before = TableStore.manifestLoads.get()
      s1.manifest(0); s1.manifest(0); s1.manifest(0)
      assert(TableStore.manifestLoads.get() - before == 3,
        "with the cache off every manifest() call must re-read")
    } finally spark.conf.unset("spark.graft.meta.manifestCache")
  }

  test("join-view registry snapshot: repeated join planning loads zero " +
      "manifests; a dim commit + refresh punches through") {
    val fact = new TableStore(spark, s"$warehouse/analytics/mc_fact")
    fact.commitBucketed((1L to 200L).map(k => (k, k % 20, k * 10))
      .toDF("fk", "dk", "m"), Seq("fk"), 4)
    val dim = new TableStore(spark, s"$warehouse/analytics/mc_dim")
    dim.commitBucketed((0L to 19L).map(d => (d, s"name$d")).toDF("dk", "nm"),
      Seq("dk"), 4)
    MaterializedJoin.create(fact, "enr", dim, Seq("dk"), Seq("dk"),
      Seq("nm"), "inner")
    val q = "SELECT f.dk, COUNT(*) AS n FROM mc_cat.analytics.mc_fact f " +
      "JOIN mc_cat.analytics.mc_dim d ON f.dk = d.dk GROUP BY f.dk"
    val w1 = spark.sql(q)
    assert(graft.catalog.AggViewRewrite.served(w1, "/join/"),
      "fixture error: the join must answer from the view")
    val r1 = w1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = TableStore.manifestLoads.get()
    (1 to 3).foreach { _ =>
      assert(spark.sql(q).collect().map(r =>
        r.getLong(0) -> r.getLong(1)).toMap == r1)
    }
    assert(TableStore.manifestLoads.get() == before,
      "repeated join-rewrite planning must be pure memo hits")
    // dim DML + refresh: commits invalidate; content must move
    dim.deleteEq(Seq(Tuple1(3L)).toDF("dk"))
    MaterializedJoin.refresh(fact, "enr")
    val r2 = spark.sql(q).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!r2.contains(3L) && r2(4L) == r1(4L),
      s"post-refresh join content stale: $r2")
  }
}
