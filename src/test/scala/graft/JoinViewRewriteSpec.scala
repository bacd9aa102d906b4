package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.{AggViewRewrite, GraftCatalog}
import graft.store.{MaterializedJoin, TableStore}

/** Transparent join-view rewrite ([[graft.catalog.JoinViewRewriteRule]]):
  * `fact JOIN dim` SQL over the catalog must answer from a fresh
  * materialized join view when (and only when) the shape is coverable,
  * result-identical to the un-rewritten plan — inner, left outer, and the
  * EXISTS/semi form, with filters and extra conjuncts where they commute. */
class JoinViewRewriteSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse = {
    val w = Files.createTempDirectory("graft_jvrw").toString
    spark.conf.set("spark.sql.catalog.jv_cat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.jv_cat.warehouse", w)
    w
  }

  private def setup(): (TableStore, TableStore) = {
    val fact = new TableStore(spark, s"$warehouse/analytics/fct")
    val dim = new TableStore(spark, s"$warehouse/analytics/dm")
    if (fact.currentVersion() < 0) {
      fact.commitBucketed((1L to 400L).map(i =>
        (i, i % 45, i * 3, i % 10)).toDF("id", "fk", "amt", "amt2"),
        Seq("id"), 8)
      dim.commitBucketed((0L to 49L).map(k =>
        (k, s"a${k % 7}", s"x$k")).toDF("k", "attr", "extra"), Seq("k"), 4)
      MaterializedJoin.create(fact, "denorm", dim, Seq("fk"), Seq("k"),
        Seq("attr"))
      MaterializedJoin.create(fact, "denorml", dim, Seq("fk"), Seq("k"),
        Seq("attr"), joinType = "left")
    }
    (fact, dim)
  }

  private def fired(df: DataFrame): Boolean =
    AggViewRewrite.served(df, "/join/")

  private def check(sql: String, expectFire: Boolean): Unit = {
    val on = spark.sql(sql)
    val onRows = on.collect().map(_.toString).sorted.toSeq
    assert(fired(on) == expectFire,
      s"expected fired=$expectFire for:\n$sql\n${on.queryExecution.optimizedPlan}")
    spark.conf.set("spark.graft.agg.rewrite", "false")
    try {
      val off = spark.sql(sql)
      assert(!fired(off))
      assert(onRows == off.collect().map(_.toString).sorted.toSeq,
        s"rewrite changed results for:\n$sql")
    } finally spark.conf.set("spark.graft.agg.rewrite", "true")
  }

  test("inner join answers from the view; filters on both sides commute") {
    setup()
    check(
      """SELECT f.id, f.amt, d.attr
        |FROM jv_cat.analytics.fct f JOIN jv_cat.analytics.dm d
        |ON f.fk = d.k
        |WHERE d.attr <> 'a3' AND f.amt > 30""".stripMargin,
      expectFire = true)
    // extra equality-free conjunct in the ON clause commutes too
    check(
      """SELECT f.id, d.attr
        |FROM jv_cat.analytics.fct f JOIN jv_cat.analytics.dm d
        |ON f.fk = d.k AND d.attr > 'a1'""".stripMargin,
      expectFire = true)
    // the dim JOIN KEY in the output maps to the fact's join column
    check(
      """SELECT d.k AS dk, COUNT(*) AS n
        |FROM jv_cat.analytics.fct f JOIN jv_cat.analytics.dm d
        |ON f.fk = d.k GROUP BY d.k""".stripMargin,
      expectFire = true)
  }

  test("left outer joins serve from the left view; unsound shapes decline") {
    setup()
    check(
      """SELECT f.id, f.amt, d.attr
        |FROM jv_cat.analytics.fct f LEFT JOIN jv_cat.analytics.dm d
        |ON f.fk = d.k WHERE f.amt > 60""".stripMargin,
      expectFire = true)
    // dim key reference under LEFT OUTER cannot map (NULL for unmatched)
    check(
      """SELECT f.id, d.k
        |FROM jv_cat.analytics.fct f LEFT JOIN jv_cat.analytics.dm d
        |ON f.fk = d.k""".stripMargin,
      expectFire = false)
    // dim-side filter under LEFT OUTER does not commute
    check(
      """SELECT f.id, d.attr
        |FROM jv_cat.analytics.fct f LEFT JOIN
        |  (SELECT * FROM jv_cat.analytics.dm WHERE attr <> 'a2') d
        |ON f.fk = d.k""".stripMargin,
      expectFire = false)
  }

  test("EXISTS (semi) serves from the inner view, extra conjunct included") {
    setup()
    check(
      """SELECT f.id, f.amt FROM jv_cat.analytics.fct f
        |WHERE EXISTS (SELECT 1 FROM jv_cat.analytics.dm d
        |              WHERE d.k = f.fk AND d.attr <> 'a2')""".stripMargin,
      expectFire = true)
  }

  test("unsupported shapes decline but stay correct") {
    setup()
    // unprojected dim column referenced
    check(
      """SELECT f.id, d.extra
        |FROM jv_cat.analytics.fct f JOIN jv_cat.analytics.dm d
        |ON f.fk = d.k""".stripMargin, expectFire = false)
    // wrong join keys
    check(
      """SELECT f.id, d.attr
        |FROM jv_cat.analytics.fct f JOIN jv_cat.analytics.dm d
        |ON f.amt = d.k""".stripMargin, expectFire = false)
    // non-equi only
    check(
      """SELECT f.id, d.attr
        |FROM jv_cat.analytics.fct f JOIN jv_cat.analytics.dm d
        |ON f.fk < d.k WHERE d.k < 3""".stripMargin, expectFire = false)
  }

  test("stacked SQL: create_agg_view over `fct$join_denorm`, the GROUP BY " +
      "over the join-view table answers from the stacked aggregate") {
    val (fact, _) = setup()
    spark.sql("CALL jv_cat.system.create_agg_view(" +
      "'analytics.fct$join_denorm', 'by_attr', 'attr', 'amt', 2)")
    val df = spark.sql(
      """SELECT attr, SUM(amt) AS sa, COUNT(*) AS n
        |FROM jv_cat.analytics.`fct$join_denorm`
        |GROUP BY attr""".stripMargin)
    assert(AggViewRewrite.served(df), // the /agg/ tree under the join view
      s"stacked aggregate must serve the GROUP BY:\n" +
        s"${df.queryExecution.optimizedPlan}")
    val want = MaterializedJoin.read(fact, "denorm")
      .groupBy("attr").agg(sum("amt").as("sa"), count(lit(1)).as("n"))
      .collect().map(_.toString).sorted.toSeq
    assert(df.collect().map(_.toString).sorted.toSeq == want)
    spark.sql("CALL jv_cat.system.drop_agg_view(" +
      "'analytics.fct$join_denorm', 'by_attr')")
  }

  test("COMPOSITION: the star query over BASE tables (join + GROUP BY in " +
      "one statement) answers from the STACKED aggregate — O(groups)") {
    val (fact, _) = setup()
    spark.sql("CALL jv_cat.system.create_agg_view(" +
      "'analytics.fct$join_denorm', 'by_attr2', 'attr', 'amt', 2)")
    try {
      // the reference's own dashboard shape (README.md:170-173): one
      // statement, fact JOIN dim GROUP BY — the join rewrite splices a
      // DSv2 view scan, the agg rewrite composes above it at the fixpoint
      val sql =
        """SELECT d.attr, SUM(f.amt) AS sa, COUNT(*) AS n
          |FROM jv_cat.analytics.fct f JOIN jv_cat.analytics.dm d
          |ON f.fk = d.k
          |GROUP BY d.attr""".stripMargin
      val df = spark.sql(sql)
      assert(AggViewRewrite.served(df), // the /agg/ tree under the view
        s"the base-tables star query must answer from the stacked " +
          s"aggregate:\n${df.queryExecution.optimizedPlan}")
      val got = df.collect().map(_.toString).sorted.toSeq
      spark.conf.set("spark.graft.agg.rewrite", "false")
      try {
        val off = spark.sql(sql)
        assert(!AggViewRewrite.served(off) && !fired(off))
        assert(got == off.collect().map(_.toString).sorted.toSeq,
          "composed rewrite changed results")
      } finally spark.conf.set("spark.graft.agg.rewrite", "true")
      // a filter on a group key still composes (commutes through both)
      val df2 = spark.sql(
        """SELECT d.attr, SUM(f.amt) AS sa
          |FROM jv_cat.analytics.fct f JOIN jv_cat.analytics.dm d
          |ON f.fk = d.k WHERE d.attr <> 'a3'
          |GROUP BY d.attr""".stripMargin)
      assert(AggViewRewrite.served(df2),
        s"filtered star query must compose too:\n" +
          s"${df2.queryExecution.optimizedPlan}")
    } finally spark.sql("CALL jv_cat.system.drop_agg_view(" +
      "'analytics.fct$join_denorm', 'by_attr2')")
  }

  test("MULTI-DIM: a 2-dim star view serves the two-join chain; versions " +
      "gate per dim") {
    val (fact, _) = setup()
    val dim2 = new TableStore(spark, s"$warehouse/analytics/dm2")
    if (dim2.currentVersion() < 0)
      dim2.commitBucketed((0L to 9L).map(g =>
        (g, s"g$g")).toDF("gk", "gname"), Seq("gk"), 2)
    if (!MaterializedJoin.list(fact).contains("star"))
      MaterializedJoin.createMulti(fact, "star", Seq(
        MaterializedJoin.Dim(new TableStore(spark, s"$warehouse/analytics/dm"),
          Seq("fk"), Seq("k"), Seq("attr")),
        MaterializedJoin.Dim(dim2, Seq("amt2"), Seq("gk"), Seq("gname"))))
    check(
      """SELECT f.id, d.attr, g.gname
        |FROM jv_cat.analytics.fct f
        |JOIN jv_cat.analytics.dm d ON f.fk = d.k
        |JOIN jv_cat.analytics.dm2 g ON f.amt2 = g.gk
        |WHERE d.attr <> 'a1'""".stripMargin,
      expectFire = true)
    // dim order in SQL does not matter (bijective dim matching)
    check(
      """SELECT f.id, g.gname, d.attr
        |FROM jv_cat.analytics.fct f
        |JOIN jv_cat.analytics.dm2 g ON f.amt2 = g.gk
        |JOIN jv_cat.analytics.dm d ON f.fk = d.k""".stripMargin,
      expectFire = true)
    // an uncoverable chain (unprojected dim column referenced) declines
    // at every level but stays correct
    check(
      """SELECT f.id, d.extra, g.gname
        |FROM jv_cat.analytics.fct f
        |JOIN jv_cat.analytics.dm d ON f.fk = d.k
        |JOIN jv_cat.analytics.dm2 g ON f.amt2 = g.gk""".stripMargin,
      expectFire = false)
  }

  test("TAIL UNION: a fact-stale view serves exactly (stored ∪ re-joined " +
      "tail) with nothing committed; dim churn declines") {
    val factT = new TableStore(spark, s"$warehouse/analytics/fct_t")
    val dimT = new TableStore(spark, s"$warehouse/analytics/dm_t")
    factT.commitBucketed((1L to 300L).map(i =>
      (i, i % 30, i * 2)).toDF("id", "fk", "amt"), Seq("id"), 8)
    dimT.commitBucketed((0L to 39L).map(k =>
      (k, s"a${k % 5}")).toDF("k", "attr"), Seq("k"), 4)
    MaterializedJoin.create(factT, "tv", dimT, Seq("fk"), Seq("k"),
      Seq("attr"))
    // fact-only churn: in-place update + hard delete, NO refresh (narrow
    // enough that the span prices under rescanFraction — the tail path is
    // for small live-feed deltas; a span churning most files correctly
    // declines to the scan)
    factT.upsertEq(factT.readSnapshot().filter($"id".isin(3L, 103L, 203L))
      .withColumn("amt", $"amt" + 1000L).withColumn("op", lit("PUT")))
    factT.upsertEq(factT.readSnapshot().filter($"id".isin(7L, 157L))
      .withColumn("op", lit("REMOVE")))
    spark.catalog.refreshTable("jv_cat.analytics.fct_t")
    val q =
      """SELECT f.id, f.amt, d.attr
        |FROM jv_cat.analytics.fct_t f JOIN jv_cat.analytics.dm_t d
        |ON f.fk = d.k WHERE d.attr <> 'a4'""".stripMargin
    check(q, expectFire = false) // stale, no opt-in: full fallback
    val vvBefore = MaterializedJoin.viewStore(factT, "tv").currentVersion()
    spark.conf.set("spark.graft.agg.rewrite.tailUnion", "true")
    // toy commits write file counts the span pricing reads as heavy
    // churn — relax it here (the guard's decline is its own test in
    // AggViewRewriteSpec; the formula is shared)
    spark.conf.set("spark.graft.agg.refresh.rescanFraction", "0.99")
    try {
      check(q, expectFire = true) // exact vs the un-rewritten plan
      // the semi form rides the same tail
      check(
        """SELECT f.id FROM jv_cat.analytics.fct_t f
          |WHERE EXISTS (SELECT 1 FROM jv_cat.analytics.dm_t d
          |              WHERE d.k = f.fk)""".stripMargin,
        expectFire = true)
      // a READ path must not commit: view store untouched
      assert(MaterializedJoin.viewStore(factT, "tv").currentVersion()
        == vvBefore, "tail serving must not commit to the view store")
      // DIM churn serves too (r11): the changed keys' fact rows come
      // from the covering index at the LOCKSTEP watermark, re-joined at
      // the scanned dim snapshot — exact, still nothing committed
      dimT.upsertEq(dimT.readSnapshot().filter($"k" === 3)
        .withColumn("attr", lit("zz")).withColumn("op", lit("PUT")))
      spark.catalog.refreshTable("jv_cat.analytics.dm_t")
      check(q, expectFire = true)
      assert(MaterializedJoin.viewStore(factT, "tv").currentVersion()
        == vvBefore, "dim-churn tail serving must not commit either")
      // the served rows must carry the LIVE dim value for the churned key
      val live = spark.sql(q).filter($"id" % 30 === 3)
      assert(live.count() > 0 &&
        live.filter($"attr" =!= "zz").count() == 0,
        "dim-churn tail must serve the scanned dim snapshot's values")
      // an index OFF the lockstep watermark cannot serve (intermediate
      // row versions would be unsound) — refreshing it mid-span moves its
      // watermark past the view's and the tail declines
      graft.store.SecondaryIndex.refresh(factT, "join-tv")
      assert(graft.store.SecondaryIndex.baseWatermark(factT, "join-tv")
        == factT.currentVersion())
      check(q, expectFire = false)
    } finally {
      spark.conf.unset("spark.graft.agg.rewrite.tailUnion")
      spark.conf.unset("spark.graft.agg.refresh.rescanFraction")
    }
  }

  test("TAIL UNION: a content-preserving fact span (compaction) serves " +
      "the stored rows directly") {
    val factT = new TableStore(spark, s"$warehouse/analytics/fct_t2")
    val dimT = new TableStore(spark, s"$warehouse/analytics/dm_t2")
    factT.commitBucketed((1L to 200L).map(i =>
      (i, i % 20, i)).toDF("id", "fk", "amt"), Seq("id"), 4)
    dimT.commitBucketed((0L to 19L).map(k =>
      (k, s"a$k")).toDF("k", "attr"), Seq("k"), 2)
    MaterializedJoin.create(factT, "tv2", dimT, Seq("fk"), Seq("k"),
      Seq("attr"))
    factT.compact(targetFiles = 2)
    spark.catalog.refreshTable("jv_cat.analytics.fct_t2")
    spark.conf.set("spark.graft.agg.rewrite.tailUnion", "true")
    try check(
      """SELECT f.id, d.attr
        |FROM jv_cat.analytics.fct_t2 f JOIN jv_cat.analytics.dm_t2 d
        |ON f.fk = d.k""".stripMargin, expectFire = true)
    finally spark.conf.unset("spark.graft.agg.rewrite.tailUnion")
  }

  test("STALENESS BUDGET: within maxStalenessMs the star serves at its " +
      "watermark pair; outside it declines; stacked agg still composes") {
    val factB = new TableStore(spark, s"$warehouse/analytics/fct_b")
    val dimB = new TableStore(spark, s"$warehouse/analytics/dm_b")
    factB.commitBucketed((1L to 300L).map(i =>
      (i, i % 25, i % 7, i * 2)).toDF("id", "fk", "grp", "amt"),
      Seq("id"), 8)
    dimB.commitBucketed((0L to 29L).map(k =>
      (k, s"a${k % 4}")).toDF("k", "attr"), Seq("k"), 4)
    MaterializedJoin.create(factB, "bv", dimB, Seq("fk"), Seq("k"),
      Seq("attr"))
    spark.sql("CALL jv_cat.system.create_agg_view(" +
      "'analytics.fct_b$join_bv', 'by_attr', 'attr,grp', 'amt', 2)")
    // churn BOTH sides — the budget path (unlike the tail) admits it
    factB.upsertEq(factB.readSnapshot().filter($"id" % 40 === 1)
      .withColumn("amt", $"amt" + 500L).withColumn("op", lit("PUT")))
    dimB.upsertEq(dimB.readSnapshot().filter($"k" === 2)
      .withColumn("attr", lit("a9")).withColumn("op", lit("PUT")))
    spark.catalog.refreshTable("jv_cat.analytics.fct_b")
    spark.catalog.refreshTable("jv_cat.analytics.dm_b")
    val q =
      """SELECT f.id, f.amt, d.attr
        |FROM jv_cat.analytics.fct_b f JOIN jv_cat.analytics.dm_b d
        |ON f.fk = d.k""".stripMargin
    check(q, expectFire = false) // no opt-in
    spark.conf.set("spark.graft.agg.rewrite.maxStalenessMs", "3600000")
    try {
      val df = spark.sql(q)
      assert(fired(df), s"within budget the view must serve:\n" +
        s"${df.queryExecution.optimizedPlan}")
      // served content is the WATERMARK pair — the view's own rows
      val want = MaterializedJoin.read(factB, "bv")
        .select($"id", $"amt", $"attr")
        .collect().map(_.toString).sorted.toSeq
      assert(df.collect().map(_.toString).sorted.toSeq == want,
        "budget serving must return the watermark snapshot of the star")
      // the budget splice is a pure DSv2 scan → the STACKED aggregate
      // composes above it: the dashboard star query stays O(groups)
      // between cadence passes
      val star = spark.sql(
        """SELECT d.attr, f.grp, SUM(f.amt) AS sa, COUNT(*) AS n
          |FROM jv_cat.analytics.fct_b f JOIN jv_cat.analytics.dm_b d
          |ON f.fk = d.k
          |GROUP BY d.attr, f.grp""".stripMargin)
      assert(AggViewRewrite.served(star) && fired(star),
        s"stale-within-budget star query must still answer from the " +
          s"stacked aggregate:\n${star.queryExecution.optimizedPlan}")
    } finally spark.conf.unset("spark.graft.agg.rewrite.maxStalenessMs")
    // a budget smaller than the commit age declines
    spark.conf.set("spark.graft.agg.rewrite.maxStalenessMs", "1")
    try {
      Thread.sleep(5)
      assert(!fired(spark.sql(q)), "expired budget must decline")
    } finally spark.conf.unset("spark.graft.agg.rewrite.maxStalenessMs")
    spark.sql("CALL jv_cat.system.drop_agg_view(" +
      "'analytics.fct_b$join_bv', 'by_attr')")
  }

  test("TIME TRAVEL: a pinned scan is never budget-served (exact-version " +
      "semantics beat the staleness trade)") {
    val factP = new TableStore(spark, s"$warehouse/analytics/fct_p")
    val dimP = new TableStore(spark, s"$warehouse/analytics/dm_p")
    factP.commitBucketed((1L to 200L).map(i =>
      (i, i % 20, i * 2)).toDF("id", "fk", "amt"), Seq("id"), 4)
    dimP.commitBucketed((0L to 19L).map(k =>
      (k, s"a$k")).toDF("k", "attr"), Seq("k"), 2)
    MaterializedJoin.create(factP, "pv", dimP, Seq("fk"), Seq("k"),
      Seq("attr"))
    val v0 = factP.currentVersion()
    factP.upsertEq(factP.readSnapshot().filter($"id" === 5L)
      .withColumn("amt", $"amt" + 100L).withColumn("op", lit("PUT")))
    val pinV = factP.currentVersion()
    factP.upsertEq(factP.readSnapshot().filter($"id" === 6L)
      .withColumn("amt", $"amt" + 100L).withColumn("op", lit("PUT")))
    spark.catalog.refreshTable("jv_cat.analytics.fct_p")
    assert(pinV == v0 + 1 && factP.currentVersion() == v0 + 2)
    spark.conf.set("spark.graft.agg.rewrite.maxStalenessMs", "3600000")
    try {
      // head scan: stale within budget → watermark-pair serving fires
      val head = spark.sql(
        """SELECT f.id, f.amt, d.attr
          |FROM jv_cat.analytics.fct_p f JOIN jv_cat.analytics.dm_p d
          |ON f.fk = d.k""".stripMargin)
      assert(fired(head), s"head scan within budget must serve:\n" +
        s"${head.queryExecution.optimizedPlan}")
      // pinned scan at an intermediate version: the user asked for THAT
      // snapshot's content — the budget path would answer the watermark
      // pair (different rows for id=5). Must decline, and stay exact.
      val pinned =
        s"""SELECT f.id, f.amt, d.attr
           |FROM jv_cat.analytics.fct_p VERSION AS OF $pinV f
           |JOIN jv_cat.analytics.dm_p d ON f.fk = d.k""".stripMargin
      check(pinned, expectFire = false)
    } finally spark.conf.unset("spark.graft.agg.rewrite.maxStalenessMs")
  }

  test("create_join_view: fewer dim-column groups than dims fails loudly " +
      "(a forgotten ';' must not silently drop a dim's columns)") {
    setup()
    val factC = new TableStore(spark, s"$warehouse/analytics/fct_c")
    val d1 = new TableStore(spark, s"$warehouse/analytics/dm_c1")
    val d2 = new TableStore(spark, s"$warehouse/analytics/dm_c2")
    factC.commitBucketed((1L to 100L).map(i =>
      (i, i % 10, i % 5, i)).toDF("id", "fk1", "fk2", "amt"), Seq("id"), 4)
    d1.commitBucketed((0L to 9L).map(k =>
      (k, s"a$k", s"b$k")).toDF("k", "a1", "a2"), Seq("k"), 2)
    d2.commitBucketed((0L to 4L).map(k =>
      (k, s"c$k")).toDF("k", "c1"), Seq("k"), 2)
    val e = intercept[Exception](spark.sql(
      "CALL jv_cat.system.create_join_view('analytics.fct_c', 'star', " +
        "'analytics.dm_c1;analytics.dm_c2', 'fk1;fk2', 'k;k', 'a1,a2')"))
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        (if (x.getCause != null && (x.getCause ne x)) chain(x.getCause)
         else Nil))
    assert(chain(e).exists(_.contains("per-dim groups")),
      s"expected the per-dim-groups refusal, got: ${chain(e)}")
    // the explicit form materializes fine
    spark.sql(
      "CALL jv_cat.system.create_join_view('analytics.fct_c', 'star', " +
        "'analytics.dm_c1;analytics.dm_c2', 'fk1;fk2', 'k;k', 'a1,a2;c1')")
    val vm = MaterializedJoin.viewMeta(factC, "star").get
    assert(vm.dims.map(_.rCols) == Seq(Seq("a1", "a2"), Seq("c1")))
  }

  test("two-sided staleness gates; refresh re-arms") {
    val (fact, dim) = setup()
    val q =
      """SELECT f.id, d.attr
        |FROM jv_cat.analytics.fct f JOIN jv_cat.analytics.dm d
        |ON f.fk = d.k""".stripMargin
    check(q, expectFire = true)
    dim.upsertEq(dim.readSnapshot().filter(col("k") === 5)
      .withColumn("attr", lit("a5_new")).withColumn("op", lit("PUT")))
    spark.catalog.refreshTable("jv_cat.analytics.dm")
    check(q, expectFire = false) // dim moved, views stale
    MaterializedJoin.refresh(fact, "denorm")
    MaterializedJoin.refresh(fact, "denorml")
    check(q, expectFire = true)
  }

  private def pyramidSetup(): (TableStore, TableStore, TableStore) = {
    val f2 = new TableStore(spark, s"$warehouse/analytics/fct2")
    val dA = new TableStore(spark, s"$warehouse/analytics/dma")
    val dB = new TableStore(spark, s"$warehouse/analytics/dmb")
    if (f2.currentVersion() < 0) {
      f2.commitBucketed((1L to 300L).map(i => (i, i % 40, i * 3))
        .toDF("id", "fk", "amt"), Seq("id"), 8)
      dA.commitBucketed((0L to 49L).map(k => (k, k % 7, s"a$k"))
        .toDF("k", "grp", "attr1"), Seq("k"), 4)
      dB.commitBucketed((0L to 6L).map(g => (g, s"g$g"))
        .toDF("g", "attr2"), Seq("g"), 2)
      MaterializedJoin.create(f2, "v1", dA, Seq("fk"), Seq("k"),
        Seq("grp", "attr1"))
      MaterializedJoin.create(MaterializedJoin.viewStore(f2, "v1"), "v2",
        dB, Seq("grp"), Seq("g"), Seq("attr2"))
    }
    (f2, dA, dB)
  }

  test("PYRAMID: the rewrite self-composes at the fixpoint — a snowflake " +
      "chain answers from the stacked view's store") {
    val (f2, dA, dB) = pyramidSetup()
    // dB joins on dA's PROJECTED column — no single flat view covers
    // this chain; the inner join matches v1, its splice is a DSv2 scan
    // of v1's store, and the NEXT fixpoint iteration matches that scan
    // joined to dB against v2 (registered ON v1's store)
    val q =
      """SELECT f.id, f.amt, a.attr1, b.attr2
        |FROM jv_cat.analytics.fct2 f
        |JOIN jv_cat.analytics.dma a ON f.fk = a.k
        |JOIN jv_cat.analytics.dmb b ON a.grp = b.g
        |WHERE f.amt > 30""".stripMargin
    val on = spark.sql(q)
    assert(AggViewRewrite.served(on, "/join/v1/join/v2"),
      s"snowflake chain must serve from the stacked view:\n" +
        s"${on.queryExecution.optimizedPlan}")
    val onRows = on.collect().map(_.toString).sorted.toSeq
    spark.conf.set("spark.graft.agg.rewrite", "false")
    try {
      val off = spark.sql(q)
      assert(!fired(off))
      assert(onRows == off.collect().map(_.toString).sorted.toSeq,
        "pyramid rewrite changed results")
    } finally spark.conf.set("spark.graft.agg.rewrite", "true")
    // the nested store reads as a chained-marker catalog table too
    assert(spark.sql(
      "SELECT * FROM jv_cat.analytics.`fct2$join_v1$join_v2`").count() ==
      spark.sql(q.replace("WHERE f.amt > 30", "")).count())
  }

  test("PYRAMID TAIL: a stale level-2 view tail-serves EXACTLY while " +
      "level 1 is fresh (the mid-cadence pyramid state)") {
    val (f2, dA, dB) = pyramidSetup()
    val v1 = MaterializedJoin.viewStore(f2, "v1")
    // bring both levels current, then churn the fact and refresh ONLY v1:
    // the stacked view is now stale exactly one level deep
    MaterializedJoin.refresh(f2, "v1")
    MaterializedJoin.refresh(v1, "v2")
    f2.upsertEq(f2.readSnapshot().filter(col("id") % 29 === 5)
      .withColumn("amt", col("amt") + 9).withColumn("op", lit("PUT")))
    MaterializedJoin.refresh(f2, "v1")
    val v2st = MaterializedJoin.viewStore(v1, "v2")
    val (v1v, v2v) = (v1.currentVersion(), v2st.currentVersion())
    spark.catalog.refreshTable("jv_cat.analytics.fct2")
    val q =
      """SELECT f.id, f.amt, a.attr1, b.attr2
        |FROM jv_cat.analytics.fct2 f
        |JOIN jv_cat.analytics.dma a ON f.fk = a.k
        |JOIN jv_cat.analytics.dmb b ON a.grp = b.g""".stripMargin
    spark.conf.set("spark.graft.agg.rewrite.tailUnion", "true")
    spark.conf.set("spark.graft.agg.refresh.rescanFraction", "2.0")
    try {
      val on = spark.sql(q)
      assert(AggViewRewrite.served(on, "/join/v1/join/v2"),
        s"the stale pyramid must tail-serve from the nested store:\n" +
          s"${on.queryExecution.optimizedPlan}")
      val onRows = on.collect().map(_.toString).sorted.toSeq
      spark.conf.set("spark.graft.agg.rewrite", "false")
      try assert(onRows ==
        spark.sql(q).collect().map(_.toString).sorted.toSeq,
        "pyramid tail serving diverged")
      finally spark.conf.set("spark.graft.agg.rewrite", "true")
      // a READ path: neither view store may commit
      assert(v1.currentVersion() == v1v && v2st.currentVersion() == v2v)
    } finally {
      spark.conf.unset("spark.graft.agg.rewrite.tailUnion")
      spark.conf.unset("spark.graft.agg.refresh.rescanFraction")
    }
  }

  test("PYRAMID TAIL-OVER-TAIL: BOTH levels stale (the live-feed state) " +
      "— level 1 tail-serves and level 2 composes over its signed delta, " +
      "exactly, nothing committed") {
    val (f2, dA, dB) = pyramidSetup()
    val v1 = MaterializedJoin.viewStore(f2, "v1")
    val v2st = MaterializedJoin.viewStore(v1, "v2")
    MaterializedJoin.refresh(f2, "v1")
    MaterializedJoin.refresh(v1, "v2")
    // fact churn, NO refresh anywhere: v1 is stale against the fact and
    // v2 is (transitively) stale against the world, though its own fact
    // store (v1) never moved
    f2.upsertEq(f2.readSnapshot().filter(col("id") % 37 === 4)
      .withColumn("amt", col("amt") + 13).withColumn("op", lit("PUT")))
    val (v1v, v2v) = (v1.currentVersion(), v2st.currentVersion())
    spark.catalog.refreshTable("jv_cat.analytics.fct2")
    val q =
      """SELECT f.id, f.amt, a.attr1, b.attr2
        |FROM jv_cat.analytics.fct2 f
        |JOIN jv_cat.analytics.dma a ON f.fk = a.k
        |JOIN jv_cat.analytics.dmb b ON a.grp = b.g
        |WHERE f.amt > 30""".stripMargin
    spark.conf.set("spark.graft.agg.rewrite.tailUnion", "true")
    spark.conf.set("spark.graft.agg.refresh.rescanFraction", "2.0")
    try {
      val on = spark.sql(q)
      assert(AggViewRewrite.served(on, "/join/v1/join/v2"),
        s"both-levels-stale pyramid must serve tail-over-tail:\n" +
          s"${on.queryExecution.optimizedPlan}")
      val onRows = on.collect().map(_.toString).sorted.toSeq
      spark.conf.set("spark.graft.agg.rewrite", "false")
      try assert(onRows ==
        spark.sql(q).collect().map(_.toString).sorted.toSeq,
        "tail-over-tail serving diverged")
      finally spark.conf.set("spark.graft.agg.rewrite", "true")
      assert(v1.currentVersion() == v1v && v2st.currentVersion() == v2v,
        "tail-over-tail is a READ path: nothing may commit")
    } finally {
      spark.conf.unset("spark.graft.agg.rewrite.tailUnion")
      spark.conf.unset("spark.graft.agg.refresh.rescanFraction")
    }
  }

  test("PYRAMID TAIL-OVER-TAIL + DIM CHURN (r11 #5): a level-2 dim " +
      "UPDATE/DELETE in the live-feed state still serves — churned keys " +
      "through the covering index at the lockstep watermark, exactly, " +
      "nothing committed") {
    val (f2, dA, dB) = pyramidSetup()
    val v1 = MaterializedJoin.viewStore(f2, "v1")
    val v2st = MaterializedJoin.viewStore(v1, "v2")
    MaterializedJoin.refresh(f2, "v1")
    MaterializedJoin.refresh(v1, "v2")
    // live feed, NOTHING refreshed: fact churn (level 1 tail-serves) AND
    // level-2 dim churn — an attr update and a deleted dim key (inner
    // join: its rows must leave the served result)
    f2.upsertEq(f2.readSnapshot().filter(col("id") % 41 === 3)
      .withColumn("amt", col("amt") + 7).withColumn("op", lit("PUT")))
    dB.upsertEq(Seq((2L, "g2x", "PUT"), (5L, "g5x", "PUT"))
      .toDF("g", "attr2", "op"))
    dB.deleteEq(Seq(Tuple1(3L)).toDF("g"))
    val (v1v, v2v) = (v1.currentVersion(), v2st.currentVersion())
    spark.catalog.refreshTable("jv_cat.analytics.fct2")
    spark.catalog.refreshTable("jv_cat.analytics.dmb")
    val q =
      """SELECT f.id, f.amt, a.attr1, b.attr2
        |FROM jv_cat.analytics.fct2 f
        |JOIN jv_cat.analytics.dma a ON f.fk = a.k
        |JOIN jv_cat.analytics.dmb b ON a.grp = b.g
        |WHERE f.amt > 30""".stripMargin
    spark.conf.set("spark.graft.agg.rewrite.tailUnion", "true")
    spark.conf.set("spark.graft.agg.refresh.rescanFraction", "2.0")
    try {
      val on = spark.sql(q)
      assert(AggViewRewrite.served(on, "/join/v1/join/v2"),
        s"dim-churned live-feed pyramid must serve tail-over-tail:\n" +
          s"${on.queryExecution.optimizedPlan}")
      val onRows = on.collect().map(_.toString).sorted.toSeq
      spark.conf.set("spark.graft.agg.rewrite", "false")
      try assert(onRows ==
        spark.sql(q).collect().map(_.toString).sorted.toSeq,
        "dim-churned tail-over-tail serving diverged")
      finally spark.conf.set("spark.graft.agg.rewrite", "true")
      assert(v1.currentVersion() == v1v && v2st.currentVersion() == v2v,
        "tail-over-tail is a READ path: nothing may commit")
    } finally {
      spark.conf.unset("spark.graft.agg.rewrite.tailUnion")
      spark.conf.unset("spark.graft.agg.refresh.rescanFraction")
    }
    // restore freshness for later cases
    MaterializedJoin.refresh(f2, "v1")
    MaterializedJoin.refresh(v1, "v2")
  }

  test("PYRAMID + STACKED AGG: three rewrites compose at the fixpoint — " +
      "the snowflake GROUP BY answers from the aggregate over the " +
      "stacked view") {
    val (f2, dA, dB) = pyramidSetup()
    val v1 = MaterializedJoin.viewStore(f2, "v1")
    val v2st = MaterializedJoin.viewStore(v1, "v2")
    // ensure the pyramid is current (earlier cases may have churned it),
    // then stack an aggregate on the level-2 store
    MaterializedJoin.refresh(f2, "v1")
    MaterializedJoin.refresh(v1, "v2")
    if (!graft.store.MaterializedAgg.list(v2st).contains("by_attr2"))
      graft.store.MaterializedAgg.create(v2st, "by_attr2", Seq("attr2"),
        Seq("amt"), 2)
    spark.catalog.refreshTable("jv_cat.analytics.fct2")
    val q =
      """SELECT b.attr2, SUM(f.amt) AS s, COUNT(*) AS n
        |FROM jv_cat.analytics.fct2 f
        |JOIN jv_cat.analytics.dma a ON f.fk = a.k
        |JOIN jv_cat.analytics.dmb b ON a.grp = b.g
        |GROUP BY b.attr2""".stripMargin
    val on = spark.sql(q)
    assert(AggViewRewrite.served(on, "/join/v1/join/v2/agg/by_attr2"),
      s"the snowflake GROUP BY must answer from the stacked aggregate:\n" +
        s"${on.queryExecution.optimizedPlan}")
    val onRows = on.collect().map(_.toString).sorted.toSeq
    spark.conf.set("spark.graft.agg.rewrite", "false")
    try assert(onRows ==
      spark.sql(q).collect().map(_.toString).sorted.toSeq,
      "three-level composition changed results")
    finally spark.conf.set("spark.graft.agg.rewrite", "true")
  }
}
