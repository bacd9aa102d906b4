package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.store.{MaterializedAgg, MaterializedJoin, SecondaryIndex, TableStore}
import graft.streaming.StreamingOps

/** DERIVATIVE-LAYER SOAK (VERDICT r9 next #8): one long mixed sequence —
  * auto-routed CDC batches, compaction, a rebucket (layout migration),
  * a branch write-audit-publish cycle — over a fact table carrying the
  * FULL derivative stack at once:
  *
  *   fact ── GSI (`by_amt`)
  *        ── ANN index (`emb_ann`, r13 — IVF cells over a deterministic
  *        │  embedding column; all-cell probes oracle-checked per epoch)
  *        ── aggregate view (`base_agg`, by fk)
  *        └─ join view (`jv`, dim keyed on the join column)
  *              ── covering index (auto)
  *              ── stacked aggregate (`by_attr`, with a COUNT(DISTINCT)
  *              │  companion)
  *              └─ STACKED JOIN VIEW (`jv2`, r11 — the denormalization
  *                 pyramid: a second dim keyed on jv's PROJECTED `extra`
  *                 column, the snowflake shape)
  *
  * Every epoch ends with ONE maintenance pass on the fact; the spec then
  * asserts end-of-cadence freshness of every layer and ORACLE PARITY of
  * every derived result against a recompute from the current base
  * snapshots — the reference's continuous-feed semantics (README.md:12)
  * pinned across the layers' interactions, not just pairwise. */
class DerivativeSoakSpec extends SparkSuite {
  import spark.implicits._

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("soak: CDC + compaction + rebucket + WAP over the full stack, " +
      "fresh and oracle-exact at the end of every epoch") {
    val root = java.nio.file.Files.createTempDirectory("graft_soak").toString
    spark.conf.set("spark.sql.catalog.soak_cat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.soak_cat.warehouse", root)
    val fact = new TableStore(spark, s"$root/analytics/fact")
    val dim = new TableStore(spark, s"$root/analytics/dim")
    // embedding: a deterministic 8-dim vector of the row id, so the ANN
    // index rides the same mixed sequence as every other derivative and
    // its parity oracle recomputes from the live snapshot
    def withEmb(df: DataFrame): DataFrame = df.withColumn("embedding",
      array((0 until 8).map(j =>
        ((col("id") * (j + 1)) % 97 + 1).cast("float")): _*))
    fact.commitBucketed(withEmb((1L to 400L).map(i =>
      (i, i % 40, i * 10)).toDF("id", "fk", "amt")), Seq("id"), 8)
    dim.commitBucketed((0L to 49L).map(k =>
      (k, s"a${k % 7}", s"x$k")).toDF("k", "attr", "extra"), Seq("k"), 16)
    // the full stack
    SecondaryIndex.create(fact, "by_amt", Seq("amt"), Seq("fk"), 8)
    graft.store.AnnIndex.create(fact, "emb_ann", "embedding",
      clusters = 8, iters = 2)
    MaterializedAgg.create(fact, "base_agg", Seq("fk"), Seq("amt"), 4)
    MaterializedJoin.create(fact, "jv", dim, Seq("fk"), Seq("k"),
      Seq("attr", "extra"))
    val vs = MaterializedJoin.viewStore(fact, "jv")
    MaterializedAgg.create(vs, "by_attr", Seq("attr"), Seq("amt"), 2,
      distinctCols = Seq("fk"))
    // the pyramid level: dim2 keyed on jv's PROJECTED (level-1) column
    val dim2 = new TableStore(spark, s"$root/analytics/dim2")
    dim2.commitBucketed((0L to 49L).map(k =>
      (s"x$k", s"t${k % 5}")).toDF("xk", "tier"), Seq("xk"), 4)
    MaterializedJoin.create(vs, "jv2", dim2, Seq("extra"), Seq("xk"),
      Seq("tier"))
    // maxDvFiles = 0: every pass purges its masks, so the epoch-end
    // statistics assertion below exercises the metadata-SUM serve (which
    // declines while DV/eq masks are live — the stale-serve asserts in
    // step 5 still see the masked mid-epoch state); analyzeCols keeps
    // per-file sums fresh on the cadence (r14)
    val policy = StreamingOps.CdcMaintenance(everyNCommits = 1,
      maxFilesPerBucket = 3, keepSnapshots = 3, branchMaxAgeMs = 0L,
      maxDvFiles = 0, analyzeCols = Some(Nil))

    def factNow() = fact.readSnapshot()
    def dimNow() = dim.readSnapshot().select(col("k"), col("attr"))
    def joinedNow() = factNow().as("l")
      .join(dimNow().as("r"), col("l.fk") === col("r.k"), "inner")
      .select(col("id"), col("fk"), col("amt"), col("attr"))
    def pyramidNow() = factNow().as("l")
      .join(dim.readSnapshot().select(col("k"), col("attr"), col("extra"))
        .as("r"), col("l.fk") === col("r.k"), "inner")
      .join(dim2.readSnapshot(), col("extra") === col("xk"), "inner")
      .select(col("id"), col("fk"), col("amt"), col("attr"), col("tier"))

    def assertAllFreshAndExact(epoch: Int): Unit = {
      // the statistics subsystem rides the same cadence (r14): the pass
      // purged every mask and analyzed every fresh file, so the totals
      // dashboard serves from metadata with ZERO data files — and exactly
      spark.catalog.refreshTable("soak_cat.analytics.fact")
      val sumDf = spark.sql(
        "SELECT SUM(amt) AS s, COUNT(*) AS c FROM soak_cat.analytics.fact")
      assert(graft.util.PlanScans.metadataOnly(sumDf),
        s"epoch $epoch: post-cadence SUM must serve from analyzed stats:\n" +
          sumDf.queryExecution.executedPlan)
      val sumRow = sumDf.collect().head
      val expect = factNow().agg(sum("amt"), count(lit(1))).collect().head
      assert(sumRow.getLong(0) == expect.getLong(0) &&
        sumRow.getLong(1) == expect.getLong(1),
        s"epoch $epoch: metadata SUM diverged from the live snapshot")
      // freshness flags across the layers
      assert(SecondaryIndex.status(fact).forall(s => s._3 == s._4),
        s"epoch $epoch: a base GSI is stale after the cadence")
      assert(MaterializedAgg.status(fact).forall(s => s._5 == s._6),
        s"epoch $epoch: the base aggregate is stale after the cadence")
      assert(MaterializedJoin.status(fact).forall(s =>
        s._4 == s._5 && s._6 == s._7),
        s"epoch $epoch: the join view is stale after the cadence")
      assert(MaterializedAgg.status(vs).forall(s => s._5 == s._6),
        s"epoch $epoch: the stacked aggregate is stale after the cadence")
      assert(MaterializedJoin.status(vs).forall(s =>
        s._4 == s._5 && s._6 == s._7),
        s"epoch $epoch: the PYRAMID level is stale after the cadence")
      // oracle parity, layer by layer
      assert(canon(MaterializedJoin.read(fact, "jv")
        .select(col("id"), col("fk"), col("amt"), col("attr"))) ==
        canon(joinedNow()), s"epoch $epoch: join view diverged")
      assert(canon(MaterializedAgg.read(fact, "base_agg")
        .select(col("fk"), col("sum_amt"), col("_cnt"))) ==
        canon(factNow().groupBy("fk").agg(sum("amt").as("s"),
          count(lit(1)).as("c"))),
        s"epoch $epoch: base aggregate diverged")
      assert(canon(MaterializedAgg.read(vs, "by_attr")
        .select(col("attr"), col("sum_amt"), col("_cnt"), col("dc_fk"))) ==
        canon(joinedNow().groupBy("attr").agg(sum("amt").as("s"),
          count(lit(1)).as("c"), countDistinct(col("fk")).as("d"))),
        s"epoch $epoch: stacked aggregate (or companion) diverged")
      assert(canon(MaterializedJoin.read(vs, "jv2")
        .select(col("id"), col("fk"), col("amt"), col("attr"),
          col("tier"))) == canon(pyramidNow()),
        s"epoch $epoch: the pyramid level diverged")
      // GSI content parity
      assert(canon(SecondaryIndex.lookup(fact, "by_amt",
        col("amt") % 100 === 0, Seq("id", "fk", "amt"))) ==
        canon(factNow().filter(col("amt") % 100 === 0)
          .select(col("id"), col("fk"), col("amt"))),
        s"epoch $epoch: GSI lookup diverged")
      // ANN index parity: an ALL-CELL probe is an exact search over the
      // index — the cadence-maintained cells must reproduce brute force
      // over the live snapshot (adds/updates/removes all reflected)
      val qv = Array.tabulate(8)(j => ((7L * (j + 1)) % 97 + 1).toFloat)
      val annTop = graft.store.AnnIndex
        .topk(fact, "emb_ann", qv, k = 5, nProbe = 0)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val brute = factNow().select(col("id"), col("embedding"))
        .collect().map { r =>
          val v = r.getSeq[Float](1).toArray
          // mirror the serve exactly: Spark round() is HALF_UP, and the
          // ordering runs on the ROUNDED score with id tie-break
          (r.getLong(0), BigDecimal(
            graft.functions.VecKernels.cosine(v, qv))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }.sortBy { case (id, c) => (-c, id) }.take(5).toSeq
      assert(annTop == brute,
        s"epoch $epoch: ANN index diverged from brute force: $annTop vs $brute")
    }

    // MID-EPOCH stale serving (VERDICT r10 next #5): BETWEEN the DML and
    // the maintenance pass every derivative is stale — under the tail
    // opt-in the user's join SQL must still answer from the view store,
    // EXACTLY (this probe would have caught the r10 Deduplicate-splice
    // regression: the crash only manifested on a served stale plan)
    def assertStaleServes(epoch: Int): Unit = {
      spark.conf.set("spark.graft.agg.rewrite.tailUnion", "true")
      spark.conf.set("spark.graft.agg.refresh.rescanFraction", "2.0")
      try {
        spark.catalog.refreshTable("soak_cat.analytics.fact")
        spark.catalog.refreshTable("soak_cat.analytics.dim")
        val q = spark.sql(
          """SELECT f.id, f.fk, f.amt, d.attr
            |FROM soak_cat.analytics.fact f
            |JOIN soak_cat.analytics.dim d ON f.fk = d.k""".stripMargin)
        assert(graft.catalog.AggViewRewrite.served(q, "/join/"),
          s"epoch $epoch: the mid-epoch stale join must serve from the " +
            s"view store:\n${q.queryExecution.optimizedPlan}")
        assert(canon(q) == canon(joinedNow()),
          s"epoch $epoch: mid-epoch tail-served join diverged")
        // the PYRAMID under the same live-feed state (r11 #5): fact AND
        // level-2 dim churned, nothing refreshed — the snowflake chain
        // serves tail-over-tail with the dim-churned keys sourced from
        // the covering index at the lockstep watermark
        spark.catalog.refreshTable("soak_cat.analytics.dim2")
        val pq = spark.sql(
          """SELECT f.id, f.fk, f.amt, d.attr, t.tier
            |FROM soak_cat.analytics.fact f
            |JOIN soak_cat.analytics.dim d ON f.fk = d.k
            |JOIN soak_cat.analytics.dim2 t ON d.extra = t.xk""".stripMargin)
        assert(graft.catalog.AggViewRewrite.served(pq, "/join/jv/join/jv2"),
          s"epoch $epoch: the mid-epoch stale pyramid must serve " +
            s"tail-over-tail:\n${pq.queryExecution.optimizedPlan}")
        assert(canon(pq) == canon(pyramidNow()),
          s"epoch $epoch: mid-epoch pyramid serving diverged")
      } finally {
        spark.conf.unset("spark.graft.agg.rewrite.tailUnion")
        spark.conf.unset("spark.graft.agg.refresh.rescanFraction")
      }
    }

    // The BUDGET rung of the serving ladder (VERDICT r11 next #8): with
    // the tail opt-in OFF and an explicit staleness budget, the same join
    // SQL serves the view's WATERMARK-PAIR content — a consistent older
    // snapshot of the whole star, asserted against a recompute at exactly
    // those pinned versions.
    def assertBudgetServes(epoch: Int): Unit = {
      spark.conf.set("spark.graft.agg.rewrite.maxStalenessMs", "600000")
      try {
        spark.catalog.refreshTable("soak_cat.analytics.fact")
        spark.catalog.refreshTable("soak_cat.analytics.dim")
        val vm = MaterializedJoin.viewMeta(fact, "jv").get
        val q = spark.sql(
          """SELECT f.id, f.fk, f.amt, d.attr
            |FROM soak_cat.analytics.fact f
            |JOIN soak_cat.analytics.dim d ON f.fk = d.k""".stripMargin)
        assert(graft.catalog.AggViewRewrite.served(q, "/join/"),
          s"epoch $epoch: the budget-stale join must serve from the " +
            s"view store:\n${q.queryExecution.optimizedPlan}")
        val want = fact.readSnapshot(vm.lVersion).as("l")
          .join(dim.readSnapshot(vm.dims.head.rVersion)
            .select(col("k"), col("attr")).as("r"),
            col("l.fk") === col("r.k"), "inner")
          .select(col("id"), col("fk"), col("amt"), col("attr"))
        assert(canon(q) == canon(want),
          s"epoch $epoch: budget serving must answer the watermark pair")
      } finally
        spark.conf.unset("spark.graft.agg.rewrite.maxStalenessMs")
    }

    val b8 = TableStore.bucketExpr(Seq("id"), 8)
    (1 to 4).foreach { e =>
      // 1. bucket-local CDC batch (auto-routes positional/eq)
      StreamingOps.applyCdcBatchAuto(
        factNow().filter(b8 === (e % 8)).limit(40)
          .withColumn("amt", col("amt") + e)
          .withColumn("seq", lit(e.toLong)).withColumn("op", lit("PUT")),
        fact, Seq("id"), 8)
      // 2. scattered CDC batch with deletes (eq route) on even epochs
      if (e % 2 == 0)
        StreamingOps.applyCdcBatchAuto(
          factNow().filter(col("id") % 57 === e)
            .withColumn("amt", col("amt") + 100L)
            .withColumn("seq", lit(100L + e))
            .withColumn("op", when(col("id") % 2 === 0, "REMOVE")
              .otherwise("PUT")),
          fact, Seq("id"), 8)
      // 3. dim churn (projected column — flows through the join view)
      dim.upsertEq(dim.readSnapshot()
        .filter(col("k").isin(e.toLong, e + 10L))
        .withColumn("attr", concat(lit(s"e$e"), col("attr")))
        .withColumn("op", lit("PUT")))
      // 3b. pyramid-dim churn (flows through the stacked level only)
      dim2.upsertEq(dim2.readSnapshot()
        .filter(col("xk").isin(s"x$e", s"x${e + 20}"))
        .withColumn("tier", concat(lit(s"e$e"), col("tier")))
        .withColumn("op", lit("PUT")))
      // 4. epoch-specific structural event
      if (e == 2) fact.compact(targetFiles = 2)
      if (e == 3) {
        // layout evolution mid-feed: rebucket is content-preserving, the
        // next refresh of each derivative routes appropriately
        fact.rebucket(16)
        ()
      }
      if (e == 4) {
        // write-audit-publish under the live stack: main advances
        // mid-audit, the branch rebases, publishes, and the next cadence
        // reconciles every derivative with the published rows
        fact.createBranch("audit")
        val br = fact.forBranch("audit")
        br.upsertEq(br.readSnapshot().filter(b8 === 1).limit(20)
          .withColumn("amt", col("amt") + 1000L)
          .withColumn("op", lit("PUT")))
        fact.upsertEq(factNow().filter(b8 === 2).limit(20)
          .withColumn("amt", col("amt") + 2000L)
          .withColumn("op", lit("PUT")))
        fact.rebaseBranch("audit")
        fact.fastForward("audit")
        fact.dropBranch("audit")
        ()
      }
      // 5. every layer is now stale — all three serving rungs hold:
      // tail union (exact), budget (watermark pair); exact post-cadence
      // is step 6's assert
      assertStaleServes(e)
      assertBudgetServes(e)
      // 6. ONE maintenance pass ends the epoch
      StreamingOps.maintain(fact, policy)
      assertAllFreshAndExact(e)
    }
    // hygiene: a 4-epoch feed must not accumulate unbounded snapshots in
    // any derivative store (each refresh is a commit)
    val stores = Seq(vs, MaterializedJoin.viewStore(vs, "jv2"),
      SecondaryIndex.indexStore(fact, "by_amt"),
      SecondaryIndex.indexStore(fact, "emb_ann"),
      MaterializedAgg.aggStore(fact, "base_agg"),
      MaterializedAgg.aggStore(vs, "by_attr"))
    stores.foreach { st =>
      assert(st.existingVersions().size <= policy.keepSnapshots + 1,
        s"derivative ${st.root} accumulated ${st.existingVersions().size} " +
          "snapshots under the cadence")
    }
  }
}
