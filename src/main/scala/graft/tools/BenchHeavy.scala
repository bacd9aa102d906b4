package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Machine-comparable heavy-tail benchmark (VERDICT r8 next #7): the sf0.1
  * per-query sweep is scheduling-noise-dominated (mean ~80 ms), so the
  * paths that actually cost something at scale — the CDC write paths,
  * purge, GSI refresh, the minhash family, SPJ, and now branch rebase —
  * get their own per-round JSON artifact at the 10x synthetic corpus
  * ([[HeavyProbe]]'s key-shifted replication). Emits ONE JSON object to
  * `BENCH_HEAVY_r<N>.json` (first arg, default `BENCH_HEAVY_r9.json`)
  * with this round's wall seconds alongside the round-8 baseline readings
  * (from NOTES.md round 8) so regressions diff mechanically.
  *
  * Run: sbt "runMain graft.tools.BenchHeavy [outFile] [copies]"
  */
object BenchHeavy {
  private val HeavyQueries = Seq(
    "cdc_apply", "dedup_fuzzy_minhash", "dedup_minhash_sql",
    "dedup_ngram_jaccard", "dedup_embedding", "dedup_clusters",
    "join_multi_q3", "join_multi_q5", "join_multi_q10", "text_chunk",
    "pipeline_decontaminate", "sample_stratified")

  /** The round this build belongs to — drives the default artifact name so
    * an argument-less run can never overwrite a PRIOR round's committed
    * baseline (ADVICE r12). */
  private val Round = 17

  /** Round-16 readings (BENCH_HEAVY_r16.json — RE-BASED r17, VERDICT
    * r16 next #6: the r13 baseline was three rounds and measurable box
    * drift stale): the baseline this round's artifact ships so
    * regressions diff mechanically. Probes new in r17 have no baseline
    * entry. */
  private val PriorBaseline: Map[String, Double] = Map(
    "agg_create" -> 2.176, "agg_mm_churn" -> 2.073,
    "agg_mm_commit" -> 3.476, "agg_mm_create" -> 4.433,
    "agg_refresh" -> 2.772, "agg_refresh_post_rebucket" -> 3.223,
    "agg_refresh_replay" -> 2.534, "agg_scan_group" -> 2.178,
    "agg_tail_mm_read" -> 18.266, "agg_tail_read" -> 1.624,
    "analyze_commit" -> 2.414, "analyze_full" -> 1.212,
    "analyze_incr" -> 0.187, "ann_brute" -> 0.94,
    "ann_brute_half" -> 0.407, "ann_commit" -> 2.729,
    "ann_create" -> 2.981, "ann_point" -> 0.397,
    "ann_point_half" -> 0.16, "ann_refresh" -> 1.422,
    "ann_retrain" -> 3.517, "ann_retrain_maxcells" -> 10.668,
    "ann_upsert" -> 1.736, "cdc_apply" -> 1.311,
    "commit_bucketed" -> 2.143, "count_bytestock" -> 0.323,
    "count_dv" -> 0.585, "count_dv2" -> 0.348,
    "count_eq" -> 1.0, "count_eq_prefix" -> 0.862,
    "count_purged" -> 0.158, "dedup_clusters" -> 6.504,
    "dedup_embedding" -> 1.383, "dedup_fuzzy_minhash" -> 2.19,
    "dedup_idx_batch" -> 0.969, "dedup_idx_commit" -> 1.068,
    "dedup_idx_create" -> 3.055, "dedup_idx_refresh" -> 1.893,
    "dedup_idx_upsert" -> 0.559, "dedup_minhash_sql" -> 2.38,
    "dedup_ngram_jaccard" -> 3.896, "delete_eq_prefix" -> 0.372,
    "delete_mor" -> 1.051, "gsi_create" -> 1.192,
    "gsi_refresh" -> 3.119, "join_multi_q10" -> 1.356,
    "join_multi_q3" -> 0.984, "join_multi_q5" -> 2.125,
    "jv2_create" -> 9.348, "jv2_dim_update" -> 0.891,
    "jv2_refresh_dim" -> 4.337, "jv2_status_commit" -> 1.723,
    "jv_create" -> 6.804, "jv_dim_commit" -> 3.326,
    "jv_dim_scatter" -> 1.671, "jv_dim_update" -> 0.718,
    "jv_fact_update" -> 2.134, "jv_fact_update_b" -> 2.46,
    "jv_refresh_dim" -> 4.215, "jv_refresh_dim_scatter" -> 3.807,
    "jv_refresh_fact" -> 3.719, "jv_refresh_fact_sync" -> 7.047,
    "jv_scan_join" -> 1.771, "jv_tail_dim_update" -> 0.764,
    "jv_tail_point_dim" -> 0.798, "jv_tail_point_fact" -> 1.464,
    "jv_tail_point_read" -> 5.363, "jv_tail_point_read_noprune" -> 5.115,
    "jv_tail_read" -> 5.017, "jv_tail_read_noprune" -> 4.516,
    "jv_tail_refresh" -> 12.473, "pipeline_decontaminate" -> 0.568,
    "purge_deletes" -> 2.7, "pyr_create" -> 5.204,
    "pyr_dim_commit" -> 1.229, "pyr_fact_update" -> 1.627,
    "pyr_scan_join3" -> 3.584, "pyr_tail_read" -> 8.056,
    "rebucket_composite" -> 2.929, "sample_stratified" -> 0.239,
    "sum_meta" -> 0.198, "sum_scan" -> 0.374,
    "text_chunk" -> 0.336, "upsert_eq" -> 1.912,
    "upsert_eq2" -> 1.78, "upsert_eq3" -> 2.046,
    "upsert_eq4" -> 1.895, "upsert_mor" -> 3.134,
    "upsert_mor2" -> 2.649, "wap_rebase_publish" -> 4.691)

  def main(args: Array[String]): Unit = {
    val outFile = args.headOption.getOrElse(s"BENCH_HEAVY_r$Round.json")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = graft.util.Scratch.dir("bench_heavy")
    val K = 10000000L

    def scaledCopy(name: String, keys: Seq[String]): Unit = {
      val base = graft.Tables.load(spark, src, name)
      (0 until copies)
        .map(i => keys.foldLeft(base)((df, k) =>
          df.withColumn(k, col(k) + lit(i * K))))
        .reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    scaledCopy("orders", Seq("o_orderkey", "o_custkey"))
    scaledCopy("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    scaledCopy("customer", Seq("c_custkey"))
    scaledCopy("supplier", Seq("s_suppkey"))
    scaledCopy("part", Seq("p_partkey"))
    scaledCopy("documents", Seq("doc_id"))
    scaledCopy("embeddings", Seq("vec_id"))
    Seq("nation", "region").foreach(n =>
      graft.Tables.load(spark, src, n)
        .write.mode("overwrite").parquet(s"$out/$n.parquet"))

    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    def t[A](label: String)(body: => A): A = {
      val s0 = System.nanoTime()
      val a = body
      val secs = (System.nanoTime() - s0) / 1e9
      timings(label) = math.rint(secs * 1000) / 1000
      System.err.println(f"[bench-heavy] $label%-28s $secs%7.2f s")
      a
    }

    spark.range(1000).selectExpr("sum(id)").collect() // warm
    HeavyQueries.foreach { name =>
      val times = (1 to 2).map { _ =>
        val s0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, out).count()
        val secs = (System.nanoTime() - s0) / 1e9
        spark.catalog.clearCache()
        secs
      }
      timings(name) = math.rint(times.min * 1000) / 1000
      System.err.println(f"[bench-heavy] $name%-28s ${times.min}%7.2f s (min of 2)")
    }

    // storage sequence — one-shot (each step mutates the table)
    val store = new graft.store.TableStore(spark, s"$out/orders_bench_store")
    val orders = spark.read.parquet(s"$out/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("double").as("o_totalprice"),
        col("o_orderstatus"))
    t("commit_bucketed") {
      store.commitBucketed(orders, keys = Seq("o_orderkey"), numBuckets = 64)
    }
    t("count_bytestock") { store.readSnapshot().count() }
    t("delete_mor") { store.deleteMor(col("o_orderkey") % 100 === 0) }
    t("count_dv") { store.readSnapshot().count() }
    val upd = orders.filter(col("o_orderkey") % 200 === 1)
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
      .withColumn("op", lit("U"))
    t("upsert_mor") { store.upsertMor(upd) }
    t("count_dv2") { store.readSnapshot().count() }
    t("purge_deletes") { store.purgeDeletes() }
    t("count_purged") { store.readSnapshot().count() }
    t("gsi_create") {
      graft.store.SecondaryIndex.create(store, "by_cust",
        Seq("o_custkey"), Seq("o_totalprice"), numBuckets = 16)
    }
    t("upsert_mor2") {
      store.upsertMor(upd.withColumn("o_totalprice",
        col("o_totalprice") + 2.0))
    }
    t("gsi_refresh") { graft.store.SecondaryIndex.refresh(store, "by_cust") }
    t("upsert_eq") {
      store.upsertEq(upd.withColumn("o_totalprice",
        col("o_totalprice") + 3.0))
    }
    t("count_eq") { store.readSnapshot().count() }
    // r9: incrementally-maintained aggregate view — create is the one
    // O(base) pass; the refresh after a SCATTERED eq upsert (worst case:
    // every bucket affected) is AUTO-ROUTED to a full recompute (the
    // changed-file fraction prices the 2× replay out), so agg_refresh
    // measures the router's choice; agg_refresh_replay pins the replay
    // path for cross-round comparability with the r8 semantics
    t("agg_create") {
      graft.store.MaterializedAgg.create(store, "by_cust_agg",
        Seq("o_custkey"), Nil, numBuckets = 16)
    }
    t("upsert_eq2") {
      store.upsertEq(upd.withColumn("o_totalprice",
        col("o_totalprice") + 6.0))
    }
    t("agg_refresh") { graft.store.MaterializedAgg.refresh(store, "by_cust_agg") }
    t("upsert_eq3") {
      store.upsertEq(upd.withColumn("o_totalprice",
        col("o_totalprice") + 7.0))
    }
    spark.conf.set("spark.graft.agg.refresh.rescanFraction", "2.0")
    t("agg_refresh_replay") {
      graft.store.MaterializedAgg.refresh(store, "by_cust_agg")
    }
    spark.conf.unset("spark.graft.agg.refresh.rescanFraction")
    // r9 additions: partial-key delete (zero base reads at any scale) and
    // the WAP rebase loop (fork -> stage -> main advances -> rebase ->
    // publish) on the 1.5M-row table
    // (o_orderkey) IS the full bucket key here, so rebucket onto a
    // composite key first to exercise the prefix-delete shape at scale —
    // timed separately (it is a full rewrite, a different cost class)
    t("rebucket_composite") {
      store.rebucket(64, Seq("o_orderkey", "o_orderstatus"))
    }
    t("delete_eq_prefix") {
      store.deleteEq(spark.range(1000)
        .select((col("id") * 997L % 1500000L).as("o_orderkey")))
    }
    t("count_eq_prefix") { store.readSnapshot().count() }
    t("wap_rebase_publish") {
      store.createBranch("bench_stage")
      val br = store.forBranch("bench_stage")
      br.upsertEq(upd.limit(5000).withColumn("o_totalprice",
        col("o_totalprice") + 4.0))
      // main advances mid-audit
      store.upsertEq(upd.limit(5000).withColumn("o_totalprice",
        col("o_totalprice") + 5.0))
      store.rebaseBranch("bench_stage")
      store.fastForward("bench_stage")
    }
    // r9 session 3: join-view maintenance at the heavy corpus — create is
    // the O(base) join (+ the covering index on the join column); the dim
    // refresh must stay O(changed dim keys × their fact buckets), never a
    // fact re-join
    val dimStore = new graft.store.TableStore(spark, s"$out/cust_dim_store")
    t("jv_dim_commit") {
      dimStore.commitBucketed(
        store.readSnapshot().select(col("o_custkey")).distinct()
          .withColumn("cust_tier",
            concat(lit("t"), col("o_custkey") % 5)),
        Seq("o_custkey"), 16)
    }
    t("jv_create") {
      graft.store.MaterializedJoin.create(store, "jv_bench", dimStore,
        Seq("o_custkey"), Seq("o_custkey"), Seq("cust_tier"))
    }
    // clustered dim churn (two hot keys, each joining ~1k fact rows): the
    // delta path — changed keys' index buckets only, never a fact pass
    t("jv_dim_update") {
      dimStore.upsertEq(dimStore.readSnapshot()
        .filter(col("o_custkey").isin(7L, 1007L))
        .withColumn("cust_tier", lit("t_hot"))
        .withColumn("op", lit("PUT")))
    }
    t("jv_refresh_dim") {
      graft.store.MaterializedJoin.refresh(store, "jv_bench")
    }
    // scattered dim churn (1% of keys → every dim file in the eq diff):
    // the ROUTER prices the delta out and recomputes in one join pass
    t("jv_dim_scatter") {
      dimStore.upsertEq(dimStore.readSnapshot()
        .filter(col("o_custkey") % 100 === 7)
        .withColumn("cust_tier", lit("t_scatter"))
        .withColumn("op", lit("PUT")))
    }
    t("jv_refresh_dim_scatter") {
      graft.store.MaterializedJoin.refresh(store, "jv_bench")
    }
    t("jv_fact_update") {
      store.upsertEq(upd.limit(5000).withColumn("o_totalprice",
        col("o_totalprice") + 8.0))
    }
    // VERDICT r11 next #4 — the invariant's price, split: `jv_refresh_fact`
    // with the eager lockstep index sync OFF (comparable to r10's 2.302 —
    // deployments without tailUnion pay exactly this), then another fact
    // delta refreshed WITH the sync (the default) as `jv_refresh_fact_sync`
    // (r11's 5.189 measured this shape).
    spark.conf.set("spark.graft.view.refresh.syncIndexes", "false")
    try t("jv_refresh_fact") {
      graft.store.MaterializedJoin.refresh(store, "jv_bench")
    } finally spark.conf.unset("spark.graft.view.refresh.syncIndexes")
    t("jv_fact_update_b") {
      store.upsertEq(upd.limit(5000).withColumn("o_totalprice",
        col("o_totalprice") + 9.0))
    }
    t("jv_refresh_fact_sync") {
      graft.store.MaterializedJoin.refresh(store, "jv_bench")
    }
    // r10: MULTI-DIM star view — ONE single-pass create reads the fact
    // once (persisted) and builds BOTH covering indexes plus the 2-dim
    // join from that read (r9's single-dim create was three O(fact)
    // passes at 40 s — the r10 jv_create above measures the same shape
    // post-fix, jv2_create the 2-dim shape)
    val statusDim = new graft.store.TableStore(spark,
      s"$out/status_dim_store")
    t("jv2_status_commit") {
      statusDim.commitBucketed(
        store.readSnapshot().select(col("o_orderstatus")).distinct()
          .withColumn("status_name",
            concat(lit("s_"), col("o_orderstatus"))),
        Seq("o_orderstatus"), 4)
    }
    t("jv2_create") {
      graft.store.MaterializedJoin.createMulti(store, "jv2_bench", Seq(
        graft.store.MaterializedJoin.Dim(dimStore,
          Seq("o_custkey"), Seq("o_custkey"), Seq("cust_tier")),
        graft.store.MaterializedJoin.Dim(statusDim,
          Seq("o_orderstatus"), Seq("o_orderstatus"), Seq("status_name"))))
    }
    // clustered churn on ONE dim of the star: the delta path must stay
    // O(changed keys' index buckets) with the other dim untouched
    t("jv2_dim_update") {
      dimStore.upsertEq(dimStore.readSnapshot()
        .filter(col("o_custkey").isin(23L, 2023L))
        .withColumn("cust_tier", lit("t_hot2"))
        .withColumn("op", lit("PUT")))
    }
    t("jv2_refresh_dim") {
      graft.store.MaterializedJoin.refresh(store, "jv2_bench")
    }
    // r10: FRESHNESS-TOLERANT serving at the heavy corpus — after a
    // bucket-local eq upsert the agg view is stale; the tail union reads
    // O(groups + changed files) where the fallback scan re-aggregates the
    // table (agg_scan_group). First re-point the view past the earlier
    // rebucket (that span is a full-diff — the router recomputes).
    t("agg_refresh_post_rebucket") {
      graft.store.MaterializedAgg.refresh(store, "by_cust_agg")
    }
    val bexpr = graft.store.TableStore.bucketExpr(
      Seq("o_orderkey", "o_orderstatus"), 64)
    t("upsert_eq4") {
      store.upsertEq(store.readSnapshot().filter(bexpr === 3)
        .withColumn("o_totalprice", col("o_totalprice") + 9.0)
        .withColumn("op", lit("PUT")))
    }
    t("agg_tail_read") {
      graft.store.MaterializedAgg.storedPlusTail(store,
        graft.store.MaterializedAgg.viewMeta(store, "by_cust_agg").get,
        store.currentVersion()).get.count()
    }
    t("agg_scan_group") {
      store.readSnapshot().groupBy(col("o_custkey"))
        .agg(count(lit(1))).count()
    }
    // r15 (VERDICT r14 next #8): the sql_agg_tail_mm SERVING READ as its
    // own probe — a MIN/MAX aggregate view served stale via
    // storedPlusTail after extrema-dirtying churn (retraction delete +
    // monotone insert), so a real regression of the dirty-group
    // covering-index recompute can never hide inside fixture noise.
    // The fixture legs time separately; agg_tail_mm_read is the pin.
    val mmStore = new graft.store.TableStore(spark, s"$out/li_mm_store")
    t("agg_mm_commit") {
      mmStore.commitBucketed(
        spark.read.parquet(s"$out/lineitem.parquet")
          .select(col("l_orderkey"), col("l_linenumber"),
            (col("l_orderkey") % 97).as("okb"),
            col("l_returnflag"),
            col("l_quantity").cast("decimal(18,2)").as("qty"),
            col("l_discount").cast("decimal(18,2)").as("disc")),
        keys = Seq("l_orderkey", "l_linenumber"), numBuckets = 16)
    }
    t("agg_mm_create") {
      graft.store.MaterializedAgg.create(mmStore, "by_flag_mm",
        Seq("okb", "l_returnflag"), Seq("qty"), numBuckets = 8,
        minMaxCols = Seq("disc"))
    }
    t("agg_mm_churn") {
      // retraction: remove many groups' extrema rows; monotone: new rows
      // below every stored minimum — both dirty-route shapes in one tail
      mmStore.deleteEq(
        mmStore.readSnapshot().filter(col("l_orderkey") % 10 === 4)
          .select(col("l_orderkey"), col("l_linenumber")))
      mmStore.commitAppend(mmStore.readSnapshot()
        .filter(col("l_orderkey") % 10 === 2)
        .withColumn("disc", lit("-1.50").cast("decimal(18,2)")))
    }
    t("agg_tail_mm_read") {
      graft.store.MaterializedAgg.storedPlusTail(mmStore,
        graft.store.MaterializedAgg.viewMeta(mmStore, "by_flag_mm").get,
        mmStore.currentVersion()).get.count()
    }

    // r11: JOIN-side freshness-tolerant serving at the heavy corpus —
    // jv_bench is already several fact commits stale (nothing refreshed
    // it since jv_refresh_fact); add dim churn on top and serve the
    // two-sided-stale view via storedPlusTail. The dim read is
    // BUCKET-PRUNED to the affected keys' buckets (the read-path twin of
    // the refresh economy, VERDICT r10 missing #3) — the _noprune probe
    // measures the same serve reading the dim whole; broadcast is
    // disabled for both so the dim read cost is visible (a
    // non-broadcastable dim is the case pruning exists for).
    t("jv_tail_dim_update") {
      dimStore.upsertEq(dimStore.readSnapshot()
        .filter(col("o_custkey").isin(31L, 1031L, 2031L))
        .withColumn("cust_tier", lit("t_tail"))
        .withColumn("op", lit("PUT")))
    }
    def jvTailCount(): Long = {
      val vm = graft.store.MaterializedJoin.viewMeta(store, "jv_bench").get
      val tl = graft.store.MaterializedJoin.storedPlusTail(store, vm,
        store.currentVersion(), Seq(dimStore.currentVersion()))
      require(tl.isDefined, "jv_bench must be tail-serveable here")
      tl.get.frame.count()
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // force the dim-prune machinery past its file-count gate (the toy
    // dim is below it; at real scale the gate passes on its own) so the
    // probe pair measures the machinery's cost, not the gate
    spark.conf.set("spark.graft.agg.rewrite.tail.pruneDimMinFiles", "1")
    try {
      t("jv_tail_read") { jvTailCount() }
      spark.conf.set("spark.graft.agg.rewrite.tail.pruneDims", "false")
      try t("jv_tail_read_noprune") { jvTailCount() }
      finally spark.conf.unset("spark.graft.agg.rewrite.tail.pruneDims")
      t("jv_scan_join") {
        store.readSnapshot().join(dimStore.readSnapshot(),
          Seq("o_custkey"), "inner").count()
      }
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    // r11: the case pruning exists FOR — POINT churn between cadence
    // passes (the live-feed steady state). The probe above churns a
    // whole fact bucket, so its rows' scattered keys saturate every
    // dim bucket and the pruned read correctly falls back to the full
    // dim (the pair measures that fallback's overhead). Here the view
    // is refreshed past the big spans first, then a handful of fact
    // PKs and two dim keys churn: the pruned re-join reads only those
    // keys' buckets, and the pair measures the economy. (The refresh
    // and DML run under DEFAULT broadcast config — only the serve
    // probes disable auto-broadcast to model a non-broadcastable dim;
    // the engine's own byte-gated hints still apply, as they would at
    // scale.)
    t("jv_tail_refresh") {
      graft.store.MaterializedJoin.refresh(store, "jv_bench")
    }
    t("jv_tail_point_fact") {
      store.upsertEq(store.readSnapshot()
        .filter(col("o_orderkey").isin(11L, 501011L, 1000011L))
        .withColumn("o_totalprice", col("o_totalprice") + 2.0)
        .withColumn("op", lit("PUT")))
    }
    t("jv_tail_point_dim") {
      dimStore.upsertEq(dimStore.readSnapshot()
        .filter(col("o_custkey").isin(97L, 1097L))
        .withColumn("cust_tier", lit("t_point"))
        .withColumn("op", lit("PUT")))
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      t("jv_tail_point_read") { jvTailCount() }
      spark.conf.set("spark.graft.agg.rewrite.tail.pruneDims", "false")
      try t("jv_tail_point_read_noprune") { jvTailCount() }
      finally spark.conf.unset("spark.graft.agg.rewrite.tail.pruneDims")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.graft.agg.rewrite.tail.pruneDimMinFiles")
    }

    // r11: PYRAMID tail-over-tail at the heavy corpus — a tier dim
    // stacks on the join view (level 2); the fact's point churn above is
    // STILL unrefreshed, so level 1 serves its tail delta and level 2
    // composes over it via storedPlusDeltaJoin. pyr_scan_join3 is the
    // plan the serve replaces (the full 3-way re-join).
    val jvStore = graft.store.MaterializedJoin.viewStore(store, "jv_bench")
    val tierDim = new graft.store.TableStore(spark, s"$out/tier_dim_store")
    t("pyr_dim_commit") {
      tierDim.commitBucketed(
        jvStore.readSnapshot().select(col("cust_tier")).distinct()
          .withColumn("tier_seg", concat(lit("s_"), col("cust_tier"))),
        Seq("cust_tier"), 4)
    }
    t("pyr_create") {
      graft.store.MaterializedJoin.create(jvStore, "jv2p", tierDim,
        Seq("cust_tier"), Seq("cust_tier"), Seq("tier_seg"))
    }
    t("pyr_fact_update") {
      store.upsertEq(store.readSnapshot()
        .filter(col("o_orderkey").isin(77L, 500077L, 1000077L))
        .withColumn("o_totalprice", col("o_totalprice") + 3.0)
        .withColumn("op", lit("PUT")))
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      t("pyr_tail_read") {
        val vm1 = graft.store.MaterializedJoin
          .viewMeta(store, "jv_bench").get
        val t1 = graft.store.MaterializedJoin.storedPlusTail(store, vm1,
          store.currentVersion(), Seq(dimStore.currentVersion())).get
        val vm2 = graft.store.MaterializedJoin
          .viewMeta(jvStore, "jv2p").get
        graft.store.MaterializedJoin.storedPlusDeltaJoin(jvStore, vm2,
          t1.pre, t1.post, t1.keys, Seq(tierDim.currentVersion())).get
          .frame.count()
      }
      t("pyr_scan_join3") {
        store.readSnapshot()
          .join(dimStore.readSnapshot(), Seq("o_custkey"), "inner")
          .join(tierDim.readSnapshot(), Seq("cust_tier"), "inner").count()
      }
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    // r12: PERSISTED ANN INDEX at the heavy corpus (VERDICT r11 next #2).
    // ann_create is the one O(corpus) pass the index ever costs (train +
    // assign + clustered write); ann_refresh prices the incremental
    // cadence (0.1% of vectors re-embedded); ann_point reads ONLY the
    // nProbe=2 of 32 cells' buckets vs ann_brute's full corpus scan over
    // the SAME stored table — the point/brute ratio is the sublinearity
    // the index buys, and it widens linearly with corpus size (the probed
    // fraction is nProbe/cells whatever the row count).
    {
      import spark.implicits._
      // ×4 the already-replicated corpus: the probes need enough vectors
      // that scan time dominates fixed per-query costs, or the point/brute
      // ratio measures plan overhead instead of the pruning
      val emb0 = spark.read.parquet(s"$out/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val embHeavy = (0 until 4)
        .map(i => emb0.withColumn("vec_id", col("vec_id") + lit(i * 10 * K)))
        .reduce(_ unionAll _)
      val annStore = new graft.store.TableStore(spark, s"$out/ann_store")
      t("ann_commit") {
        annStore.commitBucketed(embHeavy, Seq("vec_id"), 32)
      }
      t("ann_create") {
        graft.store.AnnIndex.create(annStore, "ann", "embedding",
          clusters = 32, iters = 2)
      }
      t("ann_upsert") {
        annStore.upsertEq(embHeavy.filter(col("vec_id") % 1000 === 7)
          .withColumn("embedding",
            transform(col("embedding"), x => (x * 1.01f).cast("float")))
          .withColumn("op", lit("PUT")))
      }
      t("ann_refresh") {
        graft.store.AnnIndex.refresh(annStore, "ann")
      }
      val qv = embHeavy.filter(col("vec_id") === 5L)
        .select("embedding").head().getSeq[Float](0).toArray
      t("ann_point") {
        graft.store.AnnIndex.topk(annStore, "ann", qv, k = 20, nProbe = 2,
          excludeId = Some(5L)).count()
      }
      t("ann_brute") {
        annStore.readSnapshot().select(col("vec_id"), col("embedding"))
          .as[(Long, Array[Float])]
          .mapPartitions(_.map { case (id, v) =>
            (id, graft.functions.VecKernels.cosine(v, qv)) })
          .toDF("vec_id", "cos").orderBy(col("cos").desc).limit(20).count()
      }
      // r17 (VERDICT r16 next #3): the UNBROADCAST batch route — a
      // 2,048-query batch through the persisted index with the cell
      // equi-join SHUFFLED (no broadcast of the batch side), per-query
      // rank partial-limited. Pins the wall time of the million-query
      // shape's join plan at bench scale.
      t("ann_batch_large") {
        val queries = embHeavy.filter(col("vec_id") % 557 === 3L)
          .limit(2048)
          .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
        graft.store.AnnIndex.topkBatch(annStore, "ann", queries,
          "q_id", "qv", k = 10, nProbe = 1,
          broadcastBatch = false).count()
      }
      // r13: centroid re-training on the current snapshot (atomic swap —
      // the one O(base) pass distribution drift costs, VERDICT r12 #2c)
      t("ann_retrain") {
        graft.store.AnnIndex.retrain(annStore, "ann", clusters = 32,
          iters = 2)
      }
      // r14 (VERDICT r13 next #7): re-train AT THE 4096-CELL CLAMP — the
      // case whose farthest-first reduction used to be
      // O(clusters² × pool × dim) of single-threaded driver CPU (minutes);
      // with the incremental + fork-join form this must stay single-digit
      // seconds of driver time on top of the distributed passes.
      t("ann_retrain_maxcells") {
        graft.store.AnnIndex.retrain(annStore, "ann", clusters = 4096,
          iters = 1)
      }
      // r13: persisted dedup index — the incremental-ingest serving path.
      // The pair to read: dedup_idx_batch (index-served batch dedup:
      // map-side batch signatures + bucket-targeted band join) vs
      // dedup_fuzzy_minhash above (the full-corpus sweep a pipeline
      // WITHOUT the index re-runs per batch).
      val docsHeavy = spark.read.parquet(s"$out/documents.parquet")
        .select(col("doc_id"), col("text"))
      val dedupStore = new graft.store.TableStore(spark, s"$out/dedup_idx")
      t("dedup_idx_commit") {
        dedupStore.commitBucketed(docsHeavy, Seq("doc_id"), 32)
      }
      // buckets sized to the trickle cadence (see DedupIndex.create
      // scaladoc): a 1-doc refresh touches ≤ 32 of 128 buckets < the 64
      // rebuild gate, so dedup_idx_refresh prices the INCREMENTAL replay;
      // the base write is timed separately (dedup_idx_upsert), mirroring
      // the ann_upsert/ann_refresh split
      t("dedup_idx_create") {
        graft.store.DedupIndex.create(dedupStore, "lsh", "text",
          maxSet = 256, numBuckets = 128)
      }
      t("dedup_idx_upsert") {
        dedupStore.upsertEq(docsHeavy.filter(col("doc_id") === 7L)
          .withColumn("doc_id", col("doc_id") + 90000000L)
          .withColumn("op", lit("PUT")))
      }
      t("dedup_idx_refresh") {
        graft.store.DedupIndex.refresh(dedupStore, "lsh")
      }
      t("dedup_idx_batch") {
        graft.store.DedupIndex.nearDups(dedupStore, "lsh",
          docsHeavy.filter(col("doc_id") % 250 === 3)
            .withColumn("doc_id", col("doc_id") + 95000000L),
          threshold = 0.5).count()
      }
      // r14: ANALYZE — per-file exact column sums → metadata-served SUM.
      // The pair to read: sum_meta (zero-I/O serve from analyzed sums) vs
      // sum_scan (the full pass every SUM paid before analyze).
      // analyze_full is the one bounded pass that buys it; analyze_incr is
      // the per-cadence steady state (only the appended file read).
      val liHeavy = spark.read.parquet(s"$out/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"),
          col("l_quantity").cast("decimal(12,2)").as("qty"))
      spark.conf.set("spark.sql.catalog.hb_cat",
        classOf[graft.catalog.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.hb_cat.warehouse", out)
      val anStore = new graft.store.TableStore(spark, s"$out/nsb/an_bench")
      t("analyze_commit") {
        anStore.commitSnapshot(liHeavy.repartition(32))
      }
      t("analyze_full") { anStore.analyze() }
      anStore.commitAppend(liHeavy.filter(col("l_orderkey") % 997 === 3)
        .coalesce(1))
      t("analyze_incr") { anStore.analyze() }
      val sumSql = "SELECT SUM(l_orderkey) AS sk, SUM(qty) AS sq, " +
        "COUNT(*) AS c FROM hb_cat.nsb.an_bench"
      t("sum_meta") {
        val df = spark.sql(sumSql)
        val plan = df.queryExecution.executedPlan.toString
        require(!plan.contains("Parquet"),
          s"sum_meta must serve zero-scan, got:\n$plan")
        df.collect()
      }
      t("sum_scan") {
        anStore.readSnapshot()
          .agg(sum(col("l_orderkey")), sum(col("qty")), count(lit(1)))
          .collect()
      }
      // SUBLINEARITY: the same index/query shapes on a HALF-SIZE corpus —
      // brute scales with rows; the point query scales with rows/cells ×
      // nProbe, so the point/brute ratio WIDENS with corpus size (compare
      // ann_point/ann_brute against ann_point_half/ann_brute_half)
      val embHalf = embHeavy.filter(col("vec_id") % 2 === 0)
      val halfStore = new graft.store.TableStore(spark, s"$out/ann_half")
      halfStore.commitBucketed(embHalf, Seq("vec_id"), 32)
      graft.store.AnnIndex.create(halfStore, "ann", "embedding",
        clusters = 32, iters = 2)
      t("ann_point_half") {
        graft.store.AnnIndex.topk(halfStore, "ann", qv, k = 20, nProbe = 2,
          excludeId = Some(5L)).count()
      }
      t("ann_brute_half") {
        halfStore.readSnapshot().select(col("vec_id"), col("embedding"))
          .as[(Long, Array[Float])]
          .mapPartitions(_.map { case (id, v) =>
            (id, graft.functions.VecKernels.cosine(v, qv)) })
          .toDF("vec_id", "cos").orderBy(col("cos").desc).limit(20).count()
      }
    }

    // ---- SELF-ADJUDICATION (VERDICT r12 next #6): any probe > 1.3× its
    // embedded baseline re-runs interleaved in the SAME process, so
    // cross-round drift is measured, not argued. Only the registered-query
    // probes are re-runnable (the storage sequence mutates its tables
    // one-shot); a flagged storage probe records repeatable=false. The
    // headline `timings` keep the FIRST readings untouched (one full run,
    // never per-probe minima); `adjudicated` carries the evidence.
    val adjudicated = scala.collection.mutable.LinkedHashMap[String, String]()
    timings.toSeq.foreach { case (name, first) =>
      PriorBaseline.get(name).filter(b => first > 1.3 * b).foreach { base =>
        if (HeavyQueries.contains(name)) {
          def one(): Double = {
            val s0 = System.nanoTime()
            graft.SparkEntry.queries(name)(spark, out).count()
            val secs = (System.nanoTime() - s0) / 1e9
            spark.catalog.clearCache()
            math.rint(secs * 1000) / 1000
          }
          val reruns = Seq(one(), one(), one())
          val best = (first +: reruns).min
          // can the probe still hit ~baseline speed in this process? then
          // the flag is box drift, not a code regression
          val verdict = if (best <= 1.15 * base) "drift" else "elevated"
          adjudicated(name) =
            s"""{"first":$first,"reruns":[${reruns.mkString(",")}],""" +
              s""""baseline":$base,"best":$best,"verdict":"$verdict"}"""
          System.err.println(f"[bench-heavy] ADJUDICATE $name%-22s " +
            f"first=$first reruns=${reruns.mkString("[", ",", "]")} " +
            f"baseline=$base -> $verdict")
        } else adjudicated(name) =
          s"""{"first":$first,"baseline":$base,"repeatable":false}"""
      }
    }

    def jmap(m: collection.Map[String, Double]) =
      m.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val adjJson = adjudicated
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"heavy_total","value":${math.rint(timings.values.sum * 100) / 100},"unit":"sec","copies":$copies,"src":"$src","timings":${jmap(timings)},"baseline_round":16,"prior_baseline":${jmap(PriorBaseline)},"adjudicated":$adjJson}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
