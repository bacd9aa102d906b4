package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.GraftCatalog
import graft.store.TableStore
import graft.streaming.StreamingOps

/** ANALYZE — per-file exact column sums (round 14): footer stats carry
  * COUNT/MIN/MAX but no sums, so `SUM(col)` always paid a full scan.
  * [[TableStore.analyze]] records the sums in the manifest stats with one
  * bounded incremental pass; the scan builder then serves metadata `SUM`
  * like COUNT/MIN/MAX, the hybrid rule merges analyzed sums with a
  * straddler scan, and everything declines (never lies) when any file
  * lacks proof. */
class AnalyzeSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse = {
    val w = Files.createTempDirectory("graft_analyze").toString
    spark.conf.set("spark.sql.catalog.an_cat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.an_cat.warehouse", w)
    w
  }

  /** (k LONG, n LONG nullable, price DECIMAL(10,2)) rows; n NULL when
    * k % 7 == 0 — SUM must skip them on both routes. */
  private def rows(from: Long, to: Long) =
    (from to to).map { k =>
      (k, if (k % 7 == 0) None else Some(k * 3), k % 100)
    }.toDF("k", "n", "p0")
      .withColumn("price", col("p0").cast("decimal(10,2)")).drop("p0")

  private def decEq(got: java.math.BigDecimal, want: BigDecimal): Boolean =
    got.compareTo(want.bigDecimal) == 0

  private def zeroScan(df: org.apache.spark.sql.DataFrame): Boolean =
    graft.util.PlanScans.metadataOnly(df) // structural, r17 hygiene

  test("inline tier: analyze records sums; SUM serves zero-scan and exact " +
      "(NULLs skipped, decimal exact), and a commit-without-analyze declines") {
    val store = new TableStore(spark, s"$warehouse/analytics/an_inline")
    store.commitSnapshot(rows(1, 400).coalesce(1))
    store.commitAppend(rows(401, 700).coalesce(1))
    val v = store.analyze()
    assert(v == store.currentVersion() && v == 2L,
      s"analyze must commit the next version, got $v")
    // the commit is content-preserving metadata: same file list
    assert(store.manifest(v).inlineFiles.toSet ==
      store.manifest(v - 1).inlineFiles.toSet)
    assert(store.manifest(v).props.get(TableStore.ContentPreservingProp)
      .contains("true"))
    spark.catalog.refreshTable("an_cat.analytics.an_inline")
    val q = "SELECT COUNT(*) AS c, SUM(n) AS sn, SUM(price) AS sp " +
      "FROM an_cat.analytics.an_inline"
    val served = spark.sql(q)
    assert(zeroScan(served), s"SUM must serve from analyzed stats:\n" +
      served.queryExecution.executedPlan)
    val r = served.collect().head
    val expN = (1L to 700L).filter(_ % 7 != 0).map(_ * 3).sum
    val expP = BigDecimal((1L to 700L).map(_ % 100).sum).setScale(2)
    assert(r.getLong(0) == 700 && r.getLong(1) == expN &&
      decEq(r.getDecimal(2), expP))
    // AVG rides for free: Spark's partial aggregate pushdown rewrites it
    // to SUM + COUNT, both of which the analyzed stats serve — the mean
    // query is zero-scan too, and exact (integer sum divided once)
    val avg = spark.sql("SELECT AVG(n) AS an, AVG(price) AS ap " +
      "FROM an_cat.analytics.an_inline")
    assert(zeroScan(avg), s"AVG must serve via pushed SUM+COUNT:\n" +
      avg.queryExecution.executedPlan)
    val ar = avg.collect().head
    val nk = (1L to 700L).filterNot(_ % 7 == 0)
    assert(ar.getDouble(0) == nk.map(_ * 3).sum.toDouble / nk.size)
    // a new un-analyzed file breaks the proof: the serve must DECLINE to a
    // scan (still exact), never serve a stale/partial total
    store.commitAppend(rows(701, 720).coalesce(1))
    spark.catalog.refreshTable("an_cat.analytics.an_inline")
    val declined = spark.sql(q)
    assert(!zeroScan(declined),
      "an un-analyzed file must decline the metadata SUM")
    assert(declined.collect().head.getLong(0) == 720)
  }

  test("incremental: the second analyze reads ONLY the new file") {
    val store = new TableStore(spark, s"$warehouse/analytics/an_incr")
    // three base files: the one appended file stays under the 0.5
    // full-pass routing fraction
    store.commitSnapshot(rows(1, 250).coalesce(1))
    store.commitAppend(rows(251, 400).coalesce(1))
    store.commitAppend(rows(401, 500).coalesce(1))
    store.analyze()
    store.commitAppend(rows(501, 540).coalesce(1))
    val read = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          read.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      store.analyze()
      Thread.sleep(2000)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(read.get() < 250,
      s"incremental analyze re-read the corpus: ${read.get()} records " +
        "(only the 40-row appended file should pay)")
    // and the enriched stats really cover every file now
    val m = store.manifest(store.currentVersion())
    assert(m.inlineFiles.forall(f =>
      m.inlineStats(f).cols("n").sum.isDefined))
    // nothing needy -> analyze is a no-op, no empty commit
    val cur = store.currentVersion()
    assert(store.analyze() == cur)
  }

  test("all-null column sums to NULL; float columns refuse analysis") {
    val store = new TableStore(spark, s"$warehouse/analytics/an_null")
    store.commitSnapshot(
      (1L to 50L).map(k => (k, None: Option[Long], k.toDouble))
        .toDF("k", "empty", "f").coalesce(1))
    store.analyze(Seq("k", "empty"))
    spark.catalog.refreshTable("an_cat.analytics.an_null")
    val served = spark.sql(
      "SELECT SUM(empty) AS se, SUM(k) AS sk FROM an_cat.analytics.an_null")
    assert(zeroScan(served))
    val r = served.collect().head
    assert(r.isNullAt(0) && r.getLong(1) == (1L to 50L).sum)
    intercept[IllegalArgumentException] { store.analyze(Seq("f")) }
    intercept[IllegalArgumentException] { store.analyze(Seq("nope")) }
  }

  test("delete vectors mask rows the sums still count: SUM declines under " +
      "DVs and stays exact through the scan") {
    val store = new TableStore(spark, s"$warehouse/analytics/an_dv")
    store.commitBucketed(rows(1, 300), Seq("k"), 4)
    store.analyze()
    spark.catalog.refreshTable("an_cat.analytics.an_dv")
    val q = "SELECT SUM(n) AS sn FROM an_cat.analytics.an_dv"
    assert(zeroScan(spark.sql(q)))
    store.deleteMor(col("k") <= 10)
    spark.catalog.refreshTable("an_cat.analytics.an_dv")
    val masked = spark.sql(q)
    assert(!zeroScan(masked), "a DV'd snapshot must decline the metadata SUM")
    assert(masked.collect().head.getLong(0) ==
      (11L to 300L).filter(_ % 7 != 0).map(_ * 3).sum)
  }

  test("sharded tier: analyze merges sums in one distributed shard " +
      "rewrite; the unfiltered serve sweeps them with zero data-file I/O") {
    val store = new TableStore(spark, s"$warehouse/analytics/an_shard")
    spark.conf.set("spark.graft.manifest.inlineThreshold", "2")
    try {
      store.commitSnapshot(rows(1, 200).coalesce(1))
      (1 to 3).foreach(i =>
        store.commitAppend(rows(i * 200 + 1, i * 200 + 200).coalesce(1)))
      assert(store.manifest(store.currentVersion()).isSharded,
        "fixture error: the table must sit on the sharded tier")
      store.analyze()
      assert(store.manifest(store.currentVersion()).isSharded,
        "analyze must keep the metadata tier")
    } finally spark.conf.unset("spark.graft.manifest.inlineThreshold")
    spark.catalog.refreshTable("an_cat.analytics.an_shard")
    val served = spark.sql(
      "SELECT COUNT(*) AS c, SUM(n) AS sn, SUM(price) AS sp " +
        "FROM an_cat.analytics.an_shard")
    assert(zeroScan(served), s"sharded SUM must serve from analyzed stats:\n" +
      served.queryExecution.executedPlan)
    val r = served.collect().head
    assert(r.getLong(0) == 800 &&
      r.getLong(1) == (1L to 800L).filter(_ % 7 != 0).map(_ * 3).sum &&
      decEq(r.getDecimal(2),
        BigDecimal((1L to 800L).map(_ % 100).sum).setScale(2)))
    // NDV rides the SAME sharded pass: the sidecar covers all four files
    // and $column_stats serves the (exact, low-cardinality) estimate
    // through the distributed sweep
    val st = store.readNdvState().get
    assert(st.gen == 1 && st.files == 4)
    val cs = spark.sql("SELECT col_name, ndv_est FROM " +
        "an_cat.analytics.`an_shard$column_stats`")
      .collect().map(r2 => r2.getString(0) -> r2.getLong(1)).toMap
    assert(cs("price") == 100, s"price has 100 distinct values, got $cs")
  }

  test("hybrid filtered SUM: declines before analyze, then serves with " +
      "only the straddler scanned") {
    val store = new TableStore(spark, s"$warehouse/analytics/an_hybrid")
    val base = rows(1, 800).withColumn("seg", col("k") % 8)
    store.commitSnapshot(base.filter(col("seg") <= 1).coalesce(1))
    Seq((2, 3), (4, 5), (6, 7)).foreach { case (a, b) =>
      store.commitAppend(
        base.filter(col("seg") >= a && col("seg") <= b).coalesce(1))
    }
    spark.catalog.refreshTable("an_cat.analytics.an_hybrid")
    val q = "SELECT COUNT(*) AS c, SUM(n) AS sn, SUM(price) AS sp " +
      "FROM an_cat.analytics.an_hybrid WHERE seg <= 2"
    val before = spark.sql(q)
    assert(!graft.catalog.HybridMetaAgg.served(before),
      "without analyzed sums the hybrid SUM must decline")
    store.analyze()
    spark.catalog.refreshTable("an_cat.analytics.an_hybrid")
    val after = spark.sql(q)
    assert(graft.catalog.HybridMetaAgg.served(after),
      s"analyzed straddled SUM must take the hybrid serve:\n" +
        after.queryExecution.optimizedPlan)
    assert(after.inputFiles.length == 1,
      s"only the straddler file may scan, got ${after.inputFiles.length}")
    val ks = (1L to 800L).filter(_ % 8 <= 2)
    val r = after.collect().head
    assert(r.getLong(0) == ks.size &&
      r.getLong(1) == ks.filter(_ % 7 != 0).map(_ * 3).sum &&
      decEq(r.getDecimal(2),
        BigDecimal(ks.map(_ % 100).sum).setScale(2)))
  }

  test("GROUP BY metadata aggregates: per-file-constant keys (and an " +
      "all-NULL group file) serve with ZERO data files; parity with the " +
      "scan plan") {
    val store = new TableStore(spark, s"$warehouse/analytics/an_group")
    val base = rows(1, 800).withColumn("seg",
      when(col("k") % 10 === 0, lit(null)).otherwise(col("k") % 4))
    // one file per live seg value + one file of NULL-seg rows: every
    // file's group key is PROVEN from stats (constant, or all-NULL)
    store.commitSnapshot(base.filter(col("seg") === 0).coalesce(1))
    (1 to 3).foreach(i =>
      store.commitAppend(base.filter(col("seg") === i).coalesce(1)))
    store.commitAppend(base.filter(col("seg").isNull).coalesce(1))
    store.analyze()
    spark.catalog.refreshTable("an_cat.analytics.an_group")
    val q = "SELECT seg, COUNT(*) AS c, COUNT(n) AS cn, SUM(n) AS sn, " +
      "SUM(price) AS sp, MIN(k) AS mn, MAX(k) AS mx " +
      "FROM an_cat.analytics.an_group GROUP BY seg " +
      "ORDER BY seg ASC NULLS FIRST"
    val served = spark.sql(q)
    assert(graft.catalog.HybridMetaAgg.served(served),
      s"chunked GROUP BY must serve from metadata:\n" +
        served.queryExecution.optimizedPlan)
    assert(served.inputFiles.isEmpty,
      s"all group keys are proven — no data file may scan, " +
        s"got ${served.inputFiles.length}")
    val got = served.collect().map(_.toString).toSeq
    spark.conf.set("spark.graft.agg.metadata.hybrid", "false")
    val want =
      try spark.sql(q).collect().map(_.toString).toSeq
      finally spark.conf.unset("spark.graft.agg.metadata.hybrid")
    assert(got == want, s"hybrid GROUP BY diverged:\ngot  $got\nwant $want")
    assert(got.size == 5) // four live segs + the NULL group
    // GROUP BY composes with a FULLY-DECIDABLE WHERE: exact pushdown
    // consumes the Filter node, the registry hands the consumed predicate
    // back to the rule, and the grouped serve stays ZERO-file
    val qd = "SELECT seg, COUNT(*) AS c, SUM(n) AS sn " +
      "FROM an_cat.analytics.an_group WHERE seg <= 2 " +
      "GROUP BY seg ORDER BY seg ASC NULLS FIRST"
    val dServed = spark.sql(qd)
    assert(graft.catalog.HybridMetaAgg.served(dServed),
      s"decidable-WHERE GROUP BY must serve:\n" +
        dServed.queryExecution.optimizedPlan)
    assert(dServed.inputFiles.isEmpty,
      s"all kept files are proven — zero data files, " +
        s"got ${dServed.inputFiles.length}")
    val gotD = dServed.collect().map(_.toString).toSeq
    spark.conf.set("spark.graft.agg.metadata.hybrid", "false")
    val wantD =
      try spark.sql(qd).collect().map(_.toString).toSeq
      finally spark.conf.unset("spark.graft.agg.metadata.hybrid")
    assert(gotD == wantD,
      s"decidable hybrid GROUP BY diverged:\ngot  $gotD\nwant $wantD")
    assert(gotD.size == 3) // segs 0..2; seg 3 and the NULL group filtered

    // GROUP BY composes with a STRADDLING WHERE too: k-range-chunked
    // files with a range-derived group column, filtered mid-chunk — the
    // in-range chunk serves from stats, ONLY the straddler scans
    val store2 = new TableStore(spark, s"$warehouse/analytics/an_group_f")
    val b2 = rows(1, 800)
      .withColumn("seg", ((col("k") - 1) / lit(200)).cast("long"))
    (0 to 3).foreach { i =>
      val chunk = b2.filter(col("k") > i * 200 && col("k") <= (i + 1) * 200)
        .coalesce(1)
      if (i == 0) store2.commitSnapshot(chunk) else store2.commitAppend(chunk)
    }
    store2.analyze()
    spark.catalog.refreshTable("an_cat.analytics.an_group_f")
    val qf = "SELECT seg, COUNT(*) AS c, SUM(n) AS sn " +
      "FROM an_cat.analytics.an_group_f WHERE k <= 250 " +
      "GROUP BY seg ORDER BY seg ASC NULLS FIRST"
    val fServed = spark.sql(qf)
    assert(graft.catalog.HybridMetaAgg.served(fServed),
      s"filtered GROUP BY must serve:\n${fServed.queryExecution.optimizedPlan}")
    assert(fServed.inputFiles.length == 1,
      s"only the straddler chunk may scan, got ${fServed.inputFiles.length}")
    val gotF = fServed.collect().map(_.toString).toSeq
    spark.conf.set("spark.graft.agg.metadata.hybrid", "false")
    val wantF =
      try spark.sql(qf).collect().map(_.toString).toSeq
      finally spark.conf.unset("spark.graft.agg.metadata.hybrid")
    assert(gotF == wantF,
      s"filtered hybrid GROUP BY diverged:\ngot  $gotF\nwant $wantF")
  }

  test("expression grouping (r15): monotone chains prove from truncated " +
      "bounds, non-monotone extractions need a constant input, AVG derives " +
      "from SUM/COUNT partials — each with rule-off parity") {
    // year-chunked timestamps: ts SPANS each file's year (min < max), so
    // only the monotone truncation proof can serve; plus an all-NULL file
    val store = new TableStore(spark, s"$warehouse/analytics/an_gexpr")
    val base = rows(1, 800).withColumn("ts",
      when(col("k") % 10 === 0, lit(null))
        .otherwise(date_add(lit("2020-01-01").cast("date"),
          col("k").cast("int")).cast("timestamp")))
    val live = base.filter(col("ts").isNotNull)
    store.commitSnapshot(live.filter(year(col("ts")) === 2020).coalesce(1))
    Seq(2021, 2022).foreach(y =>
      store.commitAppend(live.filter(year(col("ts")) === y).coalesce(1)))
    store.commitAppend(base.filter(col("ts").isNull).coalesce(1))
    store.analyze()
    spark.catalog.refreshTable("an_cat.analytics.an_gexpr")

    def parity(q: String, wantServed: Boolean, maxFiles: Int = 0): Unit = {
      val df = spark.sql(q)
      assert(graft.catalog.HybridMetaAgg.served(df) == wantServed,
        s"served=${!wantServed} unexpected for:\n$q\n" +
          df.queryExecution.optimizedPlan)
      if (wantServed)
        assert(df.inputFiles.length <= maxFiles,
          s"expected ≤ $maxFiles scanned files, got ${df.inputFiles.length}")
      val got = df.collect().map(_.toString).toSeq
      spark.conf.set("spark.graft.agg.metadata.hybrid", "false")
      val want =
        try spark.sql(q).collect().map(_.toString).toSeq
        finally spark.conf.unset("spark.graft.agg.metadata.hybrid")
      assert(got == want, s"hybrid diverged on:\n$q\ngot  $got\nwant $want")
    }

    // date_trunc over a spanning range: monotone proof, zero files, and
    // the all-NULL file lands in the SQL NULL group
    parity("SELECT date_trunc('year', ts) AS yr, COUNT(*) AS c, " +
      "SUM(n) AS sn, MIN(k) AS mn FROM an_cat.analytics.an_gexpr " +
      "GROUP BY 1 ORDER BY yr ASC NULLS FIRST", wantServed = true)
    // year() extraction is monotone too
    parity("SELECT year(ts) AS y, COUNT(*) AS c FROM " +
      "an_cat.analytics.an_gexpr GROUP BY 1 ORDER BY y ASC NULLS FIRST",
      wantServed = true)
    // month() over a year-spanning file carries NO range proof: only the
    // all-NULL file proves (the NULL group), all three live files scan
    parity("SELECT month(ts) AS m, COUNT(*) AS c FROM " +
      "an_cat.analytics.an_gexpr GROUP BY 1 ORDER BY m ASC NULLS FIRST",
      wantServed = true, maxFiles = 3)
    // … and with no provable file at all the rewrite declines outright
    val storeSpan = new TableStore(spark, s"$warehouse/analytics/an_gspan")
    storeSpan.commitSnapshot(live.filter(year(col("ts")) === 2020).coalesce(1))
    storeSpan.commitAppend(live.filter(year(col("ts")) === 2021).coalesce(1))
    storeSpan.analyze()
    spark.catalog.refreshTable("an_cat.analytics.an_gspan")
    parity("SELECT month(ts) AS m, COUNT(*) AS c FROM " +
      "an_cat.analytics.an_gspan GROUP BY 1 ORDER BY m ASC NULLS FIRST",
      wantServed = false)
    // floor division by a positive literal is monotone: year files carry
    // k ranges [1,365] [366,729] [731,799] (+ the null-ts file [10,800]),
    // so under k div 400 the first and third chunks prove (both bounds in
    // bucket 0 resp. 1) and the two straddlers scan — parity
    parity("SELECT k div 400 AS b, COUNT(*) AS c, SUM(n) AS sn FROM " +
      "an_cat.analytics.an_gexpr GROUP BY 1 ORDER BY b ASC NULLS FIRST",
      wantServed = true, maxFiles = 2)

    // non-monotone month() DOES serve when the input is per-file CONSTANT
    val store2 = new TableStore(spark, s"$warehouse/analytics/an_gconst")
    val cbase = rows(1, 300).withColumn("ts",
      when(col("k") <= 100, lit("2020-01-15"))
        .when(col("k") <= 200, lit("2020-02-15"))
        .otherwise(lit("2021-01-15")).cast("timestamp"))
    store2.commitSnapshot(cbase.filter(col("k") <= 100).coalesce(1))
    store2.commitAppend(
      cbase.filter(col("k") > 100 && col("k") <= 200).coalesce(1))
    store2.commitAppend(cbase.filter(col("k") > 200).coalesce(1))
    store2.analyze()
    spark.catalog.refreshTable("an_cat.analytics.an_gconst")
    parity("SELECT month(ts) AS m, COUNT(*) AS c FROM " +
      "an_cat.analytics.an_gconst GROUP BY 1 ORDER BY m ASC NULLS FIRST",
      wantServed = true)

    // AVG: integral input derives as SUM/COUNT (zero files, grouped and
    // filtered-global), decimal input keeps the scan
    parity("SELECT year(ts) AS y, AVG(n) AS a, COUNT(n) AS c FROM " +
      "an_cat.analytics.an_gexpr GROUP BY 1 ORDER BY y ASC NULLS FIRST",
      wantServed = true)
    // k ≤ 729: the first two year chunks prove all-match, chunk 3 is
    // pruned, only the wide null-ts file straddles and scans
    parity("SELECT AVG(n) AS a FROM an_cat.analytics.an_gexpr " +
      "WHERE k <= 729", wantServed = true, maxFiles = 1)
    parity("SELECT year(ts) AS y, AVG(price) AS a FROM " +
      "an_cat.analytics.an_gexpr GROUP BY 1 ORDER BY y ASC NULLS FIRST",
      wantServed = false)
    // AVG without analyzed sums declines (no partial to derive from)
    val store3 = new TableStore(spark, s"$warehouse/analytics/an_gnoan")
    store3.commitSnapshot(rows(1, 200).withColumn("seg", col("k") % 2)
      .coalesce(1))
    store3.commitAppend(rows(201, 400).withColumn("seg", col("k") % 2)
      .coalesce(1))
    spark.catalog.refreshTable("an_cat.analytics.an_gnoan")
    parity("SELECT seg, AVG(n) AS a FROM an_cat.analytics.an_gnoan " +
      "GROUP BY seg ORDER BY seg ASC NULLS FIRST", wantServed = false)
  }

  test("NDV sketches + $column_stats: exact at low cardinality, merged on " +
      "append, as-of kept under a partial rewrite, re-based by ndvRescan") {
    // Part A — append-merge on a plain snapshot store (appends add one
    // file; a bucketed append would cluster into every bucket and
    // legitimately take the full-pass route)
    val store = new TableStore(spark, s"$warehouse/analytics/an_ndv")
    def mk(from: Long, to: Long) =
      rows(from, to).withColumn("cat", col("k") % 10)
    store.commitSnapshot(mk(1, 100).coalesce(1))
    store.commitAppend(mk(101, 200).coalesce(1))
    store.commitAppend(mk(201, 300).coalesce(1))
    store.commitAppend(mk(301, 400).coalesce(1))
    store.analyze()
    val st1 = store.readNdvState().get
    assert(st1.gen == 1 && st1.files == 4 &&
      st1.version == store.currentVersion())
    spark.catalog.refreshTable("an_cat.analytics.an_ndv")
    def stats(tbl: String): Map[String, org.apache.spark.sql.Row] =
      spark.sql("SELECT col_name, ndv_est, null_count, min_v, max_v, " +
          s"sum_v, ndv_as_of, ndv_covered_files, n_files FROM " +
          s"an_cat.analytics.`$tbl$$column_stats`")
        .collect().map(r => r.getString(0) -> r).toMap
    val s1 = stats("an_ndv")
    // cat has 10 distinct values — HLL is EXACT at this cardinality
    assert(s1("cat").getLong(1) == 10)
    // k: 400 distinct — allow the documented estimate tolerance
    assert(math.abs(s1("k").getLong(1) - 400) <= 20)
    assert(s1("cat").getLong(2) == 0 && s1("cat").getString(3) == "0" &&
      s1("cat").getString(4) == "9")
    assert(s1("n").getLong(2) == (1L to 400L).count(_ % 7 == 0))
    assert(s1("price").getString(5) ==
      BigDecimal((1L to 400L).map(_ % 100).sum).setScale(2).toString)
    // append + analyze: the sketch MERGES (same generation, +1 file) and
    // the new values surface in the estimate
    store.commitAppend(mk(401, 430).withColumn("cat", col("k") % 10 + 10)
      .coalesce(1))
    store.analyze()
    val st2 = store.readNdvState().get
    assert(st2.gen == 1 && st2.files == 5 &&
      st2.version == store.currentVersion())
    spark.catalog.refreshTable("an_cat.analytics.an_ndv")
    val s2 = stats("an_ndv")
    assert(s2("cat").getLong(1) == 20) // 10 original + 10 shifted values
    assert(s2("cat").getLong(7) == 5 && s2("cat").getLong(8) == 5)

    // Part B — a PARTIAL rewrite (bucket-targeted commitIncremental)
    // removes a covered file: the sidecar stops merging and keeps its
    // honest as-of; sums stay incremental; ndvRescan re-bases
    val store2 = new TableStore(spark, s"$warehouse/analytics/an_ndv2")
    store2.commitBucketed(mk(1, 400), Seq("k"), 4)
    store2.analyze()
    val st3a = store2.readNdvState().get
    assert(st3a.gen == 1 && st3a.files == 4)
    val touched = store2.readBuckets(Seq(0L))
    store2.commitIncremental(touched, Seq(0L))
    store2.analyze()
    val st3 = store2.readNdvState().get
    assert(st3.version == st3a.version && st3.gen == 1,
      "an invalidated sketch must keep its as-of, not silently merge")
    spark.catalog.refreshTable("an_cat.analytics.an_ndv2")
    val s3 = stats("an_ndv2")
    assert(s3("cat").getLong(6) == st3a.version) // ndv_as_of stays honest
    assert(s3("cat").getString(5) != null, "sums must still serve")
    // opt-in re-base: one full pass, fresh generation, as-of at head
    spark.conf.set("spark.graft.analyze.ndvRescan", "true")
    try store2.analyze()
    finally spark.conf.unset("spark.graft.analyze.ndvRescan")
    val st4 = store2.readNdvState().get
    assert(st4.gen == 2 && st4.version == store2.currentVersion())
    spark.catalog.refreshTable("an_cat.analytics.an_ndv2")
    val s4 = stats("an_ndv2")
    assert(s4("cat").getLong(1) == 10 &&
      s4("cat").getLong(6) == store2.currentVersion() &&
      s4("cat").getLong(7) == s4("cat").getLong(8))
  }

  test("CBO feed: with spark.sql.cbo.enabled the scan reports per-column " +
      "V2 statistics (manifest min/max/nulls + analyze NDV) into the " +
      "relation's attributeStats") {
    val store = new TableStore(spark, s"$warehouse/analytics/an_cbo")
    store.commitBucketed(rows(1, 300).withColumn("cat", col("k") % 10),
      Seq("k"), 4)
    store.analyze()
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      spark.catalog.refreshTable("an_cat.analytics.an_cbo")
      val df = spark.sql(
        "SELECT k, cat FROM an_cat.analytics.an_cbo WHERE cat > 2")
      val rel = df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation => r
      }.head
      val stats = rel.stats.attributeStats
      val catStat = stats.find(_._1.name == "cat").map(_._2)
        .getOrElse(fail(s"no column stats for 'cat' in ${stats}"))
      assert(catStat.distinctCount.contains(BigInt(10)),
        s"NDV must feed the CBO, got ${catStat.distinctCount}")
      assert(catStat.nullCount.contains(BigInt(0)))
      assert(catStat.min.contains(0L) && catStat.max.contains(9L),
        s"manifest bounds must feed the CBO, got ${catStat.min}/${catStat.max}")
      // the k column (bucket key) reports too
      assert(stats.exists(_._1.name == "k"))
    } finally spark.conf.unset("spark.sql.cbo.enabled")
    // CBO off: no column stats computed, no sidecar read at plan time
    spark.catalog.refreshTable("an_cat.analytics.an_cbo")
    val off = spark.sql("SELECT k FROM an_cat.analytics.an_cbo")
    val relOff = off.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2
        .DataSourceV2ScanRelation => r
    }.head
    assert(relOff.stats.attributeStats.isEmpty)

    // SHARDED tier (r15): bounds/nulls come from the one distributed
    // columnStatsSweep — the 100 TB tier prices joins from real bounds
    val storeS = new TableStore(spark, s"$warehouse/analytics/an_cbo_s")
    spark.conf.set("spark.graft.manifest.inlineThreshold", "2")
    try {
      storeS.commitSnapshot(
        rows(1, 150).withColumn("cat", col("k") % 10).coalesce(1))
      (1 to 2).foreach(i => storeS.commitAppend(
        rows(i * 150 + 1, (i + 1) * 150).withColumn("cat", col("k") % 10)
          .coalesce(1)))
      storeS.analyze()
      assert(storeS.manifest(storeS.currentVersion()).isSharded)
    } finally spark.conf.unset("spark.graft.manifest.inlineThreshold")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      spark.catalog.refreshTable("an_cat.analytics.an_cbo_s")
      val dfS = spark.sql(
        "SELECT k, cat, n FROM an_cat.analytics.an_cbo_s WHERE cat > 2")
      val relS = dfS.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation => r
      }.head
      val statsS = relS.stats.attributeStats
      val kStat = statsS.find(_._1.name == "k").map(_._2)
        .getOrElse(fail(s"no sharded column stats for 'k' in $statsS"))
      assert(kStat.min.contains(1L) && kStat.max.contains(450L),
        s"sharded bounds must feed the CBO, got ${kStat.min}/${kStat.max}")
      assert(kStat.nullCount.contains(BigInt(0)))
      val nStat = statsS.find(_._1.name == "n").map(_._2)
        .getOrElse(fail("no sharded column stats for 'n'"))
      assert(nStat.nullCount.exists(_ > 0), // the k%7 NULL plants
        s"sharded null counts must feed the CBO, got ${nStat.nullCount}")
    } finally spark.conf.unset("spark.sql.cbo.enabled")
  }

  test("the maintenance cadence keeps sums fresh (analyzeCols policy): " +
      "compaction's fresh files re-analyze in the same pass") {
    val store = new TableStore(spark, s"$warehouse/analytics/an_maint")
    store.commitBucketed(rows(1, 300), Seq("k"), 4)
    store.analyze()
    // churn + hygiene: the upsert adds files, compact rewrites buckets —
    // both mint sum-less files; the cadence analyze restores the proof
    store.upsertEq((301L to 320L).map(k => (k, Some(k * 3), k % 100, "PUT"))
      .toDF("k", "n", "p0", "op")
      .withColumn("price", col("p0").cast("decimal(10,2)"))
      .select("k", "n", "price", "op"))
    StreamingOps.maintain(store, StreamingOps.CdcMaintenance(
      maxFilesPerBucket = 1, maxDvFiles = 0, analyzeCols = Some(Nil)))
    spark.catalog.refreshTable("an_cat.analytics.an_maint")
    val served = spark.sql(
      "SELECT SUM(n) AS sn FROM an_cat.analytics.an_maint")
    assert(zeroScan(served),
      s"the cadence must leave every file analyzed:\n" +
        served.queryExecution.executedPlan)
    assert(served.collect().head.getLong(0) ==
      (1L to 320L).filter(k => k % 7 != 0 || k > 300).map(_ * 3).sum)
  }
}
