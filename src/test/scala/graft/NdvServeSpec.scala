package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.{GraftCatalog, NdvServe}
import graft.store.TableStore

/** `approx_count_distinct` served from the analyze NDV sidecar
  * ([[graft.catalog.NdvServeRule]], r16): serves only when the sidecar
  * covers the exact scanned snapshot and the query's rsd tolerates the
  * sketch's error — every decline keeps the ordinary scan, correct
  * either way. Fixtures stay below the sketch's set-mode threshold so
  * estimates are exact and assertable. */
class NdvServeSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse = {
    val w = Files.createTempDirectory("graft_ndv").toString
    spark.conf.set("spark.sql.catalog.ndv_cat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ndv_cat.warehouse", w)
    w
  }

  test("served zero-scan after analyze; exact at low cardinality; " +
      "filtered and tighter-rsd shapes decline; a post-analyze append " +
      "declines until re-analyzed") {
    val store = new TableStore(spark, s"$warehouse/analytics/ndvt")
    val base = (0 until 400).map(k =>
      (k.toLong, k % 37, if (k % 5 == 0) None else Some(s"u${k % 23}")))
      .toDF("k", "m37", "tag")
    store.commitSnapshot(base.filter(col("k") < 200).coalesce(1))
    store.commitAppend(base.filter(col("k") >= 200).coalesce(1))
    spark.sql("CALL ndv_cat.system.analyze_table('analytics.ndvt')")
    spark.catalog.refreshTable("ndv_cat.analytics.ndvt")
    // served: zero scan, exact estimates (37 and 23 distinct)
    val q = spark.sql("SELECT approx_count_distinct(m37) AS a, " +
      "approx_count_distinct(tag) AS b FROM ndv_cat.analytics.ndvt")
    assert(NdvServe.served(q),
      s"expected the sidecar serve:\n${q.queryExecution.optimizedPlan}")
    assert(!q.queryExecution.executedPlan.toString.contains("Parquet"))
    assert(q.head() == org.apache.spark.sql.Row(37L, 23L))
    // a WHERE declines (the sketch is global)
    val f = spark.sql("SELECT approx_count_distinct(m37) AS a " +
      "FROM ndv_cat.analytics.ndvt WHERE k < 100")
    assert(!NdvServe.served(f), "filtered NDV must scan")
    assert(f.head().getLong(0) == 37L)
    // rsd tighter than the sketch's (~1.6% at lgK=12) declines
    val tight = spark.sql("SELECT approx_count_distinct(m37, 0.005) AS a " +
      "FROM ndv_cat.analytics.ndvt")
    assert(!NdvServe.served(tight), "tighter-rsd NDV must scan")
    // the MIXED cardinality dashboard serves too (r16): COUNT(*) joins
    // from exact manifest row totals, zero scan
    val mixed = spark.sql("SELECT approx_count_distinct(m37) AS a, " +
      "COUNT(*) AS n FROM ndv_cat.analytics.ndvt")
    assert(NdvServe.served(mixed),
      s"mixed NDV + COUNT(*) must serve:\n${mixed.queryExecution.optimizedPlan}")
    assert(!mixed.queryExecution.executedPlan.toString.contains("Parquet"))
    assert(mixed.head() == org.apache.spark.sql.Row(37L, 400L))
    // COUNT(col) joins the serve (r17, VERDICT r16 next #2): exact
    // Σ(rows − nulls) from the same manifest pass as the coverage check
    val cnt = spark.sql("SELECT approx_count_distinct(m37) AS a, " +
      "COUNT(tag) AS n FROM ndv_cat.analytics.ndvt")
    assert(NdvServe.served(cnt),
      s"mixed NDV + COUNT(col) must serve:\n${cnt.queryExecution.optimizedPlan}")
    assert(!cnt.queryExecution.executedPlan.toString.contains("Parquet"))
    assert(cnt.head() == org.apache.spark.sql.Row(37L, 320L))
    // COUNT(NULL) counts non-null evaluations of a null literal — always
    // 0, NEVER the row total (ADVICE r16: the rule's COUNT(*) arm guards
    // on a non-null literal; in practice Spark's optimizer folds the
    // aggregate to 0 before the rule runs, and the serve carries the
    // folded literal through untouched — either route, the answer is 0)
    val nullCnt = spark.sql("SELECT approx_count_distinct(m37) AS a, " +
      "COUNT(NULL) AS n FROM ndv_cat.analytics.ndvt")
    assert(nullCnt.head() == org.apache.spark.sql.Row(37L, 0L),
      s"COUNT(NULL) must be 0, got ${nullCnt.head()}")
    // stale: an append the sidecar never saw declines; re-analyze serves
    store.commitAppend(Seq((9999L, 999, Some("zZ"))).toDF("k", "m37", "tag")
      .coalesce(1))
    spark.catalog.refreshTable("ndv_cat.analytics.ndvt")
    val stale = spark.sql("SELECT approx_count_distinct(m37) AS a " +
      "FROM ndv_cat.analytics.ndvt")
    assert(!NdvServe.served(stale), "an uncovered file must decline")
    assert(stale.head().getLong(0) == 38L)
    spark.sql("CALL ndv_cat.system.analyze_table('analytics.ndvt')")
    spark.catalog.refreshTable("ndv_cat.analytics.ndvt")
    val fresh = spark.sql("SELECT approx_count_distinct(m37) AS a, " +
      "approx_count_distinct(tag) AS b FROM ndv_cat.analytics.ndvt")
    assert(NdvServe.served(fresh), "re-analyzed sidecar must serve again")
    assert(fresh.head() == org.apache.spark.sql.Row(38L, 24L))
  }

  test("per-group NDV (r17): GROUP BY over a chunk-constant key serves " +
      "from the per-file sketch sidecar — estimates exact at low " +
      "cardinality, counts exact from stats; undeclared columns, " +
      "straddling files, and stale appends decline") {
    val store = new TableStore(spark, s"$warehouse/analytics/ndvg")
    val base = (0 until 400).map { k =>
      (k.toLong, (k % 4).toLong, k % 37,
        if (k % 5 == 0) None else Some(s"u${k % 23}"))
    }.toDF("k", "seg", "m37", "tag")
    store.commitSnapshot(base.filter(col("seg") === 0).coalesce(1))
    (1 to 3).foreach(i =>
      store.commitAppend(base.filter(col("seg") === i).coalesce(1)))
    spark.conf.set("spark.graft.analyze.ndvGroupCols", "m37")
    try spark.sql("CALL ndv_cat.system.analyze_table('analytics.ndvg')")
    finally spark.conf.unset("spark.graft.analyze.ndvGroupCols")
    spark.catalog.refreshTable("ndv_cat.analytics.ndvg")
    val q = spark.sql("SELECT seg, approx_count_distinct(m37) AS a, " +
      "COUNT(*) AS n, COUNT(tag) AS nt FROM ndv_cat.analytics.ndvg " +
      "GROUP BY seg ORDER BY seg")
    assert(NdvServe.servedGroup(q),
      s"per-group serve expected:\n${q.queryExecution.optimizedPlan}\n" +
        s"read: ${q.inputFiles.toSeq}")
    // 4 and 37 coprime: each seg's 100 k-values hit all 37 residues;
    // k%5==0 ∧ k≡seg (mod 4) is 20 of each group's 100 rows
    assert(q.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      (0L to 3L).map(s => (s, 37L, 100L, 80L)),
      s"per-group results diverged: ${q.collect().toSeq}")
    // an UNDECLARED column's HLL declines to the scan, result exact
    val und = spark.sql("SELECT seg, approx_count_distinct(tag) AS a " +
      "FROM ndv_cat.analytics.ndvg GROUP BY seg ORDER BY seg")
    assert(!NdvServe.servedGroup(und), "undeclared column must decline")
    // the declined scan is Spark's own HLL++ — deterministic ~24 for the
    // 23 distinct strings (no exact set mode; the point is the DECLINE)
    assert(und.collect().map(_.getLong(1)).toSeq == Seq(24L, 24L, 24L, 24L))
    // a WHERE declines (sketches are per-file-global)
    val filt = spark.sql("SELECT seg, approx_count_distinct(m37) AS a " +
      "FROM ndv_cat.analytics.ndvg WHERE k < 100 GROUP BY seg")
    assert(!NdvServe.servedGroup(filt), "filtered per-group NDV must scan")
    // a STRADDLING file (mixed segs) declines even after re-analyze
    store.commitAppend(Seq((1000L, 0L, 999, Some("zz")),
      (1001L, 1L, 998, Some("zz"))).toDF("k", "seg", "m37", "tag")
      .coalesce(1))
    spark.catalog.refreshTable("ndv_cat.analytics.ndvg")
    val stale = spark.sql("SELECT seg, approx_count_distinct(m37) AS a " +
      "FROM ndv_cat.analytics.ndvg GROUP BY seg")
    assert(!NdvServe.servedGroup(stale), "a stale sidecar must decline")
    spark.conf.set("spark.graft.analyze.ndvGroupCols", "m37")
    try spark.sql("CALL ndv_cat.system.analyze_table('analytics.ndvg')")
    finally spark.conf.unset("spark.graft.analyze.ndvGroupCols")
    spark.catalog.refreshTable("ndv_cat.analytics.ndvg")
    val strad = spark.sql("SELECT seg, approx_count_distinct(m37) AS a " +
      "FROM ndv_cat.analytics.ndvg GROUP BY seg ORDER BY seg")
    assert(!NdvServe.servedGroup(strad),
      "a group-straddling file must decline the per-group serve")
    assert(strad.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 38L), (1L, 38L), (2L, 37L), (3L, 37L)))
  }

  test("per-group NDV under a file-DECIDABLE WHERE (r17): no-match " +
      "chunks are excluded from every group (the consumed-exact-pushdown " +
      "branch); a WHERE-straddling chunk declines (residual branch)") {
    val store = new TableStore(spark, s"$warehouse/analytics/ndvgw")
    // 8 files: seg 0..3 × k-halves [0,200) / [200,400) — the group key
    // AND the WHERE column are both chunk-decidable
    val base = (0 until 400).map { k =>
      (k.toLong, (k % 4).toLong, k % 37)
    }.toDF("k", "seg", "m37")
    var first = true
    for (h <- 0 to 1; i <- 0 to 3) {
      val chunk = base.filter(col("seg") === i &&
        (if (h == 0) col("k") < 200 else col("k") >= 200)).coalesce(1)
      if (first) { store.commitSnapshot(chunk); first = false }
      else store.commitAppend(chunk)
    }
    spark.conf.set("spark.graft.analyze.ndvGroupCols", "m37")
    try spark.sql("CALL ndv_cat.system.analyze_table('analytics.ndvgw')")
    finally spark.conf.unset("spark.graft.analyze.ndvGroupCols")
    spark.catalog.refreshTable("ndv_cat.analytics.ndvgw")
    // k < 200 is EXACTLY decidable (low halves all-match, high halves
    // no-match) — pushFilters consumes it whole, the serve reads the
    // consumed conjuncts back and excludes the high-half chunks
    val q = spark.sql("SELECT seg, approx_count_distinct(m37) AS a, " +
      "COUNT(*) AS n FROM ndv_cat.analytics.ndvgw WHERE k < 200 " +
      "GROUP BY seg ORDER BY seg")
    assert(NdvServe.servedGroup(q),
      s"filtered per-group serve expected:\n${q.queryExecution.optimizedPlan}")
    // per seg: 50 k-values under 200, stepping 4 — all 37 residues hit
    assert(q.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      (0L to 3L).map(s => (s, 37L, 50L)),
      s"filtered per-group results diverged: ${q.collect().toSeq}")
    // k < 100 straddles every low-half chunk: the serve must DECLINE and
    // the ordinary scan answers exactly
    val strad = spark.sql("SELECT seg, approx_count_distinct(m37) AS a, " +
      "COUNT(*) AS n FROM ndv_cat.analytics.ndvgw WHERE k < 100 " +
      "GROUP BY seg ORDER BY seg")
    assert(!NdvServe.servedGroup(strad),
      "a WHERE-straddling chunk must decline the per-group serve")
    assert(strad.collect().map(r =>
      (r.getLong(0), r.getLong(2))).toSeq == (0L to 3L).map(s => (s, 25L)))
  }

  test("per-group NDV over an EXPRESSION key (r17): GROUP BY month(ts) " +
      "serves from the granularity proof on the month-chunked layout; " +
      "an unchunked layout declines with exact fallback") {
    val store = new TableStore(spark, s"$warehouse/analytics/ndvgm")
    val base = (0 until 120).map(k => (k.toLong, k % 13)).toDF("k", "v")
      .withColumn("ts",
        date_add(lit("2021-01-01").cast("date"), col("k").cast("int"))
          .cast("timestamp"))
    store.commitSnapshot(base.filter(month(col("ts")) === 1).coalesce(1))
    (2 to 4).foreach(i =>
      store.commitAppend(base.filter(month(col("ts")) === i).coalesce(1)))
    spark.conf.set("spark.graft.analyze.ndvGroupCols", "v")
    try spark.sql("CALL ndv_cat.system.analyze_table('analytics.ndvgm')")
    finally spark.conf.unset("spark.graft.analyze.ndvGroupCols")
    spark.catalog.refreshTable("ndv_cat.analytics.ndvgm")
    val q = spark.sql("SELECT month(ts) AS mo, " +
      "approx_count_distinct(v) AS a, COUNT(*) AS n " +
      "FROM ndv_cat.analytics.ndvgm GROUP BY month(ts) ORDER BY mo")
    assert(NdvServe.servedGroup(q),
      s"expression-key per-group serve expected:\n" +
        s"${q.queryExecution.optimizedPlan}")
    // every month holds ≥ 28 consecutive k — all 13 v-residues hit
    assert(q.collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1, 13L, 31L), (2, 13L, 28L), (3, 13L, 31L), (4, 13L, 30L)),
      s"expression-key results diverged: ${q.collect().toSeq}")
    // an UNCHUNKED layout (both files span all months) declines
    val st2 = new TableStore(spark, s"$warehouse/analytics/ndvgm2")
    st2.commitSnapshot(base.filter(col("k") % 2 === 0).coalesce(1))
    st2.commitAppend(base.filter(col("k") % 2 === 1).coalesce(1))
    spark.conf.set("spark.graft.analyze.ndvGroupCols", "v")
    try spark.sql("CALL ndv_cat.system.analyze_table('analytics.ndvgm2')")
    finally spark.conf.unset("spark.graft.analyze.ndvGroupCols")
    spark.catalog.refreshTable("ndv_cat.analytics.ndvgm2")
    val strad = spark.sql("SELECT month(ts) AS mo, " +
      "approx_count_distinct(v) AS a FROM ndv_cat.analytics.ndvgm2 " +
      "GROUP BY month(ts) ORDER BY mo")
    assert(!NdvServe.servedGroup(strad),
      "month-straddling files must decline the expression-key serve")
    assert(strad.collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
  }

  test("per-group NDV on the SHARDED tier: the proof sweep and the " +
      "sketch merge both run distributed; incremental analyze carries " +
      "the per-file sidecar forward") {
    spark.conf.set("spark.graft.manifest.inlineThreshold", "2")
    val store = new TableStore(spark, s"$warehouse/analytics/ndvgs")
    try {
      val base = (0 until 400).map { k =>
        (k.toLong, (k % 4).toLong, k % 41)
      }.toDF("k", "seg", "m41")
      store.commitSnapshot(base.filter(col("seg") === 0).coalesce(1))
      (1 to 3).foreach(i =>
        store.commitAppend(base.filter(col("seg") === i).coalesce(1)))
    } finally spark.conf.unset("spark.graft.manifest.inlineThreshold")
    assert(store.manifest(store.currentVersion()).isSharded)
    spark.conf.set("spark.graft.analyze.ndvGroupCols", "m41")
    try {
      spark.sql("CALL ndv_cat.system.analyze_table('analytics.ndvgs')")
      spark.catalog.refreshTable("ndv_cat.analytics.ndvgs")
      val q = spark.sql("SELECT seg, approx_count_distinct(m41) AS a, " +
        "COUNT(*) AS n FROM ndv_cat.analytics.ndvgs GROUP BY seg " +
        "ORDER BY seg")
      assert(NdvServe.servedGroup(q),
        s"sharded per-group serve expected:\n${q.queryExecution.optimizedPlan}")
      assert(q.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
        (0L to 3L).map(s => (s, 41L, 100L)))
      // INCREMENTAL: a new seg-constant chunk appends; re-analyze reads
      // only it and CARRIES the other files' sketches forward
      store.commitAppend((400 until 500).map(k =>
          (k.toLong, 4L, k % 41)).toDF("k", "seg", "m41").coalesce(1))
      spark.sql("CALL ndv_cat.system.analyze_table('analytics.ndvgs')")
      spark.catalog.refreshTable("ndv_cat.analytics.ndvgs")
      val q2 = spark.sql("SELECT seg, approx_count_distinct(m41) AS a, " +
        "COUNT(*) AS n FROM ndv_cat.analytics.ndvgs GROUP BY seg " +
        "ORDER BY seg")
      assert(NdvServe.servedGroup(q2),
        "the incrementally-carried sidecar must serve again")
      assert(q2.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
        (0L to 3L).map(s => (s, 41L, 100L)) :+ ((4L, 41L, 100L)))
    } finally spark.conf.unset("spark.graft.analyze.ndvGroupCols")
  }

  test("sharded tier: coverage check runs as one distributed sweep and " +
      "the serve stays zero-scan") {
    spark.conf.set("spark.graft.manifest.inlineThreshold", "2")
    val store = new TableStore(spark, s"$warehouse/analytics/ndvs")
    try {
      val base = (0 until 400).map(k => (k.toLong, k % 41)).toDF("k", "m41")
      store.commitSnapshot(base.filter(col("k") % 4 === 0).coalesce(1))
      (1 to 3).foreach(i =>
        store.commitAppend(base.filter(col("k") % 4 === i).coalesce(1)))
    } finally spark.conf.unset("spark.graft.manifest.inlineThreshold")
    assert(store.manifest(store.currentVersion()).isSharded)
    spark.sql("CALL ndv_cat.system.analyze_table('analytics.ndvs')")
    spark.catalog.refreshTable("ndv_cat.analytics.ndvs")
    val q = spark.sql("SELECT approx_count_distinct(m41) AS a, " +
      "COUNT(k) AS ck, COUNT(*) AS n FROM ndv_cat.analytics.ndvs")
    assert(NdvServe.served(q),
      s"sharded sidecar serve expected:\n${q.queryExecution.optimizedPlan}")
    assert(!q.queryExecution.executedPlan.toString.contains("Parquet"))
    assert(q.head() == org.apache.spark.sql.Row(41L, 400L, 400L))
  }
}
