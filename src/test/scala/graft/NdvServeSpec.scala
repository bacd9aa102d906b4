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
    // a COUNT(col) in the list still declines (per-column null totals
    // belong to pushAggregation)
    val cnt = spark.sql("SELECT approx_count_distinct(m37) AS a, " +
      "COUNT(tag) AS n FROM ndv_cat.analytics.ndvt")
    assert(!NdvServe.served(cnt))
    assert(cnt.head() == org.apache.spark.sql.Row(37L, 320L))
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
    val q = spark.sql("SELECT approx_count_distinct(m41) AS a " +
      "FROM ndv_cat.analytics.ndvs")
    assert(NdvServe.served(q),
      s"sharded sidecar serve expected:\n${q.queryExecution.optimizedPlan}")
    assert(!q.queryExecution.executedPlan.toString.contains("Parquet"))
    assert(q.head().getLong(0) == 41L)
  }
}
