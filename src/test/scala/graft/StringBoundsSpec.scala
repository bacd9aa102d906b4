package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.GraftCatalog
import graft.store.{FileStats, TableStore}

/** STRING-bounds metadata serving and its exactness gate (r16, VERDICT r15
  * next #1): the reference's canonical key schema is STRING PK/SK, so the
  * zero-scan dashboard family must serve string keys — but ONLY when the
  * recorded bounds are provably ATTAINED values. A writer-truncated bound
  * still encloses the file's range (sound for pruning and all-match
  * proofs), yet returning it from MIN/MAX would fabricate a value no row
  * holds. The engine records an `exact` flag at commit time iff the
  * writing session's parquet statistics truncation is the untruncated
  * default; this spec pins both directions. */
class StringBoundsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse = {
    val w = Files.createTempDirectory("graft_strb").toString
    spark.conf.set("spark.sql.catalog.strb_cat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.strb_cat.warehouse", w)
    w
  }

  private def mkChunks(store: TableStore): Unit = {
    val base = (0 until 300).map(i => (f"k_$i%03d", i.toLong)).toDF("pk", "v")
    store.commitSnapshot(base.filter(col("pk") < "k_100").coalesce(1))
    store.commitAppend(
      base.filter(col("pk") >= "k_100" && col("pk") < "k_200").coalesce(1))
    store.commitAppend(base.filter(col("pk") >= "k_200").coalesce(1))
  }

  test("engine-written string bounds carry the exact flag; it round-trips " +
      "the manifest JSON; MIN/MAX and decidable WHERE serve zero-scan") {
    val store = new TableStore(spark, s"$warehouse/analytics/sb_exact")
    mkChunks(store)
    val m = store.manifest(store.currentVersion())
    // the flag is ON the recorded ColStat and survives JSON round-trip
    m.inlineFiles.foreach { f =>
      val cs = m.inlineStats(f).cols("pk")
      assert(cs.exact && cs.min.isDefined,
        s"engine-written string bound must be exact-flagged: $cs")
      val rt = FileStats.colsFromJson(
        FileStats.colsToJson(Map("pk" -> cs)))("pk")
      assert(rt == cs, s"exact flag must round-trip JSON: $rt vs $cs")
    }
    spark.catalog.refreshTable("strb_cat.analytics.sb_exact")
    // filtered COUNT + string extrema: exactly decidable on the chunked
    // layout, zero data files
    val q = spark.sql(
      "SELECT COUNT(*) AS n, MIN(pk) AS mn, MAX(pk) AS mx " +
        "FROM strb_cat.analytics.sb_exact " +
        "WHERE pk >= 'k_100' AND pk < 'k_200'")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("graft-manifest-agg") ||
      plan.contains("LocalTableScan"),
      s"decidable string WHERE + MIN/MAX must metadata-serve:\n$plan")
    assert(!plan.contains("Parquet"), s"zero-scan contract broken:\n$plan")
    val r = q.head()
    assert(r.getLong(0) == 100L && r.getString(1) == "k_100" &&
      r.getString(2) == "k_199")
  }

  test("bounds written under a truncating statistics config are NOT " +
      "exact-flagged: MIN/MAX declines to a scan (correct either way), " +
      "pruning and all-match COUNT proofs still work") {
    val hconf = spark.sparkContext.hadoopConfiguration
    val store = new TableStore(spark, s"$warehouse/analytics/sb_trunc")
    hconf.setInt("parquet.statistics.truncate.length", 8)
    try mkChunks(store)
    finally hconf.unset("parquet.statistics.truncate.length")
    val m = store.manifest(store.currentVersion())
    m.inlineFiles.foreach { f =>
      val cs = m.inlineStats(f).cols("pk")
      assert(!cs.exact && cs.min.isDefined,
        s"truncation-configured bounds must stay inexact: $cs")
    }
    spark.catalog.refreshTable("strb_cat.analytics.sb_trunc")
    // MIN/MAX: declined (a truncated bound need not be attained) — plan
    // scans, result exact
    val mm = spark.sql("SELECT MIN(pk) AS mn, MAX(pk) AS mx " +
      "FROM strb_cat.analytics.sb_trunc")
    assert(!mm.queryExecution.executedPlan.toString
        .contains("graft-manifest-agg"),
      "inexact string bounds must not serve MIN/MAX")
    assert(mm.head().getString(0) == "k_000" &&
      mm.head().getString(1) == "k_299")
    // all-match proofs stay sound on enclosing bounds: the COUNT under a
    // chunk-aligned range still serves zero-scan (no bound is returned
    // as a value)
    val cnt = spark.sql("SELECT COUNT(*) AS n " +
      "FROM strb_cat.analytics.sb_trunc " +
      "WHERE pk >= 'k_100' AND pk < 'k_200'")
    val cplan = cnt.queryExecution.executedPlan.toString
    assert(cplan.contains("graft-manifest-agg") ||
      cplan.contains("LocalTableScan"),
      s"enclosure-sound COUNT must still serve:\n$cplan")
    assert(cnt.head().getLong(0) == 100L)
    // and point-lookup pruning is unchanged
    val point = spark.sql("SELECT pk, v FROM strb_cat.analytics.sb_trunc " +
      "WHERE pk = 'k_150'")
    val planned = "FileIndex\\((\\d+) paths\\)".r
      .findFirstMatchIn(point.queryExecution.executedPlan.toString)
      .map(_.group(1).toInt).getOrElse(-1)
    assert(planned == 1, s"string point query must prune to 1 file: $planned")
    assert(point.collect().map(_.getLong(1)).toSeq == Seq(150L))
  }

  test("string top-n pushdown plans only the files that can reach the " +
      "global top-n (no exactness needed: pruning only)") {
    val store = new TableStore(spark, s"$warehouse/analytics/sb_topn")
    mkChunks(store)
    spark.catalog.refreshTable("strb_cat.analytics.sb_topn")
    val q = spark.sql("SELECT pk, v FROM strb_cat.analytics.sb_topn " +
      "ORDER BY pk DESC LIMIT 5")
    val planned = "FileIndex\\((\\d+) paths\\)".r
      .findFirstMatchIn(q.queryExecution.executedPlan.toString)
      .map(_.group(1).toInt).getOrElse(-1)
    assert(planned == 1,
      s"DESC top-5 on a 3-chunk string key must plan 1 file, got $planned")
    assert(q.collect().map(_.getString(0)).toSeq ==
      Seq("k_299", "k_298", "k_297", "k_296", "k_295"))
    val asc = spark.sql("SELECT pk FROM strb_cat.analytics.sb_topn " +
      "ORDER BY pk ASC LIMIT 3")
    val plannedAsc = "FileIndex\\((\\d+) paths\\)".r
      .findFirstMatchIn(asc.queryExecution.executedPlan.toString)
      .map(_.group(1).toInt).getOrElse(-1)
    assert(plannedAsc == 1,
      s"ASC top-3 must plan 1 file, got $plannedAsc")
    assert(asc.collect().map(_.getString(0)).toSeq ==
      Seq("k_000", "k_001", "k_002"))
  }
}
