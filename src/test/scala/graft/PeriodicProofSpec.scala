package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.GraftCatalog
import graft.store.TableStore

/** Periodic-extraction WHERE proofs ([[graft.store.ExprBounds]], r16,
  * VERDICT r15 next #3): `WHERE month(ts) = 5` is non-invertible, so the
  * monotone range rewrite correctly ignores it — the granularity proof
  * (bounds inside one calendar period pin the extraction constant) makes
  * it prune files and metadata-serve aggregates anyway on a
  * period-chunked layout. Every case checks rule-on/rule-off parity. */
class PeriodicProofSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse = {
    val w = Files.createTempDirectory("graft_per").toString
    spark.conf.set("spark.sql.catalog.per_cat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.per_cat.warehouse", w)
    w
  }

  // month-chunked LTZ timestamps: 2021-01-01 + k days, k in [0, 119] —
  // four ~30-day files; ts is never per-file constant but its month is
  private lazy val store = {
    val st = new TableStore(spark, s"$warehouse/analytics/perm")
    if (st.currentVersion() < 0) {
      val base = (0 until 120).map { k =>
        (k.toLong, if (k % 11 == 0) None else Some(k.toLong * 3))
      }.toDF("k", "v").withColumn("ts",
        date_add(lit("2021-01-01").cast("date"), col("k").cast("int"))
          .cast("timestamp"))
      val m = month(col("ts"))
      st.commitSnapshot(base.filter(m === 1).coalesce(1))
      (2 to 4).foreach(i => st.commitAppend(base.filter(m === i).coalesce(1)))
      st.analyze()
    }
    st
  }

  private def planned(df: org.apache.spark.sql.DataFrame): Int =
    "FileIndex\\((\\d+) paths\\)".r
      .findFirstMatchIn(df.queryExecution.executedPlan.toString)
      .map(_.group(1).toInt).getOrElse(-1)

  /** Run with the proofs live, re-run with both stats rules off, compare. */
  private def parity(q: String): org.apache.spark.sql.DataFrame = {
    val df = spark.sql(q)
    val got = df.collect().map(_.toString).sorted.toSeq
    spark.conf.set("spark.graft.agg.metadata.hybrid", "false")
    spark.conf.set("spark.graft.filter.monotoneRewrite", "false")
    val want =
      try spark.sql(q).collect().map(_.toString).sorted.toSeq
      finally {
        spark.conf.unset("spark.graft.agg.metadata.hybrid")
        spark.conf.unset("spark.graft.filter.monotoneRewrite")
      }
    assert(got == want, s"periodic proof diverged on:\n$q\ngot  $got\nwant $want")
    df
  }

  test("WHERE month(ts) = m metadata-serves on the month-chunked layout: " +
      "zero files scanned, parity with the rules off") {
    store
    spark.catalog.refreshTable("per_cat.analytics.perm")
    val q = "SELECT COUNT(*) AS n, COUNT(v) AS nv, SUM(v) AS sv, " +
      "MIN(k) AS mn, MAX(k) AS mx " +
      "FROM per_cat.analytics.perm WHERE month(ts) = 2"
    val df = parity(q)
    assert(graft.catalog.HybridMetaAgg.served(df),
      s"month() WHERE must take the hybrid serve:\n" +
        s"${df.queryExecution.optimizedPlan}")
    assert(df.inputFiles.isEmpty,
      s"all four chunks decide — zero scan expected, got ${df.inputFiles.length}")
    val r = df.head()
    assert(r.getLong(0) == 28L && r.getLong(3) == 31L && r.getLong(4) == 58L)
  }

  test("range and IN shapes prove too; a granularity the layout cannot " +
      "prove (dayofmonth on month chunks) falls back with exact results") {
    store
    spark.catalog.refreshTable("per_cat.analytics.perm")
    // month(ts) <= 2: chunks 1-2 all-match, 3-4 pruned
    val le = parity("SELECT COUNT(*) AS n FROM per_cat.analytics.perm " +
      "WHERE month(ts) <= 2")
    assert(le.head().getLong(0) == 59L)
    assert(le.inputFiles.isEmpty, "range shape must serve zero-scan")
    // IN over months
    val in = parity("SELECT COUNT(*) AS n FROM per_cat.analytics.perm " +
      "WHERE month(ts) IN (1, 3)")
    assert(in.head().getLong(0) == 62L)
    assert(in.inputFiles.isEmpty, "IN shape must serve zero-scan")
    // quarter(ts) = 1: every chunk is inside Q1 (granularity QUARTER) —
    // all-match everywhere except April (quarter 2, pruned)
    val qt = parity("SELECT COUNT(*) AS n FROM per_cat.analytics.perm " +
      "WHERE quarter(ts) = 1")
    assert(qt.head().getLong(0) == 90L)
    assert(qt.inputFiles.isEmpty, "quarter shape must serve zero-scan")
    // day(ts) = 15 needs DAY granularity — a month-spanning file cannot
    // prove it, so every chunk straddles and the ordinary scan answers
    val dm = parity("SELECT COUNT(*) AS n FROM per_cat.analytics.perm " +
      "WHERE day(ts) = 15")
    assert(dm.head().getLong(0) == 4L)
  }

  test("a plain SELECT under month(ts) = m prunes its FILE LIST through " +
      "the replan hook (non-invertible: the Filter itself stays)") {
    store
    spark.catalog.refreshTable("per_cat.analytics.perm")
    val sel = parity("SELECT k, v FROM per_cat.analytics.perm " +
      "WHERE month(ts) = 3")
    assert(planned(sel) == 1,
      s"month() point SELECT must plan only the March chunk, " +
        s"planned ${planned(sel)}")
    assert(sel.count() == 31L)
  }

  test("GROUP BY month(ts) serves from the granularity proof (the r15 " +
      "WHERE/GROUP asymmetry, closed from the GROUP side too)") {
    store
    spark.catalog.refreshTable("per_cat.analytics.perm")
    val g = parity("SELECT month(ts) AS mo, COUNT(*) AS n, SUM(v) AS sv " +
      "FROM per_cat.analytics.perm GROUP BY month(ts) " +
      "ORDER BY mo ASC NULLS FIRST")
    assert(graft.catalog.HybridMetaAgg.served(g),
      s"GROUP BY month() must take the hybrid serve:\n" +
        s"${g.queryExecution.optimizedPlan}")
    assert(g.inputFiles.isEmpty,
      s"every chunk's month is proven — zero scan, got ${g.inputFiles.length}")
    assert(g.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((1, 31L), (2, 28L), (3, 31L), (4, 30L)))
  }

  test("period ENUMERATION prunes boundary straddlers whose covered " +
      "months provably exclude the literal (r16): only the two chunks " +
      "touching February scan") {
    val st = new TableStore(spark, s"$warehouse/analytics/perb")
    if (st.currentVersion() < 0) {
      val base = (0 until 120).map(k =>
        (k.toLong, if (k % 11 == 0) None else Some(k.toLong * 3)))
        .toDF("k", "v").withColumn("ts",
          date_add(lit("2021-01-01").cast("date"), col("k").cast("int"))
            .cast("timestamp"))
      // chunks: {Jan}, {Jan,Feb}, {Feb}, {Feb,Mar}, {Mar,Apr}, {Apr} —
      // one all-Feb chunk serves from stats, the two Feb-touching
      // straddlers scan, and the {Mar,Apr} straddler is the enumeration's
      // case: its gran proof fails (two periods) but neither covered
      // month is 2, so it PRUNES where r16-pre-enumeration scanned it
      val cuts = Seq(0, 25, 40, 50, 70, 100, 120)
      st.commitSnapshot(base.filter(col("k") < cuts(1)).coalesce(1))
      (1 until 6).foreach(i => st.commitAppend(base.filter(
        col("k") >= cuts(i) && col("k") < cuts(i + 1)).coalesce(1)))
      st.analyze()
    }
    spark.catalog.refreshTable("per_cat.analytics.perb")
    val df = parity("SELECT COUNT(*) AS n, SUM(v) AS sv " +
      "FROM per_cat.analytics.perb WHERE month(ts) = 2")
    assert(graft.catalog.HybridMetaAgg.served(df),
      s"boundary-straddled periodic WHERE must hybrid-serve:\n" +
        s"${df.queryExecution.optimizedPlan}")
    assert(df.head().getLong(0) == 28L)
    assert(df.inputFiles.length == 2,
      s"the {Mar,Apr} and {Apr} chunks prove month != 2 by enumeration — " +
        s"only the two Feb-touching chunks may scan, " +
        s"got ${df.inputFiles.length}")
  }

  test("an unchunked layout straddles everywhere: proofs decline, the " +
      "ordinary scan stays, results exact") {
    val st = new TableStore(spark, s"$warehouse/analytics/perx")
    if (st.currentVersion() < 0) {
      val base = (0 until 120).map(k => k.toLong).toDF("k").withColumn("ts",
        date_add(lit("2021-01-01").cast("date"), col("k").cast("int"))
          .cast("timestamp"))
      // two files, BOTH spanning all four months (odd/even days)
      st.commitSnapshot(base.filter(col("k") % 2 === 0).coalesce(1))
      st.commitAppend(base.filter(col("k") % 2 === 1).coalesce(1))
    }
    spark.catalog.refreshTable("per_cat.analytics.perx")
    val df = parity("SELECT COUNT(*) AS n FROM per_cat.analytics.perx " +
      "WHERE month(ts) = 2")
    assert(df.head().getLong(0) == 28L)
    assert(!graft.catalog.HybridMetaAgg.served(df),
      "unprovable layout must decline the hybrid serve")
    assert(planned(df) == 2,
      s"both straddling files must scan, planned ${planned(df)}")
  }

  test("periodic WHERE composes with top-k pushdown (VERDICT r16 next " +
      "#7): ORDER BY k LIMIT n under month(ts) IN (m1, m2) plans only " +
      "the one kept chunk that can hold the top rows") {
    store
    spark.catalog.refreshTable("per_cat.analytics.perm")
    // the periodic IN keeps exactly the Feb+Mar chunks (both all-match,
    // exactly decidable); pushTopN then walks the kept subset's k bounds
    // and keeps only the Feb chunk (28 rows ≥ 5 guarantees the top-5)
    val df = parity("SELECT k, v FROM per_cat.analytics.perm " +
      "WHERE month(ts) IN (2, 3) ORDER BY k ASC LIMIT 5")
    assert(planned(df) == 1,
      s"top-5 under the periodic WHERE must plan 1 file, " +
        s"planned ${planned(df)}")
    assert(df.collect().map(_.getLong(0)).toSeq == (31L to 35L))
  }

  test("topk × periodic composition TOLERATES straddlers (r17): on the " +
      "boundary-cut layout the Filter stays and the walk prunes to the " +
      "guaranteeing chunk plus the reachable straddler") {
    // same cuts as the enumeration test: files [0,25) [25,40) [40,50)
    // [50,70) [70,100) [100,120); month = 2 ⇔ k ∈ [31, 59)
    val st = new TableStore(spark, s"$warehouse/analytics/pert")
    if (st.currentVersion() < 0) {
      val base = (0 until 120).map(k =>
        (k.toLong, k.toLong * 3)).toDF("k", "v").withColumn("ts",
        date_add(lit("2021-01-01").cast("date"), col("k").cast("int"))
          .cast("timestamp"))
      val cuts = Seq(0, 25, 40, 50, 70, 100, 120)
      st.commitSnapshot(base.filter(col("k") < cuts(1)).coalesce(1))
      (1 until 6).foreach(i => st.commitAppend(base.filter(
        col("k") >= cuts(i) && col("k") < cuts(i + 1)).coalesce(1)))
      st.analyze()
    }
    spark.catalog.refreshTable("per_cat.analytics.pert")
    // candidates: [25,40) straddles (Feb rows 31..39), [40,50) all-Feb
    // (the 10-row guarantee → t = 49), [50,70) straddles but best = 50
    // > t — pruned. Planned: 2 of 6 files, Filter retained (row-exact).
    val df = parity("SELECT k, v FROM per_cat.analytics.pert " +
      "WHERE month(ts) = 2 ORDER BY k ASC LIMIT 5")
    assert(planned(df) == 2,
      s"top-5 under the straddled periodic WHERE must plan 2 files " +
        s"(guaranteeing chunk + reachable straddler), " +
        s"planned ${planned(df)}")
    assert(df.collect().map(_.getLong(0)).toSeq == (31L to 35L))
  }

  test("sub-day granularity proofs over INSTANT timestamps are gated on " +
      "a fixed-offset zone (ADVICE r16): a DST zone declines the " +
      "constancy proof; UTC and NTZ keep it; day-level trunc over " +
      "instants loses monotonicity in a non-fixed zone") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    import graft.store.ExprBounds
    val ts = AttributeReference("ts", TimestampType)()
    val ntz = AttributeReference("tn", TimestampNTZType)()
    // hour() in a DST zone: classified, but with NO granularity proof
    // (TruncTimestamp resolves both ambiguous fall-back instants to the
    // earlier offset, so P(min)==P(max) cannot pin minute/hour constancy)
    val dst = ExprBounds.classify(Hour(ts, Some("America/New_York"))).get
    assert(!dst.monotone && dst.gran.isEmpty,
      s"DST-zone hour() must keep only the constant-input proof: $dst")
    val utc = ExprBounds.classify(Hour(ts, Some("UTC"))).get
    assert(utc.gran.isDefined, "fixed-offset hour() keeps its proof")
    val noz = ExprBounds.classify(Hour(ntz, Some("America/New_York"))).get
    assert(noz.gran.isDefined, "NTZ hour() carries no zone — ungated")
    // date_trunc('DAY', instant) in a zone with midnight transitions
    // (Brazil's historic DST end) can step BACKWARDS — not monotone
    val trunc = ExprBounds.classify(TruncTimestamp(Literal("DAY"),
      ts, Some("America/Sao_Paulo"))).get
    assert(!trunc.monotone && trunc.gran.isEmpty,
      s"non-fixed-zone trunc over instants must not claim monotone: $trunc")
    val truncUtc = ExprBounds.classify(TruncTimestamp(Literal("DAY"),
      ts, Some("UTC"))).get
    assert(truncUtc.monotone, "UTC trunc stays monotone")
    val truncNtz = ExprBounds.classify(TruncTimestamp(Literal("DAY"),
      ntz, Some("America/Sao_Paulo"))).get
    assert(truncNtz.monotone, "NTZ trunc has no zone — stays monotone")
  }
}
