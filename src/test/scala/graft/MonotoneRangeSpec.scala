package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.GraftCatalog
import graft.store.TableStore

/** Monotone range rewrite ([[graft.catalog.MonotoneRangeRewriteRule]],
  * r15): `WHERE date_trunc('day', ts) = X` / `year(ts) = N` /
  * `CAST(ts AS DATE) = D` rewrite to equivalent bare-column ranges, so
  * the standing dashboard predicates reach file pruning and the metadata
  * serves instead of defeating every stats path. */
class MonotoneRangeSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse = {
    val w = Files.createTempDirectory("graft_mono").toString
    spark.conf.set("spark.sql.catalog.mr_cat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mr_cat.warehouse", w)
    w
  }

  // month-chunked timestamps: ts = 2021-01-01 + k days over k in [0, 119]
  // — four ~30-day files, each spanning its month (never constant)
  private lazy val store = {
    val st = new TableStore(spark, s"$warehouse/analytics/mono")
    if (st.currentVersion() < 0) {
      val base = (0 until 120).map { k =>
        (k.toLong, k % 7)
      }.toDF("k", "seg").withColumn("ts",
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

  private def parity(q: String): org.apache.spark.sql.DataFrame = {
    val df = spark.sql(q)
    val got = df.collect().map(_.toString).toSeq
    spark.conf.set("spark.graft.filter.monotoneRewrite", "false")
    val want =
      try spark.sql(q).collect().map(_.toString).toSeq
      finally spark.conf.unset("spark.graft.filter.monotoneRewrite")
    assert(got == want, s"rewrite diverged on:\n$q\ngot  $got\nwant $want")
    df
  }

  test("date_trunc equality prunes a plain SELECT to the one chunk and " +
      "keeps row-exact results (aligned, unaligned, range ops)") {
    store
    spark.catalog.refreshTable("mr_cat.analytics.mono")
    // aligned month boundary: one file
    val eq = parity("SELECT k FROM mr_cat.analytics.mono " +
      "WHERE date_trunc('month', ts) = TIMESTAMP '2021-02-01 00:00:00' " +
      "ORDER BY k")
    assert(planned(eq) == 1, s"expected 1 chunk, planned ${planned(eq)}")
    assert(eq.count() == 28)
    // unaligned literal: provably empty, zero files
    val un = parity("SELECT k FROM mr_cat.analytics.mono " +
      "WHERE date_trunc('month', ts) = TIMESTAMP '2021-02-02 00:00:00'")
    assert(un.count() == 0)
    assert(planned(un) <= 0, s"unaligned equality must prune every " +
      s"file, planned ${planned(un)}")
    // >= on an unaligned literal: ceil to the next boundary — two chunks
    val ge = parity("SELECT k FROM mr_cat.analytics.mono " +
      "WHERE date_trunc('month', ts) >= TIMESTAMP '2021-02-15 00:00:00' " +
      "ORDER BY k")
    assert(planned(ge) == 2, s"expected Mar+Apr chunks, planned ${planned(ge)}")
    // <= mid-month admits that whole month
    val le = parity("SELECT k FROM mr_cat.analytics.mono " +
      "WHERE date_trunc('month', ts) <= TIMESTAMP '2021-02-15 00:00:00' " +
      "ORDER BY k")
    assert(planned(le) == 2, s"expected Jan+Feb chunks, planned ${planned(le)}")
    // IN of two aligned months
    val in = parity("SELECT k FROM mr_cat.analytics.mono " +
      "WHERE date_trunc('month', ts) IN (TIMESTAMP '2021-01-01 00:00:00', " +
      "TIMESTAMP '2021-03-01 00:00:00') ORDER BY k")
    assert(in.count() == 62) // 31 + 31
  }

  test("year()/CAST(ts AS DATE) shapes rewrite too; composition with the " +
      "hybrid metadata serve answers the dashboard COUNT at zero files") {
    store
    spark.catalog.refreshTable("mr_cat.analytics.mono")
    val yr = parity("SELECT COUNT(*) AS n FROM mr_cat.analytics.mono " +
      "WHERE year(ts) = 2021")
    assert(yr.head().getLong(0) == 120L)
    val castEq = parity("SELECT k FROM mr_cat.analytics.mono " +
      "WHERE CAST(ts AS DATE) = DATE '2021-02-10' ORDER BY k")
    assert(planned(castEq) == 1)
    assert(castEq.collect().map(_.getLong(0)).toSeq == Seq(40L))
    // the rewritten range is bare-column, so the straddle-tolerant
    // metadata aggregate proves all-match per chunk: COUNT/SUM of a full
    // month serves with ZERO data files scanned
    val agg = spark.sql("SELECT COUNT(*) AS n, SUM(k) AS sk " +
      "FROM mr_cat.analytics.mono " +
      "WHERE date_trunc('month', ts) = TIMESTAMP '2021-03-01 00:00:00'")
    assert(graft.catalog.HybridMetaAgg.served(agg),
      s"truncation-predicate aggregate must metadata-serve:\n" +
        s"${agg.queryExecution.optimizedPlan}")
    assert(agg.inputFiles.isEmpty,
      s"the whole chunk is proven: zero files, got ${agg.inputFiles.length}")
    val row = agg.head()
    assert(row.getLong(0) == 31L && row.getLong(1) == (59L to 89L).sum)
    // the dashboard's FULL shape — expression GROUP BY under an
    // expression WHERE — composes: the rewrite bares the predicate, the
    // hybrid rule proves the monotone group keys, zero files scan
    val full = spark.sql("SELECT date_trunc('month', ts) AS mon, " +
      "COUNT(*) AS n, SUM(k) AS sk FROM mr_cat.analytics.mono " +
      "WHERE date_trunc('month', ts) >= TIMESTAMP '2021-02-01 00:00:00' " +
      "GROUP BY 1 ORDER BY mon ASC NULLS FIRST")
    assert(graft.catalog.HybridMetaAgg.served(full),
      s"grouped dashboard under a truncation WHERE must serve:\n" +
        s"${full.queryExecution.optimizedPlan}")
    assert(full.inputFiles.isEmpty,
      s"all kept chunks prove their keys: zero files, " +
        s"got ${full.inputFiles.length}")
    val gotF = full.collect().map(_.toString).toSeq
    spark.conf.set("spark.graft.filter.monotoneRewrite", "false")
    spark.conf.set("spark.graft.agg.metadata.hybrid", "false")
    val wantF = try spark.sql("SELECT date_trunc('month', ts) AS mon, " +
        "COUNT(*) AS n, SUM(k) AS sk FROM mr_cat.analytics.mono " +
        "WHERE date_trunc('month', ts) >= TIMESTAMP '2021-02-01 00:00:00' " +
        "GROUP BY 1 ORDER BY mon ASC NULLS FIRST")
        .collect().map(_.toString).toSeq
      finally {
        spark.conf.unset("spark.graft.filter.monotoneRewrite")
        spark.conf.unset("spark.graft.agg.metadata.hybrid")
      }
    assert(gotF == wantF,
      s"composed serve diverged:\ngot  $gotF\nwant $wantF")
    // kill switches: rewrite-off ALONE no longer kills the serve (r16 —
    // the chain proofs in ExprBounds serve the truncation WHERE directly
    // through the hybrid rule, no range rewrite needed); both off
    // restores the plain scan
    spark.conf.set("spark.graft.filter.monotoneRewrite", "false")
    try {
      val off = spark.sql("SELECT COUNT(*) AS n FROM mr_cat.analytics.mono " +
        "WHERE date_trunc('month', ts) = TIMESTAMP '2021-03-01 00:00:00'")
      assert(graft.catalog.HybridMetaAgg.served(off),
        "chain proofs must keep serving with the range rewrite off")
      assert(off.head().getLong(0) == 31L)
      spark.conf.set("spark.graft.agg.metadata.hybrid", "false")
      val bothOff = spark.sql(
        "SELECT COUNT(*) AS n FROM mr_cat.analytics.mono " +
          "WHERE date_trunc('month', ts) = TIMESTAMP '2021-03-01 00:00:00'")
      assert(!graft.catalog.HybridMetaAgg.served(bothOff))
      assert(bothOff.head().getLong(0) == 31L)
    } finally {
      spark.conf.unset("spark.graft.filter.monotoneRewrite")
      spark.conf.unset("spark.graft.agg.metadata.hybrid")
    }
  }
}
