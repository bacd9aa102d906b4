package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.TableStore

/** One-off scale probe for the sharded manifest tier (dev tool, not part of
  * the engine): commit a bucketed table with ~50k real data files, then
  * exercise the hot paths and report wall times + the driver-materialization
  * counter. Run:
  *   sbt "runMain graft.tools.ShardScale"
  */
object ShardScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = graft.util.Scratch.dir("shard_scale_50k")
    val store = new TableStore(spark, root)
    // 2048 buckets × 1 clustered file per bucket > inlineThreshold (1000):
    // a REAL sharded-tier table at the default threshold (bulk commits
    // cluster to one file per bucket since r10, so writers no longer
    // multiply the file count)
    val numBuckets = 2048
    val writers = 100

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      a
    }

    val before = TableStore.driverMaterializations.get()
    val df = spark.range(0, 200000)
      .select($"id".as("k"), ($"id" % 1000).as("v"))
      .repartition(writers)
    timed(s"commitBucketed($numBuckets buckets, $writers writers)") {
      store.commitBucketed(df, Seq("k"), numBuckets)
    }
    val m = store.manifest(0)
    println(s"[scale] files=${m.nFiles} shards=${m.shards.size} " +
      s"rows=${m.totalRows} sharded=${m.isSharded}")
    val jsonLen = new java.io.File(s"$root/manifest/v0.json").length()
    println(s"[scale] manifest list bytes=$jsonLen")

    timed("filtered read (k = 123456)") {
      val v = store.readSnapshot().filter($"k" === 123456L)
        .select("v").as[Long].head()
      require(v == 123456L % 1000)
    }
    timed("full count") {
      require(store.readSnapshot().count() == 200000L)
    }
    timed("incremental commit (1 bucket)") {
      val touched = Seq(Seq(7L).toDF("k")
        .select(TableStore.bucketExpr(Seq("k"), numBuckets).as("b"))
        .as[Long].head())
      val content = store.readBuckets(touched)
        .filter($"k" =!= 7L).union(Seq((7L, -1L)).toDF("k", "v"))
      store.commitIncremental(content, touched)
    }
    timed("manifest diff v0 -> v1") {
      val (a, r) = store.changedFilesBetween(0, 1)
      println(s"[scale] diff: +${a.size} -${r.size}")
    }
    timed("vacuum(keep=1)") { store.vacuum(1) }
    require(store.readSnapshot().count() == 200000L)
    // r13: the reference's own published query — LIMIT-10 preview — on the
    // 50k-file sharded tier must plan the shard-prefix file subset, not
    // materialize the candidate list (VERDICT r12 next #1)
    timed("LIMIT 10 preview (SQL, sharded)") {
      val w = new java.io.File(root).getParent
      spark.conf.set("spark.sql.catalog.scale_cat",
        classOf[graft.catalog.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.scale_cat.warehouse", w)
      val tbl = s"scale_cat.`${new java.io.File(root).getName}`"
      val df = spark.sql(s"SELECT * FROM $tbl LIMIT 10")
      require(df.collect().length == 10)
      val planned = "FileIndex\\((\\d+) paths\\)".r
        .findFirstMatchIn(df.queryExecution.executedPlan.toString)
        .map(_.group(1).toLong).getOrElse(-1L)
      println(s"[scale] LIMIT-10 planned files: $planned of ${store.manifest(
        store.currentVersion()).nFiles} (must be O(files covering 10 rows))")
    }
    // r14: the ANALYZE → metadata-SUM path at the real sharded tier — one
    // bounded pass records per-file sums + NDV sketches across 2k files,
    // then the totals dashboard answers with ZERO data files (the
    // analyzedSums sweep reads shard metadata only)
    timed("analyze (sums + NDV, all files)") { store.analyze() }
    timed("metadata SUM (SQL, zero-scan)") {
      val w = new java.io.File(root).getParent
      val tbl = s"scale_cat.`${new java.io.File(root).getName}`"
      spark.catalog.refreshTable(tbl)
      val df = spark.sql(
        s"SELECT COUNT(*) AS c, SUM(k) AS sk, SUM(v) AS sv FROM $tbl")
      val plan = df.queryExecution.executedPlan.toString
      require(!plan.contains("Parquet"),
        s"metadata SUM must plan zero data files:\n$plan")
      val r = df.collect().head
      println(s"[scale] SUM row: c=${r.getLong(0)} sk=${r.getLong(1)} " +
        s"sv=${r.getLong(2)}")
    }
    timed("$column_stats sweep") {
      val tbl = s"scale_cat.`${new java.io.File(root).getName}$$column_stats`"
      val rows = spark.sql(s"SELECT col_name, ndv_est, sum_v FROM $tbl")
        .collect()
      println(s"[scale] column_stats: " +
        rows.map(r => s"${r.getString(0)} ndv=${r.get(1)}").mkString(", "))
    }
    println(s"[scale] driver materializations: " +
      s"${TableStore.driverMaterializations.get() - before} (must be 0)")

    // ---- r15: the TIME-CHUNKED ingest at the sharded tier ---------------
    // 1,500 range-partitioned files over ~4 years of timestamps (~1 day
    // per file, month-boundary files straddle — the realistic layout a
    // continuous ingest produces). The standing dashboard shapes must
    // stay metadata-bound at this file count: expression GROUP BY serves
    // all non-straddling files from truncated-bound proofs, the
    // truncation WHERE rewrites to a bare range and prunes the plain
    // scan, and the monthly COUNT answers from the hybrid serve.
    val tsRoot = graft.util.Scratch.dir("shard_scale_ts")
    val tsStore = new TableStore(spark, tsRoot)
    val nFiles = 1500
    timed(s"time-chunked commit ($nFiles range files)") {
      val rows = spark.range(0, nFiles.toLong * 400)
        .select(org.apache.spark.sql.functions.timestamp_seconds(
          lit(1577836800L) + ($"id" / 400).cast("long") * 86400L +
            ($"id" % 400) * 216L).as("ts"),
          ($"id" % 97).as("v"))
        .repartitionByRange(nFiles, $"ts")
      tsStore.commitSnapshot(rows)
    }
    val tm = tsStore.manifest(tsStore.currentVersion())
    println(s"[scale] ts table: files=${tm.nFiles} sharded=${tm.isSharded}")
    timed("analyze (time-chunked)") { tsStore.analyze() }
    val tsTbl = s"scale_cat.`${new java.io.File(tsRoot).getName}`"
    spark.catalog.refreshTable(tsTbl)
    timed("GROUP BY date_trunc('month') dashboard (expr keys from bounds)") {
      val df = spark.sql(s"SELECT date_trunc('month', ts) AS mon, " +
        s"COUNT(*) AS n, SUM(v) AS sv FROM $tsTbl GROUP BY 1 ORDER BY mon")
      require(graft.catalog.HybridMetaAgg.served(df),
        "the monthly dashboard must metadata-serve")
      val scanned = df.inputFiles.length
      val months = df.count()
      println(s"[scale] monthly GROUP BY: $months groups, " +
        s"$scanned of ${tm.nFiles} files scanned (boundary straddlers only)")
      require(scanned < 120,
        s"only month-boundary straddlers may scan, got $scanned")
    }
    timed("WHERE date_trunc('month') = X count (rewrite + hybrid)") {
      val df = spark.sql(s"SELECT COUNT(*) AS n FROM $tsTbl " +
        "WHERE date_trunc('month', ts) = TIMESTAMP '2021-03-01 00:00:00'")
      require(graft.catalog.HybridMetaAgg.served(df),
        "the truncation-WHERE count must metadata-serve")
      println(s"[scale] monthly COUNT: n=${df.head().getLong(0)} " +
        s"scanned=${df.inputFiles.length}")
    }
    timed("plain SELECT under CAST(ts AS DATE) = D (file pruning)") {
      val df = spark.sql(s"SELECT v FROM $tsTbl " +
        "WHERE CAST(ts AS DATE) = DATE '2021-03-15'")
      val n = df.count()
      val planned = "FileIndex\\((\\d+) paths\\)".r
        .findFirstMatchIn(df.queryExecution.executedPlan.toString)
        .map(_.group(1).toLong).getOrElse(-1L)
      println(s"[scale] day point-select: rows=$n planned=$planned of " +
        s"${tm.nFiles} (one day's chunk + boundary neighbors)")
      require(planned >= 0 && planned <= 5,
        s"the day predicate must prune to the day's files, got $planned")
    }

    // ---- r16: periodic WHERE proofs at the sharded tier ------------------
    // `WHERE month(ts) = 3` over the same 1,500 day-files: every file
    // inside one calendar month proves month() constant (granularity
    // proof), so only the ~8 month-boundary straddlers of the 4 Marches
    // scan — O(boundaries), not O(corpus)
    timed("WHERE month(ts) = 3 count (periodic granularity proof)") {
      val df = spark.sql(s"SELECT COUNT(*) AS n, SUM(v) AS sv FROM $tsTbl " +
        "WHERE month(ts) = 3")
      require(graft.catalog.HybridMetaAgg.served(df),
        "the periodic-WHERE count must metadata-serve")
      val scanned = df.inputFiles.length
      println(s"[scale] month(ts)=3 COUNT: n=${df.head().getLong(0)} " +
        s"scanned=$scanned of ${tm.nFiles} (month-boundary straddlers)")
      require(scanned < 40,
        s"only month-boundary straddlers may scan, got $scanned")
    }
    timed("WHERE month(ts) = 3 count, repeat (memoized verdicts)") {
      val df = spark.sql(s"SELECT COUNT(*) AS n, SUM(v) AS sv FROM $tsTbl " +
        "WHERE month(ts) = 3")
      require(df.head().getLong(0) == 49600L)
    }
    // r17: top-k COMPOSED with the periodic WHERE (TopKMetaPruneRule —
    // the walk prunes to the guaranteeing chunks + reachable straddlers;
    // the Filter stays row-exact above the pruned scan)
    timed("ORDER BY ts LIMIT 10 WHERE month(ts) = 3 (topk × periodic)") {
      val df = spark.sql(s"SELECT v, ts FROM $tsTbl " +
        "WHERE month(ts) = 3 ORDER BY ts ASC LIMIT 10")
      require(df.count() == 10)
      val planned = "FileIndex\\((\\d+) paths\\)".r
        .findFirstMatchIn(df.queryExecution.executedPlan.toString)
        .map(_.group(1).toLong).getOrElse(-1L)
      println(s"[scale] topk × periodic: planned=$planned of ${tm.nFiles}")
      require(planned >= 1 && planned <= 12,
        s"the top-10 walk must plan only the guaranteeing chunk(s) + " +
          s"straddlers, got $planned")
    }
    timed("GROUP BY month(ts) dashboard (periodic group keys)") {
      val df = spark.sql(s"SELECT month(ts) AS mo, COUNT(*) AS n " +
        s"FROM $tsTbl GROUP BY month(ts) ORDER BY mo")
      require(graft.catalog.HybridMetaAgg.served(df),
        "GROUP BY month() must metadata-serve")
      val scanned = df.inputFiles.length
      require(df.count() == 12L)
      println(s"[scale] GROUP BY month: 12 groups, $scanned of " +
        s"${tm.nFiles} files scanned")
      require(scanned < 120,
        s"only month-boundary straddlers may scan, got $scanned")
    }
    // r16: approx_count_distinct from the NDV sidecar at this tier — the
    // coverage check is one distributed sweep, the serve zero data files
    timed("approx_count_distinct (NDV sidecar, sharded coverage sweep)") {
      val df = spark.sql(s"SELECT approx_count_distinct(v) AS ndv " +
        s"FROM $tsTbl")
      require(graft.catalog.NdvServe.served(df),
        "the cardinality dashboard must serve from the sidecar")
      val ndv = df.head().getLong(0)
      println(s"[scale] NDV serve: $ndv (exact: 97), zero data files")
      require(ndv == 97L, s"set-mode sketch must be exact here, got $ndv")
    }

    // ---- r16: STRING-PK serving at the sharded tier ----------------------
    // 1,500 PK-range-chunked string-keyed files (the reference's PK/SK: S
    // schema at ingest scale): a chunk-aligned key-range dashboard —
    // COUNT + MIN/MAX of the keys — answers from the one distributed
    // decidability sweep with ZERO data files
    val pkRoot = graft.util.Scratch.dir("shard_scale_pk")
    val pkStore = new TableStore(spark, pkRoot)
    timed(s"string-PK commit ($nFiles range files)") {
      val rows = spark.range(0, nFiles.toLong * 400)
        .select(format_string("PK%09d", $"id").as("pk"),
          concat(lit("SK#"), format_string("%09d", $"id")).as("sk"),
          ($"id" % 97).as("v"))
        .repartitionByRange(nFiles, $"pk")
      pkStore.commitSnapshot(rows)
    }
    val pm = pkStore.manifest(pkStore.currentVersion())
    println(s"[scale] pk table: files=${pm.nFiles} sharded=${pm.isSharded}")
    val pkTbl = s"scale_cat.`${new java.io.File(pkRoot).getName}`"
    spark.catalog.refreshTable(pkTbl)
    timed("string PK-range COUNT + MIN/MAX (hybrid: straddlers only)") {
      // repartitionByRange samples its split points, so the literals
      // straddle O(1) boundary chunks — the hybrid serve answers every
      // interior chunk from its exact-flagged string bounds and scans
      // only the straddlers
      val df = spark.sql(s"SELECT COUNT(*) AS n, MIN(pk) AS mn, " +
        s"MAX(sk) AS mx FROM $pkTbl " +
        "WHERE pk >= 'PK000100000' AND pk < 'PK000200000'")
      require(graft.catalog.HybridMetaAgg.served(df),
        "the string key-range dashboard must metadata-serve")
      val scanned = df.inputFiles.length
      val r = df.head()
      println(s"[scale] string PK-range serve: n=${r.getLong(0)} " +
        s"min=${r.getString(1)} max=${r.getString(2)}, " +
        s"scanned=$scanned of ${pm.nFiles} (boundary straddlers)")
      require(r.getLong(0) == 100000L)
      require(scanned <= 4,
        s"only PK-boundary straddlers may scan, got $scanned")
    }
    timed("string top-k preview (ORDER BY pk LIMIT 10)") {
      val df = spark.sql(s"SELECT pk, v FROM $pkTbl ORDER BY pk LIMIT 10")
      require(df.count() == 10)
      val planned = "FileIndex\\((\\d+) paths\\)".r
        .findFirstMatchIn(df.queryExecution.executedPlan.toString)
        .map(_.group(1).toLong).getOrElse(-1L)
      println(s"[scale] string top-10: planned=$planned of ${pm.nFiles}")
      require(planned >= 0 && planned <= 3,
        s"the string top-k walk must plan the head chunk(s), got $planned")
    }
    spark.stop()
  }
}
