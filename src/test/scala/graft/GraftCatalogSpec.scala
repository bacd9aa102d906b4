package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.GraftCatalog
import graft.store.TableStore

/** V2 catalog over TableStore: three-part SQL names, pushdown through the
  * stock parquet path, time travel, DDL, read-only enforcement
  * (the reference's query surface, README.md:170-173). */
class GraftCatalogSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse = {
    val w = Files.createTempDirectory("graft_warehouse").toString
    spark.conf.set("spark.sql.catalog.spec_cat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spec_cat.warehouse", w)
    w
  }

  private def commitOrders(): Unit = {
    val store = new TableStore(spark, s"$warehouse/analytics/orders")
    if (store.currentVersion() < 0) {
      val o = Tables.load(spark, sfDir, "orders")
      store.commitSnapshot(o.filter(col("o_orderkey") < 100), Seq("o_orderstatus"))
      store.commitSnapshot(o, Seq("o_orderstatus"))
    }
  }

  test("ALTER TABLE evolves the schema through the catalog, versioned") {
    val store = new TableStore(spark, s"$warehouse/analytics/evolving")
    store.commitSnapshot(Seq((1L, 10L), (2L, 20L)).toDF("k", "cnt"))
    val vBefore = store.currentVersion()
    // add a column, then widen one — each commits a new snapshot version
    spark.sql("ALTER TABLE spec_cat.analytics.evolving ADD COLUMN note STRING")
    spark.sql("ALTER TABLE spec_cat.analytics.evolving ALTER COLUMN cnt TYPE DOUBLE")
    val out = spark.sql(
      "SELECT k, cnt, note FROM spec_cat.analytics.evolving ORDER BY k")
      .collect()
    assert(out.map(_.getDouble(1)).toSeq == Seq(10.0, 20.0))
    assert(out.forall(_.isNullAt(2)))
    // every generation stays queryable: GetTableVersions analog
    val history = store.schemaHistory()
    assert(history.map(_._1) == (0L to vBefore + 2).toSeq)
    assert(history.last._2.fieldNames.toSeq == Seq("k", "cnt", "note"))
    assert(spark.sql(
      s"SELECT * FROM spec_cat.analytics.evolving VERSION AS OF $vBefore")
      .schema.fieldNames.toSeq == Seq("k", "cnt"))
    // non-widening change is rejected (Spark's analyzer catches it before
    // the catalog; export-side mergeSchemas enforces the same rule)
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE spec_cat.analytics.evolving ALTER COLUMN note TYPE BIGINT"))
    assert(e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN") ||
      e.getMessage.contains("incompatible"), e.getMessage)
  }

  test("three-part SQL name resolves and aggregates correctly") {
    commitOrders()
    val n = spark.sql("SELECT COUNT(*) FROM spec_cat.analytics.orders").head().getLong(0)
    assert(n == Tables.load(spark, sfDir, "orders").count())
  }

  test("VERSION AS OF reads the older snapshot") {
    commitOrders()
    val n0 = spark.sql(
      "SELECT COUNT(*) FROM spec_cat.analytics.orders VERSION AS OF 0").head().getLong(0)
    assert(n0 == Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") < 100).count())
  }

  test("TIMESTAMP AS OF reads the snapshot current at that time") {
    commitOrders()
    val store = new graft.store.TableStore(spark, s"$warehouse/analytics/orders")
    val t0 = store.manifest(0).committedAtMs
    val n0 = spark.sql(
      s"SELECT COUNT(*) FROM spec_cat.analytics.orders TIMESTAMP AS OF " +
        s"'${new java.sql.Timestamp(t0)}'").head().getLong(0)
    assert(n0 == Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") < 100).count())
  }

  test("predicates push into the snapshot's parquet scan") {
    commitOrders()
    val df = spark.sql(
      "SELECT o_orderkey FROM spec_cat.analytics.orders WHERE o_orderkey = 7")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_orderkey"), plan)
    assert(df.count() == 1)
  }

  test("partition pruning: status filter scans only matching partitions") {
    commitOrders()
    val df = spark.sql(
      "SELECT COUNT(*) FROM spec_cat.analytics.orders WHERE o_orderstatus = 'F'")
    val expected = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderstatus") === "F").count()
    assert(df.head().getLong(0) == expected)
  }

  test("INSERT INTO appends through the commit protocol, reusing existing files") {
    val store = new TableStore(spark, s"$warehouse/analytics/appendable")
    store.commitSnapshot(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val before = store.manifest(store.currentVersion()).inlineFiles.toSet
    spark.sql("INSERT INTO spec_cat.analytics.appendable VALUES (3, 'c'), (4, 'd')")
    val m = store.manifest(store.currentVersion())
    // append-only: every pre-existing data file inherited at its path
    assert(before.subsetOf(m.inlineFiles.toSet), "append rewrote existing files")
    assert(m.inlineFiles.size > before.size, "append added no files")
    val rows = spark.sql(
      "SELECT k, v FROM spec_cat.analytics.appendable ORDER BY k")
      .as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("INSERT OVERWRITE replaces content as a fresh full snapshot") {
    val store = new TableStore(spark, s"$warehouse/analytics/overwritable")
    store.commitSnapshot(Seq((1L, "old")).toDF("k", "v"))
    spark.sql("INSERT OVERWRITE spec_cat.analytics.overwritable VALUES (9, 'new')")
    val rows = spark.sql(
      "SELECT k, v FROM spec_cat.analytics.overwritable ORDER BY k")
      .as[(Long, String)].collect().toSeq
    assert(rows == Seq((9L, "new")))
    // old content still reachable via time travel
    assert(spark.sql(
      "SELECT v FROM spec_cat.analytics.overwritable VERSION AS OF 0")
      .as[String].collect().toSeq == Seq("old"))
  }

  test("CREATE TABLE AS SELECT materializes a query into the catalog") {
    commitOrders()
    spark.sql("DROP TABLE IF EXISTS spec_cat.analytics.orders_by_status")
    spark.sql(
      """CREATE TABLE spec_cat.analytics.orders_by_status AS
        |SELECT o_orderstatus, COUNT(*) AS n
        |FROM spec_cat.analytics.orders GROUP BY o_orderstatus""".stripMargin)
    val viaCtas = spark.sql(
      "SELECT o_orderstatus, n FROM spec_cat.analytics.orders_by_status ORDER BY 1")
      .as[(String, Long)].collect().toSeq
    val direct = spark.sql(
      """SELECT o_orderstatus, COUNT(*) FROM spec_cat.analytics.orders
        |GROUP BY 1 ORDER BY 1""".stripMargin)
      .as[(String, Long)].collect().toSeq
    assert(viaCtas == direct && viaCtas.nonEmpty)
  }

  test("ALTER TABLE ADD COLUMN is metadata-only: identical data-file list") {
    val store = new TableStore(spark, s"$warehouse/analytics/meta_only")
    store.commitSnapshot(Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity")))
    val m0 = store.manifest(store.currentVersion())
    spark.sql("ALTER TABLE spec_cat.analytics.meta_only ADD COLUMN tag STRING")
    val m1 = store.manifest(store.currentVersion())
    // the Glue semantics: a schema update NEVER rewrites data (VERDICT r4 #1)
    assert(m1.version == m0.version + 1)
    assert(m1.inlineFiles == m0.inlineFiles,
      "ALTER TABLE ADD COLUMN rewrote data files; must be metadata-only")
    val out = spark.sql(
      "SELECT l_orderkey, tag FROM spec_cat.analytics.meta_only WHERE l_orderkey = 1")
      .collect()
    assert(out.nonEmpty && out.forall(_.isNullAt(1)))
  }

  test("bucketed tables expose no phantom _gbucket column through the catalog") {
    val store = new TableStore(spark, s"$warehouse/analytics/bucketed")
    store.commitBucketed((1L to 30L).map(i => (i, s"v$i")).toDF("k", "v"),
      Seq("k"), numBuckets = 4)
    // single-dir bucketed manifest: the exact shape that used to
    // partition-discover the internal _gbucket dirs (ADVICE r4 medium)
    def check(tag: String): Unit = {
      spark.catalog.refreshTable("spec_cat.analytics.bucketed")
      val df = spark.sql("SELECT * FROM spec_cat.analytics.bucketed")
      assert(df.schema.fieldNames.toSeq == Seq("k", "v"),
        s"$tag: catalog schema leaked internal columns: ${df.schema.fieldNames.toSeq}")
      assert(df.count() == 30)
    }
    check("fresh commitBucketed")
    // incremental commit (multi-dir) and compact (single-dir again): the
    // schema must not flip shape depending on the last commit's kind
    graft.streaming.StreamingOps.applyCdcBatch(
      Seq((1L, "X", 1L, "MODIFY")).toDF("k", "v", "seq", "op"),
      store, Seq("k"), numBuckets = 4)
    check("after incremental commit")
    store.compact(targetFiles = 1)
    check("after compact")
  }

  test("partial-inherit hive manifest: store read recovers partitions, catalog refuses loudly") {
    val root = s"$warehouse/analytics/partial_hive"
    val store = new TableStore(spark, root)
    store.commitSnapshot(
      Seq((1L, "A"), (3L, "B")).toDF("k", "status"), partitionBy = Seq("status"))
    store.commitAppend(Seq((2L, "A"), (4L, "B")).toDF("k", "status"))
    val m1 = store.manifest(1)
    assert(m1.inlineFiles.size >= 4)
    // craft a MULTI-DIR manifest that references only a SUBSET of one snap
    // dir's files — unreachable via today's commit paths (ADVICE r4 latent
    // landmine). Spark's stock parquet scan cannot recover path-encoded
    // partition values for this shape (multiple hive roots conflict), so the
    // catalog must fail actionably rather than serve NULL partition columns;
    // the store's own reader handles it correctly.
    val dropped = m1.inlineFiles.head
    val droppedKeys = spark.read.parquet(dropped).select("k").as[Long].collect().toSet
    val m2 = m1.copy(version = 2, parent = 1, inlineFiles = m1.inlineFiles.tail,
      committedAtMs = System.currentTimeMillis())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "manifest", "v2.json"),
      m2.toJson.getBytes("UTF-8"))
    val expected = Map(1L -> "A", 2L -> "A", 3L -> "B", 4L -> "B")
    val rows = store.readSnapshot().as[(Long, String)].collect()
    assert(rows.length == 4 - droppedKeys.size)
    rows.foreach { case (k, s) =>
      assert(!droppedKeys.contains(k) && expected(k) == s, s"row ($k,$s) wrong")
    }
    val e = intercept[Exception] {
      spark.catalog.refreshTable("spec_cat.analytics.partial_hive")
      spark.sql("SELECT k, status FROM spec_cat.analytics.partial_hive").collect()
    }
    assert(e.getMessage.contains("readSnapshot"), e.getMessage)
  }

  test("DELETE FROM a bucketed table rewrites only the touched bucket") {
    val store = new TableStore(spark, s"$warehouse/analytics/del_bucketed")
    store.commitBucketed((1L to 100L).map(i => (i, s"v$i")).toDF("k", "v"),
      Seq("k"), numBuckets = 8)
    val m0 = store.manifest(0)
    spark.sql("DELETE FROM spec_cat.analytics.del_bucketed WHERE k = 5")
    val m1 = store.manifest(1)
    val touched = Seq(5L).toDF("k")
      .select(TableStore.bucketExpr(Seq("k"), 8).as("b")).as[Long].collect().toSet
    val untouched = m0.inlineFiles.filter(f =>
      !touched.contains(TableStore.bucketOfFile(f).get))
    assert(untouched.nonEmpty)
    untouched.foreach(f => assert(m1.inlineFiles.contains(f),
      s"DELETE k=5 rewrote an untouched bucket's file: $f"))
    spark.catalog.refreshTable("spec_cat.analytics.del_bucketed")
    val rows = spark.sql("SELECT k FROM spec_cat.analytics.del_bucketed")
      .as[Long].collect().toSet
    assert(rows.size == 99 && !rows.contains(5L))
  }

  test("DELETE FROM a plain table replaces only stat-candidate files") {
    val store = new TableStore(spark, s"$warehouse/analytics/del_plain")
    store.commitSnapshot((1L to 800L).map(i => (i, i % 5)).toDF("k", "grp")
      .repartitionByRange(8, col("k")))
    val m0 = store.manifest(0)
    assert(m0.inlineFiles.size == 8)
    spark.sql("DELETE FROM spec_cat.analytics.del_plain WHERE k BETWEEN 101 AND 150")
    val m1 = store.manifest(1)
    // range-sorted files: only the file(s) covering 101-150 are replaced
    val inherited = m1.inlineFiles.toSet intersect m0.inlineFiles.toSet
    assert(inherited.size >= 6,
      s"expected most files inherited, kept only ${inherited.size}")
    spark.catalog.refreshTable("spec_cat.analytics.del_plain")
    val ks = spark.sql("SELECT k FROM spec_cat.analytics.del_plain")
      .as[Long].collect().toSet
    assert(ks.size == 750 && !ks.exists(k => k >= 101 && k <= 150))
    // no-match delete touches nothing: same version, same files
    spark.sql("DELETE FROM spec_cat.analytics.del_plain WHERE k > 5000")
    assert(store.currentVersion() == m1.version)
  }

  test("DELETE with composite bucket keys targets the derived bucket") {
    val store = new TableStore(spark, s"$warehouse/analytics/del_multikey")
    store.commitBucketed(
      (1L to 60L).map(i => (i % 10, i, s"v$i")).toDF("pk", "sk", "v"),
      Seq("pk", "sk"), numBuckets = 8)
    val m0 = store.manifest(0)
    spark.sql(
      "DELETE FROM spec_cat.analytics.del_multikey WHERE pk = 3 AND sk = 13")
    val m1 = store.manifest(1)
    val touched = Seq((3L, 13L)).toDF("pk", "sk")
      .select(TableStore.bucketExpr(Seq("pk", "sk"), 8).as("b"))
      .as[Long].collect().toSet
    val untouched = m0.inlineFiles.filter(f =>
      !touched.contains(TableStore.bucketOfFile(f).get))
    assert(untouched.nonEmpty)
    untouched.foreach(f => assert(m1.inlineFiles.contains(f),
      s"composite-key DELETE rewrote untouched file $f"))
    spark.catalog.refreshTable("spec_cat.analytics.del_multikey")
    assert(spark.sql("SELECT COUNT(*) FROM spec_cat.analytics.del_multikey")
      .head().getLong(0) == 59)
  }

  test("TRUNCATE TABLE empties the table, keeping history") {
    val store = new TableStore(spark, s"$warehouse/analytics/trunc")
    store.commitSnapshot(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    spark.sql("TRUNCATE TABLE spec_cat.analytics.trunc")
    spark.catalog.refreshTable("spec_cat.analytics.trunc")
    assert(spark.sql("SELECT COUNT(*) FROM spec_cat.analytics.trunc")
      .head().getLong(0) == 0)
    assert(spark.sql(
      "SELECT COUNT(*) FROM spec_cat.analytics.trunc VERSION AS OF 0")
      .head().getLong(0) == 2)
  }

  test("UPDATE through SQL rewrites rows copy-on-write") {
    val store = new TableStore(spark, s"$warehouse/analytics/upd")
    store.commitBucketed(
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("k", "s", "n"),
      Seq("k"), numBuckets = 2)
    spark.sql(
      "UPDATE spec_cat.analytics.upd SET n = n + 100, s = 'upd' WHERE k >= 2")
    spark.catalog.refreshTable("spec_cat.analytics.upd")
    val rows = spark.sql("SELECT k, s, n FROM spec_cat.analytics.upd ORDER BY k")
      .as[(Long, String, Long)].collect().toSeq
    assert(rows == Seq((1L, "a", 10L), (2L, "upd", 120L), (3L, "upd", 130L)))
    // the previous content survives as a time-travel snapshot
    assert(spark.sql(
      "SELECT n FROM spec_cat.analytics.upd VERSION AS OF 0 WHERE k = 2")
      .as[Long].head() == 20L)
  }

  test("UPDATE with a key predicate rewrites only the touched bucket") {
    val store = new TableStore(spark, s"$warehouse/analytics/upd_targeted")
    store.commitBucketed((1L to 100L).map(i => (i, i * 10L)).toDF("k", "n"),
      Seq("k"), numBuckets = 8)
    val m0 = store.manifest(0)
    spark.sql("UPDATE spec_cat.analytics.upd_targeted SET n = 0 WHERE k = 7")
    val m1 = store.manifest(1)
    val touched = Seq(7L).toDF("k")
      .select(TableStore.bucketExpr(Seq("k"), 8).as("b")).as[Long].collect().toSet
    val untouched = m0.inlineFiles.filter(f =>
      !touched.contains(TableStore.bucketOfFile(f).get))
    assert(untouched.nonEmpty)
    untouched.foreach(f => assert(m1.inlineFiles.contains(f),
      s"UPDATE k=7 rewrote an untouched bucket's file: $f"))
    spark.catalog.refreshTable("spec_cat.analytics.upd_targeted")
    val got = spark.sql(
      "SELECT n FROM spec_cat.analytics.upd_targeted WHERE k IN (7, 8) ORDER BY k")
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 80L))
    assert(spark.sql("SELECT COUNT(*) FROM spec_cat.analytics.upd_targeted")
      .head().getLong(0) == 100)
  }

  test("MERGE INTO upserts through SQL: update matched, insert unmatched, delete on clause") {
    val store = new TableStore(spark, s"$warehouse/analytics/mrg")
    store.commitBucketed(
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("k", "s", "n"),
      Seq("k"), numBuckets = 2)
    Seq((2L, "B2", 200L), (3L, "C3", -1L), (9L, "new", 90L))
      .toDF("k", "s", "n").createOrReplaceTempView("mrg_src")
    spark.sql(
      """MERGE INTO spec_cat.analytics.mrg t USING mrg_src s ON t.k = s.k
        |WHEN MATCHED AND s.n < 0 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET t.s = s.s, t.n = s.n
        |WHEN NOT MATCHED THEN INSERT (k, s, n) VALUES (s.k, s.s, s.n)""".stripMargin)
    spark.catalog.refreshTable("spec_cat.analytics.mrg")
    val rows = spark.sql("SELECT k, s, n FROM spec_cat.analytics.mrg ORDER BY k")
      .as[(Long, String, Long)].collect().toSeq
    assert(rows == Seq((1L, "a", 10L), (2L, "B2", 200L), (9L, "new", 90L)))
  }

  test("MERGE runtime group filtering rewrites only buckets containing matches") {
    // ON t.k = s.k carries no literals, so static selection is ALL buckets;
    // RowLevelOperationRuntimeGroupFiltering hands the matched keys to the
    // COW scan at runtime and the commit must replace only their buckets,
    // inheriting every other file byte-identical (SPARK-38005 COW analog).
    val store = new TableStore(spark, s"$warehouse/analytics/mrg_rt")
    store.commitBucketed(
      (1L to 64L).map(k => (k, s"v$k", k * 10L)).toDF("k", "s", "n"),
      Seq("k"), numBuckets = 8)
    val m0 = store.manifest(0)
    // source hits 2 keys -> at most 2 buckets; plus one brand-new key whose
    // bucket may be un-matched (insert must append, not replace)
    Seq((5L, "up5", 500L), (6L, "up6", 600L), (999L, "new", 1L))
      .toDF("k", "s", "n").createOrReplaceTempView("mrg_rt_src")
    spark.sql(
      """MERGE INTO spec_cat.analytics.mrg_rt t USING mrg_rt_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET t.s = s.s, t.n = s.n
        |WHEN NOT MATCHED THEN INSERT (k, s, n) VALUES (s.k, s.s, s.n)""".stripMargin)
    val m1 = store.manifest(1)
    val matchedBuckets = Seq(5L, 6L).toDF("k")
      .select(TableStore.bucketExpr(Seq("k"), 8).as("b")).as[Long].collect().toSet
    val insertBucket = Seq(999L).toDF("k")
      .select(TableStore.bucketExpr(Seq("k"), 8).as("b")).as[Long].head()
    val replaceable = matchedBuckets + insertBucket
    m0.inlineFiles.filter(f =>
      !replaceable.contains(TableStore.bucketOfFile(f).get)).foreach(f =>
      assert(m1.inlineFiles.contains(f),
        s"MERGE with runtime group filter rewrote an unmatched bucket: $f"))
    // matched buckets WERE narrowed: their parent files are gone
    m0.inlineFiles.filter(f =>
      matchedBuckets.contains(TableStore.bucketOfFile(f).get)).foreach(f =>
      assert(!m1.inlineFiles.contains(f),
        s"matched bucket file should have been replaced: $f"))
    spark.catalog.refreshTable("spec_cat.analytics.mrg_rt")
    val got = spark.sql(
      "SELECT k, s, n FROM spec_cat.analytics.mrg_rt WHERE k IN (4,5,6,999) ORDER BY k")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((4L, "v4", 40L), (5L, "up5", 500L), (6L, "up6", 600L),
      (999L, "new", 1L)))
    assert(spark.sql("SELECT COUNT(*) FROM spec_cat.analytics.mrg_rt")
      .head().getLong(0) == 65)
  }

  test("MERGE with NOT MATCHED BY SOURCE touches every bucket (group filter must stand down)") {
    val store = new TableStore(spark, s"$warehouse/analytics/mrg_nmbs")
    store.commitBucketed(
      (1L to 32L).map(k => (k, k * 10L)).toDF("k", "n"), Seq("k"), numBuckets = 8)
    Seq((5L, 500L)).toDF("k", "n").createOrReplaceTempView("mrg_nmbs_src")
    // not-matched-by-source rows live in EVERY bucket; pruning any bucket
    // would silently keep its rows alive
    spark.sql(
      """MERGE INTO spec_cat.analytics.mrg_nmbs t USING mrg_nmbs_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET t.n = s.n
        |WHEN NOT MATCHED BY SOURCE AND t.k > 30 THEN DELETE""".stripMargin)
    spark.catalog.refreshTable("spec_cat.analytics.mrg_nmbs")
    val got = spark.sql(
      "SELECT k, n FROM spec_cat.analytics.mrg_nmbs ORDER BY k")
      .as[(Long, Long)].collect().toSeq
    assert(got.size == 30)
    assert(got.find(_._1 == 5L).map(_._2).contains(500L))
    assert(!got.exists(_._1 > 30))
  }

  test("SQL reads skip files via manifest stats on non-partition predicates") {
    val store = new TableStore(spark, s"$warehouse/analytics/skippy")
    store.commitSnapshot((1L to 800L).map(i => (i, s"name$i")).toDF("k", "v")
      .repartitionByRange(8, col("k")))
    assert(store.manifest(0).inlineFiles.size == 8)
    val q = spark.sql("SELECT v FROM spec_cat.analytics.skippy WHERE k = 400")
    assert(q.collect().map(_.getString(0)).toSeq == Seq("name400"))
    val plan = q.queryExecution.executedPlan.toString
    val m = "FileIndex\\((\\d+) paths\\)".r.findFirstMatchIn(plan)
    assert(m.nonEmpty, plan.take(800))
    assert(m.get.group(1).toInt == 1,
      s"expected 1 of 8 files after stats skipping, scanned ${m.get.group(1)}")
    assert(plan.contains("PushedFilters") && plan.contains("k"), plan.take(500))
    // unprunable query still reads everything correctly
    assert(spark.sql("SELECT COUNT(*) FROM spec_cat.analytics.skippy")
      .head().getLong(0) == 800)
  }

  test("CALL system procedures: compact, expire_snapshots, vacuum") {
    val store = new TableStore(spark, s"$warehouse/analytics/proc_tbl")
    store.commitSnapshot((1L to 200L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(8))
    Thread.sleep(30)
    store.commitAppend(Seq((201L, "x")).toDF("k", "v"))
    val filesBefore = store.manifest(store.currentVersion()).inlineFiles.size
    assert(filesBefore >= 8)
    val compacted = spark.sql(
      "CALL spec_cat.system.compact('analytics.proc_tbl', 2)").collect()
    assert(compacted.length == 1)
    assert(compacted.head.getInt(1) == filesBefore) // files_before
    assert(compacted.head.getInt(2) <= 2, compacted.head.toString) // files_after
    assert(store.readSnapshot().count() == 201)
    // expire everything older than 1 ms → only pre-compact snapshots drop
    // (0 disables a threshold — the two-knob unreferenced/noncurrent API)
    val expired = spark.sql(
      "CALL spec_cat.system.expire_snapshots('analytics.proc_tbl', 1)").collect()
    assert(expired.head.getInt(0) >= 1, expired.head.toString)
    // vacuum keeps the current snapshot; table still reads
    spark.sql("CALL spec_cat.system.vacuum('analytics.proc_tbl', 1)").collect()
    assert(store.existingVersions().size == 1)
    assert(store.readSnapshot().count() == 201)
    // sorted compaction through SQL: files get tight, disjoint k-bounds
    spark.sql("CALL spec_cat.system.compact('analytics.proc_tbl', 4, 'k')").collect()
    val m = store.manifest(store.currentVersion())
    val bounds = m.inlineFiles.flatMap(f => m.inlineStats(f).cols.get("k"))
      .map(c => (BigDecimal(c.min.get), BigDecimal(c.max.get))).sortBy(_._1)
    assert(bounds.size == 4)
    bounds.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi < lo, s"overlapping bounds: $bounds")
      case _ =>
    }
  }

  test("table introspection: TBLPROPERTIES facts and the $snapshots metadata table") {
    val store = new TableStore(spark, s"$warehouse/analytics/introspect")
    store.commitBucketed((1L to 50L).map(i => (i, s"v$i")).toDF("k", "v"),
      Seq("k"), numBuckets = 4)
    Thread.sleep(5)
    graft.streaming.StreamingOps.applyCdcBatch(
      Seq((1L, "X", 1L, "MODIFY")).toDF("k", "v", "seq", "op"),
      store, Seq("k"), numBuckets = 4)
    val props = spark.sql(
      "SHOW TBLPROPERTIES spec_cat.analytics.introspect")
      .as[(String, String)].collect().toMap
    assert(props("graft.version") == "1")
    assert(props("graft.bucket-keys") == "k" && props("graft.num-buckets") == "4")
    assert(props("graft.num-files").toInt == store.manifest(1).inlineFiles.size)
    assert(props("graft.size-bytes").toLong > 0)
    val snaps = spark.sql(
      "SELECT version, parent, n_files FROM spec_cat.analytics.`introspect$snapshots` ORDER BY version")
      .as[(Long, Long, Int)].collect().toSeq
    assert(snaps.map(_._1) == Seq(0L, 1L))
    assert(snaps(1)._2 == 0L)
    assert(snaps.forall(_._3 > 0))
    // $files: one row per current data file, bucket recovered from the path
    val files = spark.sql(
      "SELECT path, bucket, bytes, rows FROM spec_cat.analytics.`introspect$files`")
      .as[(String, Option[Long], Option[Long], Option[Long])].collect().toSeq
    val m = store.manifest(store.currentVersion())
    assert(files.map(_._1).sorted == m.inlineFiles.sorted)
    assert(files.forall(f => f._2.exists(b => b >= 0 && b < 4)))
    assert(files.flatMap(_._4).sum == 50L)
  }

  test("create_changelog_view surfaces row-level changes through SQL") {
    val store = new TableStore(spark, s"$warehouse/analytics/changes_sql")
    store.commitBucketed((1L to 40L).map(i => (i, s"v$i")).toDF("k", "v"),
      Seq("k"), numBuckets = 4)
    graft.streaming.StreamingOps.applyCdcBatch(
      Seq((7L, "V7", 1L, "MODIFY"), (8L, null.asInstanceOf[String], 1L, "REMOVE"),
        (100L, "new", 1L, "INSERT")).toDF("k", "v", "seq", "op"),
      store, Seq("k"), numBuckets = 4)
    val info = spark.sql(
      "CALL spec_cat.system.create_changelog_view('analytics.changes_sql', 0)")
      .as[(String, Long, Long)].head()
    assert(info == ("analytics_changes_sql_changes", 0L, 1L))
    val changes = spark.sql(
      "SELECT _change_type, k, v FROM analytics_changes_sql_changes ORDER BY k")
      .as[(String, Long, String)].collect().toSeq
    assert(changes == Seq(("UPDATE", 7L, "V7"), ("DELETE", 8L, "v8"),
      ("INSERT", 100L, "new")))
    // plain (non-bucketed) tables need key_columns — Iceberg's
    // identifier_columns analog
    val plain = new TableStore(spark, s"$warehouse/analytics/changes_plain")
    plain.commitSnapshot((1L to 10L).map(i => (i, s"v$i")).toDF("k", "v"))
    spark.sql("DELETE FROM spec_cat.analytics.changes_plain WHERE k = 3")
    spark.sql("CALL spec_cat.system.create_changelog_view(" +
      "'analytics.changes_plain', 0, -1, 'plain_changes', 'k')")
    assert(spark.sql("SELECT _change_type, k FROM plain_changes")
      .as[(String, Long)].collect().toSeq == Seq(("DELETE", 3L)))
  }

  test("$files metadata table time-travels with VERSION AS OF") {
    val store = new TableStore(spark, s"$warehouse/analytics/files_tt")
    store.commitSnapshot((1L to 5L).map(i => (i, s"v$i")).toDF("k", "v"))
    store.commitAppend(Seq((6L, "v6")).toDF("k", "v"))
    val v0Files = spark.sql(
      "SELECT path FROM spec_cat.analytics.`files_tt$files` VERSION AS OF 0")
      .as[String].collect().toSet
    val curFiles = spark.sql(
      "SELECT path FROM spec_cat.analytics.`files_tt$files`")
      .as[String].collect().toSet
    assert(v0Files == store.manifest(0).inlineFiles.toSet)
    assert(curFiles == store.manifest(1).inlineFiles.toSet)
    assert(v0Files.subsetOf(curFiles) && v0Files != curFiles)
  }

  test("ALTER TABLE RENAME COLUMN is metadata-only; old data resolves by field id") {
    val store = new TableStore(spark, s"$warehouse/analytics/renamer")
    store.commitSnapshot(Seq((1L, "a"), (2L, "b")).toDF("k", "label"))
    val filesBefore = store.manifest(0).inlineFiles
    spark.sql("ALTER TABLE spec_cat.analytics.renamer RENAME COLUMN label TO tag")
    // metadata-only: identical data files, new snapshot version
    assert(store.currentVersion() == 1)
    assert(store.manifest(1).inlineFiles == filesBefore,
      "RENAME COLUMN rewrote data files; must be metadata-only")
    // old files written under the OLD name still serve their values (field
    // ids, not names, carry column identity)
    val out = spark.sql(
      "SELECT k, tag FROM spec_cat.analytics.renamer ORDER BY k")
      .as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (2L, "b")))
    // time travel shows the pre-rename name with the same data
    val v0 = spark.sql(
      "SELECT * FROM spec_cat.analytics.renamer VERSION AS OF 0")
    assert(v0.schema.fieldNames.toSeq == Seq("k", "label"))
    assert(v0.orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // writes after the rename interleave with pre-rename files
    spark.sql("INSERT INTO spec_cat.analytics.renamer VALUES (3, 'c')")
    assert(spark.sql(
      "SELECT tag FROM spec_cat.analytics.renamer ORDER BY k")
      .as[String].collect().toSeq == Seq("a", "b", "c"))
  }

  test("changelog reads map renamed columns across versions by field id") {
    val root = s"$warehouse/analytics/renamed_cdc"
    val store = new TableStore(spark, root)
    store.commitBucketed(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), Seq("k"), 4)
    spark.sql(s"ALTER TABLE spec_cat.analytics.renamed_cdc RENAME COLUMN v TO amount")
    // rewrite key 1's bucket under the new schema
    val touched = Seq(
      Seq(1L).toDF("k").select(TableStore.bucketExpr(Seq("k"), 4).as("b"))
        .as[Long].head())
    val newContent = store.readBuckets(touched)
      .withColumn("amount", when($"k" === 1L, lit(11L)).otherwise($"amount"))
    store.commitIncremental(newContent, touched)
    // pre-images from the pre-rename snapshot (written as `v`) align to
    // `amount` by field id: the change shows as one UPDATE, never a
    // DELETE+INSERT pair of the renamed column
    val cl = store.readChangelog(0, 2, Seq("k"))
    val rows = cl.select("_change_type", "k", "amount")
      .as[(String, Long, Long)].collect().toSeq
    assert(rows == Seq(("UPDATE", 1L, 11L)), s"changelog: $rows")
  }

  test("ALTER TABLE DROP COLUMN is metadata-only; a re-added name never resurrects dropped data") {
    val store = new TableStore(spark, s"$warehouse/analytics/dropper")
    store.commitSnapshot(Seq((1L, "x", 5L), (2L, "y", 6L)).toDF("k", "s", "n"))
    val filesBefore = store.manifest(0).inlineFiles
    spark.sql("ALTER TABLE spec_cat.analytics.dropper DROP COLUMN s")
    assert(store.manifest(1).inlineFiles == filesBefore,
      "DROP COLUMN rewrote data files; must be metadata-only")
    assert(spark.sql("SELECT * FROM spec_cat.analytics.dropper")
      .schema.fieldNames.toSeq == Seq("k", "n"))
    // time travel still shows the dropped column with its data
    assert(spark.sql(
      "SELECT s FROM spec_cat.analytics.dropper VERSION AS OF 0 ORDER BY s")
      .as[String].collect().toSeq == Seq("x", "y"))
    // re-adding the name draws a FRESH field id: the old column's bytes are
    // still in the files but must NOT resurrect (Iceberg drop semantics)
    spark.sql("ALTER TABLE spec_cat.analytics.dropper ADD COLUMN s STRING")
    val out = spark.sql(
      "SELECT k, s FROM spec_cat.analytics.dropper ORDER BY k").collect()
    assert(out.forall(_.isNullAt(1)),
      s"re-added column resurrected dropped data: ${out.mkString(",")}")
  }

  test("stats of dropped/renamed-away names never prune re-added columns (soundness)") {
    // drop s, re-add s: old files' manifest stats still describe the OLD s
    // (nulls=0, tight bounds) while the re-added s reads as NULL there — a
    // stats prune keyed by name would drop those files and LOSE rows
    val store = new TableStore(spark, s"$warehouse/analytics/statdrop")
    store.commitSnapshot(Seq((1L, "x"), (2L, "y")).toDF("k", "s"))
    spark.sql("ALTER TABLE spec_cat.analytics.statdrop DROP COLUMN s")
    spark.sql("ALTER TABLE spec_cat.analytics.statdrop ADD COLUMN s STRING")
    // all rows have s NULL now; IS NULL must return both, IS NOT NULL none
    val sqlNull = spark.sql(
      "SELECT count(*) FROM spec_cat.analytics.statdrop WHERE s IS NULL")
      .head().getLong(0)
    val storeNull = store.readSnapshot().filter($"s".isNull).count()
    val storeNoPush = store.readSnapshot().collect().count(_.isNullAt(
      store.readSnapshot().columns.indexOf("s")))
    assert(sqlNull == 2 && storeNull == 2,
      s"stale stats pruned files whose re-added column is NULL " +
        s"(sql=$sqlNull store=$storeNull nopush=$storeNoPush)")
    assert(spark.sql(
      "SELECT count(*) FROM spec_cat.analytics.statdrop WHERE s = 'x'")
      .head().getLong(0) == 0)
    // store-API path takes the same pruning code
    assert(store.readSnapshot().filter($"s".isNull).count() == 2)

    // rename swap: a->b then c->a; stats recorded under the ORIGINAL a must
    // not serve predicates on the NEW a (which is old c)
    val store2 = new TableStore(spark, s"$warehouse/analytics/statswap")
    store2.commitSnapshot(Seq((1L, 100L, 1L), (2L, 200L, 2L)).toDF("k", "a", "c"))
    spark.sql("ALTER TABLE spec_cat.analytics.statswap RENAME COLUMN a TO b")
    spark.sql("ALTER TABLE spec_cat.analytics.statswap RENAME COLUMN c TO a")
    // new a's values are 1,2; old a's stats said [100,200] — a prune keyed
    // by name would claim a=1 cannot match and lose the row
    assert(spark.sql(
      "SELECT count(*) FROM spec_cat.analytics.statswap WHERE a = 1")
      .head().getLong(0) == 1,
      "stale stats under a reused name pruned a matching file")
  }

  test("RENAME/DROP of bucket-key or partition columns is refused loudly") {
    val store = new TableStore(spark, s"$warehouse/analytics/layoutcols")
    store.commitBucketed(Seq((1L, 2L)).toDF("k", "v"), Seq("k"), 4)
    val e1 = intercept[Exception](spark.sql(
      "ALTER TABLE spec_cat.analytics.layoutcols RENAME COLUMN k TO kk"))
    assert(e1.getMessage.contains("bucket-key"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "ALTER TABLE spec_cat.analytics.layoutcols DROP COLUMN k"))
    assert(e2.getMessage.contains("bucket-key"), e2.getMessage)
  }

  test("COUNT/MIN/MAX answer from the manifest with zero file I/O; unsafe shapes decline") {
    val store = new TableStore(spark, s"$warehouse/analytics/aggpd")
    store.commitSnapshot(
      (1L to 100L).map(k => (k, if (k % 10 == 0) null else s"s$k",
        java.sql.Date.valueOf(s"2026-01-${(k % 28 + 1).toString.reverse.padTo(2, '0').reverse}")))
        .toDF("k", "s", "d").repartition(4))
    spark.catalog.refreshTable("spec_cat.analytics.aggpd")
    val q = spark.sql(
      "SELECT COUNT(*) AS n, COUNT(s) AS ns, MIN(k) AS mn, MAX(k) AS mx, MAX(d) AS md " +
        "FROM spec_cat.analytics.aggpd")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("graft-manifest-agg") || plan.contains("LocalTableScan"),
      s"expected manifest-served aggregate, plan scans files:\n$plan")
    assert(!plan.contains("Parquet"), s"no file scan expected:\n$plan")
    val r = q.head()
    assert(r.getLong(0) == 100L && r.getLong(1) == 90L)
    assert(r.getLong(2) == 1L && r.getLong(3) == 100L)
    assert(r.getDate(4).toString == "2026-01-28")
    // declines: WHERE (residual filter), GROUP BY, string MIN (truncatable),
    // DISTINCT — all must still scan and stay correct
    Seq(
      "SELECT COUNT(*) FROM spec_cat.analytics.aggpd WHERE k > 50" -> 50L,
      "SELECT COUNT(DISTINCT s) FROM spec_cat.analytics.aggpd" -> 90L).foreach {
      case (sql, want) =>
        val d = spark.sql(sql)
        assert(!d.queryExecution.executedPlan.toString.contains("graft-manifest-agg"),
          s"unsafe shape must not push: $sql")
        assert(d.head().getLong(0) == want, sql)
    }
    // string MIN serves since r16 (engine-written bounds carry the exact
    // flag); result identical either way
    val smin = spark.sql("SELECT MIN(s) FROM spec_cat.analytics.aggpd")
    assert(smin.queryExecution.executedPlan.toString.contains("graft-manifest-agg") ||
      smin.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(smin.head().getString(0) == "s1")
    val grp = spark.sql(
      "SELECT k % 2, COUNT(*) FROM spec_cat.analytics.aggpd GROUP BY 1 ORDER BY 1")
    assert(!grp.queryExecution.executedPlan.toString.contains("graft-manifest-agg"))
    assert(grp.collect().map(_.getLong(1)).toSeq == Seq(50L, 50L))
  }

  test("SQL over a DV'd snapshot: effective rows via the V1 fallback, stock plan after purge") {
    val store = new TableStore(spark, s"$warehouse/analytics/dvsql")
    store.commitBucketed(
      (1L to 500L).map(k => (k, s"v$k")).toDF("k", "v"), Seq("k"), 4)
    store.deleteMor(col("k") <= 50L)
    spark.catalog.refreshTable("spec_cat.analytics.dvsql")
    val q = spark.sql("SELECT COUNT(*) AS n FROM spec_cat.analytics.dvsql")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("graft-manifest-agg"),
      s"manifest aggregate must decline under DVs:\n$plan")
    assert(plan.contains("graft-dv-scan"), s"expected the DV fallback:\n$plan")
    assert(q.head().getLong(0) == 450L)
    // point lookups: deleted key gone, live key present, filters still work
    assert(spark.sql(
      "SELECT * FROM spec_cat.analytics.dvsql WHERE k = 7").count() == 0)
    assert(spark.sql(
      "SELECT v FROM spec_cat.analytics.dvsql WHERE k = 77").head()
      .getString(0) == "v77")
    // SQL UPDATE (COW) over the DV'd table: the operation builder folds the
    // DVs first (targeted purge) so the stock COW scan cannot resurrect
    // deleted rows — then updates on the clean snapshot
    spark.sql("UPDATE spec_cat.analytics.dvsql SET v = 'updated' WHERE k = 60")
    spark.catalog.refreshTable("spec_cat.analytics.dvsql")
    assert(!store.manifest(store.currentVersion()).hasDvs,
      "COW DML must purge delete vectors before rewriting")
    assert(spark.sql("SELECT COUNT(*) AS n FROM spec_cat.analytics.dvsql")
      .head().getLong(0) == 450L)
    assert(spark.sql(
      "SELECT v FROM spec_cat.analytics.dvsql WHERE k = 60").head()
      .getString(0) == "updated")
    assert(spark.sql(
      "SELECT COUNT(*) FROM spec_cat.analytics.dvsql WHERE k <= 50").head()
      .getLong(0) == 0L, "COW update resurrected DV-deleted rows")
    // post-purge plans are back on the stock DSv2 path
    val q2 = spark.sql("SELECT COUNT(*) AS n FROM spec_cat.analytics.dvsql")
    assert(q2.head().getLong(0) == 450L)
    assert(!q2.queryExecution.executedPlan.toString.contains("graft-dv-scan"))
  }

  test("LIMIT pushdown plans only the files covering the limit") {
    val store = new TableStore(spark, s"$warehouse/analytics/limtab")
    store.commitSnapshot(
      (1L to 800L).map(k => (k, s"v$k")).toDF("k", "v").repartition(8))
    spark.catalog.refreshTable("spec_cat.analytics.limtab")
    def planned(sql: String): (Long, Long) = {
      val df = spark.sql(sql)
      val n = df.collect().length.toLong
      val plan = df.queryExecution.executedPlan.toString
      val files = "FileIndex\\((\\d+) paths\\)".r
        .findFirstMatchIn(plan).map(_.group(1).toLong)
        .getOrElse(sys.error(s"no file index in plan:\n${plan.take(600)}"))
      (files, n)
    }
    val (f1, n1) = planned("SELECT * FROM spec_cat.analytics.limtab LIMIT 5")
    assert(n1 == 5L)
    assert(f1 == 1L, s"LIMIT 5 should plan 1 file, planned $f1")
    // a filter disables the file-level limit (rows may be filtered away)
    val (f2, n2) = planned(
      "SELECT * FROM spec_cat.analytics.limtab WHERE k > 700 LIMIT 5")
    assert(n2 == 5L)
    assert(f2 > 1L, "filtered LIMIT must not shrink the file list")
    // LIMIT larger than the table: every file planned, all rows back
    val (f3, n3) = planned("SELECT * FROM spec_cat.analytics.limtab LIMIT 10000")
    assert(n3 == 800L && f3 == 8L)
  }

  test("LIMIT pushdown on the SHARDED tier plans the shard-prefix file subset") {
    // the 100 TB tier by construction (VERDICT r12 next #1): the preview
    // query must plan O(files covering n rows) without ever materializing
    // the full candidate list on the driver
    spark.conf.set("spark.graft.manifest.inlineThreshold", "8")
    spark.conf.set("spark.graft.manifest.filesPerShard", "16")
    try {
      val store = new TableStore(spark, s"$warehouse/analytics/shlim")
      store.commitSnapshot(
        (1L to 2000L).map(k => (k, s"v$k")).toDF("k", "v").repartition(64))
      assert(store.manifest(store.currentVersion()).isSharded,
        "64 files over threshold 8 must shard")
      spark.catalog.refreshTable("spec_cat.analytics.shlim")
      val before = TableStore.driverMaterializations.get()
      def planned(sql: String): (Long, Long) = {
        val df = spark.sql(sql)
        val n = df.collect().length.toLong
        val plan = df.queryExecution.executedPlan.toString
        val files = "FileIndex\\((\\d+) paths\\)".r
          .findFirstMatchIn(plan).map(_.group(1).toLong)
          .getOrElse(sys.error(s"no file index in plan:\n${plan.take(600)}"))
        (files, n)
      }
      val (f1, n1) = planned("SELECT * FROM spec_cat.analytics.shlim LIMIT 10")
      assert(n1 == 10L)
      assert(f1 == 1L, s"LIMIT 10 over ~31-row files should plan 1 file, planned $f1")
      // a filter disables the file-level limit (rows may be filtered away)
      val (f2, n2) = planned(
        "SELECT * FROM spec_cat.analytics.shlim WHERE k > 1500 LIMIT 5")
      assert(n2 == 5L)
      assert(f2 > 1L, "filtered LIMIT must not shrink the file list")
      // LIMIT past the table: every file planned, all rows back
      val (f3, n3) = planned("SELECT * FROM spec_cat.analytics.shlim LIMIT 10000")
      assert(n3 == 2000L && f3 == 64L)
      assert(TableStore.driverMaterializations.get() == before,
        "sharded LIMIT planning must never take the full-file-list escape hatch")
    } finally {
      spark.conf.unset("spark.graft.manifest.inlineThreshold")
      spark.conf.unset("spark.graft.manifest.filesPerShard")
    }
  }

  test("file-decidable filters: COUNT/MIN/MAX WHERE served from footer stats; " +
      "exact scans plan only all-match files; undecidable falls back") {
    val store = new TableStore(spark, s"$warehouse/analytics/decid")
    // 8 range-disjoint files: file i holds k ∈ (i*100, (i+1)*100]
    def chunk(i: Int) = ((i * 100L + 1) to (i * 100L + 100))
      .map(k => (k, k * 2, s"p${k % 3}")).toDF("k", "amt", "tag").coalesce(1)
    store.commitSnapshot(chunk(0))
    (1 to 7).foreach(i => store.commitAppend(chunk(i)))
    spark.catalog.refreshTable("spec_cat.analytics.decid")
    def q(sql: String) = spark.sql(sql)
    // aggregate + decidable WHERE: every file all-match or no-match →
    // LocalScan, zero parquet I/O
    val agg = q("SELECT COUNT(*) AS n, MIN(k) AS mn, MAX(amt) AS mx " +
      "FROM spec_cat.analytics.decid WHERE k > 200 AND k <= 500")
    val row = agg.head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ==
      (300L, 201L, 1000L))
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(aggPlan.contains("graft-manifest-agg") ||
      aggPlan.contains("LocalTableScan"),
      s"filtered aggregate should serve from the manifest:\n${aggPlan.take(600)}")
    assert(!aggPlan.contains("Parquet"), "zero-file contract broken")
    // empty decidable range: COUNT 0, MIN/MAX NULL, still zero-scan
    val empty = q("SELECT COUNT(*) AS n, MIN(k) AS mn " +
      "FROM spec_cat.analytics.decid WHERE k > 5000")
    assert(empty.head().getLong(0) == 0L && empty.head().isNullAt(1))
    assert(!empty.queryExecution.executedPlan.toString.contains("Parquet"))
    // plain decidable scan: filter fully pushed (no Filter node), only
    // all-match files planned, rows exact
    val scan = q("SELECT k FROM spec_cat.analytics.decid WHERE k <= 300")
    assert(scan.collect().map(_.getLong(0)).sorted.toSeq == (1L to 300L))
    val scanPlan = scan.queryExecution.executedPlan.toString
    val planned = "FileIndex\\((\\d+) paths\\)".r
      .findFirstMatchIn(scanPlan).map(_.group(1).toLong).getOrElse(-1L)
    assert(planned == 3L, s"decidable scan should plan 3 files, planned $planned")
    assert(!scanPlan.contains("Filter ("),
      s"decidable filter must be fully pushed:\n${scanPlan.take(600)}")
    // decidable + LIMIT: the kept prefix covering n rows
    val lim = q("SELECT * FROM spec_cat.analytics.decid WHERE k > 100 LIMIT 5")
    assert(lim.collect().length == 5)
    val limPlanned = "FileIndex\\((\\d+) paths\\)".r
      .findFirstMatchIn(lim.queryExecution.executedPlan.toString)
      .map(_.group(1).toLong).getOrElse(-1L)
    assert(limPlanned == 1L, s"decidable LIMIT should plan 1 file, planned $limPlanned")
    // UNDECIDABLE (file 3 straddles k=250; strings decline by type):
    // ordinary residual-filter path, results still exact
    val und = q("SELECT COUNT(*) AS n FROM spec_cat.analytics.decid WHERE k <= 250")
    assert(und.head().getLong(0) == 250L)
    assert(!und.queryExecution.executedPlan.toString.contains("graft-manifest-agg"),
      "a straddling file must decline the metadata serve")
    val str = q("SELECT COUNT(*) AS n FROM spec_cat.analytics.decid WHERE tag = 'p1'")
    assert(str.head().getLong(0) == 267L)
  }

  test("HYBRID straddle-tolerant filtered metadata aggregates: footer " +
      "stats answer the all-match files, ONLY the straddler is scanned, " +
      "the merge is exact; all-straddle declines cleanly") {
    val store = new TableStore(spark, s"$warehouse/analytics/hybridagg")
    // 8 range-disjoint files on k; `opt` has a NULL slice so COUNT(col)
    // exercises the null-count merge
    def chunk(i: Int) = ((i * 100L + 1) to (i * 100L + 100))
      .map(k => (k, k * 2, if (k % 5 == 0) None else Some(k * 3)))
      .toDF("k", "amt", "opt").coalesce(1)
    store.commitSnapshot(chunk(0))
    (1 to 7).foreach(i => store.commitAppend(chunk(i)))
    spark.catalog.refreshTable("spec_cat.analytics.hybridagg")
    // k <= 250: files 0,1 all-match (stats), file 2 straddles (scanned),
    // 3..7 pruned outright
    val df = spark.sql(
      "SELECT COUNT(*) AS n, COUNT(opt) AS no, MIN(k) AS mn, " +
        "MAX(amt) AS mx FROM spec_cat.analytics.hybridagg WHERE k <= 250")
    assert(graft.catalog.HybridMetaAgg.served(df),
      s"straddled filtered aggregate must take the hybrid serve:\n" +
        s"${df.queryExecution.optimizedPlan}")
    val r = df.head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (250L, 200L, 1L, 500L), s"hybrid merge drifted: ${r.toSeq}")
    assert(df.inputFiles.length == 1,
      s"only the straddler file may be scanned: ${df.inputFiles.length}")
    // parity with the rule off
    spark.conf.set("spark.graft.agg.metadata.hybrid", "false")
    try {
      val off = spark.sql(
        "SELECT COUNT(*) AS n, COUNT(opt) AS no, MIN(k) AS mn, " +
          "MAX(amt) AS mx FROM spec_cat.analytics.hybridagg WHERE k <= 250")
      assert(!graft.catalog.HybridMetaAgg.served(off))
      assert(off.head().toSeq == r.toSeq, "kill switch changed results")
    } finally spark.conf.unset("spark.graft.agg.metadata.hybrid")
    // nothing provably all-match (the only candidate straddles): decline
    val allStraddle = spark.sql("SELECT COUNT(*) AS n FROM " +
      "spec_cat.analytics.hybridagg WHERE k >= 50 AND k <= 60")
    assert(!graft.catalog.HybridMetaAgg.served(allStraddle),
      "all-straddle must fall back to the ordinary scan")
    assert(allStraddle.head().getLong(0) == 11L)
    // a shape stats can never prove (modulo) declines before classifying
    val mod = spark.sql("SELECT COUNT(*) AS n FROM " +
      "spec_cat.analytics.hybridagg WHERE k % 10 = 3")
    assert(!graft.catalog.HybridMetaAgg.served(mod))
    assert(mod.head().getLong(0) == 80L)
  }

  test("SORTED top-k pushdown: ORDER BY col LIMIT n plans only the files " +
      "that can reach the top-n, both directions; nulls-first keeps " +
      "null-carrying files; filters/ties-at-scale decline to a full scan") {
    val store = new TableStore(spark, s"$warehouse/analytics/topk")
    // 8 range-disjoint files on k + one null-k file
    def chunk(i: Int) = ((i * 100L + 1) to (i * 100L + 100))
      .map(k => (Option(k), k * 2)).toDF("k", "amt").coalesce(1)
    store.commitSnapshot(chunk(0))
    (1 to 7).foreach(i => store.commitAppend(chunk(i)))
    store.commitAppend(Seq((Option.empty[Long], 9999L), (Option.empty[Long], 9998L))
      .toDF("k", "amt").coalesce(1))
    spark.catalog.refreshTable("spec_cat.analytics.topk")
    def planned(df: org.apache.spark.sql.DataFrame): Int =
      "FileIndex\\((\\d+) paths\\)".r
        .findFirstMatchIn(df.queryExecution.executedPlan.toString)
        .map(_.group(1).toInt).getOrElse(-1)
    // ASC NULLS LAST: the lowest-range file alone guarantees 5 rows
    val asc = spark.sql("SELECT k, amt FROM spec_cat.analytics.topk " +
      "ORDER BY k ASC NULLS LAST LIMIT 5")
    assert(asc.collect().map(_.getLong(0)).toSeq == (1L to 5L))
    assert(planned(asc) == 1, s"ASC top-5 must plan 1 file, ${planned(asc)}")
    // DESC NULLS LAST: the highest-range file alone
    val desc = spark.sql("SELECT k FROM spec_cat.analytics.topk " +
      "ORDER BY k DESC NULLS LAST LIMIT 5")
    assert(desc.collect().map(_.getLong(0)).toSeq ==
      (800L to 796L by -1L))
    assert(planned(desc) == 1, s"DESC top-5 must plan 1 file, ${planned(desc)}")
    // ASC NULLS FIRST: nulls rank first — the null file must be planned,
    // and with only 2 nulls the lowest-range file still joins it
    val nf = spark.sql("SELECT k, amt FROM spec_cat.analytics.topk " +
      "ORDER BY k ASC NULLS FIRST LIMIT 5")
    val nfRows = nf.collect()
    assert(nfRows.take(2).forall(_.isNullAt(0)) &&
      nfRows.drop(2).map(_.getLong(0)).toSeq == (1L to 3L))
    assert(planned(nf) == 2, s"NULLS FIRST must plan null file + lowest, " +
      s"${planned(nf)}")
    // a filter declines the top-k file pruning (rows may be filtered away)
    val filt = spark.sql("SELECT k FROM spec_cat.analytics.topk " +
      "WHERE amt % 2 = 0 ORDER BY k ASC NULLS LAST LIMIT 5")
    assert(filt.collect().map(_.getLong(0)).toSeq == (1L to 5L))
    assert(planned(filt) > 2, "a filtered top-k must not file-prune")
  }

  test("SORTED top-k composes with exact-decidable filters and prunes on " +
      "the LEADING key of a multi-key ORDER BY (r14)") {
    val store = new TableStore(spark, s"$warehouse/analytics/topk2")
    // 8 range-disjoint files on k, each with a CONSTANT seg = i % 2 —
    // `WHERE seg = 0` decides every file, and within the kept half the
    // lowest-range file alone covers the top-5
    def chunk(i: Int) = ((i * 100L + 1) to (i * 100L + 100))
      .map(k => (k, k * 2, i % 2)).toDF("k", "amt", "seg").coalesce(1)
    store.commitSnapshot(chunk(0))
    (1 to 7).foreach(i => store.commitAppend(chunk(i)))
    spark.catalog.refreshTable("spec_cat.analytics.topk2")
    def planned(df: org.apache.spark.sql.DataFrame): Int =
      "FileIndex\\((\\d+) paths\\)".r
        .findFirstMatchIn(df.queryExecution.executedPlan.toString)
        .map(_.group(1).toInt).getOrElse(-1)
    val filtered = spark.sql("SELECT k FROM spec_cat.analytics.topk2 " +
      "WHERE seg = 0 ORDER BY k ASC NULLS LAST LIMIT 5")
    assert(filtered.collect().map(_.getLong(0)).toSeq == (1L to 5L))
    assert(planned(filtered) == 1,
      s"exact-filtered top-5 must plan 1 file, ${planned(filtered)}")
    // filtered DESC: kept files {0,2,4,6} -> the top range among them is
    // file 6 (601-700)
    val fd = spark.sql("SELECT k FROM spec_cat.analytics.topk2 " +
      "WHERE seg = 0 ORDER BY k DESC NULLS LAST LIMIT 5")
    assert(fd.collect().map(_.getLong(0)).toSeq == (700L to 696L by -1L))
    assert(planned(fd) == 1,
      s"exact-filtered DESC top-5 must plan 1 file, ${planned(fd)}")
    // multi-key: the tie-break key cannot rescue rows strictly worse on
    // the leading key, so pruning on k alone stays sound
    val mk = spark.sql("SELECT k, amt FROM spec_cat.analytics.topk2 " +
      "ORDER BY k ASC NULLS LAST, amt DESC LIMIT 5")
    assert(mk.collect().map(_.getLong(0)).toSeq == (1L to 5L))
    assert(planned(mk) == 1,
      s"multi-key top-5 must plan 1 file on the leading key, ${planned(mk)}")
  }

  test("HYBRID filtered metadata aggregates on the SHARDED tier: the " +
      "three-way sweep feeds the stats merge; only straddlers scanned") {
    spark.conf.set("spark.graft.manifest.inlineThreshold", "4")
    spark.conf.set("spark.graft.manifest.filesPerShard", "8")
    try {
      val store = new TableStore(spark, s"$warehouse/analytics/hybridaggs")
      def chunk(i: Int) = ((i * 100L + 1) to (i * 100L + 100))
        .map(k => (k, k * 2)).toDF("k", "amt").coalesce(1)
      store.commitSnapshot(chunk(0))
      (1 to 7).foreach(i => store.commitAppend(chunk(i)))
      require(store.manifest(store.currentVersion()).isSharded)
      spark.catalog.refreshTable("spec_cat.analytics.hybridaggs")
      val df = spark.sql(
        "SELECT COUNT(*) AS n, MIN(k) AS mn, MAX(amt) AS mx " +
          "FROM spec_cat.analytics.hybridaggs WHERE k <= 450")
      assert(graft.catalog.HybridMetaAgg.served(df),
        s"sharded hybrid serve expected:\n${df.queryExecution.optimizedPlan}")
      assert(df.head().toSeq == Seq(450L, 1L, 900L))
      assert(df.inputFiles.length == 1,
        s"sharded hybrid must scan only the straddler: ${df.inputFiles.length}")
    } finally {
      spark.conf.unset("spark.graft.manifest.inlineThreshold")
      spark.conf.unset("spark.graft.manifest.filesPerShard")
    }
  }

  test("file-decidable filters on the SHARDED tier: one distributed sweep " +
      "classifies every file; zero-scan filtered aggregates; straddles fall back") {
    spark.conf.set("spark.graft.manifest.inlineThreshold", "4")
    spark.conf.set("spark.graft.manifest.filesPerShard", "8")
    try {
      val store = new TableStore(spark, s"$warehouse/analytics/shdecid")
      def chunk(i: Int) = ((i * 100L + 1) to (i * 100L + 100))
        .map(k => (k, k * 2)).toDF("k", "amt").coalesce(1)
      store.commitSnapshot(chunk(0))
      (1 to 15).foreach(i => store.commitAppend(chunk(i)))
      assert(store.manifest(store.currentVersion()).isSharded,
        "16 files over threshold 4 must shard")
      spark.catalog.refreshTable("spec_cat.analytics.shdecid")
      val before = TableStore.driverMaterializations.get()
      // filtered aggregate: decidable range → LocalScan from shard stats
      val agg = spark.sql("SELECT COUNT(*) AS n, MIN(k) AS mn, MAX(amt) AS mx " +
        "FROM spec_cat.analytics.shdecid WHERE k > 400 AND k <= 900")
      val r = agg.head()
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (500L, 401L, 1800L))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(aggPlan.contains("graft-manifest-agg") ||
        aggPlan.contains("LocalTableScan"),
        s"sharded filtered aggregate should zero-scan:\n${aggPlan.take(500)}")
      assert(!aggPlan.contains("Parquet"))
      // exact scan: only all-match files planned, no Filter node
      val scan = spark.sql(
        "SELECT k FROM spec_cat.analytics.shdecid WHERE k <= 300")
      assert(scan.collect().map(_.getLong(0)).sorted.toSeq == (1L to 300L))
      val planned = "FileIndex\\((\\d+) paths\\)".r
        .findFirstMatchIn(scan.queryExecution.executedPlan.toString)
        .map(_.group(1).toLong).getOrElse(-1L)
      assert(planned == 3L, s"sharded decidable scan: 3 files, planned $planned")
      // decidable filter + LIMIT: kept prefix
      val lim = spark.sql(
        "SELECT * FROM spec_cat.analytics.shdecid WHERE k > 200 LIMIT 7")
      assert(lim.collect().length == 7)
      assert("FileIndex\\((\\d+) paths\\)".r
        .findFirstMatchIn(lim.queryExecution.executedPlan.toString)
        .map(_.group(1).toLong).contains(1L))
      // a straddling file (k <= 450) falls back, results exact
      val und = spark.sql(
        "SELECT COUNT(*) AS n FROM spec_cat.analytics.shdecid WHERE k <= 450")
      assert(und.head().getLong(0) == 450L)
      assert(!und.queryExecution.executedPlan.toString
        .contains("graft-manifest-agg"))
      assert(TableStore.driverMaterializations.get() == before,
        "the sharded decidability sweep must never take the escape hatch")
    } finally {
      spark.conf.unset("spark.graft.manifest.inlineThreshold")
      spark.conf.unset("spark.graft.manifest.filesPerShard")
    }
  }

  test("row-level DML over a file-decidable predicate stays exact (the " +
      "fully-pushed filter must not leak rows into the positional fallback)") {
    val store = new TableStore(spark, s"$warehouse/analytics/dmldecid")
    def chunk(i: Int) = ((i * 100L + 1) to (i * 100L + 100))
      .map(k => (k, k * 10)).toDF("k", "amt").coalesce(1)
    store.commitSnapshot(chunk(0))
    (1 to 5).foreach(i => store.commitAppend(chunk(i)))
    spark.catalog.refreshTable("spec_cat.analytics.dmldecid")
    // MOR DELETE with a decidable range: the delta scan reads _g_file/_g_pos
    // (the DvV1Scan branch) under the fully-pushed filter
    spark.conf.set("spark.graft.delete.mode", "mor")
    try spark.sql(
      "DELETE FROM spec_cat.analytics.dmldecid WHERE k > 100 AND k <= 300")
    finally spark.conf.unset("spark.graft.delete.mode")
    spark.catalog.refreshTable("spec_cat.analytics.dmldecid")
    assert(spark.sql("SELECT COUNT(*) FROM spec_cat.analytics.dmldecid")
      .head().getLong(0) == 400L)
    assert(spark.sql("SELECT COUNT(*) FROM spec_cat.analytics.dmldecid " +
      "WHERE k <= 300").head().getLong(0) == 100L)
    // COW UPDATE with a decidable range over the DV'd table (auto-purges,
    // then group-based rewrite) — only the intended rows move
    spark.sql("UPDATE spec_cat.analytics.dmldecid SET amt = amt + 1 " +
      "WHERE k > 400 AND k <= 500")
    spark.catalog.refreshTable("spec_cat.analytics.dmldecid")
    val out = spark.sql("SELECT SUM(amt) FROM spec_cat.analytics.dmldecid " +
      "WHERE k > 400 AND k <= 500").head().getLong(0)
    assert(out == (401L to 500L).map(_ * 10 + 1).sum,
      s"COW update over decidable range drifted: $out")
    assert(spark.sql("SELECT COUNT(*) FROM spec_cat.analytics.dmldecid")
      .head().getLong(0) == 400L)
  }

  test("$metrics: commit cadence + rows/bytes per commit + derivative " +
      "end-to-end lag as a queryable meta table (VERDICT r12 next #5)") {
    val store = new TableStore(spark, s"$warehouse/analytics/mtr")
    store.commitBucketed((1L to 400L).map(k => (k, k % 7, k * 3))
      .toDF("id", "grp", "n"), Seq("id"), 4)
    graft.store.MaterializedAgg.create(store, "by_grp", Seq("grp"),
      sumCols = Seq("n"), numBuckets = 2)
    graft.store.SecondaryIndex.create(store, "by_grp_idx", Seq("grp"),
      numBuckets = 2)
    // live feed: two more commits; derivatives NOT refreshed → lag grows
    store.upsertEq(Seq((1000L, 3L, 5L, "PUT")).toDF("id", "grp", "n", "op"))
    store.deleteMor(col("id") === 7L)
    val m = spark.sql(
      "SELECT * FROM spec_cat.analytics.`mtr$metrics`").collect()
    val commits = m.filter(_.getString(0) == "commit")
    assert(commits.map(_.getString(1)).sorted.toSeq == Seq("v0", "v1", "v2"))
    val v1 = commits.find(_.getString(1) == "v1").get
    assert(!v1.isNullAt(4) && v1.getLong(4) >= 0, "interval_ms vs parent")
    assert(v1.getLong(5) == 1L, s"v1 upsert adds one row: ${v1.getLong(5)}")
    val v2 = commits.find(_.getString(1) == "v2").get
    assert(v2.getLong(5) == 0L && v2.getLong(10) == 1L,
      s"MOR delete masks 1 row, moves no files: ${v2.toSeq}")
    val v0 = commits.find(_.getString(1) == "v0").get
    assert(v0.isNullAt(4) && v0.getLong(8) == 400L,
      "v0 has no parent interval; running totals present")
    // derivative lag: both reflect v0, head is v2 → lag_commits = 2,
    // lag_ms = committed_at(v2) - committed_at(v0)
    val agg = m.find(r => r.getString(0) == "agg" &&
      r.getString(1) == "by_grp").get
    assert(agg.getLong(11) == 0L && agg.getLong(12) == 2L,
      s"agg watermark/lag: ${agg.toSeq}")
    val expectedLag = commits.find(_.getString(1) == "v2").get.getLong(3) -
      v0.getLong(3)
    assert(agg.getLong(13) == expectedLag, "lag_ms = head time - watermark time")
    val idx = m.find(r => r.getString(0) == "index" &&
      r.getString(1) == "by_grp_idx").get
    assert(idx.getLong(12) == 2L)
    // refresh closes the lag to zero
    graft.store.MaterializedAgg.refresh(store, "by_grp")
    graft.store.SecondaryIndex.refresh(store, "by_grp_idx")
    val m2 = spark.sql(
      "SELECT kind, name, lag_commits, lag_ms FROM " +
        "spec_cat.analytics.`mtr$metrics` WHERE kind <> 'commit'").collect()
    assert(m2.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L),
      s"post-refresh lag must be zero: ${m2.map(_.toSeq).toSeq}")
    // a MULTI-DIM join view reports ONE row, not one per dim (status()
    // is per-dim; a dashboard COUNT over derivatives must not double-count)
    val d1 = new TableStore(spark, s"$warehouse/analytics/mtr_d1")
    d1.commitBucketed((0L to 6L).map(d => (d, s"a$d")).toDF("grp", "nm"),
      Seq("grp"), 2)
    val d2 = new TableStore(spark, s"$warehouse/analytics/mtr_d2")
    d2.commitBucketed((0L to 6L).map(d => (d, d * 5)).toDF("grp", "w"),
      Seq("grp"), 2)
    graft.store.MaterializedJoin.createMulti(store, "star",
      Seq(graft.store.MaterializedJoin.Dim(d1, Seq("grp"), Seq("grp"), Seq("nm")),
        graft.store.MaterializedJoin.Dim(d2, Seq("grp"), Seq("grp"), Seq("w"))),
      "inner")
    val jrows = spark.sql("SELECT name FROM spec_cat.analytics.`mtr$metrics` " +
      "WHERE kind = 'join'").collect().map(_.getString(0)).toSeq
    assert(jrows == Seq("star"),
      s"one row per VIEW expected, got $jrows")
  }

  test("$metrics is WINDOWED: a many-commit table serves the last-N " +
      "commits with O(window) manifest loads, not O(#snapshots); rates " +
      "ride along (VERDICT r13 next #5)") {
    val store = new TableStore(spark, s"$warehouse/analytics/mtrwin")
    store.commitBucketed(Seq((1L, 1L)).toDF("id", "n"), Seq("id"), 2)
    (1 to 24).foreach(i =>
      store.upsertEq(Seq((100L + i, i.toLong, "PUT")).toDF("id", "n", "op")))
    spark.conf.set("spark.graft.metrics.window", "6")
    // manifestCache off: every manifest() hits storage and counts, so the
    // delta below is EXACTLY what the windowed read loads
    spark.conf.set("spark.graft.meta.manifestCache", "false")
    try {
      val before = TableStore.manifestLoads.get()
      val rows = spark.sql(
        "SELECT * FROM spec_cat.analytics.`mtrwin$metrics`").collect()
      val loads = TableStore.manifestLoads.get() - before
      val commits = rows.filter(_.getString(0) == "commit")
      assert(commits.length == 6,
        s"window=6 must serve 6 commit rows, got ${commits.length}")
      assert(commits.map(_.getString(1)).sorted.toSeq ==
        (19 to 24).map(v => s"v$v").sorted)
      // window + out-of-window parents/watermarks, never all 25 manifests
      assert(loads <= 16, s"windowed $$metrics must load O(window) " +
        s"manifests, loaded $loads of 25 snapshots")
      // every windowed upsert commit carries throughput rates
      assert(commits.filter(r => !r.isNullAt(4) && r.getLong(4) > 0)
        .forall(r => !r.isNullAt(14) && !r.isNullAt(15)),
        "commit rows with a parent interval must carry rate columns")
    } finally {
      spark.conf.unset("spark.graft.metrics.window")
      spark.conf.unset("spark.graft.meta.manifestCache")
    }
  }

  test("snapshot refs: tag-based time travel, $refs, and rollback through SQL") {
    val store = new TableStore(spark, s"$warehouse/analytics/reftbl")
    store.commitSnapshot((1L to 25L).map(k => (k, s"r$k")).toDF("k", "v"))
    spark.sql("CALL spec_cat.system.create_tag('analytics.reftbl', 'audited')")
    spark.sql(
      """INSERT INTO spec_cat.analytics.reftbl
        |SELECT k + 100, concat('bad_', v) FROM spec_cat.analytics.reftbl""".stripMargin)
    spark.catalog.refreshTable("spec_cat.analytics.reftbl")
    assert(spark.sql("SELECT COUNT(*) FROM spec_cat.analytics.reftbl")
      .head().getLong(0) == 50L)
    // tag resolves through VERSION AS OF, numeric ids keep working
    assert(spark.sql(
      "SELECT COUNT(*) FROM spec_cat.analytics.reftbl VERSION AS OF 'audited'")
      .head().getLong(0) == 25L)
    assert(spark.sql(
      "SELECT COUNT(*) FROM spec_cat.analytics.reftbl VERSION AS OF 0")
      .head().getLong(0) == 25L)
    // $refs lists the tag with its pinned snapshot
    val refs = spark.sql(
      "SELECT name, version FROM spec_cat.analytics.`reftbl$refs`").collect()
    assert(refs.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("audited", 0L)))
    // rollback through the procedure restores the tagged content as v2
    val rb = spark.sql(
      "CALL spec_cat.system.rollback_to_snapshot('analytics.reftbl', 0)")
      .collect().head
    assert(rb.getLong(0) == 0L && rb.getLong(1) == 2L)
    spark.catalog.refreshTable("spec_cat.analytics.reftbl")
    assert(spark.sql("SELECT COUNT(*) FROM spec_cat.analytics.reftbl")
      .head().getLong(0) == 25L)
    // drop the tag; resolution now fails loudly
    assert(spark.sql("CALL spec_cat.system.drop_tag('analytics.reftbl', 'audited')")
      .collect().head.getBoolean(0))
    val e = intercept[Exception](spark.sql(
      "SELECT COUNT(*) FROM spec_cat.analytics.reftbl VERSION AS OF 'audited'")
      .collect())
    assert(e.getMessage.contains("audited"))
  }

  test("secondary indexes through SQL: create, covered query, refresh, drop") {
    val store = new TableStore(spark, s"$warehouse/analytics/gsitbl")
    store.commitBucketed(
      (1L to 120L).map(i => (i, s"c${i % 9}", i * 2L)).toDF("id", "cust", "qty"),
      Seq("id"), 4)
    spark.sql(
      "CALL spec_cat.system.create_index('analytics.gsitbl', 'by_cust', 'cust', 'qty', 4)")
    // covered query straight over the index table (no base access)
    val covered = spark.sql(
      """SELECT id, qty FROM spec_cat.analytics.`gsitbl$idx_by_cust`
        |WHERE cust = 'c3' ORDER BY id""".stripMargin)
    assert(covered.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      (1L to 120L).filter(_ % 9 == 3).map(i => (i, i * 2L)))
    // mutate the base: $indexes reports the staleness until a refresh runs
    store.deleteMor(col("id") === 3L)
    val staleRow = spark.sql(
      "SELECT * FROM spec_cat.analytics.`gsitbl$indexes`").collect()
    assert(staleRow.length == 1 && staleRow.head.getString(0) == "by_cust" &&
      staleRow.head.getBoolean(4), s"expected a stale row: ${staleRow.toSeq}")
    spark.sql("CALL spec_cat.system.refresh_index('analytics.gsitbl', 'by_cust')")
    assert(!spark.sql("SELECT stale FROM spec_cat.analytics.`gsitbl$indexes`")
      .head().getBoolean(0), "refresh must clear the staleness flag")
    val after = spark.sql(
      """SELECT id FROM spec_cat.analytics.`gsitbl$idx_by_cust`
        |WHERE cust = 'c3' ORDER BY id""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(after == (1L to 120L).filter(i => i % 9 == 3 && i != 3L))
    // drop removes it; the table name stops resolving
    assert(spark.sql(
      "CALL spec_cat.system.drop_index('analytics.gsitbl', 'by_cust')")
      .collect().head.getBoolean(0))
    intercept[Exception](spark.sql(
      "SELECT * FROM spec_cat.analytics.`gsitbl$idx_by_cust`").collect())
  }

  test("DV fallback serves nested-field selection on struct columns") {
    val store = new TableStore(spark, s"$warehouse/analytics/dvnest")
    store.commitSnapshot(
      (1L to 40L).map(k => (k, (s"t$k", k * 3L))).toDF("k", "meta")
        .select(col("k"), col("meta").cast("struct<tag:string,w:bigint>")))
    store.deleteMor(col("k") > 30L)
    spark.catalog.refreshTable("spec_cat.analytics.dvnest")
    // nested-schema pruning would narrow meta to {w}; the fallback widens
    // back to the declared struct — values must stay correct
    val rows = spark.sql(
      "SELECT meta.w FROM spec_cat.analytics.dvnest WHERE k <= 3 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(3L, 6L, 9L))
    assert(spark.sql("SELECT COUNT(*) FROM spec_cat.analytics.dvnest")
      .head().getLong(0) == 30L)
  }

  test("spark.graft.delete.mode=mor routes SQL DELETE to a delete vector") {
    val store = new TableStore(spark, s"$warehouse/analytics/dvdel")
    store.commitBucketed(
      (1L to 300L).map(k => (k, k * 2L)).toDF("k", "n"), Seq("k"), 4)
    val files0 = store.manifest(0).inlineFiles.sorted
    spark.conf.set("spark.graft.delete.mode", "mor")
    try {
      spark.sql("DELETE FROM spec_cat.analytics.dvdel WHERE k IN (10, 20, 30)")
      val m = store.manifest(store.currentVersion())
      assert(m.hasDvs && m.deletedRows == 3L, "DELETE did not take the MOR path")
      assert(m.inlineFiles.sorted == files0, "MOR delete rewrote data files")
      spark.catalog.refreshTable("spec_cat.analytics.dvdel")
      assert(spark.sql(
        "SELECT COUNT(*) AS n FROM spec_cat.analytics.dvdel").head()
        .getLong(0) == 297L)
      assert(spark.sql(
        "SELECT COUNT(*) FROM spec_cat.analytics.dvdel WHERE k = 20").head()
        .getLong(0) == 0L)
    } finally spark.conf.unset("spark.graft.delete.mode")
  }

  test("MOR MERGE INTO an EMPTY table (zero-file candidate set) bootstraps via inserts") {
    // CREATE TABLE commits a zero-file snapshot; MERGE INTO it is the CDC
    // bootstrap pattern — the delta path's positional scan must plan as a
    // 0-row read over an empty candidate set, not crash
    spark.sql("DROP TABLE IF EXISTS spec_cat.analytics.mor_boot")
    spark.sql(
      "CREATE TABLE spec_cat.analytics.mor_boot (k BIGINT, v STRING)")
    Seq((1L, "a", "I"), (2L, "b", "I")).toDF("k", "v", "op")
      .createOrReplaceTempView("mor_boot_src")
    spark.conf.set("spark.graft.delete.mode", "mor")
    try spark.sql(
      """MERGE INTO spec_cat.analytics.mor_boot t
        |USING mor_boot_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET t.v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
        |""".stripMargin)
    finally spark.conf.unset("spark.graft.delete.mode")
    spark.catalog.refreshTable("spec_cat.analytics.mor_boot")
    assert(spark.sql("SELECT k, v FROM spec_cat.analytics.mor_boot")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "b")))
  }

  test("spark.graft.delete.mode=mor routes MERGE INTO to one DV+append commit; every pre-existing file inherited byte-identical") {
    val store = new TableStore(spark, s"$warehouse/analytics/dvmerge")
    store.commitBucketed(
      (1L to 400L).map(k => (k, s"s$k", k * 10L)).toDF("k", "s", "amt"),
      Seq("k"), 8)
    val fsys = new org.apache.hadoop.fs.Path(store.root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fileState(paths: Seq[String]) = paths.sorted.map { p =>
      val st = fsys.getFileStatus(new org.apache.hadoop.fs.Path(p))
      (p, st.getLen, st.getModificationTime)
    }
    val before = fileState(store.manifest(0).inlineFiles)
    // source: updates (k<=5), deletes (k in 100..103), inserts (k>1000)
    Seq((1L, "u1", 111L, "U"), (5L, "u5", 555L, "U"),
      (100L, "", 0L, "D"), (101L, "", 0L, "D"), (102L, "", 0L, "D"),
      (103L, "", 0L, "D"),
      (1001L, "new1", 1L, "I"), (1002L, "new2", 2L, "I"))
      .toDF("k", "s", "amt", "op").createOrReplaceTempView("merge_delta_src")
    spark.conf.set("spark.graft.delete.mode", "mor")
    try spark.sql(
      """MERGE INTO spec_cat.analytics.dvmerge t
        |USING merge_delta_src s ON t.k = s.k
        |WHEN MATCHED AND s.op = 'D' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET t.s = s.s, t.amt = s.amt
        |WHEN NOT MATCHED THEN INSERT (k, s, amt) VALUES (s.k, s.s, s.amt)
        |""".stripMargin)
    finally spark.conf.unset("spark.graft.delete.mode")
    val m = store.manifest(store.currentVersion())
    assert(m.version == 1L, "MERGE must commit exactly one snapshot")
    assert(m.hasDvs && m.deletedRows == 6L, // 2 updates + 4 deletes masked
      s"MERGE did not take the delta path: dvs=${m.hasDvs} deleted=${m.deletedRows}")
    // THE MOR contract: every pre-existing data file inherited byte-identical
    assert(fileState(before.map(_._1)) == before,
      "MOR MERGE must not rewrite or touch any pre-existing data file")
    assert(before.map(_._1).toSet.subsetOf(m.inlineFiles.toSet))
    spark.catalog.refreshTable("spec_cat.analytics.dvmerge")
    val out = spark.sql(
      "SELECT k, s, amt FROM spec_cat.analytics.dvmerge").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val expected = (1L to 400L).filterNot(k => (100L to 103L).contains(k))
      .map {
        case 1L => (1L, "u1", 111L)
        case 5L => (5L, "u5", 555L)
        case k => (k, s"s$k", k * 10L)
      }.toSet ++ Set((1001L, "new1", 1L), (1002L, "new2", 2L))
    assert(out == expected, "MERGE content diverged")
    // purge folds the DVs; content identical, plans back to byte-stock
    store.purgeDeletes()
    assert(!store.manifest(store.currentVersion()).hasDvs)
    assert(store.readSnapshot().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet == expected)
  }

  test("mor UPDATE through SQL row-level path is a delta commit; MERGE works on the sharded tier") {
    val store = new TableStore(spark, s"$warehouse/analytics/dvmerge_sh")
    spark.conf.set("spark.graft.manifest.inlineThreshold", "8")
    spark.conf.set("spark.graft.delete.mode", "mor")
    try {
      store.commitBucketed(
        (1L to 500L).map(k => (k, k * 2L)).toDF("k", "amt"), Seq("k"), 16)
      assert(store.manifest(0).isSharded, "fixture must start sharded")
      val shards0 = store.manifest(0).shards.map(_.path)
      // row-level UPDATE (no translatable fast path exists for UPDATE):
      // must plan the delta operation, not a COW bucket rewrite
      spark.sql(
        "UPDATE spec_cat.analytics.dvmerge_sh SET amt = amt + 1 WHERE k <= 3")
      val m1 = store.manifest(store.currentVersion())
      assert(m1.hasDvs && m1.deletedRows == 3L,
        "UPDATE under mor mode must commit a delta, not rewrite buckets")
      assert(shards0.forall(m1.shards.map(_.path).contains),
        "delta UPDATE must inherit every parent manifest shard by reference")
      Seq((2L, 999L, "U"), (600L, 1200L, "I"))
        .toDF("k", "amt", "op").createOrReplaceTempView("merge_sh_src")
      spark.sql(
        """MERGE INTO spec_cat.analytics.dvmerge_sh t
          |USING merge_sh_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET t.amt = s.amt
          |WHEN NOT MATCHED THEN INSERT (k, amt) VALUES (s.k, s.amt)
          |""".stripMargin)
      spark.catalog.refreshTable("spec_cat.analytics.dvmerge_sh")
      val got = spark.sql(
        "SELECT amt FROM spec_cat.analytics.dvmerge_sh WHERE k IN (1,2,3,600)")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(3L, 7L, 999L, 1200L), s"sharded MERGE diverged: $got")
      assert(spark.sql(
        "SELECT COUNT(*) FROM spec_cat.analytics.dvmerge_sh").head()
        .getLong(0) == 501L)
    } finally {
      spark.conf.unset("spark.graft.delete.mode")
      spark.conf.unset("spark.graft.manifest.inlineThreshold")
    }
  }

  test("_g_file/_g_pos metadata columns serve row addresses through SQL") {
    val store = new TableStore(spark, s"$warehouse/analytics/rowaddr")
    store.commitBucketed(
      (1L to 100L).map(k => (k, k * 3L)).toDF("k", "v"), Seq("k"), 4)
    val rows = spark.sql(
      "SELECT k, _g_file, _g_pos FROM spec_cat.analytics.rowaddr").collect()
    assert(rows.length == 100)
    val byFile = rows.groupBy(_.getString(1))
    assert(byFile.keySet == store.manifest(0).inlineFiles.map(p =>
      "file:" + p).toSet || byFile.keySet == store.manifest(0).inlineFiles.toSet,
      s"addresses must cover exactly the manifest files: ${byFile.keySet.take(2)}")
    // positions are dense per file: 0..n-1
    byFile.values.foreach { rs =>
      assert(rs.map(_.getLong(2)).sorted.toSeq == (0L until rs.length).toSeq)
    }
    // metadata columns stay invisible to SELECT *
    assert(spark.sql("SELECT * FROM spec_cat.analytics.rowaddr")
      .schema.fieldNames.toSeq == Seq("k", "v"))
  }

  test("$partitions metadata table surfaces per-bucket totals (skew view)") {
    val store = new TableStore(spark, s"$warehouse/analytics/pmeta")
    store.commitBucketed(
      (1L to 200L).map(k => (k, s"v$k")).toDF("k", "s"), Seq("k"), 4)
    val rows = spark.sql(
      "SELECT bucket, files, bytes, rows FROM spec_cat.analytics.`pmeta$partitions` ORDER BY bucket")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) == (0L to 3L))
    assert(rows.map(_._4).sum == 200L, s"row totals wrong: $rows")
    assert(rows.forall(r => r._2 >= 1 && r._3 > 0))
    // sharded tier: same answer through the distributed metadata scan
    spark.conf.set("spark.graft.manifest.inlineThreshold", "0")
    try {
      val st2 = new TableStore(spark, s"$warehouse/analytics/pmeta_sh")
      st2.commitBucketed(
        (1L to 200L).map(k => (k, s"v$k")).toDF("k", "s"), Seq("k"), 4)
      val sh = spark.sql(
        "SELECT bucket, rows FROM spec_cat.analytics.`pmeta_sh$partitions` ORDER BY bucket")
        .as[(Long, Long)].collect().toSeq
      assert(sh.map(_._1) == (0L to 3L) && sh.map(_._2).sum == 200L)
    } finally spark.conf.unset("spark.graft.manifest.inlineThreshold")
  }

  test("SHOW TABLES lists committed tables; DDL create/drop works") {
    commitOrders()
    val tables = spark.sql("SHOW TABLES IN spec_cat.analytics")
      .select("tableName").as[String].collect().toSet
    assert(tables.contains("orders"))
    spark.sql("CREATE TABLE spec_cat.analytics.fresh (k BIGINT, v STRING)")
    assert(spark.sql("SELECT COUNT(*) FROM spec_cat.analytics.fresh").head().getLong(0) == 0)
    spark.sql("DROP TABLE spec_cat.analytics.fresh")
    val after = spark.sql("SHOW TABLES IN spec_cat.analytics")
      .select("tableName").as[String].collect().toSet
    assert(!after.contains("fresh"))
  }

  test("catalog introspection surfaces the layout: hive partitioning, bucketing, properties (ADVICE r6)") {
    commitOrders() // hive-partitioned on o_orderstatus
    val cat = spark.sessionState.catalogManager.catalog("spec_cat")
      .asInstanceOf[GraftCatalog]
    def table(ns: String, name: String) = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array(ns), name))
    val hive = table("analytics", "orders")
    assert(hive.partitioning().map(_.toString).toSeq ==
      Seq("identity(o_orderstatus)"),
      s"hive layout must report identity partitioning: " +
        hive.partitioning().mkString(","))
    // DESCRIBE shows the partitioning to SQL users too
    val desc = spark.sql("DESCRIBE TABLE spec_cat.analytics.orders")
      .select("col_name").as[String].collect()
    assert(desc.contains("# Partition Information") &&
      desc.count(_ == "o_orderstatus") == 2, desc.mkString("|"))

    val bstore = new TableStore(spark, s"$warehouse/analytics/bucketed_meta")
    bstore.commitBucketed(Seq((1L, "a")).toDF("k", "v"), Seq("k"), 8)
    val bucketed = table("analytics", "bucketed_meta")
    assert(bucketed.partitioning().map(_.toString).toSeq == Seq("bucket(8, k)"),
      bucketed.partitioning().mkString(","))

    val pstore = new TableStore(spark, s"$warehouse/analytics/plain_meta")
    pstore.commitSnapshot(Seq((1L, "a")).toDF("k", "v"))
    assert(table("analytics", "plain_meta").partitioning().isEmpty)
  }

  test("tbl$agg_<name> reads bucket-prune on group-key predicates; " +
      "$aggs tracks staleness") {
    val store = new TableStore(spark, s"$warehouse/analytics/mv_base")
    store.commitBucketed(
      (1L to 2000L).map(k => (k, s"g${k % 40}", k * 3)).toDF("k", "g", "n"),
      Seq("k"), 8)
    spark.sql("CALL spec_cat.system.create_agg_view(" +
      "'analytics.mv_base', 'by_g', 'g', 'n', 8)")
    // the raw partials table serves through the catalog, and a group-key
    // equality prunes to ONE of the view's 8 buckets — the dashboard
    // point-read never scans the whole view
    val q = spark.sql("SELECT sum_n, _cnt FROM " +
      "spec_cat.analytics.`mv_base$agg_by_g` WHERE g = 'g7'")
    val row = q.collect()
    assert(row.length == 1 && row.head.getLong(1) == 50L)
    import scala.jdk.CollectionConverters._
    val planned = graft.catalog.RuntimePruning.lastPlannedFiles.entrySet()
      .asScala.filter(_.getKey.contains("agg/by_g"))
      .map(_.getValue.intValue()).headOption.getOrElse(-1)
    assert(planned == 1,
      s"group-key predicate must bucket-prune the view read, planned $planned")
    // staleness bookkeeping through $aggs
    def stale() = spark.sql("SELECT stale FROM " +
      "spec_cat.analytics.`mv_base$aggs` WHERE name = 'by_g'")
      .head().getBoolean(0)
    assert(!stale())
    store.deleteEq(Seq(77L).toDF("k"))
    assert(stale(), "$aggs must show the view stale after a base commit")
    spark.sql("CALL spec_cat.system.refresh_agg_view('analytics.mv_base', 'by_g')")
    assert(!stale())
    // semantic read through the agg_view procedure matches a recompute
    spark.sql("CALL spec_cat.system.agg_view('analytics.mv_base', 'by_g', 'mv_sem')")
    val got = spark.sql("SELECT g, sum_n, _cnt FROM mv_sem")
      .collect().map(_.mkString("|")).sorted.toSeq
    val want = store.readSnapshot().groupBy("g")
      .agg(sum("n").as("sum_n"), count(lit(1)).as("_cnt"))
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(got == want)
  }

  test("string bounds prune files (r15): a string-keyed point query on a " +
      "PK-chunked layout plans a strict file subset; serving refusals " +
      "stay (MIN/MAX of a string never metadata-serves)") {
    // DynamoDB-style string PK (the reference's PK/SK: S key schema):
    // three files chunked by key prefix — footer BINARY/UTF8 bounds are
    // recorded as manifest strings and mightMatch orders them bytewise
    val store = new TableStore(spark, s"$warehouse/analytics/str_keys")
    val base = (0 until 300).map { i =>
      (f"k_$i%03d", i.toLong)
    }.toDF("pk", "v")
    store.commitSnapshot(base.filter(col("pk") < "k_100").coalesce(1))
    store.commitAppend(
      base.filter(col("pk") >= "k_100" && col("pk") < "k_200").coalesce(1))
    store.commitAppend(base.filter(col("pk") >= "k_200").coalesce(1))
    spark.catalog.refreshTable("spec_cat.analytics.str_keys")
    def planned(df: org.apache.spark.sql.DataFrame): Int =
      "FileIndex\\((\\d+) paths\\)".r
        .findFirstMatchIn(df.queryExecution.executedPlan.toString)
        .map(_.group(1).toInt).getOrElse(-1)
    // point query: only the middle chunk can hold the key
    val point = spark.sql(
      "SELECT pk, v FROM spec_cat.analytics.str_keys WHERE pk = 'k_150'")
    assert(planned(point) == 1,
      s"string equality must prune to the one chunk whose bounds admit " +
        s"it, planned ${planned(point)}")
    assert(point.collect().map(_.getLong(1)).toSeq == Seq(150L))
    // range query: two chunks overlap [k_150, k_250)
    val range = spark.sql(
      "SELECT pk, v FROM spec_cat.analytics.str_keys " +
        "WHERE pk >= 'k_150' AND pk < 'k_250'")
    assert(planned(range) == 2,
      s"string range must plan the two overlapping chunks, " +
        s"planned ${planned(range)}")
    assert(range.count() == 100L)
    // provably-no-match: bounds prove zero rows, zero files planned
    val none = spark.sql(
      "SELECT pk FROM spec_cat.analytics.str_keys WHERE pk = 'z_999'")
    assert(planned(none) <= 0,
      s"out-of-bounds string equality must prune every file, " +
        s"planned ${planned(none)}")
    assert(none.count() == 0)
    // the EMPTY-range metadata serve composes: when every file's string
    // bounds prove no-match, the exact-pushdown path keeps an empty file
    // set and COUNT answers 0 with zero scan
    val cnt = spark.sql("SELECT COUNT(*) AS n " +
      "FROM spec_cat.analytics.str_keys WHERE pk = 'z_999'")
    val cplan = cnt.queryExecution.executedPlan.toString
    assert(cplan.contains("graft-manifest-agg") ||
      cplan.contains("LocalTableScan"),
      s"no-match string COUNT must serve from metadata:\n$cplan")
    assert(cnt.head().getLong(0) == 0L)
    // string MIN/MAX SERVES from metadata since r16: these files are
    // engine-written with untruncated footer statistics, so their bounds
    // carry the exact flag and may be returned verbatim (StringBoundsSpec
    // pins the truncated-bound DECLINE)
    val mm = spark.sql("SELECT MIN(pk) AS mn, MAX(pk) AS mx " +
      "FROM spec_cat.analytics.str_keys")
    val plan = mm.queryExecution.executedPlan.toString
    assert(plan.contains("graft-manifest-agg") ||
      plan.contains("LocalTableScan"),
      s"exact-flagged string MIN/MAX must serve from metadata:\n$plan")
    assert(!plan.contains("Parquet"),
      s"exact-flagged string MIN/MAX must not scan:\n$plan")
    assert(mm.head().getString(0) == "k_000" && mm.head().getString(1) == "k_299")
  }
}
