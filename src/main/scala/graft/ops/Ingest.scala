package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.model.DdbAttr
import graft.ops.Relational.Q
import graft.store.TableStore

/** Ingest pack (SURVEY.md §2.A): the zero-ETL pipeline's batch half —
  * PITR-export decode, schema inference/evolution, snapshot load into the
  * snapshot-versioned table store, partitioned sink, maintenance.
  *
  * Oracle strategy: the export fixtures are generated *inside* the query by
  * AttributeValue-encoding a fixture table (pure column expressions), so the
  * decode path is validated end-to-end against the original rows — encode →
  * export JSON → infer/decode → typed table must equal the source, and the
  * DuckDB oracle is a plain SELECT on that source.
  */
object Ingest {

  /** orders rows → export JSON lines (the `ExportTableToPointInTime` shape,
    * reference src:135) → decoded back to typed columns. */
  private val scanDdbExport: Q = (s, d) => {
    val orders = load(s, d, "orders")
    val raw = orders.select(DdbAttr.encodeLine(orders.schema).as("json"))
    DdbAttr.decode(raw, orders.schema, keyColumns = Seq("o_orderkey"))
      .orderBy(col("o_orderkey").asc_nulls_first)
  }

  /** Schemaless inference (`glue:CreateTable` analog): encode customer,
    * forget the schema, re-derive it from the export bytes, decode. */
  private val schemaInfer: Q = (s, d) => {
    val cust = load(s, d, "customer")
    val raw = cust.select(DdbAttr.encodeLine(cust.schema).as("json"))
    val inferred = DdbAttr.inferSchema(s, raw)
    DdbAttr.decode(raw, inferred)
      .select(inferred.fieldNames.sorted.map(col): _*)
      .orderBy(col("c_custkey").asc_nulls_first)
  }

  /** 38-digit `N` precision (SURVEY §7.5.1; the export permission the
    * pipeline is built on, reference src:135): money-sized decimals and
    * IDs beyond 2^53 must survive export → infer → decode without silent
    * precision loss — the inference picks DecimalType(38,18)/(38,0), not
    * Double/Long. Output is CAST to string on both sides: any lost digit
    * diverges the text, while the comparator stays type-stable. */
  private val scanDdbExportDecimal: Q = (s, d) => {
    import org.apache.spark.sql.types.DecimalType
    val orders = load(s, d, "orders")
    val src = orders.select(
      col("o_orderkey"),
      concat(lpad(col("o_orderkey").cast("string"), 20, "9"),
        lit(".123456789012345678")).cast(DecimalType(38, 18)).as("big_dec"),
      lpad(col("o_orderkey").cast("string"), 19, "8")
        .cast(DecimalType(38, 0)).as("big_int"))
    val raw = src.select(DdbAttr.encodeLine(src.schema).as("json"))
    val inferred = DdbAttr.inferSchema(s, raw)
    require(inferred("big_dec").dataType == DecimalType(38, 18) &&
      inferred("big_int").dataType == DecimalType(38, 0) &&
      inferred("o_orderkey").dataType ==
        org.apache.spark.sql.types.LongType,
      s"decimal N inference regressed: $inferred")
    DdbAttr.decode(raw, inferred)
      .select(col("o_orderkey"),
        col("big_dec").cast("string").as("big_dec_str"),
        col("big_int").cast("string").as("big_int_str"))
      .orderBy(col("o_orderkey").asc_nulls_first)
  }

  /** Two export generations with new attributes appearing → merged schema
    * (`glue:UpdateTable`/`GetTableVersions` analog, reference src:113-115);
    * earlier generation reads as NULL for late columns. */
  private val schemaEvolve: Q = (s, d) => {
    val cust = load(s, d, "customer")
    val gen1src = cust.select(col("c_custkey"), col("c_name"), lit(1L).as("gen"))
    val gen2src = cust.select(col("c_custkey"), col("c_name"), col("c_acctbal"),
      col("c_mktsegment"), lit(2L).as("gen"))
    val raw1 = gen1src.select(DdbAttr.encodeLine(gen1src.schema).as("json"))
    val raw2 = gen2src.select(DdbAttr.encodeLine(gen2src.schema).as("json"))
    val merged = DdbAttr.mergeSchemas(
      DdbAttr.inferSchema(s, raw1), DdbAttr.inferSchema(s, raw2))
    DdbAttr.decode(raw1, merged).unionByName(DdbAttr.decode(raw2, merged))
      .select(merged.fieldNames.sorted.map(col): _*)
      .orderBy(col("gen").asc_nulls_first, col("c_custkey").asc_nulls_first)
  }

  /** Full snapshot load: export → typed → partitioned snapshot commit →
    * snapshot read (reference README.md:159-166 steps 1-6). */
  private val snapshotLoad: Q = (s, d) => {
    val orders = load(s, d, "orders")
    val raw = orders.select(DdbAttr.encodeLine(orders.schema).as("json"))
    val typed = DdbAttr.decode(raw, orders.schema)
    val store = new TableStore(s, graft.util.Scratch.dir("snapshot_load"))
    store.commitSnapshot(typed, partitionBy = Seq("o_orderstatus"))
    store.readSnapshot().orderBy(col("o_orderkey").asc_nulls_first)
  }

  /** Partitioned columnar write + read-back (`PutTableData` analog,
    * reference src:100). Partitioning by the filter column is what enables
    * partition pruning at 100 TB. */
  private val sinkPartitionedParquet: Q = (s, d) => {
    val li = load(s, d, "lineitem")
    val out = graft.util.Scratch.dir("sink")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    s.read.parquet(out)
      .select(li.schema.fieldNames.map(col): _*)
      .orderBy(li.schema.fieldNames.map(c => col(c).asc_nulls_first): _*)
  }

  /** Small-file compaction + unreferenced-file GC
    * (reference `unreferencedFileRemoval`, README.md:132-137).
    *
    * The returned DataFrame is the POST-compaction table content — commit 16
    * files, compact to 1, vacuum the superseded snapshot, then read back —
    * so the DuckDB oracle verifies the real invariant (the row multiset
    * survives compact+GC byte-for-byte) rather than a summary row. The
    * file-count/GC invariants stay as hard `require`s: a regression turns
    * the query into an `err` row instead of silently passing. */
  private val maintenanceCompact: Q = (s, d) => {
    val li = load(s, d, "lineitem")
    val store = new TableStore(s, graft.util.Scratch.dir("compact"))
    store.commitSnapshot(li.repartition(16))
    val filesBefore = store.manifest(store.currentVersion()).nFiles.toInt
    store.compact(targetFiles = 1)
    val filesAfter = store.manifest(store.currentVersion()).nFiles.toInt
    val vacuumed = store.vacuum(keepSnapshots = 1).size
    require(filesBefore == 16, s"expected 16 pre-compaction files, got $filesBefore")
    require(filesAfter == 1, s"expected 1 post-compaction file, got $filesAfter")
    require(vacuumed > 0, "vacuum reclaimed nothing despite a superseded snapshot")
    val cols = li.schema.fieldNames.map(col)
    store.readSnapshot().select(cols: _*)
      .orderBy(li.schema.fieldNames.map(c => col(c).asc_nulls_first): _*)
  }

  /** Incremental consumption (Iceberg incremental-scan analog): commit a
    * base, append a second generation, read ONLY what arrived between the
    * two snapshots. The read costs O(new files) — a downstream consumer
    * polling a 100 TB table processes the delta, never the base. */
  private val scanIncremental: Q = (s, d) => {
    val o = load(s, d, "orders")
    val k = col("o_orderkey")
    val store = new TableStore(s, graft.util.Scratch.dir("scan_incremental"))
    val v0 = store.commitSnapshot(o.filter(k % 3 =!= 0))
    store.commitAppend(o.filter(k % 3 === 0))
    store.readIncremental(fromVersion = v0)
      .orderBy(col("o_orderkey").asc_nulls_first)
  }

  /** Row-level changelog (Iceberg changelog-scan analog): bucketed base,
    * one CDC batch (deletes %10, updates %9, inserts fresh keys %7), then
    * the INSERT/UPDATE/DELETE diff between the two snapshots — what a
    * downstream CDC consumer replays. Only the touched buckets' files are
    * read on either side (changedFilesBetween); carry-over rows rewritten
    * unchanged are dropped by the null-safe payload comparison. */
  private val scanChangelog: Q = (s, d) => {
    import graft.etl.CdcApply
    val o = load(s, d, "orders")
    val k = col("o_orderkey")
    val store = new TableStore(s, graft.util.Scratch.dir("scan_changelog"))
    val v0 = store.commitBucketed(o, keys = Seq("o_orderkey"), numBuckets = 16)
    val removes = o.filter(k % 10 === 0).select(
      CdcApply.changeCols(lit(CdcApply.OpRemove), lit(1L),
        Seq(k, lit(null).cast("long").as("o_custkey"),
          lit(null).cast("string").as("o_orderstatus"),
          lit(null).cast("double").as("o_totalprice"),
          lit(null).cast("timestamp_ntz").as("o_orderdate"),
          lit(null).cast("string").as("o_orderpriority"))): _*)
    val mods = o.filter(k % 9 === 0 && k % 10 =!= 0).select(
      CdcApply.changeCols(lit(CdcApply.OpModify), lit(1L),
        Seq(k, col("o_custkey"), lit("X").as("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))): _*)
    val inserts = o.filter(k % 7 === 0).select(
      CdcApply.changeCols(lit(CdcApply.OpInsert), lit(1L),
        Seq((k + 1000000000L).as("o_orderkey"), col("o_custkey"),
          lit("N").as("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))): _*)
    graft.streaming.StreamingOps.applyCdcBatch(
      removes.unionByName(mods).unionByName(inserts), store,
      keys = Seq("o_orderkey"), numBuckets = 16)
    store.readChangelog(fromVersion = v0)
      .orderBy(col("o_orderkey").asc_nulls_first,
        col("_change_type").asc_nulls_first)
  }

  /** Multi-column Z-order clustering rewrite (Iceberg/Delta `OPTIMIZE ZORDER
    * BY` analog; the reference's managed maintenance, README.md:132-137).
    *
    * `compact(sortBy)` tightens file bounds on ONE column; a predicate on
    * any other column still scans every file. The Morton-code rewrite
    * ([[graft.store.TableStore.compact]] `zorderBy`) gives each file a small
    * axis-aligned rectangle in (l_orderkey, l_partkey) space, so min/max
    * stats prune on EITHER column alone. The pruning power is asserted as a
    * hard `require` per axis — a regression turns this row into `err` — and
    * the returned frame is the full post-rewrite row multiset, so the DuckDB
    * oracle verifies content preservation exactly like `maintenance_compact`. */
  private val maintenanceZorder: Q = (s, d) => {
    import graft.util.PlanScans.filesScanned
    val li = load(s, d, "lineitem")
    val store = new TableStore(s, graft.util.Scratch.dir("zorder"))
    store.commitSnapshot(li.repartition(16))
    store.compact(targetFiles = 16, zorderBy = Seq("l_orderkey", "l_partkey"))
    val nFiles = store.manifest(store.currentVersion()).nFiles
    require(nFiles == 16, s"expected 16 z-ordered files, got $nFiles")
    val Array(bounds) = store.readSnapshot()
      .agg(min("l_orderkey"), max("l_orderkey"), min("l_partkey"), max("l_partkey"))
      .collect()
    def band(lo: Long, hi: Long): (Long, Long) = (lo, lo + math.max(1L, (hi - lo) / 20))
    val (oLo, oHi) = band(bounds.getLong(0), bounds.getLong(1))
    val (pLo, pHi) = band(bounds.getLong(2), bounds.getLong(3))
    val byOrder = filesScanned(store.readSnapshot().filter(col("l_orderkey").between(oLo, oHi)))
    val byPart = filesScanned(store.readSnapshot().filter(col("l_partkey").between(pLo, pHi)))
    require(byOrder * 2 <= nFiles,
      s"z-order failed to prune on l_orderkey: scanned $byOrder/$nFiles files")
    require(byPart * 2 <= nFiles,
      s"z-order failed to prune on l_partkey: scanned $byPart/$nFiles files")
    val cols = li.schema.fieldNames.map(col)
    store.readSnapshot().select(cols: _*)
      .orderBy(li.schema.fieldNames.map(c => col(c).asc_nulls_first): _*)
  }

  /** Point lookup on a high-cardinality NON-key column via parquet-native
    * bloom filters (`spark.graft.bloom.columns`): file stats cannot help
    * here (every file's doc_id range spans the domain on an unclustered
    * commit), but the per-row-group bloom written at commit time lets the
    * parquet reader prove non-matching row groups empty from footer+bloom
    * I/O alone. The commit asserts the bloom is present AND discriminating
    * (a absent probe misses) — not just that the option was accepted. */
  private val scanBloomLookup: Q = (s, d) => {
    import org.apache.spark.sql.functions.min
    val docs = load(s, d, "documents")
      .select("doc_id", "lang", "source", "n_chars")
    val saved = s.conf.getOption("spark.graft.bloom.columns")
    s.conf.set("spark.graft.bloom.columns", "doc_id")
    val store = new TableStore(s, graft.util.Scratch.dir("bloom_lkp"))
    try store.commitSnapshot(docs.repartition(4))
    finally saved match {
      case Some(v) => s.conf.set("spark.graft.bloom.columns", v)
      case None => s.conf.unset("spark.graft.bloom.columns")
    }
    val m = store.manifest(0)
    val conf = s.sparkContext.hadoopConfiguration
    val target = docs.agg(min("doc_id")).head.getLong(0)
    val blooms = m.inlineFiles.map(f =>
      graft.store.FileStats.bloomOfColumn(f, conf, "doc_id"))
    require(blooms.forall(_.nonEmpty), "bloom filter missing from a footer")
    require(blooms.flatten.exists(_.apply(target)),
      "no file's bloom claims the present doc_id")
    require(blooms.flatten.count(_.apply(-target - 1L)) <
      blooms.size, "bloom accepts an absent value in every file — not discriminating")
    store.readSnapshot().filter(col("doc_id") === target)
      .orderBy(col("doc_id").asc_nulls_first)
  }

  /** Global secondary index end-to-end (`gsi_lookup`, the DynamoDB GSI
    * analog — reference README.md:81-84 pins key-condition access as the
    * primary query shape, and a DynamoDB table's GSIs are the half of that
    * shape the lake copy loses). Orders bucketed on the PRIMARY key, an
    * index bucketed on `o_custkey`, two merge-on-read mutations (DV delete
    * + DV update), an INCREMENTAL index refresh that replays the changelog
    * with UPDATE pre-images (O(changed rows), only the affected index
    * buckets rewrite), then a customer lookup that bucket-prunes the index
    * and fetches the full rows back from the base by primary key. At
    * 100 TB: two point reads, zero base scans after the initial build. */
  private val gsiLookup: Q = (s, d) => {
    import graft.store.SecondaryIndex
    val k = col("o_orderkey")
    val store = new TableStore(s, graft.util.Scratch.dir("gsi_lookup"))
    store.commitBucketed(
      load(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("o_totalprice")),
      keys = Seq("o_orderkey"), numBuckets = 16)
    SecondaryIndex.create(store, "by_cust", Seq("o_custkey"),
      Seq("o_orderstatus"), numBuckets = 8)
    store.deleteMor(k % 50 === 0)
    store.updateMor(k % 37 === 0,
      Map("o_totalprice" -> (col("o_totalprice") + lit(5))))
    SecondaryIndex.refresh(store, "by_cust")
    SecondaryIndex.lookup(store, "by_cust",
      col("o_custkey").isin(1L, 2L, 4L, 5L, 7L, 8L, 10L, 11L, 13L, 14L))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice").cast("double").as("o_totalprice"))
      .orderBy(col("o_orderkey").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "gsi_lookup" -> gsiLookup,
    "scan_bloom_lookup" -> scanBloomLookup,
    "scan_ddb_export" -> scanDdbExport,
    "scan_incremental" -> scanIncremental,
    "scan_changelog" -> scanChangelog,
    "scan_ddb_export_decimal" -> scanDdbExportDecimal,
    "schema_infer" -> schemaInfer,
    "schema_evolve" -> schemaEvolve,
    "snapshot_load" -> snapshotLoad,
    "sink_partitioned_parquet" -> sinkPartitionedParquet,
    "maintenance_compact" -> maintenanceCompact,
    "maintenance_zorder" -> maintenanceZorder,
  )

  val oracles: Map[String, String] = Map(
    "gsi_lookup" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) +
        |    CASE WHEN o_orderkey % 37 = 0 THEN CAST(5 AS DECIMAL(18,2))
        |         ELSE CAST(0 AS DECIMAL(18,2)) END AS DOUBLE) AS o_totalprice
        |FROM orders
        |WHERE o_custkey IN (1,2,4,5,7,8,10,11,13,14)
        |  AND o_orderkey % 50 <> 0
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,

    "scan_bloom_lookup" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id = (SELECT MIN(doc_id) FROM documents)
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    "scan_incremental" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 3 = 0
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,

    "scan_changelog" ->
      """WITH del AS (
        |  SELECT 'DELETE' AS _change_type, o_orderkey, o_custkey, o_orderstatus,
        |         o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 10 = 0
        |), upd AS (
        |  SELECT 'UPDATE' AS _change_type, o_orderkey, o_custkey, 'X' AS o_orderstatus,
        |         o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 9 = 0 AND o_orderkey % 10 <> 0
        |), ins AS (
        |  SELECT 'INSERT' AS _change_type, o_orderkey + 1000000000 AS o_orderkey, o_custkey,
        |         'N' AS o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 7 = 0
        |)
        |SELECT * FROM (
        |  SELECT * FROM del UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM ins) t
        |ORDER BY o_orderkey ASC NULLS FIRST, _change_type ASC NULLS FIRST""".stripMargin,

    "scan_ddb_export" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM orders ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,

    "scan_ddb_export_decimal" ->
      """SELECT o_orderkey,
        |  CAST(CAST(LPAD(CAST(o_orderkey AS VARCHAR), 20, '9') || '.123456789012345678'
        |       AS DECIMAL(38,18)) AS VARCHAR) AS big_dec_str,
        |  CAST(CAST(LPAD(CAST(o_orderkey AS VARCHAR), 19, '8') AS DECIMAL(38,0)) AS VARCHAR) AS big_int_str
        |FROM orders ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,

    "schema_infer" ->
      """SELECT c_acctbal, CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment,
        |       c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey
        |FROM customer ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,

    "schema_evolve" ->
      """SELECT * FROM (
        |  SELECT CAST(NULL AS DOUBLE) AS c_acctbal, CAST(c_custkey AS BIGINT) AS c_custkey,
        |         CAST(NULL AS VARCHAR) AS c_mktsegment, c_name, CAST(1 AS BIGINT) AS gen
        |  FROM customer
        |  UNION ALL
        |  SELECT c_acctbal, CAST(c_custkey AS BIGINT), c_mktsegment, c_name, CAST(2 AS BIGINT)
        |  FROM customer) t
        |ORDER BY gen ASC NULLS FIRST, c_custkey ASC NULLS FIRST""".stripMargin,

    "snapshot_load" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM orders ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,

    "sink_partitioned_parquet" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
        |       l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        |FROM lineitem ORDER BY l_orderkey ASC NULLS FIRST, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate""".stripMargin,

    // compact(16→1) + vacuum must preserve the row multiset exactly
    "maintenance_compact" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
        |       l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        |FROM lineitem ORDER BY l_orderkey ASC NULLS FIRST, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate""".stripMargin,

    // z-order rewrite must preserve the row multiset exactly; the per-axis
    // pruning invariants are hard requires inside the query
    "maintenance_zorder" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
        |       l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        |FROM lineitem ORDER BY l_orderkey ASC NULLS FIRST, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate""".stripMargin,
  )
}
