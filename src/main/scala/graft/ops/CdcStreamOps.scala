package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.etl.CdcApply
import graft.ops.Relational.Q
import graft.util.Det._

/** CDC + streaming pack, batch form (SURVEY.md §2.I).
  *
  * The reference's integration replicates continuously
  * (src/dynamodb-zero-etl-s3tables.ts:211-215); DuckDB can't stream, so each
  * operator exists twice: the oracled batch twin here, and the Structured
  * Streaming form in [[graft.streaming.StreamingOps]] (scalatest-verified,
  * sharing the same aggregation expressions).
  *
  * The CDC fixture is derived deterministically from `orders` inside the
  * query (same derivation in the oracle SQL): REMOVE for keys %10=0, MODIFY
  * for even keys (with a second, higher-sequence MODIFY for %4=0 — same-key
  * multi-update in one batch), INSERT of fresh keys for %7=0.
  */
object CdcStreamOps {

  /** The zero-ETL core: LWW upsert + tombstones onto a base snapshot. */
  private val cdcApply: Q = (s, d) => {
    val o = load(s, d, "orders")
    val k = col("o_orderkey")
    val one1 = lit("1.10").cast("decimal(18,2)")
    val one2 = lit("1.20").cast("decimal(18,2)")

    val removes = o.filter(k % 10 === 0).select(
      CdcApply.changeCols(lit(CdcApply.OpRemove), lit(1L),
        Seq(k, lit(null).cast("long").as("o_custkey"),
          lit(null).cast("string").as("o_orderstatus"),
          lit(null).cast("double").as("o_totalprice"),
          lit(null).cast("timestamp_ntz").as("o_orderdate"),
          lit(null).cast("string").as("o_orderpriority"))): _*)
    val mod1 = o.filter(k % 2 === 0 && k % 10 =!= 0).select(
      CdcApply.changeCols(lit(CdcApply.OpModify), lit(1L),
        Seq(k, col("o_custkey"), lit("U").as("o_orderstatus"),
          (dec2(col("o_totalprice")) * one1).cast("double").as("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))): _*)
    val mod2 = o.filter(k % 4 === 0 && k % 10 =!= 0).select(
      CdcApply.changeCols(lit(CdcApply.OpModify), lit(2L),
        Seq(k, col("o_custkey"), lit("V").as("o_orderstatus"),
          (dec2(col("o_totalprice")) * one2).cast("double").as("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))): _*)
    val inserts = o.filter(k % 7 === 0).select(
      CdcApply.changeCols(lit(CdcApply.OpInsert), lit(1L),
        Seq((k + 1000000000L).as("o_orderkey"), col("o_custkey"),
          lit("N").as("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))): _*)

    val changes = removes.unionByName(mod1).unionByName(mod2).unionByName(inserts)
    CdcApply(o, changes, keys = Seq("o_orderkey"))
      .orderBy(col("o_orderkey").asc_nulls_first)
  }

  /** Mid-stream schema evolution (`cdc_apply_evolve`): a change batch whose
    * MODIFY/INSERT records carry an attribute the base has never seen
    * (`o_channel`). [[CdcApply]] widens the result schema and NULL-pads base
    * rows — the continuous-replication half of the `glue:UpdateTable` /
    * `GetTableVersions` analog (reference src:113-115; batch half is
    * `schema_evolve` in [[Ingest]]). */
  private val cdcApplyEvolve: Q = (s, d) => {
    val o = load(s, d, "orders")
    val k = col("o_orderkey")
    val mods = o.filter(k % 3 === 0).select(
      CdcApply.changeCols(lit(CdcApply.OpModify), lit(1L),
        Seq(k, col("o_custkey"), lit("E").as("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"),
          lit("web").as("o_channel"))): _*)
    val inserts = o.filter(k % 11 === 0).select(
      CdcApply.changeCols(lit(CdcApply.OpInsert), lit(1L),
        Seq((k + 2000000000L).as("o_orderkey"), col("o_custkey"),
          lit("N").as("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"),
          lit("app").as("o_channel"))): _*)
    CdcApply(o, mods.unionByName(inserts), keys = Seq("o_orderkey"))
      .orderBy(col("o_orderkey").asc_nulls_first)
  }

  /** Event-time tumbling window (1 h), epoch-aligned — identical bucketing to
    * DuckDB's date_trunc('hour'). */
  private val tumbling: Q = (s, d) =>
    load(s, d, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("window_start").asc_nulls_first, col("event_type").asc_nulls_first)

  /** Sliding window (1 h window, 15 min slide): each event lands in 4
    * epoch-aligned windows. */
  private val sliding: Q = (s, d) =>
    load(s, d, "events")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("window_start").asc_nulls_first, col("event_type").asc_nulls_first)

  /** Session windows, 30 min gap per user; session end = last event + gap
    * (Spark session_window semantics, emulated with lag-gap cumulative sums
    * in the oracle). */
  private val session: Q = (s, d) =>
    load(s, d, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n"), col("sum_value"))
      .orderBy(col("user_id").asc_nulls_first, col("session_start").asc_nulls_first)

  /** Watermark-dedup batch twin: deterministic keep-first (by event time,
    * then id) per duplicate key (user, type, minute bucket) — what streaming
    * dropDuplicates does in arrival order, pinned to a total order. */
  private val dedupWatermark: Q = (s, d) => {
    val bucket = date_trunc("minute", col("ts")).as("minute_bucket")
    val w = Window.partitionBy(col("user_id"), col("event_type"), col("minute_bucket"))
      .orderBy(col("ts").asc, col("event_id").asc)
    load(s, d, "events")
      .select(col("user_id"), col("event_type"), bucket, col("event_id"), col("ts"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("minute_bucket"),
        col("event_id"), col("ts"))
      .orderBy(col("user_id").asc_nulls_first, col("event_type").asc_nulls_first,
        col("minute_bucket").asc_nulls_first)
  }

  /** Stream-stream interval join, batch twin (SURVEY §2.I extension): each
    * purchase joins the same user's clicks from the preceding 30 minutes —
    * the attribution-join shape. The streaming form
    * ([[graft.streaming.StreamingOps.intervalJoin]]) is the same predicate
    * with watermarks bounding both sides' state. One shuffle on user_id;
    * the time-range predicate rides the equi join as a residual condition,
    * never a cartesian. */
  private val streamStreamJoin: Q = (s, d) => {
    val ev = load(s, d, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
          col("c_ts") <= col("p_ts"))
      .select(col("p_id"), col("c_id"), col("p_user").as("user_id"),
        col("p_ts"), col("c_ts"))
      .orderBy(col("p_id").asc_nulls_first, col("c_id").asc_nulls_first)
  }

  /** Stateful per-key running aggregate, batch twin (streaming form uses
    * transformWithState-style per-key state; see streaming module). */
  private val statefulRunning: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    load(s, d, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("running_events", count(lit(1)).over(w))
      .withColumn("running_value", sum(dec2(col("value"))).over(w).cast("double"))
      .orderBy(col("user_id").asc_nulls_first, col("event_id").asc_nulls_first)
  }

  /** The graft-table Structured-Streaming source end-to-end (north-star
    * streaming-consumption shape): three commits land on a snapshot table;
    * a stream started AT version 1 (`streaming.start-version`) follows the
    * manifest chain and emits exactly the rows of generations 1 and 2 — the
    * base generation is never read, let alone rescanned. AvailableNow +
    * memory sink keep the run bounded and deterministic; the oracle is the
    * same two generations derived relationally. */
  private val streamTableFeed: Q = (s, d) => {
    val o = load(s, d, "orders")
    val k = col("o_orderkey")
    val store = new graft.store.TableStore(
      s, graft.util.Scratch.dir("stream_table_feed"))
    store.commitSnapshot(o.filter(k % 3 === 1))
    store.commitAppend(o.filter(k % 3 === 2))
    store.commitAppend(o.filter(k % 3 === 0))
    val qname = "stream_table_feed_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = s.readStream.format(classOf[graft.sources.GraftTableProvider].getName)
      .option("path", store.root)
      .option("streaming.start-version", "1")
      .load()
      .writeStream.format("memory").queryName(qname)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(qname).orderBy(k.asc_nulls_first)
  }

  /** Source → sink roundtrip: three commits on table A stream through the
    * graft-table source INTO the graft-table sink (table B), which commits
    * one snapshot per micro-batch with epoch markers; the registered result
    * is B read back. Exercises both halves of the streaming surface plus the
    * exactly-once bookkeeping end-to-end; the oracle is the full orders
    * relation. */
  private val streamTableRoundtrip: Q = (s, d) => {
    val o = load(s, d, "orders")
    val k = col("o_orderkey")
    val src = new graft.store.TableStore(
      s, graft.util.Scratch.dir("stream_rt_src"))
    src.commitSnapshot(o.filter(k % 3 === 1))
    src.commitAppend(o.filter(k % 3 === 2))
    src.commitAppend(o.filter(k % 3 === 0))
    val dstRoot = graft.util.Scratch.dir("stream_rt_dst")
    val q = s.readStream.format(classOf[graft.sources.GraftTableProvider].getName)
      .option("path", src.root)
      .load()
      .writeStream.format(classOf[graft.sources.GraftTableProvider].getName)
      .option("path", dstRoot)
      .option("checkpointLocation", graft.util.Scratch.dir("stream_rt_ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    new graft.store.TableStore(s, dstRoot).readSnapshot()
      .orderBy(k.asc_nulls_first)
  }

  /** The same CDC fixture as `cdc_apply`, driven through the MERGE-ON-READ
    * store loop ([[graft.streaming.StreamingOps.applyCdcBatchMor]]): the
    * batch lands as ONE delete-vector + append commit — O(changed rows)
    * write volume instead of rewriting every touched bucket, the trade a
    * 100 TB continuous feed needs (see `sql_delete_mor` for the measured
    * 438× write-volume gap). The require()s pin the MOR contract: every
    * seed file inherited, delete vectors present. Read back THROUGH the
    * DV view and oracle-checked against the same relational LWW result. */
  private val cdcApplyMor: Q = (s, d) => {
    val o = load(s, d, "orders")
    val k = col("o_orderkey")
    val one1 = lit("1.10").cast("decimal(18,2)")
    val one2 = lit("1.20").cast("decimal(18,2)")
    val store = new graft.store.TableStore(s,
      graft.util.Scratch.dir("cdc_apply_mor"))
    store.commitBucketed(o, keys = Seq("o_orderkey"), numBuckets = 16)
    val files0 = store.manifest(store.currentVersion()).inlineFiles.toSet
    val removes = o.filter(k % 10 === 0).select(
      CdcApply.changeCols(lit(CdcApply.OpRemove), lit(1L),
        Seq(k, lit(null).cast("long").as("o_custkey"),
          lit(null).cast("string").as("o_orderstatus"),
          lit(null).cast("double").as("o_totalprice"),
          lit(null).cast("timestamp_ntz").as("o_orderdate"),
          lit(null).cast("string").as("o_orderpriority"))): _*)
    val mod1 = o.filter(k % 2 === 0 && k % 10 =!= 0).select(
      CdcApply.changeCols(lit(CdcApply.OpModify), lit(1L),
        Seq(k, col("o_custkey"), lit("U").as("o_orderstatus"),
          (dec2(col("o_totalprice")) * one1).cast("double").as("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))): _*)
    val mod2 = o.filter(k % 4 === 0 && k % 10 =!= 0).select(
      CdcApply.changeCols(lit(CdcApply.OpModify), lit(2L),
        Seq(k, col("o_custkey"), lit("V").as("o_orderstatus"),
          (dec2(col("o_totalprice")) * one2).cast("double").as("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))): _*)
    val inserts = o.filter(k % 7 === 0).select(
      CdcApply.changeCols(lit(CdcApply.OpInsert), lit(1L),
        Seq((k + 1000000000L).as("o_orderkey"), col("o_custkey"),
          lit("N").as("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))): _*)
    graft.streaming.StreamingOps.applyCdcBatchMor(
      removes.unionByName(mod1).unionByName(mod2).unionByName(inserts),
      store, keys = Seq("o_orderkey"), numBuckets = 16)
    val m = store.manifest(store.currentVersion())
    require(m.hasDvs, "MOR CDC apply must commit delete vectors")
    require(files0.subsetOf(m.inlineFiles.toSet),
      "MOR CDC apply must inherit every seed data file")
    store.readSnapshot().orderBy(col("o_orderkey").asc_nulls_first)
  }

  /** The same CDC fixture again, driven through the EQUALITY-DELETE loop
    * (`applyCdcBatchEq` → `TableStore.upsertEq`, Iceberg v2 equality
    * deletes — the Flink streaming-sink shape): the batch commits an
    * equality-delete file of its keys plus the post-image append, with
    * ZERO base-file reads — where the positional loop must scan the
    * batch's candidate buckets to resolve `(file, pos)`, this commit's
    * cost is O(batch) at any table size and key scatter. Same relational
    * LWW result as `cdc_apply`/`cdc_apply_mor` by construction. */
  private val cdcApplyEq: Q = (s, d) => {
    val o = load(s, d, "orders")
    val k = col("o_orderkey")
    val one1 = lit("1.10").cast("decimal(18,2)")
    val one2 = lit("1.20").cast("decimal(18,2)")
    val store = new graft.store.TableStore(s,
      graft.util.Scratch.dir("cdc_apply_eq"))
    store.commitBucketed(o, keys = Seq("o_orderkey"), numBuckets = 16)
    val files0 = store.manifest(store.currentVersion()).inlineFiles.toSet
    val removes = o.filter(k % 10 === 0).select(
      CdcApply.changeCols(lit(CdcApply.OpRemove), lit(1L),
        Seq(k, lit(null).cast("long").as("o_custkey"),
          lit(null).cast("string").as("o_orderstatus"),
          lit(null).cast("double").as("o_totalprice"),
          lit(null).cast("timestamp_ntz").as("o_orderdate"),
          lit(null).cast("string").as("o_orderpriority"))): _*)
    val mod1 = o.filter(k % 2 === 0 && k % 10 =!= 0).select(
      CdcApply.changeCols(lit(CdcApply.OpModify), lit(1L),
        Seq(k, col("o_custkey"), lit("U").as("o_orderstatus"),
          (dec2(col("o_totalprice")) * one1).cast("double").as("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))): _*)
    val mod2 = o.filter(k % 4 === 0 && k % 10 =!= 0).select(
      CdcApply.changeCols(lit(CdcApply.OpModify), lit(2L),
        Seq(k, col("o_custkey"), lit("V").as("o_orderstatus"),
          (dec2(col("o_totalprice")) * one2).cast("double").as("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))): _*)
    val inserts = o.filter(k % 7 === 0).select(
      CdcApply.changeCols(lit(CdcApply.OpInsert), lit(1L),
        Seq((k + 1000000000L).as("o_orderkey"), col("o_custkey"),
          lit("N").as("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))): _*)
    graft.streaming.StreamingOps.applyCdcBatchEq(
      removes.unionByName(mod1).unionByName(mod2).unionByName(inserts),
      store, keys = Seq("o_orderkey"), numBuckets = 16)
    val m = store.manifest(store.currentVersion())
    require(m.hasEqDeletes, "equality CDC apply must commit equality deletes")
    require(!m.hasDvs, "equality CDC apply must not scan for positions")
    require(files0.subsetOf(m.inlineFiles.toSet),
      "equality CDC apply must inherit every seed data file")
    store.readSnapshot().orderBy(col("o_orderkey").asc_nulls_first)
  }

  /** AUTO-routed CDC loop (`cdc_apply_auto`): the same logical merge a
    * fourth time, but the ROUTER picks the write path per batch
    * ([[graft.streaming.StreamingOps.applyCdcBatchAuto]]) — a SCATTERED
    * first batch (keys across every bucket, where positional candidate
    * scans degrade to full-table passes) must route to the zero-read
    * equality path, and a bucket-SPARSE second batch must route to
    * positional merge-on-read; the require()s pin both recorded routes.
    * The LWW result over the two batches is what the oracle reproduces. */
  private val cdcApplyAuto: Q = (s, d) => {
    val o = load(s, d, "orders")
    val k = col("o_orderkey")
    val one1 = lit("1.10").cast("decimal(18,2)")
    val one2 = lit("1.20").cast("decimal(18,2)")
    val one3 = lit("1.30").cast("decimal(18,2)")
    val store = new graft.store.TableStore(s,
      graft.util.Scratch.dir("cdc_apply_auto"))
    store.commitBucketed(o, keys = Seq("o_orderkey"), numBuckets = 64)
    def route = store.manifest(store.currentVersion())
      .props.get("graft.cdc.route")
    val removes = o.filter(k % 10 === 0).select(
      CdcApply.changeCols(lit(CdcApply.OpRemove), lit(1L),
        Seq(k, lit(null).cast("long").as("o_custkey"),
          lit(null).cast("string").as("o_orderstatus"),
          lit(null).cast("double").as("o_totalprice"),
          lit(null).cast("timestamp_ntz").as("o_orderdate"),
          lit(null).cast("string").as("o_orderpriority"))): _*)
    val mod1 = o.filter(k % 2 === 0 && k % 10 =!= 0).select(
      CdcApply.changeCols(lit(CdcApply.OpModify), lit(1L),
        Seq(k, col("o_custkey"), lit("U").as("o_orderstatus"),
          (dec2(col("o_totalprice")) * one1).cast("double").as("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))): _*)
    val mod2 = o.filter(k % 4 === 0 && k % 10 =!= 0).select(
      CdcApply.changeCols(lit(CdcApply.OpModify), lit(2L),
        Seq(k, col("o_custkey"), lit("V").as("o_orderstatus"),
          (dec2(col("o_totalprice")) * one2).cast("double").as("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))): _*)
    val inserts = o.filter(k % 7 === 0).select(
      CdcApply.changeCols(lit(CdcApply.OpInsert), lit(1L),
        Seq((k + 1000000000L).as("o_orderkey"), col("o_custkey"),
          lit("N").as("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))): _*)
    graft.streaming.StreamingOps.applyCdcBatchAuto(
      removes.unionByName(mod1).unionByName(mod2).unionByName(inserts),
      store, keys = Seq("o_orderkey"), numBuckets = 64)
    require(route.contains("eq"),
      s"scattered CDC batch must route to the equality path, got $route")
    // bucket-sparse follow-up (k ≡ 1 mod 8000, capped below 60000 -> at
    // most 8 keys -> at most 8 of 64 buckets at ANY scale factor): odd
    // keys, so disjoint from mod1/mod2 and never removed
    val sparse = o.filter(k % 8000 === 1 && k < 60000L).select(
      CdcApply.changeCols(lit(CdcApply.OpModify), lit(3L),
        Seq(k, col("o_custkey"), lit("W").as("o_orderstatus"),
          (dec2(col("o_totalprice")) * one3).cast("double").as("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))): _*)
    graft.streaming.StreamingOps.applyCdcBatchAuto(
      sparse, store, keys = Seq("o_orderkey"), numBuckets = 64)
    require(route.contains("mor"),
      s"bucket-sparse CDC batch must route to the positional path, got $route")
    store.readSnapshot().orderBy(col("o_orderkey").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "stream_table_feed" -> streamTableFeed,
    "stream_table_roundtrip" -> streamTableRoundtrip,
    "cdc_apply" -> cdcApply,
    "cdc_apply_mor" -> cdcApplyMor,
    "cdc_apply_eq" -> cdcApplyEq,
    "cdc_apply_auto" -> cdcApplyAuto,
    "cdc_apply_evolve" -> cdcApplyEvolve,
    "stream_tumbling_window" -> tumbling,
    "stream_sliding_window" -> sliding,
    "stream_session_window" -> session,
    "stream_dedup_watermark" -> dedupWatermark,
    "stream_stateful_running" -> statefulRunning,
    "stream_stream_join" -> streamStreamJoin,
  )

  val oracles: Map[String, String] = Map(
    "stream_table_roundtrip" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM orders
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,

    "stream_table_feed" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 3 <> 1
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,

    "cdc_apply" ->
      """WITH survivors AS (
        |  SELECT o_orderkey,
        |         o_custkey,
        |         CASE WHEN o_orderkey % 4 = 0 THEN 'V'
        |              WHEN o_orderkey % 2 = 0 THEN 'U'
        |              ELSE o_orderstatus END AS o_orderstatus,
        |         CASE WHEN o_orderkey % 4 = 0
        |                THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.20 AS DECIMAL(18,2)) AS DOUBLE)
        |              WHEN o_orderkey % 2 = 0
        |                THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.10 AS DECIMAL(18,2)) AS DOUBLE)
        |              ELSE o_totalprice END AS o_totalprice,
        |         o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 10 <> 0
        |), inserted AS (
        |  SELECT o_orderkey + 1000000000 AS o_orderkey, o_custkey,
        |         'N' AS o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 7 = 0
        |)
        |SELECT * FROM survivors UNION ALL SELECT * FROM inserted
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,

    // identical relational LWW result as cdc_apply: the MOR loop is a
    // different physical strategy for the same logical merge
    "cdc_apply_mor" ->
      """WITH survivors AS (
        |  SELECT o_orderkey,
        |         o_custkey,
        |         CASE WHEN o_orderkey % 4 = 0 THEN 'V'
        |              WHEN o_orderkey % 2 = 0 THEN 'U'
        |              ELSE o_orderstatus END AS o_orderstatus,
        |         CASE WHEN o_orderkey % 4 = 0
        |                THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.20 AS DECIMAL(18,2)) AS DOUBLE)
        |              WHEN o_orderkey % 2 = 0
        |                THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.10 AS DECIMAL(18,2)) AS DOUBLE)
        |              ELSE o_totalprice END AS o_totalprice,
        |         o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 10 <> 0
        |), inserted AS (
        |  SELECT o_orderkey + 1000000000 AS o_orderkey, o_custkey,
        |         'N' AS o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 7 = 0
        |)
        |SELECT * FROM survivors UNION ALL SELECT * FROM inserted
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,

    // same logical merge a third time: the equality-delete loop commits
    // without reading the base at all, but the LWW result is identical
    "cdc_apply_eq" ->
      """WITH survivors AS (
        |  SELECT o_orderkey,
        |         o_custkey,
        |         CASE WHEN o_orderkey % 4 = 0 THEN 'V'
        |              WHEN o_orderkey % 2 = 0 THEN 'U'
        |              ELSE o_orderstatus END AS o_orderstatus,
        |         CASE WHEN o_orderkey % 4 = 0
        |                THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.20 AS DECIMAL(18,2)) AS DOUBLE)
        |              WHEN o_orderkey % 2 = 0
        |                THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.10 AS DECIMAL(18,2)) AS DOUBLE)
        |              ELSE o_totalprice END AS o_totalprice,
        |         o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 10 <> 0
        |), inserted AS (
        |  SELECT o_orderkey + 1000000000 AS o_orderkey, o_custkey,
        |         'N' AS o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 7 = 0
        |)
        |SELECT * FROM survivors UNION ALL SELECT * FROM inserted
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,

    // the router's two-batch sequence: batch 1 = the eq merge above,
    // batch 2 = sparse 'W' updates on keys ≡ 1 (mod 8000) below 60000 —
    // odd keys, so disjoint from every batch-1 modification, never removed
    "cdc_apply_auto" ->
      """WITH survivors AS (
        |  SELECT o_orderkey,
        |         o_custkey,
        |         CASE WHEN o_orderkey % 8000 = 1 AND o_orderkey < 60000 THEN 'W'
        |              WHEN o_orderkey % 4 = 0 THEN 'V'
        |              WHEN o_orderkey % 2 = 0 THEN 'U'
        |              ELSE o_orderstatus END AS o_orderstatus,
        |         CASE WHEN o_orderkey % 8000 = 1 AND o_orderkey < 60000
        |                THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.30 AS DECIMAL(18,2)) AS DOUBLE)
        |              WHEN o_orderkey % 4 = 0
        |                THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.20 AS DECIMAL(18,2)) AS DOUBLE)
        |              WHEN o_orderkey % 2 = 0
        |                THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.10 AS DECIMAL(18,2)) AS DOUBLE)
        |              ELSE o_totalprice END AS o_totalprice,
        |         o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 10 <> 0
        |), inserted AS (
        |  SELECT o_orderkey + 1000000000 AS o_orderkey, o_custkey,
        |         'N' AS o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 7 = 0
        |)
        |SELECT * FROM survivors UNION ALL SELECT * FROM inserted
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,

    "cdc_apply_evolve" ->
      """WITH survivors AS (
        |  SELECT o_orderkey, o_custkey,
        |         CASE WHEN o_orderkey % 3 = 0 THEN 'E' ELSE o_orderstatus END AS o_orderstatus,
        |         o_totalprice, o_orderdate, o_orderpriority,
        |         CASE WHEN o_orderkey % 3 = 0 THEN 'web' ELSE CAST(NULL AS VARCHAR) END AS o_channel
        |  FROM orders
        |), inserted AS (
        |  SELECT o_orderkey + 2000000000 AS o_orderkey, o_custkey,
        |         'N' AS o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
        |         'app' AS o_channel
        |  FROM orders WHERE o_orderkey % 11 = 0
        |)
        |SELECT * FROM survivors UNION ALL SELECT * FROM inserted
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,

    "stream_tumbling_window" ->
      """SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start ASC NULLS FIRST, event_type ASC NULLS FIRST""".stripMargin,

    "stream_sliding_window" ->
      """SELECT MAKE_TIMESTAMP((EPOCH_US(ts) // 900000000 - k.k) * 900000000) AS window_start,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events, (SELECT UNNEST(RANGE(4)) AS k) k
        |GROUP BY 1, 2
        |ORDER BY window_start ASC NULLS FIRST, event_type ASC NULLS FIRST""".stripMargin,

    "stream_session_window" ->
      """WITH g AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |           OR ts >= LAG(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
        |), s AS (
        |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g
        |)
        |SELECT MIN(ts) AS session_start,
        |       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |       user_id, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id ASC NULLS FIRST, session_start ASC NULLS FIRST""".stripMargin,

    "stream_dedup_watermark" ->
      """SELECT user_id, event_type, minute_bucket, event_id, ts FROM (
        |  SELECT user_id, event_type, DATE_TRUNC('minute', ts) AS minute_bucket, event_id, ts,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type, DATE_TRUNC('minute', ts)
        |                       ORDER BY ts ASC, event_id ASC) AS rn
        |  FROM events) t
        |WHERE rn = 1
        |ORDER BY user_id ASC NULLS FIRST, event_type ASC NULLS FIRST, minute_bucket ASC NULLS FIRST""".stripMargin,

    "stream_stream_join" ->
      """SELECT p.event_id AS p_id, c.event_id AS c_id,
        |       p.user_id AS user_id, p.ts AS p_ts, c.ts AS c_ts
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
        |ORDER BY p_id ASC NULLS FIRST, c_id ASC NULLS FIRST""".stripMargin,

    "stream_stateful_running" ->
      """SELECT user_id, event_id, ts, value,
        |  COUNT(*) OVER w AS running_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id ASC NULLS FIRST, event_id ASC NULLS FIRST""".stripMargin,
  )
}
