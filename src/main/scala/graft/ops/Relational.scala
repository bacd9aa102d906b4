package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables.load
import graft.util.Det._

/** Relational operator pack (SURVEY.md §2.A scan, §2.B–§2.G).
  *
  * The reference provisions a full-SQL analytics surface over Iceberg tables
  * (reference README.md:170-173); each builder here is the Spark-native form
  * of one operator from that surface, expressed declaratively so Catalyst
  * keeps pushdown/pruning/broadcast decisions (SURVEY.md §4.2).
  *
  * Scale notes (100 TB): every query is a declarative plan — filters and
  * projections reach the parquet scan; small dimensions are explicitly
  * `broadcast()`; no driver-side collection anywhere.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- §2.A scan
  private val scanParquet: Q = (s, d) =>
    load(s, d, "nation").orderBy(col("n_nationkey").asc_nulls_first)

  // ------------------------------------------------------------ §2.B proj/filter
  private val projectSelect: Q = (s, d) =>
    load(s, d, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
          .cast("double").as("disc_price"),
        upper(col("l_returnflag")).as("flag"))
      .orderBy(col("l_orderkey").asc_nulls_first, col("l_linenumber").asc_nulls_first,
        col("disc_price").asc_nulls_first, col("flag").asc_nulls_first)

  /** Key-condition pattern: PK equality + SK range, mirroring DynamoDB key
    * access (reference README.md:81-84). Pushed to the parquet scan. */
  private val filterPred: Q = (s, d) =>
    load(s, d, "lineitem")
      .filter(col("l_returnflag") === "R" &&
        col("l_shipdate").between(
          lit("1997-01-01 00:00:00").cast("timestamp"),
          lit("1998-12-31 00:00:00").cast("timestamp")))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_shipdate"))
      .orderBy(col("l_orderkey").asc_nulls_first, col("l_linenumber").asc_nulls_first,
        col("l_quantity").asc_nulls_first, col("l_shipdate").asc_nulls_first)

  // ---------------------------------------------------------------- §2.C joins
  private val joinInnerHash: Q = (s, d) =>
    load(s, d, "orders")
      .join(load(s, d, "customer"), col("o_custkey") === col("c_custkey"), "inner")
      .select(col("o_orderkey"), col("c_custkey"), col("c_name"), col("o_totalprice"))
      .orderBy(col("o_orderkey").asc_nulls_first)

  /** Small-dim broadcast: part is tiny relative to lineitem; at cluster scale
    * this stays a broadcast-hash join with no shuffle of the fact side. */
  private val joinBroadcast: Q = (s, d) =>
    load(s, d, "lineitem")
      .join(broadcast(load(s, d, "part")), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("p_name"), col("p_brand"))
      .orderBy(col("l_orderkey").asc_nulls_first, col("l_linenumber").asc_nulls_first,
        col("p_name").asc_nulls_first, col("p_brand").asc_nulls_first)

  private val joinLeftOuter: Q = (s, d) =>
    load(s, d, "customer")
      .join(load(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("c_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first)

  private val joinSemi: Q = (s, d) => {
    val o = load(s, d, "orders").filter(col("o_orderstatus") === "F")
    load(s, d, "customer")
      .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey").asc_nulls_first)
  }

  private val joinAnti: Q = (s, d) => {
    val o = load(s, d, "orders").filter(col("o_orderstatus") === "F")
    load(s, d, "customer")
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey").asc_nulls_first)
  }

  /** Equi key + band residual: planner keeps the equi hash join and applies
    * the band as a residual filter — no cartesian blow-up at scale. */
  private val joinRangeTheta: Q = (s, d) => {
    val c = load(s, d, "customer")
    val sup = load(s, d, "supplier")
    c.join(broadcast(sup),
        col("c_nationkey") === col("s_nationkey") &&
          col("s_acctbal").between(col("c_acctbal") - 1000, col("c_acctbal") + 1000))
      .select(col("c_custkey"), col("s_suppkey"), col("c_acctbal"), col("s_acctbal"))
      .orderBy(col("c_custkey").asc_nulls_first, col("s_suppkey").asc_nulls_first)
  }

  /** As-of join (no native Spark operator, SURVEY §4.2): for every purchase
    * event, the latest click by the same user at or before it. Equi-join on
    * user + window argmax; ties broken by click event_id so the pick is total.
    * At scale the window runs per user partition after one shuffle. */
  private val joinAsof: Q = (s, d) => {
    val ev = load(s, d, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("ts").as("p_ts"),
        col("user_id").as("p_user"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_event_id"), col("ts").as("c_ts"),
        col("user_id").as("c_user"))
    val joined = purchases.join(clicks,
      col("p_user") === col("c_user") && col("c_ts") <= col("p_ts"))
    val w = Window.partitionBy(col("p_event_id"))
      .orderBy(col("c_ts").desc, col("c_event_id").desc)
    joined.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("p_event_id"), col("p_ts"), col("c_event_id").as("click_event_id"),
        col("c_ts").as("click_ts"))
      .orderBy(col("p_event_id").asc_nulls_first)
  }

  // ----------------------------------------------------------------- §2.D aggs
  /** Flagship: TPC-H Q1-shaped pricing summary (SURVEY §7.2). Partial+final
    * hash aggregation; exact decimal arithmetic for oracle parity. */
  val aggHashSum: Q = (s, d) => {
    val one = lit(1).cast("decimal(18,2)")
    load(s, d, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec2(col("l_extendedprice")) *
            ((one - dec2(col("l_discount"))) * (one + dec2(col("l_tax")))).cast("decimal(8,4)"))
          .cast("double").as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  private val aggDistinctCount: Q = (s, d) =>
    load(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag").asc_nulls_first)

  /** HLL sketch for 100 TB-scale cardinality. Spark's HLL++ and DuckDB's
    * approx_count_distinct use different sketches, so comparing raw
    * estimates would test sketch internals, not the operator. Instead the
    * query emits a DETERMINISTIC encoding (VERDICT r6 #2): the exact
    * distinct count per group plus a `within_bounds` flag checking the HLL
    * estimate against its 3·rsd error envelope — HLL++ merge is
    * order-independent, so the estimate (and hence the flag) is stable
    * across runs and partitionings. The DuckDB oracle computes the exact
    * count and literal TRUE: hash parity holds exactly when every group's
    * estimate lands inside the envelope, making the sketch's accuracy —
    * not its internals — the oracled contract. */
  private val aggApproxDistinct: Q = (s, d) =>
    load(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .select(col("l_returnflag"), col("exact_orders"),
        (abs(col("approx") - col("exact_orders")) <=
          lit(3 * 0.02) * col("exact_orders")).as("within_bounds"))
      .orderBy(col("l_returnflag").asc_nulls_first)

  /** Approximate quantiles under the same deterministic-envelope contract
    * as `agg_approx_distinct`: emit EXACT interpolated percentiles (Spark
    * `percentile` ≡ DuckDB `QUANTILE_CONT`, both (n-1)·p linear
    * interpolation — binary-exact on these values) plus a `within_bounds`
    * check that the GK sketch's median lands inside its rank-error
    * envelope. Exact percentile holds O(group) state — fine for the oracle
    * contract at test scale; at 100 TB the sketch (`percentile_approx`,
    * mergeable, bounded state) is the production path and this query is
    * what verifies it. */
  private val aggApproxQuantile: Q = (s, d) =>
    load(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25_exact"),
        expr("percentile(l_quantity, 0.5)").as("med_exact"),
        expr("percentile(l_quantity, 0.75)").as("p75_exact"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("_am"))
      .select(col("l_returnflag"), col("p25_exact"), col("med_exact"),
        col("p75_exact"),
        // rank error N/accuracy ≈ 2 rows; value blocks are hundreds deep,
        // so the approx median sits within one value step of exact
        (abs(col("_am") - col("med_exact")) <= lit(2.0)).as("within_bounds"))
      .orderBy(col("l_returnflag").asc_nulls_first)

  /** Pivot with an EXPLICIT value list — the 100 TB contract: without it,
    * Spark first collects the distinct pivot values to the driver (an extra
    * job + unbounded width); with it, the pivot lowers to conditional
    * aggregates inside one partial+final hash aggregation, a single
    * shuffle. Lowercased output aliases keep DuckDB schema parity. */
  private val aggPivot: Q = (s, d) =>
    load(s, d, "lineitem")
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .select(col("l_linestatus"),
        col("A_sum_qty").as("a_sum_qty"), col("A_n").as("a_n"),
        col("N_sum_qty").as("n_sum_qty"), col("N_n").as("n_n"),
        col("R_sum_qty").as("r_sum_qty"), col("R_n").as("r_n"))
      .orderBy(col("l_linestatus").asc_nulls_first)

  private val aggGroupingSets: Q = (s, d) => {
    load(s, d, "lineitem").createOrReplaceTempView("graft_li_gs")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       COUNT(*) AS n
        |FROM graft_li_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  private val aggRollup: Q = (s, d) => {
    val c = load(s, d, "customer")
    val n = load(s, d, "nation")
    val r = load(s, d, "region")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(dsum(col("c_acctbal")).as("sum_bal"), count(lit(1)).as("n_cust"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  private val aggCube: Q = (s, d) =>
    load(s, d, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  // -------------------------------------------------------------- §2.E windows
  private val winRank: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    load(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .withColumn("rn", row_number().over(w))
      .orderBy(col("o_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first)
  }

  /** Running total with an explicit ROWS frame; decimal-exact so the
    * incremental and segment-tree evaluation orders agree across engines. */
  private val winRunningSum: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    load(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("running_total", sum(dec2(col("o_totalprice"))).over(w).cast("double"))
      .orderBy(col("o_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first)
  }

  private val winLagLead: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    load(s, d, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
      .orderBy(col("user_id").asc_nulls_first, col("event_id").asc_nulls_first)
  }

  private val winTopkPerGroup: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    load(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey").asc_nulls_first, col("rn").asc_nulls_first)
  }

  /** Multi-join analytics (TPC-H Q3 shape): shipping-priority revenue.
    * customer⋈orders⋈lineitem with the two dims filtered before the join;
    * at scale: two hash shuffles on the join keys, revenue agg map-side. */
  private val joinMultiQ3: Q = (s, d) => {
    val one = lit(1).cast("decimal(18,2)")
    val c = load(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = load(s, d, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    val l = load(s, d, "lineitem")
      .filter(col("l_shipdate") > lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc_nulls_last, col("l_orderkey").asc_nulls_first)
      .limit(50)
  }

  /** Multi-join analytics (TPC-H Q10 shape): revenue lost to returned items
    * per customer in a quarter — fact-fact join shuffles on the order key,
    * the nation dim broadcasts, top customers via TakeOrderedAndProject.
    * The `l_returnflag = 'R'` and date filters prune both facts BEFORE the
    * join (pushed to the scans), the property that keeps this shape viable
    * at 100 TB. */
  private val joinMultiQ10: Q = (s, d) => {
    val one = lit(1).cast("decimal(18,2)")
    val c = load(s, d, "customer")
    val o = load(s, d, "orders")
      .filter(col("o_orderdate") >= lit("1997-07-01 00:00:00").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1997-10-01 00:00:00").cast("timestamp_ntz"))
    val l = load(s, d, "lineitem").filter(col("l_returnflag") === "R")
    val n = load(s, d, "nation")
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc_nulls_last, col("c_custkey").asc_nulls_first)
      .limit(20)
  }

  /** Multi-join analytics (TPC-H Q5 shape): revenue per nation across the
    * whole star. Small dims (supplier/nation/region) broadcast; the two
    * fact-fact joins shuffle on their keys. */
  private val joinMultiQ5: Q = (s, d) => {
    val one = lit(1).cast("decimal(18,2)")
    val c = load(s, d, "customer")
    val o = load(s, d, "orders")
    val l = load(s, d, "lineitem")
    val sup = load(s, d, "supplier")
    val n = load(s, d, "nation")
    val r = load(s, d, "region")
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  // --------------------------------------------------------- §2.F sort / top-k
  /** Global order-by + limit → TakeOrderedAndProject: per-partition top-N then
    * a single driver merge of N×partitions rows — no global sort at scale. */
  private val sortLimitTopk: Q = (s, d) =>
    load(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc_nulls_first)
      .limit(100)

  // --------------------------------------------------------------- §2.G setops
  private val setUnionAll: Q = (s, d) => {
    val o = load(s, d, "orders")
    val a = o.filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
    val b = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
    a.unionByName(b)
      .orderBy(col("o_orderkey").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
  }

  private val setIntersect: Q = (s, d) => {
    val o = load(s, d, "orders")
    val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val p = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    f.intersect(p).orderBy(col("o_custkey").asc_nulls_first)
  }

  private val setExcept: Q = (s, d) => {
    val o = load(s, d, "orders")
    val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val p = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    f.except(p).orderBy(col("o_custkey").asc_nulls_first)
  }

  // ------------------------------------------------------------------ registry
  val queries: Map[String, Q] = Map(
    "scan_parquet" -> scanParquet,
    "project_select" -> projectSelect,
    "filter_pred" -> filterPred,
    "join_inner_hash" -> joinInnerHash,
    "join_broadcast" -> joinBroadcast,
    "join_left_outer" -> joinLeftOuter,
    "join_semi" -> joinSemi,
    "join_anti" -> joinAnti,
    "join_range_theta" -> joinRangeTheta,
    "join_asof" -> joinAsof,
    "join_multi_q3" -> joinMultiQ3,
    "join_multi_q5" -> joinMultiQ5,
    "join_multi_q10" -> joinMultiQ10,
    "agg_hash_sum" -> aggHashSum,
    "agg_distinct_count" -> aggDistinctCount,
    "agg_approx_distinct" -> aggApproxDistinct,
    "agg_approx_quantile" -> aggApproxQuantile,
    "agg_pivot" -> aggPivot,
    "agg_grouping_sets" -> aggGroupingSets,
    "agg_rollup" -> aggRollup,
    "agg_cube" -> aggCube,
    "win_rank" -> winRank,
    "win_running_sum" -> winRunningSum,
    "win_lag_lead" -> winLagLead,
    "win_topk_per_group" -> winTopkPerGroup,
    "sort_limit_topk" -> sortLimitTopk,
    "set_union_all" -> setUnionAll,
    "set_intersect" -> setIntersect,
    "set_except" -> setExcept,
  )

  val oracles: Map[String, String] = Map(
    "scan_parquet" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey ASC NULLS FIRST",

    "project_select" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS disc_price,
        |  UPPER(l_returnflag) AS flag
        |FROM lineitem
        |ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST, disc_price ASC NULLS FIRST, flag ASC NULLS FIRST""".stripMargin,

    "filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        |FROM lineitem
        |WHERE l_returnflag = 'R'
        |  AND l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00' AND TIMESTAMP '1998-12-31 00:00:00'
        |ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST, l_quantity ASC NULLS FIRST, l_shipdate ASC NULLS FIRST""".stripMargin,

    "join_inner_hash" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,

    "join_broadcast" ->
      """SELECT l_orderkey, l_linenumber, p_name, p_brand
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST, p_name ASC NULLS FIRST, p_brand ASC NULLS FIRST""".stripMargin,

    "join_left_outer" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |ORDER BY c_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,

    "join_range_theta" ->
      """SELECT c_custkey, s_suppkey, c_acctbal, s_acctbal
        |FROM customer JOIN supplier
        |  ON c_nationkey = s_nationkey AND s_acctbal BETWEEN c_acctbal - 1000 AND c_acctbal + 1000
        |ORDER BY c_custkey ASC NULLS FIRST, s_suppkey ASC NULLS FIRST""".stripMargin,

    "join_asof" ->
      """WITH p AS (SELECT event_id AS p_event_id, ts AS p_ts, user_id FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT event_id AS c_event_id, ts AS c_ts, user_id FROM events WHERE event_type = 'click'),
        |     j AS (SELECT p.*, c.c_event_id, c.c_ts,
        |             ROW_NUMBER() OVER (PARTITION BY p_event_id ORDER BY c_ts DESC, c_event_id DESC) AS rn
        |           FROM p JOIN c ON p.user_id = c.user_id AND c.c_ts <= p.p_ts)
        |SELECT p_event_id, p_ts, c_event_id AS click_event_id, c_ts AS click_ts
        |FROM j WHERE rn = 1
        |ORDER BY p_event_id ASC NULLS FIRST""".stripMargin,

    "join_multi_q10" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC NULLS LAST, c_custkey ASC NULLS FIRST
        |LIMIT 20""".stripMargin,

    "join_multi_q3" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC NULLS LAST, l_orderkey ASC NULLS FIRST
        |LIMIT 50""".stripMargin,

    "join_multi_q5" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "agg_hash_sum" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST((CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(8,4))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "agg_distinct_count" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,

    "agg_approx_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_orderkey) AS exact_orders,
        |  TRUE AS within_bounds
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,

    "agg_approx_quantile" ->
      """SELECT l_returnflag,
        |  QUANTILE_CONT(l_quantity, 0.25) AS p25_exact,
        |  QUANTILE_CONT(l_quantity, 0.5) AS med_exact,
        |  QUANTILE_CONT(l_quantity, 0.75) AS p75_exact,
        |  TRUE AS within_bounds
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,

    "agg_pivot" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS a_sum_qty,
        |  COUNT(CASE WHEN l_returnflag = 'A' THEN 1 END) AS a_n,
        |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS n_sum_qty,
        |  COUNT(CASE WHEN l_returnflag = 'N' THEN 1 END) AS n_n,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS r_sum_qty,
        |  COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS r_n
        |FROM lineitem GROUP BY l_linestatus
        |ORDER BY l_linestatus ASC NULLS FIRST""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "agg_rollup" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
        |  COUNT(*) AS n_cust
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "win_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk, ROW_NUMBER() OVER w AS rn
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
        |ORDER BY o_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin,

    "win_running_sum" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders
        |ORDER BY o_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin,

    "win_lag_lead" ->
      """SELECT user_id, event_id, ts, event_type,
        |  LAG(event_type, 1) OVER w AS prev_type,
        |  LEAD(event_type, 1) OVER w AS next_type,
        |  EPOCH_US(ts) - EPOCH_US(LAG(ts, 1) OVER w) AS gap_us
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |ORDER BY user_id ASC NULLS FIRST, event_id ASC NULLS FIRST""".stripMargin,

    "win_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey ASC NULLS FIRST, rn ASC NULLS FIRST""".stripMargin,

    "sort_limit_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST
        |LIMIT 100""".stripMargin,

    "set_union_all" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey ASC NULLS FIRST""".stripMargin,

    "set_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey ASC NULLS FIRST""".stripMargin,
  )
}
