package graft

/** Plan-shape assertions (SURVEY §5.2.1, mirroring the reference's
  * template-level jest assertions): the declarative artifact — here the
  * physical plan — must show the scale-critical properties: predicate
  * pushdown into parquet, broadcast joins for small dims, top-K without a
  * global sort, partial aggregation. */
class PlanShapeSpec extends SparkSuite {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("filter_pred pushes predicates into the parquet scan") {
    val p = plan("filter_pred")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
  }

  test("project_select prunes the scan to referenced columns only") {
    val p = plan("project_select")
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("l_shipdate"), "scan reads an unprojected column:\n" + p)
  }

  test("join_broadcast uses a broadcast hash join, no fact-side shuffle join") {
    val p = plan("join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("join_range_theta keeps the equi hash join with a band residual") {
    val p = plan("join_range_theta")
    assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sort_limit_topk plans TakeOrderedAndProject, not a global sort") {
    val p = plan("sort_limit_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("agg_hash_sum uses partial hash aggregation (map-side combine)") {
    val p = plan("agg_hash_sum")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial"), p)
  }

  private def shuffleCount(p: String): Int =
    "[+:]- Exchange ".r.findAllIn(p).length

  test("join_multi_q3 broadcasts the filtered dim and shuffles at most twice") {
    val p = plan("join_multi_q3")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // one shuffle for the aggregation; top-50 rides TakeOrderedAndProject
    assert(shuffleCount(p) <= 2, s"too many shuffles (${shuffleCount(p)}):\n$p")
  }

  test("join_multi_q5 broadcasts all small dims; only agg+sort shuffle") {
    val p = plan("join_multi_q5")
    // supplier/nation/region (and the tiny sides at this SF) broadcast —
    // no sort-merge join anywhere in the star
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(shuffleCount(p) <= 2, s"too many shuffles (${shuffleCount(p)}):\n$p")
  }

  test("join_asof plans a partial WindowGroupLimit before the exchange") {
    val p = plan("join_asof")
    // rank-limit pushdown: per-partition (partial) top-1 group limit runs
    // below the shuffle, the final one above — the row_number()=1 filter
    // never materializes whole groups across the wire
    val hits = "WindowGroupLimit".r.findAllIn(p).length
    assert(hits >= 2, s"expected partial+final WindowGroupLimit:\n$p")
    val firstWgl = p.indexOf("WindowGroupLimit")
    val lastWgl = p.lastIndexOf("WindowGroupLimit")
    val shuffleBetween = p.substring(firstWgl, lastWgl).contains("- Exchange ")
    assert(shuffleBetween, s"no exchange between partial and final group limit:\n$p")
  }

  test("flagship entry smoke: rows > 0 (driver t1)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared oracle key has a registered query") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
