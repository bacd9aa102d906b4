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

  test("LSH bucket as on-disk partition key: the ANN probe scan prunes partitions") {
    // sim_search_ivf's documented 100 TB path (LlmSim.scala): persist the
    // corpus partitioned by one band's sign-LSH bucket via TableStore, and a
    // probe restricted to its (multi-probe) buckets must hit the scan as
    // PARTITION filters — directory pruning, not data filters.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.VecKernels
    val pl = VecKernels.planes(8, 64) // one band x 8 hyperplanes -> 256 buckets
    val indexed = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .mapPartitions(it => it.map { case (id, v) =>
        (id, v, VecKernels.bandBuckets(v, pl, 1, 8)(0))
      })
      .toDF("vec_id", "embedding", "b0")
    val store = new graft.store.TableStore(spark, graft.util.Scratch.dir("lsh_index"))
    store.commitSnapshot(indexed, partitionBy = Seq("b0"))
    val probe = store.readSnapshot().filter(col("b0").isin(5L, 7L, 13L))
    val p = probe.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: ["), p)
    assert("PartitionFilters: \\[[^\\]]*b0".r.findFirstIn(p).nonEmpty,
      s"bucket predicate did not reach PartitionFilters:\n$p")
    // the bucket predicate must NOT degrade to a post-scan data filter
    assert("PushedFilters: \\[[^\\]]*b0".r.findFirstIn(p).isEmpty, p)
  }

  test("kmeans cell as on-disk partition key: the IVF probe scan prunes partitions") {
    // sim_search_ivf_kmeans' documented 100 TB path (LlmSim.scala): persist
    // the corpus partitioned by its k-means cell via TableStore; a probe
    // restricted to its nProbe cells must prune at the PARTITION level.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.VecKernels
    import graft.ops.LlmSim
    val unit = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) => (id, VecKernels.normalize(v)) })
    val cents = LlmSim.kmeansCentroids(unit, clusters = 8, iters = 2)
    val bc = spark.sparkContext.broadcast(cents)
    val indexed = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, v) =>
          (id, v, VecKernels.nearestCentroid(VecKernels.normalize(v), cs).toLong)
        }
      }.toDF("vec_id", "embedding", "cell")
    val store = new graft.store.TableStore(spark, graft.util.Scratch.dir("kmeans_index"))
    store.commitSnapshot(indexed, partitionBy = Seq("cell"))
    val probe = store.readSnapshot().filter(col("cell").isin(2L, 5L))
    val p = probe.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: ["), p)
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).nonEmpty,
      s"cell predicate did not reach PartitionFilters:\n$p")
    assert("PushedFilters: \\[[^\\]]*cell".r.findFirstIn(p).isEmpty, p)
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
