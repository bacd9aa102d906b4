package graft

import org.apache.spark.sql.DataFrame

import graft.catalog.{GraftCatalog, RuntimePruning}
import graft.store.TableStore

/** Join-driven runtime file pruning (DSv2 dynamic pruning, SPARK-35779):
  * a bucketed fact scan advertises its bucket keys, Spark plans an
  * IN-subquery over the selective dim side, and the scan re-plans over
  * `keyEqualityBuckets(IN set) ∩ stats` survivors before executing —
  * literal point-lookup pruning extended to star joins. */
class RuntimeFilterSpec extends SparkSuite {

  private lazy val wh = graft.util.Scratch.stable("rtf_wh")
  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.rtfcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rtfcat.warehouse", wh)
    "rtfcat"
  }

  private val nBuckets = 8

  private lazy val setup: Unit = {
    val fact = new TableStore(spark, s"$wh/a/fact")
    fact.commitBucketed(Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity"), Seq("l_orderkey"), nBuckets)
    // dim: a handful of orderkeys, one selective attribute
    val dim = new TableStore(spark, s"$wh/a/dim")
    import spark.implicits._
    val keys = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey").as[Long].take(40)
    dim.commitSnapshot(keys.zipWithIndex.toSeq
      .map { case (k, i) => (k, if (i < 3) "hot" else "cold") }
      .toDF("k", "tag"))
  }

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def starJoin(): DataFrame = spark.sql(
    s"""SELECT f.l_orderkey, f.l_quantity, d.tag
       |FROM $cat.a.fact f JOIN $cat.a.dim d ON f.l_orderkey = d.k
       |WHERE d.tag = 'hot'""".stripMargin)

  private def factFilesPlanned(): Int = {
    import scala.jdk.CollectionConverters._
    RuntimePruning.lastPlannedFiles.entrySet().asScala
      .filter(_.getKey.startsWith(s"$cat.a.fact@"))
      .map(_.getValue.intValue()).headOption.getOrElse(-1)
  }

  // force the DPP benefit heuristic: tiny test tables otherwise make the
  // planner decline what a 100 TB fact table would obviously accept
  private val dppOn = Seq(
    "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true",
    "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
    "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10.0")

  test("star join runtime-prunes the bucketed fact scan to the dim keys' buckets") {
    setup
    var expect: Seq[(Long, Double, String)] = null
    withConfs(dppOn :+
      ("spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "false"): _*) {
      val df = starJoin()
      import spark.implicits._
      expect = df.as[(Long, Double, String)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(expect.nonEmpty)
      assert(factFilesPlanned() == nBuckets,
        s"DPP off: full fact scan expected, planned ${factFilesPlanned()}")
    }
    withConfs(dppOn: _*) {
      val df = starJoin()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning") || plan.contains("RuntimeFilters"),
        s"expected a runtime filter on the fact scan:\n$plan")
      import spark.implicits._
      val got = df.as[(Long, Double, String)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(got == expect)
      val planned = factFilesPlanned()
      // 3 hot keys hash into at most 3 of the 8 buckets
      assert(planned >= 1 && planned <= 3,
        s"runtime prune should plan <= 3 of $nBuckets bucket files, planned $planned")
    }
  }

  test("runtime pruning composes with storage-partitioned joins (key-grouped scan)") {
    setup
    withConfs(dppOn ++ Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true"): _*) {
      val df = starJoin()
      import spark.implicits._
      val got = df.as[(Long, Double, String)].collect().sortBy(r => (r._1, r._2))
      assert(got.nonEmpty)
      val planned = factFilesPlanned()
      assert(planned >= 1 && planned <= 3,
        s"keygrouped runtime prune planned $planned of $nBuckets")
    }
  }

  test("wrapped bucketed scans still report size stats: small dim auto-broadcasts") {
    setup
    // both wraps engaged (SPJ conf on + runtime-prunable): the scan must
    // still forward the parquet scan's size estimate — losing it re-prices
    // the dim at defaultSizeInBytes and the join falls back to shuffle
    withConfs("spark.sql.sources.v2.bucketing.enabled" -> "true") {
      val dimB = new TableStore(spark, s"$wh/a/dimb")
      if (dimB.currentVersion() < 0) {
        import spark.implicits._
        dimB.commitBucketed(
          (1L to 100L).map(k => (k, s"t$k")).toDF("k", "tag"), Seq("k"), 4)
      }
      spark.catalog.refreshTable(s"$cat.a.dimb")
      val df = spark.sql(
        s"""SELECT f.l_orderkey, d.tag FROM $cat.a.fact f
           |JOIN $cat.a.dimb d ON f.l_orderkey = d.k""".stripMargin)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"small bucketed dim should broadcast:\n$plan")
      assert(df.count() > 0)
    }
  }

  test("an oversized runtime IN set leaves the scan unpruned (guard, not a failure)") {
    setup
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In, Literal}
    import org.apache.spark.sql.types.LongType
    val a = AttributeReference("l_orderkey", LongType)()
    val big = In(a, (1 to (RuntimePruning.MaxRuntimeInValues + 1))
      .map(i => Literal(i.toLong)))
    assert(RuntimePruning.inValueCount(big) > RuntimePruning.MaxRuntimeInValues)
    // the guard path: filter() with an oversized set must not replan
    val smallAndBig = RuntimePruning.inValueCount(
      org.apache.spark.sql.catalyst.expressions.And(big, Literal.TrueLiteral))
    assert(smallAndBig == RuntimePruning.MaxRuntimeInValues + 2)
  }
}
