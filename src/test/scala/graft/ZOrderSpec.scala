package graft

import org.apache.spark.sql.functions._
import graft.functions.ZOrderCode
import graft.store.TableStore
import graft.util.PlanScans.filesScanned

class ZOrderSpec extends SparkSuite {

  test("ZOrderCode interleaves bits (known values, codegen and interpreted)") {
    val s = spark
    import s.implicits._
    // (x=0b11, y=0b01, bits=2) -> bit layout y1 x1 y0 x0 = 0 1 1 1 = 7
    // (x=0b10, y=0b11, bits=2) -> 1 1 1 0 = 14
    val df = Seq((3L, 1L, 7L), (2L, 3L, 14L), (0L, 0L, 0L)).toDF("x", "y", "want")
    val z = ZOrderCode(Seq(col("x"), col("y")), bits = 2)
    // codegen path (default) and interpreted path must agree with the oracle
    assert(df.select(z.as("z"), col("want")).collect()
      .forall(r => r.getLong(0) == r.getLong(1)))
    val interpreted = df.select(z.as("z"), col("want"))
    interpreted.queryExecution.executedPlan // force planning
    s.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(df.select(z.as("z"), col("want")).collect()
      .forall(r => r.getLong(0) == r.getLong(1)))
    finally s.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("ZOrderCode: null child contributes zero bits, result never null") {
    val s = spark
    import s.implicits._
    val df = Seq((Some(3L), None: Option[Long]), (None: Option[Long], Some(1L)))
      .toDF("x", "y")
    val rows = df.select(ZOrderCode(Seq(col("x"), col("y")), 2).as("z")).collect()
    assert(!rows.exists(_.isNullAt(0)))
    assert(rows.map(_.getLong(0)).toSeq == Seq(5L, 2L)) // x-only bits / y-only bits
  }

  test("ZOrderCode preserves 2-D locality better than lexicographic sort") {
    // Walk the diagonal of a 256x256 grid: consecutive z-codes of nearby
    // points must stay nearby, which is the property that gives every
    // range-partitioned file a small rectangle.
    val pts = (0 until 256).map(i => (i.toLong, i.toLong))
    val s = spark
    import s.implicits._
    val codes = pts.toDF("x", "y")
      .select(col("x"), ZOrderCode(Seq(col("x"), col("y")), 8).as("z"))
      .orderBy("x").collect().map(_.getLong(1))
    // diagonal z-codes are monotone and the max step is bounded (no jump
    // across the whole curve), unlike x-major order where y resets each row
    assert(codes.sameElements(codes.sorted))
  }

  test("compact(zorderBy) prunes on BOTH columns; sortBy only on its leading one") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val store = new TableStore(spark, util.Scratch.dir("zspec"))
    store.commitSnapshot(li.repartition(16))
    val Array(b) = store.readSnapshot()
      .agg(min("l_orderkey"), max("l_orderkey"), min("l_partkey"), max("l_partkey"))
      .collect()
    val (oLo, oHi) = (b.getLong(0), b.getLong(0) + math.max(1L, (b.getLong(1) - b.getLong(0)) / 20))
    val (pLo, pHi) = (b.getLong(2), b.getLong(2) + math.max(1L, (b.getLong(3) - b.getLong(2)) / 20))
    val onOrder = col("l_orderkey").between(oLo, oHi)
    val onPart = col("l_partkey").between(pLo, pHi)

    store.compact(targetFiles = 16, sortBy = Seq("l_orderkey"))
    val sortedByOrder = filesScanned(store.readSnapshot().filter(onOrder))
    val sortedByPart = filesScanned(store.readSnapshot().filter(onPart))
    assert(sortedByOrder <= 2, s"sortBy(l_orderkey) should prune its own axis: $sortedByOrder")
    assert(sortedByPart >= 14,
      s"sortBy(l_orderkey) cannot prune l_partkey — got $sortedByPart/16, " +
        "if this starts passing the fixture stopped being a counterexample")

    store.compact(targetFiles = 16, zorderBy = Seq("l_orderkey", "l_partkey"))
    val zByOrder = filesScanned(store.readSnapshot().filter(onOrder))
    val zByPart = filesScanned(store.readSnapshot().filter(onPart))
    assert(zByOrder * 2 <= 16, s"z-order must prune l_orderkey: $zByOrder/16")
    assert(zByPart * 2 <= 16, s"z-order must prune l_partkey: $zByPart/16")

    // content preserved across both rewrites
    val got = store.readSnapshot().count()
    assert(got == li.count())
  }

  test("compact(zorderBy) rejects string columns and sortBy+zorderBy together") {
    val li = Tables.load(spark, sfDir, "lineitem").limit(100)
    val store = new TableStore(spark, util.Scratch.dir("zspec2"))
    store.commitSnapshot(li)
    intercept[IllegalArgumentException] {
      store.compact(zorderBy = Seq("l_returnflag"))
    }
    intercept[IllegalArgumentException] {
      store.compact(sortBy = Seq("l_orderkey"), zorderBy = Seq("l_partkey"))
    }
  }
}
