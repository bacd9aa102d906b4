package graft

import graft.functions.{GraftFunctions, SortedIntersectCount}
import org.apache.spark.sql.functions._

/** Custom expression: Column API + SQL registration + codegen correctness. */
class GraftFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("sorted_intersect_count matches array_intersect size on sorted arrays") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 7L), Seq(3L, 5L, 9L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(2L, 4L), Seq(2L, 4L)),
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
    ).toDF("a", "b")
    val got = df.select(
      SortedIntersectCount(col("a"), col("b")).as("n"),
      size(array_intersect(col("a"), col("b"))).as("want"))
    assert(got.filter(col("n") =!= col("want")).count() == 0)
    assert(got.select("n").as[Int].collect().toSeq == Seq(2, 0, 2, 0))
  }

  test("registered for SQL: sorted_intersect_count callable from spark.sql") {
    GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 2L, 5L), array(2L, 5L, 9L))")
      .head().getInt(0)
    assert(n == 2)
  }

  test("type mismatch is a clear analysis error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception](spark.sql(
      "SELECT sorted_intersect_count(array('a'), array('b'))").collect())
    assert(e.getMessage.contains("array<bigint>"), e.getMessage)
  }
}
