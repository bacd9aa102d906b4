package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: dissect the bucketed-commit write — source cost, shuffle
  * placement (bucket→task collisions), write cost under the stock
  * hash-partitioned exchange vs an injective bucket→partition routing. */
object CommitProf {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[commitprof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val n = 16
    val src = graft.Tables.load(spark, d, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      (col("l_orderkey") % 97).as("okb"),
      col("l_returnflag"), col("l_linestatus"),
      col("l_quantity").cast("decimal(18,2)").as("qty"),
      col("l_discount").cast("decimal(18,2)").as("disc"))
    val withBucket = src.withColumn(graft.store.TableStore.BucketCol,
      graft.store.TableStore.bucketExpr(
        Seq("l_orderkey", "l_linenumber"), n))
    (1 to 2).foreach { i =>
      time(s"source noop $i")(
        src.write.format("noop").mode("overwrite").save())
    }
    // collision profile of the stock exchange
    val hist = withBucket
      .repartition(n, col(graft.store.TableStore.BucketCol))
      .groupBy(spark_partition_id().as("p"))
      .agg(countDistinct(col(graft.store.TableStore.BucketCol)).as("nb"),
        count(lit(1)).as("rows"))
      .orderBy(col("p")).collect()
    println("[commitprof] stock partition -> (buckets, rows): " +
      hist.map(r => s"${r.getInt(0)}:(${r.getLong(1)},${r.getLong(2)})")
        .mkString(" "))
    (1 to 2).foreach { i =>
      time(s"stock write $i") {
        withBucket.repartition(n, col(graft.store.TableStore.BucketCol))
          .write.mode("overwrite").partitionBy(graft.store.TableStore.BucketCol)
          .parquet(s"/tmp/commitprof_stock")
      }
    }
    // injective slot keys: smallest longs whose murmur3 fills each slot
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
    val slots = new Array[Long](n)
    val seen = new Array[Boolean](n)
    var c = 0L; var filled = 0
    while (filled < n) {
      val h = Murmur3Hash(Seq(Literal(c)), 42).eval(null)
        .asInstanceOf[Int]
      val p = ((h % n) + n) % n
      if (!seen(p)) { seen(p) = true; slots(p) = c; filled += 1 }
      c += 1
    }
    val slotArr = array(slots.map(lit): _*)
    val routed = withBucket.withColumn("_gslot",
      element_at(slotArr,
        (col(graft.store.TableStore.BucketCol) + 1).cast("int")))
    val hist2 = routed.repartition(n, col("_gslot"))
      .groupBy(spark_partition_id().as("p"))
      .agg(countDistinct(col(graft.store.TableStore.BucketCol)).as("nb"),
        count(lit(1)).as("rows"))
      .orderBy(col("p")).collect()
    println("[commitprof] injective partition -> (buckets, rows): " +
      hist2.map(r => s"${r.getInt(0)}:(${r.getLong(1)},${r.getLong(2)})")
        .mkString(" "))
    (1 to 2).foreach { i =>
      time(s"injective write $i") {
        routed.repartition(n, col("_gslot")).drop("_gslot")
          .write.mode("overwrite").partitionBy(graft.store.TableStore.BucketCol)
          .parquet(s"/tmp/commitprof_inj")
      }
    }
    // wider stock exchange for comparison (more tasks, same collisions?)
    (1 to 2).foreach { i =>
      time(s"stock x4 write $i") {
        withBucket.repartition(4 * n, col(graft.store.TableStore.BucketCol))
          .write.mode("overwrite").partitionBy(graft.store.TableStore.BucketCol)
          .parquet(s"/tmp/commitprof_x4")
      }
    }
    spark.stop()
  }
}
