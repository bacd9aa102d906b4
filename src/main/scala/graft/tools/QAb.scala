package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev A/B: time named SparkEntry queries with a conf flipped between
  * passes in the SAME JVM (warm caches both sides) — `QAb <conf> <q>...`
  * runs each query twice with conf=true then twice with conf=false,
  * interleaved per query to cancel box drift. */
object QAb {
  def main(args: Array[String]): Unit = {
    val conf = args.head
    val names = args.tail
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      // one warmup, then alternate on/off ×3 each
      try graft.SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable => println(s"$name warmup failed: $e") }
      spark.catalog.clearCache()
      val (on, off) = (collection.mutable.ArrayBuffer[Double](),
        collection.mutable.ArrayBuffer[Double]())
      (1 to 6).foreach { i =>
        val v = (i % 2 == 1)
        spark.conf.set(conf, v.toString)
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        (if (v) on else off) += t
        spark.catalog.clearCache()
      }
      spark.conf.unset(conf)
      println(f"$name ON=${on.map(x => f"$x%.2f").mkString(",")} " +
        f"OFF=${off.map(x => f"$x%.2f").mkString(",")} " +
        f"minON=${on.min}%.2f minOFF=${off.min}%.2f")
    }
    spark.stop()
  }
}
