package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: dump formatted physical plans for scale-critical queries. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "agg_hash_sum", "join_asof", "cdc_apply", "join_inner_hash",
      "stream_tumbling_window", "sim_search_topk", "dedup_exact")
    names.foreach { n =>
      println(s"\n########## $n")
      graft.SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
