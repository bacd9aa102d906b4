package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: verification-set volume with vs without the KMV cap
  * (LlmDedup.minhashSignatures maxSet), plus pair-set drift — evidence for
  * the NOTES.md scale log that capping bounds the verify-join shuffle
  * without changing detected pairs at fixture scale. */
object KmvStats {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cap = if (args.length > 1) args(1).toInt else 256
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = graft.Tables.load(spark, d, "documents")
    def vol(maxSet: Int): (Long, Long) = {
      val r = graft.ops.LlmDedup.minhashSignatures(docs, maxSet = maxSet)
        .agg(count(lit(1)), sum(size(col("sh_set")))).as[(Long, Long)].head()
      r
    }
    val (nDocs, full) = vol(Int.MaxValue)
    val (_, capped) = vol(cap)
    println(f"docs=$nDocs full_set_elems=$full capped($cap)_elems=$capped " +
      f"reduction=${100.0 * (full - capped) / full}%.1f%%")
    val fullPairs = graft.ops.LlmDedup.minhashPairs(docs, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val cappedPairs = graft.ops.LlmDedup.minhashPairs(docs, 0.5, maxSet = cap)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    println(s"pairs_full=${fullPairs.size} pairs_capped=${cappedPairs.size} " +
      s"identical=${fullPairs == cappedPairs}")
    spark.stop()
  }
}
