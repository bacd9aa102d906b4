package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.ops.LlmCommon._
import graft.ops.LlmDedup

/** Dev-only stage profiler for the dedup hot path (not part of the engine). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = load(spark, d, "documents")
    val sigs = time("minhash signatures")(
      { val s = LlmDedup.minhashSignatures(docs); s.count(); s })
    val prepped = docs.select(col("doc_id"), col("lang"),
      array_sort(transform(shingles(tokens(col("text")), 2), g => xxhash64(g))).as("grams"))
      .withColumn("bucket", (size(col("grams")) / 32).cast("int"))
    time("ngram prep")(prepped.count())
    val p2 = prepped.persist()
    val pairs = p2.as("x").join(p2.as("y"),
      col("x.lang") === col("y.lang") && col("x.bucket") === col("y.bucket") &&
        col("x.doc_id") < col("y.doc_id"))
    time("ngram pair count")(println("pairs=" + pairs.count()))
    time("ngram intersect over pairs")(println("kept=" + pairs.withColumn("i",
      graft.functions.SortedIntersectCount(col("x.grams"), col("y.grams")))
      .filter(col("i") > 20).count()))
    time("full minhashPairs")(println("mh pairs=" +
      LlmDedup.minhashPairs(docs, 0.5).count()))
    time("full ngram")(println("ng pairs=" +
      LlmDedup.ngramJaccardPairs(docs, 2, 0.3).count()))
    spark.stop()
  }
}
