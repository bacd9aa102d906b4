package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: candidate-pair counts for the dedup family at a given SF —
  * evidence that blocking stays near-linear (NOTES.md scale log). */
object CandCount {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = graft.Tables.load(spark, d, "documents")
    val n = if (args.length > 1) args(1).toInt else 3
    val threshold = if (args.length > 2) args(2).toDouble else 0.5
    val prepped = docs.select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        it.map { case (id, lang, text) =>
          (id, lang, graft.functions.TextKernels.shingleHashes(
            graft.functions.TextKernels.tokenize(text), n))
        }
      }
      .toDF("doc_id", "lang", "grams")
      .persist()

    // round-1 blocking: (lang, token-count/32 bucket) self-join
    val bucketed = prepped.withColumn("bucket", (size(col("grams")) / 32).cast("int"))
    val oldCand = bucketed.as("x").join(bucketed.as("y"),
      col("x.lang") === col("y.lang") && col("x.bucket") === col("y.bucket") &&
        col("x.doc_id") < col("y.doc_id")).count()

    // round-2 prefix filter (mirrors LlmDedup.ngramJaccardPairs)
    val exploded = prepped.select(col("doc_id"), col("lang"),
      size(col("grams")).as("n_grams"), explode(col("grams")).as("gram"))
    val dfreq = exploded.groupBy("gram").agg(count(lit(1)).as("df"))
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df").asc, col("gram").asc)
    val prefix = exploded.join(dfreq, "gram")
      .withColumn("_rn", row_number().over(rankW))
      .filter(col("_rn") <=
        col("n_grams") - ceil(lit(threshold) * col("n_grams")).cast("int") + 1)
      .select(col("doc_id"), col("lang"), col("gram"),
        col("n_grams"), col("_rn").as("pos"))
    val alpha = ceil(lit(threshold / (1 + threshold)) *
      (col("x.n_grams") + col("y.n_grams")))
    val newCand = prefix.as("x").join(prefix.as("y"),
        col("x.gram") === col("y.gram") && col("x.lang") === col("y.lang") &&
          col("x.doc_id") < col("y.doc_id") &&
          col("x.n_grams") >= lit(threshold) * col("y.n_grams") &&
          col("y.n_grams") >= lit(threshold) * col("x.n_grams") &&
          least(col("x.n_grams") - col("x.pos"), col("y.n_grams") - col("y.pos"))
            + 1 >= alpha)
      .select(col("x.doc_id"), col("y.doc_id")).distinct().count()

    val verified = graft.ops.LlmDedup.ngramJaccardPairs(docs, n, threshold).count()
    println(s"CANDCOUNT sf=$d docs=${docs.count()} oldBlockPairs=$oldCand " +
      s"prefixCandPairs=$newCand verifiedPairs=$verified")
    spark.stop()
  }
}
