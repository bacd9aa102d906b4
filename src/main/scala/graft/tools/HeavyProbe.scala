package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf1-scale perf probe for the heaviest queries (VERDICT r6 #7): at sf0.1
  * every registered query runs ≈0.1 s and scheduler noise swamps real plan
  * regressions (r6's phantom 5x "slowdowns"). This dev tool synthesizes a
  * 10x corpus from sf0.1 — key-shifted replication so joins stay 1:1 and
  * fan-out scales linearly; dims copied as-is — and times the heavy set
  * with min-of-2 + cache isolation. Builder-side signal only, never a
  * correctness surface: the synthetic corpus has 10x duplicate texts and
  * vectors, which makes the dedup family's candidate generation HARDER
  * than organic data (every doc sits in an exact-duplicate group of 10),
  * a useful stress rather than a flaw. Results are logged to NOTES.md per
  * round for round-over-round comparison.
  *
  * Run: sbt "runMain graft.tools.HeavyProbe"
  */
object HeavyProbe {
  private val Heavy = Seq(
    "cdc_apply", "dedup_fuzzy_minhash", "dedup_minhash_sql",
    "dedup_ngram_jaccard", "dedup_embedding", "dedup_clusters",
    "join_multi_q3", "join_multi_q5", "join_multi_q10", "text_chunk",
    "pipeline_decontaminate", "sample_stratified")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = graft.util.Scratch.dir("sf1_probe")
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val K = 10000000L // beyond every sf0.1 key range

    def scaledCopy(name: String, keys: Seq[String]): Unit = {
      val base = graft.Tables.load(spark, src, name)
      (0 until copies)
        .map(i => keys.foldLeft(base)((df, k) =>
          df.withColumn(k, col(k) + lit(i * K))))
        .reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    val t0 = System.nanoTime()
    scaledCopy("orders", Seq("o_orderkey", "o_custkey"))
    scaledCopy("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    scaledCopy("customer", Seq("c_custkey"))
    scaledCopy("supplier", Seq("s_suppkey"))
    scaledCopy("part", Seq("p_partkey"))
    scaledCopy("documents", Seq("doc_id"))
    scaledCopy("embeddings", Seq("vec_id"))
    Seq("nation", "region").foreach(n =>
      graft.Tables.load(spark, src, n)
        .write.mode("overwrite").parquet(s"$out/$n.parquet"))
    println(f"[probe] built ${copies}x sf0.1 corpus in " +
      f"${(System.nanoTime() - t0) / 1e9}%.0f s at $out")

    spark.range(1000).selectExpr("sum(id)").collect() // warm
    Heavy.foreach { name =>
      val times = (1 to 2).map { _ =>
        val s0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, out).count()
        val t = (System.nanoTime() - s0) / 1e9
        spark.catalog.clearCache()
        (t, n)
      }
      println(f"[probe] $name%-22s ${times.map(_._1).min}%7.2f s " +
        f"(${times.head._2} rows)")
    }
    spark.stop()
  }
}
