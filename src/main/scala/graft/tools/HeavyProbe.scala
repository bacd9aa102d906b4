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
    storageProbes(spark, out)
    spark.stop()
  }

  /** Round-8 storage-layer probes (VERDICT r7 #8): the MOR read tax, purge,
    * GSI refresh, and the SPJ fact-fact join, all at the 10x corpus — the
    * r7 machinery gets the same round-over-round trendline the dedup family
    * has. One-shot timings (each mutates table state, so min-of-2 would
    * time a different operation on the second pass). */
  private def storageProbes(spark: SparkSession, out: String): Unit = {
    def t[A](label: String)(body: => A): A = {
      val s0 = System.nanoTime()
      val a = body
      println(f"[probe] $label%-34s ${(System.nanoTime() - s0) / 1e9}%7.2f s")
      a
    }
    val store = new graft.store.TableStore(spark, s"$out/orders_probe_store")
    val orders = spark.read.parquet(s"$out/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("double").as("o_totalprice"),
        col("o_orderstatus"))
    t("commitBucketed 64-bucket orders") {
      store.commitBucketed(orders, keys = Seq("o_orderkey"), numBuckets = 64)
    }
    t("full count, byte-stock plan") { store.readSnapshot().count() }
    t("deleteMor 1% of keys (DV write)") {
      store.deleteMor(col("o_orderkey") % 100 === 0)
    }
    t("full count under DV mask (read tax)") { store.readSnapshot().count() }
    val upd = orders.filter(col("o_orderkey") % 200 === 1)
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
      .withColumn("op", lit("U"))
    t("upsertMor 0.5% update batch") { store.upsertMor(upd) }
    t("full count, 2 stacked DVs") { store.readSnapshot().count() }
    t("purgeDeletes") { store.purgeDeletes() }
    t("full count after purge") { store.readSnapshot().count() }
    t("GSI create on o_custkey") {
      graft.store.SecondaryIndex.create(store, "by_cust",
        Seq("o_custkey"), Seq("o_totalprice"), numBuckets = 16)
    }
    t("upsertMor 0.5% more updates") {
      store.upsertMor(upd.withColumn("o_totalprice",
        col("o_totalprice") + 2.0))
    }
    t("GSI incremental refresh") {
      graft.store.SecondaryIndex.refresh(store, "by_cust")
    }
    t("upsertEq 0.5% batch (zero base reads)") {
      store.upsertEq(upd.withColumn("o_totalprice",
        col("o_totalprice") + 3.0))
    }
    t("full count under eq mask") { store.readSnapshot().count() }
    t("SPJ fact-fact join (build+join)") {
      graft.SparkEntry.queries("sql_join_colocated")(spark, out).count()
    }
  }
}
