package graft.tools

import org.apache.spark.sql.functions._
import graft.store.TableStore

/** Where does jv_create spend its ~40 s on the heavy corpus? Times each
  * stage of the single-pass create separately. */
object JvCreateProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = graft.util.Scratch.dir("jvprobe")
    val K = 10000000L
    val base = graft.Tables.load(spark, src, "orders")
    val orders = (0 until 10)
      .map(i => Seq("o_orderkey", "o_custkey").foldLeft(base)((df, k) =>
        df.withColumn(k, col(k) + lit(i * K))))
      .reduce(_ unionAll _)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("double").as("o_totalprice"),
        col("o_orderstatus"))
    def t[A](label: String)(body: => A): A = {
      val s0 = System.nanoTime()
      val a = body
      // scalastyle:off println
      println(f"[jvprobe] $label%-28s ${(System.nanoTime() - s0) / 1e9}%7.2f s")
      // scalastyle:on println
      a
    }
    val store = new TableStore(spark, s"$out/orders_store")
    t("commit_bucketed") {
      store.commitBucketed(orders, Seq("o_orderkey"), 64)
    }
    // replicate the mask state jv_create sees in BenchHeavy: composite
    // rebucket + a partial-key eq delete + two eq upserts
    t("rebucket_composite") {
      store.rebucket(64, Seq("o_orderkey", "o_orderstatus"))
    }
    t("delete_eq_prefix") {
      store.deleteEq(spark.range(1000)
        .select((col("id") * 997L % 1500000L).as("o_orderkey")))
    }
    val upd = orders.filter(col("o_orderkey") % 200 === 1)
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
      .withColumn("op", lit("U"))
    t("upsert_eq_a") { store.upsertEq(upd.limit(5000)) }
    t("upsert_eq_b") { store.upsertEq(upd.limit(5000)
      .withColumn("o_totalprice", col("o_totalprice") + 2.0)) }
    val dimStore = new TableStore(spark, s"$out/cust_dim_store")
    t("dim_commit") {
      dimStore.commitBucketed(
        store.readSnapshot().select(col("o_custkey")).distinct()
          .withColumn("cust_tier", concat(lit("t"), col("o_custkey") % 5)),
        Seq("o_custkey"), 16)
    }
    // ---- the create, staged ----
    val lv = store.currentVersion()
    val factDf = store.readSnapshot(lv).persist()
    t("fact_read_count") { factDf.count() }
    t("dup_check_dim") {
      dimStore.readSnapshot().groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n")).filter(col("n") > 1L).limit(1).count()
    }
    t("index_create_from_cache") {
      graft.store.SecondaryIndex.create(store, "probe-idx",
        Seq("o_custkey"),
        projection = Seq("o_totalprice", "o_orderstatus"),
        64, source = Some((factDf, lv)))
    }
    val vs = new TableStore(spark, s"$out/probe_view")
    t("join_and_commit") {
      val rr = dimStore.readSnapshot()
        .select(col("o_custkey").as("_rk"), col("cust_tier"))
      vs.commitBucketed(
        factDf.join(rr, col("o_custkey") === col("_rk"), "inner")
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice"), col("o_orderstatus"), col("cust_tier")),
        Seq("o_orderkey", "o_orderstatus"), 64)
    }
    factDf.unpersist()
    t("createMulti_end_to_end") {
      graft.store.MaterializedJoin.create(store, "probe_jv", dimStore,
        Seq("o_custkey"), Seq("o_custkey"), Seq("cust_tier"))
    }
    spark.stop()
  }
}
