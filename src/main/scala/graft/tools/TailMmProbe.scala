package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused A/B instrument for the `sql_agg_tail_mm` "elevated" verdict
  * (r15 adjudicator; VERDICT r15 next #6): rebuilds EXACTLY the
  * BenchHeavy `agg_mm_*` fixture (10× sf0.1 lineitem, extrema-dirtying
  * churn) and times the `storedPlusTail` serving read N times — the read
  * is side-effect-free, so repeated timings separate code cost from
  * single-shot commit-sequence noise, which the one-shot heavy probe
  * cannot. Run from two checkouts on the same box for the A/B. Prints
  * one JSON line. */
object TailMmProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
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
    val out = graft.util.Scratch.dir("tailmm_probe")
    val K = 10000000L
    val base = graft.Tables.load(spark, src, "lineitem")
    (0 until 10)
      .map(i => Seq("l_orderkey", "l_partkey", "l_suppkey")
        .foldLeft(base)((df, k) => df.withColumn(k, col(k) + lit(i * K))))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    def t[A](label: String)(body: => A): A = {
      val s0 = System.nanoTime()
      val a = body
      val secs = (System.nanoTime() - s0) / 1e9
      timings(label) = math.rint(secs * 1000) / 1000
      System.err.println(f"[tailmm] $label%-24s $secs%7.2f s")
      a
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val mmStore = new graft.store.TableStore(spark, s"$out/li_mm_store")
    t("commit") {
      mmStore.commitBucketed(
        spark.read.parquet(s"$out/lineitem.parquet")
          .select(col("l_orderkey"), col("l_linenumber"),
            (col("l_orderkey") % 97).as("okb"),
            col("l_returnflag"),
            col("l_quantity").cast("decimal(18,2)").as("qty"),
            col("l_discount").cast("decimal(18,2)").as("disc")),
        keys = Seq("l_orderkey", "l_linenumber"), numBuckets = 16)
    }
    t("create") {
      graft.store.MaterializedAgg.create(mmStore, "by_flag_mm",
        Seq("okb", "l_returnflag"), Seq("qty"), numBuckets = 8,
        minMaxCols = Seq("disc"))
    }
    t("churn") {
      mmStore.deleteEq(
        mmStore.readSnapshot().filter(col("l_orderkey") % 10 === 4)
          .select(col("l_orderkey"), col("l_linenumber")))
      mmStore.commitAppend(mmStore.readSnapshot()
        .filter(col("l_orderkey") % 10 === 2)
        .withColumn("disc", lit("-1.50").cast("decimal(18,2)")))
    }
    (1 to reps).foreach { i =>
      t(s"read_$i") {
        graft.store.MaterializedAgg.storedPlusTail(mmStore,
          graft.store.MaterializedAgg.viewMeta(mmStore, "by_flag_mm").get,
          mmStore.currentVersion()).get.count()
      }
    }
    val reads = timings.filter(_._1.startsWith("read_")).values.toSeq
    println(s"""{"metric":"tailmm_read_median","value":${
      reads.sorted.apply(reads.size / 2)},"unit":"sec","timings":{${
      timings.map { case (k, v) => s""""$k":$v""" }.mkString(",")}}}""")
    spark.stop()
  }
}
