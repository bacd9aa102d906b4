package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnosis probe (not part of the shipped engine): reproduces the
  * heavy bench's `jv_tail_refresh` shape — a join view whose span carries
  * one whole-bucket fact eq-rewrite plus point dim churn — and prints
  * every Spark job's wall time + call site during the refresh, so the
  * expensive stage is measured instead of guessed. */
object TailRefreshProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.graft.debug.phases", "true")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val out = graft.util.Scratch.dir("tail_probe")
    val K = 10000000L
    val base = graft.Tables.load(spark, src, "orders")
    val orders = (0 until copies).map(i =>
      Seq("o_orderkey", "o_custkey").foldLeft(base)((df, k) =>
        df.withColumn(k, col(k) + lit(i * K))))
      .reduce(_ unionAll _)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("double").as("o_totalprice"),
        col("o_orderstatus"))

    def t[A](label: String)(body: => A): A = {
      val s0 = System.nanoTime()
      val a = body
      System.err.println(
        f"[probe] $label%-28s ${(System.nanoTime() - s0) / 1e9}%7.2f s")
      a
    }

    val store = new graft.store.TableStore(spark, s"$out/fact")
    t("commit_fact") {
      store.commitBucketed(orders,
        keys = Seq("o_orderkey", "o_orderstatus"), numBuckets = 64)
    }
    val dim = new graft.store.TableStore(spark, s"$out/dim")
    t("commit_dim") {
      dim.commitBucketed(
        store.readSnapshot().select(col("o_custkey")).distinct()
          .withColumn("cust_tier", concat(lit("t"), col("o_custkey") % 5)),
        Seq("o_custkey"), 16)
    }
    t("jv_create") {
      graft.store.MaterializedJoin.create(store, "jv", dim,
        Seq("o_custkey"), Seq("o_custkey"), Seq("cust_tier"))
    }
    val bexpr = graft.store.TableStore.bucketExpr(
      Seq("o_orderkey", "o_orderstatus"), 64)
    t("fact_bucket_churn") {
      store.upsertEq(store.readSnapshot().filter(bexpr === 3)
        .withColumn("o_totalprice", col("o_totalprice") + 9.0)
        .withColumn("op", lit("PUT")))
    }
    t("dim_point_churn") {
      dim.upsertEq(dim.readSnapshot()
        .filter(col("o_custkey").isin(31L, 1031L, 2031L))
        .withColumn("cust_tier", lit("t_tail"))
        .withColumn("op", lit("PUT")))
    }

    // ---- per-job timing listener for the refresh -----------------------
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int,
      (Long, String)]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
          .replace("\n", " ").take(90)
        jobStarts.put(js.jobId, (System.nanoTime(), site))
        ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobStarts.get(je.jobId)).foreach { case (s0, site) =>
          System.err.println(f"[job] ${je.jobId}%4d " +
            f"${(System.nanoTime() - s0) / 1e9}%7.2f s  $site")
        }
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    t("jv_refresh_tail") {
      graft.store.MaterializedJoin.refresh(store, "jv")
    }
    spark.sparkContext.removeSparkListener(listener)
    spark.stop()
  }
}
