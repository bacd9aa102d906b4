package graft.tools

import org.apache.spark.sql.SparkSession

import graft.store.TableStore

/** Measures what storage-partitioned joins buy: the same co-bucketed
  * orders⋈lineitem join timed with `spark.sql.sources.v2.bucketing.enabled`
  * on (zero exchanges) vs off (both sides shuffled). Results go to NOTES.md.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.SpjStats"
  */
object SpjStats {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val wh = graft.util.Scratch.dir("spj_stats")
    val nb = args.headOption.map(_.toInt).getOrElse(32)

    spark.conf.set("spark.sql.catalog.spjstats",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjstats.warehouse", wh)
    // SPJ_COPIES=k replicates the fact tables key-shifted (HeavyProbe's
    // construction) so the shuffle the stock plan pays is k× bigger
    val copies = sys.env.get("SPJ_COPIES").map(_.toInt).getOrElse(1)
    val K = 10000000L
    def scaled(name: String, keys: Seq[String]) = {
      val base = graft.Tables.load(spark, src, name)
      (0 until copies).map(i => keys.foldLeft(base)((df, k) =>
        df.withColumn(k, org.apache.spark.sql.functions.col(k) +
          org.apache.spark.sql.functions.lit(i * K))))
        .reduce(_ unionAll _)
    }
    new TableStore(spark, s"$wh/a/ob").commitBucketed(
      scaled("orders", Seq("o_orderkey")), Seq("o_orderkey"), nb)
    new TableStore(spark, s"$wh/a/lb").commitBucketed(
      scaled("lineitem", Seq("l_orderkey")), Seq("l_orderkey"), nb)
    println(s"[spj] built $nb-bucket tables from $src x$copies")

    val q =
      """SELECT l.l_returnflag, COUNT(*) AS n,
        |  SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS qty
        |FROM spjstats.a.ob o JOIN spjstats.a.lb l
        |ON o.o_orderkey = l.l_orderkey
        |GROUP BY l.l_returnflag""".stripMargin

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    Seq("true", "false", "true", "false").foreach { on =>
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", on)
      val t0 = System.nanoTime()
      val rows = spark.sql(q).collect().length
      val t = (System.nanoTime() - t0) / 1e9
      val label = if (on == "true") "spj  " else "stock"
      println(f"[spj] $label join+agg: $t%6.2f s ($rows groups)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
