package graft.tools

import org.apache.spark.sql.functions._
import graft.store.TableStore

/** Debug probe for the star-rewrite composition (`sql_star_rewrite`). */
object StarProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.agg.rewrite.debug", "true")
    val s = spark
    val d = "/root/testdata/sf0.001"
    val wh = java.nio.file.Files.createTempDirectory("starprobe").toString
    spark.conf.set("spark.sql.catalog.sp_cat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.sp_cat.warehouse", wh)
    val cat = "sp_cat"
    val fact = new TableStore(s, s"$wh/analytics/li_sr")
    // deduped to one row per (l_orderkey, l_linenumber): the synthetic
    // corpus duplicates that pair and join views enforce the keyed-fact
    // contract since r11
    fact.commitBucketed(
      graft.Tables.load(s, d, "lineitem")
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(org.apache.spark.sql.functions.max(col("l_quantity"))
          .cast("decimal(18,2)").as("qty"))
        .withColumn("okb", col("l_orderkey") % 97)
        .select(col("l_orderkey"), col("l_linenumber"), col("okb"),
          col("qty")),
      keys = Seq("l_orderkey", "l_linenumber"), numBuckets = 16)
    val dim = new TableStore(s, s"$wh/analytics/ord_sr")
    dim.commitBucketed(
      graft.Tables.load(s, d, "orders").select(col("o_orderkey"),
        col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("o_totalprice")),
      keys = Seq("o_orderkey"), numBuckets = 16)
    s.sql(s"CALL $cat.system.create_join_view('analytics.li_sr', " +
      "'enr', 'analytics.ord_sr', 'l_orderkey', 'o_orderkey', " +
      "'o_orderstatus', 'inner')")
    s.sql(s"CALL $cat.system.create_agg_view('analytics.li_sr$$join_enr', " +
      "'by_ok', 'okb,o_orderstatus', 'qty', 8)")
    s.conf.set("spark.graft.delete.mode", "auto")
    try s.sql(s"DELETE FROM $cat.analytics.ord_sr WHERE o_orderkey % 15 = 4")
    finally s.conf.unset("spark.graft.delete.mode")
    s.catalog.refreshTable(s"$cat.analytics.ord_sr")
    s.sql(s"CALL $cat.system.refresh_join_view('analytics.li_sr', 'enr')")
    s.sql(s"CALL $cat.system.refresh_agg_view('analytics.li_sr$$join_enr', " +
      "'by_ok')")
    // scalastyle:off println
    val vs = graft.store.MaterializedJoin.viewStore(fact, "enr")
    println(s"== join view meta: " +
      graft.store.MaterializedJoin.viewMeta(fact, "enr"))
    println(s"== view store current: ${vs.currentVersion()}")
    println(s"== stacked agg metas: " +
      graft.store.MaterializedAgg.viewMetas(vs))
    val out = s.sql(
      s"""SELECT f.okb, d.o_orderstatus, COUNT(*) AS n,
         |  CAST(SUM(f.qty) AS DOUBLE) AS sum_qty
         |FROM $cat.analytics.li_sr f
         |JOIN $cat.analytics.ord_sr d ON f.l_orderkey = d.o_orderkey
         |GROUP BY f.okb, d.o_orderstatus""".stripMargin)
    println("== optimized plan ==")
    println(out.queryExecution.optimizedPlan)
    println("served join = " +
      graft.catalog.AggViewRewrite.served(out, "/join/"))
    println("served agg = " + graft.catalog.AggViewRewrite.served(out))
    // scalastyle:on println
  }
}
