package graft.tools

import org.apache.spark.sql.functions._
import graft.store.{MaterializedAgg, TableStore}

/** Debug probe for the tail-union stale-serving path. */
object TailProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("tailprobe").toString
    spark.conf.set("spark.sql.catalog.tp_cat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.tp_cat.warehouse", wh)
    def rows(from: Long, to: Long) =
      (from to to).map { k =>
        val grp: Option[String] = if (k % 11 == 0) None else Some(s"g${k % 5}")
        val d: Option[BigDecimal] =
          if (k % 4 == 0) None else Some(BigDecimal(k).setScale(2) / 8)
        val v: Option[Long] = if (k % 7 == 0) None else Some(1000 - k)
        (k, grp, s"r${k % 3}", k * 2, d, v)
      }.toDF("id", "grp", "reg", "n", "d", "v")
        .withColumn("d", col("d").cast("decimal(18,2)"))
    val store = new TableStore(spark, s"$wh/analytics/tsales")
    store.commitBucketed(rows(1, 400), Seq("id"), 8)
    MaterializedAgg.create(store, "tg", Seq("grp", "reg"),
      sumCols = Seq("n", "d"), numBuckets = 4, distinctCols = Seq("v"))
    store.commitAppend(rows(401, 460))
    val b8 = TableStore.bucketExpr(Seq("id"), 8)
    store.deleteEq(store.readSnapshot()
      .filter(b8 === 3 && col("id") % 5 === 0).select("id"))
    // scalastyle:off println
    val m = store.manifest(store.currentVersion())
    val (a, r) = {
      val mm = classOf[TableStore].getDeclaredMethods
        .find(_.getName == "changelogFileDiff").get
      mm.setAccessible(true)
      mm.invoke(store, java.lang.Long.valueOf(0L),
        java.lang.Long.valueOf(m.version))
        .asInstanceOf[(Seq[String], Seq[String])]
    }
    println(s"== nFiles=${m.nFiles} added=${a.size} removed=${r.size} " +
      s"frac=${math.max(a.size, r.size).toDouble / m.nFiles}")
    println("== metas: " + MaterializedAgg.viewMetas(store))
    println("== tail frame:")
    try MaterializedAgg.storedPlusTail(store,
      MaterializedAgg.viewMeta(store, "tg").get, m.version)
      .foreach(_.show(5))
    catch { case e: Throwable => println(s"tail threw: $e") }
    spark.conf.set("spark.graft.agg.rewrite.tailUnion", "true")
    spark.conf.set("spark.graft.agg.rewrite.debug", "true")
    val out = spark.sql(
      """SELECT grp, SUM(n) AS sn, SUM(d) AS sd, COUNT(*) AS cnt,
        |  COUNT(DISTINCT v) AS dv
        |FROM tp_cat.analytics.tsales GROUP BY grp""".stripMargin)
    println("fired = " + graft.catalog.AggViewRewrite.served(out))
    println(out.queryExecution.optimizedPlan)
    // scalastyle:on println
  }
}
