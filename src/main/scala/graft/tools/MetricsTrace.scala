package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.{MaterializedAgg, SecondaryIndex, TableStore}

/** Live CDC lag trace through the `$metrics` meta table (VERDICT r12 next
  * #5 "done" evidence): a keyed table under a CDC feed with an aggregate
  * view + GSI riding the maintenance cadence; after every batch the trace
  * prints each derivative's lag in commits and wall ms AS THE `$metrics`
  * TABLE REPORTS IT — the numbers a fleet dashboard would poll. Run:
  *   sbt "runMain graft.tools.MetricsTrace"
  */
object MetricsTrace {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val wh = graft.util.Scratch.dir("metrics_trace")
    spark.conf.set("spark.sql.catalog.mt_cat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mt_cat.warehouse", wh)
    val store = new TableStore(spark, s"$wh/feed")
    store.commitBucketed((1L to 50000L).map(k => (k, k % 100, k * 2))
      .toDF("id", "grp", "amt"), Seq("id"), 16)
    MaterializedAgg.create(store, "by_grp", Seq("grp"),
      sumCols = Seq("amt"), numBuckets = 4)
    SecondaryIndex.create(store, "by_grp_idx", Seq("grp"), numBuckets = 4)

    def trace(tag: String): Unit = {
      val rows = spark.sql(
        "SELECT kind, name, watermark_version, lag_commits, lag_ms " +
          "FROM mt_cat.`feed$metrics` WHERE kind <> 'commit' " +
          "ORDER BY kind, name").collect()
      val head = spark.sql(
        "SELECT MAX(version), MAX(committed_at_ms) FROM " +
          "mt_cat.`feed$metrics` WHERE kind = 'commit'").head()
      println(s"[trace] $tag  head=v${head.getLong(0)}  " + rows.map(r =>
        s"${r.getString(0)}/${r.getString(1)}: wm=v${r.getLong(2)} " +
          s"lag=${r.getLong(3)}c/${r.getLong(4)}ms").mkString("  "))
    }

    trace("bootstrap")
    val cadence = graft.streaming.StreamingOps.CdcMaintenance(
      everyNCommits = 2, keepSnapshots = 10)
    var n = 0
    (1 to 6).foreach { i =>
      Thread.sleep(400) // a visible commit interval for the cadence trace
      val batch = ((i * 100000L) to (i * 100000L + 499))
        .map(k => (k, k % 100, k)).toDF("id", "grp", "amt")
        .withColumn("op", lit("PUT"))
      store.upsertEq(batch)
      n += 1
      trace(s"batch $i committed")
      if (n % 2 == 0) {
        graft.streaming.StreamingOps.maintain(store, cadence)
        trace(s"batch $i + cadence pass")
      }
    }
    spark.stop()
  }
}
