package graft.tools

import org.apache.spark.sql.functions._

/** Dev measurement: 2-D file-skipping — unsorted vs sortBy(l_orderkey) vs
  * zorderBy(l_orderkey, l_partkey) layouts of lineitem at sf0.1, probed with
  * a selective band predicate on EACH axis separately and on both at once.
  * Evidence for NOTES.md: sortBy prunes one axis; z-order prunes both. */
object ZOrderStats {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = graft.Tables.load(spark, sfDir, "lineitem")
    val store = new graft.store.TableStore(spark, graft.util.Scratch.dir("zstats"))
    store.commitSnapshot(li.repartition(32))
    val Array(b) = store.readSnapshot()
      .agg(min("l_orderkey"), max("l_orderkey"), min("l_partkey"), max("l_partkey"))
      .collect()
    def band(lo: Long, hi: Long) = (lo + (hi - lo) / 2, lo + (hi - lo) / 2 + (hi - lo) / 20)
    val (oLo, oHi) = band(b.getLong(0), b.getLong(1))
    val (pLo, pHi) = band(b.getLong(2), b.getLong(3))
    val preds = Seq(
      "orderkey band" -> col("l_orderkey").between(oLo, oHi),
      "partkey band " -> col("l_partkey").between(pLo, pHi),
      "both bands   " -> (col("l_orderkey").between(oLo, oHi) &&
        col("l_partkey").between(pLo, pHi)))

    def probe(layout: String): Unit = preds.foreach { case (name, p) =>
      def fresh = store.readSnapshot().filter(p)
      (1 to 2).foreach(_ => graft.util.PlanScans.filesScanned(fresh))
      val t0 = System.nanoTime()
      val rows = fresh.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val files = graft.util.PlanScans.filesScanned(fresh)
      println(f"[zorder] $layout  $name : $files%2d/32 files, $sec%.3f s, $rows rows")
    }

    probe("unsorted")
    store.compact(targetFiles = 32, sortBy = Seq("l_orderkey"))
    probe("sortBy  ")
    store.compact(targetFiles = 32, zorderBy = Seq("l_orderkey", "l_partkey"))
    probe("zorder  ")
    spark.stop()
  }
}
