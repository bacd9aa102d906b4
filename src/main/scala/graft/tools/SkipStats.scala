package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement: file-skipping effectiveness at sf0.1 — commit lineitem
  * unsorted vs range-clustered on l_orderkey, then run a selective predicate
  * and report files scanned + wall time for each layout (evidence for
  * NOTES.md / SCALE.md). */
object SkipStats {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def filesScanned(q: org.apache.spark.sql.DataFrame): (Long, Double, Long) = {
      val t0 = System.nanoTime()
      val n = q.collect().length.toLong // same plan -> scan metrics populate
      val sec = (System.nanoTime() - t0) / 1e9
      (graft.util.PlanScans.fileScans(q.queryExecution.executedPlan)
        .map(_.metrics("numFiles").value).sum, sec, n)
    }

    val li = graft.Tables.load(spark, sfDir, "lineitem")
    val root = graft.util.Scratch.dir("skipstats")
    val store = new graft.store.TableStore(spark, root)
    store.commitSnapshot(li.repartition(32))
    val pred = col("l_orderkey").between(100000L, 101000L)
    (1 to 2).foreach(_ => filesScanned(store.readSnapshot().filter(pred)))
    val (f1, t1, n1) = filesScanned(store.readSnapshot().filter(pred))
    store.compact(targetFiles = 32, sortBy = Seq("l_orderkey"))
    (1 to 2).foreach(_ => filesScanned(store.readSnapshot().filter(pred)))
    val (f2, t2, n2) = filesScanned(store.readSnapshot().filter(pred))
    println(f"[skipstats] unsorted: $f1 files, $t1%.3f s, $n1 rows")
    println(f"[skipstats] sorted:   $f2 files, $t2%.3f s, $n2 rows")
    require(n1 == n2, "row counts diverged")
    spark.stop()
  }
}
