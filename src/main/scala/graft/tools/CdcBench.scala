package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.etl.CdcApply
import graft.store.TableStore
import graft.streaming.StreamingOps

/** Dev-only: write volume + latency of the partition-targeted incremental
  * CDC commit vs the old full-snapshot rewrite, on the orders fixture —
  * evidence for the NOTES.md scale log (VERDICT r3 #1). */
object CdcBench {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val numBuckets = if (args.length > 1) args(1).toInt else 64
    val pctKeys = if (args.length > 2) args(2).toInt else 100 // ~1/pctKeys of keys
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val orders = graft.Tables.load(spark, d, "orders")
    val k = col("o_orderkey")
    // a small change batch: MODIFY ~1/pctKeys of the keys
    def changes = orders.filter(k % pctKeys === 0).select(
      CdcApply.changeCols(lit(CdcApply.OpModify), lit(1L),
        Seq(k, col("o_custkey"), lit("U").as("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))): _*)

    def dirBytes(store: TableStore, version: Long): Long = {
      val m = store.manifest(version)
      val fs = new Path(store.root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      store.filesOf(m).filter(_.contains(s"snap-$version-"))
        .map(f => fs.getFileStatus(new Path(f)).getLen).sum
    }
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // old path: full-snapshot rewrite per batch
    val full = new TableStore(spark, graft.util.Scratch.dir("cdc_full"))
    full.commitSnapshot(orders)
    val (_, tFull) = time {
      full.commitSnapshot(CdcApply(full.readSnapshot(), changes, Seq("o_orderkey")))
    }
    val fullBytes = dirBytes(full, 1)

    // new path: bucketed base + partition-targeted incremental commit
    val inc = new TableStore(spark, graft.util.Scratch.dir("cdc_inc"))
    inc.commitBucketed(orders, Seq("o_orderkey"), numBuckets)
    val (_, tInc) = time {
      StreamingOps.applyCdcBatch(changes, inc, Seq("o_orderkey"), numBuckets)
    }
    val incBytes = dirBytes(inc, 1)
    val m1 = inc.manifest(1)
    val inherited = inc.filesOf(m1).count(!_.contains("snap-1-"))

    val nChanges = changes.count()
    val nRows = orders.count()
    println(f"rows=$nRows changes=$nChanges buckets=$numBuckets")
    println(f"full_rewrite:  ${tFull}%.2f s, ${fullBytes / 1e6}%.1f MB written")
    println(f"incremental:   ${tInc}%.2f s, ${incBytes / 1e6}%.1f MB written, " +
      f"$inherited files inherited / ${m1.nFiles} total")
    println(f"write_amplification_cut=${fullBytes.toDouble / incBytes}%.1fx " +
      f"speedup=${tFull / tInc}%.2fx")
    spark.stop()
  }
}
