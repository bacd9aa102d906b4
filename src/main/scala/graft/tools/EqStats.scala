package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement: equality-delete CDC vs positional (DV) CDC on a
  * SCATTERED batch — evidence for NOTES.md / SCALE.md that `upsertEq`
  * removes the base-read cost entirely.
  *
  * The fixture is the worst case for bucket pruning: batch keys stride
  * across every bucket, so the positional path's candidate scan touches
  * every bucket's files (a full-table pass at any scale), while the
  * equality path writes the key file + post-images and reads nothing.
  * Reports commit wall time, base records read during the commit
  * (SparkListener input metrics), bytes written, and the read tax under
  * each delete kind.
  */
object EqStats {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicate = sys.env.getOrElse("GRAFT_EQ_REPLICATE", "10").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    /** Input records read across all tasks while `f` runs. */
    def metered[T](f: => T): (T, Double, Long) = {
      val read = new java.util.concurrent.atomic.AtomicLong()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            read.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
      }
      spark.sparkContext.addSparkListener(l)
      val (r, t) = try { val x = timed(f); Thread.sleep(1500); x }
        finally spark.sparkContext.removeSparkListener(l)
      (r, t, read.get())
    }

    val o0 = graft.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("double").as("o_totalprice"))
    val maxKey = o0.agg(max("o_orderkey")).head().getLong(0) + 1
    val orders = (0 until replicate).map(i =>
      o0.withColumn("o_orderkey", col("o_orderkey") + lit(i * maxKey)))
      .reduce(_ union _)

    def freshTable(): graft.store.TableStore = {
      val st = new graft.store.TableStore(spark,
        graft.util.Scratch.dir("eqstats"))
      st.commitBucketed(orders, Seq("o_orderkey"), 64)
      st
    }
    // scattered update batch: ~0.2% of keys, hitting every bucket
    def batch(st: graft.store.TableStore) = {
      orders.filter(col("o_orderkey") % 500 === 1)
        .withColumn("o_totalprice", col("o_totalprice") + 1.0)
        .withColumn("op", lit("U"))
    }

    val mor = freshTable()
    val rows = mor.readSnapshot().count()
    val b1 = batch(mor).cache(); val nBatch = b1.count()
    val mv0 = mor.currentVersion()
    val (_, tMor, morRead) = metered(mor.upsertMor(b1))
    val m1 = mor.manifest(mor.currentVersion())
    val morBytes = m1.dvRefs.map(_.bytes).sum +
      m1.inlineFiles.filterNot(mor.manifest(mv0).inlineFiles.toSet)
        .map(f => m1.inlineStats(f).bytes).sum
    val (_, tMorRead) = timed(mor.readSnapshot().count())

    val eq = freshTable()
    val b2 = batch(eq).cache(); b2.count()
    val ev0 = eq.currentVersion()
    val (_, tEq, eqRead) = metered(eq.upsertEq(b2))
    val e1 = eq.manifest(eq.currentVersion())
    val eqBytes = e1.eqRefs.map(_.bytes).sum +
      e1.inlineFiles.filterNot(eq.manifest(ev0).inlineFiles.toSet)
        .map(f => e1.inlineStats(f).bytes).sum
    val (_, tEqRead) = timed(eq.readSnapshot().count())
    val (_, tPurge) = timed(eq.purgeDeletes())
    val (_, tClean) = timed(eq.readSnapshot().count())

    println(f"[eqstats] table: $rows%,d rows x 64 buckets; " +
      f"scattered batch: $nBatch%,d keys (every bucket touched)")
    println(f"[eqstats] positional upsertMor: $tMor%.2f s, " +
      f"$morRead%,d base+batch records read, $morBytes%,d bytes written")
    println(f"[eqstats] equality  upsertEq:  $tEq%.2f s, " +
      f"$eqRead%,d records read (${morRead / math.max(eqRead, 1)}x less), " +
      f"$eqBytes%,d bytes written")
    println(f"[eqstats] read tax: under DV $tMorRead%.2f s | " +
      f"under EQ $tEqRead%.2f s | purge $tPurge%.2f s | clean $tClean%.2f s")
    require(mor.readSnapshot().count() == eq.readSnapshot().count(),
      "positional and equality upserts diverged")
    spark.stop()
  }
}
