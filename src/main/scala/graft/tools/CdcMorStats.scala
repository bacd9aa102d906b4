package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement: merge-on-read CDC loop vs copy-on-write CDC loop on a
  * replicated bucketed orders table (evidence for NOTES.md).
  *
  * Drives the SAME small change batch (a handful of MODIFY/REMOVE/INSERT
  * records) through [[graft.streaming.StreamingOps.applyCdcBatch]] (COW:
  * rewrites every touched bucket) and
  * [[graft.streaming.StreamingOps.applyCdcBatchMor]] (MOR: one DV+append
  * commit), reporting wall time and bytes written per batch — the
  * write-amplification gap a continuous trickle feed pays at scale. */
object CdcMorStats {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicate = sys.env.getOrElse("GRAFT_CDC_REPLICATE", "10").toInt
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
    def commitBytes(st: graft.store.TableStore): Long = {
      val v1 = st.currentVersion(); val m1 = st.manifest(v1)
      if (m1.parent < 0) return m1.totalBytes
      val m0 = st.manifest(m1.parent)
      val old = m0.inlineFiles.toSet
      m1.inlineFiles.filterNot(old).map(f => m1.inlineStats(f).bytes).sum +
        m1.dvRefs.filterNot(m0.dvRefs.toSet).map(_.bytes).sum
    }

    val o0 = graft.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
    val maxKey = o0.agg(max("o_orderkey")).head().getLong(0) + 1
    val orders = (0 until replicate).map(i =>
      o0.withColumn("o_orderkey", col("o_orderkey") + lit(i * maxKey)))
      .reduce(_ union _)
    val keys = Seq("o_orderkey")

    def seed(): graft.store.TableStore = {
      val st = new graft.store.TableStore(spark,
        graft.util.Scratch.dir("cdcmorstats"))
      st.commitBucketed(orders, keys, numBuckets = 32)
      st
    }
    def batch(i: Int) = {
      import spark.implicits._
      Seq(
        (maxKey / 2 + i, 1L, "U", 1.0 * i, i.toLong, "MODIFY"),
        (maxKey / 3 + i, 2L, "V", 2.0 * i, i.toLong, "MODIFY"),
        (maxKey / 4 + i, 0L, null.asInstanceOf[String], 0.0, i.toLong, "REMOVE"),
        (maxKey * 20 + i, 3L, "N", 3.0 * i, i.toLong, "INSERT"))
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "seq", "op")
    }

    val nRows = orders.count()
    println(s"[cdcmor] base rows = $nRows, buckets = 32")

    val cow = seed()
    var (cowSec, cowBytes) = (0.0, 0L)
    (1 to 3).foreach { i =>
      val (_, s) = timed(graft.streaming.StreamingOps.applyCdcBatch(
        batch(i), cow, keys, numBuckets = 32))
      cowSec += s; cowBytes += commitBytes(cow)
    }
    println(f"[cdcmor] COW loop: 3 batches, ${cowSec}%.2f s total, " +
      f"${cowBytes / 1024}%d KB written")

    val mor = seed()
    var (morSec, morBytes) = (0.0, 0L)
    (1 to 3).foreach { i =>
      val (_, s) = timed(graft.streaming.StreamingOps.applyCdcBatchMor(
        batch(i), mor, keys, numBuckets = 32))
      morSec += s; morBytes += commitBytes(mor)
    }
    println(f"[cdcmor] MOR loop: 3 batches, ${morSec}%.2f s total, " +
      f"${morBytes / 1024}%d KB written")
    println(f"[cdcmor] write-volume ratio COW/MOR = ${cowBytes.toDouble / morBytes}%.0f x")

    val (n1, tRead) = timed(mor.readSnapshot().count())
    println(f"[cdcmor] MOR read under ${mor.manifest(mor.currentVersion()).dvRefs.size} DV files: " +
      f"$n1 rows in ${tRead}%.2f s")
    val (_, tPurge) = timed(mor.purgeDeletes())
    val (n2, tRead2) = timed(mor.readSnapshot().count())
    println(f"[cdcmor] purge ${tPurge}%.2f s; post-purge read $n2 rows in ${tRead2}%.2f s")
    require(n1 == n2)
    spark.stop()
  }
}
