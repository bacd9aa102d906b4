package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement: incremental materialized-aggregate refresh vs a full
  * recompute — evidence for NOTES.md / SCALE.md that
  * [[graft.store.MaterializedAgg.refresh]] is O(changed groups), never a
  * base rescan.
  *
  * Fixture: a replicated-orders table (1.5M rows at sf0.1 × 10) bucketed
  * on the order key, with a (cgrp, status) SUM/COUNT view over it. One
  * CDC-shaped equality upsert touches a 0.1% slice of the keys in a few
  * groups; the probe reports, for incremental refresh vs view re-create:
  * wall time, base records read during the operation (SparkListener
  * input metrics), and the view read-back parity. At 100 TB the
  * recompute column is the one that stops being runnable.
  */
object AggStats {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicate = sys.env.getOrElse("GRAFT_AGG_REPLICATE", "10").toInt
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
      .select(col("o_orderkey"), (col("o_custkey") % 500).as("cgrp"),
        col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("o_totalprice"))
    val maxKey = o0.agg(max("o_orderkey")).head().getLong(0) + 1
    val orders = (0 until replicate).map(i =>
      o0.withColumn("o_orderkey", col("o_orderkey") + lit(i * maxKey)))
      .reduce(_ union _)

    val st = new graft.store.TableStore(spark, graft.util.Scratch.dir("aggstats"))
    val (_, tSeed) = timed(st.commitBucketed(orders, Seq("o_orderkey"), 64))
    val nRows = st.readSnapshot().count()
    println(f"seed: $nRows rows, $tSeed%.2f s")

    val (_, tCreate, rCreate) = metered(
      graft.store.MaterializedAgg.create(st, "v",
        Seq("cgrp", "o_orderstatus"), Seq("o_totalprice"), 16))
    println(f"create view: $tCreate%.2f s, $rCreate records read (the one O(base) pass)")

    // CDC-shaped change: 0.1% of keys, confined to a handful of groups
    val batch = st.readSnapshot().filter(col("o_orderkey") % 1000 === 7)
      .withColumn("o_totalprice",
        (col("o_totalprice") + lit(10)).cast("decimal(18,2)"))
      .withColumn("op", lit("PUT"))
    val (_, tUpsert) = timed(st.upsertEq(batch))
    println(f"upsertEq batch: $tUpsert%.2f s")

    val (_, tRefresh, rRefresh) = metered(
      graft.store.MaterializedAgg.refresh(st, "v"))
    println(f"incremental refresh: $tRefresh%.2f s, $rRefresh records read")

    // bucket-LOCAL batch: keys confined to 2 of 64 buckets — the eq-mask
    // bucket derivation prunes the changelog to those buckets' files
    val local = st.readSnapshot().filter(
      graft.store.TableStore.bucketExpr(Seq("o_orderkey"), 64).isin(5L, 6L)
        && col("o_orderkey") % 20 === 3)
      .withColumn("o_totalprice",
        (col("o_totalprice") + lit(1)).cast("decimal(18,2)"))
      .withColumn("op", lit("PUT"))
    val (_, tUps2) = timed(st.upsertEq(local))
    val (_, tRefresh2, rRefresh2) = metered(
      graft.store.MaterializedAgg.refresh(st, "v"))
    println(f"bucket-local upsert: $tUps2%.2f s; incremental refresh: " +
      f"$tRefresh2%.2f s, $rRefresh2 records read (2/64 buckets)")

    val (_, tRecompute, rRecompute) = metered {
      graft.store.MaterializedAgg.drop(st, "v2")
      graft.store.MaterializedAgg.create(st, "v2",
        Seq("cgrp", "o_orderstatus"), Seq("o_totalprice"), 16)
    }
    println(f"full recompute: $tRecompute%.2f s, $rRecompute records read")

    // parity: the incrementally-maintained view equals the recomputed one
    val a = graft.store.MaterializedAgg.read(st, "v")
      .collect().map(_.mkString("|")).sorted.toSeq
    val b = graft.store.MaterializedAgg.read(st, "v2")
      .collect().map(_.mkString("|")).sorted.toSeq
    println(s"parity: ${a == b} (${a.size} groups)")

    // ---- MIN/MAX hybrid: a scattered delete retracts many groups'
    // extrema → dirty-group rescan through the covering index (index
    // buckets only, never the base)
    val (_, tMmCreate) = timed(
      graft.store.MaterializedAgg.create(st, "mm",
        Seq("cgrp", "o_orderstatus"), Nil, 16,
        minMaxCols = Seq("o_totalprice")))
    println(f"minmax create (view + covering index): $tMmCreate%.2f s")
    val (_, tDel) = timed(st.deleteEq(
      st.readSnapshot().filter(col("o_orderkey") % 500 === 11)
        .select("o_orderkey")))
    val (_, tMmRefresh, rMmRefresh) = metered(
      graft.store.MaterializedAgg.refresh(st, "mm"))
    println(f"minmax refresh after scattered delete (deleteEq $tDel%.2f s): " +
      f"$tMmRefresh%.2f s, $rMmRefresh records read")
    val mmGot = graft.store.MaterializedAgg.read(st, "mm")
      .collect().map(_.mkString("|")).sorted.toSeq
    val mmWant = st.readSnapshot().groupBy("cgrp", "o_orderstatus")
      .agg(min("o_totalprice").as("min_o_totalprice"),
        max("o_totalprice").as("max_o_totalprice"),
        count(lit(1)).as("_cnt"))
      .select("cgrp", "o_orderstatus", "min_o_totalprice",
        "max_o_totalprice", "_cnt")
      .collect().map(_.mkString("|")).sorted.toSeq
    println(s"minmax parity: ${mmGot == mmWant} (${mmGot.size} groups)")
    spark.stop()
  }
}
