package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement (VERDICT r8 next #3 done-criteria): the AUTO-routed CDC
  * loop vs the fixed-mode loops over a MIXED batch sequence — alternating
  * scattered batches (keys striding every bucket: positional candidate
  * scans degrade to full-table passes) and bucket-local batches (a few
  * buckets: positional is cheap and buys the cheaper read tax). A fixed
  * mode pays the wrong cost on half the sequence; the router pays the
  * right cost on each batch. Reports per-loop wall time, base records
  * read during the commits, and the router's chosen routes.
  */
object AutoRouteStats {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicate = sys.env.getOrElse("GRAFT_EQ_REPLICATE", "10").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def meteredAll[T](f: => T): (T, Double, Long) = {
      val read = new java.util.concurrent.atomic.AtomicLong()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            read.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
      }
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      val r = try { val x = f; Thread.sleep(1500); x }
        finally spark.sparkContext.removeSparkListener(l)
      (r, (System.nanoTime() - t0) / 1e9, read.get())
    }

    val o0 = graft.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("double").as("o_totalprice"))
    val maxKey = o0.agg(max("o_orderkey")).head().getLong(0) + 1
    val orders = (0 until replicate).map(i =>
      o0.withColumn("o_orderkey", col("o_orderkey") + lit(i * maxKey)))
      .reduce(_ union _)
    val keys = Seq("o_orderkey")
    val nB = 64

    // batch i: even = SCATTERED (stride across all buckets), odd = LOCAL
    // (keys confined to one bucket)
    def mkBatch(i: Int): org.apache.spark.sql.DataFrame = {
      val base =
        if (i % 2 == 0) orders.filter(col("o_orderkey") % 500 === lit(i + 1))
        else orders
          .filter(graft.store.TableStore.bucketExpr(keys, nB) === lit(i % nB))
          .limit(3000)
      base.withColumn("o_totalprice", col("o_totalprice") + lit(i + 1.0))
        .withColumn("seq", lit(i.toLong))
        .withColumn("op", lit("MODIFY"))
    }
    val batches = (0 until 6).map(i => mkBatch(i).cache())
    batches.foreach(_.count()) // materialize outside the metered section

    def loop(label: String)(
        apply: (org.apache.spark.sql.DataFrame,
          graft.store.TableStore) => Unit): graft.store.TableStore = {
      val st = new graft.store.TableStore(spark,
        graft.util.Scratch.dir("autoroute"))
      st.commitBucketed(orders, keys, nB)
      val (_, wall, recs) = meteredAll { batches.foreach(b => apply(b, st)) }
      val routes = st.existingVersions()
        .flatMap(v => st.manifest(v).props.get("graft.cdc.route"))
      println(f"[autoroute] $label%-8s wall ${wall}%6.2f s  " +
        f"base+batch records read ${recs}%,12d  routes ${routes.mkString(",")}")
      st
    }

    val auto = loop("auto") { (b, st) =>
      graft.streaming.StreamingOps.applyCdcBatchAuto(b, st, keys, nB)
    }
    val fixedMor = loop("mor") { (b, st) =>
      graft.streaming.StreamingOps.applyCdcBatchMor(b, st, keys, nB)
    }
    val fixedEq = loop("eq") { (b, st) =>
      graft.streaming.StreamingOps.applyCdcBatchEq(b, st, keys, nB)
    }
    val fixedCow = loop("cow") { (b, st) =>
      graft.streaming.StreamingOps.applyCdcBatch(b, st, keys, nB)
    }
    // read tax after each loop (eq-heavy tables pay the keyed anti-join)
    Seq("auto" -> auto, "mor" -> fixedMor, "eq" -> fixedEq, "cow" -> fixedCow)
      .foreach { case (l, st) =>
        val t0 = System.nanoTime()
        val n = st.readSnapshot().count()
        println(f"[autoroute] $l%-8s post-loop count ${n}%,d in " +
          f"${(System.nanoTime() - t0) / 1e9}%5.2f s")
      }
    // parity across all four loops
    val sums = Seq(auto, fixedMor, fixedEq, fixedCow).map(st =>
      st.readSnapshot().agg(sum(col("o_totalprice"))).head().getDouble(0))
    // relative tolerance: double summation order differs per plan shape
    require(sums.forall(s => math.abs(s - sums.head) <= 1e-9 * sums.head.abs),
      s"loops diverged: $sums")
    println("[autoroute] content parity across auto/mor/eq/cow: OK")
    spark.stop()
  }
}
