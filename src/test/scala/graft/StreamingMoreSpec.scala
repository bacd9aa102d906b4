package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingOps

/** Remaining streaming twins: sliding windows and watermarked dedup; plus
  * the distributed sketch aggregators (for pre-exploded token streams). */
class StreamingMoreSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  case class Ev(ts: Timestamp, event_type: String, user_id: Long, value: Double)

  test("sliding window: one event lands in 4 overlapping windows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingOps.sliding(in.toDF())
      .writeStream.format("memory").queryName("slide_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(Ev(ts("2024-01-01 10:31:00"), "click", 1, 2.0))
      q.processAllAvailable()
      val starts = spark.sql("SELECT window_start FROM slide_out ORDER BY window_start")
        .as[Timestamp].collect().toSeq
      assert(starts == Seq(
        ts("2024-01-01 09:45:00"), ts("2024-01-01 10:00:00"),
        ts("2024-01-01 10:15:00"), ts("2024-01-01 10:30:00")))
    } finally q.stop()
  }

  test("streaming dedup keeps one row per (user, type, minute) key") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val withBucket = in.toDF()
      .withColumn("minute_bucket", date_trunc("minute", col("ts")))
    val q = StreamingOps.dedup(withBucket)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Ev(ts("2024-01-01 10:00:10"), "click", 1, 1.0),
        Ev(ts("2024-01-01 10:00:40"), "click", 1, 2.0), // same key -> dropped
        Ev(ts("2024-01-01 10:01:10"), "click", 1, 3.0)) // next minute -> kept
      q.processAllAvailable()
      assert(spark.sql("SELECT COUNT(*) FROM dedup_out").head().getLong(0) == 2)
    } finally q.stop()
  }

  test("transformWithState running aggregate matches mapGroupsWithState") {
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[StreamingOps.EventRow]
      val q = StreamingOps.statefulRunningTWS(in.toDS())
        .writeStream.format("memory").queryName("tws_out")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
      try {
        in.addData(StreamingOps.EventRow(1, 1, 10.0), StreamingOps.EventRow(2, 2, 7.0))
        q.processAllAvailable()
        in.addData(StreamingOps.EventRow(1, 3, 5.0))
        q.processAllAvailable()
        val last = spark.sql(
          "SELECT running_events, running_value FROM tws_out WHERE user_id = 1 " +
            "ORDER BY running_events DESC LIMIT 1")
          .as[(Long, Double)].collect()
        assert(last.toSeq == Seq((2L, 15.0)))
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("MinHashAgg/SimHashAgg (distributed variants) agree with the kernels") {
    import graft.functions.{SketchAggs, TextKernels}
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val toks = TextKernels.tokenize(text)
    // distributed: tokens pre-exploded (hash via the same kernel hash)
    val tokHashes = toks.map(TextKernels.hash64).toSeq.toDF("h")
    val sh = udaf(new SketchAggs.SimHashAgg)
    val got = tokHashes.agg(sh(col("h"))).head().getLong(0)
    assert(got == TextKernels.simhash64(toks))

    val shs = TextKernels.shingleHashes(toks, 3)
    val mh = udaf(new SketchAggs.MinHashAgg(16))
    val gotSig = shs.toSeq.toDF("h").agg(mh(col("h"))).head()
      .getSeq[Long](0).toArray
    val params = graft.ops.LlmCommon.hashParams(16)
    val wantSig = TextKernels.minhashSig(shs,
      params.map(_._1).toArray, params.map(_._2).toArray)
    assert(gotSig.toSeq == wantSig.toSeq)
  }
}
