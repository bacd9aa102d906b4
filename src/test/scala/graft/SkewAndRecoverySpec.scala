package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps
import graft.util.SkewJoin

/** Cluster-robustness pieces: salted joins for hot keys, and streaming CDC
  * recovery across restarts from the same checkpoint. */
class SkewAndRecoverySpec extends SparkSuite {
  import spark.implicits._

  test("salted join equals the plain join on a skewed key distribution") {
    // 10k rows where one key owns 50% — the classic hot-partition shape
    val large = spark.range(10000)
      .select((when(col("id") % 2 === 0, 1L).otherwise(col("id") % 50)).as("k"),
        col("id").as("payload"))
    val small = (0L until 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = large.join(small, Seq("k"))
    val salted = SkewJoin.saltedInnerJoin(large, small, Seq("k"), salt = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("streaming CDC recovers from checkpoint: second run applies only new files") {
    // file source: offsets are replayable across restarts (MemoryStream's
    // are not), so this exercises real recovery semantics
    val store = new graft.store.TableStore(spark,
      Files.createTempDirectory("graft_cdc_recovery").toString)
    store.commitSnapshot(Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v"))
    val checkpoint = Files.createTempDirectory("graft_cdc_recovery_ckpt").toString
    val changeDir = Files.createTempDirectory("graft_cdc_changes").toString
    val schema = "k LONG, s STRING, v DOUBLE, seq LONG, op STRING"
    def changeStream = spark.readStream.schema(schema).json(changeDir)

    // run 1: one change file
    Files.writeString(java.nio.file.Paths.get(changeDir, "b1.json"),
      """{"k":1,"s":"a2","v":11.0,"seq":1,"op":"MODIFY"}""")
    val q1 = StreamingOps.cdcApplyStream(changeStream, store, Seq("k"), checkpoint)
    q1.awaitTermination(); q1.stop()
    assert(store.currentVersion() == 1L)

    // run 2: fresh query, same checkpoint, one NEW file — only it applies
    Files.writeString(java.nio.file.Paths.get(changeDir, "b2.json"),
      """{"k":3,"s":"c","v":30.0,"seq":2,"op":"INSERT"}""")
    val q2 = StreamingOps.cdcApplyStream(changeStream, store, Seq("k"), checkpoint)
    q2.awaitTermination(); q2.stop()

    val rows = store.readSnapshot().as[(Long, String, Double)].collect().toSet
    assert(rows == Set((1L, "a2", 11.0), (2L, "b", 20.0), (3L, "c", 30.0)))
    // exactly one commit per applied batch: base + run1 + run2
    assert(store.currentVersion() == 2L)
  }
}
