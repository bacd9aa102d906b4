package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.CdcApply

/** LWW CDC merge semantics (SURVEY §7.5.3 "the bug farm"): idempotency,
  * REMOVE-then-INSERT, out-of-order arrival, duplicate delivery
  * (§5.2.3b property). */
class CdcApplySpec extends SparkSuite {
  import spark.implicits._

  private def base: DataFrame =
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "s", "v")

  private def changes(rows: (Long, String, Double, Long, String)*): DataFrame =
    rows.toDF("k", "s", "v", "seq", "op")

  private def result(df: DataFrame): Set[(Long, String, Double)] =
    df.as[(Long, String, Double)].collect().toSet

  test("MODIFY upserts, REMOVE tombstones, INSERT adds") {
    val ch = changes(
      (1L, "a2", 11.0, 1L, "MODIFY"),
      (2L, null, 0.0, 1L, "REMOVE"),
      (9L, "new", 90.0, 1L, "INSERT"))
    val out = result(CdcApply(base, ch, Seq("k")))
    assert(out == Set((1L, "a2", 11.0), (3L, "c", 30.0), (9L, "new", 90.0)))
  }

  test("same-key multi-update in one batch: highest sequence wins") {
    val ch = changes(
      (1L, "mid", 11.0, 5L, "MODIFY"),
      (1L, "last", 12.0, 9L, "MODIFY"),
      (1L, "early", 10.5, 1L, "MODIFY"))
    val out = result(CdcApply(base, ch, Seq("k")))
    assert(out.contains((1L, "last", 12.0)))
  }

  test("REMOVE-then-INSERT sequence resurrects the key with new payload") {
    val ch = changes(
      (2L, null, 0.0, 1L, "REMOVE"),
      (2L, "reborn", 21.0, 2L, "INSERT"))
    val out = result(CdcApply(base, ch, Seq("k")))
    assert(out.contains((2L, "reborn", 21.0)))
  }

  test("INSERT-then-REMOVE leaves the key deleted") {
    val ch = changes(
      (9L, "new", 90.0, 1L, "INSERT"),
      (9L, null, 0.0, 2L, "REMOVE"))
    val out = result(CdcApply(base, ch, Seq("k")))
    assert(!out.exists(_._1 == 9L))
  }

  test("idempotency: applying the same batch twice equals applying it once") {
    val ch = changes(
      (1L, "a2", 11.0, 1L, "MODIFY"),
      (2L, null, 0.0, 2L, "REMOVE"),
      (9L, "new", 90.0, 3L, "INSERT"))
    val once = CdcApply(base, ch, Seq("k"))
    val twice = CdcApply(once, ch, Seq("k"))
    assert(result(once) == result(twice))
  }

  test("duplicate delivery of identical records is harmless") {
    val ch = changes(
      (1L, "a2", 11.0, 1L, "MODIFY"),
      (1L, "a2", 11.0, 1L, "MODIFY"))
    val out = result(CdcApply(base, ch, Seq("k")))
    assert(out.contains((1L, "a2", 11.0)))
    assert(out.size == 3)
  }

  test("property: duplicate (key, seq) records pick a deterministic winner") {
    val rnd = new scala.util.Random(7)
    val ops = Array("INSERT", "MODIFY", "REMOVE")
    for (trial <- 0 until 10) {
      // legal in a replayed/merged stream: several records share (key, seq)
      val dup = (0 until 10).map { _ =>
        val v = rnd.nextInt(100)
        (1L + rnd.nextInt(3), s"s$v", v.toDouble, rnd.nextInt(3).toLong, ops(rnd.nextInt(3)))
      }
      // the winner must not depend on input order or partitioning
      val a = result(CdcApply(base, changes(dup: _*), Seq("k")))
      val b = result(CdcApply(base, changes(rnd.shuffle(dup): _*).repartition(7), Seq("k")))
      assert(a == b, s"trial $trial: $dup")
      // a REMOVE tied at the top sequence must win over a same-seq upsert
      val topSeqByKey = dup.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._4).max }
      topSeqByKey.foreach { case (k, top) =>
        if (dup.exists(r => r._1 == k && r._4 == top && r._5 == "REMOVE"))
          assert(!a.exists(_._1 == k), s"trial $trial: tombstone lost the tie for key $k")
      }
    }
  }

  test("schema evolution: new change attribute widens the table, base rows NULL-pad") {
    // the continuous-replication UpdateTable analog: a MODIFY introduces an
    // attribute the base has never seen
    val ch = Seq(
      (1L, "a2", 11.0, "web", 1L, "MODIFY"),
      (9L, "new", 90.0, "app", 1L, "INSERT"))
      .toDF("k", "s", "v", "chan", "seq", "op")
    val out = CdcApply(base, ch, Seq("k"))
    assert(out.columns.toSeq == Seq("k", "s", "v", "chan"))
    val rows = out.as[(Long, String, Double, Option[String])].collect().toSet
    assert(rows == Set(
      (1L, "a2", 11.0, Some("web")),
      (2L, "b", 20.0, None),
      (3L, "c", 30.0, None),
      (9L, "new", 90.0, Some("app"))))
  }

  test("schema evolution: base column absent from the change batch reads as NULL") {
    // schemaless source: an absent attribute on a full-image record is NULL
    val ch = Seq((1L, 11.0, 1L, "MODIFY")).toDF("k", "v", "seq", "op")
    val out = CdcApply(base, ch, Seq("k"))
    assert(out.columns.toSeq == Seq("k", "s", "v"))
    val rows = out.as[(Long, Option[String], Double)].collect().toSet
    assert(rows == Set((1L, None, 11.0), (2L, Some("b"), 20.0), (3L, Some("c"), 30.0)))
  }

  test("property: batch split points do not change the final table") {
    val rnd = new scala.util.Random(42)
    val ops = Array("INSERT", "MODIFY", "REMOVE")
    for (trial <- 0 until 10) {
      // random change stream with a global total order (sequence numbers)
      val seqd = (0 until 12).map { i =>
        val v = rnd.nextInt(1000)
        (rnd.nextInt(6).toLong + 1, s"s$v", v.toDouble, i.toLong, ops(rnd.nextInt(3)))
      }
      val oneShot = result(CdcApply(base, changes(seqd: _*), Seq("k")))
      // apply as two batches split mid-stream: must compose to the same table
      val (b1, b2) = seqd.splitAt(1 + rnd.nextInt(10))
      val stepped = result(
        CdcApply(CdcApply(base, changes(b1: _*), Seq("k")),
          changes(b2: _*), Seq("k")))
      assert(oneShot == stepped, s"trial $trial: $seqd")
    }
  }
}
