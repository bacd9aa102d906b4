package graft

import org.apache.spark.sql.functions._
import graft.store.{MaterializedAgg, MaterializedJoin, TableStore}

/** Maintenance commits vs derivative metadata (r14 — both found by the
  * soak the moment its cadence actually purged a derivative store):
  *  1. a purge/compact/rebucket on a derivative store must CARRY the
  *     store's defining props (`graft.join.*` etc. live in manifest
  *     props) — dropping them orphans the derivative and every later
  *     read dies on a missing key;
  *  2. the `content-preserving` marker those maintenance commits carry
  *     must NEVER inherit onto a DATA-CHANGING refresh commit — a span
  *     pricer seeing it would advance watermarks without replaying and
  *     silently drop the whole span's delta downstream. */
class MaintenancePropsSpec extends SparkSuite {
  import spark.implicits._

  test("agg refresh replays exactly across a purge commit in the span") {
    val root = java.nio.file.Files.createTempDirectory("graft_probe").toString
    val store = new TableStore(spark, s"$root/t")
    store.commitBucketed((1L to 200L).map(i => (i, i % 10, i * 10))
      .toDF("id", "g", "amt"), Seq("id"), 4)
    MaterializedAgg.create(store, "agg", Seq("g"), Seq("amt"), 2)
    store.upsertEq((1L to 20L).map(i => (i, i % 10, i * 10 + 1, "PUT"))
      .toDF("id", "g", "amt", "op"))
    store.purgeDeletes()
    store.upsertEq((21L to 40L).map(i => (i, i % 10, i * 10 + 2, "PUT"))
      .toDF("id", "g", "amt", "op"))
    MaterializedAgg.refresh(store, "agg")
    val got = MaterializedAgg.read(store, "agg")
      .select(col("g"), col("sum_amt")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = store.readSnapshot().groupBy("g")
      .agg(sum("amt").as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"diverged:\ngot  $got\nwant $want")
  }

  test("a VIEW-STORE purge keeps the view readable AND the stacked " +
      "aggregate exact across the next refresh (props carried, marker " +
      "not inherited)") {
    val root = java.nio.file.Files.createTempDirectory("graft_probe2").toString
    val fact = new TableStore(spark, s"$root/fact")
    val dim = new TableStore(spark, s"$root/dim")
    fact.commitBucketed((1L to 200L).map(i => (i, i % 20, i * 10))
      .toDF("id", "fk", "amt"), Seq("id"), 4)
    dim.commitBucketed((0L to 19L).map(k => (k, s"a${k % 5}"))
      .toDF("k", "attr"), Seq("k"), 4)
    MaterializedJoin.create(fact, "jv", dim, Seq("fk"), Seq("k"),
      Seq("attr"))
    val vs = MaterializedJoin.viewStore(fact, "jv")
    MaterializedAgg.create(vs, "by_attr", Seq("attr"), Seq("amt"), 2)
    // churn the fact so the next jv refresh carries a REAL delta, then
    // purge the VIEW STORE's masks (the derivative-hygiene shape) BEFORE
    // the refreshes — the purge commit is content-preserving and carries
    // the join props; the jv refresh after it must NOT inherit the marker
    fact.upsertEq((1L to 30L).map(i => (i, (i % 20 + 7) % 20, i * 10 + 5,
      "PUT")).toDF("id", "fk", "amt", "op"))
    vs.purgeDeletes()
    // the view survives the purge (defining props carried forward)
    assert(MaterializedJoin.status(fact).nonEmpty)
    MaterializedJoin.refresh(fact, "jv")
    MaterializedAgg.refresh(vs, "by_attr")
    val got = MaterializedAgg.read(vs, "by_attr")
      .select(col("attr"), col("sum_amt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = fact.readSnapshot().as("l")
      .join(dim.readSnapshot().as("r"), col("l.fk") === col("r.k"))
      .groupBy("attr").agg(sum("amt").as("s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want,
      s"stacked aggregate lost the span's delta:\ngot  $got\nwant $want")
  }
}
