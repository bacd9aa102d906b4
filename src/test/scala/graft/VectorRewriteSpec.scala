package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.{GraftCatalog, VectorTopKRewrite}
import graft.store.{AnnIndex, TableStore}

/** Transparent vector top-k rewrite
  * ([[graft.catalog.VectorTopKRewriteRule]], VERDICT r12 next #3): plain
  * SQL `ORDER BY round(graft_cosine(...), 6) DESC LIMIT k` over a graft
  * base table serves from a FRESH persisted ANN index; every soundness
  * gate declines to the brute-force scan, never breaks the query. */
class VectorRewriteSpec extends SparkSuite {
  import spark.implicits._

  private val dim = 8

  private lazy val warehouse = {
    val w = Files.createTempDirectory("graft_vecrw").toString
    spark.conf.set("spark.sql.catalog.vr_cat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.vr_cat.warehouse", w)
    w
  }

  private def corpus(n: Int) = (0L until n.toLong).map { id =>
    val v = new Array[Float](dim)
    v((id % 4).toInt) = 1.0f
    v(4 + (id % 3).toInt) = 0.01f * ((id % 7) + 1)
    (id, v)
  }.toDF("vec_id", "embedding")

  private def arrLit(v: Array[Float]): String =
    v.map(f => s"CAST($f AS FLOAT)").mkString("ARRAY(", ",", ")")

  private def topkSql(table: String, lit: String, extra: String = "",
      k: Int = 5): String =
    s"""SELECT vec_id, round(graft_cosine(embedding, $lit), 6) AS cos_sim
       |FROM $table $extra
       |ORDER BY cos_sim DESC, vec_id ASC
       |LIMIT $k""".stripMargin

  test("fresh index serves the SQL top-k; results identical to the brute " +
      "scan; stale index / filter / unrounded sort all decline correctly") {
    val store = new TableStore(spark, s"$warehouse/analytics/vecs")
    store.commitBucketed(corpus(240), Seq("vec_id"), 8)
    AnnIndex.create(store, "ann", "embedding", clusters = 8, iters = 3)
    graft.functions.GraftFunctions.register(spark)
    spark.catalog.refreshTable("vr_cat.analytics.vecs")
    val qv = new Array[Float](dim); qv(2) = 1f; qv(5) = 0.005f
    val lit = arrLit(qv)

    // rewrite fires: index-served plan, zero base-table relations
    val served = spark.sql(topkSql("vr_cat.analytics.vecs", lit))
    assert(VectorTopKRewrite.served(served),
      s"expected index serve:\n${served.queryExecution.optimizedPlan}")
    val servedRows = served.collect().map(r => (r.getLong(0), r.getDouble(1)))
    // ground truth: the same query with the rewrite disabled
    spark.conf.set("spark.graft.ann.rewrite", "false")
    val brute = try spark.sql(topkSql("vr_cat.analytics.vecs", lit))
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      finally spark.conf.unset("spark.graft.ann.rewrite")
    assert(servedRows.toSeq == brute.toSeq,
      s"default serve (nProbe=all) must be EXACT: $servedRows vs $brute")

    // a WHERE clause declines (index rows cannot re-apply the predicate)
    val filtered = spark.sql(
      topkSql("vr_cat.analytics.vecs", lit, extra = "WHERE vec_id > 10"))
    assert(!VectorTopKRewrite.served(filtered), "filter must decline")
    assert(filtered.collect().length == 5)

    // an UNROUNDED sort key declines (the index serves 6-dp scores)
    val raw = spark.sql(
      s"""SELECT vec_id, graft_cosine(embedding, $lit) AS c
         |FROM vr_cat.analytics.vecs ORDER BY c DESC LIMIT 5""".stripMargin)
    assert(!VectorTopKRewrite.served(raw), "unrounded sort must decline")

    // STALE index declines: new rows land, no refresh
    store.upsertEq(Seq((9000L, qv, "PUT")).toDF("vec_id", "embedding", "op"))
    spark.catalog.refreshTable("vr_cat.analytics.vecs")
    val stale = spark.sql(topkSql("vr_cat.analytics.vecs", lit))
    assert(!VectorTopKRewrite.served(stale), "stale index must decline")
    assert(stale.collect().head.getLong(0) == 9000L,
      "the brute fallback must see the new row the index missed")

    // refresh restores the serve, now including the new row
    AnnIndex.refresh(store, "ann")
    spark.catalog.refreshTable("vr_cat.analytics.vecs")
    val again = spark.sql(topkSql("vr_cat.analytics.vecs", lit))
    assert(VectorTopKRewrite.served(again), "refresh must restore the serve")
    assert(again.collect().head.getLong(0) == 9000L)
  }

  test("a subquery-shaped plan (stacked Projects, alias-of-alias) still " +
      "serves — the expansion runs to fixpoint") {
    val store = new TableStore(spark, s"$warehouse/analytics/vecs3")
    store.commitBucketed(corpus(160), Seq("vec_id"), 8)
    AnnIndex.create(store, "ann", "embedding", clusters = 8, iters = 2)
    graft.functions.GraftFunctions.register(spark)
    spark.catalog.refreshTable("vr_cat.analytics.vecs3")
    val qv = new Array[Float](dim); qv(3) = 1f
    val df = spark.sql(
      s"""SELECT id_out AS vec_id, score AS cos_sim FROM (
         |  SELECT vec_id AS id_out,
         |    round(graft_cosine(embedding, ${arrLit(qv)}), 6) AS score
         |  FROM vr_cat.analytics.vecs3)
         |ORDER BY cos_sim DESC, vec_id ASC LIMIT 5""".stripMargin)
    assert(VectorTopKRewrite.served(df),
      s"nested-select shape must serve:\n${df.queryExecution.optimizedPlan}")
    assert(df.collect().length == 5)
  }

  test("explicit nProbe trades recall: the probed serve reads fewer index " +
      "buckets and still returns k rows") {
    val store = new TableStore(spark, s"$warehouse/analytics/vecs2")
    store.commitBucketed(corpus(240), Seq("vec_id"), 8)
    AnnIndex.create(store, "ann", "embedding", clusters = 8, iters = 3)
    graft.functions.GraftFunctions.register(spark)
    spark.catalog.refreshTable("vr_cat.analytics.vecs2")
    val qv = new Array[Float](dim); qv(1) = 1f
    spark.conf.set("spark.graft.ann.sql.nProbe", "2")
    try {
      val df = spark.sql(topkSql("vr_cat.analytics.vecs2", arrLit(qv)))
      assert(VectorTopKRewrite.served(df))
      assert(df.collect().length == 5)
      val allIdx = graft.store.SecondaryIndex.indexStore(store, "ann")
        .readSnapshot().inputFiles.toSet
      assert(df.inputFiles.toSet.size < allIdx.size,
        "nProbe=2 of 8 cells must read a strict subset of index buckets")
    } finally spark.conf.unset("spark.graft.ann.sql.nProbe")
  }
}
