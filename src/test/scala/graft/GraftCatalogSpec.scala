package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.GraftCatalog
import graft.store.TableStore

/** V2 catalog over TableStore: three-part SQL names, pushdown through the
  * stock parquet path, time travel, DDL, read-only enforcement
  * (the reference's query surface, README.md:170-173). */
class GraftCatalogSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse = {
    val w = Files.createTempDirectory("graft_warehouse").toString
    spark.conf.set("spark.sql.catalog.spec_cat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spec_cat.warehouse", w)
    w
  }

  private def commitOrders(): Unit = {
    val store = new TableStore(spark, s"$warehouse/analytics/orders")
    if (store.currentVersion() < 0) {
      val o = Tables.load(spark, sfDir, "orders")
      store.commitSnapshot(o.filter(col("o_orderkey") < 100), Seq("o_orderstatus"))
      store.commitSnapshot(o, Seq("o_orderstatus"))
    }
  }

  test("ALTER TABLE evolves the schema through the catalog, versioned") {
    val store = new TableStore(spark, s"$warehouse/analytics/evolving")
    store.commitSnapshot(Seq((1L, 10L), (2L, 20L)).toDF("k", "cnt"))
    val vBefore = store.currentVersion()
    // add a column, then widen one — each commits a new snapshot version
    spark.sql("ALTER TABLE spec_cat.analytics.evolving ADD COLUMN note STRING")
    spark.sql("ALTER TABLE spec_cat.analytics.evolving ALTER COLUMN cnt TYPE DOUBLE")
    val out = spark.sql(
      "SELECT k, cnt, note FROM spec_cat.analytics.evolving ORDER BY k")
      .collect()
    assert(out.map(_.getDouble(1)).toSeq == Seq(10.0, 20.0))
    assert(out.forall(_.isNullAt(2)))
    // every generation stays queryable: GetTableVersions analog
    val history = store.schemaHistory()
    assert(history.map(_._1) == (0L to vBefore + 2).toSeq)
    assert(history.last._2.fieldNames.toSeq == Seq("k", "cnt", "note"))
    assert(spark.sql(
      s"SELECT * FROM spec_cat.analytics.evolving VERSION AS OF $vBefore")
      .schema.fieldNames.toSeq == Seq("k", "cnt"))
    // non-widening change is rejected (Spark's analyzer catches it before
    // the catalog; export-side mergeSchemas enforces the same rule)
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE spec_cat.analytics.evolving ALTER COLUMN note TYPE BIGINT"))
    assert(e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN") ||
      e.getMessage.contains("incompatible"), e.getMessage)
  }

  test("three-part SQL name resolves and aggregates correctly") {
    commitOrders()
    val n = spark.sql("SELECT COUNT(*) FROM spec_cat.analytics.orders").head().getLong(0)
    assert(n == Tables.load(spark, sfDir, "orders").count())
  }

  test("VERSION AS OF reads the older snapshot") {
    commitOrders()
    val n0 = spark.sql(
      "SELECT COUNT(*) FROM spec_cat.analytics.orders VERSION AS OF 0").head().getLong(0)
    assert(n0 == Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") < 100).count())
  }

  test("TIMESTAMP AS OF reads the snapshot current at that time") {
    commitOrders()
    val store = new graft.store.TableStore(spark, s"$warehouse/analytics/orders")
    val t0 = store.manifest(0).committedAtMs
    val n0 = spark.sql(
      s"SELECT COUNT(*) FROM spec_cat.analytics.orders TIMESTAMP AS OF " +
        s"'${new java.sql.Timestamp(t0)}'").head().getLong(0)
    assert(n0 == Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") < 100).count())
  }

  test("predicates push into the snapshot's parquet scan") {
    commitOrders()
    val df = spark.sql(
      "SELECT o_orderkey FROM spec_cat.analytics.orders WHERE o_orderkey = 7")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_orderkey"), plan)
    assert(df.count() == 1)
  }

  test("partition pruning: status filter scans only matching partitions") {
    commitOrders()
    val df = spark.sql(
      "SELECT COUNT(*) FROM spec_cat.analytics.orders WHERE o_orderstatus = 'F'")
    val expected = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderstatus") === "F").count()
    assert(df.head().getLong(0) == expected)
  }

  test("SQL DML is rejected: snapshots mutate only through the store") {
    commitOrders()
    val e = intercept[Exception](spark.sql(
      """INSERT INTO spec_cat.analytics.orders
        |SELECT * FROM spec_cat.analytics.orders LIMIT 1""".stripMargin))
    assert(e.getMessage.toLowerCase.contains("does not support") ||
      e.getMessage.toLowerCase.contains("unsupported") ||
      e.getMessage.toLowerCase.contains("append"),
      e.getMessage)
  }

  test("SHOW TABLES lists committed tables; DDL create/drop works") {
    commitOrders()
    val tables = spark.sql("SHOW TABLES IN spec_cat.analytics")
      .select("tableName").as[String].collect().toSet
    assert(tables.contains("orders"))
    spark.sql("CREATE TABLE spec_cat.analytics.fresh (k BIGINT, v STRING)")
    assert(spark.sql("SELECT COUNT(*) FROM spec_cat.analytics.fresh").head().getLong(0) == 0)
    spark.sql("DROP TABLE spec_cat.analytics.fresh")
    val after = spark.sql("SHOW TABLES IN spec_cat.analytics")
      .select("tableName").as[String].collect().toSet
    assert(!after.contains("fresh"))
  }
}
