package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-level timing for the round-2 slow queries. */
object Prof2 {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    // ---- scan_ddb_export_decimal stages
    import org.apache.spark.sql.types.DecimalType
    val orders = graft.Tables.load(spark, d, "orders")
    t("orders.count")(orders.count())
    val src = orders.select(
      col("o_orderkey"),
      concat(lpad(col("o_orderkey").cast("string"), 20, "9"),
        lit(".123456789012345678")).cast(DecimalType(38, 18)).as("big_dec"),
      lpad(col("o_orderkey").cast("string"), 19, "8")
        .cast(DecimalType(38, 0)).as("big_int"))
    val raw = src.select(graft.model.DdbAttr.encodeLine(src.schema).as("json"))
    t("encode.count")(raw.count())
    val inferred = t("inferSchema")(graft.model.DdbAttr.inferSchema(spark, raw))
    t("decode.count")(graft.model.DdbAttr.decode(raw, inferred).count())
    t("full query")(graft.SparkEntry.queries("scan_ddb_export_decimal")(spark, d).count())

    // ---- ngram jaccard stages
    import spark.implicits._
    val docs = graft.Tables.load(spark, d, "documents")
    val n = 3; val threshold = 0.5
    val prepped = docs.select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        it.map { case (id, lang, text) =>
          (id, lang, graft.functions.TextKernels.shingleHashes(
            graft.functions.TextKernels.tokenize(text), n))
        }
      }
      .toDF("doc_id", "lang", "grams").persist()
    t("prepped.count")(prepped.count())
    val exploded = prepped.select(col("doc_id"), col("lang"),
      size(col("grams")).as("n_grams"), explode(col("grams")).as("gram"))
    t("exploded.count")(exploded.count())
    val dfreq = exploded.groupBy("gram").agg(count(lit(1)).as("df"))
    t("dfreq.count")(dfreq.count())
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df").asc, col("gram").asc)
    val prefix = exploded.join(dfreq, "gram")
      .withColumn("_rn", row_number().over(rankW))
      .filter(col("_rn") <=
        col("n_grams") - ceil(lit(threshold) * col("n_grams")).cast("int") + 1)
      .select(col("doc_id"), col("lang"), col("gram"),
        col("n_grams"), col("_rn").as("pos")).persist()
    t("prefix.count")(prefix.count())
    val alpha = ceil(lit(threshold / (1 + threshold)) *
      (col("x.n_grams") + col("y.n_grams")))
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.gram") === col("y.gram") && col("x.lang") === col("y.lang") &&
          col("x.doc_id") < col("y.doc_id") &&
          col("x.n_grams") >= lit(threshold) * col("y.n_grams") &&
          col("y.n_grams") >= lit(threshold) * col("x.n_grams") &&
          least(col("x.n_grams") - col("x.pos"), col("y.n_grams") - col("y.pos"))
            + 1 >= alpha)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct().persist()
    t("cand.count")(cand.count())
    t("full ngram query")(graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, d).count())
    spark.stop()
  }
}
