package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * Mirrors the reference's query surface: an analytics catalog of columnar
  * tables (reference README.md:170-173 — SQL over
  * `"s3tablescatalog/bucket"."namespace"."table"`); here the "catalog" is a
  * scale-factor directory of parquet files.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped as both parquet TIMESTAMP(NANOS) and
      // TIMESTAMP(MICROS) across fixture generations, so the loader adapts
      // to what it reads:
      //  - NANOS: Spark's vectorized reader rejects it; with
      //    spark.sql.legacy.parquet.nanosAsLong=true (set at session
      //    construction in Verify/Bench/SparkSuite) the raw int64 nanos
      //    come back as long and are truncated to micros (identical to
      //    DuckDB's ns→µs truncation, keeping oracle parity);
      //  - MICROS: reads natively as TIMESTAMP_NTZ — cast to the session
      //    TIMESTAMP type so every downstream query and oracle sees the
      //    same type the nanos path produced (timestamp_micros returns
      //    TIMESTAMP; sessions run in UTC, so the values agree too).
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts",
            org.apache.spark.sql.functions.col("ts").cast("timestamp"))
        case _ => raw
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
