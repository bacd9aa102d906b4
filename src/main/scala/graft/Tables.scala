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
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
      // rejects; with spark.sql.legacy.parquet.nanosAsLong=true (set at
      // session construction in Verify/Bench/SparkSuite — not mutated here,
      // so this loader has no session-wide side effects) the raw int64 nanos
      // come back as long and are truncated to micros (identical to DuckDB's
      // ns→µs truncation, keeping oracle parity).
      require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
        "events requires spark.sql.legacy.parquet.nanosAsLong=true at session construction")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
