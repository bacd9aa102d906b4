package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the authoritative operator registry (SURVEY.md §2 inventory);
  * `oracleSql` carries the DuckDB-equivalent SQL for every SQL-expressible
  * entry. Column names and final total-order ORDER BY are kept identical on
  * both sides (FIXTURES.md §4).
  */
object SparkEntry {

  /** Flagship query (SURVEY §7.2): TPC-H-Q1-shaped pricing summary on
    * sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.aggHashSum(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Scalars.queries ++ ops.Ingest.queries ++
      ops.CdcStreamOps.queries ++ ops.LlmDedup.queries ++ ops.LlmSim.queries ++
      ops.LlmText.queries ++ ops.LlmPipeline.queries ++ ops.SqlSurface.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracles ++ ops.Scalars.oracles ++ ops.Ingest.oracles ++
      ops.CdcStreamOps.oracles ++ ops.LlmDedup.oracles ++ ops.LlmSim.oracles ++
      ops.LlmText.oracles ++ ops.LlmPipeline.oracles ++ ops.SqlSurface.oracles
}
