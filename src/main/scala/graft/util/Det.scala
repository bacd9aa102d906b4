package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers for oracle (DuckDB) hash-parity.
  *
  * Double addition is not associative, and Spark's partial aggregation order
  * differs from DuckDB's sequential scan, so `sum(double)` can never
  * hash-match. Policy (FIXTURES.md §4): cast the 2-decimal money columns to
  * exact DECIMAL before arithmetic — identical in both engines because the
  * fixture doubles are exact short decimals — aggregate exactly, and cast the
  * final result to double (a single deterministic rounding both engines
  * perform identically).
  */
object Det {
  /** Fixture money/ratio columns carry exactly 2 decimal digits. */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** Exact decimal sum surfaced as double. */
  def dsum(c: Column): Column = sum(dec2(c)).cast("double")

  /** Exact-sum average surfaced as double (double/long division is
    * deterministic IEEE-754). */
  def davg(c: Column): Column = sum(dec2(c)).cast("double") / count(c)
}
