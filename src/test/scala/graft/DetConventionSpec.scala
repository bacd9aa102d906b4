package graft

import org.apache.spark.sql.types.{DataType, DecimalType, StructType}

/** The Det output convention, as a failing test (VERDICT r14 next #2).
  *
  * The driver's correctness gate hashes each query's parquet dump against
  * a DuckDB rerun of the oracle SQL, canonicalizing cell VALUES — and a
  * raw Spark `DecimalType` column hashes `Decimal('7492500.00')` while
  * DuckDB's result frame lands the same total as float64 `7492500.0`:
  * rows and schema match, hash does not (the exact r14 red,
  * `sql_agg_metadata_sum`/`sql_agg_metadata_group`). The repo convention
  * (verify-skill gotchas, graft.util.Det) is therefore: an ORACLED query
  * never emits a raw DECIMAL output column — cast to DOUBLE (tolerant
  * compare), BIGINT (exact integral), or VARCHAR (exact decimal string,
  * the `sql_column_stats` encoding) on BOTH sides.
  *
  * This spec turns that prose into a gate: it builds every oracled
  * query's DataFrame at sf0.001 (fixtures run; the query itself stays
  * lazy — schema needs analysis only) and fails on any DECIMAL anywhere
  * in the output schema, naming the query and column. A new query that
  * reintroduces the class fails HERE, before the driver's round gate. */
class DetConventionSpec extends SparkSuite {

  private def decimalPaths(dt: DataType, path: String): Seq[String] =
    dt match {
      case _: DecimalType => Seq(path)
      case s: StructType =>
        s.fields.toSeq.flatMap(f => decimalPaths(f.dataType, s"$path.${f.name}"))
      case a: org.apache.spark.sql.types.ArrayType =>
        decimalPaths(a.elementType, s"$path[]")
      case m: org.apache.spark.sql.types.MapType =>
        decimalPaths(m.keyType, s"$path.key") ++
          decimalPaths(m.valueType, s"$path.value")
      case _ => Nil
    }

  test("no oracled query emits a raw DECIMAL output column") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    // deterministic walk; oracled queries only — rows-only checks never
    // hash values, and non-oracled surfaces (e.g. $column_stats feeders)
    // may legitimately carry decimals internally
    SparkEntry.oracleSql.keys.toSeq.sorted.foreach { name =>
      val df =
        try SparkEntry.queries(name)(spark, sfDir)
        catch {
          case e: Exception =>
            fail(s"query '$name' failed to build its plan: ${e.getMessage}")
        }
      df.schema.fields.foreach { f =>
        decimalPaths(f.dataType, f.name).foreach { p =>
          offenders += s"$name: column '$p' is ${f.dataType.simpleString}"
        }
      }
    }
    assert(offenders.isEmpty,
      "raw DECIMAL output violates the Det oracle convention (cast to " +
        "DOUBLE/BIGINT/VARCHAR on both sides):\n  " +
        offenders.mkString("\n  "))
  }
}
