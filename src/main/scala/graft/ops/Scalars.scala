package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.ops.Relational.Q
import graft.util.Det

/** Scalar-function pack (SURVEY.md §2.H): string / date / math / case-null /
  * array / map / json over the analytics surface the reference provisions
  * (reference README.md:170-173). All built-in `functions._` — fully
  * codegen'd, no UDFs (SURVEY §2 UDF policy).
  *
  * Determinism: math limited to exact or IEEE-correctly-rounded ops
  * (sqrt/abs/floor/round, integer mod); no `pow`/`ln` in oracled output since
  * libm rounding differs across engines.
  */
object Scalars {

  private val fnString: Q = (s, d) =>
    load(s, d, "part")
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        lower(col("p_brand")).as("lbrand"),
        substring(col("p_name"), 1, 4).as("prefix"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        length(col("p_name")).as("name_len"),
        trim(col("p_name")).as("trimmed"),
        col("p_name").like("%widget%").as("is_widget"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"))
      .orderBy(col("p_partkey").asc_nulls_first)

  private val fnDate: Q = (s, d) =>
    load(s, d, "orders")
      .select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("order_month"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_2002"),
        date_add(col("o_orderdate").cast("date"), 30).cast("timestamp").as("due_date"))
      .orderBy(col("o_orderkey").asc_nulls_first)

  /** Rounding policy (NOTES.md double-rounding trap): `round(double, d)`
    * diverges between Spark (HALF_UP on the shortest decimal repr) and DuckDB
    * (round on the binary double), so all rounding goes through the exact
    * DECIMAL path — `round(dec2(col), 1)` is exact decimal arithmetic with
    * identical HALF_UP semantics in both engines; the final cast to double is
    * a single deterministic conversion. */
  private val fnMath: Q = (s, d) =>
    load(s, d, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(Det.dec2(col("l_extendedprice")), 1).cast("double").as("price_r1"),
        abs(Det.dec2(col("l_extendedprice")).unary_-).cast("double").as("abs_price"),
        sqrt(col("l_quantity")).as("sqrt_qty"),
        floor(col("l_extendedprice")).as("floor_price"),
        ceil(col("l_discount") * 100).as("disc_pct"),
        (col("l_orderkey") % 7).as("mod7"))
      .orderBy(col("l_orderkey").asc_nulls_first, col("l_linenumber").asc_nulls_first,
        col("price_r1").asc_nulls_first, col("sqrt_qty").asc_nulls_first,
        col("disc_pct").asc_nulls_first)

  private val fnCaseNull: Q = (s, d) =>
    load(s, d, "orders")
      .select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "F", "finished")
          .when(col("o_orderstatus") === "O", "open")
          .otherwise("other").as("status_label"),
        coalesce(nullif(col("o_orderpriority"), lit("4-NOT SPECIFIED")), lit("unspecified"))
          .as("prio"),
        (col("o_orderstatus") <=> lit("F")).as("is_f_safe"),
        when(col("o_totalprice") > 200000, col("o_totalprice")).as("big_or_null"))
      .orderBy(col("o_orderkey").asc_nulls_first)

  private val fnArray: Q = (s, d) =>
    load(s, d, "embeddings")
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_val"),
        array_max(col("embedding")).cast("double").as("max_val"),
        array_min(col("embedding")).cast("double").as("min_val"),
        array_contains(col("embedding"), lit(0.0f)).as("has_zero"),
        element_at(array_sort(col("embedding")), 1).cast("double").as("sorted_first"))
      .orderBy(col("vec_id").asc_nulls_first)

  /** DynamoDB `M`-attribute analog (SURVEY §1.3): build a map, look up keys.
    * Scalar outputs only so the oracle comparison avoids MAP physical-type
    * mismatches between engines. */
  private val fnMap: Q = (s, d) =>
    load(s, d, "orders")
      .withColumn("m", map(
        lit("status"), col("o_orderstatus"),
        lit("prio"), col("o_orderpriority")))
      .select(
        col("o_orderkey"),
        element_at(col("m"), "status").as("m_status"),
        element_at(col("m"), "prio").as("m_prio"),
        size(map_keys(col("m"))).as("n_keys"))
      .orderBy(col("o_orderkey").asc_nulls_first)

  /** AttributeValue-style nested-doc extraction (SURVEY §2.H `fn_json`):
    * typed field out of the `events.props` JSON string. */
  private val fnJson: Q = (s, d) =>
    load(s, d, "events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"))
      .orderBy(col("event_id").asc_nulls_first)

  val queries: Map[String, Q] = Map(
    "fn_string" -> fnString,
    "fn_date" -> fnDate,
    "fn_math" -> fnMath,
    "fn_case_null" -> fnCaseNull,
    "fn_array" -> fnArray,
    "fn_map" -> fnMap,
    "fn_json" -> fnJson,
  )

  val oracles: Map[String, String] = Map(
    "fn_string" ->
      """SELECT p_partkey,
        |  UPPER(p_name) AS uname,
        |  LOWER(p_brand) AS lbrand,
        |  SUBSTR(p_name, 1, 4) AS prefix,
        |  CONCAT_WS('|', p_brand, p_type) AS brand_type,
        |  LENGTH(p_name) AS name_len,
        |  TRIM(p_name) AS trimmed,
        |  p_name LIKE '%widget%' AS is_widget,
        |  REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS devoweled
        |FROM part ORDER BY p_partkey ASC NULLS FIRST""".stripMargin,

    "fn_date" ->
      """SELECT o_orderkey,
        |  DATE_TRUNC('month', o_orderdate) AS order_month,
        |  CAST(YEAR(o_orderdate) AS INT) AS yr,
        |  CAST(MONTH(o_orderdate) AS INT) AS mo,
        |  CAST(DAY(o_orderdate) AS INT) AS dom,
        |  CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP) AS due_date
        |FROM orders ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,

    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_r1,
        |  CAST(ABS(-CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS abs_price,
        |  SQRT(l_quantity) AS sqrt_qty,
        |  CAST(FLOOR(l_extendedprice) AS BIGINT) AS floor_price,
        |  CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct,
        |  l_orderkey % 7 AS mod7
        |FROM lineitem ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST, price_r1 ASC NULLS FIRST, sqrt_qty ASC NULLS FIRST, disc_pct ASC NULLS FIRST""".stripMargin,

    "fn_case_null" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'F' THEN 'finished'
        |       WHEN o_orderstatus = 'O' THEN 'open'
        |       ELSE 'other' END AS status_label,
        |  COALESCE(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), 'unspecified') AS prio,
        |  o_orderstatus IS NOT DISTINCT FROM 'F' AS is_f_safe,
        |  CASE WHEN o_totalprice > 200000 THEN o_totalprice END AS big_or_null
        |FROM orders ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,

    "fn_array" ->
      """SELECT vec_id,
        |  CAST(LEN(embedding) AS INT) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first_val,
        |  CAST(LIST_MAX(embedding) AS DOUBLE) AS max_val,
        |  CAST(LIST_MIN(embedding) AS DOUBLE) AS min_val,
        |  LIST_CONTAINS(embedding, 0.0) AS has_zero,
        |  CAST(LIST_SORT(embedding)[1] AS DOUBLE) AS sorted_first
        |FROM embeddings ORDER BY vec_id ASC NULLS FIRST""".stripMargin,

    "fn_map" ->
      """SELECT o_orderkey,
        |  o_orderstatus AS m_status,
        |  o_orderpriority AS m_prio,
        |  2 AS n_keys
        |FROM orders ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,

    "fn_json" ->
      """SELECT event_id,
        |  CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) AS k_val
        |FROM events ORDER BY event_id ASC NULLS FIRST""".stripMargin,
  )
}
