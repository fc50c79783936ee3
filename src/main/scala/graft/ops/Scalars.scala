package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** SURVEY §2.2-H — scalar function families. All built-in
  * `org.apache.spark.sql.functions` (codegen'd, whole-stage) — no UDFs in
  * the hot path (those live in Extensibility.scala to prove the surface).
  *
  * Cross-engine determinism notes:
  * - round() on a double differs between Spark (shortest-repr HALF_UP)
  *   and DuckDB (binary value) exactly at .5 boundaries, so round() is
  *   only applied to irrational-ish values (sqrt/ln/exp results) where a
  *   boundary hit has ~0 probability — never to 2dp money values.
  * - dayofweek: Spark is 1=Sunday, DuckDB 0=Sunday — normalized to 0-base.
  * - float columns are widened float→double (exact in both engines)
  *   before any arithmetic.
  */
object Scalars {

  /** String family over part (reference splits paths the same way:
    * lambda_function.py:133-135).
    */
  private def strFuncs(s: SparkSession, d: String): DataFrame =
    // sort first, derive after (guide §2.3): the exchange carries the 4
    // source columns instead of the 12 derived strings
    part(s, d).select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"))
      .orderBy("p_partkey")
      .select(
        col("p_partkey"),
        concat(col("p_brand"), lit(":"), col("p_name")).as("branded"),
        upper(col("p_name")).as("uname"),
        lower(col("p_type")).as("ltype"),
        substring(col("p_name"), 1, 3).as("pre3"),
        length(col("p_name")).as("len"),
        trim(lit("  pad  ")).as("trimmed"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        lpad(col("p_brand"), 10, "*").as("padded"),
        expr("try_element_at(split(p_name, ' '), 2)").as("word2"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        col("p_name").like("%wid%").as("has_wid"))

  /** Date/time family over orders (reference timestamps:
    * lambda_function.py:7,30).
    */
  private def dateFuncs(s: SparkSession, d: String): DataFrame =
    // sort first, derive after: the 8 derived columns (two of them
    // 8-byte timestamps) all come from o_orderdate, so the range
    // exchange + sort carry 2 source columns instead of 9 derived ones
    // (guide §2.3: project heavy columns above the exchange)
    orders(s, d).select(col("o_orderkey"), col("o_orderdate"))
      .orderBy("o_orderkey")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(lit("2000-01-01").cast("date"), col("o_orderdate").cast("date"))
          .as("days_to_y2k"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_ts"),
        last_day(col("o_orderdate")).as("eom"),
        (dayofweek(col("o_orderdate")) - 1).as("dow"))

  /** Math family over lineitem. */
  private def mathFuncs(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_linenumber") === 1)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        abs(col("l_discount") - 0.05).as("abs_d"),
        ceil(col("l_extendedprice")).as("ceil_p"),
        floor(col("l_extendedprice")).as("floor_p"),
        round(sqrt(col("l_quantity")), 6).as("sqrt_q"),
        pow(col("l_quantity"), 2).as("sq_q"),
        (col("l_orderkey") % 7).as("mod7"),
        signum(col("l_discount") - 0.05).as("sign_d"),
        round(log(col("l_extendedprice")), 6).as("ln_p"),
        round(exp(col("l_discount")), 6).as("exp_d"))
      // (l_orderkey, l_linenumber) is not unique — extend the sort until
      // remaining ties are full-row-identical in the projection
      .orderBy("l_orderkey", "l_quantity", "l_extendedprice", "abs_d", "exp_d")

  /** Conditional family: CASE/coalesce/nullif/least/greatest (reference
    * response projection: lambda_function.py:46-54).
    */
  private def condFuncs(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(
      col("c_custkey"),
      when(col("c_acctbal") < 0, "overdrawn")
        .when(col("c_acctbal") < 5000, "standard")
        .otherwise("premium").as("tier"),
      coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(masked)"))
        .as("segment_masked"),
      least(col("c_acctbal"), lit(0.0)).as("neg_part"),
      greatest(col("c_acctbal"), lit(0.0)).as("pos_part"))
      .orderBy("c_custkey")

  /** Cast family: money→decimal, string↔int, overflow-safe try_cast
    * (Spark 4 runs ANSI mode — plain CAST overflow would throw).
    * Decimal values are computed exactly in decimal, then SURFACED as
    * double: raw decimal output columns are driver-unhashable (DuckDB's
    * pandas bridge renders every DECIMAL as float64 while Spark parquet
    * loads as Decimal objects — round-1 CORRECTNESS red). Decimal→double
    * is round-to-nearest, identical in both engines.
    */
  private def castDecimal(s: SparkSession, d: String): DataFrame =
    // sort first, derive after (guide §2.3): the exchange carries the 3
    // source columns, and the per-row string round-trips / decimal casts
    // run once post-sort instead of riding the shuffle as 6 derived slots
    orders(s, d).select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy("o_orderkey")
      .select(
        col("o_orderkey"),
        col("o_totalprice").cast(DecimalType(12, 2)).cast("double").as("price_dec"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * lit(2).cast(DecimalType(3, 0)))
          .cast(DecimalType(14, 2)).cast("double")
          .as("price_x2"),
        expr("try_cast(CAST(o_orderkey AS STRING) AS INT)").as("key_roundtrip"),
        expr("try_cast('99999999999999999999' AS INT)").as("overflow_null"),
        expr("try_cast(CAST(o_custkey AS STRING) AS INT)").as("cust_int"))

  /** Array family over embeddings (float[64] vectors). */
  private def arrayFuncs(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).select(
      col("vec_id"),
      size(col("embedding")).as("dim"),
      element_at(col("embedding"), 1).as("first_elem"),
      // array-typed OUTPUT columns crash the driver's pandas row-sort, so
      // list results are serialized: floats via the proven floor-micros
      // trick (integer → string is engine-identical), ints directly
      expr("array_join(transform(slice(embedding, 1, 4), " +
        "x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS STRING)), ',')")
        .as("head4_micros"),
      array_contains(array(lit(1), lit(2), lit(3)), col("label")).as("label_in_123"),
      expr("array_join(transform(sort_array(array(label, 0, 9)), x -> CAST(x AS STRING)), ',')")
        .as("sorted_triple"))
      .orderBy("vec_id")

  /** Generator: posexplode of the leading embedding slice, re-aggregated
    * by position (float widened to double, then exact decimal sum).
    */
  private def explode_(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 8)))
      .groupBy((col("pos") + 1).as("pos"))
      .agg(
        count(lit(1)).as("n"),
        // floor of the scaled double is tie-free (unlike decimal-cast
        // rounding, where a float landing exactly on a half-ulp rounds
        // differently per engine — observed at sf0.1), so the integer sum
        // is exact and portable
        sum(expr("CAST(floor(CAST(col AS DOUBLE) * 1000000) AS BIGINT)"))
          .as("sum_micros"))
      .orderBy("pos")

  /** `explode_outer` null-row semantics: inner explode silently DROPS
    * rows whose array is empty — the lost-parent-rows gap in every
    * flatten-then-rejoin pipeline. A deterministic subset of docs gets
    * an emptied token array; outer explode must keep them as null-token
    * rows. The oracle is closed-form (sum of greatest(len, 1)) — a true
    * differential: operator semantics vs arithmetic, not mirror vs
    * mirror.
    */
  private def explodeOuter(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("toks", expr(
        s"CASE WHEN doc_id % 7 = 0 THEN array() ELSE ${TextExprs.toksE} END"))
      .select(col("lang"), explode_outer(col("toks")).as("tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("tok").isNull, 1L).otherwise(0L)).as("n_empty_docs"))
      .orderBy(col("lang"))

  /** Map family: construct, keys, point lookup. The map itself stays
    * internal (map output columns are driver-unhashable); the projection
    * serializes keys via array_join and surfaces the looked-up value, so
    * the key is fully oracle-checkable (the DuckDB mirror reproduces the
    * single-entry map's semantics relationally).
    */
  private def mapFuncs(s: SparkSession, d: String): DataFrame =
    events(s, d).select(
      col("event_id"),
      map(col("event_type"), col("value")).as("m"))
      .select(
        col("event_id"),
        array_join(map_keys(col("m")), ",").as("ks"),
        element_at(col("m"), "click").as("click_val"))
      .orderBy("event_id")

  /** JSON extraction from the props document column (reference payload
    * passthrough: lambda_function.py:14, swagger:40-41).
    */
  private def jsonFuncs(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .filter(col("k") > 50)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy("event_type")

  /** Spark 4 VARIANT type: `parse_json` into the binary variant
    * encoding, typed path extraction with `variant_get`, and
    * `is_variant_null` — the semi-structured column discipline that
    * replaces string re-parsing per access (the variant encoding parses
    * ONCE; every extraction is a binary walk, and variant-typed parquet
    * columns support shredded pushdown, which the graft scan builder
    * already forwards). Values must equal the string-path JSON oracle.
    */
  private def variantFuncs(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("v", parse_json(col("props")))
      .select(
        expr("variant_get(v, '$.k', 'int')").as("k"),
        expr("variant_get(v, '$.k', 'string')").as("k_str"),
        col("value"))
      .groupBy(col("k"), col("k_str"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_val"))
      .orderBy("k")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_variant_funcs" -> variantFuncs _,
    "q_str_funcs"    -> strFuncs _,
    "q_date_funcs"   -> dateFuncs _,
    "q_math_funcs"   -> mathFuncs _,
    "q_cond_funcs"   -> condFuncs _,
    "q_cast_decimal" -> castDecimal _,
    "q_array_funcs"  -> arrayFuncs _,
    "q_explode"      -> explode_ _,
    "q_explode_outer" -> explodeOuter _,
    "q_map_funcs"    -> mapFuncs _,
    "q_json_funcs"   -> jsonFuncs _,
  )

  val oracle: Map[String, String] = Map(
    "q_variant_funcs" ->
      """SELECT CAST(json_extract(props, '$.k') AS INTEGER) AS k,
        |       json_extract_string(props, '$.k') AS k_str,
        |       count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_val
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY k""".stripMargin,
    "q_str_funcs" ->
      """SELECT p_partkey,
        |  p_brand || ':' || p_name AS branded,
        |  upper(p_name) AS uname,
        |  lower(p_type) AS ltype,
        |  substring(p_name, 1, 3) AS pre3,
        |  CAST(length(p_name) AS INT) AS len,
        |  trim('  pad  ') AS trimmed,
        |  replace(p_name, ' ', '_') AS snake,
        |  lpad(p_brand, 10, '*') AS padded,
        |  str_split(p_name, ' ')[2] AS word2,
        |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        |  p_name LIKE '%wid%' AS has_wid
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_y2k,
        |  o_orderdate + INTERVAL 30 DAY AS due_ts,
        |  last_day(CAST(o_orderdate AS DATE)) AS eom,
        |  CAST(dayofweek(o_orderdate) AS INT) AS dow
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  abs(l_discount - 0.05) AS abs_d,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_p,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS floor_p,
        |  round(sqrt(l_quantity), 6) AS sqrt_q,
        |  pow(l_quantity, 2) AS sq_q,
        |  l_orderkey % 7 AS mod7,
        |  CAST(CASE WHEN l_discount - 0.05 > 0 THEN 1.0 WHEN l_discount - 0.05 < 0 THEN -1.0 ELSE 0.0 END AS DOUBLE) AS sign_d,
        |  round(ln(l_extendedprice), 6) AS ln_p,
        |  round(exp(l_discount), 6) AS exp_d
        |FROM lineitem WHERE l_linenumber = 1
        |ORDER BY l_orderkey, l_quantity, l_extendedprice, abs_d, exp_d""".stripMargin,
    "q_cond_funcs" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'overdrawn'
        |       WHEN c_acctbal < 5000 THEN 'standard'
        |       ELSE 'premium' END AS tier,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(masked)') AS segment_masked,
        |  least(c_acctbal, 0.0) AS neg_part,
        |  greatest(c_acctbal, 0.0) AS pos_part
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_cast_decimal" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
        |  CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(2 AS DECIMAL(3,0)) AS DECIMAL(14,2)) AS DOUBLE) AS price_x2,
        |  CAST(CAST(o_orderkey AS VARCHAR) AS INT) AS key_roundtrip,
        |  TRY_CAST('99999999999999999999' AS INT) AS overflow_null,
        |  TRY_CAST(CAST(o_custkey AS VARCHAR) AS INT) AS cust_int
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_array_funcs" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS dim,
        |  embedding[1] AS first_elem,
        |  array_to_string(list_transform(list_slice(embedding, 1, 4),
        |    x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS VARCHAR)), ',') AS head4_micros,
        |  list_contains([1, 2, 3], label) AS label_in_123,
        |  array_to_string(list_sort([label, 0, 9]), ',') AS sorted_triple
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_explode_outer" ->
      """WITH t AS (
        |  SELECT lang,
        |    CASE WHEN doc_id % 7 = 0 THEN 0
        |         ELSE len(regexp_extract_all(text, '[^ ]+')) END AS n_toks
        |  FROM documents)
        |SELECT lang,
        |  CAST(sum(greatest(n_toks, 1)) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN n_toks = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_empty_docs
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
    "q_explode" ->
      """SELECT CAST(ord AS INT) AS pos, count(*) AS n,
        |  CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS sum_micros
        |FROM (SELECT unnest(list_slice(embedding, 1, 8)) AS v,
        |             unnest(range(1, 9)) AS ord
        |      FROM embeddings)
        |GROUP BY ord ORDER BY pos""".stripMargin,
    "q_json_funcs" ->
      """SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
        |WHERE k > 50 GROUP BY event_type ORDER BY event_type""".stripMargin,
    // single-entry map semantics expressed relationally: the map's one key
    // is event_type, lookup of 'click' hits only when that key matches
    "q_map_funcs" ->
      """SELECT event_id, event_type AS ks,
        |  CASE WHEN event_type = 'click' THEN value END AS click_val
        |FROM events ORDER BY event_id""".stripMargin,
  )
}
