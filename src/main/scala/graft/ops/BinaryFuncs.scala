package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** SURVEY §2.2-H extension — bitwise and binary-encoding function
  * families. Grounding: R11's per-value escaping/encoding boundary
  * (swagger:43) and the multimodal binary plane (payload digests,
  * content-addressed storage keys at 100 TB are exactly
  * sha256/base64-of-bytes).
  */
object BinaryFuncs {

  /** Bitwise family over lineitem keys: AND/OR/XOR/shift/popcount,
    * aggregated to a checksum row (exact integer arithmetic — no float
    * discipline needed).
    */
  private def bitFuncs(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(col("l_orderkey").as("k"), col("l_linenumber").cast("long").as("n"))
      .agg(
        sum(expr("k & n")).as("sum_and"),
        sum(expr("k | n")).as("sum_or"),
        sum(expr("k ^ n")).as("sum_xor"),
        sum(expr("k << 1")).as("sum_shl"),
        sum(expr("k >> 2")).as("sum_shr"),
        sum(expr("bit_count(k)")).as("sum_pop"))

  /** Encoding family over part: base64 round-trip, sha256 digest, hex. */
  private def encodeFuncs(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .filter(col("p_partkey") < 50)
      .select(
        col("p_partkey"),
        base64(encode(col("p_name"), "UTF-8")).as("name_b64"),
        decode(unbase64(base64(encode(col("p_name"), "UTF-8"))), "UTF-8").as("name_rt"),
        sha2(col("p_name"), 256).as("name_sha256"),
        upper(hex(col("p_partkey"))).as("key_hex"))
      .orderBy(col("p_partkey"))

  /** Higher-order array-function family over the embedding arrays:
    * transform / filter / exists / forall / reduce-style aggregate /
    * sort / slice — the lambda surface the LLM-pipeline ops build on.
    */
  private def hofFuncs(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .filter(col("vec_id") < 100)
      .withColumn("e", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .select(
        col("vec_id"),
        expr("size(filter(e, x -> x > 0))").as("n_pos"),
        expr("CASE WHEN exists(e, x -> x > 0.25) THEN 1 ELSE 0 END").as("has_big"),
        expr("CASE WHEN forall(e, x -> abs(x) < 1.0) THEN 1 ELSE 0 END").as("all_small"),
        round(expr("aggregate(slice(array_sort(e), 1, 4), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"), 4)
          .as("sum_bottom4"))
      .orderBy(col("vec_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bit_funcs"    -> bitFuncs _,
    "q_encode_funcs" -> encodeFuncs _,
    "q_hof_funcs"    -> hofFuncs _,
  )

  val oracle: Map[String, String] = Map(
    "q_bit_funcs" ->
      """SELECT CAST(sum(l_orderkey & n) AS BIGINT) AS sum_and,
        |  CAST(sum(l_orderkey | n) AS BIGINT) AS sum_or,
        |  CAST(sum(xor(l_orderkey, n)) AS BIGINT) AS sum_xor,
        |  CAST(sum(l_orderkey << 1) AS BIGINT) AS sum_shl,
        |  CAST(sum(l_orderkey >> 2) AS BIGINT) AS sum_shr,
        |  CAST(sum(bit_count(l_orderkey)) AS BIGINT) AS sum_pop
        |FROM (SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS n FROM lineitem)""".stripMargin,
    "q_hof_funcs" ->
      """WITH b AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings WHERE vec_id < 100)
        |SELECT vec_id,
        |  length(list_filter(e, x -> x > 0)) AS n_pos,
        |  CASE WHEN length(list_filter(e, x -> x > 0.25)) > 0 THEN 1 ELSE 0 END AS has_big,
        |  CASE WHEN length(list_filter(e, x -> NOT abs(x) < 1.0)) = 0 THEN 1 ELSE 0 END AS all_small,
        |  round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_sort(e)[1:4]), (a, x) -> a + x), 4) AS sum_bottom4
        |FROM b ORDER BY vec_id""".stripMargin,
    "q_encode_funcs" ->
      """SELECT p_partkey,
        |  to_base64(encode(p_name)) AS name_b64,
        |  p_name AS name_rt,
        |  sha256(p_name) AS name_sha256,
        |  upper(to_hex(p_partkey)) AS key_hex
        |FROM part WHERE p_partkey < 50 ORDER BY p_partkey""".stripMargin,
  )
}
