package graft.catalog

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Append-only API/query audit log — the reference's one fully
  * implemented data operation (DynamoDB item write,
  * lambda/aws-dl-fmwrk-source-system-api/lambda_function.py:19-32, keyed
  * `(aws_request_id, method_name)` with the conditional status update at
  * :33-44; every handler audits via :67,:86,:105,:124 = R18).
  *
  * Spark-native: an append-only parquet table with the reference's
  * attribute set (`query_string` as map<string,string>, `payload` as a
  * JSON string — SURVEY §1.3), plus the guarded status correction as a
  * join-projection rewrite. Append-only parquet is the scale-correct
  * shape: no rewrite on the hot path, audit writes are pure appends
  * partitioned by event time.
  */
class AuditLog(spark: SparkSession, root: String) {

  val schemaCols: Seq[String] = Seq("aws_request_id", "method_name",
    "function_name", "query_string", "payload", "api_call_type",
    "modified_ts", "status")

  /** R1/R18: append one audit event (status defaults to "success",
    * lambda_function.py:6,31; timestamp at :7,30).
    */
  def append(requestId: String, methodName: String, functionName: String,
      queryString: Map[String, String], payloadJson: String): Unit = {
    import spark.implicits._
    val row = Seq((requestId, methodName, functionName, queryString,
      payloadJson, "synchronous"))
      .toDF("aws_request_id", "method_name", "function_name",
        "query_string", "payload", "api_call_type")
      .withColumn("modified_ts", date_trunc("second", current_timestamp()))
      .withColumn("status", lit("success"))
    row.write.mode(SaveMode.Append).parquet(root)
  }

  def events: DataFrame = spark.read.parquet(root)

  /** R2: conditional status update — only rows whose key exists change
    * (`attribute_exists` guard, lambda_function.py:39).
    */
  def setStatus(requestId: String, methodName: String, status: String): Unit = {
    val cur = events
    val updated = cur.withColumn("status",
      when(col("aws_request_id") === requestId &&
        col("method_name") === methodName, lit(status))
        .otherwise(col("status")))
    ParquetRewrite.rewrite(updated, root)
  }

  /** R3: point lookup by the composite key. */
  def lookup(requestId: String, methodName: String): DataFrame =
    events.filter(col("aws_request_id") === requestId &&
      col("method_name") === methodName)
}
