package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** North-star multimodal columns: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed by per-partition batch
  * functions. Grounding: the reference's landing zone takes arbitrary
  * objects (cft/sourceSystem.yaml:66-77 — the path policy is
  * format-agnostic); assets are bytes first, schema later.
  *
  * The decode step is STUBBED (no image/audio libs in this environment):
  * `decodeMetaExpr` derives deterministic fake (width, height, channels)
  * from the payload bytes, and `featuresOf` a fixed-shape fake feature
  * vector. Everything around the stub — the binary column, the metadata
  * struct schema, the per-partition batch shape, partition-parallel
  * execution, and the aggregation — is real Spark and is what survives a
  * swap-in of a real decoder.
  *
  * Scale notes (100 TB): payloads stay columnar binary end-to-end (no
  * driver collect, no string round-trip); decode is a narrow map —
  * embarrassingly parallel, no shuffle until the final keyed agg; feature
  * vectors are fixed-length arrays so downstream similarity ops reuse the
  * Similarity.scala kernels unchanged.
  */
object Multimodal {

  /** Binary payload column for the documents table (utf-8 bytes stand in
    * for the opaque media blob).
    */
  def withPayload(df: DataFrame): DataFrame =
    df.withColumn("payload", encode(col("text"), "UTF-8"))

  /** STUB decode: typed metadata derived deterministically from the first
    * payload bytes — the seam where a real image decoder would plug in.
    */
  def withDecodedMeta(df: DataFrame): DataFrame =
    df.withColumn("media_meta", struct(
      // pmod: Spark's ascii() is byte-based and can go negative on
      // non-ASCII text; pmod keeps the stub dimensions positive (the
      // byte-vs-codepoint gap vs the oracle only exists off-ASCII —
      // this is a stub decoder, the seam is what matters)
      (expr("pmod(ascii(substring(text, 1, 1)), 64)") + 16).as("width"),
      (expr("pmod(ascii(substring(text, 2, 1)), 64)") + 16).as("height"),
      (col("n_chars") % 3 + 1).cast("int").as("channels"),
      length(col("payload")).as("n_bytes")))

  /** STUB feature extraction: fixed-shape (8-dim) fake feature vector from
    * payload bytes — deterministic, codegen-friendly, batch-parallel.
    */
  def withFeatures(df: DataFrame): DataFrame =
    df.withColumn("features",
      expr("transform(sequence(1, 8), i -> CAST(pmod(ascii(substring(text, i, 1)), 256) AS FLOAT) / 128.0)"))

  /** STUB frame sampling: split the payload into n equal byte-range
    * "frames" (the video analog of maxRecordsPerBatch slicing).
    */
  def withFrames(df: DataFrame, n: Int): DataFrame =
    df.withColumn("frames",
      expr(s"transform(sequence(0, $n - 1), " +
        s"i -> substring(payload, i * (length(payload) div $n) + 1, length(payload) div $n))"))

  /** Declared query: decode-meta rollup per source — bytes, fake
    * dimensions, channel histogram. The oracle reproduces the stub
    * arithmetic, proving the plumbing (binary length, metadata struct,
    * aggregation) end-to-end.
    */
  private def mmDecodeMeta(s: SparkSession, d: String): DataFrame =
    withDecodedMeta(withPayload(documents(s, d)))
      .select(col("source"), col("media_meta.*"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("sum_bytes"),
        sum(col("width")).as("sum_width"),
        sum(col("height")).as("sum_height"),
        sum(col("channels")).as("sum_channels"))
      .orderBy(col("source"))

  /** Rows-only key (no SQL-expressible oracle for array<float> output):
    * per-doc feature vector + frame count, bounded for output size.
    */
  private def mmFeatures(s: SparkSession, d: String): DataFrame =
    withFrames(withFeatures(withPayload(documents(s, d).filter(col("doc_id") < 50))), 4)
      .select(col("doc_id"), col("features"), size(col("frames")).as("n_frames"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_decode_meta" -> mmDecodeMeta _,
    "q_mm_features"    -> mmFeatures _,
  )

  val oracle: Map[String, String] = Map(
    "q_mm_decode_meta" ->
      """SELECT source, count(*) AS n_media,
        |  sum(octet_length(encode(text))) AS sum_bytes,
        |  sum(ascii(substring(text, 1, 1)) % 64 + 16) AS sum_width,
        |  sum(ascii(substring(text, 2, 1)) % 64 + 16) AS sum_height,
        |  sum(n_chars % 3 + 1) AS sum_channels
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
  )
}
