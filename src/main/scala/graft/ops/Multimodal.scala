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

  /** STUB decode: typed metadata derived deterministically from an md5
    * digest of the content — the seam where a real image decoder would
    * plug in. md5 hex bytes are identical in every engine regardless of
    * the text's encoding (unlike ascii(), which is byte-based in Spark
    * and codepoint-based in DuckDB — divergent off-ASCII).
    */
  def withDecodedMeta(df: DataFrame): DataFrame =
    df.withColumn("media_meta", struct(
      (expr("CAST(conv(substring(md5(text), 1, 2), 16, 10) AS INT)") % 64 + 16)
        .as("width"),
      (expr("CAST(conv(substring(md5(text), 3, 2), 16, 10) AS INT)") % 64 + 16)
        .as("height"),
      (col("n_chars") % 3 + 1).cast("int").as("channels"),
      length(col("payload")).as("n_bytes")))

  /** STUB feature extraction: fixed-shape (8-dim) fake feature vector —
    * byte i of the content digest, scaled by 1/128 (exact in float32, so
    * the value round-trips through round(x*128) losslessly).
    */
  def withFeatures(df: DataFrame): DataFrame =
    df.withColumn("features",
      expr("transform(sequence(1, 8), " +
        "i -> CAST(CAST(conv(substring(md5(text), i*2-1, 2), 16, 10) AS INT) / 128.0 AS FLOAT))"))

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

  /** Per-doc feature vector + frame count, bounded for output size. The
    * float vector is serialized back to its exact byte values
    * (round(x*128) is lossless — see withFeatures) so the output has no
    * array column (driver-unhashable) and IS oracle-checkable.
    */
  // single source of truth for the frame count — interpolated into the
  // oracle SQL below so the two sides cannot drift
  private val mmFrameCount = 4

  private def mmFeatures(s: SparkSession, d: String): DataFrame =
    withFrames(withFeatures(withPayload(documents(s, d).filter(col("doc_id") < 50))),
      mmFrameCount)
      .select(
        col("doc_id"),
        expr("array_join(transform(features, " +
          "x -> CAST(CAST(round(CAST(x AS DOUBLE) * 128.0) AS INT) AS STRING)), ',')")
          .as("feature_bytes"),
        size(col("frames")).as("n_frames"))
      .orderBy(col("doc_id"))

  /** Frame sampling as a first-class op: byte-range "frames" of the
    * payload, every 2nd frame kept, each with a content digest — the
    * video-pipeline shape (sample frames → per-frame features) with the
    * decode stubbed to byte slicing. The pre-explode row stays narrow
    * (offsets of a FIXED count explode, never the payload itself
    * replicated), so the op is a bounded fan-out map at 100 TB.
    */
  private def mmFrameSample(s: SparkSession, d: String): DataFrame =
    withFrames(withPayload(documents(s, d).filter(col("doc_id") < 50)),
      mmFrameCount)
      .select(col("doc_id"), posexplode(col("frames")))
      .toDF("doc_id", "frame_idx", "frame")
      .filter(col("frame_idx") % 2 === 0)
      .select(col("doc_id"), col("frame_idx"),
        md5(col("frame")).as("frame_md5"),
        length(col("frame")).as("n_bytes"))
      .orderBy("doc_id", "frame_idx")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_decode_meta"  -> mmDecodeMeta _,
    "q_mm_features"     -> mmFeatures _,
    "q_mm_frame_sample" -> mmFrameSample _,
  )

  val oracle: Map[String, String] = Map(
    "q_mm_decode_meta" ->
      """SELECT source, count(*) AS n_media,
        |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS sum_bytes,
        |  CAST(sum(('0x' || substring(md5(text), 1, 2))::INT % 64 + 16) AS BIGINT) AS sum_width,
        |  CAST(sum(('0x' || substring(md5(text), 3, 2))::INT % 64 + 16) AS BIGINT) AS sum_height,
        |  CAST(sum(n_chars % 3 + 1) AS BIGINT) AS sum_channels
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_mm_features" ->
      s"""SELECT doc_id,
        |  array_to_string([(('0x' || substring(md5(text), 2*i - 1, 2))::INT)::VARCHAR
        |                   FOR i IN range(1, 9)], ',') AS feature_bytes,
        |  CAST($mmFrameCount AS INT) AS n_frames
        |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin,
    // DuckDB substring() has no BLOB overload, so the oracle slices the
    // VARCHAR — byte-identical to the Spark binary slice because the
    // corpus is pure ASCII (verified: octet_length(encode(text)) ==
    // len(text) for every doc at all three SFs)
    "q_mm_frame_sample" ->
      s"""WITH f AS (SELECT doc_id, i AS frame_idx,
         |        substring(text, i * (len(text) // $mmFrameCount) + 1,
         |                  len(text) // $mmFrameCount) AS frame
         |      FROM documents, UNNEST(range(0, $mmFrameCount)) AS u(i)
         |      WHERE doc_id < 50)
         |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
         |  md5(frame) AS frame_md5,
         |  CAST(octet_length(encode(frame)) AS INT) AS n_bytes
         |FROM f WHERE frame_idx % 2 = 0 ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
