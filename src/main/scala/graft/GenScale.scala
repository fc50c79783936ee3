package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the driver's testdata: each output table is
  * `copies` re-keyed replicas of the source table, preserving referential
  * integrity (every foreign key shifts by the same per-copy offset as the
  * primary key it references) and column types byte-for-byte, so the
  * DuckDB oracle and the Spark engine read identical files at the larger
  * scale factor. Used to produce sf1 (= 10 x sf0.1) for the scale-proof
  * runs; the driver's own sf dirs are read-only and never touched.
  *
  * Content notes:
  *  - `region`/`nation` are fixed-size dimensions (TPC-H posture): copied
  *    unchanged.
  *  - `documents.text` gets a per-copy suffix (and `n_chars` recomputed,
  *    preserving the n_chars == length(text) invariant) so a scaled
  *    corpus has 10 x the DISTINCT documents, not 10 identical copies of
  *    each — exact-dedup distributions stay realistic.
  *  - `embeddings.embedding` shifts by copy*1e-3 per element so vectors
  *    don't collapse into 10-way ties in ANN top-k.
  *  - `events.ts` / date columns are unchanged: scale grows events PER
  *    window (how real traffic scales), and the NTZ/micros physical type
  *    round-trips exactly.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "target/testdata-sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // keep the driver's physical types: timestamp[us], NTZ annotation
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tbl(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    /** `copies` stamped replicas; `_copy` 0 is the identity copy. */
    def rep(df: DataFrame): DataFrame =
      df.withColumn("_copy", explode(sequence(lit(0L), lit(copies - 1L))))

    // Scale-fixture layout (round-18): the original single-file,
    // single-row-group output serialized every scan — a parquet scan
    // parallelizes at row-group granularity AND FileSourceScan's split
    // size floors at openCostInBytes (4 MB), so a 12 MB documents file
    // ran 1-3 tasks at sf10, understating real 100 TB scan parallelism
    // by the core count. Big tables now write `files` part files (a
    // DIRECTORY named <t>.parquet — Spark reads it unchanged; the DuckDB
    // compare tooling globs dirs) with bounded row groups, the layout a
    // real large table actually has. Values are byte-identical.
    def writeOne(df: DataFrame, name: String,
        blockBytes: Long = 4L * 1024 * 1024, files: Int = 1): Unit = {
      val out = new java.io.File(s"$dst/$name.parquet")
      if (files > 1) {
        org.apache.commons.io.FileUtils.deleteQuietly(out): Unit
        df.repartition(files).write.mode("overwrite")
          .option("parquet.block.size", blockBytes)
          .parquet(out.toString)
      } else {
        val stage = s"$dst/_stage_$name"
        df.coalesce(1).write.mode("overwrite")
          .option("parquet.block.size", blockBytes)
          .parquet(stage)
        val dir = new java.io.File(stage)
        val part = dir.listFiles().filter(_.getName.endsWith(".parquet")).head
        if (out.exists()) out.delete()
        if (!part.renameTo(out))
          throw new java.io.IOException(s"could not move $part to $out")
        dir.listFiles().foreach(_.delete())
        dir.delete()
      }
      println(s"[genscale] $name: ${spark.read.parquet(out.toString).count()} rows")
    }

    new java.io.File(dst).mkdirs()

    // fixed-size dimensions: verbatim
    writeOne(tbl("region"), "region")
    writeOne(tbl("nation"), "nation")

    // per-copy key offsets — clean powers of ten above each source key range
    val C = 100000L   // c_custkey   (max 14,999 at sf0.1)
    val S = 10000L    // s_suppkey   (max 999)
    val P = 100000L   // p_partkey   (max 19,999)
    val O = 1000000L  // o_orderkey  (max 149,999)
    val E = 1000000L  // event_id    (max 99,999)
    val U = 10000L    // user_id     (max 1,499)
    val D = 10000L    // doc_id      (max 4,999)
    val V = 10000L    // vec_id      (max 1,999)

    writeOne(rep(tbl("customer"))
      .withColumn("c_custkey", col("c_custkey") + col("_copy") * C)
      .drop("_copy"), "customer", blockBytes = 2L * 1024 * 1024, files = 8)

    writeOne(rep(tbl("supplier"))
      .withColumn("s_suppkey", col("s_suppkey") + col("_copy") * S)
      .drop("_copy"), "supplier")

    writeOne(rep(tbl("part"))
      .withColumn("p_partkey", col("p_partkey") + col("_copy") * P)
      .drop("_copy"), "part", blockBytes = 2L * 1024 * 1024, files = 8)

    writeOne(rep(tbl("orders"))
      .withColumn("o_orderkey", col("o_orderkey") + col("_copy") * O)
      .withColumn("o_custkey", col("o_custkey") + col("_copy") * C)
      .drop("_copy"), "orders", files = 32)

    writeOne(rep(tbl("lineitem"))
      .withColumn("l_orderkey", col("l_orderkey") + col("_copy") * O)
      .withColumn("l_partkey", col("l_partkey") + col("_copy") * P)
      .withColumn("l_suppkey", col("l_suppkey") + col("_copy") * S)
      .drop("_copy"), "lineitem", files = 32)

    writeOne(rep(tbl("events"))
      .withColumn("event_id", col("event_id") + col("_copy") * E)
      .withColumn("user_id", col("user_id") + col("_copy") * U)
      // events stays a single FILE: the streaming landing dirs copy it
      // per micro-batch (one copy = one trigger), and splitting a copy
      // across triggers would let the watermark drop late rows mid-copy —
      // a VALUE change for the stateful stream keys, not a layout change
      .drop("_copy"), "events")

    writeOne(rep(tbl("documents"))
      .withColumn("doc_id", col("doc_id") + col("_copy") * D)
      .withColumn("text", when(col("_copy") === 0L, col("text"))
        .otherwise(concat(col("text"), lit(" v"), col("_copy"))))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("_copy"), "documents", blockBytes = 512L * 1024, files = 32)

    writeOne(rep(tbl("embeddings"))
      .withColumn("vec_id", col("vec_id") + col("_copy") * V)
      .withColumn("embedding", transform(col("embedding"),
        x => (x + col("_copy").cast("float") * lit(0.001f)).cast("float")))
      .drop("_copy"), "embeddings", blockBytes = 1024L * 1024, files = 32)

    spark.stop()
  }
}
