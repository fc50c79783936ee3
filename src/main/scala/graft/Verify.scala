package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Session-wide TIMESTAMP_MICROS (needed for commit-log footer stats)
    * serializes session-local TimestampType with isAdjustedToUTC=true, which
    * DuckDB reads as TIMESTAMP WITH TIME ZONE while the oracle computes plain
    * TIMESTAMP — the round-13 11-key schema break. The session is pinned UTC,
    * so casting TimestampType→TimestampNTZType at the dump edge is a pure
    * schema relabel: identical micros values, isAdjustedToUTC=false. */
  private def dropTz(dt: DataType): DataType = dt match {
    case TimestampType        => TimestampNTZType
    case ArrayType(e, n)      => ArrayType(dropTz(e), n)
    case MapType(k, v, n)     => MapType(dropTz(k), dropTz(v), n)
    case StructType(fields)   =>
      StructType(fields.map(f => f.copy(dataType = dropTz(f.dataType))))
    case other                => other
  }
  /** Dev escape hatch: SPARK_GRAFT_RAW_DUMP=1 skips the tz relabel, to
    * reproduce the driver-side failure mode when auditing check.py. */
  private val rawDump = sys.env.get("SPARK_GRAFT_RAW_DUMP").contains("1")
  def tzStableDump(df: DataFrame): DataFrame = {
    if (rawDump) return df
    val cols = df.schema.fields.map { f =>
      val t = dropTz(f.dataType)
      if (t == f.dataType) org.apache.spark.sql.functions.col(f.name)
      else org.apache.spark.sql.functions.col(f.name).cast(t).as(f.name)
    }
    if (cols.isEmpty) df else df.select(cols.toSeq: _*)
  }
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional trailing args = dump only these keys (dev loop); the
    // oracle json is filtered to match so check.py compares exactly them
    val only: Set[String] = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // standard micros timestamps on every parquet WRITE: INT96 (the
      // Spark default) records no usable footer stats, which blinds the
      // manifest stats tier (readWhere/expireBefore pruning) on ts columns
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try tzStableDump(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // A key that crashes before the oracle must still surface in the
        // driver's compare (r7 lost 7 keys to silent absence). Dump a
        // sentinel one-row result whose schema can never match an oracle,
        // so the key shows up as a FAILING row instead of vanishing.
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        try {
          import spark.implicits._
          Seq(Option(e.getMessage).getOrElse(e.getClass.getName).take(500))
            .toDF("__graft_query_error")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case e2: Throwable =>
          System.err.println(s"[verify] $name sentinel dump failed: ${e2.getMessage}")
        }
      }
      // queries persist() shared subplans; drop them so cached blocks
      // don't accumulate across the whole suite
      finally spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
