package graft
import org.apache.spark.sql.SparkSession

/** Single-key diagnostic runner: executes named `SparkEntry.queries`
  * keys against a scale dir under the BENCH session confs and prints
  * the real exception + trace on failure — what Bench's silent `-1`
  * cannot show (e.g. an executor OOM that killed the SparkContext and
  * failed every later key). `runMain graft.ProbeKey <sfDir> <key...>`;
  * heap via SPARK_DRIVER_MEM (the forked-run knob from build.sbt).
  */
object ProbeKey {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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
    args.drop(1).foreach { k =>
      try {
        val df = SparkEntry.queries(k)(spark, sfDir)
        df.write.mode("overwrite").format("noop").save()
        println(s"[probe] $k OK")
      } catch { case e: Throwable =>
        println(s"[probe] $k FAILED: ${e.getClass.getName}: ${e.getMessage}")
        e.getStackTrace.take(12).foreach(t => println("  at " + t))
        Option(e.getCause).foreach(c => println(s"  cause: ${c.getClass.getName}: ${c.getMessage}"))
      } finally spark.catalog.clearCache()
    }
    spark.stop()
  }
}
