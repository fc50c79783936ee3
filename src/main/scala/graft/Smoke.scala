package graft

import org.apache.spark.sql.SparkSession

/** Local stand-in for the driver's t1 smoke: runs SparkEntry.entry and
  * prints the row count (driver requires rows > 0 on sf0.001).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // standard micros timestamps on every parquet WRITE: INT96 (the
      // Spark default) records no usable footer stats, which blinds the
      // manifest stats tier (readWhere/expireBefore pruning) on ts columns
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows = $n")
    spark.stop()
  }
}
