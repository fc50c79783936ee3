object PlanPeek extends App {
  val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  for (k <- args) {
    println(s"===== $k")
    println(graft.SparkEntry.queries(k)(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString)
  }
  spark.stop()
}
