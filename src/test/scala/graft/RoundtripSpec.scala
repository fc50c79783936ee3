package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.2-B unit-only source/sink keys: CSV and JSON round-trips
  * with explicit schemas, and the partitioned sink + partition-pruned
  * read-back (reference landing-zone layout, cft/sourceSystem.yaml:66-77).
  */
class RoundtripSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_rt").toString

  test("src_csv_roundtrip: region writes to CSV and reads back identically") {
    val dir = tmp()
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    region.write.option("header", "true").csv(s"$dir/region_csv")
    val back = spark.read.schema(region.schema).option("header", "true")
      .csv(s"$dir/region_csv")
    assert(back.orderBy("r_regionkey").collect().toSeq ==
      region.orderBy("r_regionkey").collect().toSeq)
  }

  test("src_json_roundtrip: nation writes to JSON lines and reads back") {
    val dir = tmp()
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    nation.write.json(s"$dir/nation_json")
    val back = spark.read.schema(nation.schema).json(s"$dir/nation_json")
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("src_orc_roundtrip: customer writes to ORC and reads back, filter pushed to scan") {
    val dir = tmp()
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    customer.write.orc(s"$dir/customer_orc")
    val back = spark.read.orc(s"$dir/customer_orc")
    assert(back.orderBy("c_custkey").collect().toSeq ==
      customer.orderBy("c_custkey").collect().toSeq)
    // ORC scans take pushed filters like parquet ones — the columnar
    // source contract holds across both lake formats
    val filtered = back.filter(col("c_custkey") === 1)
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,1)]"),
      s"c_custkey filter not pushed to ORC scan:\n$scan")
  }

  test("sink_partitioned: orders partitioned by year, one partition read back pruned") {
    val dir = tmp()
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    orders.withColumn("o_year", year(col("o_orderdate")))
      .write.partitionBy("o_year").parquet(s"$dir/orders_part")
    // reading one partition directory touches only that partition's files
    val part = spark.read.parquet(s"$dir/orders_part")
      .filter(col("o_year") === 1995)
    val expected = orders.filter(year(col("o_orderdate")) === 1995).count()
    assert(part.count() == expected && expected > 0)
    // partition filter must prune at plan time, not post-scan: the
    // predicate lands in the scan's PartitionFilters (directory-level
    // pruning — non-matching years are never opened), NOT as a data
    // filter evaluated per row after reading everything
    val planned = part.queryExecution.executedPlan.toString
    val scanLine = planned.linesIterator
      .find(_.contains("PartitionFilters:")).getOrElse("")
    assert(scanLine.contains("o_year") && scanLine.contains("1995"),
      s"year predicate not in PartitionFilters:\n$planned")
    assert(scanLine.contains("PushedFilters:"),
      s"scan line format changed — no PushedFilters token: $scanLine")
    val pf = scanLine.split("PushedFilters:")(1)
    assert(pf.trim.startsWith("[]"),
      s"partition predicate leaked into data filters: $scanLine")
  }
}
