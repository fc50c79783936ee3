package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** Bucketed co-located join — the shuffle-elimination pattern for the
  * recurring big⋈big join at 100 TB.
  *
  * A repeated fact⋈fact join (lineitem ⋈ orders on orderkey, run by every
  * downstream report) pays a full shuffle of BOTH sides every execution.
  * Bucketing amortizes it: write each table hash-partitioned into B
  * buckets on the join key (+ sorted within buckets), and every
  * subsequent sort-merge join on that key reads co-located buckets with
  * ZERO exchange and ZERO sort — the once-per-write shuffle replaces the
  * per-query one. PlanSpec asserts the no-Exchange plan.
  *
  * The declared query `q_join_bucketed` materializes the bucketed copies
  * on first use in the session (idempotent; the write is billed once),
  * joins them, and must hash-match the plain-join oracle — bucketing is
  * pure physical layout, the relational result is unchanged.
  *
  * Bucket metadata lives in the session catalog (`saveAsTable`); at scale
  * this is the Hive-metastore / table-format layout contract. One file
  * per bucket (repartition on the key before write) so the within-bucket
  * sort is honored by the reader.
  */
object Bucketed {

  val Buckets = 8

  private def tag(d: String): String =
    java.lang.Integer.toHexString(d.hashCode)

  /** The in-memory catalog is per-JVM but the warehouse directory is not:
    * a table absent from the catalog whose location survives from an
    * earlier run makes saveAsTable fail with LOCATION_ALREADY_EXISTS —
    * clear the stale location first (Hadoop FS, portable off-local).
    */
  private def dropStaleLocation(s: SparkSession, table: String): Unit = {
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$wh/${table.toLowerCase}")
    val hfs = loc.getFileSystem(s.sessionState.newHadoopConf())
    if (hfs.exists(loc)) hfs.delete(loc, true): Unit
  }

  /** Idempotently create the bucketed copies for this sf dir. */
  def ensure(s: SparkSession, d: String): (String, String) = {
    val lt = s"lineitem_bkt_${tag(d)}"
    val ot = s"orders_bkt_${tag(d)}"
    if (!s.catalog.tableExists(lt)) {
      dropStaleLocation(s, lt)
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"))
        .repartition(Buckets, col("l_orderkey"))
        .write.bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(lt)
    }
    if (!s.catalog.tableExists(ot)) {
      dropStaleLocation(s, ot)
      orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"))
        .repartition(Buckets, col("o_orderkey"))
        .write.bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(ot)
    }
    (lt, ot)
  }

  /** Declared query: quantity stats per order status over the co-located
    * join. Identical rows to the plain join (the oracle runs the plain
    * form over the raw parquet).
    */
  private def joinBucketed(s: SparkSession, d: String): DataFrame = {
    val (lt, ot) = ensure(s, d)
    val l = s.table(lt)
    val o = s.table(ot)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_lines"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"))
      .orderBy(col("o_orderstatus"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_bucketed" -> joinBucketed _,
  )

  /** Bucketed-copy build as untimed bench fixture work — the key measures
    * the zero-exchange join, not the once-per-layout bucketing write
    * (which is the amortized cost the layout exists to pay once).
    */
  val setups: Map[String, (SparkSession, String) => Unit] = Map(
    "q_join_bucketed" -> ((s, d) => { ensure(s, d): Unit }),
  )

  val oracle: Map[String, String] = Map(
    "q_join_bucketed" ->
      """SELECT o_orderstatus, count(*) AS n_lines,
        |  count(DISTINCT o_orderkey) AS n_orders,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
  )
}
