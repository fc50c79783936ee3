package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned joins over hive-partitioned commit-log tables:
  * with `spark.sql.sources.v2.bucketing.enabled=true`, two graft tables
  * partitioned on the same column must join — and aggregate on the
  * partition column — WITHOUT any shuffle exchange, because the scan
  * reports `KeyGroupedPartitioning` and plans one key-tagged split group
  * per partition value ([[org.apache.spark.sql.GraftKeyedBatch]]). This
  * is the V2 bucketed-join contract: at 100 TB it deletes the dominant
  * exchange of a fact-fact join whose layout was designed for it.
  *
  * The conf-off path must stay byte-identical to stock planning (bin-
  * packed splits, shuffle join) — SPJ is an opt-in, never a tax on scan
  * parallelism.
  */
class StoragePartitionedJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  private val warehouse =
    java.nio.file.Files.createTempDirectory("graft_spjwh").toString

  spark.conf.set("spark.sql.catalog.gsp", classOf[graft.catalog.GraftTableCatalog].getName)
  spark.conf.set("spark.sql.catalog.gsp.warehouse", warehouse)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS gsp.db")

  spark.sql("CREATE TABLE gsp.db.fa (k BIGINT, v DOUBLE, cat STRING) PARTITIONED BY (cat)")
  spark.sql("INSERT INTO gsp.db.fa SELECT id, id * 1.5, concat('c', id % 8) FROM range(0, 800)")
  spark.sql("INSERT INTO gsp.db.fa SELECT id, id * 2.5, concat('c', id % 8) FROM range(800, 1200)")
  spark.sql("CREATE TABLE gsp.db.fb (k BIGINT, w DOUBLE, cat STRING) PARTITIONED BY (cat)")
  spark.sql("INSERT INTO gsp.db.fb SELECT id, id * 0.5, concat('c', id % 8) FROM range(0, 640)")

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) =>
      k -> (try Some(spark.conf.get(k)) catch { case _: Exception => None })
    }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def spjOn(body: => Unit): Unit = withConfs(
    "spark.sql.sources.v2.bucketing.enabled" -> "true",
    "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")(body)

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private val joinSql =
    """SELECT a.cat, count(*) AS n, CAST(sum(a.v + b.w) AS DECIMAL(18,1)) AS s
      |FROM gsp.db.fa a JOIN gsp.db.fb b ON a.cat = b.cat
      |GROUP BY a.cat ORDER BY a.cat""".stripMargin

  test("co-partitioned join plans with ZERO shuffle exchanges under v2 bucketing") {
    spjOn {
      val df = spark.sql(joinSql)
      val p = planOf(df)
      assert(!p.contains("Exchange hashpartitioning"),
        s"SPJ must not shuffle either side or the aggregation:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      // and the values still match the conf-off (shuffled) plan
      val spj = df.collect().map(_.toSeq).toSeq
      withConfs("spark.sql.sources.v2.bucketing.enabled" -> "false") {
        val stock = spark.sql(joinSql).collect().map(_.toSeq).toSeq
        assert(spj == stock)
      }
    }
  }

  test("aggregation keyed on the partition column needs no exchange") {
    spjOn {
      val agg = spark.sql(
        "SELECT cat, count(*) AS n FROM gsp.db.fa GROUP BY cat")
      val p = planOf(agg)
      assert(!p.contains("Exchange hashpartitioning"),
        s"partition-keyed aggregation must reuse the key grouping:\n$p")
      assert(agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        .forall { case (_, n) => n == 150 })
    }
  }

  test("conf off keeps stock bin-packed planning (no key grouping, shuffles back)") {
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val p = planOf(spark.sql(joinSql))
      assert(p.contains("Exchange hashpartitioning"), p)
    }
  }

  test("partition pruning composes with the keyed batch") {
    spjOn {
      val one = spark.sql("SELECT k FROM gsp.db.fa WHERE cat = 'c3'")
      val files = one.queryExecution.executedPlan
        .collect { case b: BatchScanExec => b }
        .flatMap(_.inputRDD.partitions.toSeq.flatMap {
          case p: org.apache.spark.sql.execution.datasources.v2.DataSourceRDDPartition =>
            p.inputPartitions.toSeq.flatMap {
              case fp: FilePartition => fp.files.map(_.urlEncodedPath).toSeq
              case _ => Seq.empty[String]
            }
          case _ => Seq.empty[String]
        })
      assert(files.nonEmpty)
      assert(files.forall(f => f.contains("cat%3Dc3") || f.contains("cat=c3")),
        files.take(3).mkString(", "))
      assert(one.count() == 150)
    }
  }

  test("dynamic partition pruning fires on a partitioned catalog fact table") {
    spark.sql("CREATE TABLE gsp.db.dim (cat STRING, flag INT)")
    spark.sql("INSERT INTO gsp.db.dim VALUES " +
      (0 until 8).map(i => s"('c$i', ${i % 4})").mkString(", "))
    val q =
      """SELECT count(*) AS n FROM gsp.db.fa a
        |JOIN gsp.db.dim d ON a.cat = d.cat
        |WHERE d.flag = 1""".stripMargin
    // AQE off for plan introspection only: the executed node instances
    // stay in queryExecution.executedPlan so the post-execution file
    // list is inspectable (DPP itself fires in both modes)
    withConfs("spark.sql.adaptive.enabled" -> "false") {
      val df = spark.sql(q)
      val p = df.queryExecution.executedPlan.toString
      assert(p.toLowerCase.contains("dynamicpruning"),
        s"DPP subquery must plant on the fact scan:\n$p")
      // collect() executes THIS queryExecution (head() would execute a
      // cloned limit-plan, leaving these nodes unexecuted for inspection)
      assert(df.collect().head.getLong(0) == 300L)   // cats c1,c5 → 150 rows each
      // execution-time proof: the fact scan planned ONLY the 2 matching
      // partitions' files (filter() folded the runtime key set in)
      val factFiles = df.queryExecution.executedPlan.collect {
        case b: BatchScanExec if !b.output.map(_.name).contains("flag") => b
      }.flatMap(_.inputRDD.partitions.toSeq.flatMap {
        case dp: org.apache.spark.sql.execution.datasources.v2.DataSourceRDDPartition =>
          dp.inputPartitions.toSeq.flatMap {
            case fp: FilePartition => fp.files.map(_.urlEncodedPath).toSeq
            case _ => Seq.empty[String]
          }
        case _ => Seq.empty[String]
      })
      assert(factFiles.nonEmpty)
      assert(factFiles.forall(f => f.contains("cat=c1") || f.contains("cat%3Dc1") ||
        f.contains("cat=c5") || f.contains("cat%3Dc5")),
        s"DPP should leave only c1/c5 files: ${factFiles.take(4)}")
    }
  }

  test("footer aggregate pushdown reaches the scan (PushedAggregation in the plan)") {
    spark.sql("CREATE TABLE gsp.db.flat AS SELECT id AS k, id * 2 AS v FROM range(0, 500)")
    withConfs("spark.sql.parquet.aggregatePushdown" -> "true",
        // the manifest-stats rewrite would answer without any scan;
        // this test pins Spark's FOOTER pushdown specifically
        "spark.graft.countStar.enabled" -> "false") {
      val df = spark.sql("SELECT count(*) AS n, min(k) AS lo, max(k) AS hi FROM gsp.db.flat")
      val p = planOf(df)
      assert(p.contains("PushedAggregation: [COUNT(*)") ||
        p.contains("PushedAggregation: [MIN("), s"aggregate not pushed:\n$p")
      val r = df.collect().head
      assert(r.getLong(0) == 500L && r.getLong(1) == 0L && r.getLong(2) == 499L)
    }
  }

  test("every row of a keyed split group carries the group's partition key") {
    spjOn {
      // distinct (spark_partition_id → cat) must be 1:1 when the scan is
      // key-grouped: rows of different partition values never share a task
      import spark.implicits._
      val pairs = spark.table("gsp.db.fa")
        .select(org.apache.spark.sql.functions.spark_partition_id().as("pid"),
          org.apache.spark.sql.functions.col("cat"))
        .distinct().as[(Int, String)].collect()
      val byPid = pairs.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
      assert(byPid.values.forall(_.length == 1),
        s"a task mixed partition values: $byPid")
    }
  }
}
