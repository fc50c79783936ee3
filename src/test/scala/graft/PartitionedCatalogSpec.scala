package graft

import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Partitioned commit-log tables through the SQL front door:
  * `CREATE TABLE ... PARTITIONED BY`, INSERT routing to the hive layout,
  * partition-pruned scans (planned-file assertion), the MoR DELETE tier,
  * and SQL UPDATE/MERGE rewrites that keep the hive layout (staged rows
  * re-partitioned before the replace publishes).
  */
class PartitionedCatalogSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val warehouse =
    java.nio.file.Files.createTempDirectory("graft_pwh").toString

  spark.conf.set("spark.sql.catalog.gp", classOf[graft.catalog.GraftTableCatalog].getName)
  spark.conf.set("spark.sql.catalog.gp.warehouse", warehouse)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS gp.db")

  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
      .flatMap { b =>
        b.inputRDD.partitions.toSeq.flatMap {
          case p: org.apache.spark.sql.execution.datasources.v2.DataSourceRDDPartition =>
            p.inputPartitions.toSeq.flatMap {
              case fp: FilePartition => fp.files.map(_.urlEncodedPath).toSeq
              case _ => Seq.empty[String]
            }
          case _ => Seq.empty[String]
        }
      }

  test("PARTITIONED BY: insert lands hive layout, scans prune to the partition") {
    spark.sql("CREATE TABLE gp.db.pt (k BIGINT, v STRING, cat STRING) PARTITIONED BY (cat)")
    spark.sql("INSERT INTO gp.db.pt SELECT id AS k, concat('v', id) AS v, " +
      "concat('cat', id % 4) AS cat FROM range(0, 400)")
    spark.sql("INSERT INTO gp.db.pt SELECT id AS k, concat('v', id) AS v, " +
      "concat('cat', id % 4) AS cat FROM range(400, 800)")

    assert(spark.sql("SELECT count(*) FROM gp.db.pt").as[Long].head() == 800)
    // partition column survives the catalog read with declared order
    assert(spark.sql("SELECT * FROM gp.db.pt").columns.toSeq == Seq("k", "v", "cat"))
    assert(spark.sql("SELECT count(*) FROM gp.db.pt WHERE cat = 'cat1'")
      .as[Long].head() == 200)

    // the planned scan touches ONLY the matching partition's files
    val pruned = spark.sql("SELECT k FROM gp.db.pt WHERE cat = 'cat2'")
    val files = plannedFiles(pruned)
    assert(files.nonEmpty)
    assert(files.forall(_.contains("cat%3Dcat2") || files.forall(_.contains("cat=cat2"))),
      files.take(3).mkString(", "))

    // SHOW-style metadata reports the partitioning
    val table = spark.sessionState.catalogManager.catalog("gp")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "pt"))
    assert(table.partitioning().map(_.toString).toSeq == Seq("identity(cat)"))
  }

  test("DELETE on a partitioned table is merge-on-read; fold keeps the layout") {
    spark.sql("CREATE TABLE gp.db.pd (k BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql("INSERT INTO gp.db.pd SELECT id, concat('c', id % 3) FROM range(0, 300)")
    spark.sql("DELETE FROM gp.db.pd WHERE k < 30")
    assert(spark.sql("SELECT count(*) FROM gp.db.pd").as[Long].head() == 270)
    // tombstones live as DVs; the fold keeps partition layout + spec
    spark.sql("CALL gp.system.rewrite_deletes('db.pd')").collect()
    assert(spark.sql("SELECT count(*) FROM gp.db.pd").as[Long].head() == 270)
    val root = s"$warehouse/db/pd"
    val log = new graft.catalog.CommitLog(spark, root)
    val v = log.currentVersion.get
    assert(log.dvFiles(v).isEmpty)
    assert(log.partitionColumns(v) == Seq("cat"))
  }

  test("SQL UPDATE and MERGE keep the hive layout and pruning; INSERT OVERWRITE re-lays out") {
    spark.sql("CREATE TABLE gp.db.pm (k BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql("INSERT INTO gp.db.pm SELECT id, concat('c', id % 2) FROM range(0, 10)")
    val log = new graft.catalog.CommitLog(spark, s"$warehouse/db/pm")

    spark.sql("UPDATE gp.db.pm SET k = k + 100 WHERE k = 1")
    assert(spark.sql("SELECT count(*) FROM gp.db.pm WHERE k = 101").as[Long].head() == 1)
    assert(spark.sql("SELECT count(*) FROM gp.db.pm").as[Long].head() == 10)
    assert(log.partitionColumns(log.currentVersion.get) == Seq("cat"))
    assert(log.files(log.currentVersion.get).forall(_.startsWith("cat=")),
      log.files(log.currentVersion.get).take(3))

    // MERGE: one matched update (k=0 hops to c1), one not-matched insert
    Seq((0L, "c1"), (42L, "c0")).toDF("k", "cat").createOrReplaceTempView("pm_src")
    spark.sql("""MERGE INTO gp.db.pm t USING pm_src s ON t.k = s.k
                 WHEN MATCHED THEN UPDATE SET t.cat = s.cat
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT count(*) FROM gp.db.pm").as[Long].head() == 11)
    assert(spark.sql("SELECT cat FROM gp.db.pm WHERE k = 0").as[String].head() == "c1")
    assert(log.partitionColumns(log.currentVersion.get) == Seq("cat"))

    // the planned scan still opens only the hit partition after the rewrite
    val files = plannedFiles(spark.sql("SELECT k FROM gp.db.pm WHERE cat = 'c1'"))
    assert(files.nonEmpty &&
      files.forall(f => f.contains("cat%3Dc1") || f.contains("cat=c1")), files.take(3))

    spark.sql("INSERT OVERWRITE gp.db.pm SELECT id, concat('c', id % 2) FROM range(0, 4)")
    assert(spark.sql("SELECT count(*) FROM gp.db.pm").as[Long].head() == 4)
    assert(log.partitionColumns(log.currentVersion.get) == Seq("cat"))
  }

  test("static partition INSERT OVERWRITE rewrites only that partition") {
    spark.sql("CREATE TABLE gp.db.po (k BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql("INSERT INTO gp.db.po SELECT id, concat('c', id % 2) FROM range(0, 10)")
    val log = new graft.catalog.CommitLog(spark, s"$warehouse/db/po")
    val before = log.files(log.currentVersion.get)

    spark.sql("INSERT OVERWRITE gp.db.po PARTITION (cat = 'c1') " +
      "SELECT id + 100 AS k FROM range(0, 3)")
    assert(spark.sql("SELECT count(*) FROM gp.db.po WHERE cat = 'c0'").as[Long].head() == 5,
      "the untouched partition must keep its rows")
    assert(spark.sql("SELECT k FROM gp.db.po WHERE cat = 'c1' ORDER BY k")
      .as[Long].collect().toSeq == Seq(100L, 101L, 102L))
    val after = log.files(log.currentVersion.get)
    assert(after.forall(_.startsWith("cat=")))
    assert(before.filter(_.startsWith("cat=c0")).forall(after.contains),
      "c0's files must carry by name through a c1 overwrite")
    assert(log.partitionColumns(log.currentVersion.get) == Seq("cat"))
  }

  test("CALL history lists versions newest-first with counts and partition spec") {
    spark.sql("CREATE TABLE gp.db.ph (k BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql("INSERT INTO gp.db.ph SELECT id, concat('c', id % 2) FROM range(0, 10)")
    spark.sql("INSERT INTO gp.db.ph SELECT id, concat('c', id % 2) FROM range(10, 20)")
    spark.sql("DELETE FROM gp.db.ph WHERE k = 3")
    val h = spark.sql("CALL gp.system.history('db.ph')").collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(3L, 2L, 1L))   // newest first
    assert(h.map(_.getString(1)).toSeq == Seq("delete_mor", "append", "append"),
      h.map(_.getString(1)).toSeq.toString)                // operation tags
    assert(h.forall(_.getString(6) == "cat"))
    val head = h.head
    assert(head.getInt(4) > 0, "head must report the delete's DV file")
    assert(h.last.getInt(4) == 0)
    assert(head.getInt(3) >= h.last.getInt(3), "appends accumulate files")
  }

  test("streaming tail of a partitioned catalog table keeps partition columns") {
    spark.sql("CREATE TABLE gp.db.ps (k BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql("INSERT INTO gp.db.ps SELECT id, concat('c', id % 2) FROM range(0, 20)")
    val out = java.nio.file.Files.createTempDirectory("gp_sink").toString
    val cp = java.nio.file.Files.createTempDirectory("gp_cp").toString
    val q = spark.readStream.table("gp.db.ps").writeStream
      .format("parquet").option("path", out).option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.read.parquet(out).as[(Long, String)].collect()
    assert(rows.length == 20)
    assert(rows.forall { case (k, c) => c == s"c${k % 2}" })
  }
}
