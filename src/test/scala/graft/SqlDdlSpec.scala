package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.CommitLog

/** Standard-SQL DDL front doors wired in round 10: `ALTER TABLE ... ADD/
  * DROP CONSTRAINT ... CHECK` onto the commit log's `#check:` header,
  * and DEFAULT column values through the V2 catalog capability (INSERTs
  * omitting the column are filled by the analyzer; `ADD COLUMN ...
  * DEFAULT` backfills pre-existing rows via EXISTS_DEFAULT at read
  * time). Unique catalog name per suite: `gdl`.
  */
class SqlDdlSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val warehouse: String = {
    val w = java.nio.file.Files.createTempDirectory("graft_ddlwh").toString
    spark.conf.set("spark.sql.catalog.gdl", classOf[graft.catalog.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdl.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdl.db")
    w
  }

  test("ALTER TABLE ADD CONSTRAINT CHECK gates writes; DROP CONSTRAINT lifts") {
    warehouse
    spark.sql("CREATE TABLE gdl.db.c AS SELECT id AS k, id + 1 AS qty FROM range(0, 10)")
    spark.sql("ALTER TABLE gdl.db.c ADD CONSTRAINT qty_pos CHECK (qty > 0)")
    val log = new CommitLog(spark, s"$warehouse/db/c")
    assert(log.checkConstraints == Map("qty_pos" -> "qty > 0"))
    val ex = intercept[Exception] { spark.sql("INSERT INTO gdl.db.c VALUES (100, -1)") }
    def mentions(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("qty_pos")) || mentions(t.getCause))
    assert(mentions(ex), s"INSERT must hit the named gate: ${ex.getMessage}")
    assert(spark.table("gdl.db.c").count() == 10)
    spark.sql("ALTER TABLE gdl.db.c DROP CONSTRAINT qty_pos")
    assert(log.checkConstraints.isEmpty)
    spark.sql("INSERT INTO gdl.db.c VALUES (100, -1)")
    assert(spark.table("gdl.db.c").count() == 11)
  }

  test("ADD CONSTRAINT on an empty table holds from the first byte") {
    warehouse
    spark.sql("CREATE TABLE gdl.db.e (k BIGINT, qty INT)")
    spark.sql("ALTER TABLE gdl.db.e ADD CONSTRAINT qty_pos CHECK (qty > 0)")
    intercept[Exception] { spark.sql("INSERT INTO gdl.db.e VALUES (1, -1)") }
    spark.sql("INSERT INTO gdl.db.e VALUES (1, 1)")
    assert(spark.table("gdl.db.e").count() == 1)
  }

  test("ADD CONSTRAINT refuses when existing rows violate") {
    warehouse
    spark.sql("CREATE TABLE gdl.db.v AS SELECT id - 5 AS k FROM range(0, 10)")
    val ex = intercept[Exception] {
      spark.sql("ALTER TABLE gdl.db.v ADD CONSTRAINT k_pos CHECK (k >= 0)")
    }
    def mentions(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("violate")) || mentions(t.getCause))
    assert(mentions(ex), s"got: ${ex.getMessage}")
    assert(new CommitLog(spark, s"$warehouse/db/v").checkConstraints.isEmpty)
  }

  test("DEFAULT column values: CREATE, INSERT omission, SET/DROP DEFAULT") {
    warehouse
    spark.sql("CREATE TABLE gdl.db.d (k BIGINT, status STRING DEFAULT 'NEW')")
    spark.sql("INSERT INTO gdl.db.d (k) VALUES (1)")
    spark.sql("INSERT INTO gdl.db.d VALUES (2, DEFAULT)")
    spark.sql("INSERT INTO gdl.db.d VALUES (3, 'DONE')")
    assert(spark.sql("SELECT status FROM gdl.db.d ORDER BY k")
      .collect().map(_.getString(0)).toSeq == Seq("NEW", "NEW", "DONE"))
    spark.sql("ALTER TABLE gdl.db.d ALTER COLUMN status SET DEFAULT 'OPEN'")
    spark.sql("INSERT INTO gdl.db.d (k) VALUES (4)")
    assert(spark.sql("SELECT status FROM gdl.db.d WHERE k = 4").head().getString(0) == "OPEN")
    spark.sql("ALTER TABLE gdl.db.d ALTER COLUMN status DROP DEFAULT")
    spark.sql("INSERT INTO gdl.db.d (k) VALUES (5)")
    assert(spark.sql("SELECT status FROM gdl.db.d WHERE k = 5").head().isNullAt(0))
  }

  test("ADD COLUMN ... DEFAULT backfills pre-existing rows at read time") {
    warehouse
    spark.sql("CREATE TABLE gdl.db.b AS SELECT id AS k FROM range(0, 3)")
    spark.sql("ALTER TABLE gdl.db.b ADD COLUMN tier STRING DEFAULT 'basic'")
    // old rows (files lack the column) read the exists-default, not NULL
    assert(spark.sql("SELECT tier FROM gdl.db.b")
      .collect().map(_.getString(0)).toSeq == Seq.fill(3)("basic"))
    spark.sql("INSERT INTO gdl.db.b VALUES (10, 'gold')")
    spark.sql("INSERT INTO gdl.db.b (k) VALUES (11)")
    assert(spark.sql("SELECT k, tier FROM gdl.db.b ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq(0L -> "basic", 1L -> "basic", 2L -> "basic", 10L -> "gold", 11L -> "basic"))
  }

  test("constraints surface through the V2 table handle") {
    warehouse
    spark.sql("CREATE TABLE gdl.db.s AS SELECT id AS k FROM range(0, 5)")
    spark.sql("ALTER TABLE gdl.db.s ADD CONSTRAINT k_nn CHECK (k IS NOT NULL)")
    val cat = spark.sessionState.catalogManager.catalog("gdl")
      .asInstanceOf[graft.catalog.GraftTableCatalog]
    val t = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("db"), "s"))
    val cs = t.constraints()
    assert(cs.length == 1 && cs.head.name() == "k_nn" && cs.head.enforced(),
      cs.mkString(", "))
  }

  test("column nullability rides the constraint plane") {
    warehouse
    spark.sql("CREATE TABLE gdl.db.nn (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gdl.db.nn VALUES (1, 10), (2, NULL)")
    // Spark's analyzer refuses `ALTER COLUMN ... SET NOT NULL` for V2
    // catalogs outright, so SET goes through the catalog API (the same
    // TableChange Spark would send); the proof scan refuses over an
    // existing NULL
    val cat = spark.sessionState.catalogManager.catalog("gdl")
      .asInstanceOf[graft.catalog.GraftTableCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "nn")
    def setNotNull(): Unit = cat.alterTable(ident,
      org.apache.spark.sql.connector.catalog.TableChange
        .updateColumnNullability(Array("v"), false)): Unit
    def mentions(t: Throwable, s: String): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains(s)) ||
        mentions(t.getCause, s))
    val ex = intercept[Exception] { setNotNull() }
    assert(mentions(ex, "v_not_null"),
      s"SET NOT NULL over an existing NULL must refuse: ${ex.getMessage}")
    spark.sql("DELETE FROM gdl.db.nn WHERE v IS NULL")
    setNotNull()
    assert(!spark.table("gdl.db.nn").schema("v").nullable)
    val ex2 = intercept[Exception] {
      spark.sql("INSERT INTO gdl.db.nn VALUES (3, NULL)")
    }
    // the declared non-nullable schema makes Spark's own writer assert
    // fire first (NOT_NULL_ASSERT_VIOLATION); the constraint is the
    // backstop for library-plane commits
    assert(mentions(ex2, "v_not_null") || mentions(ex2, "NOT_NULL"),
      s"NOT NULL must gate writes: ${ex2.getMessage}")
    // DROP NOT NULL does flow through plain SQL
    spark.sql("ALTER TABLE gdl.db.nn ALTER COLUMN v DROP NOT NULL")
    spark.sql("INSERT INTO gdl.db.nn VALUES (3, NULL)")
    assert(spark.table("gdl.db.nn").count() == 2)
  }

  test("ALTER COLUMN COMMENT lands in DESCRIBE") {
    warehouse
    spark.sql("CREATE TABLE gdl.db.cm (k BIGINT, qty BIGINT)")
    spark.sql("ALTER TABLE gdl.db.cm ALTER COLUMN qty COMMENT 'units ordered'")
    val d = spark.sql("DESCRIBE TABLE gdl.db.cm").collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(d.get("qty").contains("units ordered"), d.toString)
  }

  test("TBLPROPERTIES-declared auto-compact folds with no session conf") {
    warehouse
    import spark.implicits._
    // the declared-on-the-table posture: ANY writer session honors the
    // maintenance policy, not just one that remembered a session conf
    spark.sql("CREATE TABLE gdl.db.ac (k BIGINT) TBLPROPERTIES " +
      "('spark.graft.autoCompact.minSmallFiles' = '3')")
    for (i <- 1 to 3) spark.sql(s"INSERT INTO gdl.db.ac VALUES ($i)")
    val log = new CommitLog(spark, s"$warehouse/db/ac")
    assert(log.currentFileCount == 1,
      s"3 declared-threshold inserts must fold, files=${log.currentFileCount}")
    assert(log.operation(log.currentVersion.get) == "compact")
    assert(spark.table("gdl.db.ac").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
  }

  test("TBLPROPERTIES-declared fold ratio: MoR debt folds with no session conf") {
    warehouse
    import spark.implicits._
    spark.sql("CREATE TABLE gdl.db.fr (k BIGINT, v STRING) TBLPROPERTIES " +
      "('spark.graft.rewriteDeletes.maxDebtRatio' = '0.2')")
    spark.sql("INSERT INTO gdl.db.fr SELECT id, CONCAT('v', id) FROM range(1, 101)")
    val log = new CommitLog(spark, s"$warehouse/db/fr")
    // 30 tombstones / ~130 tagged rows crosses the declared 20%: the
    // MoR delete's own publish folds — no conf, no CALL, any session
    log.updateWhereMoR(org.apache.spark.sql.functions.col("k") <= 30,
      Seq("v" -> org.apache.spark.sql.functions.lit("upd")))
    val head = log.currentVersion.get
    assert(log.dvFiles(head).isEmpty,
      s"declared ratio must fold from the commit path, dvs=${log.dvFiles(head)}")
    assert(log.operation(head) == "rewrite_deletes")
    assert(spark.table("gdl.db.fr").where("v = 'upd'").count() == 30)
  }

  test("TBLPROPERTIES-declared vacuum retention reclaims released versions") {
    warehouse
    import spark.implicits._
    spark.sql("CREATE TABLE gdl.db.vr (k BIGINT) TBLPROPERTIES " +
      "('spark.graft.vacuum.retentionMs' = '3600000')")
    spark.sql("INSERT INTO gdl.db.vr VALUES (1)")                     // v1
    spark.sql("INSERT OVERWRITE gdl.db.vr VALUES (2)")                // v2
    val root = s"$warehouse/db/vr"
    val log = new CommitLog(spark, root)
    assert(log.history().map(_.version).sorted == Seq(1L, 2L),
      "inside the window nothing drops")
    // age v1 past the declared hour, then the next commit sweeps it
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.setTimes(new org.apache.hadoop.fs.Path(
      s"$root/_commits/00000001.manifest"),
      System.currentTimeMillis() - 2L * 3600000L, -1)
    spark.sql("INSERT INTO gdl.db.vr VALUES (3)")                     // v3
    assert(new CommitLog(spark, root).history().map(_.version).sorted ==
      Seq(2L, 3L), "the released v1 must reclaim from the commit path")
    assert(spark.table("gdl.db.vr").as[Long].collect().sorted.toSeq ==
      Seq(2L, 3L))
  }

  test("TBLPROPERTIES: create captures, SHOW reads, SET/UNSET mutate") {
    warehouse
    spark.sql("CREATE TABLE gdl.db.p (k BIGINT) " +
      "TBLPROPERTIES ('team' = 'data', 'tier' = 'gold')")
    def props(): Map[String, String] =
      spark.sql("SHOW TBLPROPERTIES gdl.db.p").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props().get("team").contains("data"), props().toString)
    assert(props().get("tier").contains("gold"))
    spark.sql("ALTER TABLE gdl.db.p SET TBLPROPERTIES ('tier' = 'silver', 'ttl' = '30d')")
    assert(props().get("tier").contains("silver") && props().get("ttl").contains("30d"))
    spark.sql("ALTER TABLE gdl.db.p UNSET TBLPROPERTIES ('team')")
    assert(!props().contains("team"), props().toString)
    // engine-derived keys stay present on the handle (SHOW filters
    // reserved keys), never shadowed by the sidecar
    val cat = spark.sessionState.catalogManager.catalog("gdl")
      .asInstanceOf[graft.catalog.GraftTableCatalog]
    val t = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("db"), "p"))
    assert(t.properties().get("provider") == "graft")
    assert(t.properties().get("location") != null)
    assert(t.properties().get("tier") == "silver")
  }

  test("CALL maintain_all services a cold table's declared policies across a namespace") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdl.mnt")
    // `hot` declares a fold ratio via DDL, accumulates MoR debt under a
    // handle that latched empty props, then goes COLD
    spark.sql("CREATE TABLE gdl.mnt.debt (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gdl.mnt.debt SELECT id, CONCAT('v', id) FROM range(1, 101)")
    val log = new CommitLog(spark, s"$warehouse/mnt/debt")
    log.updateWhereMoR(org.apache.spark.sql.functions.col("k") <= 30,
      Seq("v" -> org.apache.spark.sql.functions.lit("upd")))
    assert(log.dvFiles(log.currentVersion.get).nonEmpty, "debt accrued cold")
    // the policy lands AFTER the debt, with no further commits
    spark.sql("ALTER TABLE gdl.mnt.debt SET TBLPROPERTIES " +
      "('spark.graft.rewriteDeletes.maxDebtRatio' = '0.1')")
    // `plain` declares nothing
    spark.sql("CREATE TABLE gdl.mnt.plain (k BIGINT)")
    spark.sql("INSERT INTO gdl.mnt.plain VALUES (1)")
    val rows = spark.sql("CALL gdl.system.maintain_all('mnt')").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rows("mnt.debt")._1.contains("rewrite_deletes") &&
      rows("mnt.debt")._2.isEmpty, s"cold debt must fold: $rows")
    assert(rows("mnt.plain")._1.isEmpty, "undeclared tables untouched")
    val after = new CommitLog(spark, s"$warehouse/mnt/debt")
    assert(after.dvFiles(after.currentVersion.get).isEmpty)
    assert(spark.table("gdl.mnt.debt").where("v = 'upd'").count() == 30)
  }

  test("CALL snapshot_group pins consistent heads readable via VERSION AS OF") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdl.sg")
    spark.sql("CREATE TABLE gdl.sg.x (k BIGINT)")
    spark.sql("INSERT INTO gdl.sg.x VALUES (1)")
    spark.sql("CREATE TABLE gdl.sg.y (k BIGINT)")
    spark.sql("INSERT INTO gdl.sg.y VALUES (10)")
    spark.sql("INSERT INTO gdl.sg.y VALUES (11)")
    val pins = spark.sql("CALL gdl.system.snapshot_group('sg.x,sg.y')")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pins == Map("sg.x" -> 1L, "sg.y" -> 2L))
    // later commits never move the pinned read
    spark.sql("INSERT INTO gdl.sg.x VALUES (2)")
    val pinnedX = spark.sql(
      s"SELECT k FROM gdl.sg.x VERSION AS OF ${pins("sg.x")}")
      .collect().map(_.getLong(0)).toSet
    assert(pinnedX == Set(1L), s"pinned read moved: $pinnedX")
  }
}
