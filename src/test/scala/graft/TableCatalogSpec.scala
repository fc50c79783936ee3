package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.CommitLog

/** The V2 TableCatalog front door: `spark.sql` addressing CommitLog
  * tables by catalog name — DDL, DML, time travel, and the CoW shape of
  * SQL DELETE all through the parser, no temp views anywhere.
  */
class TableCatalogSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val warehouse =
    java.nio.file.Files.createTempDirectory("graft_wh_spec").toString

  spark.conf.set("spark.sql.catalog.g", classOf[graft.catalog.GraftTableCatalog].getName)
  spark.conf.set("spark.sql.catalog.g.warehouse", warehouse)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")

  test("create table, insert, select back through catalog names") {
    spark.sql("CREATE TABLE g.db.kv (k BIGINT, v STRING)")
    // an empty declared table reads as zero rows WITH its schema
    val empty = spark.sql("SELECT * FROM g.db.kv")
    assert(empty.columns.toSeq == Seq("k", "v") && empty.count() == 0)
    spark.sql("INSERT INTO g.db.kv VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO g.db.kv VALUES (3, 'c')")
    assert(spark.sql("SELECT * FROM g.db.kv ORDER BY k").as[(Long, String)]
      .collect().toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // predicate pushdown survives the catalog: the scan is Spark's own
    // parquet V2 scan over the snapshot file list
    val plan = spark.sql("SELECT v FROM g.db.kv WHERE k = 2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("k"), plan)
  }

  test("insert overwrite replaces content in one commit; version as of sees history") {
    spark.sql("CREATE TABLE g.db.hist (k BIGINT, v STRING)")
    spark.sql("INSERT INTO g.db.hist VALUES (1, 'old')")
    spark.sql("INSERT OVERWRITE g.db.hist VALUES (2, 'new')")
    assert(spark.sql("SELECT * FROM g.db.hist").as[(Long, String)]
      .collect().toSeq == Seq((2L, "new")))
    assert(spark.sql("SELECT * FROM g.db.hist VERSION AS OF 1").as[(Long, String)]
      .collect().toSeq == Seq((1L, "old")))
    // a time-travel snapshot refuses writes
    val e = intercept[Exception] {
      spark.sql("INSERT INTO g.db.hist VERSION AS OF 1 VALUES (9, 'x')")
    }
    assert(e != null)
    // an unavailable version fails at resolution with the live head named,
    // not at scan time with a raw FileNotFoundException
    val missing = intercept[Exception] {
      spark.sql("SELECT * FROM g.db.hist VERSION AS OF 99").collect()
    }
    val msg = Iterator.iterate[Throwable](missing)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(msg.contains("version 99 is not available"), msg)
    assert(msg.contains("head: 2"), msg)
  }

  test("SQL DELETE WHERE is a copy-on-write commit touching only matching files") {
    spark.sql("CREATE TABLE g.db.cow (k BIGINT, v STRING)")
    // three single-file commits with disjoint key ranges
    for (lo <- Seq(0L, 100L, 200L)) {
      spark.range(lo, lo + 50).select($"id".as("k"),
          org.apache.spark.sql.functions.format_string("r%03d", $"id").as("v"))
        .coalesce(1).createOrReplaceTempView("batch_cow")
      spark.sql("INSERT INTO g.db.cow SELECT * FROM batch_cow"): Unit
    }
    val log = new CommitLog(spark, s"$warehouse/db/cow")
    val before = log.files(log.currentVersion.get).toSet
    assert(before.size == 3)
    spark.sql("DELETE FROM g.db.cow WHERE k >= 100 AND k < 110")
    val after = log.files(log.currentVersion.get).toSet
    // the two untouched files survive BY NAME; only the middle file is rewritten
    assert((before & after).size == 2, s"expected 2 carried files, got ${before & after}")
    assert(spark.sql("SELECT count(*) AS c FROM g.db.cow").as[Long].head() == 140L)
    assert(spark.sql("SELECT count(*) AS c FROM g.db.cow WHERE k >= 100 AND k < 110")
      .as[Long].head() == 0L)
    // DELETE without WHERE empties the table but keeps the declared schema
    spark.sql("DELETE FROM g.db.cow")
    val emptied = spark.sql("SELECT * FROM g.db.cow")
    assert(emptied.count() == 0 && emptied.columns.toSeq == Seq("k", "v"))
  }

  test("CTAS, alter add column, rename, drop, and listings") {
    Seq((1L, "x"), (2L, "y")).toDF("k", "v").createOrReplaceTempView("ctas_src")
    spark.sql("CREATE TABLE g.db.ctas AS SELECT * FROM ctas_src")
    assert(spark.sql("SELECT * FROM g.db.ctas ORDER BY k").as[(Long, String)]
      .collect().toSeq == Seq((1L, "x"), (2L, "y")))
    spark.sql("ALTER TABLE g.db.ctas ADD COLUMN score DOUBLE")
    spark.sql("INSERT INTO g.db.ctas VALUES (3, 'z', 0.5)")
    val rows = spark.sql("SELECT k, v, score FROM g.db.ctas ORDER BY k")
      .as[(Long, String, Option[Double])].collect().toSeq
    assert(rows == Seq((1L, "x", None), (2L, "y", None), (3L, "z", Some(0.5))),
      s"pre-evolution rows must read NULL for the added column: $rows")
    // the rename target resolves inside the table's catalog (no prefix)
    spark.sql("ALTER TABLE g.db.ctas RENAME TO db.ctas2")
    assert(spark.sql("SELECT count(*) AS c FROM g.db.ctas2").as[Long].head() == 3L)
    val tables = spark.sql("SHOW TABLES IN g.db").select("tableName")
      .as[String].collect().toSet
    assert(tables.contains("ctas2") && !tables.contains("ctas"))
    spark.sql("DROP TABLE g.db.ctas2")
    assert(!spark.sql("SHOW TABLES IN g.db").select("tableName")
      .as[String].collect().contains("ctas2"))
    val nss = spark.sql("SHOW NAMESPACES IN g").select("namespace")
      .as[String].collect().toSet
    assert(nss.contains("db"))
  }

  test("RENAME COLUMN is metadata-only: old files readable, new name queryable") {
    spark.sql("CREATE TABLE g.db.ren (k BIGINT, v STRING)")
    spark.sql("INSERT INTO g.db.ren VALUES (1, 'a'), (2, 'b')")
    val log = new CommitLog(spark, s"$warehouse/db/ren")
    val filesBefore = log.files(log.currentVersion.get).toSet

    spark.sql("ALTER TABLE g.db.ren RENAME COLUMN v TO label")
    // no data rewrite happened
    assert(log.files(log.currentVersion.get).toSet == filesBefore,
      "rename must not rewrite data files")
    // new name queryable, with pushdown-eligible filters still correct
    assert(spark.sql("SELECT k, label FROM g.db.ren WHERE label = 'b'")
      .as[(Long, String)].collect().toSeq == Seq((2L, "b")))
    assert(spark.sql("SELECT * FROM g.db.ren ORDER BY k").columns.toSeq ==
      Seq("k", "label"))
    // the old name is gone
    val gone = intercept[Exception] {
      spark.sql("SELECT v FROM g.db.ren").collect()
    }
    assert(gone.getMessage.contains("v") || gone.getMessage.contains("UNRESOLVED"),
      gone.getMessage)

    // inserts after the rename land under the PHYSICAL name — one
    // consistent naming across old and new files
    spark.sql("INSERT INTO g.db.ren VALUES (3, 'c')")
    assert(spark.sql("SELECT label FROM g.db.ren WHERE k = 3")
      .as[String].collect().toSeq == Seq("c"))
    val physCols = spark.read.parquet(s"$warehouse/db/ren/data").columns.toSet
    assert(physCols == Set("k", "v"), s"files must keep physical names: $physCols")

    // time travel across the rename: pre-rename version, logical names
    assert(spark.sql("SELECT * FROM g.db.ren VERSION AS OF 1").columns.toSeq ==
      Seq("k", "label"))
    assert(spark.sql("SELECT label FROM g.db.ren VERSION AS OF 1 ORDER BY k")
      .as[String].collect().toSeq == Seq("a", "b"))

    // DELETE WHERE on the renamed column translates to the physical name
    spark.sql("DELETE FROM g.db.ren WHERE label = 'a'")
    assert(spark.sql("SELECT k FROM g.db.ren ORDER BY k").as[Long]
      .collect().toSeq == Seq(2L, 3L))
  }

  test("DROP COLUMN + re-ADD binds a fresh physical slot (no resurrection)") {
    spark.sql("CREATE TABLE g.db.dropc (k BIGINT, v STRING, extra DOUBLE)")
    spark.sql("INSERT INTO g.db.dropc VALUES (1, 'a', 9.5)")
    spark.sql("ALTER TABLE g.db.dropc DROP COLUMN extra")
    assert(spark.sql("SELECT * FROM g.db.dropc").columns.toSeq == Seq("k", "v"))
    // files still carry the bytes — drop was metadata-only
    assert(spark.read.parquet(s"$warehouse/db/dropc/data").columns.contains("extra"))

    // re-adding the same name must NOT resurrect the dropped values
    spark.sql("ALTER TABLE g.db.dropc ADD COLUMN extra DOUBLE")
    assert(spark.sql("SELECT extra FROM g.db.dropc").as[Option[Double]]
      .collect().toSeq == Seq(None),
      "re-added column must read NULL, not the dropped column's bytes")
    spark.sql("INSERT INTO g.db.dropc VALUES (2, 'b', 1.25)")
    assert(spark.sql("SELECT k, extra FROM g.db.dropc ORDER BY k")
      .as[(Long, Option[Double])].collect().toSeq ==
      Seq((1L, None), (2L, Some(1.25))))
  }

  test("rename: MERGE/UPDATE/DELETE run through the mapping, layout intact") {
    spark.sql("CREATE TABLE g.db.matm (k BIGINT, v STRING)")
    spark.sql("INSERT INTO g.db.matm VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE g.db.matm RENAME COLUMN v TO w")

    // MERGE through the NEW name — no materialization: the group scan
    // plans under the physical schema, the write stages physical names
    spark.sql("""MERGE INTO g.db.matm t USING (SELECT 1 AS k, 'z' AS w
                 UNION ALL SELECT 3 AS k, 'c' AS w) s
                 ON t.k = s.k WHEN MATCHED THEN UPDATE SET w = s.w
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT k, w FROM g.db.matm ORDER BY k").as[(Long, String)]
      .collect().toSeq == Seq((1L, "z"), (2L, "b"), (3L, "c")))
    // UPDATE through the new name
    spark.sql("UPDATE g.db.matm SET w = concat(w, '!') WHERE k = 2")
    assert(spark.sql("SELECT w FROM g.db.matm WHERE k = 2").as[String]
      .collect().toSeq == Seq("b!"))
    // non-filter-expressible DELETE goes group-based through the same path
    spark.sql("DELETE FROM g.db.matm WHERE length(w) > 1")
    assert(spark.sql("SELECT k, w FROM g.db.matm ORDER BY k").as[(Long, String)]
      .collect().toSeq == Seq((1L, "z"), (3L, "c")))

    // the mapping is INTACT: the rewritten head files still store the
    // PHYSICAL column name (no silent fork to logical naming)
    val mlog = new CommitLog(spark, s"$warehouse/db/matm")
    val headFiles = mlog.files(mlog.currentVersion.get)
      .map(n => s"$warehouse/db/matm/data/$n")
    assert(spark.read.parquet(headFiles: _*).columns.toSet == Set("k", "v"),
      "row-level rewrite must stage under the physical names")
    // time travel across the rename AND the rewrites still reads
    assert(spark.sql("SELECT w FROM g.db.matm VERSION AS OF 1 ORDER BY w")
      .as[String].collect().toSeq == Seq("a", "b"))

    // Delta export spells the rename in the open protocol's own words
    // (columnMapping mode=name) over BYTE-COPIED files, and the spec-path
    // reader round-trips it under the logical names
    val dest = s"$warehouse/_matm_cm_delta"
    spark.sql(s"CALL g.system.export_delta('db.matm', '$dest')").collect()
    val back = graft.catalog.DeltaInterop.readDelta(spark, dest)
    assert(back.columns.toSet == Set("k", "w"), back.columns.toSeq)
    assert(back.as[(Long, String)].collect().toSet == Set((1L, "z"), (3L, "c")))

    // materialize stays available as the fold-down: logical names in the
    // HEAD's files afterwards
    val row = spark.sql("CALL g.system.materialize_mapping('db.matm')").collect()(0)
    assert(row.getInt(1) == 1, row.toString)   // one renamed column folded
    val postFiles = mlog.files(mlog.currentVersion.get)
      .map(n => s"$warehouse/db/matm/data/$n")
    assert(spark.read.parquet(postFiles: _*).columns.toSet == Set("k", "w"))
    assert(spark.sql("SELECT * FROM g.db.matm ORDER BY k").as[(Long, String)]
      .collect().toSeq == Seq((1L, "z"), (3L, "c")))
  }

  test("rename over a partitioned layout: MERGE/UPDATE re-stage it, layout intact") {
    spark.sql("CREATE TABLE g.db.matp (k BIGINT, v STRING) PARTITIONED BY (p STRING)")
    spark.sql("INSERT INTO g.db.matp VALUES (1, 'a', 'x'), (2, 'b', 'y'), (3, 'c', 'x')")
    spark.sql("ALTER TABLE g.db.matp RENAME COLUMN v TO w")
    // the partition column can never be renamed (ALTER refuses), so the
    // re-staging names are safe and the rewrite composes with the layout
    spark.sql("""MERGE INTO g.db.matp t USING (SELECT 1 AS k, 'z' AS w) s
                 ON t.k = s.k WHEN MATCHED THEN UPDATE SET w = s.w""")
    spark.sql("UPDATE g.db.matp SET w = concat(w, '!') WHERE k = 2")
    assert(spark.sql("SELECT k, w, p FROM g.db.matp ORDER BY k")
      .as[(Long, String, String)].collect().toSeq ==
      Seq((1L, "z", "x"), (2L, "b!", "y"), (3L, "c", "x")))
    // the hive layout SURVIVED the rewrites: files still nest under p=v
    // subdirs and store the PHYSICAL column name
    val mlog = new CommitLog(spark, s"$warehouse/db/matp")
    val files = mlog.files(mlog.currentVersion.get)
    assert(files.nonEmpty && files.forall(_.contains("p=")),
      s"rewrite must re-stage under the partition dirs: ${files.toSeq}")
    assert(spark.read.parquet(files.map(n => s"$warehouse/db/matp/data/$n"): _*)
      .columns.toSet == Set("k", "v"),
      "row-level rewrite must stage under the physical names")
    // partition pruning still engages through the catalog read
    assert(spark.sql("SELECT count(*) FROM g.db.matp WHERE p = 'x'")
      .head().getLong(0) == 2L)
    val renameP = intercept[Exception] {
      spark.sql("ALTER TABLE g.db.matp RENAME COLUMN p TO q")
    }
    assert(renameP.getMessage.contains("partition columns"), renameP.getMessage)
  }

  test("CALL procedures: optimize clusters, vacuum collects, restore rolls back") {
    spark.sql("CREATE TABLE g.db.maint (k BIGINT, v STRING)")
    for (lo <- Seq(0L, 100L, 200L)) {
      spark.range(lo, lo + 100).select($"id".as("k"),
          org.apache.spark.sql.functions.format_string("m%03d", $"id").as("v"))
        .coalesce(1).createOrReplaceTempView("batch_maint")
      spark.sql("INSERT INTO g.db.maint SELECT * FROM batch_maint"): Unit
    }
    // optimize: 3 appended files range-cluster into fewer, rows intact
    val opt = spark.sql("CALL g.system.optimize('db.maint', 'k')").collect().head
    assert(opt.getAs[Int]("files_before") == 3)
    assert(spark.sql("SELECT count(*) AS c FROM g.db.maint").as[Long].head() == 300L)
    // restore: head rolls back to the pre-optimize content (same rows here)
    val restored = spark.sql("CALL g.system.restore('db.maint', 2)").collect().head
    assert(restored.getAs[Long]("version") == 5L)
    assert(spark.sql("SELECT count(*) AS c FROM g.db.maint").as[Long].head() == 200L)
    // vacuum with zero age: only the head version survives on disk
    val vac = spark.sql("CALL g.system.vacuum('db.maint', 1, 0, 0)").collect().head
    assert(vac.getAs[Int]("manifests_deleted") >= 4)
    assert(spark.sql("SELECT count(*) AS c FROM g.db.maint").as[Long].head() == 200L)
    val e = intercept[Exception](spark.sql("CALL g.system.no_such_proc('x')"))
    assert(e.getMessage.contains("no_such_proc") || e.getMessage.contains("not found"),
      e.getMessage)
  }

  test("CALL export_delta / import_delta round a table through the open format") {
    spark.sql("CREATE TABLE g.db.exp (k BIGINT, v STRING)")
    spark.sql("INSERT INTO g.db.exp VALUES (1, 'a'), (2, 'b')")
    val dest = java.nio.file.Files.createTempDirectory("graft_proc_delta").toString + "/d"
    val exported = spark.sql(s"CALL g.system.export_delta('db.exp', '$dest')")
      .collect().head
    // the two VALUES rows may land as one or two part files — what
    // matters is every live pool file is exported
    assert(exported.getAs[Int]("files_exported") ==
      new CommitLog(spark, s"$warehouse/db/exp")
        .files(new CommitLog(spark, s"$warehouse/db/exp").currentVersion.get).length)
    spark.sql(s"CALL g.system.import_delta('$dest', 'db.imp')")
    assert(spark.sql("SELECT * FROM g.db.imp ORDER BY k").as[(Long, String)]
      .collect().toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("SQL MERGE INTO upserts through the row-level rewrite") {
    spark.sql("CREATE TABLE g.db.mrg (k BIGINT, v STRING)")
    spark.sql("INSERT INTO g.db.mrg VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    Seq((2L, "B"), (4L, "D")).toDF("k", "v").createOrReplaceTempView("mrg_src")
    spark.sql(
      """MERGE INTO g.db.mrg t USING mrg_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET t.v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    assert(spark.sql("SELECT * FROM g.db.mrg ORDER BY k").as[(Long, String)]
      .collect().toSeq == Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "D")))
    // MERGE with delete action
    Seq(3L).toDF("k").createOrReplaceTempView("mrg_del")
    spark.sql(
      """MERGE INTO g.db.mrg t USING mrg_del s ON t.k = s.k
        |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(spark.sql("SELECT * FROM g.db.mrg ORDER BY k").as[(Long, String)]
      .collect().toSeq == Seq((1L, "a"), (2L, "B"), (4L, "D")))
    // the rewrite is a commit like any other: history stays travelable
    assert(spark.sql("SELECT * FROM g.db.mrg VERSION AS OF 1").count() == 3L)
  }

  test("MERGE WITH SCHEMA EVOLUTION widens the table from SQL on both tiers") {
    // CoW tier: the analyzer's AUTOMATIC_SCHEMA_EVOLUTION path turns the
    // source-only column into alterTable AddColumn before the row-level
    // rewrite — a SQL-only user reaches merge(evolve = true)
    spark.sql("CREATE TABLE g.db.mevo (k BIGINT, v STRING)")
    spark.sql("INSERT INTO g.db.mevo VALUES (1, 'a'), (2, 'b')")
    Seq((2L, "B", 7.5), (3L, "c", 1.25)).toDF("k", "v", "w")
      .createOrReplaceTempView("mevo_src")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO g.db.mevo t USING mevo_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql("SELECT k, v, w FROM g.db.mevo ORDER BY k")
      .as[(Long, String, Option[Double])].collect().toSeq ==
      Seq((1L, "a", None), (2L, "B", Some(7.5)), (3L, "c", Some(1.25))))

    // MoR tier: CALL merge_mor with evolve lands the same widening as a
    // tombstone+append commit (no file rewrite)
    spark.sql("CREATE TABLE g.db.mevo2 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO g.db.mevo2 VALUES (1, 'a'), (2, 'b')")
    val log2 = new CommitLog(spark, s"$warehouse/db/mevo2")
    log2.mergeMoR(Seq((2L, "B", 0.5)).toDF("k", "v", "w"), "k", evolve = true)
    // the SQL surface sees the library evolution (#schema: manifest header)
    assert(spark.sql("SELECT k, v, w FROM g.db.mevo2 ORDER BY k")
      .as[(Long, String, Option[Double])].collect().toSeq ==
      Seq((1L, "a", None), (2L, "B", Some(0.5))))
    // and time travel to the pre-evolution version serves the narrow schema
    assert(spark.sql("SELECT * FROM g.db.mevo2 VERSION AS OF 1").columns.toSeq ==
      Seq("k", "v"))

    // an evolved column is ALTER-able like a declared one, and once
    // dropped it must NOT resurrect from the stale #schema: header
    spark.sql("ALTER TABLE g.db.mevo2 DROP COLUMN w")
    assert(spark.table("g.db.mevo2").columns.toSeq == Seq("k", "v"))

    // CALL merge_mor: the MoR tier's SQL front door — evolve mode
    // widens, strict mode bounces a new column
    spark.sql("CREATE TABLE g.db.mevo3 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO g.db.mevo3 VALUES (1, 'a'), (2, 'b')")
    Seq((2L, "B", 9.5), (3L, "c", 0.25)).toDF("k", "v", "w")
      .createOrReplaceTempView("mevo3_src")
    val bounced = intercept[Exception] {
      spark.sql("CALL g.system.merge_mor('db.mevo3', 'mevo3_src', 'k', 'strict')")
    }
    assert(bounced.getMessage.contains("mergeMoR"), bounced.getMessage)
    spark.sql("CALL g.system.merge_mor('db.mevo3', 'mevo3_src', 'k', 'evolve')")
    assert(spark.sql("SELECT k, v, w FROM g.db.mevo3 ORDER BY k")
      .as[(Long, String, Option[Double])].collect().toSeq ==
      Seq((1L, "a", None), (2L, "B", Some(9.5)), (3L, "c", Some(0.25))))
  }

  test("MERGE WITH SCHEMA EVOLUTION composes with a renamed (column-mapped) table") {
    spark.sql("CREATE TABLE g.db.mevoren (k BIGINT, v STRING)")
    spark.sql("INSERT INTO g.db.mevoren VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE g.db.mevoren RENAME COLUMN v TO label")
    Seq((2L, "B", 4.5), (3L, "c", 0.75)).toDF("k", "label", "w")
      .createOrReplaceTempView("mevoren_src")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO g.db.mevoren t USING mevoren_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql("SELECT k, label, w FROM g.db.mevoren ORDER BY k")
      .as[(Long, String, Option[Double])].collect().toSeq ==
      Seq((1L, "a", None), (2L, "B", Some(4.5)), (3L, "c", Some(0.75))))
  }

  test("SQL UPDATE rewrites matching rows in place") {
    spark.sql("CREATE TABLE g.db.upd (k BIGINT, v STRING)")
    spark.sql("INSERT INTO g.db.upd VALUES (1, 'a'), (2, 'b')")
    spark.sql("UPDATE g.db.upd SET v = concat(v, '!') WHERE k = 2")
    assert(spark.sql("SELECT * FROM g.db.upd ORDER BY k").as[(Long, String)]
      .collect().toSeq == Seq((1L, "a"), (2L, "b!")))
  }

  test("CALL commit_all: atomic two-table write; a bounced second write aborts whole") {
    // the reference's R18 shape (entity row + audit event per handler)
    // from the SQL front door: both land together or neither does
    spark.sql("CREATE TABLE g.db.xt_ent (k BIGINT, v STRING)")
    spark.sql("CREATE TABLE g.db.xt_aud (req STRING, price DOUBLE)")
    Seq((1L, "a")).toDF("k", "v").createOrReplaceTempView("xt_src_ent")
    Seq(("r1", 10.0)).toDF("req", "price").createOrReplaceTempView("xt_src_aud")
    val rows = spark.sql("CALL g.system.commit_all('db.xt_ent,db.xt_aud', " +
      "'xt_src_ent,xt_src_aud', 'append')").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.map(_._1).toSet == Set("db.xt_ent", "db.xt_aud"), rows.toSeq)
    assert(spark.sql("SELECT count(*) FROM g.db.xt_ent").head().getLong(0) == 1L)
    assert(spark.sql("SELECT count(*) FROM g.db.xt_aud").head().getLong(0) == 1L)

    // crash seam through SQL: a CHECK constraint bounces the SECOND
    // write AFTER the first's pending publish — the presumed-abort
    // decision must keep the first table's content invisible
    spark.sql("CALL g.system.add_constraint('db.xt_aud', 'price_pos', 'price > 0')")
    spark.conf.set("spark.graft.xtxn.graceMs", "50")
    try {
      Seq((2L, "b")).toDF("k", "v").createOrReplaceTempView("xt_src_ent2")
      Seq(("r2", -5.0)).toDF("req", "price").createOrReplaceTempView("xt_src_aud_bad")
      val boom = intercept[Exception] {
        spark.sql("CALL g.system.commit_all('db.xt_ent,db.xt_aud', " +
          "'xt_src_ent2,xt_src_aud_bad', 'append')").collect()
      }
      assert(String.valueOf(boom.getMessage).contains("price_pos"), boom.getMessage)
      assert(spark.sql("SELECT count(*) FROM g.db.xt_ent").head().getLong(0) == 1L,
        "half-committed txn content leaked through the SQL surface")
      assert(spark.sql("SELECT count(*) FROM g.db.xt_aud").head().getLong(0) == 1L)
      // and the same pair commits cleanly afterwards
      Seq(("r2", 5.0)).toDF("req", "price").createOrReplaceTempView("xt_src_aud_ok")
      spark.sql("CALL g.system.commit_all('db.xt_ent,db.xt_aud', " +
        "'xt_src_ent2,xt_src_aud_ok', 'append')").collect()
      assert(spark.sql("SELECT count(*) FROM g.db.xt_ent").head().getLong(0) == 2L)
      assert(spark.sql("SELECT count(*) FROM g.db.xt_aud").head().getLong(0) == 2L)
    } finally spark.conf.unset("spark.graft.xtxn.graceMs")
  }

  test("catalog writes and commit-log DataFrame API see one log") {
    spark.sql("CREATE TABLE g.db.shared (k BIGINT, v STRING)")
    spark.sql("INSERT INTO g.db.shared VALUES (1, 'sql')")
    val log = new CommitLog(spark, s"$warehouse/db/shared")
    log.commit(Seq((2L, "api")).toDF("k", "v"), replace = false)
    assert(spark.sql("SELECT * FROM g.db.shared ORDER BY k").as[(Long, String)]
      .collect().toSeq == Seq((1L, "sql"), (2L, "api")))
    // MERGE stays on the DataFrame plane, visible to SQL immediately
    log.merge(Seq((1L, "merged"), (3L, "new")).toDF("k", "v"), "k")
    assert(spark.sql("SELECT * FROM g.db.shared ORDER BY k").as[(Long, String)]
      .collect().toSeq == Seq((1L, "merged"), (2L, "api"), (3L, "new")))
  }
}
