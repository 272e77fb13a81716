package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.sources.GraftTable
import java.nio.file.Files

/** Plain-SQL UPDATE / MERGE INTO / general-condition DELETE through
  * the DSv2 catalog (GraftDmlRule): exact routing into GraftTable's
  * COW engine, and the loud-or-safe contract — any untranslatable
  * construct fails the whole statement BEFORE a write starts (the
  * table's version must not move).
  */
class SqlDmlSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  private def withCatalog[T](body: => T): T = {
    val k = "spark.sql.catalog.graft"
    val old = spark.conf.getOption(k)
    spark.conf.set(k, classOf[graft.sources.v2.GraftCatalog].getName)
    try body
    finally old match {
      case Some(v) => spark.conf.set(k, v)
      case None => spark.conf.unset(k)
    }
  }

  private def freshTable(): String = {
    val path = Files.createTempDirectory("sqldml").toString + "/t"
    GraftTable.create(
      spark.range(0, 1000).toDF("k")
        .withColumn("v", col("k") % 10)
        .withColumn("s", concat(lit("row"), col("k"))),
      path, Seq("k"), nbuckets = 4)
    path
  }

  test("SQL UPDATE routes into the COW engine with exact semantics") {
    val path = freshTable()
    withCatalog {
      spark.sql(s"UPDATE graft.`$path` SET v = v + 100, s = upper(s) WHERE k % 7 = 0")
    }
    val got = GraftTable.read(spark, path)
      .select("k", "v", "s").as[(Long, Long, String)].collect().sortBy(_._1)
    val want = (0L until 1000L).map { k =>
      if (k % 7 == 0) (k, k % 10 + 100, s"ROW$k") else (k, k % 10, s"row$k")
    }
    got.toSeq shouldBe want
  }

  test("SQL UPDATE with no WHERE rewrites every matching row") {
    val path = freshTable()
    withCatalog { spark.sql(s"UPDATE graft.`$path` SET v = 1") }
    GraftTable.read(spark, path).agg(sum("v")).head().getLong(0) shouldBe 1000L
  }

  test("SQL DELETE with a non-DSv1-translatable condition still deletes") {
    val path = freshTable()
    withCatalog {
      // substr(s, 4) isn't a DSv1 filter — the SupportsDelete path
      // alone would refuse; the rule routes it through deleteWhere
      spark.sql(s"DELETE FROM graft.`$path` WHERE CAST(substr(s, 4) AS LONG) % 2 = 0")
    }
    GraftTable.read(spark, path).count() shouldBe 500L
  }

  test("SQL MERGE runs the full clause family, source keyed under another name") {
    val path = freshTable()
    spark.range(500, 1500).toDF("id")
      .withColumn("nv", col("id") * 10)
      .createOrReplaceTempView("sqldml_merge_src")
    withCatalog {
      spark.sql(s"""MERGE INTO graft.`$path` t USING sqldml_merge_src s
        ON t.k = s.id
        WHEN MATCHED AND s.id % 3 = 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = s.nv
        WHEN NOT MATCHED AND s.id < 1200 THEN INSERT (k, v) VALUES (s.id, s.nv)""")
    }
    val got = GraftTable.read(spark, path)
      .select("k", "v", "s").as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    val kept = (0L until 500L).map(k => (k, k % 10, s"row$k"))
    val updated = (500L until 1000L).filterNot(_ % 3 == 0).map(k => (k, k * 10, s"row$k"))
    val inserted = (1000L until 1200L)
      .map(k => (k, k * 10, null: String)) // unassigned column: ANSI NULL
    got shouldBe (kept ++ updated ++ inserted)
  }

  test("MERGE clause order is honoured when UPDATE precedes DELETE") {
    val path = freshTable()
    spark.range(0, 100).toDF("id").createOrReplaceTempView("sqldml_ud_src")
    withCatalog {
      // SQL: first matching clause wins — rows with id%4=0 AND id%2=0
      // take the UPDATE, never the DELETE
      spark.sql(s"""MERGE INTO graft.`$path` t USING sqldml_ud_src s
        ON t.k = s.id
        WHEN MATCHED AND s.id % 4 = 0 THEN UPDATE SET v = -1
        WHEN MATCHED AND s.id % 2 = 0 THEN DELETE""")
    }
    val vs = GraftTable.read(spark, path).select("k", "v")
      .as[(Long, Long)].collect().toMap
    vs.contains(2L) shouldBe false // deleted (matched %2, not %4)
    vs(4L) shouldBe -1L            // updated, NOT deleted
    vs(3L) shouldBe 3L             // untouched
    vs.size shouldBe 1000 - 25     // 25 keys in 0..99 hit the delete arm
  }

  test("SQL VERSION AS OF / TIMESTAMP AS OF read historical snapshots") {
    val path = freshTable() // v0: k in 0..999
    withCatalog {
      spark.sql(s"DELETE FROM graft.`$path` WHERE k >= 500") // v1
      val t1 = GraftTable.commitLog(path).last._2
      spark.sql(s"UPDATE graft.`$path` SET v = 0 WHERE k < 500") // v2
      spark.sql(s"SELECT * FROM graft.`$path` VERSION AS OF 0").count() shouldBe 1000L
      spark.sql(s"SELECT * FROM graft.`$path` VERSION AS OF 1").count() shouldBe 500L
      spark.sql(s"SELECT sum(v) FROM graft.`$path` VERSION AS OF 1")
        .head().getLong(0) should be > 0L
      spark.table(s"graft.`$path`").count() shouldBe 500L // head = v2
      // wall-clock travel: as of v1's commit instant → v1's image
      val lit = java.time.Instant.ofEpochMilli(t1).toString.replace("T", " ").stripSuffix("Z")
      spark.sql(s"SELECT sum(v) FROM graft.`$path` TIMESTAMP AS OF '$lit'")
        .head().getLong(0) should be > 0L
      // a version that never committed refuses loudly
      val e = intercept[Exception](
        spark.sql(s"SELECT * FROM graft.`$path` VERSION AS OF 99").count())
      e.getMessage should include("no committed version")
    }
  }

  test("DML against a time-travel snapshot refuses") {
    val path = freshTable()
    withCatalog {
      spark.sql(s"DELETE FROM graft.`$path` WHERE k >= 500")
      val e = intercept[Exception](
        spark.sql(s"UPDATE graft.`$path` VERSION AS OF 0 SET v = 1"))
      // Spark may reject time travel on a DML target before our rule
      // sees it; either way the statement must fail and v stays put
      GraftTable.latestVersion(path) shouldBe 1
      e.getMessage.length should be > 0
    }
  }

  private def assertNoNewVersion[T](path: String)(body: => T): Throwable = {
    val before = GraftTable.latestVersion(path)
    val e = intercept[Throwable](body)
    GraftTable.latestVersion(path) shouldBe before
    e
  }

  test("untranslatable statements fail LOUDLY with no partial write") {
    val path = freshTable()
    spark.range(0, 10).toDF("id").createOrReplaceTempView("sqldml_bad_src")
    withCatalog {
      // subquery in UPDATE condition
      assertNoNewVersion(path) {
        spark.sql(s"UPDATE graft.`$path` SET v = 0 " +
          s"WHERE k IN (SELECT id FROM sqldml_bad_src)")
      }.getMessage should include("subquery")
      // subquery in SET value
      assertNoNewVersion(path) {
        spark.sql(s"UPDATE graft.`$path` SET v = (SELECT max(id) FROM sqldml_bad_src)")
      }.getMessage should include("subquery")
      // key-column SET refuses (a key update moves the bucket)
      assertNoNewVersion(path) {
        spark.sql(s"UPDATE graft.`$path` SET k = k + 1")
      }.getMessage should include("key column")
      // non-key-equality merge condition
      assertNoNewVersion(path) {
        spark.sql(s"""MERGE INTO graft.`$path` t USING sqldml_bad_src s
          ON t.k > s.id WHEN MATCHED THEN DELETE""")
      }.getMessage should include("MERGE ON")
      // a by-source clause referencing the (all-NULL) source side:
      // Spark's ANALYZER already scopes by-source conditions to target
      // columns (UNRESOLVED_COLUMN), so the statement dies before the
      // rule — the rule's own source-reference fence stays as defense
      // in depth for the engine API path
      assertNoNewVersion(path) {
        spark.sql(s"""MERGE INTO graft.`$path` t USING sqldml_bad_src s
          ON t.k = s.id
          WHEN NOT MATCHED BY SOURCE AND s.id > 0 THEN DELETE""")
      }.getMessage should include("cannot be resolved")
      // INSERT must assign the key from the ON-paired source column
      assertNoNewVersion(path) {
        spark.sql(s"""MERGE INTO graft.`$path` t USING sqldml_bad_src s
          ON t.k = s.id
          WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.id + 1, 0)""")
      }.getMessage should include("key column")
    }
  }

  test("MERGE WITH SCHEMA EVOLUTION widens additively; incompatible changes refuse whole") {
    val path = freshTable()
    Seq((5L, 99L, "note5"), (2000L, 1L, "note2000"))
      .toDF("k", "v", "note").createOrReplaceTempView("sqldml_evo_src")
    withCatalog {
      // new source column `note` rides WHEN MATCHED UPDATE + INSERT:
      // Spark's ResolveMergeIntoSchemaEvolution routes it through
      // GraftCatalog.alterTable -> GraftTable.addColumns (metadata-only
      // widening), then the merge runs against the widened schema
      spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$path` t
        USING sqldml_evo_src s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v, note = s.note
        WHEN NOT MATCHED THEN INSERT (k, v, note) VALUES (s.k, s.v, s.note)""")
      val got = GraftTable.read(spark, path)
      got.columns should contain("note")
      got.count() shouldBe 1001L
      got.filter(col("k") === 5L).head().getAs[String]("note") shouldBe "note5"
      got.filter(col("k") === 2000L).head().getAs[String]("note") shouldBe "note2000"
      // untouched rows read NULL for the widened column (metadata pad)
      got.filter(col("k") === 7L).head().getAs[String]("note") shouldBe null
      // WITHOUT the evolution keyword the same statement still refuses
      // (the new column does not resolve against the target)
      Seq((6L, 1L, "x")).toDF("k", "v", "extra2")
        .createOrReplaceTempView("sqldml_evo_src2")
      assertNoNewVersion(path) {
        spark.sql(s"""MERGE INTO graft.`$path` t USING sqldml_evo_src2 s
          ON t.k = s.k
          WHEN NOT MATCHED THEN INSERT (k, v, extra2) VALUES (s.k, s.v, s.extra2)""")
      }
      // genuinely incompatible evolution (a TYPE change on an existing
      // column) refuses the STATEMENT whole — no partial write
      Seq(("7", 1L)).toDF("k", "v").createOrReplaceTempView("sqldml_evo_src3")
      assertNoNewVersion(path) {
        spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$path` t
          USING sqldml_evo_src3 s ON t.k = s.k
          WHEN MATCHED THEN UPDATE SET v = s.v""")
      }
    }
  }

  test("SQL MERGE WHEN NOT MATCHED BY SOURCE sweeps unpaired target rows") {
    val path = freshTable() // k 0..999, v = k % 10
    spark.range(0, 100).toDF("id").withColumn("nv", lit(77L))
      .createOrReplaceTempView("sqldml_bysrc")
    withCatalog {
      spark.sql(s"""MERGE INTO graft.`$path` t USING sqldml_bysrc s
        ON t.k = s.id
        WHEN MATCHED THEN UPDATE SET v = s.nv
        WHEN NOT MATCHED BY SOURCE AND t.v = 9 THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = -1""")
      val t = GraftTable.read(spark, path)
      // unpaired (k >= 100) with v=9: k=109,119,…,999 → 90 deleted
      t.count() shouldBe 910L
      t.filter(col("k") === 5).head().getAs[Long]("v") shouldBe 77L   // matched
      t.filter(col("k") === 205).head().getAs[Long]("v") shouldBe -1L // unpaired survivor
      t.filter(col("k") === 209).count() shouldBe 0L                  // unpaired v=9
      t.filter(col("k") === 9).head().getAs[Long]("v") shouldBe 77L   // paired v=9 → updated
    }
  }

  test("SQL CREATE TABLE with a bucket transform, INSERT, DROP TABLE") {
    withCatalog {
      val path = Files.createTempDirectory("sqlddl").toString + "/t"
      spark.sql(
        s"CREATE TABLE graft.`$path` (k BIGINT, v BIGINT) PARTITIONED BY (bucket(4, k))")
      GraftTable.keyColumns(path) shouldBe Seq("k")
      spark.sql(s"INSERT INTO graft.`$path` VALUES (1, 10), (2, 20)")
      spark.table(s"graft.`$path`").orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))
        ).toSeq shouldBe Seq((1L, 10L), (2L, 20L))
      spark.sql(s"DROP TABLE graft.`$path`")
      GraftTable.latestVersion(path) shouldBe -1
    }
  }

  test("SQL CTAS lays the query result out bucketed and keyed") {
    withCatalog {
      val src = freshTable()
      val path = Files.createTempDirectory("sqlctas").toString + "/t"
      spark.sql(
        s"""CREATE TABLE graft.`$path` PARTITIONED BY (bucket(4, k))
           |AS SELECT k, v * 100 AS v100 FROM graft.`$src` WHERE k < 50""".stripMargin)
      GraftTable.keyColumns(path) shouldBe Seq("k")
      val got = spark.table(s"graft.`$path`").orderBy("k").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      got shouldBe (0L until 50L).map(k => (k, (k % 10) * 100))
      // and the CTAS table is a full graft table: DML works against it
      spark.sql(s"UPDATE graft.`$path` SET v100 = 0 WHERE k = 7")
      spark.table(s"graft.`$path`").filter(col("k") === 7)
        .select("v100").head().getLong(0) shouldBe 0L
    }
  }

  test("PARTITIONED BY (days(ts), bucket(n, k)) declares time clustering") {
    withCatalog {
      val path = Files.createTempDirectory("sqldays").toString + "/t"
      spark.range(0, 512).toDF("k")
        .withColumn("ts", expr(
          "timestamp_micros(cast(1700000000000000 + (k * 2654435761 % 512) * 86400000000 AS long))"))
        .withColumn("v", col("k") % 7)
        .createOrReplaceTempView("sqldays_src")
      spark.sql(s"""CREATE TABLE graft.`$path`
        PARTITIONED BY (days(ts), bucket(2, k))
        AS SELECT * FROM sqldays_src""")
      GraftTable.declaredClustering(path) shouldBe Some("ts")
      // surfaced to the operator
      spark.sql(s"SHOW TBLPROPERTIES graft.`$path`").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
        .get("time_cluster") shouldBe Some("ts")
      // the ARGUMENT-LESS compact engages the declared clustering:
      // files become disjoint ts slices and a narrow window prunes
      spark.sql(s"CALL graft.compact(table => '$path', " +
        "target_files_per_bucket => 8)").collect()
      val rep = spark.sql(s"CALL graft.skipping_report('$path', " +
        "'ts < timestamp''2023-12-15 00:00:00''')").collect().head
      rep.getLong(3) should be > rep.getLong(2) // skipped > kept
      // results are exact through the pruned scan: day offsets are a
      // bijection of 0..511 from 2023-11-14T22:13:20Z, so offsets 0..30
      // (31 rows) precede the cutoff
      spark.table(s"graft.`$path`")
        .filter(col("ts") < expr("timestamp'2023-12-15 00:00:00'"))
        .count() shouldBe 31L
      // Hive-style identity transform: the bare categorical column
      // declares clustering the same way
      val p3 = Files.createTempDirectory("sqldays").toString + "/t3"
      spark.sql(s"""CREATE TABLE graft.`$p3`
        PARTITIONED BY (v, bucket(2, k))
        AS SELECT * FROM sqldays_src""")
      GraftTable.declaredClustering(p3) shouldBe Some("v")
      spark.sql(s"CALL graft.compact(table => '$p3', " +
        "target_files_per_bucket => 7)").collect()
      val rep3 = spark.sql(s"CALL graft.skipping_report('$p3', 'v = 3')")
        .collect().head
      rep3.getLong(3) should be > rep3.getLong(2) // skipped > kept
      spark.table(s"graft.`$p3`").filter(col("v") === 3).count() shouldBe
        (0 until 512).count(_ % 7 == 3).toLong
      // refusals: non-timestamp column; two time transforms
      val p2 = Files.createTempDirectory("sqldays").toString + "/t2"
      intercept[Exception] {
        spark.sql(s"""CREATE TABLE graft.`$p2`
          PARTITIONED BY (days(v), bucket(2, k))
          AS SELECT * FROM sqldays_src""")
      }.getMessage should include("timestamp")
      intercept[Exception] {
        spark.sql(s"""CREATE TABLE graft.`$p2`
          PARTITIONED BY (days(ts), months(ts), bucket(2, k))
          AS SELECT * FROM sqldays_src""")
      }.getMessage should include("at most one time/identity transform")
    }
  }

  test("SQL ALTER TABLE ADD COLUMNS is a metadata-only commit") {
    withCatalog {
      val path = freshTable() // (k, v, s), 1000 rows, v0
      spark.sql(s"ALTER TABLE graft.`$path` ADD COLUMNS (score DOUBLE, tag STRING)")
      GraftTable.latestVersion(path) shouldBe 1
      // existing rows read the new columns as NULL, through BOTH paths
      val t = GraftTable.read(spark, path)
      t.schema.fieldNames.toSeq shouldBe Seq("k", "v", "s", "score", "tag")
      t.filter(col("score").isNotNull).count() shouldBe 0L
      spark.table(s"graft.`$path`").filter(col("tag").isNotNull).count() shouldBe 0L
      // a later upsert fills them; time travel still serves the old shape
      GraftTable.upsert(spark, path,
        Seq((5L, 50L, "r5", 0.5, "hot")).toDF("k", "v", "s", "score", "tag"))
      spark.table(s"graft.`$path`").filter(col("k") === 5)
        .head().getAs[Double]("score") shouldBe 0.5
      spark.sql(s"SELECT * FROM graft.`$path` VERSION AS OF 0")
        .schema.fieldNames should not contain "score"
      // refusals: duplicate add, NOT NULL add, non-add changes
      intercept[Exception] {
        spark.sql(s"ALTER TABLE graft.`$path` ADD COLUMNS (score DOUBLE)")
      }.getMessage should include("already exists")
      intercept[Exception] {
        spark.sql(s"ALTER TABLE graft.`$path` ADD COLUMNS (nn BIGINT NOT NULL)")
      }.getMessage should include("NOT NULL")
      // DROP COLUMN is supported now (AlterColumnsSpec owns its
      // semantics); type changes still refuse
      spark.sql(s"ALTER TABLE graft.`$path` DROP COLUMN tag")
      GraftTable.read(spark, path).schema.fieldNames should not contain "tag"
      intercept[Exception] {
        spark.sql(s"ALTER TABLE graft.`$path` ALTER COLUMN v TYPE STRING")
      }.getMessage should include("ADD COLUMNS / DROP COLUMN / RENAME COLUMN")
    }
  }

  test("CREATE TABLE without a declared key layout refuses loudly") {
    withCatalog {
      val path = Files.createTempDirectory("sqlddl_bad").toString + "/t"
      val e = intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.`$path` (k BIGINT, v BIGINT)")
      }
      e.getMessage should include("bucket")
      GraftTable.latestVersion(path) shouldBe -1
      // TBLPROPERTIES spelling works as the alternative
      spark.sql(
        s"CREATE TABLE graft.`$path` (k BIGINT, v BIGINT) " +
          "TBLPROPERTIES (keys='k', buckets='2')")
      GraftTable.keyColumns(path) shouldBe Seq("k")
      spark.sql(s"DROP TABLE graft.`$path`")
    }
  }
}
