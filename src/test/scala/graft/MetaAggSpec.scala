package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.sources.GraftTable
import java.nio.file.Files

/** Aggregate pushdown from table METADATA (GraftScanBuilder's
  * SupportsPushDownAggregates): an un-filtered, un-grouped
  * COUNT(*)/COUNT(col)/MIN/MAX over `graft.`path`` must collapse to a
  * driver-local row computed from the manifest's stats segments — ZERO
  * data IO, zero tasks (a LocalTableScan in the plan) — with values
  * identical to the full scan; and every case metadata cannot answer
  * EXACTLY must decline to the ordinary scan, never return a guess.
  */
class MetaAggSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark

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

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def fixture(): String = {
    val root = Files.createTempDirectory("metaagg").toString + "/t"
    val df = spark.range(0, 1000).toDF("k")
      .withColumn("v", col("k") * 2.5)
      .withColumn("s", concat(lit("row-"), format_string("%04d", col("k"))))
      .withColumn("d", date_add(to_date(lit("2024-01-01")), (col("k") % 365).cast("int")))
      .withColumn("allnull", lit(null).cast("double"))
    GraftTable.create(df, root, Seq("k"), nbuckets = 4)
    root
  }

  test("count/min/max answer from metadata alone: LocalTableScan, exact values") {
    val root = fixture()
    withCatalog {
      val q = spark.sql(
        s"""SELECT count(*) AS cnt, count(v) AS cv, min(k) AS mnk, max(k) AS mxk,
                   min(v) AS mnv, max(v) AS mxv, min(s) AS mns, max(s) AS mxs,
                   min(d) AS mnd, max(d) AS mxd
            FROM graft.`$root`""")
      val p = plan(q)
      withClue(p) {
        p should include("LocalTableScan")
        p should not include "BatchScan"
      }
      val r = q.collect().head
      r.getLong(0) shouldBe 1000L
      r.getLong(1) shouldBe 1000L
      r.getLong(2) shouldBe 0L
      r.getLong(3) shouldBe 999L
      r.getDouble(4) shouldBe 0.0
      r.getDouble(5) shouldBe 999 * 2.5
      r.getString(6) shouldBe "row-0000"
      r.getString(7) shouldBe "row-0999"
      r.getDate(8).toString shouldBe "2024-01-01"
      r.getDate(9).toString shouldBe "2024-12-30"
    }
  }

  test("MIN/MAX of an all-null column is NULL from metadata; COUNT(col) is 0") {
    val root = fixture()
    withCatalog {
      val q = spark.sql(
        s"SELECT min(allnull) AS mn, max(allnull) AS mx, count(allnull) AS c " +
          s"FROM graft.`$root`")
      val p = plan(q)
      withClue(p) { p should include("LocalTableScan") }
      val r = q.collect().head
      r.isNullAt(0) shouldBe true
      r.isNullAt(1) shouldBe true
      r.getLong(2) shouldBe 0L
    }
  }

  test("a WHERE clause declines the pushdown and the scan answers correctly") {
    val root = fixture()
    withCatalog {
      val q = spark.sql(
        s"SELECT count(*) AS cnt, max(k) AS mx FROM graft.`$root` WHERE k < 100")
      val p = plan(q)
      withClue(p) { p should not include "LocalTableScan" }
      val r = q.collect().head
      r.getLong(0) shouldBe 100L
      r.getLong(1) shouldBe 99L
    }
  }

  test("GROUP BY and SUM decline; results still exact through the scan") {
    val root = fixture()
    withCatalog {
      val g = spark.sql(
        s"SELECT k % 3 AS g, count(*) AS c FROM graft.`$root` GROUP BY k % 3")
      withClue(plan(g)) { plan(g) should not include "LocalTableScan" }
      g.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
        Map(0L -> 334L, 1L -> 333L, 2L -> 333L)
      val s = spark.sql(s"SELECT sum(k) AS s, count(*) AS c FROM graft.`$root`")
      withClue(plan(s)) { plan(s) should not include "LocalTableScan" }
      s.collect().head.getLong(0) shouldBe (0L until 1000L).sum
    }
  }

  test("post-evolution column: COUNT counts only filled rows, MIN/MAX exact") {
    val root = fixture()
    GraftTable.addColumns(spark, root,
      Seq(org.apache.spark.sql.types.StructField("bonus",
        org.apache.spark.sql.types.LongType)))
    GraftTable.upsert(spark, root,
      spark.range(0, 1000).toDF("k").filter(col("k") % 10 === 0)
        .withColumn("v", col("k") * 2.5)
        .withColumn("s", concat(lit("row-"), format_string("%04d", col("k"))))
        .withColumn("d", date_add(to_date(lit("2024-01-01")), (col("k") % 365).cast("int")))
        .withColumn("allnull", lit(null).cast("double"))
        .withColumn("bonus", col("k") + 7))
    withCatalog {
      val q = spark.sql(
        s"SELECT count(bonus) AS c, min(bonus) AS mn, max(bonus) AS mx, " +
          s"count(*) AS n FROM graft.`$root`")
      withClue(plan(q)) { plan(q) should include("LocalTableScan") }
      val r = q.collect().head
      r.getLong(0) shouldBe 100L // only the filled tenth
      r.getLong(1) shouldBe 7L
      r.getLong(2) shouldBe 997L
      r.getLong(3) shouldBe 1000L
    }
  }

  test("possibly-truncated long-text MIN declines; COUNT(*) still pushes alone") {
    val root = Files.createTempDirectory("metaagg_txt").toString + "/t"
    GraftTable.create(
      spark.range(0, 50).toDF("k")
        .withColumn("txt", concat(format_string("%03d", col("k")), lit("x" * 200))),
      root, Seq("k"), nbuckets = 2)
    withCatalog {
      // min(txt): the recorded 120-char prefix is a bound, not the value
      val q = spark.sql(s"SELECT min(txt) AS mn FROM graft.`$root`")
      withClue(plan(q)) { plan(q) should not include "LocalTableScan" }
      q.collect().head.getString(0) shouldBe "000" + "x" * 200
      val c = spark.sql(s"SELECT count(*) AS n FROM graft.`$root`")
      withClue(plan(c)) { plan(c) should include("LocalTableScan") }
      c.collect().head.getLong(0) shouldBe 50L
    }
  }

  test("VERSION AS OF answers from THAT version's metadata") {
    val root = fixture()
    GraftTable.deleteWhere(spark, root, col("k") >= 500)
    withCatalog {
      val head = spark.sql(s"SELECT count(*) AS n, max(k) AS mx FROM graft.`$root`")
      withClue(plan(head)) { plan(head) should include("LocalTableScan") }
      head.collect().head.getLong(0) shouldBe 500L
      val past = spark.sql(
        s"SELECT count(*) AS n, max(k) AS mx FROM graft.`$root` VERSION AS OF 0")
      withClue(plan(past)) { plan(past) should include("LocalTableScan") }
      val r = past.collect().head
      r.getLong(0) shouldBe 1000L
      r.getLong(1) shouldBe 999L
    }
  }

  test("an outstanding MOR log declines the pushdown (and the scan refuses loudly)") {
    val root = fixture()
    GraftTable.deleteMor(spark, root, spark.range(1, 4).toDF("k"))
    withCatalog {
      val ex = intercept[Exception] {
        spark.sql(s"SELECT count(*) AS n FROM graft.`$root`").collect()
      }
      ex.getMessage should include("MOR")
      // the merging read remains the correct path
      GraftTable.read(spark, root).count() shouldBe 997L
    }
  }
}
