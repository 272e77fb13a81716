package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.sources.GraftTable
import java.nio.file.Files

/** Storage-partitioned joins over GraftTable's DSv2 catalog
  * (graft.sources.v2): two tables co-bucketed on their record keys
  * must JOIN WITH ZERO SHUFFLE, results identical to the merging read
  * path; the scan refuses MOR-logged snapshots loudly.
  */
class SpjSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.toRdd.count() // finalize AQE
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  private def withSpjConf[T](body: => T): T = {
    val confs = Seq(
      "spark.sql.catalog.graft" -> classOf[graft.sources.v2.GraftCatalog].getName,
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("co-bucketed join runs with ZERO shuffle and matches the merging read") {
    val root = Files.createTempDirectory("spj").toString
    val a = s"$root/a"; val b = s"$root/b"
    GraftTable.create(
      spark.range(0, 2000).toDF("k").withColumn("x", col("k") * 2),
      a, Seq("k"), nbuckets = 8)
    GraftTable.create(
      spark.range(500, 2500).toDF("k").withColumn("y", col("k") % 7),
      b, Seq("k"), nbuckets = 8)
    withSpjConf {
      val joined = spark.table(s"graft.`$a`")
        .join(spark.table(s"graft.`$b`"), "k")
        .groupBy("y").agg(count(lit(1)).as("n"), sum("x").as("sx"))
      val plan = finalPlan(joined)
      // the join itself must not exchange: with SPJ active the only
      // shuffle in the plan is the groupBy's
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      withClue(plan) {
        plan should include("SortMergeJoin")
        exchanges should be <= 1 // groupBy only; the join sides have none
        plan should not include "Exchange rangepartitioning"
      }
      val got = joined.orderBy("y").collect().toSeq
      val want = GraftTable.read(spark, a).join(GraftTable.read(spark, b), "k")
        .groupBy("y").agg(count(lit(1)).as("n"), sum("x").as("sx"))
        .orderBy("y").collect().toSeq
      got shouldBe want
    }
  }

  test("v2 snapshot read equals the merging read after upserts and deletes") {
    val root = Files.createTempDirectory("spj_rw").toString
    val a = s"$root/t"
    GraftTable.create(
      spark.range(0, 500).toDF("k").withColumn("x", col("k")),
      a, Seq("k"), nbuckets = 4)
    GraftTable.upsert(spark, a,
      spark.range(400, 600).toDF("k").withColumn("x", col("k") * 10))
    GraftTable.deleteWhere(spark, a, col("k") % 9 === 0)
    withSpjConf {
      val got = spark.table(s"graft.`$a`").orderBy("k").collect().toSeq
      val want = GraftTable.read(spark, a).orderBy("k").collect().toSeq
      got shouldBe want
    }
  }

  test("column pruning reaches the v2 scan") {
    val root = Files.createTempDirectory("spj_prune").toString
    val a = s"$root/t"
    GraftTable.create(spark.range(0, 100).toDF("k")
      .withColumn("x", col("k")).withColumn("s", concat(lit("v"), col("k"))),
      a, Seq("k"), nbuckets = 2)
    withSpjConf {
      val df = spark.table(s"graft.`$a`").select("k")
      // the BatchScan's output column list is the pruned schema: only k
      val plan = df.queryExecution.executedPlan.toString
      withClue(plan) {
        "BatchScan [^\\[]*\\[k#\\d+L\\]".r.findFirstIn(plan) should not be None
      }
      df.count() shouldBe 100L
    }
  }

  test("pushed filters skip files inside buckets and prune parquet row groups") {
    val root = Files.createTempDirectory("spj_filter").toString
    val a = s"$root/t"
    GraftTable.create(spark.range(0, 4000).toDF("k")
      .withColumn("x", col("k")).withColumn("grp", (col("k") % 100).cast("int")),
      a, Seq("k"), nbuckets = 2)
    // range-split each bucket into 4 x-ordered files so stats can skip
    GraftTable.compact(spark, a, clusterBy = Some(("x", "x")), targetFilesPerBucket = 4)
    withSpjConf {
      // filtered v2 read equals the merging read under the same filter
      val cond = col("x") >= 3500
      val got = spark.table(s"graft.`$a`").filter(cond).orderBy("k").collect().toSeq
      val want = GraftTable.read(spark, a).filter(cond).orderBy("k").collect().toSeq
      got shouldBe want
      got.length shouldBe 500
      // unit-level: the scan plans FEWER files under the pushed filter
      val v = GraftTable.latestVersion(a)
      val sc = GraftTable.snapshotSchema(a, v).get
      def filesPlanned(fs: Seq[org.apache.spark.sql.sources.Filter]): Int =
        new graft.sources.v2.GraftScan(a, v, sc, sc, Seq("k"), 2, fs)
          .planInputPartitions()
          .map(_.asInstanceOf[graft.sources.v2.GraftInputPartition].files.length).sum
      val all = filesPlanned(Nil)
      val pruned = filesPlanned(Seq(org.apache.spark.sql.sources.GreaterThanOrEqual("x", 3500L)))
      withClue(s"all=$all pruned=$pruned") {
        all should be >= 8
        pruned should be < all
      }
    }
  }

  test("SQL DML through the catalog: INSERT INTO upserts, DELETE FROM prunes and deletes") {
    val root = Files.createTempDirectory("spj_dml").toString
    val a = s"$root/t"
    GraftTable.create(
      spark.range(0, 100).toDF("k").withColumn("x", col("k"))
        .withColumn("grp", (col("k") % 5).cast("int")),
      a, Seq("k"), nbuckets = 4)
    withSpjConf {
      // INSERT = keyed upsert: k=50 exists (last-wins), k=500 is new
      spark.range(0, 1).toDF("i").createOrReplaceTempView("spj_dml_src")
      spark.sql(s"INSERT INTO graft.`$a` VALUES (50, 999, 1), (500, 42, 2)")
      val t = GraftTable.read(spark, a)
      t.count() shouldBe 101L
      t.filter(col("k") === 50).head().getLong(1) shouldBe 999L
      t.filter(col("k") === 500).head().getLong(1) shouldBe 42L

      // DELETE WHERE runs the stats-pruned COW delete
      spark.sql(s"DELETE FROM graft.`$a` WHERE grp = 3 AND x < 40")
      val left = GraftTable.read(spark, a)
      left.filter(col("grp") === 3 && col("x") < 40).count() shouldBe 0L
      left.count() shouldBe 93L // 8 rows matched (k=3,8,...,38)

      // INSERT OVERWRITE refuses loudly
      val e = intercept[Exception] {
        spark.sql(s"INSERT OVERWRITE graft.`$a` VALUES (1, 1, 1)")
      }
      e.getMessage.toLowerCase should include("overwrite")

      // TRUNCATE TABLE = delete-all through the same SupportsDelete path
      spark.sql(s"TRUNCATE TABLE graft.`$a`")
      GraftTable.read(spark, a).count() shouldBe 0L
      // and the emptied table still accepts SQL inserts
      spark.sql(s"INSERT INTO graft.`$a` VALUES (7, 7, 0)")
      GraftTable.read(spark, a).count() shouldBe 1L
    }
  }

  test("scan planning is metadata-only: ZERO filesystem listings per query") {
    val root = Files.createTempDirectory("spj_meta").toString
    val a = s"$root/t"
    GraftTable.create(spark.range(0, 2000).toDF("k").withColumn("x", col("k") * 3),
      a, Seq("k"), nbuckets = 4)
    withSpjConf {
      val df = spark.table(s"graft.`$a`").filter(col("x") < 600)
      // planning (planInputPartitions) happens at action time; a
      // stats-bearing snapshot must derive its file list from the
      // manifest's #file lines — byte lengths included — with no
      // MetaIO.list call anywhere in the query
      val before = GraftTable.metaListCalls
      val got = df.orderBy("k").collect().toSeq
      val listed = GraftTable.metaListCalls - before
      withClue(s"listings during query: $listed") { listed shouldBe 0L }
      got shouldBe GraftTable.read(spark, a).filter(col("x") < 600)
        .orderBy("k").collect().toSeq
    }
  }

  test("bucket-count evolution: coalesceBuckets aligns n vs 2n with zero shuffle") {
    val root = Files.createTempDirectory("spj_evo").toString
    val a = s"$root/a"; val b = s"$root/b"
    GraftTable.create(spark.range(0, 3000).toDF("k").withColumn("x", col("k") * 2),
      a, Seq("k"), nbuckets = 4)
    GraftTable.create(spark.range(1000, 4000).toDF("k").withColumn("y", col("k") % 5),
      b, Seq("k"), nbuckets = 4)
    GraftTable.rebucket(spark, b, 8) // b evolves to 2n
    withSpjConf {
      // stock Spark declines n-vs-2n alignment: the un-coalesced join
      // shuffles (documented fallback — results stay correct)
      val plain = spark.table(s"graft.`$a`").join(spark.table(s"graft.`$b`"), "k")
      val want = GraftTable.read(spark, a).join(GraftTable.read(spark, b), "k")
        .orderBy("k").collect().toSeq
      plain.orderBy("k").collect().toSeq shouldBe want

      // coalesced: the 8-bucket side presents the 4-bucket layout
      // (pmod(h, 8) mod 4 == pmod(h, 4), so dir pairs merge exactly)
      // and the join plans with NO exchange on either side
      spark.conf.set("spark.sql.graft.spj.coalesceBuckets", "4")
      try {
        val joined = spark.table(s"graft.`$a`").join(spark.table(s"graft.`$b`"), "k")
        val plan = finalPlan(joined)
        withClue(plan) {
          plan should include("SortMergeJoin")
          plan should not include "Exchange hashpartitioning"
        }
        joined.orderBy("k").collect().toSeq shouldBe want
      } finally spark.conf.unset("spark.sql.graft.spj.coalesceBuckets")
    }
  }

  test("outstanding MOR log refuses the storage-partitioned scan loudly") {
    val root = Files.createTempDirectory("spj_mor").toString
    val a = s"$root/t"
    GraftTable.create(spark.range(0, 100).toDF("k").withColumn("x", col("k")),
      a, Seq("k"), nbuckets = 2)
    GraftTable.upsertMor(spark, a, Seq((500L, 1L)).toDF("k", "x"))
    withSpjConf {
      val e = intercept[Exception] {
        spark.table(s"graft.`$a`").collect()
      }
      e.getMessage should include("MOR log")
      // compact folds the log; the scan serves again
      GraftTable.compact(spark, a)
      spark.table(s"graft.`$a`").count() shouldBe 101L
    }
  }
}
