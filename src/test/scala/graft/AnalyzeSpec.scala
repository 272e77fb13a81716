package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.sources.GraftTable
import java.nio.file.Files

/** ANALYZE column statistics → the cost-based optimizer: the `_ndv`
  * sidecar round-trip, the v2 scan's `Statistics.columnStats()`
  * report (distinct/null counts, typed bounds, string lengths), the
  * translation into catalyst per-attribute stats the CBO prices with,
  * and the decline rules (filtered scans, unanalyzed tables).
  */
class AnalyzeSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
  private def withCatalog[T](body: => T): T =
    withConf("spark.sql.catalog.graft" -> classOf[graft.sources.v2.GraftCatalog].getName)(body)

  private def mkTable(): String = {
    val root = Files.createTempDirectory("analyze").toString + "/t"
    val df = spark.range(0, 400).toDF("k")
      .withColumn("grp", col("k") % 10)
      .withColumn("s", when(col("k") % 5 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("val_"), (col("k") % 25).cast("string"))))
      .withColumn("v", typedlit(Seq(1.0f, 2.0f))) // complex col: skipped
    GraftTable.create(df, root, Seq("k"), nbuckets = 4)
    root
  }

  test("analyze records exact NDV + string lengths; ndvProfile round-trips") {
    val root = mkTable()
    val out = GraftTable.analyze(spark, root)
    out("k").ndv shouldBe 400L
    out("grp").ndv shouldBe 10L
    out("s").ndv shouldBe 20L // 25 residue classes minus the 5 all-null ones (k%5==0)
    out.contains("v") shouldBe false // complex-typed: skipped
    val lens = out("s").strLen.get
    lens._2 shouldBe 6L // "val_NN" max byte length
    (lens._1 >= 5L && lens._1 <= 6L) shouldBe true
    val (v, prof) = GraftTable.ndvProfile(root).get
    v shouldBe GraftTable.latestVersion(root)
    prof shouldBe out
  }

  test("v2 scan columnStats carries ndv + exact nulls and typed bounds") {
    val root = mkTable()
    GraftTable.analyze(spark, root)
    val tbl = new graft.sources.v2.GraftV2Table(root)
    val scan = tbl.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Map.of())).build()
    val stats = scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    val cs = stats.columnStats()
    cs.isEmpty shouldBe false
    import scala.jdk.CollectionConverters._
    val byName = cs.asScala.map { case (ref, st) => ref.fieldNames.head -> st }.toMap
    byName("k").distinctCount().getAsLong shouldBe 400L
    byName("k").nullCount().getAsLong shouldBe 0L
    byName("k").min().get() shouldBe 0L
    byName("k").max().get() shouldBe 399L
    byName("s").nullCount().getAsLong shouldBe 80L // every 5th row
    byName("s").distinctCount().getAsLong shouldBe 20L
    byName("s").maxLen().getAsLong shouldBe 6L
    // string bounds are withheld (CBO never range-prices strings)
    byName("s").min().isPresent shouldBe false
  }

  test("columnStats reaches catalyst attributeStats and the CBO") {
    val root = mkTable()
    GraftTable.analyze(spark, root)
    withCatalog {
      withConf("spark.sql.cbo.enabled" -> "true") {
        val st = spark.table(s"graft.`$root`").queryExecution
          .optimizedPlan.stats
        st.rowCount shouldBe Some(BigInt(400))
        st.attributeStats.size should be >= 3
        val kStat = st.attributeStats.find(_._1.name == "k").get._2
        kStat.distinctCount shouldBe Some(BigInt(400))
        kStat.nullCount shouldBe Some(BigInt(0))
      }
    }
  }

  test("unanalyzed tables report no distinct counts but keep exact null/bounds") {
    val root = mkTable()
    val tbl = new graft.sources.v2.GraftV2Table(root)
    val scan = tbl.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Map.of())).build()
    val cs = scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics().columnStats()
    import scala.jdk.CollectionConverters._
    val byName = cs.asScala.map { case (ref, st) => ref.fieldNames.head -> st }.toMap
    byName("k").distinctCount().isPresent shouldBe false
    byName("k").nullCount().getAsLong shouldBe 0L
    byName("k").max().get() shouldBe 399L
  }

  test("CALL graft.analyze returns the per-column report; approx mode runs") {
    val root = mkTable()
    withCatalog {
      val rows = spark.sql(s"CALL graft.analyze('$root')").collect()
      rows.map(_.getString(0)).sorted shouldBe Array("grp", "k", "s")
      val k = rows.find(_.getString(0) == "k").get
      k.getLong(2) shouldBe 400L
      // approx mode: HLL estimate lands within the documented ±few %
      val approx = spark.sql(s"CALL graft.analyze('$root', approx => true)")
        .collect().find(_.getString(0) == "k").get.getLong(2)
      approx.toDouble shouldBe 400.0 +- 40.0
    }
  }

  test("equi-height histograms: bins cover the domain, per-bin NDV sums to the column NDV") {
    val root = mkTable()
    val out = GraftTable.analyze(spark, root, histogramBins = 8)
    val (height, bins) = out("k").hist.get
    bins.length shouldBe 8
    height shouldBe 50.0 // 400 non-null rows / 8 bins
    bins.head._1 shouldBe 0.0   // lo of first bin = min
    bins.last._2 shouldBe 399.0 // hi of last bin = max
    // every boundary is non-decreasing and each distinct value lands in
    // exactly one bin → per-bin NDVs sum to the column NDV
    bins.sliding(2).foreach { case Seq(a, b) => a._2 shouldBe b._1 }
    bins.map(_._3).sum shouldBe 400L
    // strings carry no histogram; round-trip through the sidecar
    out("s").hist shouldBe None
    GraftTable.ndvProfile(root).get._2 shouldBe out
  }

  test("histograms reach the catalyst attribute stats under CBO") {
    val root = mkTable()
    GraftTable.analyze(spark, root, histogramBins = 4)
    withCatalog {
      withConf("spark.sql.cbo.enabled" -> "true") {
        val st = spark.table(s"graft.`$root`").queryExecution.optimizedPlan.stats
        val kStat = st.attributeStats.find(_._1.name == "k").get._2
        val h = kStat.histogram.get
        h.bins.length shouldBe 4
        h.height shouldBe 100.0
        h.bins.map(_.ndv).sum shouldBe 400L
      }
    }
  }

  test("CALL analyze with histogram_bins reports bin counts") {
    val root = mkTable()
    withCatalog {
      val rows = spark.sql(s"CALL graft.analyze('$root', histogram_bins => 6)").collect()
      rows.find(_.getString(0) == "k").get.getLong(5) shouldBe 6L
      rows.find(_.getString(0) == "s").get.isNullAt(5) shouldBe true // strings: no histogram
    }
  }

  test("incremental analyze: first refresh matches exact NDV; later refreshes reuse sketches") {
    val root = mkTable()
    // HLL is exact below its coupon threshold, so at this size the
    // incremental estimate must EQUAL the exact counts
    val out = GraftTable.analyzeIncremental(spark, root)
    // HLL at lgK=12: exact for small sets, ~±2% at hundreds — grp/s are
    // exact, k gets the estimate tolerance
    out("k").ndv.toDouble shouldBe 400.0 +- 12.0
    out("grp").ndv shouldBe 10L
    out("s").ndv shouldBe 20L
    out("s").strLen.get._2 shouldBe 6L
    // the _ndv sidecar is the shared serving path (version-stamped, approx)
    val (v, prof) = GraftTable.ndvProfile(root).get
    v shouldBe GraftTable.latestVersion(root)
    prof("k").ndv.toDouble shouldBe 400.0 +- 12.0
    // capture the store, upsert keys that rewrite ONE bucket's files,
    // then refresh: untouched buckets' sketch lines must be reused
    // bit-identically (COW immutability is what makes this incremental)
    def store(): Set[String] = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "_ndvsketch"))).split("\n")
      .filter(l => l.nonEmpty && !l.startsWith("lgk=")).toSet
    val store0 = store()
    val oneBucketKeys = (400L until 500L).filter(k =>
      GraftTable.bucketFor(spark, root, -1, Map("k" -> k)) == 0).take(20)
    GraftTable.upsert(spark, root,
      oneBucketKeys.toDF("k").withColumn("grp", col("k") % 10)
        .withColumn("s", lit("brand_new_value"))
        .withColumn("v", typedlit(Seq(1.0f, 2.0f))))
    val out2 = GraftTable.analyzeIncremental(spark, root)
    out2("k").ndv.toDouble shouldBe (400.0 + oneBucketKeys.length) +- 14.0
    out2("s").ndv shouldBe 21L
    out2("s").strLen.get._2 shouldBe 15L // "brand_new_value"
    val store1 = store()
    // every line about a file that survived the commit is carried verbatim
    val survivors = store0.filter { l =>
      val file = l.stripPrefix("len:").split("\\|", 2)(0)
      store1.exists(_.contains(file))
    }
    (survivors -- store1) shouldBe empty
    survivors.nonEmpty shouldBe true
  }

  test("incremental analyze refuses MOR logs; CALL surface routes it") {
    val root = mkTable()
    withCatalog {
      spark.sql(s"CALL graft.analyze('$root', incremental => true)")
        .collect().find(_.getString(0) == "k").get.getLong(2).toDouble shouldBe 400.0 +- 12.0
      intercept[Exception] {
        spark.sql(
          s"CALL graft.analyze('$root', incremental => true, histogram_bins => 4)")
          .collect()
      }.getMessage should include("histogram")
    }
    GraftTable.upsertMor(spark, root,
      spark.range(0, 5).toDF("k").withColumn("grp", col("k") % 10)
        .withColumn("s", lit("x")).withColumn("v", typedlit(Seq(1.0f, 2.0f))))
    intercept[IllegalArgumentException] {
      GraftTable.analyzeIncremental(spark, root)
    }.getMessage should include("MOR")
  }

  test("stale NDV is served as an estimate; filtered scans withhold column stats") {
    val root = mkTable()
    GraftTable.analyze(spark, root)
    // a commit after analyze: NDV stays (estimate contract), nulls/bounds track the snapshot
    GraftTable.upsert(spark, root,
      spark.range(400, 500).toDF("k").withColumn("grp", col("k") % 10)
        .withColumn("s", lit("zzz_new")).withColumn("v", typedlit(Seq(1.0f, 2.0f))))
    val tbl = new graft.sources.v2.GraftV2Table(root)
    val scan = tbl.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Map.of())).build()
    import scala.jdk.CollectionConverters._
    val byName = scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics().columnStats().asScala
      .map { case (ref, st) => ref.fieldNames.head -> st }.toMap
    byName("k").distinctCount().getAsLong shouldBe 400L // analyze-time estimate
    byName("k").max().get() shouldBe 499L               // snapshot-exact bound
    // filtered scan: column stats withheld (they would not reflect the filter)
    val sb = tbl.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Map.of()))
    sb.asInstanceOf[org.apache.spark.sql.connector.read.SupportsPushDownFilters]
      .pushFilters(Array(org.apache.spark.sql.sources.GreaterThan("k", 100L)))
    sb.build().asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics().columnStats().isEmpty shouldBe true
  }
}
