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
