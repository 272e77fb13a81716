package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.functions.kllsketch._
import graft.sources.{GraftTable, QuantileView}
import java.nio.file.Files

/** KLL quantile primitives (rank-error bound vs exact sorts) and the
  * incrementally-maintained quantile view (intent-protocol ticks,
  * rollups, append-only contract).
  */
class QuantileViewSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  /** true rank of value v in data (INCLUSIVE: fraction of values <= v) */
  private def rankOf(data: Seq[Double], v: Double): Double =
    data.count(_ <= v).toDouble / data.size

  test("kll_agg/kll_quantiles: reported quantiles honor the KLL rank-error bound") {
    val n = 20000
    val rnd = new scala.util.Random(3)
    val data = Seq.fill(n)(rnd.nextDouble() * 1000.0)
    val df = data.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val ranks = Seq(0.01, 0.25, 0.5, 0.75, 0.95, 0.99)
    val got = df.agg(kll_quantiles(kll_agg(col("v")), ranks).as("q"))
      .head().getSeq[Double](0)
    // k=200 ⇒ ε ≈ 1.65 % rank error (two-sided, high probability);
    // assert a slightly looser 2.5 % so the bound is the library's, not
    // the seed's luck
    ranks.zip(got).foreach { case (r, v) =>
      math.abs(rankOf(data, v) - r) should be <= 0.025
    }
  }

  test("kll_merge_agg over per-partition sketches == quantiles of the union") {
    val a = (0 until 5000).map(i => ("a", i.toDouble))
    val b = (0 until 5000).map(i => ("b", 5000.0 + i))
    val df = (a ++ b).toDF("g", "v")
    val per = df.groupBy("g").agg(kll_agg(col("v")).as("sk"))
    val merged = per.agg(kll_quantiles(kll_merge_agg(col("sk")), Seq(0.5)).as("q"))
      .head().getSeq[Double](0).head
    // true median of 0..9999 — rank error 1.65 % of 10 000 = ±165
    merged shouldBe 5000.0 +- 200.0
  }

  private def mkSource(n: Int): String = {
    val root = Files.createTempDirectory("qv").toString + "/src"
    val df = spark.range(0, n).toDF("id")
      .withColumn("seg", col("id") % 4)
      .withColumn("v", (col("id") * 7 % 1000).cast("double"))
    GraftTable.create(df, root, Seq("id"), nbuckets = 4)
    root
  }

  test("bootstrap + quantiles: per-group medians within the rank bound") {
    val src = mkSource(8000)
    val view = src.stripSuffix("/src") + "/view"
    QuantileView.bootstrap(spark, src, view, Seq("seg"), "v") shouldBe 0
    val rows = QuantileView.quantiles(spark, view, Seq(0.5))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.keySet shouldBe Set(0L, 1L, 2L, 3L)
    // v = (id*7) % 1000 is near-uniform on [0,1000) in every segment
    rows.values.foreach(_ shouldBe 500.0 +- 60.0)
  }

  test("tick folds ONLY the delta and converges to the combined quantiles") {
    val src = mkSource(4000)
    val view = src.stripSuffix("/src") + "/view"
    QuantileView.bootstrap(spark, src, view, Seq("seg"), "v")
    // append a skewed batch: new ids, all values = 2000 (shifts p95 up)
    GraftTable.upsert(spark, src,
      spark.range(4000, 6000).toDF("id")
        .withColumn("seg", col("id") % 4)
        .withColumn("v", lit(2000.0)))
    QuantileView.applyOnce(spark, src, view, Seq("seg"), "v") shouldBe Some((0, 1))
    QuantileView.appliedTo(view) shouldBe 1
    // caught up: a second tick is a no-op (and must not double-fold)
    QuantileView.applyOnce(spark, src, view, Seq("seg"), "v") shouldBe None
    val p = QuantileView.quantiles(spark, view, Seq(0.5, 0.95))
      .collect().map(r => (r.getLong(0), r.getDouble(2)) -> r.getDouble(1)).toMap
    // per segment: 1000 old values uniform [0,1000) + 500 at 2000 —
    // true p50 ≈ 750th of 1500 ≈ 750, p95 = 2000; rank error ±1.65 %
    (0 to 3).foreach { s =>
      p((s.toLong, 0.5)) shouldBe 750.0 +- 80.0
      p((s.toLong, 0.95)) shouldBe 2000.0 +- 1e-9
    }
  }

  test("rollup answers the grand-total quantile from stored sketches alone") {
    val src = mkSource(8000)
    val view = src.stripSuffix("/src") + "/view"
    QuantileView.bootstrap(spark, src, view, Seq("seg"), "v")
    val total = QuantileView.rollup(spark, view, Seq.empty, Seq(0.5))
      .head().getDouble(0)
    total shouldBe 500.0 +- 60.0
  }

  test("a crashed tick (intent without merge) replays without double-folding") {
    val src = mkSource(2000)
    val view = src.stripSuffix("/src") + "/view"
    QuantileView.bootstrap(spark, src, view, Seq("seg"), "v")
    GraftTable.upsert(spark, src,
      spark.range(2000, 3000).toDF("id")
        .withColumn("seg", col("id") % 4).withColumn("v", lit(2000.0)))
    // simulate a crash BEFORE the merge committed: stale intent on disk
    java.nio.file.Files.writeString(java.nio.file.Paths.get(view, "_qsk_intent"),
      s"1|${GraftTable.latestVersion(view)}")
    // the redo tick clears it and folds the batch exactly once
    QuantileView.applyOnce(spark, src, view, Seq("seg"), "v") shouldBe Some((0, 1))
    val p95 = QuantileView.quantiles(spark, view, Seq(0.95))
      .collect().map(_.getDouble(1))
    all(p95) shouldBe 2000.0 +- 1e-9
    // and a crash AFTER the merge (intent resolves): watermark finalizes,
    // no re-fold — p50 stays at the exactly-once value
    val before = QuantileView.quantiles(spark, view, Seq(0.5))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    java.nio.file.Files.writeString(java.nio.file.Paths.get(view, "_qsk_intent"),
      s"1|${GraftTable.latestVersion(view) - 1}") // proven landed
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(view, "_qsk_applied"))
    QuantileView.appliedTo(view) shouldBe 1 // resolved from the intent
    QuantileView.applyOnce(spark, src, view, Seq("seg"), "v") shouldBe None
    QuantileView.quantiles(spark, view, Seq(0.5))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap shouldBe before
  }
}
