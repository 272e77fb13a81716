package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Sketch accuracy bounds + write-layout properties. */
class ApproxAndLayoutSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}

  test("approx_count_distinct lands within 5% of exact") {
    val li = Tables.lineitem(spark, sf0001)
    val exact = li.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    // rsd is a standard deviation, not a bound — size the sketch (1%)
    // well inside the asserted tolerance
    val approx = li.select(approx_count_distinct(col("l_orderkey"), 0.01)).head().getLong(0)
    math.abs(approx - exact).toDouble / exact should be <= 0.05
  }

  test("approx_percentile brackets the exact median") {
    val li = Tables.lineitem(spark, sf0001)
    val exact = li.select(expr("percentile(l_extendedprice, 0.5)")).head().getDouble(0)
    val approx = li.select(expr("approx_percentile(l_extendedprice, 0.5, 1000)"))
      .head().getDouble(0)
    (math.abs(approx - exact) / exact) should be <= 0.02
  }

  test("range-partitioned sorted write produces files with disjoint key ranges") {
    val path = Files.createTempDirectory("range_write").toString + "/t"
    Tables.lineitem(spark, sf0001)
      .repartitionByRange(4, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.parquet(path)
    val files = new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet"))
    files.length should be >= 2
    val ranges = files.map { f =>
      val df = spark.read.parquet(f.getAbsolutePath)
      val r = df.agg(min("l_orderkey"), max("l_orderkey")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    // disjoint + internally ordered: each file's min exceeds the previous max
    ranges.sliding(2).foreach {
      case Array((_, prevMax), (curMin, _)) => curMin should be > prevMax
      case _ =>
    }
  }
}
