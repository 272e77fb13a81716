package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.operators.Layout
import java.nio.file.Files

class LayoutSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}

  /** number of files whose [min,max] of `keyCol` intersects [lo, hi] —
    * the files a stats-based reader must open for that predicate.
    */
  private def filesTouched(path: String, keyCol: String, lo: Long, hi: Long): Int =
    new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet")).count { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(keyCol), max(keyCol)).head()
      r.getLong(0) <= hi && r.getLong(1) >= lo
    }

  test("z-order layout prunes on the second dimension; single-sort does not") {
    val li = Tables.lineitem(spark, sf0001)
    val nFiles = 8

    val zPath = Files.createTempDirectory("z").toString + "/t"
    Layout.zorder(li, "l_orderkey", "l_partkey", nFiles).write.parquet(zPath)

    val sortPath = Files.createTempDirectory("s").toString + "/t"
    li.repartitionByRange(nFiles, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey").write.parquet(sortPath)

    // a box selective in the SECOND dimension
    val pmax = li.agg(max("l_partkey")).head().getLong(0)
    val (lo, hi) = (0L, pmax / 8)
    val zTouched = filesTouched(zPath, "l_partkey", lo, hi)
    val sTouched = filesTouched(sortPath, "l_partkey", lo, hi)

    withClue(s"z=$zTouched sorted=$sTouched: ") {
      zTouched should be < sTouched // z-order clusters BOTH dims
    }
    // and no rows are lost by re-clustering
    spark.read.parquet(zPath).count() shouldBe li.count()
  }

  test("zvalue interleaves bits correctly") {
    import spark.implicits._
    // a=0b11, b=0b00 → even positions set: 0b0101 = 5
    val r = Seq((3L, 0L)).toDF("a", "b")
      .select(Layout.zvalue(col("a"), col("b"), 2)).head().getLong(0)
    r shouldBe 5L
    // a=0b00, b=0b11 → odd positions: 0b1010 = 10
    val r2 = Seq((0L, 3L)).toDF("a", "b")
      .select(Layout.zvalue(col("a"), col("b"), 2)).head().getLong(0)
    r2 shouldBe 10L
  }

  test("zvalue on INT columns with high bits matches long inputs (no sign corruption)") {
    import spark.implicits._
    // 40000/50000 exercise bit 15: interleaved positions reach bit 31,
    // the int sign bit — the long-widened interleave must stay positive
    val viaInt = Seq((40000, 50000)).toDF("a", "b")
      .select(Layout.zvalue(col("a"), col("b"), 16)).head().getLong(0)
    val viaLong = Seq((40000L, 50000L)).toDF("a", "b")
      .select(Layout.zvalue(col("a"), col("b"), 16)).head().getLong(0)
    viaInt shouldBe viaLong
    viaInt should be >= 0L
  }
}
