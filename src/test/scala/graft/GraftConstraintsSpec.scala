package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.sources.GraftTable
import java.nio.file.Files

/** CHECK constraints on the lakehouse (Delta `ADD CONSTRAINT`
  * semantics): add-time validation of existing data, write-plan-woven
  * enforcement (the guard rides the write job — a violating batch fails
  * BEFORE any commit lands, table bit-unchanged), ANSI NULL-passes
  * semantics, omitted-column-as-null judging, and coverage of both the
  * COW and MOR-delta write families.
  */
class GraftConstraintsSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  /** raise_error surfaces wrapped in SparkException layers — collect
    * the whole cause chain's text for assertions.
    */
  private def fullMessage(e: Throwable): String = {
    val sb = new StringBuilder
    var t: Throwable = e
    while (t != null) { sb.append(Option(t.getMessage).getOrElse("")); t = t.getCause }
    sb.toString
  }

  private def freshTable(prefix: String, n: Long = 200): String = {
    val path = Files.createTempDirectory(prefix).toString + "/t"
    val base = spark.range(0, n).toDF("k")
      .withColumn("x", col("k") * 2)
      .withColumn("name", concat(lit("row-"), col("k")))
    GraftTable.create(base, path, Seq("k"), nbuckets = 4)
    path
  }

  test("violating upsert fails loudly and commits NOTHING") {
    val path = freshTable("ck_upsert")
    GraftTable.addConstraint(spark, path, "x_nonneg", "x >= 0")
    GraftTable.constraints(path) shouldBe Map("x_nonneg" -> "x >= 0")
    val before = GraftTable.read(spark, path).orderBy("k").collect()
    val e = intercept[Exception] {
      GraftTable.upsert(spark, path,
        Seq((5L, -1L, "bad"), (6L, 12L, "fine")).toDF("k", "x", "name"))
    }
    fullMessage(e) should include("x_nonneg")
    GraftTable.latestVersion(path) shouldBe 0
    GraftTable.read(spark, path).orderBy("k").collect() shouldBe before

    // the clean part of the same batch still goes through on its own
    GraftTable.upsert(spark, path, Seq((6L, 12L, "fine")).toDF("k", "x", "name"))
    GraftTable.read(spark, path).filter(col("k") === 6).head().getLong(1) shouldBe 12L
  }

  test("NULL check result passes (ANSI unknown), FALSE fails") {
    val path = freshTable("ck_null")
    GraftTable.addConstraint(spark, path, "x_even", "x % 2 = 0")
    // null x → check is NULL → passes
    GraftTable.upsert(spark, path,
      Seq((7L, Option.empty[Long], "n")).toDF("k", "x", "name"))
    GraftTable.read(spark, path).filter(col("k") === 7).head().isNullAt(1) shouldBe true
    intercept[Exception] {
      GraftTable.upsert(spark, path, Seq((8L, Some(3L), "l")).toDF("k", "x", "name"))
    }
  }

  test("a batch omitting a constrained column is judged on the stored null") {
    val path = freshTable("ck_omit")
    GraftTable.addConstraint(spark, path, "x_nonneg", "x >= 0")
    // whole-row replace: omitted x becomes null in the stored row →
    // check NULL → passes (and must not crash on the missing column)
    GraftTable.upsert(spark, path, Seq((3L, "renamed")).toDF("k", "name"))
    GraftTable.read(spark, path).filter(col("k") === 3).head().isNullAt(1) shouldBe true
  }

  test("addConstraint refuses when EXISTING data violates, with examples") {
    val path = freshTable("ck_existing")
    GraftTable.upsert(spark, path, Seq((1L, -4L, "neg")).toDF("k", "x", "name"))
    val e = intercept[IllegalStateException] {
      GraftTable.addConstraint(spark, path, "x_nonneg", "x >= 0")
    }
    e.getMessage should include("existing rows violate")
    e.getMessage should include("-4")
    GraftTable.constraints(path) shouldBe empty
    // and with the bad row gone, the same constraint is accepted
    GraftTable.deleteWhere(spark, path, col("x") < 0)
    GraftTable.addConstraint(spark, path, "x_nonneg", "x >= 0")
    GraftTable.constraints(path).keySet shouldBe Set("x_nonneg")
  }

  test("dropConstraint lifts enforcement; multiple constraints all apply") {
    val path = freshTable("ck_drop")
    GraftTable.addConstraint(spark, path, "x_nonneg", "x >= 0")
    GraftTable.addConstraint(spark, path, "named", "name IS NOT NULL")
    fullMessage(intercept[Exception] {
      GraftTable.upsert(spark, path, Seq((9L, 1L, null: String)).toDF("k", "x", "name"))
    }) should include("named")
    GraftTable.dropConstraint(path, "named")
    GraftTable.upsert(spark, path, Seq((9L, 1L, null: String)).toDF("k", "x", "name"))
    // x_nonneg still enforced
    intercept[Exception] {
      GraftTable.upsert(spark, path, Seq((9L, -1L, "z")).toDF("k", "x", "name"))
    }
    GraftTable.dropConstraint(path, "x_nonneg")
    GraftTable.constraints(path) shouldBe empty
  }

  test("MOR delta commits are guarded too, and fail before any version lands") {
    val path = freshTable("ck_mor")
    GraftTable.addConstraint(spark, path, "x_nonneg", "x >= 0")
    intercept[Exception] {
      GraftTable.upsertMor(spark, path,
        Seq((11L, -2L, "bad")).toDF("k", "x", "name"))
    }
    GraftTable.latestVersion(path) shouldBe 0
    GraftTable.upsertMor(spark, path, Seq((11L, 2L, "ok")).toDF("k", "x", "name"))
    GraftTable.read(spark, path).filter(col("k") === 11).head().getLong(1) shouldBe 2L
  }

  test("mergeInto update images are judged, not the raw source") {
    val path = freshTable("ck_merge")
    GraftTable.addConstraint(spark, path, "x_cap", "x <= 1000")
    // source x is fine; the UPDATE image (x * 100) pushes row 9 over the
    // cap — the guard must see the image that would be stored
    val src = Seq((9L, 20L, "s")).toDF("k", "x", "name")
    fullMessage(intercept[Exception] {
      GraftTable.mergeInto(spark, path, src,
        matchedUpdate = Some((lit(true), Map("x" -> (col("s.x") * 100)))))
    }) should include("x_cap")
    GraftTable.latestVersion(path) shouldBe 0
    GraftTable.mergeInto(spark, path, src,
      matchedUpdate = Some((lit(true), Map("x" -> (col("s.x") * 10)))))
    GraftTable.read(spark, path).filter(col("k") === 9).head().getLong(1) shouldBe 200L
  }
}
