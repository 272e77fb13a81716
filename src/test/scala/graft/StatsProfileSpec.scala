package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.sources.GraftTable
import java.nio.file.Files

/** Metadata-only snapshot profiles (GraftTable.statsProfile): the
  * manifest's stats segments must answer row/null/min/max EXACTLY as a
  * full scan would, across multi-commit tables, schema evolution, and
  * all-null columns — and decline (None) whenever metadata cannot be
  * exact (outstanding MOR log, unknown text bounds) rather than guess.
  */
class StatsProfileSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  private def fresh(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  /** full-scan reference profile of one column */
  private def scanProfile(path: String, c: String): (Long, Long, Option[String], Option[String]) = {
    val df = GraftTable.read(spark, path)
    val r = df.agg(count(lit(1)), count(when(col(c).isNull, 1)),
      min(col(c)).cast("string"), max(col(c)).cast("string")).head()
    (r.getLong(0), r.getLong(1), Option(r.getString(2)), Option(r.getString(3)))
  }

  test("profile equals a full scan across create/upsert/delete generations") {
    val path = fresh("sp_multi")
    val base = spark.range(0, 500).toDF("k")
      .withColumn("x", col("k") * 3 - 100)
      .withColumn("s", concat(lit("v"), lpad(col("k").cast("string"), 4, "0")))
    GraftTable.create(base, path, Seq("k"), nbuckets = 4)
    GraftTable.upsert(spark, path,
      spark.range(400, 600).toDF("k")
        .withColumn("x", col("k") * 7)
        .withColumn("s", concat(lit("z"), col("k").cast("string"))))
    GraftTable.deleteWhere(spark, path, col("k") % 5 === 0)
    val Some((n, prof)) = GraftTable.statsProfile(path)
    for (c <- Seq("k", "x", "s")) {
      val (rows, nulls, mn, mx) = scanProfile(path, c)
      n shouldBe rows
      prof(c).nullCount shouldBe nulls
      prof(c).min shouldBe mn
      prof(c).max shouldBe mx
    }
  }

  test("a column added by evolution counts pre-evolution rows as null, exactly") {
    val path = fresh("sp_evo")
    GraftTable.create(spark.range(0, 100).toDF("k"), path, Seq("k"), nbuckets = 4)
    // only keys 90..119 carry the new column; buckets holding ONLY old
    // rows keep their pre-evolution stats segments
    GraftTable.upsert(spark, path,
      spark.range(90, 120).toDF("k").withColumn("tag", concat(lit("t"), col("k"))))
    val Some((n, prof)) = GraftTable.statsProfile(path)
    val (rows, nulls, mn, mx) = scanProfile(path, "tag")
    n shouldBe rows
    prof("tag").nullCount shouldBe nulls
    prof("tag").min shouldBe mn
    prof("tag").max shouldBe mx
    nulls should be > 0L // the claim is only interesting if nulls exist
  }

  test("all-null column: nullCount = rows, bounds None (not unknown-crash)") {
    val path = fresh("sp_allnull")
    GraftTable.create(
      spark.range(0, 50).toDF("k").withColumn("e", lit(null).cast("string")),
      path, Seq("k"), nbuckets = 2)
    val Some((n, prof)) = GraftTable.statsProfile(path)
    prof("e").nullCount shouldBe n
    prof("e").min shouldBe None
    prof("e").max shouldBe None
  }

  test("oversized text bounds report None, never a truncated value as exact") {
    val path = fresh("sp_longtext")
    val long = "x" * 300
    GraftTable.create(
      spark.range(0, 20).toDF("k")
        .withColumn("t", concat(lit(long), col("k").cast("string"))),
      path, Seq("k"), nbuckets = 2)
    val Some((_, prof)) = GraftTable.statsProfile(path)
    prof("t").min shouldBe None // 120-char prefix is a bound, not the min
    prof("t").max shouldBe None // oversized max recorded as unknown
    prof("t").nullCount shouldBe 0L
  }

  test("declines while a MOR log is outstanding; answers again after compact") {
    val path = fresh("sp_mor")
    GraftTable.create(spark.range(0, 100).toDF("k").withColumn("x", col("k")),
      path, Seq("k"), nbuckets = 4)
    GraftTable.upsertMor(spark, path,
      Seq((200L, 999L)).toDF("k", "x"))
    GraftTable.statsProfile(path) shouldBe None
    GraftTable.compact(spark, path)
    val Some((n, prof)) = GraftTable.statsProfile(path)
    n shouldBe 101L
    prof("x").max shouldBe Some("999")
  }

  test("timestamp bounds come back as epoch micros") {
    val path = fresh("sp_ts")
    val df = spark.range(0, 10).toDF("k")
      .withColumn("ts", timestamp_micros(lit(1700000000000000L) + col("k") * 1000000L))
    GraftTable.create(df, path, Seq("k"), nbuckets = 2)
    val Some((_, prof)) = GraftTable.statsProfile(path)
    prof("ts").min shouldBe Some("1700000000000000")
    prof("ts").max shouldBe Some("1700000009000000")
  }
}
