package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.functions.theta._

/** Theta sketch aggregates/expressions. Key property under test: below
  * k = 4096 distinct keys the sketch is in EXACT mode (θ = 1, every
  * hash retained), so aggregate → set-op → estimate must reproduce
  * exact set algebra integer-for-integer — that's what licenses the
  * DuckDB oracle on q_segment_overlap_sketch. Above k, estimates stay
  * inside the error envelope. Union idempotence and the SQL surface
  * round out the contract.
  */
class ThetaSketchSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  // two groups with known overlap: g0 = [0, 600), g1 = [400, 1000)
  private def twoGroups() =
    spark.range(0, 600).toDF("uid").withColumn("grp", lit(0))
      .unionByName(spark.range(400, 1000).toDF("uid").withColumn("grp", lit(1)))

  test("exact mode: aggregate -> intersect/diff -> estimate is exact set algebra") {
    val sks = twoGroups().groupBy("grp").agg(theta_sketch_agg(col("uid")).as("sk"))
    val a = sks.filter(col("grp") === 0).select(col("sk").as("ska"))
    val b = sks.filter(col("grp") === 1).select(col("sk").as("skb"))
    val row = a.crossJoin(b).select(
      round(theta_estimate(col("ska"))).cast("long").as("na"),
      round(theta_estimate(col("skb"))).cast("long").as("nb"),
      round(theta_estimate(theta_intersection(col("ska"), col("skb")))).cast("long").as("ov"),
      round(theta_estimate(theta_a_not_b(col("ska"), col("skb")))).cast("long").as("onlyA"),
      round(theta_estimate(theta_union(col("ska"), col("skb")))).cast("long").as("un")
    ).head()
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4)) shouldBe
      ((600L, 600L, 200L, 400L, 1000L))
  }

  test("string and binary keys sketch identically to their content") {
    val s1 = spark.range(0, 300).select(concat(lit("u"), col("id")).as("k"))
      .agg(theta_sketch_agg(col("k"))).head.getAs[Array[Byte]](0)
    val s2 = spark.range(0, 300)
      .select(concat(lit("u"), col("id")).cast("binary").as("k"))
      .agg(theta_sketch_agg(col("k"))).head.getAs[Array[Byte]](0)
    // same byte content must hash identically whichever Spark type
    // carried it (both paths feed raw UTF-8 bytes to the hash)
    graft.functions.ThetaKernels.estimate(
      graft.functions.ThetaKernels.intersectionBytes(s1, s2)) shouldBe 300.0
  }

  test("theta_union_agg rolls persisted partials up to the direct sketch") {
    val parts = spark.range(0, 2000).toDF("uid")
      .withColumn("seg", (col("uid") % 7).cast("int"))
      .groupBy("seg").agg(theta_sketch_agg(col("uid")).as("sk"))
    val rolled = parts.agg(round(theta_estimate(theta_union_agg(col("sk"))))
      .cast("long")).head.getLong(0)
    rolled shouldBe 2000L   // exact mode: partials cover [0, 2000) disjointly... and overlap-free
  }

  test("union is idempotent: re-merging the same sketch changes nothing") {
    val sk = spark.range(0, 500).toDF("uid")
      .agg(theta_sketch_agg(col("uid"))).head.getAs[Array[Byte]](0)
    val once = graft.functions.ThetaKernels.unionBytes(sk, sk)
    graft.functions.ThetaKernels.estimate(once) shouldBe
      graft.functions.ThetaKernels.estimate(sk)
  }

  test("approximate mode: above k the estimate stays in the error envelope") {
    val n = 100000L
    val est = spark.range(0, n).toDF("uid")
      .agg(theta_estimate(theta_sketch_agg(col("uid")))).head.getDouble(0)
    math.abs(est - n) / n.toDouble should be <= 0.05
  }

  test("SQL surface: registered theta functions run the overlap matrix") {
    GraftFunctions.register(spark)
    twoGroups().createOrReplaceTempView("theta_sql_t")
    val row = spark.sql("""
      WITH sks AS (SELECT grp, theta_sketch_agg(uid) AS sk FROM theta_sql_t GROUP BY grp)
      SELECT CAST(round(theta_estimate(theta_intersection(a.sk, b.sk))) AS BIGINT) AS ov,
             CAST(round(theta_estimate(theta_a_not_b(a.sk, b.sk))) AS BIGINT) AS onlyA
      FROM sks a JOIN sks b ON a.grp < b.grp""").head()
    (row.getLong(0), row.getLong(1)) shouldBe ((200L, 400L))
  }
}
