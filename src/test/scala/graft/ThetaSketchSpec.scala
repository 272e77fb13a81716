package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

/** Theta sketch set algebra. Spark 4.1 ships the DataSketches theta
  * family natively (`theta_sketch_agg` / `theta_union[_agg]` /
  * `theta_intersection` / `theta_difference` / `theta_sketch_estimate`)
  * so graft's audience-overlap queries ride the builtins — no custom
  * aggregate. These tests pin the properties the DuckDB oracle on
  * q_segment_overlap_sketch relies on: below k = 4096 distinct keys
  * (lgK = 12) the sketch is in EXACT mode (θ = 1, every hash
  * retained), so aggregate → set-op → estimate must reproduce exact
  * set algebra integer-for-integer. Above k, estimates stay inside the
  * error envelope. Union idempotence (the sketch-view replay property)
  * and the native SQL surface round out the contract.
  */
class ThetaSketchSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark

  // two groups with known overlap: g0 = [0, 600), g1 = [400, 1000)
  private def twoGroups() =
    spark.range(0, 600).toDF("uid").withColumn("grp", lit(0))
      .unionByName(spark.range(400, 1000).toDF("uid").withColumn("grp", lit(1)))

  test("exact mode: aggregate -> intersect/diff -> estimate is exact set algebra") {
    val sks = twoGroups().groupBy("grp").agg(theta_sketch_agg(col("uid"), 12).as("sk"))
    val a = sks.filter(col("grp") === 0).select(col("sk").as("ska"))
    val b = sks.filter(col("grp") === 1).select(col("sk").as("skb"))
    val row = a.crossJoin(b).select(
      round(theta_sketch_estimate(col("ska"))).cast("long").as("na"),
      round(theta_sketch_estimate(col("skb"))).cast("long").as("nb"),
      round(theta_sketch_estimate(theta_intersection(col("ska"), col("skb")))).cast("long").as("ov"),
      round(theta_sketch_estimate(theta_difference(col("ska"), col("skb")))).cast("long").as("onlyA"),
      round(theta_sketch_estimate(theta_union(col("ska"), col("skb")))).cast("long").as("un")
    ).head()
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4)) shouldBe
      ((600L, 600L, 200L, 400L, 1000L))
  }

  test("theta_union_agg rolls persisted partials up to the direct sketch") {
    val parts = spark.range(0, 2000).toDF("uid")
      .withColumn("seg", (col("uid") % 7).cast("int"))
      .groupBy("seg").agg(theta_sketch_agg(col("uid"), 12).as("sk"))
    val rolled = parts.agg(round(theta_sketch_estimate(theta_union_agg(col("sk"), 12)))
      .cast("long")).head.getLong(0)
    rolled shouldBe 2000L   // exact mode: partials cover [0, 2000) disjointly
  }

  test("union is idempotent: re-merging the same sketch changes nothing") {
    val sk = spark.range(0, 500).toDF("uid")
      .agg(theta_sketch_agg(col("uid"), 12).as("sk"))
    val row = sk.select(
      theta_sketch_estimate(col("sk")).cast("double").as("once"),
      theta_sketch_estimate(theta_union(col("sk"), col("sk"))).cast("double").as("twice")
    ).head()
    row.getDouble(1) shouldBe row.getDouble(0)
  }

  test("approximate mode: above k the estimate stays in the error envelope") {
    val n = 100000L
    val est = spark.range(0, n).toDF("uid")
      .agg(theta_sketch_estimate(theta_sketch_agg(col("uid"), 12)).cast("double"))
      .head.getDouble(0)
    math.abs(est - n) / n.toDouble should be <= 0.05
  }

  test("SQL surface: the native theta functions run the overlap matrix") {
    twoGroups().createOrReplaceTempView("theta_sql_t")
    val row = spark.sql("""
      WITH sks AS (SELECT grp, theta_sketch_agg(uid, 12) AS sk FROM theta_sql_t GROUP BY grp)
      SELECT CAST(round(theta_sketch_estimate(theta_intersection(a.sk, b.sk))) AS BIGINT) AS ov,
             CAST(round(theta_sketch_estimate(theta_difference(a.sk, b.sk))) AS BIGINT) AS onlyA
      FROM sks a JOIN sks b ON a.grp < b.grp""").head()
    (row.getLong(0), row.getLong(1)) shouldBe ((200L, 400L))
  }
}
