package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.operators.Fusion

class FusionSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  private lazy val scored =
    Seq((1L, 0.9), (2L, 0.5), (3L, 0.7), (4L, 0.5), (5L, 0.1))
      .toDF("id", "s")

  test("rankBy assigns dense deterministic ranks with id tie-break") {
    val got = Fusion.rankBy(scored, "id", col("s")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    got shouldBe Map(1L -> 1L, 3L -> 2L, 2L -> 3L, 4L -> 4L, 5L -> 5L)
  }

  test("rankBy is exact at multi-partition scale and stays in Catalyst") {
    // 10k rows, shuffled input over many partitions: ranks must be the
    // dense 1..n positions of the (score desc, id asc) total order —
    // this fails loudly if the count pass ever sees different sorted
    // partitions than the tag pass (the invariant the monotonic-id +
    // broadcast-offsets construction rests on)
    val n = 10000
    val data = spark.range(0, n).toDF("id")
      .withColumn("s", (col("id") * 2654435761L) % 1000) // heavy score ties
      .repartition(17)
    val got = Fusion.rankBy(data, "id", col("s")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    got.size shouldBe n
    got.values.toSeq.sorted shouldBe (1L to n.toLong)
    val expected = data.select("id", "s").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    got shouldBe expected
    // no RDD hop: the whole ranking is a Catalyst plan
    val plan = Fusion.rankBy(data, "id", col("s")).queryExecution.executedPlan.toString
    plan should not include "ExternalRDDScan"
  }

  test("rankByTopN equals the top-N prefix of the full ranking") {
    val full = Fusion.rankBy(scored, "id", col("s")).filter(col("rank") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sliced = Fusion.rankByTopN(scored, "id", col("s"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    sliced shouldBe full
  }

  test("rankByTopN plan is TakeOrderedAndProject, no full sort or RDD hop") {
    val plan = Fusion.rankByTopN(scored, "id", col("s"), 3)
      .queryExecution.executedPlan.toString
    plan should include("TakeOrderedAndProject")
    plan should not include "ExternalRDDScan" // stays in Catalyst, unlike rankBy
  }

  test("rrf sums 1/(k+rank) with 0 for retrievers that missed the doc") {
    val a = Seq((1L, 1L), (2L, 2L)).toDF("id", "rank")
    val b = Seq((2L, 1L), (3L, 2L)).toDF("id", "rank")
    val got = Fusion.rrf(Seq(a, b), "id", "rank", k = 60).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    got(1L) shouldBe (1.0 / 61) +- 1e-12
    got(2L) shouldBe (1.0 / 62 + 1.0 / 61) +- 1e-12
    got(3L) shouldBe (1.0 / 62) +- 1e-12
  }
}
