package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  private def L(rows: (Long, Long, String)*) = rows.toDF("k", "ts", "name")
  private def R(rows: (Long, Long, Double)*) = rows.toDF("k", "ts", "v")

  private def run(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
    AsOfJoin.join(l, r, Seq("k"), "ts", "ts")
      .select(col("name"), col("asof.v"))
      .collect().map(row => (row.getString(0), Option(row.get(1)))).toMap

  test("picks the latest right row at or before each left ts") {
    val got = run(
      L((1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c")),
      R((1L, 5L, 1.0), (1L, 15L, 2.0), (1L, 25L, 3.0)))
    got shouldBe Map("a" -> Some(1.0), "b" -> Some(2.0), "c" -> Some(3.0))
  }

  test("left rows before any right row get null") {
    val got = run(L((1L, 1L, "early")), R((1L, 5L, 1.0)))
    got shouldBe Map("early" -> None)
  }

  test("equal timestamps match (inclusive as-of)") {
    val got = run(L((1L, 5L, "same")), R((1L, 5L, 9.0)))
    got shouldBe Map("same" -> Some(9.0))
  }

  test("keys never mix") {
    val got = run(L((1L, 10L, "k1"), (2L, 10L, "k2")), R((1L, 5L, 1.0)))
    got shouldBe Map("k1" -> Some(1.0), "k2" -> None)
  }

  test("duplicate (key, ts) right rows resolve to the greatest tie-break") {
    val l = L((1L, 10L, "a"))
    // two right rows at the same (key, ts) — without a tie-break the
    // carried row is partition-order-dependent; with one it's the max
    val r = R((1L, 5L, 1.0), (1L, 5L, 2.0))
    val got = AsOfJoin.join(l, r, Seq("k"), "ts", "ts", rightTieBreak = Seq("v"))
      .select(col("asof.v")).head().getDouble(0)
    got shouldBe 2.0
  }

  test("plan shuffles once on the key — no range-join explosion") {
    val l = L((1L, 10L, "a")); val r = R((1L, 5L, 1.0))
    val plan = AsOfJoin.join(l, r, Seq("k"), "ts", "ts")
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }
}
