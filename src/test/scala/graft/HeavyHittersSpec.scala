package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

/** Heavy hitters through Spark 4.1's native frequent-items sketches
  * (q_events_heavy_hitters): accumulate per segment → combine → one
  * estimate. With maxItemsTracked above the distinct-item count the
  * sketch is EXACT, so at gate scale every reported count must equal
  * the full GROUP BY's count and the reported top-k count multiset
  * must equal the exact one (item selection inside a tied boundary is
  * the sketch's to make — counts are not).
  */
class HeavyHittersSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}

  test("sketch top-k counts equal the exact GROUP BY at gate scale") {
    val got = SparkEntry.queries("q_events_heavy_hitters")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got should not be empty
    val exact = Tables.events(spark, sf0001)
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    // every reported count is the true count of that (type, user)
    got.foreach { case (t, u, n) => exact((t, u)) shouldBe n }
    // per type: the reported count multiset == the exact top-5 multiset
    got.groupBy(_._1).foreach { case (t, rows) =>
      val want = exact.collect { case ((`t`, _), n) => n }.toSeq
        .sorted(Ordering[Long].reverse).take(rows.length)
      rows.map(_._3).toSeq.sorted(Ordering[Long].reverse) shouldBe want
    }
  }

  test("partials merge associatively: per-day accumulate ∘ combine == one-shot") {
    val ev = Tables.events(spark, sf0001)
    val viaPartials = ev
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("approx_top_k_accumulate(user_id, 20000)").as("sk"))
      .groupBy("event_type")
      .agg(expr("approx_top_k_estimate(approx_top_k_combine(sk, 20000), 5)").as("top"))
      .select(col("event_type"), explode(col("top")).as("hh"))
      .select(col("event_type"), col("hh.item"), col("hh.count"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val oneShot = ev
      .groupBy("event_type")
      .agg(expr("approx_top_k(user_id, 5, 20000)").as("top"))
      .select(col("event_type"), explode(col("top")).as("hh"))
      .select(col("event_type"), col("hh.item"), col("hh.count"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // exact regime (maxItemsTracked > ndv): counts agree; compare as
    // (type, count) multisets to stay robust to tied-item selection
    viaPartials.map(x => (x._1, x._3)).groupBy(identity).view.mapValues(_.size).toMap shouldBe
      oneShot.map(x => (x._1, x._3)).groupBy(identity).view.mapValues(_.size).toMap
  }
}
