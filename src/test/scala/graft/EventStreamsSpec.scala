package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** The streaming transforms produce the same result under readStream +
  * Trigger.AvailableNow as in batch — Spark's unified semantics,
  * asserted end to end on the sf0.001 events table.
  */
class EventStreamsSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("streaming windowedCounts == batch windowedCounts") {
    val batch = EventStreams.windowedCounts(Tables.events(spark, sf0001))
    val streamed = EventStreams.runAvailableNow(spark, sf0001,
      EventStreams.windowedCounts, "wc_test")
    canon(streamed) shouldBe canon(batch)
    batch.count() should be > 0L
  }

  test("streaming sessionCounts == batch sessionCounts") {
    val batch = EventStreams.sessionCounts(Tables.events(spark, sf0001))
    val streamed = EventStreams.runAvailableNow(spark, sf0001,
      EventStreams.sessionCounts, "sc_test")
    canon(streamed) shouldBe canon(batch)
  }

  test("mapGroupsWithState userStats final state == batch aggregate") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
    val got = EventStreams.userStats(ev)
      .collect().map(u => (u.user_id, (u.n_events, u.max_value))).toMap
    val want = Tables.events(spark, sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("n"), max("value").as("mx"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    got shouldBe want
  }
}
