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

  test("stream-stream interval join == batch IntervalJoin") {
    import graft.operators.IntervalJoin
    val ev = Tables.events(spark, sf0001)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"),
        col("event_id").as("p_event_id"), col("value").as("p_value"))
    val batch = IntervalJoin.join(clicks, purchases, Seq("user_id"),
        "ts", "pts", lowerUs = -3600L * 1000000L, upperUs = 0L)
      .select("event_id", "p_event_id")
    val streamed = EventStreams.runAvailableNow(spark, sf0001,
      EventStreams.clickPurchaseJoin, "ssj_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .select("event_id", "p_event_id")
    canon(streamed) shouldBe canon(batch)
    batch.count() should be > 0L
  }

  test("batch IntervalJoin equals the naive range join") {
    import graft.operators.IntervalJoin
    val l = Seq((1L, 100L), (2L, 200L)).toDF("k", "sec")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"))
    val r = Seq((1L, 40L, "a"), (1L, 95L, "b"), (1L, 100L, "c"), (1L, 101L, "d"),
        (2L, 139L, "e"), (2L, 140L, "f"))
      .toDF("k", "sec", "tag")
      .select(col("k"), timestamp_seconds(col("sec")).as("rts"), col("tag"))
    // right within [ts-60s, ts]
    val got = IntervalJoin.join(l, r, Seq("k"), "ts", "rts", -60L * 1000000L, 0L)
      .select("k", "tag").collect().map(row => (row.getLong(0), row.getString(1))).toSet
    // a sits exactly on the inclusive lower bound (100-60=40); d is in
    // the future; e is 61 s before its left row — outside the window
    got shouldBe Set((1L, "a"), (1L, "b"), (1L, "c"), (2L, "f"))
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

  private lazy val batchUserAgg: Map[Long, (Long, Double)] =
    Tables.events(spark, sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("n"), max("value").as("mx"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap

  test("transformWithState userStatsTws (batch) == batch aggregate") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
    val got = EventStreams.userStatsTws(ev)
      .collect().map(u => (u.user_id, (u.n_events, u.max_value))).toMap
    got shouldBe batchUserAgg
  }

  test("transformWithState streams on RocksDB state: last update per user == batch aggregate") {
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val out = EventStreams.runAvailableNow(spark, sf0001,
        df => EventStreams.userStatsTws(
          df.select(col("user_id").cast("long"), col("value").cast("double"))
            .as[(Long, Double)]).toDF(),
        "tws_user_stats", org.apache.spark.sql.streaming.OutputMode.Update())
      // update mode re-emits a user on every micro-batch that touches
      // it; the FINAL emission (max n_events — the count is monotone)
      // is the converged state
      val got = out.groupBy("user_id")
        .agg(max(struct(col("n_events"), col("max_value"))).as("s"))
        .collect()
        .map(r => (r.getLong(0),
          (r.getStruct(1).getLong(0), r.getStruct(1).getDouble(1)))).toMap
      got shouldBe batchUserAgg
    } finally prev match {
      case Some(v) => spark.conf.set(provKey, v)
      case None => spark.conf.unset(provKey)
    }
  }
}
