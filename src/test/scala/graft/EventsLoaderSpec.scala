package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Regression guard for the events loader: the driver's data generator
  * has shipped `ts` as both TIMESTAMP(NANOS) (read as nanos-long under
  * the legacy conf) and timestamp[us] across regenerations, and a
  * loader pinned to either physical type breaks the entire event-time
  * query family when the data flips. These tests fabricate BOTH
  * schemas from the same logical rows and assert the normalized load
  * is identical — so the next regeneration is a no-op, not a 9-query
  * outage.
  */
class EventsLoaderSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}

  test("normalizeEventTs: timestamp ts passes through, nanos-long ts converts, results equal") {
    val base = Tables.events(spark, sf0001).limit(200).cache()
    base.schema("ts").dataType shouldBe TimestampType

    // Fabricate the nanos-as-long shape from the same rows
    // (unix_micros is exact; a double round-trip would lose ns bits).
    val asNanosLong = base.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
    asNanosLong.schema("ts").dataType shouldBe LongType

    val viaTimestamp = Tables.normalizeEventTs(base)
    val viaLong = Tables.normalizeEventTs(asNanosLong)

    viaTimestamp.schema("ts").dataType shouldBe TimestampType
    viaLong.schema("ts").dataType shouldBe TimestampType
    viaTimestamp.collect().map(_.toSeq).toSet shouldBe
      viaLong.collect().map(_.toSeq).toSet
    base.unpersist()
  }

  test("Tables.events loads the driver data with TimestampType ts and non-empty rows") {
    val ev = Tables.events(spark, sf0001)
    ev.schema("ts").dataType shouldBe TimestampType
    ev.count() should be > 0L
    // Event-time ops must analyze: a window over ts is the canary that
    // died in round 6.
    ev.groupBy(window(col("ts"), "30 minutes")).count().count() should be > 0L
  }

  test("streaming reader agrees with batch loader on schema and rows") {
    val batch = Tables.events(spark, sf0001)
    val streamed = graft.streaming.EventStreams.runAvailableNow(
      spark, sf0001, identity, "events_loader_parity",
      org.apache.spark.sql.streaming.OutputMode.Append())
    streamed.schema("ts").dataType shouldBe TimestampType
    streamed.count() shouldBe batch.count()
  }
}
