package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.streaming.EventStreams
import graft.sources.GraftTable
import java.nio.file.Files

class StreamingIngestSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}

  test("streaming upsert into GraftTable converges to the batch events table") {
    val path = Files.createTempDirectory("stream_ingest").toString + "/t"
    EventStreams.streamUpsertInto(spark, sf0001, path, Seq("event_id"))
    val got = GraftTable.read(spark, path)
    val want = Tables.events(spark, sf0001)
    got.count() shouldBe want.count()
    // spot-check full-row equality on a slice
    val g = got.filter(col("event_id") < 100).orderBy("event_id")
      .collect().map(_.toSeq)
    val w = want.filter(col("event_id") < 100).orderBy("event_id")
      .collect().map(_.toSeq)
    g shouldBe w
  }

  test("streaming dedup emits one row per key") {
    val out = EventStreams.runAvailableNow(spark, sf0001,
      df => EventStreams.dedupedEvents(df, "event_id").select("event_id"),
      "dedup_test", OutputMode.Append())
    out.count() shouldBe Tables.events(spark, sf0001).select("event_id").distinct().count()
  }
}
