package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.streaming.EventStreams
import graft.sources.{ChangeFeed, GraftTable}
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

  test("change feed round-trips upserts AND deletes into a downstream mirror") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("cdc_rt").toString
    val src = s"$tmp/src"; val dst = s"$tmp/dst"; val cur = s"$tmp/cursor"

    def mirror(): Option[(Int, Int)] =
      ChangeFeed.pollOnce(spark, src, cur) { (batch, _, _) =>
        ChangeFeed.applyToTable(spark, batch, dst, Seq("k"))
      }
    def snap(path: String): Set[(Long, String)] =
      GraftTable.read(spark, path).collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[String]("s"))).toSet

    GraftTable.create(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), src, Seq("k"), nbuckets = 4)
    mirror() shouldBe Some((-1, 0)) // initial image
    snap(dst) shouldBe snap(src)
    mirror() shouldBe None // caught up: apply not invoked, no version churn

    GraftTable.upsert(spark, src, Seq((2L, "b2"), (3L, "c")).toDF("k", "s"))
    GraftTable.delete(spark, src, Seq(1L).toDF("k"))
    mirror() shouldBe Some((0, 2)) // one batch covers both commits
    snap(dst) shouldBe Set((2L, "b2"), (3L, "c"))
    snap(dst) shouldBe snap(src)
    ChangeFeed.cursor(cur) shouldBe 2
  }

  test("streamInto consumes the change feed from a streaming ticker") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("cdc_stream").toString
    val src = s"$tmp/src"; val dst = s"$tmp/dst"; val cur = s"$tmp/cursor"
    GraftTable.create(Seq((1L, 10)).toDF("k", "x"), src, Seq("k"), nbuckets = 2)

    val q = ChangeFeed.streamInto(spark, src, cur,
        Trigger.ProcessingTime("100 milliseconds")) { (batch, _, _) =>
      ChangeFeed.applyToTable(spark, batch, dst, Seq("k"))
    }
    try {
      def await(cond: => Boolean): Unit = {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (!cond && System.nanoTime() < deadline) Thread.sleep(100)
        cond shouldBe true
      }
      await(ChangeFeed.cursor(cur) == 0)
      GraftTable.upsert(spark, src, Seq((2L, 20)).toDF("k", "x"))
      await(ChangeFeed.cursor(cur) == 1)
      GraftTable.read(spark, dst).orderBy("k").collect()
        .map(r => (r.getLong(0), r.getInt(1))) shouldBe Array((1L, 10), (2L, 20))
    } finally q.stop()
  }

  test("a change-feed cursor behind the vacuum horizon fails loudly, not silently") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("cdc_vac").toString
    val src = s"$tmp/src"; val cur = s"$tmp/cursor"
    GraftTable.create(Seq((1L, 1)).toDF("k", "x"), src, Seq("k"), nbuckets = 2)
    ChangeFeed.pollOnce(spark, src, cur)((_, _, _) => ()) // cursor -> 0
    for (i <- 2 to 4)
      GraftTable.upsert(spark, src, Seq((i.toLong, i)).toDF("k", "x"))
    GraftTable.vacuum(src, keepVersions = 1) // horizon passes version 0
    // the consumer must NOT silently skip the lost history
    an[Exception] should be thrownBy
      ChangeFeed.pollOnce(spark, src, cur)((b, _, _) => { b.collect(); () })
  }

  test("streaming dedup emits one row per key") {
    val out = EventStreams.runAvailableNow(spark, sf0001,
      df => EventStreams.dedupedEvents(df, "event_id").select("event_id"),
      "dedup_test", OutputMode.Append())
    out.count() shouldBe Tables.events(spark, sf0001).select("event_id").distinct().count()
  }
}
