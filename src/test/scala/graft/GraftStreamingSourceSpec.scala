package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.GraftTable
import java.nio.file.Files

/** The lakehouse as a first-class Structured Streaming endpoint:
  * `readStream.format("graft")` (change feed, offsets = table versions)
  * and `writeStream.format("graft")` (keyed upsert sink with replay
  * skipping) — the Hudi streaming read/write surface.
  */
class GraftStreamingSourceSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  test("readStream.format(\"graft\"): initial image, then incremental changes across restarts") {
    val tmp = Files.createTempDirectory("graft_rstream").toString
    val src = s"$tmp/t"; val cp = s"$tmp/cp"
    GraftTable.create(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), src, Seq("k"), nbuckets = 4)
    GraftTable.upsert(spark, src, Seq((2L, "b2")).toDF("k", "s"))

    def consume(name: String): Seq[(Long, String, Boolean)] = {
      // foreachBatch (not the memory sink, which refuses checkpoint
      // recovery) so each run RESUMES the same checkpoint
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Boolean)]
      val q = spark.readStream.format("graft").load(src)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          buf ++= b.collect().map(r =>
            (r.getAs[Long]("k"), r.getAs[String]("s"), r.getAs[Boolean]("_deleted")))
          ()
        }
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      buf.toSeq
    }

    // fresh checkpoint: one batch = the full snapshot at head (v1)
    consume("cdc_run1").sortBy(_._1) shouldBe
      Seq((1L, "a", false), (2L, "b2", false))

    // new commits, SAME checkpoint: the restarted query resumes from the
    // checkpointed version offset and sees exactly the delta, deletes included
    GraftTable.upsert(spark, src, Seq((3L, "c")).toDF("k", "s"))
    GraftTable.delete(spark, src, Seq(Tuple1(1L)).toDF("k"))
    consume("cdc_run2").sortBy(_._1) shouldBe
      Seq((1L, "a", true), (3L, "c", false))

    // caught up, same checkpoint: nothing new
    consume("cdc_run3") shouldBe Seq.empty
  }

  test("readStream startingVersion skips history at a fresh checkpoint") {
    val tmp = Files.createTempDirectory("graft_rstream_sv").toString
    val src = s"$tmp/t"
    GraftTable.create(Seq((1L, 10)).toDF("k", "x"), src, Seq("k"), nbuckets = 2)
    GraftTable.upsert(spark, src, Seq((2L, 20)).toDF("k", "x"))
    val q = spark.readStream.format("graft").option("startingVersion", "0").load(src)
      .writeStream.format("memory").queryName("cdc_sv")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // changes (0, 1] only — the v0 snapshot is skipped
    spark.table("cdc_sv").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Int]("x"))).toSeq shouldBe Seq((2L, 20))
  }

  test("writeStream.format(\"graft\") upserts micro-batches; last-wins across batches") {
    val tmp = Files.createTempDirectory("graft_wstream").toString
    val dst = s"$tmp/t"; val cp = s"$tmp/cp"
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]

    def runBatch(rows: (Long, String)*): Unit = {
      in.addData(rows: _*)
      val q = in.toDF().toDF("k", "s")
        .writeStream.format("graft")
        .option("recordkey", "k").option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start(dst)
      q.awaitTermination()
    }

    runBatch((1L, "a"), (2L, "b"))
    runBatch((2L, "b2"), (3L, "c"))
    GraftTable.read(spark, dst).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq shouldBe
      Seq((1L, "a"), (2L, "b2"), (3L, "c"))
    // versions advanced once per non-empty micro-batch
    GraftTable.latestVersion(dst) shouldBe 1
  }

  test("sink option refreshindexes keeps ALL attached indexes tracking the stream head") {
    import graft.sources.{GraftHnsw, GraftIndex, TextIndex}
    val tmp = Files.createTempDirectory("graft_wsidx").toString
    val dst = s"$tmp/t"; val cp = s"$tmp/cp"
    implicit val sqlCtx = spark.sqlContext
    val dim = 8
    def vec(i: Long): Seq[Float] =
      (0 until dim).map(d => math.sin(i * 37.0 + d * 11.0).toFloat)
    // seed table + one index of each family in batch
    GraftTable.create((0L until 20L).map(i => (i, vec(i), s"alpha doc $i"))
      .toDF("k", "vec", "text"), dst, Seq("k"), nbuckets = 4)
    GraftHnsw.create(spark, dst, "vec", nSegments = 2, m = 8, efConstruction = 64)
    TextIndex.create(spark, dst, "text")
    GraftIndex.create(spark, dst, "vec", nlist = 4)
    val in = MemoryStream[(Long, Seq[Float], String)]
    def runBatch(rows: (Long, Seq[Float], String)*): Unit = {
      in.addData(rows: _*)
      val q = in.toDF().toDF("k", "vec", "text")
        .writeStream.format("graft")
        .option("recordkey", "k").option("checkpointLocation", cp)
        .option("refreshindexes", "1")
        .trigger(Trigger.AvailableNow()).start(dst)
      q.awaitTermination()
    }
    runBatch((100L, vec(100), "zebra quark doc"))
    // every family is CURRENT — no manual refresh, no operator loop
    val head1 = GraftTable.latestVersion(dst)
    GraftHnsw.meta(dst).indexedVersion shouldBe head1
    TextIndex.meta(dst).indexedVersion shouldBe head1
    GraftIndex.meta(dst).indexedVersion shouldBe head1
    // and the stale-loud probes serve the NEW row without allowStale
    GraftHnsw.probe(spark, dst, vec(100), k = 1, ef = 256)
      .head().getLong(0) shouldBe 100L
    TextIndex.search(spark, dst, "zebra", 5)
      .collect().map(_.getLong(0)) should contain(100L)
    // an UPDATE batch exercises the tombstone/COW refresh paths through
    // the sink: the old copy dies everywhere
    runBatch((100L, vec(3), "alpha replaced"))
    GraftHnsw.meta(dst).indexedVersion shouldBe GraftTable.latestVersion(dst)
    TextIndex.search(spark, dst, "zebra", 5).count() shouldBe 0L
    GraftHnsw.probe(spark, dst, vec(100), k = 20, ef = 512)
      .filter(col("k") === 100L).count() shouldBe 1L // only the new copy
  }

  test("sink option maxsegments bounds HNSW segment growth across stream batches") {
    import graft.sources.GraftHnsw
    val tmp = Files.createTempDirectory("graft_wsmseg").toString
    val dst = s"$tmp/t"; val cp = s"$tmp/cp"
    implicit val sqlCtx = spark.sqlContext
    def vec(i: Long): Seq[Float] =
      (0 until 8).map(d => math.sin(i * 37.0 + d * 11.0).toFloat)
    GraftTable.create((0L until 20L).map(i => (i, vec(i)))
      .toDF("k", "vec"), dst, Seq("k"), nbuckets = 4)
    GraftHnsw.create(spark, dst, "vec", nSegments = 2, m = 8, efConstruction = 64)
    val in = MemoryStream[(Long, Seq[Float])]
    def runBatch(rows: (Long, Seq[Float])*): Unit = {
      in.addData(rows: _*)
      val q = in.toDF().toDF("k", "vec")
        .writeStream.format("graft")
        .option("recordkey", "k").option("checkpointLocation", cp)
        .option("refreshindexes", "1").option("maxsegments", "3")
        .trigger(Trigger.AvailableNow()).start(dst)
      q.awaitTermination()
    }
    // five CDC batches would ratchet 2 → 7 segments unbounded; the cap
    // auto-merges the flush tier each tick
    (0 until 5).foreach(i => runBatch((200L + i, vec(200L + i))))
    val m = GraftHnsw.meta(dst)
    m.indexedVersion shouldBe GraftTable.latestVersion(dst)
    m.segs.length should be <= 3
    // merged layout still serves every streamed row
    GraftHnsw.probe(spark, dst, vec(203L), k = 1, ef = 512)
      .head().getLong(0) shouldBe 203L
  }

  test("sink after a checkpoint RESET applies the restarted batch 0 instead of dropping it") {
    val tmp = Files.createTempDirectory("graft_wreset").toString
    val dst = s"$tmp/t"; val cp = s"$tmp/cp"
    implicit val sqlCtx = spark.sqlContext

    def writeOnce(stream: org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)],
                  rows: (Long, String)*): Unit = {
      stream.addData(rows: _*)
      val q = stream.toDF().toDF("k", "s")
        .writeStream.format("graft")
        .option("recordkey", "k").option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start(dst)
      q.awaitTermination()
    }

    val s1 = MemoryStream[(Long, String)]
    writeOnce(s1, (1L, "a"))
    writeOnce(s1, (2L, "b")) // marker is now at batchId 1
    // the user wipes the checkpoint to reprocess: batchIds restart at 0
    // with FRESH data — it must be applied, not skipped as a "replay"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cp))
    val s2 = MemoryStream[(Long, String)]
    writeOnce(s2, (3L, "c"))
    GraftTable.read(spark, dst).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq shouldBe
      Seq((1L, "a"), (2L, "b"), (3L, "c"))
  }

  test("full streaming pipeline: table -> change feed -> streaming mirror") {
    val tmp = Files.createTempDirectory("graft_pipe").toString
    val src = s"$tmp/src"; val dst = s"$tmp/dst"; val cp = s"$tmp/cp"
    GraftTable.create(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), src, Seq("k"), nbuckets = 4)
    GraftTable.upsert(spark, src, Seq((2L, "b2"), (3L, "c")).toDF("k", "s"))

    // readStream(graft) -> drop deletes -> writeStream(graft): a live
    // downstream replica built ONLY from the streaming surfaces
    def sync(): Unit = {
      val q = spark.readStream.format("graft").load(src)
        .filter(!col("_deleted")).drop("_deleted")
        .writeStream.format("graft")
        .option("recordkey", "k").option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start(dst)
      q.awaitTermination()
    }
    sync()
    GraftTable.read(spark, dst).orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("s"))).toSeq shouldBe
      Seq((1L, "a"), (2L, "b2"), (3L, "c"))
    // more commits, resume the same checkpoint: only the delta flows
    GraftTable.upsert(spark, src, Seq((1L, "a2")).toDF("k", "s"))
    sync()
    GraftTable.read(spark, dst).orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("s"))).toSeq shouldBe
      Seq((1L, "a2"), (2L, "b2"), (3L, "c"))
  }
}
