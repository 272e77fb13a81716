package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.operators.IncrementalDedup
import graft.sources.GraftTable
import java.nio.file.Files

/** Continuous-ingestion exact dedup against a persistent hash ledger:
  * first-seen-wins across batches, min-key within a batch, replay-safe.
  */
class IncrementalDedupSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  private def ledger(): String =
    Files.createTempDirectory("graft_iled").toString + "/ledger"

  test("first batch admits winners; later batches admit only unseen content") {
    val led = ledger()
    // batch 0: "a" twice (ids 3, 7) and "b" once
    val b0 = Seq((7L, "a", 0L), (3L, "a", 0L), (5L, "b", 0L)).toDF("id", "text", "batch")
    val s0 = IncrementalDedup.admitExact(spark, led, b0, "text", Seq("id"))
      .select("id").as[Long].collect().sorted
    s0 shouldBe Array(3L, 5L) // min id wins the in-batch tie
    // batch 1: "b" again (dup), "c" new, null text dropped
    val b1 = Seq((11L, "b", 1L), (12L, "c", 1L),
      (13L, null.asInstanceOf[String], 1L)).toDF("id", "text", "batch")
    val s1 = IncrementalDedup.admitExact(spark, led, b1, "text", Seq("id"))
    s1.select("id").as[Long].collect().sorted shouldBe Array(12L)
    // survivors stay pinned: evaluating s1 again AFTER further admits
    IncrementalDedup.admitExact(spark, led, Seq((20L, "d", 2L)).toDF("id", "text", "batch"),
      "text", Seq("id")).count() shouldBe 1
    s1.select("id").as[Long].collect().sorted shouldBe Array(12L)
    // ledger holds one row per distinct content, first admitter's keys
    val rows = GraftTable.read(spark, led).select("id", "batch")
      .as[(Long, Long)].collect().sorted
    rows shouldBe Array((3L, 0L), (5L, 0L), (12L, 1L), (20L, 2L))
  }

  test("replaying a batch admits nothing (at-least-once upstream is safe)") {
    val led = ledger()
    val b = (0L until 50L).map(k => (k, s"text-${k % 20}", 0L)).toDF("id", "text", "batch")
    IncrementalDedup.admitExact(spark, led, b, "text", Seq("id")).count() shouldBe 20
    IncrementalDedup.admitExact(spark, led, b, "text", Seq("id")).count() shouldBe 0
    GraftTable.read(spark, led).count() shouldBe 20
  }

  test("minhash ledger: exact re-crawls and near-dups are rejected across batches") {
    val led = ledger()
    // doc k draws from its own disjoint vocab range — zero shared
    // shingles across distinct k, so non-dups cannot collide
    def doc(k: Long): String = (0 until 30).map(i => s"w${k * 40 + i}").mkString(" ")
    // batch 0: 30 distinct docs (long enough to shingle)
    val b0 = (0L until 30L).map(k => (k, doc(k))).toDF("id", "text")
    val s0 = IncrementalDedup.admitMinhash(spark, led, b0, "id", "text")
    s0.count() shouldBe 30 // pairwise-disjoint vocab: all admitted
    // batch 1: exact copies of 0..9 under new ids (signature-identical →
    // certain rejection), plus 5 genuinely new docs
    val b1 = ((0L until 10L).map(k => (k + 1000L, doc(k))) ++
      (0L until 5L).map(k => (k + 2000L, doc(9000L + k)))).toDF("id", "text")
    val s1 = IncrementalDedup.admitMinhash(spark, led, b1, "id", "text")
    s1.select("id").as[Long].collect().sorted shouldBe (0L until 5L).map(_ + 2000L).toArray
    // near-dup of an admitted doc (one word changed out of 30) collides
    // with overwhelming probability at 128 perms / 32 bands
    val near = doc(0L).replace("w7 ", "wX ")
    val b2 = Seq((3000L, near)).toDF("id", "text")
    IncrementalDedup.admitMinhash(spark, led, b2, "id", "text").count() shouldBe 0
    // replay of batch 0: every band self-collides — nothing admitted
    IncrementalDedup.admitMinhash(spark, led, b0, "id", "text").count() shouldBe 0
  }

  test("minhash ledger: in-batch exact dup resolves to the smaller id") {
    val led = ledger()
    val same = (0 until 25).map(i => s"t$i").mkString(" ")
    val other = (0 until 25).map(i => s"u$i").mkString(" ")
    val b = Seq((9L, same), (4L, same), (6L, other)).toDF("id", "text")
    IncrementalDedup.admitMinhash(spark, led, b, "id", "text")
      .select("id").as[Long].collect().sorted shouldBe Array(4L, 6L)
  }

  test("verifyTau: a borderline near-dup that band-only rejects is admitted under verify") {
    // numPerms = bands = 64 (one signature row per band): a single
    // matching minhash row collides, so band-only rejection fires with
    // P ≈ 1-(1-J)^64 — near-certain even at J ≈ 0.5. The bottom-k
    // verify then measures the pair's ACTUAL Jaccard and admits
    // anything below τ. All hashing is deterministic, so these
    // outcomes are fixed for fixed texts.
    def tokens(r: Range) = r.map(i => s"v$i").mkString(" ")
    val base = tokens(0 until 40)
    val borderline = tokens(20 until 60) // shares tokens 20..39 with base
    val b0 = Seq((1L, base)).toDF("id", "text")
    val b1 = Seq((2L, borderline)).toDF("id", "text")

    // band-only: the borderline doc is swallowed by the S-curve tail
    val ledBand = ledger()
    IncrementalDedup.admitMinhash(spark, ledBand, b0, "id", "text",
      numPerms = 64, bands = 64).count() shouldBe 1
    IncrementalDedup.admitMinhash(spark, ledBand, b1, "id", "text",
      numPerms = 64, bands = 64).count() shouldBe 0

    // verify at τ = 0.8: the same pair's true Jaccard is well below τ
    // (18/58 on 3-shingles), so the sketch check rescues the admission
    val ledVer = ledger()
    IncrementalDedup.admitMinhash(spark, ledVer, b0, "id", "text",
      numPerms = 64, bands = 64, verifyTau = Some(0.8)).count() shouldBe 1
    IncrementalDedup.admitMinhash(spark, ledVer, b1, "id", "text",
      numPerms = 64, bands = 64, verifyTau = Some(0.8)).count() shouldBe 1

    // a true near-dup (one token changed in 40) is still rejected
    val near = base.replace("v7 ", "vX ")
    IncrementalDedup.admitMinhash(spark, ledVer, Seq((3L, near)).toDF("id", "text"),
      "id", "text", numPerms = 64, bands = 64, verifyTau = Some(0.8)).count() shouldBe 0

    // replay under verify: self-estimate is 1 ⇒ nothing re-admitted
    IncrementalDedup.admitMinhash(spark, ledVer, b0, "id", "text",
      numPerms = 64, bands = 64, verifyTau = Some(0.8)).count() shouldBe 0

    // in-batch borderline pair under verify: both admitted
    val ledBatch = ledger()
    IncrementalDedup.admitMinhash(spark, ledBatch,
      Seq((1L, base), (2L, borderline)).toDF("id", "text"), "id", "text",
      numPerms = 64, bands = 64, verifyTau = Some(0.8)).count() shouldBe 2
  }

  test("verifyTau: colliding doc with no stored sketch rejects conservatively") {
    // ledger written WITHOUT verify (no sketch table) — enabling verify
    // later must not silently admit dups of pre-verify admissions
    val led = ledger()
    val text = (0 until 30).map(i => s"m$i").mkString(" ")
    IncrementalDedup.admitMinhash(spark, led,
      Seq((1L, text)).toDF("id", "text"), "id", "text").count() shouldBe 1
    IncrementalDedup.admitMinhash(spark, led,
      Seq((2L, text)).toDF("id", "text"), "id", "text",
      verifyTau = Some(0.8)).count() shouldBe 0
  }

  test("streamAdmitExact: a live table's change feed dedups continuously into a curated table") {
    val tmp = Files.createTempDirectory("graft_sadmit").toString
    val src = s"$tmp/src"; val led = s"$tmp/led"; val dst = s"$tmp/dst"; val cp = s"$tmp/cp"
    def run(): Unit =
      IncrementalDedup.streamAdmitExact(spark, src, led, dst, "text", Seq("id"),
        checkpointLocation = Some(cp)).awaitTermination()
    def dstIds(): Seq[Long] =
      GraftTable.read(spark, dst).select("id").as[Long].collect().sorted.toSeq

    // crawl table with an in-batch dup: min id wins, dup dropped
    GraftTable.create(Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha")).toDF("id", "text"),
      src, Seq("id"), nbuckets = 4)
    run()
    dstIds() shouldBe Seq(1L, 2L)
    // new crawl increment: a re-crawl of "beta" rejects, "gamma" admits
    GraftTable.upsert(spark, src, Seq((10L, "beta"), (11L, "gamma")).toDF("id", "text"))
    run()
    dstIds() shouldBe Seq(1L, 2L, 11L)
    // restart with nothing new: checkpoint resumes, nothing re-admitted
    run()
    dstIds() shouldBe Seq(1L, 2L, 11L)
    // a source delete is not new content; the curated first-seen copy stays
    GraftTable.delete(spark, src, Seq(1L).toDF("id"))
    run()
    dstIds() shouldBe Seq(1L, 2L, 11L)
  }

  test("matches a whole-corpus brute force: first batch, then min id") {
    val led = ledger()
    def text(k: Long): String = s"doc-${(k * 13) % 37}"
    val batches = (0 to 2).map { b =>
      ((0L until 60L).filter(k => k % 3 == b).map(k => (k, text(k), b.toLong)))
        .toDF("id", "text", "batch")
    }
    batches.foreach(IncrementalDedup.admitExact(spark, led, _, "text", Seq("id")))
    val got = GraftTable.read(spark, led).select("id", "batch")
      .as[(Long, Long)].collect().sorted.toSeq
    val want = (0L until 60L).map(k => (k, text(k), k % 3))
      .groupBy(_._2).values.map(_.minBy(r => (r._3, r._1))).map(r => (r._1, r._3))
      .toSeq.sorted
    got shouldBe want
  }
}
