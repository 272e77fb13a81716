package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.{GraftTable, IncrementalView}
import java.nio.file.Files

/** Retraction feed + incremental view maintenance. The contract under
  * test: `retractions(from, to)` is the exact z-set between the two
  * snapshots (apply it additively to the `from` multiset and you get
  * the `to` multiset — updates included, which `changes` can't
  * express), and a count/sum view folded from those feeds equals a
  * full recompute after EVERY commit, through COW upserts, predicate
  * deletes, MOR delta commits, deletion vectors, compaction no-ops,
  * group births and deaths, and replays.
  */
class IncrementalViewSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  private def freshSrc(prefix: String, n: Long = 400): String = {
    val path = Files.createTempDirectory(prefix).toString + "/src"
    val base = spark.range(0, n).toDF("k")
      .withColumn("grp", (col("k") % 7).cast("int"))
      .withColumn("m", col("k") * 3)
    GraftTable.create(base, path, Seq("k"), nbuckets = 8)
    path
  }

  private def viewFor(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/view"

  private val sums = Map("m_sum" -> col("m"))
  private def apply1(src: String, view: String) =
    IncrementalView.applyOnce(spark, src, view, Seq("grp"), sums)

  private def recompute(src: String): DataFrame =
    GraftTable.read(spark, src).groupBy("grp")
      .agg(count(lit(1)).as("cnt"), sum(col("m")).as("m_sum"))

  private def assertConverged(src: String, view: String): Unit = {
    val got = IncrementalView.read(spark, view)
      .select("grp", "cnt", "m_sum").orderBy("grp").collect().toSeq
    val want = recompute(src).orderBy("grp").collect().toSeq
    got shouldBe want
  }

  // multiset apply: from ⊎ plus ∖ minus == to, over full row images
  private def assertZset(src: String, from: Int, to: Int): Unit = {
    val feed = GraftTable.retractions(spark, src, from, to)
    def bag(df: DataFrame): Map[String, Int] = {
      val cols = df.columns.sorted
      df.select(cols.map(col).toIndexedSeq: _*).collect()
        .map(_.toString).groupBy(identity).map { case (s, a) => s -> a.length }
    }
    val fromBag = bag(GraftTable.read(spark, src, from))
    val toBag = bag(GraftTable.read(spark, src, to))
    val plus = bag(feed.filter(col("_weight") === 1).drop("_weight"))
    val minus = bag(feed.filter(col("_weight") === -1).drop("_weight"))
    val applied = (fromBag.keySet ++ plus.keySet).flatMap { k =>
      val n = fromBag.getOrElse(k, 0) + plus.getOrElse(k, 0) - minus.getOrElse(k, 0)
      if (n > 0) Some(k -> n) else None
    }.toMap
    applied shouldBe toBag
  }

  test("retractions carries +new and -old images for an update") {
    val src = freshSrc("ivm_ret_upd")
    GraftTable.upsert(spark, src, Seq((5L, 99, 1234L)).toDF("k", "grp", "m"))
    val feed = GraftTable.retractions(spark, src, 0, 1)
    val rows = feed.filter(col("k") === 5L)
      .select("grp", "m", "_weight").collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet
    rows shouldBe Set((99, 1234L, 1), (5 % 7, 15L, -1))
    assertZset(src, 0, 1)
  }

  test("retractions: inserts are +1 only, deletes are -1 only, untouched rows absent") {
    val src = freshSrc("ivm_ret_insdel")
    GraftTable.upsert(spark, src, Seq((5000L, 3, 7L)).toDF("k", "grp", "m"))
    GraftTable.deleteWhere(spark, src, col("k") === 10L)
    val f1 = GraftTable.retractions(spark, src, 0, 1)
    f1.count() shouldBe 1
    f1.head.getAs[Int]("_weight") shouldBe 1
    val f2 = GraftTable.retractions(spark, src, 1, 2)
    f2.select("k", "_weight").collect().map(r => (r.getLong(0), r.getInt(1))).toSet shouldBe
      Set((10L, -1))
    // cross-version window covers both commits
    assertZset(src, 0, 2)
  }

  test("retractions spans MOR channels: delta commits and deletion vectors") {
    val src = freshSrc("ivm_ret_mor")
    GraftTable.upsertMor(spark, src, Seq((7L, 0, 777L), (9000L, 5, 1L)).toDF("k", "grp", "m"))
    GraftTable.deleteWhereMor(spark, src, col("k") === 21L)
    assertZset(src, 0, 1)
    assertZset(src, 1, 2)
    assertZset(src, 0, 2)
    val feed = GraftTable.retractions(spark, src, 0, 2)
    feed.filter(col("k") === 7L).count() shouldBe 2   // before + after image
    feed.filter(col("k") === 21L).select("_weight").head.getInt(0) shouldBe -1
  }

  test("a compaction rewrite retracts nothing") {
    val src = freshSrc("ivm_ret_compact")
    GraftTable.upsertMor(spark, src, Seq((3L, 3, 33L)).toDF("k", "grp", "m"))
    GraftTable.compact(spark, src)
    GraftTable.retractions(spark, src, 1, 2).count() shouldBe 0L
  }

  test("view converges after every commit and tracks group births/deaths") {
    val src = freshSrc("ivm_view_conv")
    val view = viewFor("ivm_view_conv_v")
    IncrementalView.bootstrap(spark, src, view, Seq("grp"), sums, nbuckets = 4) shouldBe 0
    assertConverged(src, view)

    // updates that MOVE rows between groups + fresh inserts (new group 9)
    GraftTable.upsert(spark, src,
      Seq((0L, 9, 1000L), (1L, 9, 2000L), (5000L, 9, 5L), (5001L, 2, 6L))
        .toDF("k", "grp", "m"))
    apply1(src, view) shouldBe Some((0, 1))
    assertConverged(src, view)

    // kill group 9 entirely: its view row must disappear
    GraftTable.deleteWhere(spark, src, col("grp") === 9)
    apply1(src, view) shouldBe Some((1, 2))
    assertConverged(src, view)
    IncrementalView.read(spark, view).filter(col("grp") === 9).count() shouldBe 0L

    // MOR trickle: delta-commit upsert + DV delete, folded in one tick
    GraftTable.upsertMor(spark, src, Seq((2L, 2, -50L), (6000L, 6, 60L)).toDF("k", "grp", "m"))
    GraftTable.deleteWhereMor(spark, src, col("k") === 14L)
    apply1(src, view) shouldBe Some((2, 4))
    assertConverged(src, view)

    // caught up: no-op
    apply1(src, view) shouldBe None
  }

  test("an update touching no measure or group column writes nothing to the view") {
    val path = Files.createTempDirectory("ivm_noop").toString + "/src"
    val base = spark.range(0, 100).toDF("k")
      .withColumn("grp", (col("k") % 5).cast("int"))
      .withColumn("m", col("k"))
      .withColumn("note", lit("a"))
    GraftTable.create(base, path, Seq("k"), nbuckets = 4)
    val view = viewFor("ivm_noop_v")
    IncrementalView.bootstrap(spark, path, view, Seq("grp"), sums, nbuckets = 4)
    val vHead = GraftTable.latestVersion(view)
    GraftTable.update(spark, path, col("k") === 3L, Map("note" -> lit("b")))
    apply1(path, view) shouldBe Some((0, 1))
    // delta was all-zero -> mergeInto saw an empty source -> no view commit;
    // the sidecar watermark still advances so the range is never re-diffed
    GraftTable.latestVersion(view) shouldBe vHead
    IncrementalView.appliedTo(spark, view) shouldBe 1
    assertConverged(path, view)
  }

  test("enrich: a star-schema join view tracks dim-crossing group moves") {
    val src = freshSrc("ivm_join")           // grp plays the dim FOREIGN KEY here
    val view = viewFor("ivm_join_v")
    val dim = Seq((0, "r0"), (1, "r0"), (2, "r1"), (3, "r1"), (4, "r2"),
      (5, "r2"), (6, "r2"), (9, "r9")).toDF("d_key", "region")
    val enrich = (df: org.apache.spark.sql.DataFrame) =>
      df.join(broadcast(dim), col("grp") === col("d_key"))
    def recomputeJoin() =
      enrich(GraftTable.read(spark, src).withColumn("_weight", lit(1)))
        .groupBy("region").agg(count(lit(1)).as("cnt"), sum(col("m")).as("m_sum"))
        .orderBy("region").collect().toSeq
    def viewRows() = IncrementalView.read(spark, view)
      .select("region", "cnt", "m_sum").orderBy("region").collect().toSeq

    IncrementalView.bootstrap(spark, src, view, Seq("region"), sums,
      nbuckets = 4, enrich = enrich)
    viewRows() shouldBe recomputeJoin()

    // moves that cross the dim boundary: grp 1 (r0) -> 9 (r9) retracts
    // from one REGION and lands in another through the ± images' joins
    GraftTable.upsert(spark, src,
      Seq((1L, 9, 2000L), (8L, 9, 3000L), (7000L, 0, 70L)).toDF("k", "grp", "m"))
    IncrementalView.applyOnce(spark, src, view, Seq("region"), sums, enrich) shouldBe Some((0, 1))
    viewRows() shouldBe recomputeJoin()

    GraftTable.deleteWhere(spark, src, col("grp") === 9)   // region r9 dies
    IncrementalView.applyOnce(spark, src, view, Seq("region"), sums, enrich) shouldBe Some((1, 2))
    viewRows() shouldBe recomputeJoin()
    IncrementalView.read(spark, view).filter(col("region") === "r9").count() shouldBe 0L
  }

  test("streamMaintain follows a live source table to convergence") {
    val src = freshSrc("ivm_stream")
    val view = viewFor("ivm_stream_v")
    IncrementalView.bootstrap(spark, src, view, Seq("grp"), sums, nbuckets = 4)
    val q = IncrementalView.streamMaintain(spark, src, view, Seq("grp"), sums,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
    try {
      GraftTable.upsert(spark, src, Seq((9100L, 3, 5L), (4L, 6, 40L)).toDF("k", "grp", "m"))
      GraftTable.deleteWhere(spark, src, col("k") === 2L)
      val deadline = System.currentTimeMillis() + 60000
      def caughtUp = IncrementalView.appliedTo(spark, view) >= GraftTable.latestVersion(src)
      while (!caughtUp && System.currentTimeMillis() < deadline) Thread.sleep(200)
      caughtUp shouldBe true
      assertConverged(src, view)
    } finally q.stop()
  }

  test("exactly-once: the intent protocol survives sidecar loss, including pure group death + rebirth") {
    val src = freshSrc("ivm_replay")
    val view = viewFor("ivm_replay_v")
    IncrementalView.bootstrap(spark, src, view, Seq("grp"), sums, nbuckets = 4)

    // mixed batch: the resolved intent carries the watermark even
    // without the sidecar (the view head moved past the intent's
    // recorded pre-merge version, proving the merge landed)
    GraftTable.upsert(spark, src, Seq((11L, 4, 111L)).toDF("k", "grp", "m"))
    apply1(src, view)
    new java.io.File(view, "_ivm_applied").delete() shouldBe true
    IncrementalView.appliedTo(spark, view) shouldBe 1   // from the intent
    apply1(src, view) shouldBe None                      // replay refused
    assertConverged(src, view)

    // the hole a row-stamp scheme can't close: a PURE-group-death batch
    // stamps no surviving row, so crashing between its merge and its
    // sidecar write used to regress the watermark — and if the dead
    // group was then re-inserted before the next tick, the replayed
    // window netted death + rebirth into a cnt-0/partial delta that the
    // insert guard dropped. The intent must hold the watermark at the
    // death commit, so the next tick sees the rebirth as a clean +feed.
    GraftTable.upsert(spark, src, Seq((8000L, 9, 1L), (8001L, 9, 2L)).toDF("k", "grp", "m"))
    apply1(src, view) shouldBe Some((1, 2))              // group 9 born
    GraftTable.deleteWhere(spark, src, col("grp") === 9) // group 9 dies at v3
    apply1(src, view) shouldBe Some((2, 3))              // pure-death merge
    assertConverged(src, view)
    new java.io.File(view, "_ivm_applied").delete() shouldBe true  // crash window
    IncrementalView.appliedTo(spark, view) shouldBe 3    // intent holds the line
    // rebirth with the SAME row count but different measures — the
    // z-set over a regressed (1, 4] window would net cnt 0 and be
    // dropped; over the correct (3, 4] window it is a plain insert
    GraftTable.upsert(spark, src, Seq((8000L, 9, 5L), (8001L, 9, 7L)).toDF("k", "grp", "m"))
    apply1(src, view) shouldBe Some((3, 4))
    assertConverged(src, view)
    IncrementalView.read(spark, view).filter(col("grp") === 9).count() shouldBe 1L
    apply1(src, view) shouldBe None
  }

  test("NULL measures contribute zero and can never poison the accumulator") {
    val path = Files.createTempDirectory("ivm_null").toString + "/src"
    // group 5 starts with BOTH rows' measure NULL — the view must hold
    // 0 (SUM(COALESCE(m, 0)) semantics), not NULL
    val base = spark.range(0, 20).toDF("k")
      .withColumn("grp", (col("k") % 5).cast("int"))
      .withColumn("m", when(col("grp") === 0, lit(null).cast("long")).otherwise(col("k")))
      .withColumn("grp", when(col("grp") === 0, 5).otherwise(col("grp")))
    GraftTable.create(base, path, Seq("k"), nbuckets = 4)
    val view = viewFor("ivm_null_v")
    IncrementalView.bootstrap(spark, path, view, Seq("grp"), sums, nbuckets = 4)
    def g5() = IncrementalView.read(spark, view).filter(col("grp") === 5)
      .select("cnt", "m_sum").head()
    g5().getLong(1) shouldBe 0L
    // an all-NULL-measure delta batch: sum(m·w) alone would be NULL and
    // t.m_sum + NULL would null the group forever — it must add zero
    GraftTable.upsert(spark, path,
      Seq((100L, 5, Option.empty[Long]), (101L, 5, Option.empty[Long])).toDF("k", "grp", "m"))
    IncrementalView.applyOnce(spark, path, view, Seq("grp"), sums)
    g5() .getLong(0) shouldBe 6L
    g5().getLong(1) shouldBe 0L
    // and a later real measure lands on an intact accumulator
    GraftTable.upsert(spark, path, Seq((102L, 5, Option(40L))).toDF("k", "grp", "m"))
    IncrementalView.applyOnce(spark, path, view, Seq("grp"), sums)
    g5().getLong(1) shouldBe 40L
  }

  test("staticDims pin: applyOnce refuses loudly after the dimension table moved") {
    val src = freshSrc("ivm_pin")
    val view = viewFor("ivm_pin_v")
    val dimPath = Files.createTempDirectory("ivm_pin_d").toString + "/dim"
    GraftTable.create(
      Seq((0, "r0"), (1, "r0"), (2, "r1"), (3, "r1"), (4, "r2"), (5, "r2"), (6, "r2"))
        .toDF("d_key", "region"), dimPath, Seq("d_key"), nbuckets = 2)
    val enrich = (df: DataFrame) =>
      df.join(broadcast(GraftTable.read(spark, dimPath)), col("grp") === col("d_key"))
    IncrementalView.bootstrap(spark, src, view, Seq("region"), sums,
      nbuckets = 4, enrich = enrich, staticDims = Seq(dimPath))
    // while the dim is static, ticks work as usual
    GraftTable.upsert(spark, src, Seq((3L, 4, 30L)).toDF("k", "grp", "m"))
    IncrementalView.applyOnce(spark, src, view, Seq("region"), sums, enrich) shouldBe Some((0, 1))
    // the dim moves -> a silently wrong view is exactly what must NOT happen
    GraftTable.upsert(spark, dimPath, Seq((0, "r9")).toDF("d_key", "region"))
    GraftTable.upsert(spark, src, Seq((6L, 1, 60L)).toDF("k", "grp", "m"))
    val e = intercept[IllegalStateException] {
      IncrementalView.applyOnce(spark, src, view, Seq("region"), sums, enrich)
    }
    e.getMessage should include("pinned dimension")
  }

  test("joined view: maintained through fact churn, dim churn, and both at once") {
    val root = Files.createTempDirectory("ivm_jd").toString
    val src = s"$root/src"; val dimPath = s"$root/dim"; val view = s"$root/view"
    val base = spark.range(0, 400).toDF("k")
      .withColumn("fk", (col("k") % 7).cast("int"))
      .withColumn("m", col("k") * 3)
    GraftTable.create(base, src, Seq("k"), nbuckets = 8)
    GraftTable.create(
      Seq((0, "r0"), (1, "r0"), (2, "r1"), (3, "r1"), (4, "r2"), (5, "r2"), (6, "r2"))
        .toDF("d_key", "region"), dimPath, Seq("d_key"), nbuckets = 2)
    def recomputeJoin() = {
      val f = GraftTable.read(spark, src); val d = GraftTable.read(spark, dimPath)
      f.join(d, f("fk") === d("d_key")).groupBy("region")
        .agg(count(lit(1)).as("cnt"), sum(col("m")).as("m_sum"))
        .orderBy("region").collect().toSeq
    }
    def viewRows() = IncrementalView.read(spark, view)
      .select("region", "cnt", "m_sum").orderBy("region").collect().toSeq
    def tick() = IncrementalView.applyOnceJoined(
      spark, src, dimPath, "fk", "d_key", view, Seq("region"), sums)

    IncrementalView.bootstrapJoined(spark, src, dimPath, "fk", "d_key",
      view, Seq("region"), sums, nbuckets = 4) shouldBe ((0, 0))
    viewRows() shouldBe recomputeJoin()

    // fact-only churn (ΔA ⋈ D term)
    GraftTable.upsert(spark, src, Seq((1L, 6, 2000L), (9000L, 0, 70L)).toDF("k", "fk", "m"))
    tick() shouldBe Some(((0, 1), (0, 0)))
    viewRows() shouldBe recomputeJoin()

    // dim-only churn (A ⋈ ΔD term): d_key 6 moves r2 -> r9, every fact
    // row pointing at it migrates region in one tick
    GraftTable.upsert(spark, dimPath, Seq((6, "r9")).toDF("d_key", "region"))
    tick() shouldBe Some(((1, 1), (0, 1)))
    viewRows() shouldBe recomputeJoin()

    // both sides at once, including a dim DELETE that orphans fact rows
    // (inner join -> they leave the view) — the single tick must land
    GraftTable.upsert(spark, src, Seq((2L, 5, -100L), (9001L, 6, 5L)).toDF("k", "fk", "m"))
    GraftTable.deleteWhere(spark, src, col("fk") === 0)
    GraftTable.upsert(spark, dimPath, Seq((3, "r9")).toDF("d_key", "region"))
    GraftTable.delete(spark, dimPath, Seq(4).toDF("d_key"))
    tick() shouldBe Some(((1, 3), (1, 3)))
    viewRows() shouldBe recomputeJoin()

    // caught up
    tick() shouldBe None

    // the intent protocol holds for joined watermarks too
    new java.io.File(view, "_ivm_applied").delete() shouldBe true
    IncrementalView.appliedToJoined(spark, view) shouldBe ((3, 3))
    tick() shouldBe None
  }
}
