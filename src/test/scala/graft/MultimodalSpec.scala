package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}

  private lazy val bin =
    Multimodal.asBinaryTable(Tables.documents(spark, sf0001), "doc_id", "text").cache()

  test("binary table carries byte-exact payloads with typed metadata") {
    val r = bin.join(Tables.documents(spark, sf0001), "doc_id")
      .select(col("payload"), col("text"), col("n_bytes")).head()
    val payload = r.getAs[Array[Byte]](0)
    payload shouldBe r.getString(1).getBytes("UTF-8")
    r.getLong(2) shouldBe payload.length.toLong
  }

  test("decode stub is deterministic and batch-shaped") {
    val a = Multimodal.decodeMeta(bin).orderBy("doc_id").collect()
    val b = Multimodal.decodeMeta(bin).orderBy("doc_id").collect()
    a shouldBe b
    a.foreach { m =>
      m.getInt(2) should be >= 16 // width
      m.getInt(3) should be >= 16 // height
      m.getInt(4) shouldBe 3      // channels
    }
  }

  test("frame features: fixed dim, deterministic, uint32 range") {
    val frames = Multimodal.frameSample(bin, 32)
    val feats = Multimodal.frameFeatures(frames, dim = 4)
    feats.columns shouldBe Array("doc_id", "frame_idx", "f0", "f1", "f2", "f3")
    val rows = feats.orderBy("doc_id", "frame_idx").limit(50).collect()
    rows.foreach { r =>
      (2 to 5).foreach { i =>
        r.getLong(i) should be >= 0L
        r.getLong(i) should be <= 0xffffffffL
      }
    }
    // deterministic across runs
    val again = Multimodal.frameFeatures(Multimodal.frameSample(bin, 32), 4)
      .orderBy("doc_id", "frame_idx").limit(50).collect()
    rows.map(_.toSeq) shouldBe again.map(_.toSeq)
  }

  test("frame sampling covers every payload byte exactly once") {
    val stride = 32
    val frames = Multimodal.frameSample(bin, stride)
    val perDoc = frames.groupBy("doc_id")
      .agg(sum("frame_bytes").as("total"), count(lit(1)).as("n_frames"))
    val joined = perDoc.join(bin.select(col("doc_id"), col("n_bytes")), "doc_id")
    joined.filter(col("total") =!= col("n_bytes")).count() shouldBe 0L
    joined.filter(col("n_frames") =!=
      ceil(col("n_bytes").cast("double") / stride).cast("long")).count() shouldBe 0L
  }

  test("phash: byte-identical and past-frame-padded payloads hash identically") {
    val long = bin.filter(octet_length(col("payload")) >= 520)
      .select("doc_id", "payload").limit(5)
    val copies = long.select((col("doc_id") + 5000L).as("doc_id"), col("payload"))
    val padded = long.select((col("doc_id") + 9000L).as("doc_id"),
      concat(col("payload"), expr("to_binary(repeat('ff', 64), 'hex')")).as("payload"))
    val ph = Multimodal.phash(long.union(copies).union(padded))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    long.collect().map(_.getLong(0)).foreach { id =>
      ph(id + 5000L) shouldBe ph(id)
      ph(id + 9000L) shouldBe ph(id) // frames ≥ 16 never enter the hash
    }
  }

  test("banded near-dup join is EXACT vs brute force for tau <= 3 (pigeonhole)") {
    val corpus = bin.select("doc_id", "payload").limit(120)
      .union(bin.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 5000L).as("doc_id"), col("payload")).limit(12))
    val got = Multimodal.phashNearDups(corpus, tau = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sigs = Multimodal.phash(corpus)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).head))
    val brute = (for {
      (ida, pa) <- sigs; (idb, pb) <- sigs if ida < idb
      h = java.lang.Long.bitCount(pa ^ pb) if h <= 3
    } yield (ida, idb, h.toLong)).toSet
    got shouldBe brute
    brute.count(_._3 == 0L) should be >= 12 // the planted exact copies
  }

  test("maxSim: exact scores and ranking replay the brute-force MaxSim") {
    val frames = Multimodal.frameFeatures(Multimodal.frameSample(bin, stride = 32))
      .cache()
    val qDoc = 3L
    val qf = frames.filter(col("doc_id") === qDoc && col("frame_idx") < 6)
    val got = Multimodal.maxSim(frames, qf, k = 5).collect()
    // brute-force replay on the driver
    val all = frames.collect().map(r => (r.getLong(0),
      r.getAs[Number]("frame_idx").longValue,
      Array(r.getLong(2) % 10000, r.getLong(3) % 10000,
        r.getLong(4) % 10000, r.getLong(5) % 10000)))
    val qs = all.filter(t => t._1 == qDoc && t._2 < 6).map(_._3)
    val want = all.groupBy(_._1).map { case (d, fs) =>
      d -> qs.map(q => fs.map(f =>
        (0 until 4).map(i => f._3(i) * q(i)).sum).max).sum
    }
    got.foreach { r => r.getLong(1) shouldBe want(r.getLong(0)) }
    val top5 = want.toSeq.sortBy { case (d, s) => (-s, d) }.take(5).map(_._1)
    got.map(_.getLong(0)).toSeq shouldBe top5
  }

  test("audio landmark match: a clip locates its source at the exact offset") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def blob(n: Int) = Array.fill(n)(('a' + rnd.nextInt(26)).toByte)
    // two unrelated 1 KiB payloads; the clip is bytes of doc 1 from
    // frame 3 for 20 full frames (stride 32)
    val p1 = blob(1024); val p2 = blob(1024)
    val corpus = Seq((1L, p1), (2L, p2)).toDF("doc_id", "payload")
    val clip = Seq((100L, p1.slice(3 * 32, 23 * 32))).toDF("doc_id", "payload")
    val rows = Multimodal.audioMatch(clip, corpus, stride = 32, fanout = 3, minVotes = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // exactly one offset-consistent match: source doc 1 at offset 3,
    // with every within-clip landmark voting: (20-1)+(20-2)+(20-3) = 54
    rows.toSeq shouldBe Seq((100L, 1L, 3L, 54L))
  }

  test("audio match: identical corpus payloads both match a shared clip") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val p = Array.fill(2048)(('a' + rnd.nextInt(26)).toByte)
    val corpus = Seq((1L, p), (2L, p.clone())).toDF("doc_id", "payload")
    val clip = Seq((100L, p.slice(0, 640))).toDF("doc_id", "payload")
    val rows = Multimodal.audioMatch(clip, corpus, minVotes = 5)
      .orderBy("src_id").collect().map(r => (r.getLong(1), r.getLong(2)))
    rows.toSeq shouldBe Seq((1L, 0L), (2L, 0L))
  }

  test("audio fingerprint refuses a fanout past the packed width") {
    an[IllegalArgumentException] should be thrownBy
      Multimodal.audioFingerprint(bin, fanout = 16)
  }
}
