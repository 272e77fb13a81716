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
}
