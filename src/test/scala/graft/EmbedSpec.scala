package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.functions.vectors._
import graft.operators.Embed

class EmbedSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}

  private lazy val docs = Tables.documents(spark, sf0001).limit(50).cache()

  test("feature-hash encoder: unit norm, fixed dim, deterministic") {
    val a = Embed.encode(docs, "text", 64)
      .select(col("doc_id"), col("embedding"), vector_norm(col("embedding")).as("n"))
      .orderBy("doc_id").collect()
    a.foreach { r =>
      r.getSeq[Float](1).length shouldBe 64
      r.getDouble(2) shouldBe 1.0 +- 1e-6
    }
    val b = Embed.encode(docs, "text", 64).select("doc_id", "embedding")
      .orderBy("doc_id").collect()
    a.map(_.getSeq[Float](1)) shouldBe b.map(_.getSeq[Float](1))
  }

  test("MLlib pipeline encoder: unit norm, fixed dim, searchable output") {
    val emb = Embed.encodePipeline(docs, "text", 64).cache()
    emb.select(vector_norm(col("embedding")).as("n"))
      .collect().foreach(_.getDouble(0) shouldBe 1.0 +- 1e-6)
    // output plugs straight into the search operators
    val q = emb.orderBy("doc_id").select("embedding").head().getSeq[Float](0)
    val top = graft.operators.VectorSearch
      .topK(emb, "embedding", "doc_id", q, 3, "cosine").collect()
    top should have length 3
    top(0).getAs[Long]("doc_id") shouldBe 0L // self-match first
  }
}
