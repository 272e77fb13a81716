package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.functions.vectors._
import graft.operators.Quantize

class QuantizeSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}

  private lazy val emb = Tables.embeddings(spark, sf0001).cache()

  test("int8 round-trip error is bounded by scale/2 per element") {
    val scale = Quantize.scaleCol(col("embedding"))
    val dq = Quantize.decode(Quantize.encode(col("embedding"), scale), scale)
    val maxErr = emb.select(
        array_max(zip_with(col("embedding"), dq,
          (a, b) => abs(a.cast("double") - b))).as("err"),
        scale.as("s"))
      .select(max(col("err") / col("s"))).head().getDouble(0)
    maxErr should be <= 0.5 + 1e-12
  }

  test("codes stay in the int8 range") {
    val scale = Quantize.scaleCol(col("embedding"))
    val codes = Quantize.encode(col("embedding"), scale)
    val r = emb.select(
      array_max(codes).cast("int").as("mx"),
      array_min(codes).cast("int").as("mn")).agg(max("mx"), min("mn")).head()
    r.getInt(0) should be <= 127
    r.getInt(1) should be >= -127
  }

  test("quantized search keeps high top-10 recall vs exact") {
    val q = emb.filter(col("vec_id") === 0L).select("embedding").head().getSeq[Float](0)
    val exact = graft.operators.VectorSearch
      .topK(emb, "embedding", "vec_id", q, 10, "cosine")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val scale = Quantize.scaleCol(col("embedding"))
    val dq = Quantize.decode(Quantize.encode(col("embedding"), scale), scale)
    val got = emb.withColumn("score",
        cosine_similarity(dq, typedlit(q.map(_.toDouble))))
      .orderBy(col("score").desc, col("vec_id")).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    (got.intersect(exact).size.toDouble / 10) should be >= 0.8
  }
}
