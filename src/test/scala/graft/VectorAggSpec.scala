package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.functions.vectoragg._

class VectorAggSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}
  import spark.implicits._

  test("vector_avg equals the naive per-dimension mean (per label group)") {
    val emb = Tables.embeddings(spark, sf0001)
    val got = emb.groupBy("label").agg(vector_avg(col("embedding")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val naive = emb.select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
      .groupBy(_._1).map { case (label, rows) =>
        val vecs = rows.map(_._2)
        val dim = vecs.head.length
        label -> (0 until dim).map(i => vecs.map(_(i).toDouble).sum / vecs.length)
      }
    got.keySet shouldBe naive.keySet
    got.foreach { case (label, c) =>
      c.zip(naive(label)).foreach { case (a, b) => a shouldBe b +- 1e-9 }
    }
  }

  test("vector_avg survives partial aggregation across partitions and nulls") {
    val df = Seq(
      (1, Some(Seq(1f, 3f))), (1, Some(Seq(3f, 5f))), (1, None),
      (2, Some(Seq(10f, 20f)))
    ).toDF("g", "v").repartition(4)
    val got = df.groupBy("g").agg(vector_avg(col("v")).as("c"))
      .collect().map(r => r.getInt(0) -> Option(r.getSeq[Double](1))).toMap
    got(1).get shouldBe Seq(2.0, 4.0)
    got(2).get shouldBe Seq(10.0, 20.0)
    // all-null group → null
    val allNull = Seq((3, Option.empty[Seq[Float]])).toDF("g", "v")
      .groupBy("g").agg(vector_avg(col("v")).as("c")).collect()
    allNull(0).isNullAt(1) shouldBe true
  }

  test("vector_avg fails loudly on ragged dimensions instead of truncating the mean") {
    val df = Seq((1, Seq(1f, 2f)), (1, Seq(1f, 2f, 3f))).toDF("g", "v").repartition(1)
    val ex = intercept[Throwable] {
      df.groupBy("g").agg(vector_avg(col("v")).as("c")).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    causes(ex).exists(c =>
      c.getMessage != null && c.getMessage.contains("dimension mismatch")) shouldBe true
  }

  test("centroid output feeds straight back into similarity search") {
    import graft.functions.vectors._
    val emb = Tables.embeddings(spark, sf0001)
    val cents = emb.groupBy("label").agg(vector_avg(col("embedding")).as("centroid"))
    // cosine between a label's centroid and its members should be positive on average
    val joined = emb.join(cents, "label")
      .select(col("label"),
        cosine_similarity(
          transform(col("embedding"), x => x.cast("double")), col("centroid")).as("cos"))
      .groupBy("label").agg(avg("cos").as("mean_cos"))
    joined.collect().foreach(r => r.getDouble(1) should be > 0.0)
  }
}
