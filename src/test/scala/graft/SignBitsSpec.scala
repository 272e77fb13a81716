package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.functions.vectors.{hamming_distance, sign_pack}

/** 1-bit sign quantization kernels (functions/SignBits.scala): packing
  * layout, XOR/POPCNT distance vs a naive sign-mismatch count, codegen
  * vs interpreted parity, loud width guard, and the two-stage
  * Hamming→cosine rerank pipeline's exhaustive-degeneration property.
  */
class SignBitsSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}
  import spark.implicits._

  test("sign_pack layout: bit i of word i/64 set iff v(i) >= 0") {
    // dim 70 spans two words; element 0 positive, 1 negative, 64 zero
    // (zero counts as non-negative), 69 negative
    val v = (0 until 70).map { i =>
      if (i == 0) 1.0f else if (i == 64) 0.0f
      else if (i % 3 == 0) -1.0f else 0.5f
    }
    val got = Seq(Tuple1(v)).toDF("v")
      .select(sign_pack(col("v")).as("p")).head().getSeq[Long](0)
    got.length shouldBe 2
    val expected = Array(0L, 0L)
    v.zipWithIndex.foreach { case (x, i) =>
      if (x >= 0.0f) expected(i >>> 6) |= 1L << (i & 63)
    }
    got shouldBe expected.toSeq
  }

  test("hamming_distance equals the naive sign-mismatch count (float and double)") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(50) {
      (Seq.fill(96)(rnd.nextGaussian().toFloat), Seq.fill(96)(rnd.nextGaussian().toFloat))
    }
    val df = pairs.toDF("a", "b")
    val got = df.select(hamming_distance(sign_pack(col("a")), sign_pack(col("b"))))
      .collect().map(_.getInt(0)).toSeq
    val naive = pairs.map { case (a, b) =>
      a.zip(b).count { case (x, y) => (x >= 0) != (y >= 0) }
    }
    got shouldBe naive

    // double inputs take the other getter path in both expressions
    val dd = pairs.map { case (a, b) => (a.map(_.toDouble), b.map(_.toDouble)) }.toDF("a", "b")
    dd.select(hamming_distance(sign_pack(col("a")), sign_pack(col("b"))))
      .collect().map(_.getInt(0)).toSeq shouldBe naive
  }

  test("codegen and interpreted paths agree") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(30)(Seq.fill(80)(rnd.nextGaussian().toFloat)).toDF("v")
    val q = typedlit(Seq.fill(80)(rnd.nextGaussian().toFloat))
    val expr = hamming_distance(sign_pack(col("v")), sign_pack(q))
    val withCodegen = rows.select(expr).collect().map(_.getInt(0)).toSeq
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      rows.select(expr).collect().map(_.getInt(0)).toSeq shouldBe withCodegen
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("mismatched packed widths fail loudly, never a silent prefix score") {
    val df = Seq((Seq.fill(64)(1.0f), Seq.fill(128)(1.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(hamming_distance(sign_pack(col("a")), sign_pack(col("b")))).collect()
    }
    e.getMessage should include("mismatched packed widths")
  }

  test("exhaustive rerank degenerates to the exact cosine top-k") {
    // candidate stage keeping EVERY row ⇒ the two-stage pipeline must
    // equal the exact top-k — the property that makes the production
    // candidate-limited shape a pure recall knob
    val emb = Tables.embeddings(spark, sf0001)
    val n = emb.count().toInt
    val qv = typedlit(
      emb.filter(col("vec_id") === 0L).select("embedding").head().getSeq[Float](0))
    val cand = emb
      .withColumn("h", hamming_distance(sign_pack(col("embedding")), sign_pack(qv)))
      .orderBy(col("h"), col("vec_id")).limit(n)
    val reranked = cand
      .withColumn("score", graft.functions.vectors.cosine_similarity(col("embedding"), qv))
      .orderBy(col("score").desc, col("vec_id")).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val exact = emb
      .withColumn("score", graft.functions.vectors.cosine_similarity(col("embedding"), qv))
      .orderBy(col("score").desc, col("vec_id")).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    reranked shouldBe exact
  }

  test("adc_dot equals the naive asymmetric score (float and double)") {
    val rnd = new scala.util.Random(23)
    val pairs = Seq.fill(50) {
      (Seq.fill(96)(rnd.nextGaussian().toFloat), Seq.fill(96)(rnd.nextGaussian().toFloat))
    }
    // naive: sum left-to-right in double, query floats widened — the
    // expression's documented accumulation order
    val naive = pairs.map { case (q, v) =>
      q.zip(v).foldLeft(0.0) { case (s, (qi, vi)) =>
        if (vi >= 0.0f) s + qi.toDouble else s - qi.toDouble
      }
    }
    val df = pairs.toDF("q", "v")
    df.select(graft.functions.vectors.adc_dot(col("q"), sign_pack(col("v"))))
      .collect().map(_.getDouble(0)).toSeq shouldBe naive
    val dd = pairs.map { case (q, v) => (q.map(_.toDouble), v.map(_.toDouble)) }.toDF("q", "v")
    dd.select(graft.functions.vectors.adc_dot(col("q"), sign_pack(col("v"))))
      .collect().map(_.getDouble(0)).toSeq shouldBe naive
  }

  test("adc_dot codegen and interpreted paths agree; width mismatch fails loudly") {
    val rnd = new scala.util.Random(29)
    val rows = Seq.fill(30)(Seq.fill(80)(rnd.nextGaussian().toFloat)).toDF("v")
    val q = typedlit(Seq.fill(80)(rnd.nextGaussian().toFloat))
    val expr = graft.functions.vectors.adc_dot(q, sign_pack(col("v")))
    val withCodegen = rows.select(expr).collect().map(_.getDouble(0)).toSeq
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      rows.select(expr).collect().map(_.getDouble(0)).toSeq shouldBe withCodegen
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    // a 128-dim query scored against 64-dim packed bits must refuse —
    // a silent prefix score would be plausible-but-wrong
    val bad = Seq((Seq.fill(128)(1.0f), Seq.fill(64)(1.0f))).toDF("q", "v")
    val e = intercept[Exception] {
      bad.select(graft.functions.vectors.adc_dot(col("q"), sign_pack(col("v")))).collect()
    }
    e.getMessage should include("packed words")
  }

  test("adc ranking dominates symmetric hamming on recall@10 vs exact dot") {
    // the point of ADC: at identical scan bytes (1 bit/dim), keeping
    // the query float must rank closer to the exact dot ordering than
    // quantizing both sides. Checked as recall of the exact dot top-10
    // within each method's top-10 over the sf0.001 embeddings.
    val emb = Tables.embeddings(spark, sf0001).cache()
    val qv = typedlit(
      emb.filter(col("vec_id") === 0L).select("embedding").head().getSeq[Float](0))
    def top10(scored: org.apache.spark.sql.DataFrame, desc: Boolean) = {
      val ord = if (desc) col("s").desc else col("s").asc
      scored.orderBy(ord, col("vec_id")).limit(10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }
    val exact = top10(emb.withColumn("s",
      graft.functions.vectors.dot_product(col("embedding"), qv)), desc = true)
    val adc = top10(emb.withColumn("s",
      graft.functions.vectors.adc_dot(qv, sign_pack(col("embedding")))), desc = true)
    val ham = top10(emb.withColumn("s",
      hamming_distance(sign_pack(col("embedding")), sign_pack(qv))), desc = false)
    val adcRecall = (exact intersect adc).size
    val hamRecall = (exact intersect ham).size
    withClue(s"adc=$adcRecall ham=$hamRecall: ") { adcRecall should be >= hamRecall }
    emb.unpersist()
    ()
  }

  test("packed literal query folds at plan time and the plan is a top-k, not a sort") {
    val emb = Tables.embeddings(spark, sf0001)
    val qv = typedlit(Seq.fill(64)(0.5f))
    val plan = emb
      .withColumn("h", hamming_distance(sign_pack(col("embedding")), sign_pack(qv)))
      .orderBy(col("h"), col("vec_id")).limit(10)
      .queryExecution.executedPlan.toString
    plan should include("TakeOrderedAndProject")
    // ConstantFolding collapsed sign_pack(literal) — no sign_pack call
    // remains on the query side (exactly one, for the scanned column)
    plan.sliding("sign_pack".length).count(_ == "sign_pack") shouldBe 1
  }
}
