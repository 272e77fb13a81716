package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis, VectorSearch}

/** Degenerate-input behavior: empty frames, k larger than the table,
  * single-token documents — the operators must degrade, not throw.
  */
class EdgeCaseSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf0001)
  private lazy val query: Seq[Float] =
    emb.filter(col("vec_id") === 0L).select("embedding").head().getSeq[Float](0)

  test("topK with k larger than the table returns the whole table ranked") {
    val n = emb.count()
    VectorSearch.topK(emb, "embedding", "vec_id", query, (n + 100).toInt, "cosine")
      .count() shouldBe n
  }

  test("topK on an empty (filtered-out) table returns empty, not error") {
    VectorSearch.topK(emb.filter(col("vec_id") < 0), "embedding", "vec_id",
      query, 5, "cosine").count() shouldBe 0L
  }

  test("rangeSearch with an impossible threshold returns empty") {
    VectorSearch.rangeSearch(emb, "embedding", query, 1.5, "cosine").count() shouldBe 0L
  }

  test("dedup operators handle docs shorter than the shingle width") {
    val df = Seq((1L, "one"), (2L, "two words"), (3L, "three words here"),
      (4L, "")).toDF("id", "t")
    Dedup.ngramJaccard(df, "id", "t", 0.5).count() shouldBe 0L
    Dedup.minhashLsh(df, "id", "t", 0.5).count() shouldBe 0L
    noException should be thrownBy Dedup.simhashPairs(df, "id", "t", 3).count()
  }

  test("simhashPairs tolerates null text and non-long id columns") {
    val df = Seq(("a", Option("same words here")), ("b", Option("same words here")),
      ("c", Option.empty[String])).toDF("id", "t")
    val got = Dedup.simhashPairs(df, "id", "t", 3).collect()
      .map(r => (r.getString(0), r.getString(1)))
    got should contain(("a", "b"))
  }

  test("zorder on an empty frame is a no-op, not an NPE") {
    val df = Seq((1, 2)).toDF("a", "b").filter(col("a") < 0)
    graft.operators.Layout.zorder(df, "a", "b", 4).count() shouldBe 0L
  }

  test("chunking a doc shorter than one window yields exactly one chunk") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val got = TextAnalysis.chunk(df, "text", chunkSize = 64, stride = 48).collect()
    got should have length 1
    got(0).getAs[String]("chunk_text") shouldBe "a b c"
  }

  test("repetitionStats flags repeated-token docs and clears unique docs") {
    val df = Seq((1L, "a b a b a b a b"), (2L, "one two three four five"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc1: 7 bigrams ("a b"×4, "b a"×3); 6 trigrams, 2 distinct
    got(1L).getAs[Double]("top_bigram_frac") shouldBe (4.0 / 7) +- 1e-12
    got(1L).getAs[Double]("dup_trigram_frac") shouldBe (4.0 / 6) +- 1e-12
    got(2L).getAs[Double]("top_bigram_frac") shouldBe (1.0 / 4) +- 1e-12
    got(2L).getAs[Double]("dup_trigram_frac") shouldBe 0.0 +- 1e-12
  }

  test("duplicatedNgrams flags only windows shared by enough distinct docs") {
    // "x y z" appears in docs 1,2,3 (twice in doc 3); "p q r" in doc 4 only;
    // doc 5 is too short for any trigram
    val df = Seq(
      (1L, "x y z a"), (2L, "b x y z"), (3L, "x y z c x y z"),
      (4L, "p q r"), (5L, "u v")).toDF("doc_id", "text")
    val got = TextAnalysis.duplicatedNgrams(df, "doc_id", "text", n = 3, minDocs = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got.toSeq shouldBe Seq(("x y z", 3L, 4L))
  }

  test("dupCoverage: fully-boilerplate vs clean docs get frac 1 and 0") {
    val df = Seq(
      (1L, "x y z"), (2L, "x y z"), (3L, "x y z"),
      (4L, "a b c d")).toDF("doc_id", "text")
    val got = TextAnalysis.dupCoverage(df, "doc_id", "text", n = 3, minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("dup_frac")).toMap
    got(1L) shouldBe 1.0 +- 1e-15
    got(4L) shouldBe 0.0 +- 1e-15
  }

  test("rareTermKeywords ranks by df asc then tf desc then token") {
    // "rare" appears only in doc 1 (df 1) -> its top keyword despite tf 1;
    // "common" is in both docs (df 2); doc 1's remaining tokens tie on
    // df=1/tf=1 and break alphabetically
    val df = Seq(
      (1L, "common rare common alpha beta"),
      (2L, "common common gamma")).toDF("doc_id", "text")
    val got = TextAnalysis.rareTermKeywords(df, "doc_id", "text", k = 3)
      .filter(col("doc_id") === 1L).orderBy("rnk")
      .collect().map(_.getAs[String]("token"))
    got.toSeq shouldBe Seq("alpha", "beta", "rare")
  }

  test("withPiiScrub counts and masks emails") {
    val df = Seq((1L, "mail me at bob@example.com or alice@test.org ok"),
      (2L, "no pii here")).toDF("doc_id", "text")
    val got = TextAnalysis.withPiiScrub(df, "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    got(1L).getAs[Int]("n_emails") shouldBe 2
    got(1L).getAs[String]("text_scrubbed") shouldBe "mail me at <EMAIL> or <EMAIL> ok"
    got(2L).getAs[Int]("n_emails") shouldBe 0
    got(2L).getAs[String]("text_scrubbed") shouldBe "no pii here"
  }

  test("temperature sampling is deterministic and lands near the half-corpus budget") {
    val got1 = SparkEntry.queries("q_sample_temperature")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq)
    val got2 = SparkEntry.queries("q_sample_temperature")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq)
    got1 shouldBe got2 // md5-threshold acceptance: same sample every run
    val n = Tables.documents(spark, TestSpark.sf0001).count().toDouble
    // E[|sample|] = n/2; md5 uniformity puts the draw well inside ±20 %
    got1.length.toDouble shouldBe (n / 2) +- (n * 0.2)
  }

  test("text quality on empty-ish docs produces finite or null, never throws") {
    val df = Seq((1L, ""), (2L, "x")).toDF("doc_id", "text")
    noException should be thrownBy TextAnalysis.withQuality(df, "text").collect()
  }

  test("Quantize handles the zero vector (codes 0, no NaN)") {
    import graft.operators.Quantize
    val df = Seq((1L, Seq(0f, 0f, 0f)), (2L, Seq(1f, -2f, 0.5f))).toDF("id", "v")
    val scale = Quantize.scaleCol(col("v"))
    val dq = Quantize.decode(Quantize.encode(col("v"), scale), scale)
    val rows = df.select(col("id"), dq.as("d")).orderBy("id").collect()
    rows(0).getSeq[Double](1).foreach(_ shouldBe 0.0)
    rows(1).getSeq[Double](1).foreach(x => x.isNaN shouldBe false)
  }

  test("IntervalJoin with an empty side returns empty, not error") {
    import graft.operators.IntervalJoin
    val l = Seq((1L, 10L)).toDF("k", "sec")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"))
    val r = l.filter(col("k") < 0).select(col("k"), col("ts").as("rts"))
    IntervalJoin.join(l, r, Seq("k"), "ts", "rts", -1000000L, 0L).count() shouldBe 0L
  }

  test("embeddingCosine with one row yields no pairs") {
    Dedup.embeddingCosine(emb.limit(1), "vec_id", "embedding", 0.0)
      .count() shouldBe 0L
  }

  test("keepCanonical with no duplicate pairs keeps every row") {
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "t")
    val clusters = Dedup.connectedComponents(docs.select("doc_id"), "doc_id",
      Seq.empty[(Long, Long)].toDF("i", "j"), "i", "j")
    Dedup.keepCanonical(docs, "doc_id", clusters).count() shouldBe 2L
  }
}
