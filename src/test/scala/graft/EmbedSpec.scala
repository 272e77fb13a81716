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

  test("encode batches per partition: ceil(rows/batchSize) model calls") {
    val acc = spark.sparkContext.longAccumulator("embed_batches")
    val one = docs.repartition(1) // 50 rows, one partition
    Embed.encode(one, "text", 64, batchSize = 16, batchCounter = Some(acc))
      .queryExecution.toRdd.count()
    acc.value shouldBe 4L // ceil(50/16): three full batches + one of 2
  }

  test("batched encode output equals row-at-a-time encoding") {
    val got = Embed.encode(docs, "text", 64, batchSize = 7)
      .select("doc_id", "embedding").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val want = docs.select("doc_id", "text").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), Embed.encodeOne(r.getString(1), 64).toSeq))
    got shouldBe want
  }

  test("a user-supplied encoder plugs into the batch seam (factory runs task-side)") {
    // constant-vector "model": proves the factory wire-through and that
    // an external encoder sees the same batching as the stub
    class ConstEncoder extends Embed.BatchEncoder {
      def encodeBatch(texts: Array[String]): Array[Array[Float]] =
        texts.map(_ => Array(1f, 0f, 0f))
    }
    val out = Embed.encode(docs, "text", dim = 3,
        encoderFactory = Some(() => new ConstEncoder))
      .select("embedding").collect()
    out should have length docs.count().toInt
    out.foreach(_.getSeq[Float](0) shouldBe Seq(1f, 0f, 0f))
  }

  test("ProcessEncoder: a real external worker process encodes a corpus through the seam") {
    // the production path, end-to-end: the "model" is an actual child
    // process per partition speaking the batch line protocol — the
    // same deployment shape as the reference's Python
    // SentenceTransformer, with a deterministic arithmetic stand-in
    // for the forward pass so the spec can recompute expectations
    val script = java.nio.file.Files.createTempFile("graft_encoder", ".py")
    java.nio.file.Files.writeString(script,
      """import sys, base64, math
        |while True:
        |    line = sys.stdin.readline()
        |    if not line:
        |        break
        |    n = int(line)
        |    for _ in range(n):
        |        t = base64.b64decode(sys.stdin.readline().strip()).decode('utf-8')
        |        v = [float(len(t)), float(len(t.split())), 1.0]
        |        norm = math.sqrt(sum(x * x for x in v))
        |        sys.stdout.write(' '.join(repr(x / norm) for x in v) + '\n')
        |    sys.stdout.flush()
        |""".stripMargin)
    val cmd = Seq("python3", script.toString)
    import spark.implicits._
    // includes an embedded newline (base64 framing) and a null text
    val corpus = Seq((0L, "alpha beta gamma"), (1L, "one\ntwo"),
      (2L, null.asInstanceOf[String]), (3L, "x")) ++
      (10L until 40L).map(k => (k, s"doc $k " + ("tok " * (k % 5).toInt).trim))
    val df = corpus.toDF("doc_id", "text").repartition(2)
    val got = Embed.encode(df, "text", batchSize = 8,
        encoderFactory = Some(() => new Embed.ProcessEncoder(cmd)))
      .select("doc_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    def expect(t: String): Seq[Float] = {
      val s = if (t == null) "" else t
      val v = Seq(s.length.toDouble, s.split("\\s+").count(_.nonEmpty).toDouble, 1.0)
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    got.size shouldBe corpus.size
    corpus.foreach { case (id, t) =>
      assert(got(id) == expect(t), s"doc $id")
    }
  }

  test("bundled reference worker: the headline semantic-search demo end-to-end") {
    // the worked example shipped in resources/graft/encoder_worker.py:
    // extract-from-jar → one worker process per partition → unit-norm
    // embeddings → exact top-k cosine, query encoded through the SAME
    // worker. (Here the worker runs its deterministic fallback — with
    // sentence-transformers installed the identical wiring serves the
    // real model.)
    val enc = Embed.encode(docs, "text", batchSize = 16,
        encoderFactory = Some(() => new Embed.ProcessEncoder(Embed.bundledWorkerCommand())))
      .cache()
    enc.select(vector_norm(col("embedding")).as("n")).collect()
      .foreach(_.getDouble(0) shouldBe 1.0 +- 1e-5)
    val qText = docs.filter(col("doc_id") === 0L).select("text").head().getString(0)
    val w = new Embed.ProcessEncoder(Embed.bundledWorkerCommand())
    val qVec = try w.encodeBatch(Array(qText))(0).toSeq finally w.close()
    val top = graft.operators.VectorSearch
      .topK(enc, "embedding", "doc_id", qVec, 5, "cosine").collect()
    top should have length 5
    // the query IS doc 0's text encoded by the same model → self-match first
    top(0).getAs[Long]("doc_id") shouldBe 0L
    enc.unpersist()
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
