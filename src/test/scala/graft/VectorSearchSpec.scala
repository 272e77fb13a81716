package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.operators.VectorSearch

/** Search operators vs brute force on the sf0.001 embeddings table. */
class VectorSearchSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}

  private lazy val emb = Tables.embeddings(spark, sf0001).cache()
  private lazy val query: Seq[Float] =
    emb.filter(col("vec_id") === 0L).select("embedding").head().getSeq[Float](0)

  /** driver-side brute force: (vec_id, score) best-first */
  private def brute(metric: String): Seq[(Long, Double)] = {
    val all = emb.select("vec_id", "embedding").collect().map { r =>
      val v = r.getSeq[Float](1)
      val dot = v.zip(query).map { case (a, b) => a.toDouble * b.toDouble }.sum
      val na = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      val nq = math.sqrt(query.map(x => x.toDouble * x.toDouble).sum)
      val s = metric match {
        case "cosine" => dot / (na * nq)
        case "dot"    => dot
        case "l2"     => math.sqrt(v.zip(query).map { case (a, b) =>
          val d = a.toDouble - b.toDouble; d * d }.sum)
      }
      (r.getLong(0), s)
    }
    val asc = metric == "l2"
    all.sortBy { case (id, s) => (if (asc) s else -s, id) }.toSeq
  }

  for (metric <- Seq("cosine", "dot", "l2")) {
    test(s"topK($metric) equals brute force") {
      val got = VectorSearch.topK(emb, "embedding", "vec_id", query, 10, metric)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      got shouldBe brute(metric).take(10).map(_._1)
    }
  }

  test("hybrid prefilter == postfilter with full-width k") {
    val pred = col("label") === 1
    val pre = VectorSearch.hybridPrefilter(emb, pred, "embedding", "vec_id", query, 5, "cosine")
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val post = VectorSearch.hybridPostfilter(emb, pred, "embedding", "vec_id", query, 5,
      wideK = 1000000, "cosine").select("vec_id").collect().map(_.getLong(0)).toSeq
    pre shouldBe post
  }

  test("rangeSearch returns exactly the rows above tau") {
    val tau = 0.2
    val got = VectorSearch.rangeSearch(emb, "embedding", query, tau, "cosine")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val want = brute("cosine").takeWhile(_._2 >= tau).map(_._1).toSet
    got shouldBe want
  }

  test("knnJoin per-query results equal single-query topK") {
    val qs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val joined = VectorSearch.knnJoin(emb, "embedding", "vec_id", qs, "qid", "qvec", 5, "cosine")
      .select("qid", "vec_id").collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    qs.collect().foreach { qr =>
      val qid = qr.getLong(0)
      val qv = qr.getSeq[Float](1)
      val single = VectorSearch.topK(emb, "embedding", "vec_id", qv, 5, "cosine")
        .select("vec_id").collect().map(_.getLong(0)).toSet
      joined(qid) shouldBe single
    }
  }

  test("knnJoin accepts non-bigint id columns (string ids match long-id results)") {
    val qs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val viaLong = VectorSearch.knnJoin(emb, "embedding", "vec_id", qs, "qid", "qvec", 5, "cosine")
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), "s" + r.getLong(1))).toSet
    val sEmb = emb.withColumn("sid", concat(lit("s"), col("vec_id"))).drop("vec_id")
    val viaString = VectorSearch.knnJoin(sEmb, "embedding", "sid", qs, "qid", "qvec", 5, "cosine")
      .select("qid", "sid").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    viaString shouldBe viaLong
  }

  test("mmrTopK with lambda=1 degenerates to plain relevance order") {
    val plain = VectorSearch.topK(emb, "embedding", "vec_id", query, 10, "cosine")
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val mmr = VectorSearch.mmrTopK(emb, "embedding", "vec_id", query,
        k = 10, lambda = 1.0, candidates = 50)
      .orderBy("rank").select("vec_id").collect().map(_.getLong(0)).toSeq
    mmr shouldBe plain
  }

  test("mmrTopK equals a naive reference greedy over the same candidates") {
    import spark.implicits._
    // hand-built: query along e0; a tight clone cluster near e0 and one
    // distinct direction — MMR must pick a clone first (most relevant),
    // then the DIFFERENT vector before the remaining clones
    val rows = Seq(
      (1L, Seq(0.99f, 0.10f, 0f)), (2L, Seq(0.98f, 0.11f, 0f)),
      (3L, Seq(0.97f, 0.12f, 0f)), (4L, Seq(0.60f, 0f, 0.80f)),
      (5L, Seq(0.95f, 0.13f, 0f)))
    val df = rows.toDF("vec_id", "embedding")
    val q = Seq(1.0f, 0f, 0f)
    val got = VectorSearch.mmrTopK(df, "embedding", "vec_id", q,
        k = 3, lambda = 0.5, candidates = 5)
      .orderBy("rank").select("vec_id").collect().map(_.getLong(0)).toSeq
    // naive reference greedy, recomputed independently
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    var pool = rows.map { case (id, v) => (id, v, cos(v, q)) }
      .sortBy { case (id, _, s) => (-s, id) }.take(5)
    var sel = Seq.empty[(Long, Seq[Float])]
    val expected = Seq.newBuilder[Long]
    while (sel.length < 3) {
      val scored = pool.map { case (id, v, rel) =>
        val div = if (sel.isEmpty) 0.0 else sel.map(s => cos(v, s._2)).max
        (id, v, if (sel.isEmpty) 0.5 * rel else 0.5 * rel - 0.5 * div)
      }
      val best = scored.minBy { case (id, _, m) => (-m, id) }
      expected += best._1
      sel :+= ((best._1, best._2))
      pool = pool.filterNot(_._1 == best._1)
    }
    got shouldBe expected.result()
    // the diversity property itself: the off-axis vector outranks the
    // remaining clones once one clone is selected
    got.take(2) shouldBe Seq(1L, 4L)
  }

  test("mmrTopK refuses l2 and bad parameters loudly") {
    intercept[IllegalArgumentException] {
      VectorSearch.mmrTopK(emb, "embedding", "vec_id", query, 10, 0.5, 50, "l2")
    }
    intercept[IllegalArgumentException] {
      VectorSearch.mmrTopK(emb, "embedding", "vec_id", query, 10, 1.5, 50)
    }
    intercept[IllegalArgumentException] {
      VectorSearch.mmrTopK(emb, "embedding", "vec_id", query, 10, 0.5, 5)
    }
  }

  test("topK plan is TakeOrderedAndProject (no full sort/shuffle)") {
    val plan = VectorSearch.topK(emb, "embedding", "vec_id", query, 10, "cosine")
      .queryExecution.executedPlan.toString
    plan should include("TakeOrderedAndProject")
  }

  test("hardNegatives == per-query brute force over the different-label corpus") {
    import org.apache.spark.sql.functions.col
    val qs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("label").as("qlabel"))
    val got = VectorSearch.hardNegatives(emb, "embedding", "vec_id", "label",
        qs, "qid", "qvec", "qlabel", 5, "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val queries3 = qs.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    val want = queries3.flatMap { case (qid, qv, ql) =>
      VectorSearch.topK(emb.filter(col("label") =!= ql),
          "embedding", "vec_id", qv, 5, "cosine")
        .select("vec_id").collect().map(r => (qid, r.getLong(0)))
    }.toSet
    got shouldBe want
    // the query's own class (and therefore itself) is never returned
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.foreach { case (qid, id) => labels(id) should not be labels(qid) }
  }
}
