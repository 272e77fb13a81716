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

  test("topK plan is TakeOrderedAndProject (no full sort/shuffle)") {
    val plan = VectorSearch.topK(emb, "embedding", "vec_id", query, 10, "cosine")
      .queryExecution.executedPlan.toString
    plan should include("TakeOrderedAndProject")
  }
}
