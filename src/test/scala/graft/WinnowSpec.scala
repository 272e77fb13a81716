package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.TextAnalysis

/** Winnowing fingerprints: exactness vs a naive JVM reference, the
  * shared-run guarantee the scheme exists for, and the pair join's
  * df-cap behavior.
  */
class WinnowSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  private val K = 4
  private val W = 5

  private def fps(docs: Seq[(Long, String)]): Map[Long, Set[Long]] =
    TextAnalysis.winnowFingerprints(docs.toDF("doc_id", "text"), "doc_id", "text", K, W)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (id, v) => id -> v.map(_._2).toSet }

  /** Independent reference: plain Scala, JDK MessageDigest. */
  private def naive(docs: Seq[(Long, String)]): Map[Long, Set[Long]] = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Long = {
      val hex = md5.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    docs.flatMap { case (id, t) =>
      val toks = t.toLowerCase.split(" ", -1).toSeq
      if (toks.size < K + W - 1) None
      else {
        val hashes = toks.sliding(K).map(g => h(g.mkString(" "))).toVector
        Some(id -> hashes.sliding(W).filter(_.size == W).map(_.min).toSet)
      }
    }.toMap
  }

  test("matches the naive reference exactly on a pseudo-random corpus") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("data", "row", "scan", "join", "agg", "key", "hash", "sort")
    val docs = (1L to 30L).map { id =>
      id -> Seq.fill(4 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    fps(docs) shouldBe naive(docs)
  }

  test("any shared run of k+w-1 tokens guarantees a shared fingerprint") {
    val run = "one two three four five six seven eight" // exactly k+w-1 = 8 tokens
    val docs = Seq(
      (1L, s"aa bb cc dd $run ee ff gg hh"),
      (2L, s"zz yy xx $run ww vv uu tt ss rr"))
    val s = fps(docs)
    (s(1L) intersect s(2L)) should not be empty
  }

  test("a local edit far from a shared region keeps the shared fingerprints") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val edited = base.trim.split(" ").toSeq.updated(0, "EDIT").mkString(" ")
    val s = fps(Seq((1L, base.trim), (2L, edited)))
    (s(1L) intersect s(2L)) should not be empty
  }

  test("docs shorter than k+w-1 tokens have no full window and are absent") {
    val s = fps(Seq((1L, "only seven tokens here not quite enough"), // 7 tokens
      (2L, "this one has exactly eight tokens right here")))         // 8 tokens
    s.keySet shouldBe Set(2L)
  }

  test("winnowPairs: exact duplicates pair with full evidence; the df cap prunes boilerplate") {
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val boiler = "standard footer text appears on every single page of this corpus"
    // 2 exact dups + 10 docs sharing ONLY the boilerplate run
    val docs = Seq((1L, dup), (2L, dup)) ++
      (10L to 19L).map(i => i -> s"unique$i filler$i words$i $boiler")
    def pairs(maxDf: Int) =
      TextAnalysis.winnowPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
          K, W, maxDf = maxDf, minShared = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = pairs(maxDf = 5)
    capped should contain((1L, 2L))
    // uncapped, the shared boilerplate pairs ALL 10 carriers (45 pairs);
    // the cap drops every df=10 fingerprint, so only the few subset-df
    // fps (a mixed prefix window whose min fell on a boiler gram for
    // some docs) can still pair — strictly fewer, never the full clique
    val boilerPairs = (p: Set[(Long, Long)]) => p.count(_._1 >= 10L)
    boilerPairs(pairs(maxDf = 1000)) shouldBe 45
    boilerPairs(capped) should be < 45
  }
}
