package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.TextAnalysis

/** Corpus bigram-LM surprisal: exactness against an independent naive
  * computation, the quality-filter ordering it exists for, and the
  * short-doc edge cases.
  */
class LmScoreSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  private def score(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] =
    TextAnalysis.lmSurprisal(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  /** Naive reference: same model, plain Scala maps — an independent
    * code path (no Spark, no SQL) computing the identical integers.
    */
  private def naive(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    def toks(t: String) = t.toLowerCase.split(" ", -1).toSeq
    val bgs = docs.map { case (id, t) =>
      id -> toks(t).sliding(2).filter(_.size == 2).map(p => (p.head, s"${p.head} ${p(1)}")).toSeq
    }
    val all = bgs.flatMap(_._2)
    val bc = all.groupBy(_._2).map { case (k, v) => k -> v.size }
    val pc = all.groupBy(_._1).map { case (k, v) => k -> v.size }
    def q6(c: Int): Long = math.floor(math.log(c.toDouble) * 1e6).toLong
    bgs.filter(_._2.nonEmpty).map { case (id, b) =>
      id -> (b.size.toLong, b.map { case (w1, bg) => q6(pc(w1)) - q6(bc(bg)) }.sum)
    }.toMap
  }

  test("matches the naive reference exactly on a mixed corpus") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the hat"),
      (3L, "the dog sat on the mat"),
      (4L, "unique words appear here once only"),
      (5L, "the cat sat on the mat"))
    score(docs) shouldBe naive(docs)
  }

  test("matches the naive reference on a pseudo-random corpus") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g")
    val docs = (1L to 40L).map { id =>
      id -> Seq.fill(2 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    score(docs) shouldBe naive(docs)
  }

  test("a doc of corpus-common bigrams scores below rare continuations of a common prefix") {
    // conditional LM: surprisal is high when a COMMON prefix takes a
    // continuation it almost never takes (a unique bigram whose prefix
    // is also unique has p(w2|w1)=1 and carries no surprise)
    val common = (1L to 10L).map(i => i -> "alpha beta alpha beta alpha beta")
    val docs = common :+ (99L -> "alpha gamma alpha delta alpha epsilon")
    val s = score(docs)
    // same bigram count in both probes → totals compare directly
    s(1L)._1 shouldBe s(99L)._1
    s(1L)._2 should be < s(99L)._2
  }

  test("docs with fewer than two tokens carry no bigrams and are absent") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "two tokens"))
    val s = score(docs)
    s.keySet shouldBe Set(3L)
    s(3L)._1 shouldBe 1L
    s(3L)._2 shouldBe 0L // unique bigram, unique prefix: ln(1)-ln(1)
  }
}
