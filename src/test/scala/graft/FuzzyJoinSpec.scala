package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

/** FuzzyJoin vs an independent brute-force Levenshtein: the q-gram
  * pruning must be invisible on randomized corpora (the exactness
  * theorem exercised, not trusted), and short probes refuse loudly.
  */
class FuzzyJoinSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("matches exactly the brute-force distance join on a randomized corpus") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdef"
    def word(n: Int) = (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val corpus = (0 until 400).map(i => (i.toLong, word(8 + rnd.nextInt(8))))
    // probes: mutations of corpus strings (substitute, insert, delete)
    val probes = (0 until 20).map { i =>
      val s = corpus(rnd.nextInt(corpus.length))._2
      val p = rnd.nextInt(3) match {
        case 0 => s.updated(rnd.nextInt(s.length), alphabet(rnd.nextInt(6)))
        case 1 => s.patch(rnd.nextInt(s.length), Seq(alphabet(rnd.nextInt(6))), 0)
        case _ => s.patch(rnd.nextInt(s.length), Nil, 1)
      }
      (i.toLong, p)
    }
    val got = FuzzyJoin.join(
        corpus.toDF("id", "s"), "s", Seq("id"),
        probes.toDF("pid", "p"), "p", "pid", maxDist = 2, q = 2)
      .select("pid", "id", "dist").as[(Long, Long, Long)].collect().toSet
    val want = (for {
      (pid, p) <- probes
      (id, s) <- corpus
      d = lev(s, p) if d <= 2
    } yield (pid, id, d.toLong)).toSet
    got shouldBe want
    want should not be empty // the mutations guarantee matches
  }

  test("probes with too few distinct grams refuse loudly, never degrade") {
    val corpus = Seq((1L, "abcdefgh")).toDF("id", "s")
    val probes = Seq((1L, "abc")).toDF("pid", "p") // 2 bigrams < q*d+1
    val e = intercept[IllegalArgumentException] {
      FuzzyJoin.join(corpus, "s", Seq("id"), probes, "p", "pid",
        maxDist = 2, q = 2).collect()
    }
    e.getMessage should include("too few distinct")
  }

  test("maxDist = 0 is exact-match; empty result when nothing matches") {
    val corpus = Seq((1L, "hello world"), (2L, "hello there")).toDF("id", "s")
    val probes = Seq((7L, "hello world"), (8L, "goodbye all")).toDF("pid", "p")
    val got = FuzzyJoin.join(corpus, "s", Seq("id"), probes, "p", "pid",
        maxDist = 0, q = 3)
      .select("pid", "id", "dist").as[(Long, Long, Long)].collect().toSet
    got shouldBe Set((7L, 1L, 0L))
  }
}
