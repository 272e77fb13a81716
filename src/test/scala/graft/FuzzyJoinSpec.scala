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

  test("nearDupNames matches the brute-force distinct-name report with multiplicities") {
    val rnd = new scala.util.Random(7)
    val bases = (0 until 30).map(_ =>
      (0 until 10).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString)
    // rows repeat base names and inject distance-1 mutants
    val rows = (0 until 500).map { i =>
      val base = bases(rnd.nextInt(bases.length))
      val s = if (i % 7 == 0)
        base.updated(rnd.nextInt(base.length), ('a' + rnd.nextInt(5)).toChar)
      else base
      (i.toLong, s)
    }
    val got = FuzzyJoin.nearDupNames(rows.toDF("id", "s"), "s", maxDist = 1, q = 2)
      .select("name_a", "name_b", "dist", "n_pairs")
      .as[(String, String, Long, Long)].collect().toSet
    val counts = rows.groupBy(_._2).map { case (s, rs) => s -> rs.size.toLong }
    val want = (for {
      (a, ca) <- counts; (b, cb) <- counts
      if a < b
      d = lev(a, b) if d == 1
    } yield (a, b, d.toLong, ca * cb)).toSet
    got shouldBe want
    want should not be empty
  }

  test("prefix filter: join input tracks rarest-gram postings, not full Σf², as distinct names widen") {
    // names grow with rows (not copies): word pairs from a Zipf-ish vocab
    // plus a varying numeric tail — the realistic entity-name shape where
    // a few grams ("an", "er") are hot but every name has rarer ones
    val vocab = Seq("anderson", "anders", "anderton", "sanders", "anton",
      "banner", "manner", "tanner", "hander", "lander", "fernandez",
      "hernandez", "zander", "xavier", "quimby", "joplin", "wozniak")
    def corpus(n: Int) = (0 until n).map { i =>
      (i.toLong, vocab(i % vocab.length) + " " + vocab((i * 7 + 3) % vocab.length) + " " + (i / vocab.length))
    }
    val (p1, f1) = FuzzyJoin.nearDupJoinInputRows(corpus(500).toDF("id", "s"), "s", maxDist = 1, q = 2)
    val (p4, f4) = FuzzyJoin.nearDupJoinInputRows(corpus(2000).toDF("id", "s"), "s", maxDist = 1, q = 2)
    // the prefix index pushes far fewer pair rows through the gram join
    // than the full Σf² plan at both scales...
    assert(p1 * 5 < f1, s"prefix $p1 vs full $f1 at N=500")
    assert(p4 * 5 < f4, s"prefix $p4 vs full $f4 at N=2000")
    // ...and scales no worse than the full plan as names widen 4×
    assert(p4.toDouble / p1 <= f4.toDouble / f1 * 1.1,
      s"prefix growth ${p4.toDouble / p1} vs full growth ${f4.toDouble / f1}")
  }

  test("nearDupNames refuses loudly when a prefix posting exceeds dfCap") {
    // pathological corpus: every name shares its rarest grams — with
    // the shard disabled the tightened cap refuses outright
    val rows = (0 until 50).map(i => (i.toLong, s"aaaa${i}zzzz"))
    val e = intercept[IllegalArgumentException] {
      FuzzyJoin.nearDupNames(rows.toDF("id", "s"), "s",
        maxDist = 1, q = 2, dfCap = 10, bandShard = "never").collect()
    }
    e.getMessage should include("dfCap")
    // the sharded self-join returns EXACTLY the unsharded report
    val plain = FuzzyJoin.nearDupNames(rows.toDF("id", "s"), "s",
        maxDist = 1, q = 2, bandShard = "never")
      .select("name_a", "name_b", "dist", "n_pairs")
      .as[(String, String, Long, Long)].collect().toSet
    FuzzyJoin.nearDupNames(rows.toDF("id", "s"), "s",
        maxDist = 1, q = 2, bandShard = "always")
      .select("name_a", "name_b", "dist", "n_pairs")
      .as[(String, String, Long, Long)].collect().toSet shouldBe plain
  }

  test("sub-q corpus strings produce no grams and never pollute the join") {
    val corpus = Seq((1L, "hello world"), (2L, "x"), (3L, "ab")).toDF("id", "s")
    val probes = Seq((7L, "hello w0rld")).toDF("pid", "p")
    val got = FuzzyJoin.join(corpus, "s", Seq("id"), probes, "p", "pid",
        maxDist = 1, q = 3)
      .select("pid", "id", "dist").as[(Long, Long, Long)].collect().toSet
    got shouldBe Set((7L, 1L, 1L))
  }

  test("joinNames (big-big) matches brute force across two randomized corpora") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abcde"
    def word(n: Int) = (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val base = (0 until 60).map(_ => word(8 + rnd.nextInt(4)))
    // side A: base words with repeats; side B: mutants + verbatims
    val rowsA = (0 until 300).map(i => (i.toLong, base(rnd.nextInt(base.length))))
    val rowsB = (0 until 300).map { i =>
      val s = base(rnd.nextInt(base.length))
      val t = rnd.nextInt(4) match {
        case 0 => s
        case 1 => s.updated(rnd.nextInt(s.length), alphabet(rnd.nextInt(5)))
        case 2 => s.patch(rnd.nextInt(s.length), Seq(alphabet(rnd.nextInt(5))), 0)
        case _ => s.patch(rnd.nextInt(s.length), Nil, 1)
      }
      (i.toLong, t)
    }
    val got = FuzzyJoin.joinNames(rowsA.toDF("id", "s"), "s",
        rowsB.toDF("id", "t"), "t", maxDist = 1, q = 2)
      .select("name_a", "name_b", "dist", "n_pairs")
      .as[(String, String, Long, Long)].collect().toSet
    val ca = rowsA.groupBy(_._2).map { case (s, r) => s -> r.size.toLong }
    val cb = rowsB.groupBy(_._2).map { case (s, r) => s -> r.size.toLong }
    val want = (for {
      (sa, na) <- ca; (sb, nb) <- cb
      d = lev(sa, sb) if d <= 1
    } yield (sa, sb, d.toLong, na * nb)).toSet
    got shouldBe want
    want.exists(_._3 == 0L) shouldBe true // exact matches included
    want.exists(_._3 == 1L) shouldBe true
  }

  test("repeated fuzzy joins leave NO session-lifetime cache entries") {
    // r10 persisted the prefix postings without unpersist — every call
    // (and every graft_fuzzy_names TVF analysis) registered a session-
    // LIFETIME CacheManager entry. The localCheckpoint rewrite must keep
    // the CacheManager empty: its blocks are RDD-level and self-reclaim.
    val rows = (0 until 200).map(i => (i.toLong, s"name${i % 40} suffix${i % 9}"))
    val a = rows.toDF("id", "s"); val b = rows.toDF("id", "t")
    // the session is shared across suites and other specs legitimately
    // .cache() fixtures — start from a clean slate so the assertion
    // isolates THIS operator's behavior
    spark.catalog.clearCache()
    org.apache.spark.sql.graftshim.Bridge.sessionCacheEmpty(spark) shouldBe true
    (1 to 3).foreach { _ =>
      FuzzyJoin.nearDupNames(a, "s", maxDist = 1, q = 2).collect()
      FuzzyJoin.joinNames(a, "s", b, "t", maxDist = 1, q = 2).collect()
      org.apache.spark.sql.graftshim.Bridge.sessionCacheEmpty(spark) shouldBe true
    }
  }

  test("SQL TVF graft_fuzzy_names takes dfCap as its optional 7th argument") {
    GraftFunctions.register(spark)
    val rows = (0 until 50).map(i => (i.toLong, s"aaaa${i}zzzz"))
    rows.toDF("id", "s").createOrReplaceTempView("fuzzy_dfcap_t")
    // pathological shared-rare-grams corpus: with the shard disabled
    // (bandShard 8th arg = 'never') the tightened cap refuses outright
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_fuzzy_names('fuzzy_dfcap_t', 's', " +
        "'fuzzy_dfcap_t', 's', 1, 2, 10, 'never')").collect()
    }
    e.getMessage should include("dfCap")
    // an explicit wide cap runs the same corpus to completion
    spark.sql("SELECT * FROM graft_fuzzy_names('fuzzy_dfcap_t', 's', " +
      "'fuzzy_dfcap_t', 's', 1, 2, 100000)").count() should be > 0L
  }

  test("auto length-band shard: sharded == unsharded rows; same-length hot head still refuses") {
    // the joinNames brute-force corpus, forced down BOTH paths
    val rnd = new scala.util.Random(23)
    val alphabet = "abcde"
    def word(n: Int) = (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val base = (0 until 50).map(_ => word(7 + rnd.nextInt(5)))
    val rowsA = (0 until 250).map(i => (i.toLong, base(rnd.nextInt(base.length))))
    val rowsB = (0 until 250).map { i =>
      val s = base(rnd.nextInt(base.length))
      val t = if (rnd.nextBoolean()) s
        else s.updated(rnd.nextInt(s.length), alphabet(rnd.nextInt(5)))
      (i.toLong, t)
    }
    val a = rowsA.toDF("id", "s"); val b = rowsB.toDF("id", "t")
    def run(bandShard: String) =
      FuzzyJoin.joinNames(a, "s", b, "t", maxDist = 1, q = 2, bandShard = bandShard)
        .select("name_a", "name_b", "dist", "n_pairs")
        .as[(String, String, Long, Long)].collect().toSet
    run("always") shouldBe run("never") // EXACTLY the unsharded rows
    // a corpus whose hot prefix posting SPANS length bands degrades to
    // the shard under 'auto' (used to refuse) and completes exactly:
    // names share the rare gram 'qx' at lengths 6..16
    val spanRows = (0 until 60).map(i => (i.toLong, "qx" + ("ab" * (2 + i % 6)) + i % 3))
    val sp = spanRows.toDF("id", "s")
    val auto = FuzzyJoin.joinNames(sp, "s", sp, "s", maxDist = 1, q = 2,
        dfCap = 15, bandShard = "auto")
      .select("name_a", "name_b", "dist").as[(String, String, Long)].collect().toSet
    auto shouldBe FuzzyJoin.joinNames(sp, "s", sp, "s", maxDist = 1, q = 2,
        bandShard = "never")
      .select("name_a", "name_b", "dist").as[(String, String, Long)].collect().toSet
    // a head that stays hot WITHIN one band (same-length names sharing a
    // rare gram) is genuinely quadratic — the refusal survives the shard
    val sameLen = (0 until 40).map(i => (i.toLong, f"qz${i}%02dab"))
    val sl = sameLen.toDF("id", "s")
    intercept[Exception] {
      FuzzyJoin.joinNames(sl, "s", sl, "s", maxDist = 1, q = 2,
        dfCap = 5, bandShard = "auto").collect()
    }.getMessage should include("length band")
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
