package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

/** BPE tokenizer spec. The load-bearing test is the cross-check against
  * an INDEPENDENT naive reference implementation (quadratic, string
  * -list based, written directly from the Sennrich 2016 procedure) over
  * randomized word-frequency dicts: merges AND encodings must agree
  * exactly. The rest pins determinism, the encode/train consistency
  * invariant (training's merge application == encode's greedy-by-rank
  * replay on every dict word), and the DataFrame plumbing.
  */
class BpeSpec extends AnyFunSuite {

  // ---- naive reference: the textbook algorithm, no shared code ----------

  private def naivePairs(word: List[String]): List[(String, String)] =
    word.zip(word.drop(1))

  private def naiveTrain(dict: Seq[(String, Long)], numMerges: Int)
      : List[(String, String)] = {
    var words: Seq[(List[String], Long)] =
      dict.map { case (w, f) => (w.map(_.toString).toList :+ Bpe.EndOfWord, f) }
    var merges = List.empty[(String, String)]
    var n = 0
    var stop = false
    while (n < numMerges && !stop) {
      val counts = words
        .flatMap { case (syms, f) => naivePairs(syms).map(p => (p, f)) }
        .groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
      val viable = counts.filter(_._2 >= 2)
      if (viable.isEmpty) stop = true
      else {
        val best = viable.toList
          .sortBy { case ((l, r), c) => (-c, l, r) }.head._1
        merges = merges :+ best
        words = words.map { case (syms, f) => (naiveMerge(syms, best), f) }
        n += 1
      }
    }
    merges
  }

  private def naiveMerge(syms: List[String], p: (String, String)): List[String] =
    syms match {
      case a :: b :: rest if a == p._1 && b == p._2 =>
        (a + b) :: naiveMerge(rest, p)
      case a :: rest => a :: naiveMerge(rest, p)
      case Nil => Nil
    }

  private def naiveEncode(word: String, merges: List[(String, String)])
      : List[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.map(_.toString).toList :+ Bpe.EndOfWord
    var done = false
    while (!done) {
      val ranked = naivePairs(syms).flatMap(p => rank.get(p).map(r => (r, p)))
      if (ranked.isEmpty) done = true
      else {
        val (_, best) = ranked.minBy(_._1)
        syms = naiveMerge(syms, best)
      }
    }
    syms
  }

  // ---- merge learning ----------------------------------------------------

  test("classic Sennrich dict learns 'est</w>' family merges") {
    val dict = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val model = Bpe.trainFromWordFreqs(dict, numMerges = 10)
    // first merge must be the most frequent pair: (e,s) count 9 from
    // newest(6)+widest(3); then (es,t) 9; then (est,</w>) 9
    assert(model.merges.take(3) ===
      Seq(("e", "s"), ("es", "t"), ("est", Bpe.EndOfWord)))
    // "lowest" (unseen word) reuses the learned suffix
    val pieces = model.encodeWord("lowest").toSeq
    assert(pieces.last === "est" + Bpe.EndOfWord)
  }

  test("merges agree with the naive reference on randomized dicts") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val vocabChars = "abcde"
      val dict = (1 to 30).map { i =>
        val len = 1 + rnd.nextInt(7)
        val w = (1 to len).map(_ => vocabChars(rnd.nextInt(vocabChars.length))).mkString
        (w, (1 + rnd.nextInt(9)).toLong)
      }.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }.toSeq
        .sortBy(_._1)
      val numMerges = 1 + rnd.nextInt(25)
      val got = Bpe.trainFromWordFreqs(dict, numMerges).merges
      val want = naiveTrain(dict, numMerges)
      assert(got === want, s"trial $trial dict=$dict numMerges=$numMerges")
      // and every dict word encodes identically under both implementations
      val model = Bpe.BpeModel(got)
      dict.foreach { case (w, _) =>
        assert(model.encodeWord(w).toList === naiveEncode(w, want),
          s"trial $trial word=$w")
      }
    }
  }

  test("training is deterministic: same dict, same merges, any order") {
    val dict = Seq("spark" -> 4L, "shark" -> 4L, "spar" -> 2L, "park" -> 3L)
    val a = Bpe.trainFromWordFreqs(dict, 8).merges
    val b = Bpe.trainFromWordFreqs(dict.reverse, 8).merges
    assert(a === b)
  }

  test("training stops when no pair repeats (no word-private merges)") {
    val dict = Seq("ab" -> 1L, "cd" -> 1L)
    val model = Bpe.trainFromWordFreqs(dict, numMerges = 50)
    assert(model.merges.isEmpty)
  }

  // ---- encoding ----------------------------------------------------------

  test("encodeWord round-trips: concatenated pieces reproduce the word") {
    val dict = Seq("window" -> 9L, "windows" -> 4L, "widow" -> 3L, "won" -> 7L)
    val model = Bpe.trainFromWordFreqs(dict, 12)
    for (w <- Seq("window", "widow", "wind", "own", "w", "zzz")) {
      val pieces = model.encodeWord(w)
      assert(pieces.mkString.stripSuffix(Bpe.EndOfWord) === w)
      assert(pieces.mkString.endsWith(Bpe.EndOfWord))
    }
  }

  test("empty merge table encodes to characters + end marker") {
    val model = Bpe.BpeModel(Nil)
    assert(model.encodeWord("abc").toSeq ===
      Seq("a", "b", "c", Bpe.EndOfWord))
  }

  // ---- DataFrame plumbing ------------------------------------------------

  test("train + withTokenStats over a DataFrame matches driver-side encode") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq(
      (1L, "the window stream joins the window"),
      (2L, "window stream window stream window"),
      (3L, "")).toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", numMerges = 20)
    val got = Bpe.withTokenStats(docs, "doc_id", "text", model)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = Seq(
      (1L, "the window stream joins the window"),
      (2L, "window stream window stream window"),
      (3L, "")).map { case (id, text) =>
      val words = text.toLowerCase.split(" ").filter(_.nonEmpty)
      (id, words.length.toLong,
        words.flatMap(w => model.encodeWord(w)).length.toLong)
    }
    assert(got.toSeq === expect)
  }

  test("word-frequency dict truncation is deterministic (freq desc, word asc)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq((1L, "bb aa bb cc aa bb")).toDF("doc_id", "text")
    val wf = Bpe.wordFrequencies(docs, "text")
      .orderBy(org.apache.spark.sql.functions.col("freq").desc,
        org.apache.spark.sql.functions.col("word"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(wf === Seq(("bb", 3L), ("aa", 2L), ("cc", 1L)))
  }

  test("corpus-scale sanity on sf0.001 documents: real tokens, compression ≥ 1") {
    val spark = TestSpark.spark
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val model = Bpe.train(docs, "text", numMerges = 100, maxWords = 20000)
    assert(model.merges.nonEmpty)
    val stats = Bpe.withTokenStats(docs, "doc_id", "text", model)
    val row = stats.agg(
      org.apache.spark.sql.functions.sum("n_words"),
      org.apache.spark.sql.functions.sum("n_bpe_tokens")).head()
    val (words, bpe) = (row.getLong(0), row.getLong(1))
    assert(words > 0 && bpe >= words) // every word is ≥ 1 piece
    // merges actually fire: strictly fewer pieces than characters
    val chars = docs.agg(org.apache.spark.sql.functions.sum(
      org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))).head().getLong(0)
    assert(bpe < chars)
  }
}
