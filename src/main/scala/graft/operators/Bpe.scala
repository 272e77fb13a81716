package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: TRAIN a merge table from the corpus,
  * ENCODE documents with it (Sennrich, Haddow & Birch 2016, "Neural
  * Machine Translation of Rare Words with Subword Units" — the scheme
  * behind the GPT-2/SentencePiece tokenizer family). Replaces the
  * regex "BPE-ish" token PROXY (TextAnalysis.withTokenStats) with the
  * real thing, so packing budgets and mixing weights can be computed
  * in actual model tokens.
  *
  * Scale design (the 100 TB lens):
  *  - Training never iterates the corpus. BPE merges are a function of
  *    the WORD-FREQUENCY DICT alone, so the only distributed pass is
  *    one `groupBy(word).count()` (uniform hash shuffle on the word,
  *    partial-agg collapses each task's Zipf head map-side). The dict
  *    is truncated to the `maxWords` most frequent words (Zipf: the
  *    tail it drops carries a vanishing share of pair mass) — DRIVER
  *    cost is bounded by `numMerges × maxWords × avg|word|`,
  *    independent of corpus size. This is exactly how the published
  *    trainers work: subword-nmt/SentencePiece fit on a word-count
  *    dict, not on running text.
  *  - Encoding is a pure per-row projection (scan-parallel, zero
  *    shuffle): the merge table broadcasts (numMerges entries), each
  *    word encodes greedily by merge rank, and a per-executor memo
  *    cache collapses repeated words (Zipf again: hit rate ≈ 1 −
  *    vocab/tokens, so the amortized cost per token is a map lookup).
  *    A Scala UDF is the honest level here — the inner loop is
  *    genuinely imperative — and it stays inside the scan stage; the
  *    plan around it (explode-free, no shuffle) is unchanged.
  *
  * Determinism (spec-pinned, BpeSpec): candidate pairs are ranked by
  * (count DESC, left ASC, right ASC) — bit-stable across runs and
  * partitionings because the counts are exact longs from an exact
  * aggregation; encoding is a deterministic function of (word, merges).
  */
object Bpe {

  /** End-of-word marker appended to each word's symbol sequence before
    * merging (Sennrich-style) — lets the model learn suffixes ("est</w>")
    * distinct from infixes, and makes decode unambiguous.
    */
  val EndOfWord = "</w>"

  /** A trained merge table. `merges(i)` is the pair merged at rank i;
    * lower rank = earlier/more frequent merge, applied first at encode
    * time. Serializable + broadcastable; the rank map and the word memo
    * cache are per-JVM transients.
    */
  case class BpeModel(merges: Seq[(String, String)]) {

    @transient private lazy val ranks: java.util.HashMap[(String, String), Integer] = {
      val m = new java.util.HashMap[(String, String), Integer](merges.size * 2)
      merges.zipWithIndex.foreach { case (p, i) => m.put(p, Integer.valueOf(i)) }
      m
    }

    /** Per-executor word→pieces memo. Bounded (1M entries ≈ the vocab of
      * a large web corpus; beyond that new words still encode, they just
      * skip the cache) so executor memory can't grow with the corpus.
      */
    @transient private lazy val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
    private val CacheCap = 1 << 20

    /** Greedy rank-order BPE encode of one word: repeatedly merge the
      * adjacent pair with the LOWEST learned rank until none applies —
      * the standard GPT-2/subword-nmt inference rule. O(|w|²) worst
      * case on cache miss, amortized O(1) per repeated word.
      */
    def encodeWord(word: String): Array[String] = {
      val hit = cache.get(word)
      if (hit != null) return hit
      var syms = new scala.collection.mutable.ArrayBuffer[String](word.length + 1)
      word.foreach(c => syms += c.toString)
      syms += EndOfWord
      var done = false
      while (!done && syms.length > 1) {
        var best = -1
        var bestRank = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val r = ranks.get((syms(i), syms(i + 1)))
          if (r != null && r.intValue < bestRank) { bestRank = r.intValue; best = i }
          i += 1
        }
        if (best < 0) done = true
        else {
          val (l, rr) = merges(bestRank)
          val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == rr) {
              out += (l + rr); j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out
        }
      }
      val arr = syms.toArray
      if (cache.size < CacheCap) cache.put(word, arr)
      arr
    }
  }

  /** The one distributed pass of training: exact word frequencies.
    * Words are the house whitespace tokens (TextAnalysis.tokens) so BPE
    * budgets line up with every other token-denominated operator.
    */
  def wordFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))

  /** Fit a merge table from the corpus. `maxWords`/`minCount` bound the
    * driver-side dict (the scale knobs — see object doc); `numMerges`
    * is the vocab-size budget.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 100000, minCount: Long = 1): BpeModel = {
    val dict = wordFrequencies(docs, textCol)
      .filter(col("freq") >= minCount)
      // deterministic truncation: freq desc, word asc — same dict every run
      .orderBy(col("freq").desc, col("word"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromWordFreqs(dict, numMerges)
  }

  /** The driver-side merge loop over a (word → freq) dict — corpus never
    * consulted. Each round recounts adjacent-pair mass exactly and
    * merges the (count DESC, pair ASC) argmax everywhere it occurs;
    * stops early when no pair occurs twice (further merges would be
    * word-private and carry no generalization). Cost: numMerges × total
    * symbols — bounded by the dict truncation, not the corpus.
    */
  def trainFromWordFreqs(wordFreqs: Seq[(String, Long)], numMerges: Int): BpeModel = {
    val words: Array[scala.collection.mutable.ArrayBuffer[String]] =
      wordFreqs.map { case (w, _) =>
        val b = new scala.collection.mutable.ArrayBuffer[String](w.length + 1)
        w.foreach(c => b += c.toString)
        b += EndOfWord
        b
      }.toArray
    val freqs: Array[Long] = wordFreqs.map(_._2).toArray
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()

    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val counts = new java.util.HashMap[(String, String), java.lang.Long]()
      var wi = 0
      while (wi < words.length) {
        val syms = words(wi); val f = freqs(wi)
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          val prev = counts.get(p)
          counts.put(p, java.lang.Long.valueOf(if (prev == null) f else prev.longValue + f))
          i += 1
        }
        wi += 1
      }
      // argmax by (count desc, left asc, right asc) — deterministic
      var best: (String, String) = null
      var bestC = 1L // require count ≥ 2: a singleton pair generalizes nothing
      val it = counts.entrySet.iterator
      while (it.hasNext) {
        val e = it.next()
        val c: Long = e.getValue.longValue
        if (c > bestC || (c == bestC && best != null && {
          val p = e.getKey
          p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)
        })) { best = e.getKey; bestC = c }
      }
      if (best == null) exhausted = true
      else {
        merges += best
        val (l, r) = best
        wi = 0
        while (wi < words.length) {
          val syms = words(wi)
          var i = 0
          while (i < syms.length - 1) {
            if (syms(i) == l && syms(i + 1) == r) {
              syms(i) = l + r
              syms.remove(i + 1)
              // do NOT back up: left-to-right single pass matches encode
            } else i += 1
          }
          wi += 1
        }
      }
      round += 1
    }
    BpeModel(merges.toSeq)
  }

  /** The merge table as a DataFrame — the trained artifact, inspectable
    * and joinable: (rank, left, right, piece).
    */
  def mergeTable(spark: SparkSession, model: BpeModel): DataFrame = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((l, r), i) => (i.toLong, l, r, l + r) }
      .toDF("rank", "left", "right", "piece")
  }

  /** Encode: adds `pieces` (the BPE token sequence) per row. Broadcast
    * model, scan-parallel, zero shuffle; repeated words hit the
    * per-executor memo (the collapse discipline applied at word grain).
    */
  def withPieces(docs: DataFrame, textCol: String, model: BpeModel): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    val enc = udf { (text: String) =>
      if (text == null) Array.empty[String]
      else text.toLowerCase(java.util.Locale.ROOT).split(" ")
        .filter(_.nonEmpty)
        .flatMap(w => bc.value.encodeWord(w))
    }
    docs.withColumn("pieces", enc(col(textCol)))
  }

  /** Per-doc BPE token accounting — the packing/mixing denominator:
    * (id, n_words, n_bpe_tokens, n_distinct_pieces). All integer-exact.
    */
  def withTokenStats(docs: DataFrame, idCol: String, textCol: String,
                     model: BpeModel): DataFrame =
    withPieces(docs, textCol, model)
      .select(col(idCol),
        size(filter(TextAnalysis.tokens(col(textCol)), w => length(w) > 0))
          .cast("long").as("n_words"),
        size(col("pieces")).cast("long").as("n_bpe_tokens"),
        size(array_distinct(col("pieces"))).cast("long").as("n_distinct_pieces"))
}
