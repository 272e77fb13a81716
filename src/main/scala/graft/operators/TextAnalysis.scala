package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-level text analysis for training-data curation: token
  * counting, quality scoring, language ID, fingerprinting. Everything is
  * a per-row projection (codegen'd built-ins, zero shuffle) — at 100 TB
  * these run at scan speed and the only cost is the parquet read.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(lower(text), " ")

  /** Whitespace token count + a BPE-ish subword proxy (letter runs and
    * single non-letter marks counted separately) + distinct count.
    */
  def withTokenStats(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("n_tokens", size(tokens(col(textCol))))
      .withColumn("n_distinct_tokens", size(array_distinct(tokens(col(textCol)))))
      .withColumn("n_subword_tokens",
        // lowercase first — the [^a-z0-9 ] arm would otherwise count
        // every uppercase letter as a mark
        regexp_count(lower(col(textCol)), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")))

  /** Stopword list shared with the language profiles and the quality
    * score — tiny, broadcast as a literal array.
    */
  val stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is")

  /** Quality heuristics: doc length, mean word length, stopword ratio,
    * punctuation ratio. Ratios are double divisions of exact integer
    * counts — deterministic for the oracle.
    */
  def withQuality(docs: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    val nStop = size(filter(toks, t => t.isin(stopwords.map(_.asInstanceOf[Any]): _*)))
    // lowercase first: "The Cat" has no punctuation — without lower() every
    // capital letter matched the class and clean prose scored punct-heavy
    val nPunct = regexp_count(lower(col(textCol)), lit("[^a-z0-9 ]"))
    val nChars = length(col(textCol))
    // try_divide: ANSI mode (Spark 4 default) throws DIVIDE_BY_ZERO even
    // for doubles; empty docs get null ratios instead of killing the job.
    // On nonzero divisors the result is bit-identical to plain division.
    docs
      .withColumn("n_chars_m", nChars)
      .withColumn("n_tokens", nTok)
      .withColumn("mean_word_len",
        try_divide((nChars - (nTok - lit(1))).cast("double"), nTok.cast("double")))
      .withColumn("stopword_ratio", try_divide(nStop.cast("double"), nTok.cast("double")))
      .withColumn("punct_ratio", try_divide(nPunct.cast("double"), nChars.cast("double")))
  }

  /** Language profiles: distinct-token overlap with per-language marker
    * lists (n-gram-profile heuristic in its simplest SQL-expressible
    * form). Deterministic argmax with lexicographic tie-break.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("window", "stream", "merge"),
    "en" -> Seq("the", "a", "fast"),
    "es" -> Seq("data", "row", "table"),
    "fr" -> Seq("query", "join", "group"),
    "zh" -> Seq("spark", "key", "value"))

  def withLangId(docs: DataFrame, textCol: String): DataFrame = {
    val dToks = array_distinct(tokens(col(textCol)))
    val scored = langProfiles.foldLeft(docs) { case (df, (lang, words)) =>
      df.withColumn(s"score_$lang",
        size(array_intersect(dToks, typedlit(words))))
    }
    // argmax by score; greatest() compares structs field-by-field, and the
    // reversed-alphabet tie index makes the lexicographically-SMALLEST
    // language win score ties
    val bestExpr = greatest(langProfiles.map { case (lang, _) =>
      struct(col(s"score_$lang").as("s"),
        lit(langProfiles.map(_._1).sorted.reverse.indexOf(lang)).as("tie"),
        lit(lang).as("l"))
    }: _*)
    scored.withColumn("lang_guess", bestExpr.getField("l"))
  }

  /** Token-window chunking for training-sequence prep: overlapping
    * `size`-token windows every `stride` tokens (stride < size ⇒
    * overlap = size - stride). One output row per chunk via posexplode;
    * pure expressions, parallel per doc, no shuffle.
    */
  def chunk(docs: DataFrame, textCol: String, chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize, "need 0 < stride <= chunkSize")
    docs
      .withColumn("__toks", split(col(textCol), " "))
      .select(col("*"),
        posexplode(expr(
          s"transform(sequence(0, cast(floor((size(__toks) - 1) / $stride) as int)), " +
          s"c -> array_join(slice(__toks, c * $stride + 1, $chunkSize), ' '))"))
          .as(Seq("chunk_idx", "chunk_text")))
      .withColumn("chunk_tokens", size(split(col("chunk_text"), " ")))
      .drop("__toks")
  }

  /** Repetition-based quality stats (the Gopher-rules family): fraction
    * of duplicated trigrams and the share of the most frequent bigram.
    * High values flag boilerplate/spam docs that length or stopword
    * ratios miss. All counts are PER-DOC, so this is one local pass per
    * row (hashmap over the doc's n-grams) — zero shuffle, scan speed,
    * per-task memory bounded by tokens per doc. A UDF by the repo's
    * documented policy: no builtin computes an array mode, and the
    * explode + per-(doc, bigram) groupBy alternative shuffles
    * corpus×tokens rows twice (measured 9× slower at 10× scale).
    * Fractions are double divisions of exact ints — engine-neutral, so
    * the DuckDB oracle (which DOES count via unnest + GROUP BY) matches
    * bit-for-bit. Docs with < 3 tokens have no trigram and are
    * excluded, mirroring the oracle's WHERE.
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val statsUdf = udf { (tk: Seq[String]) =>
      val counts = new java.util.HashMap[String, Integer]()
      var i = 0; var nBi = 0; var top = 0
      while (i < tk.length - 1) {
        val c = counts.merge(tk(i) + " " + tk(i + 1), 1, (a, b) => a + b)
        if (c > top) top = c
        nBi += 1; i += 1
      }
      val distinctTri = new java.util.HashSet[String]()
      var j = 0; var nTri = 0
      while (j < tk.length - 2) {
        distinctTri.add(tk(j) + " " + tk(j + 1) + " " + tk(j + 2))
        nTri += 1; j += 1
      }
      (nBi.toLong, top.toLong, nTri, distinctTri.size)
    }
    docs
      .withColumn("__tk", tokens(col(textCol)))
      .filter(size(col("__tk")) >= 3)
      .withColumn("__st", statsUdf(col("__tk")))
      .select(col(idCol),
        col("__st._1").as("n_bigrams"),
        col("__st._2").as("top_bigram_n"),
        try_divide(col("__st._2").cast("double"), col("__st._1").cast("double"))
          .as("top_bigram_frac"),
        try_divide((col("__st._3") - col("__st._4")).cast("double"),
          col("__st._3").cast("double")).as("dup_trigram_frac"))
  }

  /** Email pattern shared by detector and scrubber — plain character
    * classes only, so the Java (Spark) and RE2 (DuckDB oracle) regex
    * dialects agree byte-for-byte.
    */
  val emailPattern: String = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** PII pass for corpus release: count emails and emit the scrubbed
    * text (matches replaced with a placeholder). Pure per-row codegen'd
    * projection — scan speed, zero shuffle.
    */
  def withPiiScrub(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("n_emails", regexp_count(col(textCol), lit(emailPattern)))
      .withColumn("text_scrubbed", regexp_replace(col(textCol), emailPattern, "<EMAIL>"))

  /** Per-(doc, ngram) window counts under the exact-duplicate
    * collapse — the shared first-level aggregate both passage-dedup
    * reports reduce from: counts per (representative, ngram) with the
    * clique size `m` carried, plus the (doc → gid) membership for
    * expanding per-doc results. Weighted sums (Σ m, Σ cnt·m) reproduce
    * the doc-level stats exactly while exploding each distinct text
    * once — duplicate-heavy corpora pay for content, not copies. Docs
    * shorter than n tokens have no window and drop out (the oracle's
    * WHERE); keyed on (gid, ngram) so the map-side partial collapses a
    * doc's repeated windows BEFORE the shuffle.
    */
  private def perDocNgramCollapsed(docs: DataFrame, idCol: String, textCol: String,
                                   n: Int): (DataFrame, DataFrame) = {
    val grpW = org.apache.spark.sql.expressions.Window.partitionBy(col(textCol))
    val memb = docs.select(col(idCol), col(textCol))
      .withColumn("gid", min(col(idCol)).over(grpW))
      .withColumn("m", count(lit(1)).over(grpW))
    val pdn = memb.filter(col(idCol) === col("gid"))
      .withColumn("__tk", tokens(col(textCol)))
      .filter(size(col("__tk")) >= n)
      .select(col("gid"), col("m"), explode(expr(
        s"transform(sequence(1, size(__tk) - ${n - 1}), " +
        s"i -> array_join(slice(__tk, i, $n), ' '))")).as("ngram"))
      .groupBy(col("gid"), col("m"), col("ngram")).agg(count(lit(1)).as("cnt"))
    (pdn, memb.select(col(idCol), col("gid")))
  }

  /** Corpus-duplicated passage report (the detection stage of
    * passage-level dedup à la "Deduplicating Training Data Makes
    * Language Models Better"): every n-token window that appears in at
    * least `minDocs` DISTINCT documents, with its document and
    * occurrence counts. Two-level keyed aggregation — (doc, ngram)
    * counts, then plain count/sum per ngram — NOT `count(distinct)`,
    * which Catalyst plans through an Expand that doubles the exploded
    * row stream. Same shuffle family as the shingle pipelines,
    * partial-aggregated map-side, no all-pairs anywhere. At 100 TB the
    * ngram key space is huge and uniform, so the aggregate
    * parallelizes cleanly; skew concentrates only on truly viral
    * passages, which is exactly the output.
    */
  def duplicatedNgrams(docs: DataFrame, idCol: String, textCol: String,
                       n: Int, minDocs: Int): DataFrame =
    // weighted collapse: n_docs = Σ clique sizes, occurrences = Σ cnt·m
    // — doc-exact corpus stats from one explode per distinct text
    perDocNgramCollapsed(docs, idCol, textCol, n)._1
      .groupBy("ngram")
      .agg(sum(col("m")).as("n_docs"), sum(col("cnt") * col("m")).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)

  /** Per-document duplicated-passage coverage: what fraction of a doc's
    * n-token windows are corpus-duplicated ([[duplicatedNgrams]] hits).
    * The curation signal that separates "contains one quoted paragraph"
    * from "is 90 % boilerplate" — docs above a coverage cut get dropped
    * or trimmed. Both the flagged set and the per-doc totals reduce
    * from ONE persisted (doc, ngram) aggregate — the corpus is scanned
    * once, and the flag join carries pre-collapsed counts, not raw
    * windows; persist released after materialization.
    */
  def dupCoverage(docs: DataFrame, idCol: String, textCol: String,
                  n: Int, minDocs: Int): DataFrame = {
    val (pdnRep, memb) = perDocNgramCollapsed(docs, idCol, textCol, n)
    val pdn = pdnRep.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val flagged = pdn.groupBy("ngram").agg(sum(col("m")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("ngram"), lit(1).as("__dup"))
    // per-REP coverage (identical for every clique member), expanded to
    // docs through the membership join
    val repOut = pdn.join(flagged, Seq("ngram"), "left")
      .groupBy("gid")
      .agg(sum(col("cnt")).as("n_windows"),
        sum(when(col("__dup").isNotNull, col("cnt")).otherwise(0L)).as("n_dup_windows"))
      .withColumn("dup_frac",
        try_divide(col("n_dup_windows").cast("double"), col("n_windows").cast("double")))
    val out = memb.join(repOut, Seq("gid"))
      .select(col(idCol), col("n_windows"), col("n_dup_windows"), col("dup_frac"))
    // materialize the (small, per-doc) result and CUT its lineage from
    // pdn, so the window-level intermediate can be released here rather
    // than leaked for the session's lifetime. localCheckpoint (not a
    // second persist): its blocks are reclaimed by the ContextCleaner
    // when the returned frame is dropped — no unpersist contract to
    // push onto callers.
    val kept = out.localCheckpoint(true)
    pdn.unpersist(blocking = false)
    kept
  }

  /** Maximal corpus-duplicated SPANS per document — the trim stage of
    * passage-level dedup: adjacent/overlapping duplicated n-token
    * windows merged into one (start, end) token range, so curation can
    * CUT the boilerplate passage instead of dropping the whole doc
    * ([[dupCoverage]] says how much is duplicated; this says WHERE).
    * A window is duplicated iff its n-gram appears in ≥ `minDocs`
    * distinct docs; two duplicated windows merge while the later
    * starts within n tokens of the earlier (no uncovered token
    * between them). Output per span: 1-based `span_idx` in start
    * order, 0-based `start_tok`, EXCLUSIVE `end_tok`, and the window
    * count — integer-exact, so the DuckDB oracle pins it.
    *
    * Plan shape: the positioned window stream is persisted once and
    * feeds both the corpus flag aggregate and the span assembly; the
    * merge itself is a lag/cumsum window PARTITIONED BY DOC (state
    * bounded by tokens/doc, never corpus-wide). Same shuffle family
    * as [[dupCoverage]], no all-pairs anywhere.
    */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String,
               n: Int, minDocs: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // exact-duplicate collapse: span structure is a function of (text,
    // corpus window stats), so the explode and both window passes run
    // once per DISTINCT text; the corpus stat stays doc-exact by
    // weighting each representative with its clique size (n_docs =
    // Σ m over groups containing the window), and members inherit
    // their representative's spans
    val grpW = Window.partitionBy(col(textCol))
    val memb = docs.select(col(idCol), col(textCol))
      .withColumn("gid", min(col(idCol)).over(grpW))
      .withColumn("m", count(lit(1)).over(grpW))
    val wins = memb.filter(col(idCol) === col("gid"))
      .withColumn("__tk", tokens(col(textCol)))
      .filter(size(col("__tk")) >= n)
      .select(col("gid"), col("m"), posexplode(expr(
        s"transform(sequence(1, size(__tk) - ${n - 1}), " +
        s"i -> array_join(slice(__tk, i, $n), ' '))")))
      .withColumnRenamed("col", "ngram")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val flagged = wins.groupBy(col("gid"), col("ngram")).agg(max(col("m")).as("__m"))
      .groupBy("ngram").agg(sum(col("__m")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select("ngram")
    val w = Window.partitionBy(col("gid")).orderBy(col("pos"))
    val repSpans = wins.join(flagged, Seq("ngram"), "left_semi")
      .withColumn("__new",
        when(col("pos") > lag(col("pos"), 1).over(w) + lit(n), 1L).otherwise(0L))
      .withColumn("__g", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("gid"), col("__g"))
      .agg(min(col("pos")).cast("long").as("start_tok"),
        (max(col("pos")) + lit(n)).cast("long").as("end_tok"),
        count(lit(1)).as("n_windows"))
      .select(col("gid"), (col("__g") + 1L).as("span_idx"),
        col("start_tok"), col("end_tok"), col("n_windows"))
    val out = memb.select(col(idCol), col("gid"))
      .join(repSpans, Seq("gid"))
      .select(col(idCol), col("span_idx"), col("start_tok"), col("end_tok"),
        col("n_windows"))
    val kept = out.localCheckpoint(true)
    wins.unpersist(blocking = false)
    kept
  }

  /** The trimmed corpus: every doc with its [[dupSpans]] ranges CUT —
    * the end product passage-level dedup ships (quoted boilerplate
    * removed, the document kept). Spark-first shape: spans collapse to
    * ONE array per doc (dimension-sized join key side), and the cut is
    * a codegen'd higher-order `filter((tok, i) -> …)` over the token
    * array against that row's span list — the corpus is never
    * exploded, per-row cost is tokens × spans-in-doc (spans per doc is
    * small by construction). Docs without spans pass through whole.
    * Returns (id, n_kept tokens, md5 of the trimmed text) —
    * hash-exact against the SQL oracle without shipping long strings.
    */
  def trimDupSpans(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, minDocs: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // duplicate texts carry identical spans (dupSpans is text- and
    // corpus-stat-determined), so the tokenize + HOF cut also runs once
    // per DISTINCT text and members inherit (n_kept, clean_md5)
    val memb = docs.select(col(idCol), col(textCol))
      .withColumn("gid", min(col(idCol)).over(Window.partitionBy(col(textCol))))
    val reps = memb.filter(col(idCol) === col("gid"))
    val spans = dupSpans(docs, idCol, textCol, n, minDocs)
      .withColumnRenamed(idCol, "gid")
      .join(reps.select("gid"), Seq("gid"), "left_semi")
      .groupBy(col("gid"))
      .agg(collect_list(struct(col("start_tok"), col("end_tok"))).as("__spans"))
    val trimmed = reps.join(spans, Seq("gid"), "left")
      .withColumn("__tk", tokens(col(textCol)))
      .withColumn("__kept",
        when(col("__spans").isNull, col("__tk")).otherwise(expr(
          "filter(__tk, (x, i) -> " +
          "NOT exists(__spans, s -> i >= s.start_tok AND i < s.end_tok))")))
      .select(col("gid"),
        size(col("__kept")).cast("long").as("n_kept"),
        md5(array_join(col("__kept"), " ").cast("binary")).as("clean_md5"))
    memb.select(col(idCol), col("gid"))
      .join(trimmed, Seq("gid"))
      .select(col(idCol), col("n_kept"), col("clean_md5"))
  }

  /** Rare-term keyword extraction: each doc's top-k tokens ranked by
    * (document frequency ASC, term frequency DESC, token ASC) — the
    * tf-idf ordering restated with integer-exact keys (df is the idf
    * surrogate), so Spark and the SQL oracle agree bit-for-bit with no
    * transcendental log in the compare. Two keyed aggregations (doc ×
    * token, then token) and one join on the token key; the per-doc
    * top-k is a bounded window. Empty tokens (from empty docs) are
    * excluded on both sides.
    */
  def rareTermKeywords(docs: DataFrame, idCol: String, textCol: String,
                       k: Int): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(idCol, "token").agg(count(lit(1)).as("tf"))
    // tf already has one row per (doc, token), so df is a plain count
    val docFreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
      .orderBy(col("df").asc, col("tf").desc, col("token").asc)
    tf.join(docFreq, Seq("token"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("rnk"), col("token"), col("tf"), col("df"))
  }

  /** Corpus bigram-LM surprisal score — the CCNet/Gopher
    * perplexity-filter shape with the corpus itself as the language
    * model. The model is MLE conditional bigram probability
    * p(w₂|w₁) = c(w₁w₂)/c(w₁·) fitted in one aggregation pass over the
    * whole corpus (prefix counts come from the bigram relation itself,
    * so the conditionals normalize exactly); each document's score is
    * its total negative log-likelihood under that model. Every log
    * term is quantized to integer micro-nats (floor(1e6·ln)) BEFORE
    * the per-doc sum, so totals are order-independent exact integers —
    * a raw double sum would drift with partial-agg order and never
    * hash-match another engine. High surprisal = atypical text (the
    * quality-filter signal); docs with < 2 tokens carry no evidence
    * and are absent by construction.
    *
    * Scale: bigram instances explode at the scan (rows of one doc stay
    * in their input partition, so the per-doc sum collapses map-side);
    * the two model tables are keyed aggs on bounded-vocabulary keys,
    * broadcast back to the instances — at web scale (vocab² too big to
    * broadcast) the same plan degrades to keyed shuffle joins on
    * uniform keys. Nothing is O(corpus²).
    */
  def lmSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // exact-duplicate collapse: byte-identical texts explode identical
    // bigrams and score identically, so the explode/join/sum runs once
    // per DISTINCT text; the model stays corpus-exact by weighting each
    // representative's instances with its clique size (sum(m) == the
    // instance count brute force would see), and members inherit their
    // representative's score. Duplicate-heavy corpora pay for distinct
    // content, not copies.
    val grpW = org.apache.spark.sql.expressions.Window.partitionBy(col(textCol))
    val memb = docs.select(col(idCol), col(textCol))
      .withColumn("gid", min(col(idCol)).over(grpW))
      .withColumn("m", count(lit(1)).over(grpW))
    val bg = memb.filter(col(idCol) === col("gid"))
      .withColumn("_toks", tokens(col(textCol)))
      // zip_with over two shifted slices: no sequence() (which would
      // count DOWN for 1-token docs and emit null-padded bigrams)
      .withColumn("_bg", expr(
        """zip_with(slice(_toks, 1, size(_toks) - 1),
          |         slice(_toks, 2, size(_toks) - 1),
          |         (x, y) -> struct(x AS w1, concat(x, ' ', y) AS bg))""".stripMargin))
      .select(col("gid"), col("m"), explode(col("_bg")).as("b"))
      .select(col("gid"), col("m"), col("b.w1").as("w1"), col("b.bg").as("bg"))
    val bgCounts = bg.groupBy("bg").agg(sum(col("m")).as("bc"))
    val prefixCounts = bg.groupBy(col("w1").as("pw")).agg(sum(col("m")).as("pfc"))
    def lnQ6(c: Column): Column = floor(log(c) * 1e6).cast("long")
    val repScores = bg
      .join(broadcast(bgCounts), Seq("bg"))
      .join(broadcast(prefixCounts), col("w1") === col("pw"))
      .groupBy(col("gid"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(lnQ6(col("pfc")) - lnQ6(col("bc"))).as("surprisal_q6"))
    memb.select(col(idCol), col("gid"))
      .join(repScores, Seq("gid"))
      .select(col(idCol), col("n_bigrams"), col("surprisal_q6"))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003 — the MOSS
    * scheme): hash every k-token gram, then keep the MINIMUM hash of
    * each w-gram window. The selected set is position-independent and
    * guarantees that any shared run of ≥ k+w-1 tokens between two
    * documents yields at least one shared fingerprint — local document
    * edits only perturb nearby fingerprints. Output: DISTINCT
    * (doc, fp) rows; docs shorter than k+w-1 tokens have no full
    * window and are absent (mirrored by the oracle's length filter).
    *
    * Engine-exact by construction: the hash is the first 8 hex chars
    * of md5 (a 32-bit integer both engines derive identically), and
    * min-per-window needs no tie rule beyond the value itself.
    *
    * Scale: grams explode at the scan; both window functions (frame
    * min, partition max) share ONE shuffle partitioned by doc —
    * per-doc state is bounded by doc length, keys are uniform.
    * Nothing is pairwise here; candidate generation happens in
    * [[winnowPairs]] through the fingerprint inverted index.
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 4, w: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // exact-duplicate collapse: the fingerprint set is a pure function
    // of the text, so gram hashing and both window passes run once per
    // DISTINCT text; members inherit their representative's set
    val grpW = Window.partitionBy(col(textCol))
    val memb = docs.select(col(idCol), col(textCol))
      .withColumn("gid", min(col(idCol)).over(grpW))
    val grams = memb.filter(col(idCol) === col("gid"))
      .withColumn("__tk", tokens(col(textCol)))
      .filter(size(col("__tk")) >= k + w - 1)
      .select(col("gid"), posexplode(expr(
        s"transform(sequence(1, size(__tk) - ${k - 1}), " +
        s"i -> array_join(slice(__tk, i, $k), ' '))")).as(Seq("pos", "gram")))
      .withColumn("h",
        conv(substring(md5(to_binary(col("gram"), lit("utf-8"))), 1, 8), 16, 10)
          .cast("long"))
    val frame = Window.partitionBy(col("gid")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    val whole = Window.partitionBy(col("gid"))
    val repFps = grams
      // min BEFORE the full-window filter: truncated tail windows must
      // not select, but their rows still participate in earlier frames
      .withColumn("fp", min(col("h")).over(frame))
      .withColumn("__maxpos", max(col("pos")).over(whole))
      .filter(col("pos") <= col("__maxpos") - (w - 1))
      .select(col("gid"), col("fp")).distinct()
    memb.select(col(idCol), col("gid"))
      .join(repFps, Seq("gid"))
      .select(col(idCol), col("fp"))
  }

  /** Near-dup candidate pairs from shared winnowing fingerprints — the
    * inverted-index join over [[winnowFingerprints]]. `maxDf` drops
    * viral fingerprints (boilerplate shared by more than maxDf docs)
    * before pairing, the same frequency cap that keeps every banded
    * join in this codebase from exploding on stop-grams; `minShared`
    * is the match evidence threshold. At 100 TB the join shuffles on
    * the 32-bit fingerprint key — uniform, df-bounded fan-out, never
    * O(corpus²).
    */
  def winnowPairs(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = 4, w: Int = 5,
                  maxDf: Int = 50, minShared: Int = 3): DataFrame = {
    val fps = winnowFingerprints(docs, idCol, textCol, k, w)
    val rare = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("fp")
    val kept = fps.join(rare, Seq("fp"))
    val a = kept.select(col("fp"), col(idCol).as("doc_a"))
    val b = kept.select(col("fp"), col(idCol).as("doc_b"))
    a.join(b, Seq("fp"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Content fingerprints: md5 + sha256 (byte-identical across engines). */
  def withFingerprints(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("fp_md5", md5(to_binary(col(textCol), lit("utf-8"))))
      .withColumn("fp_sha256", sha2(to_binary(col(textCol), lit("utf-8")), 256))

  // --------------------------------------------------------------------
  // LINE-level corpus dedup (the CCNet / RefinedWeb pass): boilerplate —
  // headers, footers, cookie banners, licence blurbs — repeats VERBATIM
  // across documents at sub-document granularity, so document-level
  // dedup never sees it. CCNet (Wenzek et al., 2020) deduplicates web
  // text per PARAGRAPH before anything else; RefinedWeb (Penedo et al.,
  // 2023) runs the same line-wise filter. The corpus here carries no
  // newlines, so the "line" is a deterministic segmentation parameter:
  // consecutive non-overlapping `span`-token windows (the same rule the
  // DuckDB oracle replays). A line occurring in >= minDocs DISTINCT
  // documents is boilerplate; lineDedup rewrites each document without
  // its boilerplate lines, preserving original line order.
  // --------------------------------------------------------------------

  /** Every document segmented into its lines: (…, line_idx, line).
    * One explode, corpus_tokens/span output rows, zero shuffle.
    */
  def corpusLines(docs: DataFrame, idCol: String, textCol: String, span: Int): DataFrame =
    chunk(docs.select(col(idCol), col(textCol)), textCol, span, span)
      .select(col(idCol), col("chunk_idx").as("line_idx"), col("chunk_text").as("line"))

  /** Per-line corpus frequency: (line, n_docs, n_occurrences) — the
    * boilerplate report read before choosing a minDocs threshold. ONE
    * shuffle, keyed on the line text itself: a line is <= span tokens
    * (tens of bytes — the same order as any string groupBy key; hashing
    * it first would force a second pass to recover the reportable
    * text). Map-side partial aggregation collapses each partition's
    * repeats before the exchange, so shuffle volume tracks DISTINCT
    * lines per partition, not corpus size.
    */
  def lineStats(docs: DataFrame, idCol: String, textCol: String, span: Int): DataFrame =
    corpusLines(docs, idCol, textCol, span)
      .groupBy("line")
      .agg(countDistinct(col(idCol)).as("n_docs"), count(lit(1)).as("n_occurrences"))

  /** The corpus with boilerplate lines removed: (idCol, clean_text,
    * n_kept, n_dropped). Cost shape at 100 TB: segment (scan-speed
    * explode) → line-frequency aggregate (one shuffle, map-side
    * combined) → LEFT ANTI join lines against the boilerplate set
    * (shuffle keyed on the line; AQE broadcasts when the boilerplate
    * set is small, which it is unless the corpus is mostly boilerplate)
    * → per-document reassembly (one shuffle on the doc id, the output's
    * natural key). Everything is linear in corpus tokens; no stage
    * holds more than one document's lines in memory. A document whose
    * EVERY line is boilerplate survives with clean_text = '' (dropping
    * it is a separate curation decision — the caller filters).
    */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String,
                span: Int, minDocs: Int): DataFrame = {
    require(span > 0 && minDocs >= 2, s"need span > 0, minDocs >= 2; got $span, $minDocs")
    val lines = corpusLines(docs, idCol, textCol, span)
    val boiler = lineStats(docs, idCol, textCol, span)
      .filter(col("n_docs") >= minDocs).select("line")
    val kept = lines.join(boiler, Seq("line"), "left_anti")
    val rebuilt = kept
      .groupBy(col(idCol))
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("line_idx"), col("line")))),
          c => c("line")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    val totals = lines.groupBy(col(idCol)).agg(count(lit(1)).as("__n_lines"))
    totals
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }
}
