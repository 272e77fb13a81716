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
    * ratios miss. Trigram duplication is pure array arithmetic (zero
    * shuffle); the top-bigram share needs a per-(doc, bigram) count —
    * one explode + two partial-aggregated groupBys keyed on doc_id, so
    * per-task work is bounded by tokens per doc, never corpus size.
    * Docs with < 3 tokens have no trigram (or no meaningful repetition)
    * and are excluded, mirroring the oracle's WHERE.
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val d = docs
      .withColumn("__tk", tokens(col(textCol)))
      .filter(size(col("__tk")) >= 3)
      .withColumn("__bi", expr(
        "transform(sequence(0, size(__tk)-2), i -> concat(__tk[i], ' ', __tk[i+1]))"))
      .withColumn("__tri", expr(
        "transform(sequence(0, size(__tk)-3), i -> concat(__tk[i], ' ', __tk[i+1], ' ', __tk[i+2]))"))
      .withColumn("dup_trigram_frac", try_divide(
        (size(col("__tri")) - size(array_distinct(col("__tri")))).cast("double"),
        size(col("__tri")).cast("double")))
    d.select(col(idCol), col("dup_trigram_frac"), explode(col("__bi")).as("__b"))
      .groupBy(idCol, "dup_trigram_frac", "__b").agg(count(lit(1)).as("__n"))
      .groupBy(idCol, "dup_trigram_frac")
      .agg(sum("__n").cast("long").as("n_bigrams"), max("__n").cast("long").as("top_bigram_n"))
      .select(col(idCol), col("n_bigrams"), col("top_bigram_n"),
        try_divide(col("top_bigram_n").cast("double"), col("n_bigrams").cast("double"))
          .as("top_bigram_frac"),
        col("dup_trigram_frac"))
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

  /** Content fingerprints: md5 + sha256 (byte-identical across engines). */
  def withFingerprints(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("fp_md5", md5(to_binary(col(textCol), lit("utf-8"))))
      .withColumn("fp_sha256", sha2(to_binary(col(textCol), lit("utf-8")), 256))
}
