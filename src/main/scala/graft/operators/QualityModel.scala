package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the distillation stage every modern
  * curation pipeline runs (CCNet's fastText LM filter; DCLM and
  * FineWeb-Edu's classifier-over-annotations): fit a CHEAP linear
  * classifier on a bounded labeled sample, then score the whole corpus
  * with it at scan speed. Here the teacher signal is the repo's own
  * heuristic gate (in production it would be LLM judgments or a
  * reference-corpus discriminator — the plumbing is identical); the
  * student is logistic regression over hashed unigram+bigram counts,
  * i.e. fastText's linear bag-of-ngrams architecture on MLlib
  * primitives.
  *
  * Scale design: TRAINING cost is bounded by the deterministic
  * md5-threshold sample (never the corpus — FineWeb-Edu fits on 450 k
  * annotations against a 15 T-token corpus); SCORING is a broadcast of
  * one (2^16 + 1)-double coefficient vector and a per-row sparse dot
  * product — scan-parallel, zero shuffle, the filter composes into a
  * curation plan as a plain `filter()` like any other gate.
  */
object QualityModel {

  val NumFeatures: Int = 1 << 16

  /** Hashed unigram+bigram term-frequency features (fastText's feature
    * map): house whitespace tokens, adjacent-pair bigrams, one
    * HashingTF bucket space for both. Narrow per-row projection.
    */
  def featurize(docs: DataFrame, textCol: String): DataFrame = {
    import org.apache.spark.ml.feature.HashingTF
    val toks = filter(TextAnalysis.tokens(col(textCol)), w => length(w) > 0)
    // zip tokens against their own tail; concat propagates the padding
    // null on the last slot, so the filter drops exactly that slot
    val pairs = zip_with(toks, slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat(a, lit("_"), b))
    val withGrams = docs.withColumn("_grams",
      concat(toks, filter(pairs, g => g.isNotNull)))
    new HashingTF().setInputCol("_grams").setOutputCol("features")
      .setNumFeatures(NumFeatures)
      .transform(withGrams)
      .drop("_grams")
  }

  /** The teacher: the heuristic gate restated as a 0/1 label — long
    * enough, stopword-bearing, not punctuation-heavy. Deterministic
    * integer comparisons only (20·nStop ≥ nTok avoids a division).
    */
  def weakLabel(textCol: Column): Column = {
    val toks = filter(TextAnalysis.tokens(textCol), w => length(w) > 0)
    val nTok = size(toks)
    val nStop = size(filter(toks,
      t => t.isin(TextAnalysis.stopwords.map(_.asInstanceOf[Any]): _*)))
    val nPunct = regexp_count(lower(textCol), lit("[^a-z0-9 ]"))
    val nChars = length(textCol)
    when(nTok >= 15 && nStop * 20 >= nTok && nPunct * 5 <= nChars, 1.0)
      .otherwise(0.0)
  }

  /** Deterministic md5-threshold membership test at `rate` ∈ [0,1] —
    * the reproducible "random" sample both train/holdout splits and
    * the bounded-training-set story rely on.
    */
  def md5Sample(idCol: Column, rate: Double): Column =
    conv(substring(md5(idCol.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0) < lit(rate)

  /** Fit the student on a bounded sample: docs where md5(id) < rate get
    * featurized and labeled by the teacher, LR fits with L2. The
    * returned model is a serializable coefficient vector — broadcast
    * by `score`, checkpointable like any artifact.
    */
  def train(docs: DataFrame, idCol: String, textCol: String,
            sampleRate: Double = 0.5, maxIter: Int = 50,
            regParam: Double = 0.01): LogisticRegressionModel = {
    val sample = docs.filter(md5Sample(col(idCol), sampleRate))
      .withColumn("label", weakLabel(col(textCol)))
    new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("features").setLabelCol("label")
      .fit(featurize(sample, textCol))
  }

  /** Score: adds `q_prob` (P(good)) and `q_pred` (0/1 at 0.5). One
    * broadcast coefficient vector, per-row sparse dot product, zero
    * shuffle — composes into curation plans as a plain filter.
    */
  def score(docs: DataFrame, textCol: String,
            model: LogisticRegressionModel): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    model.setFeaturesCol("features")
      .setProbabilityCol("_prob").setPredictionCol("_pred")
      .setRawPredictionCol("_raw")
      .transform(featurize(docs, textCol))
      .withColumn("q_prob", vector_to_array(col("_prob")).getItem(1))
      .withColumn("q_pred", col("_pred").cast("long"))
      .drop("features", "_prob", "_pred", "_raw")
  }

  /** Teacher-vs-student agreement report on the HELD-OUT half — the
    * acceptance check a pipeline owner reads before trusting the cheap
    * model on the full corpus: per-source counts, agreements, and the
    * confusion cells, all exact integers.
    */
  def agreementReport(docs: DataFrame, idCol: String, textCol: String,
                      model: LogisticRegressionModel,
                      sampleRate: Double = 0.5): DataFrame = {
    val held = docs.filter(!md5Sample(col(idCol), sampleRate))
      .withColumn("weak", weakLabel(col(textCol)).cast("long"))
    score(held, textCol, model)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("weak")).as("n_weak_good"),
        sum(col("q_pred")).as("n_pred_good"),
        sum(when(col("weak") === col("q_pred"), 1L).otherwise(0L)).as("n_agree"),
        sum(when(col("weak") === 1 && col("q_pred") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("weak") === 0 && col("q_pred") === 1, 1L).otherwise(0L)).as("fp"),
        sum(when(col("weak") === 1 && col("q_pred") === 0, 1L).otherwise(0L)).as("fn"))
      .orderBy("source")
  }
}
