package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** Batch text embedding — the plumbing of the reference's
  * SentenceTransformer encode step (demo.ipynb cell 7). The model is
  * external to the engine (the reference downloads all-MiniLM-L6-v2);
  * here the encoder is a deterministic feature-hashing projection so the
  * Spark-side shape — partition-parallel batched map, `array<float>`
  * output column, no shuffle — is real and testable without model jars.
  * Swapping in a real model = replacing `encodeOne` with a per-partition
  * batched model call (load once per partition, encode in batches).
  */
object Embed {

  /** Feature-hashed unit-norm embedding of whitespace-tokenized text. */
  def encodeOne(text: String, dim: Int): Array[Float] = {
    val v = new Array[Double](dim)
    text.toLowerCase.split("\\W+").filter(_.nonEmpty).foreach { tok =>
      val h = MurmurHash3.stringHash(tok)
      val idx = ((h % dim) + dim) % dim
      val sign = if (((h >> 31) & 1) == 0) 1.0 else -1.0
      v(idx) += sign
    }
    val norm = math.sqrt(v.map(x => x * x).sum)
    val out = new Array[Float](dim)
    if (norm > 0) { var i = 0; while (i < dim) { out(i) = (v(i) / norm).toFloat; i += 1 } }
    out
  }

  /** Adds an `embedding` column. Pure per-partition map — embeds at scan
    * parallelism with zero shuffle.
    */
  def encode(df: DataFrame, textCol: String, dim: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val encodeUdf = udf((s: String) => encodeOne(if (s == null) "" else s, dim))
    df.withColumn("embedding", encodeUdf(col(textCol)))
  }

  /** The same embedding as a standard MLlib pipeline —
    * Tokenizer → HashingTF → L2 Normalizer — producing a unit-norm
    * `array<float>` column. This is the batch-embedding shape a real
    * model drops into (swap HashingTF for a transformer-backed
    * `Transformer`); every stage is a narrow per-partition map, so the
    * pipeline embeds at scan parallelism with zero shuffle.
    */
  def encodePipeline(df: DataFrame, textCol: String, dim: Int = 64): DataFrame = {
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.feature.{HashingTF, Normalizer, Tokenizer}
    import org.apache.spark.ml.functions.vector_to_array
    val pipe = new Pipeline().setStages(Array(
      new Tokenizer().setInputCol(textCol).setOutputCol("_toks"),
      new HashingTF().setInputCol("_toks").setOutputCol("_tf").setNumFeatures(dim),
      new Normalizer().setInputCol("_tf").setOutputCol("_unit").setP(2.0)))
    pipe.fit(df).transform(df)
      .withColumn("embedding",
        transform(vector_to_array(col("_unit")), x => x.cast("float")))
      .drop("_toks", "_tf", "_unit")
  }
}
