package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.apache.spark.util.LongAccumulator
import scala.util.hashing.MurmurHash3

/** Batch text embedding — the plumbing of the reference's
  * SentenceTransformer encode step (demo.ipynb cell 7). The model is
  * external to the engine (the reference downloads all-MiniLM-L6-v2);
  * here the encoder is a deterministic feature-hashing projection so the
  * Spark-side shape — mapPartitions, model constructed ONCE per
  * partition, explicit size-B batch accumulation, `array<float>` output
  * column, no shuffle — is real and testable without model jars.
  * The deterministic [[Embed.StubEncoder]] is the oracle path;
  * [[Embed.ProcessEncoder]] is the production path — it runs the
  * actual model as an external worker process per partition (the
  * reference's own deployment shape), selected per call via
  * `encoderFactory`.
  */
object Embed {

  /** The model contract: one instance per partition (construction = the
    * "load the weights" step), `encodeBatch` = the batched forward
    * pass. An ONNX/transformer-backed implementation plugs into
    * [[encode]] via its `encoderFactory` parameter — the factory (not
    * the model) is what ships to executors, so heavyweight native
    * state is constructed task-side, never serialized.
    */
  trait BatchEncoder extends Serializable {
    def encodeBatch(texts: Array[String]): Array[Array[Float]]
    /** release task-side resources (worker processes, native sessions);
      * called once per partition when the task completes
      */
    def close(): Unit = ()
  }

  /** The PRODUCTION seam for models that do not run in the JVM — the
    * reference's model is exactly that (a SentenceTransformer forward
    * pass in a Python process, demo.ipynb cell 7). One worker process
    * per partition, batched over a line protocol:
    *
    *   request:  one line `<n>`, then n lines of base64(UTF-8 text)
    *             (base64 framing — raw text could contain newlines);
    *   response: n lines, each the embedding as space-separated floats.
    *
    * `command` is the worker launch line (e.g. a Python script wrapping
    * `model.encode(batch)`); it ships to executors as a Seq[String],
    * the process itself is constructed lazily task-side and reaped by
    * [[encode]]'s task-completion hook. Worker stderr passes through
    * to the task's stderr for diagnostics. An in-JVM ONNX session
    * would plug into the same [[BatchEncoder]] contract directly —
    * this class covers every model with a CLI, no jar required.
    */
  final class ProcessEncoder(command: Seq[String]) extends BatchEncoder {
    import java.nio.charset.StandardCharsets.UTF_8
    @transient private lazy val proc = {
      val pb = new ProcessBuilder(command: _*)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      pb.start()
    }
    @transient private lazy val out = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(proc.getOutputStream, UTF_8))
    @transient private lazy val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream, UTF_8))

    def encodeBatch(texts: Array[String]): Array[Array[Float]] = {
      out.write(texts.length.toString); out.newLine()
      texts.foreach { t =>
        out.write(java.util.Base64.getEncoder.encodeToString(
          (if (t == null) "" else t).getBytes(UTF_8)))
        out.newLine()
      }
      out.flush()
      texts.map { _ =>
        val line = in.readLine()
        if (line == null) throw new IllegalStateException(
          "encoder worker closed its stdout" +
            (if (proc.isAlive) "" else s" (exit=${proc.exitValue()})"))
        line.trim.split("\\s+").map(_.toFloat)
      }
    }

    override def close(): Unit = {
      try out.close() catch { case _: java.io.IOException => }
      proc.destroy()
    }
  }

  /** Launch command for the BUNDLED reference worker
    * (resources/graft/encoder_worker.py — the worked example of the
    * [[ProcessEncoder]] protocol: the real sentence-transformers model
    * when installed, a deterministic hashed projection otherwise).
    * Extracts the script from the jar to a temp file; call INSIDE the
    * encoder factory so extraction happens task-side on each executor
    * (the jar is on every executor's classpath, the temp path is
    * executor-local).
    */
  def bundledWorkerCommand(): Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/encoder_worker.py")
    require(in != null, "bundled encoder worker resource missing")
    val f = java.nio.file.Files.createTempFile("graft_encoder_worker", ".py")
    try java.nio.file.Files.copy(in, f,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    f.toFile.deleteOnExit()
    Seq("python3", f.toString)
  }

  /** Stand-in for the external model — deterministic feature hashing,
    * so the operator stays testable without model jars.
    */
  final class StubEncoder(dim: Int) extends BatchEncoder {
    def encodeBatch(texts: Array[String]): Array[Array[Float]] =
      texts.map(t => encodeOne(if (t == null) "" else t, dim))
  }

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

  /** Adds an `embedding` column via per-partition BATCHED encoding:
    * one encoder instance per partition (the model-load cost is paid
    * once per task, not per row), inputs accumulated into size-
    * `batchSize` batches (GPU/ONNX encoders only reach throughput on
    * batches), zero shuffle — embeds at scan parallelism.
    *
    * `batchCounter` (tests/metrics) increments once per encodeBatch
    * call, making the batch boundaries observable.
    */
  def encode(df: DataFrame, textCol: String, dim: Int = 64, batchSize: Int = 64,
             batchCounter: Option[LongAccumulator] = None,
             encoderFactory: Option[() => BatchEncoder] = None): DataFrame = {
    require(batchSize >= 1, "batchSize must be >= 1")
    val schema = df.schema.add("embedding", ArrayType(FloatType, containsNull = false))
    val enc = Encoders.row(schema)
    val idx = df.schema.fieldIndex(textCol)
    val factory = encoderFactory.getOrElse(() => new StubEncoder(dim))
    df.mapPartitions { it =>
      val model = factory() // "loaded" once per partition
      // reap task-side resources (worker processes, native sessions)
      // whether the task finishes or fails
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => model.close()))
      it.grouped(batchSize).flatMap { batch =>
        batchCounter.foreach(_.add(1))
        val vecs = model.encodeBatch(batch.map(r => r.getAs[String](idx)).toArray)
        batch.iterator.zip(vecs.iterator).map { case (r, v) =>
          Row.fromSeq(r.toSeq :+ (v.toSeq: Seq[Float]))
        }
      }
    }(enc)
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
