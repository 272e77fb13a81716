package graft.operators

import org.apache.spark.sql.{DataFrame, Row, Encoders}
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.util.LongAccumulator

/** Cross-encoder reranking — the precision stage modern retrieval
  * stacks run AFTER hybrid recall (retrieve top-N cheaply, rescore
  * (query, doc) PAIRS with a joint model, emit top-k): the reference's
  * retrieval demo stops at RRF fusion; production rankers add exactly
  * this stage. Mirrors [[Embed]]'s architecture one level up: the
  * model contract is a batched pair scorer, one instance per
  * partition, external processes supported over the same line
  * protocol — and a deterministic stub keeps the operator testable
  * and ORACLE-CHECKABLE without model jars.
  *
  * Scale: reranking cost is per CANDIDATE (N ~ 50-1000 per query),
  * not per corpus — the expensive joint forward pass never sees the
  * table. The candidate frame stays partitioned; scoring is a
  * per-partition batched map (zero shuffle), so a knn-join-shaped
  * batch of thousands of queries reranks at scan parallelism.
  */
object Rerank {

  /** The model contract: score (query, doc) pairs jointly, batched.
    * Construction = model load, once per partition.
    */
  trait BatchScorer extends Serializable {
    def scoreBatch(queries: Array[String], docs: Array[String]): Array[Double]
    def close(): Unit = ()
  }

  /** External-process cross-encoder over [[Embed.ProcessEncoder]]'s
    * framing, two base64 fields per request line:
    *   request:  `<n>`, then n lines `b64(query)\tb64(doc)`;
    *   response: n lines, one decimal score each.
    */
  final class ProcessScorer(command: Seq[String]) extends BatchScorer {
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

    def scoreBatch(queries: Array[String], docs: Array[String]): Array[Double] = {
      val b64 = java.util.Base64.getEncoder
      out.write(queries.length.toString); out.newLine()
      var i = 0
      while (i < queries.length) {
        out.write(b64.encodeToString(
          (if (queries(i) == null) "" else queries(i)).getBytes(UTF_8)))
        out.write("\t")
        out.write(b64.encodeToString(
          (if (docs(i) == null) "" else docs(i)).getBytes(UTF_8)))
        out.newLine()
        i += 1
      }
      out.flush()
      queries.map { _ =>
        val line = in.readLine()
        if (line == null) throw new IllegalStateException(
          "scorer worker closed its stdout" +
            (if (proc.isAlive) "" else s" (exit=${proc.exitValue()})"))
        line.trim.toDouble
      }
    }

    override def close(): Unit = {
      try out.close() catch { case _: java.io.IOException => }
      proc.destroy()
    }
  }

  /** Deterministic stand-in: INTEGER distinct-token overlap between
    * query and doc — crude but monotone in lexical relevance, and
    * exactly recomputable in SQL (`len(list_intersect(list_distinct(
    * …), …))`), which is what lets the reranked pipeline carry a hard
    * DuckDB oracle end to end.
    */
  final class StubScorer extends BatchScorer {
    def scoreBatch(queries: Array[String], docs: Array[String]): Array[Double] = {
      val out = new Array[Double](queries.length)
      var i = 0
      while (i < queries.length) {
        val q = tokSet(queries(i))
        val d = tokSet(docs(i))
        out(i) = q.count(d.contains).toDouble
        i += 1
      }
      out
    }
    private def tokSet(s: String): Set[String] =
      if (s == null) Set.empty
      else s.toLowerCase(java.util.Locale.ROOT).split(" ").filter(_.nonEmpty).toSet
  }

  /** Rescore a candidate frame against ONE query string (the serving
    * shape: candidates of a single retrieval call); adds `ce_score`.
    * Per-partition batched — the model loads once per task and sees
    * `batchSize` pairs per forward pass.
    */
  def rerank(cands: DataFrame, queryText: String, textCol: String,
             batchSize: Int = 32,
             batchCounter: Option[LongAccumulator] = None,
             scorerFactory: Option[() => BatchScorer] = None): DataFrame = {
    require(batchSize >= 1, "batchSize must be >= 1")
    val schema = cands.schema.add("ce_score", DoubleType, nullable = false)
    val enc = Encoders.row(schema)
    val idx = cands.schema.fieldIndex(textCol)
    val factory = scorerFactory.getOrElse(() => new StubScorer)
    cands.mapPartitions { it =>
      val model = factory()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => model.close()))
      it.grouped(batchSize).flatMap { batch =>
        batchCounter.foreach(_.add(1))
        val docs = batch.map(r => r.getAs[String](idx)).toArray
        val qs = Array.fill(docs.length)(queryText)
        val scores = model.scoreBatch(qs, docs)
        batch.iterator.zip(scores.iterator).map { case (r, s) =>
          Row.fromSeq(r.toSeq :+ s)
        }
      }
    }(enc)
  }
}
