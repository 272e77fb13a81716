package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.vectors._

import scala.collection.mutable

/** Spark-native vector search — the reference's
  * `hudi_vector_search(path, column, query_vec, k, metric)` table
  * function (demo.ipynb cell 11/13) re-expressed as declarative plans.
  *
  * Design notes (100 TB):
  *  - `topK` compiles to TakeOrderedAndProject: each task keeps a k-heap
  *    over its partitions and only k rows per partition reach the
  *    driver-side merge. No shuffle, no global sort; cost is one scan.
  *  - `hybrid*`: the reference post-filters (its index lacks predicate
  *    pushdown — see demo.ipynb cell 13 comment). `hybridPrefilter`
  *    filters BEFORE scoring, so the predicate reaches the parquet scan
  *    (`PushedFilters`) and selective queries scan *less*. The
  *    post-filter variant is kept for semantic parity with the demo.
  *  - `knnJoin` (batched queries) broadcasts the query set, computes a
  *    per-input-partition top-k with a bounded heap (mapPartitions —
  *    genuine per-partition imperative logic), then resolves the global
  *    top-k with a window over the ≤ |queries|·partitions·k survivors.
  *    The big side never shuffles.
  */
object VectorSearch {

  /** similarity/distance column for `metric` ∈ cosine | dot | l2.
    *
    * Note: a zero-norm vector yields NaN cosine, and NaN sorts greatest
    * in both Spark and DuckDB (so a zero vector would rank first under
    * desc). That matches engine semantics everywhere this library is
    * verified, but filter zero vectors upstream if your corpus can
    * contain them.
    */
  def scoreCol(vec: Column, query: Column, metric: String): Column = metric match {
    case "cosine" => cosine_similarity(vec, query)
    case "dot"    => dot_product(vec, query)
    case "l2"     => l2_distance(vec, query)
    case m        => throw new IllegalArgumentException(s"unknown metric: $m")
  }

  /** true iff larger score = better for this metric. */
  private def descending(metric: String): Boolean = metric != "l2"

  private def queryLit(query: Seq[Float]): Column = typedlit(query)

  /** Score every row against one query vector (adds `score`). */
  def score(data: DataFrame, vecCol: String, query: Seq[Float], metric: String): DataFrame =
    data.withColumn("score", scoreCol(col(vecCol), queryLit(query), metric))

  /** Exact top-k against one query vector. Deterministic: ties broken by
    * ascending `idCol`. Plan: TakeOrderedAndProject (per-partition heap).
    */
  def topK(data: DataFrame, vecCol: String, idCol: String, query: Seq[Float], k: Int,
           metric: String = "cosine"): DataFrame = {
    val scored = score(data, vecCol, query, metric).drop(vecCol)
    val ord = if (descending(metric)) desc("score") else asc("score")
    scored.orderBy(ord, asc(idCol)).limit(k)
  }

  /** Hybrid search, done right: predicate first (pushes to the scan),
    * then exact top-k over the filtered rows only.
    */
  def hybridPrefilter(data: DataFrame, pred: Column, vecCol: String, idCol: String,
                      query: Seq[Float], k: Int, metric: String = "cosine"): DataFrame =
    topK(data.filter(pred), vecCol, idCol, query, k, metric)

  /** Hybrid search the reference's way: wide top-k window, then filter,
    * then re-limit (demo.ipynb cell 13). `wideK` plays the role of the
    * reference's k=3000 (table size).
    */
  def hybridPostfilter(data: DataFrame, pred: Column, vecCol: String, idCol: String,
                       query: Seq[Float], k: Int, wideK: Int,
                       metric: String = "cosine"): DataFrame = {
    val wide = topK(data, vecCol, idCol, query, wideK, metric)
    val ord = if (descending(metric)) desc("score") else asc("score")
    wide.filter(pred).orderBy(ord, asc(idCol)).limit(k)
  }

  /** Range search: all rows with similarity ≥ tau (or distance ≤ tau for
    * l2). Fully parallel filter — no top-k driver merge at all.
    */
  def rangeSearch(data: DataFrame, vecCol: String, query: Seq[Float], tau: Double,
                  metric: String = "cosine"): DataFrame = {
    val scored = score(data, vecCol, query, metric).drop(vecCol)
    if (descending(metric)) scored.filter(col("score") >= tau)
    else scored.filter(col("score") <= tau)
  }

  /** Batched k-NN: for every query row (qidCol, qvecCol) find its top-k
    * data rows. Query set is broadcast; data side never shuffles — a
    * bounded heap per (partition, query) reduces to ≤ P·Q·k rows before
    * the final (tiny) window.
    */
  def knnJoin(data: DataFrame, vecCol: String, idCol: String,
              queries: DataFrame, qidCol: String, qvecCol: String,
              k: Int, metric: String = "cosine"): DataFrame = {
    val scored = data
      .crossJoin(broadcast(queries.select(col(qidCol), col(qvecCol))))
      .withColumn("score", scoreCol(col(vecCol), col(qvecCol), metric))
      .select(col(qidCol), col(idCol), col("score"))

    perQueryTopK(scored, qidCol, idCol, k, metric)
  }

  /** Reduce a scored `(qid, id, score)` frame to the per-qid top-k
    * WITHOUT hash-shuffling the full candidate set into |queries|
    * partitions: a per-partition bounded heap first cuts the input to
    * ≤ partitions·queries·k rows, and only those survivors go through
    * the final (tiny) window. Shared by the exact [[knnJoin]] and the
    * IVF-pruned batched join ([[IvfIndex.knnJoin]]). Columns must be
    * exactly (qidCol, idCol, score), in that order.
    */
  private[operators] def perQueryTopK(scored: DataFrame, qidCol: String, idCol: String,
                                      k: Int, metric: String): DataFrame = {
    val desc_ = descending(metric)
    val enc = Encoders.row(scored.schema)
    // Per-partition bounded heap: keeps k best rows per query id.
    val partial = scored.mapPartitions { it =>
      val heaps = mutable.Map.empty[Any, mutable.PriorityQueue[(Double, Any, Row)]]
      // id tie-break must match the final window's asc(idCol) nulls-first
      // ordering so boundary ties survive the partial phase; external row
      // values (Long/Int/String/Decimal/…) are all Comparable.
      def idCmp(x: Any, y: Any): Int =
        if (x == null && y == null) 0
        else if (x == null) -1
        else if (y == null) 1
        else x.asInstanceOf[Comparable[Any]].compareTo(y)
      // dequeue removes the greatest element == the WORST kept row, so
      // "greater" must mean "worse" under this ordering.
      val ord: Ordering[(Double, Any, Row)] = new Ordering[(Double, Any, Row)] {
        def compare(x: (Double, Any, Row), y: (Double, Any, Row)): Int = {
          // desc metrics: lower score = worse; l2: larger distance = worse
          val s = if (desc_) java.lang.Double.compare(y._1, x._1)
                  else java.lang.Double.compare(x._1, y._1)
          if (s != 0) s else idCmp(x._2, y._2) // tie: larger id = worse
        }
      }
      it.foreach { r =>
        val qid = r.get(0); val id = r.get(1); val s = r.getDouble(2)
        val h = heaps.getOrElseUpdate(qid, mutable.PriorityQueue.empty(ord))
        h.enqueue((s, id, r))
        if (h.size > k) h.dequeue()
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._3))
    }(enc)

    val w =
      if (desc_) Window.partitionBy(qidCol).orderBy(desc("score"), asc(idCol))
      else Window.partitionBy(qidCol).orderBy(asc("score"), asc(idCol))
    partial
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .drop("rnk")
  }
}
