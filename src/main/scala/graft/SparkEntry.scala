package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.VectorSearch
import graft.functions.vectors._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Oracle-matching conventions (bit-exactness vs DuckDB):
  *  - per-row double arithmetic is written with the identical op
  *    sequence on both sides → bitwise-identical values; scores are
  *    quantized per row with `floor(x * 1e4)` (deterministic given
  *    identical input bits) BEFORE any aggregation.
  *  - money aggregates go through exact DECIMAL casts per row, are
  *    summed exactly, and only then cast to double (correctly-rounded,
  *    engine-independent). Never sum raw doubles across rows — parallel
  *    aggregation order would diverge from DuckDB's sequential sum.
  *  - every query ends in a total ORDER BY; ties broken by unique keys.
  */
object SparkEntry {

  /** Flagship: the reference's headline op — vector search (top-k cosine)
    * on the embeddings table at sf0.001. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("vs_topk_cosine")(spark, "/root/testdata/sf0.001")

  // ---- shared helpers -----------------------------------------------------

  /** collect one query vector (a query *parameter*, like the reference's
    * resume embedding in demo.ipynb cell 11 — a deliberate 1-row collect).
    */
  private def queryVec(spark: SparkSession, dir: String, vecId: Long): Seq[Float] = {
    val row = Tables.embeddings(spark, dir).filter(col("vec_id") === vecId)
      .select("embedding").head()
    row.getSeq[Float](0)
  }

  /** floor(x * 1e4) as bigint — deterministic per-row score quantization. */
  private def q4(c: Column): Column = floor(c * lit(10000.0)).cast("long")

  // ---- queries ------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // == reference surface: vector / hybrid search ==========================

    "vs_topk_cosine" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      VectorSearch.topK(emb, "embedding", "vec_id", queryVec(s, dir, 0L), 10, "cosine")
        .select(col("vec_id"), col("label"), q4(col("score")).as("score_q"))
    }),

    "vs_topk_dot" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      VectorSearch.topK(emb, "embedding", "vec_id", queryVec(s, dir, 0L), 10, "dot")
        .select(col("vec_id"), col("label"), q4(col("score")).as("score_q"))
    }),

    "vs_topk_l2" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      VectorSearch.topK(emb, "embedding", "vec_id", queryVec(s, dir, 0L), 10, "l2")
        .select(col("vec_id"), col("label"), q4(col("score")).as("dist_q"))
    }),

    "vs_hybrid_prefilter" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      VectorSearch.hybridPrefilter(emb, col("label") === 3, "embedding", "vec_id",
          queryVec(s, dir, 0L), 5, "cosine")
        .select(col("vec_id"), col("label"), q4(col("score")).as("score_q"))
    }),

    "vs_hybrid_postfilter" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      // wideK = whole table, mirroring the reference's k=3000 post-filter
      VectorSearch.hybridPostfilter(emb, col("label") === 3, "embedding", "vec_id",
          queryVec(s, dir, 0L), 5, wideK = 1000000, "cosine")
        .select(col("vec_id"), col("label"), q4(col("score")).as("score_q"))
    }),

    "vs_range_cosine" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      VectorSearch.rangeSearch(emb, "embedding", queryVec(s, dir, 0L), 0.2, "cosine")
        .select(col("vec_id"), col("label"), q4(col("score")).as("score_q"))
        .orderBy(col("score_q").desc, col("vec_id"))
    }),

    "vs_knn_join" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val qs = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      VectorSearch.knnJoin(emb, "embedding", "vec_id", qs, "qid", "qvec", 5, "cosine")
        .select(col("qid"), col("vec_id"), q4(col("score")).as("score_q"))
        .orderBy(col("qid"), col("score_q").desc, col("vec_id"))
    }),

    // == reference surface: analytics on the same table =====================

    "docs_by_source" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy("source").agg(count(lit(1)).as("doc_count"))
        .orderBy(col("doc_count").desc, col("source"))),

    "docs_by_lang_source" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy("lang", "source").agg(count(lit(1)).as("doc_count"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang"), col("source"))),

    // == Spark-native analytics (TPC-H-ish) =================================

    "q1_pricing_summary" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir).filter(col("l_shipdate") <= lit("2000-01-01"))
      val price = col("l_extendedprice").cast("decimal(14,2)")
      val disc = col("l_discount").cast("decimal(14,2)")
      val tax = col("l_tax").cast("decimal(14,2)")
      l.groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"), // integral doubles: exact any order
          sum(price).cast("double").as("sum_base_price"),
          sum(price * (lit(1) - disc)).cast("double").as("sum_disc_price"),
          sum(price * (lit(1) - disc) * (lit(1) + tax)).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    })
  )

  // ---- oracle SQL (DuckDB dialect, run by the driver at sf0.01) -----------

  private val cos0 =
    "list_cosine_similarity(embedding::DOUBLE[], (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0))"
  private val dot0 =
    "list_inner_product(embedding::DOUBLE[], (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0))"
  private val l20 =
    "list_distance(embedding::DOUBLE[], (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0))"

  def oracleSql: Map[String, String] = Map(

    "vs_topk_cosine" ->
      s"""SELECT vec_id, label, CAST(FLOOR($cos0 * 10000.0) AS BIGINT) AS score_q
          FROM embeddings ORDER BY $cos0 DESC, vec_id LIMIT 10""",

    "vs_topk_dot" ->
      s"""SELECT vec_id, label, CAST(FLOOR($dot0 * 10000.0) AS BIGINT) AS score_q
          FROM embeddings ORDER BY $dot0 DESC, vec_id LIMIT 10""",

    "vs_topk_l2" ->
      s"""SELECT vec_id, label, CAST(FLOOR($l20 * 10000.0) AS BIGINT) AS dist_q
          FROM embeddings ORDER BY $l20 ASC, vec_id LIMIT 10""",

    "vs_hybrid_prefilter" ->
      s"""SELECT vec_id, label, CAST(FLOOR($cos0 * 10000.0) AS BIGINT) AS score_q
          FROM embeddings WHERE label = 3 ORDER BY $cos0 DESC, vec_id LIMIT 5""",

    "vs_hybrid_postfilter" ->
      s"""SELECT vec_id, label, CAST(FLOOR($cos0 * 10000.0) AS BIGINT) AS score_q
          FROM embeddings WHERE label = 3 ORDER BY $cos0 DESC, vec_id LIMIT 5""",

    "vs_range_cosine" ->
      s"""SELECT vec_id, label, CAST(FLOOR($cos0 * 10000.0) AS BIGINT) AS score_q
          FROM embeddings WHERE $cos0 >= 0.2
          ORDER BY CAST(FLOOR($cos0 * 10000.0) AS BIGINT) DESC, vec_id""",

    "vs_knn_join" ->
      """WITH scored AS (
           SELECT q.vec_id AS qid, e.vec_id AS vec_id,
                  list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS s
           FROM embeddings e CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 10) q
         ), ranked AS (
           SELECT qid, vec_id, CAST(FLOOR(s * 10000.0) AS BIGINT) AS score_q,
                  row_number() OVER (PARTITION BY qid ORDER BY s DESC, vec_id) AS rn
           FROM scored
         )
         SELECT qid, vec_id, score_q FROM ranked WHERE rn <= 5
         ORDER BY qid, score_q DESC, vec_id""",

    "docs_by_source" ->
      """SELECT source, count(*) AS doc_count FROM documents
         GROUP BY source ORDER BY doc_count DESC, source""",

    "docs_by_lang_source" ->
      """SELECT lang, source, count(*) AS doc_count, sum(n_chars) AS sum_chars
         FROM documents GROUP BY lang, source ORDER BY lang, source""",

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
                sum(l_quantity) AS sum_qty,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(14,2)))) AS DOUBLE) AS sum_disc_price,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(14,2))) * (1 + CAST(l_tax AS DECIMAL(14,2)))) AS DOUBLE) AS sum_charge,
                count(*) AS count_order,
                sum(l_quantity) / count(*) AS avg_qty
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-01-01'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""
  )
}
