package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-fusion retrieval — combining keyword and vector rankings into
  * one result list. The reference's "hybrid search" is predicate +
  * vector (covered by VectorSearch.hybrid*); this is the other hybrid
  * retrieval: score-free reciprocal-rank fusion (RRF), the standard
  * robust combiner (Cormack et al., SIGIR'09) since absolute scores
  * from different scorers aren't comparable.
  *
  * Each input ranking is (id, rank); fused score = Σ 1/(k + rank).
  * All inputs join on id (missing ranks contribute 0, i.e. documents
  * ranked by only one retriever still surface). Ranks are computed by
  * the caller with deterministic tie-breaks, so the fusion itself is
  * a couple of cheap joins — at scale the rankings are top-N slices,
  * so the fused set is small regardless of corpus size.
  */
object Fusion {

  /** Fuse rankings (each with columns (idCol, rankCol)) by RRF. */
  def rrf(rankings: Seq[DataFrame], idCol: String, rankCol: String,
          k: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val contribs = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(idCol), (lit(1.0) / (lit(k) + col(rankCol))).as(s"__c$i"))
    }
    val joined = contribs.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val total = contribs.indices.map(i => coalesce(col(s"__c$i"), lit(0.0)))
      .reduce(_ + _)
    joined.select(col(idCol), total.as("rrf_score"))
  }

  /** Deterministic dense ranking of a score column (1 = best). */
  def rankBy(df: DataFrame, idCol: String, score: org.apache.spark.sql.Column,
             descending: Boolean = true): DataFrame = {
    val ord = if (descending) Seq(score.desc, col(idCol).asc)
              else Seq(score.asc, col(idCol).asc)
    df.withColumn("rank", row_number().over(Window.orderBy(ord: _*)))
      .select(col(idCol), col("rank"))
  }
}
