package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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

  /** Deterministic global ranking of a score column (1 = best).
    *
    * Exact full-corpus ranks WITHOUT a single-partition window: a
    * `row_number() OVER (ORDER BY …)` with no PARTITION BY funnels every
    * row through one task (Spark's WindowExec warns about exactly this).
    * Instead the frame is range-partition sorted (`orderBy` = distributed
    * sort, every partition does its share) and ranks are assigned with
    * `zipWithIndex` over the sorted partitions — one extra lightweight
    * job to count partition sizes, then each task numbers only its own
    * slice. Scales with the sort, which is the unavoidable cost of a
    * total ranking.
    *
    * Costs of the RDD hop, documented deliberately: (1) `zipWithIndex`
    * launches its partition-count job EAGERLY, at DataFrame-construction
    * time; (2) the output leaves Catalyst lineage, so downstream actions
    * recompute the sort unless the caller persists; (3) `rank` is
    * LongType (a total rank can exceed Int at corpus scale). Prefer
    * [[rankByTopN]] whenever slice semantics are acceptable — full-corpus
    * exact ranks are only needed when tail ranks must contribute (e.g.
    * the oracle-exact RRF over every document).
    */
  def rankBy(df: DataFrame, idCol: String, score: org.apache.spark.sql.Column,
             descending: Boolean = true): DataFrame = {
    val ord = if (descending) Seq(score.desc, col(idCol).asc)
              else Seq(score.asc, col(idCol).asc)
    val sorted = df.orderBy(ord: _*).select(col(idCol))
    val out = StructType(sorted.schema.fields :+
      StructField("rank", LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(ranked, out)
  }

  /** Top-N slice ranking — the production shape of rank fusion (fuse
    * each retriever's top-N, not the whole corpus).
    *
    * `orderBy().limit(n)` compiles to TakeOrderedAndProject: every
    * partition keeps an n-heap and only n rows reach the driver-side
    * merge — no full sort, no shuffle, no RDD drop-out, stays inside
    * whole-stage codegen. The `row_number` window that then assigns
    * ranks is unpartitioned, but over ≤ n rows BY CONSTRUCTION — the
    * bounded-slice case, not the full-corpus funnel rankBy avoids.
    */
  def rankByTopN(df: DataFrame, idCol: String, score: org.apache.spark.sql.Column,
                 n: Int, descending: Boolean = true): DataFrame = {
    val ord = if (descending) Seq(score.desc, col(idCol).asc)
              else Seq(score.asc, col(idCol).asc)
    val w = org.apache.spark.sql.expressions.Window.orderBy(ord: _*)
    df.orderBy(ord: _*).limit(n)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col(idCol), col("rank"))
  }
}
