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

  /** Deterministic global ranking of a score column (1 = best).
    *
    * Exact full-corpus ranks WITHOUT a single-partition window (a
    * `row_number() OVER (ORDER BY …)` with no PARTITION BY funnels every
    * row through one task — Spark's WindowExec warns about exactly this)
    * and WITHOUT leaving Catalyst: the frame is range-partition sorted
    * (`orderBy` = distributed sort, every partition does its share),
    * each row is tagged with `monotonically_increasing_id()` — bit
    * layout (partition index << 33) + row-index-within-partition,
    * evaluated ABOVE the sort so the low bits ARE the row's sorted
    * position in its partition, and range partitions are contiguous
    * slices of the total order — then the per-partition row counts
    * (one row per partition — broadcast-sized by construction) are
    * cumulative-summed into start offsets and broadcast-joined back:
    * rank = partition offset + local index + 1. The count pass reuses
    * the sort's shuffle (ReuseExchange / AQE stage reuse), so the plan
    * costs one range shuffle total, stays lazy, stays in whole-stage
    * codegen, and keeps Catalyst lineage (AQE and shuffle reuse apply
    * downstream — no eager job, no InternalRow↔Row conversion).
    *
    * `rank` is LongType — a total rank can exceed Int at corpus scale.
    * (External callers matching on schema: note the widening vs an
    * IntegerType row_number rank.) Prefer [[rankByTopN]] whenever slice
    * semantics are acceptable — full-corpus exact ranks are only needed
    * when tail ranks must contribute (e.g. the oracle-exact RRF over
    * every document).
    */
  def rankBy(df: DataFrame, idCol: String, score: org.apache.spark.sql.Column,
             descending: Boolean = true): DataFrame = {
    val ordS = if (descending) Seq(col("__s").desc, col(idCol).asc)
               else Seq(col("__s").asc, col(idCol).asc)
    // the id tag is a nondeterministic projection, so Catalyst will not
    // push it below the sort or eliminate the sort under the count
    // aggregate — both passes see identical sorted partitions
    val tagged = df.select(col(idCol), score.as("__s"))
      .orderBy(ordS: _*)
      .select(col(idCol), monotonically_increasing_id().as("__mid"))
    val pid = shiftright(col("__mid"), 33)
    val localIdx = col("__mid").bitwiseAND(lit((1L << 33) - 1))
    val wCum = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // monotonically_increasing_id's per-partition counter is 33 bits: a
    // range partition past 2^33 rows would bleed into the partition-index
    // bits and silently corrupt ranks — fail loudly instead (the check
    // costs one comparison per PARTITION, on the tiny offsets frame)
    val offsets = tagged.groupBy(pid.as("__pid")).agg(count(lit(1)).as("__cnt"))
      .select(col("__pid"),
        when(col("__cnt") < lit(1L << 33),
            coalesce(sum(col("__cnt")).over(wCum), lit(0L)))
          .otherwise(raise_error(lit(
            "rankBy: a range partition exceeds 2^33 rows; raise spark.sql.shuffle.partitions")).cast("long"))
          .as("__off"))
    tagged.join(broadcast(offsets), pid === col("__pid"))
      .select(col(idCol), (col("__off") + localIdx + lit(1L)).as("rank"))
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
