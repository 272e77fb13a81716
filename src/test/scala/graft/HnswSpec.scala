package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.operators.{HnswIndex, VectorSearch}
import java.nio.file.Files

/** HNSW segment-graph index: recall vs brute force, determinism, the
  * ef knob, metric senses, and model round-trip.
  */
class HnswSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf0001).cache()
  private lazy val query: Seq[Float] =
    emb.filter(col("vec_id") === 0L).select("embedding").head().getSeq[Float](0)
  private lazy val exactTop10: Seq[Long] =
    VectorSearch.topK(emb, "embedding", "vec_id", query, 10, "cosine")
      .select("vec_id").collect().map(_.getLong(0)).toSeq

  private lazy val model = {
    val path = Files.createTempDirectory("hnsw").toString
    HnswIndex.build(emb, "vec_id", "embedding", path,
      m = 8, efConstruction = 64, metric = "cosine", nPartitions = 4)
  }

  test("recall@10 >= 0.8 at ef=64 vs exact brute force") {
    val got = HnswIndex.probe(spark, model, "vec_id", query, 10, ef = 64)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    (got.intersect(exactTop10.toSet).size.toDouble / 10) should be >= 0.8
  }

  test("a wide beam (ef = segment size) recovers the exact top-10") {
    // not a theoretical guarantee of HNSW — pinned empirically for THIS
    // deterministic build (seeded levels, id-sorted insertion): if this
    // breaks, the graph construction changed, not the data
    val got = HnswIndex.probe(spark, model, "vec_id", query, 10, ef = 500)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    got shouldBe exactTop10
  }

  test("build and probe are deterministic: two builds, identical results") {
    val p1 = Files.createTempDirectory("hnsw_d1").toString
    val p2 = Files.createTempDirectory("hnsw_d2").toString
    val m1 = HnswIndex.build(emb, "vec_id", "embedding", p1, m = 8,
      efConstruction = 64, metric = "cosine", nPartitions = 4)
    val m2 = HnswIndex.build(emb, "vec_id", "embedding", p2, m = 8,
      efConstruction = 64, metric = "cosine", nPartitions = 4)
    def run(m: HnswIndex.Model) =
      HnswIndex.probe(spark, m, "vec_id", query, 10, ef = 32)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    run(m1) shouldBe run(m2)
    // and the persisted graphs themselves are identical row sets
    val g1 = spark.read.parquet(p1).orderBy("pid", "id").collect().map(_.toString)
    val g2 = spark.read.parquet(p2).orderBy("pid", "id").collect().map(_.toString)
    g1 shouldBe g2
  }

  test("query's own vector ranks first with cosine score 1.0") {
    val top = HnswIndex.probe(spark, model, "vec_id", query, 3, ef = 64).head()
    top.getLong(0) shouldBe 0L
    top.getDouble(1) shouldBe 1.0 +- 1e-9
  }

  test("l2 metric orders ascending and finds the zero-distance self-match") {
    val path = Files.createTempDirectory("hnsw_l2").toString
    val m = HnswIndex.build(emb, "vec_id", "embedding", path,
      m = 8, efConstruction = 64, metric = "l2", nPartitions = 4)
    val rows = HnswIndex.probe(spark, m, "vec_id", query, 5, ef = 64).collect()
    rows.head.getLong(0) shouldBe 0L
    rows.head.getDouble(1) shouldBe 0.0 +- 1e-9
    rows.map(_.getDouble(1)).toSeq shouldBe rows.map(_.getDouble(1)).sorted.toSeq
  }

  test("tiny corpus: k larger than the corpus returns every row") {
    val df = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(1f, 1f))
    ).toDF("vec_id", "embedding")
    val path = Files.createTempDirectory("hnsw_tiny").toString
    val m = HnswIndex.build(df, "vec_id", "embedding", path,
      m = 2, efConstruction = 4, metric = "cosine", nPartitions = 2)
    HnswIndex.probe(spark, m, "vec_id", Seq(1f, 0f), 10, ef = 8)
      .count() shouldBe 3
  }

  test("model save/load round-trips through the layout") {
    val loaded = HnswIndex.load(spark, model.path)
    loaded shouldBe model
  }

  test("duplicate ids refuse loudly at probe time, never a corrupted graph") {
    // two nodes under one id would silently collapse in the loader's
    // id→index remap and break the level invariant mid-walk (observed
    // at 100× on a mis-derived dataset: out-of-bounds in the descent)
    val path = Files.createTempDirectory("hnsw_dup").toString
    val dup = emb.limit(50).union(emb.limit(8)) // 8 ids twice
    val m = HnswIndex.build(dup, "vec_id", "embedding", path,
      m = 8, efConstruction = 64, metric = "cosine", nPartitions = 1)
    val e = intercept[org.apache.spark.SparkException] {
      HnswIndex.probe(spark, m, "vec_id", query, 5, ef = 64).collect()
    }
    e.getMessage should include("duplicate id")
  }

  test("probe refuses a layout with no segments") {
    val empty = Files.createTempDirectory("hnsw_none").toString
    val ghost = HnswIndex.Model(empty, "cosine", 8, 64, 4)
    an[IllegalArgumentException] should be thrownBy
      HnswIndex.probe(spark, ghost, "vec_id", query, 5, ef = 8)
  }

  test("append adds a new segment visible to the next probe (Lucene flush model)") {
    val path = Files.createTempDirectory("hnsw_app").toString
    val m = HnswIndex.build(emb, "vec_id", "embedding", path,
      m = 8, efConstruction = 64, metric = "cosine", nPartitions = 4)
    // a brand-new vector equal to the query must surface at rank 1
    // after the flush — and only after
    val fresh = Seq((99999L, query)).toDF("vec_id", "embedding")
    val before = HnswIndex.probe(spark, m, "vec_id", query, 3, ef = 64)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    before should not contain 99999L
    HnswIndex.append(spark, m, fresh, "vec_id", "embedding") shouldBe 4
    val after = HnswIndex.probe(spark, m, "vec_id", query, 3, ef = 64).collect()
    after.map(_.getLong(0)) should contain(99999L)
    // a second flush lands in the NEXT segment id — segments are immutable
    HnswIndex.append(spark, m,
      Seq((99998L, query)).toDF("vec_id", "embedding"), "vec_id", "embedding") shouldBe 5
  }

  test("graft_hnsw_search TVF serves the same results as the Scala probe") {
    val api = HnswIndex.probe(spark, model, "id", query, 10, ef = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val qLit = query.map(v => s"CAST($v AS FLOAT)").mkString("array(", ", ", ")")
    val sql = spark.sql(
      s"SELECT * FROM graft_hnsw_search('${model.path}', $qLit, 10, 64)")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    sql shouldBe api
    // ef defaults to 64
    spark.sql(s"SELECT * FROM graft_hnsw_search('${model.path}', $qLit, 10)")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq shouldBe api
  }

  test("knnJoin: per-query top-k recall against the exact join") {
    val qs = (0L to 4L).map { i =>
      i -> emb.filter(col("vec_id") === i).select("embedding").head().getSeq[Float](0)
    }
    val got = HnswIndex.knnJoin(spark, model, "vec_id", qs, k = 5, ef = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    qs.foreach { case (qid, qv) =>
      val exact = VectorSearch.topK(emb, "embedding", "vec_id", qv, 5, "cosine")
        .select("vec_id").collect().map(_.getLong(0)).toSet
      (got(qid).intersect(exact).size.toDouble / 5) should be >= 0.8
      got(qid) should have size 5
    }
  }
}
