package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The reference's SQL search pattern, runnable as plain Spark SQL once
  * the kernels are registered.
  */
class GraftExtensionsSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}

  test("registered SQL functions reproduce the DataFrame top-k") {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, sf0001).createOrReplaceTempView("embeddings_v")
    val sql = spark.sql(
      """SELECT vec_id,
               cosine_similarity(embedding,
                 (SELECT embedding FROM embeddings_v WHERE vec_id = 0)) AS score
         FROM embeddings_v ORDER BY score DESC, vec_id LIMIT 10""")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))

    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf0001)
    val q = emb.filter(col("vec_id") === 0L).select("embedding").head().getSeq[Float](0)
    val df = graft.operators.VectorSearch.topK(emb, "embedding", "vec_id", q, 10, "cosine")
      .select("vec_id", "score").collect().map(r => (r.getLong(0), r.getDouble(1)))

    sql shouldBe df
  }

  test("end-to-end reference flow: upsert into the lakehouse, search the TABLE") {
    // demo.ipynb cells 8 → 11 in one piece: embeddings live in the COW
    // table, an upsert changes one record, and vector search runs over
    // the table surface (Scala API and the graft_table SQL TVF), seeing
    // exactly the post-upsert state; time travel sees the pre-upsert one
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftFunctions.register(spark)
    val path = java.nio.file.Files.createTempDirectory("graft_e2e").toString + "/t"
    val base = Tables.embeddings(spark, sf0001).select("vec_id", "embedding", "label")
    graft.sources.GraftTable.create(base, path, Seq("vec_id"))
    val q = base.filter(col("vec_id") === 0L).select("embedding").head().getSeq[Float](0)
    // vec 5 becomes an exact duplicate of vec 0's embedding
    graft.sources.GraftTable.upsert(spark, path,
      Seq((5L, q, 99)).toDF("vec_id", "embedding", "label"))

    val snap = graft.sources.GraftTable.read(spark, path)
    val got = graft.operators.VectorSearch.topK(snap, "embedding", "vec_id", q, 2, "cosine")
      .select("vec_id").collect().map(_.getLong(0))
    got.toSeq shouldBe Seq(0L, 5L) // both score 1.0; tie broken by id

    // the same through SQL: graft_table TVF + registered kernel + top-k
    val sqlGot = spark.sql(
      s"""SELECT vec_id FROM graft_table('$path')
          ORDER BY cosine_similarity(embedding,
            (SELECT embedding FROM graft_table('$path') WHERE vec_id = 0)) DESC,
            vec_id LIMIT 2""").collect().map(_.getLong(0))
    sqlGot.toSeq shouldBe Seq(0L, 5L)

    // time travel: the pre-upsert snapshot has no duplicate of vec 0
    val old = graft.operators.VectorSearch.topK(
        graft.sources.GraftTable.read(spark, path, 0), "embedding", "vec_id", q, 2, "cosine")
      .select("vec_id", "score").collect()
    old(0).getLong(0) shouldBe 0L
    old(1).getDouble(1) should be < 0.9999
  }

  test("graft_vector_search TVF round-trips the reference's one-call shape") {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, sf0001).createOrReplaceTempView("embeddings_v")
    // the reference's cell-11 call, verbatim shape: table function over a
    // path, query vector as a scalar subquery, k, metric
    val sql = spark.sql(
      s"""SELECT vec_id, score FROM graft_vector_search(
            '$sf0001/embeddings.parquet', 'embedding',
            (SELECT embedding FROM embeddings_v WHERE vec_id = 0), 10, 'cosine')
          ORDER BY score DESC, vec_id""")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))

    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf0001)
    val q = emb.filter(col("vec_id") === 0L).select("embedding").head().getSeq[Float](0)
    val want = graft.operators.VectorSearch.topK(emb, "embedding", "vec_id", q, 10, "cosine")
      .select("vec_id", "score").collect().map(r => (r.getLong(0), r.getDouble(1)))
    sql shouldBe want
  }

  test("graft_vector_search breaks score ties deterministically (duplicate vectors)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // five IDENTICAL vectors: every row ties on score, so the k=2 SET is
    // defined only by the tie-break — must be the two smallest vec_ids
    val path = java.nio.file.Files.createTempDirectory("tvf_ties").toString + "/t"
    (1L to 5L).map(i => (i, Seq(1f, 2f, 3f))).toDF("vec_id", "embedding")
      .write.parquet(path)
    val got = spark.sql(
      s"""SELECT vec_id FROM graft_vector_search(
            '$path', 'embedding', array(1.0F, 2.0F, 3.0F), 2, 'cosine')""")
      .collect().map(_.getLong(0)).toSet
    got shouldBe Set(1L, 2L)
  }

  test("graft_vector_search supports l2 and defaults metric to cosine") {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, sf0001).createOrReplaceTempView("embeddings_v")
    val l2 = spark.sql(
      s"""SELECT vec_id FROM graft_vector_search(
            '$sf0001/embeddings.parquet', 'embedding',
            (SELECT embedding FROM embeddings_v WHERE vec_id = 0), 1, 'l2')""")
      .head().getLong(0)
    l2 shouldBe 0L // self-match at distance 0
    val defaulted = spark.sql(
      s"""SELECT count(*) AS n FROM graft_vector_search(
            '$sf0001/embeddings.parquet', 'embedding',
            (SELECT embedding FROM embeddings_v WHERE vec_id = 0), 5)""")
      .head().getLong(0)
    defaulted shouldBe 5L
  }

  test("graft_table TVF reads snapshots and time-travels in SQL") {
    import spark.implicits._
    import graft.sources.GraftTable
    GraftFunctions.register(spark)
    val path = java.nio.file.Files.createTempDirectory("graft_tvf").toString + "/t"
    GraftTable.create(Seq((1L, 1)).toDF("k", "x"), path, Seq("k"), nbuckets = 2)
    GraftTable.upsert(spark, path, Seq((1L, 2)).toDF("k", "x"))
    spark.sql(s"SELECT x FROM graft_table('$path')").head().getInt(0) shouldBe 2
    spark.sql(s"SELECT x FROM graft_table('$path', 0)").head().getInt(0) shouldBe 1
  }

  test("graft_table_changes TVF exposes the CDC feed (incl. deletes) in SQL") {
    import spark.implicits._
    import graft.sources.GraftTable
    GraftFunctions.register(spark)
    val path = java.nio.file.Files.createTempDirectory("graft_tvfc").toString + "/t"
    GraftTable.create(Seq((1L, 1), (2L, 2)).toDF("k", "x"), path, Seq("k"), nbuckets = 2)
    GraftTable.upsert(spark, path, Seq((2L, 22), (3L, 3)).toDF("k", "x"))
    GraftTable.delete(spark, path, Seq(Tuple1(1L)).toDF("k"))
    val got = spark.sql(
      s"SELECT k, x, _deleted FROM graft_table_changes('$path', 0, 2) ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSeq
    got shouldBe Seq((1L, 1, true), (2L, 22, false), (3L, 3, false))
  }

  test("graft_index_search TVF serves from the table-attached index, stale-checked in SQL") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftFunctions.register(spark)
    val path = java.nio.file.Files.createTempDirectory("graft_idx_sql").toString + "/t"
    def vec(k: Long): Seq[Float] =
      (0 until 8).map(i => (((k * 31 + i * 17) % 97).toFloat - 48f) / 48f)
    val df = (0L until 200L).map(k => (k, vec(k))).toDF("k", "v")
    graft.sources.GraftTable.create(df, path, Seq("k"), nbuckets = 2)
    graft.sources.GraftIndex.create(spark, path, "v", nlist = 4)
    val q = vec(42L)
    val sqlArr = s"array(${q.mkString(", ")})"
    // exhaustive default (nprobe omitted → nlist) == exact top-k
    val got = spark.sql(
      s"SELECT k FROM graft_index_search('$path', $sqlArr, 7) ORDER BY score DESC, k")
      .collect().map(_.getLong(0)).toSeq
    got shouldBe graft.operators.VectorSearch.topK(
      graft.sources.GraftTable.read(spark, path), "v", "k", q, 7, "cosine")
      .select("k").collect().map(_.getLong(0)).toSeq
    // the table moves on → the SQL call fails as loudly as the Scala API
    graft.sources.GraftTable.upsert(spark, path, Seq((0L, vec(777L))).toDF("k", "v"))
    val ex = intercept[IllegalStateException] {
      spark.sql(s"SELECT k FROM graft_index_search('$path', $sqlArr, 7)")
    }
    ex.getMessage should include("STALE")
    graft.sources.GraftIndex.refresh(spark, path)
    spark.sql(s"SELECT k FROM graft_index_search('$path', $sqlArr, 7)").count() shouldBe 7
  }

  test("graft_index_search predSql arg: filtered search keeps k full and equals filtered brute force") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftFunctions.register(spark)
    val path = java.nio.file.Files.createTempDirectory("graft_idx_pred").toString + "/t"
    def vec(k: Long): Seq[Float] =
      (0 until 8).map(i => (((k * 31 + i * 17) % 97).toFloat - 48f) / 48f)
    val df = (0L until 200L).map(k => (k, vec(k))).toDF("k", "v")
    graft.sources.GraftTable.create(df, path, Seq("k"), nbuckets = 2)
    graft.sources.GraftIndex.create(spark, path, "v", nlist = 4)
    val q = vec(42L)
    val sqlArr = s"array(${q.mkString(", ")})"
    val got = spark.sql(
      s"SELECT k FROM graft_index_search('$path', $sqlArr, 7, 4, 'vec', 'k % 2 = 0') " +
        "ORDER BY score DESC, k")
      .collect().map(_.getLong(0)).toSeq
    got should have length 7 // k stays full under the filter
    got shouldBe graft.operators.VectorSearch.topK(
      graft.sources.GraftTable.read(spark, path).filter(col("k") % 2 === 0),
      "v", "k", q, 7, "cosine")
      .select("k").collect().map(_.getLong(0)).toSeq
    // an unresolvable pred column fails loudly at analysis
    intercept[Exception] {
      spark.sql(s"SELECT k FROM graft_index_search('$path', $sqlArr, 7, 4, 'vec', 'no_col = 1')")
    }
  }

  test("graft_hnsw_probe TVF: table-attached HNSW in SQL, plain + filtered, stale-checked") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftFunctions.register(spark)
    val path = java.nio.file.Files.createTempDirectory("graft_hnsw_sql").toString + "/t"
    def vec(k: Long): Seq[Float] =
      (0 until 8).map(i => math.sin(k * 37.0 + i * 11.0).toFloat)
    val df = (0L until 150L).map(k => (k, vec(k), s"doc$k")).toDF("k", "v", "s")
    graft.sources.GraftTable.create(df, path, Seq("k"), nbuckets = 2)
    graft.sources.GraftHnsw.create(spark, path, "v", nSegments = 2, m = 8,
      efConstruction = 64)
    val q = vec(13L)
    val sqlArr = s"array(${q.mkString(", ")})"
    // wide beam == exact (the HnswSpec empirical-pin convention)
    val got = spark.sql(
      s"SELECT k, s FROM graft_hnsw_probe('$path', $sqlArr, 5, 512) ORDER BY score DESC, k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    got shouldBe graft.operators.VectorSearch.topK(
      graft.sources.GraftTable.read(spark, path), "v", "k", q, 5, "cosine")
      .select("k", "s").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // filtered: selective pred → brute path, exact by construction
    val filt = spark.sql(
      s"SELECT k FROM graft_hnsw_probe('$path', $sqlArr, 5, 512, 'hnsw', 'k % 10 = 3') " +
        "ORDER BY score DESC, k")
      .collect().map(_.getLong(0)).toSeq
    filt shouldBe graft.operators.VectorSearch.topK(
      graft.sources.GraftTable.read(spark, path).filter(col("k") % 10 === 3),
      "v", "k", q, 5, "cosine")
      .select("k").collect().map(_.getLong(0)).toSeq
    // stale-loud in SQL like the Scala API
    graft.sources.GraftTable.upsert(spark, path, Seq((0L, vec(999L), "x")).toDF("k", "v", "s"))
    intercept[IllegalStateException] {
      spark.sql(s"SELECT k FROM graft_hnsw_probe('$path', $sqlArr, 5)")
    }.getMessage should include("STALE")
  }

  test("graft_hnsw_knn_join TVF: batched join through the table-attached HNSW, plain + filtered") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftFunctions.register(spark)
    val path = java.nio.file.Files.createTempDirectory("graft_hnswkj_sql").toString + "/t"
    def vec(k: Long): Seq[Float] =
      (0 until 8).map(i => math.sin(k * 37.0 + i * 11.0).toFloat)
    val df = (0L until 120L).map(k => (k, vec(k), s"doc$k")).toDF("k", "v", "s")
    graft.sources.GraftTable.create(df, path, Seq("k"), nbuckets = 2)
    graft.sources.GraftHnsw.create(spark, path, "v", nSegments = 2, m = 8,
      efConstruction = 64)
    Seq((1000L, vec(7L)), (1001L, vec(42L))).toDF("k", "v")
      .createOrReplaceTempView("hnsw_kj_probes")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.orderBy("qid", "k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val sql = rows(spark.sql(
      s"SELECT qid, k FROM graft_hnsw_knn_join('$path', 'hnsw_kj_probes', 3, 512)"))
    val scala = rows(graft.sources.GraftHnsw.knnJoin(spark, path,
      Seq((1000L, vec(7L)), (1001L, vec(42L))), k = 3, ef = 512))
    sql shouldBe scala
    // filtered: only even keys may return; equality vs the Scala pred path
    val sqlF = rows(spark.sql(
      s"SELECT qid, k FROM graft_hnsw_knn_join('$path', 'hnsw_kj_probes', 3, 512, " +
        "'hnsw', 'k % 2 = 0')"))
    sqlF.foreach { case (_, k) => (k % 2) shouldBe 0L }
    sqlF shouldBe rows(graft.sources.GraftHnsw.knnJoin(spark, path,
      Seq((1000L, vec(7L)), (1001L, vec(42L))), k = 3, ef = 512,
      pred = Some(col("k") % 2 === 0)))
  }

  test("graft_knn_join TVF: predSql filters the batched IVF join, plain + filtered") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftFunctions.register(spark)
    val path = java.nio.file.Files.createTempDirectory("graft_kj_pred").toString + "/t"
    def vec(k: Long): Seq[Float] =
      (0 until 8).map(i => math.sin(k * 37.0 + i * 11.0).toFloat)
    val df = (0L until 120L).map(k => (k, vec(k), s"doc$k")).toDF("k", "v", "s")
    graft.sources.GraftTable.create(df, path, Seq("k"), nbuckets = 2)
    graft.sources.GraftIndex.create(spark, path, "v", nlist = 4)
    Seq((1000L, vec(7L)), (1001L, vec(42L))).toDF("k", "v")
      .createOrReplaceTempView("ivf_kj_probes")
    def rows(d: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      d.orderBy("qid", "k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val sql = rows(spark.sql(
      s"SELECT qid, k FROM graft_knn_join('$path', 'ivf_kj_probes', 3, 4)"))
    sql shouldBe rows(graft.sources.GraftIndex.knnJoin(spark, path,
      Seq((1000L, vec(7L)), (1001L, vec(42L))), k = 3, nprobe = 4))
    // filtered (selective → the exact brute leg): equality vs the Scala
    // pred path AND vs per-query filtered brute force
    val sqlF = rows(spark.sql(
      s"SELECT qid, k FROM graft_knn_join('$path', 'ivf_kj_probes', 3, 4, " +
        "'vec', 'k % 2 = 0')"))
    sqlF.foreach { case (_, k) => (k % 2) shouldBe 0L }
    sqlF shouldBe rows(graft.sources.GraftIndex.knnJoin(spark, path,
      Seq((1000L, vec(7L)), (1001L, vec(42L))), k = 3, nprobe = 4,
      pred = Some(col("k") % 2 === 0)))
    val even = graft.sources.GraftTable.read(spark, path).filter(col("k") % 2 === 0)
    val want = Seq(1000L -> vec(7L), 1001L -> vec(42L)).flatMap { case (qid, q) =>
      graft.operators.VectorSearch.topK(even, "v", "k", q, 3, "cosine")
        .select("k").collect().map(r => (qid, r.getLong(0)))
    }.sorted
    sqlF shouldBe want
  }

  test("graft_text_search TVF serves BM25 from the table-attached text index, stale-checked") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftFunctions.register(spark)
    val path = java.nio.file.Files.createTempDirectory("graft_txt_sql").toString + "/t"
    val words = Vector("spark", "scan", "table", "merge", "query")
    def text(k: Long): String =
      (0 until 4).map(i => words(((k * 7 + i * 3) % 5).toInt)).mkString(" ")
    val df = (0L until 150L).map(k => (k, text(k))).toDF("doc_id", "text")
    graft.sources.GraftTable.create(df, path, Seq("doc_id"), nbuckets = 2)
    graft.sources.TextIndex.create(spark, path, "text")
    val got = spark.sql(
      s"SELECT doc_id FROM graft_text_search('$path', 'spark table', 6)")
      .collect().map(_.getLong(0)).toSeq
    got shouldBe graft.sources.TextIndex.search(spark, path, "spark table", 6)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    got should have size 6
    // conjunctive mode flows through
    spark.sql(s"SELECT doc_id FROM graft_text_search('$path', 'spark table', 200, 'all')")
      .count() should be > 0L
    // the table moves on → the SQL call fails as loudly as the Scala API
    graft.sources.GraftTable.upsert(spark, path, Seq((0L, "query query")).toDF("doc_id", "text"))
    intercept[IllegalStateException] {
      spark.sql(s"SELECT doc_id FROM graft_text_search('$path', 'spark', 5)")
    }.getMessage should include("STALE")
    graft.sources.TextIndex.refresh(spark, path)
    spark.sql(s"SELECT doc_id FROM graft_text_search('$path', 'spark', 5)").count() shouldBe 5
    // phrase mode: consecutive-token semantics through SQL, and the
    // n_occurrences shape instead of score
    val ph = spark.sql(
      s"SELECT * FROM graft_text_search('$path', 'table spark', 200, 'phrase')")
    ph.columns.toSeq shouldBe Seq("doc_id", "n_occurrences")
    ph.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe
      graft.sources.TextIndex.searchPhrase(spark, path, "table spark", 200)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    ph.count() should be > 0L
  }

  test("graft_text_search fuzzy mode: maxDist/q knobs reach SQL; a two-edit typo serves") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val path = java.nio.file.Files.createTempDirectory("graft_fz_sql").toString + "/t"
    val words = Vector("sparkle", "scanner", "tablets", "merge", "query")
    def text(k: Long): String =
      (0 until 4).map(i => words(((k * 7 + i * 3) % 5).toInt)).mkString(" ")
    val df = (0L until 120L).map(k => (k, text(k))).toDF("doc_id", "text")
    graft.sources.GraftTable.create(df, path, Seq("doc_id"), nbuckets = 2)
    graft.sources.TextIndex.create(spark, path, "text")
    // 'spackles' is 2 edits from the indexed 'sparkle' (r→c + trailing
    // s) — unreachable at the r12-hardwired maxDist = 1, served at
    // maxDist = 2 through the positional knob (predSql NULL = no filter)
    spark.sql(s"""SELECT doc_id FROM
        graft_text_search('$path', 'spackles', 5, 'fuzzy')""").count() shouldBe 0L
    val got = spark.sql(s"""SELECT doc_id, score FROM
        graft_text_search('$path', 'spackles', 5, 'fuzzy', 'txt', NULL, 2)""")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    got should have size 5
    // TVF == Scala at the same knobs (q passed explicitly too)
    got shouldBe graft.sources.TextIndex.searchFuzzy(spark, path, "spackles", 5,
        maxDist = 2, q = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // the knobs compose with predSql's filter semantics
    val flt = spark.sql(s"""SELECT doc_id FROM
        graft_text_search('$path', 'spackles', 5, 'fuzzy', 'txt', 'doc_id % 2 = 0', 2)""")
      .collect().map(_.getLong(0)).toSeq
    flt.foreach(_ % 2 shouldBe 0L)
    flt shouldBe graft.sources.TextIndex.searchFuzzy(spark, path, "spackles", 5,
        maxDist = 2, pred = Some(org.apache.spark.sql.functions.col("doc_id") % 2 === 0))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    // knobs with a non-fuzzy mode refuse loudly, never silently ignore
    intercept[Exception] {
      spark.sql(s"""SELECT doc_id FROM
          graft_text_search('$path', 'sparkle', 5, 'any', 'txt', NULL, 2)""").collect()
    }.getMessage should include("fuzzy")
  }

  test("graft_hybrid_search TVF fuses both table-attached indexes, stale-checked on each leg") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftFunctions.register(spark)
    val path = java.nio.file.Files.createTempDirectory("graft_hyb_sql").toString + "/t"
    val words = Vector("spark", "scan", "table", "merge", "query")
    def text(k: Long): String =
      (0 until 5).map(i => words(((k * 7 + i * 3) % 5).toInt)).mkString(" ")
    def vec(k: Long): Seq[Float] =
      (0 until 8).map(i => (((k * 31 + i * 17) % 97).toFloat - 48f) / 48f)
    val df = (0L until 200L).map(k => (k, text(k), vec(k))).toDF("doc_id", "text", "embedding")
    graft.sources.GraftTable.create(df, path, Seq("doc_id"), nbuckets = 2)
    graft.sources.GraftIndex.create(spark, path, "embedding", nlist = 4)
    graft.sources.TextIndex.create(spark, path, "text")
    val q = vec(42L)
    val sqlArr = s"array(${q.mkString(", ")})"
    val got = spark.sql(
      s"SELECT * FROM graft_hybrid_search('$path', $sqlArr, 'spark table', 10, 30)")
    got.columns.toSeq shouldBe Seq("doc_id", "rrf_score")
    // equals the Scala composition it packages
    val vecLeg = graft.operators.Fusion.rankByTopN(
      graft.sources.GraftIndex.probe(spark, path, q, 30, nprobe = 4)
        .select(col("doc_id"), col("score").as("sc")), "doc_id", col("sc"), 30)
    val txtLeg = graft.operators.Fusion.rankByTopN(
      graft.sources.TextIndex.scoredTerms(spark, path, "spark table", idf = "rational")
        .groupBy("doc_id")
        .agg(sum(floor(col("contrib") * lit(1000000.0)).cast("long")).as("sq")),
      "doc_id", col("sq"), 30)
    val want = graft.operators.Fusion.rrf(Seq(txtLeg, vecLeg), "doc_id", "rank")
      .orderBy(col("rrf_score").desc, col("doc_id")).limit(10)
    got.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq shouldBe
      want.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // either index going stale fails the ONE call loudly
    graft.sources.GraftTable.upsert(spark, path,
      Seq((0L, "query merge query merge spark", vec(999L))).toDF("doc_id", "text", "embedding"))
    intercept[IllegalStateException] {
      spark.sql(s"SELECT * FROM graft_hybrid_search('$path', $sqlArr, 'spark', 5)")
    }.getMessage should include("STALE")
    graft.sources.GraftIndex.refresh(spark, path)
    intercept[IllegalStateException] {
      spark.sql(s"SELECT * FROM graft_hybrid_search('$path', $sqlArr, 'spark', 5)")
    }.getMessage should include("STALE")
    graft.sources.TextIndex.refresh(spark, path)
    spark.sql(s"SELECT * FROM graft_hybrid_search('$path', $sqlArr, 'spark', 5)")
      .count() shouldBe 5
  }

  test("graft_rerank_search TVF: fusion candidates pair-scored by the stub cross-encoder == the Scala composition") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftFunctions.register(spark)
    val path = java.nio.file.Files.createTempDirectory("graft_rrk_sql").toString + "/t"
    val words = Vector("spark", "scan", "table", "merge", "query")
    def text(k: Long): String =
      (0 until 5).map(i => words(((k * 7 + i * 3) % 5).toInt)).mkString(" ")
    def vec(k: Long): Seq[Float] =
      (0 until 8).map(i => (((k * 31 + i * 17) % 97).toFloat - 48f) / 48f)
    val df = (0L until 200L).map(k => (k, text(k), vec(k))).toDF("doc_id", "text", "embedding")
    graft.sources.GraftTable.create(df, path, Seq("doc_id"), nbuckets = 2)
    graft.sources.GraftIndex.create(spark, path, "embedding", nlist = 4)
    graft.sources.TextIndex.create(spark, path, "text")
    val q = vec(42L)
    val got = spark.sql(
      s"""SELECT * FROM graft_rerank_search('$path', array(${q.mkString(", ")}),
                                            'spark table', 8, 30)""")
    got.columns.toSeq shouldBe Seq("doc_id", "ce_score", "rrf_q")
    // equals the Scala composition it packages: fusion → quantized
    // top-30 cut → Rerank stub → (ce desc, rrf_q desc, key asc) top-8
    val vecLeg = graft.operators.Fusion.rankByTopN(
      graft.sources.GraftIndex.probe(spark, path, q, 30, nprobe = 4)
        .select(col("doc_id"), col("score").as("sc")), "doc_id", col("sc"), 30)
    val txtLeg = graft.operators.Fusion.rankByTopN(
      graft.sources.TextIndex.scoredTerms(spark, path, "spark table", idf = "rational")
        .groupBy("doc_id")
        .agg(sum(floor(col("contrib") * lit(1000000.0)).cast("long")).as("sq")),
      "doc_id", col("sq"), 30)
    val cand = graft.operators.Fusion.rrf(Seq(txtLeg, vecLeg), "doc_id", "rank")
      .select(col("doc_id"), floor(col("rrf_score") * lit(10000.0)).cast("long").as("rrf_q"))
      .orderBy(col("rrf_q").desc, col("doc_id")).limit(30)
      .join(graft.sources.GraftTable.read(spark, path).select("doc_id", "text"), "doc_id")
    val want = graft.operators.Rerank.rerank(cand, "spark table", "text")
      .select(col("doc_id"), col("ce_score"), col("rrf_q"))
      .orderBy(col("ce_score").desc, col("rrf_q").desc, col("doc_id")).limit(8)
    got.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq shouldBe
      want.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    // the stub scorer is the deterministic token-overlap: spot-check one
    val top = got.head()
    val topText = graft.sources.GraftTable.read(spark, path)
      .filter(col("doc_id") === top.getLong(0)).select("text").head().getString(0)
    val overlap = Set("spark", "table")
      .count(topText.toLowerCase.split(" ").filter(_.nonEmpty).toSet.contains)
    top.getDouble(1) shouldBe overlap.toDouble
    // stale on either leg fails the ONE call loudly (plan-time check)
    graft.sources.GraftTable.upsert(spark, path,
      Seq((0L, "query merge", vec(999L))).toDF("doc_id", "text", "embedding"))
    intercept[IllegalStateException] {
      spark.sql(s"""SELECT * FROM graft_rerank_search('$path',
        array(${q.mkString(", ")}), 'spark', 5)""")
    }.getMessage should include("STALE")
  }

  test("graft_fuzzy_match TVF equals the Scala operator and refuses short probes") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val corpus = Seq((1L, "hello world"), (2L, "hello worlds"), (3L, "goodbye"))
      .toDF("id", "s")
    corpus.createOrReplaceTempView("fuzzy_corpus")
    val got = spark.sql(
      "SELECT id, dist FROM graft_fuzzy_match('fuzzy_corpus', 's', 'id', 'hello world', 1)")
      .as[(Long, Long)].collect().sortBy(_._1)
    got.toSeq shouldBe Seq((1L, 0L), (2L, 1L))
    // same exactness refusal as the Scala API
    intercept[Exception] {
      spark.sql(
        "SELECT * FROM graft_fuzzy_match('fuzzy_corpus', 's', 'id', 'hi', 2)")
        .collect()
    }.getMessage should include("too few distinct")
  }

  test("graft_fuzzy_names TVF equals the Scala big-big join") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq("velvet", "velvit", "walnut", "velvet")
      .zipWithIndex.map(_.swap).toDF("id", "a").createOrReplaceTempView("fn_a")
    Seq("velvet", "walnuts", "quartz")
      .zipWithIndex.map(_.swap).toDF("id", "b").createOrReplaceTempView("fn_b")
    val got = spark.sql(
      "SELECT name_a, name_b, dist, n_pairs FROM " +
        "graft_fuzzy_names('fn_a', 'a', 'fn_b', 'b', 1)")
      .as[(String, String, Long, Long)].collect().toSet
    got shouldBe Set(
      ("velvet", "velvet", 0L, 2L),  // 2 copies on side A
      ("velvit", "velvet", 1L, 1L),
      ("walnut", "walnuts", 1L, 1L))
  }

  test("all four kernels resolve by name in SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)),
               dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)),
               l2_distance(array(0.0F, 0.0F), array(3.0F, 4.0F)),
               vector_norm(array(3.0D, 4.0D))""").head()
    r.getDouble(0) shouldBe 1.0 +- 1e-15
    r.getDouble(1) shouldBe 11.0 +- 1e-15
    r.getDouble(2) shouldBe 5.0 +- 1e-15
    r.getDouble(3) shouldBe 5.0 +- 1e-15
  }
}
