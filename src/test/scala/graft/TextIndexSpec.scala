package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.sources.{GraftTable, TextIndex}
import java.nio.file.Files

/** The table-attached BM25 inverted index: built FROM a GraftTable
  * snapshot, version-pinned, refreshed through the change feed as
  * immutable segments with tombstones, exact corpus statistics, and a
  * brute-force-equal scoring contract.
  */
class TextIndexSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  /** small deterministic corpus over a closed vocabulary */
  private val vocab = Vector("spark", "scan", "table", "index", "merge", "query",
    "filter", "join", "window", "stream")
  private def docText(k: Long): String =
    (0 until (3 + (k % 7).toInt)).map(i => vocab(((k * 13 + i * 5) % 10).toInt)).mkString(" ")

  private def freshTable(n: Int): String = {
    val path = Files.createTempDirectory("graft_tidx").toString + "/t"
    val df = (0L until n.toLong).map(k => (k, docText(k), s"src-${k % 3}")).toDF("doc_id", "text", "src")
    GraftTable.create(df, path, Seq("doc_id"), nbuckets = 4)
    path
  }

  /** independent brute-force BM25 over the table head — same tokenizer,
    * same formula, computed doc-at-a-time on the driver
    */
  private def bruteForce(path: String, query: String, k: Int,
                         mode: String = "any"): Seq[(Long, Double)] = {
    val docs = GraftTable.read(spark, path).filter(col("text").isNotNull)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val toks = docs.map { case (id, t) => (id, TextIndex.tokenize(t)) }
    val n = toks.length.toLong
    val sumDl = toks.map(_._2.length.toLong).sum
    val q = TextIndex.tokenize(query).distinct
    val dfOf = q.map(t => t -> toks.count(_._2.contains(t)).toLong).toMap
    val scored = toks.flatMap { case (id, ts) =>
      val dl = ts.length
      val matched = q.filter(ts.contains)
      if (matched.isEmpty || (mode == "all" && matched.size != q.size)) None
      else Some((id, matched.map { t =>
        val tf = ts.count(_ == t).toLong
        val df = dfOf(t)
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl * n / sumDl.toDouble)))
      }.sum))
    }
    scored.sortBy { case (id, s) => (-s, id) }.take(k).toSeq
  }

  private def got(path: String, query: String, k: Int, mode: String = "any",
                  allowStale: Boolean = false): Seq[(Long, Double)] =
    TextIndex.search(spark, path, query, k, mode = mode, allowStale = allowStale)
      .collect().map(r => (r.getLong(0), r.getDouble(r.fieldIndex("score")))).toSeq

  test("create -> search equals driver brute-force BM25 exactly") {
    val path = freshTable(300)
    TextIndex.create(spark, path, "text")
    TextIndex.meta(path).indexedVersion shouldBe 0
    got(path, "spark table", 10) shouldBe bruteForce(path, "spark table", 10)
    // schema contract: keys, then score
    TextIndex.search(spark, path, "spark", 3).columns.toSeq shouldBe Seq("doc_id", "score")
  }

  test("refresh folds upserts + deletes in as one segment; scoring tracks the NEW corpus") {
    val path = freshTable(200)
    TextIndex.create(spark, path, "text")
    // 15 docs get entirely new text, 5 new docs appear, 20 vanish
    val ups = ((0L until 15L).map(k => (k, "spark spark index", s"src-0")) ++
      (900L until 905L).map(k => (k, "window stream window", s"src-1"))).toDF("doc_id", "text", "src")
    GraftTable.upsert(spark, path, ups)
    GraftTable.delete(spark, path, (50L until 70L).toDF("doc_id"))
    TextIndex.refresh(spark, path) shouldBe Some((0, 2))
    TextIndex.meta(path).indexedVersion shouldBe 2
    TextIndex.meta(path).segments should have size 2
    for (q <- Seq("spark index", "window stream", "merge query filter"))
      got(path, q, 12) shouldBe bruteForce(path, q, 12)
    // deleted docs can never surface
    got(path, "spark scan table index merge query filter join window stream", 200)
      .map(_._1).toSet.intersect((50L until 70L).toSet) shouldBe empty
    // a second refresh is a no-op
    TextIndex.refresh(spark, path) shouldBe None
  }

  test("MOR deletes (deletion vectors) tombstone through refresh; stats track the live corpus") {
    val path = freshTable(200)
    TextIndex.create(spark, path, "text")
    // scattered DV delete, zero bucket rewrite; one victim re-inserted
    GraftTable.deleteMor(spark, path, (0L until 200L by 5).toDF("doc_id"))
    GraftTable.upsert(spark, path,
      Seq((10L, "spark stream spark", "src-0")).toDF("doc_id", "text", "src"))
    TextIndex.refresh(spark, path) shouldBe Some((0, 2))
    for (q <- Seq("spark table", "stream window", "merge query"))
      got(path, q, 15) shouldBe bruteForce(path, q, 15)
    val all = got(path, vocab.mkString(" "), 300).map(_._1).toSet
    all.filter(k => k % 5 == 0 && k != 10L) shouldBe empty
    all should contain (10L)
    // exact stats over the DV-filtered corpus
    val live = GraftTable.read(spark, path).filter(col("text").isNotNull)
    TextIndex.meta(path).nDocs shouldBe live.count()
  }

  test("MOR upserts (delta commits) tombstone-and-replace through refresh") {
    val path = freshTable(150)
    TextIndex.create(spark, path, "text")
    // log-only text replacements + brand-new docs, then a DV over one
    GraftTable.upsertMor(spark, path,
      ((0L until 10L).map(k => (k, "spark spark merge", "src-0")) ++
        (700L until 705L).map(k => (k, "stream window stream", "src-1")))
        .toDF("doc_id", "text", "src"))
    GraftTable.deleteMor(spark, path, Seq(3L, 700L).toDF("doc_id"))
    TextIndex.refresh(spark, path) shouldBe Some((0, 2))
    for (q <- Seq("spark merge", "stream window", "table index"))
      got(path, q, 15) shouldBe bruteForce(path, q, 15)
    val all = got(path, vocab.mkString(" "), 300).map(_._1).toSet
    all should contain allOf (701L, 704L)
    all should contain noneOf (3L, 700L)
    TextIndex.meta(path).nDocs shouldBe
      GraftTable.read(spark, path).filter(col("text").isNotNull).count()
  }

  test("corpus stats stay EXACT through mutations (unlike Lucene's deleted-doc drift)") {
    val path = freshTable(150)
    TextIndex.create(spark, path, "text")
    GraftTable.upsert(spark, path,
      (0L until 10L).map(k => (k, "join join join", "src-2")).toDF("doc_id", "text", "src"))
    GraftTable.delete(spark, path, (100L until 130L).toDF("doc_id"))
    TextIndex.refresh(spark, path)
    val m = TextIndex.meta(path)
    val headDocs = GraftTable.read(spark, path).filter(col("text").isNotNull)
    val expectDl = headDocs.select(
        org.apache.spark.sql.functions.size(TextIndex.tokensCol("text")).as("dl"))
      .agg(sum("dl")).head().getLong(0)
    m.nDocs shouldBe headDocs.count()
    m.sumDl shouldBe expectDl
  }

  test("fuzzyTerms enumerates the LIVE vocabulary exactly; searchFuzzy == expanded search") {
    val path = freshTable(120)
    TextIndex.create(spark, path, "text")
    // 'tble' is distance 1 from 'table' (insertion) and nothing else
    // in the closed vocabulary
    TextIndex.fuzzyTerms(spark, path, "tble", maxDist = 1) shouldBe Seq("table")
    // distance 2 pulls nothing new from this vocabulary (no other word
    // is within 2 of 'tble'); q=2 needs |grams|=3 > q*d=4 → refuse at d=2
    intercept[IllegalArgumentException] {
      TextIndex.fuzzyTerms(spark, path, "tble", maxDist = 2)
    }.getMessage should include("too few distinct")
    // scoring equals the plain search over the expanded terms
    val fuzzy = TextIndex.searchFuzzy(spark, path, "tble", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val plain = TextIndex.search(spark, path, "table", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    fuzzy shouldBe plain
    // LIVE enumeration: delete every doc containing 'table' → the term
    // leaves the dictionary and the expansion comes back empty
    val holders = GraftTable.read(spark, path)
      .filter(col("text").contains("table")).select("doc_id")
    GraftTable.delete(spark, path, holders)
    TextIndex.refresh(spark, path)
    TextIndex.fuzzyTerms(spark, path, "tble", maxDist = 1) shouldBe Seq.empty
    TextIndex.searchFuzzy(spark, path, "tble", k = 10).count() shouldBe 0L
  }

  test("MULTI-term fuzzy: per-term expansions union over one dictionary scan; scoring == plain search on the union") {
    val path = freshTable(120)
    TextIndex.create(spark, path, "text")
    // two independent typos: 'tble' -> table, 'qery' -> query — the
    // union equals the per-term expansions concatenated
    TextIndex.fuzzyTermsMulti(spark, path, "tble qery", maxDist = 1) shouldBe
      Seq("query", "table")
    // a mixed exact + typo query keeps the exact term (distance 0)
    TextIndex.fuzzyTermsMulti(spark, path, "spark tble", maxDist = 1) shouldBe
      Seq("spark", "table")
    // repeated terms dedupe before the scan
    TextIndex.fuzzyTermsMulti(spark, path, "tble tble", maxDist = 1) shouldBe
      Seq("table")
    // multi-term scoring == the plain disjunctive search over the union
    val fuzzy = TextIndex.searchFuzzy(spark, path, "tble qery", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    fuzzy shouldBe got(path, "table query", 10)
    // the single-term contract is unchanged (loud on multi via fuzzyTerms)
    intercept[IllegalArgumentException] {
      TextIndex.fuzzyTerms(spark, path, "tble qery", maxDist = 1)
    }.getMessage should include("ONE term")
    // one too-short term anywhere refuses loudly, naming it
    intercept[IllegalArgumentException] {
      TextIndex.fuzzyTermsMulti(spark, path, "table abc", maxDist = 1)
    }.getMessage should include("'abc'")
    // the TVF serves the multi-term shape (mode fuzzy, default knobs)
    GraftFunctions.register(spark)
    val tvf = spark.sql(
        s"SELECT doc_id, score FROM graft_text_search('$path', 'tble qery', 10, 'fuzzy')")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    tvf shouldBe fuzzy
  }

  test("a search against a stale index fails LOUDLY; allowStale serves the pinned snapshot") {
    val path = freshTable(100)
    TextIndex.create(spark, path, "text")
    val before = got(path, "spark table", 5)
    GraftTable.upsert(spark, path, Seq((0L, "query query", "src-0")).toDF("doc_id", "text", "src"))
    intercept[IllegalStateException] {
      TextIndex.search(spark, path, "spark", 5)
    }.getMessage should include("STALE")
    got(path, "spark table", 5, allowStale = true) shouldBe before
    TextIndex.refresh(spark, path)
    got(path, "spark table", 5) shouldBe bruteForce(path, "spark table", 5)
  }

  test("conjunctive mode keeps only docs matching EVERY term") {
    val path = freshTable(250)
    TextIndex.create(spark, path, "text")
    val q = "spark window"
    got(path, q, 50, mode = "all") shouldBe bruteForce(path, q, 50, mode = "all")
    // every hit really contains both terms
    val hits = got(path, q, 50, mode = "all").map(_._1).toSet
    val texts = GraftTable.read(spark, path).filter(col("doc_id").isin(hits.toSeq: _*))
      .select("doc_id", "text").collect()
    texts.foreach { r =>
      val ts = TextIndex.tokenize(r.getString(1))
      ts should contain("spark"); ts should contain("window")
    }
  }

  test("compact folds segments into one; results unchanged; vacuum reclaims the rest") {
    val path = freshTable(120)
    TextIndex.create(spark, path, "text")
    GraftTable.upsert(spark, path,
      (0L until 8L).map(k => (k, "stream filter stream", "src-1")).toDF("doc_id", "text", "src"))
    TextIndex.refresh(spark, path)
    GraftTable.delete(spark, path, (10L until 25L).toDF("doc_id"))
    TextIndex.refresh(spark, path)
    val before = got(path, "stream filter merge", 15)
    TextIndex.meta(path).segments.size should be > 1
    TextIndex.compact(spark, path)
    TextIndex.meta(path).segments should have size 1
    got(path, "stream filter merge", 15) shouldBe before
    TextIndex.vacuum(path) should be > 0
    got(path, "stream filter merge", 15) shouldBe before
  }

  test("empty query, unknown terms, and an emptied table all serve the canonical shape") {
    val path = freshTable(60)
    TextIndex.create(spark, path, "text")
    TextIndex.search(spark, path, "", 5).count() shouldBe 0
    TextIndex.search(spark, path, "zzzznotaword", 5).count() shouldBe 0
    TextIndex.search(spark, path, "zzzznotaword", 5).columns.toSeq shouldBe Seq("doc_id", "score")
    GraftTable.delete(spark, path, (0L until 60L).toDF("doc_id"))
    TextIndex.refresh(spark, path) shouldBe Some((0, 1))
    val m = TextIndex.meta(path)
    m.nDocs shouldBe 0L
    m.sumDl shouldBe 0L
    TextIndex.search(spark, path, "spark", 5).count() shouldBe 0
    // and the corpus resurrects
    GraftTable.upsert(spark, path,
      Seq((7L, "spark spark", "src-0")).toDF("doc_id", "text", "src"))
    TextIndex.refresh(spark, path) shouldBe Some((1, 2))
    got(path, "spark", 1).map(_._1) shouldBe Seq(7L)
  }

  test("streamRefresh: the text index follows the table with no manual refresh calls") {
    val path = freshTable(100)
    TextIndex.create(spark, path, "text")
    val q = TextIndex.streamRefresh(spark, path,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
    try {
      GraftTable.upsert(spark, path,
        Seq((0L, "zzzfresh zzzfresh", "src-0")).toDF("doc_id", "text", "src"))
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (TextIndex.meta(path).indexedVersion < 1 && System.nanoTime() < deadline)
        Thread.sleep(100)
      TextIndex.meta(path).indexedVersion shouldBe 1
      // fresh by construction: the non-stale search sees the upsert
      got(path, "zzzfresh", 1).map(_._1) shouldBe Seq(0L)
    } finally q.stop()
  }

  test("streaming text end-to-end: writeStream(graft) -> streamRefresh -> BM25 + phrase equal brute force") {
    // the TextIndex twin of GraftIndexSpec's streaming ANN exhibit:
    // the lakehouse is CREATED and grown by a stream, the text index
    // attaches and follows under its own streaming ticker, and both
    // serving paths (BM25 and positional phrase) must equal driver
    // brute force over the live table once the ticker catches up
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val tmp = Files.createTempDirectory("graft_tidx_stream").toString
    val dst = s"$tmp/t"; val cp = s"$tmp/cp"
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, String)]
    def runBatch(rows: Seq[(Long, String, String)]): Unit = {
      in.addData(rows: _*)
      val q = in.toDF().toDF("doc_id", "text", "src")
        .writeStream.format("graft")
        .option("recordkey", "doc_id").option("nbuckets", "2")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start(dst)
      q.awaitTermination()
    }
    runBatch((0L until 60L).map(k => (k, docText(k), s"src-${k % 3}")))
    TextIndex.create(spark, dst, "text")
    val ticker = TextIndex.streamRefresh(spark, dst,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
    try {
      // more events stream in, including an UPDATE planting a phrase
      runBatch((60L until 90L).map(k => (k, docText(k), s"src-${k % 3}")))
      runBatch(Seq((0L, "query window query window query", "src-0")))
      val target = GraftTable.latestVersion(dst)
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (TextIndex.meta(dst).indexedVersion < target && System.nanoTime() < deadline)
        Thread.sleep(100)
      TextIndex.meta(dst).indexedVersion shouldBe target
      got(dst, "query window", 10) shouldBe bruteForce(dst, "query window", 10)
      gotPhrase(dst, "query window", 200) shouldBe brutePhrase(dst, "query window", 200)
      // the streamed update's phrase starts at positions 0 and 2
      gotPhrase(dst, "query window", 200).find(_._1 == 0L).map(_._2) shouldBe Some(2L)
    } finally ticker.stop()
  }

  /** driver brute force for phrase occurrence counting (overlaps allowed) */
  private def brutePhrase(path: String, phrase: String, k: Int): Seq[(Long, Long)] = {
    val q = TextIndex.tokenize(phrase)
    val docs = GraftTable.read(spark, path).filter(col("text").isNotNull)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), TextIndex.tokenize(r.getString(1))))
    docs.flatMap { case (id, ts) =>
      val n = (0 to ts.length - q.length).count(s => q.indices.forall(i => ts(s + i) == q(i)))
      if (n > 0) Some((id, n.toLong)) else None
    }.sortBy { case (id, n) => (-n, id) }.take(k).toSeq
  }

  private def gotPhrase(path: String, phrase: String, k: Int): Seq[(Long, Long)] =
    TextIndex.searchPhrase(spark, path, phrase, k)
      .collect().map(r => (r.getLong(0), r.getLong(r.fieldIndex("n_occurrences")))).toSeq

  test("phrase search equals driver brute force, with overlap and repeated-term phrases") {
    val path = freshTable(300)
    TextIndex.create(spark, path, "text")
    TextIndex.meta(path).pformat shouldBe 2
    for (p <- Seq("table spark", "scan table", "spark spark", "index merge query"))
      gotPhrase(path, p, 25) shouldBe brutePhrase(path, p, 25)
    // a phrase that can self-overlap: "spark spark" in "spark spark spark" = 2
    GraftTable.upsert(spark, path,
      Seq((7000L, "spark spark spark", "src-0")).toDF("doc_id", "text", "src"))
    TextIndex.refresh(spark, path)
    gotPhrase(path, "spark spark", 300).find(_._1 == 7000L).map(_._2) shouldBe Some(2L)
    gotPhrase(path, "spark spark", 300) shouldBe brutePhrase(path, "spark spark", 300)
    // single-token phrase degenerates to tf
    gotPhrase(path, "window", 20) shouldBe brutePhrase(path, "window", 20)
  }

  test("phrase results track refresh: tombstoned docs drop, new occurrences surface") {
    val path = freshTable(150)
    TextIndex.create(spark, path, "text")
    val before = gotPhrase(path, "scan table", 200).map(_._1).toSet
    val gone = before.take(3).toSeq
    if (gone.nonEmpty) GraftTable.delete(spark, path, gone.toDF("doc_id"))
    GraftTable.upsert(spark, path,
      Seq((8000L, "scan table scan table", "src-1")).toDF("doc_id", "text", "src"))
    TextIndex.refresh(spark, path)
    val after = gotPhrase(path, "scan table", 200)
    after shouldBe brutePhrase(path, "scan table", 200)
    after.map(_._1).toSet.intersect(gone.toSet) shouldBe empty
    after.find(_._1 == 8000L).map(_._2) shouldBe Some(2L)
    // stale-loud applies to phrase too
    GraftTable.upsert(spark, path, Seq((1L, "table", "src-0")).toDF("doc_id", "text", "src"))
    intercept[IllegalStateException] {
      TextIndex.searchPhrase(spark, path, "scan table", 5)
    }.getMessage should include("STALE")
  }

  test("refresh(maxSegments) folds segments back under the cap; results unchanged") {
    val path = freshTable(120)
    TextIndex.create(spark, path, "text")
    for (r <- 1 to 4) {
      GraftTable.upsert(spark, path,
        Seq((r * 1000L, s"spark merge spark r$r", "src-0")).toDF("doc_id", "text", "src"))
      TextIndex.refresh(spark, path, maxSegments = 2)
      TextIndex.meta(path).segments.size should be <= 2
    }
    got(path, "spark merge", 20) shouldBe bruteForce(path, "spark merge", 20)
    gotPhrase(path, "spark merge", 20) shouldBe brutePhrase(path, "spark merge", 20)
    // fresh after the fold, and stats stayed exact
    TextIndex.refresh(spark, path, maxSegments = 2) shouldBe None
    val m = TextIndex.meta(path)
    val headDocs = GraftTable.read(spark, path).filter(col("text").isNotNull)
    m.nDocs shouldBe headDocs.count()
  }

  test("null-text docs are not indexed and do not count in the statistics") {
    val path = Files.createTempDirectory("graft_tidx_null").toString + "/t"
    val df = Seq((1L, "spark table", "a"), (2L, null.asInstanceOf[String], "b"),
      (3L, "spark", "c")).toDF("doc_id", "text", "src")
    GraftTable.create(df, path, Seq("doc_id"), nbuckets = 2)
    TextIndex.create(spark, path, "text")
    val m = TextIndex.meta(path)
    m.nDocs shouldBe 2L
    m.sumDl shouldBe 3L
    got(path, "spark", 5).map(_._1) shouldBe bruteForce(path, "spark", 5).map(_._1)
    // a later upsert fills the text in → joins the corpus on refresh
    GraftTable.upsert(spark, path, Seq((2L, "table table table", "b")).toDF("doc_id", "text", "src"))
    TextIndex.refresh(spark, path)
    TextIndex.meta(path).nDocs shouldBe 3L
    got(path, "table", 1).map(_._1) shouldBe Seq(2L)
  }

  test("quantized _q mode refuses an explicit incompatible idf instead of overriding it") {
    val path = freshTable(20)
    TextIndex.create(spark, path, "text")
    // _q always scores with the rational idf: the "lucene" default is
    // tolerated as unset, "rational" is the truth — anything else would
    // have been silently ignored in r10 and now refuses loudly
    val e = intercept[IllegalArgumentException] {
      TextIndex.search(spark, path, "spark table", 5, mode = "any_q",
        idf = "bm25plus")
    }
    e.getMessage should include("rational idf")
    // the two compatible spellings produce the identical quantized board
    val viaDefault = TextIndex.search(spark, path, "spark table", 5, mode = "any_q")
      .collect().map(r => (r.getLong(0), r.getLong(r.fieldIndex("score_q")))).toSeq
    val viaExplicit = TextIndex.search(spark, path, "spark table", 5,
        mode = "any_q", idf = "rational")
      .collect().map(r => (r.getLong(0), r.getLong(r.fieldIndex("score_q")))).toSeq
    viaExplicit shouldBe viaDefault
  }

  test("rational idf ranks like a scan-side recompute (the oracle's arithmetic)") {
    val path = freshTable(180)
    TextIndex.create(spark, path, "text")
    val terms = TextIndex.scoredTerms(spark, path, "spark table merge", idf = "rational")
    // per-term quantize THEN integer-sum: the order-free exactness trick
    val viaIndex = terms
      .groupBy("doc_id")
      .agg(sum(floor(col("contrib") * lit(1000000.0)).cast("long")).as("score_q"))
      .orderBy(col("score_q").desc, col("doc_id"))
      .limit(10).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    viaIndex should have size 10
    // cross-check against a driver brute force using the same textual
    // arithmetic (rational idf, per-term quantize, integer sum)
    val raw = GraftTable.read(spark, path).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), TextIndex.tokenize(r.getString(1))))
    val n = raw.length.toLong
    val sumDl = raw.map(_._2.length.toLong).sum
    val q = Seq("spark", "table", "merge")
    val dfOf = q.map(t => t -> raw.count(_._2.contains(t)).toLong).toMap
    val brute = raw.flatMap { case (id, ts) =>
      val dl = ts.length
      val m = q.filter(ts.contains)
      if (m.isEmpty) None
      else Some((id, m.map { t =>
        val tf = ts.count(_ == t).toLong
        val df = dfOf(t)
        val contrib = ((n - df + 0.5) / (df + 0.5)) *
          ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl * n / sumDl.toDouble)))
        math.floor(contrib * 1000000.0).toLong
      }.sum))
    }.sortBy { case (id, s) => (-s, id) }.take(10).toSeq
    viaIndex shouldBe brute
  }

  test("filtered search: eligibility narrows, k stays full, statistics stay full-corpus") {
    val path = freshTable(300)
    TextIndex.create(spark, path, "text")
    val pred = col("doc_id") % 2 === 0
    val filtered = TextIndex.search(spark, path, "spark table", 10, pred = Some(pred))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    filtered should have size 10 // k full despite the filter
    filtered.foreach { case (id, _) => (id % 2) shouldBe 0L }
    // Lucene filter semantics: a doc's score is IDENTICAL with and
    // without the filter (df/N/Σdl never re-derive from the subset) —
    // the filtered board is exactly the unfiltered board minus odd docs
    val unfiltered = bruteForce(path, "spark table", 300)
    filtered shouldBe unfiltered.filter(_._1 % 2 == 0).take(10)
    // src-typed pred over a non-key column works the same way
    TextIndex.search(spark, path, "spark", 5, pred = Some(col("src") === "src-1"))
      .collect().map(_.getLong(0)).foreach(id => (id % 3) shouldBe 1L)
  }

  test("filtered phrase search: same eligibility semi-join before the cut") {
    val path = freshTable(250)
    TextIndex.create(spark, path, "text")
    val all = brutePhrase(path, "table index", 250)
    val gotF = TextIndex.searchPhrase(spark, path, "table index", 10,
        pred = Some(col("doc_id") % 2 === 0))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    gotF shouldBe all.filter(_._1 % 2 == 0).take(10)
  }

  test("graft_text_search TVF predSql equals the Scala filtered search") {
    GraftFunctions.register(spark)
    val path = freshTable(200)
    TextIndex.create(spark, path, "text")
    val sql = spark.sql(
      s"SELECT doc_id FROM graft_text_search('$path', 'spark table', 8, 'any', 'txt', " +
        "'doc_id % 2 = 0') ORDER BY score DESC, doc_id")
      .collect().map(_.getLong(0)).toSeq
    sql shouldBe TextIndex.search(spark, path, "spark table", 8,
        pred = Some(col("doc_id") % 2 === 0))
      .collect().map(_.getLong(0)).toSeq
  }

  test("filtered fuzzy search: expansion and df stay full-corpus, eligibility narrows, k stays full") {
    val path = freshTable(300)
    TextIndex.create(spark, path, "text")
    val pred = col("doc_id") % 2 === 0
    val filtered = TextIndex.searchFuzzy(spark, path, "tble", k = 10,
        pred = Some(pred))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    filtered should have size 10
    filtered.foreach { case (id, _) => (id % 2) shouldBe 0L }
    // score invariance (the filter-clause contract carried through the
    // expansion): the filtered board is exactly the UNFILTERED fuzzy
    // board minus odd docs — same expansion, same per-term df
    val unfiltered = TextIndex.searchFuzzy(spark, path, "tble", k = 300)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    filtered shouldBe unfiltered.filter(_._1 % 2 == 0).take(10)
    // SQL surface: mode 'fuzzy' with predSql equals the Scala call
    GraftFunctions.register(spark)
    spark.sql(
      s"SELECT doc_id FROM graft_text_search('$path', 'tble', 10, 'fuzzy', 'txt', " +
        "'doc_id % 2 = 0') ORDER BY score DESC, doc_id")
      .collect().map(_.getLong(0)).toSeq shouldBe filtered.map(_._1)
  }
}
