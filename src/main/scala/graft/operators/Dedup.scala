package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import scala.util.hashing.MurmurHash3

/** Training-data deduplication suite for 100 TB document corpora.
  *
  * All-pairs similarity is never computed directly: every operator
  * generates candidates through an inverted-index / bucket join
  * (shingle, band, simhash-block) so the shuffle key spreads across the
  * cluster, then exact-verifies candidates only.
  */
object Dedup {

  /** word-k-gram shingle column (distinct, order of first occurrence).
    * Single source of truth for shingling — the DuckDB oracles mirror
    * this exact definition (lowercase, split on single space, keeping
    * empty tokens like string_split does). A scala UDF rather than a
    * sequence/slice/array_join HOF chain: higher-order functions don't
    * participate in whole-stage codegen and interpreted them at
    * ~0.4 ms/row — the UDF is ~13× faster and this feeds every dedup
    * operator.
    */
  def shingles(text: Column, k: Int = 3): Column = shinglesUdf(k)(text)

  private def shinglesUdf(k: Int) = udf { (text: String) =>
    if (text == null) Array.empty[String]
    else {
      val toks = text.toLowerCase.split(" ", -1) // -1: keep trailing empties (string_split semantics)
      if (toks.length < k) Array.empty[String]
      else {
        val out = new scala.collection.mutable.LinkedHashSet[String]
        val sb = new java.lang.StringBuilder(64)
        var i = 0
        while (i <= toks.length - k) {
          sb.setLength(0)
          var j = 0
          while (j < k) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
          out += sb.toString
          i += 1
        }
        out.toArray
      }
    }
  }

  /** Exact dedup: one surviving row (min id) per distinct `key`, with
    * the duplicate count. Hash-groupBy only — no sort, no pairwise work.
    */
  def exact(df: DataFrame, keyCol: Column, idCol: Column): DataFrame =
    df.groupBy(sha2(keyCol.cast("string"), 256).as("key_hash"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact near-dup pairs at Jaccard ≥ tau, PPJoin-style (Xiao et al.,
    * WWW'08): candidates come from an inverted index over each doc's
    * *prefix* — its (n - ⌈τ·n⌉ + 1) globally-rarest shingles. Any pair
    * with J ≥ τ shares ≥ 1 prefix shingle (pigeonhole over the sorted
    * order), so this is exact while indexing ~(1-τ) of the postings,
    * which cuts the Σ df² join cost by ~(1-τ)² and keeps the hottest
    * (most frequent) shingles out of the index entirely. Length filter
    * τ·ni ≤ nj ≤ ni/τ prunes the remainder before the verify step.
    */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
                   tau: Double, k: Int = 3): DataFrame = {
    // persisted: the shingle set feeds candidate generation AND both
    // sides of the verify join — without it the (non-codegen) HOF
    // shingling is re-evaluated once per reuse. Disk-spillable, so at
    // cluster scale this is bounded by executor storage, not heap.
    val shAll = hashedShingles(docs, idCol, textCol, k)
    // exact-duplicate collapse (see [[embeddingCosine]]): docs with the
    // IDENTICAL shingle set are J=1 twins — one representative runs the
    // prefix index and verification; clique pairs expand afterwards.
    // PPJoin exactness only needs SOME consistent total shingle order,
    // so rep-level document frequencies keep the proof intact.
    val (sh, memb) = collapseBy(shAll, col("sh"))

    // global document frequency per shingle → rarest-first canonical order
    val ex = sh.select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("s"))
    val df_ = ex.groupBy("s").agg(count(lit(1)).as("df"))
    // prefix postings: rank shingles within each doc by (df, s) asc, keep
    // rank ≤ n - ⌈τ·n⌉ + 1. The 1e-9 slack keeps float ceil from rounding
    // an exact τ·n up (shorter prefix = missed pairs); erring longer is
    // always safe.
    val ranked = ex.join(df_, "s")
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("df"), col("s"))))
      .filter(col("rnk") <= col("n") - ceil(lit(tau) * col("n") - 1e-9) + 1)
      .select(col("doc_id"), col("s"), col("n"))
      .persist(StorageLevel.MEMORY_AND_DISK) // both sides of the self-join

    val candidates = ranked.as("a").join(ranked.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
          col("b.n") * lit(tau) - 1e-9 <= col("a.n") &&
          col("a.n") * lit(tau) - 1e-9 <= col("b.n"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()

    val repPairs = verifyJaccard(candidates, sh, tau)
    finalizePairs(expandPairs(repPairs, memb, "jaccard", lit(1.0)), shAll, ranked)
  }

  /** Exact-duplicate collapse for pair miners: rows whose `key` column
    * is byte-identical behave identically everywhere downstream, so the
    * candidate/verify machinery runs on ONE representative (min doc_id)
    * per distinct key. Duplicate-heavy corpora — the realistic 100 TB
    * regime — otherwise grow every bucket/block/cell join quadratically
    * per duplicate clique. Returns (reps, membership(doc_id, gid)).
    */
  private def collapseBy(df: DataFrame, key: Column): (DataFrame, DataFrame) = {
    val grpW = org.apache.spark.sql.expressions.Window.partitionBy(key)
    val memb = df.withColumn("gid", min(col("doc_id")).over(grpW))
    val reps = memb.filter(col("doc_id") === col("gid")).drop("gid")
    (reps, memb.select(col("doc_id"), col("gid")))
  }

  /** Expand representative-level pairs back to document pairs — the
    * inverse of [[collapseBy]], output-bound by the pair semantics
    * themselves (a clique of m docs IS m(m-1)/2 qualifying pairs).
    * Intra-clique pairs carry `selfScore` (identical keys score
    * trivially: J = 1.0, hamming = 0); inter-clique pairs inherit their
    * representatives' score (identical keys ⇒ identical score for
    * every member cross-pair) and re-order by id to keep the i < j
    * convention. All joins are id-only — no payloads move.
    */
  private def expandPairs(repPairs: DataFrame, memb: DataFrame,
                          scoreCol: String, selfScore: Column): DataFrame = {
    val intra = memb.as("a").join(memb.as("b"),
        col("a.gid") === col("b.gid") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        selfScore.as(scoreCol))
    val inter = repPairs
      .select(col("i").as("gi"), col("j").as("gj"), col(scoreCol))
      .join(memb.select(col("gid").as("gi"), col("doc_id").as("ia")), "gi")
      .join(memb.select(col("gid").as("gj"), col("doc_id").as("jb")), "gj")
      .select(least(col("ia"), col("jb")).as("i"),
        greatest(col("ia"), col("jb")).as("j"), col(scoreCol))
    inter.unionByName(intra)
  }

  /** Materialize the (small) pair output, then release the bulky
    * persisted intermediates it was computed from — repeated dedup
    * calls in one session must not accumulate executor storage. The
    * returned frame stays cached; callers may unpersist it.
    */
  private def finalizePairs(out: DataFrame, intermediates: DataFrame*): DataFrame = {
    val kept = out.persist(StorageLevel.MEMORY_AND_DISK)
    kept.count() // compute before the inputs go away
    intermediates.foreach(_.unpersist(blocking = false))
    kept
  }

  /** (doc_id, sh: array<string>, hs: array<bigint>) — the shingle set
    * plus its xxhash64 image, persisted once and shared by candidate
    * generation (strings: the provable canonical order) and
    * verification (longs: cheap set intersection).
    */
  private[operators] def hashedShingles(docs: DataFrame, idCol: String, textCol: String,
                                        k: Int = 3): DataFrame =
    docs.select(col(idCol).as("doc_id"), shingles(col(textCol), k).as("sh"))
      .filter(size(col("sh")) > 0)
      // persisted: feeds candidate generation AND both sides of the
      // verify join — without it the (non-codegen) HOF shingling is
      // re-evaluated once per reuse. Disk-spillable, so at cluster
      // scale this is bounded by executor storage, not heap.
      .select(col("doc_id"), col("sh"), expr("transform(sh, s -> xxhash64(s))").as("hs"))
      .persist(StorageLevel.MEMORY_AND_DISK)

  /** Exact-verify candidate pairs against full shingle sets at τ.
    * Intersections run on the 64-bit hash image of each set — 250-
    * element long intersections instead of string ones (~10× cheaper
    * per pair). |hashed ∩| == |string ∩| unless xxhash64 collides
    * within one pair's union (P < |union|²/2⁶⁵ ≈ 1e-14 per pair).
    */
  private def verifyJaccard(candidates: DataFrame, sh: DataFrame, tau: Double): DataFrame =
    candidates
      .join(sh.select(col("doc_id").as("i"), col("hs").as("si")), "i")
      .join(sh.select(col("doc_id").as("j"), col("hs").as("sj")), "j")
      .withColumn("inter", size(array_intersect(col("si"), col("sj"))))
      .withColumn("union_", size(col("si")) + size(col("sj")) - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("union_").cast("double"))
      .filter(col("jaccard") >= tau)
      .select("i", "j", "jaccard")

  /** (doc_id, band, bucket_hash) from a hashed-shingle frame: one row
    * per band per doc, no shuffle. Shingles are pre-hashed by codegen'd
    * xxhash64; the typed flatMap only sees Array[Long] (primitive
    * decode path, no per-string deser). Shared by [[minhashLsh]] and
    * [[IncrementalDedup.admitMinhash]].
    */
  private[operators] def bandedFromShingles(sh: DataFrame, numPerms: Int,
                                            bands: Int): DataFrame = {
    val spark = sh.sparkSession
    import spark.implicits._
    require(numPerms % bands == 0, "bands must divide perms")
    val rowsPerBand = numPerms / bands
    sh.select(col("doc_id"), col("hs"))
      .as[(Long, Array[Long])]
      .flatMap { case (id, hs) =>
        val sig = minhashSig(hs, numPerms)
        (0 until bands).iterator.map { b =>
          var bucket = 0L
          var r = b * rowsPerBand
          while (r < (b + 1) * rowsPerBand) { bucket = mix64(bucket ^ sig(r)); r += 1 }
          (id, b, bucket)
        }
      }.toDF("doc_id", "band", "bucket")
  }

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** MinHash signature over pre-hashed shingles: sig(p) = min over
    * shingles of mix_p(h). The string→64-bit hashing happens once, in
    * codegen'd SQL (`xxhash64`); each permutation is ~10 ALU ops here.
    * Hash choice is internal: candidates are exact-verified, so it
    * never leaks into results (only into recall, bounded by the band
    * math).
    */
  def minhashSig(hashes: Array[Long], numPerms: Int): Array[Long] = {
    val sig = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < hashes.length) {
      val h = hashes(i)
      var p = 0
      while (p < numPerms) {
        val v = mix64(h ^ (p.toLong * 0xC2B2AE3D27D4EB4FL))
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    sig
  }

  /** MinHash+LSH near-dup: shingle → 128-perm minhash → 32 bands × 4
    * rows → bucket join → exact-Jaccard verify at `tau`.
    *
    * With b=32, r=4 the probability of *missing* a pair at J=0.8 is
    * (1-0.8⁴)³² ≈ 5e-8, so the verified output equals the exact
    * Jaccard-τ pair set (which is what the oracle computes) while the
    * candidate join touches only colliding buckets — the 100 TB path.
    */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String, tau: Double,
                 numPerms: Int = 128, bands: Int = 32): DataFrame = {
    val shAll = hashedShingles(docs, idCol, textCol)
    // exact-duplicate collapse (see [[collapseBy]]): identical shingle
    // sets sign identically into every band — signatures, buckets, and
    // verification run once per distinct set
    val (sh, memb) = collapseBy(shAll, col("sh"))
    val banded = bandedFromShingles(sh, numPerms, bands)
      .persist(StorageLevel.MEMORY_AND_DISK) // both sides of the bucket self-join

    val candidates = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()

    val repPairs = verifyJaccard(candidates, sh, tau)
    finalizePairs(expandPairs(repPairs, memb, "jaccard", lit(1.0)), shAll, banded)
  }

  /** Benchmark decontamination: flag every training doc sharing at
    * least one word-n-gram with the eval corpus — the standard
    * n-gram-overlap contamination test run before training. Inverted-
    * index semi-join on shingles: the eval side's shingle set is tiny
    * relative to the corpus (benchmarks are small), so the join
    * broadcasts it; the training side is scanned once, never shuffled
    * on doc identity.
    */
  def decontaminate(train: DataFrame, eval_ : DataFrame, idCol: String,
                    textCol: String, n: Int = 8): DataFrame = {
    val trainSh = train.select(col(idCol).as("doc_id"), col(textCol))
      .withColumn("s", explode(shingles(col(textCol), n)))
    val evalSh = eval_.select(explode(shingles(col(textCol), n)).as("s")).distinct()
    val contaminated = trainSh.join(broadcast(evalSh), Seq("s"), "left_semi")
      .select("doc_id").distinct()
    train.select(col(idCol).as("doc_id"))
      .join(contaminated.withColumn("contaminated", lit(true)), Seq("doc_id"), "left")
      .withColumn("contaminated", coalesce(col("contaminated"), lit(false)))
  }

  /** The INVERSE report of [[decontaminate]]: per EVAL document, how
    * many training docs share at least one word-n-gram with it — the
    * view a benchmark owner reads to see which of their items leaked
    * into the corpus and how widely. Same inverted-index join keyed on
    * the shingle, aggregated per (eval, train) pair first so one heavily
    *-leaked shingle pair counts once; the training side still scans
    * once and never shuffles on doc identity (the shingle join's
    * broadcast side is the eval set, exactly as in the forward probe).
    */
  def contaminationReport(train: DataFrame, eval_ : DataFrame, idCol: String,
                          textCol: String, n: Int = 8): DataFrame = {
    val trainSh = train
      .select(col(idCol).as("train_id"), explode(shingles(col(textCol), n)).as("s"))
    val evalSh = eval_
      .select(col(idCol).as("eval_id"), explode(shingles(col(textCol), n)).as("s"))
      .distinct()
    trainSh.join(broadcast(evalSh), Seq("s"))
      .select("eval_id", "train_id").distinct()
      .groupBy("eval_id").agg(count(lit(1)).as("n_train_docs"))
  }

  /** [[decontaminate]]'s scale variant: the eval shingle set compressed
    * into a Bloom filter instead of broadcast verbatim. The exact
    * variant ships every distinct eval shingle STRING to every executor
    * — fine for benchmark-sized eval sets, but decontaminating against
    * a large held-out corpus (dedup-against-validation-split at 100 TB)
    * would broadcast tens of GB. A Bloom filter at fpp=1e-3 costs
    * ~14 bits per shingle (~100× smaller than the strings) and keeps
    * the same one-scan, no-identity-shuffle plan; the price is a
    * bounded false-POSITIVE rate (a clean doc occasionally flagged —
    * conservative in the right direction for decontamination: you drop
    * slightly more than needed, never leak eval data). No false
    * negatives ever — proven against the exact variant in DedupSpec.
    * Output is filter-dependent → rows-only gate entry, spec-verified.
    */
  def decontaminateBloom(train: DataFrame, eval_ : DataFrame, idCol: String,
                         textCol: String, n: Int = 8,
                         fpp: Double = 0.001): DataFrame = {
    val evalSh = eval_.select(explode(shingles(col(textCol), n)).as("s")).distinct()
    // expected-item count sizes the filter; one cheap count over the
    // (small-side) distinct shingles, same cost class as the broadcast
    val expected = math.max(evalSh.count(), 1L)
    val bloom = evalSh.stat.bloomFilter("s", expected, fpp)
    val bloomB = train.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf { (s: String) => s != null && bloomB.value.mightContainString(s) }
    val contaminated = train
      .select(col(idCol).as("doc_id"), explode(shingles(col(textCol), n)).as("s"))
      .filter(mightContain(col("s")))
      .select("doc_id").distinct()
    train.select(col(idCol).as("doc_id"))
      .join(contaminated.withColumn("contaminated", lit(true)), Seq("doc_id"), "left")
      .withColumn("contaminated", coalesce(col("contaminated"), lit(false)))
  }

  /** 64-bit SimHash of the token multiset: bit k of the fingerprint is
    * the sign of Σ_tokens (±1 by bit k of hash(token)).
    */
  def simhash64(tokens: Seq[String]): Long = {
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h = MurmurHash3.stringHash(t).toLong << 32 | (MurmurHash3.stringHash(t, 0x9747b28c) & 0xffffffffL)
      var k = 0
      while (k < 64) { if (((h >>> k) & 1L) == 1L) acc(k) += 1 else acc(k) -= 1; k += 1 }
    }
    var fp = 0L
    var k = 0
    while (k < 64) { if (acc(k) > 0) fp |= (1L << k); k += 1 }
    fp
  }

  /** SimHash near-dup: fingerprint → 4×16-bit block keys (pigeonhole:
    * hamming ≤ 3 ⇒ at least one identical block) → bucket join → exact
    * hamming verify. Output (i, j, hamming).
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    // UDF (not a typed Dataset) so idCol keeps its native type; null text
    // fingerprints like the empty doc instead of NPEing the task
    val fpUdf = udf { (t: String) =>
      simhash64(Option(t).getOrElse("").split(" ").toSeq)
    }
    val allFps = docs.select(col(idCol).as("doc_id"),
      fpUdf(lower(col(textCol))).as("fp"))
    // exact-duplicate collapse on the FINGERPRINT itself (see
    // [[collapseBy]]): equal-fp docs are hamming-0 twins — stronger
    // than a text collapse, it also merges distinct texts that
    // fingerprint identically
    val (fps, memb) = collapseBy(allFps, col("fp"))

    val blocks = fps.select(col("doc_id"), col("fp"),
      explode(expr("transform(sequence(0, 3), b -> named_struct('blk', b, 'key', (fp >> (b*16)) & 65535))")).as("e"))
      .select(col("doc_id"), col("fp"), col("e.blk"), col("e.key"))
      .persist(StorageLevel.MEMORY_AND_DISK) // both sides of the block self-join

    val repPairs = blocks.as("a").join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        bit_count(expr("a.fp ^ b.fp")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
    finalizePairs(
      expandPairs(repPairs, memb, "hamming", lit(0).cast("int")), blocks)
  }

  /** Embedding near-dup: all pairs with cosine ≥ tau — EXACT, via a
    * centroid-cover blocked join (never an all-pairs broadcast).
    *
    * Blocking scheme (provably exact, triangle-inequality cover):
    * unit-normalize every vector (cos(a,b) ≥ τ ⟺ ‖â−b̂‖ ≤ R, R=√(2−2τ));
    * sample-fit `nblocks` centroids (driver-side Lloyd's, deterministic
    * seed); each row gets ONE primary cell (nearest centroid c*) and a
    * cover set of every cell within d(v̂,c*) + 2R. For any τ-pair (a,b):
    * d(b̂,c*(a)) ≤ d(â,c*(a)) + R and d(â,c*(a)) ≤ d(â,c*(b)) ≤
    * d(b̂,c*(b)) + R, so c*(a) is inside b's cover ball — the
    * primary(a) ⋈ cover(b) equi-join on cell with `a.id < b.id` sees
    * every qualifying pair exactly once (primary cells are unique, so
    * no distinct needed). Survivors are exact-verified with the
    * codegen'd kernel on the ORIGINAL float vectors, so output is
    * bit-identical to the brute-force definition at any τ.
    *
    * Scale: the join is shuffle-partitioned on cell id — per-task
    * memory is one cell's slice, never the table (the old broadcast
    * variant OOMed at ~10 GB of vectors). Pruning sharpens with τ: at
    * near-dup thresholds (τ ≥ 0.85, 2R ≤ 1.1) cover balls touch few
    * cells; at loose τ (2R ≥ sphere diameter) it degrades gracefully to
    * a distributed, cell-partitioned all-pairs — the true lower bound
    * when the qualifying-pair output itself is dense.
    */
  def embeddingCosine(emb: DataFrame, idCol: String, vecCol: String, tau: Double,
                      nblocks: Int = 16, sampleSize: Int = 20000,
                      seed: Long = 42L): DataFrame = {
    import graft.functions.vectors._
    val spark = emb.sparkSession
    val cover = 2.0 * math.sqrt(math.max(0.0, 2.0 - 2.0 * tau))

    val full = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    // EXACT-DUPLICATE COLLAPSE before the geometry: duplicate-heavy
    // corpora (the real 100 TB regime — crawl snapshots, mirrored docs)
    // put every copy of a vector in the same cell, so the cover join's
    // candidate stream grows quadratically per duplicate clique. All
    // copies are byte-identical, so the expensive part (cell assignment,
    // cover explode, candidate kernel) runs on ONE representative per
    // distinct vector; clique pairs are reconstructed afterwards through
    // id-only joins with the kernel evaluated once per GROUP (identical
    // bytes ⇒ identical kernel result — output stays bit-equal to brute
    // force). The reconstruction itself is output-bound: a clique of m
    // docs IS m(m-1)/2 qualifying pairs under all-pairs semantics.
    // The collapse SHUFFLE key is md5 of the rendered vector, not the
    // raw 64-float array — same discipline as the text miners' md5
    // collapse keys: a 16-byte key instead of ~260 bytes per row on
    // the wire at 100 TB (the float→string render is exact per bit
    // pattern, so distinct vectors keep distinct keys).
    val grpW = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("v").cast("string")))
    val memb = full.withColumn("gid", min(col("id")).over(grpW))
    val base = memb.filter(col("id") === col("gid")).select(col("gid").as("id"), col("v"))
    // deterministic bounded sample (lowest ids) — centroid quality only
    // shapes pruning, never correctness, so 20k rows is plenty at 100 TB
    val sample = base.orderBy("id").limit(sampleSize).select("v").collect()
      .map(r => unitNorm(r.getSeq[Float](0).toArray))
    if (sample.isEmpty)
      return base.select(col("id").as("i"), col("id").as("j"), lit(0.0).as("cos")).limit(0)
    // cap the Lloyd fit input: centroid quality saturates fast and the
    // fit is single-threaded driver work — stride-sample past 4096
    val fit = if (sample.length <= 4096) sample
              else Array.tabulate(4096)(i => sample(i * (sample.length / 4096)))
    val cents = PqIndex.lloyd(fit, nblocks, iters = 8, seed)
    val bcCents = spark.sparkContext.broadcast(cents)

    // (primary cell, cover cells) per row: nblocks small distances — cheap
    val cellsUdf = udf { (v: Seq[Float]) =>
      val u = unitNorm(v.toArray)
      val cs = bcCents.value
      val d = new Array[Double](cs.length)
      var best = Double.MaxValue; var bestC = 0; var c = 0
      while (c < cs.length) {
        var s = 0.0; var i = 0
        while (i < u.length) { val t = cs(c)(i).toDouble - u(i).toDouble; s += t * t; i += 1 }
        d(c) = math.sqrt(s)
        if (d(c) < best) { best = d(c); bestC = c }
        c += 1
      }
      // 1e-6 slack absorbs float-normalization rounding at the ball edge
      val lim = best + cover + 1e-6
      (bestC, (0 until cs.length).filter(d(_) <= lim))
    }

    val assigned = base.withColumn("a", cellsUdf(col("v")))
    val primary = assigned.select(col("id"), col("v"), col("a._1").as("cell"))
    val coverSide = assigned.select(col("id"), col("v"), explode(col("a._2")).as("cell"))
    // shuffle_hash: cell keys are few and heavy — hashing one side beats
    // sort-merge's equal-key-run buffering; still a shuffled (bounded-
    // memory-per-task) join, never a table broadcast
    val repPairs = primary.as("x").hint("shuffle_hash").join(coverSide.as("y"),
        col("x.cell") === col("y.cell") && col("x.id") < col("y.id"))
      .withColumn("cos", cosine_similarity(col("x.v"), col("y.v")))
      .filter(col("cos") >= tau)
      .select(col("x.id").as("gi"), col("y.id").as("gj"), col("cos"))

    // expand representative pairs back to document pairs (id-only joins)
    val ids = memb.select(col("id"), col("gid"))
    // intra-clique: every pair inside a duplicate group; kernel once per
    // group (the τ filter mirrors brute force — identical vectors score
    // ~1.0, but a degenerate τ > 1 must still exclude them)
    val grpCos = base.withColumn("cos", cosine_similarity(col("v"), col("v")))
      .filter(col("cos") >= tau).select(col("id").as("g"), col("cos"))
    val intra = ids.as("a").join(ids.as("b"),
        col("a.gid") === col("b.gid") && col("a.id") < col("b.id"))
      .join(grpCos, col("a.gid") === col("g"))
      .select(col("a.id").as("i"), col("b.id").as("j"), col("cos"))
    // inter-clique: a qualifying representative pair qualifies every
    // member cross-pair (identical bytes per group); re-order each pair
    // by id to match the brute-force i < j convention
    val inter = repPairs
      .join(ids.as("ma"), col("gi") === col("ma.gid"))
      .join(ids.as("mb"), col("gj") === col("mb.gid"))
      .select(least(col("ma.id"), col("mb.id")).as("i"),
        greatest(col("ma.id"), col("mb.id")).as("j"), col("cos"))
    inter.unionByName(intra)
  }

  /** Duplicate-cluster resolution: connected components over a near-dup
    * pair set → (node, cluster) where cluster = min doc id reachable.
    * The step AFTER pair mining in a dedup pipeline: pairs chain
    * (A~B, B~C ⇒ {A,B,C} is one duplicate group), and the keep-one
    * decision needs the group, not the pairs.
    *
    * Iterative min-label propagation as a driver loop of declarative
    * plans: each round every node takes the min label in its closed
    * neighborhood (self ∪ neighbors); converges in ≤ graph-diameter
    * rounds. Near-dup clusters are small by construction (they chain
    * through ≥τ-similar docs), so the loop is shallow; each round is
    * one shuffle on node id. For adversarial long-chain graphs at
    * planetary scale the alternating large-star/small-star variant
    * halves paths per round — not needed for dedup-shaped graphs.
    * `maxIter` bounds the loop; it throws rather than silently
    * returning unconverged labels.
    */
  def connectedComponents(nodes: DataFrame, nodeCol: String,
                          pairs: DataFrame, iCol: String, jCol: String,
                          maxIter: Int = 25): DataFrame = {
    val edges = pairs.select(col(iCol).as("u"), col(jCol).as("w"))
      .unionByName(pairs.select(col(jCol).as("u"), col(iCol).as("w")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Only nodes that appear in a pair can ever change label — iterate
    // over THAT set and union the (vast) singleton majority back at the
    // end. At corpus scale the duplicate-touched subset is a small
    // fraction of all docs, so the per-round shuffle shrinks from
    // O(corpus) to O(nodes-in-pairs).
    //
    // localCheckpoint per round: iterative plans NEST their full history
    // (round N's lineage contains rounds 1..N−1 — analysis cost grows
    // exponentially and the optimizer chokes long before maxIter);
    // truncating to the materialized RDD keeps every round's plan flat.
    // Production loops on unreliable clusters would use checkpoint(dir)
    // (replicated) instead of executor-local blocks.
    var labels = edges.select(col("u").as("node"))
      .distinct().withColumn("lbl", col("node"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // min label over the closed neighborhood of every node …
      val neighborLbl = edges
        .join(labels.withColumnRenamed("node", "w"), "w")
        .select(col("u").as("node"), col("lbl"))
      // (checkpointed: the pointer-jump below self-joins this frame, and
      // materializing first sidesteps Catalyst's self-join attribute
      // ambiguity while keeping the plan flat)
      val hop = labels.unionByName(neighborLbl)
        .groupBy("node").agg(min(col("lbl")).as("lbl"))
        .localCheckpoint(true)
      // … then pointer-jump: follow the label's own label (labels are
      // node ids, so the self-join resolves one more hop). Halving the
      // path each round turns O(diameter) rounds into O(log diameter) —
      // long duplicate chains converge in a handful of rounds.
      val next = hop
        .join(hop.select(col("node").as("lbl"), col("lbl").as("lbl2")),
          Seq("lbl"), "left")
        .select(col("node"), coalesce(col("lbl2"), col("lbl")).as("lbl"))
        .localCheckpoint(true)
      val changes = next.join(labels.withColumnRenamed("lbl", "old"), "node")
        .filter(col("lbl") =!= col("old")).limit(1).count()
      labels = next
      converged = changes == 0L
      iter += 1
    }
    edges.unpersist(blocking = false)
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — graph diameter too large")
    // singletons (no pair) label themselves; paired nodes take the loop result
    nodes.select(col(nodeCol).as("node")).distinct()
      .join(labels.withColumnRenamed("lbl", "__lbl"), Seq("node"), "left")
      .select(col("node"), coalesce(col("__lbl"), col("node")).as("cluster"))
  }

  /** The end of the dedup pipeline: keep ONE canonical row per
    * duplicate cluster (the min-id representative) and drop the rest.
    * `clusters` is [[connectedComponents]] output; the join is a
    * broadcast-friendly semi-join on the (small) representative set
    * when clusters are few, or a key-shuffle otherwise — Catalyst
    * picks based on size.
    */
  def keepCanonical(docs: DataFrame, idCol: String, clusters: DataFrame): DataFrame =
    docs.join(
      clusters.filter(col("node") === col("cluster"))
        .select(col("node").as(idCol)),
      Seq(idCol), "left_semi")

  private def unitNorm(v: Array[Float]): Array[Float] = {
    var n = 0.0; var i = 0
    while (i < v.length) { n += v(i).toDouble * v(i).toDouble; i += 1 }
    val inv = if (n == 0.0) 0.0 else 1.0 / math.sqrt(n)
    val out = new Array[Float](v.length)
    i = 0
    while (i < v.length) { out(i) = (v(i) * inv).toFloat; i += 1 }
    out
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): SEMANTIC dedup of an
    * embedded corpus — cluster the embedding space with k-means, call
    * two docs duplicates when they land in the SAME cluster with cosine
    * ≥ τ, and keep ONE doc per duplicate group: the member FARTHEST
    * from its centroid (the paper's keep-low-centroid-similarity rule —
    * it retains the atypical example and drops the redundant core),
    * ties broken by min id.
    *
    * This is [[embeddingCosine]]'s blocked geometry with the 2R cover
    * DELIBERATELY removed: cross-cluster near-dup pairs are missed BY
    * DESIGN — that approximation is what makes SemDeDup linear-ish at
    * web scale (the paper dedups LAION/C4 this way), and the recall
    * cost is measured, not guessed (SemDedupSpec quantifies it against
    * the exact operator). Everything else keeps the house disciplines:
    * exact-duplicate vectors collapse to one representative before the
    * geometry (a replica clique is ALWAYS cos = 1 ⇒ same group ⇒ the
    * collapse is semantics-preserving here, not just a speedup); the
    * per-cell pair join shuffles on the cell id and never broadcasts
    * the corpus; group resolution reuses [[connectedComponents]]
    * (components cannot cross cells — pairs only exist inside one).
    *
    * Returns the KEPT corpus rows: (idCol, cell, grp, cdist) — cdist
    * the distance to the cell centroid (the keep-rule score), grp the
    * duplicate-group label (= min rep id; grp == id for singletons).
    *
    * Scale: one centroid broadcast (k × dim floats), one cell-keyed
    * shuffle for the pair join (cell sizes ~n/k; SemDeDup at 100 TB
    * runs k ∝ corpus/50k so cells stay task-sized), CC rounds bounded
    * by duplicate-chain diameter. No O(n²) term outside a cell.
    */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String, tau: Double,
               k: Int = 16, sampleSize: Int = 20000,
               seed: Long = 42L): DataFrame = {
    import graft.functions.vectors._
    val spark = emb.sparkSession
    val full = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    // exact-duplicate collapse (see scaladoc: lossless for SemDeDup);
    // keyed on md5(rendered vector) — the narrow-shuffle-key discipline
    // of the text miners, not the raw float array
    val grpW = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("v").cast("string")))
    val memb = full.withColumn("gid", min(col("id")).over(grpW))
    val base = memb.filter(col("id") === col("gid"))
      .select(col("gid").as("id"), col("v"))
    val sample = base.orderBy("id").limit(sampleSize).select("v").collect()
      .map(r => unitNorm(r.getSeq[Float](0).toArray))
    if (sample.isEmpty)
      return full.select(col("id").as(idCol), lit(0).as("cell"),
        col("id").as("grp"), lit(0.0).as("cdist")).limit(0)
    val fit = if (sample.length <= 4096) sample
              else Array.tabulate(4096)(i => sample(i * (sample.length / 4096)))
    val cents = PqIndex.lloyd(fit, k, iters = 8, seed)
    val bcCents = spark.sparkContext.broadcast(cents)
    // primary-cell assignment on the UNIT sphere (cosine geometry), plus
    // the centroid distance the keep-rule ranks by
    val assignUdf = udf { (v: Seq[Float]) =>
      val u = unitNorm(v.toArray)
      val cs = bcCents.value
      var best = Double.MaxValue; var bestC = 0; var c = 0
      while (c < cs.length) {
        var s = 0.0; var i = 0
        while (i < u.length) { val t = cs(c)(i).toDouble - u(i).toDouble; s += t * t; i += 1 }
        if (s < best) { best = s; bestC = c }
        c += 1
      }
      (bestC, math.sqrt(best))
    }
    val assigned = base.withColumn("a", assignUdf(col("v")))
      .select(col("id"), col("v"), col("a._1").as("cell"), col("a._2").as("cdist"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assigned.count() // materialize once: pair join + rank both read it
    // intra-cell near-dup pairs — the SemDeDup approximation IS this
    // equi-join's blocking key
    val pairs = assigned.as("x").hint("shuffle_hash").join(assigned.as("y"),
        col("x.cell") === col("y.cell") && col("x.id") < col("y.id"))
      .withColumn("cos", cosine_similarity(col("x.v"), col("y.v")))
      .filter(col("cos") >= tau)
      .select(col("x.id").as("i"), col("y.id").as("j"))
    val groups = connectedComponents(assigned.select("id"), "id", pairs, "i", "j")
      .select(col("node").as("id"), col("cluster").as("grp"))
    // keep-rule: one row per group — (cdist DESC, id ASC) winner
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("cdist").desc, col("id").asc)
    val kept = assigned.join(groups, "id")
      .withColumn("rn", row_number().over(rankW))
      .filter(col("rn") === 1)
      .select(col("id").as(idCol), col("cell"), col("grp"), col("cdist"))
    kept
  }
}
