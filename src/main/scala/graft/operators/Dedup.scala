package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
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
    * this exact definition (lowercase, split on single space).
    */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = split(lower(text), " ")
    val grams = transform(sequence(lit(1), size(toks) - (k - 1)),
      i => array_join(slice(toks, i, lit(k)), " "))
    array_distinct(when(size(toks) < k, array().cast("array<string>")).otherwise(grams))
  }

  /** Exact dedup: one surviving row (min id) per distinct `key`, with
    * the duplicate count. Hash-groupBy only — no sort, no pairwise work.
    */
  def exact(df: DataFrame, keyCol: Column, idCol: Column): DataFrame =
    df.groupBy(sha2(keyCol.cast("string"), 256).as("key_hash"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Inverted-index exact Jaccard: emits (i, j, inter, union_) for every
    * pair sharing ≥1 shingle. Cost is Σ_shingle df(shingle)² — an
    * inverted-index join, not O(n²) over documents.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"), shingles(col(textCol), k).as("sh"))
      .filter(size(col("sh")) > 0)
    val sizes = sh.select(col("doc_id"), size(col("sh")).as("n"))
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("doc_id", "i").withColumnRenamed("n", "ni"), "i")
      .join(sizes.withColumnRenamed("doc_id", "j").withColumnRenamed("n", "nj"), "j")
      .withColumn("union_", col("ni") + col("nj") - col("inter"))
  }

  /** Exact near-dup pairs at Jaccard ≥ tau via the inverted index. */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
                   tau: Double, k: Int = 3): DataFrame =
    jaccardPairs(docs, idCol, textCol, k)
      .withColumn("jaccard", col("inter").cast("double") / col("union_").cast("double"))
      .filter(col("jaccard") >= tau)
      .select("i", "j", "jaccard")

  /** MinHash signature of a shingle set: sig(p) = min over shingles of
    * hash_p(shingle). Computed in one shuffle-free pass per document —
    * hash choice is internal because candidates are exact-verified.
    */
  def minhashSig(sh: Array[String], numPerms: Int): Array[Int] = {
    val sig = Array.fill(numPerms)(Int.MaxValue)
    var i = 0
    while (i < sh.length) {
      var p = 0
      while (p < numPerms) {
        val h = MurmurHash3.stringHash(sh(i), p)
        if (h < sig(p)) sig(p) = h
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
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = bands.ensuring(numPerms % bands == 0, "bands must divide perms")
    val rowsPerBand = numPerms / bands

    val sh = docs.select(col(idCol).as("doc_id"), shingles(col(textCol)).as("sh"))
      .filter(size(col("sh")) > 0)

    // (doc_id, band, bucket_hash): one row per band per doc, no shuffle
    val banded = sh.as[(Long, Seq[String])].flatMap { case (id, shs) =>
      val sig = minhashSig(shs.toArray, numPerms)
      (0 until bands).iterator.map { b =>
        val bandSlice = sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand)
        (id, b, MurmurHash3.arrayHash(bandSlice))
      }
    }.toDF("doc_id", "band", "bucket")

    val candidates = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()

    // exact verify candidates only
    val withSets = candidates
      .join(sh.select(col("doc_id").as("i"), col("sh").as("si")), "i")
      .join(sh.select(col("doc_id").as("j"), col("sh").as("sj")), "j")
      .withColumn("inter", size(array_intersect(col("si"), col("sj"))))
      .withColumn("union_", size(col("si")) + size(col("sj")) - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("union_").cast("double"))
    withSets.filter(col("jaccard") >= tau).select("i", "j", "jaccard")
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
    val spark = docs.sparkSession
    import spark.implicits._
    val fps = docs.select(col(idCol).as("doc_id"), lower(col(textCol)).as("t"))
      .as[(Long, String)]
      .map { case (id, t) => (id, simhash64(t.split(" ").toSeq)) }
      .toDF("doc_id", "fp")

    val blocks = fps.select(col("doc_id"), col("fp"),
      explode(expr("transform(sequence(0, 3), b -> named_struct('blk', b, 'key', (fp >> (b*16)) & 65535))")).as("e"))
      .select(col("doc_id"), col("fp"), col("e.blk"), col("e.key"))

    blocks.as("a").join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        bit_count(expr("a.fp ^ b.fp")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup: all pairs with cosine ≥ tau. Exact baseline —
    * broadcast the (smaller) right side and filter on the codegen'd
    * kernel; the ANN scale path is [[IvfIndex]]/[[LshIndex]].
    */
  def embeddingCosine(emb: DataFrame, idCol: String, vecCol: String, tau: Double): DataFrame = {
    import graft.functions.vectors._
    val a = emb.select(col(idCol).as("i"), col(vecCol).as("va"))
    val b = emb.select(col(idCol).as("j"), col(vecCol).as("vb"))
    a.join(broadcast(b), col("i") < col("j"))
      .withColumn("cos", cosine_similarity(col("va"), col("vb")))
      .filter(col("cos") >= tau)
      .select("i", "j", "cos")
  }
}
