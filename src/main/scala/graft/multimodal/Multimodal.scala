package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal columns as opaque binary + typed metadata — image/audio/
  * video payloads travel through the pipeline as `binary` with their
  * metadata in plain columns, exactly how a 100 TB training-data store
  * holds them (the decode libraries live at the edges, not the engine).
  *
  * The decode step is a DETERMINISTIC FAKE (this container has no
  * image/audio codecs): `decodeMeta` derives pseudo width/height/
  * channels from payload bytes. Everything around it — the binary
  * schema, per-partition batched iteration, the typed operator
  * signature, frame slicing — is real Spark plumbing, and is what a
  * production codec would plug into (swap `fakeDecode` for the codec
  * call; nothing else changes).
  */
object Multimodal {

  /** Wrap a text corpus as a binary-payload table: (id, payload,
    * n_bytes, content_type, sha256). This is the ingest shape for any
    * modality; here the payload is the utf-8 document bytes.
    */
  def asBinaryTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      to_binary(col(textCol), lit("utf-8")).as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("content_type", lit("application/octet-stream"))
      .withColumn("sha256", sha2(col("payload"), 256))

  final case class DecodedMeta(doc_id: Long, n_bytes: Long, width: Int,
                               height: Int, channels: Int)

  /** STUBBED decode — deterministic fake standing in for an image
    * codec. Real plumbing: typed mapPartitions so a codec could batch
    * per partition (open once, decode many), primitive-friendly row
    * shape, no driver collect.
    */
  def decodeMeta(binTable: DataFrame): DataFrame = {
    val enc = Encoders.product[DecodedMeta]
    binTable.select("doc_id", "payload").mapPartitions { it =>
      // a real implementation would initialize the codec here, once per partition
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        fakeDecode(id, bytes)
      }
    }(enc).toDF()
  }

  /** Deterministic fake: dimensions derived from payload content. */
  private def fakeDecode(id: Long, bytes: Array[Byte]): DecodedMeta = {
    val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
    DecodedMeta(id, bytes.length.toLong, 16 + (b0 % 16) * 16, 16 + (b1 % 16) * 16, 3)
  }

  /** Per-frame feature extraction — the stubbed image/audio EMBEDDING
    * step: each frame yields a fixed-dim feature vector. The stub
    * derives deterministic features from the frame's md5 (so the
    * output is engine-neutral and oracle-checkable); a real model
    * replaces the projection while the shape — one `array` feature
    * column per frame row, computed scan-parallel with zero shuffle —
    * stays. Composes with [[frameSample]]:
    * `frameFeatures(frameSample(binTable, 32))`.
    */
  def frameFeatures(frames: DataFrame, dim: Int = 4): DataFrame = {
    val feats = (0 until dim).map { d =>
      // 8 hex chars per feature → uint32-range LONG, deterministic
      conv(substring(col("frame_md5"), d * 8 + 1, 8), 16, 10).cast("long").as(s"f$d")
    }
    frames.select(col("doc_id") +: col("frame_idx") +: feats: _*)
  }

  /** LATE-INTERACTION retrieval (ColBERT's MaxSim — Khattab & Zaharia
    * 2020 — applied to frame features): score(candidate) =
    * Σ over query frames of max over the candidate's frames of the
    * frame-pair dot product. The MULTI-VECTOR shape a single pooled
    * vector cannot express: a clip matches when EVERY query frame finds
    * a counterpart somewhere in the candidate, in any order. Features
    * are [[frameFeatures]]' md5-derived INTEGER vectors with components
    * reduced mod `compMod`, so every dot product and sum is exact
    * BIGINT arithmetic — the DuckDB oracle replays the scores
    * bit-for-bit (a float MaxSim would be order-dependent and
    * rows-only).
    *
    * Plan: the query frames BROADCAST (serving-sized by contract)
    * against ONE scan of the corpus frame table as a DELIBERATE
    * broadcast nested-loop cross product — every (corpus frame, query
    * frame) pair IS the semantics, and with a handful of broadcast
    * rows BNLJ is the correct physical plan (the same whitelisted
    * shape as the exact knn join); dot products codegen'd, then two
    * keyed aggregations — max per (candidate, query frame), sum per
    * candidate — both map-side combinable. Cost: |corpus frames| ×
    * |query frames| scan-local multiplies, agg state O(candidates).
    */
  def maxSim(frames: DataFrame, queryFrames: DataFrame, k: Int,
             dim: Int = 4, compMod: Long = 10000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val dot = (0 until dim).map(d =>
      (col(s"f$d") % compMod) * (col(s"q$d") % compMod))
      .reduce(_ + _)
    val q = queryFrames.select(
      col("frame_idx").as("q_idx") +:
        (0 until dim).map(d => col(s"f$d").as(s"q$d")): _*)
    frames.crossJoin(broadcast(q))
      .select(col("doc_id"), col("q_idx"), dot.as("__dot"))
      .groupBy("doc_id", "q_idx").agg(max("__dot").as("__best"))
      .groupBy("doc_id").agg(sum("__best").cast("long").as("maxsim"))
      .orderBy(desc("maxsim"), asc("doc_id"))
      .limit(k)
  }

  /** Frame/byte-range sampling: slice the payload into `stride`-byte
    * frames (posexplode — one output row per frame). For video this is
    * the frame-sample primitive; for audio, fixed-size windows. Pure
    * codegen'd expressions, parallel per input row.
    */
  def frameSample(binTable: DataFrame, stride: Int): DataFrame =
    binTable
      .select(col("doc_id"), col("payload"),
        // empty payload → zero frames (sequence(0,-1) would yield [0,-1])
        posexplode(expr(
          s"case when octet_length(payload) = 0 then array() " +
          s"else transform(sequence(0, cast(floor((octet_length(payload) - 1) / $stride) as int)), " +
          s"f -> substring(payload, f * $stride + 1, $stride)) end")).as(Seq("frame_idx", "frame")))
      .select(col("doc_id"), col("frame_idx"),
        octet_length(col("frame")).cast("long").as("frame_bytes"),
        md5(col("frame")).as("frame_md5"))

  /** Perceptual-hash signature per payload — the multimodal NEAR-DUP
    * primitive (pHash/aHash family): sample the payload's frame
    * features ([[frameSample]] → [[frameFeatures]], the stubbed codec
    * stage a real DCT/embedding drops into), take the first
    * `nFrames × dim = 64` values as the signal, binarize each against
    * the payload's own mean (classic aHash rule), pack the sign bits
    * into ONE 64-bit word with the [[graft.functions.SignPack]]
    * kernel. Payloads missing trailing frames read 0 there —
    * deterministic, so truncated copies still collide on their shared
    * prefix bits.
    */
  def phash(binTable: DataFrame, stride: Int = 32, nFrames: Int = 16,
            dim: Int = 4): DataFrame = {
    require(nFrames * dim == 64, "phash packs exactly one 64-bit word")
    val feats = frameFeatures(frameSample(binTable, stride), dim)
    val stackArgs = (0 until dim).map(d => s"$d, f$d").mkString(", ")
    val longf = feats.filter(col("frame_idx") < nFrames)
      .select(col("doc_id"), col("frame_idx"),
        expr(s"stack($dim, $stackArgs)").as(Seq("fidx", "v")))
    val perDoc = longf.groupBy("doc_id").agg(
      map_from_entries(collect_list(struct(
        (col("frame_idx") * dim + col("fidx")).cast("int").as("k"),
        col("v").as("v")))).as("m"),
      avg(col("v")).as("mu"))
    // signal - mean as a 64-vector (absent slots read 0), sign-packed
    perDoc.select(col("doc_id"),
      graft.functions.vectors.sign_pack(
        transform(sequence(lit(0), lit(63)),
          p => coalesce(element_at(col("m"), p.cast("int")), lit(0L)).cast("double")
            - col("mu"))).as("ph"))
  }

  /** Landmark FINGERPRINTS per payload — the Shazam-family audio
    * matching primitive (Wang 2003, "An Industrial-Strength Audio
    * Search Algorithm"): fixed-size windows ([[frameSample]] — the
    * audio framing), one salient "peak" per window (STUBBED: 16 bits
    * of the frame md5 stand in for the FFT peak bin this container's
    * codec-less environment can't compute — the real spectral
    * extractor drops into exactly this frame→peak slot), and each
    * peak paired with the next `fanout` peaks into landmark hashes
    * `(p_a, p_b, dt)` packed as one long. Everything besides the peak
    * stub — windowing, landmark pairing via per-doc `lead` windows
    * (one shuffle keyed on the doc, never a self-join), the packed
    * hash — IS the production algorithm shape.
    *
    * Output: (doc_id, t, lh) — one row per landmark, ~fanout rows per
    * frame, linear in corpus bytes.
    */
  def audioFingerprint(binTable: DataFrame, stride: Int = 32, fanout: Int = 3): DataFrame = {
    require(fanout >= 1 && fanout <= 15, s"fanout in [1,15] (4 packed bits), got $fanout")
    import org.apache.spark.sql.expressions.Window
    val frames = frameSample(binTable, stride)
      .select(col("doc_id"), col("frame_idx").cast("long").as("t"),
        conv(substring(col("frame_md5"), 1, 4), 16, 10).cast("long").as("p"))
    val w = Window.partitionBy("doc_id").orderBy("t")
    val leads = (1 to fanout).foldLeft(frames) { (df, k) =>
      df.withColumn(s"pb$k", lead(col("p"), k).over(w))
    }
    val stackArgs = (1 to fanout).map(k => s"${k}L, pb$k").mkString(", ")
    leads
      .select(col("doc_id"), col("t"), col("p"),
        expr(s"stack($fanout, $stackArgs)").as(Seq("dt", "pb")))
      .filter(col("pb").isNotNull)
      // (16-bit p_a, 16-bit p_b, 4-bit dt) → one long; multiplication,
      // not shifts — the DuckDB oracle replays the identical arithmetic
      .select(col("doc_id"), col("t"),
        (col("p") * 1048576L + col("pb") * 16L + col("dt")).as("lh"))
  }

  /** Clip → source MATCHING by offset-consistent landmark votes (the
    * Shazam retrieval step, and the multimodal answer to "which corpus
    * item contains this segment?" — a SUBSEQUENCE relation perceptual
    * whole-payload hashes like [[phashNearDups]] cannot see): both
    * sides fingerprint, candidates come from the landmark-hash
    * EQUI-JOIN (an inverted index over `lh` — clips are the small side
    * and broadcast; never all-pairs against the corpus), and every
    * joined landmark pair votes for the time offset `t_src − t_clip`.
    * A true containment aligns MANY landmarks at ONE offset; random
    * hash collisions scatter across offsets and die under `minVotes`
    * — the offset histogram is the noise filter, which is why the
    * scheme survives a 16-bit stubbed peak. Output:
    * (clip_id, src_id, t_offset, votes), votes ≥ minVotes.
    *
    * Deterministic end-to-end (md5 peaks + integer votes) ⇒ a DuckDB
    * oracle replays the full chain exactly.
    */
  def audioMatch(clips: DataFrame, corpus: DataFrame, stride: Int = 32,
                 fanout: Int = 3, minVotes: Int = 5): DataFrame = {
    val qf = audioFingerprint(clips, stride, fanout)
      .select(col("doc_id").as("clip_id"), col("t").as("qt"), col("lh"))
    val cf = audioFingerprint(corpus, stride, fanout)
      .select(col("doc_id").as("src_id"), col("t").as("ct"), col("lh"))
    cf.join(qf, "lh")
      .groupBy(col("clip_id"), col("src_id"), (col("ct") - col("qt")).as("t_offset"))
      .agg(count(lit(1)).as("votes"))
      .filter(col("votes") >= minVotes)
  }

  /** Near-duplicate payload pairs by perceptual hash: SimHash-style
    * banded candidate generation (the 64-bit signature splits into 4
    * bands of 16 bits; candidates = pairs agreeing on ANY band — an
    * inverted-index equi-join keyed by (band, value), never all-pairs)
    * verified by the XOR+POPCNT [[graft.functions.HammingDistance]]
    * kernel. For `tau <= 3` the banding is EXACT by pigeonhole: at
    * most 3 differing bits cannot touch all 4 bands, so every
    * qualifying pair shares a clean band and reaches verification —
    * provable recall, not a heuristic (the PropertySpec-style claim
    * MultimodalSpec pins against brute force). Returns
    * (doc_a, doc_b, hamming), doc_a < doc_b.
    */
  def phashNearDups(binTable: DataFrame, tau: Int = 3, stride: Int = 32): DataFrame = {
    // the pigeonhole exactness above holds ONLY for tau <= 3 with 4
    // bands — a larger tau would silently return partial recall, so it
    // refuses instead (widen the band count before widening tau)
    require(tau >= 0 && tau <= 3,
      s"phashNearDups: tau=$tau breaks the 4-band pigeonhole exactness bound (tau <= 3)")
    // Exact-duplicate COLLAPSE before the geometry (the same replica-
    // clique discipline as the text/vector miners): byte-copies hash to
    // the SAME 64-bit word, and at crawl scale every payload has many
    // copies — banding raw doc rows would put c identical signatures in
    // every band bucket and grow candidates ~c² per clique. Instead the
    // banded join runs over DISTINCT signatures only; clique pairs
    // (hamming 0) and cross-group member pairs are reconstructed
    // OUTPUT-BOUND afterwards (those joins produce exactly the result
    // rows, nothing transient). Distance on the single packed word is
    // plain `bit_count(xor)` — codegen'd builtins, no array wrapping.
    // materialized once: the signature pipeline (frame explode + md5 +
    // per-doc map aggregation) feeds FOUR consumers below (bands via
    // groups, both cross-expansion sides, the intra clique join) and is
    // far more expensive than its (doc_id, word) output is wide
    val sigs = phash(binTable, stride)
      .select(col("doc_id"), expr("element_at(ph, 1)").as("w"))
      .localCheckpoint()
    val groups = sigs.groupBy("w")
      .agg(min("doc_id").as("rep"), count(lit(1)).as("sz"))
    val bands = groups.select(col("w"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bv", expr("(w >> (band * 16)) & 65535"))
    val a = bands.select(col("band"), col("bv"), col("w").as("w_a"))
    val b = bands.select(col("band"), col("bv"), col("w").as("w_b"))
    // distinct-signature candidate pairs agreeing on ≥ 1 band
    val sigPairs = a.join(b, Seq("band", "bv")).filter(col("w_a") < col("w_b"))
      .select("w_a", "w_b").distinct()
      .withColumn("hamming", expr("bit_count(w_a ^ w_b)").cast("long"))
      .filter(col("hamming") <= tau)
    // cross-group expansion: every member of A × every member of B
    val cross = sigPairs
      .join(sigs.select(col("w").as("w_a"), col("doc_id").as("id_a")), "w_a")
      .join(sigs.select(col("w").as("w_b"), col("doc_id").as("id_b")), "w_b")
      .select(least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"), col("hamming"))
    // intra-group cliques: identical signatures pair at hamming 0
    val sa = sigs.select(col("w"), col("doc_id").as("doc_a"))
    val sb = sigs.select(col("w"), col("doc_id").as("doc_b"))
    val intra = sa.join(sb, "w").filter(col("doc_a") < col("doc_b"))
      .join(groups.filter(col("sz") > 1).select("w"), "w")
      .select(col("doc_a"), col("doc_b"), lit(0L).as("hamming"))
    cross.union(intra)
  }
}
