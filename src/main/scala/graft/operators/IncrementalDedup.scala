package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.GraftTable

/** Exact dedup for CONTINUOUS ingestion: each arriving batch is
  * admitted against a persistent content-hash ledger instead of
  * re-deduplicating the whole corpus (reference analog: the dedup pass
  * a training-data pipeline runs on every crawl increment).
  *
  * The ledger is a [[GraftTable]] keyed by the md5 of the content
  * column, holding one row per distinct content ever admitted (hash +
  * the admitting row's non-content columns — provenance, never the
  * content itself: at 100 TB the ledger must stay a fingerprint table,
  * orders of magnitude smaller than the corpus). Admission is one
  * anti-join of the batch's hashes against the ledger plus one COW
  * upsert of the survivors' hashes — cost is O(batch + touched ledger
  * buckets), never O(corpus):
  *
  *  - the ledger scan prunes to the hash column (32 bytes/row in
  *    parquet column pruning), and the anti-join shuffles hashes, not
  *    documents;
  *  - the upsert rewrites only the ledger buckets the batch's hashes
  *    land in (size `nbuckets` for the expected ledger:batch ratio);
  *  - md5 keys distribute uniformly by construction — the shuffle and
  *    the bucket layout cannot skew, whatever the corpus looks like.
  *
  * Replay-safe by construction: re-admitting a batch finds every hash
  * already in the ledger and admits nothing — an at-least-once
  * upstream (a restarted crawl shard, a replayed stream micro-batch)
  * cannot double-admit content. Concurrent admitters are serialized by
  * the ledger table's own OCC commit.
  */
object IncrementalDedup {

  /** Admit `batch` against the ledger at `ledgerPath` (created on
    * first use, keyed by the content hash `_h`).
    *
    * Within the batch, one winner per distinct content: the
    * lexicographically smallest `keyCols` tuple — deterministic under
    * any partitioning. Across batches, first admitted wins. Rows with
    * null `textCol` are dropped (no content to fingerprint).
    *
    * Returns the admitted rows with the batch's original columns. The
    * result is lazy but PINNED to the pre-admission ledger version, so
    * evaluating it after the upsert (or after later batches) still
    * yields THIS batch's survivors.
    */
  def admitExact(spark: SparkSession, ledgerPath: String, batch: DataFrame,
                 textCol: String, keyCols: Seq[String],
                 nbuckets: Int = 16): DataFrame = {
    require(!batch.columns.contains("_h"),
      "batch must not contain a column named _h (ledger-internal)")
    val hashed = batch.filter(col(textCol).isNotNull)
      .withColumn("_h", md5(col(textCol).cast("binary")))
    val winners = hashed.groupBy(col("_h"))
      .agg(min(struct(keyCols.map(col): _*)).as("_w"))
      .select(col("_h") +: keyCols.map(c => col(s"_w.$c").as(c)): _*)
    val inBatch = hashed.join(winners, "_h" +: keyCols, "left_semi")
    val v0 = GraftTable.latestVersion(ledgerPath)
    val survivors =
      if (v0 < 0) inBatch
      else inBatch.join(
        GraftTable.read(spark, ledgerPath, v0).select("_h"), Seq("_h"), "left_anti")
    if (v0 < 0)
      GraftTable.create(survivors.drop(textCol), ledgerPath, Seq("_h"), nbuckets)
    else
      GraftTable.upsert(spark, ledgerPath, survivors.drop(textCol))
    survivors.drop("_h")
  }

  /** NEAR-dup admission against a persistent MinHash band ledger — the
    * incremental form of [[Dedup.minhashLsh]], for pipelines that must
    * reject re-crawled near-duplicates of anything EVER admitted
    * without rescanning the corpus.
    *
    * The ledger is a [[GraftTable]] keyed by `(band, bucket)`: `bands`
    * rows per admitted doc, each a banded slice of its MinHash
    * signature plus the admitting doc's id. A batch doc is rejected
    * iff it shares ≥ 1 band bucket with the ledger or with a
    * smaller-id doc of its own batch; survivors' bands are upserted.
    * Like the batch operator, a signature collision means Jaccard is
    * HIGH with the usual S-curve probability. By default there is no
    * exact-verify step — verification against FULL shingle sets would
    * require storing the corpus in the ledger again — and crawl
    * pipelines tune `numPerms`/`bands` for the τ knee and accept the
    * S-curve's false-positive tail as over-deduplication.
    *
    * `verifyTau` turns that tradeoff into an opt-in precision knob at
    * bounded cost: each admitted doc also persists a BOTTOM-K sketch
    * (its `sketchK` smallest shingle hashes — k longs, not the
    * shingle set) in a sibling sketch table, and a band collision
    * only rejects if the bottom-k Jaccard estimate of the colliding
    * PAIR is ≥ τ. The estimate is |U ∩ A ∩ B| / |U| with U the k
    * smallest of A ∪ B — unbiased with σ ≈ √(J(1−J)/k), and EXACT
    * whenever both docs have ≤ k shingles. Cost per candidate pair is
    * one k-long array intersection; the candidate set is only what
    * the bands collide, so the verify join is O(collisions · k),
    * never O(corpus). A colliding admitted doc with no stored sketch
    * (ledger written before verify was enabled) rejects
    * conservatively, matching band-only behavior.
    *
    * Same scale shape as [[admitExact]]: band keys are uniform
    * hashes, the anti-join ships (band, bucket) pairs only, the
    * upsert touches only collided buckets; replaying a batch admits
    * nothing (every band of every survivor is now in the ledger —
    * exact self-collision, and under verify the estimate of a doc
    * against its own stored sketch is 1).
    *
    * `idCol` must be a single 64-bit id (the MinHash machinery's doc
    * identity). Returns the admitted rows.
    */
  def admitMinhash(spark: SparkSession, ledgerPath: String, batch: DataFrame,
                   idCol: String, textCol: String,
                   numPerms: Int = 128, bands: Int = 32,
                   nbuckets: Int = 16,
                   verifyTau: Option[Double] = None, sketchK: Int = 64): DataFrame = {
    val docs = batch.filter(col(textCol).isNotNull)
    // (doc_id, band, bucket) — one row per band per doc; docs whose
    // text yields no shingles (< k tokens) have no bands and are
    // admitted verbatim (nothing to collide on, nothing to record).
    // Persisted: feeds the ledger probe, the in-batch self-join, and
    // the ledger write within this call; released before returning
    // (a later re-evaluation of the lazy survivors just recomputes).
    val sh = Dedup.hashedShingles(docs, idCol, textCol)
    val banded = Dedup.bandedFromShingles(sh, numPerms, bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val v0 = GraftTable.latestVersion(ledgerPath)
    val sketchPath = ledgerPath + "_sketches"

    val rejected = verifyTau match {
      case None =>
        val vsLedger =
          if (v0 < 0) banded.limit(0).select(col("doc_id"))
          else banded.join(
            GraftTable.read(spark, ledgerPath, v0).select("band", "bucket"),
            Seq("band", "bucket"), "left_semi").select(col("doc_id"))
        val vsBatch = banded.as("a").join(banded.as("b"),
            col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
              col("b.doc_id") < col("a.doc_id"))
          .select(col("a.doc_id"))
        vsLedger.union(vsBatch).distinct()

      case Some(tau) =>
        // bottom-k Jaccard estimate of two sketches (k smallest of the
        // union vs the pair's common elements)
        def estimate(sa: org.apache.spark.sql.Column, sb: org.apache.spark.sql.Column) = {
          val u = slice(array_sort(array_union(sa, sb)), 1, sketchK)
          size(array_intersect(u, array_intersect(sa, sb))).cast("double") /
            size(u).cast("double")
        }
        val sketches = sh.select(col("doc_id"),
          slice(array_sort(col("hs")), 1, sketchK).as("sk"))
        val vsLedger =
          if (v0 < 0) banded.limit(0).select(col("doc_id"))
          else {
            val cands = banded.join(
                GraftTable.read(spark, ledgerPath, v0)
                  .select(col("band"), col("bucket"), col("admitted_id")),
                Seq("band", "bucket"))
              .select(col("doc_id"), col("admitted_id")).distinct()
            val sv = GraftTable.latestVersion(sketchPath)
            val stored =
              if (sv < 0) cands.limit(0).select(col("admitted_id"))
                .withColumn("lsk", lit(null).cast("array<bigint>"))
              else GraftTable.read(spark, sketchPath, sv)
                .select(col("admitted_id"), col("sk").as("lsk"))
            cands.join(sketches, "doc_id")
              .join(stored, Seq("admitted_id"), "left")
              // missing stored sketch → conservative band-only rejection
              .filter(coalesce(estimate(col("sk"), col("lsk")), lit(1.0)) >= tau)
              .select(col("doc_id"))
          }
        val vsBatch = banded.as("a").join(banded.as("b"),
            col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
              col("b.doc_id") < col("a.doc_id"))
          .select(col("a.doc_id"), col("b.doc_id").as("other")).distinct()
          .join(sketches, "doc_id")
          .join(sketches.select(col("doc_id").as("other"), col("sk").as("osk")), "other")
          .filter(estimate(col("sk"), col("osk")) >= tau)
          .select(col("doc_id"))
        vsLedger.union(vsBatch).distinct()
    }

    val survivors = docs.join(
      rejected.withColumnRenamed("doc_id", idCol), Seq(idCol), "left_anti")
    val ledgerRows = banded
      .join(survivors.select(col(idCol).as("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("band"), col("bucket"), col("doc_id").as("admitted_id"))
    if (v0 < 0)
      GraftTable.create(ledgerRows, ledgerPath, Seq("band", "bucket"), nbuckets)
    else
      GraftTable.upsert(spark, ledgerPath, ledgerRows)
    verifyTau.foreach { _ =>
      val survSketches = sh
        .join(survivors.select(col(idCol).as("doc_id")), Seq("doc_id"), "left_semi")
        .select(col("doc_id").as("admitted_id"),
          slice(array_sort(col("hs")), 1, sketchK).as("sk"))
      if (GraftTable.latestVersion(sketchPath) < 0)
        GraftTable.create(survSketches, sketchPath, Seq("admitted_id"), nbuckets)
      else
        GraftTable.upsert(spark, sketchPath, survSketches)
    }
    banded.unpersist(blocking = false)
    sh.unpersist(blocking = false)
    survivors
  }

  /** CONTINUOUS curation, end to end: follow a live [[GraftTable]]'s
    * change feed (`readStream.format("graft")`), admit each
    * micro-batch against the ledger, and upsert the survivors into a
    * curated destination table — crawl table in, deduplicated corpus
    * out, no batch job in the loop.
    *
    * Each micro-batch is one [[admitExact]] call (one anti-join + one
    * ledger upsert, O(batch)) plus one keyed upsert of the survivors
    * into `dstTablePath`; deleted change-feed rows are dropped
    * (deletion is not new content — the curated table keeps the
    * first-seen copy). Delivery: at-least-once per micro-batch
    * (pass `checkpointLocation` to survive restarts); a replayed
    * batch re-admits nothing and re-upserts identical rows, so the
    * ledger AND the curated table converge — the same idempotence
    * argument as [[graft.streaming.EventStreams.streamUpsertInto]].
    */
  def streamAdmitExact(spark: SparkSession, srcTablePath: String, ledgerPath: String,
                       dstTablePath: String, textCol: String, keyCols: Seq[String],
                       checkpointLocation: Option[String] = None,
                       trigger: org.apache.spark.sql.streaming.Trigger =
                         org.apache.spark.sql.streaming.Trigger.AvailableNow(),
                       nbuckets: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = spark.readStream.format("graft").load(srcTablePath)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val live = batch.filter(!col("_deleted")).drop("_deleted")
        val admitted = admitExact(spark, ledgerPath, live, textCol, keyCols, nbuckets)
        if (!GraftTable.exists(dstTablePath))
          GraftTable.create(admitted, dstTablePath, keyCols, nbuckets)
        else
          GraftTable.upsert(spark, dstTablePath, admitted)
        ()
      }
      .trigger(trigger)
    checkpointLocation.fold(writer)(cp => writer.option("checkpointLocation", cp)).start()
  }
}
