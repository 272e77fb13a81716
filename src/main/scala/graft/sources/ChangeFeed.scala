package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming / incremental consumption of a [[GraftTable]] change feed —
  * the analog of Hudi's incremental queries and its
  * streaming-read-of-commits pattern (the reference's table is consumed
  * this way for downstream sync).
  *
  * The consumer is a durable CURSOR (last consumed version, one small
  * file written through the same Hadoop FileSystem layer as the table's
  * own metadata — lives on any FS the table lives on) plus a poll:
  * each [[pollOnce]] diffs the cursor against the commit head and hands
  * the caller one incremental batch in [[GraftTable.changes]] schema
  * (table columns sorted by name + trailing `_deleted`). The first poll
  * with no cursor emits the full snapshot as the initial image
  * (`_deleted = false` everywhere) — standard CDC bootstrap.
  *
  * Delivery is at-least-once: the cursor advances only AFTER the
  * caller's apply returns, so a crash mid-apply replays the batch.
  * Replayed batches re-apply the same keyed last-wins merge/delete, so
  * a [[applyToTable]] mirror converges (idempotent state), matching the
  * semantics documented on
  * [[graft.streaming.EventStreams.streamUpsertInto]].
  *
  * Retention caveat (same as Hudi incremental reads): [[GraftTable
  * .vacuum]] drops manifests/data past its horizon, so a consumer whose
  * cursor falls behind the vacuum horizon fails loudly on its next
  * poll — size `keepVersions` to cover the slowest consumer's lag.
  * One cursor file = one consumer; give each pipeline its own cursor.
  */
object ChangeFeed {

  /** Last consumed version at this cursor, or -1 if never polled.
    * Cursor updates are atomic content swaps (write-tmp + rename), so a
    * concurrent reader sees the old value, the new value, or — in the
    * brief delete+rename window on FSs without replacing rename —
    * absence, which maps to -1 and at worst re-bootstraps (safe under
    * the at-least-once contract). Never a torn read.
    */
  def cursor(cursorPath: String): Int = {
    val p = new Path(cursorPath)
    if (GraftTable.MetaIO.exists(p)) {
      val s = GraftTable.MetaIO.readString(p).trim
      if (s.isEmpty) -1 else s.toInt
    } else -1
  }

  /** One incremental pull: if commits landed past the cursor, hand
    * `apply` ONE batch covering (cursor, head] — the initial full image
    * when no cursor exists yet — then advance the cursor to head.
    * Returns the (from, to] range applied, or None when already caught
    * up (apply is not invoked).
    */
  def pollOnce(spark: SparkSession, tablePath: String, cursorPath: String)
              (apply: (DataFrame, Int, Int) => Unit): Option[(Int, Int)] = {
    val from = cursor(cursorPath)
    val head = GraftTable.latestVersion(tablePath)
    if (head < 0 || head <= from) None
    else {
      val batch =
        if (from < 0) GraftTable.initialImage(spark, tablePath, head)
        else GraftTable.changes(spark, tablePath, from, head)
      apply(batch, from, head)
      // cursor moves only after a successful apply → at-least-once;
      // atomic swap so concurrent readers never see a torn write
      GraftTable.MetaIO.replaceString(new Path(cursorPath), head.toString)
      Some((from, head))
    }
  }

  /** Continuous consumption: a Structured Streaming ticker (rate
    * source) drives [[pollOnce]] per micro-batch, so the change feed is
    * consumed as a stream — start/stop/trigger lifecycle, graceful
    * shutdown — while batch position is owned by the durable cursor
    * (restart-safe without a streaming checkpoint: the cursor IS the
    * offset log, and replays are idempotent per the class contract).
    */
  def streamInto(spark: SparkSession, tablePath: String, cursorPath: String,
                 trigger: Trigger = Trigger.ProcessingTime("1 second"))
                (apply: (DataFrame, Int, Int) => Unit): StreamingQuery =
    spark.readStream.format("rate").option("rowsPerSecond", "1").load()
      .writeStream
      .foreachBatch { (_: DataFrame, _: Long) =>
        pollOnce(spark, tablePath, cursorPath)(apply); ()
      }
      .trigger(trigger)
      .start()

  /** Apply one change batch to a downstream GraftTable mirror: rows
    * with `_deleted = false` upsert, rows with `_deleted = true`
    * delete. Polling with this applier keeps the mirror identical to
    * the source table at every consumed version — the
    * upsert → change-stream → downstream-table round trip.
    */
  def applyToTable(spark: SparkSession, batch: DataFrame, dstPath: String,
                   keyCols: Seq[String]): Unit = {
    val upserts = batch.filter(!col("_deleted")).drop("_deleted")
    val deletes = batch.filter(col("_deleted")).drop("_deleted")
    // emptiness guards keep a deletes-only (or upserts-only) batch from
    // minting a no-op version on the other path; retrying writers so an
    // OCC loss against another mirror writer doesn't abort the poll
    if (!GraftTable.exists(dstPath)) GraftTable.create(upserts, dstPath, keyCols)
    else if (!upserts.isEmpty) GraftTable.upsertRetry(spark, dstPath, upserts)
    if (!deletes.isEmpty) GraftTable.deleteRetry(spark, dstPath, deletes)
  }
}
