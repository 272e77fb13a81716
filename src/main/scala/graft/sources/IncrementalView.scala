package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate over a
  * [[GraftTable]] — the lakehouse answer to "keep `SELECT g, count(*),
  * sum(m) … GROUP BY g` fresh over a 100 TB table without ever
  * recomputing it": each maintenance tick folds the table's
  * RETRACTION feed ([[GraftTable.retractions]], a z-set: +1 new
  * images, −1 retracted images) into the view by pure addition. This
  * is classical delta-propagation IVM (Materialize/DBSP's linear
  * operator case): because count and sum are linear in the z-set, the
  * view delta is just the same aggregate over the feed batch, and
  * applying it is a keyed merge — no per-key consumer state, no
  * re-read of the source beyond the feed's own changed-bucket cost.
  *
  * Cost per tick: O(source buckets changed in the range) to produce
  * the feed + one bucket-pruned [[GraftTable.mergeInto]] against only
  * the view buckets the touched groups hash into. A 0.1 % write to
  * the source reads ~0.1 % of it and rewrites only the affected
  * slice of the (already much smaller) view.
  *
  * Exactly-once without a second transaction log: the maintenance
  * merge STAMPS every row it writes with `_applied_to = head`, so the
  * source watermark rides inside the view's own atomic commit — a
  * crash can never separate "delta applied" from "watermark
  * advanced". [[appliedTo]] = max(row stamp, sidecar file). The
  * sidecar (`_ivm_applied`, written AFTER each merge) only matters
  * for batches that stamp no rows — delete-only and no-op batches —
  * and re-applying exactly those is idempotent (deleting an absent
  * group is a no-op; an empty delta merges nothing), so the
  * at-least-once file write closes the loop without weakening the
  * guarantee. One maintainer per view (same contract as
  * [[ChangeFeed]]'s one-cursor-one-consumer).
  *
  * Grouping keys must be non-null (they are the view table's record
  * keys). `avg`/`stddev` views derive from (cnt, sum, sum-of-squares)
  * columns — all linear, all maintainable here.
  */
object IncrementalView {

  private def watermarkPath(viewPath: String) = new Path(viewPath, "_ivm_applied")

  private def fileWatermark(viewPath: String): Int = {
    val p = watermarkPath(viewPath)
    if (GraftTable.MetaIO.exists(p)) {
      val s = GraftTable.MetaIO.readString(p).trim
      if (s.isEmpty) -1 else s.toInt
    } else -1
  }

  /** The aggregate of a ±-weighted feed: cnt = Σ weight, each measure
    * = Σ expr·weight. Shared verbatim by bootstrap (whole snapshot at
    * weight +1) and by every delta batch — the view and its deltas
    * can't drift because they are the same plan.
    */
  private def aggregate(feed: DataFrame, groupCols: Seq[String],
                        sums: Map[String, Column]): DataFrame = {
    val aggs = sum(col("_weight")).cast("long").as("cnt") +:
      sums.toSeq.sortBy(_._1).map { case (n, e) =>
        sum(e * col("_weight")).as(n)
      }
    feed.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Create the view table from the source's CURRENT snapshot (pinned
    * at one version) and stamp it as applied through that version.
    * Returns the bootstrapped source version.
    *
    * `enrich` extends the maintainable class from single-table GROUP
    * BYs to STAR-SCHEMA rollups: it transforms the ±-weighted feed
    * (carrying `_weight`) before aggregation — canonically a join to
    * dimension tables (`fact ⋈ dim GROUP BY dim.attr`), the standard
    * delta-join rule Δ(A ⋈ D) = ΔA ⋈ D for a STATIC D. Requirements,
    * stated loudly: enrich must be deterministic, row-wise (each feed
    * row maps to exactly one output row, `_weight` carried through —
    * an inner 1:1/N:1 join qualifies; aggregations or row-multiplying
    * joins do not), and the dimension side must not change between
    * ticks — a changing dimension needs the symmetric
    * A ⋈ ΔD term, which is a rebootstrap here.
    */
  def bootstrap(spark: SparkSession, srcPath: String, viewPath: String,
                groupCols: Seq[String], sums: Map[String, Column],
                nbuckets: Int = 16,
                enrich: DataFrame => DataFrame = identity): Int = {
    val head = GraftTable.latestVersion(srcPath)
    require(head >= 0, s"no table at $srcPath")
    val snap = GraftTable.read(spark, srcPath, head).withColumn("_weight", lit(1))
    val agg = aggregate(enrich(snap), groupCols, sums)
      .withColumn("_applied_to", lit(head))
    GraftTable.create(agg, viewPath, groupCols, nbuckets)
    GraftTable.MetaIO.replaceString(watermarkPath(viewPath), head.toString)
    head
  }

  /** Source version the view reflects: the max row stamp (carried by
    * the view's atomic commits) or the sidecar watermark, whichever is
    * ahead — see the class contract for why the pair is exactly-once.
    */
  def appliedTo(spark: SparkSession, viewPath: String): Int = {
    val rows = GraftTable.read(spark, viewPath)
      .agg(max(col("_applied_to"))).head()
    val rowW = if (rows.isNullAt(0)) -1 else rows.getInt(0)
    math.max(rowW, fileWatermark(viewPath))
  }

  /** One maintenance tick: fold the (appliedTo, source head] retraction
    * feed into the view. Returns the applied range, or None when
    * already caught up. `groupCols`/`sums` must be the bootstrap's.
    */
  def applyOnce(spark: SparkSession, srcPath: String, viewPath: String,
                groupCols: Seq[String], sums: Map[String, Column],
                enrich: DataFrame => DataFrame = identity): Option[(Int, Int)] = {
    val from = appliedTo(spark, viewPath)
    val head = GraftTable.latestVersion(srcPath)
    if (head <= from) return None
    // watermark at -1 means the view is EMPTY (every stamped row gone)
    // AND the sidecar is lost — the full snapshot at weight +1 is then
    // exactly the delta that rebuilds it
    val feed =
      if (from < 0)
        GraftTable.read(spark, srcPath, head).withColumn("_weight", lit(1))
      else GraftTable.retractions(spark, srcPath, from, head)
    val delta = aggregate(enrich(feed), groupCols, sums)
    // groups whose delta is all-zero (e.g. an update that only touched
    // non-measure columns) need no write at all
    val sumNames = sums.keys.toSeq.sorted
    // materialized once: the merge below consumes the delta twice
    // (bucket-id collect, then the keyed join) — without the checkpoint
    // the whole feed pipeline (two endpoint-state reads + two shuffles)
    // would execute twice
    val touched = delta.filter(
      (col("cnt") =!= 0L) +: sumNames.map(n => col(n) =!= 0) reduce (_ || _))
      .withColumn("_applied_to", lit(head))
      .localCheckpoint()
    // one atomic, bucket-pruned merge: add deltas to surviving groups,
    // drop groups whose count reaches zero, insert newborn groups
    // (insert values fall through from the source columns, which are
    // exactly the group's delta = its full aggregate when new)
    GraftTable.mergeInto(spark, viewPath, touched,
      matchedDelete = Some(col("t.cnt") + col("s.cnt") === 0L),
      matchedUpdate = Some((lit(true),
        (sumNames.map(n => n -> (col(s"t.$n") + col(s"s.$n"))) :+
          ("cnt" -> (col("t.cnt") + col("s.cnt"))) :+
          ("_applied_to" -> (lit(head): Column))).toMap)),
      notMatchedInsert = Some(col("s.cnt") > 0L))
    // at-least-once sidecar for stamp-free (delete-only/no-op) batches;
    // re-applying those is idempotent, so a crash before this line is safe
    GraftTable.MetaIO.replaceString(watermarkPath(viewPath), head.toString)
    Some((from, head))
  }

  /** Read the view's business columns (drops the watermark stamp). */
  def read(spark: SparkSession, viewPath: String): DataFrame =
    GraftTable.read(spark, viewPath).drop("_applied_to")

  /** Continuous maintenance: a Structured Streaming ticker drives
    * [[applyOnce]] per micro-batch (the [[ChangeFeed.streamInto]]
    * pattern) — the view follows the source table live, with the
    * start/stop/trigger lifecycle and NO streaming checkpoint to
    * manage: the view's own watermark is the offset log, and restarts
    * resume exactly where the last atomic merge left off.
    */
  def streamMaintain(spark: SparkSession, srcPath: String, viewPath: String,
                     groupCols: Seq[String], sums: Map[String, Column],
                     trigger: org.apache.spark.sql.streaming.Trigger =
                       org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"),
                     enrich: DataFrame => DataFrame = identity)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("rate").option("rowsPerSecond", "1").load()
      .writeStream
      .foreachBatch { (_: DataFrame, _: Long) =>
        applyOnce(spark, srcPath, viewPath, groupCols, sums, enrich); ()
      }
      .trigger(trigger)
      .start()
}
