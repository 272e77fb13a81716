package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained DISTINCT-COUNT views over a [[GraftTable]]
  * via mergeable HLL sketches (Spark's DataSketches builtins) — the
  * non-linear sibling of [[IncrementalView]]: `count(DISTINCT user)`
  * per group cannot be maintained by adding deltas, but a per-group
  * HLL sketch CAN — union is commutative, associative, and IDEMPOTENT
  * over the register space, so each tick sketches only the NEW rows
  * and folds them into the stored per-group sketch with `hll_union`.
  * A 100 TB event table's per-segment distinct rollup becomes one
  * O(batch) sketch pass + a bucket-pruned merge per ingest commit, and
  * any ad-hoc rollup (drop a grouping column) unions the stored
  * sketches without touching the source.
  *
  * Idempotence does the exactly-once work here: re-unioning the same
  * batch's sketch changes no register, so replays converge without the
  * row-stamp machinery [[IncrementalView]] needs — the sidecar
  * watermark (at-least-once) is the whole protocol. One nuance the
  * spec pins: register CONTENT is idempotent, but the first union over
  * a freshly-streamed sketch can shift the reported estimate within
  * the error envelope (DataSketches drops the streaming HIP estimator
  * for the composite one on union) — replays reach a fixed point, not
  * necessarily byte-equality with the pre-replay report.
  *
  * APPEND-ONLY semantics, stated loudly: HLL registers keep maxima, so
  * a DELETED source row cannot be subtracted (the standard sketch
  * tradeoff). The maintainer folds only the feed's +1 images and the
  * estimate reads "distinct keys EVER seen per group", the metric a
  * crawl/event pipeline wants. Where deletions must count, rebuild the
  * affected groups from the source ([[bootstrap]] is that, scoped by a
  * filter) — or use the exact linear view.
  */
object SketchView {

  private def watermarkPath(viewPath: String) = new Path(viewPath, "_sketch_applied")

  private def fileWatermark(viewPath: String): Int = {
    val p = watermarkPath(viewPath)
    if (GraftTable.MetaIO.exists(p)) {
      val s = GraftTable.MetaIO.readString(p).trim
      if (s.isEmpty) -1 else s.toInt
    } else -1
  }

  /** lgConfigK = 12 (the Spark/DataSketches default): ~1.6 % relative
    * standard error, 4 KB dense registers per group. One knob, fixed
    * at bootstrap — sketches of different lgK still union (the library
    * downsamples), but a fleet on one config keeps error bars uniform.
    */
  private def sketchAgg(keyCol: String): Column =
    hll_sketch_agg(col(keyCol), 12)

  /** Create the view from the source's current snapshot: one
    * aggregation pass, one sketch per group. Returns the bootstrapped
    * source version.
    */
  def bootstrap(spark: SparkSession, srcPath: String, viewPath: String,
                groupCols: Seq[String], keyCol: String,
                nbuckets: Int = 16): Int = {
    val head = GraftTable.latestVersion(srcPath)
    require(head >= 0, s"no table at $srcPath")
    val agg = GraftTable.read(spark, srcPath, head)
      .groupBy(groupCols.map(col): _*)
      .agg(sketchAgg(keyCol).as("sk"))
    GraftTable.create(agg, viewPath, groupCols, nbuckets)
    GraftTable.MetaIO.replaceString(watermarkPath(viewPath), head.toString)
    head
  }

  /** Source version the view reflects (sidecar watermark — idempotent
    * re-union makes a stale read safe, never wrong).
    */
  def appliedTo(viewPath: String): Int = fileWatermark(viewPath)

  /** One maintenance tick: sketch the (appliedTo, head] feed's NEW
    * images and union them into the stored per-group sketches through
    * one bucket-pruned merge. Returns the applied range, or None when
    * caught up.
    */
  def applyOnce(spark: SparkSession, srcPath: String, viewPath: String,
                groupCols: Seq[String], keyCol: String): Option[(Int, Int)] = {
    val from = appliedTo(viewPath)
    val head = GraftTable.latestVersion(srcPath)
    if (head <= from) return None
    // watermark lost entirely (harsher than any crash window): re-union
    // the full snapshot — idempotence makes the CDC-style re-bootstrap
    // a pure no-op for everything already folded in
    val fresh =
      if (from < 0) GraftTable.read(spark, srcPath, head)
      else GraftTable.retractions(spark, srcPath, from, head)
        .filter(col("_weight") === 1)
    // materialized once — the merge consumes it twice (bucket-id
    // collect, then the keyed join)
    val delta = fresh.groupBy(groupCols.map(col): _*)
      .agg(sketchAgg(keyCol).as("sk"))
      .localCheckpoint()
    GraftTable.mergeInto(spark, viewPath, delta,
      matchedUpdate = Some((lit(true),
        Map("sk" -> hll_union(col("t.sk"), col("s.sk"))))),
      notMatchedInsert = Some(lit(true)))
    GraftTable.MetaIO.replaceString(watermarkPath(viewPath), head.toString)
    Some((from, head))
  }

  /** Per-group distinct estimates from the stored sketches. */
  def estimates(spark: SparkSession, viewPath: String): DataFrame = {
    val v = GraftTable.read(spark, viewPath)
    val groups = v.columns.filterNot(_ == "sk").map(col).toSeq
    v.select(groups :+ hll_sketch_estimate(col("sk")).as("distinct_est"): _*)
  }

  /** Ad-hoc rollup WITHOUT the source: union the stored sketches up to
    * a coarser grouping (drop columns, or none for the grand total) —
    * the mergeability dividend: any cube cell over a 100 TB table is
    * answered from the view's sketches alone.
    */
  def rollup(spark: SparkSession, viewPath: String,
             keepCols: Seq[String]): DataFrame = {
    val v = GraftTable.read(spark, viewPath)
    val agg = hll_sketch_estimate(hll_union_agg(col("sk"), true))
      .as("distinct_est")
    if (keepCols.isEmpty) v.agg(agg)
    else v.groupBy(keepCols.map(col): _*).agg(agg)
  }
}
