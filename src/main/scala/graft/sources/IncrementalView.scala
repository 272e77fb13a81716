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
  * Exactly-once without a second transaction log: each tick writes an
  * INTENT sidecar (`_ivm_intent` = target watermark + the view's
  * commit version BEFORE the merge) immediately before the atomic
  * merge, and the applied watermark (`_ivm_applied`) immediately
  * after. [[appliedTo]] resolves the pair: an intent whose recorded
  * pre-merge version is BEHIND the view's current head proves the
  * merge committed, so the watermark can never regress past a commit
  * whose effects are already in the view — including pure-group-death
  * batches that stamp no surviving row (the crash window a row-stamp
  * scheme alone cannot close: a dead group re-inserted by a later
  * source commit would net death + rebirth into a zero/partial delta
  * on replay and be dropped by the insert guard). A crash before the
  * merge leaves the view head at the intent's pre-version → the
  * intent is ignored and the full delta replays. One maintainer per
  * view (same contract as [[ChangeFeed]]'s one-cursor-one-consumer);
  * rows also carry an `_applied_to` provenance stamp.
  *
  * Grouping keys must be non-null (they are the view table's record
  * keys). Measure semantics are `SUM(COALESCE(m, 0))`: a NULL measure
  * contributes zero — bootstrap and every delta share one aggregate
  * plan, so an all-NULL group holds 0, never NULL, and incremental
  * maintenance can never null out an accumulated sum. `avg`/`stddev`
  * views derive from (cnt, sum, sum-of-squares) columns — all linear,
  * all maintainable here.
  */
object IncrementalView {

  private def watermarkPath(viewPath: String) = new Path(viewPath, "_ivm_applied")
  private def intentPath(viewPath: String) = new Path(viewPath, "_ivm_intent")
  private def dimsPath(viewPath: String) = new Path(viewPath, "_ivm_dims")

  private def readMeta(p: Path): Option[String] =
    if (GraftTable.MetaIO.exists(p)) {
      val s = GraftTable.MetaIO.readString(p).trim
      if (s.isEmpty) None else Some(s)
    } else None

  /** Watermark payload proven applied by the intent protocol: the
    * intent records the view's commit version BEFORE its merge; the
    * view head having moved past it proves the merge committed.
    */
  private def resolvedIntent(viewPath: String): Option[String] =
    readMeta(intentPath(viewPath)).flatMap { s =>
      val cut = s.lastIndexOf('|')
      val vPre = s.substring(cut + 1).toInt
      if (GraftTable.latestVersion(viewPath) > vPre) Some(s.substring(0, cut))
      else None
    }

  /** The aggregate of a ±-weighted feed: cnt = Σ weight, each measure
    * = Σ coalesce(expr, 0)·weight. Shared verbatim by bootstrap (whole
    * snapshot at weight +1) and by every delta batch — the view and
    * its deltas can't drift because they are the same plan. The
    * coalesce is load-bearing: without it an all-NULL-measure feed
    * batch would null the delta, and t.sum + NULL would permanently
    * poison the accumulator.
    */
  private def aggregate(feed: DataFrame, groupCols: Seq[String],
                        sums: Map[String, Column]): DataFrame = {
    val aggs = sum(col("_weight")).cast("long").as("cnt") +:
      sums.toSeq.sortBy(_._1).map { case (n, e) =>
        sum(coalesce(e, lit(0)) * col("_weight")).as(n)
      }
    feed.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Zero-delta filter + intent-protocol atomic merge, shared by the
    * single-table and joined maintenance paths. `wmPayload` is the
    * watermark string this tick advances to ("head" or "headF|headD").
    */
  private def mergeDelta(spark: SparkSession, viewPath: String, delta: DataFrame,
                         sumNames: Seq[String], stamp: Int, wmPayload: String): Unit = {
    // groups whose delta is all-zero (e.g. an update that only touched
    // non-measure columns) need no write at all. Materialized once: the
    // merge below consumes the delta twice (bucket-id collect, then the
    // keyed join) — without the checkpoint the whole feed pipeline
    // (endpoint-state reads + shuffles) would execute twice.
    val touched = delta.filter(
      (col("cnt") =!= 0L) +: sumNames.map(n => col(n) =!= 0) reduce (_ || _))
      .withColumn("_applied_to", lit(stamp))
      .localCheckpoint()
    // intent BEFORE the merge: records where the view head stands now,
    // so a crash anywhere after the (atomic) merge still proves the
    // merge landed — see the class contract
    GraftTable.MetaIO.replaceString(intentPath(viewPath),
      s"$wmPayload|${GraftTable.latestVersion(viewPath)}")
    // one atomic, bucket-pruned merge: add deltas to surviving groups,
    // drop groups whose count reaches zero, insert newborn groups
    // (insert values fall through from the source columns, which are
    // exactly the group's delta = its full aggregate when new)
    GraftTable.mergeInto(spark, viewPath, touched,
      matchedDelete = Some(col("t.cnt") + col("s.cnt") === 0L),
      matchedUpdate = Some((lit(true),
        (sumNames.map(n => n -> (col(s"t.$n") + col(s"s.$n"))) :+
          ("cnt" -> (col("t.cnt") + col("s.cnt"))) :+
          ("_applied_to" -> (lit(stamp): Column))).toMap)),
      notMatchedInsert = Some(col("s.cnt") > 0L))
    GraftTable.MetaIO.replaceString(watermarkPath(viewPath), wmPayload)
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
    * ticks. ENFORCED when the dims are GraftTables: pass their paths
    * as `staticDims` and every [[applyOnce]] refuses loudly if a dim
    * head moved (a silently-updated dimension would otherwise yield a
    * silently wrong view). A dimension that legitimately changes needs
    * the symmetric A ⋈ ΔD term — use [[bootstrapJoined]].
    */
  def bootstrap(spark: SparkSession, srcPath: String, viewPath: String,
                groupCols: Seq[String], sums: Map[String, Column],
                nbuckets: Int = 16,
                enrich: DataFrame => DataFrame = identity,
                staticDims: Seq[String] = Nil): Int = {
    val head = GraftTable.latestVersion(srcPath)
    require(head >= 0, s"no table at $srcPath")
    val snap = GraftTable.read(spark, srcPath, head).withColumn("_weight", lit(1))
    val agg = aggregate(enrich(snap), groupCols, sums)
      .withColumn("_applied_to", lit(head))
    GraftTable.create(agg, viewPath, groupCols, nbuckets)
    if (staticDims.nonEmpty)
      GraftTable.MetaIO.replaceString(dimsPath(viewPath),
        staticDims.map(p => s"$p@${GraftTable.latestVersion(p)}").mkString(";"))
    GraftTable.MetaIO.replaceString(watermarkPath(viewPath), head.toString)
    head
  }

  /** Source version the view reflects: the applied sidecar or the
    * resolved intent, whichever is ahead — see the class contract for
    * why the pair is exactly-once. (Metadata-only: no view scan.)
    */
  def appliedTo(spark: SparkSession, viewPath: String): Int = {
    val wm = readMeta(watermarkPath(viewPath)).map(_.toInt).getOrElse(-1)
    math.max(wm, resolvedIntent(viewPath).map(_.toInt).getOrElse(-1))
  }

  /** One maintenance tick: fold the (appliedTo, source head] retraction
    * feed into the view. Returns the applied range, or None when
    * already caught up. `groupCols`/`sums`/`enrich` must be the
    * bootstrap's. Refuses loudly if any `staticDims` table pinned at
    * bootstrap has advanced — rebootstrap (or use the joined variant)
    * to pick up dimension changes.
    */
  def applyOnce(spark: SparkSession, srcPath: String, viewPath: String,
                groupCols: Seq[String], sums: Map[String, Column],
                enrich: DataFrame => DataFrame = identity): Option[(Int, Int)] = {
    readMeta(dimsPath(viewPath)).foreach { pins =>
      pins.split(";").foreach { pin =>
        val cut = pin.lastIndexOf('@')
        val (p, v) = (pin.substring(0, cut), pin.substring(cut + 1).toInt)
        val now = GraftTable.latestVersion(p)
        if (now != v) throw new IllegalStateException(
          s"incremental view $viewPath pinned dimension $p at version $v but it is " +
            s"now at $now — the Δfeed ⋈ D rule is only sound for a static D; " +
            "rebootstrap the view, or maintain the dimension with bootstrapJoined/applyOnceJoined")
      }
    }
    val from = appliedTo(spark, viewPath)
    val head = GraftTable.latestVersion(srcPath)
    if (head <= from) return None
    // watermark at -1 means the sidecars are lost — the full snapshot
    // at weight +1 is then exactly the delta that rebuilds an empty view
    val feed =
      if (from < 0)
        GraftTable.read(spark, srcPath, head).withColumn("_weight", lit(1))
      else GraftTable.retractions(spark, srcPath, from, head)
    val delta = aggregate(enrich(feed), groupCols, sums)
    mergeDelta(spark, viewPath, delta, sums.keys.toSeq.sorted, head, head.toString)
    Some((from, head))
  }

  // ---- extrema views: MIN/MAX, the first non-linear aggregate -------------

  /** Bootstrap a MIN/MAX view: `SELECT g…, count(*) cnt, min(m)
    * <n>_min, max(m) <n>_max GROUP BY g…` over the source snapshot.
    * `extremes` maps a measure NAME to its row expression; the view
    * stores `<name>_min`/`<name>_max` columns. NULL measure values are
    * ignored exactly as SQL MIN/MAX ignores them (an all-NULL group
    * holds NULL extrema).
    *
    * MIN/MAX is NOT linear in the z-set — an insertion only ever
    * improves an extremum (`least`/`greatest` fold, O(delta)), but a
    * RETRACTION of the current extremum needs the next-best value,
    * which the view does not hold. [[applyOnceExtrema]] therefore
    * splits each tick's groups: groups whose retracted values provably
    * cannot displace the stored extremum (every retracted m strictly
    * inside the stored bounds) fold additively; the rest RECOMPUTE
    * their extrema with one aggregate over the head snapshot filtered
    * to exactly those groups (a keyed semi-join — with the group key
    * z-ordered or stats-clustered this prunes to the touched files;
    * worst case it is one scan, paid only on ticks that retract a
    * current extremum — the same loudly-stated term as the joined
    * view's A ⋈ ΔD scan). This is the standard IVM treatment of
    * non-invertible aggregates (DBSP/Materialize's reduce operator);
    * the alternative — keeping per-(group, value) counts — trades it
    * for state proportional to the DISTINCT VALUES of the source,
    * which at 100 TB is the worse deal for high-cardinality measures.
    */
  def bootstrapExtrema(spark: SparkSession, srcPath: String, viewPath: String,
                       groupCols: Seq[String], extremes: Map[String, Column],
                       nbuckets: Int = 16): Int = {
    val head = GraftTable.latestVersion(srcPath)
    require(head >= 0, s"no table at $srcPath")
    val snap = GraftTable.read(spark, srcPath, head)
    val aggs = count(lit(1)).cast("long").as("cnt") +:
      extremes.toSeq.sortBy(_._1).flatMap { case (n, e) =>
        Seq(min(e).as(s"${n}_min"), max(e).as(s"${n}_max"))
      }
    val agg = snap.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .withColumn("_applied_to", lit(head))
    GraftTable.create(agg, viewPath, groupCols, nbuckets)
    GraftTable.MetaIO.replaceString(watermarkPath(viewPath), head.toString)
    head
  }

  /** One maintenance tick of an extrema view — see [[bootstrapExtrema]]
    * for the fold-or-recompute split. Exactly-once through the same
    * intent protocol as the linear views; the merge carries ABSOLUTE
    * new values (not deltas), so the view row after the merge is the
    * recomputed/folded truth for its group.
    */
  def applyOnceExtrema(spark: SparkSession, srcPath: String, viewPath: String,
                       groupCols: Seq[String],
                       extremes: Map[String, Column]): Option[(Int, Int)] = {
    val from = appliedTo(spark, viewPath)
    val head = GraftTable.latestVersion(srcPath)
    if (head <= from) return None
    val names = extremes.keys.toSeq.sorted
    val feed =
      if (from < 0)
        GraftTable.read(spark, srcPath, head).withColumn("_weight", lit(1))
      else GraftTable.retractions(spark, srcPath, from, head)
    val w = col("_weight")
    // one pass over the feed: count delta + per-measure extrema of the
    // inserted (+) and retracted (−) sides separately
    val dAggs = sum(w).cast("long").as("cnt_d") +:
      names.flatMap { n =>
        val e = extremes(n)
        Seq(min(when(w > 0, e)).as(s"${n}_min_p"), max(when(w > 0, e)).as(s"${n}_max_p"),
          min(when(w < 0, e)).as(s"${n}_min_m"), max(when(w < 0, e)).as(s"${n}_max_m"))
      }
    val delta = feed.groupBy(groupCols.map(col): _*).agg(dAggs.head, dAggs.tail: _*)
    val stored = GraftTable.read(spark, viewPath)
      .select((groupCols.map(col) :+ col("cnt").as("cnt_s")) ++
        names.flatMap(n => Seq(col(s"${n}_min").as(s"${n}_min_s"),
          col(s"${n}_max").as(s"${n}_max_s"))): _*)
    // delta ⋈ stored, materialized once — consumed by the unsafe-key
    // selection AND the final assembly
    val joined = delta.join(stored, groupCols, "left").localCheckpoint()
    val isNew = col("cnt_s").isNull
    // a group is unsafe iff some retracted value reaches the stored
    // bound (equality included: the retracted row may BE the extremum;
    // a duplicate holding the same value would survive, but the view
    // cannot tell without per-value counts — recompute decides)
    val unsafe = !isNew && names.map { n =>
      (col(s"${n}_min_m").isNotNull &&
        (col(s"${n}_min_s").isNull || col(s"${n}_min_m") <= col(s"${n}_min_s"))) ||
      (col(s"${n}_max_m").isNotNull &&
        (col(s"${n}_max_s").isNull || col(s"${n}_max_m") >= col(s"${n}_max_s")))
    }.reduce(_ || _)
    val unsafeKeys = joined.filter(unsafe).select(groupCols.map(col): _*)
    val rAggs = lit(true).as("_rec") +: names.flatMap { n =>
      Seq(min(extremes(n)).as(s"${n}_min_r"), max(extremes(n)).as(s"${n}_max_r"))
    }
    val rec = GraftTable.read(spark, srcPath, head)
      .join(unsafeKeys, groupCols, "left_semi")
      .groupBy(groupCols.map(col): _*).agg(rAggs.head, rAggs.tail: _*)
    val full = joined.join(rec, groupCols, "left")
    def minFinal(n: String) = when(col("_rec").isNotNull, col(s"${n}_min_r"))
      .otherwise(when(isNew, col(s"${n}_min_p"))
        .otherwise(least(col(s"${n}_min_s"), col(s"${n}_min_p"))))
    def maxFinal(n: String) = when(col("_rec").isNotNull, col(s"${n}_max_r"))
      .otherwise(when(isNew, col(s"${n}_max_p"))
        .otherwise(greatest(col(s"${n}_max_s"), col(s"${n}_max_p"))))
    val cntFinal = coalesce(col("cnt_s"), lit(0L)) + col("cnt_d")
    // drop no-op groups: count unchanged, not recomputed, extrema equal
    val changed = (col("cnt_d") =!= 0L) || col("_rec").isNotNull || isNew ||
      names.map(n => !(minFinal(n) <=> col(s"${n}_min_s")) ||
        !(maxFinal(n) <=> col(s"${n}_max_s"))).reduce(_ || _)
    val outCols = (groupCols.map(col) :+ cntFinal.as("cnt")) ++
      names.flatMap(n => Seq(minFinal(n).as(s"${n}_min"), maxFinal(n).as(s"${n}_max")))
    val touched = full.filter(changed).select(outCols: _*)
      .withColumn("_applied_to", lit(head))
      .localCheckpoint()
    GraftTable.MetaIO.replaceString(intentPath(viewPath),
      s"$head|${GraftTable.latestVersion(viewPath)}")
    GraftTable.mergeInto(spark, viewPath, touched,
      matchedDelete = Some(col("s.cnt") === 0L),
      matchedUpdate = Some((lit(true),
        ((names.flatMap(n => Seq(s"${n}_min", s"${n}_max")) :+ "cnt" :+ "_applied_to")
          .map(c => c -> col(s"s.$c"))).toMap)),
      notMatchedInsert = Some(col("s.cnt") > 0L))
    GraftTable.MetaIO.replaceString(watermarkPath(viewPath), head.toString)
    Some((from, head))
  }

  // ---- joined views: fact ⋈ CHANGING dimension ----------------------------

  private def joinWatermarks(viewPath: String): (Int, Int) = {
    def parse(s: String): (Int, Int) = {
      val Array(f, d) = s.split("\\|"); (f.toInt, d.toInt)
    }
    val wm = readMeta(watermarkPath(viewPath)).map(parse).getOrElse((-1, -1))
    val in = resolvedIntent(viewPath).map(parse).getOrElse((-1, -1))
    // elementwise max: both components advance monotonically under the
    // one-maintainer contract
    (math.max(wm._1, in._1), math.max(wm._2, in._2))
  }

  /** Bootstrap a view over `fact ⋈ dim` where BOTH sides are
    * GraftTables that may change: the N:1 equi-join
    * `fact.factKey = dim.dimKey` (column names must differ), grouped
    * by `groupCols` (fact and/or dim attributes). Returns the
    * (factVersion, dimVersion) pair the view reflects.
    */
  def bootstrapJoined(spark: SparkSession, srcPath: String, dimPath: String,
                      factKey: String, dimKey: String, viewPath: String,
                      groupCols: Seq[String], sums: Map[String, Column],
                      nbuckets: Int = 16): (Int, Int) = {
    require(factKey != dimKey,
      "factKey and dimKey must be distinct column names (the joined feed carries both)")
    val headF = GraftTable.latestVersion(srcPath)
    val headD = GraftTable.latestVersion(dimPath)
    require(headF >= 0, s"no table at $srcPath")
    require(headD >= 0, s"no table at $dimPath")
    val fact = GraftTable.read(spark, srcPath, headF).withColumn("_weight", lit(1))
    val dim = GraftTable.read(spark, dimPath, headD)
    val feed = fact.join(dim, fact(factKey) === dim(dimKey))
    val agg = aggregate(feed, groupCols, sums).withColumn("_applied_to", lit(headF))
    GraftTable.create(agg, viewPath, groupCols, nbuckets)
    GraftTable.MetaIO.replaceString(watermarkPath(viewPath), s"$headF|$headD")
    (headF, headD)
  }

  /** (factVersion, dimVersion) the joined view reflects. */
  def appliedToJoined(spark: SparkSession, viewPath: String): (Int, Int) =
    joinWatermarks(viewPath)

  /** One maintenance tick of a joined view, correct under changes to
    * EITHER side. The z-set identity (weights multiply through the
    * join):
    *
    *   A_h ⋈ D_h − A_f ⋈ D_f  =  ΔA ⋈ D_h  +  A_f ⋈ ΔD
    *
    * — the fact delta joins the dimension's NEW snapshot, and the
    * dimension delta joins the fact's OLD snapshot. Each term carries
    * exactly one `_weight` (the changed side's), so the shared
    * aggregate consumes the union unchanged. Cost: the ΔA term is the
    * usual bucket-pruned feed; the ΔD term scans the fact snapshot
    * once, keyed-joined to the (typically tiny) dim delta — paid ONLY
    * on ticks where the dimension actually moved, which is exactly
    * the full-rescan a changed dimension logically requires (every
    * fact row's group assignment may have changed).
    */
  def applyOnceJoined(spark: SparkSession, srcPath: String, dimPath: String,
                      factKey: String, dimKey: String, viewPath: String,
                      groupCols: Seq[String], sums: Map[String, Column])
      : Option[((Int, Int), (Int, Int))] = {
    val (fromF, fromD) = joinWatermarks(viewPath)
    require(fromF >= 0 && fromD >= 0,
      s"joined view at $viewPath has no watermark — bootstrapJoined first")
    val headF = GraftTable.latestVersion(srcPath)
    val headD = GraftTable.latestVersion(dimPath)
    if (headF <= fromF && headD <= fromD) return None
    val terms = Seq.newBuilder[DataFrame]
    if (headF > fromF) {
      val factDelta = GraftTable.retractions(spark, srcPath, fromF, headF)
      val dimNew = GraftTable.read(spark, dimPath, headD)
      terms += factDelta.join(dimNew, factDelta(factKey) === dimNew(dimKey))
    }
    if (headD > fromD) {
      val factOld = GraftTable.read(spark, srcPath, fromF)
      val dimDelta = GraftTable.retractions(spark, dimPath, fromD, headD)
      terms += factOld.join(dimDelta, factOld(factKey) === dimDelta(dimKey))
    }
    val built = terms.result()
    // align to a common column set before the union: each term carries
    // one _weight plus both tables' columns
    val cols = built.head.columns.sorted.map(col).toSeq
    val feed = built.map(_.select(cols: _*)).reduce(_ unionByName _)
    val delta = aggregate(feed, groupCols, sums)
    mergeDelta(spark, viewPath, delta, sums.keys.toSeq.sorted, headF, s"$headF|$headD")
    Some(((fromF, headF), (fromD, headD)))
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

  /** [[streamMaintain]]'s extrema twin: drive [[applyOnceExtrema]]
    * ticks under a Structured Streaming trigger — the MIN/MAX view
    * follows the live source with no checkpoints to manage (the view's
    * own intent protocol is the progress log).
    */
  def streamMaintainExtrema(spark: SparkSession, srcPath: String, viewPath: String,
                            groupCols: Seq[String], extremes: Map[String, Column],
                            trigger: org.apache.spark.sql.streaming.Trigger =
                              org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("rate").option("rowsPerSecond", "1").load()
      .writeStream
      .foreachBatch { (_: DataFrame, _: Long) =>
        applyOnceExtrema(spark, srcPath, viewPath, groupCols, extremes); ()
      }
      .trigger(trigger)
      .start()
}
