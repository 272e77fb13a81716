package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}

/** Structured Streaming over the events table. Every transform here is
  * a pure DataFrame→DataFrame function, so the SAME code runs in batch
  * (for the DuckDB oracle) and under `readStream` (tested in
  * EventStreamsSpec with Trigger.AvailableNow) — Spark's unified
  * batch/stream semantics do the work.
  *
  * Scale notes: windowed aggregation state is bounded by the watermark
  * (late data beyond 1 hour is dropped, state for closed windows is
  * evicted); `mapGroupsWithState` state is per-user and O(1) per key.
  */
object EventStreams {

  /** Streaming read of an events parquet directory. Schema is pinned
    * from a batch read of the same path (a stream source cannot infer).
    * `ts` normalization is type-adaptive, shared with the batch loader
    * ([[graft.Tables.normalizeEventTs]]) — the data generator has
    * shipped both timestamp[us] and nanos-long physical types.
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // FileStreamSource wants a directory; events.parquet is a single file
    // inside the sf dir, so stream the dir with a glob filter.
    graft.Tables.normalizeEventTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  /** Tumbling 30-minute counts per event type. Batch == stream. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 10000)).as("sum_value_q4"))
      .select(col("window.start").cast("long").as("win_start"),
        col("event_type"), col("n_events"), col("sum_value_q4"))

  /** Session windows per user (30-minute gap), Spark-native
    * `session_window` — in streaming, state merges/extends sessions
    * under the watermark.
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").cast("long").as("sess_start"),
        col("user_id"), col("n_events"))

  final case class UserStat(user_id: Long, n_events: Long, max_value: Double)

  /** Custom streaming state: running per-user event count + max value
    * via `mapGroupsWithState` — the arbitrary-state primitive for
    * operators the built-in aggs can't express.
    */
  def userStats(events: Dataset[(Long, Double)]): Dataset[UserStat] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[UserStat, UserStat](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(user, 0L, Double.MinValue))
          var n = prev.n_events
          var mx = prev.max_value
          rows.foreach { case (_, v) => n += 1; if (v > mx) mx = v }
          val next = UserStat(user, n, mx)
          state.update(next)
          next
      }
  }

  /** [[userStats]] on Spark 4's arbitrary-state v2 API
    * (`transformWithState`, SPARK-42931): same semantics, but the
    * state is a NAMED, TYPED `ValueState` with an explicit
    * exists/update lifecycle — and, the part `mapGroupsWithState`
    * cannot express without hand-rolled timeout bookkeeping, a TTL
    * that EVICTS idle keys' state. At 100 TB-scale streams the key
    * space (users, sessions, devices) grows without bound; TTL'd state
    * is what keeps a months-running query's store from growing with
    * every key ever seen. `ttl` = None keeps state forever
    * (`TimeMode.None`); Some(d) switches to processing-time mode and
    * lets the store drop entries idle past d — a user active again
    * later simply restarts from zero (the documented trade).
    *
    * Streaming runs need the RocksDB state store
    * (`spark.sql.streaming.stateStore.providerClass` =
    * `...state.RocksDBStateStoreProvider` — transformWithState refuses
    * the HDFS-backed default); EventStreamsSpec runs it end-to-end.
    */
  def userStatsTws(events: Dataset[(Long, Double)],
                   ttl: Option[java.time.Duration] = None): Dataset[UserStat] = {
    import events.sparkSession.implicits._
    // batch-mode transformWithState still plans StateStoreRDDs whose
    // executors look up the driver's coordinator endpoint — which only
    // streaming query startup registers; ensure it exists (idempotent)
    org.apache.spark.sql.graftshim.Bridge.ensureStateStoreCoordinator(events.sparkSession)
    val timeMode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    events.groupByKey(_._1)
      .transformWithState(new UserStatsProcessor(ttl.orNull), timeMode,
        OutputMode.Update())
  }

  private class UserStatsProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[Long, (Long, Double), UserStat] {
    @transient private var state: ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val cfg = if (ttl == null) TTLConfig.NONE else TTLConfig(ttl)
      state = getHandle.getValueState("stat", Encoders.product[(Long, Double)], cfg)
    }
    override def handleInputRows(user: Long, rows: Iterator[(Long, Double)],
                                 timers: TimerValues): Iterator[UserStat] = {
      var (n, mx) = if (state.exists()) state.get() else (0L, Double.MinValue)
      rows.foreach { case (_, v) => n += 1; if (v > mx) mx = v }
      state.update((n, mx))
      Iterator.single(UserStat(user, n, mx))
    }
  }

  /** Streaming ingest into a [[graft.sources.GraftTable]] — the
    * reference's Hudi streaming-upsert pattern (`operation=upsert` per
    * micro-batch). foreachBatch applies the keyed last-wins merge per
    * batch.
    *
    * Delivery semantics, honestly: pass `checkpointLocation` to get
    * at-least-once batch delivery across restarts (without it, a
    * restarted query replays the source from scratch). foreachBatch
    * itself is at-least-once; a replayed batch re-applies the SAME
    * last-wins merge, so the table CONTENT converges (idempotent
    * state) even though the replay burns an extra version. True
    * exactly-once would additionally need the batchId recorded in the
    * table commit — not claimed here.
    */
  /** `branch = Some(name)`: the micro-batches stage onto a WAP branch
    * instead of main — the streaming form of write-audit-publish (land
    * a whole ingest window invisibly, audit it, publish once). The
    * table and branch must already exist (a stream that silently
    * creates either would hide a misconfigured path).
    */
  def streamUpsertInto(spark: SparkSession, dir: String, tablePath: String,
                       keyCols: Seq[String],
                       checkpointLocation: Option[String] = None,
                       branch: Option[String] = None): Unit = {
    import graft.sources.GraftTable
    branch.foreach { b =>
      require(GraftTable.exists(tablePath), s"no table at $tablePath — create it " +
        "before streaming onto a branch")
      require(GraftTable.branchExists(tablePath, b),
        s"no branch '$b' at $tablePath — branchCreate first")
    }
    val stream = readEventStream(spark, dir)
    val writer = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        branch match {
          case Some(b) => GraftTable.branchUpsert(spark, tablePath, b, batch)
          case None =>
            if (!GraftTable.exists(tablePath)) GraftTable.create(batch, tablePath, keyCols)
            else GraftTable.upsert(spark, tablePath, batch)
        }
      }
      .trigger(Trigger.AvailableNow())
    val q = checkpointLocation
      .fold(writer)(cp => writer.option("checkpointLocation", cp))
      .start()
    q.awaitTermination()
  }

  /** Stream-stream interval join: each click paired with the same
    * user's purchases in the preceding hour — the streaming twin of
    * [[graft.operators.IntervalJoin]] (same semantics, verified equal
    * in EventStreamsSpec). Watermarks bound both sides' buffered
    * state: the range condition tells Spark a purchase can only match
    * clicks up to 1 h later, so purchase state ages out 1 h past the
    * watermark instead of growing forever.
    */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
      .withWatermark("ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("pts"),
        col("event_id").as("p_event_id"), col("value").as("p_value"))
      .withWatermark("pts", "2 hours")
    clicks.join(purchases,
      expr("user_id = p_user_id AND pts >= ts - interval 1 hour AND pts <= ts"))
  }

  /** Streaming exact dedup: first event per key wins; state for seen
    * keys is dropped once the watermark passes (bounded state — the
    * streaming form of Dedup.exact).
    */
  def dedupedEvents(events: DataFrame, keyCol: String): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(keyCol)

  /** Drive any stream→DataFrame transform over the events dir with
    * Trigger.AvailableNow into an in-memory table; returns the result.
    * (Test/verification harness — production would writeStream to a
    * sink with checkpointing.)
    */
  def runAvailableNow(spark: SparkSession, dir: String,
                      transform: DataFrame => DataFrame,
                      queryName: String,
                      outputMode: OutputMode = OutputMode.Complete()): DataFrame = {
    val q = transform(readEventStream(spark, dir)).writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
