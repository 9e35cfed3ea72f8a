package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming surface (SURVEY.md §2.7 [EXT]): the reference is a
  * pure batch pipeline, but the engine's event table maps naturally onto
  * `readStream` → event-time transforms → `writeStream`.
  *
  * Every operator here is a plain transformation over a (possibly
  * streaming) DataFrame, so each has a batch twin by construction — the
  * specs assert streaming output == the batch computation on the same
  * rows. State is bounded by watermarks (windowed aggs, dedup) or by
  * explicit `GroupState` (running counts), never unbounded.
  */
object StreamOps {

  /** Tumbling-window counts per event type with late-data handling: rows
    * later than `watermarkDelay` behind the max seen event time are
    * dropped, and closed windows are emitted exactly once (append mode).
    */
  def tumblingCounts(events: DataFrame, windowDur: String,
      watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding-window per-user activity (window length > slide). */
  def slidingUserActivity(events: DataFrame, windowDur: String,
      slideDur: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur, slideDur).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("user_id"),
        col("n_events"))

  /** Session windows: events gapped < `gap` apart merge into one session
    * per user.
    */
  def sessionCounts(events: DataFrame, gap: String,
      watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Stream-stream interval join: every left event paired with the right
    * events of the same user whose timestamp falls in
    * [left.ts, left.ts + maxGapHours]. Both sides carry watermarks and
    * the join condition bounds right.ts relative to left.ts from BOTH
    * directions, so each side's buffered state expires as the watermark
    * advances — bounded state, the requirement for stream-stream joins
    * at scale. Works identically on bounded DFs (the batch twin oracle).
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      watermarkDelay: String, maxGapHours: Int): DataFrame = {
    val l = left.withWatermark("ts", watermarkDelay)
      .select(col("event_id").as("left_id"), col("user_id"),
        col("ts").as("left_ts"))
    val r = right.withWatermark("ts", watermarkDelay)
      .select(col("event_id").as("right_id"),
        col("user_id").as("__r_user"), col("ts").as("right_ts"))
    l.join(r,
      col("user_id") === col("__r_user") &&
        col("right_ts") >= col("left_ts") &&
        col("right_ts") <= col("left_ts") + expr(s"INTERVAL $maxGapHours HOURS"))
      .select("left_id", "right_id", "user_id")
  }

  /** Replay-safe (effectively-once) batch writer for `foreachBatch`
    * sinks. Structured Streaming's built-in file sink is exactly-once,
    * but `foreachBatch` — the escape hatch every custom sink (JDBC,
    * upsert, multi-sink fan-out) goes through — is AT-LEAST-ONCE: a
    * failed micro-batch replays under the SAME batchId. Idempotence is
    * the sink's job, and the standard recipe is what this implements:
    * each batch lands in a `batch=<id>` directory, a `_GRAFT_COMMIT`
    * marker is written only after the data, and a replayed batchId that
    * finds its marker is skipped entirely. Readers list only marked
    * directories ([[readCommitted]]), so a crash between data and
    * marker leaves a torn write invisible — the replay overwrites it.
    *
    * Returns true when the batch was written, false when skipped.
    */
  def writeBatchIdempotent(df: DataFrame, batchId: Long,
      path: String): Boolean = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/batch=$batchId")
    val marker = new org.apache.hadoop.fs.Path(dir, "_GRAFT_COMMIT")
    val fs = dir.getFileSystem(
      df.sparkSession.sessionState.newHadoopConf())
    if (fs.exists(marker)) false
    else {
      df.write.mode("overwrite").parquet(dir.toString)
      fs.create(marker, true).close()
      true
    }
  }

  /** All committed batches under an [[writeBatchIdempotent]] sink path —
    * torn (marker-less) directories are excluded.
    */
  def readCommitted(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val committed =
      if (!fs.exists(root)) Array.empty[String]
      else fs.listStatus(root)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
        .filter(s => fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_GRAFT_COMMIT")))
        .map(_.getPath.toString)
    require(committed.nonEmpty, s"no committed batches under $path")
    spark.read.parquet(committed: _*)
  }

  /** Stream-static enrichment join: every event joined (left) to a
    * static dimension table — the lookup-enrichment every event
    * pipeline needs (user → account, doc → source metadata). The static
    * side is a bounded plan Spark re-plans per micro-batch, so it needs
    * no watermark and holds NO join state (unlike stream-stream joins);
    * `broadcast` keeps each micro-batch map-side at cluster scale, and
    * a LEFT join keeps events whose key has no dimension row (dropping
    * telemetry because a dim table lags is how pipelines lose data).
    * Works identically on bounded plans — the q84 batch twin.
    */
  def enrichEvents(events: DataFrame, dim: DataFrame,
      eventKey: String = "user_id", dimKey: String = "c_custkey",
      dimCols: Seq[String] = Seq("c_name", "c_nationkey")): DataFrame = {
    val d = dim.select((dimKey +: dimCols).map(col): _*)
    events.join(broadcast(d), col(eventKey) === col(dimKey), "left")
      .drop(dimKey)
  }

  /** Stateful exactly-once dedup on event_id, state expiring with the
    * watermark (`dropDuplicatesWithinWatermark`). The within-watermark
    * variant exists only for streams (Spark rejects it on bounded
    * plans — the watermark bounds STATE, never output), so the batch
    * twin is the plain `dropDuplicates` the streaming op converges to
    * when no row is later than the delay.
    *
    * @param watermarkDelay bounds streaming STATE only. On a BOUNDED
    *   plan it is ignored entirely: batch dedup is global across all
    *   time, so two copies of an event_id separated by more than the
    *   delay — which the streaming op would BOTH keep, their state
    *   having expired between them — collapse to one row here. Batch
    *   callers needing the time-bounded semantics should pre-bucket by
    *   a ts window and dedup within it.
    */
  def dedupEvents(events: DataFrame, watermarkDelay: String): DataFrame =
    if (events.isStreaming)
      events
        .withWatermark("ts", watermarkDelay)
        .dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  final case class UserEvent(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  final case class UserStat(user_id: Long, n_events: Long, sum_value: Double)

  final case class BurstAlert(user_id: Long, event_id: Long, seq: Long)

  /** Custom 0..n-rows-per-group state via flatMapGroupsWithState: emit an
    * alert for every event past a per-user lifetime count — the API for
    * state machines whose output cardinality varies per group (mapGroups
    * emits exactly one row). State is one counter per user; within a
    * batch the group is processed in event_id order so the batch twin is
    * exactly the `row_number() > maxEvents` SQL (streaming counts in
    * arrival order across micro-batches, as the spec exercises).
    */
  def burstAlerts(events: Dataset[UserEvent],
      maxEvents: Int): Dataset[BurstAlert] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, BurstAlert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[Long]) =>
          var n = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_.event_id).flatMap { e =>
            n += 1
            if (n > maxEvents) Some(BurstAlert(uid, e.event_id, n)) else None
          }
          state.update(n)
          out.iterator
      }
  }

  /** The same running per-user (count, sum) on `transformWithState` —
    * Spark 4's successor to (flat)mapGroupsWithState: named typed state
    * variables in the (RocksDB-backed) state store, explicit TTL, and
    * timer support, the API new state machines should target. Kept
    * semantically identical to [[runningUserStats]] so the spec pins
    * old surface == new surface == batch groupBy twin.
    *
    * Requires `spark.sql.streaming.stateStore.providerClass` =
    * `...state.RocksDBStateStoreProvider` on the running query.
    */
  final class RunningStatsProcessor
      extends StatefulProcessor[Long, UserEvent, UserStat] {
    @transient private var state: ValueState[UserStat] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserStat]("stats",
        Encoders.product[UserStat], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[UserStat] = {
      val prev = if (state.exists()) state.get() else UserStat(uid, 0L, 0.0)
      var n = prev.n_events
      var s = prev.sum_value
      rows.foreach { e => n += 1; s += e.value }
      // unrounded in state, rounded on emit — same contract as
      // runningUserStats (per-batch rounding would compound)
      state.update(UserStat(uid, n, s))
      Iterator.single(UserStat(uid, n, math.rint(s * 100) / 100))
    }
  }

  def runningUserStatsTws(events: Dataset[UserEvent]): Dataset[UserStat] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningStatsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Custom keyed state via mapGroupsWithState: a running per-user
    * (count, sum) updated on every micro-batch — the `KeyValueGroupedDataset`
    * surface for state machines the windowed aggs can't express.
    */
  def runningUserStats(events: Dataset[UserEvent]): Dataset[UserStat] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserStat, UserStat] {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(uid, 0L, 0.0))
          var n = prev.n_events
          var s = prev.sum_value
          rows.foreach { e => n += 1; s += e.value }
          // state keeps the UNROUNDED sum (rounding per micro-batch would
          // compound and drift from the batch groupBy twin); rounding
          // happens only on the emitted row
          state.update(UserStat(uid, n, s))
          UserStat(uid, n, math.rint(s * 100) / 100)
      }
  }
}
