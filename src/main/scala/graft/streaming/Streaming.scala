package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured Streaming surface over the `events` table — beyond-reference
  * (the reference has no streaming at all, SURVEY.md §2.10).
  *
  * The transforms are written once and used by BOTH the batch queries
  * (`q_events_hourly`) and streaming jobs: `withWatermark` is a no-op in
  * batch execution, so batch/stream parity holds by construction. On a
  * stream the watermark bounds state: hourly windows older than the
  * watermark are finalized and evicted — the shape that runs indefinitely
  * on an unbounded 100 TB/day event feed.
  */
object Streaming {

  /** Hourly tumbling-window rollup per event type: count + exact money sum
    * (cent-scaled, order-insensitive — the oracle-parity trick from
    * Queries). Input needs `ts_utc: timestamp`, `event_type`, `value`. */
  def hourlyRollup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts_utc", watermark)
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (sum(round(col("value") * lit(100.0), 0).cast("long")) / lit(100.0)).as("sum_v"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("hour"),
        col("event_type"), col("n"), col("sum_v"))

  /** Sliding-window event rate (5-minute hops over 1-hour windows) —
    * the monitoring-style companion to [[hourlyRollup]]. */
  def slidingRate(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts_utc", watermark)
      .groupBy(window(col("ts_utc"), "1 hour", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("win_start"),
        col("event_type"), col("n"))

  /** Running per-user state for [[runningUserCounts]]. */
  case class UserState(user_id: Long, n_events: Long, last_ts_us: Long)

  /** Custom keyed state via `mapGroupsWithState`: a running per-user
    * event count + last-seen timestamp, updated incrementally per
    * micro-batch. The state store holds one `UserState` per user across
    * batches — the primitive that windowed aggregations can't express
    * (cross-batch custom accumulators, CEP-ish logic). On a BATCH
    * Dataset the same code runs with empty initial state, i.e. it
    * degrades to a per-group aggregate — used by the parity test.
    * Input needs `user_id: long` and `ts_us: long`. */
  def runningUserCounts(events: DataFrame): Dataset[UserState] = {
    val s = events.sparkSession
    import s.implicits._
    events.selectExpr("user_id", "ts_us").as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserState, UserState](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long)], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(uid, 0L, Long.MinValue))
          var n = prev.n_events
          var last = prev.last_ts_us
          rows.foreach { case (_, t) =>
            n += 1
            if (t > last) last = t
          }
          val next = UserState(uid, n, last)
          state.update(next)
          next
      }
  }

  /** Gap-based per-user sessions via the built-in `session_window` —
    * state-store backed on a stream, same gap semantics as the batch
    * operator `graft.operators.Sessionize` (cross-validated in tests).
    * Emits one row per closed session with event count and span. */
  def sessionRollup(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts_utc", watermark)
      .groupBy(session_window(col("ts_utc"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))
}
