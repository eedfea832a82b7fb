package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream — beyond-reference
  * (the reference has no time-series surface at all; SURVEY.md §2.10).
  *
  * A session is a maximal run of one user's events where consecutive
  * gaps are <= `gapNanos`. Classic two-window formulation: flag
  * session starts with `lag`, then a running sum assigns session ids —
  * both windows partition by user, so the computation is fully parallel
  * across users (the only skew risk is a single pathological user; cap
  * upstream if that exists). Timestamps stay integer nanos end-to-end:
  * exact arithmetic, exact oracle.
  *
  * The streaming twin of this batch operator is
  * `session_window(col("ts_utc"), gap)` in a `groupBy` — same semantics,
  * state-store backed; see graft.streaming.Streaming.
  */
object Sessionize {

  /** Appends `session_id` (0-based per user, by time order). `tsTicksCol`
    * is an integer time column in any unit; `gapTicks` in the same unit. */
  def withSessionId(events: DataFrame, userCol: String, tsTicksCol: String,
                    gapTicks: Long, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsTicksCol), tieBreak)
    val prev = lag(col(tsTicksCol), 1).over(w)
    val isNew = when(prev.isNull || col(tsTicksCol) - prev > gapTicks, 1L)
      .otherwise(0L)
    events
      .withColumn("__new_session", isNew)
      .withColumn("session_id",
        sum(col("__new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
      .drop("__new_session")
  }

  /** Per-session stats: event count, span in seconds. `ticksPerSecond`
    * converts the integer time unit (1e9 for nanos, 1e6 for micros). */
  def sessionStats(events: DataFrame, userCol: String, tsTicksCol: String,
                   gapTicks: Long, tieBreak: Column,
                   ticksPerSecond: Double = 1e9): DataFrame =
    withSessionId(events, userCol, tsTicksCol, gapTicks, tieBreak)
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        ((max(col(tsTicksCol)) - min(col(tsTicksCol))) / lit(ticksPerSecond)).as("span_s"))
}
