package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api._
import graft.sources.Tables
import graft.Queries._
import graft.functions.TextFunctions._
import graft.operators.{Blocklist, Bm25, Corpus, Dedup, Diagnostics, Layout, Multimodal, Outliers, Pack, RangeJoin, Sampling, Similarity}

/** Streaming-parity surface: hourly/HLL rollups, stateful sessions,
  * and the streaming dedup batch twin.
  *
  * One ledger family of [[Queries.all]] (oracle-parity rules documented
  * there); assembled and key-set-ratcheted by SparkEntry/EntrySuite. */
private[graft] object QueriesStreaming {

  val queries: Map[String, Q] = Map(


      // hourly windowed aggregate over events: the SAME transform the
      // streaming surface runs (graft.streaming.Streaming.hourlyRollup —
      // withWatermark is a no-op in batch, so batch/stream parity holds
      // by construction; exact oracle via cent-scaled sums)
      "q_events_hourly" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          graft.streaming.Streaming.hourlyRollup(Tables.events(s, dir)))
          .arrange("hour", "event_type").df),


      // hourly distinct users — exact countDistinct in batch (two-phase
      // partial agg); the streaming twin trades to HLL (StreamingSuite)
      "q_hourly_uniques" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          graft.streaming.Streaming.hourlyUniques(Tables.events(s, dir)))
          .arrange("hour").df),


      // batch twin of the streaming MinHash near-dup dedup: arrival ts is
      // doc_id-derived, so first-arrival bucket claiming == min-doc-id
      // claiming and the whole band/claim pipeline replays in DuckDB
      "q_stream_dedup_twin" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          graft.streaming.Streaming.streamingNearDedup(
            Tables.df(s, dir, "documents").withColumn("ts_utc",
              expr("timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,doc_id)")),
            "text", "doc_id")
            .select("doc_id"))
          .arrange("doc_id").df),


      // batch twin of the streaming SIMHASH dedup: first-arrival chunk
      // claiming with doc_id-derived ts — the Hamming family's streaming
      // screen replayed in DuckDB (chunk equality, stricter than the
      // batch Hamming pass by design)
      "q_stream_dedup_simhash" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          graft.streaming.Streaming.streamingSimhashDedup(
            Tables.df(s, dir, "documents").withColumn("ts_utc",
              expr("timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,doc_id)")),
            "text", "doc_id")
            .select("doc_id"))
          .arrange("doc_id").df),


      // batch twin of the flatMapGroupsWithState sessionizer: on a batch
      // Dataset timeouts don't exist and the open session flushes at end
      // of group, so the emitted sessions are exactly the gap rule's —
      // lag + running-sum replays them in DuckDB (same 30-min gap)
      "q_stream_sessions" -> ((s: SparkSession, dir: String) => {
        val ev = Tables.eventsUs(s, dir)
        graft.api.DataTable(
          graft.streaming.Streaming.statefulSessions(
            ev.withColumn("ts_utc", Tables.tsStamp(ev)),
            gapUs = 30L * 60 * 1000000L).toDF()
            .select(col("user_id"), col("session_start_us"),
              col("n_events"), col("dur_us")))
          .arrange("user_id", "session_start_us").df
      }),


    "q_sessionize" -> ((s: SparkSession, dir: String) =>
      graft.api.DataTable(
        graft.operators.Sessionize.sessionStats(
          Tables.eventsUs(s, dir),
          "user_id", "ts_us",
          gapTicks = 30L * 60 * 1000000L, tieBreak = col("event_id"),
          ticksPerSecond = 1e6))
        .arrange("user_id", "session_id").df)
  )

  val oracles: Map[String, String] = Map(


    "q_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
        |  event_type, COUNT(*) AS n,
        |  SUM(CAST(ROUND(value * 100.0, 0) AS BIGINT)) / 100.0 AS sum_v
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    "q_hourly_uniques" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
        |  COUNT(DISTINCT user_id)::BIGINT AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_stream_dedup_simhash" -> OracleSql.streamSimhashSurvivors(),

    "q_stream_dedup_twin" -> OracleSql.streamNearDedupSurvivors(),


    "q_stream_sessions" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) AS t_us FROM events),
        |s AS (SELECT user_id, t_us,
        |    CASE WHEN lag(t_us) OVER w IS NULL
        |         OR t_us - lag(t_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY t_us)),
        |g AS (SELECT user_id, t_us, SUM(new_s) OVER (PARTITION BY user_id
        |    ORDER BY t_us ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM s)
        |SELECT user_id, MIN(t_us) AS session_start_us,
        |  COUNT(*)::BIGINT AS n_events, (MAX(t_us) - MIN(t_us)) AS dur_us
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,


    "q_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, epoch_us(ts) AS tus, event_id,
        |    CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |sess AS (
        |  SELECT user_id, tus, event_id,
        |    (SUM(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |      ROWS UNBOUNDED PRECEDING))::BIGINT - 1 AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  (MAX(tus) - MIN(tus)) / 1e6 AS span_s
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin
  )
}
