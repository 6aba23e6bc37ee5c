package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming gap-sessionization — the streaming twin of the batch
  * `events_session_windows` query (SURVEY.md §2 B7,
  * operators/EventAnalytics.sessionWindows): identical output schema
  * (user_id, session_start_ms, n_events, sum_value) from the SAME
  * `session_window` aggregation, so batch and stream results are
  * comparable row-for-row once a session is finalized.
  *
  * Spark-first: `session_window` is the native Structured Streaming
  * session operator — state merging (out-of-order events extending or
  * BRIDGING two open sessions into one) and watermark-driven finalization
  * are engine-managed; no hand-rolled flatMapGroupsWithState state
  * machine to get wrong. Append mode emits a session exactly once, when
  * the watermark passes its close (start + gap after the last event).
  *
  * State budget at 100 TB/day: one (user, open-session) aggregate per
  * active user — evicted the moment the watermark clears the session, so
  * retention is bounded by `watermark` + `gap`, not by history. The
  * `watermark` parameter is the lateness SLO: events later than it are
  * dropped by the engine (counted in the query's event-time metrics).
  */
object SessionWindows {

  def sessionize(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "1 hour"
  ): DataFrame =
    events
      // ms truncation first, matching the batch operator exactly — the
      // events fixture is ns-precision and sub-ms digits must not split
      // parity between the two forms
      .withColumn("ts_ms", timestamp_millis(unix_millis(col("ts"))))
      .withWatermark("ts_ms", watermark)
      .groupBy(session_window(col("ts_ms"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")), 2).cast("double").as("sum_value")
      )
      .select(
        col("user_id"),
        unix_millis(col("session_window.start")).as("session_start_ms"),
        col("n_events"),
        col("sum_value")
      )
}
