package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Gap-based sessionization over a live event stream.
  *
  * Uses Spark's native `session_window` state operator: per key, windows
  * within `gap` of each other merge incrementally as events arrive, and a
  * session is emitted exactly once — when the watermark passes its close —
  * so downstream sinks get append-only, final session rows. This is the
  * streaming twin of the batch gap-sessionization in
  * [[graft.queries.Sessions.sessionize]] (same 30-minute default gap); the
  * spec proves the two agree on identical input.
  *
  * Scale: state is per (user, open-session) — bounded by active users in
  * the watermark horizon, not stream history; the watermark bounds both
  * state size and result latency. Late events inside the horizon merge
  * into their session; beyond it they are dropped (the documented
  * trade-off of any watermarked aggregation).
  */
object StreamingSessions {

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, cents: Long)

  def sessionize(
      events: Dataset[SessionEvent],
      gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("total_cents"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_cents"))
}
