package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming assembly of the event-time window operators (the
  * watermark/window family the reference lacks — SURVEY.md §2.2). The
  * aggregation expressions are the same ones graft.ext.EventOps uses in
  * batch; here they run under `withWatermark`, so state for closed
  * windows is evicted and late data beyond the bound is dropped —
  * the knobs that keep windowed state finite at 100 TB/day rates.
  */
object EventStream {

  /** Tumbling 1-hour windows with a 2-hour lateness bound. Append mode:
    * a window emits once its end passes the watermark. */
  def tumblingCounts(events: DataFrame, lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"))
      .select(
        col("w.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Session windows (30-minute gap) per user under the same watermark. */
  def userSessions(events: DataFrame, lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"))

  /** Streaming dedup: first event per (user, type) within the watermark
    * horizon — dropDuplicatesWithinWatermark keeps state bounded. */
  def dedupedEvents(events: DataFrame, lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("user_id", "event_type")
}
