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

  /** Stream-stream interval join: clicks within `bandMinutes` after each
    * purchase of the same user — the streaming form of
    * graft.ext.TemporalJoins.clicksAfterPurchase. Both sides carry
    * watermarks and the join condition bounds the time distance in BOTH
    * directions, so each side's buffered state is evicted once the other
    * side's watermark passes the band — the state-boundedness contract
    * that makes a stream-stream join runnable indefinitely. */
  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame,
      bandMinutes: Int = 60, lateness: String = "1 hour"): DataFrame = {
    val p = purchases.withWatermark("ts", lateness)
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_event_id"),
        col("ts").as("p_ts"))
    val c = clicks.withWatermark("ts", lateness)
      .select(col("user_id").as("c_user"), col("event_id").as("click_event_id"),
        col("ts").as("c_ts"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") > col("p_ts") &&
        col("c_ts") <= col("p_ts") + expr(s"INTERVAL $bandMinutes MINUTES"))
      .select(col("p_user").as("user_id"), col("purchase_event_id"),
        col("click_event_id"),
        (unix_micros(col("c_ts")) - unix_micros(col("p_ts"))).as("gap_us"))
  }
}
