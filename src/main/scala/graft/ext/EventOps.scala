package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time windowing over the `events` table — the watermark/window
  * operator family absent from the reference (SURVEY.md §2.2). Written as
  * batch queries (the driver's oracle is batch SQL); the same expressions
  * run under Structured Streaming with `withWatermark` — see
  * graft.streaming for the streaming assembly.
  *
  * Determinism: `value` is cast to DECIMAL before summing and the exact
  * decimal sum is emitted as a canonical string (decimal output columns
  * render trailing zeros differently across readers — see Analytics);
  * window starts are rendered as formatted strings so both engines compare
  * wall-clock labels, not engine-specific timestamp encodings.
  */
object EventOps {

  private val fmt = "yyyy-MM-dd HH:mm:ss"
  private def decValue = col("value").cast("decimal(18,2)")

  /** Tumbling 1-hour windows per event type: count + exact sum. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(decValue).as("sum_value"))
      .select(
        date_format(col("w.start"), fmt).as("window_start"),
        col("event_type"), col("n_events"),
        col("sum_value").cast("string").as("sum_value"))

  /** Sliding 1-hour windows every 30 minutes: each event lands in two
    * overlapping windows. */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        date_format(col("w.start"), fmt).as("window_start"),
        col("event_type"), col("n_events"))

  /** Session windows per user with a 30-minute inactivity gap. In batch
    * Spark, session_window() computes the same gaps-and-islands grouping
    * the oracle derives with lag + a cumulative sum. */
  def sessions(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(decValue).as("sum_value"))
      .select(
        col("user_id"),
        date_format(col("w.start"), fmt).as("session_start"),
        col("n_events"),
        col("sum_value").cast("string").as("sum_value"))

  /** JSON path extraction from the props payload column (the decode
    * shape of O4's embedded-JSON fields, applied to the events table):
    * get_json_object → typed cast → integer aggregates per type. */
  def propsStats(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        sum(col("k")).as("sum_k"))

  /** Deduplication to the first event per (user, type) — the
    * deterministic form of dropDuplicates (min-by instead of
    * arbitrary-row-wins, so the oracle can reproduce it). */
  def firstEventPerUserType(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        min(col("event_id")).as("first_event_id"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("first_ts"),
        count(lit(1)).as("n_total"))

  /** Global top-K event types by volume through the typed
    * [[TopKAggregator]] — the bounded-heap Aggregator as a production
    * query (elsewhere it is only spec-driven). The aggregate counts
    * shrink the input to one row per type BEFORE the heap, so the
    * Aggregator's map-side combine carries ≤ K tuples per partition —
    * the shape that makes global top-K a near-free reduction at 100 TB.
    * Ordering contract (score desc, item asc tie-break) matches the
    * windowed row_number form, so a plain SQL oracle reproduces it. */
  def topEventTypes(events: DataFrame, k: Int = 3): DataFrame = {
    import events.sparkSession.implicits._
    val counts = events.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val scored = counts.select(
      lit("all").as("key"), col("event_type").as("item"),
      col("n").cast("double").as("score")).as[Scored]
    TopK.topKPerKey(scored, k).toDF("key", "top")
      .select(posexplode(col("top")).as(Seq("pos", "event_type")))
      .select((col("pos") + 1).as("rank"), col("event_type"))
  }
}
