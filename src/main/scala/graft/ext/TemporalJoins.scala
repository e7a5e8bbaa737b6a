package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators over the `events` table — the as-of and range
  * join shapes a training-data pipeline needs (feature lookup at event
  * time, attribution windows) that vanilla SQL joins express poorly.
  * Both are absent from the reference (its one join is the keyed dedup
  * lookup, `index.js:107-141`); these generalize the keyed-lookup idea
  * to time-ordered state.
  *
  * Scale posture: the as-of join is union + ordered window — ONE hash
  * exchange on the key, no join node, no per-row probe; this is the
  * distributed merge form of as-of and survives arbitrary fact sizes
  * (each user's timeline streams through a single window frame with an
  * O(1) running "last seen" accumulator — no buffering of the left
  * side). The range join keeps an equi key (user_id) in the join so the
  * planner shuffles both sides once and evaluates the time band as a
  * residual — never a cross product. A pure time-band join with no equi
  * key would instead bucket `ts` to the band width and join on adjacent
  * buckets (documented here for the 100 TB case; the events model always
  * has the user key, so the simpler plan is the right one).
  *
  * Determinism: timestamps are rendered as microsecond strings and gaps
  * as integer microseconds; ordering ties inside the as-of window break
  * on (side, event_id) so equal-timestamp click/purchase pairs resolve
  * identically in both engines.
  */
object TemporalJoins {

  private val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** As-of join: for each purchase, the most recent click at-or-before it
    * by the same user (NULL columns when no prior click exists). Ties:
    * a click at exactly the purchase timestamp is visible (side orders
    * clicks first); equal-timestamp clicks resolve to the max event_id. */
  def clickAsOfPurchase(events: DataFrame): DataFrame = {
    // null-ts clicks are dropped up front: they carry a non-null c_eid,
    // so without the filter `last(c_eid, ignoreNulls)` would attribute
    // them — diverging from the as-of contract (and the native exec),
    // where a row with no timestamp can never be "at or before" anything
    val clicks = events.filter(col("event_type") === "click" &&
        col("ts").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("side"),
        col("ts").as("c_ts"), col("event_id").as("c_eid"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("side"),
        lit(null).cast("timestamp").as("c_ts"),
        lit(null).cast("long").as("c_eid"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("click_ts_t", last(col("c_ts"), ignoreNulls = true).over(w))
      .withColumn("click_event_id", last(col("c_eid"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(
        col("user_id"),
        col("event_id").as("purchase_event_id"),
        date_format(col("ts"), fmt).as("purchase_ts"),
        col("click_event_id"),
        date_format(col("click_ts_t"), fmt).as("click_ts"),
        (unix_micros(col("ts")) - unix_micros(col("click_ts_t"))).as("gap_us"))
  }

  /** Range join: all clicks strictly within `bandMinutes` after each
    * purchase by the same user. Equi on user_id, time band residual. */
  def clicksAfterPurchase(events: DataFrame, bandMinutes: Int = 60): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_event_id"),
        col("ts").as("p_ts"))
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_event_id"),
        col("ts").as("c_ts"))
    p.join(c, Seq("user_id"))
      .filter(col("c_ts") > col("p_ts") &&
        col("c_ts") <= col("p_ts") + expr(s"INTERVAL $bandMinutes MINUTES"))
      .select(col("user_id"), col("purchase_event_id"), col("click_event_id"),
        (unix_micros(col("c_ts")) - unix_micros(col("p_ts"))).as("gap_us"))
  }

  /** [[clickAsOfPurchase]] through the NATIVE as-of operator
    * ([[graft.plans.AsOfJoin]] — custom LogicalPlan + strategy +
    * sorted-merge SparkPlan) instead of the union + window rewrite:
    * same rows, same oracle, different engine path. Ties match the
    * twin (at-ts click visible via <=, equal-ts clicks resolve to max
    * event_id via the right-side tie-break ordering). */
  def clickAsOfPurchaseNative(events: DataFrame): DataFrame =
    clickAsOfPurchaseNative(events, None)

  /** [[clickAsOfPurchaseNative]] with a freshness bound: a prior click
    * older than `toleranceUs` at purchase time attributes as NO click
    * (pandas merge_asof `tolerance` / kdb window-join semantics — an
    * attribution model where week-old clicks don't earn credit). The
    * bound is enforced inside the merge at emit time, one long
    * compare; None = unbounded, row-identical to the plain form. */
  def clickAsOfPurchaseNative(events: DataFrame,
      toleranceUs: Option[Long]): DataFrame =
    clickAsOfPurchaseNative(events, toleranceUs, broadcastRight = false)

  /** The same as-of contract through [[graft.plans.BroadcastAsOfJoinExec]]
    * (`broadcastRight = true`): clicks ship to every executor and
    * purchases are probed in place — zero shuffles, no sort on either
    * side. The right physical form when the right side is dim-sized
    * (reference tables, model-version histories); here it doubles as
    * the oracle-gated correctness twin of the sorted-merge exec. */
  def clickAsOfPurchaseNative(events: DataFrame,
      toleranceUs: Option[Long], broadcastRight: Boolean): DataFrame =
    clickAsOfPurchaseNative(events, toleranceUs, broadcastRight, "backward")

  /** [[clickAsOfPurchaseNative]] with a direction
    * ([[graft.plans.AsOfDirection]] — pandas `merge_asof`'s axis):
    * "forward" attributes each purchase to the EARLIEST click
    * at-or-after it (lowest event_id among equal-ts clicks — the
    * mirror of backward's highest); "nearest" picks whichever prior/
    * next click is closer in time, distance ties to the prior one.
    * `gap_us` stays purchase − click, so forward matches show a
    * negative gap — the sign IS the direction audit column. */
  def clickAsOfPurchaseNative(events: DataFrame,
      toleranceUs: Option[Long], broadcastRight: Boolean,
      direction: String): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"),
        col("event_id").as("c_eid"))
    graft.plans.AsOfJoin
      .asOf(purchases, clicks, Seq("user_id"), "ts", "c_ts", Seq("c_eid"),
        toleranceUs, Some(broadcastRight), // pinned: each query name IS one physical form
        direction)
      .select(col("user_id"),
        col("event_id").as("purchase_event_id"),
        date_format(col("ts"), fmt).as("purchase_ts"),
        col("c_eid").as("click_event_id"),
        date_format(col("c_ts"), fmt).as("click_ts"),
        (unix_micros(col("ts")) - unix_micros(col("c_ts"))).as("gap_us"))
  }
}
