package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Operational diagnostics over a table BEFORE committing a 100-TB job
  * to a plan: the dataset-card numbers (row counts, null rates,
  * cardinalities, ranges) that decide join strategies, partition
  * counts, and whether a column is usable as a key at all. Companion
  * to [[Skew.keySkewReport]], which answers the per-key distribution
  * question the profile's cardinality number raises.
  */
object Diagnostics {

  /** One-row, one-pass profile of the events table: exact null counts
    * and min/max per column, exact distinct counts for the two key
    * candidates. All values are either exact integers or raw column
    * values (no arithmetic touches the doubles), so the row hash-gates
    * cross-engine.
    *
    * Scale posture: a single scan into one map-side-combinable
    * aggregate — null counts and min/max are plain algebraic
    * aggregates. The two EXACT countDistincts make Spark expand the
    * scan (one Expand branch per distinct) — acceptable at two; a
    * wide-profile variant at 100 TB swaps them for
    * approx_count_distinct (HLL, one branch total), the documented
    * trade also taken by `agg_approx_distinct`. */
  def tableProfile(events: DataFrame): DataFrame =
    events.agg(
      count(lit(1)).as("n_rows"),
      sum(isnull(col("user_id")).cast("long")).as("n_null_user_id"),
      sum(isnull(col("event_type")).cast("long")).as("n_null_event_type"),
      sum(isnull(col("value")).cast("long")).as("n_null_value"),
      sum(isnull(col("props")).cast("long")).as("n_null_props"),
      sum(isnull(col("ts")).cast("long")).as("n_null_ts"),
      countDistinct(col("user_id")).as("n_distinct_user_id"),
      countDistinct(col("event_type")).as("n_distinct_event_type"),
      min(col("ts")).as("min_ts"),
      max(col("ts")).as("max_ts"),
      min(col("user_id")).as("min_user_id"),
      max(col("user_id")).as("max_user_id"),
      min(col("value")).as("min_value"),
      max(col("value")).as("max_value"))
}
