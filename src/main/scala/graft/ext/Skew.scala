package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation operators: explicit two-phase (salted) aggregation.
  *
  * Motivation at 100 TB: `events.groupBy(event_type)` has FIVE distinct
  * keys — on a 1000-executor cluster the unsalted plan funnels the whole
  * table through five reducers no matter how many cores exist. Salting
  * fans each hot key out over `salts` sub-keys for the partial phase,
  * then combines the sub-aggregates in a second (tiny) exchange keyed by
  * the real key. Spark's map-side partial aggregation already does this
  * implicitly when the upstream partitioning is uniform; the explicit
  * salt is the form that also survives a pre-partitioned-by-key layout
  * (e.g. reading a table bucketed by the hot key) and composes with
  * aggregates that are not algebraic per-partition (e.g. a per-salt
  * top-K before a global merge). AQE's skew-join split covers the join
  * case; this covers the aggregation case deterministically.
  *
  * The salt must be deterministic per row (not rand()) so retries and
  * the oracle agree: here pmod(event_id, salts).
  */
object Skew {

  /** Count + exact value sum per event_type via salted two-phase
    * aggregation. Result is identical to the single-phase groupBy — the
    * oracle runs the plain form — but the first exchange spreads each
    * key over `salts` reducers. */
  def saltedTypeCounts(events: DataFrame, salts: Int = 32): DataFrame =
    events
      .withColumn("salt", pmod(col("event_id"), lit(salts)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("n_part"),
        sum(col("value").cast("decimal(18,2)")).as("sum_part"))
      .groupBy(col("event_type"))
      .agg(sum(col("n_part")).as("n_events"),
        sum(col("sum_part")).cast("string").as("sum_value"))
      .orderBy(col("event_type"))

  /** Key-skew diagnostic for a prospective join/aggregation key: the
    * report an operator (or a planning human) reads BEFORE deciding
    * whether a key needs salting, how many salts, or whether AQE's
    * skew-join split will fire. Emits the top `n` hottest keys with
    * their share of the table plus the global shape numbers the
    * decision needs — key count, rows, max/mean per key, and the skew
    * ratio max/mean (both fixed-point ×1000 under truncating integer
    * `div` with positive operands, so the row hash-gates cross-engine;
    * a ratio ≳ a few × the executor count is the "salt this key"
    * signal). BIGINT boundary: 1000·max_cnt·n_keys overflows int64
    * when max_cnt·n_keys ≳ 9·10¹⁵ (e.g. a 10⁹-key table with a 10⁷-row
    * hot key); past that, the same expressions in DECIMAL(38,0)
    * (DuckDB HUGEINT) are the stated scale path — the bound documented
    * for [[TextOps.bm25TopDocsFrom]]'s numerator applies here too.
    *
    * Scale posture: one map-side-combinable count per key, then ONE
    * top-n of the |keys|-row count frame (TakeOrderedAndProject — n
    * rows per partition move) cross-joined with its 1-row global
    * aggregate, broadcast. The diagnosed table streams through once. */
  def keySkewReport(events: DataFrame, key: String = "user_id",
      n: Int = 5): DataFrame = {
    val counts = events.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
    val globals = broadcast(counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_cnt")))
    counts.orderBy(col("cnt").desc, col(key).asc_nulls_last).limit(n)
      .crossJoin(globals)
      .select(col(key), col("cnt"),
        expr("(1000000 * cnt) div n_rows").as("share_ppm"),
        col("n_keys"), col("n_rows"), col("max_cnt"),
        expr("(1000 * n_rows) div n_keys").as("mean_cnt_x1000"),
        expr("(1000 * max_cnt * n_keys) div n_rows").as("skew_x1000"))
  }
}
