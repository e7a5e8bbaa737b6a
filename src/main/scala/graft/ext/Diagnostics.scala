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

  /** Declarative data-quality check suite — the validation gate a
    * training pipeline runs BEFORE committing a 100-TB job to a
    * snapshot (the Deequ/Great-Expectations shape, as one relational
    * query): each row is (check, observed, threshold, passed), so the
    * gate is `filter(!passed).isEmpty` and the report is the table.
    *
    * Checks: primary-key uniqueness (duplicate order keys), referential
    * integrity orders→customer (dangling FK count via left anti join),
    * null rate of events.user_id (integer milli-rate vs budget), and
    * the lineitem quantity domain (violations of [1, 50]).
    *
    * Scale posture: the three single-table checks are one
    * map-side-combinable aggregate over their table each; the RI check
    * is a left-anti equi join (AQE broadcasts the customer key side
    * while it fits). Everything integer → full hash gate. */
  def qualityChecks(orders: DataFrame, customer: DataFrame,
      lineitem: DataFrame, events: DataFrame,
      nullBudgetMilli: Long = 100L): DataFrame = {
    val pkDups = orders.agg(
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("observed"))
      .select(lit("orders_pk_unique").as("check_name"), col("observed"),
        lit(0L).as("threshold"))
    val danglingFk = orders.join(customer.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("observed"))
      .select(lit("orders_customer_ri").as("check_name"), col("observed"),
        lit(0L).as("threshold"))
    val nullRate = events.agg(
      expr("(1000 * sum(case when user_id is null then 1 else 0 end)) div count(1)")
        .as("observed"))
      .select(lit("events_user_null_milli").as("check_name"), col("observed"),
        lit(nullBudgetMilli).as("threshold"))
    val qtyDomain = lineitem.agg(
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
        .otherwise(0L)).as("observed"))
      .select(lit("lineitem_qty_domain").as("check_name"), col("observed"),
        lit(0L).as("threshold"))
    pkDups.unionAll(danglingFk).unionAll(nullRate).unionAll(qtyDomain)
      // NULL-safe: an EMPTY checked table makes sum()/div-count NULL,
      // and NULL <= threshold is NULL — which filter(!passed) silently
      // treats as passing, the one direction a DQ gate must never
      // fail in. A missing table is a FAILED check.
      .withColumn("passed",
        coalesce(col("observed") <= col("threshold"), lit(false)))
  }

  /** Equi-DEPTH histogram of order value: `buckets` bins holding equal
    * ROW counts (vs the equi-width bins of `text_length_histogram`) —
    * the distribution read that sizes range partitions: each bucket's
    * [lo, hi] is the value range one of `buckets` equal-sized range
    * partitions would cover, which is exactly what a range-partitioned
    * write or a range-join needs to plan balanced tasks.
    *
    * Semantics are exactly ntile(buckets) over the total order
    * (o_totalprice, o_orderkey) — the unique tie-break makes bucket
    * membership engine-independent, and the oracle IS that one-line
    * ntile. But Spark executes an ORDER-BY-only window by moving the
    * whole table to ONE partition (WindowExec warns; single task, the
    * exact anti-pattern), so the build computes the global row number
    * with the same two-phase distributed prefix sum as
    * [[TextOps.globalTokenShards]]: range-partition + in-partition
    * scan-carry for local ranks, then the per-PARTITION counts (32
    * rows, not table rows) cumsum into partition offsets and
    * broadcast-join back — the table shuffles exactly once, every
    * stage parallel. The ntile bucket then falls out of rank
    * arithmetic: with q = N div B, r = N mod B, the first r buckets
    * hold q+1 rows — integer ops on non-negative values, so Spark
    * `div` and the oracle's ntile agree bit-for-bit. */
  def equiDepthHistogram(orders: DataFrame, buckets: Int = 10,
      partitions: Int = 32): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    val local = orders
      .select(col("o_totalprice"), col("o_orderkey")).as[(Double, Long)]
      .repartitionByRange(partitions, col("o_totalprice"), col("o_orderkey"))
      .sortWithinPartitions(col("o_totalprice"), col("o_orderkey"))
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val first = it.next()
          // data-derived chunk key (the chunk's lowest key pair), NOT
          // TaskContext.getPartitionId — see globalTokenShards' note
          val (kp, kk) = first
          var rank = 0L
          (Iterator.single(first) ++ it).map { case (p, k) =>
            rank += 1; (kp, kk, p, k, rank)
          }
        }
      }.toDF("pkey_price", "pkey_okey", "o_totalprice", "o_orderkey", "local_rank")
      .localCheckpoint() // pin: offsets subtree + probe side share lineage
    val offsets = local.groupBy(col("pkey_price"), col("pkey_okey"))
      .agg(count(lit(1)).as("part_total"))
      .withColumn("part_offset", expr(
        "sum(part_total) over (order by pkey_price, pkey_okey " +
          "rows between unbounded preceding and current row) - part_total"))
      .withColumn("n_total", expr("sum(part_total) over ()"))
      .select(col("pkey_price"), col("pkey_okey"),
        col("part_offset"), col("n_total"))
    local.join(broadcast(offsets), Seq("pkey_price", "pkey_okey"))
      .withColumn("rn", col("part_offset") + col("local_rank"))
      .withColumn("q", expr(s"n_total div $buckets"))
      .withColumn("r", expr(s"n_total % $buckets"))
      .withColumn("bucket",
        when(col("rn") <= col("r") * (col("q") + 1),
          expr("(rn - 1) div (q + 1) + 1"))
          .otherwise(expr(
            "r + (rn - r * (q + 1) - 1) div greatest(q, 1) + 1"))
          .cast("int"))
      .groupBy(col("bucket"))
      .agg(
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("bucket"))
  }
}
