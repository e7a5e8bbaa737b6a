package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analytics over the TPC-H-ish driver tables: the join / aggregate
  * / window / set-op / sort-limit operator families the reference lacks
  * (SURVEY.md §2.2 "absent in reference" rows), expressed Spark-first.
  *
  * Determinism discipline (the driver hash-compares against DuckDB):
  * money columns are cast to DECIMAL before aggregation — decimal sums are
  * exact and therefore independent of Spark's shuffle/partial-agg order —
  * and averages are derived from exact sums with a single IEEE double
  * division. Top-K queries always carry a unique tie-break key.
  *
  * Output rendering: aggregated DECIMAL results are emitted as canonical
  * STRINGS (`cast(... as string)`, full scale, e.g. "138014.00"), never as
  * DECIMAL columns. A decimal column read back with scale preserved renders
  * trailing zeros ("138014.00") while a float64 path renders the shortest
  * repr ("138014.0"); emitting the exact decimal digits as a string makes
  * the value representation-independent across engines. Raw double columns
  * pass through untouched (bit-identical on both sides).
  *
  * Scale posture: fact-to-fact joins (orders⋈lineitem) shuffle on the
  * join key; only fixed-cardinality dimensions (region/nation) carry
  * broadcast hints — scale-growing tables (customer/supplier) are left
  * to size estimation / AQE, which broadcasts them while small and
  * shuffles them once they outgrow the threshold. Aggregations are
  * partial+final (map-side combine) by construction.
  */
object Analytics {

  private def dec(c: String, p: Int = 18, s: Int = 2) =
    col(c).cast(s"decimal($p,$s)")

  /** TPC-H Q1-shaped pricing summary: scan + filter + wide aggregate.
    * The parquet scan should show PushedFilters on l_shipdate and a
    * 7-column ReadSchema. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec("l_quantity")).as("sum_qty_d"),
        sum(dec("l_extendedprice")).as("sum_base_price_d"),
        sum(dec("l_extendedprice") * (lit(1).cast("decimal(3,2)") - dec("l_discount", 4)))
          .as("sum_disc_price_d"),
        sum(dec("l_extendedprice") * (lit(1).cast("decimal(3,2)") - dec("l_discount", 4))
          * (lit(1).cast("decimal(3,2)") + dec("l_tax", 4))).as("sum_charge_d"),
        count(lit(1)).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        col("sum_qty_d").cast("string").as("sum_qty"),
        col("sum_base_price_d").cast("string").as("sum_base_price"),
        col("sum_disc_price_d").cast("string").as("sum_disc_price"),
        col("sum_charge_d").cast("string").as("sum_charge"),
        col("count_order"),
        (col("sum_qty_d").cast("double") / col("count_order")).as("avg_qty"),
        (col("sum_base_price_d").cast("double") / col("count_order")).as("avg_price"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3-shaped shipping priority: filtered-customer join + two-fact
    * shuffle join + grouped sum + deterministic top-10.
    *
    * The filtered customer side is deliberately UNHINTED: customers grow
    * linearly with scale factor, so a forced broadcast OOMs executors at
    * 100× (module policy, lines 25-30). Size estimation / AQE broadcasts
    * it while it fits under the threshold and shuffles it once it
    * doesn't — the plan that survives the scale-up. */
  def shippingPriority(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame): DataFrame = {
    val cut = lit("1995-03-15").cast("timestamp")
    val cust = customer.filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    orders.filter(col("o_orderdate") < cut)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(lineitem.filter(col("l_shipdate") > cut),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec("l_extendedprice") *
        (lit(1).cast("decimal(3,2)") - dec("l_discount", 4))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
      .select(
        col("o_orderkey"),
        col("revenue").cast("string").as("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_orderpriority").as("order_priority"))
  }

  /** TPC-H Q5-shaped regional volume: broadcast joins against the true
    * dimensions (region→nation, fixed cardinality) around the
    * orders⋈lineitem fact join, grouped by nation. The reference has
    * exactly one join (the dedup lookup); this supplies the multi-way
    * equi-join coverage.
    *
    * Broadcast hints are deliberately ONLY on region/nation: customer
    * and supplier grow linearly with scale factor, so a forced
    * broadcast of them OOMs executors at 100×. Left unhinted, the
    * planner's size estimation (and AQE on a real cluster) broadcasts
    * them while they fit under the threshold and shuffles them once
    * they don't — the plan that survives the scale-up. */
  def regionVolume(region: DataFrame, nation: DataFrame, customer: DataFrame,
      supplier: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val dims = broadcast(
      nation.join(broadcast(region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name")))
    val cust =
      customer.join(dims, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_nationkey").as("c_nk"), col("n_name").as("c_nation"))
    val supp =
      supplier.join(dims, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey").as("s_nk"))
    orders
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      // TPC-H Q5 requires the supplier and customer to share a nation
      .join(supp, col("l_suppkey") === col("s_suppkey") && col("s_nk") === col("c_nk"))
      .groupBy(col("c_nation").as("nation"))
      .agg(sum(dec("l_extendedprice") *
        (lit(1).cast("decimal(3,2)") - dec("l_discount", 4))).as("revenue_d"))
      .orderBy(col("revenue_d").desc, col("nation"))
      .select(col("nation"), col("revenue_d").cast("string").as("revenue"))
  }

  /** Market-basket pair mining (frequent itemsets at k = 2): which
    * parts co-occur in the same order more often than chance — the
    * association-rules read behind recommendations, with support and
    * the same integer milli-lift convention as
    * [[graft.ext.TextOps.collocations]].
    *
    * Scale posture — the Apriori move: singleton counts prune the item
    * list BEFORE the within-order pair join, and the prune is provably
    * semantics-free because pair support ≤ min(singleton supports) —
    * a part below `minSupport` cannot participate in any surviving
    * pair. The pair join is an equi self-join on the order key with
    * per-order fan-out bounded by basket size, counts map-side combine
    * to pair-vocabulary size, and the global top-k is a
    * WindowGroupLimit.
    *
    * Basket-size cap — a LOUD cap, not a silent one: basket-size² pair
    * fan-out is fine for organic orders (TPC-H baskets are ≤7 items)
    * but one pathological order — a crawler cart with 10⁴ items —
    * would emit 10⁸ pairs from a single key, and the salted join
    * bounds per-task cost, not pair count. Orders with more than
    * `maxBasket` distinct parts are excluded from the analysis
    * entirely (all their stats, not just their pairs, so support/lift
    * stay internally consistent over the capped universe), and the
    * excluded-order count rides on EVERY output row as
    * `orders_dropped` — part of the oracle-gated result, so a nonzero
    * drop is hash-checked cross-engine, never swallowed into a log
    * nobody reads. Pair output is bounded by maxBasket² per order. */
  def basketPairs(lineitem: DataFrame, minSupport: Long = 3L,
      k: Int = 10, maxBasket: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // lazy localCheckpoint: `sized` feeds five subtrees (freq, total,
    // both sides of the pair self-join, the drop counter) whose
    // differing projections defeat exchange reuse — without the pin
    // the lineitem scan and the distinct shuffle run five times (same
    // pattern as paragraphDedup / sessionFunnel). The basket-size
    // window repartitions the pin onto okey — the same key the pair
    // self-join needs, so the cap's shuffle replaces (not adds to)
    // the join's.
    // repartition by okey FIRST: hash(okey) satisfies the distinct's
    // ClusteredDistribution(okey, part) (subset rule) AND the window's
    // okey partitioning AND the pair self-join's key, so the fact table
    // crosses exactly ONE exchange — distinct-then-window would pay two
    // (an (okey, part) exchange, then an okey re-exchange).
    val sized = lineitem
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
      .repartition(col("okey"))
      .distinct()
      .withColumn("basket_n", count(lit(1)).over(
        Window.partitionBy(col("okey"))))
      .localCheckpoint(false)
    val dropped = sized.filter(col("basket_n") > maxBasket)
      .agg(countDistinct(col("okey")).as("orders_dropped"))
    val items = sized.filter(col("basket_n") <= maxBasket)
      .select(col("okey"), col("part"))
    // pin the vocab-sized prune frame: `pruned` feeds BOTH sides of the
    // pair self-join, and without the pin each side re-runs the full
    // items aggregate underneath its own broadcast (measured as two
    // identical Exchange+HashAggregate subtrees in the r12 plan audit)
    val freq = items.groupBy(col("part"))
      .agg(count(lit(1)).as("n_part"))
      .filter(col("n_part") >= minSupport)
      .localCheckpoint(false)
    val pruned = items.join(freq, Seq("part"))
    val total = items.agg(countDistinct(col("okey")).as("n_orders"))
    val ranked = pruned
      .select(col("okey"), col("part").as("part_a"), col("n_part").as("n_a"))
      .join(pruned.select(col("okey"), col("part").as("part_b"),
        col("n_part").as("n_b")), Seq("okey"))
      .filter(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .crossJoin(broadcast(total))
      .withColumn("lift_milli",
        expr("(support * n_orders * 1000) div (n_a * n_b)"))
      .withColumn("rank", expr("row_number() over (order by support desc, " +
        "part_a, part_b)"))
      .filter(col("rank") <= k)
    // the loud cap, made unconditional (r12 advice): a LEFT join FROM
    // the one-row drop scalar guarantees the count reaches the output
    // even when the cap/minSupport eliminate every pair — a nonzero
    // drop over an empty pair set emits one null-pair row instead of
    // silently vanishing. The trailing filter keeps the truly-empty
    // case (no pairs, no drops) empty, as before.
    dropped.join(broadcast(ranked), lit(true), "left")
      .filter(col("part_a").isNotNull || col("orders_dropped") > 0)
      .select(col("part_a"), col("part_b"), col("support"),
        col("n_a"), col("n_b"), col("lift_milli"), col("rank"),
        col("orders_dropped"))
  }

  /** TPC-H Q14-shaped promo revenue share: one ship-month of the fact
    * table (pushed-down timestamp range → partition/row-group pruning
    * at scale) broadcast-joined to the fixed-cardinality `part` dim,
    * then a conditional aggregate — the classic "small-dim attribute
    * routes a fact measure" shape. `part` carries an explicit
    * broadcast hint because its cardinality is a catalog constant
    * (like region/nation), not a scale-factor variable; the projection
    * is cut to the two needed columns before the hint so the broadcast
    * ships 2 columns, not 6.
    *
    * The promo sum uses null-skipping SUM(CASE …) with no ELSE — both
    * engines skip nulls identically — and the share is one double
    * division of the two exact decimal sums. */
  def promoRevenue(part: DataFrame, lineitem: DataFrame): DataFrame = {
    val disc = dec("l_extendedprice") *
      (lit(1).cast("decimal(3,2)") - dec("l_discount", 4))
    lineitem
      .filter(col("l_shipdate") >= lit("1995-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1995-10-01").cast("timestamp"))
      .join(broadcast(part.select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", disc)).as("promo_d"),
        sum(disc).as("total_d"),
        count(lit(1)).as("n_items"))
      .select(
        col("promo_d").cast("string").as("promo_revenue"),
        col("total_d").cast("string").as("total_revenue"),
        (lit(100.0) * col("promo_d").cast("double") /
          col("total_d").cast("double")).as("promo_pct"),
        col("n_items"))
  }

  /** Ranking window: top-3 orders per customer by value — row_number over
    * a per-key window (shuffles once on o_custkey). */
  def topOrdersPerCustomer(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders
      .select(
        col("o_custkey"), col("o_orderkey"),
        col("o_totalprice").as("total_price"),
        row_number().over(w).as("rank"))
      .filter(col("rank") <= 3)
  }

  /** Analytic window: running spend per customer in order-date order —
    * an unbounded-preceding frame over exact decimals. */
  def runningSpend(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.select(
      col("o_custkey"), col("o_orderkey"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
      col("o_totalprice").as("total_price"),
      sum(dec("o_totalprice")).over(w).cast("string").as("running_spend"))
  }

  /** RANGE-frame window: rolling 16-day spend per customer — the frame
    * is value-based (all orders within 15 days before the current row's
    * date, ties included as peers), not row-count-based; complements the
    * ROWS frame in [[runningSpend]]. */
  def rangeFrameSpend(orders: DataFrame): DataFrame = {
    val epochDay = datediff(col("o_orderdate").cast("date"),
      lit("1992-01-01").cast("date")).cast("long")
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("epoch_day"))
      .rangeBetween(-15, Window.currentRow)
    orders
      .withColumn("epoch_day", epochDay)
      .select(
        col("o_custkey"), col("o_orderkey"), col("epoch_day"),
        count(lit(1)).over(w).as("n_orders_16d"),
        sum(dec("o_totalprice")).over(w).cast("string").as("spend_16d"))
  }

  /** Single-pass statistical moments per order status: mean, population
    * variance, and the price↔order-day correlation, derived from EXACT
    * DECIMAL/integer power sums (Σx, Σx², Σy, Σy², Σxy). The naive
    * corr()/var_pop() aggregates accumulate doubles in partition order —
    * nondeterministic across engines and even across runs — so instead
    * the moments come out of one map-side-combinable aggregate of exact
    * partials, and the floating-point arithmetic happens once, at the
    * end, in a fixed expression order: bit-identical everywhere, and
    * the same single-pass shape a 100-TB profile job needs (no second
    * pass for the mean). */
  def orderMoments(orders: DataFrame): DataFrame = {
    val price = col("o_totalprice").cast("decimal(18,2)")
    val day = datediff(col("o_orderdate").cast("date"),
      lit("1992-01-01").cast("date")).cast("long")
    // All power sums are INT64 (cents for the exact sum/mean; whole
    // dollars for the second moments — floor-div of exact cents, so
    // Spark `div` ≡ DuckDB `//` on non-negative values). int64→double
    // is a single IEEE correctly-rounded conversion in every engine,
    // unlike wide-DECIMAL→double (where a scaled int128 path may round
    // twice — observed as last-ulp var/corr drift at sf0.1). Dollar
    // quantization shifts var by O(1/12) against var ~10¹⁰ — the same
    // documented trade as [[graft.ext.EventOps]]' quantized anomaly
    // moments. Overflow: with v ≤ 6·10⁵ dollars, v² ≤ 3.6·10¹¹, so
    // Σv² stays inside int64 only through ~2.5·10⁷ rows per group —
    // and past that bound non-ANSI Spark WRAPS silently while the
    // DuckDB oracle promotes/errors, so the engines diverge rather
    // than both degrade. Beyond ~10⁷ rows/group, coarsen the unit
    // (whole-dollar → 10²-dollar shifts the bound 10⁴×) or turn on
    // spark.sql.ansi.enabled to fail loudly.
    val g = orders
      .select(col("o_orderstatus"), price.as("p"), day.as("d"))
      .withColumn("cents", expr("CAST(p * 100 AS BIGINT)"))
      .withColumn("v", expr("cents div 100"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("p")).as("sx"),
        sum(col("cents")).as("sc"),
        sum(col("v")).as("sv"),
        sum(expr("v * v")).as("sx2"),
        sum(col("d")).as("sy"),
        sum(expr("d * d")).as("sy2"),
        sum(expr("v * d")).as("sxy"))
    val n = col("n_orders")
    val (dx, dx2) = (col("sv").cast("double"), col("sx2").cast("double"))
    val (dy, dy2) = (col("sy").cast("double"), col("sy2").cast("double"))
    val dxy = col("sxy").cast("double")
    g.select(col("o_orderstatus"), n,
      col("sx").cast("string").as("sum_price"),
      (col("sc").cast("double") / 100 / n).as("mean_price"),
      ((dx2 - dx * dx / n) / n).as("var_price"),
      ((n * dxy - dx * dy) /
        (sqrt(n * dx2 - dx * dx) * sqrt(n * dy2 - dy * dy)))
        .as("corr_price_day"))
  }

  /** Analytic functions: lag/lead/ntile over the per-customer order
    * timeline — days since the previous order, the next order's key, and
    * the order-date quartile within the customer. */
  def orderGaps(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders.select(
      col("o_custkey"), col("o_orderkey"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
      datediff(col("o_orderdate").cast("date"),
        lag(col("o_orderdate"), 1).over(w).cast("date")).as("days_since_prev"),
      lead(col("o_orderkey"), 1).over(w).as("next_orderkey"),
      ntile(4).over(w).as("date_quartile"))
  }

  /** Pivot: order counts per priority with one column per order status —
    * groupBy().pivot() on the Spark side, conditional aggregation in the
    * oracle (the relational form a pivot plans to). */
  def statusPivot(orders: DataFrame): DataFrame =
    orders.groupBy(col("o_orderpriority").as("order_priority"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("order_priority"), col("O").as("n_open"),
        col("F").as("n_finished"), col("P").as("n_pending"))

  /** Hierarchical aggregate: revenue by region → nation with ROLLUP
    * subtotals (grouping-sets coverage; grand-total row included).
    * Customer is NOT broadcast-hinted — it grows with scale factor;
    * only the fixed-cardinality region/nation dims are (see
    * [[regionVolume]]). */
  def revenueRollup(region: DataFrame, nation: DataFrame, customer: DataFrame,
      orders: DataFrame): DataFrame = {
    val dims = broadcast(
      nation.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name")))
    orders
      .join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(dims, col("c_nationkey") === col("n_nationkey"))
      .rollup(col("r_name").as("region_name"), col("n_name").as("nation_name"))
      .agg(sum(dec("o_totalprice")).cast("string").as("revenue"),
        count(lit(1)).as("n_orders"))
  }

  /** CUBE aggregate: revenue and order counts by (status, priority) with
    * every subtotal combination — the full grouping-sets lattice
    * ([[revenueRollup]] covers the hierarchical slice). */
  def statusPriorityCube(orders: DataFrame): DataFrame =
    orders
      .cube(col("o_orderstatus").as("order_status"),
        col("o_orderpriority").as("order_priority"))
      .agg(sum(dec("o_totalprice")).cast("string").as("revenue"),
        count(lit(1)).as("n_orders"))

  /** Arbitrary GROUPING SETS: the named subtotal combinations a report
    * actually wants — (status, priority), (status), and the grand total,
    * WITHOUT the (priority)-only slice a full [[statusPriorityCube]]
    * would also compute. One pass, one shuffle: Spark expands the sets
    * into a single Expand + hash aggregate, same as rollup/cube — the
    * lattice is pruned at plan time, not filtered after. */
  def statusPrioritySets(orders: DataFrame): DataFrame =
    orders
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(sum(dec("o_totalprice")).cast("string").as("revenue"),
        count(lit(1)).as("n_orders"))
      .select(col("o_orderstatus").as("order_status"),
        col("o_orderpriority").as("order_priority"),
        col("revenue"), col("n_orders"))

  /** Approximate distinct customers per priority (HLL++) next to the
    * exact count — the approximate-aggregate family for 100 TB counting,
    * where exact distinct means a full shuffle of the key universe and
    * the sketch is a fixed few KB per group. HLL register merge is a
    * max() — order-insensitive — so the estimate is deterministic for a
    * given dataset and rsd; it IS engine-specific, so this query gets a
    * rows-only driver gate and the unit spec asserts the relative error
    * bound instead. */
  def approxDistinctCustomers(orders: DataFrame): DataFrame =
    orders
      .groupBy(col("o_orderpriority").as("order_priority"))
      .agg(approx_count_distinct(col("o_custkey")).as("approx_customers"),
        countDistinct(col("o_custkey")).as("exact_customers"))
      // HLL register contents are engine-specific, but the accuracy
      // CLAIM is not: |approx − exact| ≤ 3σ with σ = 5% (the default
      // rsd). `bound` is integer ceil(15%·exact) — ceil-div with
      // positive operands, so Spark `div` and DuckDB `//` agree — and
      // `within_bound` is the boolean the oracle predicts as TRUE.
      // Selecting (exact, bound, within_bound) hash-gates the sketch's
      // contract without hashing its engine-specific value.
      .withColumn("bound",
        expr("(15 * exact_customers + 99) div 100"))
      .withColumn("within_bound",
        abs(col("approx_customers") - col("exact_customers")) <= col("bound"))
      .orderBy(col("order_priority"))

  /** Exact discrete percentiles (p50/p90/p99 of order value per status)
    * via rank arithmetic: the pN is the value at row ⌈N·n⌉ of the
    * per-group sort — percentile_disc semantics, no interpolation, so
    * the result is an actual data value (an exact DECIMAL) and the
    * cross-engine hash is safe where interpolated double percentiles
    * would not be.
    *
    * Scale posture: one shuffle on the group key for the window sort,
    * then a partial+final aggregate. For quantiles over 100 TB where a
    * full per-group sort is too hot, the approximate companion is
    * percentile_approx (t-digest, mergeable, fixed size) — same shape
    * as [[approxDistinctCustomers]]'s exact/approx pairing. */
  def statusPercentiles(orders: DataFrame): DataFrame = {
    val byStatus = Window.partitionBy(col("o_orderstatus"))
    val w = byStatus.orderBy(col("o_totalprice"), col("o_orderkey"))
    val ranked = orders.select(
      col("o_orderstatus"),
      dec("o_totalprice").as("price"),
      row_number().over(w).as("rn"),
      count(lit(1)).over(byStatus).as("n"))
    def pick(p: Double) =
      max(when(col("rn") === ceil(col("n") * p), col("price")))
    ranked.groupBy(col("o_orderstatus").as("order_status"))
      .agg(
        max(col("n")).as("n_orders"),
        pick(0.5).cast("string").as("p50_price"),
        pick(0.9).cast("string").as("p90_price"),
        pick(0.99).cast("string").as("p99_price"))
  }

  /** Approximate quantiles (p50/p90/p99 of order value per status) via
    * percentile_approx — the mergeable-sketch companion to
    * [[statusPercentiles]] for 100-TB quantiles, where the exact form's
    * per-group window sort means shuffling every row of the key
    * universe and the sketch is a fixed-size accumulator per group
    * (partial+final merge, map-side combinable, no global sort).
    *
    * accuracy=10000 bounds the rank error at n/10000 per group. Sketch
    * contents are engine-specific (like [[approxDistinctCustomers]]'s
    * HLL registers), so this query takes the rows-only driver gate and
    * ExtOpsSpec asserts the error bound against the exact form. */
  def statusPercentilesApprox(orders: DataFrame, accuracy: Int = 10000): DataFrame = {
    val approx = orders
      .groupBy(col("o_orderstatus").as("order_status"))
      .agg(
        count(lit(1)).as("n_orders"),
        percentile_approx(col("o_totalprice"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(accuracy)).as("ps"))
      .select(
        col("order_status"), col("n_orders"),
        col("ps").getItem(0).as("p50_price"),
        col("ps").getItem(1).as("p90_price"),
        col("ps").getItem(2).as("p99_price"))
    // Rank-error bracket: Greenwald–Khanna at 1/accuracy guarantees the
    // returned value's rank is within ε·n of the target; the bracket
    // [value at rank ⌈n·p⌉−slack, value at rank ⌈n·p⌉+slack] with
    // slack = max(2, ⌈2εn⌉) is computed EXACTLY (rank arithmetic over
    // DECIMAL values, same shape as [[statusPercentiles]]) in both
    // engines, so `pNN_ok = lo ≤ approx ≤ hi` is a cross-engine
    // hash-safe boolean even though the approx value itself is not.
    val byStatus = Window.partitionBy(col("o_orderstatus"))
    val w = byStatus.orderBy(col("o_totalprice"), col("o_orderkey"))
    val ranked = orders.select(
      col("o_orderstatus"),
      dec("o_totalprice").as("price"),
      row_number().over(w).as("rn"),
      count(lit(1)).over(byStatus).as("n"))
    val slack = greatest(lit(2L), expr(s"(2 * n + ${accuracy - 1}) div $accuracy"))
    def at(p: Double, off: Column) = {
      val target = greatest(lit(1L),
        least(col("n"), ceil(col("n") * p).cast("long") + off))
      max(when(col("rn") === target, col("price")))
    }
    val brackets = ranked.groupBy(col("o_orderstatus").as("order_status"))
      .agg(
        at(0.5, -slack).as("p50_lo"), at(0.5, slack).as("p50_hi"),
        at(0.9, -slack).as("p90_lo"), at(0.9, slack).as("p90_hi"),
        at(0.99, -slack).as("p99_lo"), at(0.99, slack).as("p99_hi"))
    def ok(p: String) = col(s"${p}_price").cast("decimal(18,2)")
      .between(col(s"${p}_lo"), col(s"${p}_hi")).as(s"${p}_ok")
    approx.join(brackets, "order_status")
      .select(col("order_status"), col("n_orders"),
        col("p50_price"), col("p90_price"), col("p99_price"),
        ok("p50"), ok("p90"), ok("p99"))
      .orderBy(col("order_status"))
  }

  /** TPC-H Q4-shaped order-priority check: one quarter of orders,
    * kept iff ANY of their lineitems shipped more than 60 days after
    * the order date (the trimmed schema has no l_commitdate /
    * l_receiptdate, so "shipped late vs the order date" stands in for
    * Q4's commit-vs-receipt lateness — same EXISTS shape), counted per
    * priority.
    *
    * Scale posture: the EXISTS is a LEFT SEMI join — Spark's semi join
    * short-circuits per probe key (no fact×fact row explosion, output
    * bounded by the orders side) and the non-equi lateness predicate
    * rides the equi join as a residual filter, not a cartesian. The
    * date filter prunes the orders side at the scan. */
  def orderPriorityCheck(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
      .join(lineitem.select(col("l_orderkey"), col("l_shipdate")),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority").as("order_priority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("order_priority"))

  /** TPC-H Q18-shaped large-volume orders: orders whose total lineitem
    * quantity exceeds a threshold, joined back to customer and
    * lineitem for the report row.
    *
    * Scale posture: the HAVING aggregate groups the fact by
    * `l_orderkey` — a NEAR-UNIQUE key (~4 rows per order), so map-side
    * partial aggregation is the wrong shape: each scan task's partial
    * hash map must hold its whole split's distinct keys (fact-sized in
    * aggregate) for a ~4× row reduction, and past ~30× the maps
    * outgrow the memory manager's share and every task falls back to
    * sort-based aggregation — the r15 ladder's 100×-rung knee. The
    * exchange is therefore moved BELOW the aggregate
    * (repartition-first, the orders_basket discipline): the 2-column
    * projection shuffles raw and the aggregate runs complete per hash
    * partition, each map bounded by keys/partitions. Measured at the
    * 100× rung: 6.6 s → 4.7 s solo, and faster at every smaller rung
    * too (sf0.1: 0.93 → 0.66 s). The aggregate yields a TINY key list
    * (46 keys at sf0.01); joining the fact tables against it is a
    * broadcast-able semi filter — AQE broadcasts the aggregated side,
    * so neither fact table reshuffles against the other before the
    * filter has cut them. */
  def largeVolumeOrders(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, minQty: Double = 300.0): DataFrame = {
    val big = lineitem.select(col("l_orderkey"), col("l_quantity"))
      .repartition(col("l_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(sum(dec("l_quantity")).as("qty_d"))
      .filter(col("qty_d") > lit(minQty).cast("decimal(18,2)"))
    orders
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(
        col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_totalprice").as("total_price"),
        col("qty_d").cast("string").as("total_qty"))
      .orderBy(col("total_price").desc, col("o_orderkey"))
      .limit(20)
  }

  /** TPC-H Q19-shaped disjunctive-predicate join: revenue from three
    * OR'd (brand, size, quantity) branches — the classic "discount
    * revenue from qualified parts" shape whose point is predicate
    * handling: each branch pairs a dimension predicate (brand/size)
    * with a fact predicate (quantity), and the OR of the three must
    * not break the equi join underneath.
    *
    * Scale posture: the join stays a single broadcast hash join on
    * p_partkey (part is catalog-constant, 2-column projection before
    * the hint); the disjunction is evaluated post-join inside codegen.
    * The common `l_quantity <= 30` envelope of the three branches is
    * ALSO applied standalone before the join — a derived conjunct the
    * optimizer cannot infer from the OR — so the fact scan prunes to
    * the quantity envelope at the parquet reader. */
  def brandRevenue(part: DataFrame, lineitem: DataFrame): DataFrame = {
    def branch(brand: String, qLo: Int, qHi: Int, sizeHi: Int) =
      col("p_brand") === brand &&
        col("l_quantity").between(qLo, qHi) &&
        col("p_size").between(1, sizeHi)
    lineitem
      .filter(col("l_quantity") <= 30)
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"),
        col("p_size"))), col("l_partkey") === col("p_partkey"))
      .filter(branch("Brand#12", 1, 11, 5) ||
        branch("Brand#23", 10, 20, 10) ||
        branch("Brand#4", 20, 30, 15))
      .agg(
        sum(dec("l_extendedprice") *
          (lit(1).cast("decimal(3,2)") - dec("l_discount", 4))).as("rev_d"),
        count(lit(1)).as("n_items"))
      .select(col("rev_d").cast("string").as("revenue"), col("n_items"))
  }

  /** TPC-H Q10-shaped returned-item report: top-20 customers by revenue
    * lost to returns in one quarter, with nation context.
    *
    * Scale posture: orders prunes on the date range at the scan, the
    * returnflag filter prunes lineitem at the scan (PushedFilters),
    * nation is broadcast (catalog-constant); customer is left unhinted
    * per module policy (scale-growing side — AQE decides). The top-20
    * is a TakeOrdered over the aggregated frame, not a global sort. */
  def returnedItemReport(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, nation: DataFrame): DataFrame =
    orders
      .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .join(lineitem.filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(dec("l_extendedprice") *
        (lit(1).cast("decimal(3,2)") - dec("l_discount", 4))).as("rev_d"))
      .orderBy(col("rev_d").desc, col("c_custkey"))
      .limit(20)
      .select(col("c_custkey"), col("c_name"),
        col("rev_d").cast("string").as("revenue"),
        col("c_acctbal").as("acct_bal"), col("n_name").as("nation"))

  /** Set operations: customers with BUILDING-segment accounts EXCEPT those
    * who placed an open ('O') order, plus the INTERSECT of high-balance
    * customers with order placers. The anti-join shape the reference has;
    * the set-op surface it lacks. */
  def segmentSetOps(customer: DataFrame, orders: DataFrame): DataFrame = {
    val building = customer.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val openCust = orders.filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("c_custkey"))
    val highBal = customer.filter(col("c_acctbal") > 5000)
      .select(col("c_custkey"))
    building.except(openCust).withColumn("set_kind", lit("building_no_open"))
      .unionAll(highBal.intersect(openCust)
        .withColumn("set_kind", lit("highbal_open")))
  }

  /** TPC-H Q16-shaped supplier variety: distinct suppliers per
    * (brand, type) over a size-banded part slice — the
    * count-DISTINCT-per-group shape at fact scale. Spark plans the
    * distinct as a two-phase aggregate (partial distinct on
    * (brand, type, suppkey), then the count) — the dedup happens
    * map-side before the exchange, so the shuffle carries the
    * DISTINCT key set, not fact rows. part is broadcast (catalog
    * constant, 4-column projection). Deterministic top-20 tie-break
    * on the group key. */
  def supplierVariety(part: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .join(broadcast(part.filter(col("p_size").between(1, 15))
        .select(col("p_partkey"), col("p_brand"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"))
      .limit(20)

  /** MULTISET set operations — the bag semantics [[segmentSetOps]]'
    * distinct forms cannot express: EXCEPT ALL subtracts
    * MULTIPLICITIES (a part returned 5 times minus accepted 3 times
    * survives twice), INTERSECT ALL keeps the min multiplicity. The
    * per-part surviving multiplicity is the actual inventory/recon
    * number; a distinct EXCEPT would collapse it to membership.
    *
    * Scale posture: Spark plans both as hash aggregations of
    * per-side counts on the key (one shuffle each) — bag semantics
    * cost the same as distinct semantics, there is no row-by-row
    * matching. The grouped output keeps the result frame small and
    * hash-gateable. */
  def multisetPartOps(lineitem: DataFrame): DataFrame = {
    val ret = lineitem.filter(col("l_returnflag") === "R")
      .select(col("l_partkey"))
    val acc = lineitem.filter(col("l_returnflag") === "A")
      .select(col("l_partkey"))
    ret.exceptAll(acc)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("multiplicity"))
      .withColumn("set_kind", lit("returned_minus_accepted"))
      .unionAll(ret.intersectAll(acc)
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("multiplicity"))
        .withColumn("set_kind", lit("returned_and_accepted")))
  }

  private def revenue: Column =
    dec("l_extendedprice") * (lit(1).cast("decimal(3,2)") - dec("l_discount", 4))

  /** TPC-H Q7-shaped bilateral trade volume: revenue flowing between a
    * specific (supplier nation, customer nation) pair per ship year,
    * in both directions. Two independent broadcast nation dims resolve
    * the two roles; the fact chain shuffles on its natural keys. */
  def nationTrade(nation: DataFrame, customer: DataFrame, supplier: DataFrame,
      orders: DataFrame, lineitem: DataFrame,
      nationA: String = "NATION_1", nationB: String = "NATION_2"): DataFrame = {
    val pair = Seq(nationA, nationB)
    // Attach the two nation names by FILTER + literal map rather than
    // a dim join: nation is a catalog-constant ~25-row dim, so the
    // two (key, name) pairs collect to the driver in one tiny job —
    // the same data movement a broadcast(nat) pays. What the join
    // spelling cost: Spark's size-only estimator scores a join output
    // as the PRODUCT of the child estimates, so (customer ⋈ nat) and
    // (supplier ⋈ nat) blew past autoBroadcastJoinThreshold and the
    // fact chain planned BOTH attach joins as SortMergeJoin at every
    // SF (plans/r19/q7_nation_trade_before.txt, ops 23/35; AQE
    // converted them at runtime — static 1.33 s vs AQE 0.74 s). With
    // filter + map the sides keep their SCAN estimates, so small
    // corpora broadcast and genuinely large ones sort-merge — chosen
    // by estimation, as the scale rule demands.
    val keyName: Seq[(Int, String)] = nation
      .filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey"), col("n_name"))
      .collect().toSeq.map(r => (r.getInt(0), r.getString(1)))
    val nameOf = map(keyName.flatMap { case (k, v) =>
      Seq(lit(k), lit(v)) }: _*)
    val keys = keyName.map(_._1)
    val cust = customer
      .filter(col("c_nationkey").isin(keys: _*))
      .select(col("c_custkey"),
        element_at(nameOf, col("c_nationkey")).as("cust_nation"))
    val supp = supplier
      .filter(col("s_nationkey").isin(keys: _*))
      .select(col("s_suppkey"),
        element_at(nameOf, col("s_nationkey")).as("supp_nation"))
    lineitem
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(revenue).as("revenue_d"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .select(col("supp_nation"), col("cust_nation"), col("l_year"),
        col("revenue_d").cast("string").as("revenue"))
  }

  /** TPC-H Q8-shaped market share: of all STANDARD-part revenue sold to
    * customers in one region, the fraction supplied from one nation,
    * per order year. The share is a single IEEE division of two exact
    * decimal sums (both also emitted as strings), so the double is
    * bit-identical cross-engine. Conditional aggregation replaces the
    * original's CASE-inside-sum verbatim. */
  def marketShare(region: DataFrame, nation: DataFrame, customer: DataFrame,
      supplier: DataFrame, orders: DataFrame, lineitem: DataFrame, part: DataFrame,
      regionName: String = "EUROPE", supplierNation: String = "NATION_3",
      partType: String = "STANDARD"): DataFrame = {
    // region ⋈ nation are catalog-constant dims: collect the region's
    // nation keys (one tiny driver job — the same bytes the broadcast
    // shipped) and filter customer directly. The join spelling scored
    // (customer ⋈ custNat) as the PRODUCT of the child estimates, so
    // the fact-chain attach planned as SortMergeJoin at every SF
    // (plans/r19/q8_market_share_before.txt op 37); the filter keeps
    // customer's scan estimate, so the attach broadcasts while it
    // fits and sort-merges once it doesn't — by estimation.
    val custKeys: Seq[Int] = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
      .collect().toSeq.map(_.getInt(0))
    val cust = customer
      .filter(col("c_nationkey").isin(custKeys: _*))
      .select(col("c_custkey"))
    val suppNatKey = nation.filter(col("n_name") === supplierNation)
      .select(col("n_nationkey").as("target_nk"))
    val supp = supplier
      .join(broadcast(suppNatKey), col("s_nationkey") === col("target_nk"), "left")
      .select(col("s_suppkey"), col("target_nk").isNotNull.as("is_target"))
    lineitem
      .join(broadcast(part.filter(col("p_type") === partType)
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("is_target"), revenue)
          .otherwise(lit(0).cast("decimal(18,2)"))).as("nation_rev_d"),
        sum(revenue).as("total_rev_d"))
      .orderBy(col("o_year"))
      .select(col("o_year"),
        col("nation_rev_d").cast("string").as("nation_revenue"),
        col("total_rev_d").cast("string").as("total_revenue"),
        (col("nation_rev_d").cast("double") / col("total_rev_d").cast("double"))
          .as("mkt_share"))
  }

  /** TPC-H Q9-shaped profit by supplier nation and year, adapted to the
    * trimmed schema: with no partsupp table, the cost side is the
    * part's retail price times quantity (p_retailprice standing in for
    * ps_supplycost — same join shape, same arithmetic). Parts are
    * selected by a name substring exactly like the original's
    * `p_name LIKE '%green%'`. */
  def productProfit(nation: DataFrame, supplier: DataFrame, orders: DataFrame,
      lineitem: DataFrame, part: DataFrame,
      nameFragment: String = "bolt"): DataFrame =
    lineitem
      .join(broadcast(part.filter(col("p_name").contains(nameFragment))
        .select(col("p_partkey"), col("p_retailprice"))),
        col("l_partkey") === col("p_partkey"))
      .join(orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(supplier.select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(revenue - dec("p_retailprice") * dec("l_quantity"))
        .as("profit_d"))
      .orderBy(col("nation"), col("o_year").desc)
      .select(col("nation"), col("o_year"),
        col("profit_d").cast("string").as("profit"))

  /** TPC-H Q12-shaped late-shipment priority split, adapted: with no
    * ship modes or commit/receipt dates, "late" is shipping more than
    * `lateDays` after the order date, bucketed by ship year. The
    * CASE-inside-count conditional aggregation is the operator under
    * test (the original's high/low line counts, verbatim). */
  def lateShipmentPriority(orders: DataFrame, lineitem: DataFrame,
      lateDays: Int = 90): DataFrame =
    lineitem
      .join(orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >
        col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"))
      .groupBy(year(col("l_shipdate")).as("ship_year"))
      .agg(
        count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
          .as("high_line_count"),
        count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
          .as("low_line_count"))
      .orderBy(col("ship_year"))

  /** TPC-H Q13-shaped customer order-count distribution: LEFT join so
    * zero-order customers land in the c_count=0 bucket (the shape the
    * semi-join family cannot express), then a second aggregate over
    * the first — two shuffles by construction, both on shrinking
    * keys. The priority filter stands in for the original's comment
    * anti-pattern. */
  def customerOrderDistribution(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.select(col("c_custkey"))
      .join(orders.filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
        .select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q15-shaped top supplier: quarterly revenue per supplier,
    * then the supplier(s) achieving the GLOBAL max — the original's
    * scalar-subquery-on-a-view shape. The max is a scalar aggregate
    * broadcast back onto the per-supplier frame (NOT a global window:
    * suppliers grow with scale factor, and an unpartitioned window
    * would single-task them — the plan NoGlobalWindowGuard exists to
    * reject). Decimal equality is exact, so ties all emit, ordered by
    * key. */
  def topSupplier(supplier: DataFrame, lineitem: DataFrame,
      qStart: String = "1996-01-01", qEnd: String = "1996-04-01"): DataFrame = {
    // lazy localCheckpoint: the supplier-cardinality rev frame feeds
    // BOTH the scalar max and the equality probe — without the pin the
    // planner re-derives the aggregate under each consumer and the
    // quarter of lineitem is scanned twice (the dominant cost at scale)
    val rev = lineitem
      .filter(col("l_shipdate") >= lit(qStart).cast("timestamp") &&
        col("l_shipdate") < lit(qEnd).cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(revenue).as("total_revenue_d"))
      .localCheckpoint(false)
    rev
      .crossJoin(broadcast(rev.agg(max(col("total_revenue_d")).as("max_rev"))))
      .filter(col("total_revenue_d") === col("max_rev"))
      .join(supplier.select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .orderBy(col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_revenue_d").cast("string").as("total_revenue"))
  }

  /** TPC-H Q17-shaped small-quantity revenue: lineitems of one brand
    * whose quantity is below 20% of that part's average quantity. The
    * correlated per-part average becomes ONE part-keyed window over
    * the brand-filtered fact — one lineitem scan and one exchange,
    * where the textbook decorrelation (aggregate joined back, the
    * shape sql_q17_below_avg keeps as parsed SQL) scans the fact
    * twice. The 20%-of-average comparison is kept in EXACT
    * integer/decimal arithmetic (qty < sum/(5·cnt) rewritten as
    * 5·qty·cnt < sum) so the boundary rows hash-gate identically
    * cross-engine, where a double `0.2*avg` could flip them. */
  def smallQuantityRevenue(part: DataFrame, lineitem: DataFrame,
      brand: String = "Brand#4"): DataFrame = {
    val brandParts = broadcast(part.filter(col("p_brand") === brand)
      .select(col("p_partkey")))
    val w = Window.partitionBy(col("l_partkey"))
    lineitem
      .join(brandParts, col("l_partkey") === col("p_partkey"))
      .withColumn("sum_qty_d", sum(dec("l_quantity")).over(w))
      .withColumn("cnt_qty", count(lit(1)).over(w))
      .filter(dec("l_quantity") * lit(5).cast("decimal(2,0)") * col("cnt_qty") <
        col("sum_qty_d"))
      .agg(sum(dec("l_extendedprice")).as("rev_d"), count(lit(1)).as("n_lines"))
      .select(col("rev_d").cast("string").as("small_qty_revenue"),
        (col("rev_d").cast("double") / 7.0).as("avg_yearly"),
        col("n_lines"))
  }

  /** The textbook JOIN-BACK spelling of Q17 — per-part aggregate
    * joined back to the fact, the shape [[smallQuantityRevenue]] was
    * hand-rewritten away from because it scans the fact twice — left
    * exactly as a user would write it, for the [[graft.plans.WinMagic]]
    * optimizer rule to rewrite mechanically. The rule collapses it to
    * the one-scan window form; the same oracle row gates both paths,
    * and WinMagicSpec asserts the collapsed plan (one lineitem
    * relation, a Window, no join-back join). Same exact arithmetic. */
  def smallQuantityRevenueJoinBack(part: DataFrame, lineitem: DataFrame,
      brand: String = "Brand#4"): DataFrame = {
    val brandParts = broadcast(part.filter(col("p_brand") === brand)
      .select(col("p_partkey")))
    val fact = lineitem.join(brandParts, col("l_partkey") === col("p_partkey"))
    val stats = fact.groupBy(col("l_partkey"))
      .agg(sum(dec("l_quantity")).as("sum_qty_d"),
        count(lit(1)).as("cnt_qty"))
    // rewrite at the ANALYZED layer: the join-back's two fact subtrees
    // are still textually identical there, so the rule's sameResult
    // match sees through the multi-relation core (at optimizer time,
    // pruning and constraint inference have already decorated each
    // side differently — WinMagic.rewriteDf's scaladoc)
    graft.plans.WinMagic.rewriteDf(
      fact.join(stats, "l_partkey")
        .filter(dec("l_quantity") * lit(5).cast("decimal(2,0)") *
          col("cnt_qty") < col("sum_qty_d")))
      .agg(sum(dec("l_extendedprice")).as("rev_d"), count(lit(1)).as("n_lines"))
      .select(col("rev_d").cast("string").as("small_qty_revenue"),
        (col("rev_d").cast("double") / 7.0).as("avg_yearly"),
        col("n_lines"))
  }

  /** TPC-H Q21-shaped waiting-supplier count, adapted: with no
    * commit/receipt dates, the "supplier who kept the order waiting"
    * is the SOLE LATEST shipper of a multi-supplier finished order —
    * their lineitem max ship date equals the order's, strictly later
    * than every other supplier's. The original's EXISTS/NOT-EXISTS
    * pair becomes per-(order, supplier) aggregation + one order-keyed
    * window computing (order max, achiever count, supplier count) in a
    * single pass — fact rows cross exactly two exchanges. */
  def waitingSuppliers(supplier: DataFrame, orders: DataFrame,
      lineitem: DataFrame, k: Int = 20): DataFrame = {
    val perSupp = lineitem
      .join(orders.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("l_shipdate")).as("supp_max_ship"))
    val w = Window.partitionBy(col("l_orderkey"))
    val flagged = perSupp
      .withColumn("order_max_ship", max(col("supp_max_ship")).over(w))
      .withColumn("n_supps", count(lit(1)).over(w))
      .withColumn("n_latest", count(when(
        col("supp_max_ship") === col("order_max_ship"), 1)).over(w))
      .filter(col("n_supps") > 1 && col("n_latest") === 1 &&
        col("supp_max_ship") === col("order_max_ship"))
    flagged
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(supplier.select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(k)
      .select(col("s_name"), col("numwait"))
  }

  /** TPC-H Q22-shaped dormant high-value customers: customers with an
    * account balance above the positive-balance average (scalar
    * subquery — kept as exact bal·cnt > sum decimal arithmetic so
    * boundary rows can't flip cross-engine) and NO orders after a
    * cutoff (anti join), counted per nation with their balance sum.
    * The nation stands in for the original's phone country code. */
  def dormantValueCustomers(nation: DataFrame, customer: DataFrame,
      orders: DataFrame, cutoff: String = "1999-01-01"): DataFrame = {
    val balStats = customer.filter(col("c_acctbal") > 0)
      .agg(sum(dec("c_acctbal")).as("sum_bal_d"), count(lit(1)).as("cnt_bal"))
    val recent = orders
      .filter(col("o_orderdate") >= lit(cutoff).cast("timestamp"))
      .select(col("o_custkey"))
    customer
      .crossJoin(broadcast(balStats))
      .filter(dec("c_acctbal") * col("cnt_bal") > col("sum_bal_d"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec("c_acctbal")).as("totacctbal_d"))
      .orderBy(col("nation"))
      .select(col("nation"), col("numcust"),
        col("totacctbal_d").cast("string").as("totacctbal"))
  }

  /** TPC-H Q6-shaped forecast revenue: one ship year × a narrow
    * discount band × small quantities, one conditional-free aggregate.
    * The three predicates all push to the parquet scan (timestamp
    * range → row-group pruning; the others → row filters), which is
    * the entire point of the shape: at 100 TB this query reads one
    * year's row groups of four columns and nothing else. Split by
    * return flag so the result exercises grouping (the pure-scalar
    * original is a weaker gate). */
  def forecastRevenue(lineitem: DataFrame, yStart: String = "1996-01-01",
      yEnd: String = "1997-01-01"): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit(yStart).cast("timestamp") &&
        col("l_shipdate") < lit(yEnd).cast("timestamp") &&
        col("l_discount").between(0.04, 0.06) && col("l_quantity") < 24)
      .groupBy(col("l_returnflag"))
      .agg(sum(dec("l_extendedprice") * dec("l_discount", 4)).as("rev_d"),
        count(lit(1)).as("n_items"))
      .select(col("l_returnflag"),
        col("rev_d").cast("string").as("revenue"), col("n_items"))

  /** TPC-H Q2-shaped min-cost lookup (DataFrame twin of the
    * sql_q2_mincost correlated scalar subquery): parts achieving their
    * type's minimum retail price. The hand decorrelation is the same
    * rewrite Catalyst's RewriteCorrelatedScalarSubquery performs on
    * the SQL form — per-type min aggregate joined back — but here the
    * aggregate is explicitly broadcast: the distinct-type frame is
    * catalog-cardinality (dozens of rows at any scale factor), so the
    * part table never shuffles. Raw double equality on purpose: both
    * sides are the same parquet value, no arithmetic. */
  def minCostParts(part: DataFrame): DataFrame = {
    val mins = part.groupBy(col("p_type").as("mt_type"))
      .agg(min(col("p_retailprice")).as("min_price"))
    part
      .join(broadcast(mins), col("p_type") === col("mt_type") &&
        col("p_retailprice") === col("min_price"))
      .select(col("p_type"), col("p_partkey"),
        col("p_retailprice").as("retail_price"))
  }

  /** TPC-H Q11-shaped important stock, adapted to the trimmed schema:
    * with no partsupp, a part's "stock value" at one nation's
    * suppliers is the shipped value (price × quantity) of that
    * nation's lineitems; keep parts whose value exceeds `hotMult`/2
    * times the AVERAGE per-part value — the
    * group-aggregate-vs-global-scalar HAVING shape of the original,
    * with the threshold SELF-SCALING where TPC-H's fixed 0.0001
    * fraction needs manual division by SF (a fixed fraction of a
    * total spread over SF-many more parts selects nothing at 10×; the
    * 10× probe caught exactly that with an earlier fixed denominator).
    * All arithmetic is exact int64 CENTS: decimal(18,2)·100 is
    * integral so the cast is lossless, quantities are integral, and
    * the comparison is `value > (total·hotMult) div (2·n_parts)` —
    * the multiplication rides the TOTAL (bounded ~10^17·hotMult,
    * inside long range at any SF), never value·n_parts (which would
    * overflow at ~10^7 parts). The floor division is identical in
    * both engines, so the boundary is engine-exact. The scalar
    * (total, count) broadcasts; the fact shuffles once, on
    * l_partkey. */
  def importantStock(nation: DataFrame, supplier: DataFrame,
      lineitem: DataFrame, nationName: String = "NATION_1",
      hotMult: Int = 7): DataFrame = {
    val supp = supplier
      .join(broadcast(nation.filter(col("n_name") === nationName)
        .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val cents = (dec("l_extendedprice") * lit(100).cast("decimal(3,0)"))
      .cast("long") * col("l_quantity").cast("long")
    val vals = lineitem
      .join(supp, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(cents).as("value_cents"))
    val total = vals.agg(sum(col("value_cents")).as("total_cents"),
      count(lit(1)).as("n_parts"))
    vals.crossJoin(broadcast(total))
      .filter(col("value_cents") >
        expr(s"(total_cents * $hotMult) div (2 * n_parts)"))
      .select(col("l_partkey").as("p_partkey"), col("value_cents"))
  }

  /** TPC-H Q20-shaped dominant promo suppliers, adapted: with no
    * partsupp availqty, the "supplier with excess stock" is the one
    * who shipped MORE THAN HALF of a promo part's total quantity in
    * the target year — the same correlated half-of-total threshold,
    * re-correlated through one part-keyed window instead of the
    * original's nested subquery chain. Per-(part, supplier) rows cross
    * exactly one exchange; the half-of-total comparison is exact
    * decimal (sum·2 just widens precision); suppliers dedup on a
    * key-only frame before the dim joins. */
  def promoSuppliers(nation: DataFrame, supplier: DataFrame, part: DataFrame,
      lineitem: DataFrame, fragment: String = "bolt",
      nationName: String = "NATION_1", yStart: String = "1996-01-01",
      yEnd: String = "1997-01-01"): DataFrame = {
    val parts = broadcast(part.filter(col("p_name").contains(fragment))
      .select(col("p_partkey")))
    // partkey-FIRST repartition: the part join is hint-broadcast at
    // every scale (keys-only projection), so the fact arrives with no
    // useful partitioning. One explicit l_partkey exchange then serves
    // both the (part, supplier) aggregate (subset satisfaction) and
    // the part-keyed window — without it the agg shuffles on the pair
    // key and the window re-shuffles the result on l_partkey. Forgone
    // map-side combine costs ~nothing: per-(part, supplier) lineitem
    // multiplicity is ~1-2 in a single ship year.
    val perSupp = lineitem
      .filter(col("l_shipdate") >= lit(yStart).cast("timestamp") &&
        col("l_shipdate") < lit(yEnd).cast("timestamp"))
      .join(parts, col("l_partkey") === col("p_partkey"))
      .repartition(col("l_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(dec("l_quantity")).as("supp_qty_d"))
    val w = Window.partitionBy(col("l_partkey"))
    perSupp
      .withColumn("part_qty_d", sum(col("supp_qty_d")).over(w))
      .filter(col("supp_qty_d") * lit(2).cast("decimal(1,0)") >
        col("part_qty_d"))
      .select(col("l_suppkey")).distinct()
      .join(supplier.select("s_suppkey", "s_name", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.filter(col("n_name") === nationName)
        .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .orderBy(col("s_name"))
      .select(col("s_name"), col("s_suppkey"))
  }
}
