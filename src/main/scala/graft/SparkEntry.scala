package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ext.{Analytics, CentroidStore, DedupOps, EmbedIndex, EmbedOps, EventOps, MultiModal, TemporalJoins, TextOps, TokenizerStore}
import graft.oracle.{OracleSql, OracleSqlExt}
import graft.pipeline.{MatchFixture, MatchPipeline}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is one operator (or operator composition) from
  * SURVEY.md §2; every entry in `oracleSql` is an independent ANSI-SQL
  * formulation the driver runs in DuckDB over the same parquet tables.
  */
object SparkEntry {

  /** The synthetic stream-envelope fixture. Cached: the envelope columns
    * are built with interpreted (CodegenFallback) JSON expressions, and
    * without a materialization barrier Catalyst's filter-pushdown
    * substitution inlines those trees into every downstream predicate /
    * projection — each row then re-serializes and re-parses the embedded
    * JSON dozens of times (measured 120 ms/row at sf0.01). Caching makes
    * the fixture a leaf, exactly like the parquet/stream scan it stands in
    * for at production scale, so each envelope row is computed once. */
  private def envelope(s: SparkSession, dir: String): DataFrame =
    MatchFixture.envelope(
      // The customer parquet is a single file → a single input partition;
      // spreading it across the cores first keeps the (cached) fixture and
      // everything downstream parallel, as a real multi-shard stream
      // source would be.
      Tables.customer(s, dir).repartition(spread(s))).cache()

  /** The decide()d frame all five pipeline queries project from. Cached
    * and memoized: the decode → dedup-join → cascade stage is one large
    * generated class whose Janino compilation dominates latency; sharing
    * one cached DataFrame instance means the sibling queries (Verify/Bench
    * run them back to back in one session) compile and evaluate it exactly
    * once. Memoization by (session, dir) — rather than relying on
    * CacheManager plan canonicalization — because the fixture's lambda
    * expressions get fresh ExprIds per construction, which defeats
    * canonical plan matching. */
  private val decidedMemo =
    scala.collection.mutable.LinkedHashMap.empty[(SparkSession, String), DataFrame]
  private def decided(s: SparkSession, dir: String): DataFrame =
    decidedMemo.synchronized {
      decidedMemo.getOrElse((s, dir), {
        // Bounded, OLDEST-FIRST (LinkedHashMap preserves insertion
        // order): Verify/Bench touch ≤3 (session, dir) pairs; a
        // long-lived session cycling many dirs evicts the least
        // recently inserted frame — never the entry about to be built,
        // and never the whole memo at once. The memo is purely a perf
        // memo, so eviction is safe — unpersist releases the
        // executor-memory blocks with the entry.
        while (decidedMemo.size >= 8) {
          val (k, old) = decidedMemo.head
          scala.util.Try(old.unpersist())
          decidedMemo.remove(k)
        }
        val df = MatchPipeline.decide(envelope(s, dir)).cache()
        decidedMemo.put((s, dir), df)
        df
      })
    }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    MatchPipeline.actions(decided(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference core: the CDC match pipeline (O2..O15) -------------
    "pipe_actions" -> ((s, d) => MatchPipeline.actions(decided(s, d))),
    "pipe_email_jobs" -> ((s, d) => MatchPipeline.emailJobs(decided(s, d))),
    "pipe_top_matches" -> ((s, d) => MatchPipeline.topMatches(decided(s, d))),
    "pipe_status_updates" -> ((s, d) => MatchPipeline.statusUpdates(decided(s, d))),
    "pipe_batch_failures" -> ((s, d) => MatchPipeline.batchFailures(decided(s, d))),
    "pipe_metrics" -> ((s, d) => MatchPipeline.metrics(decided(s, d))),
    // r19: REMOVE-event tombstone extension — the delete path the
    // reference drops (index.js:146-153), as per-record decisions
    // with the cascade's explainable-reason discipline; the status
    // CAS + corpus excision halves are pinned by TombstonesSpec
    "pipe_tombstones" -> ((s, d) => pipeline.Tombstones.decisions(
      decided(s, d))),
    // r19: full AttributeValue type surface — every standard DynamoDB
    // tag (S/N/BOOL/NULL/B/SS/NS/BS/L/M + L-of-M-of-N nesting)
    // round-tripped through the wire encoding and decoded with the
    // generic combinators; the oracle recomputes the decoded values
    // from base arithmetic without modeling the wire format
    "pipe_decode_attrs" -> ((s, d) => graft.decode.DynamoDecode
      .decodeAttrItems(MatchFixture.attrItems(Tables.customer(s, d)))),
    "pipe_sqs_attrs" -> ((s, d) => pipeline.EmailJobs.sqsEnvelope(
      decided(s, d).filter(org.apache.spark.sql.functions.col("action") === "email_triggered"),
      org.apache.spark.sql.functions.lit("2024-01-20T00:00:00.000Z"),
      org.apache.spark.sql.functions.lit(1705708800000L)).drop("body")),

    // ---- TPC-H-style analytics: joins/aggs/windows/set-ops/sort-limit --
    "q1_pricing" -> ((s, d) => Analytics.pricingSummary(Tables.lineitem(s, d))),
    "q3_shipping" -> ((s, d) => Analytics.shippingPriority(
      Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "q5_region_volume" -> ((s, d) => Analytics.regionVolume(
      Tables.region(s, d), Tables.nation(s, d), Tables.customer(s, d),
      Tables.supplier(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    // Q14 promo share: broadcast part dim + conditional aggregate
    "q14_promo" -> ((s, d) => Analytics.promoRevenue(
      Tables.part(s, d), Tables.lineitem(s, d))),
    // Q4 priority check: EXISTS → left-semi with a residual non-equi predicate
    "q4_priority" -> ((s, d) => Analytics.orderPriorityCheck(
      Tables.orders(s, d), Tables.lineitem(s, d))),
    // Q10 returned items: 4-way join, broadcast nation, top-20
    "q10_returned" -> ((s, d) => Analytics.returnedItemReport(
      Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d),
      Tables.nation(s, d))),
    // Q18 large orders: HAVING-subquery semi filter over fact aggregate
    "q18_large_orders" -> ((s, d) => Analytics.largeVolumeOrders(
      Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    // Q19 disjunctive brand/size/quantity predicates over a broadcast join
    "q19_brand_revenue" -> ((s, d) => Analytics.brandRevenue(
      Tables.part(s, d), Tables.lineitem(s, d))),
    // Q7 bilateral nation trade: two broadcast nation roles over the fact chain
    "q7_nation_trade" -> ((s, d) => Analytics.nationTrade(
      Tables.nation(s, d), Tables.customer(s, d), Tables.supplier(s, d),
      Tables.orders(s, d), Tables.lineitem(s, d))),
    // Q8 market share: conditional aggregate ratio of exact decimal sums
    "q8_market_share" -> ((s, d) => Analytics.marketShare(
      Tables.region(s, d), Tables.nation(s, d), Tables.customer(s, d),
      Tables.supplier(s, d), Tables.orders(s, d), Tables.lineitem(s, d),
      Tables.part(s, d))),
    // Q9 profit by supplier nation/year (retail price standing in for supplycost)
    "q9_profit" -> ((s, d) => Analytics.productProfit(
      Tables.nation(s, d), Tables.supplier(s, d), Tables.orders(s, d),
      Tables.lineitem(s, d), Tables.part(s, d))),
    // Q12 late-shipment priority split: CASE-inside-count conditional agg
    "q12_late_priority" -> ((s, d) => Analytics.lateShipmentPriority(
      Tables.orders(s, d), Tables.lineitem(s, d))),
    // Q13 customer order-count distribution: LEFT join + aggregate-of-aggregate
    "q13_order_distribution" -> ((s, d) => Analytics.customerOrderDistribution(
      Tables.customer(s, d), Tables.orders(s, d))),
    // Q15 top supplier: scalar-subquery max over a per-supplier view
    "q15_top_supplier" -> ((s, d) => Analytics.topSupplier(
      Tables.supplier(s, d), Tables.lineitem(s, d))),
    // Q17 small-quantity revenue: correlated per-part average in exact arithmetic
    "q17_small_qty" -> ((s, d) => Analytics.smallQuantityRevenue(
      Tables.part(s, d), Tables.lineitem(s, d))),
    // Q17 in the join-back spelling, collapsed by the WinMagic rule
    "q17_winmagic" -> ((s, d) => Analytics.smallQuantityRevenueJoinBack(
      Tables.part(s, d), Tables.lineitem(s, d))),
    // Q21 waiting suppliers (adapted): sole-latest shipper of multi-supplier orders
    "q21_waiting_suppliers" -> ((s, d) => Analytics.waitingSuppliers(
      Tables.supplier(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    // Q22 dormant high-value customers: scalar avg + anti join per nation
    "q22_dormant_value" -> ((s, d) => Analytics.dormantValueCustomers(
      Tables.nation(s, d), Tables.customer(s, d), Tables.orders(s, d))),
    // Q6 forecast revenue: triple-pushdown scan + one aggregate
    "q6_forecast" -> ((s, d) => Analytics.forecastRevenue(Tables.lineitem(s, d))),
    // Q2 min-cost parts: DataFrame twin of the correlated scalar subquery
    "q2_min_cost" -> ((s, d) => Analytics.minCostParts(Tables.part(s, d))),
    // Q11 important stock (adapted): group agg vs broadcast global scalar
    "q11_important_stock" -> ((s, d) => Analytics.importantStock(
      Tables.nation(s, d), Tables.supplier(s, d), Tables.lineitem(s, d))),
    // Q20 dominant promo suppliers (adapted): half-of-total via window
    "q20_promo_suppliers" -> ((s, d) => Analytics.promoSuppliers(
      Tables.nation(s, d), Tables.supplier(s, d), Tables.part(s, d),
      Tables.lineitem(s, d))),
    // frequent part pairs within orders (Apriori-pruned basket mining)
    "orders_basket" -> ((s, d) => Analytics.basketPairs(Tables.lineitem(s, d))),
    "window_top_orders" -> ((s, d) => Analytics.topOrdersPerCustomer(Tables.orders(s, d))),
    "window_running_spend" -> ((s, d) => Analytics.runningSpend(Tables.orders(s, d))),
    "window_range_frame" -> ((s, d) => Analytics.rangeFrameSpend(Tables.orders(s, d))),
    "window_order_gaps" -> ((s, d) => Analytics.orderGaps(Tables.orders(s, d))),
    "pivot_status" -> ((s, d) => Analytics.statusPivot(Tables.orders(s, d))),
    "rollup_revenue" -> ((s, d) => Analytics.revenueRollup(
      Tables.region(s, d), Tables.nation(s, d), Tables.customer(s, d),
      Tables.orders(s, d))),
    "setop_segments" -> ((s, d) => Analytics.segmentSetOps(
      Tables.customer(s, d), Tables.orders(s, d))),
    // bag-semantics EXCEPT ALL / INTERSECT ALL with multiplicities
    "setop_multiset" -> ((s, d) => Analytics.multisetPartOps(Tables.lineitem(s, d))),
    // Q16 shape: count-DISTINCT-per-group over the broadcast part dim
    "q16_supplier_variety" -> ((s, d) => Analytics.supplierVariety(
      Tables.part(s, d), Tables.lineitem(s, d))),
    "cube_status_priority" -> ((s, d) => Analytics.statusPriorityCube(Tables.orders(s, d))),
    // arbitrary grouping-sets lattice (pruned at plan time, one Expand)
    "agg_grouping_sets" -> ((s, d) => Analytics.statusPrioritySets(Tables.orders(s, d))),
    // HLL++ sketch VALUES are engine-specific, so the gated projection
    // drops them and hashes the accuracy CLAIM instead: exact count,
    // integer 3σ bound, and within_bound (oracle predicts TRUE; Spark
    // computes it from its live sketch). ExtOpsSpec keeps the tighter
    // relative-error assertion on the full frame.
    "agg_approx_distinct" -> ((s, d) =>
      Analytics.approxDistinctCustomers(Tables.orders(s, d))
        .select("order_priority", "exact_customers", "bound", "within_bound")),
    // exact percentile_disc via rank arithmetic (hash-safe, unlike
    // interpolated double percentiles)
    "agg_percentiles" -> ((s, d) => Analytics.statusPercentiles(Tables.orders(s, d))),
    // GK-sketch quantile values are engine-specific, so the gated
    // projection hashes the rank-error-bracket booleans (computed from
    // exact DECIMAL rank arithmetic on the Spark side, predicted TRUE
    // by the oracle) instead; ExtOpsSpec keeps the value-level bound
    "agg_percentiles_approx" -> ((s, d) =>
      Analytics.statusPercentilesApprox(Tables.orders(s, d))
        .select("order_status", "n_orders", "p50_ok", "p90_ok", "p99_ok")),
    // mean/variance/correlation from exact decimal power sums
    "agg_moments" -> ((s, d) => Analytics.orderMoments(Tables.orders(s, d))),

    // ---- event-time windowing over `events` ---------------------------
    "events_tumbling" -> ((s, d) => EventOps.tumbling(Tables.events(s, d))),
    "events_sliding" -> ((s, d) => EventOps.sliding(Tables.events(s, d))),
    "events_session" -> ((s, d) => EventOps.sessions(Tables.events(s, d))),
    "events_first" -> ((s, d) => EventOps.firstEventPerUserType(Tables.events(s, d))),
    "events_props_json" -> ((s, d) => EventOps.propsStats(Tables.events(s, d))),

    // ---- temporal joins (as-of / range) over `events` -----------------
    "events_asof" -> ((s, d) => TemporalJoins.clickAsOfPurchase(Tables.events(s, d))),
    // the same as-of through the NATIVE operator (custom LogicalPlan +
    // strategy + sorted-merge SparkPlan) — one exchange per side,
    // constant merge state; hash-gated against the same oracle
    "events_asof_native" -> ((s, d) =>
      TemporalJoins.clickAsOfPurchaseNative(Tables.events(s, d))),
    // as-of with a 10-minute freshness bound (merge_asof tolerance):
    // a stale prior click attributes as no click
    "events_asof_tolerance" -> ((s, d) => TemporalJoins
      .clickAsOfPurchaseNative(Tables.events(s, d), Some(600000000L))),
    // the BROADCAST physical form of the native as-of (BroadcastHashJoin
    // analog: right side ships, left side never moves — zero shuffles);
    // hash-gated against the same oracle as the merge exec
    "events_asof_broadcast" -> ((s, d) => TemporalJoins
      .clickAsOfPurchaseNative(Tables.events(s, d), None, broadcastRight = true)),
    // merge_asof DIRECTION variants through the native operator:
    // forward = earliest click at-or-after each purchase (merge exec),
    // nearest = the closer of prior/next click, distance ties to prior
    // (broadcast exec) — each hash-gated by its own window-form twin,
    // so the two new probe paths are pinned on both physical forms
    "events_asof_fwd" -> ((s, d) => TemporalJoins
      .clickAsOfPurchaseNative(Tables.events(s, d), None,
        broadcastRight = false, "forward")),
    "events_asof_nearest" -> ((s, d) => TemporalJoins
      .clickAsOfPurchaseNative(Tables.events(s, d), None,
        broadcastRight = true, "nearest")),
    "events_range" -> ((s, d) => TemporalJoins.clicksAfterPurchase(Tables.events(s, d))),
    // the range join REACHED FROM SQL TEXT through the range_join TVF
    // (plans/RangeSql.scala) — equi keys + band residual, never a
    // cross product (plan-pinned in TemporalJoinsSpec); same oracle as
    // events_range
    "sql_range" -> ((s, d) => GraftSql.sql(s, d, """
      SELECT user_id, event_id AS purchase_event_id,
             c_eid AS click_event_id,
             unix_micros(c_ts) - unix_micros(ts) AS gap_us
      FROM range_join('purchases_v', 'clicks_v', 'user_id', 'ts', 'c_ts',
                      0, 3600000000)""")),
    // similarity search REACHED FROM SQL TEXT through the knn_join TVF
    // (plans/KnnSql.scala): inline TABLE(subquery) query set, corpus by
    // name, quantized-cosine top-5 per query (self-match ranks first)
    "sql_knn" -> ((s, d) => GraftSql.sql(s, d, """
      SELECT * FROM knn_join(TABLE(SELECT vec_id, embedding
                                   FROM embeddings WHERE vec_id % 97 = 0),
                             'embeddings', 'vec_id', 'embedding', 5)""")),
    // the LSH dedup pipeline from SQL text — the FOURTH table function
    // (plans/NearDupSql.scala): same plan as dedup_minhash, same oracle
    "sql_neardup" -> ((s, d) => GraftSql.sql(s, d,
      "SELECT * FROM neardup_pairs('documents', 'doc_id', 'text', 0.5)")),
    // DSIR from SQL text — the FIFTH table function (plans/DsirSql
    // .scala): same plan as sample_dsir, same oracle
    "sql_dsir" -> ((s, d) => GraftSql.sql(s, d,
      "SELECT * FROM dsir_sample('documents', 'src0,src1', 200)")),
    // SemDeDup from SQL text — the SIXTH table function
    // (plans/SemDedupSql.scala): same plan as embed_semdedup (k = the
    // gate corpora's scaledK, threshold = the engine default), same
    // oracle
    "sql_semdedup" -> ((s, d) => GraftSql.sql(s, d,
      s"SELECT * FROM semdedup('embeddings', 8, " +
        s"${GraftConf.DefaultCosineThreshold})")),
    // persisted-index ANN search from SQL text — the SEVENTH table
    // function (plans/IndexSearchSql.scala), the sub-corpus-scan
    // scale path knn_join's contract defers to: same committed store
    // and query set as embed_index_persisted, same oracle
    "sql_index_search" -> ((s, d) => GraftSql.sql(s, d,
      s"SELECT * FROM index_search('${shIndexFull(s, d)}', " +
        "TABLE(SELECT vec_id, embedding FROM embeddings " +
        "WHERE vec_id % 97 = 0), 5, 2)")),
    // the SERVING-CONTRACT shapes (r18): similarity search with a
    // FIXED query set against a growing corpus — the 100-TB posture,
    // where queries arrive from outside and |Q| does not scale with
    // the data. The vec_id < 2000 bound covers every gate corpus
    // whole (sf0.01 max id 499, sf0.1 max id 1999 — the predicate is
    // a no-op there, so the oracle shares sql_knn's result shape),
    // while on ScaleGen ladder rungs (ids offset per replica) it pins
    // |Q| to the 1× replica's 21 queries: the scale ladder measures
    // per-corpus-size cost at FIXED load, not |Q|·N growth
    // (ladder_100x_r17's sql_knn flag measured exactly that contract
    // violation)
    "sql_knn_serving" -> ((s, d) => GraftSql.sql(s, d, """
      SELECT * FROM knn_join(TABLE(SELECT vec_id, embedding
                                   FROM embeddings
                                   WHERE vec_id % 97 = 0
                                     AND vec_id < 2000),
                             'embeddings', 'vec_id', 'embedding', 5)""")),
    "sql_index_search_serving" -> ((s, d) => GraftSql.sql(s, d,
      s"SELECT * FROM index_search('${shIndexFull(s, d)}', " +
        "TABLE(SELECT vec_id, embedding FROM embeddings " +
        "WHERE vec_id % 97 = 0 AND vec_id < 2000), 5, 2)")),
    // substring dedup from SQL text — the EIGHTH and NINTH table
    // functions (plans/DupSpansSql.scala): same plans as
    // text_dup_maximal_spans / text_dedup_excise, same oracles
    // the REPARTITION hint inside TABLE(...) is the SQL spelling of
    // the docs() helper's repartition(32): the raw sf0.1 parquet
    // splits to ~4 input partitions, and the window-hash explode is
    // CPU-bound — without the hint the TVF pays the same plan on an
    // eighth of the cores (measured 5.5 s vs 1.1 s); on a real
    // cluster file splits provide the parallelism and the hint is
    // harmless
    "sql_dup_spans" -> ((s, d) => GraftSql.sql(s, d,
      s"SELECT * FROM dup_spans(TABLE(SELECT /*+ REPARTITION(${spread(s)}) */ " +
        "doc_id, text FROM documents), 'doc_id', 'text', 8, 64)")),
    "sql_excise" -> ((s, d) => GraftSql.sql(s, d,
      s"SELECT * FROM dedup_excise(TABLE(SELECT /*+ REPARTITION(${spread(s)}) */ " +
        "doc_id, text FROM documents), 'doc_id', 'text', 8, 64)")),
    "sql_dup_islands" -> ((s, d) => GraftSql.sql(s, d,
      s"SELECT * FROM dup_islands(TABLE(SELECT /*+ REPARTITION(${spread(s)}) */ " +
        "doc_id, text FROM documents), 'doc_id', 'text', 8, 64)")),
    // frozen-geometry assignment from SQL text — the TENTH table
    // function (plans/CentroidAssignSql.scala), the assign-side twin
    // of index_search: same committed store and result as
    // embed_assign_persisted, same oracle
    "sql_centroid_assign" -> ((s, d) => GraftSql.sql(s, d,
      s"SELECT * FROM centroid_assign('${shCentroidStore(s, d)}', " +
        "'embeddings')")),
    // explicit two-phase salted aggregation (result ≡ plain groupBy)
    "events_salted_counts" -> ((s, d) => ext.Skew.saltedTypeCounts(Tables.events(s, d))),
    // per-type z-score outliers from exact quantized moments
    "events_anomalies" -> ((s, d) => EventOps.valueAnomalies(Tables.events(s, d))),
    // typed bounded-heap TopKAggregator as an oracle-gated query
    "events_top_types" -> ((s, d) => EventOps.topEventTypes(Tables.events(s, d))),
    // deterministic sketches: KMV distinct (hash-gated approx-distinct,
    // the exact-oracle complement of agg_approx_distinct's HLL) and
    // count-min frequency estimates over event types
    "sketch_kmv" -> ((s, d) => ext.Sketches.kmvDistinct(docs(s, d))),
    "sketch_countmin" -> ((s, d) => ext.Sketches.countMinTypes(Tables.events(s, d))),
    // KMV/theta sketch-intersection overlap between the corpus halves:
    // the join-free decontamination-rate estimate (+ exact eval cols)
    "sketch_kmv_overlap" -> ((s, d) => ext.Sketches.kmvShingleOverlap(docs(s, d))),
    // deterministic bottom-k quantile sketch per event type (uniform
    // hash of the unique event_id = reproducible random sample;
    // percentile_disc rank rule over it) + exact eval columns
    "sketch_quantiles" -> ((s, d) => ext.Sketches.quantileSketch(Tables.events(s, d))),
    // deterministic HyperLogLog distinct-user estimate per event type
    // (md5-derived registers, exact-integer harmonic sum, register-MAX
    // merge law) + exact eval column
    "sketch_hll" -> ((s, d) => ext.Sketches.hllDistinct(Tables.events(s, d))),
    // key-skew diagnostic: hottest keys + max/mean ratio for user_id
    "diag_key_skew" -> ((s, d) => ext.Skew.keySkewReport(Tables.events(s, d))),
    // one-pass dataset-card profile: nulls/cardinalities/ranges
    "diag_profile" -> ((s, d) => ext.Diagnostics.tableProfile(Tables.events(s, d))),
    // equi-depth histogram: the range-partition planner's ground truth
    "diag_histogram" -> ((s, d) => ext.Diagnostics.equiDepthHistogram(Tables.orders(s, d))),
    // declarative pre-commit data-quality gate (Deequ shape, one query)
    "diag_checks" -> ((s, d) => ext.Diagnostics.qualityChecks(
      Tables.orders(s, d), Tables.customer(s, d), Tables.lineitem(s, d),
      Tables.events(s, d))),
    // ordered funnel: view → click → purchase, count per reached depth
    // (deterministic 1-in-5 event sample so every depth is populated
    // at gate SF — the full stream funnels everyone to depth 3)
    "events_funnel" -> ((s, d) => EventOps.funnel(Tables.events(s, d)
      .filter(org.apache.spark.sql.functions.col("event_id") % 5 === 0))),
    // funnel WITHIN gap-based sessions: converts-in-one-sitting counts
    "events_session_funnel" -> ((s, d) => EventOps.sessionFunnel(Tables.events(s, d))),
    // weekly cohort retention matrix
    "events_retention" -> ((s, d) => EventOps.retentionCohorts(Tables.events(s, d))),
    // top 3-step event-type paths (flow mining behind Sankey funnels)
    "events_paths" -> ((s, d) => EventOps.topPaths(Tables.events(s, d))),
    // Morton (Z-order) interleave for two-sided file-stat pruning
    "layout_zorder" -> ((s, d) => ext.Layout.eventZValues(Tables.events(s, d))),
    // per-file footer-stats pruning report: zorder vs time-sorted layout
    "layout_skipping" -> ((s, d) => ext.Layout.skippingStats(Tables.events(s, d))),

    // ---- SQL surface: ANSI SQL text through GraftSql ------------------
    // r13: the ship-year moved from 1994 (before the generated data's
    // range — the row was vacuously green on 0 rows) to 1996 so the
    // gate actually compares values
    "sql_q6_forecast" -> ((s, d) => GraftSql.sql(s, d, """
      SELECT l_returnflag,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(4,2))) AS STRING) AS revenue,
             count(*) AS n_items
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount BETWEEN 0.04 AND 0.06
        AND l_quantity < 24
      GROUP BY l_returnflag""")),
    // SQL-text twins of four DataFrame operator families — same
    // registered views, same native-function registry, so a user typing
    // ANSI SQL exercises the identical Catalyst path (pushdown, window
    // planning, Expand) the DataFrame API gets. Each has its own
    // independent DuckDB oracle row.
    "sql_window_top_orders" -> ((s, d) => GraftSql.sql(s, d, """
      SELECT o_custkey, o_orderkey, o_totalprice AS total_price, rank
      FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rank
        FROM orders)
      WHERE rank <= 3""")),
    "sql_grouping_sets" -> ((s, d) => GraftSql.sql(s, d, """
      SELECT o_orderstatus AS order_status, o_orderpriority AS order_priority,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS STRING) AS revenue,
             count(*) AS n_orders
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())""")),
    // correlated EXISTS in SQL text: exercises Catalyst's
    // RewritePredicateSubquery decorrelation (→ left-semi with the
    // correlated non-equi predicate as residual), a planner path the
    // DataFrame twin q4_priority constructs by hand
    "sql_q4_exists" -> ((s, d) => GraftSql.sql(s, d, """
      SELECT o_orderpriority AS order_priority, count(*) AS order_count
      FROM orders o
      WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS)
      GROUP BY o_orderpriority
      ORDER BY order_priority""")),
    // IN over an aggregated subquery: the HAVING-semi-filter shape of
    // q18_large_orders as parsed SQL (RewritePredicateSubquery again,
    // this time uncorrelated → semi join against the aggregate).
    // Decorrelation-path coverage, not the scale form — the 100×-proof
    // shape is q18_large_orders' repartition-first aggregate
    // (Analytics.largeVolumeOrders scaladoc has the knee analysis)
    "sql_q18_in" -> ((s, d) => GraftSql.sql(s, d, """
      SELECT c.c_name, c.c_custkey, o.o_orderkey,
             date_format(o.o_orderdate, 'yyyy-MM-dd') AS order_date,
             o.o_totalprice AS total_price,
             CAST(b.qty_d AS STRING) AS total_qty
      FROM orders o
      JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_d
            FROM lineitem GROUP BY l_orderkey) b ON b.l_orderkey = o.o_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300.00)
      ORDER BY o.o_totalprice DESC, o.o_orderkey
      LIMIT 20""")),
    // correlated SCALAR subquery: RewriteCorrelatedScalarSubquery turns
    // the per-row min lookup into an aggregate + join — the third
    // decorrelation path (after EXISTS and IN) exercised as SQL text
    "sql_q2_mincost" -> ((s, d) => GraftSql.sql(s, d, """
      SELECT p.p_type, p.p_partkey, p.p_retailprice AS retail_price
      FROM part p
      WHERE p.p_retailprice = (SELECT min(p2.p_retailprice)
                               FROM part p2 WHERE p2.p_type = p.p_type)""")),
    // correlated scalar AGGREGATES in a comparison (TPC-H Q17's shape):
    // two correlated subqueries over the same fact, each decorrelated
    // by RewriteCorrelatedScalarSubquery into an aggregate+join — the
    // fourth decorrelation path as SQL text (after EXISTS, IN, and the
    // equality scalar of sql_q2_mincost). The 20%-of-average threshold
    // stays exact (5·qty·cnt < sum): a double `0.2*avg(...)` would be
    // summed in shuffle order and could flip boundary rows vs DuckDB.
    "sql_q17_below_avg" -> ((s, d) => GraftSql.sql(s, d, """
      SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS STRING)
               AS small_qty_revenue,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
               AS avg_yearly,
             count(*) AS n_lines
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#4'
        AND CAST(l.l_quantity AS DECIMAL(18,2)) * 5 *
            (SELECT count(*) FROM lineitem l2
             WHERE l2.l_partkey = l.l_partkey)
          < (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
             FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""")),
    // the REAL-WORLD WinMagic shape, from raw SQL text: a correlated
    // scalar-subquery threshold whose core is a JOIN (lineitem ⋈
    // brand-filtered part). Catalyst merges the two subqueries into
    // one aggregate, decorrelates it into a join-back, and hoists the
    // dim join ABOVE the join-back — WinMagic's r14 inner-join
    // rotation re-normalizes that shape and the multi-relation peel
    // collapses it to ONE pass: 4 scans + 3 joins → 2 scans + 1 join +
    // 1 window (plan-pinned in WinMagicSpec). Deployed here per-query
    // via rewriteOptimizedDf (r19): the join-back only exists after
    // decorrelation, so the analyzed-layer rewriteDf can't see it, and
    // the bench/verify sessions deliberately do NOT inject the rule
    // session-wide (it would also rewrite catalog-cardinality and
    // Zipf-keyed join-backs — p_type, term, lang — into skewed
    // windows; OPTIMIZATION_r19.md has the measured blast radius).
    // The window partitions by l_partkey — scale-growing key, sound.
    // One correlated AVG subquery; the COUNT-bug LeftOuter variant is
    // covered separately by sql_count_winmagic via the r15 null-mask
    // rewrite. Boundary exactness: the
    // fixture quantities are integer-valued, so 0.2*avg(qty) can only
    // sit within rounding distance of an integer threshold when the
    // average is exact in both engines — the decimal-vs-double avg
    // difference cannot flip any row (gap ≥ 1/(5·cnt) ≫ rounding).
    "sql_q17_join_winmagic" -> ((s, d) =>
      graft.plans.WinMagic.rewriteOptimizedDf(GraftSql.sql(s, d, """
      SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS STRING)
               AS below_avg_revenue,
             count(*) AS n_lines
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#23'
        AND CAST(l.l_quantity AS DECIMAL(18,2)) <
            (SELECT 0.2 * AVG(CAST(l2.l_quantity AS DECIMAL(18,2)))
             FROM lineitem l2 JOIN part p2 ON p2.p_partkey = l2.l_partkey
             WHERE p2.p_brand = 'Brand#23' AND l2.l_partkey = l.l_partkey)"""))),
    // the COUNT-bug WinMagic shape from raw SQL: a correlated count(*)
    // threshold decorrelates into a LeftOuter join-back (count's
    // zero-on-empty correction is not null-rejecting, so the outer
    // join survives EliminateOuterJoin) over nullable parquet keys —
    // the r15 null-mask rewrite collapses it to one scan + window
    // (plan-pinned in WinMagicSpec); integer-vs-integer comparison, so
    // the boundary hash-gates identically cross-engine. Deployed via
    // rewriteOptimizedDf like sql_q17_join_winmagic above (r19):
    // 2 lineitem scans + LeftOuter join-back → 1 scan + 1 l_partkey
    // window.
    "sql_count_winmagic" -> ((s, d) =>
      graft.plans.WinMagic.rewriteOptimizedDf(GraftSql.sql(s, d, """
      SELECT l_returnflag, count(*) AS n_deep,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS STRING)
               AS revenue
      FROM lineitem l
      WHERE CAST(l_quantity AS BIGINT) >
            (SELECT count(*) FROM lineitem l2
             WHERE l2.l_partkey = l.l_partkey)
      GROUP BY l_returnflag"""))),
    "sql_dedup_exact" -> ((s, d) => GraftSql.sql(s, d, """
      SELECT doc_id, md5(text) AS content_md5,
             min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_doc_id,
             count(*) OVER (PARTITION BY md5(text)) AS group_size,
             doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_duplicate
      FROM documents""")),
    "sql_events_funnel" -> ((s, d) => GraftSql.sql(s, d, """
      WITH ev AS (SELECT * FROM events WHERE event_id % 5 = 0),
      s1 AS (
        SELECT user_id, min(ts) AS t1 FROM ev
        WHERE event_type = 'view' GROUP BY user_id),
      s2 AS (
        SELECT s1.user_id, s1.t1,
               min(CASE WHEN e.ts > s1.t1 THEN e.ts END) AS t2
        FROM s1 LEFT JOIN ev e
          ON e.user_id = s1.user_id AND e.event_type = 'click'
        GROUP BY s1.user_id, s1.t1),
      s3 AS (
        SELECT s2.user_id, s2.t2,
               min(CASE WHEN e.ts > s2.t2 THEN e.ts END) AS t3
        FROM s2 LEFT JOIN ev e
          ON e.user_id = s2.user_id AND e.event_type = 'purchase'
        GROUP BY s2.user_id, s2.t2)
      SELECT CASE WHEN t3 IS NOT NULL THEN 3
                  WHEN t2 IS NOT NULL THEN 2
                  ELSE 1 END AS funnel_stage,
             count(*) AS n_users
      FROM s3 GROUP BY 1""")),
    // the LSH band join + relational Jaccard verify, as pure SQL text:
    // proof the SQL surface reaches the banding machinery (the r11
    // sql_* twins were all TPC-H/window/funnel shapes). Same
    // double-hash family / band layout as DedupOps.minhashSignatures;
    // must agree row-for-row with the dedup_minhash oracle.
    "sql_dedup_minhash" -> ((s, d) => GraftSql.sql(s, d, """
      WITH toks AS (
        SELECT doc_id, split(text, ' ') AS t FROM documents),
      sh AS (
        SELECT doc_id, concat_ws(' ', slice(t, i, 3)) AS s
        FROM toks
        LATERAL VIEW explode(sequence(1, greatest(size(t) - 2, 1))) u AS i),
      dsh AS (SELECT DISTINCT doc_id, s FROM sh),
      dsz AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
      hashes AS (
        SELECT doc_id, s,
               CAST(conv(substring(md5(CAST(s AS BINARY)), 1, 8), 16, 10)
                    AS BIGINT) AS h1,
               CAST(conv(substring(md5(CAST(s AS BINARY)), 9, 8), 16, 10)
                    AS BIGINT) AS h2
        FROM sh),
      sig AS (
        SELECT doc_id, j, min((h1 + j * h2) % 4294967311) AS mh
        FROM hashes LATERAL VIEW explode(sequence(0, 7)) t AS j
        GROUP BY doc_id, j),
      bands AS (
        SELECT doc_id,
               concat_ws('#', b, concat_ws('|', mh_even, mh_odd)) AS band
        FROM (SELECT doc_id, j div 2 AS b,
                     min(CASE WHEN j % 2 = 0 THEN mh END) AS mh_even,
                     min(CASE WHEN j % 2 = 1 THEN mh END) AS mh_odd
              FROM sig GROUP BY doc_id, j div 2)),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.doc_id < b.doc_id),
      inter AS (
        SELECT c.doc_a, c.doc_b, count(*) AS ni
        FROM cand c
        JOIN dsh x ON x.doc_id = c.doc_a
        JOIN dsh y ON y.doc_id = c.doc_b AND y.s = x.s
        GROUP BY c.doc_a, c.doc_b)
      SELECT i.doc_a, i.doc_b,
             CAST(ni AS DOUBLE) / CAST(za.n + zb.n - ni AS DOUBLE) AS jaccard
      FROM inter i
      JOIN dsz za ON za.doc_id = i.doc_a
      JOIN dsz zb ON zb.doc_id = i.doc_b
      WHERE CAST(ni AS DOUBLE) / CAST(za.n + zb.n - ni AS DOUBLE) >= 0.5""")),
    // rational-idf BM25 as SQL text over the same posting shape the
    // DataFrame path shares (termFrequencies): exact-integer scoring,
    // so the twin hash-gates against the text_bm25 oracle
    "sql_text_bm25" -> ((s, d) => GraftSql.sql(s, d, """
      WITH tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, explode(split(text, ' ')) AS term
              FROM documents)
        GROUP BY doc_id, term),
      dl AS (SELECT doc_id, CAST(size(split(text, ' ')) AS BIGINT) AS dl
             FROM documents),
      tot AS (SELECT CAST(sum(dl) AS BIGINT) AS t_tokens,
                     count(*) AS n_docs FROM dl),
      qtf AS (SELECT * FROM tf WHERE term IN ('dup', 'spark', 'data')),
      dfq AS (SELECT term, count(*) AS df FROM qtf GROUP BY term),
      scored AS (
        SELECT q.doc_id, dl.dl,
               ((1000 * (2 * t.n_docs + 1)) div (2 * f.df + 1))
                 * ((1000000 * 44 * t.t_tokens * q.tf)
                    div (20 * t.t_tokens * q.tf + 6 * t.t_tokens
                         + 18 * dl.dl * t.n_docs)) AS term_score
        FROM qtf q JOIN dfq f USING (term) JOIN dl USING (doc_id)
        CROSS JOIN tot t)
      SELECT doc_id, dl, count(*) AS n_hit,
             CAST(sum(term_score) AS BIGINT) AS score
      FROM scored GROUP BY doc_id, dl
      ORDER BY score DESC, doc_id LIMIT 20""")),
    // chunking as SQL text: LATERAL VIEW explode over the computed
    // chunk-index range — the generator-expression surface (posexplode
    // family) reached from parsed SQL; hash-gates against the same
    // oracle as the DataFrame twin text_chunk
    "sql_chunk" -> ((s, d) => GraftSql.sql(s, d, """
      SELECT doc_id, chunk_idx, start_tok, end_tok,
             end_tok - start_tok + 1 AS n_chunk_tokens,
             concat_ws(' ', slice(t, start_tok, end_tok - start_tok + 1))
               AS chunk_text,
             md5(cast(concat_ws(' ',
               slice(t, start_tok, end_tok - start_tok + 1)) AS binary))
               AS chunk_md5
      FROM (
        SELECT doc_id, t, n, chunk_idx,
               chunk_idx * 48 + 1 AS start_tok,
               least(chunk_idx * 48 + 64, n) AS end_tok
        FROM (SELECT doc_id, split(text, ' ') AS t,
                     size(split(text, ' ')) AS n
              FROM documents)
        LATERAL VIEW explode(sequence(0,
          cast((greatest(n - 64, 0) + 47) div 48 AS int))) c AS chunk_idx)""")),
    // as-of join as SQL text, the distributed-merge form: union the two
    // event roles, one ordered window per user with an ignore-nulls
    // running last — ONE hash exchange, no join node, the same plan
    // family as the DataFrame twin but built by the SQL parser +
    // analyzer (FILTER clauses, IGNORE NULLS, frame syntax). The
    // "obvious" SQL spelling — correlated LATERAL + ORDER BY + LIMIT 1
    // — was tried and measured first: Spark 4.1 plans it as a
    // BroadcastNestedLoopJoin over clicks × purchases (no limit
    // decorrelation), which is quadratic and stalled the sf0.1 bench;
    // the window form is what an as-of should compile to at any scale.
    // Tie semantics match the twin: a click at exactly the purchase ts
    // is visible (side orders clicks first), equal-ts clicks resolve
    // to max event_id.
    "sql_asof" -> ((s, d) => GraftSql.sql(s, d, """
      SELECT user_id, event_id AS purchase_event_id,
             date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS purchase_ts,
             click_event_id,
             date_format(click_ts_t, 'yyyy-MM-dd HH:mm:ss.SSSSSS')
               AS click_ts,
             unix_micros(ts) - unix_micros(click_ts_t) AS gap_us
      FROM (
        SELECT user_id, ts, event_id, side,
               last(c_ts) IGNORE NULLS OVER w AS click_ts_t,
               last(c_eid) IGNORE NULLS OVER w AS click_event_id
        FROM (
          SELECT user_id, ts, event_id, 0 AS side, ts AS c_ts,
                 event_id AS c_eid
          FROM events WHERE event_type = 'click'
          UNION ALL
          SELECT user_id, ts, event_id, 1 AS side,
                 CAST(NULL AS timestamp) AS c_ts, CAST(NULL AS bigint) AS c_eid
          FROM events WHERE event_type = 'purchase')
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      WHERE side = 1""")),
    // the same as-of REACHED FROM SQL TEXT through the native operator:
    // the asof_join table-valued function (plans/AsOfSql.scala) expands
    // to AsOfJoinPlan, so this plans AsOfJoinExec/BroadcastAsOfJoinExec
    // — no union inflation, no window frame — where sql_asof above pays
    // the union+window spelling. Same oracle as events_asof.
    "sql_asof_native" -> ((s, d) => GraftSql.sql(s, d, """
      SELECT user_id, event_id AS purchase_event_id,
             date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS purchase_ts,
             c_eid AS click_event_id,
             date_format(c_ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS click_ts,
             unix_micros(ts) - unix_micros(c_ts) AS gap_us
      FROM asof_join('purchases_v', 'clicks_v', 'user_id', 'ts', 'c_ts',
                     'c_eid')""")),

    // ---- text analysis over `documents` -------------------------------
    // The testdata tables are single parquet files → a single input
    // partition; without an exchange, broadcast-join-only plans (the
    // dedup pair pipelines especially) would execute as ONE task no
    // matter how many rows they fan out to. Spreading the scan first
    // models the many-shard layout a real corpus has.
    "text_stats" -> ((s, d) => TextOps.stats(docs(s, d))),
    "text_quality" -> ((s, d) => TextOps.qualityScore(docs(s, d))),
    // the published Gopher rule suite as auditable per-rule booleans
    "text_gopher_gate" -> ((s, d) => TextOps.gopherGate(docs(s, d))),
    "text_langid" -> ((s, d) => TextOps.langId(docs(s, d))),
    "text_fingerprint" -> ((s, d) => TextOps.fingerprints(docs(s, d))),
    "text_rolling_fingerprint" -> ((s, d) => TextOps.rollingFingerprints(docs(s, d))),
    "text_tokens" -> ((s, d) => TextOps.tokenCounts(docs(s, d))),
    "text_top_terms" -> ((s, d) => TextOps.topTermsFrom(shTf(s, d))),
    "text_normalize" -> ((s, d) => TextOps.normalize(docs(s, d))),
    // Gopher-style within-doc 3-gram repetition signals
    "text_repetition" -> ((s, d) => TextOps.repetition(docs(s, d))),
    // training-shard packing + benchmark decontamination
    "corpus_shards" -> ((s, d) => TextOps.tokenShards(docs(s, d))),
    // global packing order via two-phase distributed prefix sum; the
    // oracle is the single-window cumsum it must equal
    "corpus_shards_global" -> ((s, d) => TextOps.globalTokenShards(docs(s, d))),
    // concat-then-chunk training-sequence spans (docs split across
    // fixed token windows, GPT-style)
    "text_pack_sequences" -> ((s, d) => TextOps.packSequences(docs(s, d))),
    // BPE merge-candidate bigram stats, top-10 per language
    "text_bigrams" -> ((s, d) => TextOps.bigrams(docs(s, d))),
    // integer PMI-lift collocations, top-10 per language
    "text_pmi" -> ((s, d) => TextOps.collocations(docs(s, d))),
    // per-lang unigram entropy / vocabulary diversity profile
    "text_entropy" -> ((s, d) => TextOps.unigramEntropyFrom(shTf(s, d), docs(s, d))),
    // per-lang percentile quality gating (keep the top 75% by score)
    "corpus_quality_gate" -> ((s, d) => TextOps.qualityGate(docs(s, d))),
    // per-source document caps (the web-pipeline domain-cap policy):
    // keep each source's top-quality slice, at most 16 docs
    "corpus_source_caps" -> ((s, d) => TextOps.sourceCaps(docs(s, d))),
    // PII detection + in-place scrubbing (email/phone/IP), zero-shuffle
    "text_pii_scrub" -> ((s, d) => TextOps.piiScrub(docs(s, d))),
    // unigram-LM surprisal quality score in integer bits
    "text_surprisal" -> ((s, d) => TextOps.unigramSurprisalFrom(shTf(s, d))),
    // bigram-LM conditional surprisal (CCNet scoring, order 2)
    "text_perplexity" -> ((s, d) => TextOps.bigramSurprisal(docs(s, d))),
    // RAG-style overlapping token-window chunking (w=64, stride=48)
    "text_chunk" -> ((s, d) => TextOps.chunkDocuments(docs(s, d))),
    "corpus_contamination" -> ((s, d) =>
      TextOps.benchmarkContaminationFrom(shSixGrams(s, d))),
    // surgical span-level excision plan (merge overlapping 6-gram hits);
    // probes the shared memoized shingle index — positions are only
    // exploded for docs the phase-1 semi join already flagged
    "corpus_decontam_spans" -> ((s, d) =>
      TextOps.decontaminateSpansFrom(shSixGrams(s, d), docs(s, d))),
    // APPLY the excision plan: cleaned text with contaminated spans cut
    "corpus_decontam_excise" -> ((s, d) =>
      TextOps.decontaminateExciseFrom(shSixGrams(s, d), docs(s, d))),
    // temperature-scaled per-source mixing weights (α = 0.5)
    "corpus_mixture" -> ((s, d) => TextOps.mixtureWeights(docs(s, d))),
    // frozen 80/10/10 split assignment (key-pure hash; append-stable)
    "sample_splits" -> ((s, d) => TextOps.datasetSplits(docs(s, d))),
    // leakage-safe split: residue keyed on the near-dup cluster rep,
    // so no near-duplicate pair ever straddles train/valid/test
    "sample_splits_safe" -> ((s, d) =>
      TextOps.leakageSafeSplits(docs(s, d), shClusters(s, d, 0.5))),
    // contamination audit: cross-split near-dup pairs under the naive
    // doc-keyed policy vs the cluster-keyed one (provably zero)
    "sample_split_leakage" -> ((s, d) =>
      TextOps.splitLeakage(docs(s, d), shPairs(s, d, 0.5),
        shClusters(s, d, 0.5))),
    "sample_hash" -> ((s, d) => TextOps.hashSample(docs(s, d))),
    "sample_stratified" -> ((s, d) => TextOps.stratifiedSample(docs(s, d))),
    // fixed-budget weighted sample: integerized bottom-k priorities
    "sample_weighted" -> ((s, d) => TextOps.weightedSample(docs(s, d))),
    // DSIR importance resampling toward the src0/src1 target slice
    "sample_dsir" -> ((s, d) => TextOps.dsirResample(docs(s, d))),
    // per-epoch deterministic shuffle manifest (shard + position)
    "corpus_epoch_order" -> ((s, d) => ext.Corpus.epochOrder(docs(s, d))),
    // r19 REMOVE-excision serving path: the exact-dedup ingest corpus
    // under logical tombstones — activeCorpus = data anti-join tombs/
    // (broadcast; deletes-are-rare small). The oracle recomputes the
    // ingest's keep rule (first doc per content digest) and the
    // tombstone rule independently
    "corpus_tombstone_active" -> ((s, d) =>
      graft.streaming.CorpusIngest.activeCorpus(s, shTombCorpus(s, d))
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("content_md5"))),
    // hashing-trick featurization: vocab-free sparse tf vectors
    "text_hash_features" -> ((s, d) => TextOps.hashFeatures(docs(s, d))),
    // materialized temperature mixture: per-source hash sample at the
    // mixture-weight rate (floored threshold, key-pure bucket)
    "sample_mixture" -> ((s, d) => TextOps.mixtureSample(docs(s, d))),
    // integer-bit tf-idf: top distinctive terms per document
    "text_tfidf" -> ((s, d) => TextOps.tfidfTermsFrom(shTf(s, d), docs(s, d))),
    // tokenizer-apply: df-ranked vocab ids + ordered-sequence md5
    "text_vocab_encode" -> ((s, d) =>
      TextOps.vocabEncodeFrom(shTf(s, d), docs(s, d))),
    // BPE merge-rule training: 3 corpus-wide merge rounds over the
    // vocab-sized word-frequency frame (one corpus scan total)
    "text_bpe_train" -> ((s, d) => TextOps.bpeTrainMerges(docs(s, d))),
    // BPE APPLICATION: tokenize the corpus with the trained merge
    // table — the vocabulary is encoded once (vocab-sized folds) and
    // the corpus side pays one explode + equi-join + grouped sum
    "text_bpe_encode" -> ((s, d) =>
      TextOps.bpeEncodeFrom(docs(s, d), shBpeMerges(s, d))),
    // BPE through the PERSISTED tokenizer artifact: merges trained
    // once and committed behind TokenizerStore's manifest-generation
    // protocol (the EmbedIndex commit discipline); the encoder LOADS
    // the frozen artifact instead of retraining — hash-equal to the
    // in-memory path, same oracle as text_bpe_encode
    "text_bpe_store" -> ((s, d) =>
      TextOps.bpeEncodeFrom(docs(s, d),
        TokenizerStore.merges(s, shTokStore(s, d)))),
    // tokenize to TOKEN-ID sequences through the persisted tokenizer's
    // merges + vocab — the step that feeds a trainer; per doc the
    // token count and the md5 of the position-ordered id stream
    "text_bpe_ids" -> ((s, d) => {
      val store = shTokStore(s, d)
      TextOps.bpeIdsFrom(docs(s, d),
        TokenizerStore.merges(s, store), TokenizerStore.vocab(s, store))
    }),
    // per-language fertility / compression of the persisted tokenizer
    "text_tokenizer_fertility" -> ((s, d) => {
      val store = shTokStore(s, d)
      TextOps.tokenizerFertility(docs(s, d), TokenizerStore.merges(s, store))
    }),
    // DETOKENIZE: decode the id sequences back through the persisted
    // vocabulary and prove losslessness — the reassembled text must
    // equal the whitespace-normalized original, per document
    "text_bpe_roundtrip" -> ((s, d) => {
      val store = shTokStore(s, d)
      TextOps.bpeDecodeRoundtrip(docs(s, d),
        TokenizerStore.merges(s, store), TokenizerStore.vocab(s, store))
    }),
    // shard packing by the EXACT tokenizer counts (what the trainer
    // will actually see), not the regex estimate — the production
    // pairing of the persisted tokenizer with the corpus_shards op
    "corpus_shards_bpe" -> ((s, d) => {
      val store = shTokStore(s, d)
      TextOps.tokenShardsExact(docs(s, d), TextOps.bpeIdsFrom(docs(s, d),
        TokenizerStore.merges(s, store), TokenizerStore.vocab(s, store)))
    }),
    // bit-reproducible distributed training: integer batch perceptron
    "text_perceptron_train" -> ((s, d) => TextOps.perceptronTrain(docs(s, d))),
    // sparse tf-vector cosine near-dups via rare-term inverted-index
    // blocking (integer milli-cos² — no floats anywhere)
    "text_sparse_neardup" -> ((s, d) =>
      TextOps.sparseCosineNearDupsFrom(shTf(s, d), shSigs(s, d))),
    // rational-idf BM25 keyword retrieval over the shared posting frame
    "text_bm25" -> ((s, d) => TextOps.bm25TopDocsFrom(shTf(s, d), docs(s, d))),
    // per-lang token-length histogram (dataset-card distribution table)
    "text_length_histogram" -> ((s, d) => TextOps.lengthHistogram(docs(s, d))),
    // corpus-wide segment ("paragraph") dedup, first-occurrence survivor
    "text_paragraph_dedup" -> ((s, d) => TextOps.paragraphDedup(docs(s, d))),
    // Gopher duplicate-line/char fractions over within-doc segments
    "text_dup_segments" -> ((s, d) => TextOps.dupSegments(docs(s, d))),
    "text_dup_spans" -> ((s, d) => TextOps.dupSpans(docs(s, d))),
    // UNBOUNDED exact-substring dedup (r17): maximal duplicated
    // substrings of any length >= w via the diagonal island merge,
    // and their per-doc interval-merged coverage
    "text_dup_maximal_spans" -> ((s, d) =>
      TextOps.maximalDupSpans(docs(s, d))),
    "text_dup_islands" -> ((s, d) =>
      TextOps.maximalDupIslands(docs(s, d))),
    // the occCap recall bound, measured (no silent caps)
    "text_dup_span_audit" -> ((s, d) => TextOps.dupSpanAudit(docs(s, d))),
    // Lee et al.'s removal step: keep the first occurrence, excise
    // the duplicated block from every later doc, rebuild the text
    "text_dedup_excise" -> ((s, d) => TextOps.dedupExcise(docs(s, d))),
    // hashed-bigram linear quality model inference (zero-shuffle scan)
    "text_quality_model" -> ((s, d) => TextOps.qualityModelScore(docs(s, d))),

    // ---- deduplication over `documents` -------------------------------
    "dedup_exact" -> ((s, d) => shExact(s, d)),
    "dedup_minhash" -> ((s, d) => shPairs(s, d, 0.5)),
    // estimator accuracy eval: signature-estimated vs exact Jaccard per
    // LSH candidate pair (false positives kept — jaccard 0 rows count)
    "dedup_minhash_est" -> ((s, d) =>
      DedupOps.minhashEstimateEvalFrom(shSets(s, d), shSigs(s, d), shBands(s, d))),
    "dedup_simhash" -> ((s, d) => DedupOps.simhashDups(docs(s, d))),
    // the default hamming-k answer rides the WIDE 60-bit signature —
    // the 10x probe measured the 32-bit form's pair output growing 14x
    // at 10x docs (fixed-width saturation), so the scale-safe path is
    // the user-facing one; the 32-bit variant stays below as an
    // explicitly-named compact demo
    "dedup_simhash_k" -> ((s, d) => DedupOps.simhash60HammingPairs(docs(s, d))),
    // wide form at its exactness bound (6x10-bit banding, k = 5)
    "dedup_simhash_wide" -> ((s, d) =>
      DedupOps.simhash60HammingPairs(docs(s, d), k = 5)),
    // compact 32-bit demo (saturates at corpus scale — see BENCH_TREND)
    "dedup_simhash_compact" -> ((s, d) => DedupOps.simhashHammingPairs(docs(s, d))),
    "dedup_ngram" -> ((s, d) =>
      DedupOps.ngramJaccardPairsFrom(shSets(s, d), shSigs(s, d), 0.3)),
    // asymmetric containment (short-doc-inside-long-doc) near-dup pairs
    "dedup_containment" -> ((s, d) =>
      DedupOps.containmentPairsFrom(shSets(s, d), shSigs(s, d), 0.6)),
    // fuzzy-match family: prefix levenshtein over the shared band index
    "dedup_editdist" -> ((s, d) =>
      DedupOps.editDistancePairsFrom(docs(s, d), shSigs(s, d))),
    "dedup_clusters" -> ((s, d) => shClusters(s, d, 0.5)),
    // integer-exact PageRank over the near-dup graph (hub centrality),
    // derived from the suite's shared verified pair frame
    "dedup_pagerank" -> ((s, d) => DedupOps.nearDupPageRankFrom(
      docs(s, d).select(org.apache.spark.sql.functions.col("doc_id")),
      shPairs(s, d, 0.5))),
    // triangle/wedge structure stats of the near-dup graph
    // (degree-ordered forward counting over the shared pair frame)
    "dedup_graph_triangles" -> ((s, d) =>
      ext.Graph.triangleStats(shPairs(s, d, 0.5))),
    // bounded 2-core peeling: the densely-duplicated template core
    "dedup_kcore" -> ((s, d) => ext.Graph.kCore(shPairs(s, d, 0.5))),
    // plurality-label communities: density granularity vs CC's reachability
    "dedup_communities" -> ((s, d) => ext.Graph.labelPropagation(
      docs(s, d).select(org.apache.spark.sql.functions.col("doc_id")),
      shPairs(s, d, 0.5))),
    "dedup_incremental" -> ((s, d) =>
      DedupOps.incrementalNewDocsFrom(docs(s, d), shDigests(s, d))),
    // same semantics behind a broadcast Bloom prefilter (exact result;
    // the codegen'd probe prunes the anti-join input inside the scan)
    "dedup_incremental_bloom" -> ((s, d) =>
      DedupOps.incrementalNewDocsBloomFrom(docs(s, d), shDigests(s, d))),
    "dedup_incremental_near" -> ((s, d) =>
      DedupOps.incrementalNewNearDocsFrom(docs(s, d), shSets(s, d), shBands(s, d), 0.5)),
    // full curation composite: exact dup → near dup → quality → keep,
    // derived from the materialized dedup artifacts
    "corpus_clean" -> ((s, d) => ext.Corpus.cleanDecisionsFrom(docs(s, d),
      shExact(s, d), shClusters(s, d, GraftConf.nearDupThreshold(s)))),
    // per-lang dedup rates: the dataset-card report, a cheap aggregate
    // over the shared dedup outputs (not a second minhash+CC pass)
    "corpus_dedup_report" -> ((s, d) => ext.Corpus.dedupReportFrom(
      docs(s, d), shExact(s, d), shClusters(s, d, 0.5))),
    // MERGE INTO relationally: last-write-wins upsert of a change
    // batch into the corpus snapshot, insert/update/keep labeled
    "corpus_upsert" -> ((s, d) => ext.Corpus.upsertMerge(docs(s, d))),
    // lexical ⊗ semantic near-dup fusion with per-signal flags
    "corpus_cross_signal" -> ((s, d) => ext.Corpus.crossSignalFrom(
      shPairs(s, d, 0.5), shLsh(s, d), GraftConf.cosineThreshold(s))),

    // ---- similarity search over `embeddings` --------------------------
    "embed_topk" -> ((s, d) => shExactTopK(s, d)),
    // recommender objective: max-inner-product top-k, pure integer dot
    "embed_mips_topk" -> ((s, d) => EmbedOps.mipsTopK(emb(s, d))),
    "embed_lsh_neardup" -> ((s, d) => shLsh(s, d)),
    // Matryoshka-style two-stage retrieval: 16-dim-prefix coarse rank,
    // full-dim rerank of the surviving candidates
    "embed_prefix_rerank" -> ((s, d) => EmbedOps.prefixRerankTopK(emb(s, d))),
    "embed_ivf_topk" -> ((s, d) => EmbedOps.ivfTopK(emb(s, d))),
    "embed_neardup_exact" -> ((s, d) => EmbedOps.exactNearDups(emb(s, d))),
    // bounded-output near-dup: top-5 most-similar pairs per label block
    // (the form whose output stays linear at corpus scale — see the
    // topKNearDups scaladoc noise-floor analysis)
    "embed_neardup_topk" -> ((s, d) => EmbedOps.topKNearDups(emb(s, d))),
    // semantic dedup: connected components over the shared verified
    // LSH pair frame
    "embed_clusters" -> ((s, d) =>
      EmbedOps.nearDupClustersFrom(emb(s, d), shLsh(s, d))),
    // distributed Lloyd's k-means, all-integer arithmetic → full oracle;
    // ONE training per (session, dir) feeds both the assignment query
    // and the balanced sample
    "embed_kmeans" -> ((s, d) => shKmeans(s, d)),
    // SemDeDup: within-kmeans-cluster semantic dups, keep the outlier
    "embed_semdedup" -> ((s, d) =>
      EmbedOps.semDedupFrom(emb(s, d), shKmeans(s, d))),
    // assignment THROUGH THE PERSISTED CentroidStore artifact (r17):
    // train+commit once, then assign against the loaded frozen
    // centroid frame — hash-equal to the session-shared kmeans chain
    // (same seeding, rounds, and integer argmin), which is exactly
    // the frozen-geometry contract the incremental semantic-dedup
    // ingest relies on
    "embed_assign_persisted" -> ((s, d) =>
      EmbedOps.assignAgainst(emb(s, d),
        CentroidStore.centroids(s, shCentroidStore(s, d)))),
    // SUBSAMPLE-trained centroids + one full-corpus assignment pass
    // (r17): the corpus-scale fit — training is O(cap·k), the single
    // O(N·k) assignAgainst is the irreducible exact-assignment cost
    "embed_kmeans_sampled" -> ((s, d) =>
      EmbedOps.assignAgainst(emb(s, d),
        EmbedOps.kmeansCentroidsSampled(emb(s, d), sampleCap = 256))),
    // the paper-literal keep rule for varying-norm regimes: same dup
    // groups, keeper = LOWEST cosine to own centroid; the centroid
    // frame comes from the persisted artifact (same geometry as the
    // session chain — CentroidStoreSpec pins the parity)
    "embed_semdedup_cosine" -> ((s, d) =>
      EmbedOps.semDedupByCosineFrom(emb(s, d), shKmeans(s, d),
        CentroidStore.centroids(s, shCentroidStore(s, d)))),
    "sample_balanced" -> ((s, d) => EmbedOps.balancedSampleFrom(shKmeans(s, d))),
    // product quantization: train-once codebooks (shared PqModel) →
    // codes → ADC top-k
    "embed_pq_topk" -> ((s, d) => EmbedOps.pqTopKFrom(shPq(s, d))),
    // IVF-PQ: coarse-centroid multi-probe (nprobe=2) + compressed-code
    // ADC over the same shared codebooks
    "embed_ivfpq_topk" -> ((s, d) =>
      EmbedOps.ivfPqTopKFrom(emb(s, d), shPq(s, d), coarse = shCoarse(s, d))),
    // approximation-quality eval: PQ recall vs the shared exact top-k
    "embed_pq_recall" -> ((s, d) => EmbedOps.pqRecallFrom(
      shExactTopK(s, d), EmbedOps.pqTopKFrom(shPq(s, d)), 5)),
    // the nprobe recall dial: IVF-PQ hits vs exact at nprobe 1 and 2,
    // both probing the same trained model
    "embed_ivfpq_recall" -> ((s, d) => EmbedOps.ivfPqRecallCompareFrom(
      emb(s, d), shExactTopK(s, d), shPq(s, d), coarse = shCoarse(s, d))),
    // PERSISTED-index search: codebooks/codes/coarse stats LOADED from
    // the parquet index store (train-once artifact — EmbedIndex), the
    // corpus never rescanned or retrained; same ranking contract and
    // oracle as embed_ivfpq_topk
    "embed_index_persisted" -> ((s, d) =>
      EmbedIndex.search(s, shIndexFull(s, d), idxQueries(s, d))),
    // incremental maintenance: base-segment build + frozen-codebook
    // append of the delta; coarse centroids derive from the exactly-
    // merged integer sums, so the merged-index search hash-matches a
    // from-scratch SQL oracle
    "embed_index_incremental" -> ((s, d) =>
      EmbedIndex.search(s, shIndexIncr(s, d), idxQueries(s, d))),
    // int8 scalar quantization + exact integer reconstruction error
    "embed_sq8" -> ((s, d) => EmbedOps.scalarQuantize8(emb(s, d))),
    // per-label dataset-card profile of the embedding store
    "embed_norm_profile" -> ((s, d) => EmbedOps.normProfile(emb(s, d))),
    // native codegen'd cosine expression — fully hash-gated: the
    // float-product/double-left-fold accumulation is reproduced
    // bit-for-bit by the oracle's list_reduce (see
    // OracleSqlExt.embedTopKNative)
    "embed_topk_native" -> ((s, d) => EmbedOps.bruteForceTopKNative(emb(s, d))),

    // ---- multimodal binary columns ------------------------------------
    // REAL BMP/PPM decode (ImageCodec): genuine encoded bytes parsed
    // header+pixels; the oracle recomputes the pixel sums independently
    "mm_decode" -> ((s, d) => MultiModal.decodedFeatures(docs(s, d))),
    // JPEG stills through the same image plumbing (SOI magic dispatch)
    "mm_decode_jpeg" -> ((s, d) => MultiModal.decodedJpegFeatures(docs(s, d))),
    // GIF87a: real variable-width LZW decompression + palette mapping
    "mm_decode_gif" -> ((s, d) => MultiModal.decodedGifFeatures(docs(s, d))),
    "mm_decode_png" -> ((s, d) => MultiModal.decodedPngFeatures(docs(s, d))),
    "mm_audio" -> ((s, d) => MultiModal.decodedAudio(docs(s, d))),
    // G.711 µ-law WAV: lossy companding, oracle replays the formulas
    "mm_audio_mulaw" -> ((s, d) => MultiModal.decodedMulawAudio(docs(s, d))),
    // pseudo-decode plumbing (only video decode remains stubbed)
    "mm_features" -> ((s, d) => MultiModal.features(docs(s, d))),
    "mm_resize" -> ((s, d) => MultiModal.resizePlan(docs(s, d))),
    // REAL AVI decode (VideoCodec): RIFF chunk walk + DIB frame pixels,
    // one row per sampled frame; the oracle recomputes the per-frame
    // channel sums independently
    "mm_frames" -> ((s, d) => MultiModal.frameStats(docs(s, d))),
    // MJPEG-in-AVI: full baseline-JPEG decode per sampled frame
    "mm_frames_mjpeg" -> ((s, d) => MultiModal.frameStatsMjpeg(docs(s, d)))
  )

  /** The single-file fixture tables cannot split (one parquet row
    * group), so the corpus entry points spread them explicitly. Sized
    * to the SESSION's parallelism rather than the historical constant
    * 32: identical plans at the 32-core driver bench, and at the
    * driver's lower-core scaling run the partition count tracks the
    * cores (32 partitions on 16 cores ran every stage in two waves). */
  private def spread(s: SparkSession): Int =
    s.sparkContext.defaultParallelism
  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).repartition(spread(s))
  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).repartition(spread(s))

  // ---- suite-shared derived artifacts (graft.Artifacts memo) ----------
  // One signature/pair/codebook build per (session, dir) feeds every
  // consumer query — the materialized-artifact reuse a production
  // pipeline gets from its artifact store; oracles are unaffected
  // because the *From variants compute identical frames.
  private def shSets(s: SparkSession, d: String): DataFrame =
    Artifacts.frame(s, d, "dedup/shingle_sets")(DedupOps.shingleSets(docs(s, d)))
  private def shSigs(s: SparkSession, d: String): DataFrame =
    Artifacts.frame(s, d, "dedup/minhash_sigs")(DedupOps.minhashSignatures(docs(s, d)))
  private def shBands(s: SparkSession, d: String): DataFrame =
    Artifacts.frame(s, d, "dedup/band_keys")(DedupOps.bandKeysFrom(shSigs(s, d)))
  private def shPairs(s: SparkSession, d: String, thr: Double): DataFrame =
    Artifacts.frame(s, d, s"dedup/pairs@$thr")(
      DedupOps.minhashNearDupsFrom(shSets(s, d), shBands(s, d), thr))
  private def shExact(s: SparkSession, d: String): DataFrame =
    Artifacts.frame(s, d, "dedup/exact")(DedupOps.exactDups(docs(s, d)))
  private def shClusters(s: SparkSession, d: String, thr: Double): DataFrame =
    Artifacts.frame(s, d, s"dedup/clusters@$thr")(
      DedupOps.nearDupClustersFrom(
        docs(s, d).select(org.apache.spark.sql.functions.col("doc_id")),
        shPairs(s, d, thr)))
  private def shLsh(s: SparkSession, d: String): DataFrame =
    Artifacts.frame(s, d, "embed/lsh_pairs")(EmbedOps.lshNearDups(emb(s, d)))
  private def shExactTopK(s: SparkSession, d: String): DataFrame =
    Artifacts.frame(s, d, "embed/brute_topk")(EmbedOps.bruteForceTopK(emb(s, d)))
  private def shPq(s: SparkSession, d: String): EmbedOps.PqModel =
    Artifacts.obj(s, d, "embed/pq_model")(EmbedOps.trainPq(emb(s, d)))
  // scale-aware k (max(8, ceil(N/1024)) — EmbedOps.scaledK): at the
  // gate/bench corpora (≤ 8192 vectors) this IS the historical k = 8
  // geometry the DuckDB oracle re-derives; at ladder/corpus scale k
  // grows with N so semDedupFrom's within-cluster pair join stays
  // linear instead of N²/8
  private def shKmeans(s: SparkSession, d: String): DataFrame =
    Artifacts.frame(s, d, "embed/kmeans_asg")(
      EmbedOps.kmeansAssignmentsScaled(emb(s, d)))
  // the IVF coarse quantizer is part of the persisted index in a real
  // deployment — built with the codes, loaded by every searcher
  private def shCoarse(s: SparkSession, d: String): DataFrame =
    Artifacts.frame(s, d, "embed/coarse_centroids")(
      EmbedOps.coarseCentroids(emb(s, d)))
  // persisted IVF-PQ index (EmbedIndex): built ONCE per (session, dir)
  // into an immutable marker-committed store under java.io.tmpdir;
  // every search then reads codes + codebooks off the store instead of
  // retraining — the artifact contract a real deployment has, where
  // the index outlives the session that trained it
  private def idxQueries(s: SparkSession, d: String): DataFrame = {
    val f = org.apache.spark.sql.functions
    emb(s, d).filter(f.col("vec_id") % 97 === 0)
      .select(f.col("vec_id"), f.col("embedding"))
  }
  // root is SUFFIXED WITH THE MANIFEST FORMAT VERSION: a library
  // upgrade that changes the on-disk layout must land in a fresh root
  // rather than tripping over (or worse, reinterpreting) an index a
  // previous version committed — EmbedIndex errors loudly on a format
  // mismatch, and this keeps the driver environment from ever hitting
  // that error on its own leftover /tmp state
  private def indexRoot(d: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_embed_index_v2/" +
      java.lang.Integer.toHexString(d.hashCode)
  private def shIndexFull(s: SparkSession, d: String): String =
    Artifacts.obj(s, d, "embed/index_full") {
      val dir = indexRoot(d) + "/full"
      EmbedIndex.build(emb(s, d), dir)
      dir
    }
  private def shIndexIncr(s: SparkSession, d: String): String =
    Artifacts.obj(s, d, "embed/index_incr") {
      val dir = indexRoot(d) + "/incr"
      val vid = org.apache.spark.sql.functions.col("vec_id")
      EmbedIndex.build(emb(s, d).filter(vid % 5 =!= 0), dir)
      EmbedIndex.append(emb(s, d).filter(vid % 5 === 0), dir)
      dir
    }
  // the PERSISTED clustering geometry: trained + committed once per
  // (session, dir), then assignment loads the frozen centroid frame
  // from disk — the incremental-semantic-dedup contract (consumers:
  // embed_assign_persisted, CorpusIngest.ingestBatchSemanticCentroid)
  private def centroidRoot(d: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_centroids_v1/" +
      java.lang.Integer.toHexString(d.hashCode)
  private def shCentroidStore(s: SparkSession, d: String): String =
    Artifacts.obj(s, d, "embed/centroid_store") {
      val dir = centroidRoot(d)
      CentroidStore.build(emb(s, d), dir)
      // the root persists across sessions and each session trains one
      // fresh generation — without retention the store accumulates a
      // full centroid epoch per session forever; this session only
      // ever reads the generation it just committed
      CentroidStore.vacuum(dir)
      dir
    }
  private def shTf(s: SparkSession, d: String): DataFrame =
    Artifacts.frame(s, d, "text/term_freq")(TextOps.termFrequencies(docs(s, d)))
  // the trained tokenizer: one training run feeds both the merge-table
  // query and the corpus encode (a real pipeline trains once, ships
  // the artifact to every encoder)
  private def shBpeMerges(s: SparkSession, d: String): DataFrame =
    Artifacts.frame(s, d, "text/bpe_merges")(TextOps.bpeTrainMerges(docs(s, d)))
  private def tokRoot(d: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_tokenizer_v1/" +
      java.lang.Integer.toHexString(d.hashCode)
  // the PERSISTED tokenizer: trained + committed once per (session,
  // dir), then every consumer loads the frozen artifact from disk
  private def shTokStore(s: SparkSession, d: String): String =
    Artifacts.obj(s, d, "text/bpe_store") {
      val dir = tokRoot(d)
      TokenizerStore.build(docs(s, d), dir)
      dir
    }
  // the tombstoned exact-dedup corpus behind corpus_tombstone_active:
  // built once per (session, dir) in a stable per-dataset tmp root —
  // batch-0 markers make re-entry (same session or a later one
  // reusing the root) a TxnLog replay no-op, and the doc_id drain
  // converges even a marker-less crash replay
  private def tombRoot(d: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_tombcorpus_v1/" +
      java.lang.Integer.toHexString(d.hashCode)
  private def shTombCorpus(s: SparkSession, d: String): String =
    Artifacts.obj(s, d, "corpus/tombstoned") {
      val dir = tombRoot(d)
      graft.streaming.CorpusIngest.ingestBatch(
        docs(s, d).select(
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text")), 0L, dir)
      graft.streaming.CorpusIngest.tombstoneDocs(
        docs(s, d).filter(
          org.apache.spark.sql.functions.col("n_chars") % 7 === 3)
          .select(org.apache.spark.sql.functions.col("doc_id")), 0L, dir)
      dir
    }
  private def shSixGrams(s: SparkSession, d: String): DataFrame =
    Artifacts.frame(s, d, "text/shingles6")(TextOps.sixGramShingles(docs(s, d)))
  // the incremental-dedup premise: the stored corpus's digest index is
  // a persisted table, probed (not rebuilt) by every incoming batch
  private def shDigests(s: SparkSession, d: String): DataFrame =
    Artifacts.frame(s, d, "dedup/stored_digests")(
      DedupOps.storedDigestIndex(docs(s, d)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "pipe_actions" -> OracleSql.pipeActions,
    "pipe_email_jobs" -> OracleSql.pipeEmailJobs,
    "pipe_top_matches" -> OracleSql.pipeTopMatches,
    "pipe_status_updates" -> OracleSql.pipeStatusUpdates,
    "pipe_batch_failures" -> OracleSql.pipeBatchFailures,
    "pipe_metrics" -> OracleSql.pipeMetrics,
    "pipe_sqs_attrs" -> OracleSql.pipeSqsAttrs,
    "pipe_decode_attrs" -> OracleSql.pipeDecodeAttrs,
    "pipe_tombstones" -> OracleSql.pipeTombstones,

    "q1_pricing" -> OracleSqlExt.q1Pricing,
    "q3_shipping" -> OracleSqlExt.q3Shipping,
    "q5_region_volume" -> OracleSqlExt.q5RegionVolume,
    "q14_promo" -> OracleSqlExt.q14Promo,
    "q4_priority" -> OracleSqlExt.q4Priority,
    "q10_returned" -> OracleSqlExt.q10Returned,
    "q18_large_orders" -> OracleSqlExt.q18LargeOrders,
    "q19_brand_revenue" -> OracleSqlExt.q19BrandRevenue,
    "q7_nation_trade" -> OracleSqlExt.q7NationTrade,
    "q8_market_share" -> OracleSqlExt.q8MarketShare,
    "q9_profit" -> OracleSqlExt.q9Profit,
    "q12_late_priority" -> OracleSqlExt.q12LatePriority,
    "q13_order_distribution" -> OracleSqlExt.q13OrderDistribution,
    "q15_top_supplier" -> OracleSqlExt.q15TopSupplier,
    "q17_small_qty" -> OracleSqlExt.q17SmallQty,
    "q17_winmagic" -> OracleSqlExt.q17SmallQty,
    "q21_waiting_suppliers" -> OracleSqlExt.q21WaitingSuppliers,
    "q22_dormant_value" -> OracleSqlExt.q22DormantValue,
    "q6_forecast" -> OracleSqlExt.q6Forecast,
    "q2_min_cost" -> OracleSqlExt.q2MinCost,
    "q11_important_stock" -> OracleSqlExt.q11ImportantStock,
    "q20_promo_suppliers" -> OracleSqlExt.q20PromoSuppliers,
    "orders_basket" -> OracleSqlExt.ordersBasket,
    "window_top_orders" -> OracleSqlExt.windowTopOrders,
    "window_running_spend" -> OracleSqlExt.windowRunningSpend,
    "window_range_frame" -> OracleSqlExt.windowRangeFrame,
    "window_order_gaps" -> OracleSqlExt.windowOrderGaps,
    "pivot_status" -> OracleSqlExt.pivotStatus,
    "rollup_revenue" -> OracleSqlExt.rollupRevenue,
    "setop_segments" -> OracleSqlExt.setopSegments,
    "setop_multiset" -> OracleSqlExt.setopMultiset,
    "q16_supplier_variety" -> OracleSqlExt.q16SupplierVariety,
    "cube_status_priority" -> OracleSqlExt.cubeStatusPriority,
    "agg_grouping_sets" -> OracleSqlExt.aggGroupingSets,

    "events_tumbling" -> OracleSqlExt.eventsTumbling,
    "events_sliding" -> OracleSqlExt.eventsSliding,
    "events_session" -> OracleSqlExt.eventsSession,
    "events_first" -> OracleSqlExt.eventsFirst,
    "events_props_json" -> OracleSqlExt.eventsPropsJson,
    "events_asof" -> OracleSqlExt.eventsAsof,
    "events_asof_native" -> OracleSqlExt.eventsAsof,
    "events_asof_broadcast" -> OracleSqlExt.eventsAsof,
    "events_asof_tolerance" -> OracleSqlExt.eventsAsofTolerance,
    "events_asof_fwd" -> OracleSqlExt.eventsAsofFwd,
    "events_asof_nearest" -> OracleSqlExt.eventsAsofNearest,
    "sql_range" -> OracleSqlExt.eventsRange,
    "sql_knn" -> OracleSqlExt.sqlKnn,
    "sql_neardup" -> OracleSqlExt.dedupMinhash,
    "sql_dsir" -> OracleSqlExt.sampleDsir,
    "sql_semdedup" -> OracleSqlExt.embedSemdedup,
    "sql_index_search" -> OracleSqlExt.embedIvfPqTopK,
    "sql_knn_serving" -> OracleSqlExt.sqlKnnServing,
    "sql_index_search_serving" -> OracleSqlExt.embedIvfPqTopKServing,
    "sql_dup_spans" -> OracleSqlExt.textDupMaximalSpans,
    "sql_excise" -> OracleSqlExt.textDedupExcise,
    "sql_dup_islands" -> OracleSqlExt.textDupIslands,
    "sql_centroid_assign" -> OracleSqlExt.embedKmeans,
    "events_range" -> OracleSqlExt.eventsRange,
    "events_salted_counts" -> OracleSqlExt.eventsSaltedCounts,
    "events_anomalies" -> OracleSqlExt.eventsAnomalies,
    "events_top_types" -> OracleSqlExt.eventsTopTypes,
    "sketch_kmv" -> OracleSqlExt.sketchKmv,
    "sketch_countmin" -> OracleSqlExt.sketchCountMin,
    "sketch_kmv_overlap" -> OracleSqlExt.sketchKmvOverlap,
    "sketch_quantiles" -> OracleSqlExt.sketchQuantiles,
    "sketch_hll" -> OracleSqlExt.sketchHll,
    "diag_key_skew" -> OracleSqlExt.diagKeySkew,
    "diag_profile" -> OracleSqlExt.diagProfile,
    "diag_histogram" -> OracleSqlExt.diagHistogram,
    "diag_checks" -> OracleSqlExt.diagChecks,
    "events_funnel" -> OracleSqlExt.eventsFunnel,
    "events_session_funnel" -> OracleSqlExt.eventsSessionFunnel,
    "events_retention" -> OracleSqlExt.eventsRetention,
    "events_paths" -> OracleSqlExt.eventsPaths,
    "layout_zorder" -> OracleSqlExt.layoutZorder,
    "layout_skipping" -> OracleSqlExt.layoutSkipping,
    "agg_percentiles" -> OracleSqlExt.aggPercentiles,
    "agg_approx_distinct" -> OracleSqlExt.aggApproxDistinct,
    "agg_percentiles_approx" -> OracleSqlExt.aggPercentilesApprox,
    "agg_moments" -> OracleSqlExt.aggMoments,
    "sql_q6_forecast" -> OracleSqlExt.q6Forecast,
    // The SQL-text twins re-use the proven oracle formulations of the
    // operators they mirror — the twin and the DataFrame original must
    // agree with the SAME independent DuckDB answer.
    "sql_window_top_orders" -> OracleSqlExt.windowTopOrders,
    "sql_grouping_sets" -> OracleSqlExt.aggGroupingSets,
    "sql_dedup_exact" -> OracleSqlExt.dedupExact,
    "sql_q4_exists" -> OracleSqlExt.q4Priority,
    "sql_q2_mincost" -> OracleSqlExt.q2MinCost,
    "sql_q17_below_avg" -> OracleSqlExt.q17SmallQty,
    "sql_q17_join_winmagic" -> OracleSqlExt.q17JoinCore,
    "sql_count_winmagic" -> OracleSqlExt.countWinmagic,
    "sql_q18_in" -> OracleSqlExt.q18LargeOrders,
    "sql_events_funnel" -> OracleSqlExt.eventsFunnel,
    "sql_dedup_minhash" -> OracleSqlExt.dedupMinhash,
    "sql_text_bm25" -> OracleSqlExt.textBm25,
    "sql_asof" -> OracleSqlExt.eventsAsof,
    "sql_asof_native" -> OracleSqlExt.eventsAsof,
    "sql_chunk" -> OracleSqlExt.textChunk,

    "text_stats" -> OracleSqlExt.textStats,
    "text_quality" -> OracleSqlExt.textQuality,
    "text_gopher_gate" -> OracleSqlExt.textGopherGate,
    "text_langid" -> OracleSqlExt.textLangId,
    "text_fingerprint" -> OracleSqlExt.textFingerprint,
    "text_rolling_fingerprint" -> OracleSqlExt.textRollingFingerprint,
    "text_tokens" -> OracleSqlExt.textTokens,
    "text_top_terms" -> OracleSqlExt.textTopTerms,
    "text_normalize" -> OracleSqlExt.textNormalize,
    "text_repetition" -> OracleSqlExt.textRepetition,
    "corpus_shards" -> OracleSqlExt.corpusShards,
    "corpus_shards_global" -> OracleSqlExt.corpusShardsGlobal,
    "text_pack_sequences" -> OracleSqlExt.textPackSequences,
    "text_bigrams" -> OracleSqlExt.textBigrams,
    "text_pmi" -> OracleSqlExt.textPmi,
    "text_entropy" -> OracleSqlExt.textEntropy,
    "corpus_quality_gate" -> OracleSqlExt.corpusQualityGate,
    "corpus_source_caps" -> OracleSqlExt.corpusSourceCaps,
    "text_pii_scrub" -> OracleSqlExt.textPiiScrub,
    "text_surprisal" -> OracleSqlExt.textSurprisal,
    "text_perplexity" -> OracleSqlExt.textPerplexity,
    "text_chunk" -> OracleSqlExt.textChunk,
    "corpus_contamination" -> OracleSqlExt.corpusContamination,
    "corpus_decontam_spans" -> OracleSqlExt.corpusDecontamSpans,
    "corpus_decontam_excise" -> OracleSqlExt.corpusDecontamExcise,
    "corpus_mixture" -> OracleSqlExt.corpusMixture,
    "sample_hash" -> OracleSqlExt.textHashSample,
    "sample_splits" -> OracleSqlExt.sampleSplits,
    "sample_splits_safe" -> OracleSqlExt.sampleSplitsSafe,
    "sample_split_leakage" -> OracleSqlExt.sampleSplitLeakage,
    "corpus_epoch_order" -> OracleSqlExt.corpusEpochOrder,
    "corpus_tombstone_active" -> OracleSqlExt.corpusTombstoneActive,
    "sample_mixture" -> OracleSqlExt.corpusMixtureSample,
    "text_tfidf" -> OracleSqlExt.textTfidf,
    "text_vocab_encode" -> OracleSqlExt.textVocabEncode,
    "text_bpe_train" -> OracleSqlExt.textBpeTrain,
    "text_bpe_encode" -> OracleSqlExt.textBpeEncode,
    // the persisted-store path must reproduce the in-memory encode
    // bit-for-bit — same oracle
    "text_bpe_store" -> OracleSqlExt.textBpeEncode,
    "text_bpe_ids" -> OracleSqlExt.textBpeIds,
    "text_tokenizer_fertility" -> OracleSqlExt.textTokenizerFertility,
    "text_bpe_roundtrip" -> OracleSqlExt.textBpeRoundtrip,
    "corpus_shards_bpe" -> OracleSqlExt.corpusShardsBpe,
    "text_perceptron_train" -> OracleSqlExt.textPerceptronTrain,
    "text_sparse_neardup" -> OracleSqlExt.textSparseNeardup,
    "text_bm25" -> OracleSqlExt.textBm25,
    "text_length_histogram" -> OracleSqlExt.textLengthHistogram,
    "text_paragraph_dedup" -> OracleSqlExt.textParagraphDedup,
    "text_dup_segments" -> OracleSqlExt.textDupSegments,
    "text_dup_spans" -> OracleSqlExt.textDupSpans,
    "text_dup_maximal_spans" -> OracleSqlExt.textDupMaximalSpans,
    "text_dup_islands" -> OracleSqlExt.textDupIslands,
    "text_dup_span_audit" -> OracleSqlExt.textDupSpanAudit,
    "text_dedup_excise" -> OracleSqlExt.textDedupExcise,
    "text_quality_model" -> OracleSqlExt.textQualityModel,
    "sample_stratified" -> OracleSqlExt.sampleStratified,
    "sample_weighted" -> OracleSqlExt.sampleWeighted,
    "sample_dsir" -> OracleSqlExt.sampleDsir,
    "text_hash_features" -> OracleSqlExt.textHashFeatures,

    "dedup_exact" -> OracleSqlExt.dedupExact,
    "dedup_minhash" -> OracleSqlExt.dedupMinhash,
    "dedup_minhash_est" -> OracleSqlExt.dedupMinhashEst,
    "dedup_simhash" -> OracleSqlExt.dedupSimhash,
    "dedup_simhash_k" -> OracleSqlExt.dedupSimhashK,
    "dedup_simhash_wide" -> OracleSqlExt.dedupSimhashWide,
    "dedup_simhash_compact" -> OracleSqlExt.dedupSimhashCompact,
    "dedup_ngram" -> OracleSqlExt.dedupNgram,
    "dedup_containment" -> OracleSqlExt.dedupContainment,
    "dedup_editdist" -> OracleSqlExt.dedupEditdist,
    "dedup_clusters" -> OracleSqlExt.dedupClusters,
    "dedup_pagerank" -> OracleSqlExt.dedupPagerank,
    "dedup_kcore" -> OracleSqlExt.dedupKcore,
    "dedup_communities" -> OracleSqlExt.dedupCommunities,
    "dedup_graph_triangles" -> OracleSqlExt.dedupGraphTriangles,
    "dedup_incremental" -> OracleSqlExt.dedupIncremental,
    // the bloom is a pure prefilter: the exact-SQL oracle is identical
    "dedup_incremental_bloom" -> OracleSqlExt.dedupIncremental,
    "dedup_incremental_near" -> OracleSqlExt.dedupIncrementalNear,
    "corpus_clean" -> OracleSqlExt.corpusClean,
    "corpus_dedup_report" -> OracleSqlExt.corpusDedupReport,
    "corpus_cross_signal" -> OracleSqlExt.corpusCrossSignal,
    "corpus_upsert" -> OracleSqlExt.corpusUpsert,

    "embed_topk" -> OracleSqlExt.embedTopK,
    "embed_mips_topk" -> OracleSqlExt.embedMipsTopk,
    "embed_topk_native" -> OracleSqlExt.embedTopKNative,
    "embed_prefix_rerank" -> OracleSqlExt.embedPrefixRerank,
    "embed_lsh_neardup" -> OracleSqlExt.embedLshNearDups,
    "embed_ivf_topk" -> OracleSqlExt.embedIvfTopK,
    "embed_neardup_exact" -> OracleSqlExt.embedNearDupExact,
    "embed_neardup_topk" -> OracleSqlExt.embedNearDupTopk,
    "embed_clusters" -> OracleSqlExt.embedClusters,
    "embed_kmeans" -> OracleSqlExt.embedKmeans,
    // the persisted-artifact path must land on the SAME geometry the
    // session-shared chain derives — one oracle, two engine routes
    "embed_assign_persisted" -> OracleSqlExt.embedKmeans,
    "embed_kmeans_sampled" -> OracleSqlExt.embedKmeansSampled,
    "embed_semdedup_cosine" -> OracleSqlExt.embedSemdedupCosine,
    "embed_semdedup" -> OracleSqlExt.embedSemdedup,
    "sample_balanced" -> OracleSqlExt.embedBalancedSample,
    "embed_pq_topk" -> OracleSqlExt.embedPqTopK,
    "embed_ivfpq_topk" -> OracleSqlExt.embedIvfPqTopK,
    "embed_pq_recall" -> OracleSqlExt.embedPqRecall,
    "embed_ivfpq_recall" -> OracleSqlExt.embedIvfPqRecall,
    // the persisted index serves the SAME ranking as the in-session
    // IVF-PQ — one oracle gates both engine paths
    "embed_index_persisted" -> OracleSqlExt.embedIvfPqTopK,
    "embed_index_incremental" -> OracleSqlExt.embedIvfPqIncremental,
    "embed_sq8" -> OracleSqlExt.embedSq8,
    "embed_norm_profile" -> OracleSqlExt.embedNormProfile,

    "mm_decode" -> OracleSqlExt.mmDecode,
    "mm_decode_jpeg" -> OracleSqlExt.mmDecodeJpeg,
    "mm_decode_gif" -> OracleSqlExt.mmDecodeGif,
    "mm_decode_png" -> OracleSqlExt.mmDecodePng,
    "mm_audio" -> OracleSqlExt.mmAudio,
    "mm_audio_mulaw" -> OracleSqlExt.mmAudioMulaw,
    "mm_features" -> OracleSqlExt.mmFeatures,
    "mm_resize" -> OracleSqlExt.mmResize,
    "mm_frames" -> OracleSqlExt.mmFrames,
    "mm_frames_mjpeg" -> OracleSqlExt.mmFramesMjpeg
  )
}
