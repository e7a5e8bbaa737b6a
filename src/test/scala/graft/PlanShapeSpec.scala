package graft

import graft.tools.PlanShapes

/** Golden plan-shape pins for the headline query set: the
  * scale-deciding operator-node counts (shuffles, join strategies,
  * aggregates, generates) of each STATIC plan at sf0.001, captured
  * via [[PlanShapes.counts]].
  *
  * Purpose: plan regressions fail mechanically instead of surfacing
  * as a bench delta three rounds later — a broadcast silently
  * degrading to a sort-merge join, an extra shuffle from a lost
  * partitioning, a Generate duplicated by a lost ReuseExchange all
  * change these counts. The golden being brittle is the point: a plan
  * change must be INTENTIONAL, reviewed, and re-pinned here with the
  * diff in the commit.
  *
  * Static plans (AQE off for the capture): the pin covers what the
  * planner commits to from size estimates alone — AQE's runtime
  * reshaping is measured by the bench and the scale probes, not
  * pinned, because it is input-size-dependent by design.
  *
  * The 1-row scalar joins plan as BroadcastNestedLoopJoin (a scalar
  * has no join key); those BNLJ counts are the loud-drop-count /
  * corpus-stats scalars riding the result, not accidental cross
  * products — CartesianProduct is asserted ZERO everywhere. */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val golden: Map[String, Map[String, Int]] = Map(
    "q1_pricing" -> Map("Exchange" -> 2, "HashAggregate" -> 2),
    "q3_shipping" -> Map("BroadcastExchange" -> 2,
      "BroadcastHashJoin" -> 2, "Exchange" -> 1, "HashAggregate" -> 2),
    "q18_large_orders" -> Map("BroadcastExchange" -> 2,
      "BroadcastHashJoin" -> 2, "Exchange" -> 1, "HashAggregate" -> 2),
    "orders_basket" -> Map("BroadcastExchange" -> 4,
      "BroadcastHashJoin" -> 2, "BroadcastNestedLoopJoin" -> 2,
      "Exchange" -> 3, "HashAggregate" -> 10, "SortMergeJoin" -> 1),
    "events_asof" -> Map("Exchange" -> 1),
    "events_asof_native" -> Map("Exchange" -> 2),
    "events_asof_broadcast" -> Map("BroadcastExchange" -> 1),
    // the SQL TVF spelling must keep planning the NATIVE operator
    // (broadcast at this SF by the stats model) — a drift to the
    // union+window form would show as Exchange/Window counts here
    "sql_asof_native" -> Map("BroadcastExchange" -> 1),
    "events_asof_tolerance" -> Map("Exchange" -> 2),
    "events_session" -> Map("Exchange" -> 1, "HashAggregate" -> 2),
    "events_retention" -> Map("BroadcastExchange" -> 2,
      "BroadcastHashJoin" -> 3, "Exchange" -> 5, "HashAggregate" -> 10),
    // bm25/dedup_exact goldens are the WinMagic-rewritten forms: the
    // shared session carries GraftExtensions (the production
    // deployment), whose join-back→window rewrite removes a scan, a
    // broadcast join, and two exchanges from each — re-pinned r14
    "text_bm25" -> Map("BroadcastExchange" -> 2, "BroadcastHashJoin" -> 1,
      "BroadcastNestedLoopJoin" -> 1, "Exchange" -> 7, "Generate" -> 1,
      "HashAggregate" -> 6),
    // re-pinned r15: the per-(doc, pair) fold exchange is gone (the
    // corpus-wide 3-key shuffle the r15 rewrite removed — Exchange
    // 7 → 6, HashAggregate 13 → 8) at the price of a second raw
    // explode (Generate 2 → 3); 30× wall 30.4 → 18.6 s
    "text_perplexity" -> Map("BroadcastExchange" -> 2,
      "BroadcastHashJoin" -> 2, "Exchange" -> 6, "Generate" -> 3,
      "HashAggregate" -> 8),
    "corpus_shards_global" -> Map("BroadcastExchange" -> 1,
      "BroadcastHashJoin" -> 1, "Exchange" -> 2, "HashAggregate" -> 2),
    "dedup_minhash" -> Map("BroadcastExchange" -> 4,
      "BroadcastHashJoin" -> 5, "Exchange" -> 6, "Generate" -> 6,
      "HashAggregate" -> 4),
    "embed_ivf_topk" -> Map("BroadcastExchange" -> 1,
      "BroadcastHashJoin" -> 1, "Exchange" -> 3, "WindowGroupLimit" -> 2),
    "dedup_exact" -> Map("Exchange" -> 2),
    // r17 substring-dedup family: the ONLY join is the hash-blocked
    // eligible-window probe (broadcast at this SF; the self-join rides
    // the shared localCheckpoint'd hits frame), islands/merges are
    // window + aggregate over pair-bounded partitions
    "text_dup_maximal_spans" -> Map("BroadcastHashJoin" -> 1,
      "BroadcastExchange" -> 1, "Exchange" -> 1, "HashAggregate" -> 2),
    "text_dedup_excise" -> Map("BroadcastHashJoin" -> 1,
      "BroadcastExchange" -> 1, "SortMergeJoin" -> 1, "Exchange" -> 4,
      "HashAggregate" -> 4))

  test("headline static plan shapes match the golden operator counts") {
    val prev = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val diffs = golden.toSeq.sortBy(_._1).flatMap { case (name, want) =>
        val plan = SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan.toString
        val got = PlanShapes.counts(plan)
        assert(got.getOrElse("CartesianProduct", 0) == 0,
          s"$name plans a CartesianProduct:\n$plan")
        if (got == want) Nil
        else Seq(s"$name: expected $want\n  got      $got")
      }
      assert(diffs.isEmpty,
        "plan shapes drifted — if intentional, re-pin the golden:\n" +
          diffs.mkString("\n"))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }
}
