package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected pair graph —
  * the clustering step every near-duplicate pipeline runs on top of
  * pair output (minhash pairs, embedding-cosine pairs), shared by
  * [[DedupOps.nearDupClusters]] and [[EmbedOps.nearDupClusters]].
  *
  * Algorithm: iterative min-label propagation with pointer jumping.
  * Each round is two distributed join+aggregate steps:
  *   1. label(x) := min(label(x), min over neighbors y of label(y))
  *   2. pointer jump: label(x) := min(label(x), label(label(x))) —
  *      halves remaining path lengths, so convergence is O(log
  *      diameter) distributed rounds instead of O(diameter).
  * Near-dup components are near-cliques (pairs share content), so
  * typical convergence is 2-3 rounds; the jump bounds the adversarial
  * chain case.
  *
  * Scale posture: every step is an equi join + groupBy on the vertex
  * id — hash-partitioned, no driver-side data. The driver checks only
  * a converged flag (`isEmpty` on the changed-label frame). State per
  * round is one (id, label) frame, cached and explicitly unpersisted
  * when superseded.
  *
  * Deterministic: component id = min vertex id of the component.
  */
object Graph {

  /** Connected components of the graph over `vertices` (first column =
    * vertex id) with undirected edges given by `pairs` (first two
    * columns = endpoints). Returns (id, label) with label = min id
    * reachable; isolated vertices keep their own id. */
  def connectedComponents(vertices: DataFrame, pairs: DataFrame,
      maxIters: Int = 50): DataFrame = {
    val p = pairs.select(col(pairs.columns(0)).as("src"),
      col(pairs.columns(1)).as("dst"))
    val edges = p.unionByName(
      p.select(col("dst").as("src"), col("src").as("dst"))).cache()
    var labels = vertices.select(col(vertices.columns(0)).as("id"))
      .withColumn("label", col("id")).cache()
    var converged = false
    var iters = 0
    while (!converged && iters < maxIters) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("label")).as("nlabel"))
      // the pre-round label rides along as `old`, so the convergence
      // check below is a filter on the already-materialized frame, not
      // an extra per-round join
      val stepped = labels.select(col("id"), col("label").as("old"))
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("old"),
          least(col("old"), coalesce(col("nlabel"), col("old"))).as("label"))
      // localCheckpoint (eager) materializes the round AND truncates
      // lineage. Truncation is load-bearing, not cosmetic: the
      // pointer-jump self-join doubles the logical plan per round, and
      // anything that renders the plan (AQE's per-stage explain
      // updates, the UI) goes exponential in round count without it —
      // measured as a multi-minute explainString hang at ~10 rounds.
      // On a cluster, swap for reliable checkpoint()s on a fault-
      // tolerant dir every few rounds (localCheckpoint trades
      // executor-loss recomputability for speed — the standard
      // iterative-graph trade).
      val next = stepped.join(
          stepped.select(col("id").as("label"), col("label").as("jump")),
          Seq("label"), "left")
        .select(col("id"), col("old"),
          least(col("label"), coalesce(col("jump"), col("label"))).as("label"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      converged = next.filter(col("label") =!= col("old")).isEmpty
      if (sys.env.contains("GRAFT_CC_LOG"))
        println(f"[graft.cc] round $iters%d converged=$converged ${(System.nanoTime() - t0) / 1e9}%.2fs")
      labels.unpersist()
      labels = next
      iters += 1
    }
    edges.unpersist()
    labels.select(col("id"), col("label"))
  }

  /** Integer-exact PageRank over an undirected pair graph — document
    * centrality on the near-dup graph (a high-rank doc is a hub its
    * whole duplicate neighborhood points at: the template/boilerplate
    * source, the natural cluster representative to keep). Symmetrizes
    * the pairs and delegates to [[pageRankDirected]]. */
  def pageRank(vertices: DataFrame, pairs: DataFrame, iters: Int = 3): DataFrame = {
    val p = pairs.select(col(pairs.columns(0)).as("src"),
      col(pairs.columns(1)).as("dst"))
    pageRankDirected(vertices,
      p.unionByName(p.select(col("dst").as("src"), col("src").as("dst"))), iters)
  }

  /** PageRank over DIRECTED edges, with dangling-mass redistribution.
    *
    * Power iteration with a FIXED round count (early-exited only on an
    * exact integer fixed point, which is result-identical) and ALL-INTEGER
    * arithmetic, so the result hash-matches a SQL oracle: ranks are
    * scaled by 10¹², the damping split is (15·base) div 100 +
    * (85·(inflow + dangling share)) div 100, and each neighbor
    * contribution is r div deg — every operand non-negative, so
    * truncating (Spark `div`) and flooring (DuckDB `//`) division
    * agree. Truncation leaks ≤1 scaled unit per op (≈10⁻¹² of mass) —
    * the ranking is a deterministic quantization of real PageRank, same
    * trade as [[TextOps.unigramSurprisal]]'s integer bits.
    *
    * Dangling mass: each round, the total rank of out-degree-0 nodes
    * (graph sinks; on the symmetrized near-dup graph, exactly the
    * isolated docs) is summed into a 1-row frame and every node
    * receives its `dm div n` share inside the damped term — the
    * standard uniform-teleport treatment, without which total mass
    * drains through sinks and the ranking degrades to in-degree
    * counting. With it, Σr is invariant round over round up to the
    * documented ≤(2n+1)-unit truncation leak (one div per node for the
    * share, one per damped term, one for the base) — the
    * mass-conservation property ExtOpsSpec asserts on a sink graph.
    *
    * Scale posture per round: one equi join ranks⋈edges on the vertex
    * id + one map-side-combinable groupBy(dst) — the same shape as
    * [[connectedComponents]]' rounds, with the same per-round
    * localCheckpoint lineage control — plus one 1-row aggregate over
    * the (already materialized) ranks frame for the dangling sum,
    * broadcast back. Degrees computed once. No driver-side data beyond
    * the tiny doc count. */
  def pageRankDirected(vertices: DataFrame, directedEdges: DataFrame,
      iters: Int = 3): DataFrame = {
    val Scale = 1000000000000L
    val edges = directedEdges.select(
      col(directedEdges.columns(0)).as("src"),
      col(directedEdges.columns(1)).as("dst")).cache()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg")).cache()
    val nodes = vertices.select(col(vertices.columns(0)).as("id"))
    val nTotal = broadcast(nodes.agg(count(lit(1)).as("n")))
    var ranks = nodes.crossJoin(nTotal)
      .select(col("id"), expr(s"${Scale}L div n").as("r"))
      .localCheckpoint()
    // Early exit on an exact fixed point: arithmetic is all-integer, so
    // if a round changes NO rank, every later round reproduces the same
    // frame bit-for-bit — stopping early is result-identical to the
    // oracle's fixed `iters` rounds. The check is a filter over the
    // already-localCheckpointed (id, old, r) frame (same trick as
    // [[connectedComponents]]), not an extra join.
    var round = 0
    var fixedPoint = false
    while (round < iters && !fixedPoint) {
      // rank parked on sinks this round (nodes with no out-edge);
      // sum fits a long: Σr ≤ Scale = 10¹²
      val dangling = broadcast(ranks
        .join(deg.withColumnRenamed("src", "id"), Seq("id"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0L)).as("dm")))
      val inflow = edges
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("id"), expr("r div deg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("inflow"))
      // `ranks` carries exactly the node set, so it doubles as the node
      // spine — the previous rank rides along as `old` with no extra join
      ranks = ranks.select(col("id"), col("r").as("old"))
        .crossJoin(nTotal).crossJoin(dangling)
        .join(inflow, Seq("id"), "left")
        .select(col("id"), col("old"),
          (expr(s"(15 * (${Scale}L div n)) div 100") +
            expr("(85 * (coalesce(inflow, 0L) + dm div n)) div 100")).as("r"))
        .localCheckpoint()
      round += 1
      if (round < iters) { // last round's check would be pure cost
        fixedPoint = ranks.filter(col("r") =!= col("old")).isEmpty
        if (sys.env.contains("GRAFT_CC_LOG"))
          println(s"[graft.pr] round $round fixedPoint=$fixedPoint")
      }
    }
    edges.unpersist()
    deg.unpersist()
    ranks.select(col("id"), col("r").as("rank_scaled"))
  }

  /** (id, cluster_id, cluster_size, is_canonical) from a components
    * labeling — the presentation both near-dup cluster queries share.
    * `idName` renames the generic vertex column for the caller. */
  def clusterSummary(labels: DataFrame, idName: String): DataFrame = {
    val sizes = labels.groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    labels.select(col("id").as(idName), col("label").as("cluster_id"))
      .join(sizes, Seq("cluster_id"))
      .select(col(idName), col("cluster_id"), col("cluster_size"),
        (col(idName) === col("cluster_id")).as("is_canonical"))
  }
}
