package graft

import scala.util.Random

import graft.ext.Graph

/** Property harness for the graph family — LPA, k-core, triangle
  * stats, and integer-exact PageRank checked against independent
  * plain-Scala references on seeded random graphs (the
  * BpePropertySpec / AsOfPropertySpec discipline: the distributed
  * implementation and a single-JVM reference must agree bit-for-bit
  * on every seed). connectedComponents already has its union-find
  * twin in PropertySpec.
  *
  * Each reference replicates the documented CONTRACT, not the plan:
  * LPA is exactly `rounds` synchronous plurality updates with the
  * (count DESC, label ASC) tie-break; k-core is `rounds` peels of
  * degree-< k vertices over the symmetrized edge bag; triangles use
  * direct closed-triple enumeration (the engine's degree-ordered
  * orientation must agree with brute force); PageRank replays the
  * scaled-integer recurrence digit for digit, dangling mass included. */
class GraphPropertySpec extends SparkSpec {

  /** Seeded random graph: unique canonical pairs (a < b) over n
    * vertices, leaving some isolated (they exercise the carry paths). */
  private def randomPairs(seed: Long, n: Int, m: Int): Seq[(Long, Long)] = {
    val r = new Random(seed)
    Iterator.continually {
      val a = r.nextInt(n); val b = r.nextInt(n)
      (math.min(a, b).toLong, math.max(a, b).toLong)
    }.filter { case (a, b) => a != b }.distinct.take(m).toSeq
  }

  private def adj(pairs: Seq[(Long, Long)]): Map[Long, Seq[Long]] =
    (pairs ++ pairs.map { case (a, b) => (b, a) })
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap

  // ---- references ------------------------------------------------------

  private def refLpa(n: Int, pairs: Seq[(Long, Long)],
      rounds: Int): Map[Long, Long] = {
    val nb = adj(pairs)
    var labels = (0L until n.toLong).map(i => i -> i).toMap
    for (_ <- 1 to rounds) {
      labels = labels.map { case (v, l) =>
        nb.get(v) match {
          case Some(ns) =>
            val counts = ns.map(labels).groupBy(identity)
              .view.mapValues(_.size.toLong).toSeq
            v -> counts.minBy { case (lab, c) => (-c, lab) }._1
          case None => v -> l
        }
      }
    }
    labels
  }

  private def refKCore(pairs: Seq[(Long, Long)], k: Int,
      rounds: Int): Map[Long, Long] = {
    var e = pairs ++ pairs.map { case (a, b) => (b, a) }
    for (_ <- 1 to rounds) {
      val deg = e.groupBy(_._1).view.mapValues(_.size).toMap
      val surv = deg.filter(_._2 >= k).keySet
      e = e.filter { case (a, b) => surv(a) && surv(b) }
    }
    e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
  }

  private def refTriangles(pairs: Seq[(Long, Long)])
      : (Long, Long, Long, Long, Double) = {
    val nb = adj(pairs).view.mapValues(_.toSet).toMap
    val verts = nb.keySet.toSeq.sorted
    val deg = nb.view.mapValues(_.size.toLong).toMap
    val wedges = deg.values.map(d => d * (d - 1) / 2).sum
    var tri = 0L
    for (a <- verts; b <- nb(a) if b > a; c <- nb(a) if c > b
         if nb(b)(c)) tri += 1
    val cc = if (wedges > 0) 3.0 * tri / wedges else 0.0
    (verts.size.toLong, pairs.size.toLong, wedges, tri, cc)
  }

  /** The scaled-integer PageRank recurrence over the SYMMETRIZED graph
    * (what Graph.pageRank runs), dangling mass from the previous
    * round's frame, truncating division throughout. */
  private def refPageRank(n: Int, pairs: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] = {
    val Scale = 1000000000000L
    val nb = adj(pairs)
    val deg = nb.view.mapValues(_.size.toLong).toMap
    val r0 = Scale / n
    val base = (15L * r0) / 100L
    var ranks = (0L until n.toLong).map(i => i -> r0).toMap
    var dm = ranks.collect { case (v, r) if !deg.contains(v) => r }.sum
    for (_ <- 1 to iters) {
      val inflow = scala.collection.mutable.Map.empty[Long, Long]
      for ((v, r) <- ranks; d <- deg.get(v); u <- nb(v))
        inflow(u) = inflow.getOrElse(u, 0L) + r / d
      val share = dm / n
      ranks = ranks.map { case (v, _) =>
        v -> (base + (85L * (inflow.getOrElse(v, 0L) + share)) / 100L)
      }
      dm = ranks.collect { case (v, r) if !deg.contains(v) => r }.sum
    }
    ranks
  }

  // ---- properties ------------------------------------------------------

  test("6 seeded graphs: LPA equals the synchronous plurality reference") {
    import spark.implicits._
    for (seed <- 1L to 6L) {
      val n = 60
      val pairs = randomPairs(seed * 104729L, n, 80)
      val rounds = if (seed % 2 == 0L) 4 else 3
      val expect = refLpa(n, pairs, rounds)
      val expectSizes = expect.values.groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val got = Graph.labelPropagation(
          (0L until n.toLong).toDF("id"),
          pairs.toDF("doc_a", "doc_b"), rounds)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.length == n, s"seed=$seed row count")
      got.foreach { case (v, lab, sz) =>
        assert(lab == expect(v) && sz == expectSizes(lab),
          s"seed=$seed vertex=$v: got ($lab, $sz), " +
            s"ref (${expect(v)}, ${expectSizes(expect(v))})")
      }
    }
  }

  test("6 seeded graphs: k-core peeling equals the reference for k=2 and k=3") {
    import spark.implicits._
    for (seed <- 1L to 6L; k <- Seq(2, 3)) {
      val pairs = randomPairs(seed * 15485863L, 50, 70)
      val expect = refKCore(pairs, k, rounds = 3)
      val got = Graph.kCore(pairs.toDF("doc_a", "doc_b"), k, rounds = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"seed=$seed k=$k")
    }
  }

  test("6 seeded graphs: degree-ordered triangle counting equals brute-force enumeration") {
    import spark.implicits._
    for (seed <- 1L to 6L) {
      val pairs = randomPairs(seed * 32452843L, 40, 90)
      val (nv, ne, nw, nt, cc) = refTriangles(pairs)
      val r = Graph.triangleStats(pairs.toDF("doc_a", "doc_b")).head
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)) == ((nv, ne, nw, nt, cc)), s"seed=$seed: got $r")
    }
  }

  test("6 seeded graphs: integer PageRank replays the scaled recurrence digit for digit") {
    import spark.implicits._
    for (seed <- 1L to 6L) {
      val n = 50
      // sparse enough that some vertices stay isolated → dangling mass
      val pairs = randomPairs(seed * 49979687L, n, 35)
      val expect = refPageRank(n, pairs, iters = 3)
      val got = Graph.pageRank(
          (0L until n.toLong).toDF("id"),
          pairs.toDF("doc_a", "doc_b"), iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"seed=$seed")
      assert(pairs.map { case (a, b) => Set(a, b) }.flatten.toSet.size < n,
        s"seed=$seed: no isolated vertices — dangling path untested")
    }
  }
}
