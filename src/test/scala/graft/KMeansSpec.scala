package graft

import graft.ext.EmbedOps

/** Behavior tests of the distributed Lloyd's k-means:
  * cluster recovery, exact parity with a driver-side reference
  * implementation of the same integer arithmetic, empty-cluster
  * survival, and the broadcast plan shape. */
class KMeansSpec extends SparkSpec {

  private def emb(rows: (Long, Array[Float])*) = {
    import spark.implicits._
    rows.map { case (id, v) => (id, v, 0) }.toDF("vec_id", "embedding", "label")
  }

  /** The hash-spread seed order of ids 1..6 is [2, 4, 1, 6, 3, 5]
    * (same formula as EmbedOps.seedSpread — asserted below), so k=2
    * seeds are {2, 4}. */
  private def spreadMix(v: Long): Long = {
    val h = ((v % 4194304 + 99991) * 2654435761L) % 4294967296L
    h ^ (h / 65536)
  }

  test("well-separated groups land on separate centroids") {
    // Two tight groups placed so the k=2 spread seeds {2, 4} start one
    // in each: group + = {1, 2, 5}, group − = {3, 4, 6}.
    assert(Seq(1L, 2L, 3L, 4L, 5L, 6L).sortBy(id => (spreadMix(id), id))
      .take(2).toSet == Set(2L, 4L))
    val out = EmbedOps.kmeansAssignments(emb(
      1L -> Array(1.0f, 1.0f, 0.0f), 2L -> Array(0.9f, 1.1f, 0.0f),
      3L -> Array(-1.0f, -1.0f, 0.0f), 4L -> Array(-1.1f, -0.9f, 0.0f),
      5L -> Array(1.1f, 0.9f, 0.1f), 6L -> Array(-0.9f, -1.1f, -0.1f)),
      k = 2, iters = 2)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("centroid_id")).toMap
    assert(out(1L) == out(2L) && out(2L) == out(5L))
    assert(out(3L) == out(4L) && out(4L) == out(6L))
    assert(out(1L) != out(3L))
  }

  test("hash-spread seeds recover clusters on id-sorted (content-correlated) data where first-k seeds collapse") {
    // Appended-shard regime: ids 0..9 are one content region, 10..19
    // another. First-k-by-id seeding would put BOTH k=2 seeds in the
    // first region (ids 0 and 1); the spread order's first two ids are
    // {10, 2} — one per region — so Lloyd starts non-degenerate and
    // recovers the true clustering.
    val order = (0L until 20L).sortBy(id => (spreadMix(id), id))
    assert(order.take(2).toSet == Set(10L, 2L), s"seed order changed: $order")
    val vecs = (0L until 20L).map { id =>
      val c = if (id < 10) 0.0f else 100.0f
      id -> Array(c + (id % 10) * 0.01f, c, 0.0f)
    }
    val out = EmbedOps.kmeansAssignments(emb(vecs: _*), k = 2, iters = 2)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("centroid_id")).toMap
    val regionA = (0L until 10L).map(out).toSet
    val regionB = (10L until 20L).map(out).toSet
    assert(regionA.size == 1 && regionB.size == 1 && regionA != regionB,
      s"clusters must match content regions, got $out")
  }

  /** Driver-side reference: the same quantize / integer-L2 / floor-div
    * Lloyd rounds, written imperatively. */
  private def referenceKmeans(
      vecs: Seq[(Long, Array[Float])], k: Int, iters: Int): Map[Long, (Long, Long)] = {
    val q = vecs.map { case (id, v) =>
      id -> v.map(x => math.round(x.toDouble * 1000)) }.toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, c) => (x - c) * (x - c) }.sum
    def assign(cents: Seq[(Long, Array[Long])]): Map[Long, (Long, Long)] =
      q.map { case (id, v) =>
        val (cid, dd) = cents.map { case (c, cv) => (c, d2(v, cv)) }
          .minBy { case (c, dist) => (dist, c) }
        id -> (cid, dd)
      }
    var cents = vecs.map(_._1).sortBy(id => (spreadMix(id), id)).take(k)
      .map(id => id -> q(id))
    for (_ <- 1 to iters) {
      val a = assign(cents)
      cents = cents.map { case (cid, old) =>
        val members = a.collect { case (id, (c, _)) if c == cid => q(id) }.toSeq
        if (members.isEmpty) cid -> old
        else cid -> old.indices.map { i =>
          val s = members.map(_(i)).sum
          val n = members.size.toLong
          (s - (((s % n) + n) % n)) / n
        }.toArray
      }
    }
    assign(cents)
  }

  test("distributed fit matches the driver-side reference exactly") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L).map { id =>
      val center = if (id % 3 == 0) 1.0f else if (id % 3 == 1) -1.0f else 0.0f
      id -> Array.fill(4)(center + rnd.nextFloat() * 0.4f - 0.2f)
    }
    val expected = referenceKmeans(vecs, k = 3, iters = 2)
    val got = EmbedOps.kmeansAssignments(emb(vecs: _*), k = 3, iters = 2)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("centroid_id"), r.getAs[Long]("d2"))).toMap
    assert(got == expected)
  }

  test("an emptied cluster keeps its previous centroid and every vector stays assigned") {
    // Seeds 1,2,3; all points hug (1,1) so clusters 2/3 drain after one
    // update — the fit must not divide by zero and must stay total.
    val out = EmbedOps.kmeansAssignments(emb(
      1L -> Array(1.0f, 1.0f), 2L -> Array(0.98f, 1.02f), 3L -> Array(1.02f, 0.98f),
      4L -> Array(0.99f, 1.01f), 5L -> Array(1.01f, 0.99f)),
      k = 3, iters = 2).collect()
    assert(out.length == 5)
    assert(out.map(_.getAs[Long]("vec_id")).toSet == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("embedding cosine threshold is session-conf tunable (spark.graft.embed.*)") {
    val frame = emb(
      1L -> Array(1.0f, 1.0f, 0.0f, 0.0f),
      2L -> Array(0.99f, 1.01f, 0.0f, 0.0f),
      3L -> Array(-1.0f, 1.0f, 0.0f, 0.0f))
    // default 0.35: 1 and 2 cluster together
    val before = EmbedOps.nearDupClusters(frame)
      .filter(org.apache.spark.sql.functions.col("vec_id") === 2L)
      .head.getAs[Long]("cluster_id")
    assert(before == 1L)
    // impossible threshold: everything is a singleton
    spark.conf.set(GraftConf.CosineThresholdKey, "1.1")
    try {
      val after = EmbedOps.nearDupClusters(frame)
        .filter(org.apache.spark.sql.functions.col("vec_id") === 2L)
        .head.getAs[Long]("cluster_id")
      assert(after == 2L)
    } finally spark.conf.unset(GraftConf.CosineThresholdKey)
  }

  test("balanced sample caps dense clusters, keeps sparse ones whole, group-limits before the exchange") {
    // Dense region: ids 0..11; sparse region: ids 21..23 — chosen so the
    // k=2 spread seeds {10, 23} start one per region (asserted).
    val ids = (0L until 12L) ++ (21L until 24L)
    assert(ids.sortBy(id => (spreadMix(id), id)).take(2).toSet == Set(10L, 23L))
    val vecs = ids.map { id =>
      val c = if (id < 12) 1.0f else -50.0f
      id -> Array(c + (id % 4) * 0.01f, c, 0.0f)
    }
    val df = EmbedOps.balancedSample(emb(vecs: _*), k = 2, iters = 2, perCluster = 5)
    // the rank<=n filter must rewrite to a partial group-limit BEFORE
    // the window exchange — the shape that bounds the shuffle at k*n
    // rows per map task on a 100-TB corpus
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
    val rows = df.collect()
    val byCluster = rows.groupBy(_.getAs[Long]("centroid_id")).view.mapValues(_.length).toMap
    // dense cluster capped at 5, sparse cluster (3 members) survives whole
    assert(byCluster.values.toSeq.sorted == Seq(3, 5), s"got $byCluster")
    // key-pure pick: a second run returns the identical sample
    val again = EmbedOps.balancedSample(emb(vecs: _*), k = 2, iters = 2, perCluster = 5)
      .collect().map(r => (r.getAs[Long]("centroid_id"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("rk"))).toSet
    assert(again == rows.map(r => (r.getAs[Long]("centroid_id"),
      r.getAs[Long]("vec_id"), r.getAs[Long]("rk"))).toSet)
  }

  test("assignment plan broadcasts the centroids and argmins via aggregate, not a window sort") {
    val plan = EmbedOps.kmeansAssignments(emb(
      1L -> Array(1.0f, 0.0f), 2L -> Array(0.0f, 1.0f)), k = 2, iters = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("Window"))
  }

  test("lsh signature width: ceil(log2 n) + 2 clamped to [12, 24]") {
    // fixed-width signatures make bucket-collision candidates quadratic
    // in corpus size (pairs ~ n^2 / 2^bits); sizing bits ~ log2(n) at
    // index build keeps expected random collisions O(1) per vector —
    // the 10x scale rehearsal measured 96x candidate growth before
    // this policy. The +2 margin (4x bucket headroom) covers clustered
    // corpora colliding above the random-pair rate: at exact
    // ceil(log2 n) the r12 probe still measured 15.9x candidate growth
    // for 10x data; with the margin it is back under ~10x.
    assert(EmbedOps.adaptivePlanes(0) == 12)
    assert(EmbedOps.adaptivePlanes(200) == 12)   // driver's sf0.01 scale
    assert(EmbedOps.adaptivePlanes(2000) == 13)  // sf0.1: 11 + 2
    assert(EmbedOps.adaptivePlanes(1024) == 12)  // exact power boundary
    assert(EmbedOps.adaptivePlanes(1025) == 13)
    assert(EmbedOps.adaptivePlanes(20000) == 17) // the 10x rehearsal corpus
    assert(EmbedOps.adaptivePlanes(1L << 40) == 24) // capped: banded/IVF territory
  }

  test("semDedupFrom: within-cluster groups, keep the member farthest from its centroid") {
    import spark.implicits._
    // hand-written geometry: {1,2,3} near-parallel (one semantic
    // group), {4,5} parallel (second group), 6 orthogonal (singleton)
    val docs = emb(
      1L -> Array(1f, 0f, 0f, 0f),
      2L -> Array(0.999f, 0.01f, 0f, 0f),
      3L -> Array(0.9f, 0.1f, 0f, 0f),
      4L -> Array(0f, 1f, 0f, 0f),
      5L -> Array(0f, 0.95f, 0f, 0f),
      6L -> Array(0f, 0f, 0f, 1f))
    // hand-written assignments pin the blocking and the keep rule:
    // cluster 1 = {1,2,3} with d2 5/3/9, cluster 2 = {4,5} tied at 4,
    // cluster 3 = {6}
    val asg = Seq((1L, 1L, 5L), (2L, 1L, 3L), (3L, 1L, 9L),
      (4L, 2L, 4L), (5L, 2L, 4L), (6L, 3L, 0L))
      .toDF("vec_id", "centroid_id", "d2")
    val got = EmbedOps.semDedupFrom(docs, asg, 0.35).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("group_id"), r.getAs[Long]("group_size"),
          r.getAs[Boolean]("keep")))).toMap
    assert(got(1L) == ((1L, 3L, false)))
    assert(got(2L) == ((1L, 3L, false)))
    assert(got(3L) == ((1L, 3L, true)))   // farthest from centroid (d2 9)
    assert(got(4L) == ((4L, 2L, true)))   // d2 tie → min vec_id keeps
    assert(got(5L) == ((4L, 2L, false)))
    assert(got(6L) == ((6L, 1L, true)))   // singleton always keeps
  }

  test("degenerate-k guard: past the edge bound the distributed CC takes over with identical labels") {
    import spark.implicits._
    // the r17 ADVICE hole: the per-cluster union-find concentrates one
    // cluster's vertex map in a single task — bounded only when the
    // caller used scaledK; semDedupFrom's demo default (k=8) and the
    // TVF (k=1) permit ~N/k vertices in one task. The guard falls back
    // to Graph.connectedComponents past the bound; labels must be
    // IDENTICAL on both paths (union-by-min-id == min-label CC), so
    // the fallback changes cost, never answers.
    val docs = emb(
      1L -> Array(1f, 0f, 0f, 0f),
      2L -> Array(0.999f, 0.01f, 0f, 0f),
      3L -> Array(0.9f, 0.1f, 0f, 0f),
      4L -> Array(0f, 1f, 0f, 0f),
      5L -> Array(0f, 0.95f, 0f, 0f),
      6L -> Array(0f, 0f, 0f, 1f))
    val asg = Seq((1L, 1L, 5L), (2L, 1L, 3L), (3L, 1L, 9L),
      (4L, 2L, 4L), (5L, 2L, 4L), (6L, 3L, 0L))
      .toDF("vec_id", "centroid_id", "d2")
    def labelsAt(bound: Long) = {
      val (labeled, pairs) =
        EmbedOps.semDedupLabeled(docs, asg, 0.35, ufBound = bound)
      val out = labeled.collect().map(r =>
        r.getAs[Long]("vec_id") -> r.getAs[Long]("group_id")).toMap
      pairs.unpersist()
      out
    }
    val viaUnionFind = labelsAt(EmbedOps.DegenerateClusterVertexBound)
    val viaFallback = labelsAt(0L) // every cluster trips the guard
    assert(viaUnionFind == viaFallback && viaUnionFind.size == 6)
    // and the labels are the component minima either way
    assert(viaUnionFind(1L) == 1L && viaUnionFind(3L) == 1L &&
      viaUnionFind(4L) == 4L && viaUnionFind(6L) == 6L)
  }

  test("scaledK: fixed expected block size, floor 8, broadcast-bounded cap") {
    import graft.ext.EmbedOps.scaledK
    // ≤ 8·1024 vectors stay on the historical 8-cluster geometry —
    // the gate/bench corpora (500/2000 vectors) are bit-identical to
    // the pre-scaling engine
    assert(scaledK(500) == 8 && scaledK(2000) == 8 && scaledK(8192) == 8)
    // past the floor, k tracks ceil(N / targetBlock): the semdedup
    // pair join saturates at N·targetBlock/2 instead of N²/8
    assert(scaledK(8193) == 9)
    assert(scaledK(1048576) == 1024)
    assert(scaledK(60000) == 59)
    assert(scaledK(60000, targetBlock = 512) == 118)
    // the 2²⁰ cap bounds the broadcast centroid frame
    assert(scaledK(Long.MaxValue) == (1 << 20))
  }

  test("gate fixtures sit below the scaledK floor the k=8 oracle literals assume") {
    // shKmeans trains at scaledK(N) while embedKmeans / embedSemdedup
    // / embedSemdedupCosine / embedBalancedSample / sql_semdedup all
    // hard-code LIMIT 8 — they coincide only while every gate corpus
    // stays at or under 8 * 1024 vectors. If a fixture ever grows past
    // the floor, this breaks FIRST and names the remedy.
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val n = spark.read
        .parquet(s"/root/testdata/sf$sf/embeddings.parquet").count()
      assert(n <= 8192,
        s"sf$sf holds $n embeddings: scaledK(n) > 8 diverges from " +
          "every k=8-literal oracle — re-derive them at scaledK(n)")
    }
  }

  test("cosine keep rule diverges from d2 where norms vary, as the docstring warns") {
    import spark.implicits._
    // centroid at (10, 0); A = (30, 0) points AT it (cosine 1.0) but
    // far in L2 (d2 4e8); B = (8, 6) is L2-close (4e7) but angularly
    // off (cosine 0.8). d2-keep picks A; the paper's cosine rule
    // picks B. cos(A, B) = 0.8 ≥ the default threshold → one group.
    val emb = Seq(
      (1L, Array(30.0f, 0.0f)),
      (2L, Array(8.0f, 6.0f)),
      (3L, Array(0.0f, -5.0f))).toDF("vec_id", "embedding")
    val asg = Seq(
      (1L, 100L, 400000000L), (2L, 100L, 40000000L), (3L, 200L, 0L))
      .toDF("vec_id", "centroid_id", "d2")
    val cents = Seq(
      (100L, Seq(10000L, 0L)), (200L, Seq(0L, -5000L)))
      .toDF("centroid_id", "cv")
    def keeps(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.filter("keep").select("vec_id").as[Long].collect().toSet
    val byD2 = graft.ext.EmbedOps.semDedupFrom(emb, asg)
    val byCos = graft.ext.EmbedOps.semDedupByCosineFrom(emb, asg, cents)
    assert(keeps(byD2) == Set(1L, 3L))   // farthest-in-L2 keeps A
    assert(keeps(byCos) == Set(2L, 3L))  // least-centroid-cosine keeps B
    // identical groups either way — only the keeper moves
    def groups(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "group_id").as[(Long, Long)].collect().toSet
    assert(groups(byD2) == groups(byCos))
    val cos = byCos.filter("vec_id = 2")
      .select("centroid_cosine").as[Double].head()
    assert(math.abs(cos - 0.8) < 1e-12, cos)
  }

  test("sampled fit: centroids come from the bounded md5-ordered sample, assignment covers the corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val emb = (0 until 40).map { i =>
      val base = if (i % 2 == 0) Array(10.0f, 0.0f) else Array(0.0f, -10.0f)
      (i.toLong, base.map(_ + i * 0.01f))
    }.toDF("vec_id", "embedding")
    // the sampled trainer == the full trainer run on exactly the
    // md5-ordered cap-sized subset (sampling composes, it doesn't
    // change the fit machinery)
    val hk = conv(substring(
      md5(col("vec_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("bigint")
    val sample = emb.orderBy(hk, col("vec_id")).limit(16)
    val viaSampled = graft.ext.EmbedOps
      .kmeansCentroidsSampled(emb, sampleCap = 16, k = 4, iters = 2)
      .collect().map(_.toSeq).toSet
    val viaDirect = graft.ext.EmbedOps.kmeansCentroids(sample, k = 4, iters = 2)
      .collect().map(_.toSeq).toSet
    assert(viaSampled == viaDirect && viaSampled.size == 4)
    // every corpus vector gets an assignment, sampled or not
    val asg = graft.ext.EmbedOps.assignAgainst(emb,
      graft.ext.EmbedOps.kmeansCentroidsSampled(emb, 16, 4, 2))
    assert(asg.count() == 40L)
    assert(asg.select("vec_id").distinct().count() == 40L)
  }
}
