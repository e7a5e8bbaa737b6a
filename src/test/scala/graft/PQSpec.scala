package graft

import graft.ext.EmbedOps

/** Product-quantization top-k: exact parity with a driver-side
  * reference of the same integer arithmetic, code-table shape, and the
  * broadcast-only join plan. */
class PQSpec extends SparkSpec {

  private def emb(rows: (Long, Array[Float])*) = {
    import spark.implicits._
    rows.map { case (id, v) => (id, v, 0) }.toDF("vec_id", "embedding", "label")
  }

  /** Driver-side PQ: quantize, slice, per-subspace seeds = lowest ksub
    * vec_ids, one Lloyd round (floor-div update), encode, ADC top-k. */
  private def referencePq(vecs: Seq[(Long, Array[Float])], m: Int, dsub: Int,
      ksub: Int, k: Int): Set[(Long, Int, Long, Long)] = {
    val q = vecs.map { case (id, v) =>
      id -> v.map(x => math.round(x.toDouble * 1000)) }.toMap
    val subs = q.flatMap { case (id, v) =>
      (0 until m).map(s => (id, s) -> v.slice(s * dsub, s * dsub + dsub)) }
    val seedIds = vecs.map(_._1).sorted.take(ksub)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, c) => (x - c) * (x - c) }.sum
    def nearest(cents: Map[(Int, Long), Array[Long]], s: Int, v: Array[Long]): Long =
      seedIds.map(cid => (cid, d2(v, cents((s, cid)))))
        .minBy { case (c, dd) => (dd, c) }._1
    var cents = (for (s <- 0 until m; cid <- seedIds)
      yield (s, cid) -> subs((cid, s))).toMap
    val a0 = subs.map { case ((id, s), v) => (id, s) -> nearest(cents, s, v) }
    cents = cents.map { case ((s, cid), old) =>
      val members = a0.collect {
        case ((id, ss), c) if ss == s && c == cid => subs((id, s)) }.toSeq
      if (members.isEmpty) (s, cid) -> old
      else (s, cid) -> old.indices.map { i =>
        val sum = members.map(_(i)).sum
        val n = members.size.toLong
        (sum - (((sum % n) + n) % n)) / n
      }.toArray
    }
    val codes = subs.map { case ((id, s), v) => (id, s) -> nearest(cents, s, v) }
    vecs.map(_._1).filter(_ % 97 == 0).flatMap { qid =>
      vecs.map(_._1).filter(_ != qid).map { vid =>
        vid -> (0 until m).map(s =>
          d2(subs((qid, s)), cents((s, codes((vid, s)))))).sum
      }.sortBy { case (vid, ad) => (ad, vid) }.take(k)
        .zipWithIndex.map { case ((vid, ad), r) => (qid, r + 1, vid, ad) }
    }.toSet
  }

  test("distributed PQ matches the driver-side reference exactly") {
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 40L).map { id =>
      val center = (id % 4).toInt
      id -> Array.tabulate(4)(d =>
        (if (d == center) 1.0f else 0.0f) + rnd.nextFloat() * 0.3f - 0.15f)
    }
    val want = referencePq(vecs, m = 2, dsub = 2, ksub = 4, k = 3)
    val got = EmbedOps.pqTopK(emb(vecs: _*), m = 2, dsub = 2, ksub = 4, k = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("adist"))).toSet
    assert(got == want)
  }

  test("ADC ranks a same-cluster vector first for a clustered query") {
    // query 0 sits in a tight cluster with 1 and 2; 3..6 are far away
    val out = EmbedOps.pqTopK(emb(
      0L -> Array(1.0f, 1.0f, 0.0f, 0.0f), 1L -> Array(0.98f, 1.01f, 0.0f, 0.0f),
      2L -> Array(1.02f, 0.99f, 0.0f, 0.0f), 3L -> Array(-1.0f, -1.0f, 5.0f, 5.0f),
      4L -> Array(-1.1f, -0.9f, 5.0f, 5.0f), 5L -> Array(-0.9f, -1.0f, 5.1f, 4.9f),
      6L -> Array(-1.0f, -1.1f, 4.9f, 5.1f)),
      m = 2, dsub = 2, ksub = 2, k = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id")))
    val top1 = out.find(t => t._1 == 0L && t._2 == 1).map(_._3)
    assert(top1.exists(Set(1L, 2L)), s"top1 was $top1")
  }

  test("IVF-PQ at nprobe=1 searches only the single nearest coarse list") {
    import spark.implicits._
    // label 0 holds the query plus a near (1) and a far (2) vector, but
    // vector 2 drags label 0's coarse centroid far from the query;
    // label 1's centroid sits next to it. The nearest-list probe must
    // pick label 1 — geometry, not the query's own tag, decides — so
    // ONLY neighbor 3 appears.
    val emb = Seq(
      (0L, Array(1.0f, 1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.9f, 1.1f, 0.0f, 0.0f), 0),
      (2L, Array(-5.0f, 3.0f, 2.0f, 2.0f), 0),
      (3L, Array(1.0f, 1.0f, 0.01f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = EmbedOps.ivfPqTopK(emb, m = 2, dsub = 2, ksub = 2, k = 3, nprobe = 1)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("label"),
        r.getAs[Long]("neighbor_id")))
    assert(out.map(_._3).toSet == Set(3L), s"expected only the probed list's vector: ${out.toSeq}")
    assert(out.forall(_._2 == 1))
  }

  test("nprobe=2 recovers boundary-query neighbors nprobe=1 misses; coverage is monotone") {
    import spark.implicits._
    // Four well-separated 64-dim clusters, one per 16-dim block. The
    // query (id 0) sits between clusters A and B, slightly nearer A;
    // A has only 3 members, so the exact top-5 must take 2 from B.
    // nprobe=1 probes A alone → at most 3 hits; nprobe=2 adds B.
    // Per-member offsets grow with vec_id and bleed into a block
    // ORTHOGONAL to the query (never along the cluster direction, which
    // cosine cannot see): they raise the norm without touching the dot,
    // so the exact-cosine ordering, the L2/ADC ordering, and the id
    // tie-break all agree on which members are nearest.
    def vec(block: Int, bleedBlock: Int, off: Float): Array[Float] =
      Array.tabulate(64)(d =>
        if (d / 16 == block) 1.0f else if (d / 16 == bleedBlock) off else 0.0f)
    val query = (0L,
      Array.tabulate(64)(d =>
        if (d < 16) 0.55f else if (d < 32) 0.5f else 0.0f), "A")
    val a = (1 to 3).map(i => (i.toLong, vec(0, 3, 0.001f * i), "A"))
    val b = (4 to 23).map(i => (i.toLong, vec(1, 2, 0.001f * (i - 4)), "B"))
    val c = (24 to 43).map(i => (i.toLong, vec(2, 1, 0.001f * (i - 24)), "C"))
    val d = (44 to 63).map(i => (i.toLong, vec(3, 0, 0.001f * (i - 44)), "D"))
    val emb = (query +: (a ++ b ++ c ++ d)).toDF("vec_id", "embedding", "label")
    val row = EmbedOps.ivfPqRecallCompare(emb, k = 5).collect()
    assert(row.length == 1) // only id 0 is ≡ 0 (mod 97)
    val r = row.head
    val (h1, h2) = (r.getAs[Long]("hits_nprobe1"), r.getAs[Long]("hits_nprobe2"))
    val (c1, c2) = (r.getAs[Long]("covered_nprobe1"), r.getAs[Long]("covered_nprobe2"))
    assert(c1 == 3, s"nprobe=1 coverage: A's 3 members only, got $c1")
    assert(c2 == 5, s"nprobe=2 coverage: all exact top-5, got $c2")
    assert(h2 > h1, s"recall gain expected: hits1=$h1 hits2=$h2")
    assert(c2 >= c1)
  }

  test("IVF-PQ equals plain PQ when every vector shares one label") {
    val rnd = new scala.util.Random(13)
    val vecs = (0L until 30L).map(id =>
      id -> Array.fill(4)(rnd.nextFloat() * 2f - 1f))
    val pq = EmbedOps.pqTopK(emb(vecs: _*), m = 2, dsub = 2, ksub = 4, k = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("adist"))).toSet
    val ivfpq = EmbedOps.ivfPqTopK(emb(vecs: _*), m = 2, dsub = 2, ksub = 4, k = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("adist"))).toSet
    assert(ivfpq == pq)
  }

  test("pqRecall is bounded, total over queries, and deterministic") {
    val rnd = new scala.util.Random(17)
    val vecs = (0L until 40L).map(id =>
      id -> Array.fill(4)(rnd.nextFloat() * 2f - 1f))
    def run() = EmbedOps.pqRecall(emb(vecs: _*), k = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("n_hits"),
        r.getAs[Double]("recall"))).toSet
    val got = run()
    assert(got.map(_._1) == Set(0L))               // one query (0 % 97 == 0)
    assert(got.forall { case (_, h, r) =>
      h >= 0 && h <= 3 && r >= 0.0 && r <= 1.0 && r == h / 3.0 })
    assert(run() == got)
  }

  test("one trained PqModel feeds PQ, IVF-PQ, and recall with results identical to per-call training") {
    val rnd = new scala.util.Random(19)
    val vecs = (0L until 30L).map(id =>
      id -> Array.fill(4)(rnd.nextFloat() * 2f - 1f))
    val frame = emb(vecs: _*)
    val model = EmbedOps.trainPq(frame, m = 2, dsub = 2, ksub = 4)
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    // the shared-codebook search path is value-identical to training
    // inside each call (same seeds, same Lloyd round → same codes)
    assert(rows(EmbedOps.pqTopKFrom(model, k = 3)) ==
      rows(EmbedOps.pqTopK(frame, m = 2, dsub = 2, ksub = 4, k = 3)))
    assert(rows(EmbedOps.ivfPqTopKFrom(frame, model, k = 3, nprobe = 2)) ==
      rows(EmbedOps.ivfPqTopK(frame, m = 2, dsub = 2, ksub = 4, k = 3, nprobe = 2)))
    // the codes frame itself is the shared artifact: both searches above
    // consumed model.codes, so it must equal a fresh train's encoding
    assert(rows(model.codes) ==
      rows(EmbedOps.trainPq(frame, m = 2, dsub = 2, ksub = 4).codes))
    // recall over a shared exact baseline + shared model (default
    // config, as pqRecall trains internally) matches the convenience form
    val exact = EmbedOps.bruteForceTopK(frame, k = 3)
    val defModel = EmbedOps.trainPq(frame)
    assert(rows(EmbedOps.pqRecallFrom(exact, EmbedOps.pqTopKFrom(defModel, k = 3), 3)) ==
      rows(EmbedOps.pqRecall(frame, k = 3)))
  }

  test("prefix rerank equals brute force once candidates cover; the cut is the recall knob") {
    // 32-dim: dims 0..15 are the prefix block, 16..31 the tail block.
    def v(kv: (Int, Float)*): Array[Float] = {
      val a = Array.fill(32)(0.0f); kv.foreach { case (i, x) => a(i) = x }; a
    }
    val vecs = Seq(
      0L -> v(0 -> 1f, 16 -> 1f),   // query (0 % 97 == 0)
      1L -> v(0 -> 1f, 16 -> 1f),   // identical: full cos 1, prefix cos 1
      2L -> v(0 -> 1f, 17 -> 1f),   // prefix-perfect, tail-wrong: full cos 0.5
      3L -> v(1 -> 1f, 16 -> 2f),   // prefix-blind, tail-right: full cos ~0.63
      4L -> v(1 -> 1f, 17 -> 1f))   // unrelated
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"))).toSet
    val brute = ids(EmbedOps.bruteForceTopK(emb(vecs: _*), k = 2))
    // candidates=4 covers every non-query vector → exact
    assert(ids(EmbedOps.prefixRerankTopK(emb(vecs: _*), 16, 4, 2)) == brute)
    // candidates=2 cuts id 3 (prefix cosine 0) before rerank can see its
    // tail — the deliberate recall/cost trade, like nprobe
    val cut = ids(EmbedOps.prefixRerankTopK(emb(vecs: _*), 16, 2, 2))
    assert(cut != brute && cut.map(_._3) == Set(1L, 2L))
    assert(brute.map(_._3) == Set(1L, 3L))
    // stage-1 rank<=C must group-limit before the exchange
    assert(EmbedOps.prefixRerankTopK(emb(vecs: _*), 16, 2, 2)
      .queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("PQ plan is broadcast-only: no shuffle join, no cartesian product") {
    val plan = EmbedOps.pqTopK(emb(
      0L -> Array(1.0f, 0.0f), 1L -> Array(0.0f, 1.0f), 2L -> Array(1.0f, 1.0f)),
      m = 1, dsub = 2, ksub = 2, k = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("BroadcastHashJoin"))
  }
}
