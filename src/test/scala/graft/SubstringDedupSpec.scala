package graft

import graft.ext.TextOps

/** Unbounded exact-substring dedup: the diagonal island merge
  * ([[TextOps.maximalDupSpans]]) must reconstruct maximal shared
  * substrings of ANY length ≥ w as a unit, and the per-doc projection
  * ([[TextOps.maximalDupIslands]]) must interval-merge coverage from
  * multiple partners. Engineered fixtures with known offsets. */
class SubstringDedupSpec extends SparkSpec {

  private def b(i: Int) = s"b$i"
  private val block = (1 to 10).map(b).mkString(" ") // 10 shared tokens

  test("a 10-token shared block recovers as ONE maximal span, not w-sized fragments") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"p1 p2 p3 $block s1 s2"), // block at tokens 3..12
      (2L, s"q1 $block r1 r2 r3"),    // block at tokens 1..10
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")).toDF("doc_id", "text")
    val spans = TextOps.maximalDupSpans(docs, w = 4).collect()
    assert(spans.length == 1)
    val r = spans.head
    assert((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) == ((1L, 2L)))
    assert(r.getAs[Long]("start_a") == 3L && r.getAs[Long]("end_a") == 12L)
    assert(r.getAs[Long]("start_b") == 1L && r.getAs[Long]("end_b") == 10L)
    assert(r.getAs[Long]("span_tokens") == 10L)
    assert(r.getAs[Long]("n_windows") == 7L) // 10 - 4 + 1 stride-1 windows
  }

  test("two occurrences in one partner stay separate diagonals; islands stay separate across a 1-token gap") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"p1 p2 p3 $block s1 s2"),
      (3L, s"$block x $block")).toDF("doc_id", "text")
    val spans = TextOps.maximalDupSpans(docs, w = 4)
      .collect().map(r => (r.getAs[Long]("start_b"), r.getAs[Long]("end_b"),
        r.getAs[Long]("span_tokens"))).toSet
    // doc 3 holds the block at 0..9 and 11..20 — two diagonals vs doc 1
    assert(spans == Set((0L, 9L, 10L), (11L, 20L, 10L)))
    val isl = TextOps.maximalDupIslands(docs, w = 4)
      .filter("doc_id = 3").collect()
      .map(r => (r.getAs[Long]("start_tok"), r.getAs[Long]("end_tok"))).toSet
    // the 1-token gap at position 10 keeps the runs apart (merge is
    // overlap-or-ADJACENT, and 11 > 9 + 1)
    assert(isl == Set((0L, 9L), (11L, 20L)))
  }

  test("dedupExcise keeps the first occurrence and cuts the block from the later doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"p1 p2 p3 $block s1 s2"), // first occurrence — kept whole
      (2L, s"q1 $block r1 r2 r3"),    // later doc — block excised
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")).toDF("doc_id", "text")
    val out = TextOps.dedupExcise(docs, w = 4).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_text")))).toMap
    assert(out(1L) == ((15L, 0L, s"p1 p2 p3 $block s1 s2")))
    assert(out(2L) == ((14L, 10L, "q1 r1 r2 r3")))
    assert(out(3L) == ((10L, 0L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")))
  }

  test("per-doc islands merge overlapping coverage from different partners") {
    import spark.implicits._
    val cTail = (1 to 10).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, s"p1 p2 p3 $block s1 s2"),
      (4L, s"$block $cTail"),           // b1..b10 c1..c10
      (5L, "x1 x2 b8 b9 b10 c1 c2 c3 x3")).toDF("doc_id", "text")
    val isl = TextOps.maximalDupIslands(docs, w = 4)
      .filter("doc_id = 4").collect()
    // doc 4's coverage: [0,9] via doc 1's block, [7,12] via doc 5's
    // straddle — overlapping, so ONE island [0,12] fusing 2 sources
    assert(isl.length == 1)
    assert(isl.head.getAs[Long]("start_tok") == 0L)
    assert(isl.head.getAs[Long]("end_tok") == 12L)
    assert(isl.head.getAs[Long]("span_tokens") == 13L)
    assert(isl.head.getAs[Long]("n_sources") == 2L)
  }

  test("occCap excludes corpus-pervasive windows: a recall bound, stated loudly") {
    import spark.implicits._
    val cTail = (1 to 10).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, s"p1 p2 p3 $block s1 s2"),
      (2L, s"q1 $block r1 r2 r3"),
      (4L, s"$block $cTail"),
      (5L, "x1 x2 b8 b9 b10 c1 c2 c3 x3")).toDF("doc_id", "text")
    // block windows occur in docs 1, 2, 4 (3 occurrences) > cap 2 →
    // excluded; only the (4,5) straddle windows (2 occurrences) pair
    val spans = TextOps.maximalDupSpans(docs, w = 4, occCap = 2).collect()
    assert(spans.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .toSet == Set((4L, 5L)))
    // at the default cap everything returns, including all block pairs
    val full = TextOps.maximalDupSpans(docs, w = 4).collect()
    assert(full.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .toSet == Set((1L, 2L), (1L, 4L), (2L, 4L), (4L, 5L)))
    // the audit MEASURES what the cap dropped: block windows (7 of
    // them, 3 occurrences each) capped at occCap=2, straddle windows
    // (3, 2 occurrences) kept
    val audit = TextOps.dupSpanAudit(docs, w = 4, occCap = 2).collect()
    assert(audit.length == 1)
    val a = audit.head
    assert(a.getAs[Long]("n_hashes_shared") == 10L, a)
    assert(a.getAs[Long]("n_hashes_capped") == 7L, a)
    assert(a.getAs[Long]("n_occ_capped") == 21L, a)
    // at the default cap nothing is excluded
    val clean = TextOps.dupSpanAudit(docs, w = 4).collect().head
    assert(clean.getAs[Long]("n_hashes_capped") == 0L &&
      clean.getAs[Long]("n_occ_capped") == 0L)
  }
}
