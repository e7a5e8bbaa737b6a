package graft

import org.apache.spark.sql.DataFrame

import graft.ext.TextOps

/** Property harness for the BPE family — the tokenizer's
  * train / encode / id-resolve logic checked against an independent
  * plain-Scala reference on seeded random corpora (the
  * AsOfPropertySpec discipline: the distributed implementation and a
  * single-JVM reference must agree bit-for-bit on every seed).
  *
  * The reference replicates the CONTRACT, not the plan: per round,
  * adjacent-pair counts weighted by corpus word frequency, winner =
  * max count with ties to the ascending "a b" pair string (binary
  * collation), merge applied as ONE greedy left-to-right pass (≡
  * fixpoint — a merged token never recreates its own pair); encode
  * folds the rules in rank order the same way; ids = binary-sorted
  * base alphabet 0..B-1 then merges in rank order, min-id dedupe on
  * surface-string collisions. */
class BpePropertySpec extends SparkSpec {

  // ---- plain-Scala reference ------------------------------------------

  private def refMergeOnce(toks: List[String], a: String, b: String)
      : List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    for (t <- toks) {
      if (out.nonEmpty && out.last == a && t == b)
        out(out.length - 1) = a + b
      else out += t
    }
    out.toList
  }

  /** (merges, encoded vocab): rank-ordered (a, b, merged, count) plus
    * the final word → token-list map. */
  private def refTrain(texts: Seq[String], rounds: Int)
      : (Seq[(Int, String, String, String, Long)], Map[String, List[String]]) = {
    val words = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
    val freq = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    var cur: Map[String, (List[String], Long)] =
      freq.map { case (w, f) => w -> (w.map(_.toString).toList, f) }
    val merges = scala.collection.mutable.ListBuffer
      .empty[(Int, String, String, String, Long)]
    for (r <- 1 to rounds) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((_, (toks, f)) <- cur; Seq(a, b) <- toks.sliding(2)
           if toks.length >= 2)
        pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + f
      if (pairCounts.nonEmpty) {
        val ((a, b), c) = pairCounts.toSeq
          .minBy { case ((x, y), n) => (-n, s"$x $y") }
        merges += ((r, a, b, a + b, c))
        cur = cur.map { case (w, (toks, f)) =>
          w -> (refMergeOnce(toks, a, b), f) }
      } else {
        // the distributed form's empty-winner crossJoin empties the
        // working frame: no further merges can ever be emitted
        cur = Map.empty
      }
    }
    (merges.toSeq, cur.map { case (w, (toks, _)) => w -> toks })
  }

  private def refEncode(word: String,
      merges: Seq[(Int, String, String, String, Long)]): List[String] =
    merges.sortBy(_._1).foldLeft(word.map(_.toString).toList) {
      case (toks, (_, a, b, _, _)) => refMergeOnce(toks, a, b)
    }

  // ---- corpora ---------------------------------------------------------

  private def corpus(seed: Long, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val alphabet = "abcd"
    def word() = (1 to (1 + rnd.nextInt(6)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    (1 to nDocs).map { i =>
      val text =
        if (i == nDocs) "" // one empty doc: the coalesce path
        else (1 to (1 + rnd.nextInt(8))).map(_ => word()).mkString(" ")
      (i.toLong, text)
    }
  }

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // ---- properties ------------------------------------------------------

  test("12 seeded corpora: distributed train/encode/ids agree with the JVM reference") {
    for (seed <- 1L to 12L) {
      val rounds = if (seed % 3 == 0L) 5 else 3
      val rows = corpus(seed * 7919L, 12)
      val docs = df(rows)
      val (refMerges, _) = refTrain(rows.map(_._2), rounds)

      // TRAIN: the merge table matches row for row
      val merges = TextOps.bpeTrainMerges(docs, rounds)
      val gotMerges = merges.collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
          r.getLong(4))).sortBy(_._1).toSeq
      assert(gotMerges == refMerges, s"seed=$seed train mismatch:\n" +
        s"got=$gotMerges\nref=$refMerges")

      // ENCODE: per-doc counts + head tokens match the reference fold
      val enc = TextOps.bpeEncodeFrom(docs, merges).collect()
        .map(r => r.getLong(0) ->
          (Option(r.getString(1)), r.getLong(2), r.getLong(3))).toMap
      for ((id, text) <- rows) {
        val ws = text.split(" ").filter(_.nonEmpty).toSeq
        val refToks = ws.map(refEncode(_, refMerges))
        val expHead = ws.headOption.map(refEncode(_, refMerges).mkString("|"))
        val got = enc(id)
        assert(got._1 == expHead && got._2 == refToks.map(_.length).sum &&
          got._3 == ws.length,
          s"seed=$seed doc=$id encode mismatch: got=$got " +
            s"exp=($expHead, ${refToks.map(_.length).sum}, ${ws.length})")
      }

      // IDS: vocabulary ids + per-doc id streams match
      val alphaSorted = rows.flatMap(_._2.split(" ")).filter(_.nonEmpty)
        .flatMap(_.map(_.toString)).distinct.sorted
      val vocabRef: Map[String, Long] = {
        val base = alphaSorted.zipWithIndex
          .map { case (t, i) => t -> i.toLong }
        val merged = refMerges.map { case (r, _, _, m, _) =>
          m -> (alphaSorted.length - 1 + r).toLong }
        // min-id dedupe, base first (lowest ids)
        (base ++ merged).groupBy(_._1).view
          .mapValues(_.map(_._2).min).toMap
      }
      import org.apache.spark.sql.functions.col
      val vocab = alphaSorted.zipWithIndex
        .map { case (t, i) => (i.toLong, t, "base") } ++
        refMerges.map { case (r, _, _, m, _) =>
          ((alphaSorted.length - 1 + r).toLong, m, "merged") }
      val vocabDf = {
        import spark.implicits._
        vocab.toDF("token_id", "token", "kind")
      }
      def md5hex(s: String): String =
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val ids = TextOps.bpeIdsFrom(docs, merges, vocabDf).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      for ((id, text) <- rows) {
        val ws = text.split(" ").filter(_.nonEmpty).toSeq
        val stream = ws.flatMap(refEncode(_, refMerges)).map(vocabRef)
        assert(ids(id) == ((stream.length.toLong, md5hex(stream.mkString(",")))),
          s"seed=$seed doc=$id ids mismatch")
      }
      assert(ids(rows.last._1) == ((0L, md5hex(""))), "empty doc: 0 tokens")

      // ROUNDTRIP: decoding the id streams reproduces the normalized
      // original on every doc (the losslessness theorem), with the
      // same token counts as the ids path
      val rt = TextOps.bpeDecodeRoundtrip(docs, merges, vocabDf).collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getString(2), r.getBoolean(3))).toMap
      for ((id, text) <- rows) {
        val ws = text.split(" ").filter(_.nonEmpty).toSeq
        val norm = ws.mkString(" ")
        val nToks = ws.map(refEncode(_, refMerges).length).sum.toLong
        assert(rt(id) == ((nToks, md5hex(norm), true)),
          s"seed=$seed doc=$id roundtrip mismatch: got=${rt(id)}")
      }
    }
  }
}
