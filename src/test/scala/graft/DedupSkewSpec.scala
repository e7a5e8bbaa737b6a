package graft

import org.apache.spark.sql.functions._

import graft.ext.DedupOps

/** Skew behavior of the dedup candidate joins: the triangle-salted
  * self-pair join must (a) produce the byte-identical pair set of the
  * naive bucket self-join and (b) split a hot bucket's pairs over many
  * (i, j) join cells with a bounded per-cell maximum — on a Zipf-ish
  * corpus the naive join serializes an entire hot block ("the …") onto
  * one reducer task. Also covers the hamming-k SimHash probe against a
  * Scala brute force. */
class DedupSkewSpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")

  /** Skewed fixture: `hot` docs share the first token "the" (one block),
    * the rest start with a unique token. Bodies overlap pairwise enough
    * that some pairs pass the Jaccard threshold and most don't. */
  private def skewedDocs(hot: Int, cold: Int) = {
    import spark.implicits._
    val rows = (0 until hot).map { i =>
      val body = Seq.fill(10)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i.toLong, s"the $body")
    } ++ (0 until cold).map { i =>
      val body = Seq.fill(10)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      ((hot + i).toLong, s"start$i $body")
    }
    rows.toDF("doc_id", "text")
  }

  private def shingles(text: String): Set[String] = {
    val t = text.split(" ")
    (1 to math.max(t.length - 2, 1))
      .map(i => t.slice(i - 1, math.min(i + 2, t.length)).mkString(" ")).toSet
  }

  test("salted first-token blocking yields the identical pair set to a naive block join") {
    val df = skewedDocs(hot = 60, cold = 30)
    val got = DedupOps.firstTokenJaccardPairs(df, threshold = 0.3)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet

    // independent Scala-side reference: block on first token, all
    // intra-block pairs, exact distinct-3-gram Jaccard
    val docs = df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val byBlock = docs.groupBy(_._2.split(" ").head)
    val want = byBlock.values.flatMap { ds0 =>
      val ds = ds0.toSeq
      for {
        a <- ds; b <- ds if a._1 < b._1
        sa = shingles(a._2); sb = shingles(b._2)
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
        if j >= 0.3
      } yield (a._1, b._1)
    }.toSet
    assert(got == want)
  }

  test("a hot block's pairs spread over many join cells with a bounded maximum") {
    val hot = 64
    val df = skewedDocs(hot = hot, cold = 10)
    // reproduce the salting: cell (i, j) of the hot block holds
    // |salt=i| × |salt=j| candidate pairs; the naive join holds ALL
    // hot² pairs in ONE task
    val saltCounts = df
      .filter(split(col("text"), " ").getItem(0) === "the")
      .select(pmod(hash(col("doc_id")), lit(DedupOps.SaltBuckets)).as("salt"))
      .groupBy("salt").count()
      .collect().map(r => r.getAs[Int]("salt") -> r.getAs[Long]("count")).toMap
      .withDefaultValue(0L)
    val s = DedupOps.SaltBuckets
    val cells = for (i <- 0 until s; j <- i until s)
      yield saltCounts(i) * saltCounts(j)
    val naive = hot.toLong * hot
    assert(cells.count(_ > 0) >= 20, s"expected >=20 populated cells, got ${cells.count(_ > 0)}")
    assert(cells.max <= naive / 4,
      s"hot cell ${cells.max} not < naive/4 (${naive / 4})")
  }

  test("band0-blocked ngram pairs equal a Scala band0 block join") {
    val df = skewedDocs(hot = 40, cold = 20)
    val got = DedupOps.ngramJaccardPairs(df, threshold = 0.3)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet

    // reference: block on the Spark-computed band0 key, all intra-block
    // pairs, exact distinct-3-gram Jaccard — independent of the salted
    // join under test
    val sigRows = DedupOps.minhashSignatures(df).collect()
    val texts = df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val byBand0 = sigRows.map(r => r.getAs[String]("band0") -> r.getAs[Long]("doc_id"))
      .groupBy(_._1).values
    val want = byBand0.flatMap { ds0 =>
      val ds = ds0.toSeq
      for {
        a <- ds; b <- ds if a._2 < b._2
        sa = shingles(texts(a._2)); sb = shingles(texts(b._2))
        if sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble >= 0.3
      } yield (a._2, b._2)
    }.toSet
    assert(got == want)
  }

  test("salted simhashDups equals a naive identical-signature self-join under a hot signature") {
    import spark.implicits._
    // 50 byte-identical docs → ONE hot simhash bucket with 50·49/2 pairs,
    // plus distinct singletons; the salted join must reproduce the exact
    // pair set (and spread the hot bucket per the test above's cell math)
    val rows = (0 until 50).map(i => (i.toLong, "alpha beta gamma delta epsilon")) ++
      (0 until 10).map(i => ((100 + i).toLong, s"unique$i " + Seq.fill(6)(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val df = rows.toDF("doc_id", "text")
    val got = DedupOps.simhashDups(df)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Long]("simhash32"))
      .toMap
    val sigs = DedupOps.simhash(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash32"))
    val want = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b && sa == sb
    } yield (a, b) -> sa).toMap
    assert(want.size >= 50 * 49 / 2)
    assert(got == want)
  }

  test("simhash hamming-k pairs equal a Scala brute force (banding is exact for k<=3)") {
    import spark.implicits._
    // include exact dups (hamming 0) and shuffled near-variants
    val rows = (0 until 40).map { i =>
      val body = Seq.fill(8)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i.toLong, body)
    } ++ Seq((100L, "alpha beta gamma delta"), (101L, "alpha beta gamma delta"),
      (102L, "alpha beta gamma epsilon"))
    val df = rows.toDF("doc_id", "text")
    val got = DedupOps.simhashHammingPairs(df, k = 3)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Long]("hamming"))
      .toMap
    val sigs = DedupOps.simhash(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash32"))
    val want = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb)
      if h <= 3
    } yield (a, b) -> h.toLong).toMap
    assert(want.nonEmpty) // the exact-dup pair guarantees at least one
    assert(got == want)
  }

  test("salted minhash band join equals a Scala-verified naive band join") {
    val df = skewedDocs(hot = 30, cold = 10)
    val got = DedupOps.minhashNearDups(df, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet

    // naive reference: candidates = any shared (band index, band key),
    // verified with Scala-side exact Jaccard
    val sigRows = DedupOps.minhashSignatures(df).collect()
    val bandCols = (0 until DedupOps.NumHashes / DedupOps.BandSize).map(b => s"band$b")
    val byBand = sigRows.flatMap { r =>
      bandCols.zipWithIndex.map { case (c, i) =>
        (s"$i#${r.getAs[String](c)}", r.getAs[Long]("doc_id"))
      }
    }.groupBy(_._1).values
    val texts = df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val want = byBand.flatMap { ds0 =>
      val ds = ds0.toSeq
      for {
        a <- ds; b <- ds if a._2 < b._2
        sa = shingles(texts(a._2)); sb = shingles(texts(b._2))
        if sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble >= 0.5
      } yield (a._2, b._2)
    }.toSet
    assert(got == want)
  }
}
