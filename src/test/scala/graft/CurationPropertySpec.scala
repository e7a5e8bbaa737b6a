package graft

import org.apache.spark.sql.DataFrame

import graft.ext.{DedupOps, TextOps}

/** Property harness for the r16 curation family — the Gopher rule
  * gate and DSIR importance resampling checked against independent
  * plain-Scala references on seeded random corpora, and the
  * leakage-safe split's structural invariants (the BpePropertySpec
  * discipline: the distributed implementation and a single-JVM
  * reference must agree bit-for-bit on every seed).
  *
  * The references replicate the CONTRACT: Spark's `split(text, ' ')`
  * keeps interior/trailing empties, so the JVM side splits with
  * limit -1; all ratios are integer milli floor divisions on
  * non-negative operands; DSIR's ⌊log₂⌋ is the bit length of a
  * positive long, exactly `length(bin(x)) − 1`. */
class CurationPropertySpec extends SparkSpec {

  // ---- shared plain-Scala helpers --------------------------------------

  private def md5residue(s: String, mod: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % mod
  }

  private def bitlen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)

  // ---- Gopher gate reference -------------------------------------------

  private val StopWords = Seq("the", "and", "a", "of", "to", "in")

  private def refGopher(text: String)
      : (Long, Long, Long, Long, Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean) = {
    val toks = text.split(" ", -1)
    val wc = toks.length.toLong
    val wordChars = text.length.toLong - (wc - 1)
    val mwl = (wordChars * 1000) / wc
    val symCount = (text.length - text.replace("#", "").length).toLong +
      (text.length - text.replace("...", "").length).toLong / 3
    val sym = (symCount * 1000) / wc
    val alphaWords = toks.count(_.exists(c => c >= 'a' && c <= 'z')).toLong
    val alpha = (alphaWords * 1000) / wc
    val padded = " " + text + " "
    val stop = StopWords.count(w => padded.contains(s" $w ")).toLong
    val rWc = wc >= 20 && wc <= 100000
    val rMwl = mwl >= 3000 && mwl <= 10000
    val rSym = sym <= 100
    val rAlpha = alpha >= 800
    val rStop = stop >= 2
    (wc, mwl, sym, alpha, stop, rWc, rMwl, rSym, rAlpha, rStop,
      rWc && rMwl && rSym && rAlpha && rStop)
  }

  // ---- DSIR reference ---------------------------------------------------

  private def refDsir(rows: Seq[(Long, String, String)],
      targets: Set[String], buckets: Int, k: Int)
      : Seq[(Long, String, Long, Long)] = {
    val tokRows = rows.flatMap { case (id, src, text) =>
      text.split(" ", -1).map(t => (id, src, md5residue(t, buckets)))
    }
    val ct = scala.collection.mutable.Map.empty[Long, Long]
    val cr = scala.collection.mutable.Map.empty[Long, Long]
    for ((_, src, b) <- tokRows)
      if (targets(src)) ct(b) = ct.getOrElse(b, 0L) + 1
      else cr(b) = cr.getOrElse(b, 0L) + 1
    val seen = (ct.keySet ++ cr.keySet).toSeq
    val nt = ct.values.sum + buckets
    val nr = cr.values.sum + buckets
    val bits = seen.map { b =>
      b -> ((bitlen(ct.getOrElse(b, 0L) + 1) - bitlen(cr.getOrElse(b, 0L) + 1)
        - (bitlen(nt) - bitlen(nr))).toLong)
    }.toMap
    tokRows.filterNot { case (_, src, _) => targets(src) }
      .groupBy { case (id, src, _) => (id, src) }
      .map { case ((id, src), ts) =>
        (id, src, ts.size.toLong, ts.map(t => bits(t._3)).sum)
      }.toSeq
      .sortBy { case (id, _, _, w) => (-w, id) }
      .take(k)
  }

  // ---- corpora ----------------------------------------------------------

  /** Random docs mixing alpha words, stopwords, digit words, and
    * symbol-bearing words — enough variety that every Gopher rule
    * fires on some seed. */
  private def corpus(seed: Long, nDocs: Int): Seq[(Long, String, String)] = {
    val rnd = new scala.util.Random(seed)
    val plain = Seq("data", "query", "table", "spark", "merge", "window",
      "scan", "batch", "row", "value")
    val weird = Seq("12345", "98", "ab#", "x...", "#", "...")
    def word() = {
      val r = rnd.nextInt(10)
      if (r < 6) plain(rnd.nextInt(plain.length))
      else if (r < 8) StopWords(rnd.nextInt(StopWords.length))
      else weird(rnd.nextInt(weird.length))
    }
    val sources = Seq("t1", "t2", "r1", "r2")
    (1 to nDocs).map { i =>
      val n = 1 + rnd.nextInt(40)
      (i.toLong, sources(rnd.nextInt(sources.length)),
        (1 to n).map(_ => word()).mkString(" "))
    }
  }

  private def df(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, src, text) => (id, "en", src, text) }
      .toDF("doc_id", "lang", "source", "text")
  }

  // ---- properties -------------------------------------------------------

  test("10 seeded corpora: gopherGate agrees with the JVM reference on every column") {
    for (seed <- 1L to 10L) {
      val rows = corpus(seed * 104729L, 25)
      val got = TextOps.gopherGate(df(rows)).collect().map { r =>
        r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("wc"), r.getAs[Long]("mwl_milli"),
            r.getAs[Long]("sym_milli"), r.getAs[Long]("alpha_milli"),
            r.getAs[Long]("stop_distinct"), r.getAs[Boolean]("r_wc"),
            r.getAs[Boolean]("r_mwl"), r.getAs[Boolean]("r_sym"),
            r.getAs[Boolean]("r_alpha"), r.getAs[Boolean]("r_stop"),
            r.getAs[Boolean]("keep")))
      }.toMap
      for ((id, _, text) <- rows) {
        val exp = refGopher(text)
        assert(got(id) == exp,
          s"seed=$seed doc=$id text='$text': got=${got(id)} exp=$exp")
      }
    }
  }

  test("10 seeded corpora: dsirResample agrees with the JVM reference top-k") {
    for (seed <- 1L to 10L) {
      val rows = corpus(seed * 7907L, 30)
      val k = 8
      val exp = refDsir(rows, Set("t1", "t2"), 256, k)
      val got = TextOps.dsirResample(df(rows), Seq("t1", "t2"), 256, k)
        .collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("weight_bits"))).toSeq
      assert(got == exp, s"seed=$seed:\ngot=$got\nexp=$exp")
    }
  }

  test("6 seeded corpora: leakage-safe splits never straddle a cluster; audit agrees") {
    import org.apache.spark.sql.functions.{col, length}
    for (seed <- 1L to 6L) {
      val rnd = new scala.util.Random(seed * 31L)
      // force near-dup structure: clone ~1/3 of docs with a 1-word edit
      val base = corpus(seed * 31L, 18).map { case (id, src, t) =>
        (id, src, t + " padding words keep shingles plentiful here now")
      }
      val clones = base.filter(_._1 % 3 == 0L).map { case (id, src, t) =>
        (id + 1000L, src, t.replace("padding", "padded"))
      }
      val docs = df(base ++ clones)
        .withColumn("n_chars", length(col("text")).cast("long"))
      val pairs = DedupOps.minhashNearDups(docs, 0.5)
      val clusters = DedupOps.nearDupClusters(docs, 0.5)
      val leak = TextOps.splitLeakage(docs, pairs, clusters).collect()(0)
      assert(leak.getAs[Long]("leaked_safe") == 0L, s"seed=$seed")
      val splits = TextOps.leakageSafeSplits(docs, clusters).collect()
      assert(splits.map(_.getAs[Long]("n_docs")).sum == (base ++ clones).size)
      assert(splits.map(_.getAs[Long]("n_clusters")).sum ==
        clusters.select(col("cluster_id")).distinct().count(), s"seed=$seed")
    }
  }
}
