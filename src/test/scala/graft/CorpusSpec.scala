package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ext.{Corpus, DedupOps, EventOps, Graph, TextOps, Analytics}

/** Round-6 curation surface: shared connected components, the
  * corpus-clean decision cascade, incremental dedup, stratified
  * sampling, normalization, exact percentiles, the oracle-gated
  * TopKAggregator query, and the partitioned corpus writer. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels a chain with its min id and leaves singletons alone") {
    val vertices = (1L to 7L).toDF("id")
    // chain 1-2-3-4-5 (diameter 4 → exercises pointer jumping), pair 6-7 absent → singletons
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (5L, 4L)).toDF("a", "b")
    val got = Graph.connectedComponents(vertices, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(got(_) == 1L))
    assert(got(6L) == 6L && got(7L) == 7L)
  }

  test("connectedComponents keeps disjoint components separate") {
    val vertices = (1L to 6L).toDF("id")
    val pairs = Seq((1L, 2L), (5L, 4L), (6L, 5L)).toDF("a", "b")
    val got = Graph.connectedComponents(vertices, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 3L)
    assert(got(4L) == 4L && got(5L) == 4L && got(6L) == 4L)
  }

  // corpus fixture: 20+ distinct filler docs keep minhash band collisions
  // honest; the interesting docs are crafted per-case
  private def fillerDocs(n: Int): Seq[(Long, String, String)] =
    (100L until (100L + n)).map { i =>
      (i, "en", s"filler document number $i speaks about topic $i in unique terms ${i * 7} and ${i * 13}")
    }

  test("cleanDecisions cascade: exact dup, near dup, low quality, keep") {
    val rich = "the quick brown fox jumps over a lazy dog and then " +
      "the fox runs far away to a quiet den where it rests until dawn " +
      "and a new day begins with the sun rising over a calm valley"
    val nearRich = rich.replace("calm valley", "calm meadow")
    val docs = (Seq(
      (1L, "en", rich),            // canonical of its near-dup cluster → keep
      (2L, "en", rich),            // byte-identical → exact_duplicate
      (3L, "en", nearRich),        // same cluster, not canonical → near_duplicate
      (4L, "en", "tiny doc")       // poor score → low_quality
    ) ++ fillerDocs(20)).toDF("doc_id", "lang", "text")
    val got = Corpus.cleanDecisions(docs)
      .select("doc_id", "reason", "keep")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(got(1L) == ("keep", true))
    assert(got(2L) == ("exact_duplicate", false))
    assert(got(3L) == ("near_duplicate", false))
    assert(got(4L) == ("low_quality", false))
  }

  test("dedupReport counts exact and near dup members per language with exact rates") {
    val rich = "the quick brown fox jumps over a lazy dog and then " +
      "the fox runs far away to a quiet den where it rests until dawn"
    val docs = (Seq(
      (1L, "en", rich),                              // canonical
      (2L, "en", rich),                              // exact dup (also near)
      (3L, "en", rich.replace("dawn", "dusk")),      // near dup only
      (4L, "de", "ein ganz anderes dokument ohne duplikate uberhaupt hier")
    ) ++ fillerDocs(6)).toDF("doc_id", "lang", "text")
    val got = Corpus.dedupReport(docs).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_exact_dups"),
          r.getAs[Long]("n_near_dups"), r.getAs[Double]("near_rate"))).toMap
    val en = got("en")
    assert(en._1 == 9)                 // 3 + 6 filler
    assert(en._2 == 1)                 // doc 2
    assert(en._3 == 2)                 // docs 2 and 3 (non-canonical members)
    assert(en._4 == 2.0 / 9)
    assert(got("de") == ((1L, 0L, 0L, 0.0)))
  }

  test("precomputed-artifact overloads equal the convenience forms (report, clean, pairs, clusters)") {
    val rich = "the quick brown fox jumps over a lazy dog and then " +
      "the fox runs far away to a quiet den where it rests until dawn"
    val docs = (Seq(
      (1L, "en", rich),
      (2L, "en", rich),
      (3L, "en", rich.replace("dawn", "dusk")),
      (4L, "de", "ein ganz anderes dokument ohne duplikate uberhaupt hier")
    ) ++ fillerDocs(6)).toDF("doc_id", "lang", "text")
    // one shared build, every consumer derives from it — the suite's
    // Artifacts wiring in miniature
    val sets = DedupOps.shingleSets(docs).cache()
    val sigs = DedupOps.minhashSignatures(docs)
    val bands = DedupOps.bandKeysFrom(sigs).cache()
    val pairs = DedupOps.minhashNearDupsFrom(sets, bands, 0.5)
    val exact = DedupOps.exactDups(docs)
    val clusters = DedupOps.nearDupClustersFrom(docs.select($"doc_id"), pairs)

    def rows(df: org.apache.spark.sql.DataFrame): Set[String] = {
      val cols = df.columns.sorted.map(col).toSeq
      df.select(cols: _*).collect().map(_.toString).toSet
    }
    assert(rows(pairs) == rows(DedupOps.minhashNearDups(docs, 0.5)))
    assert(rows(clusters) == rows(DedupOps.nearDupClusters(docs, 0.5)))
    assert(rows(DedupOps.ngramJaccardPairsFrom(sets, sigs, 0.3)) ==
      rows(DedupOps.ngramJaccardPairs(docs, 0.3)))
    assert(rows(Corpus.dedupReportFrom(docs, exact, clusters)) ==
      rows(Corpus.dedupReport(docs)))
    assert(rows(Corpus.cleanDecisionsFrom(docs, exact, clusters)) ==
      rows(Corpus.cleanDecisions(docs)))
  }

  test("incrementalNewDocs keeps only odd-id content absent from the even-id snapshot") {
    val docs = Seq(
      (0L, "en", "shared content alpha"),  // snapshot
      (1L, "en", "shared content alpha"),  // incoming, seen → dropped
      (2L, "en", "snapshot only beta"),    // snapshot
      (3L, "en", "genuinely new gamma"),   // incoming, new → kept
      (5L, "en", "genuinely new gamma")    // incoming dup of incoming → still new vs snapshot
    ).toDF("doc_id", "lang", "text")
    val got = DedupOps.incrementalNewDocs(docs).select("doc_id")
      .as[Long].collect().sorted
    assert(got.toSeq == Seq(3L, 5L))
  }

  test("cleanDecisions thresholds are session-conf tunable (spark.graft.corpus.*)") {
    val docs = (Seq((4L, "en", "tiny doc")) ++ fillerDocs(20))
      .toDF("doc_id", "lang", "text")
    // default floor 0.5 → "tiny doc" is low_quality
    val before = Corpus.cleanDecisions(docs)
      .filter($"doc_id" === 4L).head.getAs[String]("reason")
    assert(before == "low_quality")
    spark.conf.set(GraftConf.QualityThresholdKey, "0.0")
    try {
      val after = Corpus.cleanDecisions(docs)
        .filter($"doc_id" === 4L).head.getAs[String]("reason")
      assert(after == "keep")
    } finally spark.conf.unset(GraftConf.QualityThresholdKey)
  }

  test("incrementalNewNearDocs drops incoming docs with a near-dup in the snapshot") {
    val rich = "the quick brown fox jumps over a lazy dog and then " +
      "the fox runs far away to a quiet den where it rests until dawn " +
      "and a new day begins with the sun rising over a calm valley"
    val docs = (Seq(
      (2L, "en", rich),                                   // snapshot
      (3L, "en", rich.replace("calm valley", "calm meadow")), // incoming, near-dup → dropped
      (5L, "en", "an entirely different story about winter mountains " +
        "and the snow that falls there every single year without fail " +
        "covering peaks and valleys in deep white silence until spring")
    ) ++ fillerDocs(20)).toDF("doc_id", "lang", "text")
    val kept = DedupOps.incrementalNewNearDocs(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(3L))
    assert(kept.contains(5L))
    // odd filler ids have no snapshot twin → kept
    assert(kept.contains(101L))
  }

  test("stratifiedSample applies per-language rates; zero-rate strata vanish") {
    val docs = (1L to 400L).map { i =>
      val lang = Seq("en", "fr", "xx")((i % 3).toInt)
      (i, lang, s"doc $i", i.toInt)
    }.toDF("doc_id", "lang", "text", "n_chars")
    val got = TextOps.stratifiedSample(docs,
      rates = Seq("en" -> 100, "fr" -> 30), defaultPct = 0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enTotal = docs.filter($"lang" === "en").count()
    assert(got("en") == enTotal)                 // 100% stratum complete
    assert(got.get("xx").isEmpty)                // 0% stratum absent
    val fr = got.getOrElse("fr", 0L).toDouble /
      docs.filter($"lang" === "fr").count()
    assert(fr > 0.1 && fr < 0.5, s"fr rate $fr not near 0.3")
  }

  test("stratifiedSample is a deterministic subset of the matching hashSample") {
    val docs = (1L to 200L).map(i => (i, "en", s"d$i", 1)).toDF("doc_id", "lang", "text", "n_chars")
    val strat = TextOps.stratifiedSample(docs, rates = Seq("en" -> 10))
      .select("doc_id").as[Long].collect().toSet
    val flat = TextOps.hashSample(docs, 10).select("doc_id").as[Long].collect().toSet
    assert(strat == flat)
  }

  test("crossSignalNearDups flags lexical-only, semantic-only, and agreeing pairs") {
    val rich = "the quick brown fox jumps over a lazy dog and then " +
      "the fox runs far away to a quiet den where it rests until dawn " +
      "and a new day begins with the sun rising over a calm valley"
    // docs: (1,2) lexical near-dups; 3,4 unrelated text
    val docs = (Seq(
      (1L, "en", rich),
      (2L, "en", rich.replace("calm valley", "calm meadow")),
      (3L, "en", "an entirely different story about winter mountains and snow"),
      (4L, "en", "a third unrelated text on database engines and query planners")
    ) ++ fillerDocs(20)).toDF("doc_id", "lang", "text")
    // embeddings: (3,4) identical vectors → semantic pair; 1,2 orthogonal
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f), 0),
      (3L, Array(0.0f, 0.0f, 1.0f, 1.0f), 0),
      (4L, Array(0.0f, 0.0f, 1.0f, 1.0f), 0)).toDF("vec_id", "embedding", "label")
    val got = Corpus.crossSignalNearDups(docs, emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getBoolean(2), r.getBoolean(3))).toMap
    assert(got((1L, 2L)) == (true, false))
    assert(got((3L, 4L)) == (false, true))
    assert(!got.contains((1L, 3L)))
  }

  test("mixtureWeights: sums to 1, ordered by size, flatter than proportional") {
    val docs = (
      (1L to 80L).map(i => (i, "en", s"web page $i with plenty of words here", "web")) ++
      (81L to 100L).map(i => (i, "en", s"book excerpt $i with plenty of words", "books")) ++
      (101L to 105L).map(i => (i, "en", s"wiki article $i words", "wiki"))
    ).toDF("doc_id", "lang", "text", "source")
    val w = TextOps.mixtureWeights(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(math.abs(w.values.map(_._2).sum - 1.0) < 1e-12)
    assert(w("web")._2 > w("books")._2 && w("books")._2 > w("wiki")._2)
    // temperature flattening: weight ratio is the SQRT of the token
    // ratio, strictly smaller than raw proportional sampling
    val tokRatio = w("web")._1.toDouble / w("books")._1
    val wRatio = w("web")._2 / w("books")._2
    assert(wRatio < tokRatio && math.abs(wRatio - math.sqrt(tokRatio)) < 1e-9)
  }

  test("normalize lowercases, strips punctuation, collapses whitespace") {
    val docs = Seq((1L, "en", "Hello,   World! It's 42°C &  RISING."))
      .toDF("doc_id", "lang", "text")
    val r = TextOps.normalize(docs).head()
    assert(r.getAs[String]("norm_text") == "hello world it s 42 c rising")
    assert(r.getAs[Int]("n_chars_norm") == 28)
  }

  test("statusPercentiles picks exact order-statistic values (disc semantics)") {
    // 10 orders in one group: p50 = 5th value, p90 = 9th, p99 = ceil(9.9) = 10th
    val orders = (1L to 10L).map(i => (i, "O", i * 10.0)).toDF(
      "o_orderkey", "o_orderstatus", "o_totalprice")
    val r = Analytics.statusPercentiles(orders).head()
    assert(r.getAs[String]("p50_price") == "50.00")
    assert(r.getAs[String]("p90_price") == "90.00")
    assert(r.getAs[String]("p99_price") == "100.00")
    assert(r.getAs[Long]("n_orders") == 10L)
  }

  test("orderMoments derives mean/variance/correlation from exact power sums") {
    // prices 10,20,30,40 on days 0..3: mean 25, var_pop 125, corr exactly 1
    val orders = (0 to 3).map { d =>
      (d.toLong, "O", (d + 1) * 10.0,
        java.sql.Timestamp.valueOf(s"1992-01-0${d + 1} 00:00:00"))
    }.toDF("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    val r = Analytics.orderMoments(orders).head()
    assert(r.getAs[Long]("n_orders") == 4L)
    assert(r.getAs[String]("sum_price") == "100.00")
    assert(r.getAs[Double]("mean_price") == 25.0)
    assert(r.getAs[Double]("var_price") == 125.0)
    assert(math.abs(r.getAs[Double]("corr_price_day") - 1.0) < 1e-12)
  }

  test("topEventTypes matches the row_number formulation with ties broken by type") {
    val events = (Seq.fill(5)("click") ++ Seq.fill(5)("view") ++
      Seq.fill(3)("purchase") ++ Seq.fill(1)("refund"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("event_id", "event_type")
    val got = EventOps.topEventTypes(events, 3)
      .orderBy("rank").collect().map(r => (r.getInt(0), r.getString(1)))
    // tie on 5: click before view (item asc); purchase third
    assert(got.toSeq == Seq((1, "click"), (2, "view"), (3, "purchase")))
  }

  test("tokenShards packs docs into budget-bounded shards in doc_id order") {
    // each doc: 25 words of 4 chars → 25 BPE tokens (ceil(4/4)=1 per word);
    // budget 50 → cum-starts 0,25,50,75,100,125 → shards 0,0,1,1,2,2
    val docs = (1L to 6L).map(i => (i, "en", Seq.fill(25)("abcd").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val got = TextOps.tokenShards(docs, budget = 50L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.forall(_._2 == 25L))
    assert(got.map(_._3).toSeq == Seq(0L, 0L, 1L, 1L, 2L, 2L))
  }

  test("benchmarkContamination flags docs sharing a 6-token shingle with the benchmark set") {
    val shared = "one two three four five six"
    val docs = Seq(
      (11L, "en", s"benchmark doc holds $shared inside it"),      // benchmark (11%11=0)
      (1L, "en", s"clean doc with nothing relevant at all here"),
      (2L, "en", s"contaminated because $shared appears here too")
    ).toDF("doc_id", "lang", "text")
    val got = TextOps.benchmarkContamination(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.contains(2L) && got(2L) >= 1L)
    assert(!got.contains(1L))
    assert(!got.contains(11L)) // benchmark docs are not self-flagged
  }

  test("writeClean writes only kept docs, partitioned and complete") {
    val dir = Files.createTempDirectory("graft-clean-write").toString
    val rich = "the quick brown fox jumps over a lazy dog and then " +
      "the fox runs far away to a quiet den where it rests until dawn " +
      "and a new day begins with the sun rising over a calm valley"
    val docs = (Seq(
      (1L, "en", rich),
      (2L, "en", rich),        // exact dup → dropped
      (4L, "de", "tiny doc")   // low quality → dropped
    ) ++ fillerDocs(20)).toDF("doc_id", "lang", "text")
    val kept = Corpus.writeClean(docs, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == kept)
    val ids = back.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(1L) && !ids.contains(2L) && !ids.contains(4L))
    // source columns survive the round trip (not just the decision cols)
    assert(back.columns.toSet == Set("doc_id", "lang", "text"))
  }

  test("writePartitioned lays out lang partitions and read-back prunes them") {
    val dir = Files.createTempDirectory("graft-corpus-write").toString
    val docs = (1L to 90L).map { i =>
      (i, Seq("en", "de", "fr")((i % 3).toInt), s"text $i")
    }.toDF("doc_id", "lang", "text")
    Corpus.writePartitioned(docs, dir)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == Set("lang=en", "lang=de", "lang=fr"))
    val back = spark.read.parquet(dir).filter($"lang" === "de")
    assert(back.count() == 30L)
    // partition pruning: the scan's partition filters mention lang, and
    // only the lang=de directory's files are read
    val scan = back.queryExecution.executedPlan.collectLeaves().head
    val scanStr = scan.toString
    assert(scanStr.contains("PartitionFilters") && scanStr.contains("lang"))
    // rows within each file arrive sorted by doc_id (sortWithinPartitions)
    val perFile = spark.read.parquet(s"$dir/lang=de")
      .select(input_file_name().as("f"), $"doc_id")
      .collect().groupBy(_.getString(0))
    perFile.values.foreach { rows =>
      val ids = rows.map(_.getLong(1)).toSeq
      assert(ids == ids.sorted)
    }
  }

  test("sourceCaps keeps each source's top-quality slice, bounded by WindowGroupLimit") {
    // 3 sources × 8 docs; quality rises with token count (length score
    // dominates below 100 tokens), so the kept set per source is the
    // longest docs; doc_id breaks exact-quality ties
    val docs = (0 until 24).map { i =>
      val src = s"s${i % 3}"
      val n = 5 + (i / 3) * 7 // token counts 5,12,19,...,54 per source
      (i.toLong, src, (1 to n).map(j => s"w${i}x$j").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val df = TextOps.sourceCaps(docs, cap = 4)
    val got = df.collect()
    assert(got.length == 12) // 4 kept per source
    got.groupBy(_.getString(1)).foreach { case (_, rows) =>
      assert(rows.length == 4)
      assert(rows.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3, 4))
      // kept = highest quality first; ranks follow quality descending
      val byRank = rows.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(byRank == byRank.sorted.reverse)
    }
    // every source's kept minimum beats (or equals) its dropped maximum
    val all = TextOps.sourceCaps(docs, cap = 1000).collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getInt(3)))
    all.groupBy(_._1).foreach { case (_, rs) =>
      val kept = rs.filter(_._3 <= 4).map(_._2)
      val dropped = rs.filter(_._3 > 4).map(_._2)
      assert(dropped.isEmpty || kept.min >= dropped.max)
    }
    // the rank filter must rewrite to WindowGroupLimit: `cap` rows per
    // map task reach the exchange, never the corpus
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("epochOrder: each epoch is a complete dense permutation; epochs differ") {
    val docs = (1L to 64L).map(i => (i, "en", s"doc $i")).toDF("doc_id", "lang", "text")
    val got = Corpus.epochOrder(docs, epochs = 2, shards = 8).collect()
    assert(got.length == 64)
    // dense positions 1..n within every (epoch, shard)
    for (e <- 0 to 1) {
      val byShard = got.groupBy(_.getAs[Long](s"shard_e$e"))
      assert(byShard.keySet.subsetOf((0L until 8L).toSet))
      byShard.foreach { case (_, rs) =>
        assert(rs.map(_.getAs[Long](s"pos_e$e")).sorted.toSeq ==
          (1L to rs.length).toSeq)
      }
    }
    // the two epochs are different permutations: some doc moves shard
    // or position (64 docs — a hash collision across ALL of them is
    // astronomically unlikely and deterministically absent here)
    assert(got.exists(r => r.getAs[Long]("shard_e0") != r.getAs[Long]("shard_e1")
      || r.getAs[Long]("pos_e0") != r.getAs[Long]("pos_e1")))
    // determinism: a second run is identical
    val again = Corpus.epochOrder(docs, epochs = 2, shards = 8).collect()
    assert(again.map(_.toSeq).toSet == got.map(_.toSeq).toSet)
  }

  // the split residue formula, recomputed JVM-side so the fixture can
  // PLACE a near-dup pair across the naive 80/90 cuts by construction
  private def splitResidue(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % 100
  }

  test("leakageSafeSplits keeps near-dup clusters whole; splitLeakage proves it") {
    val rich = "the quick brown fox jumps over a lazy dog and then " +
      "the fox runs far away to a quiet den where it rests until dawn " +
      "and a new day begins with the sun rising over a calm valley"
    // engineer the contamination: a near-dup pair whose doc_ids hash to
    // train and test under the naive doc-keyed policy
    val a = (1L to 99L).find(splitResidue(_) < 80).get
    val b = (1L to 99L).find(splitResidue(_) >= 90).get
    val docs = (Seq(
      (a, "en", rich),
      (b, "en", rich.replace("calm valley", "calm meadow"))
    ) ++ fillerDocs(20)).toDF("doc_id", "lang", "text")
      .withColumn("n_chars", length($"text").cast("long"))
    val pairs = DedupOps.minhashNearDups(docs, 0.5)
    val clusters = DedupOps.nearDupClusters(docs, 0.5)

    val splits = TextOps.leakageSafeSplits(docs, clusters).collect()
    assert(splits.map(_.getAs[Long]("n_docs")).sum == 22)
    // clusters never straddle splits, so per-split distinct-cluster
    // counts add up to the global cluster count exactly
    val nClusters = clusters.select($"cluster_id").distinct().count()
    assert(splits.map(_.getAs[Long]("n_clusters")).sum == nClusters)

    val leak = TextOps.splitLeakage(docs, pairs, clusters).collect()(0)
    assert(leak.getAs[Long]("n_pairs") >= 1)          // the a-b pair verified
    assert(leak.getAs[Long]("leaked_naive") >= 1)     // naive policy leaks it
    assert(leak.getAs[Long]("leaked_safe") == 0)      // safe policy cannot
  }
}
