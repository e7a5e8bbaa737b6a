package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication operators: exact (hash group), MinHash+LSH
  * (shingle → signature → band bucket → candidate join → exact-Jaccard
  * verify), SimHash, and n-gram Jaccard — the near-dup family a
  * training-data pipeline runs at corpus scale.
  *
  * All hashing is md5-based (both engines implement RFC-1321 md5
  * identically) and min-hash minima are lexicographic minima over hex
  * strings, so the DuckDB oracle reproduces every signature bit-for-bit.
  *
  * Scale posture: the only shuffles are groupBys on hash/band keys and
  * the candidate-pair self-join on band buckets — never an all-pairs
  * cross join. Bucket sizes are bounded by the band-key entropy, so the
  * pair blowup is O(Σ bucket²) ≪ O(n²); skewed buckets would be the
  * thing to salt at 100 TB.
  */
object DedupOps {

  /** Exact dedup by content hash: every document mapped to the canonical
    * survivor of its hash group — the minimum doc_id (deterministic,
    * unlike dropDuplicates' arbitrary-row-wins). `is_duplicate` marks
    * the rows a dedup pass would drop. */
  def exactDups(documents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("content_md5"))
    documents
      .select(col("doc_id"), md5(col("text").cast("binary")).as("content_md5"))
      .withColumn("canonical_doc_id", min(col("doc_id")).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("is_duplicate", col("doc_id") =!= col("canonical_doc_id"))
  }

  /** 3-token shingles from a materialized token-array column. The token
    * array MUST be a projected attribute, not `split(text)` inline: the
    * higher-order transform inlines its argument into the lambda, and an
    * inline split re-tokenizes the document once per shingle index —
    * O(tokens²) interpreted work, measured ~8 ms/doc vs ~0.3 ms. */
  private def shinglesOf(toks: Column): Column =
    transform(
      sequence(lit(1), greatest(size(toks) - 2, lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(3))))

  /** documents + materialized `toks` column. */
  private def withToks(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("text"),
      split(col("text"), " ").as("toks"))

  val NumHashes = 8
  val BandSize = 2 // → 4 bands of 2 signatures each

  /** Modulus for the double-hashing family: the first prime above 2³². */
  val HashPrime = 4294967311L

  /** doc_id + minhash signature + band keys, the LSH index frame.
    *
    * Each shingle is md5-hashed ONCE; the k hash functions are the
    * classic double-hash family h_j = (h1 + j·h2) mod p with h1/h2 the
    * two 32-bit halves of the digest. One digest per shingle matters
    * beyond arithmetic cost: every Spark md5() call goes through
    * MessageDigest.getInstance, whose provider lookup is synchronized on
    * JDK 17 (JDK-7092821, fixed only in 19) — md5-per-(shingle×hash)
    * turned the hash stage into a lock convoy under 32 threads.
    * Band keys are plain signature concatenations (no extra digest). */
  def minhashSignatures(documents: DataFrame): DataFrame = {
    val withSh = withToks(documents).select(col("doc_id"), col("text"),
      shinglesOf(col("toks")).as("sh_all"))
    val h12 = withSh.select(col("doc_id"), col("text"),
      transform(col("sh_all"), s => {
        val d = md5(s.cast("binary"))
        struct(
          conv(substring(d, 1, 8), 16, 10).cast("bigint").as("h1"),
          conv(substring(d, 9, 8), 16, 10).cast("bigint").as("h2"))
      }).as("hs"))
    val sig = (0 until NumHashes).map { j =>
      array_min(transform(col("hs"),
        h => (h.getField("h1") + lit(j.toLong) * h.getField("h2")) % HashPrime))
        .as(s"mh$j")
    }
    val withSig = h12.select(col("doc_id") +: col("text") +: sig: _*)
    val bands = (0 until NumHashes / BandSize).map { b =>
      concat_ws("|",
        (0 until BandSize).map(i => col(s"mh${b * BandSize + i}")): _*)
        .as(s"band$b")
    }
    withSig.select(Seq(col("doc_id"), col("text")) ++
      (0 until NumHashes).map(j => col(s"mh$j")) ++ bands: _*)
  }

  /** doc frame with the distinct shingle set and its size computed once
    * per document — candidate-pair stages must reference these
    * precomputed columns, never recompute shingles per pair (the
    * per-pair form moves the whole shingle pipeline above the join and
    * multiplies it by the candidate count; measured 40× slower). */
  private def withShingleSets(documents: DataFrame): DataFrame =
    withToks(documents).select(
      col("doc_id"), col("text"),
      array_distinct(shinglesOf(col("toks"))).as("sh"))
      .withColumn("n_sh", size(col("sh")))

  /** Exact-Jaccard verification of candidate pairs, as a relational
    * intersection count: explode the distinct shingle sets, equi-join the
    * pair list through (doc, shingle), and aggregate. This keeps every
    * stage a hash-partitioned codegen'd join/aggregate — a per-pair
    * array_intersect expression instead lands in the join condition
    * (filter pushdown), runs interpreted, and serializes on the hottest
    * block key (measured 650s vs seconds at sf0.1). Pairs with an empty
    * intersection drop out, which any threshold > 0 implies anyway. */
  private def jaccardVerify(cand: DataFrame, sets: DataFrame,
      threshold: Double): DataFrame = {
    val ex = sets.select(col("doc_id"), explode(col("sh")).as("s"))
    val sizes = sets.select(col("doc_id"), col("n_sh"))
    cand
      .join(ex.select(col("doc_id").as("doc_a"), col("s")), Seq("doc_a"))
      .join(ex.select(col("doc_id").as("doc_b"), col("s")), Seq("doc_b", "s"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("ni"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")),
        Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")),
        Seq("doc_b"))
      .withColumn("jaccard",
        col("ni").cast("double") /
          (col("n_a") + col("n_b") - col("ni")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** MinHash/LSH near-duplicate pairs: docs sharing any band bucket,
    * verified with exact shingle Jaccard ≥ threshold. The band join is
    * an equi self-join on the band key (hash-partitioned, no cross
    * product); distinct collapses pairs colliding in several bands. */
  def minhashNearDups(documents: DataFrame, threshold: Double = 0.5): DataFrame = {
    // cache: the band self-join and the verify stage reference these
    // frames from several subtrees, and Spark's broadcast-subtree jobs
    // would otherwise recompute the whole interpreted shingle+hash
    // pipeline once per reference (3× measured). The cached plan is also
    // shared with dedup_ngram / text_fingerprint in the same session.
    val sigs = minhashSignatures(documents).cache()
    val bandCols = (0 until NumHashes / BandSize).map(b => s"band$b")
    val sets = withShingleSets(documents).cache()
    val exploded = sigs.select(col("doc_id").as("doc_a"),
      explode(array(bandCols.map(col): _*)).as("band"))
    val explodedR = sigs.select(col("doc_id").as("doc_b"),
      explode(array(bandCols.map(col): _*)).as("band"))
    val cand = exploded.join(explodedR, Seq("band"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    jaccardVerify(cand, sets, threshold)
  }

  /** Near-duplicate CLUSTERS: connected components over the MinHash pair
    * graph via iterative min-label propagation — the step a real dedup
    * pipeline runs on top of pair output (keep one canonical doc per
    * component, drop the rest). Each iteration is one distributed
    * join+groupBy propagating the smallest doc_id seen so far along
    * edges; the driver only checks the converged flag (no data is
    * collected). Converges in ≤ graph-diameter iterations — near-dup
    * components are shallow (pairs share content, so components are
    * near-cliques); for adversarially long chains the large-star/
    * small-star variant halves path lengths per round — same join
    * shape, documented trade-off.
    *
    * Deterministic: component id = min doc_id of the component. */
  def nearDupClusters(documents: DataFrame, threshold: Double = 0.5): DataFrame = {
    val pairs = minhashNearDups(documents, threshold)
      .select(col("doc_a"), col("doc_b"))
    val edges = pairs.unionByName(
      pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b"))).cache()
    var labels = documents.select(col("doc_id"),
      col("doc_id").as("label")).cache()
    var converged = false
    var iters = 0
    while (!converged && iters < 50) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"))
        .groupBy(col("doc_a").as("doc_id"))
        .agg(min(col("label")).as("nlabel"))
      val stepped = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
      // pointer jump: label(x) := min(label(x), label(label(x))) — halves
      // remaining path lengths each round, so convergence is O(log
      // diameter) instead of O(diameter); near-dup components are usually
      // near-cliques, but a chain of pairwise-similar docs must not cost
      // a linear number of distributed rounds
      val next = stepped.join(
          stepped.select(col("doc_id").as("label"), col("label").as("jump")),
          Seq("label"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("jump"), col("label"))).as("label"))
        .cache()
      converged = next.join(labels.withColumnRenamed("label", "old"), Seq("doc_id"))
        .filter(col("label") =!= col("old")).isEmpty
      labels.unpersist()
      labels = next
      iters += 1
    }
    val sizes = labels.groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    labels.select(col("doc_id"), col("label").as("cluster_id"))
      .join(sizes, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        (col("doc_id") === col("cluster_id")).as("is_canonical"))
  }

  /** 32-bit SimHash from token hashes: bit b of the signature is the
    * sign of Σ_tokens (±1), + when token-hash bit b is set. Token hash =
    * first 8 hex digits of md5 → BIGINT (identical in both engines). */
  def simhash(documents: DataFrame): DataFrame = {
    val toks = array_distinct(split(col("text"), " "))
    // hash each distinct token once, then fold the 32 bit-planes
    val hashes = transform(toks,
      t => conv(substring(md5(t.cast("binary")), 1, 8), 16, 10).cast("bigint"))
    val withH = documents.select(col("doc_id"), hashes.as("tok_hashes"))
    val bits = (0 until 32).map { b =>
      val contrib = aggregate(col("tok_hashes"), lit(0L),
        (acc, h) => acc + when(shiftright(h, b) % 2 === 1, 1L).otherwise(-1L))
      when(contrib > 0, lit(1L << b)).otherwise(0L)
    }
    withH.select(
      col("doc_id"),
      bits.reduce(_ + _).as("simhash32"))
  }

  /** SimHash near-duplicate candidates: identical 32-bit signatures.
    * (A banded multi-probe over signature halves generalizes this to
    * hamming-distance-k; identical-signature is the k=0 case.) */
  def simhashDups(documents: DataFrame): DataFrame = {
    val s = simhash(documents)
    val a = s.select(col("doc_id").as("doc_a"), col("simhash32"))
    val b = s.select(col("doc_id").as("doc_b"), col("simhash32"))
    a.join(b, Seq("simhash32"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("simhash32"))
  }

  /** n-gram Jaccard over a cheap candidate generation: shared first
    * token as the blocking key, then exact 3-gram Jaccard ≥ threshold.
    * Demonstrates the verify stage standalone; minhashNearDups is the
    * scalable candidate generator. */
  def ngramJaccardPairs(documents: DataFrame, threshold: Double = 0.3): DataFrame = {
    val sets = withShingleSets(documents).cache()
    val keyed = documents.select(
      split(col("text"), " ").getItem(0).as("block_key"), col("doc_id"))
    val cand = keyed.select(col("block_key"), col("doc_id").as("doc_a"))
      .join(keyed.select(col("block_key"), col("doc_id").as("doc_b")),
        Seq("block_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
    jaccardVerify(cand, sets, threshold)
  }
}
