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
  * cross join. The bucket self-joins are triangle-salted
  * ([[saltedSelfPairs]]): a Zipf-hot bucket ("the …" as a block key,
  * a popular band signature) is split into SaltBuckets² join cells, so
  * the largest single task holds (bucket/S)² pairs instead of bucket²
  * — the pair SET is provably identical, only its partitioning changes.
  */
object DedupOps {

  /** Salt fan-out for hot candidate buckets. 8 caps the biggest task at
    * 1/64 of the unsalted bucket's pair count for ~4.5× row replication
    * of the (key, id) index frame — index rows are two columns, so the
    * replication is noise next to the shuffle it de-skews. */
  val SaltBuckets = 8

  /** All unordered intra-bucket pairs (id_a < id_b) of a (bucket, id)
    * frame, as an equi self-join that stays balanced under bucket skew.
    *
    * Triangle salting: each id gets a deterministic salt s =
    * pmod(hash(id), S). The left side replicates to join cells (s, j)
    * for j ∈ [s, S); the right side to (i, s) for i ∈ [0, s]. A pair
    * with salts (sa, sb), sa ≤ sb, meets in EXACTLY the cell (sa, sb)
    * — once in one direction when sa ≠ sb, once in each direction when
    * sa = sb (collapsed by the least/greatest projection + distinct).
    * Every cell holds ≤ ⌈bucket/S⌉² pairs, so one hot bucket spreads
    * over S² tasks instead of serializing on one. The output pair set
    * is byte-identical to the naive self-join — the salt never reaches
    * the result, so oracles are unaffected. */
  private def saltedSelfPairs(keyed: DataFrame, bucketCol: String,
      idCol: String): DataFrame = {
    val s = SaltBuckets
    val salted = keyed.select(col(bucketCol).as("bk"), col(idCol).as("id"),
      pmod(hash(col(idCol)), lit(s)).as("salt"))
    val left = salted
      .select(col("bk"), col("id").as("ida"), col("salt").as("i"),
        explode(sequence(col("salt"), lit(s - 1))).as("j"))
    val right = salted
      .select(col("bk"), col("id").as("idb"), col("salt").as("j"),
        explode(sequence(lit(0), col("salt"))).as("i"))
    left.join(right, Seq("bk", "i", "j"))
      .filter(col("ida") =!= col("idb"))
      .select(least(col("ida"), col("idb")).as("doc_a"),
        greatest(col("ida"), col("idb")).as("doc_b"))
      .distinct()
  }

  /** Candidate pairs from band-0 of a [[minhashSignatures]] frame —
    * THE shared single-band blocking step of the pair-verify family
    * ("one LSH index, many verify measures": Jaccard, containment,
    * edit-distance, and TextOps' sparse-cosine all consume this one
    * definition). mh0-null (shingle-less) docs are excluded: they
    * would all share one degenerate block — a single bucket holding
    * every trivial doc, O(n²) pairs at corpus scale — and each
    * oracle's sig CTE has no rows for them anyway. The block self-join
    * is triangle-salted ([[saltedSelfPairs]]). */
  private[ext] def band0Candidates(signatures: DataFrame): DataFrame =
    saltedSelfPairs(
      signatures.filter(col("mh0").isNotNull)
        .select(col("band0").as("block_key"), col("doc_id")),
      "block_key", "doc_id")

  /** [[saltedSelfPairs]] variant that carries a small per-id payload
    * column through the pair generation (pay_a/pay_b aligned with the
    * doc_a < doc_b normalization) and SKIPS the final distinct: the
    * caller filters on the payloads first, then distincts — so the
    * dedup shuffle carries only verified survivors, not every raw
    * band collision. Only worth it for payloads of a few bytes (a
    * simhash word); wide payloads (minhash arrays) should keep the
    * join-back form. */
  private def saltedSelfPairsCarrying(keyed: DataFrame, bucketCol: String,
      idCol: String, payCol: String): DataFrame = {
    val s = SaltBuckets
    val salted = keyed.select(col(bucketCol).as("bk"), col(idCol).as("id"),
      col(payCol).as("pay"), pmod(hash(col(idCol)), lit(s)).as("salt"))
    val left = salted
      .select(col("bk"), col("id").as("ida"), col("pay").as("paya"),
        col("salt").as("i"), explode(sequence(col("salt"), lit(s - 1))).as("j"))
    val right = salted
      .select(col("bk"), col("id").as("idb"), col("pay").as("payb"),
        col("salt").as("j"), explode(sequence(lit(0), col("salt"))).as("i"))
    left.join(right, Seq("bk", "i", "j"))
      .filter(col("ida") =!= col("idb"))
      .select(least(col("ida"), col("idb")).as("doc_a"),
        greatest(col("ida"), col("idb")).as("doc_b"),
        when(col("ida") < col("idb"), col("paya")).otherwise(col("payb")).as("pay_a"),
        when(col("ida") < col("idb"), col("payb")).otherwise(col("paya")).as("pay_b"))
  }

  /** Exact dedup by content hash: every document mapped to the canonical
    * survivor of its hash group — the minimum doc_id (deterministic,
    * unlike dropDuplicates' arbitrary-row-wins). `is_duplicate` marks
    * the rows a dedup pass would drop.
    *
    * Shape: groupBy + join-back, NOT a window over content_md5. A
    * boilerplate document repeated millions of times is one window
    * partition — a single task buffering (and spilling) the whole
    * group. The aggregate form partial-combines map-side (the hot hash
    * reduces to one row per map partition before the exchange), the
    * join-back reuses the groupBy's exchange (same key, same child —
    * ReusedExchange), and AQE skew-split can still divide the hot
    * key's join side. Same columns, same rows — oracle unaffected. */
  def exactDups(documents: DataFrame): DataFrame = {
    val hashed = documents
      .select(col("doc_id"), md5(col("text").cast("binary")).as("content_md5"))
    val groups = hashed.groupBy(col("content_md5"))
      .agg(min(col("doc_id")).as("canonical_doc_id"),
        count(lit(1)).as("group_size"))
    hashed.join(groups, Seq("content_md5"))
      .select(col("doc_id"), col("content_md5"),
        col("canonical_doc_id"), col("group_size"),
        (col("doc_id") =!= col("canonical_doc_id")).as("is_duplicate"))
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
    * multiplies it by the candidate count; measured 40× slower).
    * Public ([[shingleSets]]) so a suite can build it once and feed
    * every `*From` variant below. */
  def shingleSets(documents: DataFrame): DataFrame =
    withShingleSets(documents)

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
      threshold: Double): DataFrame =
    intersectionCounts(cand, sets)
      .withColumn("jaccard",
        col("ni").cast("double") /
          (col("n_a") + col("n_b") - col("ni")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))

  /** (doc_a, doc_b, ni, n_a, n_b): the shared relational
    * intersection-count core both normalizations (Jaccard,
    * containment) derive from — ONE definition of the tuned verify
    * shape (the scaladoc above explains why it must stay relational;
    * measured 650s vs seconds for the per-pair expression form). */
  private def intersectionCounts(cand: DataFrame, sets: DataFrame): DataFrame = {
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
  }

  /** MinHash/LSH near-duplicate pairs: docs sharing any band bucket,
    * verified with exact shingle Jaccard ≥ threshold. The band join is
    * a triangle-salted equi self-join on the band key
    * ([[saltedSelfPairs]] — hash-partitioned, skew-bounded, no cross
    * product); band indices are prefixed onto the bucket key so equal
    * signature strings in different bands stay separate buckets, and
    * the distinct inside the pair join collapses pairs colliding in
    * several bands. */
  /** (doc_id, band) LSH index rows — one row per (doc, band index),
    * the key format every band join here shares and the stored band
    * index of streaming ingestion ([[graft.streaming.CorpusIngest]]).
    * Band indices are prefixed onto the bucket key so equal signature
    * strings in different bands stay separate buckets. */
  def bandKeys(documents: DataFrame): DataFrame =
    bandKeysFrom(minhashSignatures(documents))

  /** [[bandKeys]] over an already-built (possibly cached/stored)
    * signatures frame — the index-derivation a real pipeline runs over
    * its persisted signature table rather than from raw text. */
  def bandKeysFrom(signatures: DataFrame): DataFrame = {
    // Shingle-less docs (null text) have null minhash values, which
    // concat_ws would collapse into ONE shared degenerate band per index
    // — a single block holding every trivial doc, O(n²) candidate pairs
    // among them at corpus scale. The oracle's `sh` CTE has no rows for
    // such docs (UNNEST of nothing), so dropping them here matches its
    // implicit exclusion; the Jaccard verify would discard their pairs
    // anyway (no shingles → empty intersection).
    val sigs = signatures.filter(col("mh0").isNotNull)
    val bandCols = (0 until NumHashes / BandSize).map(b => s"band$b")
    sigs.select(col("doc_id"),
      explode(array(bandCols.zipWithIndex.map { case (c, i) =>
        concat_ws("#", lit(i), col(c))
      }: _*)).as("band"))
  }

  /** Exact-Jaccard verification of externally generated candidate
    * pairs (doc_a, doc_b) against the docs frame — the public bipartite
    * face of the relational verify stage. `docs` must contain every id
    * the pairs reference. */
  def verifyJaccardPairs(cand: DataFrame, docs: DataFrame,
      threshold: Double): DataFrame =
    jaccardVerify(cand, withShingleSets(docs).cache(), threshold)

  def minhashNearDups(documents: DataFrame, threshold: Double = 0.5): DataFrame = {
    // cache: the band self-join and the verify stage reference these
    // frames from several subtrees, and Spark's broadcast-subtree jobs
    // would otherwise recompute the whole interpreted shingle+hash
    // pipeline once per reference (3× measured). The cached plan is also
    // shared with dedup_ngram / text_fingerprint in the same session.
    minhashNearDupsFrom(
      withShingleSets(documents).cache(), bandKeys(documents).cache(), threshold)
  }

  /** [[minhashNearDups]] over precomputed shingle-set and band-key
    * frames ([[shingleSets]] / [[bandKeys]] output, cached or read from
    * a stored index) — lets one signature build feed the pair query,
    * clustering, PageRank, and the dataset-card report in a single
    * suite run instead of re-hashing the corpus per consumer. */
  def minhashNearDupsFrom(sets: DataFrame, bands: DataFrame,
      threshold: Double): DataFrame = {
    val cand = saltedSelfPairs(bands, "band", "doc_id")
    jaccardVerify(cand, sets, threshold)
  }

  /** MinHash estimator accuracy eval: for every LSH candidate pair, the
    * signature-estimated Jaccard (matching-minima fraction, the
    * statistic the banding THRESHOLD is derived from) next to the exact
    * shingle Jaccard and their absolute error — the measurement that
    * decides whether NumHashes is large enough before trusting the
    * estimate at corpus scale (same role as [[graft.ext.EmbedOps]]'
    * PQ/IVF recall evals on the ANN side).
    *
    * Exactness: `matches` is an integer positional compare of the two
    * md5-derived signatures; est/exact/err are three deterministic
    * single-op doubles. Zero-intersection candidates are KEPT (exact
    * Jaccard 0 via left join + coalesce) — an estimator eval that
    * silently dropped the estimator's false positives would flatter it.
    *
    * Scale posture: the candidate join is the triangle-salted band
    * self-join every other minhash consumer uses; signatures attach by
    * two equi joins on doc id (8 longs of payload per row), and the
    * verify side reuses the relational intersection count. */
  def minhashEstimateEvalFrom(sets: DataFrame, sigs: DataFrame,
      bands: DataFrame): DataFrame = {
    val cand = saltedSelfPairs(bands, "band", "doc_id")
    val sigArr = sigs.filter(col("mh0").isNotNull).select(col("doc_id"),
      array((0 until NumHashes).map(j => col(s"mh$j")): _*).as("sig"))
    val withSig = cand
      .join(sigArr.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")),
        Seq("doc_a"))
      .join(sigArr.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")),
        Seq("doc_b"))
      .withColumn("matches", aggregate(
        zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v))
    val ex = sets.select(col("doc_id"), explode(col("sh")).as("s"))
    val inter = cand
      .join(ex.select(col("doc_id").as("doc_a"), col("s")), Seq("doc_a"))
      .join(ex.select(col("doc_id").as("doc_b"), col("s")), Seq("doc_b", "s"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("ni"))
    val sizes = sets.select(col("doc_id"), col("n_sh"))
    withSig.join(inter, Seq("doc_a", "doc_b"), "left")
      .na.fill(0L, Seq("ni"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")),
        Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")),
        Seq("doc_b"))
      .withColumn("est_jaccard", col("matches").cast("double") / NumHashes)
      .withColumn("jaccard", col("ni").cast("double") /
        (col("n_a") + col("n_b") - col("ni")).cast("double"))
      .select(col("doc_a"), col("doc_b"), col("matches"),
        col("est_jaccard"), col("jaccard"),
        abs(col("est_jaccard") - col("jaccard")).as("abs_err"))
  }

  /** Near-duplicate CLUSTERS: connected components over the MinHash pair
    * graph ([[Graph.connectedComponents]] — min-label propagation with
    * pointer jumping, O(log diameter) distributed rounds) — the step a
    * real dedup pipeline runs on top of pair output (keep one canonical
    * doc per component, drop the rest).
    *
    * Deterministic: component id = min doc_id of the component. */
  def nearDupClusters(documents: DataFrame, threshold: Double = 0.5): DataFrame =
    nearDupClustersFrom(documents.select(col("doc_id")),
      minhashNearDups(documents, threshold))

  /** [[nearDupClusters]] over a precomputed verified pair frame —
    * clustering as a cheap derivation of the materialized pair output,
    * not a second minhash pass. `vertices` is the full doc-id universe
    * (singletons must appear as their own clusters). */
  def nearDupClustersFrom(vertices: DataFrame, pairs: DataFrame): DataFrame = {
    val labels = Graph.connectedComponents(
      vertices, pairs.select(col("doc_a"), col("doc_b")))
    Graph.clusterSummary(labels, "doc_id")
  }

  /** 32-bit SimHash from token hashes: bit b of the signature is the
    * sign of Σ_tokens (±1), + when token-hash bit b is set. Token hash =
    * first 8 hex digits of md5 → BIGINT (identical in both engines).
    *
    * Computed by the native codegen'd [[graft.functions.SimHash32]]
    * expression — one compiled pass per document. The declarative form
    * ([[simhashDeclarative]]) pays 32 interpreted `aggregate` passes
    * per document (lambdas don't codegen); the spec pins the two
    * bit-equal. */
  def simhash(documents: DataFrame): DataFrame = {
    graft.functions.SimHash32.register(documents.sparkSession)
    documents.select(col("doc_id"), expr("simhash32(text)").as("simhash32"))
  }

  /** Built-ins-only SimHash (the pre-round-6 form), kept as the
    * reference implementation the native expression is verified
    * against. */
  def simhashDeclarative(documents: DataFrame): DataFrame = {
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

  /** SimHash near-duplicate pairs within hamming distance k, via a
    * banded multi-probe: the 32-bit signature splits into 4 byte
    * bands; candidates are pairs sharing ANY (band_index, byte) key —
    * an equi join, never all-pairs — then verified with an exact
    * popcount(xor) ≤ k.
    *
    * By pigeonhole the probe is EXACT for k ≤ 3: at most k of the 32
    * bits differ, so at most k of the 4 bands are touched and at least
    * one band is identical — every qualifying pair IS a candidate.
    * For k > 3 recall drops (a pair may differ in all 4 bands); callers
    * wanting larger k re-band with ⌈k⌉+1 wider bands — same shape.
    * The band self-join is triangle-salted ([[saltedSelfPairs]]) like
    * every other bucket join here: popular signatures (boilerplate
    * docs) would otherwise pile one band bucket onto one reducer. */
  def simhashHammingPairs(documents: DataFrame, k: Int = 3): DataFrame = {
    require(k <= 3, s"4-byte banding is exact only for k <= 3, got $k")
    // The 4-byte signature rides through the pair join as the payload
    // (saltedSelfPairsCarrying), so the hamming verify runs BEFORE the
    // pair distinct: no join-back to the signature frame, and the
    // distinct's shuffle carries only verified survivors — raw band
    // collisions (up to 4 per true pair) die map-side in codegen.
    val banded = simhash(documents).select(col("doc_id"), col("simhash32"),
      explode(array((0 until 4).map(b =>
        concat_ws("#", lit(b),
          shiftright(col("simhash32"), b * 8) % 256)): _*)).as("band"))
    saltedSelfPairsCarrying(banded, "band", "doc_id", "simhash32")
      .withColumn("hamming",
        expr("cast(bit_count(pay_a ^ pay_b) as bigint)"))
      .filter(col("hamming") <= k)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .distinct()
  }

  /** [[simhashHammingPairs]] on the WIDE 60-bit signature
    * ([[graft.functions.SimHash60]]) — the corpus-scale form: the 10×
    * scale probe measured 32-bit pair output growing 14× at 10× docs
    * (random collisions are quadratic in corpus size over a fixed
    * signature space; BENCH_TREND.md r11), and 2³⁰× more signature
    * space pushes that saturation out past any realistic corpus.
    * Six 10-bit bands make the probe exact for k ≤ 5 by pigeonhole;
    * the verify is the same popcount(xor) ≤ k before the distinct. */
  def simhash60HammingPairs(documents: DataFrame, k: Int = 3): DataFrame = {
    require(k <= 5, s"6-band 60-bit probing is exact only for k <= 5, got $k")
    graft.functions.SimHash60.register(documents.sparkSession)
    val sigs = documents.select(col("doc_id"),
      expr("simhash60(text)").as("simhash60"))
    val banded = sigs.select(col("doc_id"), col("simhash60"),
      explode(array((0 until 6).map(b =>
        concat_ws("#", lit(b),
          shiftright(col("simhash60"), b * 10) % 1024)): _*)).as("band"))
    saltedSelfPairsCarrying(banded, "band", "doc_id", "simhash60")
      .withColumn("hamming",
        expr("cast(bit_count(pay_a ^ pay_b) as bigint)"))
      .filter(col("hamming") <= k)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .distinct()
  }

  /** SimHash near-duplicate candidates: identical 32-bit signatures.
    * ([[simhashHammingPairs]] generalizes this to hamming-distance-k;
    * identical-signature is the k=0 case.)
    *
    * The signature self-join goes through [[saltedSelfPairs]] like every
    * other bucket join here: a popular signature (boilerplate docs
    * hashing identically) is a hot bucket, and salting spreads its
    * pairs over SaltBuckets² tasks. The shared signature rides through
    * the pair join as the payload — pairs only ever form inside one
    * bucket, so either side's signature IS the pair's signature, and
    * no join-back is needed. */
  def simhashDups(documents: DataFrame): DataFrame = {
    val s = simhash(documents)
    saltedSelfPairsCarrying(
      s.select(col("simhash32"), col("doc_id")), "simhash32", "doc_id",
      "simhash32")
      .select(col("doc_a"), col("doc_b"), col("pay_a").as("simhash32"))
      .distinct()
  }

  /** n-gram Jaccard pairs over SINGLE-BAND minhash blocking: candidates
    * share band 0 (the first [[BandSize]] minhash values), then verify
    * with exact 3-gram Jaccard ≥ threshold. One band instead of the full
    * [[minhashNearDups]] LSH index trades recall (P[candidate] = s^BandSize
    * for true Jaccard s, vs 1-(1-s^r)^b over all bands) for a 4× smaller
    * candidate index — the cheap single-probe point on the same curve.
    *
    * Block sizes are bounded by construction: band keys are minhash
    * outputs, uniform over 2⁶⁴ pairs of values, so no natural-language
    * Zipf skew reaches the blocking key and pair counts stay linear in
    * true-duplicate density — unlike first-token blocking
    * ([[firstTokenJaccardPairs]], kept as the skew demo), whose hottest
    * block ("The …") is inherently quadratic. The block self-join still
    * goes through [[saltedSelfPairs]] for the residual hot bucket (a
    * boilerplate signature shared by thousands of identical docs). */
  def ngramJaccardPairs(documents: DataFrame, threshold: Double = 0.3): DataFrame =
    ngramJaccardPairsFrom(withShingleSets(documents).cache(),
      minhashSignatures(documents), threshold)

  /** [[ngramJaccardPairs]] over precomputed shingle-set and signature
    * frames — band 0 of the shared signature build is the blocking
    * key, so the suite's one signature pass also feeds this query. */
  def ngramJaccardPairsFrom(sets: DataFrame, signatures: DataFrame,
      threshold: Double): DataFrame =
    jaccardVerify(band0Candidates(signatures), sets, threshold)

  /** Asymmetric CONTAINMENT near-dup pairs: C(A⊆B) = |sh(A)∩sh(B)| /
    * |sh(A)| — the overlap measure that catches a short document
    * embedded verbatim inside a long one, which symmetric Jaccard
    * misses entirely (a 100-line doc quoted inside a 10 000-line doc
    * has Jaccard ≈ 0.01 but containment ≈ 1.0). This is the dedup
    * axis for quote-heavy / boilerplate-wrapped web corpora, where the
    * decision is usually "drop the contained doc, keep the container".
    *
    * Candidates come from the same single-band minhash blocking as
    * [[ngramJaccardPairsFrom]] (uniform band keys — no Zipf skew
    * reaches the blocking key) and the verify is the same relational
    * intersection count; only the final normalization differs: both
    * directed containments are emitted, plus the max as the pair
    * score. Note minhash LSH recall is driven by JACCARD, so extreme
    * size-ratio pairs (tiny A in huge B) need the band probability of
    * their Jaccard — a production sweep at 100 TB would add a
    * suffix-prefix band family; the blocked shape is unchanged. */
  def containmentPairs(documents: DataFrame, threshold: Double = 0.6): DataFrame =
    containmentPairsFrom(withShingleSets(documents).cache(),
      minhashSignatures(documents), threshold)

  /** [[containmentPairs]] over precomputed shingle-set and signature
    * frames (shared-build contract of the `*From` family). */
  def containmentPairsFrom(sets: DataFrame, signatures: DataFrame,
      threshold: Double): DataFrame =
    intersectionCounts(band0Candidates(signatures), sets)
      .withColumn("cont_in_b", col("ni").cast("double") / col("n_a").cast("double"))
      .withColumn("cont_in_a", col("ni").cast("double") / col("n_b").cast("double"))
      .withColumn("containment", greatest(col("cont_in_a"), col("cont_in_b")))
      .filter(col("containment") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        col("cont_in_b"), col("cont_in_a"), col("containment"))

  /** Edit-distance near-dup pairs — the FUZZY-MATCH family (OCR noise,
    * typo farms, template fills) that set-overlap measures miss: two
    * docs one character-edit apart per line still share most shingles,
    * but two docs differing by systematic character substitutions
    * (OCR l→1, smart quotes) can lose every 3-gram while staying a
    * trivial edit distance away. Verified with `levenshtein()` —
    * unit-cost Wagner-Fischer in BOTH engines, exact integer — over a
    * fixed-length prefix, which bounds the O(p²) DP cost per pair at
    * a constant independent of document length.
    *
    * Candidates come from the same uniform band-0 minhash blocking as
    * the other pair families (one blocking index, many verify
    * measures — the production shape: you build the LSH index once
    * and run every verifier over its candidate stream). */
  def editDistancePairsFrom(documents: DataFrame, signatures: DataFrame,
      maxDist: Int = 20, prefixLen: Int = 80): DataFrame = {
    val pre = documents.select(col("doc_id"),
      substring(col("text"), 1, prefixLen).as("pre"))
    band0Candidates(signatures)
      .join(pre.select(col("doc_id").as("doc_a"), col("pre").as("pre_a")),
        Seq("doc_a"))
      .join(pre.select(col("doc_id").as("doc_b"), col("pre").as("pre_b")),
        Seq("doc_b"))
      .withColumn("edit_dist", levenshtein(col("pre_a"), col("pre_b")))
      .filter(col("edit_dist") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("edit_dist"))
  }

  /** First-token blocking + exact Jaccard verify — the pre-round-7 form
    * of [[ngramJaccardPairs]], retained ONLY as the skew demonstration
    * for DedupSkewSpec: the first token is Zipf-distributed, so one
    * block ("The …") holds a large corpus fraction and its pair count
    * is O(block²) no matter how the join is partitioned.
    * [[saltedSelfPairs]] bounds the per-TASK cost (the hot block spreads
    * over SaltBuckets² cells) but cannot reduce the pair COUNT — which
    * is why minhash banding, not a natural-language attribute, is the
    * blocking key of record at corpus scale. Not exported in
    * SparkEntry.queries. */
  def firstTokenJaccardPairs(documents: DataFrame, threshold: Double = 0.3): DataFrame = {
    val sets = withShingleSets(documents).cache()
    val keyed = documents.select(
      split(col("text"), " ").getItem(0).as("block_key"), col("doc_id"))
    val cand = saltedSelfPairs(keyed, "block_key", "doc_id")
    jaccardVerify(cand, sets, threshold)
  }

  /** Document centrality on the near-dup graph: integer-exact PageRank
    * ([[Graph.pageRank]]) over the verified MinHash pair graph — the
    * hub ranking that picks cluster representatives by how much of the
    * duplicate neighborhood points at them, where
    * [[nearDupClusters]]' min-id canonical is purely positional. */
  def nearDupPageRank(documents: DataFrame, threshold: Double = 0.5,
      iters: Int = 3): DataFrame =
    nearDupPageRankFrom(documents.select(col("doc_id")),
      minhashNearDups(documents, threshold), iters)

  /** [[nearDupPageRank]] over a precomputed verified pair frame (same
    * reuse contract as [[nearDupClustersFrom]]). */
  def nearDupPageRankFrom(vertices: DataFrame, pairs: DataFrame,
      iters: Int = 3): DataFrame =
    Graph.pageRank(vertices, pairs.select(col("doc_a"), col("doc_b")), iters)
      .select(col("id").as("doc_id"), col("rank_scaled"))

  /** Incremental dedup: the ingestion-time complement of the batch
    * passes above. An existing corpus is represented only by its
    * content-hash SNAPSHOT (here: the even doc_ids, standing in for
    * yesterday's fingerprint table); incoming documents (odd doc_ids)
    * keep only content the snapshot has never seen — one left-anti
    * equi join on the hash.
    *
    * Scale posture: this is THE join shape for continuous corpus
    * ingestion at 100 TB — the snapshot side is a narrow one-column
    * frame (16-byte hash per historical doc), orders of magnitude
    * smaller than the corpus it summarizes; the anti join
    * hash-partitions on the digest (uniform by construction, no skew),
    * and AQE broadcasts the snapshot while it fits. The same shape
    * extends to minhash-band fingerprints for incremental NEAR-dup. */
  def incrementalNewDocs(documents: DataFrame): DataFrame =
    incrementalNewDocsFrom(documents, storedDigestIndex(documents))

  /** (content_md5, h): the stored corpus's distinct digest index (even
    * doc_ids = the "already ingested" side of the incremental fixture).
    * In a real pipeline this IS a persisted table the ingest job
    * appends to — so the suite builds it once (SparkEntry memoizes)
    * and every incremental variant probes the same frame. */
  def storedDigestIndex(documents: DataFrame): DataFrame =
    documents.filter(col("doc_id") % 2 === 0)
      .select(md5(col("text").cast("binary")).as("content_md5"),
        xxhash64(col("text")).as("h"))
      .distinct()

  /** [[incrementalNewDocs]] against a prebuilt [[storedDigestIndex]]. */
  def incrementalNewDocsFrom(documents: DataFrame, snap: DataFrame): DataFrame =
    documents.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("content_md5"))
      .join(snap.select(col("content_md5")), Seq("content_md5"), "left_anti")
      .select(col("doc_id"), col("content_md5"))

  /** Relational Bloom-filter build over a `h: bigint` hash column: each
    * key sets k bits (same double-hash formula as
    * [[graft.functions.BloomMightContain]] — that textual equality is
    * the no-false-negatives invariant), bits OR-combine per 64-bit word
    * with a map-side-combinable bit_or, and the ≤ `words` sparse rows
    * densify into ONE `bloom: array<bigint>` row. No driver round-trip,
    * no custom aggregation buffer: the sketch is built by the same
    * shuffle machinery as any aggregate, then broadcast as a k-row-class
    * artifact (1024 words = 8 KB). All position arithmetic is bounded
    * below m·(k+1), so ANSI and non-ANSI runs produce identical bits. */
  def bloomBits(hashes: DataFrame, words: Int = 1024, k: Int = 5): DataFrame = {
    val m = words * 64L
    val h1 = shiftrightunsigned(col("h"), 1) % m
    val h2 = (shiftrightunsigned(col("h"), 33) % (m - 1)).bitwiseOR(lit(1L))
    hashes
      .select(h1.as("h1"), h2.as("h2"),
        explode(sequence(lit(0), lit(k - 1))).as("i"))
      .select((((col("h1") + col("i") * col("h2")) % m)).as("pos"))
      .select(shiftrightunsigned(col("pos"), 6).as("word"),
        expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").as("mask"))
      .groupBy(col("word")).agg(bit_or(col("mask")).as("bits"))
      .agg(map_from_arrays(
        collect_list(col("word")), collect_list(col("bits"))).as("mm"))
      .select(transform(sequence(lit(0), lit(words - 1)),
        i => coalesce(try_element_at(col("mm"), i.cast("long")), lit(0L)))
        .as("bloom"))
  }

  /** [[incrementalNewDocs]] with a Bloom prefilter — the shape that
    * actually runs at 100-TB ingest: the stored snapshot index is
    * summarized once into an 8 KB bitset ([[bloomBits]]), broadcast to
    * every batch partition, and probed by the codegen'd
    * `bloom_might_contain` INSIDE the batch scan. Rows the bloom
    * rejects are DEFINITIVELY new (no false negatives, by shared
    * formula + shared key hash) and never reach a shuffle; only the
    * bloom-positive sliver — true dups plus an FP-rate's worth of
    * innocents — pays the exact anti-join against the snapshot. The
    * result is therefore EXACTLY [[incrementalNewDocs]]'s output (same
    * oracle), the bloom only re-routes rows between the cheap and the
    * exact path. With n/m ≈ 0.03 keys per bit and k = 5, the FP rate is
    * ~1e-7 — the anti-join input shrinks to essentially the true-dup
    * set. */
  def incrementalNewDocsBloom(documents: DataFrame,
      words: Int = 1024, k: Int = 5): DataFrame = {
    // cache lifetime is CALLER-MANAGED (same policy as the other
    // convenience forms): snapshot feeds both the bloom build and the
    // exact verify join.
    incrementalNewDocsBloomFrom(documents,
      storedDigestIndex(documents).cache(), words, k)
  }

  /** [[incrementalNewDocsBloom]] against a prebuilt (and ideally
    * suite-shared) [[storedDigestIndex]] — the index feeds BOTH the
    * bloom build and the exact verify join, so sharing it is the
    * difference between one and two passes over the stored corpus. */
  def incrementalNewDocsBloomFrom(documents: DataFrame, snap: DataFrame,
      words: Int = 1024, k: Int = 5): DataFrame = {
    graft.functions.BloomMightContain.register(documents.sparkSession)
    val bloom = bloomBits(snap.select(col("h")), words, k)
    val batch = documents.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("content_md5"),
        xxhash64(col("text")).as("h"))
      .crossJoin(broadcast(bloom))
      .withColumn("might", expr(s"bloom_might_contain(bloom, h, $k)"))
    val definiteNew = batch.filter(!col("might"))
      .select(col("doc_id"), col("content_md5"))
    val verifiedNew = batch.filter(col("might"))
      .join(snap.select(col("content_md5")), Seq("content_md5"), "left_anti")
      .select(col("doc_id"), col("content_md5"))
    definiteNew.unionByName(verifiedNew)
  }

  /** Incremental NEAR-dup: [[incrementalNewDocs]] generalized from
    * exact content hashes to minhash bands — incoming documents (odd
    * doc_ids) that have NO near-duplicate (Jaccard ≥ threshold) in the
    * snapshot corpus (even doc_ids). Candidates come from a BIPARTITE
    * band join (incoming band keys ⋈ snapshot band keys — the
    * snapshot side of a real pipeline is a stored band-key index, one
    * row per (band, doc)); candidates verify with the shared relational
    * Jaccard stage, and verified duplicates anti-join away.
    *
    * Scale posture: incoming is a micro-batch, snapshot keys a stored
    * index — the join probes |batch| × band-collisions, never corpus²;
    * band keys are minhash outputs (uniform, no skew). */
  def incrementalNewNearDocs(documents: DataFrame, threshold: Double = 0.5): DataFrame =
    incrementalNewNearDocsFrom(documents,
      withShingleSets(documents).cache(), bandKeys(documents).cache(), threshold)

  /** [[incrementalNewNearDocs]] over the suite's shared shingle-set and
    * band-key frames. */
  def incrementalNewNearDocsFrom(documents: DataFrame, sets: DataFrame,
      keyed: DataFrame, threshold: Double): DataFrame = {
    val incoming = keyed.filter(col("doc_id") % 2 === 1)
      .select(col("band"), col("doc_id").as("doc_a"))
    val snapshot = keyed.filter(col("doc_id") % 2 === 0)
      .select(col("band"), col("doc_id").as("doc_b"))
    val cand = incoming.join(snapshot, Seq("band"))
      .select(col("doc_a"), col("doc_b")).distinct()
    val dupIncoming = jaccardVerify(cand, sets, threshold)
      .select(col("doc_a").as("doc_id")).distinct()
    documents.filter(col("doc_id") % 2 === 1).select(col("doc_id"))
      .join(dupIncoming, Seq("doc_id"), "left_anti")
  }
}
