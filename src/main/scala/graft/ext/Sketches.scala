package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable cardinality/frequency sketches built RELATIONALLY — no
  * custom aggregation buffers, no driver round-trips: the sketch rows
  * are produced by the same map-side-combinable groupBy machinery as
  * any aggregate, so they shard, merge, and checkpoint like ordinary
  * data. Both sketches here are PURE FUNCTIONS of the data (md5-derived
  * hashes, integer counters), so — unlike HLL register bytes or
  * t-digest centroids, which are engine-specific and gate rows-only —
  * every value hash-matches a DuckDB oracle end to end.
  */
object Sketches {

  /** 60-bit engine-portable uniform hash (15 hex chars of md5).
    * Shared with [[graft.streaming.CorpusIngest.updateKmvSketch]] so
    * the streaming sketch and the batch sketch agree bit-for-bit. */
  private[graft] def h60(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("bigint")

  /** KMV (k-minimum-values) distinct-count estimate over document
    * content. The sketch is the k smallest DISTINCT hash values; with
    * hashes uniform on [0, 2⁶⁰), the k-th minimum v_k estimates
    * distinct count as (k−1) · 2⁶⁰ / v_k. The estimate is a pure
    * function of the data (one double multiply + one divide at the
    * end), so the whole approximate-distinct path is hash-gated — the
    * deterministic complement of [[Analytics]]'s HLL query, whose
    * register bytes are engine-specific and gate rows-only.
    *
    * Scale posture: `distinct → orderBy(hv) → limit k` executes as
    * per-partition partial top-k (TakeOrderedAndProject) — k rows per
    * partition move, never the corpus. Sketches from disjoint shards
    * merge by unioning value sets and re-taking the k smallest (the
    * textbook KMV merge); the exact countDistinct alongside is the
    * EVALUATION column, same status as the recall evals' exact top-k. */
  def kmvDistinct(documents: DataFrame, k: Int = 64): DataFrame = {
    val mins = kmvMins(documents.select(h60(col("text")).as("hv")), k)
    val exact = documents.agg(
      countDistinct(col("text")).as("n_distinct_exact"))
    kmvEstimateFrom(mins, k).crossJoin(exact)
  }

  /** The k smallest distinct values of an `hv` column — the KMV sketch
    * frame, shared by [[kmvDistinct]] and the streaming maintenance
    * path ([[graft.streaming.CorpusIngest.updateKmvSketch]]) so the
    * two stay bit-for-bit identical by construction, not by parallel
    * maintenance. Null hashes (null input text) are excluded: Spark
    * sorts nulls FIRST while DuckDB sorts them LAST, and a null would
    * otherwise occupy a min slot forever once persisted. */
  private[graft] def kmvMins(hv: DataFrame, k: Int): DataFrame =
    hv.filter(col("hv").isNotNull).distinct().orderBy(col("hv")).limit(k)

  /** (k, vk, n_distinct_est) over a mins frame: the (k−1)·2⁶⁰/v_k
    * estimator with the small-set refinement — below capacity the
    * sketch IS the distinct set, so the exact size is free (the same
    * refinement [[kmvShingleOverlap]] applies to est_union). */
  private[graft] def kmvEstimateFrom(mins: DataFrame, k: Int): DataFrame =
    mins.agg(count(lit(1)).as("k"), max(col("hv")).as("vk"))
      .select(col("k"), col("vk"),
        when(col("k") < k, col("k").cast("double"))
          .otherwise((col("k") - 1).cast("double")
            * lit(1152921504606846976L).cast("double") / col("vk"))
          .as("n_distinct_est"))

  /** HLL bucket-count exponent (m = 2⁴ = 16 registers per group) —
    * small on purpose: the gate data (150/1500 distinct users per type
    * at sf0.01/0.1) must sit in the raw-estimator regime (raw > 2.5m,
    * no empty buckets) so the whole row is a pure function of the data
    * and hash-gates; a production caller would raise b. */
  private[graft] val HllB = 4
  private[graft] val HllM = 1 << HllB // 16
  private val HllWBits = 60 - HllB // rank field width
  private val HllRankCap = HllWBits + 1 // rank of an all-zero field
  /** α₁₆·m²·2⁵⁷ as ONE double literal (α₁₆ = 0.673, Flajolet et al.
    * 2007), precomputed so Spark and the DuckDB oracle parse the
    * identical IEEE value instead of each folding 0.673·256·2⁵⁷. */
  private val HllC = 2.482931752321306e19

  /** Deterministic HyperLogLog distinct-user estimate per event type —
    * the third mergeable sketch family, with the third merge law:
    * registers merge by position-wise MAX (KMV: union + re-take-k;
    * CMS: position-wise SUM). Unlike Spark's `approx_count_distinct`
    * (whose HLL++ register bytes are engine-specific and can only gate
    * rows-only), every piece here is a pure function of the data: the
    * 60-bit md5 hash splits into a 4-bit bucket and a 56-bit rank
    * field, the register is max(leading-zeros+1), and the harmonic
    * denominator Σ 2^(−M_j) is kept as the EXACT integer Σ 2^(57−M_j)
    * (≤ 16·2⁵⁷ = 2⁶¹, inside bigint), so the estimate is one double
    * divide of exact integers — the whole row hash-gates against
    * DuckDB, estimate included. The small-range linear-counting branch
    * (raw ≤ 2.5m ∧ empty buckets) uses ln and is therefore NOT
    * hash-portable bit-for-bit — it is dormant at every gated SF
    * (raw = 135/1481 at sf0.01/0.1, z_empty = 0) and pinned against a
    * plain-Scala reference in SketchesSpec instead.
    *
    * Scale posture: registers are a map-side-combined
    * groupBy(type, bucket).max — ≤ m rows per (type, partition) reach
    * the shuffle regardless of event volume, and the estimate runs
    * over ≤ m·|types| rows. Register frames from disjoint shards (or
    * stream batches — [[graft.streaming.CorpusIngest.updateHllSketch]])
    * merge by the same groupBy-max, so "how many distinct users has
    * each type ever seen" is answerable from m·|types| rows without a
    * rescan. The exact countDistinct alongside is the EVALUATION
    * column, same status as kmvDistinct's. */
  def hllDistinct(events: DataFrame): DataFrame = {
    val est = hllEstimateFrom(hllRegisters(events))
    val exact = events.filter(col("user_id").isNotNull)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_distinct_exact"))
    est.join(exact, Seq("event_type"))
  }

  /** The per-(type, bucket) max-rank register frame — the mergeable
    * artifact, shared by [[hllDistinct]] and the streaming maintenance
    * path so batch and stream registers agree bit-for-bit. Rank =
    * leading zeros of the 56-bit field + 1, computed integrally as
    * 57 − bitlength(w) (`bin` renders without leading zeros in both
    * engines; the w = 0 case is the cap, 57). */
  private[graft] def hllRegisters(events: DataFrame): DataFrame = {
    val w = col("hv").bitwiseAND(lit((1L << HllWBits) - 1))
    events.filter(col("user_id").isNotNull)
      .select(col("event_type"),
        h60(col("user_id").cast("string")).as("hv"))
      .select(col("event_type"),
        shiftright(col("hv"), HllWBits).as("bucket"),
        when(w === 0L, lit(HllRankCap))
          .otherwise(lit(HllRankCap) - length(bin(w))).as("rank"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(max(col("rank")).as("mreg"))
  }

  /** (z_empty, s_scaled, raw_est, hll_est) per type over a register
    * frame. s_scaled = Σ 2^(57−M_j) with empty buckets contributing
    * 2⁵⁷ — exact; raw_est = α·m²·2⁵⁷ / s_scaled — one divide. */
  private[graft] def hllEstimateFrom(regs: DataFrame): DataFrame = {
    val m = HllM.toLong
    val raw = lit(HllC) / col("s_scaled")
    regs.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_obs"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllRankCap - mreg)"))
          .as("s_obs"))
      .select(col("event_type"),
        (lit(m) - col("n_obs")).as("z_empty"),
        (col("s_obs") + (lit(m) - col("n_obs")) * lit(1L << HllRankCap))
          .as("s_scaled"))
      .select(col("event_type"), col("z_empty"), col("s_scaled"),
        raw.as("raw_est"),
        when(raw <= lit(2.5 * HllM) && col("z_empty") > 0L,
          lit(HllM.toDouble)
            * log(lit(HllM.toDouble) / col("z_empty").cast("double")))
          .otherwise(raw).as("hll_est"))
  }

  /** Count-min sketch over event types: `depth` independent hash rows
    * of `width` counters; each occurrence increments one counter per
    * row, a point query reads the MINIMUM across rows — never an
    * underestimate, over only on collision. Built as one explode +
    * map-side-combined groupBy (≤ depth·width rows per partition
    * reach the shuffle regardless of event volume); the query side
    * joins the |types|-row frame to the ≤ depth·width-row counter
    * frame — broadcast-sized at any corpus scale. Counter frames from
    * disjoint shards merge by summing position-wise — the property
    * that makes CMS the standard heavy-hitter sketch on streams.
    *
    * The exact per-type count alongside is the evaluation column; the
    * spec forces collisions at tiny width to prove the ≥-exact bound. */
  def countMinTypes(events: DataFrame, depth: Int = 4,
      width: Int = 1024): DataFrame = {
    val pos = h60(concat(col("j").cast("string"), lit(":"),
      col("event_type"))) % width
    val counters = cmsCounters(events, depth, width)
    val typeKeys = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_exact"))
      .select(col("event_type"), col("n_exact"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .select(col("event_type"), col("n_exact"), col("j"), pos.as("pos"))
    typeKeys.join(broadcast(counters), Seq("j", "pos"))
      .groupBy(col("event_type"), col("n_exact"))
      .agg(min(col("cnt")).as("cms_est"))
      .select(col("event_type"), col("n_exact"), col("cms_est"))
  }

  /** The depth×width counter frame of a count-min sketch over
    * event_type — the mergeable (position-wise sum) artifact, shared
    * by [[countMinTypes]] and the streaming maintenance path
    * ([[graft.streaming.CorpusIngest.updateCmsSketch]]) so batch and
    * stream counters agree by construction. */
  private[graft] def cmsCounters(events: DataFrame, depth: Int,
      width: Int): DataFrame = {
    val pos = h60(concat(col("j").cast("string"), lit(":"),
      col("event_type"))) % width
    // aggregate per type BEFORE hashing: cell count = Σ counts of the
    // types hashing there, so exploding the tiny per-type frame (|types|
    // × depth rows) is cell-for-cell identical to exploding the event
    // stream — but the md5 position hash runs |types|·depth times
    // instead of |events|·depth, and the only event-volume-sized work
    // left is the map-side-combined type count
    events.groupBy(col("event_type")).agg(count(lit(1)).as("c"))
      .select(col("event_type"), col("c"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .select(col("c"), col("j"), pos.as("pos"))
      .groupBy(col("j"), col("pos"))
      .agg(sum(col("c")).as("cnt"))
  }

  /** Point-query `keys` against a counter frame: min across the depth
    * rows — never an underestimate. The key frame is |keys|·depth
    * rows; the counter frame broadcasts (≤ depth·width rows at any
    * corpus scale). LEFT join + coalesce(0): a cell absent from the
    * sparse counter frame means count 0, so a never-inserted key
    * correctly estimates 0 instead of joining away. */
  private[graft] def cmsLookupFrom(counters: DataFrame, keys: Seq[String],
      depth: Int, width: Int): DataFrame = {
    val spark = counters.sparkSession
    import spark.implicits._
    val pos = h60(concat(col("j").cast("string"), lit(":"),
      col("event_type"))) % width
    keys.toDF("event_type")
      .select(col("event_type"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .select(col("event_type"), col("j"), pos.as("pos"))
      .join(broadcast(counters), Seq("j", "pos"), "left")
      .groupBy(col("event_type"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** Deterministic mergeable QUANTILE sketch per event type — the
    * bottom-k row sample: keep the k rows whose md5-derived hash of
    * the (unique) event_id is smallest. A uniform hash of a unique key
    * is a uniform random order, so the kept rows are a simple random
    * sample of size k — but unlike reservoir sampling / KLL / t-digest
    * the selection is a PURE FUNCTION of the data: reproducible across
    * runs, engines and partitionings, and mergeable exactly (bottom-k
    * of A ∪ B = bottom-k of bottomK(A) ∪ bottomK(B), the same law as
    * KMV — pinned in SketchesSpec). Quantile estimates are the
    * percentile_disc rank rule (value at row ⌈p·m⌉ of the sample's
    * value order, event_id tie-break) — one double multiply + ceil, so
    * the whole row hash-gates against DuckDB, estimates included; the
    * exact per-type quantiles alongside are the EVALUATION columns
    * (same status as kmvDistinct's exact countDistinct; their per-type
    * window sort is eval-only cost, not the sketch's).
    *
    * Scale posture: the per-type bottom-k is rank ≤ k over a window —
    * Spark rewrites it to WindowGroupLimit (k ≤ 1000), so k rows per
    * map task reach the exchange, never the event volume; estimates
    * then run over ≤ k·|types| rows. Sketches from disjoint shards (or
    * stream batches — [[graft.streaming.CorpusIngest
    * .updateQuantileSketch]]) merge by union + re-take-k, so a
    * monitoring pipeline answers "what is p99(value) per type over
    * everything ever ingested" from k·|types| rows without a rescan. */
  def quantileSketch(events: DataFrame, k: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val est = quantileEstimatesFrom(quantileSample(events, k), k)
    val ew = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val en = Window.partitionBy(col("event_type"))
    def pickExact(p: Double, name: String) =
      max(when(col("rn") ===
        ceil(col("n").cast("double") * p).cast("bigint"), col("value")))
        .as(name)
    val exact = events.filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(ew))
      .withColumn("n", count(lit(1)).over(en))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n_exact"),
        pickExact(0.5, "p50_exact"), pickExact(0.9, "p90_exact"),
        pickExact(0.99, "p99_exact"))
    est.join(exact, Seq("event_type"))
  }

  /** The bottom-k sample frame (event_type, event_id, value, hv) —
    * the mergeable artifact, shared by [[quantileSketch]] and the
    * streaming maintenance path so batch and stream sketches agree
    * bit-for-bit. Null values/ids are excluded (a null value has no
    * quantile; the hash needs the unique key). */
  private[graft] def quantileSample(events: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    events.filter(col("value").isNotNull && col("event_id").isNotNull)
      .select(col("event_type"), col("event_id"), col("value"),
        h60(col("event_id").cast("string")).as("hv"))
      .withColumn("srn", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("hv"), col("event_id"))))
      .filter(col("srn") <= k)
      .drop("srn")
  }

  /** Per-type percentile_disc estimates over a sample frame. */
  private[graft] def quantileEstimatesFrom(sample: DataFrame,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sw = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    def pick(p: Double, name: String) =
      max(when(col("rn") ===
        ceil(col("m").cast("double") * p).cast("bigint"), col("value")))
        .as(name)
    sample
      .withColumn("rn", row_number().over(sw))
      .withColumn("m", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
      .groupBy(col("event_type"))
      .agg(max(col("m")).as("sample_k"),
        pick(0.5, "p50_est"), pick(0.9, "p90_est"), pick(0.99, "p99_est"))
  }

  /** KMV/theta-style OVERLAP estimate between the two corpus halves
    * (doc_id parity): how many `w`-token shingles the halves share,
    * estimated from two k-minimum-value sketches — the 100-TB
    * decontamination-rate shape, where "how much of corpus B leaked
    * into corpus A" must be answerable from two k·8-byte sketches
    * without ever joining the corpora. k defaults to 512: inside
    * Spark's windowGroupLimitThreshold (1000), so the per-half k-min
    * keeps its WindowGroupLimit rewrite (k above the threshold would
    * silently fall back to a full per-half window sort).
    *
    * Estimators (Beyer et al., SIGMOD'07): with U_k the k smallest of
    * A_k ∪ B_k and θ its maximum, est_union = (|U_k|−1)·2⁶⁰/θ;
    * ρ = |A_k ∩ B_k ∩ U_k| / |U_k| estimates Jaccard, and ρ·est_union
    * the intersection size. All sketch contents are md5-derived
    * integers, and the only floats are fixed-order correctly-rounded
    * divides of exact integers — the whole row hash-gates, estimates
    * included. The exact distinct/intersection counts alongside are
    * the EVALUATION columns (same status as the ANN recall evals).
    *
    * Below capacity (|U_k| < k) the union sketch IS the union, so
    * est_union returns the exact |U_k| instead of the hash-scaled
    * formula — the standard KMV small-set refinement; est_inter then
    * degrades gracefully to the exact intersection too.
    *
    * Scale posture: each half's sketch is `distinct → per-half k-min`
    * — the rank ≤ k window filter rewrites to WindowGroupLimit, so k
    * rows per map task reach the exchange, never the shingle set. The
    * sketch-side frames are ≤ 2k rows; only the exact eval columns
    * touch the full distinct sets, and the shared distinct shingle
    * frame is cached — the tokenize→explode→md5→distinct pass (the
    * dominant cost) runs ONCE for all four consumers (the lambda-
    * bearing explode defeats canonical exchange reuse, so without the
    * cache it runs four times — measured in this round's plan audit). */
  def kmvShingleOverlap(documents: DataFrame, w: Int = 8,
      k: Int = 512): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = documents.select((col("doc_id") % 2).as("half"),
      split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= w)
    val dist = toks.select(col("half"),
      explode(transform(
        sequence(lit(1), size(col("toks")) - (w - 1)),
        i => concat_ws(" ", slice(col("toks"), i, lit(w))))).as("s"))
      .select(col("half"), h60(col("s")).as("hv"))
      .distinct()
      .cache()
    val perHalf = Window.partitionBy(col("half")).orderBy(col("hv"))
    val sk = dist.withColumn("rn", row_number().over(perHalf))
      .filter(col("rn") <= k).select(col("half"), col("hv"))
      .cache()
    val aK = sk.filter(col("half") === 0).select(col("hv"))
    val bK = sk.filter(col("half") === 1).select(col("hv"))
    // union sketch: k smallest of the ≤ 2k sketch values
    val uK = aK.union(bK).distinct().orderBy(col("hv")).limit(k).cache()
    val uAgg = uK.agg(count(lit(1)).as("ku"), max(col("hv")).as("theta"))
    val cAgg = uK.join(aK, Seq("hv")).join(bK, Seq("hv"))
      .agg(count(lit(1)).as("c"))
    // a degenerate half (no >= w-token docs with that parity) must
    // count 0, not NULL — Spark's pivot yields NULL for a missing
    // pivot value while the oracle's scalar COUNT subqueries yield 0
    val exact = dist
      .groupBy().pivot("half", Seq(0, 1)).agg(count(lit(1)))
      .toDF("n_a_exact", "n_b_exact")
      .select(coalesce(col("n_a_exact"), lit(0L)).as("n_a_exact"),
        coalesce(col("n_b_exact"), lit(0L)).as("n_b_exact"))
    val exactInter = dist.filter(col("half") === 0).select(col("hv"))
      .join(dist.filter(col("half") === 1).select(col("hv")), Seq("hv"))
      .agg(count(lit(1)).as("n_inter_exact"))
    // below capacity the sketch IS the union → exact count, no noise
    val estUnion = when(col("ku") < k, col("ku").cast("double"))
      .otherwise((col("ku") - 1).cast("double")
        * lit(1152921504606846976L).cast("double") / col("theta"))
    uAgg.crossJoin(cAgg).crossJoin(broadcast(exact))
      .crossJoin(broadcast(exactInter))
      .select(
        col("ku"), col("theta"), col("c"),
        estUnion.as("est_union"),
        (col("c").cast("double") / col("ku")).as("est_jaccard"),
        (estUnion * col("c") / col("ku")).as("est_inter"),
        col("n_a_exact"), col("n_b_exact"), col("n_inter_exact"),
        (col("n_inter_exact").cast("double")
          / (col("n_a_exact") + col("n_b_exact") - col("n_inter_exact")))
          .as("jaccard_exact"))
  }
}
