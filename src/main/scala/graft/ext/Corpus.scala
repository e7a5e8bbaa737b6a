package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composition a training-data pipeline
  * actually ships — exact dedup, near-dup clustering, and quality
  * scoring fused into one keep/drop decision per document — plus the
  * partitioned, sorted, size-bounded writer that lays the cleaned
  * corpus out for downstream training jobs.
  *
  * The individual stages are the oracle-gated operators in
  * [[DedupOps]] / [[TextOps]]; this module is their production
  * composition, itself oracle-gated (`corpus_clean`).
  */
object Corpus {

  /** Per-document curation decision with an explainable reason, the
    * cascade ordered like the reference's rule chain (Rules.scala —
    * first matching reason wins):
    *   1. exact_duplicate — not the canonical doc of its content-hash
    *      group (after [[TextOps.normalize]]-style canonicalization a
    *      real pipeline would hash the normal form; here the raw text,
    *      matching `dedup_exact`);
    *   2. near_duplicate — a non-canonical member of a MinHash
    *      near-dup cluster (subsumes exact dups; the cascade names the
    *      cheaper reason first, as a pipeline that short-circuits
    *      stages would);
    *   3. low_quality — composite quality score below threshold;
    *   4. keep.
    *
    * Scale posture: three equi joins on doc_id (uniform key, no skew);
    * the dedup inputs are the bucketed/salted candidate generators, so
    * the whole decision is shuffle-bounded by the dedup passes it
    * reuses. */
  def cleanDecisions(documents: DataFrame,
      qualityThreshold: Double = Double.NaN,
      nearDupThreshold: Double = Double.NaN): DataFrame = {
    // parameter wins; unset (NaN) falls back to the session conf
    // (spark.graft.corpus.*), defaults 0.5/0.5 — the curation analog of
    // the pipeline's MIN_MATCHES_FOR_EMAIL conf
    val spark = documents.sparkSession
    val qThr = if (qualityThreshold.isNaN)
      graft.GraftConf.qualityThreshold(spark) else qualityThreshold
    val nThr = if (nearDupThreshold.isNaN)
      graft.GraftConf.nearDupThreshold(spark) else nearDupThreshold
    cleanDecisionsFrom(documents, DedupOps.exactDups(documents),
      DedupOps.nearDupClusters(documents, nThr), qThr)
  }

  /** [[cleanDecisions]] over precomputed dedup outputs: `exact` is
    * [[DedupOps.exactDups]]' frame, `clusters` is
    * [[DedupOps.nearDupClusters]]' — the production shape, where the
    * curation decision derives from the MATERIALIZED dedup artifacts
    * (one minhash+CC pass per corpus snapshot) instead of re-running
    * them per consumer. */
  def cleanDecisionsFrom(documents: DataFrame, exactDups: DataFrame,
      clusters: DataFrame, qualityThreshold: Double = Double.NaN): DataFrame = {
    val qThr = if (qualityThreshold.isNaN)
      graft.GraftConf.qualityThreshold(documents.sparkSession) else qualityThreshold
    val exact = exactDups
      .select(col("doc_id"), col("is_duplicate").as("is_exact_dup"))
    val nearDup = clusters
      .select(col("doc_id"), col("cluster_id"),
        (!col("is_canonical")).as("is_near_dup"))
    val quality = TextOps.qualityScore(documents)
    documents.select(col("doc_id"), col("lang"))
      .join(exact, Seq("doc_id"))
      .join(nearDup, Seq("doc_id"))
      .join(quality, Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("cluster_id"),
        when(col("is_exact_dup"), "exact_duplicate")
          .when(col("is_near_dup"), "near_duplicate")
          .when(col("quality_score") < qThr, "low_quality")
          .otherwise("keep").as("reason"))
      .withColumn("keep", col("reason") === "keep")
  }

  /** End-to-end curation: decide, keep survivors, lay them out for
    * training ([[cleanDecisions]] ∘ [[writePartitioned]]). Returns the
    * number of kept documents. The keep filter joins decisions back to
    * the full rows by doc_id so the written corpus carries every source
    * column, not just the decision projection. */
  def writeClean(documents: DataFrame, path: String,
      qualityThreshold: Double = Double.NaN,
      nearDupThreshold: Double = Double.NaN): Long = {
    val keep = cleanDecisions(documents, qualityThreshold, nearDupThreshold)
      .filter(col("keep")).select(col("doc_id"))
    val kept = documents.join(keep, Seq("doc_id"), "left_semi")
      .localCheckpoint()
    writePartitioned(kept, path)
    kept.count()
  }

  /** Multi-signal near-duplicate fusion: the full outer join of the
    * lexical pair set (MinHash-LSH + Jaccard verify over `documents`)
    * and the semantic pair set (hyperplane-LSH + cosine verify over
    * the aligned `embeddings`), with per-signal flags. Precision-
    * focused pipelines drop only pairs BOTH signals agree on
    * (lexical AND semantic); recall-focused ones take the union —
    * this emits the evidence and leaves the policy to the caller.
    *
    * Scale posture: both inputs are the bucketed equi-join candidate
    * generators (never all-pairs); the fusion itself is one equi join
    * on the pair key, whose cardinality is the (small) verified pair
    * sets, not the corpus. */
  def crossSignalNearDups(documents: DataFrame, embeddings: DataFrame,
      cosineThreshold: Double = Double.NaN): DataFrame = {
    val cosThr = if (cosineThreshold.isNaN)
      graft.GraftConf.cosineThreshold(documents.sparkSession) else cosineThreshold
    crossSignalFrom(DedupOps.minhashNearDups(documents),
      EmbedOps.lshNearDups(embeddings), cosThr)
  }

  /** [[crossSignalNearDups]] over precomputed pair frames: `lexPairs`
    * is [[DedupOps.minhashNearDups]]' verified output, `semPairs` is
    * [[EmbedOps.lshNearDups]]' candidate+cosine output (thresholded
    * here) — fusion as a derivation of the two materialized pair sets. */
  def crossSignalFrom(lexPairs: DataFrame, semPairs: DataFrame,
      cosineThreshold: Double): DataFrame = {
    val lex = lexPairs
      .select(col("doc_a"), col("doc_b"), lit(true).as("lexical"))
    val sem = semPairs
      .filter(col("cosine") >= cosineThreshold)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"),
        lit(true).as("semantic"))
    lex.join(sem, Seq("doc_a", "doc_b"), "full_outer")
      .select(col("doc_a"), col("doc_b"),
        coalesce(col("lexical"), lit(false)).as("lexical"),
        coalesce(col("semantic"), lit(false)).as("semantic"))
  }

  /** Write a corpus partitioned by a categorical column (lang), sorted
    * within partitions by doc_id, with bounded file sizes — the layout
    * that makes the NEXT job's scans cheap: partition pruning on the
    * directory column, min/max row-group pruning on the sorted key,
    * and no small-file explosion (maxRecordsPerFile caps the other
    * direction — one giant task output).
    *
    * `repartition(partition cols)` before `partitionBy` matters at
    * scale: without it every task writes a file into every partition
    * directory — tasks × partitions small files; with it each
    * partition's rows coalesce into one task's stream. Skewed
    * partition values (one dominant lang) would re-introduce a hot
    * task; the fix is repartitioning by (lang, doc_id % k) — stated
    * trade, not needed at test SF. */
  /** Per-language dedup REPORT: document counts, exact-dup and
    * near-dup member counts, and their rates — the table a curation
    * run publishes next to the dataset card (and the number that
    * decides whether a source is worth keeping at all). Composes the
    * oracle-gated dedup passes; rates are single double divisions over
    * exact integer counts, so the report hash-matches SQL.
    *
    * Scale posture: two doc_id equi joins over the dedup outputs
    * (uniform key), then a map-side-combined |langs|-row aggregate —
    * cost is the dedup passes it reuses, nothing more. */
  def dedupReport(documents: DataFrame): DataFrame =
    dedupReportFrom(documents, DedupOps.exactDups(documents),
      DedupOps.nearDupClusters(documents))

  /** [[dedupReport]] over precomputed dedup outputs — at 100 TB a
    * dataset-card report must be a cheap aggregate over the already-
    * materialized dedup artifacts, not a second full minhash+CC pass;
    * this is that derivation (two doc_id equi joins + a |langs|-row
    * aggregate and nothing else). */
  def dedupReportFrom(documents: DataFrame, exactDups: DataFrame,
      clusters: DataFrame): DataFrame = {
    val ex = exactDups
      .select(col("doc_id"), col("is_duplicate").as("is_exact"))
    val near = clusters
      .select(col("doc_id"), (col("doc_id") =!= col("cluster_id")).as("is_near"))
    documents.select(col("doc_id"), col("lang"))
      .join(ex, Seq("doc_id"))
      .join(near, Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_exact"), 1L).otherwise(0L)).as("n_exact_dups"),
        sum(when(col("is_near"), 1L).otherwise(0L)).as("n_near_dups"))
      .select(col("lang"), col("n_docs"), col("n_exact_dups"), col("n_near_dups"),
        (col("n_exact_dups").cast("double") / col("n_docs")).as("exact_rate"),
        (col("n_near_dups").cast("double") / col("n_docs")).as("near_rate"))
  }

  def writePartitioned(df: DataFrame, path: String,
      maxRecordsPerFile: Long = 1000000L): Unit =
    df.repartition(col("lang"))
      .sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("lang")
      .parquet(path)

  /** MERGE INTO, relationally — last-write-wins upsert of a change
    * batch into a corpus snapshot, the incremental-table-maintenance
    * shape every Delta/Iceberg-style MERGE compiles down to: union the
    * snapshot (version 1) with the batch (version 2: an update slice
    * with changed text + an insert slice with fresh ids, both derived
    * deterministically here so the oracle can replay them), shuffle
    * once on the merge key, keep the max-version row per key, label
    * each survivor insert/update/keep.
    *
    * Scale posture: ONE exchange on the merge key — the same shuffle a
    * real MERGE pays — with the window frames bounded by versions-per-
    * key (≤ 2); a lakehouse implementation adds file-level pruning on
    * top, but the row-level plan is exactly this. */
  /** Deterministic PER-EPOCH shuffle ordering — the trainer-facing
    * permutation primitive: each epoch e assigns every document a
    * shard and an intra-shard position from an epoch-salted key-pure
    * hash (md5 of "doc_id:e"), so
    *
    *   - every epoch is a complete permutation of the corpus (nothing
    *     dropped, nothing duplicated — the positions within each
    *     (epoch, shard) are dense 1..n by construction);
    *   - epochs are DIFFERENT permutations (the salt moves every
    *     hash), which is what epoch reshuffling buys a trainer
    *     without ever rewriting corpus bytes — readers just consume
    *     shards in (shard, pos) order for their epoch;
    *   - the ordering is reproducible across runs, engines,
    *     partitionings and retries, unlike an `orderBy(rand())`
    *     shuffle, and append-stable per epoch (a new doc inserts at
    *     its hash position without moving others' relative order).
    *
    * Scale posture: one projection plus, per epoch, a window
    * partitioned by the shard key — each window partition is
    * corpus/shards rows, never the corpus, and the rank feeds no
    * filter so no WindowGroupLimit is needed or wanted. Epochs are
    * unrolled as columns (a trainer materializes this manifest once
    * per run; a 3-epoch manifest is 3 windows over bounded
    * partitions). */
  def epochOrder(documents: DataFrame, epochs: Int = 2,
      shards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    (0 until epochs).foldLeft(documents.select(col("doc_id"))) { (df, e) =>
      val h = conv(substring(
        md5(concat(col("doc_id").cast("string"), lit(s":$e"))
          .cast("binary")), 1, 8), 16, 10).cast("bigint")
      df.withColumn(s"h$e", h)
        .withColumn(s"shard_e$e", col(s"h$e") % shards)
        .withColumn(s"pos_e$e", row_number().over(
          Window.partitionBy(col(s"shard_e$e"))
            .orderBy(col(s"h$e"), col("doc_id"))).cast("bigint"))
        .drop(s"h$e")
    }
  }

  def upsertMerge(documents: DataFrame): DataFrame = {
    val snapshot = documents
      .select(col("doc_id"), col("text"), lit(1L).as("version"))
    val updates = documents.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), reverse(col("text")).as("text"),
        lit(2L).as("version"))
    val inserts = documents.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + lit(10000000L)).as("doc_id"), col("text"),
        lit(2L).as("version"))
    val merged = snapshot.unionByName(updates).unionByName(inserts)
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
    merged
      .withColumn("rn", row_number().over(byKey.orderBy(col("version").desc)))
      .withColumn("n_versions", count(lit(1)).over(byKey))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("version"),
        when(col("n_versions") === 2, "update")
          .when(col("version") === 2, "insert")
          .otherwise("keep").as("op"),
        md5(col("text").cast("binary")).as("content_md5"))
  }
}
