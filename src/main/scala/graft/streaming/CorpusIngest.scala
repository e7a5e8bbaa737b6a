package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sink.EmailJobSink.TxnLog

/** Continuous corpus ingestion with incremental dedup — the streaming
  * assembly of [[graft.ext.DedupOps.incrementalNewDocs]]'s join shape:
  * each micro-batch keeps one canonical doc per content digest within
  * the batch (min doc_id — deterministic, replay-stable), anti-joins
  * the survivors against the digests already in the corpus, and appends
  * only never-seen content.
  *
  * Effectively-once across restarts: the append runs under
  * [[TxnLog.runOnce]] (batch-id marker committed AFTER the write), so a
  * replayed micro-batch after a crash between sink-write and
  * checkpoint-commit is skipped; even without the marker the anti-join
  * re-suppresses previously appended content — the two layers mirror
  * the reference's dedupId + conditional-write pairing (index.js:572,
  * 448-497).
  *
  * Scale posture: the anti-join probe reads ONLY the digest column of
  * the corpus (column pruning → a 16-byte-per-doc scan); at 100 TB the
  * digest index would be a separate compacted table (same join, smaller
  * scan) and the parquet append a transactional-table commit — the
  * dataflow is identical. Digest keys are uniform: no skew.
  */
object CorpusIngest {

  /** Dedup + anti-join + append for one micro-batch; returns rows
    * appended (0 when the batch replays or brings nothing new). */
  def ingestBatch(batch: DataFrame, batchId: Long, corpusDir: String): Long = {
    val spark = batch.sparkSession
    val dataDir = s"$corpusDir/data"
    val logDir = s"$corpusDir/_txn"
    var appended = 0L
    TxnLog.runOnce(logDir, batchId) {
      val withDigest = batch
        .withColumn("content_md5", md5(col("text").cast("binary")))
      val firstPerDigest = withDigest
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("content_md5")).orderBy(col("doc_id"))))
        .filter(col("rn") === 1).drop("rn")
      // pinned before writing, like ingestBatchNear: the count and the
      // append must act on ONE evaluation of the lazy decision
      val fresh = (seenDigests(spark, dataDir) match {
        case Some(seen) =>
          firstPerDigest.join(seen, Seq("content_md5"), "left_anti")
        case None => firstPerDigest
      }).localCheckpoint()
      appended = fresh.count()
      if (appended > 0) fresh.write.mode(SaveMode.Append).parquet(dataDir)
    }
    appended
  }

  private def seenDigests(spark: SparkSession, dataDir: String): Option[DataFrame] =
    readIfAny(spark, dataDir).map(_.select(col("content_md5")).distinct())

  // ------------------------------------------------------------------
  // REMOVE-event excision (r19 — [[graft.pipeline.Tombstones]]'s
  // corpus half). Deletes are LOGICAL: excision markers append to a
  // small `tombs/` table and every read anti-joins it — the standard
  // tombstone design at 100 TB (an in-place rewrite of an append-only
  // corpus per delete would be a full-corpus write amplification; a
  // tombstone is one tiny append + a broadcast-sized anti-join at
  // read time, and the PHYSICAL rewrite happens once, on the
  // operator's schedule, exactly like the retrain migrations: stop
  // the stream, re-ingest [[activeCorpus]] into a fresh dir, point
  // the stream at it). Works uniformly over any ingest layer whose
  // data/ carries `doc_id`.
  // ------------------------------------------------------------------

  /** Append excision markers (any frame with a `doc_id` column — the
    * [[graft.pipeline.Tombstones.excisionMarkers]] shape) to the
    * corpus's tombstone table. Effectively-once like every ingest
    * append: TxnLog marker for replay skip, PLUS a doc_id drain so a
    * replayed batch without its marker converges (appends nothing
    * already tombstoned). Returns markers appended. */
  def tombstoneDocs(markers: DataFrame, batchId: Long,
      corpusDir: String): Long = {
    val spark = markers.sparkSession
    val tombsDir = s"$corpusDir/tombs"
    val logDir = s"$corpusDir/_txn_tombs"
    var appended = 0L
    TxnLog.runOnce(logDir, batchId) {
      val ids = markers.select(col("doc_id")).distinct()
      val fresh = (readIfAny(spark, tombsDir) match {
        case Some(t) => ids.join(t, Seq("doc_id"), "left_anti")
        case None => ids
      }).localCheckpoint()
      appended = fresh.count()
      if (appended > 0)
        fresh.write.mode(SaveMode.Append).parquet(tombsDir)
    }
    appended
  }

  /** The live view of a corpus under logical excision: data/ minus
    * tombs/. Without tombstones this IS the data frame (no join in
    * the plan). The tombstone side is deletes-are-rare small —
    * broadcast-anti-join territory; at worst a shuffle on the same
    * doc_id key every other probe uses. */
  def activeCorpus(spark: SparkSession, corpusDir: String): DataFrame = {
    val data = readIfAny(spark, s"$corpusDir/data").getOrElse(
      throw new IllegalArgumentException(s"no corpus at $corpusDir/data"))
    readIfAny(spark, s"$corpusDir/tombs") match {
      case Some(t) =>
        data.join(broadcast(t.select(col("doc_id")).distinct()),
          Seq("doc_id"), "left_anti")
      case None => data
    }
  }

  private def readIfAny(spark: SparkSession, dir: String): Option[DataFrame] =
    if (graft.DirIO.nonEmpty(dir)) Some(spark.read.parquet(dir))
    else None

  /** [[ingestBatch]] plus a NEAR-dup layer: after exact suppression,
    * the batch dedups against ITSELF at the near level (one canonical
    * doc per in-batch minhash cluster), then probes the corpus's
    * STORED band index ([[graft.ext.DedupOps.bandKeys]], appended at
    * every ingest) for collision candidates; only candidate corpus
    * docs are re-read for exact-Jaccard verification — the band index
    * prunes the read, the verify is the shared relational stage.
    * Incoming docs with a verified near-dup in the corpus are dropped;
    * survivors append to data/ and their band keys to bands/.
    *
    * Scale posture: per batch, work is |batch| band probes against an
    * indexed (band → doc) table plus shingling of |batch| + |candidate
    * hits| docs — never a corpus rescan. The band index is the same
    * artifact the batch `dedup_incremental_near` query derives on the
    * fly; the stream materializes it once and appends. */
  def ingestBatchNear(batch: DataFrame, batchId: Long, corpusDir: String,
      threshold: Double = 0.5): Long = {
    val spark = batch.sparkSession
    val dataDir = s"$corpusDir/data"
    val bandsDir = s"$corpusDir/bands"
    val logDir = s"$corpusDir/_txn"
    var appended = 0L
    TxnLog.runOnce(logDir, batchId) {
      val withDigest = batch
        .withColumn("content_md5", md5(col("text").cast("binary")))
      val firstPerDigest = withDigest
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("content_md5")).orderBy(col("doc_id"))))
        .filter(col("rn") === 1).drop("rn")
      val exactNew = seenDigests(spark, dataDir) match {
        case Some(seen) =>
          firstPerDigest.join(seen, Seq("content_md5"), "left_anti")
        case None => firstPerDigest
      }
      // in-batch near dedup: keep each cluster's canonical (min doc_id)
      val canon = exactNew.join(
        graft.ext.DedupOps.nearDupClusters(exactNew, threshold)
          .filter(col("is_canonical")).select(col("doc_id")),
        Seq("doc_id"), "left_semi").cache()
      // localCheckpoint PINS the decision before any write: `fresh` is
      // lazy and its plan READS dataDir, so the second write (band
      // keys) would otherwise re-evaluate it after the first append —
      // at which point the just-written docs fail their own digest
      // anti-join and their band keys are silently never indexed
      // (read-your-own-write hazard; caught by the spec's band-index
      // assertion).
      val fresh = (readIfAny(spark, bandsDir) match {
        case Some(storedBands) =>
          val cand = graft.ext.DedupOps.bandKeys(canon)
            .select(col("band"), col("doc_id").as("doc_a"))
            .join(storedBands.select(col("band"), col("doc_id").as("doc_b")),
              Seq("band"))
            .select(col("doc_a"), col("doc_b")).distinct()
          // only corpus docs that collide on a band get re-read+shingled
          val corpusCand = spark.read.parquet(dataDir)
            .join(cand.select(col("doc_b").as("doc_id")).distinct(),
              Seq("doc_id"), "left_semi")
          val dupIds = graft.ext.DedupOps.verifyJaccardPairs(
              cand,
              canon.select(col("doc_id"), col("text"))
                .unionByName(corpusCand.select(col("doc_id"), col("text"))),
              threshold)
            .select(col("doc_a").as("doc_id")).distinct()
          canon.join(dupIds, Seq("doc_id"), "left_anti")
        case None => canon
      }).localCheckpoint()
      appended = fresh.count()
      if (appended > 0) {
        fresh.write.mode(SaveMode.Append).parquet(dataDir)
        graft.ext.DedupOps.bandKeys(fresh)
          .write.mode(SaveMode.Append).parquet(bandsDir)
      }
      canon.unpersist()
    }
    appended
  }

  /** Semantic (embedding-space) ingestion: the NEAR layer of
    * [[ingestBatchNear]] transplanted to vectors. Per micro-batch:
    * in-batch semantic dedup (one canonical vector per LSH-candidate +
    * cosine-verified cluster), then a probe of the corpus's STORED
    * hyperplane-signature index ([[graft.ext.EmbedOps.signatureKeys]],
    * appended at every ingest) — only corpus vectors colliding on a
    * signature are re-read for exact cosine verification. Incoming
    * vectors with a verified corpus near-dup are dropped; survivors
    * append to data/ and their signature keys to sigs/.
    *
    * Same effectively-once layering as the lexical path: TxnLog batch
    * marker for replay skip, and the stored-index probe re-suppresses
    * previously appended content even without it.
    *
    * Scale posture: |batch| signature probes against an indexed
    * (sig → vec) table; candidate re-reads bounded by collisions;
    * never a corpus rescan. */
  def ingestBatchSemantic(batch: DataFrame, batchId: Long, indexDir: String,
      threshold: Double = Double.NaN): Long = {
    val spark = batch.sparkSession
    val thr = if (threshold.isNaN)
      graft.GraftConf.cosineThreshold(spark) else threshold
    val dataDir = s"$indexDir/data"
    val sigsDir = s"$indexDir/sigs"
    val logDir = s"$indexDir/_txn"
    var appended = 0L
    TxnLog.runOnce(logDir, batchId) {
      val canon = batch.join(
        graft.ext.EmbedOps.nearDupClusters(batch, thr)
          .filter(col("is_canonical")).select(col("vec_id")),
        Seq("vec_id"), "left_semi").cache()
      // localCheckpoint pins the decision before the two appends (the
      // same read-your-own-write hazard as ingestBatchNear)
      val fresh = (readIfAny(spark, sigsDir) match {
        case Some(storedSigs) =>
          val cand = graft.ext.EmbedOps.signatureKeys(canon)
            .select(col("sig"), col("vec_id").as("vec_a"))
            .join(storedSigs.select(col("sig"), col("vec_id").as("vec_b")),
              Seq("sig"))
            .select(col("vec_a"), col("vec_b")).distinct()
          val corpusCand = spark.read.parquet(dataDir)
            .join(cand.select(col("vec_b").as("vec_id")).distinct(),
              Seq("vec_id"), "left_semi")
          val dupIds = graft.ext.EmbedOps.verifyCosinePairs(
              cand,
              canon.select(col("vec_id"), col("embedding"))
                .unionByName(corpusCand.select(col("vec_id"), col("embedding"))),
              thr)
            .select(col("vec_a").as("vec_id")).distinct()
          canon.join(dupIds, Seq("vec_id"), "left_anti")
        case None => canon
      }).localCheckpoint()
      appended = fresh.count()
      if (appended > 0) {
        fresh.write.mode(SaveMode.Append).parquet(dataDir)
        graft.ext.EmbedOps.signatureKeys(fresh)
          .write.mode(SaveMode.Append).parquet(sigsDir)
      }
      canon.unpersist()
    }
    appended
  }

  /** Semantic ingestion against a PERSISTED
    * [[graft.ext.CentroidStore]] — incremental SemDeDup: the batch
    * `embed_semdedup` query's EXACT geometry (frozen k-means
    * centroids, quantized cosine, semDedupFrom's keep rule) applied
    * per micro-batch, replacing [[ingestBatchSemantic]]'s
    * hyperplane-signature stand-in whose random projections are
    * unrelated to the clustering the batch query dedups within.
    * Per micro-batch:
    *
    *   1. replay-drain against the append-only corpus's vec ids
    *      (vec_id is the IMMUTABLE identity, the same contract as
    *      [[ingestBatchSubstring]]'s doc_id drain) — a crash between
    *      the data append and the txn marker must not re-admit; on
    *      replay evidence the reps append lost in the second crash
    *      window is HEALED from stored state;
    *   2. assign incoming vectors to the frozen centroids
    *      ([[graft.ext.EmbedOps.assignAgainst]] — broadcast argmin,
    *      no re-clustering, ever);
    *   3. in-batch semantic dedup via
    *      [[graft.ext.EmbedOps.semDedupKeepIds]] over those
    *      assignments — keep exactly the member the batch query
    *      would keep;
    *   4. suppress survivors that cosine-verify (≥ threshold)
    *      against their cluster's BOUNDED representative set
    *      (reps/ — at most `repCap` stored vectors per centroid, in
    *      admission order);
    *   5. append survivors (with centroid_id) to data/ and admit
    *      them to reps/ up to each cluster's remaining capacity.
    *
    * WHY the probe is bounded: centroids are train-time FROZEN (the
    * [[graft.ext.CentroidStore]] contract — moving one re-labels
    * history), so [[graft.ext.EmbedOps.scaledK]] bounds cluster
    * occupancy at TRAIN time only; as the stream appends past the
    * training corpus, stored rows per centroid grow without bound,
    * and a probe against the FULL stored cluster (the pre-r18 form)
    * costs Σ_c batch_c × stored_c per batch — linear in everything
    * ever ingested, a per-batch scale-killer over a long stream. The
    * reps cap makes the probe's candidate set ≤ |batch| × repCap by
    * construction, so per-batch wall is flat in corpus lifetime
    * (measured: `bench_results/ingest_growth.json`).
    *
    * The TRADE: suppression is exact (identical keep set to a
    * full-corpus probe — CorpusIngestSpec pins it) while every
    * cluster holds ≤ repCap stored vectors; past the cap, a new
    * vector is probed against the first repCap arrivals only, so a
    * duplicate of a LATER-arrived member can slip through — the
    * recall trade is MEASURED, never silent ([[semanticProbeAudit]]:
    * saturated-cluster and unrepresented-row counts), and the
    * backstop is the retrain EPOCH: a fresh [[graft.ext
    * .CentroidStore.build]] re-buckets the grown corpus at its own
    * scaledK, restoring ~targetBlock occupancy so repCap ≥
    * targetBlock again covers whole clusters. The default repCap =
    * 1024 is exactly scaledK's targetBlock.
    *
    * Same effectively-once layering as every ingest path: TxnLog
    * batch marker for replay skip, the vec_id drain re-suppresses a
    * replayed batch even without it, and the reps heal closes the
    * two-append crash window.
    *
    * Scale posture: the only corpus-sized read is the vec_id drain
    * (column-pruned 8-byte-per-row scan — at 100 TB a compacted id
    * index, same join); the probe joins the batch against the
    * k×repCap-bounded reps table; cosine verification pays only for
    * candidate pairs. */
  def ingestBatchSemanticCentroid(batch: DataFrame, batchId: Long,
      indexDir: String, centroidDir: String,
      threshold: Double = Double.NaN, repCap: Int = 1024): Long = {
    require(repCap >= 1, s"repCap must be >= 1 (got $repCap)")
    val spark = batch.sparkSession
    val thr = if (threshold.isNaN)
      graft.GraftConf.cosineThreshold(spark) else threshold
    val dataDir = s"$indexDir/data"
    val repsDir = s"$indexDir/reps"
    val logDir = s"$indexDir/_txn"
    // the stored centroid_id column is only meaningful under ONE
    // frozen geometry: after a RETRAIN (a fresh CentroidStore epoch),
    // new batches would assign against epoch E+1 while stored rows
    // carry epoch-E buckets — the equi probe would silently compare
    // unrelated cluster ids (no false suppression, cosine still
    // verifies, but true neighbors stop colliding: a silent recall
    // hole, the substring path's mixed-width-window class). Reject
    // loudly; the migration is [[rebucketSemanticCentroid]] into a
    // fresh dir (retrain-as-epoch, serving dirs included).
    val epoch = graft.ext.CentroidStore.manifest(centroidDir)
      .getOrElse(throw new IllegalStateException(
        s"no committed centroid store at $centroidDir")).epoch
    validateCentroidEpoch(indexDir, epoch)
    var appended = 0L
    TxnLog.runOnce(logDir, batchId) {
      val cents = graft.ext.CentroidStore.centroids(spark, centroidDir)
      // replay drain + reps heal (crash window 2: data appended, reps
      // append lost). Also bootstraps reps/ for a corpus written
      // before the bounded-probe layout existed: a data dir with no
      // reps would otherwise probe against nothing.
      val incoming = readIfAny(spark, dataDir) match {
        case Some(stored) =>
          val already = batch
            .join(stored.select(col("vec_id")), Seq("vec_id"), "left_semi")
            .select(col("vec_id")).localCheckpoint()
          val replayed = already.count() > 0
          val repsEmpty = !graft.DirIO.nonEmpty(repsDir)
          if (replayed || repsEmpty) {
            // heal scope: on replay, the replayed ids; on an
            // unrepresented legacy/torn store, everything stored
            val scope =
              if (repsEmpty) stored
              else stored.join(already, Seq("vec_id"), "left_semi")
            val missing = readIfAny(spark, repsDir) match {
              case Some(r) => scope.join(
                r.select(col("vec_id")), Seq("vec_id"), "left_anti")
              case None => scope
            }
            admitReps(spark, missing.select(col("centroid_id"),
              col("vec_id"), col("embedding")), repsDir, repCap)
          }
          batch.join(already, Seq("vec_id"), "left_anti")
        case None => batch
      }
      val asg = graft.ext.EmbedOps.assignAgainst(incoming, cents)
      // the bounded-lifetime form: semDedupFrom's internal pair cache
      // would otherwise accumulate one dead frame per micro-batch
      val keepIds = graft.ext.EmbedOps.semDedupKeepIds(incoming, asg, thr)
      val canon = incoming.join(keepIds, Seq("vec_id"), "left_semi")
        .join(asg.select(col("vec_id"), col("centroid_id")), Seq("vec_id"))
        .cache()
      // localCheckpoint pins the decision before the appends (the same
      // read-your-own-write hazard as the other ingest layers)
      val fresh = (readIfAny(spark, repsDir) match {
        case Some(reps) =>
          val cand = canon
            .select(col("centroid_id"), col("vec_id").as("vec_a"))
            .join(reps.select(col("centroid_id"),
              col("vec_id").as("vec_b")), Seq("centroid_id"))
            .select(col("vec_a"), col("vec_b"))
          val dupIds = graft.ext.EmbedOps.verifyCosinePairs(
              cand,
              canon.select(col("vec_id"), col("embedding"))
                .unionByName(
                  reps.select(col("vec_id"), col("embedding"))),
              thr)
            .select(col("vec_a").as("vec_id")).distinct()
          canon.join(dupIds, Seq("vec_id"), "left_anti")
        case None => canon
      }).localCheckpoint()
      appended = fresh.count()
      if (appended > 0) {
        // epoch committed BEFORE the first data lands, first writer
        // wins, then re-validated — the substring path's (w, occCap)
        // stamp discipline applied to the clustering geometry
        stampCentroidEpoch(indexDir, epoch, batchId)
        validateCentroidEpoch(indexDir, epoch)
        // order matters for the crash windows: data first (the drain
        // key), then reps (healed from data on replay evidence)
        fresh.write.mode(SaveMode.Append).parquet(dataDir)
        admitReps(spark, fresh.select(col("centroid_id"), col("vec_id"),
          col("embedding")), repsDir, repCap)
      }
      canon.unpersist()
    }
    appended
  }

  /** Reject an ingest whose centroid epoch disagrees with the stamped
    * `_meta` — the stored centroid_id buckets only match their own
    * geometry. No-op until a first successful batch stamps it. */
  private[graft] def validateCentroidEpoch(indexDir: String,
      epoch: Long): Unit = {
    val meta = Paths.get(indexDir, "_meta")
    if (Files.exists(meta)) {
      val kv = new String(Files.readAllBytes(meta), "UTF-8")
        .linesIterator.filter(_.contains("="))
        .map { l => val Array(k, v) = l.split("=", 2); k -> v.trim }
        .toMap
      require(kv.get("centroid_epoch").contains(epoch.toString),
        s"semantic-centroid corpus at $indexDir was bucketed under " +
          s"centroid epoch ${kv.getOrElse("centroid_epoch", "?")}; the " +
          s"store now serves epoch $epoch — stored centroid_ids only " +
          "match their own geometry, so this ingest would silently " +
          "stop colliding with history (migrate with " +
          "rebucketSemanticCentroid into a fresh dir, or point the " +
          "stream back at the old generation)")
    }
  }

  /** First-writer-wins epoch stamp (the [[stampSubstringMeta]]
    * primitive for the clustering geometry).
    *
    * A dir that already holds data/ rows but carries NO stamp is
    * REFUSED (unless `dirHoldsRebucketedData`, the
    * [[rebucketSemanticCentroid]] path, which just re-assigned every
    * stored row under the current geometry): those rows were bucketed
    * under an unknown — in practice older — centroid geometry, and
    * stamping the store's CURRENT epoch onto them would grandfather a
    * mixed-geometry corpus into exactly the silent-recall-hole state
    * [[validateCentroidEpoch]] exists to reject loudly. */
  private[graft] def stampCentroidEpoch(indexDir: String, epoch: Long,
      batchId: Long, dirHoldsRebucketedData: Boolean = false): Unit = {
    val meta = Paths.get(indexDir, "_meta")
    if (!Files.exists(meta)) {
      require(dirHoldsRebucketedData ||
        !graft.DirIO.nonEmpty(s"$indexDir/data"),
        s"semantic-centroid corpus at $indexDir holds data/ rows but " +
          "no _meta epoch stamp — its rows were bucketed under an " +
          s"unknown (likely pre-stamp) geometry, and stamping epoch " +
          s"$epoch onto them would silently mix geometries (stored " +
          "centroid_ids stop colliding with new arrivals: a recall " +
          "hole). Migrate with rebucketSemanticCentroid into a fresh " +
          "dir, or restore the dir's original _meta")
      Files.createDirectories(Paths.get(indexDir))
      val tmp = Paths.get(indexDir, s".meta.$batchId.tmp")
      Files.write(tmp, s"centroid_epoch=$epoch\n".getBytes("UTF-8"))
      try Files.createLink(meta, tmp)
      catch {
        case _: java.nio.file.FileAlreadyExistsException => ()
        case _: UnsupportedOperationException =>
          Files.move(tmp, meta,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          ()
      } finally {
        Files.deleteIfExists(tmp)
        ()
      }
      ()
    }
  }

  /** RETRAIN MIGRATION — the documented backstop made executable:
    * re-bucket a semantic-centroid corpus under the CURRENT committed
    * geometry into a FRESH dir. Reads the old dir's stored vectors,
    * re-assigns them against the new epoch's centroids, writes
    * data/ + a repCap-bounded reps/ (admission in vec_id order — the
    * deterministic rule, since original arrival order is gone) and
    * stamps the new epoch. Crash-safe by construction: the old dir is
    * never touched, and a torn destination is re-run with the same
    * arguments (mode Overwrite). Single-writer contract: stop the
    * stream, rebucket, restart it against `newIndexDir`.
    *
    * Scale posture: one assignment pass over the stored corpus
    * (broadcast argmin — the irreducible exact-assignment cost of a
    * retrain) + one bounded rep admission; no pair work. Returns rows
    * migrated. */
  def rebucketSemanticCentroid(spark: SparkSession, oldIndexDir: String,
      newIndexDir: String, centroidDir: String,
      repCap: Int = 1024): Long = {
    // canonical compare: normalize() collapses '.'/'..' segments and
    // toRealPath() (when the dir exists) resolves symlink aliases —
    // toAbsolutePath alone let '/x/./a' vs '/x/a' (or a symlink twin)
    // slip past the guard and the Overwrite below clobber the source
    // dir the doc promises stays readable
    def canonical(p: String): java.nio.file.Path = {
      val a = java.nio.file.Paths.get(p).toAbsolutePath.normalize
      try a.toRealPath() catch { case _: java.io.IOException => a }
    }
    require(canonical(oldIndexDir) != canonical(newIndexDir),
      "rebucket must target a FRESH dir (the old dir stays readable " +
        "until the stream has switched over)")
    val man = graft.ext.CentroidStore.manifest(centroidDir).getOrElse(
      throw new IllegalStateException(
        s"no committed centroid store at $centroidDir"))
    val storedOpt = readIfAny(spark, s"$oldIndexDir/data")
    if (storedOpt.isEmpty) return 0L
    val stored = storedOpt.get.drop("centroid_id")
    val cents = graft.ext.CentroidStore.centroids(spark, centroidDir)
    val rebucketed = stored.join(
      graft.ext.EmbedOps.assignAgainst(stored, cents)
        .select(col("vec_id"), col("centroid_id")), Seq("vec_id"))
      .localCheckpoint()
    val n = rebucketed.count()
    rebucketed.write.mode(SaveMode.Overwrite)
      .parquet(s"$newIndexDir/data")
    rebucketed
      .select(col("centroid_id"), col("vec_id"), col("embedding"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("centroid_id")).orderBy(col("vec_id"))))
      .filter(col("rn") <= repCap)
      .drop("rn")
      .write.mode(SaveMode.Overwrite).parquet(s"$newIndexDir/reps")
    Files.deleteIfExists(Paths.get(newIndexDir, "_meta"))
    stampCentroidEpoch(newIndexDir, man.epoch, batchId = -1L,
      dirHoldsRebucketedData = true)
    n
  }

  /** Admit `cands` (centroid_id, vec_id, embedding) to the bounded
    * representative set: each cluster takes candidates in vec_id
    * order up to its remaining capacity (repCap − already-admitted).
    * Reading reps/ for the occupancy counts is bounded by k×repCap
    * rows. */
  private def admitReps(spark: SparkSession, cands: DataFrame,
      repsDir: String, repCap: Int): Unit = {
    val have = readIfAny(spark, repsDir) match {
      case Some(r) => r.groupBy(col("centroid_id"))
        .agg(count(lit(1)).as("have"))
      case None => null
    }
    val ranked = cands
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("centroid_id")).orderBy(col("vec_id"))))
    val admit = (if (have == null) ranked.withColumn("have", lit(0L))
      else ranked.join(have, Seq("centroid_id"), "left")
        .withColumn("have", coalesce(col("have"), lit(0L))))
      .filter(col("rn") <= lit(repCap.toLong) - col("have"))
      .select(col("centroid_id"), col("vec_id"), col("embedding"))
      .localCheckpoint()
    if (admit.count() > 0)
      admit.write.mode(SaveMode.Append).parquet(repsDir)
  }

  /** The bounded probe's recall exposure, MEASURED instead of silent
    * (the [[graft.ext.TextOps.dupSpanAudit]] posture): one row over
    * the semantic-centroid store — stored rows, representative rows,
    * clusters, clusters AT the cap (whose later arrivals are no
    * longer probed against), and stored rows not represented. A
    * nonzero `n_unrepresented` quantifies the duplicate mass the
    * bounded probe can no longer see; a pipeline gates the retrain-
    * epoch cadence on this row. */
  def semanticProbeAudit(spark: SparkSession, indexDir: String,
      repCap: Int = 1024): DataFrame = {
    val stored = readIfAny(spark, s"$indexDir/data")
      .map(_.select(col("centroid_id"), col("vec_id")))
      .getOrElse(spark.range(0).select(col("id").as("centroid_id"),
        col("id").as("vec_id")))
    val reps = readIfAny(spark, s"$indexDir/reps")
      .map(_.select(col("centroid_id"), col("vec_id")))
      .getOrElse(spark.range(0).select(col("id").as("centroid_id"),
        col("id").as("vec_id")))
    val perCluster = stored.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_stored"))
      .join(reps.groupBy(col("centroid_id"))
        .agg(count(lit(1)).as("n_reps")), Seq("centroid_id"), "left")
      .withColumn("n_reps", coalesce(col("n_reps"), lit(0L)))
    perCluster.agg(
      coalesce(sum(col("n_stored")), lit(0L)).as("n_stored"),
      coalesce(sum(col("n_reps")), lit(0L)).as("n_reps"),
      count(lit(1)).as("n_clusters"),
      coalesce(sum(when(col("n_reps") >= repCap, 1L).otherwise(0L)),
        lit(0L)).as("n_saturated_clusters"),
      coalesce(sum(col("n_stored") - col("n_reps")), lit(0L))
        .as("n_unrepresented"))
  }

  /** SUBSTRING-dedup ingestion — the incremental form of
    * [[graft.ext.TextOps.dedupExcise]] (Lee et al.'s removal step):
    * the corpus keeps a WINDOW INDEX (the stride-1 w-token hashes of
    * every stored doc's FINAL text), and each micro-batch
    *
    *   1. probes it with its own windows ([[graft.ext.TextOps
    *      .crossDupSpans]] — equi on the 16-byte hash, per-hash
    *      fan-out occCap²-bounded), recovering every maximal block
    *      the batch shares with ALREADY-STORED text and excising it
    *      from the incoming doc (history is the first occurrence, by
    *      arrival order);
    *   2. runs the batch-local [[graft.ext.TextOps.dedupExcise]] over
    *      the phase-1-cleaned docs (first occurrence WITHIN the batch
    *      keeps, by doc_id);
    *   3. appends the final cleaned docs to data/, THEIR windows
    *      (post-excision — the index always reflects what the corpus
    *      actually stores) to wins/, and the windows' per-hash counts
    *      to wincnt/ — the incrementally-maintained table the next
    *      batch's occCap filter reads instead of re-aggregating the
    *      whole index ([[substringIndexAudit]] measures its drift and
    *      the cap's standing exposure).
    *
    * Same effectively-once layering as every ingest path: TxnLog
    * marker for replay skip, and the stored-index probe re-excises
    * a replayed block to an already-stored copy even without it.
    * Batch contract: (doc_id, text); returns docs appended.
    *
    * Scale posture: the probe is an equi join on a uniform hash with
    * capped fan-out, its stored-side cap filter a sum over the
    * pre-aggregated count deltas; the index is |corpus tokens|
    * 16-byte rows — at 100 TB a compacted, hash-bucketed table whose
    * probe touches only matching buckets, same dataflow. */
  def ingestBatchSubstring(batch: DataFrame, batchId: Long,
      corpusDir: String, w: Int = 8, occCap: Int = 64): Long = {
    val spark = batch.sparkSession
    val dataDir = s"$corpusDir/data"
    val winsDir = s"$corpusDir/wins"
    val cntDir = s"$corpusDir/wincnt"
    val logDir = s"$corpusDir/_txn"
    // the window index is only meaningful at ONE window width: a
    // restart with a different w would probe 4-token hashes against
    // 8-token hashes and silently match nothing — reject loudly (the
    // CentroidStore manifest discipline, minimally). Validation only;
    // the stamp lands inside the first SUCCESSFUL batch below, so a
    // misconfigured run that never ingested anything doesn't lock an
    // empty corpus to the wrong parameters.
    validateSubstringMeta(corpusDir, w, occCap)
    var appended = 0L
    TxnLog.runOnce(logDir, batchId) {
      // doc-id replay drain: a crash BETWEEN the data append and the
      // txn marker leaves the docs stored but the batch unmarked; on
      // replay the excision path would re-admit them (an already-
      // stored doc excises against its own windows to an empty row,
      // and a short doc has no windows at all), so the layer every
      // other ingest path gets from digest/cosine suppression is an
      // anti-join on the append-only corpus's doc ids. CONTRACT:
      // doc_id is the IMMUTABLE identity — a re-send with changed
      // text is a replay here and is dropped; revision streams must
      // mint new doc ids (or run the corpus-upsert path), the same
      // identity rule as the digest-keyed layers.
      val incoming0 = batch.select(col("doc_id"), col("text"))
      val incoming = readIfAny(spark, dataDir) match {
        case Some(stored) =>
          val already = incoming0
            .join(stored.select(col("doc_id")), Seq("doc_id"), "left_semi")
            .select(col("doc_id")).localCheckpoint()
          if (already.count() > 0) {
            // replay evidence — HEAL the other crash window: data
            // appended but the wins append lost. Without this, those
            // docs' windows would be missing from the index forever
            // and future batches would silently stop excising text
            // duplicated from them. Windows come from the STORED
            // (cleaned) text, never the raw resend.
            val missing = readIfAny(spark, winsDir) match {
              case Some(ws) => already.join(
                ws.select(col("doc_id")).distinct(),
                Seq("doc_id"), "left_anti")
              case None => already
            }
            val heal = graft.ext.TextOps.winOcc(
              stored.join(missing, Seq("doc_id"), "left_semi"), w)
              .localCheckpoint()
            if (heal.count() > 0) {
              heal.write.mode(SaveMode.Append).parquet(winsDir)
              // keep the count table in step with the healed windows
              heal.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
                .write.mode(SaveMode.Append).parquet(cntDir)
            }
          }
          incoming0.join(already, Seq("doc_id"), "left_anti")
        case None => incoming0
      }
      // phase 1 pinned: dedupExcise's plan references its input three
      // times (eligible agg, hits join, rebuild join) — unpinned, the
      // stored-index probe would re-run for each
      val phase1 = (readIfAny(spark, winsDir) match {
        case Some(storedWins) =>
          // the stored side's occCap filter comes from the MAINTAINED
          // per-hash count table (pre-aggregated (h, cnt) deltas, one
          // row per (append, hash), summed here), not a per-batch
          // re-aggregation of every stored window OCCURRENCE — the
          // pre-r18 form's groupBy(h) over the whole index re-paid the
          // corpus's token count every batch. Counts can only UNDER-
          // count (the cnt append follows the wins append, so its
          // crash window leaves a hash eligible longer — extra probe
          // work, never a recall hole); drift is measured, not silent:
          // [[substringIndexAudit]]. A legacy/pre-count corpus
          // bootstraps the table from a one-time recount.
          val storedCnt = readIfAny(spark, cntDir) match {
            case Some(c) => c.groupBy(col("h"))
              .agg(sum(col("cnt")).as("nocc"))
            case None =>
              // legacy/pre-count corpus bootstrap, FIRST WRITER WINS:
              // the recount may only be PERSISTED once — two
              // concurrent bootstrappers both appending it would
              // double every count, and doubled counts OVERCOUNT,
              // the one drift direction that silently drops recall
              // (a hash at occCap/2 true occurrences reads as
              // capped). The atomic marker create admits exactly one
              // persister; losers (and a winner that crashed between
              // marker and append — permanent benign undercount,
              // visible in substringIndexAudit) still USE the
              // in-flight recount for this batch's filter.
              val init = storedWins.groupBy(col("h"))
                .agg(count(lit(1)).as("cnt")).localCheckpoint()
              val marker = Paths.get(corpusDir, ".wincnt_bootstrap")
              val won =
                try { Files.createFile(marker); true }
                catch {
                  case _: java.nio.file.FileAlreadyExistsException => false
                }
              if (won) init.write.mode(SaveMode.Append).parquet(cntDir)
              init.select(col("h"), col("cnt").as("nocc"))
          }
          val spans = graft.ext.TextOps.crossDupSpansWithCounts(
            storedWins, storedCnt,
            graft.ext.TextOps.winOcc(incoming, w), w, occCap)
          graft.ext.TextOps.exciseIntervals(incoming,
            spans.select(col("doc_b").as("doc_id"),
              col("start_b").as("s"), col("end_b").as("e")))
            .select(col("doc_id"), col("clean_text").as("text"))
        case None => incoming
      }).localCheckpoint()
      // phase 2 over the cleaned text, then pin the decision before
      // the two appends (the read-your-own-write hazard all ingest
      // layers share)
      val cleaned = graft.ext.TextOps.dedupExcise(phase1, w, occCap)
        .select(col("doc_id"), col("clean_text").as("text"))
        .localCheckpoint()
      appended = cleaned.count()
      if (appended > 0) {
        // parameters committed BEFORE the first data lands, FIRST
        // WRITER WINS (hard-link create — atomic, complete content,
        // EEXIST for the loser), then re-validated against the
        // COMMITTED stamp: of two racing first-batch writers with
        // different (w, occCap), the loser fails HERE — before its
        // wrong-width windows could land in wins/ where they would
        // silently match nothing forever (and before its docs could
        // be admitted unexcised at the surviving parameters)
        stampSubstringMeta(corpusDir, w, occCap, batchId)
        validateSubstringMeta(corpusDir, w, occCap)
        cleaned.write.mode(SaveMode.Append).parquet(dataDir)
        val ws = graft.ext.TextOps.winOcc(cleaned, w).localCheckpoint()
        ws.write.mode(SaveMode.Append).parquet(winsDir)
        ws.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
          .write.mode(SaveMode.Append).parquet(cntDir)
      }
    }
    appended
  }

  /** The maintained count table's drift vs the ground truth, MEASURED
    * instead of silent (the [[semanticProbeAudit]] /
    * [[graft.ext.TextOps.dupSpanAudit]] posture): one row comparing a
    * RECOUNT of wins/ against the summed wincnt/ deltas —
    * `n_hashes_drifted` > 0 means a cnt append was lost in its crash
    * window (benign direction: the probe over-includes, never
    * under-recalls) — plus the cap's standing exposure on the TRUE
    * counts: hashes at/over occCap (`n_hashes_capped`) and the
    * occurrences inside them (`n_occ_capped`) — the boilerplate mass
    * the stored-side probe no longer excises as naturally common
    * phrases accumulate. A pipeline gates re-compaction (or an occCap
    * retune + corpus rebuild) on this row. */
  def substringIndexAudit(spark: SparkSession, corpusDir: String,
      occCap: Int = 64): DataFrame = {
    val empty = spark.range(0).select(
      col("id").cast("string").as("h"), col("id").as("n"))
    val truth = readIfAny(spark, s"$corpusDir/wins")
      .map(_.groupBy(col("h")).agg(count(lit(1)).as("n")))
      .getOrElse(empty)
    val maintained = readIfAny(spark, s"$corpusDir/wincnt")
      .map(_.groupBy(col("h")).agg(sum(col("cnt")).as("n")))
      .getOrElse(empty)
    truth.select(col("h"), col("n").as("n_true"))
      .join(maintained.select(col("h"), col("n").as("n_kept")),
        Seq("h"), "full")
      .select(coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .agg(count(lit(1)).as("n_hashes"),
        coalesce(sum(when(col("n_true") =!= col("n_kept"), 1L)
          .otherwise(0L)), lit(0L)).as("n_hashes_drifted"),
        coalesce(max(col("n_true") - col("n_kept")), lit(0L))
          .as("max_undercount"),
        coalesce(sum(when(col("n_true") > occCap, 1L).otherwise(0L)),
          lit(0L)).as("n_hashes_capped"),
        coalesce(sum(when(col("n_true") > occCap, col("n_true"))
          .otherwise(0L)), lit(0L)).as("n_occ_capped"))
  }

  /** Reject an ingest whose (w, occCap) disagree with the stamped
    * `_meta` — the stored window index only matches at its own
    * parameters. No-op until a first successful batch stamps it. */
  private[graft] def validateSubstringMeta(corpusDir: String, w: Int,
      occCap: Int): Unit = {
    val meta = Paths.get(corpusDir, "_meta")
    if (Files.exists(meta)) {
      val kv = new String(Files.readAllBytes(meta), "UTF-8")
        .linesIterator.filter(_.contains("="))
        .map { l => val Array(k, v) = l.split("=", 2); k -> v.trim }
        .toMap
      require(kv.get("w").contains(w.toString) &&
        kv.get("occ_cap").contains(occCap.toString),
        s"substring corpus at $corpusDir was built with " +
          s"w=${kv.getOrElse("w", "?")} occ_cap=" +
          s"${kv.getOrElse("occ_cap", "?")}; this ingest was started " +
          s"with w=$w occ_cap=$occCap — the stored window index only " +
          "matches at its own parameters (restart with them, or " +
          "rebuild the corpus)")
    }
  }

  /** Commit the (w, occCap) stamp FIRST WRITER WINS: the content is
    * written to a batch-keyed temp, then HARD-LINKED to `_meta` —
    * link(2) is atomic, carries complete content (unlike a bare
    * CREATE_NEW write, whose partial flush a concurrent reader could
    * see), and fails with EEXIST for every writer but the first. A
    * losing racer returns normally; the caller's re-validation
    * against the committed stamp is what fails its batch. */
  private[graft] def stampSubstringMeta(corpusDir: String, w: Int, occCap: Int,
      batchId: Long): Unit = {
    val meta = Paths.get(corpusDir, "_meta")
    if (!Files.exists(meta)) {
      Files.createDirectories(Paths.get(corpusDir))
      val tmp = Paths.get(corpusDir, s".meta.$batchId.tmp")
      Files.write(tmp, s"w=$w\nocc_cap=$occCap\n".getBytes("UTF-8"))
      try Files.createLink(meta, tmp)
      catch {
        case _: java.nio.file.FileAlreadyExistsException => ()
        case _: UnsupportedOperationException =>
          // no hard links on this filesystem (exFAT, some NFS/object
          // mounts): rename commit — atomic but last-writer-wins, so
          // the first-batch race protection degrades to the caller's
          // re-validation catching a mismatch on the NEXT batch;
          // single-writer deployments (the documented contract) are
          // unaffected
          Files.move(tmp, meta,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          ()
      } finally {
        Files.deleteIfExists(tmp)
        ()
      }
      ()
    }
  }

  /** Streaming entry for the substring-dedup path. */
  def startSubstring(docs: DataFrame, corpusDir: String,
      checkpointDir: String, w: Int = 8, occCap: Int = 64): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatchSubstring(batch, batchId, corpusDir, w, occCap); ()
      }
      .start()

  /** Streaming entry for the persisted-centroid semantic path. */
  def startSemanticCentroid(vectors: DataFrame, indexDir: String,
      centroidDir: String, checkpointDir: String,
      threshold: Double = Double.NaN, repCap: Int = 1024): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatchSemanticCentroid(
          batch, batchId, indexDir, centroidDir, threshold, repCap); ()
      }
      .start()

  /** Streaming entry for the semantic path. */
  def startSemantic(vectors: DataFrame, indexDir: String, checkpointDir: String,
      threshold: Double = Double.NaN): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatchSemantic(batch, batchId, indexDir, threshold); ()
      }
      .start()

  /** Streaming entry: docs stream → per-batch incremental dedup append. */
  def start(docs: DataFrame, corpusDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, corpusDir); ()
      }
      .start()

  /** Streaming entry with the near-dup layer. */
  def startNear(docs: DataFrame, corpusDir: String, checkpointDir: String,
      threshold: Double = 0.5): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatchNear(batch, batchId, corpusDir, threshold); ()
      }
      .start()

  /** Publish (or refresh) the stored eval-shingle index the streaming
    * decontamination layer probes: the distinct 6-gram shingles of the
    * benchmark suite, one string column `s`. Eval suites are tiny next
    * to the corpus and change rarely (a new benchmark release), so a
    * full overwrite per release is the right cadence — the per-batch
    * path only ever READS this. */
  def writeEvalIndex(benchDocs: DataFrame, decontamDir: String): Unit =
    graft.ext.TextOps.sixGramShingles(benchDocs)
      .select(col("s")).distinct()
      .write.mode(SaveMode.Overwrite).parquet(s"$decontamDir/eval_shingles")

  /** Streaming benchmark decontamination — the contamination layer of
    * the ingest family: each micro-batch of incoming documents is
    * probed against the STORED eval-shingle index
    * ([[writeEvalIndex]]), and every contaminated doc's span-level
    * excision plan (the exact
    * [[graft.ext.TextOps.decontaminateSpansAgainst]] report — span
    * count, contaminated token count, clean fraction) is appended to
    * `reports/`. Sharing that one span-merge core means a doc flagged
    * by the stream carries the same excision plan the batch query
    * would produce — stream ≡ batch by construction, and the spec
    * pins it.
    *
    * Effectively-once: the append runs under [[TxnLog.runOnce]], so a
    * replayed micro-batch after a crash between write and
    * checkpoint-commit is skipped. A missing eval index means no
    * benchmark is registered yet: nothing is flagged (decontamination
    * against an empty suite is vacuous), and the batch commits as
    * processed.
    *
    * Scale posture: per batch, work is |batch| docs shingled once +
    * one equi join against an eval-sized index (broadcastable in
    * practice; unhinted for the same reason as the batch op) + the
    * span window over MATCHED positions only — never a corpus rescan,
    * nothing corpus-shaped materialized. */
  def decontamBatch(batch: DataFrame, batchId: Long,
      decontamDir: String): Long = {
    val spark = batch.sparkSession
    val reportsDir = s"$decontamDir/reports"
    val evalDir = s"$decontamDir/eval_shingles"
    var flagged = 0L
    TxnLog.runOnce(s"$decontamDir/_txn", batchId) {
      readIfAny(spark, evalDir).foreach { evalIdx =>
        // pinned before the count+write act on one evaluation, like
        // every ingest path here
        val report = graft.ext.TextOps
          .decontaminateSpansAgainst(batch, evalIdx)
          .localCheckpoint()
        flagged = report.count()
        if (flagged > 0)
          report.write.mode(SaveMode.Append).parquet(reportsDir)
      }
    }
    flagged
  }

  /** Streaming entry for the decontamination layer. */
  def startDecontam(docs: DataFrame, decontamDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        decontamBatch(batch, batchId, decontamDir); ()
      }
      .start()

  /** Streaming KMV cardinality-sketch maintenance: each micro-batch
    * merges the stored k-minimum-values sketch with the batch's
    * content hashes — union + re-take-k, the KMV merge law
    * SketchesSpec proves for shard sketches, applied over time instead
    * of space. The sketch answers "how many distinct contents has this
    * corpus ever seen" from k rows, without rescanning the corpus —
    * the streaming complement of [[graft.ext.Sketches.kmvDistinct]]
    * (same [[graft.ext.Sketches.h60]] hash, so stream and batch agree
    * bit-for-bit).
    *
    * Replay-safe twice over: [[TxnLog.runOnce]] skips a committed
    * batch id, and the merge itself is idempotent AND monotone
    * (re-merging already-absorbed values changes nothing), so even a
    * torn rerun converges to the same sketch. The merged frame is
    * pinned (localCheckpoint) BEFORE the overwrite — rewriting the
    * directory currently being read is the read-your-own-write hazard
    * the ingest paths pin against.
    *
    * Scale posture: per batch, one `distinct → k-min`
    * (TakeOrderedAndProject — k rows per partition move) over the
    * batch plus a union with a k-row stored frame. Corpus size never
    * enters the per-batch cost. */
  def updateKmvSketch(batch: DataFrame, batchId: Long, sketchDir: String,
      k: Int = 64): Unit =
    mergePublish(batch.sparkSession, sketchDir, "mins", batchId) { prev =>
      val batchMins = graft.ext.Sketches.kmvMins(
        batch.select(graft.ext.Sketches.h60(col("text")).as("hv")), k)
      prev match {
        case Some(p) =>
          graft.ext.Sketches.kmvMins(p.select(col("hv")).union(batchMins), k)
        case None => batchMins
      }
    }

  /** Streaming count-min counter maintenance: each micro-batch's
    * depth×width counter frame ([[graft.ext.Sketches.cmsCounters]] —
    * the same build the batch query uses) merges into the stored one
    * by position-wise sum, the CMS merge law SketchesSpec proves for
    * shard counters. The running sketch answers heavy-hitter point
    * queries over the WHOLE ingested history from ≤ depth·width rows —
    * the streaming feed for [[graft.ext.Skew.keySkewReport]]'s
    * "does this key need salting" decision, available while the data
    * is still arriving. Same versioned publish + TxnLog commit as the
    * KMV path; the position-wise sum is replay-safe through the
    * batch-id guard (NOT idempotent by itself — a re-sum would double-
    * count, which is why the guard is load-bearing here and the spec
    * pins it). */
  def updateCmsSketch(batch: DataFrame, batchId: Long, sketchDir: String,
      depth: Int = 4, width: Int = 1024): Unit =
    mergePublish(batch.sparkSession, sketchDir, "counters", batchId) { prev =>
      val bc = graft.ext.Sketches.cmsCounters(batch, depth, width)
      prev match {
        case Some(p) => p.select(col("j"), col("pos"), col("cnt"))
          .union(bc).groupBy(col("j"), col("pos"))
          .agg(sum(col("cnt")).as("cnt"))
        case None => bc
      }
    }

  /** Streaming HLL register maintenance: each micro-batch's
    * per-(type, bucket) max-rank register frame
    * ([[graft.ext.Sketches.hllRegisters]] — the same build the batch
    * query uses) merges into the stored one by position-wise MAX, the
    * register merge law SketchesSpec proves for shard sketches. The
    * running registers answer "how many distinct users has each type
    * ever seen" from m·|types| rows without a rescan. Same versioned
    * publish + TxnLog commit as the KMV path; like KMV (and unlike
    * CMS's sum), the max-merge is idempotent AND monotone, so even a
    * torn rerun converges to the same registers. */
  def updateHllSketch(batch: DataFrame, batchId: Long,
      sketchDir: String): Unit =
    mergePublish(batch.sparkSession, sketchDir, "hllregs", batchId) { prev =>
      val br = graft.ext.Sketches.hllRegisters(batch)
      prev match {
        case Some(p) =>
          p.select(col("event_type"), col("bucket"), col("mreg").as("rank"))
            .unionByName(br.withColumnRenamed("mreg", "rank"))
            .groupBy(col("event_type"), col("bucket"))
            .agg(max(col("rank")).as("mreg"))
        case None => br
      }
    }

  /** Current per-type HLL estimates from the stored registers — shares
    * [[graft.ext.Sketches.hllEstimateFrom]] with the batch query.
    * Empty (0-row) frame before the first commit. */
  def hllEstimate(spark: SparkSession, sketchDir: String): DataFrame =
    readLatest(spark, sketchDir, "hllregs") match {
      case Some(regs) => graft.ext.Sketches.hllEstimateFrom(regs)
      case None => spark.range(0).select(
        col("id").cast("string").as("event_type"), col("id").as("z_empty"),
        col("id").as("s_scaled"), col("id").cast("double").as("raw_est"),
        col("id").cast("double").as("hll_est"))
    }

  /** Streaming quantile-sketch maintenance: each micro-batch's
    * bottom-k row sample ([[graft.ext.Sketches.quantileSample]] — the
    * same build the batch query uses) merges with the stored one by
    * union + per-type re-take-k, the bottom-k merge law SketchesSpec
    * proves for shard sketches. The running sample answers per-type
    * quantile point queries over the WHOLE ingested history from
    * ≤ k·|types| rows — the distribution-drift monitor a training
    * pipeline wants while data is still arriving. Same versioned
    * publish + TxnLog commit as the KMV path; the merge is idempotent
    * AND monotone (identical rows dedup on (type, event_id) before the
    * re-take, so a torn rerun converges — the KMV `distinct` property,
    * spelled out because bottom-k over a bag would double-count). */
  def updateQuantileSketch(batch: DataFrame, batchId: Long,
      sketchDir: String, k: Int = 256): Unit =
    mergePublish(batch.sparkSession, sketchDir, "qsample", batchId) { prev =>
      val cols = Seq("event_type", "event_id", "value")
      val batchRows = batch.select(cols.head, cols.tail: _*)
      val all = prev match {
        case Some(p) => p.select(cols.head, cols.tail: _*)
          .unionByName(batchRows)
        case None => batchRows
      }
      graft.ext.Sketches.quantileSample(
        all.dropDuplicates(Seq("event_type", "event_id")), k)
    }

  /** Streaming DSIR bucket-stat maintenance: each micro-batch's
    * (bucket, ct, cr) target/raw token counts
    * ([[graft.ext.TextOps.dsirBucketStats]] — the same build the batch
    * query uses) merge into the stored frame by position-wise SUM —
    * the CMS merge law, replay-safe through the batch-id guard and,
    * like CMS, NOT idempotent by itself (a re-sum double-counts; the
    * guard is load-bearing). The running stats let the pipeline score
    * any candidate slice against the FULL ingested history via
    * [[dsirScore]] while data is still arriving — importance weights
    * that sharpen as the reference corpus grows, without a rescan. */
  def updateDsirStats(batch: DataFrame, batchId: Long, statsDir: String,
      targetSources: Seq[String] = Seq("src0", "src1"),
      buckets: Int = 1024): Unit =
    mergePublish(batch.sparkSession, statsDir, "dsirstats", batchId) { prev =>
      val bs = graft.ext.TextOps.dsirBucketStats(batch, targetSources, buckets)
      prev match {
        case Some(p) => p.select(col("bucket"), col("ct"), col("cr"))
          .union(bs).groupBy(col("bucket"))
          .agg(sum(col("ct")).as("ct"), sum(col("cr")).as("cr"))
        case None => bs
      }
    }

  /** Deterministic DSIR top-k of `rawDocs` against the stored stats —
    * shares [[graft.ext.TextOps.dsirResampleFrom]] with the batch
    * query (`buckets` must match the maintenance calls). Tokens in
    * buckets the stats have never seen drop out of the score — the
    * inner-join semantics of the batch path, acceptable because a
    * maintained reference corpus has populated every bucket raw
    * candidates hit. Empty (0-row) frame before the first commit. */
  def dsirScore(spark: SparkSession, statsDir: String, rawDocs: DataFrame,
      buckets: Int = 1024, k: Int = 200): DataFrame =
    readLatest(spark, statsDir, "dsirstats") match {
      case Some(stats) =>
        graft.ext.TextOps.dsirResampleFrom(rawDocs, stats, buckets, k)
      case None => spark.range(0).select(
        col("id").as("doc_id"), col("id").cast("string").as("source"),
        col("id").as("n_tokens"), col("id").as("weight_bits"))
    }

  /** Current per-type quantile estimates from the stored sample —
    * shares [[graft.ext.Sketches.quantileEstimatesFrom]] with the
    * batch query. Empty (0-row) frame before the first commit. */
  def quantileEstimate(spark: SparkSession, sketchDir: String,
      k: Int = 256): DataFrame =
    readLatest(spark, sketchDir, "qsample") match {
      case Some(s) => graft.ext.Sketches.quantileEstimatesFrom(s, k)
      case None => spark.range(0).select(
        col("id").cast("string").as("event_type"), col("id").as("sample_k"),
        col("id").cast("double").as("p50_est"),
        col("id").cast("double").as("p90_est"),
        col("id").cast("double").as("p99_est"))
    }

  /** Point-query the stored counter sketch for `keys` (0-row frame
    * before the first commit; never-inserted keys estimate 0). */
  def cmsLookup(spark: SparkSession, sketchDir: String, keys: Seq[String],
      depth: Int = 4, width: Int = 1024): DataFrame =
    readLatest(spark, sketchDir, "counters") match {
      case Some(counters) =>
        graft.ext.Sketches.cmsLookupFrom(counters, keys, depth, width)
      case None => spark.range(0).select(
        col("id").cast("string").as("event_type"), col("id").as("cms_est"))
    }

  /** Versioned micro-batch publish: build the merged frame from the
    * latest COMMITTED version, write it to an immutable
    * <prefix>-<batchId> dir, then commit the TxnLog marker. A crash
    * mid-write leaves the previous committed version untouched — an
    * in-place Overwrite instead deletes the old files before the new
    * job commits, so a crash there (or a concurrent reader that
    * listed the old files) loses the sketch. The merged frame is
    * pinned (localCheckpoint) before the write — the
    * read-your-own-write hazard pin the ingest paths share. */
  private def mergePublish(spark: SparkSession, sketchDir: String,
      prefix: String, batchId: Long)
      (merge: Option[DataFrame] => DataFrame): Unit = {
    TxnLog.runOnce(s"$sketchDir/_txn", batchId) {
      val merged = merge(readLatest(spark, sketchDir, prefix))
        .localCheckpoint()
      merged.write.mode(SaveMode.Overwrite)
        .parquet(s"$sketchDir/$prefix-$batchId")
    }
    // best-effort compaction AFTER commit: keep the two newest
    // committed versions (the -1 guards a reader that listed the
    // previous latest just before this batch published); the version
    // dirs are sketch-sized (k rows / depth·width rows), so retention
    // cost is trivial either way
    val all = committedIds(sketchDir, prefix).sorted
    all.dropRight(2).foreach { id =>
      scala.util.Try {
        val d = Paths.get(s"$sketchDir/$prefix-$id")
        if (Files.exists(d)) {
          Files.walk(d).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { Files.deleteIfExists(p); () })
        }
      }
    }
    // ... and fold the now-dirless batch markers into the TxnLog
    // high-water mark (retaining markers for the surviving version
    // dirs, which committedIds locates through them) — otherwise _txn
    // grows one marker file per micro-batch for the stream's lifetime
    scala.util.Try(
      TxnLog.compact(s"$sketchDir/_txn", retain = all.takeRight(2).toSet))
    ()
  }

  private def committedIds(sketchDir: String, prefix: String): Seq[Long] = {
    val log = Paths.get(s"$sketchDir/_txn")
    if (!Files.exists(log)) Seq.empty
    else {
      graft.DirIO.numberedEntries(log, "batch-")
        .filter(id => Files.exists(Paths.get(s"$sketchDir/$prefix-$id")))
    }
  }

  /** The latest COMMITTED version of a sketch frame, if any batch has
    * published one (marker present AND version dir present — a torn
    * write without its marker is invisible). */
  private def readLatest(spark: SparkSession, sketchDir: String,
      prefix: String): Option[DataFrame] =
    committedIds(sketchDir, prefix).sorted.lastOption.map(id =>
      spark.read.parquet(s"$sketchDir/$prefix-$id"))

  /** The latest committed KMV mins frame ([[updateKmvSketch]]). */
  def readKmvSketch(spark: SparkSession, sketchDir: String): Option[DataFrame] =
    readLatest(spark, sketchDir, "mins").map(_.select(col("hv")))

  /** Current distinct-count estimate from the stored sketch — shares
    * [[graft.ext.Sketches.kmvEstimateFrom]] (including the
    * below-capacity exactness refinement) with the batch query. Empty
    * (0-row) frame before the first batch commits. */
  def kmvEstimate(spark: SparkSession, sketchDir: String,
      k: Int = 64): DataFrame =
    readKmvSketch(spark, sketchDir) match {
      case Some(mins) => graft.ext.Sketches.kmvEstimateFrom(mins, k)
      case None => spark.range(0).select(
        col("id").as("k"), col("id").as("vk"),
        col("id").cast("double").as("n_distinct_est"))
    }

  /** Streaming entry for the sketch-maintenance path. */
  def startKmv(docs: DataFrame, sketchDir: String,
      checkpointDir: String, k: Int = 64): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        updateKmvSketch(batch, batchId, sketchDir, k); ()
      }
      .start()
}
