package graft.ext

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A PERSISTED, incrementally-maintained IVF-PQ index — the missing
  * half of the ANN family: [[EmbedOps.trainPq]]/[[EmbedOps.ivfPqTopKFrom]]
  * train per session; this stores the trained artifacts and lets later
  * sessions (and appends) reuse them without retraining. The reference
  * has no ANN at all (its one lookup is the keyed dedup query,
  * index.js:107-141); this is the LLM-pipeline extension surface.
  *
  * On-disk layout (all parquet, under `dir`):
  * {{{
  *   cents/        (sub, centroid_id, cv)           codebooks — written once, FROZEN
  *   seg-<id>/     (vec_id, sub, centroid_id, label) one code segment per build/append
  *   sums-<id>/    (label, i, s, n)                  CUMULATIVE coarse sufficient stats
  *   _commits/seg-<id>                               zero-byte marker, written LAST
  * }}}
  *
  * Crash-atomic publish (same marker discipline as
  * [[graft.streaming.CorpusIngest]]'s sketch store): data dirs are
  * immutable once written, and a segment exists only when its marker
  * AND both dirs do — a writer dying mid-append leaves a torn,
  * invisible segment; readers keep serving the previous state.
  *
  * Incremental maintenance contract: appends encode the delta with the
  * FROZEN codebooks ([[EmbedOps.encodePq]]) and merge the coarse
  * sufficient statistics by integer addition — so the derived coarse
  * centroids after N appends are bit-identical to a single build over
  * the concatenated corpus with the same codebooks. That exactness is
  * what lets the incremental search hash-gate against a from-scratch
  * SQL oracle. Codes are append-only segments: an append writes
  * O(|delta|) code rows + an nlist×dims sums frame, never rewrites the
  * corpus — the 100-TB property (re-encoding 100 TB per append would
  * be a rebuild in disguise).
  *
  * What appends do NOT do: retrain codebooks or re-list old vectors.
  * Quantization drift under a shifting distribution is a monitored
  * RETRAIN decision ([[EmbedOps.ivfPqRecallCompare]] is the monitor) —
  * triggering [[build]] again, which atomically replaces the index.
  */
object EmbedIndex {

  /** The loaded read-view of an index version: frozen codebooks, the
    * union of committed code segments, derived coarse centroids, and
    * the stored PQ geometry (searchers must slice queries exactly the
    * way the index was built — it rides with the index, not the
    * caller). */
  final case class State(cents: DataFrame, codes: DataFrame,
      coarse: DataFrame, m: Int, dsub: Int)

  private def commitDir(dir: String) = Paths.get(dir, "_commits")

  /** Committed segment ids: marker present AND both data dirs present
    * (a torn write without its marker — or a marker whose dirs were
    * lost — is invisible). */
  def committedSegs(dir: String): Seq[Long] =
    if (!Files.exists(commitDir(dir))) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.list(commitDir(dir)).iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("seg-") =>
          s.stripPrefix("seg-").toLong }
        .filter(id => Files.exists(Paths.get(dir, s"seg-$id")) &&
          Files.exists(Paths.get(dir, s"sums-$id")))
        .toSeq.sorted
    }

  private def wipe(dir: String): Unit = {
    val d = Paths.get(dir)
    if (Files.exists(d)) {
      Files.walk(d).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { Files.deleteIfExists(p); () })
    }
  }

  /** Train on `embeddings` and atomically REPLACE the index at `dir`:
    * codebooks, segment 0's codes (with their inverted-list label),
    * and the coarse sufficient statistics. The commit marker goes last;
    * a crash before it leaves no readable index. */
  def build(embeddings: DataFrame, dir: String, m: Int = 4,
      dsub: Int = 16, ksub: Int = 8): Unit = {
    wipe(dir)
    val pq = EmbedOps.trainPq(embeddings, m, dsub, ksub)
    try {
      Files.createDirectories(Paths.get(dir))
      Files.write(Paths.get(dir, "meta"),
        s"m=$m\ndsub=$dsub\n".getBytes("UTF-8"))
      pq.cents.write.parquet(s"$dir/cents")
      pq.codes
        .join(embeddings.select(col("vec_id"), col("label")), Seq("vec_id"))
        .write.parquet(s"$dir/seg-0")
      EmbedOps.coarseSums(embeddings).write.parquet(s"$dir/sums-0")
      Files.createDirectories(commitDir(dir))
      Files.write(commitDir(dir).resolve("seg-0"), Array.emptyByteArray)
      ()
    } finally {
      // build is one-shot: the trainPq caches have served their writes
      pq.subs.unpersist(); pq.codes.unpersist(); ()
    }
  }

  /** Append `delta` as a new segment: encode with the frozen codebooks,
    * write O(|delta|) code rows, merge the coarse sums exactly, commit
    * the marker last. Readers racing the append see the previous
    * segment set until the marker lands. */
  def append(delta: DataFrame, dir: String): Unit = {
    val segs = committedSegs(dir)
    require(segs.nonEmpty, s"no committed index at $dir — build() first")
    appendAt(delta, dir, segs, segs.last + 1)
  }

  /** Idempotent per-micro-batch append — the STREAMING maintenance
    * entry ([[startAppend]]). The segment id derives from the batch id
    * (seg-0 is the build), so a batch replayed after a crash
    * re-commits the SAME segment instead of double-appending — the
    * batch-id guard that makes [[graft.streaming.CorpusIngest]]'s
    * sketch stores replay-safe, load-bearing here for the same reason
    * (codes would duplicate, sums would double-count). A torn dir from
    * the crashed attempt is overwritten; a batch-id behind the
    * committed high-water mark (a stream restarted with a FRESH
    * checkpoint against a populated index) fails loudly rather than
    * silently rewriting history. */
  def appendBatch(delta: DataFrame, dir: String, batchId: Long): Unit = {
    val segs = committedSegs(dir)
    require(segs.nonEmpty, s"no committed index at $dir — build() first")
    val segId = 1 + batchId
    if (!segs.contains(segId)) {
      require(segId > segs.last,
        s"batch $batchId maps to segment $segId behind committed " +
          s"high-water seg-${segs.last} at $dir — one stream checkpoint " +
          "per index lifetime")
      appendAt(delta, dir, segs, segId)
    }
  }

  /** Maintain the persisted index from an embedding stream
    * (vec_id, label, embedding): one replay-safe segment per
    * micro-batch. Searchers polling [[search]] between batches always
    * see a complete committed prefix. */
  def startAppend(vectors: DataFrame, dir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, dir, batchId); ()
      }
      .start()

  private def appendAt(delta: DataFrame, dir: String, segs: Seq[Long],
      segId: Long): Unit = {
    val spark = delta.sparkSession
    val (m, dsub) = readMeta(dir)
    val cents = spark.read.parquet(s"$dir/cents")
    EmbedOps.encodePq(delta, cents, m, dsub)
      .join(delta.select(col("vec_id"), col("label")), Seq("vec_id"))
      .write.mode("overwrite").parquet(s"$dir/seg-$segId")
    spark.read.parquet(s"$dir/sums-${segs.last}")
      .unionByName(EmbedOps.coarseSums(delta))
      .groupBy(col("label"), col("i"))
      .agg(sum(col("s")).as("s"), sum(col("n")).as("n"))
      .write.mode("overwrite").parquet(s"$dir/sums-$segId")
    Files.write(commitDir(dir).resolve(s"seg-$segId"), Array.emptyByteArray)
    ()
  }

  private def readMeta(dir: String): (Int, Int) = {
    val kv = new String(Files.readAllBytes(Paths.get(dir, "meta")), "UTF-8")
      .linesIterator.filter(_.contains("="))
      .map { l => val Array(k, v) = l.split("=", 2); k -> v.trim.toInt }
      .toMap
    (kv("m"), kv("dsub"))
  }

  /** Load the committed read-view: all committed code segments, the
    * frozen codebooks, and centroids derived from the latest sums. */
  def load(spark: SparkSession, dir: String): State = {
    val segs = committedSegs(dir)
    require(segs.nonEmpty, s"no committed index at $dir")
    val (m, dsub) = readMeta(dir)
    State(
      cents = spark.read.parquet(s"$dir/cents"),
      codes = spark.read.parquet(segs.map(id => s"$dir/seg-$id"): _*),
      coarse = EmbedOps.coarseCentroidsFromSums(
        spark.read.parquet(s"$dir/sums-${segs.last}")),
      m = m, dsub = dsub)
  }

  /** Search the persisted index: load the committed state and run the
    * broadcast-only ADC search ([[EmbedOps.ivfPqSearch]]). `queries`
    * carry raw embeddings; the corpus side is codes only. */
  def search(spark: SparkSession, dir: String, queries: DataFrame,
      k: Int = 5, nprobe: Int = 2): DataFrame = {
    val st = load(spark, dir)
    EmbedOps.ivfPqSearch(queries, st.cents, st.codes, st.coarse, k, nprobe,
      st.m, st.dsub)
  }
}
