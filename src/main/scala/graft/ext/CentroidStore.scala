package graft.ext

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** PERSISTED k-means centroids — the frozen clustering geometry behind
  * semantic dedup, published once and loaded by every consumer:
  * [[EmbedOps.assignAgainst]] assigns new vectors without
  * re-clustering the corpus, and
  * [[graft.streaming.CorpusIngest.ingestBatchSemanticCentroid]] runs
  * incremental SemDeDup against the SAME geometry the batch
  * `embed_semdedup` query uses (replacing the hyperplane-signature
  * stand-in, which approximated cosine neighborhoods with random
  * projections unrelated to the batch clustering).
  *
  * On-disk layout (one parquet dir per epoch + tiny manifests):
  * {{{
  *   e<E>-centroids/         (centroid_id, cv: array<long>) — FROZEN
  *   _commits/manifest-<gen> the commit: which dir is live, k, iters
  * }}}
  *
  * Commit protocol — MANIFEST GENERATIONS, the [[EmbedIndex]] /
  * [[TokenizerStore]] single-file-atomicity contract verbatim: data
  * dirs are immutable and carry no authority, the highest-generation
  * manifest is the only truth, every publish is write-temp + atomic
  * rename. A writer dying mid-train leaves orphan dirs and no
  * manifest; a torn manifest temp is invisible to readers.
  *
  * Like the tokenizer (and PQ codebooks), centroids are train-time
  * FROZEN: there are no streaming appends, because moving a centroid
  * re-labels history — half-updated geometry would change which
  * cluster an already-ingested vector deduped into. The only mutation
  * is a RETRAIN, published as a fresh epoch beside the committed one
  * (old generations stay readable as time travel until [[vacuum]]).
  */
object CentroidStore {

  /** One committed generation: the live centroid dir + the training
    * shape (k, iters) a consumer can sanity-check. */
  final case class Manifest(gen: Long, epoch: Long, k: Int, iters: Int,
      centroids: String)

  private def commitDir(dir: String) = Paths.get(dir, "_commits")

  /** The current committed manifest, if any generation has published. */
  def manifest(dir: String): Option[Manifest] =
    committedGens(dir).lastOption.map(readManifest(dir, _))

  private def committedGens(dir: String): Seq[Long] =
    graft.DirIO.numberedEntries(commitDir(dir), "manifest-")

  /** Manifest format version — a mismatch errors LOUDLY for readers;
    * only [[build]] recovers (retrain as a fresh epoch). */
  private val FormatVersion = 1

  private def readManifest(dir: String, gen: Long): Manifest = {
    val kv = new String(Files.readAllBytes(
      commitDir(dir).resolve(s"manifest-$gen")), "UTF-8")
      .linesIterator.filter(_.contains("="))
      .map { l => val Array(k, v) = l.split("=", 2); k -> v.trim }
      .toMap
    val found = kv.get("format").map(_.toInt).getOrElse(0)
    if (found != FormatVersion) throw new IllegalStateException(
      s"centroid store at $dir uses manifest format $found; this " +
        s"build reads format $FormatVersion — run build() (it starts " +
        "a fresh epoch beside the old data and publishes a readable " +
        "generation; vacuum reclaims the old files), or read with a " +
        "matching library version")
    Manifest(gen, kv("epoch").toLong, kv("k").toInt, kv("iters").toInt,
      kv("centroids"))
  }

  /** Commit a manifest generation FIRST WRITER WINS: full content to
    * a temp, then an atomic hard link (link(2) — complete content,
    * EEXIST for every linker but the first; a rename-based move would
    * silently REPLACE on POSIX, letting a racing builder clobber a
    * committed generation). The loser errors loudly — its data dir is
    * an orphan [[vacuum]] reclaims. */
  private[graft] def publish(dir: String, m: Manifest): Unit = {
    Files.createDirectories(commitDir(dir))
    val body = s"format=$FormatVersion\nepoch=${m.epoch}\nk=${m.k}\n" +
      s"iters=${m.iters}\ncentroids=${m.centroids}\n"
    val tmp = commitDir(dir).resolve(s".manifest-${m.gen}.tmp-${m.centroids}")
    Files.write(tmp, body.getBytes("UTF-8"))
    try Files.createLink(commitDir(dir).resolve(s"manifest-${m.gen}"), tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"centroid store at $dir: generation ${m.gen} was committed " +
            "by a concurrent builder — this build's centroids " +
            s"(${m.centroids}) are NOT published; re-run build() to " +
            "train the next generation (vacuum reclaims the orphan)")
      case _: UnsupportedOperationException =>
        // filesystem without hard links (exFAT, some NFS/object-store
        // mounts): fall back to the rename commit — atomic, but
        // last-writer-wins rather than first (rename REPLACES on
        // POSIX), i.e. the single-writer contract is on the operator
        // there; stated rather than silently unsupported
        Files.move(tmp, commitDir(dir).resolve(s"manifest-${m.gen}"),
          StandardCopyOption.ATOMIC_MOVE)
        ()
    } finally {
      Files.deleteIfExists(tmp)
      ()
    }
    ()
  }

  /** Train at the [[EmbedOps.scaledK]] cluster count and publish the
    * centroid frame as the next generation at `dir`. A first build
    * commits generation 0; a retrain writes under a fresh epoch
    * prefix beside the committed data and swaps the manifest last. An
    * old-format manifest reads as "no committed store this build can
    * extend": the rebuild starts past the legacy generations under a
    * non-colliding epoch (the [[EmbedIndex]] upgrade path).
    *
    * CONCURRENCY: each attempt trains into its OWN nonce-suffixed dir
    * (recorded in the manifest), so a published generation can never
    * reference a directory another writer touched; the manifest link
    * is first-writer-wins, so two racing builders that computed the
    * same generation number publish exactly one of them and the loser
    * fails loudly. A crashed build leaves an orphan dir and no
    * manifest — invisible to readers, reclaimed by [[vacuum]]. */
  def build(embeddings: DataFrame, dir: String,
      targetBlock: Int = 1024, iters: Int = 2): Unit = {
    val (prev, legacyLastGen) =
      try (manifest(dir), None) catch {
        case _: IllegalStateException =>
          (None, committedGens(dir).lastOption)
      }
    val gen = prev.map(_.gen + 1)
      .orElse(legacyLastGen.map(_ + 1)).getOrElse(0L)
    val epoch = prev.map(_.epoch + 1).getOrElse(gen)
    val k = EmbedOps.scaledK(embeddings.count(), targetBlock)
    Files.createDirectories(Paths.get(dir))
    val nonce = java.lang.Long.toHexString(
      ProcessHandle.current().pid() ^ (System.nanoTime() << 16))
    val dataName = s"e$epoch-centroids-$nonce"
    EmbedOps.kmeansCentroids(embeddings, k, iters)
      .write.mode("overwrite").parquet(s"$dir/$dataName")
    publish(dir, Manifest(gen = gen, epoch = epoch, k = k,
      iters = iters, centroids = dataName))
  }

  /** The committed centroid frame — [[EmbedOps.assignAgainst]] takes
    * exactly this. */
  def centroids(spark: SparkSession, dir: String): DataFrame =
    centroidsAt(spark, dir, manifest(dir).getOrElse(
      throw new IllegalStateException(
        s"no committed centroid store at $dir")).gen)

  /** Time travel: the centroid frame of a retained generation. */
  def centroidsAt(spark: SparkSession, dir: String, gen: Long): DataFrame = {
    require(committedGens(dir).contains(gen),
      s"generation $gen is not committed at $dir")
    val man = readManifest(dir, gen)
    spark.read.parquet(s"$dir/${man.centroids}")
  }

  /** Reclaim superseded generations (their manifests AND the data
    * dirs only they reference), orphan data dirs no manifest
    * references, and abandoned manifest temps — the only destructive
    * step in the protocol. Keeps the newest `keepGenerations`
    * manifests readable as time travel (default 1 — the
    * [[EmbedIndex.vacuum]] posture: only the latest survives);
    * generations older than that are GONE after this, so a session
    * that rebuilds per run without bounding the store should vacuum
    * after each commit ([[graft.SparkEntry]]'s store helper does).
    * Non-live dirs touched within `graceMs` are spared: they may be a
    * concurrent builder's un-published attempt or a generation a live
    * reader still scans (shared store roots); `graceMs = 0` is the
    * single-writer teardown form. */
  def vacuum(dir: String, keepGenerations: Int = 1,
      graceMs: Long = 15 * 60 * 1000L): Unit = {
    require(keepGenerations >= 1,
      s"keepGenerations must be >= 1 (got $keepGenerations)")
    val keep = committedGens(dir).takeRight(keepGenerations)
    val snapMaxGen = keep.lastOption.getOrElse(Long.MinValue)
    val live: Set[String] =
      keep.map(readManifest(dir, _)).map(_.centroids).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    def graced(p: java.nio.file.Path): Boolean = scala.util.Try(
      Files.getLastModifiedTime(p).toMillis <= cutoff).getOrElse(false)
    // ORDER: retire superseded manifests FIRST, data dirs second — a
    // crash (or a concurrent time-travel reader listing generations)
    // between the phases then sees a manifest-less orphan dir (benign,
    // re-vacuumable) instead of a committed manifest pointing at a
    // wiped dir (a loud require beats a parquet path-not-found).
    // Two concurrent-publisher guards on the _commits pass itself:
    // (1) only a manifest whose gen sits STRICTLY BELOW the snapshot's
    // newest gen is "superseded" — a generation published between the
    // keep snapshot and this delete pass has gen > snapMaxGen and is
    // never touched (deleting it would silently un-publish a commit
    // whose publish() succeeded); (2) the graceMs window applies to
    // _commits entries too — a .manifest-*.tmp is a publisher mid-link
    // and even a superseded manifest may still be under a concurrent
    // time-travel reader's feet, so only entries older than the grace
    // cutoff are retired.
    if (Files.exists(commitDir(dir)))
      graft.DirIO.listPaths(commitDir(dir))
        .filter { p =>
          val n = p.getFileName.toString
          graced(p) && (n.startsWith(".") ||
            (n.startsWith("manifest-") &&
              scala.util.Try(n.stripPrefix("manifest-").toLong).toOption
                .exists(g => !keep.contains(g) && g < snapMaxGen)))
        }
        .foreach(p => { Files.deleteIfExists(p); () })
    // grace window: a non-live dir modified within graceMs may be a
    // CONCURRENT builder's in-flight attempt (nonce dirs have no
    // manifest until publish) — wiping it would let that builder
    // publish a manifest referencing a vanished dir. Recently-touched
    // orphans are left for the next vacuum; pass graceMs = 0 for the
    // single-writer teardown case.
    graft.DirIO.listPaths(Paths.get(dir)).foreach { p =>
      val n = p.getFileName.toString
      val old = scala.util.Try(
        Files.getLastModifiedTime(p).toMillis <= cutoff).getOrElse(false)
      if (n != "_commits" && !live.contains(n) && old) wipe(p)
    }
  }

  private def wipe(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(q => { Files.deleteIfExists(q); () })
    }
}
