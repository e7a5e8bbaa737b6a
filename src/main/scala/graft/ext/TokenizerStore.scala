package graft.ext

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A PERSISTED trained BPE tokenizer — the shared artifact of a real
  * training-data pipeline: one job trains the merge rules
  * ([[TextOps.bpeTrainMerges]]), publishes them here, and every
  * encoder session loads the frozen artifact instead of retraining
  * (the reference has no tokenizer at all; this is LLM-pipeline
  * extension surface, same posture as [[EmbedIndex]]).
  *
  * On-disk layout (parquet dirs + tiny text files, under `dir`):
  * {{{
  *   e<E>-merges/            (merge_rank, pair_left, pair_right,
  *                            merged, pair_count) — FROZEN rule table
  *   e<E>-vocab/             (token_id, token, kind) — base alphabet +
  *                            merged tokens, deterministic ids
  *   _commits/manifest-<gen> the commit: which dirs are live
  * }}}
  *
  * Commit protocol — MANIFEST GENERATIONS, exactly [[EmbedIndex]]'s
  * single-file-atomicity contract: data dirs are immutable and carry
  * no authority; the highest-generation manifest is the only truth;
  * every publish is write-temp + atomic rename, so a writer dying
  * mid-train leaves orphan dirs and no manifest (readers keep serving
  * the previous generation) and a torn manifest temp is invisible.
  *
  * What this store deliberately does NOT have: streaming appends.
  * Merge rules are train-time-frozen like PQ codebooks — applying
  * half-updated rules would change every encoder's output mid-stream —
  * so the only mutation is a RETRAIN, which [[build]] publishes as a
  * whole new epoch beside the committed one (old generations stay
  * readable / time-travel-able until [[vacuum]]).
  *
  * Vocabulary ids are deterministic by construction (real tokenizers
  * ship exactly this shape): the base alphabet — every distinct
  * code-point token of the training corpus — sorted by binary
  * collation takes ids 0..B-1, then merged tokens follow in merge-rank
  * order. Two trainings over the same corpus produce bit-identical
  * artifacts. */
object TokenizerStore {

  /** One committed generation: live data-dir names + the training
    * round count (an encoder can sanity-check rule depth). */
  final case class Manifest(gen: Long, epoch: Long, rounds: Int,
      merges: String, vocab: String)

  private def commitDir(dir: String) = Paths.get(dir, "_commits")

  /** The current committed manifest, if any generation has published. */
  def manifest(dir: String): Option[Manifest] =
    committedGens(dir).lastOption.map(readManifest(dir, _))

  /** Every committed generation number, ascending — readable without
    * parsing manifest bodies (the upgrade path in [[build]] needs the
    * latest gen of a store it cannot otherwise read). */
  private def committedGens(dir: String): Seq[Long] =
    graft.DirIO.numberedEntries(commitDir(dir), "manifest-")

  /** Manifest format version. Bumped on any incompatible layout
    * change; a version mismatch is a LOUD error for readers, never a
    * silent reinterpretation — only [[build]] recovers (retraining is
    * the documented remedy, exactly [[EmbedIndex]]'s rule). */
  private val FormatVersion = 1

  private def readManifest(dir: String, gen: Long): Manifest = {
    val kv = new String(Files.readAllBytes(
      commitDir(dir).resolve(s"manifest-$gen")), "UTF-8")
      .linesIterator.filter(_.contains("="))
      .map { l => val Array(k, v) = l.split("=", 2); k -> v.trim }
      .toMap
    val found = kv.get("format").map(_.toInt).getOrElse(0)
    if (found != FormatVersion) throw new IllegalStateException(
      s"tokenizer store at $dir uses manifest format $found; this " +
        s"build reads format $FormatVersion — run build() (it starts " +
        "a fresh epoch beside the old data and publishes a readable " +
        "generation; vacuum reclaims the old files), or read with a " +
        "matching library version")
    Manifest(gen, kv("epoch").toLong, kv("rounds").toInt,
      kv("merges"), kv("vocab"))
  }

  private def publish(dir: String, m: Manifest): Unit = {
    Files.createDirectories(commitDir(dir))
    val body = s"format=$FormatVersion\nepoch=${m.epoch}\n" +
      s"rounds=${m.rounds}\nmerges=${m.merges}\nvocab=${m.vocab}\n"
    val tmp = commitDir(dir).resolve(s".manifest-${m.gen}.tmp")
    Files.write(tmp, body.getBytes("UTF-8"))
    Files.move(tmp, commitDir(dir).resolve(s"manifest-${m.gen}"),
      StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  /** Train on `documents` and publish merges + vocab as the next
    * generation at `dir`. A FIRST build commits generation 0; a
    * RETRAIN writes everything under a fresh epoch prefix beside the
    * committed data and swaps the manifest last — readers (including
    * time-travel readers) never observe a window with no tokenizer.
    * An old-format manifest reads as "no committed store this build
    * can extend": the rebuild starts past the legacy generations under
    * a non-colliding epoch (the [[EmbedIndex]] upgrade path). */
  def build(documents: DataFrame, dir: String, rounds: Int = 3): Unit = {
    val (prev, legacyLastGen) =
      try (manifest(dir), None) catch {
        case _: IllegalStateException =>
          (None, committedGens(dir).lastOption)
      }
    val gen = prev.map(_.gen + 1)
      .orElse(legacyLastGen.map(_ + 1)).getOrElse(0L)
    val epoch = prev.map(_.epoch + 1).getOrElse(gen)
    val merges = TextOps.bpeTrainMerges(documents, rounds)
      .localCheckpoint() // pin: the vocab derives from the same rules
    Files.createDirectories(Paths.get(dir))
    // mode=overwrite: a crashed build retried before any publish
    // recomputes the same epoch and overwrites its own torn dirs
    merges.write.mode("overwrite").parquet(s"$dir/e$epoch-merges")
    // base alphabet: every code-point token of the training corpus's
    // words (the same seeding as the trainer / encoder), binary-sorted
    // with dense ids 0..B-1. The distinct-token frame is bounded by
    // the code-point space — model-artifact-sized by contract, the
    // same adjudicated-collect posture as bpeEncodeFrom's merge table
    // (and a real tokenizer ships exactly this list) — so ids are
    // assigned driver-side rather than through a global window the
    // NoGlobalWindowGuard exists to flag.
    val spark = documents.sparkSession
    val alphabet: Array[String] = documents
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .select(explode(expr("filter(split(word, '(?!^)'), t -> t != '')"))
        .as("token"))
      .distinct()
      .collect().map(_.getString(0)).sorted
    val baseCount = alphabet.length.toLong
    import spark.implicits._
    val base = alphabet.zipWithIndex.toSeq
      .map { case (t, i) => (i.toLong, t, "base") }
      .toDF("token_id", "token", "kind")
    val mergedToks = merges
      .select((col("merge_rank").cast("long") + lit(baseCount - 1))
        .as("token_id"), col("merged").as("token"),
        lit("merged").as("kind"))
    base.unionAll(mergedToks)
      .write.mode("overwrite").parquet(s"$dir/e$epoch-vocab")
    publish(dir, Manifest(gen = gen, epoch = epoch, rounds = rounds,
      merges = s"e$epoch-merges", vocab = s"e$epoch-vocab"))
  }

  /** The committed merge table — [[TextOps.bpeEncodeFrom]]'s loaded
    * form takes exactly this frame. */
  def merges(spark: SparkSession, dir: String): DataFrame =
    mergesAt(spark, dir, manifest(dir).getOrElse(
      throw new IllegalStateException(s"no committed tokenizer at $dir")).gen)

  /** Time travel: the merge table of a retained earlier generation. */
  def mergesAt(spark: SparkSession, dir: String, gen: Long): DataFrame = {
    require(committedGens(dir).contains(gen),
      s"generation $gen is not committed at $dir")
    val man = readManifest(dir, gen)
    spark.read.parquet(s"$dir/${man.merges}")
  }

  /** The committed token vocabulary (token_id, token, kind). */
  def vocab(spark: SparkSession, dir: String): DataFrame = {
    val man = manifest(dir).getOrElse(
      throw new IllegalStateException(s"no committed tokenizer at $dir"))
    spark.read.parquet(s"$dir/${man.vocab}")
  }

  /** Reclaim data dirs no manifest generation references and abandoned
    * manifest temps — the only destructive step in the protocol. */
  def vacuum(dir: String): Unit = {
    val live: Set[String] = committedGens(dir)
      .map(readManifest(dir, _))
      .flatMap(m => Seq(m.merges, m.vocab)).toSet
    graft.DirIO.listPaths(Paths.get(dir)).foreach { p =>
      val n = p.getFileName.toString
      if (n != "_commits" && !live.contains(n)) wipe(p)
    }
    if (Files.exists(commitDir(dir)))
      graft.DirIO.listPaths(commitDir(dir))
        .filter(_.getFileName.toString.startsWith("."))
        .foreach(p => { Files.deleteIfExists(p); () })
  }

  private def wipe(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(q => { Files.deleteIfExists(q); () })
    }
}
