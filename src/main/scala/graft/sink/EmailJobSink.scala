package graft.sink

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** O14 + O8/O11 as an effectively-once batch sink (SURVEY.md §7.4.2):
  * email jobs appended idempotently by dedup_id, and the status table
  * merged last-write-wins by (event_id, guest_id).
  *
  * The job append anti-joins the incoming batch against the keys already
  * in the sink, so replaying a batch (checkpoint recovery, at-least-once
  * upstream) cannot double-send — the engine-side realization of the
  * reference's advisory dedupId (index.js:572, advisory only because
  * standard SQS doesn't enforce it).
  *
  * Storage is plain parquet with a tmp-dir swap for the merge; a
  * transactional table format (Delta/Iceberg) replaces the swap with a
  * real MERGE at production scale — the dataflow (anti-join append +
  * keyed merge) is identical.
  */
object EmailJobSink {

  private def readIfExists(spark: org.apache.spark.sql.SparkSession,
      dir: String): Option[DataFrame] =
    if (graft.DirIO.nonEmpty(dir)) Some(spark.read.parquet(dir))
    else None

  /** Idempotent append: only jobs whose dedup_id is not yet in the sink
    * are written. Returns the number of newly written rows. */
  def appendJobs(jobs: DataFrame, jobsDir: String): Long = {
    val spark = jobs.sparkSession
    // pinned so the anti-join runs once: the count and the conditional
    // write both act on the materialized frame (the write must stay
    // conditional — an empty Append still creates the directory, which
    // would flip readIfExists to a schemaless parquet read next batch)
    val fresh = (readIfExists(spark, jobsDir) match {
      case Some(existing) =>
        jobs.join(existing.select(col("dedup_id")).distinct(),
          Seq("dedup_id"), "left_anti")
      case None => jobs
    }).localCheckpoint()
    val n = fresh.count()
    if (n > 0) fresh.write.mode(SaveMode.Append).parquet(jobsDir)
    n
  }

  /** Last-write-wins merge of status updates into the status table,
    * keyed (event_id, guest_id); `seq` breaks ties within the batch. */
  def mergeStatus(updates: DataFrame, statusDir: String): Unit = {
    val spark = updates.sparkSession
    val incoming = updates.select(
      col("event_id"), col("guest_id"),
      col("new_delivery_status").as("delivery_status"))
    val merged = readIfExists(spark, statusDir) match {
      case Some(cur) =>
        // incoming wins over current on key collision
        cur.join(incoming.select("event_id", "guest_id"),
            Seq("event_id", "guest_id"), "left_anti")
          .unionByName(incoming)
      case None => incoming
    }
    val tmp = statusDir + ".tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    val target = Paths.get(statusDir)
    if (Files.exists(target)) deleteRecursively(target)
    Files.move(Paths.get(tmp), target)
  }

  private def deleteRecursively(p: Path): Unit =
    Files.walk(p).sorted(Comparator.reverseOrder[Path]())
      .forEach(f => Files.delete(f))

  /** Batch-commit log: the exactly-once foreachBatch pattern. A batch id
    * is committed by creating a marker file AFTER its writes complete;
    * `runOnce` skips batches whose marker already exists, so a replay
    * after a crash between sink-write and checkpoint-commit does nothing
    * (the data-level idempotence above already makes the replay safe —
    * the log makes it also FREE, and gives downstream readers a watermark
    * of fully-committed batches). Marker creation is atomic at the
    * filesystem level (create-new); object stores replace this with a
    * conditional PUT — same protocol. */
  object TxnLog {
    /** Committed = explicit marker present OR at/below the compacted
      * high-water mark. Micro-batch ids commit in order within a
      * stream, so "id ≤ max committed id" is exactly the replay-skip
      * predicate the per-batch markers encode — the hwm file is their
      * lossless compaction. */
    def committed(logDir: String, batchId: Long): Boolean =
      Files.exists(Paths.get(logDir, s"batch-$batchId")) ||
        batchId <= highWaterMark(logDir)

    /** Max batch id folded into the hwm file by [[compact]]; -1 when
      * no compaction has run. */
    def highWaterMark(logDir: String): Long = {
      val p = Paths.get(logDir, "hwm")
      if (!Files.exists(p)) -1L
      else scala.util.Try(
        new String(Files.readAllBytes(p), "UTF-8").trim.toLong).getOrElse(-1L)
    }

    /** All batch ids with an explicit marker file (excludes ids only
      * covered by the hwm). */
    def markerIds(logDir: String): Seq[Long] = {
      val log = Paths.get(logDir)
      if (!Files.exists(log)) Seq.empty
      else {
        graft.DirIO.numberedEntries(log, "batch-")
      }
    }

    /** Fold committed markers into the hwm file, then delete every
      * marker at/below it except those in `retain` (ids whose sidecar
      * artifacts — e.g. versioned sketch dirs — still exist and are
      * located via their markers). Without this the log grows one file
      * per micro-batch for the stream's lifetime. Crash-safe: the hwm
      * is written to a temp file and atomically moved BEFORE any
      * marker is deleted, so a crash at any point leaves every id
      * still provably committed (marker or hwm). */
    def compact(logDir: String, retain: Set[Long] = Set.empty): Unit = {
      val ids = markerIds(logDir)
      if (ids.nonEmpty) {
        val hwm = math.max(ids.max, highWaterMark(logDir))
        val tmp = Paths.get(logDir, "hwm.tmp")
        Files.write(tmp, hwm.toString.getBytes("UTF-8"))
        Files.move(tmp, Paths.get(logDir, "hwm"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ids.filter(id => id <= hwm && !retain.contains(id)).foreach { id =>
          Files.deleteIfExists(Paths.get(logDir, s"batch-$id")); ()
        }
      }
    }

    /** Run `write` iff `batchId` is not yet committed, then commit it.
      * Returns true when the batch executed, false when skipped. */
    def runOnce(logDir: String, batchId: Long)(write: => Unit): Boolean =
      if (committed(logDir, batchId)) false
      else {
        write
        Files.createDirectories(Paths.get(logDir))
        Files.createFile(Paths.get(logDir, s"batch-$batchId"))
        true
      }
  }
}
