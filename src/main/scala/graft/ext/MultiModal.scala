package graft.ext

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media object: opaque binary payload + typed metadata. In a real
  * corpus the payload is image/audio/video bytes and the metadata comes
  * from the container format; here the payload is the document text's
  * bytes so every derived value stays deterministic and oracle-checkable. */
case class MediaFile(
    doc_id: Long,
    media_type: String,
    payload: Array[Byte],
    width: Int,
    height: Int)

/** Extracted features for one media object. */
case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    byte_len: Int,
    content_hash: String,
    brightness: Double,
    f0: Double, f1: Double, f2: Double, f3: Double)

/** Multimodal-column plumbing: binary payloads with typed metadata,
  * decoded/feature-extracted per partition.
  *
  * The DECODE STEP IS A STUB — this container has no image/audio codecs,
  * so `decodeStub` derives deterministic pseudo-features from the raw
  * bytes (length, digest, leading-byte statistics). Everything around it
  * is the real plumbing a production pipeline needs and is what this
  * module demonstrates: a `binary` column with typed metadata, a typed
  * `Dataset[MediaFile]`, batched per-partition processing via
  * mapPartitions (one codec/model instance per partition, amortized —
  * the Scala analog of mapInPandas batch shape), and a columnar,
  * oracle-checkable output schema.
  *
  * Scale posture: feature extraction is embarrassingly parallel; the
  * payload column never shuffles (all aggregations happen after the
  * narrow extract), and partition sizing is governed by
  * files.maxPartitionBytes on a real binary-file source.
  */
object MultiModal {

  /** Derive a media table from `documents`: payload = UTF-8 bytes, fake
    * image metadata from the text length (deterministic). */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image/jpeg")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("n_chars") % 640 + 64).cast("int").as("width"),
      (col("n_chars") % 480 + 48).cast("int").as("height"))

  /** The stubbed decode: deterministic pseudo-features from raw bytes.
    * A real deployment replaces the body with a codec call; the
    * signature (bytes in, fixed-width features out) is the contract. */
  private[ext] def decodeStub(payload: Array[Byte],
      digest: MessageDigest): (String, Double, Array[Double]) = {
    digest.reset()
    val hash = digest.digest(payload).map("%02x".format(_)).mkString
    val head = payload.take(16).map(_ & 0xff)
    val brightness = if (head.isEmpty) 0.0 else head.sum.toDouble / head.length
    val f = (0 until 4).map(i =>
      (if (i < payload.length) payload(i) & 0xff else 0) / 255.0).toArray
    (hash, brightness, f)
  }

  /** Per-partition feature extraction: one digest (≈ codec/model
    * instance) per partition, reused across the partition's rows. */
  def extractFeatures(media: Dataset[MediaFile]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val digest = MessageDigest.getInstance("MD5")
      rows.map { m =>
        val (hash, brightness, f) = decodeStub(m.payload, digest)
        MediaFeatures(m.doc_id, m.media_type, m.payload.length, hash,
          brightness, f(0), f(1), f(2), f(3))
      }
    }
  }

  /** Feature query over documents-as-media (typed Dataset round trip). */
  def features(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    extractFeatures(mediaTable(documents).as[MediaFile]).toDF()
  }

  /** Resize planning (pure metadata, no pixel work): scale the longer
    * side to 224 preserving aspect ratio, integer floor — the shape of
    * a preprocessing stage that runs before batched decode. */
  def resizePlan(documents: DataFrame): DataFrame =
    mediaTable(documents).select(
      col("doc_id"), col("media_type"), col("width"), col("height"),
      when(col("width") >= col("height"),
        lit(224)).otherwise((col("width") * 224) / col("height"))
        .cast("int").as("target_w"),
      when(col("width") >= col("height"),
        (col("height") * 224) / col("width")).otherwise(lit(224))
        .cast("int").as("target_h"))

  /** Frame sampling plan for the video rows: every k-th frame index of a
    * fake frame count derived from the payload length — the batch-shape
    * of a video pipeline (explode to frames, process, re-aggregate). */
  def frameSamplePlan(documents: DataFrame, everyK: Int = 10): DataFrame =
    mediaTable(documents)
      .filter(col("media_type") === "video/mp4")
      .select(col("doc_id"), length(col("payload")).as("n_frames"))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1,
          lit(everyK))).as("frame_idx"))
}
