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

/** One synthesized image file: real encoded bytes in a binary column. */
case class ImageFile(doc_id: Long, format: String, payload: Array[Byte])

/** Real-decode output: geometry parsed from the header, channel sums
  * from the pixel walk — every value an exact integer, so the whole
  * decode path hash-matches a SQL oracle that computes the same sums
  * from the generation formula. */
case class DecodedFeatures(
    doc_id: Long,
    format: String,
    width: Int,
    height: Int,
    n_pixels: Long,
    sum_r: Long,
    sum_g: Long,
    sum_b: Long,
    brightness_q: Long)

/** One synthesized audio file: real RIFF/WAVE bytes in a binary column. */
case class AudioFile(doc_id: Long, payload: Array[Byte])

/** One synthesized video file: real uncompressed-AVI bytes in a binary
  * column. */
case class VideoFile(doc_id: Long, payload: Array[Byte])

/** Real-video-decode output, one row per SAMPLED frame: container
  * metadata parsed from the AVI headers, channel sums from the frame's
  * DIB pixel walk — every value an exact integer, so the decode path
  * hash-matches a SQL oracle recomputing the same sums from the
  * generation formula. */
case class DecodedFrame(
    doc_id: Long,
    n_frames: Int,
    frame_idx: Int,
    width: Int,
    height: Int,
    duration_us: Long,
    sum_r: Long,
    sum_g: Long,
    sum_b: Long,
    brightness_q: Long)

/** Real-audio-decode output: rate/geometry parsed from the RIFF header,
  * sample statistics from the PCM walk — every value an exact integer,
  * so the decode path hash-matches a SQL oracle recomputing the same
  * sums from the generation formula. */
case class DecodedAudio(
    doc_id: Long,
    sample_rate: Long,
    n_samples: Long,
    duration_us: Long,
    peak_abs: Long,
    sum_abs: Long,
    energy: Long,
    zero_crossings: Long)

/** Multimodal-column plumbing: binary payloads with typed metadata,
  * decoded/feature-extracted per partition.
  *
  * IMAGES DECODE FOR REAL: [[ImageCodec]] is a pure-JVM BMP/PPM
  * parser (header + pixel layout, row padding, bottom-up order — no
  * native codec needed), and the `mm_decode` query runs actual encoded
  * bytes through it inside mapPartitions; the oracle recomputes the
  * expected pixel sums independently, so a header-offset or padding
  * bug fails the hash gate. AUDIO DECODES FOR REAL TOO: [[AudioCodec]]
  * walks genuine RIFF/WAVE chunks (pad bytes, vendor chunks, LE PCM16)
  * and `mm_audio` gates its sample statistics the same way. VIDEO NOW
  * DECODES FOR REAL AS WELL: [[VideoCodec]] parses uncompressed AVI
  * (RIFF 'AVI ' + DIB frame chunks — [[AudioCodec]]'s RIFF walk
  * composed with [[ImageCodec]]'s DIB pixel layout) and `mm_frames`
  * gates per-frame pixel statistics end to end. The [[decodeStub]]
  * below survives only as the signature-level contract for formats
  * that genuinely need a native codec (JPEG/MP3/H.264), feeding the
  * plan-shape queries `mm_features`/`mm_resize`.
  * Everything around both is the real plumbing a pipeline needs: a
  * `binary` column with typed metadata, a typed Dataset, batched
  * per-partition processing via mapPartitions (one codec/model
  * instance per partition, amortized — the Scala analog of mapInPandas
  * batch shape), and a columnar, oracle-checkable output schema.
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

  /** Deterministic pixel function for doc `id`: channel values are
    * independent integer LCG-ish residues of the row-major pixel index,
    * so the oracle reproduces every channel sum with three SUMs over
    * `range(0, w*h)` — no binary parsing needed on the SQL side. */
  private[ext] def pixelOf(id: Long)(p: Int): (Int, Int, Int) = (
    ((id * 31 + p * 7L) % 256).toInt,
    ((id * 17 + p * 11L) % 256).toInt,
    ((id * 13 + p * 5L) % 256).toInt)

  private[ext] def geomOf(id: Long): (Int, Int) =
    ((id % 6 + 2).toInt, (id % 4 + 2).toInt)

  /** Synthesize REAL image bytes for the image-typed docs
    * (doc_id % 3 == 0): even multiples of 3 encode as 24-bit BMP, odd
    * as P6 PPM — both through [[ImageCodec]]'s encoder, so the payload
    * column carries genuine headers, row padding, and byte order. In a
    * real corpus this column comes off a binaryFile/object-store scan;
    * the synthesis stands in for that source deterministically. */
  def imageTable(documents: DataFrame): Dataset[ImageFile] = {
    import documents.sparkSession.implicits._
    documents.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long]
      .map { id =>
        val (w, h) = geomOf(id)
        if (id % 6 == 0)
          ImageFile(id, "bmp", ImageCodec.encodeBmp(w, h, pixelOf(id)))
        else
          ImageFile(id, "ppm", ImageCodec.encodePpm(w, h, pixelOf(id)))
      }
  }

  /** REAL decode: parse each payload's header and pixels with
    * [[ImageCodec]] and emit exact integer channel sums + the
    * geometry THE PARSER read (not the metadata the synthesizer knew) —
    * the oracle recomputes the same values from the pixel formula, so
    * the gate verifies the full encode→decode roundtrip. brightness_q
    * is the integer mean channel value, (Σr+Σg+Σb) div 3·n — non-
    * negative operands, so Spark/DuckDB division conventions agree. */
  def decodeImages(images: Dataset[ImageFile]): Dataset[DecodedFeatures] = {
    import images.sparkSession.implicits._
    images.mapPartitions { rows =>
      rows.map { f =>
        val img = ImageCodec.decode(f.payload)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var p = 0
        val n = img.width * img.height
        while (p < n) {
          sr += img.r(p); sg += img.g(p); sb += img.b(p)
          p += 1
        }
        DecodedFeatures(f.doc_id, img.format, img.width, img.height,
          n.toLong, sr, sg, sb, (sr + sg + sb) / (3L * n))
      }
    }
  }

  /** The oracle-gated real-decode query (`mm_decode`). */
  def decodedFeatures(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    decodeImages(imageTable(documents)).toDF()
  }

  /** Geometry for the JPEG stills: MULTI-MCU frames (up to 3×2 blocks
    * with non-multiple-of-8 edges) so DC-prediction chains across
    * blocks, partial edge MCUs, and output crop all sit under the
    * hash gate — unlike the tiny single-block video frames. */
  private[ext] def jpegGeomOf(id: Long): (Int, Int) =
    ((8 + (id % 3) * 5).toInt, (6 + (id % 2) * 7).toInt)

  /** Per-8×8-block constant gray for the JPEG stills — block-varying
    * (so DC diffs are non-zero along the scan) yet DC-only per block,
    * which keeps the lossy codec exact ([[JpegCodec]] doc). */
  private[ext] def jpegBlockGrayOf(id: Long, bx: Int, by: Int): Int =
    ((id * 19 + bx * 47 + by * 89) % 256).toInt

  /** Synthesize REAL baseline-JPEG stills for the image-typed docs,
    * with deterministic encoding variety (the [[mjpegVideoTable]]
    * pattern): `id % 5 == 0` docs are single-component grayscale, the
    * rest color — 4:2:0 vs 4:4:4 by `id % 2` — and `id % 4 == 3` docs
    * carry DRI restart intervals. Decoded pixels are identical across
    * variants, so one arithmetic oracle gates every path. */
  def jpegImageTable(documents: DataFrame): Dataset[ImageFile] = {
    import documents.sparkSession.implicits._
    documents.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long]
      .map { id =>
        val (w, h) = jpegGeomOf(id)
        val px = (p: Int) => jpegBlockGrayOf(id, (p % w) / 8, (p / w) / 8)
        val ri = if (id % 4 == 3) 1 else 0
        val bytes =
          if (id % 5 == 0) JpegCodec.encodeGray(w, h, px, ri)
          else JpegCodec.encodeColor(w, h,
            p => { val g = px(p); (g, g, g) },
            subsample = id % 2 == 0, restartInterval = ri)
        ImageFile(id, "jpeg", bytes)
      }
  }

  /** The oracle-gated JPEG-still decode query (`mm_decode_jpeg`):
    * [[decodeImages]] unchanged — [[ImageCodec.decode]] dispatches on
    * the SOI magic — so JPEG rides the exact same typed-Dataset +
    * mapPartitions plumbing as BMP/PPM. */
  def decodedJpegFeatures(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    decodeImages(jpegImageTable(documents)).toDF()
  }

  /** GIF geometry: large enough (up to 34×26 = 884 px) that the LZW
    * stream crosses the 512-code width boundary on real images. */
  private[ext] def gifGeomOf(id: Long): (Int, Int) =
    ((10 + (id % 5) * 6).toInt, (8 + (id % 3) * 9).toInt)

  /** Palette index of row-major pixel p — the arithmetic the oracle
    * replays; palette entry i decodes to (i, 7i mod 256, 13i mod 256). */
  private[ext] def gifIdxOf(id: Long)(p: Int): Int =
    ((id * 31 + p * 5) % 256).toInt

  /** Synthesize REAL GIF87a bytes (256-color global table, genuine
    * variable-width LZW with sub-block framing) for the image-typed
    * docs through [[GifCodec]]'s encoder. */
  def gifImageTable(documents: DataFrame): Dataset[ImageFile] = {
    import documents.sparkSession.implicits._
    documents.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long]
      .map { id =>
        val (w, h) = gifGeomOf(id)
        ImageFile(id, "gif", GifCodec.encode(w, h, gifIdxOf(id),
          i => (i, (i * 7) % 256, (i * 13) % 256)))
      }
  }

  /** The oracle-gated GIF decode query (`mm_decode_gif`): LZW
    * decompression + palette mapping through the same typed-Dataset +
    * mapPartitions plumbing ([[ImageCodec.decode]] dispatches on the
    * GIF signature), pixel-exact against the arithmetic oracle. */
  def decodedGifFeatures(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    decodeImages(gifImageTable(documents)).toDF()
  }

  /** PNG geometry: h ≥ 6 so the encoder's per-row `row % 5` filter
    * cycle puts every one of the five filter types (None/Sub/Up/
    * Average/Paeth) inside every image — the whole unfilter surface
    * sits under one hash gate. */
  private[ext] def pngGeomOf(id: Long): (Int, Int) =
    ((9 + (id % 4) * 5).toInt, (6 + (id % 5) * 3).toInt)

  /** Synthesize REAL PNG bytes (zlib DEFLATE, chunk CRCs, split IDAT)
    * for the image-typed docs through [[PngCodec]]'s encoder; pixels
    * reuse the [[pixelOf]] formula so the oracle is pure arithmetic. */
  def pngImageTable(documents: DataFrame): Dataset[ImageFile] = {
    import documents.sparkSession.implicits._
    documents.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long]
      .map { id =>
        val (w, h) = pngGeomOf(id)
        ImageFile(id, "png", PngCodec.encode(w, h, pixelOf(id)))
      }
  }

  /** The oracle-gated PNG decode query (`mm_decode_png`): DEFLATE +
    * per-row unfilter + CRC walk through the same typed-Dataset +
    * mapPartitions plumbing ([[ImageCodec.decode]] dispatches on the
    * \x89PNG signature), pixel-exact against the arithmetic oracle. */
  def decodedPngFeatures(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    decodeImages(pngImageTable(documents)).toDF()
  }

  /** Deterministic PCM16 sample function for doc `id`: an integer
    * residue mapped into the full signed 16-bit range, so the oracle
    * reproduces every sample (and thus every statistic) with a formula
    * over `range(0, n)` — no binary parsing on the SQL side. */
  private[ext] def sampleOf(id: Long)(i: Int): Short =
    (((id * 37 + i * 13L) % 65536) - 32768).toShort

  /** (n_samples, sample_rate) for doc `id` — clip lengths 20..69,
    * rates {8, 12, 16, 20} kHz. */
  private[ext] def audioGeomOf(id: Long): (Int, Int) =
    ((id % 50 + 20).toInt, 8000 + (id % 4).toInt * 4000)

  /** Synthesize REAL WAV bytes for the audio-typed docs
    * (doc_id % 3 == 1) through [[AudioCodec]]'s encoder — genuine RIFF
    * headers, fmt chunks, little-endian PCM; every other file also
    * carries an odd-sized vendor chunk before `data`, so the decode
    * below exercises the chunk walk + pad byte on gated data. */
  def audioTable(documents: DataFrame): Dataset[AudioFile] = {
    import documents.sparkSession.implicits._
    documents.filter(col("doc_id") % 3 === 1)
      .select(col("doc_id")).as[Long]
      .map { id =>
        val (n, rate) = audioGeomOf(id)
        AudioFile(id, AudioCodec.encodeWav(rate,
          Array.tabulate(n)(sampleOf(id)), withJunkChunk = id % 6 == 1))
      }
  }

  /** REAL audio decode: walk each payload's RIFF chunks with
    * [[AudioCodec]] and emit exact integer sample statistics computed
    * from the samples THE PARSER read. duration_us and all sums use
    * non-negative integer division/arithmetic only, so the oracle's
    * `//` agrees with Spark's `div` everywhere. */
  def decodeAudio(audio: Dataset[AudioFile]): Dataset[DecodedAudio] = {
    import audio.sparkSession.implicits._
    audio.mapPartitions { rows =>
      rows.map { f =>
        val w = AudioCodec.decodeWav(f.payload)
        var (sumAbs, energy, zc, peak) = (0L, 0L, 0L, 0L)
        var i = 0
        while (i < w.samples.length) {
          val v = w.samples(i).toLong
          val a = math.abs(v)
          sumAbs += a; energy += v * v
          if (a > peak) peak = a
          if (i > 0 && (w.samples(i - 1) < 0) != (v < 0)) zc += 1
          i += 1
        }
        val n = w.samples.length.toLong
        DecodedAudio(f.doc_id, w.sampleRate.toLong, n,
          n * 1000000L / w.sampleRate, peak, sumAbs, energy, zc)
      }
    }
  }

  /** The oracle-gated real-audio-decode query (`mm_audio`). */
  def decodedAudio(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    decodeAudio(audioTable(documents)).toDF()
  }

  /** Synthesize REAL G.711 µ-law WAV bytes for the audio-typed docs —
    * format tag 7, one code byte per sample, a `fact` chunk (always)
    * and a JUNK chunk (every other doc) for the decoder's
    * skip-by-size path. Same sample formula as [[audioTable]]; the
    * bytes on the wire are the COMPRESSED codes. */
  def mulawAudioTable(documents: DataFrame): Dataset[AudioFile] = {
    import documents.sparkSession.implicits._
    documents.filter(col("doc_id") % 3 === 1)
      .select(col("doc_id")).as[Long]
      .map { id =>
        val (n, rate) = audioGeomOf(id)
        AudioFile(id, AudioCodec.encodeWavMulaw(rate,
          Array.tabulate(n)(sampleOf(id)), withJunkChunk = id % 6 == 1))
      }
  }

  /** The oracle-gated µ-law decode query (`mm_audio_mulaw`): the same
    * statistics shape as `mm_audio`, but every sample travelled
    * through the lossy 8-bit companding — the oracle replays the pure
    * integer compress∘expand formulas in SQL, so the gate verifies the
    * companding pipeline bit-exactly despite the loss. */
  def decodedMulawAudio(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    decodeAudio(mulawAudioTable(documents)).toDF()
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

  /** Deterministic per-frame pixel function for doc `id`, frame `f`:
    * channel values are integer residues of (doc, frame, pixel index),
    * so the oracle reproduces every frame's channel sums with SUMs
    * over `range(0, w*h)` per sampled frame — no binary parsing on the
    * SQL side. */
  private[ext] def framePixelOf(id: Long, f: Int)(p: Int): (Int, Int, Int) = (
    ((id * 31 + f * 19L + p * 7L) % 256).toInt,
    ((id * 17 + f * 23L + p * 11L) % 256).toInt,
    ((id * 13 + f * 29L + p * 5L) % 256).toInt)

  /** (n_frames, microSecPerFrame) for doc `id` — clips of 2..6 frames
    * at 25/20/16⅔ fps. Geometry reuses [[geomOf]]. */
  private[ext] def videoGeomOf(id: Long): (Int, Int) =
    ((id % 5 + 2).toInt, 40000 + (id % 3).toInt * 10000)

  /** Synthesize REAL uncompressed-AVI bytes for the video-typed docs
    * (doc_id % 3 == 2) through [[VideoCodec]]'s encoder — genuine RIFF
    * lists, stream headers, and DIB frame chunks; every other file
    * also carries an odd-sized JUNK chunk between `hdrl` and `movi`,
    * so the decode exercises the chunk walk + pad byte on gated data. */
  def videoTable(documents: DataFrame): Dataset[VideoFile] = {
    import documents.sparkSession.implicits._
    documents.filter(col("doc_id") % 3 === 2)
      .select(col("doc_id")).as[Long]
      .map { id =>
        val (w, h) = geomOf(id)
        val (nf, uspf) = videoGeomOf(id)
        VideoFile(id, VideoCodec.encodeAvi(w, h, uspf, nf,
          (f, p) => framePixelOf(id, f)(p), withJunkChunk = id % 6 == 2))
      }
  }

  /** REAL video decode + frame sampling: parse each payload's AVI
    * container with [[VideoCodec]], keep every `everyK`-th frame (the
    * batch-shape of a video pipeline — decode once, sample frames,
    * process, re-aggregate), and emit exact integer channel sums per
    * sampled frame from the pixels THE PARSER read. duration_us is
    * container metadata (frame count × µs/frame); brightness_q uses
    * non-negative integer division, so Spark `div` ≡ DuckDB `//`. */
  def decodeVideoFrames(videos: Dataset[VideoFile],
      everyK: Int = 2): Dataset[DecodedFrame] = {
    import videos.sparkSession.implicits._
    videos.mapPartitions { rows =>
      rows.flatMap { v =>
        val avi = VideoCodec.decodeAvi(v.payload)
        val n = avi.width * avi.height
        (0 until avi.nFrames by everyK).iterator.map { f =>
          val px = avi.frames(f)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var p = 0
          while (p < n) {
            sr += (px(p) >> 16) & 0xff
            sg += (px(p) >> 8) & 0xff
            sb += px(p) & 0xff
            p += 1
          }
          DecodedFrame(v.doc_id, avi.nFrames, f, avi.width, avi.height,
            avi.nFrames.toLong * avi.microSecPerFrame,
            sr, sg, sb, (sr + sg + sb) / (3L * n))
        }
      }
    }
  }

  /** The oracle-gated real-video-decode query (`mm_frames`): one row
    * per sampled frame, statistics parsed from real AVI bytes. */
  def frameStats(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    decodeVideoFrames(videoTable(documents)).toDF()
  }

  /** Per-frame constant gray for the MJPEG clips. Constant gray-valued
    * frames (R=G=B) survive the whole lossy color pipeline EXACTLY
    * ([[JpegCodec]] doc): the JFIF transform maps them to Y=g,
    * Cb=Cr=128; 4:2:0 subsampling of constant planes is the constant;
    * every block is DC-only at unit quantizers; and the inverse
    * transform at Cb=Cr=128 is the identity — so the oracle reproduces
    * the decoded channel sums arithmetically even though the codec is
    * lossy in general. */
  private[ext] def mjpegGrayOf(id: Long, f: Int): Int =
    ((id * 37 + f * 41) % 256).toInt

  /** Synthesize REAL MJPEG-AVI bytes for the video-typed docs: same
    * RIFF skeleton as [[videoTable]], but each `00dc` chunk is a
    * complete baseline COLOR JPEG ([[VideoCodec.encodeMjpegAviColor]]
    * → [[JpegCodec.encodeColor]]) — interleaved YCbCr MCUs,
    * per-component DC predictors, entropy-coded Huffman data, byte
    * stuffing, variable chunk sizes with RIFF pad bytes. The wire
    * shape real capture-card MJPEG uses — and, like [[videoTable]]'s
    * JUNK chunks, the encoding VARIES deterministically by doc so the
    * hash gate exercises every decode path on real data: docs
    * alternate 4:2:0 vs 4:4:4 (`id % 2`), and `id % 4 == 3` docs write
    * DRI restart intervals (decoded pixels are identical either way,
    * so one arithmetic oracle covers all variants). */
  def mjpegVideoTable(documents: DataFrame): Dataset[VideoFile] = {
    import documents.sparkSession.implicits._
    documents.filter(col("doc_id") % 3 === 2)
      .select(col("doc_id")).as[Long]
      .map { id =>
        val (w, h) = geomOf(id)
        val (nf, uspf) = videoGeomOf(id)
        VideoFile(id, VideoCodec.encodeMjpegAviColor(w, h, uspf, nf,
          (f, _) => { val g = mjpegGrayOf(id, f); (g, g, g) },
          subsample = id % 2 == 0,
          restartInterval = if (id % 4 == 3) 1 else 0,
          withJunkChunk = id % 6 == 2))
      }
  }

  /** The oracle-gated real-MJPEG-decode query (`mm_frames_mjpeg`): the
    * same frame-sampling shape as `mm_frames`, but every sampled frame
    * travelled through a FULL baseline color JPEG decode (marker
    * parse, DHT Huffman decode, interleaved 4:2:0 MCUs, dequantize,
    * IDCT, chroma upsample, YCbCr→RGB) before its channel sums. */
  def frameStatsMjpeg(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    decodeVideoFrames(mjpegVideoTable(documents)).toDF()
  }
}
