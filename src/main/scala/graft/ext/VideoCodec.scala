package graft.ext

/** Pure-JVM video codec for uncompressed AVI (RIFF 'AVI ' + DIB
  * frames) — the one mainstream video container a box with no native
  * codec libraries can still handle honestly, because it composes the
  * two parsers this package already has: [[AudioCodec]]'s RIFF chunk
  * walk (sizes, pad bytes, unknown-chunk skipping) and
  * [[ImageCodec]]'s 24-bit DIB pixel layout (BGR triples, 4-byte row
  * padding, bottom-up rows).
  *
  * Layout handled (the public AVI RIFF form):
  *  - `RIFF <size> AVI ` outer header;
  *  - `LIST <size> hdrl` with
  *      - an `avih` MainAVIHeader (µs/frame, total frames, geometry),
  *      - a  `LIST strl` holding `strh` (fccType `vids`, handler
  *        `DIB `) and `strf` (a BITMAPINFOHEADER: geometry, 24 bpp,
  *        BI_RGB — the per-stream truth the frame chunks rely on);
  *  - any number of OTHER chunks/LISTs (`JUNK`, `INFO`, `idx1`) in any
  *    position, skipped by declared size + RIFF pad byte;
  *  - `LIST <size> movi` whose `00db`/`00dc` sub-chunks each carry ONE
  *    raw DIB frame (no per-frame header — geometry comes from strf).
  *
  * Encode→decode is the identity on (geometry, µs/frame, every frame's
  * pixels) — exactly what the `mm_frames` oracle checks end to end:
  * per-frame channel sums parsed from real bytes must match integer
  * sums a SQL oracle recomputes from the generation formula, so a
  * chunk-walk, header-offset, row-padding, or frame-order bug breaks
  * the hash gate.
  *
  * Scale posture: same as image/audio decode — per-row CPU inside a
  * narrow mapPartitions, no shuffle, one linear pass per payload. At
  * 100 TB the payloads come off a binaryFile/object-store scan sized
  * by files.maxPartitionBytes; nothing here holds more than one file
  * in memory.
  */
object VideoCodec {

  /** A decoded clip: frames in temporal order, each frame packed
    * 0xRRGGBB ints in row-major top-down order (the [[ImageCodec]]
    * normal form). */
  final case class Avi(width: Int, height: Int, microSecPerFrame: Int,
      frames: Array[Array[Int]]) {
    def nFrames: Int = frames.length
  }

  private val HeaderListBytes = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))

  /** biCompression fourcc for Motion-JPEG frame chunks ('MJPG' LE). */
  val MjpgFourcc: Int = 0x47504a4d

  /** Encode a frame-pixel function ((r, g, b) for frame f, row-major
    * pixel index p) as an uncompressed AVI. `withJunkChunk` inserts an
    * odd-sized vendor chunk between `hdrl` and `movi` to exercise the
    * decoder's skip + pad-byte handling on gated data (real muxers
    * emit `JUNK` alignment chunks in exactly this position). */
  def encodeAvi(w: Int, h: Int, microSecPerFrame: Int, nFrames: Int,
      px: (Int, Int) => (Int, Int, Int),
      withJunkChunk: Boolean = false): Array[Byte] = {
    val frames = Array.tabulate(nFrames)(f =>
      ImageCodec.encodeDibPixels(w, h, p => px(f, p)))
    buildAvi(w, h, microSecPerFrame, frames,
      handler = "DIB ", biCompression = 0, chunkId = "00db", withJunkChunk)
  }

  /** Encode a grayscale frame function (gray 0..255 for frame f,
    * row-major pixel index p) as an MJPEG AVI: same RIFF skeleton,
    * `strf.biCompression = 'MJPG'`, and each `00dc` chunk one complete
    * baseline JPEG from [[JpegCodec]]. Frame chunks are variable-size
    * (entropy-coded), so odd-sized chunks get the RIFF pad byte —
    * gated data exercises that path for free. */
  def encodeMjpegAvi(w: Int, h: Int, microSecPerFrame: Int, nFrames: Int,
      gray: (Int, Int) => Int,
      withJunkChunk: Boolean = false): Array[Byte] = {
    val frames = Array.tabulate(nFrames)(f =>
      JpegCodec.encodeGray(w, h, p => gray(f, p)))
    buildAvi(w, h, microSecPerFrame, frames,
      handler = "MJPG", biCompression = MjpgFourcc, chunkId = "00dc", withJunkChunk)
  }

  /** Color MJPEG variant: each `00dc` chunk a baseline YCbCr JPEG
    * (4:2:0 when `subsample`, else 4:4:4) — the wire shape real webcam
    * / capture-card MJPEG uses. */
  def encodeMjpegAviColor(w: Int, h: Int, microSecPerFrame: Int, nFrames: Int,
      px: (Int, Int) => (Int, Int, Int), subsample: Boolean = true,
      restartInterval: Int = 0,
      withJunkChunk: Boolean = false): Array[Byte] = {
    val frames = Array.tabulate(nFrames)(f =>
      JpegCodec.encodeColor(w, h, p => px(f, p), subsample, restartInterval))
    buildAvi(w, h, microSecPerFrame, frames,
      handler = "MJPG", biCompression = MjpgFourcc, chunkId = "00dc", withJunkChunk)
  }

  /** The shared RIFF/AVI writer both encoders use: fixed header
    * skeleton, variable-size frame chunks with RIFF pad bytes. */
  private def buildAvi(w: Int, h: Int, microSecPerFrame: Int,
      frames: Array[Array[Byte]], handler: String, biCompression: Int,
      chunkId: String, withJunkChunk: Boolean): Array[Byte] = {
    val nFrames = frames.length
    val maxFrame = if (nFrames == 0) 0 else frames.map(_.length).max
    val junkPayload = 7 // odd on purpose: forces a pad byte
    val junkSize = if (withJunkChunk) 8 + junkPayload + 1 else 0
    val moviListBytes = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    val riffSize = 4 + (8 + HeaderListBytes) + junkSize + (8 + moviListBytes)
    val out = new Array[Byte](8 + riffSize)
    var pos = 0
    def putTag(s: String): Unit = {
      var i = 0
      while (i < 4) { out(pos + i) = s.charAt(i).toByte; i += 1 }
      pos += 4
    }
    def putLe32(v: Int): Unit = {
      out(pos) = (v & 0xff).toByte
      out(pos + 1) = ((v >> 8) & 0xff).toByte
      out(pos + 2) = ((v >> 16) & 0xff).toByte
      out(pos + 3) = ((v >> 24) & 0xff).toByte
      pos += 4
    }
    def putLe16(v: Int): Unit = {
      out(pos) = (v & 0xff).toByte
      out(pos + 1) = ((v >> 8) & 0xff).toByte
      pos += 2
    }
    putTag("RIFF"); putLe32(riffSize); putTag("AVI ")

    putTag("LIST"); putLe32(HeaderListBytes); putTag("hdrl")
    putTag("avih"); putLe32(56)
    putLe32(microSecPerFrame)
    putLe32(if (microSecPerFrame > 0) maxFrame * (1000000 / microSecPerFrame) else 0)
    putLe32(0)                 // padding granularity
    putLe32(0x10)              // AVIF_HASINDEX-free; 0x10 = not interleaved
    putLe32(nFrames)
    putLe32(0)                 // initial frames
    putLe32(1)                 // streams
    putLe32(maxFrame)          // suggested buffer size
    putLe32(w); putLe32(h)
    putLe32(0); putLe32(0); putLe32(0); putLe32(0) // reserved[4]

    putTag("LIST"); putLe32(4 + (8 + 56) + (8 + 40)); putTag("strl")
    putTag("strh"); putLe32(56)
    putTag("vids"); putTag(handler)
    putLe32(0)                 // flags
    putLe16(0); putLe16(0)     // priority, language
    putLe32(0)                 // initial frames
    putLe32(microSecPerFrame)  // scale
    putLe32(1000000)           // rate → fps = rate/scale
    putLe32(0)                 // start
    putLe32(nFrames)           // length (in frames)
    putLe32(maxFrame)          // suggested buffer size
    putLe32(-1)                // quality (default)
    putLe32(0)                 // sample size (varies)
    putLe16(0); putLe16(0); putLe16(w); putLe16(h) // rcFrame
    putTag("strf"); putLe32(40)
    putLe32(40)                // biSize
    putLe32(w); putLe32(h)     // positive height → bottom-up frames
    putLe16(1)                 // planes
    putLe16(24)                // bits per pixel
    putLe32(biCompression)     // 0 = BI_RGB, or a codec fourcc
    putLe32(maxFrame)
    putLe32(0); putLe32(0); putLe32(0); putLe32(0)

    if (withJunkChunk) {
      putTag("JUNK"); putLe32(junkPayload)
      pos += junkPayload + 1   // junk bytes stay zero; +1 = pad byte
    }

    putTag("LIST"); putLe32(moviListBytes); putTag("movi")
    var f = 0
    while (f < nFrames) {
      val frame = frames(f)
      putTag(chunkId); putLe32(frame.length)
      System.arraycopy(frame, 0, out, pos, frame.length)
      pos += frame.length + (frame.length & 1) // RIFF pad byte on odd sizes
      f += 1
    }
    out
  }

  /** Decode an uncompressed AVI. Throws IllegalArgumentException on
    * anything else (wrong magic, compressed frames, missing headers,
    * truncation, frame-count mismatch) — unknown media routes to
    * quarantine, never guesses. */
  def decodeAvi(bytes: Array[Byte]): Avi = {
    require(bytes.length >= 12, "too short for a RIFF header")
    def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    def le32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def le16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    require(tag(0) == "RIFF", s"not RIFF: '${tag(0)}'")
    require(tag(8) == "AVI ", s"not AVI: '${tag(8)}'")

    var usPerFrame = -1
    var declaredFrames = -1
    var w = -1
    var rawH = 0
    var biCompression = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]

    // One chunk walker for every nesting level — RIFF is the same
    // (tag, size, payload, pad) grammar all the way down; only the
    // interpretation of LIST payloads differs by their type tag.
    def walk(start: Int, end: Int): Unit = {
      var pos = start
      while (pos + 8 <= end) {
        val id = tag(pos)
        val size = le32(pos + 4)
        require(size >= 0 && pos + 8 + size <= end,
          s"chunk '$id' overruns its parent: size=$size at $pos")
        val body = pos + 8
        id match {
          case "LIST" =>
            require(size >= 4, s"LIST too small: $size")
            tag(body) match {
              case "hdrl" | "strl" | "movi" => walk(body + 4, body + size)
              case _ => () // INFO and friends: skip
            }
          case "avih" =>
            require(size >= 56, s"avih too small: $size")
            usPerFrame = le32(body)
            declaredFrames = le32(body + 16)
          case "strf" =>
            require(size >= 40, s"strf too small: $size")
            w = le32(body + 4)
            rawH = le32(body + 8)
            val bpp = le16(body + 14)
            biCompression = le32(body + 16)
            require(biCompression == 0 || biCompression == MjpgFourcc,
              s"only uncompressed (BI_RGB) or MJPG frames supported, " +
                s"compression=$biCompression")
            if (biCompression == 0)
              require(bpp == 24, s"only 24-bit DIB frames supported, bpp=$bpp")
          case "00db" | "00dc" =>
            require(w > 0, "frame chunk before the strf stream header")
            val h = math.abs(rawH)
            if (biCompression == MjpgFourcc) {
              // one complete baseline JPEG per chunk (gray or YCbCr,
              // incl. 4:2:0); its OWN geometry must agree with the
              // stream header or the clip is malformed (quarantine,
              // not a guess)
              val g = JpegCodec.decodeRgb(
                java.util.Arrays.copyOfRange(bytes, body, body + size))
              require(g.width == w && g.height == h,
                s"MJPEG frame geometry ${g.width}x${g.height} != stream ${w}x$h")
              frames += g.pixels
            } else {
              val rowSize = ((w * 3 + 3) / 4) * 4
              require(size >= rowSize * h,
                s"truncated frame: need ${rowSize * h}, have $size")
              frames += ImageCodec.decodeDibPixels(
                java.util.Arrays.copyOfRange(bytes, body, body + size),
                0, w, h, topDown = rawH < 0)
            }
          case _ => () // strh, JUNK, idx1, vendor chunks: skip by size
        }
        pos = body + size + (size & 1) // RIFF pad byte on odd sizes
      }
    }
    walk(12, math.min(bytes.length, 8 + le32(4)))

    require(w > 0 && math.abs(rawH) > 0, "missing strf stream header")
    require(usPerFrame >= 0, "missing avih main header")
    require(frames.nonEmpty, "no frame chunks in movi")
    require(declaredFrames == frames.length,
      s"header declares $declaredFrames frames, movi carries ${frames.length}")
    Avi(w, math.abs(rawH), usPerFrame, frames.toArray)
  }
}
