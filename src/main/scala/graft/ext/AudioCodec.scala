package graft.ext

/** Pure-JVM WAV (RIFF/WAVE) codec — the audio analog of
  * [[ImageCodec]]: the one mainstream audio container a box with no
  * native codec libraries can still handle honestly, because PCM in a
  * RIFF wrapper is just a chunk walk plus little-endian shorts.
  *
  * Layout handled:
  *  - `RIFF <size> WAVE` outer header;
  *  - a `fmt ` chunk — PCM format tag 1 (16-bit) or G.711 µ-law tag 7
  *    (8-bit companded, expanded to PCM16 on decode);
  *  - any number of OTHER chunks (`LIST`, `fact`, vendor junk) in any
  *    order, which the decoder SKIPS by their declared size — real
  *    recorders emit these, and a parser that assumes `data` follows
  *    `fmt ` immediately breaks on them (CHUNK SIZES ARE PADDED: RIFF
  *    aligns chunks to 2 bytes, so an odd-sized chunk is followed by
  *    one pad byte the size field does not include);
  *  - a `data` chunk of samples (int16 LE for PCM, one byte per
  *    sample for µ-law).
  *
  * PCM encode→decode is the identity on (sampleRate, samples); µ-law
  * is the standard lossy 8-bit companding, but expand∘compress is a
  * PURE INTEGER function, so a SQL oracle reproduces the decoded
  * samples exactly by applying the same two formulas — which is what
  * lets `mm_audio_mulaw` hash-gate a lossy codec. An endianness,
  * chunk-walk, pad-byte, or companding bug breaks the gate.
  *
  * Scale posture: same as image decode — per-row CPU inside a narrow
  * mapPartitions, no shuffle, one linear pass per payload.
  */
object AudioCodec {

  /** G.711 µ-law compress: one PCM16 sample to its 8-bit code. The
    * standard BIAS=132 / CLIP=32635 formulation: biased magnitude,
    * segment = MSB position − 7, 4-bit mantissa, ones-complemented. */
  def mulawCompress(sample: Int): Int = {
    val Bias = 0x84
    val Clip = 32635
    val sign = if (sample < 0) 0x80 else 0
    var mag = math.min(math.abs(sample), Clip) + Bias
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (mag & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (mag >> (exp + 3)) & 0x0f
    (~(sign | (exp << 4) | mant)) & 0xff
  }

  /** G.711 µ-law expand: one 8-bit code back to PCM16. Inverse of
    * [[mulawCompress]] on the code space (every code except 0x7f,
    * negative zero, re-compresses to itself — spec-asserted). */
  def mulawExpand(ulaw: Int): Int = {
    val Bias = 0x84
    val v = (~ulaw) & 0xff
    val exp = (v >> 4) & 7
    val mag = ((((v & 0x0f) << 3) + Bias) << exp) - Bias
    if ((v & 0x80) != 0) -mag else mag
  }

  /** A decoded PCM16 clip. `samples` is interleaved if channels > 1. */
  final case class Wav(sampleRate: Int, channels: Int,
      samples: Array[Short])

  /** Encode mono PCM16 as a canonical WAV; `withJunkChunk` prepends an
    * odd-sized vendor chunk before `data` to exercise the decoder's
    * chunk walk + pad-byte handling (real files carry LIST/fact chunks
    * in exactly this position). */
  def encodeWav(sampleRate: Int, samples: Array[Short],
      withJunkChunk: Boolean = false): Array[Byte] = {
    val junkPayload = 5 // odd on purpose: forces a pad byte
    val junkSize = if (withJunkChunk) 8 + junkPayload + 1 else 0
    val dataSize = samples.length * 2
    val riffSize = 4 + 24 + junkSize + 8 + dataSize
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
    putTag("RIFF"); putLe32(riffSize); putTag("WAVE")
    putTag("fmt "); putLe32(16)
    putLe16(1)                  // PCM format tag
    putLe16(1)                  // channels
    putLe32(sampleRate)
    putLe32(sampleRate * 2)     // byte rate = rate * block align
    putLe16(2)                  // block align (mono 16-bit)
    putLe16(16)                 // bits per sample
    if (withJunkChunk) {
      putTag("JUNK"); putLe32(junkPayload)
      pos += junkPayload + 1    // junk bytes stay zero; +1 = pad byte
    }
    putTag("data"); putLe32(dataSize)
    var i = 0
    while (i < samples.length) {
      val s = samples(i).toInt
      out(pos) = (s & 0xff).toByte
      out(pos + 1) = ((s >> 8) & 0xff).toByte
      pos += 2
      i += 1
    }
    out
  }

  /** Encode mono PCM16 as a G.711 µ-law WAV (format tag 7, 8-bit
    * codes, one byte per sample) — the telephony/archive wire format.
    * Writes the `fact` chunk non-PCM WAVs carry (sample count), so the
    * decoder's skip-by-size path runs on every µ-law payload. */
  def encodeWavMulaw(sampleRate: Int, samples: Array[Short],
      withJunkChunk: Boolean = false): Array[Byte] = {
    val junkPayload = 5
    val junkSize = if (withJunkChunk) 8 + junkPayload + 1 else 0
    val dataSize = samples.length
    val riffSize = 4 + 26 + (8 + 4) + junkSize + 8 + dataSize + (dataSize & 1)
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
    putTag("RIFF"); putLe32(riffSize); putTag("WAVE")
    putTag("fmt "); putLe32(18)  // non-PCM fmt carries cbSize
    putLe16(7)                   // µ-law format tag
    putLe16(1)                   // channels
    putLe32(sampleRate)
    putLe32(sampleRate)          // byte rate = rate (1 byte/sample)
    putLe16(1)                   // block align
    putLe16(8)                   // bits per sample
    putLe16(0)                   // cbSize: no extra format bytes
    putTag("fact"); putLe32(4); putLe32(samples.length)
    if (withJunkChunk) {
      putTag("JUNK"); putLe32(junkPayload)
      pos += junkPayload + 1
    }
    putTag("data"); putLe32(dataSize)
    var i = 0
    while (i < samples.length) {
      out(pos) = mulawCompress(samples(i).toInt).toByte
      pos += 1
      i += 1
    }
    // RIFF pad byte on odd data size is already zero in the array
    out
  }

  /** Decode a RIFF/WAVE payload: PCM16 (tag 1) sample-exact, or G.711
    * µ-law (tag 7) expanded to PCM16. Throws IllegalArgumentException
    * on anything else (wrong magic, unsupported format, missing
    * chunks, truncation) — unknown media routes to quarantine, never
    * guesses. */
  def decodeWav(bytes: Array[Byte]): Wav = {
    require(bytes.length >= 12, "too short for a RIFF header")
    def tag(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    def le32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def le16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    require(tag(0) == "RIFF", s"not RIFF: '${tag(0)}'")
    require(tag(8) == "WAVE", s"not WAVE: '${tag(8)}'")
    var pos = 12
    var rate = -1
    var channels = -1
    var fmtTag = -1
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length && (rate < 0 || samples == null)) {
      val id = tag(pos)
      val size = le32(pos + 4)
      require(size >= 0 && pos + 8 + size <= bytes.length,
        s"chunk '$id' overruns the file: size=$size at $pos")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small: $size")
          fmtTag = le16(pos + 8)
          val bits = le16(pos + 22)
          require(fmtTag == 1 || fmtTag == 7,
            s"only PCM or G.711 µ-law supported, format tag=$fmtTag")
          if (fmtTag == 1)
            require(bits == 16, s"only 16-bit PCM supported, bits=$bits")
          else
            require(bits == 8, s"µ-law must be 8-bit, bits=$bits")
          channels = le16(pos + 10)
          rate = le32(pos + 12)
          require(channels > 0 && rate > 0,
            s"bad fmt: channels=$channels rate=$rate")
        case "data" =>
          require(rate > 0, "data chunk before fmt chunk")
          if (fmtTag == 7) { // µ-law: one code byte per sample, expanded
            samples = new Array[Short](size)
            var i = 0
            while (i < size) {
              samples(i) = mulawExpand(bytes(pos + 8 + i) & 0xff).toShort
              i += 1
            }
          } else {
            val n = size / 2
            samples = new Array[Short](n)
            var i = 0
            while (i < n) {
              samples(i) = ((bytes(pos + 8 + i * 2) & 0xff) |
                (bytes(pos + 9 + i * 2) << 8)).toShort
              i += 1
            }
          }
        case _ => () // LIST/fact/JUNK/vendor chunks: skip by size
      }
      pos += 8 + size + (size & 1) // RIFF pads odd chunks to 2 bytes
    }
    require(samples != null, "no data chunk found")
    Wav(rate, channels, samples)
  }
}
