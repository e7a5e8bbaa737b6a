package graft.ext

/** Pure-JVM GIF87a codec — the LZW member of the multimodal codec
  * family (BMP/PPM are raw, WAV is PCM/companding, AVI-MJPEG is
  * DCT+Huffman; GIF adds dictionary compression, the remaining classic
  * compression class a pure-JVM decoder can cover honestly).
  *
  * Scope: GIF87a, one image, 256-entry global color table, no
  * interlace, no extensions — the structural core every real GIF
  * shares. The LZW stream is the full variable-width variant: codes
  * start at minCodeSize+1 bits, widen at each power of two, the
  * dictionary caps at 4096 with an explicit Clear reset, sub-block
  * framing ≤ 255 bytes, LSB-first bit packing.
  *
  * Both directions are implemented so the gated query decodes REAL
  * compressed bytes produced by this encoder — the same
  * encode→decode-roundtrip-against-an-arithmetic-oracle design as the
  * other codecs ([[ImageCodec]] doc).
  */
object GifCodec {

  private val MaxCode = 4096

  /** Encode a palette-indexed image as GIF87a. `idxOf(p)` gives the
    * palette index of row-major pixel p; `palette(i)` the (r, g, b) of
    * entry i (always written as a full 256-entry global table). */
  def encode(w: Int, h: Int, idxOf: Int => Int,
      palette: Int => (Int, Int, Int)): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF87a".getBytes("US-ASCII"))
    u16(w); u16(h)
    out.write(0xf7) // global table present, 8 bpp, 256 entries
    out.write(0)    // background color index
    out.write(0)    // aspect ratio
    var i = 0
    while (i < 256) {
      val (r, g, b) = palette(i)
      out.write(r); out.write(g); out.write(b)
      i += 1
    }
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(w); u16(h)
    out.write(0)    // no local table, not interlaced
    out.write(8)    // LZW min code size
    out.write(compress(Array.tabulate(w * h)(p => idxOf(p) & 0xff)))
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** GIF-LZW compress (minCodeSize 8): dictionary keyed by
    * (prefixCode, nextByte), Clear emitted up front and at dictionary
    * overflow, variable code width, LSB-first packing into ≤255-byte
    * sub-blocks. */
  private def compress(data: Array[Int]): Array[Byte] = {
    val clear = 256
    val eoi = 257
    val bits = new BitWriter
    var dict = new java.util.HashMap[Long, Int]()
    var nextCode = 258
    var width = 9
    bits.put(clear, width)
    var prefix = -1
    var i = 0
    while (i < data.length) {
      val k = data(i)
      if (prefix < 0) prefix = k
      else {
        val key = (prefix.toLong << 8) | k
        if (dict.containsKey(key)) prefix = dict.get(key)
        else {
          bits.put(prefix, width)
          dict.put(key, nextCode)
          nextCode += 1
          // the ENCODER widens after assigning the code that fills the
          // current width (decoder mirrors this off-by-one exactly)
          if (nextCode > (1 << width) && width < 12) width += 1
          if (nextCode >= MaxCode) {
            bits.put(clear, width)
            dict = new java.util.HashMap[Long, Int]()
            nextCode = 258
            width = 9
          }
          prefix = k
        }
      }
      i += 1
    }
    if (prefix >= 0) bits.put(prefix, width)
    bits.put(eoi, width)
    bits.toSubBlocks
  }

  /** Decode GIF87a bytes to the shared packed-RGB image form. */
  def decode(bytes: Array[Byte]): ImageCodec.Image = {
    require(bytes.length > 13 &&
      new String(bytes, 0, 6, "US-ASCII").startsWith("GIF8"),
      "not a GIF signature")
    def u16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    var pos = 6
    pos += 4 // logical screen w/h (image descriptor's governs the frame)
    val flags = bytes(pos) & 0xff; pos += 3
    require((flags & 0x80) != 0, "global color table required")
    val tableSize = 2 << (flags & 7)
    val palette = Array.tabulate(tableSize) { i =>
      val o = pos + i * 3
      ((bytes(o) & 0xff) << 16) | ((bytes(o + 1) & 0xff) << 8) |
        (bytes(o + 2) & 0xff)
    }
    pos += tableSize * 3
    require((bytes(pos) & 0xff) == 0x2c, "expected image descriptor")
    val w = u16(pos + 5); val h = u16(pos + 7)
    val localFlags = bytes(pos + 9) & 0xff
    require((localFlags & 0x80) == 0, "local color tables unsupported")
    require((localFlags & 0x40) == 0, "interlace unsupported")
    pos += 10
    val minCodeSize = bytes(pos) & 0xff; pos += 1
    // gather sub-blocks into one LZW byte stream
    val lzw = new java.io.ByteArrayOutputStream()
    var bl = bytes(pos) & 0xff
    while (bl != 0) {
      lzw.write(bytes, pos + 1, bl)
      pos += 1 + bl
      bl = bytes(pos) & 0xff
    }
    val indices = decompress(lzw.toByteArray, minCodeSize, w * h)
    val px = Array.tabulate(w * h)(p => palette(indices(p) & 0xff))
    ImageCodec.Image("gif", w, h, px)
  }

  /** GIF-LZW decompress: prefix-chain dictionary, the KwKwK
    * first-unseen-code case, Clear resets, width growth mirroring the
    * encoder (widen once nextCode fills the current width). */
  private def decompress(data: Array[Byte], minCodeSize: Int,
      expected: Int): Array[Int] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val prefix = new Array[Int](MaxCode)
    val suffix = new Array[Int](MaxCode)
    val out = new Array[Int](expected)
    var outPos = 0
    val bits = new BitReader(data)
    var width = minCodeSize + 1
    var nextCode = eoi + 1
    var prev = -1
    val stack = new Array[Int](MaxCode)

    def emit(code: Int): Int = { // writes the code's chain; returns first byte
      var sp = 0
      var c = code
      while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      val first = c
      out(outPos) = first; outPos += 1
      while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
      first
    }

    var code = bits.take(width)
    while (code != eoi && outPos < expected && code >= 0) {
      if (code == clear) {
        nextCode = eoi + 1
        width = minCodeSize + 1
        prev = -1
      } else if (prev < 0) {
        require(code < clear, "first code after clear must be literal")
        out(outPos) = code; outPos += 1
        prev = code
      } else {
        val first =
          if (code < nextCode) emit(code)
          else { // KwKwK: code not yet defined — prev's chain + its first
            require(code == nextCode, s"LZW code $code out of sequence")
            var sp = 0
            var c = prev
            while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
            val f = c
            out(outPos) = f; outPos += 1
            while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
            out(outPos) = f; outPos += 1
            f
          }
        if (nextCode < MaxCode) {
          prefix(nextCode) = prev
          suffix(nextCode) = first
          nextCode += 1
          // the decoder lags the encoder by ONE dictionary define (the
          // encoder defines with each emit, the decoder only after the
          // following read), so it must widen one define EARLIER:
          // `>=` here against the encoder's `>` keeps every code width
          // aligned at the 512/1024/2048 boundaries
          if (nextCode >= (1 << width) && width < 12) width += 1
        }
        prev = code
      }
      if (outPos < expected) code = bits.take(width) else code = eoi
    }
    require(outPos == expected,
      s"LZW stream ended at $outPos of $expected pixels")
    out
  }

  private final class BitWriter {
    private val bytes = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nbits = 0
    def put(code: Int, width: Int): Unit = {
      acc |= code.toLong << nbits
      nbits += width
      while (nbits >= 8) {
        bytes.write((acc & 0xff).toInt)
        acc >>= 8
        nbits -= 8
      }
    }
    def toSubBlocks: Array[Byte] = {
      if (nbits > 0) bytes.write((acc & 0xff).toInt)
      val all = bytes.toByteArray
      val out = new java.io.ByteArrayOutputStream()
      var off = 0
      while (off < all.length) {
        val n = math.min(255, all.length - off)
        out.write(n)
        out.write(all, off, n)
        off += n
      }
      out.toByteArray
    }
  }

  private final class BitReader(data: Array[Byte]) {
    private var pos = 0
    private var acc = 0L
    private var nbits = 0
    /** Next `width`-bit code LSB-first, or -1 past end of stream. */
    def take(width: Int): Int = {
      while (nbits < width) {
        if (pos >= data.length) return -1
        acc |= (data(pos) & 0xffL) << nbits
        pos += 1
        nbits += 8
      }
      val v = (acc & ((1L << width) - 1)).toInt
      acc >>= width
      nbits -= width
      v
    }
  }
}
