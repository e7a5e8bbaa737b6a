package graft.ext

/** Pure-JVM image codec for the two classic uncompressed formats a
  * container with no native codec libraries can still handle honestly:
  *
  *  - PPM (P6): ASCII header `P6 <w> <h> <maxval>` (whitespace-
  *    separated, `#` comments allowed) followed by w·h RGB byte
  *    triples in row-major top-down order;
  *  - BMP (Windows V3, the 54-byte header every paint tool emits):
  *    `BM` magic, little-endian geometry in BITMAPINFOHEADER, 24-bit
  *    uncompressed pixels stored as BGR triples in rows padded to 4
  *    bytes, bottom-up when height is positive (top-down when
  *    negative).
  *
  * The decoder normalizes both to the same logical form — width,
  * height, and pixel (r, g, b) values in row-major top-down order — so
  * feature extraction downstream is format-blind. The encoder exists
  * so the pipeline (and the oracle) can synthesize real image bytes
  * from a deterministic pixel function: encode→decode must be the
  * identity on pixels, which is exactly what the `mm_decode` oracle
  * checks end to end (a header-offset or row-padding bug breaks the
  * pixel sums).
  *
  * Scale posture: decode is per-row CPU work inside a narrow
  * mapPartitions — embarrassingly parallel, no shuffle; the formats
  * are bounded-header + fixed-stride pixels, so decode is one linear
  * pass with no allocation beyond the pixel array.
  */
object ImageCodec {

  /** A decoded image: pixels in row-major top-down order, one packed
    * 0xRRGGBB int per pixel. */
  final case class Image(format: String, width: Int, height: Int,
      pixels: Array[Int]) {
    def r(p: Int): Int = (pixels(p) >> 16) & 0xff
    def g(p: Int): Int = (pixels(p) >> 8) & 0xff
    def b(p: Int): Int = pixels(p) & 0xff
  }

  /** Encode a pixel function ((r, g, b) for row-major index p) as P6. */
  def encodePpm(w: Int, h: Int, px: Int => (Int, Int, Int)): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var p = 0
    while (p < w * h) {
      val (r, g, b) = px(p)
      out(header.length + p * 3) = r.toByte
      out(header.length + p * 3 + 1) = g.toByte
      out(header.length + p * 3 + 2) = b.toByte
      p += 1
    }
    out
  }

  /** Encode a pixel function as a 24-bit bottom-up BMP (54-byte
    * BITMAPFILEHEADER + BITMAPINFOHEADER, rows padded to 4 bytes). */
  def encodeBmp(w: Int, h: Int, px: Int => (Int, Int, Int)): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val dataSize = rowSize * h
    val out = new Array[Byte](54 + dataSize)
    def putLe32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def putLe16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLe32(2, 54 + dataSize) // file size
    putLe32(10, 54)           // pixel data offset
    putLe32(14, 40)           // BITMAPINFOHEADER size
    putLe32(18, w)
    putLe32(22, h)            // positive → bottom-up
    putLe16(26, 1)            // planes
    putLe16(28, 24)           // bits per pixel
    putLe32(30, 0)            // BI_RGB, uncompressed
    putLe32(34, dataSize)
    var y = 0
    while (y < h) {
      val rowOff = 54 + (h - 1 - y) * rowSize // logical row y, stored bottom-up
      var x = 0
      while (x < w) {
        val (r, g, b) = px(y * w + x)
        out(rowOff + x * 3) = b.toByte      // BGR order on disk
        out(rowOff + x * 3 + 1) = g.toByte
        out(rowOff + x * 3 + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode PPM (P6) or BMP (24-bit uncompressed) by sniffing the
    * magic. Throws IllegalArgumentException on anything else — a real
    * pipeline routes unknown formats to quarantine, it never guesses. */
  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length >= 2, "image too short for any magic")
    if (bytes(0) == 'P'.toByte && bytes(1) == '6'.toByte) decodePpm(bytes)
    else if (bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte) decodeBmp(bytes)
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      // JPEG SOI: route to the baseline entropy codec; its packed-RGB
      // normal form is this codec's pixel layout already
      val j = JpegCodec.decodeRgb(bytes)
      Image("jpeg", j.width, j.height, j.pixels)
    } else if (bytes(0) == 'G'.toByte && bytes(1) == 'I'.toByte)
      GifCodec.decode(bytes)
    else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte)
      PngCodec.decode(bytes)
    else throw new IllegalArgumentException(
      f"unknown image magic 0x${bytes(0)}%02x${bytes(1)}%02x")
  }

  private def decodePpm(bytes: Array[Byte]): Image = {
    var pos = 2
    // read the next ASCII integer, skipping whitespace and # comments
    def nextInt(): Int = {
      while (pos < bytes.length &&
          (bytes(pos).toChar.isWhitespace || bytes(pos) == '#'.toByte)) {
        if (bytes(pos) == '#'.toByte)
          while (pos < bytes.length && bytes(pos) != '\n'.toByte) pos += 1
        else pos += 1
      }
      require(pos < bytes.length, "truncated PPM header")
      var v = 0
      while (pos < bytes.length && bytes(pos) >= '0'.toByte && bytes(pos) <= '9'.toByte) {
        v = v * 10 + (bytes(pos) - '0'.toByte); pos += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    require(w > 0 && h > 0, s"bad PPM geometry ${w}x$h")
    require(maxval == 255, s"only 8-bit PPM supported, maxval=$maxval")
    pos += 1 // exactly one whitespace byte separates header and pixels
    require(bytes.length - pos >= w * h * 3,
      s"truncated PPM pixel data: need ${w * h * 3}, have ${bytes.length - pos}")
    val px = new Array[Int](w * h)
    var p = 0
    while (p < w * h) {
      px(p) = ((bytes(pos + p * 3) & 0xff) << 16) |
        ((bytes(pos + p * 3 + 1) & 0xff) << 8) |
        (bytes(pos + p * 3 + 2) & 0xff)
      p += 1
    }
    Image("ppm", w, h, px)
  }

  private def decodeBmp(bytes: Array[Byte]): Image = {
    require(bytes.length >= 54, "truncated BMP header")
    def le32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def le16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    val dataOffset = le32(10)
    val w = le32(18)
    val rawH = le32(22)
    val bpp = le16(28)
    val compression = le32(30)
    require(bpp == 24, s"only 24-bit BMP supported, bpp=$bpp")
    require(compression == 0, s"only uncompressed BMP supported, compression=$compression")
    val topDown = rawH < 0
    val h = math.abs(rawH)
    require(w > 0 && h > 0, s"bad BMP geometry ${w}x$rawH")
    Image("bmp", w, h, decodeDibPixels(bytes, dataOffset, w, h, topDown))
  }

  /** Decode a raw 24-bit DIB pixel array (BGR triples, rows padded to
    * 4 bytes, bottom-up unless `topDown`) into packed 0xRRGGBB ints in
    * row-major top-down order. Shared by the BMP path above and by
    * [[VideoCodec]] — an uncompressed AVI's '00db' frame chunks are
    * exactly this layout with the geometry carried once in the stream
    * header instead of per frame. */
  private[ext] def decodeDibPixels(bytes: Array[Byte], dataOffset: Int,
      w: Int, h: Int, topDown: Boolean): Array[Int] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    require(bytes.length >= dataOffset + rowSize * h,
      s"truncated DIB pixel data: need ${dataOffset + rowSize * h}, have ${bytes.length}")
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val rowOff = dataOffset + srcRow * rowSize
      var x = 0
      while (x < w) {
        px(y * w + x) = ((bytes(rowOff + x * 3 + 2) & 0xff) << 16) | // R
          ((bytes(rowOff + x * 3 + 1) & 0xff) << 8) |                // G
          (bytes(rowOff + x * 3) & 0xff)                             // B
        x += 1
      }
      y += 1
    }
    px
  }

  /** Encode a pixel function as a raw 24-bit bottom-up DIB pixel array
    * (no headers) — the payload of one AVI '00db' frame chunk. */
  private[ext] def encodeDibPixels(w: Int, h: Int,
      px: Int => (Int, Int, Int)): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val out = new Array[Byte](rowSize * h)
    var y = 0
    while (y < h) {
      val rowOff = (h - 1 - y) * rowSize // bottom-up
      var x = 0
      while (x < w) {
        val (r, g, b) = px(y * w + x)
        out(rowOff + x * 3) = b.toByte
        out(rowOff + x * 3 + 1) = g.toByte
        out(rowOff + x * 3 + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    out
  }
}
