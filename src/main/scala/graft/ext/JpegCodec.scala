package graft.ext

/** Pure-JVM baseline JPEG codec (ITU T.81 sequential DCT): the entropy
  * layer MJPEG-in-AVI frames need, with no native codec libraries.
  * Everything here is the public interchange format — canonical
  * Huffman codes built from DHT (bits, values) exactly as Annex C
  * specifies, the Annex K.3 luminance code tables, the Annex A zigzag
  * order, the 8×8 type-II DCT, interleaved multi-component MCUs with
  * per-component sampling factors and DC predictors, and the JFIF
  * YCbCr color transform.
  *
  * Supported profile: 8-bit baseline, 1 component (grayscale) or 3
  * components (YCbCr) with sampling factors in {1, 2} — i.e. 4:4:4,
  * 4:2:2, and 4:2:0 — plus DRI restart intervals (RSTn resync markers
  * with DC-predictor resets), which covers what real MJPEG muxers
  * emit. Chroma upsampling is nearest-neighbor (sample replication).
  *
  * Scope boundary (honest, enforced with clear errors, mirroring
  * [[VideoCodec]]'s quarantine contract): progressive (SOF2),
  * arithmetic coding, 16-bit quantizers, and sampling factors >2 are
  * REJECTED, not guessed at.
  *
  * Exactness: encode→decode is bit-exact on frames whose blocks are
  * constant — a constant block's FDCT is DC-only, the unit quantizers
  * hold it exactly, and the IDCT of a lone DC term is the constant
  * again (double-precision error ~1e-13, far under the final round).
  * For COLOR frames the same holds when R=G=B (gray-valued color): the
  * JFIF transform maps them to Y=g, Cb=Cr=128 exactly (coefficient
  * rows sum to 1 and 0), chroma subsampling of a constant plane is the
  * constant, and the inverse transform at Cb=Cr=128 is the identity on
  * Y — which is what lets `mm_frames_mjpeg` hash-gate a full color
  * 4:2:0 decode against an arithmetic SQL oracle. On arbitrary content
  * the round trip is the usual lossy DCT quantization (unit tables
  * keep luma within ±2/pixel; chroma subsampling additionally averages
  * 2×2 neighborhoods — both spec-asserted).
  */
object JpegCodec {

  /** A decoded grayscale image: row-major top-down, values 0..255. */
  final case class Gray(width: Int, height: Int, pixels: Array[Int])

  /** A decoded image as packed 0xRRGGBB ints, row-major top-down —
    * [[ImageCodec]]'s normal form (grayscale sources replicate). */
  final case class Rgb(width: Int, height: Int, pixels: Array[Int])

  // ---- public constants of the format --------------------------------

  /** Annex A zigzag: scan position → natural (row*8+col) index. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.3.1 luminance DC table: code counts per length, values. */
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)

  /** Annex K.3.2 luminance AC table. */
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** cos((2x+1)·u·π/16) — shared by FDCT and IDCT. */
  private val CosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private def cFac(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  // ---- Huffman code construction (Annex C) ---------------------------

  /** Canonical codes: (code, length) per symbol, assigned in length
    * order then listing order — identical for encoder and decoder. */
  private def canonicalCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out += vals(k) -> ((code, len))
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    out.result()
  }

  /** Decode tables per the F.2.2.3 algorithm: per code length, the
    * first code value and the index of its first symbol. */
  private final class HuffDecoder(bits: Array[Int], vals: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17) // -1 = no codes this length
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        if (bits(len - 1) == 0) { minCode(len) = 0; maxCode(len) = -1 }
        else {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len - 1); k += bits(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
        len += 1
      }
    }
    def decode(in: BitReader): Int = {
      var code = in.readBit()
      var len = 1
      while (len < 16 && (maxCode(len) < 0 || code > maxCode(len))) {
        code = (code << 1) | in.readBit()
        len += 1
      }
      require(maxCode(len) >= 0 && code <= maxCode(len),
        "invalid Huffman code in entropy stream")
      vals(valPtr(len) + code - minCode(len))
    }
  }

  // ---- bit I/O with byte stuffing ------------------------------------

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var cur = 0
    private var n = 0
    /** At a restart point: drop any pad bits of the current byte and
      * consume the expected RSTn marker (F.2.1.3.1). */
    def expectRestart(idx: Int): Unit = {
      n = 0
      require(pos + 2 <= bytes.length, "truncated at restart marker")
      val m = ((bytes(pos) & 0xff) << 8) | (bytes(pos + 1) & 0xff)
      require(m == 0xffd0 + idx,
        f"expected RST$idx%d (0xff${0xd0 + idx}%02x), got 0x$m%04x")
      pos += 2
    }
    def readBit(): Int = {
      if (n == 0) {
        require(pos < bytes.length, "truncated entropy stream")
        val b = bytes(pos) & 0xff; pos += 1
        if (b == 0xff) { // stuffed data byte or an in-scan marker
          require(pos < bytes.length, "truncated entropy stream")
          val b2 = bytes(pos) & 0xff
          require(b2 == 0x00,
            f"marker 0xff$b2%02x inside entropy-coded data (truncated scan?)")
          pos += 1
        }
        cur = b; n = 8
      }
      n -= 1
      (cur >> n) & 1
    }
    def receive(nb: Int): Int = {
      var v = 0; var i = 0
      while (i < nb) { v = (v << 1) | readBit(); i += 1 }
      v
    }
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def write(v: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1); n += 1
        if (n == 8) { out.write(acc); if (acc == 0xff) out.write(0); acc = 0; n = 0 }
        i -= 1
      }
    }
    /** Pad the final byte with 1-bits (F.1.2.3). */
    def finish(): Unit = while (n != 0) write(1, 1)
  }

  /** F.12 EXTEND: a `t`-bit magnitude to its signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Magnitude category: bits needed for |v| (0 for v=0). */
  private def category(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  // ---- shared block coding -------------------------------------------

  /** FDCT an 8×8 level-shifted block into natural-order coefficients,
    * unit-quantized; AC magnitudes clamped to category 10 (±1023), the
    * largest the Annex K AC table can code — reachable only by
    * adversarial ±128 checkerboards at unit quantizers; real encoders
    * avoid it via >1 high-frequency quantizers. */
  private def fdctQuantize(block: Array[Double], coef: Array[Int]): Unit = {
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            s += block(yy * 8 + xx) * CosT(xx)(u) * CosT(yy)(v)
            xx += 1
          }
          yy += 1
        }
        val q = math.round(0.25 * cFac(u) * cFac(v) * s).toInt
        coef(v * 8 + u) =
          if (v == 0 && u == 0) q else math.max(-1023, math.min(1023, q))
        u += 1
      }
      v += 1
    }
  }

  /** Huffman-encode one quantized block; returns the new DC predictor. */
  private def encodeBlock(bw: BitWriter, coef: Array[Int], pred: Int,
      dcCodes: Map[Int, (Int, Int)], acCodes: Map[Int, (Int, Int)]): Int = {
    def put(codes: Map[Int, (Int, Int)], sym: Int): Unit = {
      val (c, l) = codes(sym); bw.write(c, l)
    }
    def putBits(v: Int, s: Int): Unit =
      if (s > 0) bw.write(if (v >= 0) v else v + (1 << s) - 1, s)
    val diff = coef(0) - pred
    val s0 = category(diff)
    put(dcCodes, s0); putBits(diff, s0)
    var k = 1
    var run = 0
    while (k < 64) {
      val c = coef(Zigzag(k))
      if (c == 0) run += 1
      else {
        while (run > 15) { put(acCodes, 0xf0); run -= 16 }
        val s = category(c)
        put(acCodes, (run << 4) | s); putBits(c, s)
        run = 0
      }
      k += 1
    }
    if (run > 0) put(acCodes, 0x00) // EOB
    coef(0)
  }

  /** Decode one block's coefficients (dequantized, natural order);
    * returns the new DC predictor. */
  private def decodeBlock(in: BitReader, coef: Array[Int], pred: Int,
      dcDec: HuffDecoder, acDec: HuffDecoder, qt: Array[Int]): Int = {
    java.util.Arrays.fill(coef, 0)
    val t = dcDec.decode(in)
    require(t <= 11, s"DC category $t out of range")
    val dc = pred + extend(in.receive(t), t)
    coef(0) = dc * qt(0)
    var k = 1
    var done = false
    while (k < 64 && !done) {
      val rs = acDec.decode(in)
      if (rs == 0x00) done = true // EOB
      else if (rs == 0xf0) k += 16 // ZRL
      else {
        k += rs >> 4
        require(k < 64, "AC run overflows the block")
        coef(Zigzag(k)) = extend(in.receive(rs & 0xf), rs & 0xf) * qt(k)
        k += 1
      }
    }
    dc
  }

  /** IDCT + level shift + clamp one block into a plane at (px0, py0). */
  private def idctInto(coef: Array[Int], plane: Array[Int], planeW: Int,
      px0: Int, py0: Int): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val c = coef(v * 8 + u)
            if (c != 0) s += cFac(u) * cFac(v) * c * CosT(x)(u) * CosT(y)(v)
            u += 1
          }
          v += 1
        }
        val value = math.round(0.25 * s).toInt + 128
        plane((py0 + y) * planeW + (px0 + x)) = math.max(0, math.min(255, value))
        x += 1
      }
      y += 1
    }
  }

  // ---- encoders ------------------------------------------------------

  /** Encode a grayscale image (`px`: row-major index → 0..255) as a
    * baseline JFIF JPEG with UNIT quantizers (quality-100 shape): SOI,
    * APP0, DQT, SOF0, DHT×2, SOS, entropy data, EOI. Partial edge
    * MCUs are edge-replicated, the standard muxer treatment. */
  def encodeGray(w: Int, h: Int, px: Int => Int,
      restartInterval: Int = 0): Array[Byte] =
    encodeBaseline(w, h, nComp = 1,
      (p, c) => { val _ = c; px(p) }, restartInterval = restartInterval)

  /** Encode an RGB image (`px`: row-major index → (r, g, b)) as a
    * baseline color JPEG — YCbCr via the JFIF transform, 4:2:0 chroma
    * subsampling when `subsample` (2×2 mean, edge-replicated) else
    * 4:4:4. All components share the unit quantizer and the luminance
    * code tables (legal: components reference table ids). */
  def encodeColor(w: Int, h: Int, px: Int => (Int, Int, Int),
      subsample: Boolean = true, restartInterval: Int = 0): Array[Byte] = {
    // precompute the YCbCr planes once (rounded ints, the values the
    // DCT sees); BT.601/JFIF full-range transform
    val yP = new Array[Int](w * h)
    val cbP = new Array[Int](w * h)
    val crP = new Array[Int](w * h)
    var p = 0
    while (p < w * h) {
      val (r, g, b) = px(p)
      yP(p) = clamp8(math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt)
      cbP(p) = clamp8(math.round(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b).toInt)
      crP(p) = clamp8(math.round(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b).toInt)
      p += 1
    }
    if (subsample) {
      // chroma planes at half resolution: 2×2 mean with replication
      val cw = (w + 1) / 2
      val ch = (h + 1) / 2
      def shrink(src: Array[Int]): Array[Int] = {
        val out = new Array[Int](cw * ch)
        var cy = 0
        while (cy < ch) {
          var cx = 0
          while (cx < cw) {
            var sum = 0
            var dy = 0
            while (dy < 2) {
              var dx = 0
              while (dx < 2) {
                val sx = math.min(cx * 2 + dx, w - 1)
                val sy = math.min(cy * 2 + dy, h - 1)
                sum += src(sy * w + sx)
                dx += 1
              }
              dy += 1
            }
            out(cy * cw + cx) = (sum + 2) / 4
            cx += 1
          }
          cy += 1
        }
        out
      }
      val cb2 = shrink(cbP)
      val cr2 = shrink(crP)
      encodeBaseline(w, h, nComp = 3, (p, c) => c match {
        case 0 => yP(p); case 1 => cb2(p); case _ => cr2(p)
      }, samp = Array((2, 2), (1, 1), (1, 1)),
        compDims = Array((w, h), (cw, ch), (cw, ch)),
        restartInterval = restartInterval)
    } else
      encodeBaseline(w, h, nComp = 3, (p, c) => c match {
        case 0 => yP(p); case 1 => cbP(p); case _ => crP(p)
      }, restartInterval = restartInterval)
  }

  private def clamp8(v: Int): Int = math.max(0, math.min(255, v))

  /** The shared baseline encoder: `sample(p, c)` reads component `c`'s
    * plane at ITS OWN resolution (`compDims(c)`), row-major index `p`.
    * `samp` gives per-component (h, v) sampling factors. */
  private def encodeBaseline(w: Int, h: Int, nComp: Int,
      sample: (Int, Int) => Int,
      samp: Array[(Int, Int)] = null,
      compDims: Array[(Int, Int)] = null,
      restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0, s"bad geometry ${w}x$h")
    val sf = if (samp != null) samp else Array.fill(nComp)((1, 1))
    val dims = if (compDims != null) compDims else Array.fill(nComp)((w, h))
    val maxH = sf.map(_._1).max
    val maxV = sf.map(_._2).max
    val out = new java.io.ByteArrayOutputStream(1024)
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }

    marker(0xd8) // SOI
    marker(0xe0); u16(16) // APP0 JFIF
    Seq('J', 'F', 'I', 'F', 0).foreach(c => u8(c.toInt))
    u16(0x0102); u8(0); u16(1); u16(1); u8(0); u8(0)
    marker(0xdb); u16(67); u8(0x00) // DQT: 8-bit table 0, all ones
    (0 until 64).foreach(_ => u8(1))
    marker(0xc0); u16(8 + 3 * nComp) // SOF0
    u8(8); u16(h); u16(w); u8(nComp)
    var c = 0
    while (c < nComp) {
      u8(c + 1); u8((sf(c)._1 << 4) | sf(c)._2); u8(0)
      c += 1
    }
    def dht(tcTh: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length); u8(tcTh)
      bits.foreach(u8); vals.foreach(u8)
    }
    dht(0x00, DcBits, DcVals)
    dht(0x10, AcBits, AcVals)
    if (restartInterval > 0) { // DRI: resync marker every Ri MCUs
      marker(0xdd); u16(4); u16(restartInterval)
    }
    marker(0xda); u16(6 + 2 * nComp) // SOS
    u8(nComp)
    c = 0
    while (c < nComp) { u8(c + 1); u8(0x00); c += 1 }
    u8(0); u8(63); u8(0)

    val dcCodes = canonicalCodes(DcBits, DcVals)
    val acCodes = canonicalCodes(AcBits, AcVals)
    val bw = new BitWriter(out)
    val mcuX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcuY = (h + 8 * maxV - 1) / (8 * maxV)
    val block = new Array[Double](64)
    val coef = new Array[Int](64)
    val preds = new Array[Int](nComp)
    var mcuDone = 0
    var restartIdx = 0
    var my = 0
    while (my < mcuY) {
      var mx = 0
      while (mx < mcuX) {
        c = 0
        while (c < nComp) {
          val (hc, vc) = sf(c)
          val (cw, ch) = dims(c)
          var by = 0
          while (by < vc) {
            var bx = 0
            while (bx < hc) {
              var y = 0
              while (y < 8) {
                val sy = math.min((my * vc + by) * 8 + y, ch - 1)
                var x = 0
                while (x < 8) {
                  val sx = math.min((mx * hc + bx) * 8 + x, cw - 1)
                  block(y * 8 + x) = sample(sy * cw + sx, c) - 128.0
                  x += 1
                }
                y += 1
              }
              fdctQuantize(block, coef)
              preds(c) = encodeBlock(bw, coef, preds(c), dcCodes, acCodes)
              bx += 1
            }
            by += 1
          }
          c += 1
        }
        mcuDone += 1
        // between restart intervals (never after the last MCU): pad to
        // a byte boundary, emit RSTn (n cycling 0-7), reset predictors
        if (restartInterval > 0 && mcuDone % restartInterval == 0 &&
            mcuDone < mcuX * mcuY) {
          bw.finish()
          marker(0xd0 + restartIdx)
          restartIdx = (restartIdx + 1) % 8
          java.util.Arrays.fill(preds, 0)
        }
        mx += 1
      }
      my += 1
    }
    bw.finish()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ---- decoder -------------------------------------------------------

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int)

  /** Decode a single-component baseline JPEG to gray. */
  def decodeGray(bytes: Array[Byte]): Gray = {
    val (w, h, comps, planes, planeWs) = decodePlanes(bytes)
    require(comps.length == 1,
      s"only single-component expected here, got ${comps.length}")
    val out = new Array[Int](w * h)
    val pw = planeWs(0)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(y * w + x) = planes(0)(y * pw + x); x += 1 }
      y += 1
    }
    Gray(w, h, out)
  }

  /** Decode a 1- or 3-component baseline JPEG to packed RGB. Chroma
    * planes are upsampled by sample replication; the inverse JFIF
    * transform at Cb=Cr=128 is the identity on Y, so gray-valued color
    * frames decode bit-exactly (object doc). */
  def decodeRgb(bytes: Array[Byte]): Rgb = {
    val (w, h, comps, planes, planeWs) = decodePlanes(bytes)
    val out = new Array[Int](w * h)
    if (comps.length == 1) {
      val pw = planeWs(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = planes(0)(y * pw + x)
          out(y * w + x) = (g << 16) | (g << 8) | g
          x += 1
        }
        y += 1
      }
    } else {
      val maxH = comps.map(_.h).max
      val maxV = comps.map(_.v).max
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          def at(ci: Int): Int = {
            val cc = comps(ci)
            planes(ci)((y * cc.v / maxV) * planeWs(ci) + (x * cc.h / maxH))
          }
          val yy = at(0)
          val cb = at(1) - 128
          val cr = at(2) - 128
          val r = clamp8(math.round(yy + 1.402 * cr).toInt)
          val g = clamp8(math.round(yy - 0.344136 * cb - 0.714136 * cr).toInt)
          val b = clamp8(math.round(yy + 1.772 * cb).toInt)
          out(y * w + x) = (r << 16) | (g << 8) | b
          x += 1
        }
        y += 1
      }
    }
    Rgb(w, h, out)
  }

  /** Parse markers + entropy-decode the scan into per-component planes
    * (at each component's own subsampled resolution, padded to whole
    * blocks). Throws IllegalArgumentException on anything outside the
    * supported profile — unknown media routes to quarantine, never
    * guesses. */
  private def decodePlanes(bytes: Array[Byte])
      : (Int, Int, Array[Comp], Array[Array[Int]], Array[Int]) = {
    require(bytes.length >= 4, "too short for a JPEG")
    def u8(off: Int): Int = bytes(off) & 0xff
    def u16(off: Int): Int = (u8(off) << 8) | u8(off + 1)
    require(u8(0) == 0xff && u8(1) == 0xd8, "not a JPEG (missing SOI)")

    var pos = 2
    var w = -1
    var h = -1
    var comps: Array[Comp] = null
    val qTables = new Array[Array[Int]](4)
    val dhtStore = new Array[HuffDecoder](8) // (class<<2)|id
    var restartInterval = 0
    var result: (Array[Array[Int]], Array[Int]) = null

    while (result == null) {
      require(pos + 2 <= bytes.length, "truncated before SOS")
      require(u8(pos) == 0xff, f"expected marker, got 0x${u8(pos)}%02x at $pos")
      val m = u8(pos + 1)
      pos += 2
      m match {
        case 0xd9 => throw new IllegalArgumentException("EOI before any scan")
        case 0x01 => () // TEM: standalone
        case _ if m >= 0xd0 && m <= 0xd7 => () // RSTn: standalone
        case _ =>
          require(pos + 2 <= bytes.length, "truncated segment header")
          val len = u16(pos)
          require(len >= 2 && pos + len <= bytes.length,
            f"segment 0xff$m%02x overruns the file: len=$len")
          val body = pos + 2
          val end = pos + len
          m match {
            case 0xdb => // DQT: one or more tables
              var p = body
              while (p < end) {
                val pqTq = u8(p)
                require((pqTq >> 4) == 0, "16-bit quantizers unsupported")
                val id = pqTq & 0xf
                require(p + 65 <= end, "truncated DQT")
                qTables(id) = (0 until 64).map(i => u8(p + 1 + i)).toArray
                p += 65
              }
            case 0xc0 | 0xc1 => // baseline / extended sequential Huffman
              require(u8(body) == 8, "only 8-bit precision supported")
              h = u16(body + 1); w = u16(body + 3)
              require(w > 0 && h > 0 && w <= 65500 && h <= 65500,
                s"bad geometry ${w}x$h")
              val nc = u8(body + 5)
              require(nc == 1 || nc == 3,
                s"only 1 (gray) or 3 (YCbCr) components supported, got $nc")
              comps = Array.tabulate(nc) { i =>
                val off = body + 6 + 3 * i
                val hv = u8(off + 1)
                val comp = Comp(u8(off), hv >> 4, hv & 0xf, u8(off + 2))
                require(comp.h >= 1 && comp.h <= 2 && comp.v >= 1 && comp.v <= 2,
                  s"sampling factors ${comp.h}x${comp.v} unsupported (1-2 only)")
                comp
              }
              if (nc == 1)
                require(comps(0).h == 1 && comps(0).v == 1,
                  "subsampled single component is malformed")
            case 0xc2 =>
              throw new IllegalArgumentException("progressive JPEG (SOF2) unsupported")
            case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
              throw new IllegalArgumentException(f"SOF 0xff$m%02x profile unsupported")
            case 0xc4 => // DHT: one or more tables
              var p = body
              while (p < end) {
                val tcTh = u8(p)
                val tc = tcTh >> 4
                val th = tcTh & 0xf
                require(tc <= 1 && th <= 3, f"bad DHT id 0x$tcTh%02x")
                require(p + 17 <= end, "truncated DHT")
                val bits = (0 until 16).map(i => u8(p + 1 + i)).toArray
                val nv = bits.sum
                require(p + 17 + nv <= end, "truncated DHT values")
                val vals = (0 until nv).map(i => u8(p + 17 + i)).toArray
                dhtStore((tc << 2) | th) = new HuffDecoder(bits, vals)
                p += 17 + nv
              }
            case 0xdd => // DRI: restart every Ri MCUs (0 disables)
              require(len == 4, s"bad DRI length $len")
              restartInterval = u16(body)
            case 0xda => // SOS: header, then entropy-coded data
              require(comps != null, "SOS before SOF")
              val ns = u8(body)
              require(ns == comps.length, "partial (non-interleaved) scans unsupported")
              val dcDecs = new Array[HuffDecoder](comps.length)
              val acDecs = new Array[HuffDecoder](comps.length)
              var i = 0
              while (i < ns) {
                val cid = u8(body + 1 + 2 * i)
                val tdTa = u8(body + 2 + 2 * i)
                val ci = comps.indexWhere(_.id == cid)
                require(ci >= 0, s"scan references unknown component $cid")
                dcDecs(ci) = dhtStore(0 | (tdTa >> 4))
                acDecs(ci) = dhtStore(4 | (tdTa & 0xf))
                require(dcDecs(ci) != null && acDecs(ci) != null,
                  "scan references missing DHT")
                i += 1
              }
              require(u8(body + 1 + 2 * ns) == 0 && u8(body + 2 + 2 * ns) == 63 &&
                u8(body + 3 + 2 * ns) == 0, "not a sequential full-spectrum scan")
              val qts = comps.map { cc =>
                val qt = qTables(cc.tq)
                require(qt != null, "scan references missing DQT")
                qt
              }
              result = decodeScan(bytes, end, w, h, comps, qts, dcDecs, acDecs,
                restartInterval)
            case _ if (m >= 0xe0 && m <= 0xef) || m == 0xfe => () // APPn / COM
            case other =>
              throw new IllegalArgumentException(f"unsupported marker 0xff$other%02x")
          }
          pos = end
      }
    }
    (w, h, comps, result._1, result._2)
  }

  /** Entropy-decode all interleaved MCUs, then require a clean EOI.
    * Returns per-component planes (own resolution, whole-block padded)
    * and their widths. */
  private def decodeScan(bytes: Array[Byte], scanStart: Int, w: Int, h: Int,
      comps: Array[Comp], qts: Array[Array[Int]],
      dcDecs: Array[HuffDecoder], acDecs: Array[HuffDecoder],
      restartInterval: Int)
      : (Array[Array[Int]], Array[Int]) = {
    val in = new BitReader(bytes, scanStart)
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcuX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcuY = (h + 8 * maxV - 1) / (8 * maxV)
    val planeWs = comps.map(cc => mcuX * 8 * cc.h)
    val planeHs = comps.map(cc => mcuY * 8 * cc.v)
    val planes = Array.tabulate(comps.length)(i =>
      new Array[Int](planeWs(i) * planeHs(i)))
    val coef = new Array[Int](64)
    val preds = new Array[Int](comps.length)
    var mcuDone = 0
    var restartIdx = 0
    var my = 0
    while (my < mcuY) {
      var mx = 0
      while (mx < mcuX) {
        var ci = 0
        while (ci < comps.length) {
          val cc = comps(ci)
          var by = 0
          while (by < cc.v) {
            var bx = 0
            while (bx < cc.h) {
              preds(ci) = decodeBlock(in, coef, preds(ci), dcDecs(ci), acDecs(ci), qts(ci))
              idctInto(coef, planes(ci), planeWs(ci),
                (mx * cc.h + bx) * 8, (my * cc.v + by) * 8)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcuDone += 1
        // DRI: between intervals the stream is byte-aligned on an RSTn
        // marker (n cycling 0-7) and DC predictors reset (F.2.1.3.1)
        if (restartInterval > 0 && mcuDone % restartInterval == 0 &&
            mcuDone < mcuX * mcuY) {
          in.expectRestart(restartIdx)
          restartIdx = (restartIdx + 1) % 8
          java.util.Arrays.fill(preds, 0)
        }
        mx += 1
      }
      my += 1
    }
    // after the last MCU: optional pad bits already consumed with the
    // final data byte, so the next bytes must be EOI
    val p = in.pos
    require(p + 2 <= bytes.length && (bytes(p) & 0xff) == 0xff &&
      (bytes(p + 1) & 0xff) == 0xd9, "missing EOI after scan")
    (planes, planeWs)
  }
}
