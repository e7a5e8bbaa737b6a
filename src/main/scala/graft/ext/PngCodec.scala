package graft.ext

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec: 8-bit truecolor (color type 2), real zlib
  * DEFLATE streams via `java.util.zip` (JDK-public, no new
  * dependency), chunk CRC32 verification, multi-IDAT reassembly, and
  * all FIVE scanline filter types (None/Sub/Up/Average/Paeth) on both
  * sides — the encoder cycles the filter per row so every predictor
  * path in the decoder sits under the oracle's hash gate, the same
  * honest-coverage move as the JPEG codec's subsampling variants.
  *
  * Like the BMP/PPM/GIF/JPEG codecs this runs inside a narrow
  * `mapPartitions` over binary payloads — per-row byte work with no
  * shuffle, the one place imperative code is the right Spark shape
  * (reference has no media decode at all; this extends the
  * `decodeStub` contract of ext/MultiModal.scala:130 with another
  * honestly-decodable format).
  *
  * Scope (documented, rejected loudly): bit depth 8, color type 2
  * (RGB), no interlace, no ancillary-chunk interpretation (they are
  * CRC-checked and skipped). Palette/alpha/16-bit are the next honest
  * extensions; lossy formats stay with [[JpegCodec]].
  */
object PngCodec {

  /** Decode-side geometry cap: 64 Mpx ≈ 192 MB of RGB — generous for
    * any training-corpus image, far below what overflows Int stride
    * math or blows an executor's task memory. */
  private[ext] val MaxPixels: Long = 64L * 1024 * 1024

  private val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def writeChunk(out: ByteArrayOutputStream, kind: String,
      data: Array[Byte]): Unit = {
    out.write(be32(data.length.toLong), 0, 4)
    val k = kind.getBytes("US-ASCII")
    out.write(k, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(k); crc.update(data)
    out.write(be32(crc.getValue), 0, 4)
  }

  /** Encode w×h RGB pixels (row-major index → (r,g,b)) as a real PNG.
    * Filter type cycles `row % 5` so None/Sub/Up/Average/Paeth all
    * appear; the DEFLATE stream is split across two IDAT chunks when
    * it is big enough, so the decoder's multi-IDAT reassembly is
    * exercised on real data, not just tolerated. */
  def encode(w: Int, h: Int, px: Int => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0, s"bad geometry ${w}x$h")
    val bpp = 3
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    val cur = new Array[Int](stride)
    val prev = new Array[Int](stride) // zeros stand in for the row above row 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = px(y * w + x)
        cur(x * 3) = r & 0xff; cur(x * 3 + 1) = g & 0xff
        cur(x * 3 + 2) = b & 0xff
        x += 1
      }
      val ft = y % 5
      raw(y * (stride + 1)) = ft.toByte
      var i = 0
      while (i < stride) {
        val a = if (i >= bpp) cur(i - bpp) else 0
        val up = prev(i)
        val c = if (i >= bpp) prev(i - bpp) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => up
          case 3 => (a + up) / 2
          case _ => paeth(a, up, c)
        }
        raw(y * (stride + 1) + 1 + i) = ((cur(i) - pred) & 0xff).toByte
        i += 1
      }
      Array.copy(cur, 0, prev, 0, stride)
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw); deflater.finish()
    val zBuf = new ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!deflater.finished()) {
      val n = deflater.deflate(tmp)
      zBuf.write(tmp, 0, n)
    }
    deflater.end()
    val z = zBuf.toByteArray

    val out = new ByteArrayOutputStream()
    out.write(Signature, 0, Signature.length)
    val ihdr = new ByteArrayOutputStream()
    ihdr.write(be32(w.toLong), 0, 4)
    ihdr.write(be32(h.toLong), 0, 4)
    ihdr.write(8) // bit depth
    ihdr.write(2) // color type: truecolor RGB
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // deflate, adaptive, no interlace
    writeChunk(out, "IHDR", ihdr.toByteArray)
    if (z.length > 32) { // split: decoder must concatenate IDATs
      writeChunk(out, "IDAT", z.take(z.length / 2))
      writeChunk(out, "IDAT", z.drop(z.length / 2))
    } else writeChunk(out, "IDAT", z)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode a PNG: verify signature and every chunk CRC, reassemble
    * IDAT, inflate, and un-apply the per-row filter. Rejects (rather
    * than guesses at) interlace, palette/alpha color types, and
    * non-8-bit depths. */
  def decode(bytes: Array[Byte]): ImageCodec.Image = {
    require(bytes.length >= 8 && Signature.indices.forall(i =>
      bytes(i) == Signature(i)), "not a PNG signature")
    var pos = 8
    var w = 0; var h = 0; var seenIhdr = false
    val idat = new ByteArrayOutputStream()
    def u32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    var done = false
    while (!done) {
      require(pos + 8 <= bytes.length, "truncated PNG chunk header")
      // length check in Long: a crafted 32-bit length near Int.MaxValue
      // would overflow `pos + 12 + len` in Int arithmetic and slip past
      // the bound straight into an ArrayIndexOutOfBounds
      val lenL = u32(pos)
      val kind = new String(bytes, pos + 4, 4, "US-ASCII")
      require(pos + 12L + lenL <= bytes.length, s"truncated $kind chunk")
      val len = lenL.toInt
      val crc = new CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue == u32(pos + 8 + len),
        s"CRC mismatch in $kind chunk")
      kind match {
        case "IHDR" =>
          require(len == 13, s"bad IHDR length $len")
          w = u32(pos + 8).toInt; h = u32(pos + 12).toInt
          require(w > 0 && h > 0, s"bad PNG geometry ${w}x$h")
          // bound the PRODUCT in Long before any allocation: a crafted
          // IHDR with w near 2^30 overflows `w * 3` / `(stride+1) * h`
          // in Int arithmetic (negative-size or multi-GB allocation —
          // a decompression bomb), which a decoder running inside an
          // executor task must refuse cleanly, not OOM the JVM
          require(w.toLong * h <= MaxPixels,
            s"PNG geometry ${w}x$h exceeds $MaxPixels-pixel decode cap")
          val depth = bytes(pos + 16) & 0xff
          val color = bytes(pos + 17) & 0xff
          val interlace = bytes(pos + 20) & 0xff
          require(depth == 8, s"only 8-bit PNG supported, depth=$depth")
          require(color == 2, s"only truecolor (2) supported, type=$color")
          require(interlace == 0, "interlaced PNG not supported")
          seenIhdr = true
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary: CRC-verified above, content skipped
      }
      pos += 12 + len
    }
    require(seenIhdr, "PNG without IHDR")
    val bpp = 3
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    while (off < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, off, raw.length - off)
      require(n > 0 || inflater.finished(), "bad DEFLATE stream in IDAT")
      off += n
    }
    inflater.end()
    require(off == raw.length,
      s"short pixel data: need ${raw.length}, inflated $off")

    val px = new Array[Int](w * h)
    val recon = new Array[Int](stride)
    val prev = new Array[Int](stride)
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xff
      require(ft <= 4, s"unknown PNG filter type $ft")
      var i = 0
      while (i < stride) {
        val v = raw(y * (stride + 1) + 1 + i) & 0xff
        val a = if (i >= bpp) recon(i - bpp) else 0
        val up = prev(i)
        val c = if (i >= bpp) prev(i - bpp) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => up
          case 3 => (a + up) / 2
          case _ => paeth(a, up, c)
        }
        recon(i) = (v + pred) & 0xff
        i += 1
      }
      var x = 0
      while (x < w) {
        px(y * w + x) = (recon(x * 3) << 16) | (recon(x * 3 + 1) << 8) |
          recon(x * 3 + 2)
        x += 1
      }
      Array.copy(recon, 0, prev, 0, stride)
      y += 1
    }
    ImageCodec.Image("png", w, h, px)
  }
}
