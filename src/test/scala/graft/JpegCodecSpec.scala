package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{JpegCodec, VideoCodec}

/** Baseline-JPEG codec and MJPEG-in-AVI plumbing — pure JVM, no Spark. */
class JpegCodecSpec extends AnyFunSuite {

  test("block-constant frames round-trip EXACTLY (DC-only blocks, unit quantizers)") {
    // every 8x8 block one value — incl. partial edge MCUs via odd dims
    for ((w, h) <- Seq((8, 8), (16, 8), (5, 3), (17, 9), (1, 1))) {
      for (g <- Seq(0, 1, 127, 128, 200, 255)) {
        val jpeg = JpegCodec.encodeGray(w, h, _ => g)
        val dec = JpegCodec.decodeGray(jpeg)
        assert(dec.width == w && dec.height == h)
        assert(dec.pixels.forall(_ == g), s"${w}x$h gray=$g")
      }
      // per-BLOCK constant (different DC per MCU): still exact
      val px = (p: Int) => {
        val (x, y) = (p % w, p / w)
        ((x / 8) * 71 + (y / 8) * 131 + 40) % 256
      }
      val dec = JpegCodec.decodeGray(JpegCodec.encodeGray(w, h, px))
      (0 until w * h).foreach(p => assert(dec.pixels(p) == px(p), s"${w}x$h p=$p"))
    }
  }

  test("COLOR: gray-valued frames round-trip exactly through 4:4:4 AND 4:2:0") {
    for ((w, h) <- Seq((8, 8), (16, 16), (5, 3), (17, 9), (1, 1));
         sub <- Seq(false, true)) {
      // per-8x8-block constant gray values, R=G=B → Y=g, Cb=Cr=128
      val gray = (p: Int) => {
        val (x, y) = (p % w, p / w)
        ((x / 8) * 53 + (y / 8) * 101 + 77) % 256
      }
      // NOTE 4:2:0 needs constancy over 16x16 luma regions for chroma
      // exactness on block-varying content; constant frames cover that
      val g = if (sub) 123 else -1
      val px = (p: Int) => {
        val v = if (sub) g else gray(p)
        (v, v, v)
      }
      val dec = JpegCodec.decodeRgb(JpegCodec.encodeColor(w, h, px, subsample = sub))
      assert(dec.width == w && dec.height == h)
      (0 until w * h).foreach { p =>
        val (r, _, _) = px(p)
        val expected = (r << 16) | (r << 8) | r
        assert(dec.pixels(p) == expected, s"${w}x$h sub=$sub p=$p")
      }
    }
  }

  test("COLOR: smooth color content round-trips within tolerance (4:4:4 tighter than 4:2:0)") {
    val w = 24; val h = 16
    // constant over 2x2 cells so 4:2:0 chroma averaging is lossless;
    // remaining error = color-transform rounding + DCT quantization
    val px = (p: Int) => {
      val (x, y) = (p % w, p / w)
      val (cx, cy) = (x / 2, y / 2)
      ((cx * 19 + 40) % 256, (cy * 23 + 80) % 256, (cx * 7 + cy * 11 + 120) % 256)
    }
    for (sub <- Seq(false, true)) {
      val dec = JpegCodec.decodeRgb(JpegCodec.encodeColor(w, h, px, subsample = sub))
      var maxErr = 0
      (0 until w * h).foreach { p =>
        val (r, g, b) = px(p)
        val v = dec.pixels(p)
        maxErr = math.max(maxErr, math.abs(((v >> 16) & 0xff) - r)
          .max(math.abs(((v >> 8) & 0xff) - g)).max(math.abs((v & 0xff) - b)))
      }
      assert(maxErr <= 6, s"sub=$sub max channel error $maxErr")
    }
  }

  test("ImageCodec.decode dispatches on the SOI magic and keeps the packed layout") {
    val jpeg = JpegCodec.encodeColor(13, 9, _ => (88, 88, 88))
    val img = graft.ext.ImageCodec.decode(jpeg)
    assert(img.format == "jpeg" && img.width == 13 && img.height == 9)
    assert((img.r(0), img.g(0), img.b(0)) == ((88, 88, 88)))
  }

  test("decodeRgb on a grayscale (1-component) JPEG replicates channels") {
    val jpeg = JpegCodec.encodeGray(9, 5, p => (p * 13 + 5) % 256)
    val g = JpegCodec.decodeGray(jpeg)
    val c = JpegCodec.decodeRgb(jpeg)
    (0 until 45).foreach { p =>
      val v = g.pixels(p)
      assert(c.pixels(p) == ((v << 16) | (v << 8) | v))
    }
  }

  test("arbitrary content round-trips within ±2 at unit quantizers (lossy-but-tight)") {
    val w = 19; val h = 13
    val px = (p: Int) => (p * 97 + (p * p) % 83 + 11) % 256
    val dec = JpegCodec.decodeGray(JpegCodec.encodeGray(w, h, px))
    assert(dec.width == w && dec.height == h)
    var maxErr = 0
    (0 until w * h).foreach { p =>
      maxErr = math.max(maxErr, math.abs(dec.pixels(p) - px(p)))
    }
    assert(maxErr <= 2, s"max roundtrip error $maxErr")
  }

  test("decoder rejects non-JPEG, progressive, truncation, and runaway scans") {
    intercept[IllegalArgumentException] { // wrong magic
      JpegCodec.decodeGray(Array[Byte](0x42, 0x4d, 0, 0))
    }
    val good = JpegCodec.encodeGray(10, 10, p => (p * 31) % 256)
    assert(JpegCodec.decodeGray(good).pixels.length == 100)
    // progressive: flip SOF0 (0xc0) to SOF2 (0xc2)
    val prog = good.clone()
    val sof = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    val e = intercept[IllegalArgumentException] { JpegCodec.decodeGray(prog) }
    assert(e.getMessage.contains("progressive"))
    // truncation mid-entropy-stream: drop the EOI and trailing bytes
    intercept[IllegalArgumentException] {
      JpegCodec.decodeGray(good.dropRight(6))
    }
    // a segment length overrunning the file
    val overrun = good.clone()
    val dqt = (0 until overrun.length - 1).find(i =>
      (overrun(i) & 0xff) == 0xff && (overrun(i + 1) & 0xff) == 0xdb).get
    overrun(dqt + 2) = 0x7f // declared DQT length far past EOF
    intercept[IllegalArgumentException] { JpegCodec.decodeGray(overrun) }
  }

  test("DRI restart intervals round-trip (gray and color 4:2:0) and reject bad RSTn") {
    // 33x17 gray → 15 MCUs; Ri=4 → 3 restarts incl. predictor resets
    val (w, h) = (33, 17)
    val px = (p: Int) => (p * 29 + 17) % 256
    val jpeg = JpegCodec.encodeGray(w, h, px, restartInterval = 4)
    val plain = JpegCodec.encodeGray(w, h, px)
    assert(jpeg.length > plain.length) // DRI segment + RST markers present
    val dec = JpegCodec.decodeGray(jpeg)
    val ref = JpegCodec.decodeGray(plain)
    assert(dec.pixels.sameElements(ref.pixels)) // restarts are transparent
    // color 4:2:0 with restarts, block-constant gray values → exact
    val g = 166
    val cj = JpegCodec.encodeColor(40, 24, _ => (g, g, g),
      subsample = true, restartInterval = 2)
    assert(JpegCodec.decodeRgb(cj).pixels
      .forall(_ == ((g << 16) | (g << 8) | g)))
    // corrupt the first restart marker's index (RST0 → RST5): refused
    val bad = jpeg.clone()
    val rst = (0 until bad.length - 1).find(i =>
      (bad(i) & 0xff) == 0xff && (bad(i + 1) & 0xff) == 0xd0).get
    bad(rst + 1) = 0xd5.toByte
    val e = intercept[IllegalArgumentException] { JpegCodec.decodeGray(bad) }
    assert(e.getMessage.contains("RST"))
  }

  test("MJPEG-AVI: constant-gray frames decode exactly through the container walk") {
    val (w, h, nf) = (11, 6, 4)
    def gray(f: Int) = (40 + f * 50) % 256
    val avi = VideoCodec.encodeMjpegAvi(w, h, 40000, nf,
      (f, _) => gray(f), withJunkChunk = true)
    val dec = VideoCodec.decodeAvi(avi)
    assert(dec.width == w && dec.height == h && dec.nFrames == nf)
    assert(dec.microSecPerFrame == 40000)
    (0 until nf).foreach { f =>
      val g = gray(f)
      val expected = (g << 16) | (g << 8) | g
      assert(dec.frames(f).forall(_ == expected), s"frame $f")
    }
    // the color-4:2:0 mux of the same gray values decodes identically
    val colorAvi = VideoCodec.encodeMjpegAviColor(w, h, 40000, nf,
      (f, _) => { val g = gray(f); (g, g, g) }, subsample = true,
      withJunkChunk = true)
    val cdec = VideoCodec.decodeAvi(colorAvi)
    assert(cdec.width == w && cdec.height == h && cdec.nFrames == nf)
    (0 until nf).foreach { f =>
      val g = gray(f)
      val expected = (g << 16) | (g << 8) | g
      assert(cdec.frames(f).forall(_ == expected), s"color frame $f")
    }
  }

  test("property: random block-constant images are exact across dims/modes/DRI") {
    val rnd = new scala.util.Random(1117)
    (1 to 25).foreach { _ =>
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(30)
      val blockVals = Array.fill(((w + 7) / 8 + 1) * ((h + 7) / 8 + 1))(rnd.nextInt(256))
      val gray = (p: Int) =>
        blockVals(((p / w) / 8) * ((w + 7) / 8 + 1) + (p % w) / 8)
      val ri = rnd.nextInt(3) // 0 = no DRI
      rnd.nextInt(3) match {
        case 0 => // grayscale
          val dec = JpegCodec.decodeGray(JpegCodec.encodeGray(w, h, gray, ri))
          (0 until w * h).foreach(p =>
            assert(dec.pixels(p) == gray(p), s"gray ${w}x$h ri=$ri p=$p"))
        case 1 => // color 4:4:4 — per-BLOCK constant survives (no subsampling)
          val dec = JpegCodec.decodeRgb(JpegCodec.encodeColor(w, h,
            p => { val g = gray(p); (g, g, g) }, subsample = false,
            restartInterval = ri))
          (0 until w * h).foreach { p =>
            val g = gray(p)
            assert(dec.pixels(p) == ((g << 16) | (g << 8) | g),
              s"444 ${w}x$h ri=$ri p=$p")
          }
        case _ => // color 4:2:0 — whole-frame constant survives subsampling
          val g = blockVals(0)
          val dec = JpegCodec.decodeRgb(JpegCodec.encodeColor(w, h,
            _ => (g, g, g), subsample = true, restartInterval = ri))
          assert(dec.pixels.forall(_ == ((g << 16) | (g << 8) | g)),
            s"420 ${w}x$h ri=$ri")
      }
    }
  }

  test("property: random arbitrary gray content stays within ±2 across dims and DRI") {
    val rnd = new scala.util.Random(2203)
    (1 to 10).foreach { _ =>
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(30)
      val img = Array.fill(w * h)(rnd.nextInt(256))
      val ri = rnd.nextInt(3)
      val dec = JpegCodec.decodeGray(JpegCodec.encodeGray(w, h, img, ri))
      (0 until w * h).foreach(p =>
        assert(math.abs(dec.pixels(p) - img(p)) <= 2, s"${w}x$h ri=$ri p=$p"))
    }
  }

  test("MJPEG-AVI: frame-geometry mismatch vs the stream header is refused") {
    // splice a 8x8 JPEG into a stream declared 11x6
    val avi = VideoCodec.encodeMjpegAvi(11, 6, 40000, 1, (_, _) => 99)
    val wrong = JpegCodec.encodeGray(8, 8, _ => 99)
    val right = JpegCodec.encodeGray(11, 6, _ => 99)
    // locate the single 00dc chunk and rebuild the AVI around the
    // wrong-size payload (sizes differ, so rebuild rather than patch)
    val idx = (0 until avi.length - 3).find(i =>
      avi(i) == '0' && avi(i + 1) == '0' && avi(i + 2) == 'd' && avi(i + 3) == 'c').get
    val prefix = avi.take(idx)
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(payload: Array[Byte]) =
      "00dc".getBytes("US-ASCII") ++ le32(payload.length) ++ payload ++
        (if (payload.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    // sanity: rebuilding with the RIGHT payload still decodes (the
    // RIFF/LIST sizes change, so fix them up via re-encode comparison)
    def rebuild(payload: Array[Byte]): Array[Byte] = {
      val out = prefix ++ chunk(payload)
      // patch RIFF size (offset 4) and movi LIST size: movi LIST header
      // sits right before the chunk tag at idx - 12 ('LIST' size 'movi')
      val moviSize = 4 + 8 + payload.length + (payload.length & 1)
      System.arraycopy(le32(out.length - 8), 0, out, 4, 4)
      System.arraycopy(le32(moviSize), 0, out, idx - 8, 4)
      out
    }
    assert(VideoCodec.decodeAvi(rebuild(right)).nFrames == 1)
    val e = intercept[IllegalArgumentException] {
      VideoCodec.decodeAvi(rebuild(wrong))
    }
    assert(e.getMessage.contains("geometry"))
  }
}
