package graft

import org.apache.spark.sql.functions._

import graft.ext.MultiModal
import graft.metrics.Observability
import graft.pipeline.{EmailJobs, MatchFixture, MatchPipeline}

/** Multimodal plumbing, observe() metrics, and the SQS envelope body. */
class MultiModalSpec extends SparkSpec {

  private def docs() = {
    import spark.implicits._
    Seq((0L, "abcd efgh ijkl", "en", "s", 14L),
      (1L, "zz yy xx ww vv uu", "en", "s", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("feature extraction: hash, length, leading-byte features") {
    val f = MultiModal.features(docs()).orderBy("doc_id").collect()
    assert(f(0).getAs[String]("media_type") == "image/jpeg")
    assert(f(0).getAs[Int]("byte_len") == 14)
    // md5("abcd efgh ijkl")
    assert(f(0).getAs[String]("content_hash") ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("abcd efgh ijkl".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    assert(f(0).getAs[Double]("f0") == 'a'.toInt / 255.0)
    assert(f(1).getAs[String]("media_type") == "audio/wav")
  }

  test("resize plan preserves aspect ratio toward 224") {
    val r = MultiModal.resizePlan(docs()).orderBy("doc_id").head
    val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
    val (tw, th) = (r.getAs[Int]("target_w"), r.getAs[Int]("target_h"))
    if (w >= h) { assert(tw == 224); assert(th == h * 224 / w) }
    else { assert(th == 224); assert(tw == w * 224 / h) }
  }

  test("frame sampling emits every k-th index per doc") {
    import spark.implicits._
    // video-typed docs (doc_id % 3 == 2); videoGeomOf gives 4, 2, 5 frames
    val vids = Seq(2L, 5L, 8L).map(id => (id, "x" * 25, "en", "s", 25L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val sampled = MultiModal
      .decodeVideoFrames(MultiModal.videoTable(vids), everyK = 2)
      .collect().groupBy(_.doc_id)
      .map { case (id, fs) => id -> fs.map(_.frame_idx).sorted.toSeq }
    assert(sampled(2L) == Seq(0, 2))
    assert(sampled(5L) == Seq(0))
    assert(sampled(8L) == Seq(0, 2, 4))
  }

  test("AVI decode rejects truncated movi, frame-count mismatch, and bpp != 24") {
    import graft.ext.VideoCodec
    def enc() = VideoCodec.encodeAvi(2, 2, 40000, 3, (f, p) => (f, p, f + p))
    // round-trips clean before mutation
    assert(VideoCodec.decodeAvi(enc()).nFrames == 3)
    // truncated movi: drop the last frame's bytes
    intercept[IllegalArgumentException] {
      VideoCodec.decodeAvi(enc().dropRight(20))
    }
    // avih declares 4 frames but movi carries 3 (dwTotalFrames is at
    // avih body+16 = byte 48: RIFF 12 + LIST hdr 8 + 'hdrl' 4 + 'avih'+size 8 + 16)
    val mismatch = enc(); mismatch(48) = 4
    val e = intercept[IllegalArgumentException] { VideoCodec.decodeAvi(mismatch) }
    assert(e.getMessage.contains("declares 4 frames"))
    // strf claiming 8 bpp (paletted) must be refused, not misread;
    // locate the strf chunk by tag rather than hand-counting offsets
    val paletted = enc()
    val strf = (0 until paletted.length - 3).find(i =>
      paletted(i) == 's' && paletted(i + 1) == 't' &&
      paletted(i + 2) == 'r' && paletted(i + 3) == 'f').get
    paletted(strf + 8 + 14) = 8
    val e2 = intercept[IllegalArgumentException] { VideoCodec.decodeAvi(paletted) }
    assert(e2.getMessage.contains("bpp=8"))
  }

  test("PPM decode: hand-built known bytes parse to exact pixels") {
    // 2x1 P6 with a comment line: red then blue, maxval 255
    val bytes = ("P6\n# test fixture\n2 1\n255\n").getBytes("US-ASCII") ++
      Array[Byte](255.toByte, 0, 0, 0, 0, 255.toByte)
    val img = graft.ext.ImageCodec.decode(bytes)
    assert(img.format == "ppm" && img.width == 2 && img.height == 1)
    assert((img.r(0), img.g(0), img.b(0)) == ((255, 0, 0)))
    assert((img.r(1), img.g(1), img.b(1)) == ((0, 0, 255)))
  }

  test("BMP decode: hand-built bytes with row padding, BGR order, bottom-up rows") {
    // 2x2, 24bpp: rows are 6 bytes + 2 padding; stored bottom-up, so
    // the FIRST stored row is the BOTTOM logical row. Logical image:
    //   top:    red   green
    //   bottom: blue  white
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val header = "BM".getBytes("US-ASCII") ++ le32(54 + 16) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++ le32(0) ++ le32(16) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    assert(header.length == 54)
    val bottomRow = Array[Byte](255.toByte, 0, 0, /*blue BGR*/
      255.toByte, 255.toByte, 255.toByte, /*white*/ 0, 0 /*pad*/)
    val topRow = Array[Byte](0, 0, 255.toByte, /*red BGR*/
      0, 255.toByte, 0, /*green*/ 0, 0 /*pad*/)
    val img = graft.ext.ImageCodec.decode(header ++ bottomRow ++ topRow)
    assert(img.format == "bmp" && img.width == 2 && img.height == 2)
    assert((img.r(0), img.g(0), img.b(0)) == ((255, 0, 0)))   // top-left red
    assert((img.r(1), img.g(1), img.b(1)) == ((0, 255, 0)))   // top-right green
    assert((img.r(2), img.g(2), img.b(2)) == ((0, 0, 255)))   // bottom-left blue
    assert((img.r(3), img.g(3), img.b(3)) == ((255, 255, 255))) // bottom-right white
  }

  test("encode→decode is the identity on pixels for both formats, including padded widths") {
    for (w <- Seq(1, 2, 3, 5); h <- Seq(1, 2, 4)) {
      def px(p: Int) = ((p * 37 + 11) % 256, (p * 53 + 7) % 256, (p * 71 + 3) % 256)
      for ((enc, fmt) <- Seq(
          (graft.ext.ImageCodec.encodeBmp(w, h, px _), "bmp"),
          (graft.ext.ImageCodec.encodePpm(w, h, px _), "ppm"))) {
        val img = graft.ext.ImageCodec.decode(enc)
        assert(img.format == fmt && img.width == w && img.height == h)
        (0 until w * h).foreach { p =>
          assert((img.r(p), img.g(p), img.b(p)) == px(p),
            s"$fmt ${w}x$h pixel $p")
        }
      }
    }
  }

  test("decoder rejects unknown magic, wrong bpp, and truncated pixel data") {
    intercept[IllegalArgumentException] {
      graft.ext.ImageCodec.decode(Array[Byte]('X', 'Y', 0, 0))
    }
    // valid PPM header claiming more pixels than present
    intercept[IllegalArgumentException] {
      graft.ext.ImageCodec.decode("P6\n4 4\n255\n".getBytes("US-ASCII") ++
        Array[Byte](1, 2, 3))
    }
    // BMP with bpp=8 (paletted) must be refused, not misread
    val bmp = graft.ext.ImageCodec.encodeBmp(1, 1, _ => (1, 2, 3))
    bmp(28) = 8
    intercept[IllegalArgumentException] { graft.ext.ImageCodec.decode(bmp) }
  }

  test("decodedFeatures reports parser-read geometry and exact channel sums") {
    val out = MultiModal.decodedFeatures(docs()).collect()
    // only doc 0 is image-typed (doc_id % 3 == 0) and 0 % 6 == 0 → bmp
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("format") == "bmp")
    assert(r.getAs[Int]("width") == 2 && r.getAs[Int]("height") == 2)
    // doc 0: pixelOf(0)(p) = ((7p)%256, (11p)%256, (5p)%256), p=0..3
    val sumR = (0 until 4).map(p => (7 * p) % 256).sum
    val sumG = (0 until 4).map(p => (11 * p) % 256).sum
    val sumB = (0 until 4).map(p => (5 * p) % 256).sum
    assert(r.getAs[Long]("sum_r") == sumR)
    assert(r.getAs[Long]("sum_g") == sumG)
    assert(r.getAs[Long]("sum_b") == sumB)
    assert(r.getAs[Long]("brightness_q") == (sumR + sumG + sumB) / 12)
  }

  test("observe() publishes the six counters through the listener") {
    @volatile var seen: Option[org.apache.spark.sql.Row] = None
    val listener = new Observability.MetricsListener((_, row) => seen = Some(row))
    spark.listenerManager.register(listener)
    try {
      import spark.implicits._
      val env = MatchFixture.envelope(
        Seq((18L, "Customer#18"), (19L, "Customer#19"))
          .toDF("c_custkey", "c_name"))
      Observability.observed(MatchPipeline.decide(env)).collect()
      // listener delivery is async on the listener bus — poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (seen.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(seen.isDefined)
      val m = seen.get
      assert(m.getAs[Long]("total_records") == 2L)
      assert(m.getAs[Long]("emails_triggered") == 1L)
      assert(m.getAs[Long]("skipped_records") == 1L)
    } finally spark.listenerManager.unregister(listener)
  }

  test("sqs envelope body is the reference's nested JSON shape") {
    import spark.implicits._
    val env = MatchFixture.envelope(
      Seq((18L, "Customer#18")).toDF("c_custkey", "c_name"))
    val trig = MatchPipeline.decide(env).filter(col("action") === "email_triggered")
    val row = EmailJobs.sqsEnvelope(trig,
      lit("2024-01-20T00:00:00.000Z"), lit(1705708800000L)).head
    assert(row.getAs[String]("id") == "email_ev18_g18_1705708800000")
    val body = row.getAs[String]("body")
    assert(body.contains(""""type":"photo_match_notification""""))
    assert(body.contains(""""dedupId":"ev18-guest7@hapzea.com""""))
    assert(body.contains(""""guestInfo":{"name":"Customer#18""""))
    assert(body.contains(""""galleryUrl":"https://hapzea.com/gallery/ev18/g18""""))
    assert(row.getAs[Int]("delay_seconds") == 5)
  }

  test("PNG roundtrips all five filters and rejects CRC/truncation/color-type") {
    import graft.ext.PngCodec
    // 6 rows → filter cycle None/Sub/Up/Average/Paeth/None all present
    def pix(p: Int): (Int, Int, Int) = ((p * 7) % 256, (p * 11) % 256, (p * 5) % 256)
    val bytes = PngCodec.encode(5, 6, pix)
    val img = PngCodec.decode(bytes)
    assert(img.format == "png" && img.width == 5 && img.height == 6)
    (0 until 30).foreach { p =>
      assert((img.r(p), img.g(p), img.b(p)) == pix(p), s"pixel $p")
    }
    // flip one IDAT payload byte → the chunk CRC must catch it
    val corrupt = bytes.clone()
    val idat = (0 until corrupt.length - 3).find(i =>
      corrupt(i) == 'I' && corrupt(i + 1) == 'D' &&
      corrupt(i + 2) == 'A' && corrupt(i + 3) == 'T').get
    corrupt(idat + 4) = (corrupt(idat + 4) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException] { PngCodec.decode(corrupt) }
    assert(e.getMessage.contains("CRC"))
    // truncation mid-chunk is a parse error, not a short image
    intercept[IllegalArgumentException] { PngCodec.decode(bytes.dropRight(16)) }
    // color type 6 (RGBA) must be refused, not misread as RGB
    val rgba = bytes.clone()
    rgba(8 + 8 + 9) = 6 // IHDR data byte 9 = color type
    val crc = new java.util.zip.CRC32()
    crc.update(rgba, 8 + 4, 4 + 13) // re-seal IHDR so only the type differs
    val cv = crc.getValue
    var i = 0
    while (i < 4) { rgba(8 + 8 + 13 + i) = ((cv >> (24 - 8 * i)) & 0xff).toByte; i += 1 }
    val e2 = intercept[IllegalArgumentException] { PngCodec.decode(rgba) }
    assert(e2.getMessage.contains("truecolor"))

    // decompression bomb: a crafted IHDR with w = 2^30 would overflow
    // `w * 3` in Int and allocate multi-GB buffers — the geometry cap
    // must refuse it cleanly BEFORE any allocation
    val bomb = bytes.clone()
    bomb(8 + 8) = 0x40.toByte // width bytes 0..3 → 0x40000000
    bomb(8 + 8 + 1) = 0; bomb(8 + 8 + 2) = 0; bomb(8 + 8 + 3) = 0
    val crc3 = new java.util.zip.CRC32()
    crc3.update(bomb, 8 + 4, 4 + 13)
    val cv3 = crc3.getValue
    var j = 0
    while (j < 4) { bomb(8 + 8 + 13 + j) = ((cv3 >> (24 - 8 * j)) & 0xff).toByte; j += 1 }
    val e3 = intercept[IllegalArgumentException] { PngCodec.decode(bomb) }
    assert(e3.getMessage.contains("decode cap"))
  }
}
