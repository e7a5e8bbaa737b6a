package graft

import graft.ext.{AudioCodec, MultiModal}

/** The pure-JVM RIFF/WAVE codec behind `mm_audio`: encode→decode
  * identity, chunk-walk robustness (vendor chunks, odd-size pad
  * bytes), and hard rejection of anything it cannot parse honestly. */
class AudioCodecSpec extends SparkSpec {

  private val samples: Array[Short] =
    Array(0, 100, -100, 32767, -32768, 7, -7, 0).map(_.toShort)

  test("encode-decode is the identity on rate and samples") {
    val w = AudioCodec.decodeWav(AudioCodec.encodeWav(16000, samples))
    assert(w.sampleRate == 16000 && w.channels == 1)
    assert(w.samples.toSeq == samples.toSeq)
  }

  test("decoder walks past an odd-sized vendor chunk with its pad byte") {
    val bytes = AudioCodec.encodeWav(8000, samples, withJunkChunk = true)
    val w = AudioCodec.decodeWav(bytes)
    assert(w.sampleRate == 8000 && w.samples.toSeq == samples.toSeq)
    // the junk chunk is really in there (tag appears before data)
    val s = new String(bytes, "ISO-8859-1")
    assert(s.indexOf("JUNK") >= 0 && s.indexOf("JUNK") < s.indexOf("data"))
  }

  test("non-WAV payloads are rejected, never guessed") {
    intercept[IllegalArgumentException](AudioCodec.decodeWav(Array[Byte]()))
    intercept[IllegalArgumentException](
      AudioCodec.decodeWav("RIFFxxxxJUNK".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](
      AudioCodec.decodeWav(ext.ImageCodec.encodePpm(2, 2, _ => (1, 2, 3))))
    // a truncated file whose data chunk overruns the buffer
    val good = AudioCodec.encodeWav(8000, samples)
    intercept[IllegalArgumentException](
      AudioCodec.decodeWav(good.dropRight(4)))
  }

  test("decoded statistics equal a direct recomputation from the sample formula") {
    import spark.implicits._
    val ids = Seq(1L, 4L, 7L, 10L, 13L)   // doc_id % 3 == 1, mix of junk/no-junk
    val docs = ids.map(id => (id, "t", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = MultiModal.decodedAudio(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got.keySet == ids.toSet)
    ids.foreach { id =>
      val (n, rate) = (id % 50 + 20, 8000 + (id % 4) * 4000)
      val s = (0 until n.toInt).map(i => ((id * 37 + i * 13L) % 65536) - 32768)
      val r = got(id)
      assert(r.getAs[Long]("sample_rate") == rate)
      assert(r.getAs[Long]("n_samples") == n)
      assert(r.getAs[Long]("duration_us") == n * 1000000L / rate)
      assert(r.getAs[Long]("peak_abs") == s.map(math.abs).max)
      assert(r.getAs[Long]("sum_abs") == s.map(math.abs).sum)
      assert(r.getAs[Long]("energy") == s.map(v => v * v).sum)
      assert(r.getAs[Long]("zero_crossings") ==
        s.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)))
    }
  }

  test("µ-law: every code except negative zero is a fixed point of compress∘expand") {
    (0 to 255).foreach { u =>
      val s = AudioCodec.mulawExpand(u)
      assert(s >= -32124 && s <= 32124)
      if (u != 0x7f) // 0x7f (negative zero) decodes to 0 → re-encodes 0xff
        assert(AudioCodec.mulawCompress(s) == u, f"code 0x$u%02x")
    }
    // known vectors: digital silence and the extremes
    assert(AudioCodec.mulawCompress(0) == 0xff)
    assert(AudioCodec.mulawExpand(0xff) == 0)
    assert(AudioCodec.mulawExpand(0x80) == 32124)  // max positive
    assert(AudioCodec.mulawExpand(0x00) == -32124) // max negative
    assert(AudioCodec.mulawCompress(32767) == 0x80) // clips to top segment
    assert(AudioCodec.mulawCompress(-32768) == 0x00)
  }

  test("µ-law WAV roundtrip equals per-sample expand(compress(s)), with fact+JUNK chunks") {
    val samples = Array.tabulate(45)(i => (((i * 977 + 13) % 65536) - 32768).toShort)
    for (junk <- Seq(false, true)) {
      val w = AudioCodec.decodeWav(
        AudioCodec.encodeWavMulaw(8000, samples, withJunkChunk = junk))
      assert(w.sampleRate == 8000 && w.channels == 1)
      assert(w.samples.length == samples.length)
      samples.indices.foreach { i =>
        val expected = AudioCodec.mulawExpand(AudioCodec.mulawCompress(samples(i).toInt))
        assert(w.samples(i) == expected, s"junk=$junk i=$i")
      }
    }
    // quantization error bound: within a segment the step is 8·2^exp,
    // so |decoded − s| < max step (~2048 at the top segment) but tight
    // at small amplitudes (≤ 4 below |s| ≈ 124)
    (-120 to 120).foreach { s =>
      val d = AudioCodec.mulawExpand(AudioCodec.mulawCompress(s))
      assert(math.abs(d - s) <= 4, s"s=$s d=$d")
    }
  }
}
