package graft

import graft.functions.PngCodec
import graft.operators.MultimodalQueries.MediaKernels

class MultimodalSpec extends GraftSuite {

  private def formula(id: Long)(x: Int, y: Int): Int =
    ((x * 31 + y * 17 + id) % 256).toInt

  test("png codec round-trips pixels through every filter type") {
    // heights ≥ 5 force the encoder through all five per-row filters
    for ((w, h) <- Seq((1, 1), (1, 7), (64, 5), (13, 29), (64, 64))) {
      val png = PngCodec.encodeGray(w, h, formula(w * 1000L + h))
      val (dw, dh, px) = PngCodec.decodeGray(png)
      assert(dw == w && dh == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((px(y * w + x) & 0xff) == formula(w * 1000L + h)(x, y),
          s"pixel ($x,$y) of ${w}x$h")
    }
  }

  test("jdk ImageIO decodes our PNGs pixel-exactly (independent decoder)") {
    // rules out symmetric encode/decode bugs: the JDK's own PNG reader
    // must agree with PngCodec.decodeGray on PngCodec.encodeGray output
    val (w, h) = (37, 23)
    val png = PngCodec.encodeGray(w, h, formula(5L))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    assert(img != null, "ImageIO rejected the PNG")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(img.getRaster.getSample(x, y, 0) == formula(5L)(x, y),
        s"ImageIO pixel ($x,$y)")
  }

  test("our decoder reads jdk ImageIO-written PNGs (independent encoder)") {
    val (w, h) = (29, 31)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, formula(9L)(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val (dw, dh, px) = PngCodec.decodeGray(bos.toByteArray)
    assert(dw == w && dh == h)
    for (y <- 0 until h; x <- 0 until w)
      assert((px(y * w + x) & 0xff) == formula(9L)(x, y),
        s"decoded pixel ($x,$y)")
  }

  test("header sniffing still parses dims from real codec output") {
    val png = PngCodec.encodeGray(48, 12, formula(1L))
    assert(MediaKernels.parsePngDims(png).contains((48, 12)))
    assert(MediaKernels.parsePngDims("not a png".getBytes).isEmpty)
  }

  test("wav codec round-trips samples and jdk AudioSystem agrees") {
    import graft.functions.WavCodec
    val samples = Array.tabulate(1000)(i =>
      (((i * 37 + 55) % 65536) - 32768).toShort)
    val wav = WavCodec.encodePcm16(16000, samples)
    val (rate, back) = WavCodec.decodePcm16(wav)
    assert(rate == 16000)
    assert(back.sameElements(samples))
    // the JDK's independent RIFF parser must agree on format + frames
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(ais.getFormat.getSampleRate == 16000f)
    assert(ais.getFormat.getChannels == 1)
    assert(ais.getFormat.getSampleSizeInBits == 16)
    assert(ais.getFrameLength == samples.length)
    // and byte-for-byte on the PCM payload
    val pcm = ais.readAllBytes()
    assert(pcm.length == samples.length * 2)
    for (i <- samples.indices) {
      val v = ((pcm(2 * i) & 0xff) | ((pcm(2 * i + 1) & 0xff) << 8)).toShort
      assert(v == samples(i), s"sample $i")
    }
  }

  test("wav decoder rejects non-PCM and malformed input") {
    import graft.functions.WavCodec
    intercept[IllegalArgumentException](
      WavCodec.decodePcm16("nope not a riff file".getBytes))
    val ok = WavCodec.encodePcm16(8000, Array[Short](1, 2, 3))
    // corrupt the audio-format field (PCM=1 → 2)
    val bad = ok.clone(); bad(20) = 2
    intercept[IllegalArgumentException](WavCodec.decodePcm16(bad))
  }

  test("y4m codec round-trips mono video frames") {
    import graft.functions.Y4mCodec
    def px(x: Int, y: Int, f: Int): Int = (x * 7 + y * 13 + f * 29 + 3) % 256
    val y4m = Y4mCodec.encodeMono(17, 9, 5, 30, 1, px)
    val v = Y4mCodec.decodeMono(y4m)
    assert(v.w == 17 && v.h == 9 && v.fpsNum == 30 && v.fpsDen == 1)
    assert(v.frames.length == 5)
    for (f <- 0 until 5; y <- 0 until 9; x <- 0 until 17)
      assert((v.frames(f)(y * 17 + x) & 0xff) == px(x, y, f),
        s"frame $f pixel ($x,$y)")
    // parser skips unknown header params (spec-required tolerance)
    val hdr = "YUV4MPEG2 W2 H1 F25:1 Ip A1:1 Cmono XSOMETHING\nFRAME\nab"
    val v2 = Y4mCodec.decodeMono(hdr.getBytes("US-ASCII"))
    assert(v2.w == 2 && v2.frames.length == 1)
    assert(new String(v2.frames(0), "US-ASCII") == "ab")
    intercept[IllegalArgumentException](
      Y4mCodec.decodeMono("MPEG nope\n".getBytes))
  }

  test("average-hash is brightness-invariant but bytes are not") {
    import graft.functions.PngCodec
    // same content (gid), three global brightness offsets: the PNG bytes
    // must all differ (exact dedup sees 3 files), the aHash must not —
    // a uniform shift moves every pixel AND the mean by the same amount
    def png(noise: Int) = PngCodec.encodeGray(32, 24,
      (x, y) => ((x * 31 + y * 17 + 7 * 7) % 250) + noise)
    def ahash(bytes: Array[Byte]): (Long, Long) = {
      val (dw, dh, px) = PngCodec.decodeGray(bytes)
      val thumb = Array.tabulate(64) { k =>
        px(((k / 8) * dh / 8) * dw + ((k % 8) * dw / 8)) & 0xff
      }
      val total = thumb.foldLeft(0L)(_ + _)
      (0 until 64).foldLeft((0L, 0L)) { case ((hi, lo), k) =>
        if (thumb(k).toLong * 64 > total)
          if (k < 32) (hi, lo | (1L << k)) else (hi | (1L << (k - 32)), lo)
        else (hi, lo)
      }
    }
    val variants = Seq(png(0), png(1), png(2))
    assert(variants.map(_.toSeq).distinct.size == 3,
      "brightness variants must differ at the byte level")
    assert(variants.map(ahash).distinct.size == 1,
      "aHash must collapse brightness variants")
    // and a different content id must produce a different hash
    val other = PngCodec.encodeGray(32, 24,
      (x, y) => ((x * 31 + y * 17 + 11 * 7) % 250))
    assert(ahash(other) != ahash(variants.head),
      "distinct content collided — formula too coarse for the test")
  }

  test("decoder rejects corrupt input loudly") {
    intercept[IllegalArgumentException](
      PngCodec.decodeGray("JFIF not png at all".getBytes))
    val png = PngCodec.encodeGray(8, 8, formula(2L))
    val truncated = png.take(png.length - 20)
    intercept[Exception](PngCodec.decodeGray(truncated))
    // a chunk length with the sign bit set must fail, not loop forever
    val negLen = png.clone()
    negLen(8) = 0xff.toByte // IHDR length high byte → negative Int
    intercept[IllegalArgumentException](PngCodec.decodeGray(negLen))
    // same for WAV: a negative ancillary-chunk length would stall the walk
    import graft.functions.WavCodec
    val wav = WavCodec.encodePcm16(8000, Array[Short](1, 2, 3))
    val negWav = wav.clone()
    negWav(4 + 3) = 0xff.toByte // RIFF size field untouched; corrupt fmt len
    negWav(16) = 0xf0.toByte; negWav(19) = 0xff.toByte
    intercept[IllegalArgumentException](WavCodec.decodePcm16(negWav))
  }

  test("jpeg codec: dims exact, gradient error bounded, header real") {
    import graft.functions.JpegCodec
    // the query's smooth-gradient class: error must stay within the
    // bound x_media_jpeg_decode bakes into roundtrip_ok (12), with
    // margin — pin it at half that so codec drift surfaces here first
    var worst = 0
    for (id <- Seq(0L, 7L, 31L); (w, h) <- Seq((16, 16), (63, 17), (48, 63))) {
      val base = (id % 32).toInt
      def f(x: Int, y: Int): Int =
        (x * 160) / (w + h) + (y * 160) / (w + h) + base
      val jpeg = JpegCodec.encodeGray(w, h, f)
      assert(JpegCodec.isJpeg(jpeg), "encoder must emit a real JPEG stream")
      assert(!JpegCodec.isJpeg(PngCodec.encodeGray(4, 4, (_, _) => 0)))
      val (dw, dh, px) = JpegCodec.decodeGray(jpeg)
      assert((dw, dh) == (w, h), "lossy or not, dimensions are exact")
      for (y <- 0 until h; x <- 0 until w)
        worst = math.max(worst,
          math.abs((px(y * w + x) & 0xff) - f(x, y)))
    }
    assert(worst <= 6, s"smooth-gradient max error crept up to $worst " +
      "(query bound is 12) — JPEG plugin behavior changed")
    // compression must actually engage on a large smooth image
    val big = JpegCodec.encodeGray(256, 256,
      (x, y) => (x * 160) / 512 + (y * 160) / 512)
    assert(big.length < 256 * 256 / 4,
      s"a smooth 64k-pixel gradient must compress well, got ${big.length}")
    // corrupt input fails loudly, like the other codecs
    intercept[Exception](JpegCodec.decodeGray("not a jpeg".getBytes))
  }

  test("audio vad segments match the analytic gate pattern") {
    // the synth gates frame f quiet iff (f + id) % 4 == 0, so the active
    // pattern — and therefore the island structure — is known in closed
    // form; derive it per doc and require the query to reproduce it
    val rows = operators.MultimodalQueries.audioVad.run(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (id, nf) = (r.getLong(0), r.getInt(1))
      val active = (0 until nf).map(f => (f + id) % 4 != 0)
      val runs = active.foldLeft(List.empty[Int]) {
        case (acc, true) if acc.nonEmpty && acc.head > 0 =>
          (acc.head + 1) :: acc.tail
        case (acc, true) => 1 :: acc
        case (acc, false) => 0 :: acc
      }.filter(_ > 0)
      assert(r.getInt(2) == active.count(identity), s"n_active for doc $id")
      assert(r.getInt(3) == runs.size, s"n_segments for doc $id")
      assert(r.getInt(4) == (if (runs.isEmpty) 0 else runs.max),
        s"max_segment_frames for doc $id")
    }
  }

  test("banded hamming join finds every planted spiked-variant pair") {
    val rows = operators.MultimodalQueries.phashHammingJoin.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 <= 3), "exact popcount filter must hold")
    assert(rows.forall(p => p._1 < p._2), "ordered pairs only")
    val found = rows.map(p => (p._1, p._2)).toSet
    // completeness vs brute force: the pigeonhole banding must find every
    // pair within radius 3 — recompute hashes serially and cross-check
    def hash(id: Long): (Long, Long) = {
      val gid = id % 40
      val v = ((id / 40) % 5).toInt
      val c = if (v == 0) -1 else 7 + (v - 1) * 13
      val thumb = Array.tabulate(64) { k =>
        val x = (k % 8) * 4
        val y = (k / 8) * 3
        val base = ((x * 31 + y * 17 + gid * 7) % 250).toInt
        val spike = if (c == k) 90 else 0
        math.min(base + spike, 255)
      }
      val total = thumb.foldLeft(0L)(_ + _)
      var hi = 0L; var lo = 0L
      for (k <- 0 until 64 if thumb(k).toLong * 64 > total)
        if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
      (hi, lo)
    }
    val hs = (0L until 200L).map(id => id -> hash(id)).toMap
    for (a <- 0L until 200L; b <- (a + 1) until 200L) {
      val d = java.lang.Long.bitCount(hs(a)._1 ^ hs(b)._1) +
        java.lang.Long.bitCount(hs(a)._2 ^ hs(b)._2)
      assert(found.contains((a, b)) == (d <= 3),
        s"pair ($a,$b) dist $d: banding must be exact at radius 3")
    }
  }
}
