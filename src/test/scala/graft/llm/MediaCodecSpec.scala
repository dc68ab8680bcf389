package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Real-codec round trips: the encoders emit genuine BMP/WAV bytes and
  * the JDK decoders (ImageIO / AudioSystem) must invert them exactly —
  * no Spark involved, this pins the codec layer alone. */
class MediaCodecSpec extends AnyFunSuite {

  test("BMP round trip: ImageIO decodes to the exact generated pixels") {
    val text = "hello media"
    for (id <- Seq(0L, 3L, 7L, 100008L)) {
      val bytes = MediaCodec.encodeBmp(id, text)
      assert(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      val (w, h) = MediaCodec.imageDims(id)
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val argb = img.getRGB(x, y)
        val got = ((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)
        assert(got == MediaCodec.pixel(x, y, w, text), s"pixel ($x,$y) id=$id")
      }
    }
  }

  test("BMP stats decode matches a direct formula computation") {
    val text = "abc"
    val stats = MediaCodec.decodeImage(MediaCodec.encodeBmp(0L, text)).get
    val (w, h) = MediaCodec.imageDims(0L)
    val px = for (y <- 0 until h; x <- 0 until w)
      yield MediaCodec.pixel(x, y, w, text)
    assert(stats == MediaCodec.ImageStats(w, h,
      px.map(_._1.toLong).sum, px.map(_._2.toLong).sum,
      px.map(_._3.toLong).sum,
      px.count(p => p._1 + p._2 + p._3 >= 384).toLong))
  }

  test("NN resize matches a hand-built reference over the formula pixels") {
    val text = "resize me please"
    for (id <- Seq(0L, 3L, 4L, 7L, 100008L)) {
      val (w, h) = MediaCodec.imageDims(id)
      val bytes = MediaCodec.encodeBmp(id, text)
      val got = MediaCodec.resizeNearest(bytes, 8, 6).get
      // reference: the same exact-rational fit + center-aligned NN map,
      // applied to the generator formula directly (no codec involved)
      val fitW = 8L * h <= 6L * w
      val tw = if (fitW) 8 else (w * 6) / h
      val th = if (fitW) (h * 8) / w else 6
      val px = for (y <- 0 until th; x <- 0 until tw) yield {
        val sx = (((2L * x + 1) * w) / (2L * tw)).toInt
        val sy = (((2L * y + 1) * h) / (2L * th)).toInt
        MediaCodec.pixel(sx, sy, w, text)
      }
      assert(got === MediaCodec.ResizeStats(tw, th,
        px.map(_._1.toLong).sum, px.map(_._2.toLong).sum,
        px.map(_._3.toLong).sum,
        px.count(p => p._1 + p._2 + p._3 >= 384).toLong), s"id=$id")
      assert(got.targetW <= 8 && got.targetH <= 6)
    }
    // corrupt payload: None, never a throw
    assert(MediaCodec.resizeNearest(Array[Byte](1, 2, 3), 8, 6).isEmpty)
  }

  test("decimation downsample matches a hand reference over the formula") {
    for (id <- Seq(1L, 5L, 13L, 100001L); len <- Seq(0, 7, 120)) {
      val bytes = MediaCodec.encodeWav(id, len)
      val got = MediaCodec.downsample(bytes, 4).get
      val n = MediaCodec.audioSamples(id)
      val kept = (0 until n by 4).map { i =>
        val u = MediaCodec.sampleU16(i, len)
        // signed two's-complement value of the stored u16
        math.abs(if (u < 32768) u.toLong else u.toLong - 65536L)
      }
      assert(got === MediaCodec.DownsampleStats(
        MediaCodec.audioRate(id) / 4L, kept.length.toLong,
        kept.sum, kept.max), s"id=$id len=$len")
    }
    assert(MediaCodec.downsample(Array[Byte](9, 9), 4).isEmpty)
    assert(MediaCodec.downsample(
      MediaCodec.encodeWav(1L, 3), 0).isEmpty) // bad factor: None, no throw
  }

  test("dHash matches a codec-free reference; equal content hashes equal") {
    val text = "perceptual fingerprint corpus text"
    for (id <- Seq(0L, 3L, 4L, 7L)) {
      val (w, h) = MediaCodec.imageDims(id)
      val got = MediaCodec.dHashHex(MediaCodec.encodeBmp(id, text)).get
      assert(got.length === 16 && got.matches("[0-9a-f]{16}"))
      val b = Array.tabulate(8, 9) { (gy, gx) =>
        val sx = (((2L * gx + 1) * w) / 18L).toInt
        val sy = (((2L * gy + 1) * h) / 16L).toInt
        val (r, g, bl) = MediaCodec.pixel(sx, sy, w, text)
        r + g + bl
      }
      val want = (0 until 8).map { gy =>
        val byte = (0 until 8).foldLeft(0) { (acc, x) =>
          (acc << 1) | (if (b(gy)(x + 1) > b(gy)(x)) 1 else 0)
        }
        f"$byte%02x"
      }.mkString
      assert(got === want, s"id=$id")
    }
    // the dedup-offset twin (same dims, same text) hashes identically
    assert(MediaCodec.dHashHex(MediaCodec.encodeBmp(0L, text)) ===
      MediaCodec.dHashHex(MediaCodec.encodeBmp(100000L, text)))
    // different text generally moves the hash (blue channel shifts)
    assert(MediaCodec.dHashHex(MediaCodec.encodeBmp(0L, text)) !==
      MediaCodec.dHashHex(MediaCodec.encodeBmp(0L, "zzz qqq xxx jjj")))
    assert(MediaCodec.dHashHex(Array[Byte](0, 1)).isEmpty)
  }

  test("WAV round trip: AudioSystem recovers rate, count and samples") {
    for (id <- Seq(1L, 5L, 13L, 100001L); len <- Seq(3, 48, 553)) {
      val stats = MediaCodec.decodeWav(MediaCodec.encodeWav(id, len)).get
      val n = MediaCodec.audioSamples(id)
      // stored u16 → signed two's complement
      val signed = (0 until n).map(i => MediaCodec.sampleU16(i, len))
        .map(u => if (u >= 32768) u - 65536 else u)
      assert(stats.sampleRate == MediaCodec.audioRate(id))
      assert(stats.nSamples == n.toLong)
      assert(stats.sumAbs == signed.map(s => math.abs(s.toLong)).sum)
      assert(stats.peakAbs == signed.map(s => math.abs(s.toLong)).max)
    }
  }

  test("exact duplicates under the +100000 dedup offset: identical payloads") {
    val text = "dup me"
    assert(MediaCodec.encodeBmp(8L, text).sameElements(
      MediaCodec.encodeBmp(100008L, text)))
    assert(MediaCodec.encodeWav(5L, text.length).sameElements(
      MediaCodec.encodeWav(100005L, text.length)))
  }

  test("corrupt payloads decode to None, never throw") {
    assert(MediaCodec.decodeImage("not a bmp".getBytes).isEmpty)
    assert(MediaCodec.decodeImage(Array[Byte]()).isEmpty)
    assert(MediaCodec.decodeWav("RIFFgarbage".getBytes).isEmpty)
    assert(MediaCodec.decodeWav(Array[Byte](1, 2, 3)).isEmpty)
    // truncated but well-headed BMP: ImageIO may throw internally — must
    // surface as None
    val trunc = MediaCodec.encodeBmp(0L, "abc").take(60)
    assert(MediaCodec.decodeImage(trunc).isEmpty ||
      MediaCodec.decodeImage(trunc).isDefined) // must not throw either way
  }

  test("fuzz: BMP/WAV round trips over random ids and printable-ASCII text") {
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 25) {
      val id = math.abs(rnd.nextLong() % 1000000L)
      val text = (1 to (1 + rnd.nextInt(80)))
        .map(_ => (32 + rnd.nextInt(95)).toChar).mkString
      val img = MediaCodec.decodeImage(MediaCodec.encodeBmp(id, text)).get
      val (w, h) = MediaCodec.imageDims(id)
      val px = for (y <- 0 until h; x <- 0 until w)
        yield MediaCodec.pixel(x, y, w, text)
      assert(img == MediaCodec.ImageStats(w, h,
        px.map(_._1.toLong).sum, px.map(_._2.toLong).sum,
        px.map(_._3.toLong).sum,
        px.count(p => p._1 + p._2 + p._3 >= 384).toLong),
        s"id=$id text.len=${text.length}")
      val wav = MediaCodec.decodeWav(MediaCodec.encodeWav(id, text.length)).get
      val n = MediaCodec.audioSamples(id)
      val signed = (0 until n).map(i => MediaCodec.sampleU16(i, text.length))
        .map(u => if (u >= 32768) u - 65536 else u)
      assert(wav == MediaCodec.AudioStats(MediaCodec.audioRate(id), n,
        signed.map(s => math.abs(s.toLong)).sum,
        signed.map(s => math.abs(s.toLong)).max), s"id=$id")
    }
  }
}
