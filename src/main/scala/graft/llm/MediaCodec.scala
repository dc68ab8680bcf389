package graft.llm

import java.io.ByteArrayInputStream

/** Real JDK-only media codecs for the multimodal pipeline — no stub, no
  * external dependency:
  *
  *   - images are genuine 24-bit uncompressed BMP payloads, DECODED with
  *     `javax.imageio.ImageIO` (the encode below is a plain byte packer;
  *     the decode path is the real OS-independent JDK image stack);
  *   - audio is genuine 16-bit PCM mono WAV, decoded with
  *     `javax.sound.sampled.AudioSystem`;
  *   - video stays an opaque container payload (the JDK ships no
  *     container demuxer; that boundary is documented, not faked).
  *
  * The synthetic CONTENT is deterministic integer arithmetic over
  * (doc_id, text) — see [[pixel]] / [[sampleU16]] — so the DuckDB oracle
  * can rebuild the exact payload bytes in SQL (BMP and WAV are
  * header + raw little-endian fields: hex-string construction + `unhex`)
  * and verify both the sha256 of every payload and the pixel/sample
  * statistics the real decode produces. Corrupted payloads must never
  * fail a 100 TB job: decode returns None and the operator emits a
  * `decode_ok = 0` row instead of throwing.
  */
object MediaCodec {

  // ---- deterministic content contract (shared with the SQL oracle) ----

  /** Image dims: small on purpose (payloads are per-row values; the
    * format is real, the resolution is test-sized). Moduli divide the
    * dedup corpus's +100000 id offset so exact duplicates keep
    * identical payloads. */
  def imageDims(docId: Long): (Int, Int) =
    (16 + (docId % 8).toInt * 2, 12 + (docId % 8).toInt)

  /** Pixel at image coordinates (x, y), y = 0 at the TOP. The blue
    * channel carries the document text (byte at position (y·w+x) mod
    * len), so payload equality ⟺ (dims, text) equality. An EMPTY text
    * paints blue 0 — one bad record must never fail the job, so the
    * mod-by-length cannot be allowed to throw on len = 0 (the oracle's
    * SQL reconstruction guards identically: `% greatest(len, 1)` with
    * DuckDB's `ascii('') = 0`). */
  def pixel(x: Int, y: Int, w: Int, text: String): (Int, Int, Int) = {
    val len = text.length
    val r = (x * 7 + y * 13 + len) % 256
    val g = (x * 3 + y * 5 + 2 * len) % 256
    val b = if (len == 0) 0 else text.charAt((y * w + x) % len).toInt % 256
    (r, g, b)
  }

  /** Audio params: sample rate 8/12/16/20 kHz, 256..496 samples. */
  def audioRate(docId: Long): Int = 8000 + ((docId % 16).toInt / 4) * 4000
  def audioSamples(docId: Long): Int = 256 + (docId % 16).toInt * 16

  /** Sample i as the stored UNSIGNED 16-bit value (two's complement of
    * the signed sample); signed value = u − 32768 … shifted Weyl-style
    * integer sequence, overflow-free in Long. */
  def sampleU16(i: Int, textLen: Int): Int =
    (((i.toLong * 2654435761L + textLen.toLong * 1000003L) % 65536L
      + 32768L) % 65536L).toInt

  // ---- encoders (plain byte packers for the standard formats) ----

  private def le(buf: Array[Byte], off: Int, v: Long, n: Int): Unit = {
    var i = 0
    while (i < n) { buf(off + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
  }

  /** 24-bit BI_RGB BMP, bottom-up rows, 4-byte row alignment. */
  def encodeBmp(docId: Long, text: String): Array[Byte] = {
    val (w, h) = imageDims(docId)
    val rowBytes = (3 * w + 3) / 4 * 4
    val pxSize = rowBytes * h
    val buf = new Array[Byte](54 + pxSize)
    buf(0) = 'B'; buf(1) = 'M'
    le(buf, 2, 54L + pxSize, 4) // file size
    le(buf, 10, 54, 4)          // pixel data offset
    le(buf, 14, 40, 4)          // BITMAPINFOHEADER size
    le(buf, 18, w, 4); le(buf, 22, h, 4)
    le(buf, 26, 1, 2); le(buf, 28, 24, 2) // planes, bpp
    le(buf, 34, pxSize, 4)      // image size (compression 0 = BI_RGB)
    var off = 54
    var yy = 0
    while (yy < h) {            // file order is bottom-up: y = h-1-yy
      val y = h - 1 - yy
      var x = 0
      while (x < w) {
        val (r, g, b) = pixel(x, y, w, text)
        buf(off) = b.toByte; buf(off + 1) = g.toByte; buf(off + 2) = r.toByte
        off += 3; x += 1
      }
      off += rowBytes - 3 * w   // zero padding (array is zero-initialized)
      yy += 1
    }
    buf
  }

  /** 16-bit PCM mono RIFF/WAVE. */
  def encodeWav(docId: Long, textLen: Int): Array[Byte] = {
    val rate = audioRate(docId)
    val n = audioSamples(docId)
    val dataSize = 2 * n
    val buf = new Array[Byte](44 + dataSize)
    buf(0) = 'R'; buf(1) = 'I'; buf(2) = 'F'; buf(3) = 'F'
    le(buf, 4, 36L + dataSize, 4)
    buf(8) = 'W'; buf(9) = 'A'; buf(10) = 'V'; buf(11) = 'E'
    buf(12) = 'f'; buf(13) = 'm'; buf(14) = 't'; buf(15) = ' '
    le(buf, 16, 16, 4)          // fmt chunk size
    le(buf, 20, 1, 2)           // PCM
    le(buf, 22, 1, 2)           // mono
    le(buf, 24, rate, 4)
    le(buf, 28, rate.toLong * 2, 4) // byte rate
    le(buf, 32, 2, 2)           // block align
    le(buf, 34, 16, 2)          // bits per sample
    buf(36) = 'd'; buf(37) = 'a'; buf(38) = 't'; buf(39) = 'a'
    le(buf, 40, dataSize, 4)
    var i = 0
    while (i < n) {
      le(buf, 44 + 2 * i, sampleU16(i, textLen), 2)
      i += 1
    }
    buf
  }

  // ---- real decoders ----

  final case class ImageStats(width: Long, height: Long, sumR: Long,
                              sumG: Long, sumB: Long, brightPx: Long)

  /** REAL decode via `javax.imageio.ImageIO` — the pixel statistics come
    * from the decoded `BufferedImage`, not from the generator formulas
    * (the oracle recomputes the formulas; agreement proves the decode).
    * `brightPx` counts pixels with r+g+b ≥ 384 (above mid-grey). */
  def decodeImage(bytes: Array[Byte]): Option[ImageStats] =
    try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb, bright) = (0L, 0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val argb = img.getRGB(x, y)
            val r = (argb >> 16) & 0xff
            val g = (argb >> 8) & 0xff
            val b = argb & 0xff
            sr += r; sg += g; sb += b
            if (r + g + b >= 384) bright += 1
            x += 1
          }
          y += 1
        }
        Some(ImageStats(w, h, sr, sg, sb, bright))
      }
    } catch { case _: Exception => None }

  final case class ResizeStats(targetW: Long, targetH: Long, sumR: Long,
                               sumG: Long, sumB: Long, brightPx: Long)

  /** REAL pixel resize: decode via ImageIO, fit into a maxW×maxH box
    * preserving aspect ratio (the same exact-rational fit as the
    * metadata-only planner: fit width iff maxW·h ≤ maxH·w, integer
    * floor divisions), then CENTER-ALIGNED nearest-neighbor resample —
    * src(x',y') = in(⌊(2x'+1)·w / 2tw⌋, ⌊(2y'+1)·h / 2th⌋), all-integer
    * so the SQL oracle replays the identical index map — and the same
    * channel statistics [[decodeImage]] reports, over the RESAMPLED
    * raster. The output raster re-encodes with [[encodeBmp]]'s packer
    * when a pipeline materializes thumbnails; the statistics contract
    * here is what the oracle can verify cross-engine. */
  def resizeNearest(bytes: Array[Byte], maxW: Int, maxH: Int): Option[ResizeStats] =
    try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        if (w <= 0 || h <= 0) None
        else {
          val fitW = maxW.toLong * h <= maxH.toLong * w
          val tw = if (fitW) maxW else ((w.toLong * maxH) / h).toInt
          val th = if (fitW) ((h.toLong * maxW) / w).toInt else maxH
          var (sr, sg, sb, bright) = (0L, 0L, 0L, 0L)
          var y = 0
          while (y < th) {
            val sy = (((2L * y + 1) * h) / (2L * th)).toInt
            var x = 0
            while (x < tw) {
              val sx = (((2L * x + 1) * w) / (2L * tw)).toInt
              val argb = img.getRGB(sx, sy)
              val r = (argb >> 16) & 0xff
              val g = (argb >> 8) & 0xff
              val b = argb & 0xff
              sr += r; sg += g; sb += b
              if (r + g + b >= 384) bright += 1
              x += 1
            }
            y += 1
          }
          Some(ResizeStats(tw, th, sr, sg, sb, bright))
        }
      }
    } catch { case _: Exception => None }

  final case class DownsampleStats(outRate: Long, outSamples: Long,
                                   sumAbs: Long, peakAbs: Long)

  /** REAL audio downsample by integer DECIMATION: decode via
    * AudioSystem, keep every `factor`-th frame (out(i) = in(i·factor) —
    * the index map the SQL oracle replays; a production pipeline adds
    * an anti-alias filter first, which is float DSP and stays out of
    * the cross-engine contract), and report the decoded statistics of
    * the decimated signal. Output rate = rate / factor (exact integer
    * for the 8/12/16/20 kHz corpus at factor 4 → 2/3/4/5 kHz). */
  def downsample(bytes: Array[Byte], factor: Int): Option[DownsampleStats] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 || factor <= 0)
        None
      else {
        val data = in.readAllBytes()
        in.close()
        var (sum, peak, n) = (0L, 0L, 0L)
        var i = 0
        while (2 * i + 2 <= data.length) {
          val off = 2 * i
          val s =
            if (fmt.isBigEndian)
              ((data(off) << 8) | (data(off + 1) & 0xff)).toShort
            else ((data(off + 1) << 8) | (data(off) & 0xff)).toShort
          val a = math.abs(s.toLong)
          sum += a; if (a > peak) peak = a; n += 1
          i += factor
        }
        Some(DownsampleStats(fmt.getSampleRate.toLong / factor, n, sum, peak))
      }
    } catch { case _: Exception => None }

  /** Perceptual difference hash (dHash — the classic image near-dup
    * fingerprint): decode, sample a 9×8 brightness grid with the same
    * center-aligned integer NN map as [[resizeNearest]], emit one bit
    * per horizontally-adjacent comparison (bit = brighter-than-left-
    * neighbor), row-major, as a 16-hex-char string (2 hex digits per
    * 8-bit row — strings sidestep the 64-bit sign pitfalls a packed
    * BIGINT hash has in engines that trap overflow). Identical images
    * hash identically by construction; small re-encodes/crops move few
    * bits — the property that makes dHash the standard cheap image
    * dedup key. Brightness = r+g+b (integer, no luma weights — exact
    * cross-engine). */
  def dHashHex(bytes: Array[Byte]): Option[String] =
    try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        if (w <= 0 || h <= 0) None
        else {
          val gw = 9; val gh = 8
          val grid = Array.ofDim[Int](gh, gw)
          var y = 0
          while (y < gh) {
            val sy = (((2L * y + 1) * h) / (2L * gh)).toInt
            var x = 0
            while (x < gw) {
              val sx = (((2L * x + 1) * w) / (2L * gw)).toInt
              val argb = img.getRGB(sx, sy)
              grid(y)(x) = ((argb >> 16) & 0xff) + ((argb >> 8) & 0xff) +
                (argb & 0xff)
              x += 1
            }
            y += 1
          }
          val sb = new java.lang.StringBuilder(16)
          y = 0
          while (y < gh) {
            var rowByte = 0
            var x = 0
            while (x < gw - 1) {
              rowByte = (rowByte << 1) |
                (if (grid(y)(x + 1) > grid(y)(x)) 1 else 0)
              x += 1
            }
            sb.append(f"$rowByte%02x")
            y += 1
          }
          Some(sb.toString)
        }
      }
    } catch { case _: Exception => None }

  final case class AudioStats(sampleRate: Long, nSamples: Long,
                              sumAbs: Long, peakAbs: Long)

  /** REAL decode via `javax.sound.sampled.AudioSystem`: the RIFF header
    * is parsed by the JDK (rate, width, endianness all come from the
    * decoded `AudioFormat`), frames stream through the
    * `AudioInputStream`. */
  def decodeWav(bytes: Array[Byte]): Option[AudioStats] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
      else {
        val data = in.readAllBytes()
        in.close()
        var (sum, peak, n) = (0L, 0L, 0L)
        var i = 0
        while (i + 2 <= data.length) {
          val s =
            if (fmt.isBigEndian) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort
            else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort
          val a = math.abs(s.toLong)
          sum += a; if (a > peak) peak = a; n += 1
          i += 2
        }
        Some(AudioStats(fmt.getSampleRate.toLong, n, sum, peak))
      }
    } catch { case _: Exception => None }
}
