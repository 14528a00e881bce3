package graft.operators

/** Real, dependency-free media codecs for the multimodal tier: 24-bit
  * uncompressed BMP (images) and 16-bit PCM WAV (audio) are pure
  * header+payload formats, so they can be generated AND decoded with
  * nothing but the JVM — which turns the multimodal pipeline from "stub
  * codec behind real plumbing" into a real decode path. Compressed formats
  * (JPEG/MP3/H.264) genuinely require third-party codec libraries and stay
  * behind the documented stub fallback.
  *
  * All byte layouts are little-endian per the BMP/RIFF specifications.
  */
object MediaCodecs {

  // ---- little-endian helpers ----
  private def le4(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le2(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def readLe4(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def readLe2(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  // =================== BMP (24-bit, uncompressed) ===================

  /** Deterministic synthetic image: gradient + seed phase, encoded as a
    * spec-conforming 24-bit BMP (54-byte header, bottom-up rows, BGR,
    * 4-byte row padding). */
  def synthBmp(width: Int, height: Int, seed: Long): Array[Byte] = {
    val rowSize = (width * 3 + 3) / 4 * 4
    val dataSize = rowSize * height
    val out = new Array[Byte](54 + dataSize)
    // file header
    out(0) = 'B'; out(1) = 'M'
    System.arraycopy(le4(54 + dataSize), 0, out, 2, 4)
    System.arraycopy(le4(54), 0, out, 10, 4)
    // info header (BITMAPINFOHEADER)
    System.arraycopy(le4(40), 0, out, 14, 4)
    System.arraycopy(le4(width), 0, out, 18, 4)
    System.arraycopy(le4(height), 0, out, 22, 4)
    System.arraycopy(le2(1), 0, out, 26, 2)
    System.arraycopy(le2(24), 0, out, 28, 2)
    System.arraycopy(le4(dataSize), 0, out, 34, 4)
    val s = (seed & 0xff).toInt
    var y = 0
    while (y < height) {
      val rowOff = 54 + (height - 1 - y) * rowSize // bottom-up
      var x = 0
      while (x < width) {
        val o = rowOff + x * 3
        out(o) = (((x + y + s) % 256) & 0xff).toByte       // B
        out(o + 1) = (((y * 5 + s) % 256) & 0xff).toByte   // G
        out(o + 2) = (((x * 7 + s) % 256) & 0xff).toByte   // R
        x += 1
      }
      y += 1
    }
    out
  }

  final case class BmpImage(width: Int, height: Int, pixels: Array[Byte]) {
    /** pixels are row-major top-down RGB triples. */
    def rgb(x: Int, y: Int): (Int, Int, Int) = {
      val o = (y * width + x) * 3
      ((pixels(o) & 0xff), (pixels(o + 1) & 0xff), (pixels(o + 2) & 0xff))
    }
  }

  /** Real BMP parse: validates magic/bit-depth/compression AND that the
    * header's claimed geometry fits the payload (a truncated or lying
    * header raises IllegalArgumentException instead of crashing a task
    * mid-row). Handles both row orders: positive height = bottom-up per
    * the common case, negative = top-down per the spec. */
  def decodeBmp(payload: Array[Byte]): BmpImage = {
    require(payload.length >= 54 && payload(0) == 'B' && payload(1) == 'M',
      "not a BMP payload")
    val dataOffset = readLe4(payload, 10)
    val width = readLe4(payload, 18)
    val rawHeight = readLe4(payload, 22)
    val bitCount = readLe2(payload, 28)
    val compression = readLe4(payload, 30)
    require(bitCount == 24 && compression == 0,
      s"only 24-bit uncompressed BMP supported, got bitCount=$bitCount compression=$compression")
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    require(width > 0 && height > 0 && width <= (1 << 20) && height <= (1 << 20),
      s"invalid BMP dimensions ${width}x$rawHeight")
    val rowSize = (width * 3 + 3) / 4 * 4
    require(dataOffset >= 54 &&
      dataOffset.toLong + rowSize.toLong * height <= payload.length,
      s"BMP payload truncated: header claims ${rowSize.toLong * height} pixel bytes at offset $dataOffset, have ${payload.length}")
    val px = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = dataOffset + (if (topDown) y else height - 1 - y) * rowSize
      var x = 0
      while (x < width) {
        val s = srcRow + x * 3
        val d = (y * width + x) * 3
        px(d) = payload(s + 2)     // R
        px(d + 1) = payload(s + 1) // G
        px(d + 2) = payload(s)     // B
        x += 1
      }
      y += 1
    }
    BmpImage(width, height, px)
  }

  /** Image feature vector (16 floats): mean R/G/B in [0,1], width, height,
    * 11-bin normalized luminance histogram (Rec.601 luma). */
  def bmpFeatures(payload: Array[Byte]): Array[Float] = {
    val img = decodeBmp(payload)
    val out = new Array[Float](16)
    val n = img.width * img.height
    var sr = 0L; var sg = 0L; var sb = 0L
    val hist = new Array[Float](11)
    var i = 0
    while (i < n) {
      val r = img.pixels(i * 3) & 0xff
      val g = img.pixels(i * 3 + 1) & 0xff
      val b = img.pixels(i * 3 + 2) & 0xff
      sr += r; sg += g; sb += b
      val luma = (0.299 * r + 0.587 * g + 0.114 * b).toInt
      hist(math.min(10, luma * 11 / 256)) += 1f
      i += 1
    }
    out(0) = sr.toFloat / n / 255f
    out(1) = sg.toFloat / n / 255f
    out(2) = sb.toFloat / n / 255f
    out(3) = img.width.toFloat
    out(4) = img.height.toFloat
    var h = 0
    while (h < 11) { out(5 + h) = hist(h) / n; h += 1 }
    out
  }

  /** Real nearest-neighbor resample: decodes, samples source pixels at the
    * scaled coordinates, re-encodes a valid BMP of the target dimensions. */
  def resizeBmp(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val img = decodeBmp(payload)
    val rowSize = (targetW * 3 + 3) / 4 * 4
    val dataSize = rowSize * targetH
    val out = new Array[Byte](54 + dataSize)
    System.arraycopy(synthBmp(1, 1, 0), 0, out, 0, 54) // header template
    System.arraycopy(le4(54 + dataSize), 0, out, 2, 4)
    System.arraycopy(le4(targetW), 0, out, 18, 4)
    System.arraycopy(le4(targetH), 0, out, 22, 4)
    System.arraycopy(le4(dataSize), 0, out, 34, 4)
    var y = 0
    while (y < targetH) {
      val sy = math.min(img.height - 1, y * img.height / targetH)
      val rowOff = 54 + (targetH - 1 - y) * rowSize
      var x = 0
      while (x < targetW) {
        val sx = math.min(img.width - 1, x * img.width / targetW)
        val (r, g, b) = img.rgb(sx, sy)
        val o = rowOff + x * 3
        out(o) = b.toByte; out(o + 1) = g.toByte; out(o + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  // =================== WAV (16-bit PCM mono) ===================

  /** Deterministic synthetic audio: a seed-pitched sine at half amplitude,
    * encoded as a spec-conforming RIFF/WAVE file (PCM, mono, 16-bit LE). */
  def synthWav(nSamples: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    val dataSize = nSamples * 2
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    System.arraycopy(le4(36 + dataSize), 0, out, 4, 4)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    System.arraycopy(le4(16), 0, out, 16, 4)
    System.arraycopy(le2(1), 0, out, 20, 2)  // PCM
    System.arraycopy(le2(1), 0, out, 22, 2)  // mono
    System.arraycopy(le4(sampleRate), 0, out, 24, 4)
    System.arraycopy(le4(sampleRate * 2), 0, out, 28, 4)
    System.arraycopy(le2(2), 0, out, 32, 2)
    System.arraycopy(le2(16), 0, out, 34, 2)
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    System.arraycopy(le4(dataSize), 0, out, 40, 4)
    val freq = 220.0 + (seed % 220).toDouble
    var i = 0
    while (i < nSamples) {
      val v = (0.5 * 32767.0 *
        math.sin(2.0 * math.Pi * freq * i / sampleRate)).toInt
      System.arraycopy(le2(v & 0xffff), 0, out, 44 + i * 2, 2)
      i += 1
    }
    out
  }

  final case class WavAudio(sampleRate: Int, samples: Array[Short])

  /** Real RIFF/WAVE parse: walks the chunk list, validates PCM/16-bit,
    * decodes the little-endian sample stream. Chunk sizes are validated
    * against the remaining payload — a corrupt size field raises
    * IllegalArgumentException rather than spinning the walk forever or
    * reading past the buffer (this runs distributed over untrusted bytes). */
  def decodeWav(payload: Array[Byte]): WavAudio = {
    require(payload.length >= 44 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F' &&
      payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E',
      "not a RIFF/WAVE payload")
    var off = 12
    var sampleRate = 0
    var samples: Array[Short] = null
    while (off + 8 <= payload.length) {
      val id = new String(payload.slice(off, off + 4), "US-ASCII")
      val size = readLe4(payload, off + 4)
      require(size >= 0 && off + 8 + size.toLong <= payload.length,
        s"corrupt RIFF chunk '$id' at offset $off: size $size exceeds payload ${payload.length}")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small: $size")
          val fmt = readLe2(payload, off + 8)
          val bits = readLe2(payload, off + 22)
          require(fmt == 1 && bits == 16, s"only PCM-16 supported, got fmt=$fmt bits=$bits")
          sampleRate = readLe4(payload, off + 12)
        case "data" =>
          val n = size / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) = readLe2(payload, off + 8 + i * 2).toShort
            i += 1
          }
        case _ => () // skip unknown chunks per spec
      }
      off += 8 + size + (size & 1)
    }
    require(samples != null && sampleRate > 0, "missing fmt/data chunk")
    WavAudio(sampleRate, samples)
  }

  /** Audio feature vector (16 floats): RMS energy in [0,1], zero-crossing
    * rate, sample rate (kHz), duration (s), 12-bin normalized |amplitude|
    * histogram. */
  def wavFeatures(payload: Array[Byte]): Array[Float] = {
    val audio = decodeWav(payload)
    val out = new Array[Float](16)
    val n = audio.samples.length
    var sumSq = 0.0
    var crossings = 0
    val hist = new Array[Float](12)
    var i = 0
    while (i < n) {
      val s = audio.samples(i).toDouble / 32768.0
      sumSq += s * s
      if (i > 0 && (audio.samples(i) >= 0) != (audio.samples(i - 1) >= 0)) crossings += 1
      hist(math.min(11, (math.abs(s) * 12).toInt)) += 1f
      i += 1
    }
    out(0) = math.sqrt(sumSq / math.max(1, n)).toFloat
    out(1) = if (n > 1) crossings.toFloat / (n - 1) else 0f
    out(2) = audio.sampleRate / 1000f
    out(3) = n.toFloat / audio.sampleRate
    var h = 0
    while (h < 12) { out(4 + h) = hist(h) / math.max(1, n); h += 1 }
    out
  }
}
