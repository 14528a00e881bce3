package graft.operators

/** Real, dependency-free media codecs for the multimodal tier: 24-bit
  * uncompressed BMP (images), 16-bit PCM WAV (audio), and — round 8 —
  * 8-bit RGB/RGBA PNG, whose only "library" need (zlib inflate/deflate)
  * the JDK ships built-in (`java.util.zip`), the XlsxSink precedent.
  * Baseline JPEG (markers, Huffman, DCT) is implemented from arithmetic
  * alone in [[JpegCodec]]. So the real decode surface is BMP + PNG +
  * JPEG + WAV; MP3/H.264 genuinely require third-party codec libraries
  * and stay behind the documented stub fallback.
  *
  * BMP/RIFF byte layouts are little-endian per those specifications; PNG
  * chunk framing is big-endian per RFC 2083, every chunk CRC32-validated.
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

  /** Encode row-major top-down RGB triples as a spec-conforming 24-bit
    * BMP (the [[synthBmp]] layout, arbitrary pixel content). */
  def encodeBmp(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3,
      s"pixel buffer ${rgb.length} != ${width}x$height RGB")
    val rowSize = (width * 3 + 3) / 4 * 4
    val dataSize = rowSize * height
    val out = new Array[Byte](54 + dataSize)
    System.arraycopy(synthBmp(1, 1, 0), 0, out, 0, 54) // header template
    System.arraycopy(le4(54 + dataSize), 0, out, 2, 4)
    System.arraycopy(le4(width), 0, out, 18, 4)
    System.arraycopy(le4(height), 0, out, 22, 4)
    System.arraycopy(le4(dataSize), 0, out, 34, 4)
    var y = 0
    while (y < height) {
      val rowOff = 54 + (height - 1 - y) * rowSize // bottom-up
      var x = 0
      while (x < width) {
        val s = (y * width + x) * 3
        val o = rowOff + x * 3
        out(o) = rgb(s + 2); out(o + 1) = rgb(s + 1); out(o + 2) = rgb(s)
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

  /** Shared image feature kernel over row-major top-down RGB triples —
    * single-sourced so the BMP, PNG and JPEG paths produce BIT-IDENTICAL
    * features for identical pixels (MediaCodecsSpec pins exactly that). */
  private[operators] def rgbFeatureVector(width: Int, height: Int, pixels: Array[Byte]): Array[Float] = {
    val out = new Array[Float](16)
    val n = width * height
    var sr = 0L; var sg = 0L; var sb = 0L
    val hist = new Array[Float](11)
    var i = 0
    while (i < n) {
      val r = pixels(i * 3) & 0xff
      val g = pixels(i * 3 + 1) & 0xff
      val b = pixels(i * 3 + 2) & 0xff
      sr += r; sg += g; sb += b
      val luma = (0.299 * r + 0.587 * g + 0.114 * b).toInt
      hist(math.min(10, luma * 11 / 256)) += 1f
      i += 1
    }
    out(0) = sr.toFloat / n / 255f
    out(1) = sg.toFloat / n / 255f
    out(2) = sb.toFloat / n / 255f
    out(3) = width.toFloat
    out(4) = height.toFloat
    var h = 0
    while (h < 11) { out(5 + h) = hist(h) / n; h += 1 }
    out
  }

  /** Image feature vector (16 floats): mean R/G/B in [0,1], width, height,
    * 11-bin normalized luminance histogram (Rec.601 luma). */
  def bmpFeatures(payload: Array[Byte]): Array[Float] = {
    val img = decodeBmp(payload)
    rgbFeatureVector(img.width, img.height, img.pixels)
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

  // =================== PNG (8-bit RGB / RGBA) ===================

  private def be4(v: Int): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def readBe4(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private val PngSignature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** One framed chunk: length + type + data + CRC32(type ++ data). */
  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32
    crc.update(t); crc.update(data)
    be4(data.length) ++ t ++ data ++ be4(crc.getValue.toInt)
  }

  /** RFC 2083 Paeth predictor: the neighbor (left/above/upper-left)
    * closest to the linear estimate a + b - c, ties broken a, b, c. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode row-major top-down RGB triples as a spec-conforming PNG:
    * 8-bit, color type 2 (RGB) or 6 (RGBA, alpha 255), no interlace, every
    * scanline filtered with `filterType` (0=None 1=Sub 2=Up 3=Average
    * 4=Paeth — exposed so tests can plant each decode path), IDAT
    * deflated with the JDK zlib. */
  def encodePng(width: Int, height: Int, rgb: Array[Byte],
      filterType: Int = 4, withAlpha: Boolean = false): Array[Byte] = {
    require(filterType >= 0 && filterType <= 4, s"bad filter type $filterType")
    require(rgb.length == width * height * 3,
      s"pixel buffer ${rgb.length} != ${width}x$height RGB")
    val bpp = if (withAlpha) 4 else 3
    val stride = width * bpp
    val raw = new Array[Byte]((stride + 1) * height)
    val prev = new Array[Byte](stride) // zero row above the image per spec
    val cur = new Array[Byte](stride)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val s = (y * width + x) * 3
        cur(x * bpp) = rgb(s)
        cur(x * bpp + 1) = rgb(s + 1)
        cur(x * bpp + 2) = rgb(s + 2)
        if (withAlpha) cur(x * bpp + 3) = 0xff.toByte
        x += 1
      }
      val rowOff = y * (stride + 1)
      raw(rowOff) = filterType.toByte
      var i = 0
      while (i < stride) {
        val v = cur(i) & 0xff
        val a = if (i >= bpp) cur(i - bpp) & 0xff else 0
        val b = prev(i) & 0xff
        val c = if (i >= bpp) prev(i - bpp) & 0xff else 0
        val f = filterType match {
          case 0 => v
          case 1 => v - a
          case 2 => v - b
          case 3 => v - ((a + b) >> 1)
          case 4 => v - paeth(a, b, c)
        }
        raw(rowOff + 1 + i) = (f & 0xff).toByte
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zOut = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zOut.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = be4(width) ++ be4(height) ++
      Array[Byte](8, if (withAlpha) 6 else 2, 0, 0, 0)
    PngSignature ++ pngChunk("IHDR", ihdr) ++
      pngChunk("IDAT", zOut.toByteArray) ++ pngChunk("IEND", Array.empty)
  }

  /** Deterministic synthetic image with the SAME gradient formula as
    * [[synthBmp]] (R=(7x+s)%256, G=(5y+s)%256, B=(x+y+s)%256), so the PNG
    * and BMP decode paths can be pinned bit-equal against each other. The
    * scanline filter rotates with the seed, so a corpus of doc-id-seeded
    * payloads exercises all five decode paths. */
  def synthPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val s = (seed & 0xff).toInt
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val o = (y * width + x) * 3
        rgb(o) = (((x * 7 + s) % 256) & 0xff).toByte
        rgb(o + 1) = (((y * 5 + s) % 256) & 0xff).toByte
        rgb(o + 2) = (((x + y + s) % 256) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    encodePng(width, height, rgb, filterType = ((seed % 5) + 5).toInt % 5)
  }

  final case class PngImage(width: Int, height: Int, pixels: Array[Byte]) {
    /** pixels are row-major top-down RGB triples (alpha dropped). */
    def rgb(x: Int, y: Int): (Int, Int, Int) = {
      val o = (y * width + x) * 3
      ((pixels(o) & 0xff), (pixels(o + 1) & 0xff), (pixels(o + 2) & 0xff))
    }
  }

  /** Bounded zlib inflate: exactly `expected` bytes or a typed error —
    * never an unbounded buffer from lying stream contents (this runs
    * distributed over untrusted bytes, the decodeWav discipline). */
  private def inflateExact(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new Array[Byte](expected)
    try {
      var total = 0
      while (total < expected && !inf.finished()) {
        val n = inf.inflate(out, total, expected - total)
        require(n > 0 || inf.finished(),
          "truncated PNG pixel stream (inflater stalled before the expected size)")
        total += n
      }
      require(total == expected,
        s"PNG pixel stream too short: got $total of $expected bytes")
      val probe = new Array[Byte](1)
      require(inf.finished() || inf.inflate(probe, 0, 1) == 0,
        s"PNG pixel stream longer than the header's geometry ($expected bytes)")
      out
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"corrupt PNG IDAT stream: ${e.getMessage}")
    } finally inf.end()
  }

  /** Real PNG parse: signature + chunk walk with per-chunk CRC32
    * validation, IHDR geometry checks, concatenated-IDAT inflate bounded
    * to the header's claimed size, and per-scanline unfiltering of all
    * five RFC 2083 filter types. Supports 8-bit color types 2 (RGB) and
    * 6 (RGBA, alpha dropped), no interlace. Corrupt framing, lying sizes,
    * bad CRCs and unknown filter types raise IllegalArgumentException
    * rather than crashing a task mid-row or allocating unbounded
    * buffers. */
  def decodePng(payload: Array[Byte]): PngImage = {
    require(payload.length >= 8 &&
      (0 until 8).forall(i => payload(i) == PngSignature(i)),
      "not a PNG payload")
    var off = 8
    var w = 0; var h = 0; var colorType = -1
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend) {
      require(off + 8 <= payload.length, s"PNG truncated at chunk header (offset $off)")
      val len = readBe4(payload, off)
      require(len >= 0 && off + 12L + len <= payload.length,
        s"corrupt PNG chunk at offset $off: length $len exceeds payload ${payload.length}")
      val typ = new String(payload, off + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(payload, off + 4, 4 + len)
      require(crc.getValue.toInt == readBe4(payload, off + 8 + len),
        s"PNG CRC mismatch in $typ chunk at offset $off")
      typ match {
        case "IHDR" =>
          require(!seenIhdr && len == 13, s"bad IHDR (len $len)")
          w = readBe4(payload, off + 8)
          h = readBe4(payload, off + 12)
          val bitDepth = payload(off + 16) & 0xff
          colorType = payload(off + 17) & 0xff
          val compression = payload(off + 18) & 0xff
          val filterMethod = payload(off + 19) & 0xff
          val interlace = payload(off + 20) & 0xff
          require(bitDepth == 8 && (colorType == 2 || colorType == 6) &&
            compression == 0 && filterMethod == 0 && interlace == 0,
            s"only 8-bit RGB/RGBA non-interlaced PNG supported, got " +
              s"depth=$bitDepth color=$colorType comp=$compression " +
              s"filter=$filterMethod interlace=$interlace")
          require(w > 0 && h > 0 && w <= (1 << 20) && h <= (1 << 20) &&
            w.toLong * h <= (1L << 26),
            s"invalid PNG dimensions ${w}x$h")
          seenIhdr = true
        case "IDAT" =>
          require(seenIhdr, "IDAT before IHDR")
          idat.write(payload, off + 8, len)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunks (tEXt, pHYs, ...) skipped per spec
      }
      off += 12 + len
    }
    require(seenIhdr, "missing IHDR chunk")
    val bpp = if (colorType == 6) 4 else 3
    val stride = w * bpp
    val inflated = inflateExact(idat.toByteArray, (stride + 1) * h)
    val px = new Array[Byte](w * h * 3)
    val prev = new Array[Byte](stride)
    val cur = new Array[Byte](stride)
    var y = 0
    while (y < h) {
      val rowOff = y * (stride + 1)
      val ft = inflated(rowOff) & 0xff
      require(ft <= 4, s"invalid PNG filter type $ft on scanline $y")
      var i = 0
      while (i < stride) {
        val f = inflated(rowOff + 1 + i) & 0xff
        val a = if (i >= bpp) cur(i - bpp) & 0xff else 0
        val b = prev(i) & 0xff
        val c = if (i >= bpp) prev(i - bpp) & 0xff else 0
        val v = ft match {
          case 0 => f
          case 1 => f + a
          case 2 => f + b
          case 3 => f + ((a + b) >> 1)
          case 4 => f + paeth(a, b, c)
        }
        cur(i) = (v & 0xff).toByte
        i += 1
      }
      var x = 0
      while (x < w) {
        val d = (y * w + x) * 3
        px(d) = cur(x * bpp)
        px(d + 1) = cur(x * bpp + 1)
        px(d + 2) = cur(x * bpp + 2)
        x += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    PngImage(w, h, px)
  }

  /** Image feature vector over a PNG payload — same 16-float kernel as
    * [[bmpFeatures]], so identical pixels yield bit-identical features
    * regardless of the container format. */
  def pngFeatures(payload: Array[Byte]): Array[Float] = {
    val img = decodePng(payload)
    rgbFeatureVector(img.width, img.height, img.pixels)
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
