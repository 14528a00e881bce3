package graft.operators

/** Dependency-free baseline JPEG codec (ITU-T T.81 sequential DCT, 8-bit):
  * a real encoder AND decoder — marker framing, standard Annex K Huffman
  * tables, zigzag run-length entropy coding with byte stuffing, forward and
  * inverse 8x8 DCT, JFIF YCbCr color conversion, 4:4:4 and 2x2 4:2:0
  * chroma subsampling, and restart-marker intervals. Completes the
  * multimodal tier's compressed-image story next to the PNG codec
  * ([[MediaCodecs]]): the only JDK facility it needs is arithmetic.
  *
  * Scope (honest, spec-cited): baseline SOF0 only — progressive (SOF2),
  * arithmetic coding, 12-bit precision and hierarchical modes raise typed
  * errors instead of wrong pixels. Like the PNG/WAV decoders, every length
  * field is validated against the remaining payload and every allocation is
  * bounded by the header's checked geometry, because this runs distributed
  * over untrusted bytes.
  *
  * Exactness note (why a LOSSY codec can still carry a bit-exact gate): an
  * 8x8 block of constant sample v has a DC-only DCT — S(0,0) = 8·(v-128)
  * exactly in IEEE double (cos(0)=1 and the scale factors are powers of
  * two), every AC magnitude < 1e-10. With quantizer 8 the DC quantizes to
  * v-128 with zero error and every AC rounds to 0, so decode returns v
  * bit-for-bit. [[synthJpeg]] generates block-flat grayscale fixtures in
  * that exactly-representable subspace; the codec itself is a general
  * baseline implementation and the non-flat/color paths are
  * tolerance-pinned in JpegCodecSpec. */
object JpegCodec {

  // ---- constants ----

  /** Zigzag index -> natural (row-major, row = vertical frequency) index. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** cosT(u)(x) = cos((2x+1)·u·π/16), the shared FDCT/IDCT basis. */
  private val cosT: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }
  private val cu: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** The flat quantization table used by the exact-fixture path: DC step 8
    * recovers a constant block's level-shifted value with zero error (see
    * the object docstring); AC step 8 rounds the ~1e-13 numerical-noise ACs
    * of a flat block to 0. */
  val FlatQ8: Array[Int] = Array.fill(64)(8)

  /** ITU-T T.81 Annex K.1 luminance quantization table (natural order),
    * for callers that want a standard lossy encode. */
  val StdLuminanceQ: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  // Standard Annex K.3 Huffman tables: (BITS counts for code lengths 1..16,
  // HUFFVAL symbol list). The DECODER never assumes these — it builds its
  // tables from the stream's DHT segments — so they are an encoder default.
  private val DcLumBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).toArray
  private val DcChrBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChrVals = (0 to 11).toArray
  private val AcLumBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val AcChrBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChrVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  // ---- Huffman tables ----

  /** Canonical code assignment shared by encode and decode: codes of length
    * 1..16 in HUFFVAL order (T.81 Annex C). */
  private final class HuffEncodeTable(bits: Array[Int], vals: Array[Int]) {
    val codeOf = new Array[Int](256)
    val sizeOf = new Array[Int](256)
    locally {
      var code = 0; var k = 0; var len = 1
      while (len <= 16) {
        var i = 0
        while (i < bits(len - 1)) {
          codeOf(vals(k)) = code; sizeOf(vals(k)) = len
          code += 1; k += 1; i += 1
        }
        code <<= 1; len += 1
      }
    }
  }

  /** Decode side per T.81 F.2.2.3: mincode/maxcode/valptr indexed by code
    * length, built from a DHT segment's (bits, vals). */
  private final class HuffDecodeTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    val huffVal = vals
    locally {
      var code = 0; var k = 0; var len = 1
      while (len <= 16) {
        if (bits(len - 1) > 0) {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len - 1); k += bits(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1; len += 1
      }
      require(k == vals.length, s"DHT BITS counts $k != ${vals.length} values")
    }
  }

  // ---- bit IO with 0xFF byte stuffing ----

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def write(bits: Int, nbits: Int): Unit = {
      var i = nbits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >>> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // spec byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = while (n != 0) write(1, 1)
  }

  private final class BitReader(payload: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    /** True if positioned at a marker (0xFF followed by non-zero). */
    private def atMarker: Boolean =
      pos + 1 < payload.length && (payload(pos) & 0xff) == 0xff &&
        (payload(pos + 1) & 0xff) != 0x00
    def readBit(): Int = {
      if (n == 0) {
        require(pos < payload.length, "JPEG entropy stream truncated")
        require(!atMarker,
          f"JPEG entropy stream ended at marker 0xFF${payload(pos + 1) & 0xff}%02X before the scan completed")
        val b = payload(pos) & 0xff
        pos += 1
        if (b == 0xff) pos += 1 // consume the stuffed 0x00
        acc = b; n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }
    def readBits(k: Int): Int = {
      var v = 0; var i = 0
      while (i < k) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker (n cycles 0..7). */
    def expectRestart(idx: Int): Unit = {
      n = 0 // discard pad bits
      require(pos + 1 < payload.length, "JPEG truncated at restart marker")
      val m0 = payload(pos) & 0xff; val m1 = payload(pos + 1) & 0xff
      require(m0 == 0xff && m1 == 0xd0 + (idx % 8),
        f"expected RST${idx % 8} marker, found 0x$m0%02x$m1%02x")
      pos += 2
    }
    def decodeHuff(t: HuffDecodeTable): Int = {
      var code = 0; var len = 0
      while (len < 16) {
        code = (code << 1) | readBit()
        len += 1
        if (t.maxCode(len) >= code && t.minCode(len) <= code)
          return t.huffVal(t.valPtr(len) + code - t.minCode(len))
      }
      throw new IllegalArgumentException(
        "corrupt JPEG entropy stream: no Huffman code within 16 bits")
    }
  }

  // ---- DCT ----

  private def fdct(block: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var sum = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            sum += block(y * 8 + x) * cosT(u)(x) * cosT(v)(y)
            x += 1
          }
          y += 1
        }
        out(v * 8 + u) = 0.25 * cu(u) * cu(v) * sum
        u += 1
      }
      v += 1
    }
    out
  }

  private def idct(coef: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            sum += cu(u) * cu(v) * coef(v * 8 + u) * cosT(u)(x) * cosT(v)(y)
            u += 1
          }
          v += 1
        }
        out(y * 8 + x) = 0.25 * sum
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- shared sample-geometry helpers ----

  private def ceilDiv(a: Int, b: Int): Int = (a + b - 1) / b

  /** Magnitude category: smallest s with |v| < 2^s (0 for v = 0). */
  private def category(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  // ---- encoder ----

  private def writeBe2(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  private def writeSegment(out: java.io.ByteArrayOutputStream, marker: Int,
      body: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    writeBe2(out, body.length + 2)
    out.write(body, 0, body.length)
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Encode row-major top-down RGB triples as a baseline JFIF JPEG.
    *
    * @param grayscale single-component (Y only) when true, else YCbCr
    * @param subsample420 2x2 chroma subsampling (box average) when true and
    *   not grayscale, else 4:4:4
    * @param qtab natural-order quantization table (applied to every
    *   component; one-table encodes are spec-legal)
    * @param restartInterval emit DRI + RSTn every that many MCUs (0 = none)
    */
  def encodeJpeg(width: Int, height: Int, rgb: Array[Byte],
      grayscale: Boolean = true, subsample420: Boolean = false,
      qtab: Array[Int] = FlatQ8, restartInterval: Int = 0): Array[Byte] = {
    // SOF geometry fields are 16-bit; the area bound (matching the
    // decoder's) keeps every derived Int product overflow-free
    require(width > 0 && height > 0 && width <= 65535 && height <= 65535 &&
      width.toLong * height <= (1L << 26),
      s"invalid dimensions ${width}x$height (16-bit SOF fields, area <= 2^26)")
    require(rgb.length.toLong == width.toLong * height * 3,
      s"pixel buffer ${rgb.length} != ${width}x$height RGB")
    require(qtab.length == 64 && qtab.forall(q => q >= 1 && q <= 255),
      "quantization table must be 64 entries in [1,255]")

    val nComp = if (grayscale) 1 else 3
    // per-component (h, v) sampling factors
    val sampH = if (grayscale) Array(1) else if (subsample420) Array(2, 1, 1) else Array(1, 1, 1)
    val sampV = sampH.clone()
    val hMax = sampH.max; val vMax = sampV.max
    val mcusX = ceilDiv(width, 8 * hMax)
    val mcusY = ceilDiv(height, 8 * vMax)

    // component planes, padded to whole MCUs, edge-clamped / box-averaged
    val planes = Array.tabulate(nComp) { c =>
      val pw = mcusX * sampH(c) * 8; val ph = mcusY * sampV(c) * 8
      val plane = new Array[Double](pw * ph)
      val fx = hMax / sampH(c); val fy = vMax / sampV(c) // subsample factors
      var py = 0
      while (py < ph) {
        var px = 0
        while (px < pw) {
          // box average of the fx x fy source pixels (edge-clamped)
          var sum = 0.0
          var dy = 0
          while (dy < fy) {
            var dx = 0
            while (dx < fx) {
              val sx = math.min(width - 1, px * fx + dx)
              val sy = math.min(height - 1, py * fy + dy)
              val o = (sy * width + sx) * 3
              val r = rgb(o) & 0xff; val g = rgb(o + 1) & 0xff; val b = rgb(o + 2) & 0xff
              sum += (c match {
                case 0 => 0.299 * r + 0.587 * g + 0.114 * b
                case 1 => 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
                case 2 => 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
              })
              dx += 1
            }
            dy += 1
          }
          plane(py * pw + px) = clamp255(math.round(sum / (fx * fy)).toInt).toDouble
          px += 1
        }
        py += 1
      }
      plane
    }

    val out = new java.io.ByteArrayOutputStream(width * height / 4 + 1024)
    out.write(0xff); out.write(0xd8) // SOI
    // APP0 JFIF v1.1, no density, no thumbnail
    writeSegment(out, 0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // DQT: one 8-bit table, id 0, zigzag order
    val dqt = new Array[Byte](65)
    dqt(0) = 0x00
    var zi = 0
    while (zi < 64) { dqt(1 + zi) = qtab(ZigZag(zi)).toByte; zi += 1 }
    writeSegment(out, 0xdb, dqt)
    // SOF0
    val sof = new java.io.ByteArrayOutputStream()
    sof.write(8); writeBe2(sof, height); writeBe2(sof, width); sof.write(nComp)
    var c = 0
    while (c < nComp) {
      sof.write(c + 1); sof.write((sampH(c) << 4) | sampV(c)); sof.write(0)
      c += 1
    }
    writeSegment(out, 0xc0, sof.toByteArray)
    // DHT: DC/AC luminance (tables 0), and chrominance (tables 1) for color
    def dht(clazz: Int, id: Int, bits: Array[Int], vals: Array[Int]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write((clazz << 4) | id)
      bits.foreach(b.write)
      vals.foreach(b.write)
      b.toByteArray
    }
    writeSegment(out, 0xc4, dht(0, 0, DcLumBits, DcLumVals))
    writeSegment(out, 0xc4, dht(1, 0, AcLumBits, AcLumVals))
    if (nComp == 3) {
      writeSegment(out, 0xc4, dht(0, 1, DcChrBits, DcChrVals))
      writeSegment(out, 0xc4, dht(1, 1, AcChrBits, AcChrVals))
    }
    if (restartInterval > 0) {
      val dri = new java.io.ByteArrayOutputStream()
      writeBe2(dri, restartInterval)
      writeSegment(out, 0xdd, dri.toByteArray)
    }
    // SOS
    val sos = new java.io.ByteArrayOutputStream()
    sos.write(nComp)
    c = 0
    while (c < nComp) {
      val t = if (c == 0) 0 else 1
      sos.write(c + 1); sos.write((t << 4) | t)
      c += 1
    }
    sos.write(0); sos.write(63); sos.write(0)
    writeSegment(out, 0xda, sos.toByteArray)

    // entropy-coded MCU scan
    val dcEnc = Array(new HuffEncodeTable(DcLumBits, DcLumVals),
      new HuffEncodeTable(DcChrBits, DcChrVals))
    val acEnc = Array(new HuffEncodeTable(AcLumBits, AcLumVals),
      new HuffEncodeTable(AcChrBits, AcChrVals))
    val bw = new BitWriter(out)
    val dcPred = new Array[Int](nComp)
    val block = new Array[Double](64)
    var mcu = 0
    var rstIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          out.write(0xff); out.write(0xd0 + (rstIdx % 8))
          rstIdx += 1
          java.util.Arrays.fill(dcPred, 0)
        }
        c = 0
        while (c < nComp) {
          val t = if (c == 0) 0 else 1
          val pw = mcusX * sampH(c) * 8
          var by = 0
          while (by < sampV(c)) {
            var bx = 0
            while (bx < sampH(c)) {
              val ox = (mx * sampH(c) + bx) * 8
              val oy = (my * sampV(c) + by) * 8
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  block(y * 8 + x) = planes(c)((oy + y) * pw + (ox + x)) - 128.0
                  x += 1
                }
                y += 1
              }
              val coef = fdct(block)
              // quantize in natural order
              val q = new Array[Int](64)
              var i = 0
              while (i < 64) {
                q(i) = math.round(coef(i) / qtab(i)).toInt
                i += 1
              }
              // DC difference
              val diff = q(0) - dcPred(c)
              dcPred(c) = q(0)
              val ds = category(diff)
              require(ds <= 11,
                s"DC difference $diff too wide for the standard Huffman tables — raise the quantization table")
              bw.write(dcEnc(t).codeOf(ds), dcEnc(t).sizeOf(ds))
              if (ds > 0)
                bw.write(if (diff < 0) diff + (1 << ds) - 1 else diff, ds)
              // AC run-length in zigzag order
              var run = 0
              var k = 1
              while (k < 64) {
                val v = q(ZigZag(k))
                if (v == 0) run += 1
                else {
                  while (run >= 16) {
                    bw.write(acEnc(t).codeOf(0xf0), acEnc(t).sizeOf(0xf0)) // ZRL
                    run -= 16
                  }
                  val s = category(v)
                  require(s <= 10,
                    s"AC coefficient $v too wide for the standard Huffman tables — raise the quantization table")
                  val sym = (run << 4) | s
                  bw.write(acEnc(t).codeOf(sym), acEnc(t).sizeOf(sym))
                  bw.write(if (v < 0) v + (1 << s) - 1 else v, s)
                  run = 0
                }
                k += 1
              }
              if (run > 0)
                bw.write(acEnc(t).codeOf(0x00), acEnc(t).sizeOf(0x00)) // EOB
              bx += 1
            }
            by += 1
          }
          c += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  // ---- decoder ----

  final case class JpegImage(width: Int, height: Int, pixels: Array[Byte]) {
    /** pixels are row-major top-down RGB triples. */
    def rgb(x: Int, y: Int): (Int, Int, Int) = {
      val o = (y * width + x) * 3
      ((pixels(o) & 0xff), (pixels(o + 1) & 0xff), (pixels(o + 2) & 0xff))
    }
  }

  private def readBe2(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** Real baseline JPEG parse: marker walk with validated segment lengths,
    * DQT/DHT/SOF0/DRI/SOS handling, Huffman + run-length entropy decode
    * with byte unstuffing and restart markers, dequantization, inverse DCT,
    * nearest-neighbor chroma upsampling and JFIF YCbCr→RGB. Supports 8-bit
    * baseline (SOF0) with 1 component (grayscale) or 3 components at
    * sampling factors 1x1 (4:4:4) or 2x2+1x1+1x1 (4:2:0). Progressive /
    * arithmetic / 12-bit streams, lying lengths, truncated scans and
    * invalid Huffman codes raise IllegalArgumentException rather than
    * crashing a task or allocating unbounded buffers. */
  def decodeJpeg(payload: Array[Byte]): JpegImage = {
    require(payload.length >= 4 &&
      (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8,
      "not a JPEG payload (missing SOI)")
    var off = 2
    val qtabs = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffDecodeTable](4)
    val acTabs = new Array[HuffDecodeTable](4)
    var width = 0; var height = 0; var nComp = 0
    var sampH: Array[Int] = null; var sampV: Array[Int] = null
    var compQ: Array[Int] = null
    var compDc: Array[Int] = null; var compAc: Array[Int] = null
    var restartInterval = 0
    var sofSeen = false

    def segment(): (Int, Int, Int) = { // (marker, bodyOff, bodyLen)
      require(off + 2 <= payload.length, s"JPEG truncated at offset $off")
      require((payload(off) & 0xff) == 0xff,
        f"expected marker at offset $off, found 0x${payload(off) & 0xff}%02x")
      val marker = payload(off + 1) & 0xff
      if (marker == 0xd9) return (marker, off + 2, 0) // EOI has no length
      require(off + 4 <= payload.length, "JPEG truncated in segment header")
      val len = readBe2(payload, off + 2)
      require(len >= 2 && off + 2 + len <= payload.length,
        f"corrupt JPEG segment 0x$marker%02x at offset $off: length $len exceeds payload ${payload.length}")
      (marker, off + 4, len - 2)
    }

    var scanStart = -1
    while (scanStart < 0) {
      val (marker, bodyOff, bodyLen) = segment()
      marker match {
        case 0xdb => // DQT: one or more tables
          var p = bodyOff
          while (p < bodyOff + bodyLen) {
            val pq = (payload(p) & 0xff) >> 4
            val tq = payload(p) & 0x0f
            require(pq == 0, "only 8-bit quantization tables supported")
            require(tq <= 3, s"bad DQT table id $tq")
            require(p + 65 <= bodyOff + bodyLen, "DQT truncated")
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(ZigZag(i)) = payload(p + 1 + i) & 0xff; i += 1 }
            qtabs(tq) = t
            p += 65
          }
          off = bodyOff + bodyLen
        case 0xc4 => // DHT: one or more tables
          var p = bodyOff
          while (p < bodyOff + bodyLen) {
            val clazz = (payload(p) & 0xff) >> 4
            val id = payload(p) & 0x0f
            require(clazz <= 1 && id <= 3, s"bad DHT class/id $clazz/$id")
            require(p + 17 <= bodyOff + bodyLen, "DHT truncated")
            val bits = Array.tabulate(16)(i => payload(p + 1 + i) & 0xff)
            val nVals = bits.sum
            require(nVals <= 256 && p + 17 + nVals <= bodyOff + bodyLen,
              s"DHT claims $nVals values beyond segment end")
            val vals = Array.tabulate(nVals)(i => payload(p + 17 + i) & 0xff)
            val table = new HuffDecodeTable(bits, vals)
            if (clazz == 0) dcTabs(id) = table else acTabs(id) = table
            p += 17 + nVals
          }
          off = bodyOff + bodyLen
        case 0xc0 | 0xc1 => // SOF0 baseline (SOF1 extended-sequential shares the layout)
          require(!sofSeen, "multiple SOF segments")
          require(bodyLen >= 6, "SOF truncated")
          val precision = payload(bodyOff) & 0xff
          require(precision == 8, s"only 8-bit precision supported, got $precision")
          height = readBe2(payload, bodyOff + 1)
          width = readBe2(payload, bodyOff + 3)
          nComp = payload(bodyOff + 5) & 0xff
          require(width > 0 && height > 0 && width <= (1 << 20) &&
            height <= (1 << 20) && width.toLong * height <= (1L << 26),
            s"invalid JPEG dimensions ${width}x$height")
          require(nComp == 1 || nComp == 3,
            s"only 1- or 3-component JPEG supported, got $nComp")
          require(bodyLen >= 6 + 3 * nComp, "SOF component list truncated")
          sampH = new Array[Int](nComp); sampV = new Array[Int](nComp)
          compQ = new Array[Int](nComp)
          var c = 0
          while (c < nComp) {
            val b = bodyOff + 6 + c * 3
            sampH(c) = (payload(b + 1) & 0xff) >> 4
            sampV(c) = payload(b + 1) & 0x0f
            compQ(c) = payload(b + 2) & 0xff
            require(sampH(c) >= 1 && sampH(c) <= 2 && sampV(c) >= 1 && sampV(c) <= 2,
              s"unsupported sampling factor ${sampH(c)}x${sampV(c)}")
            require(compQ(c) <= 3, s"bad quant table id ${compQ(c)}")
            c += 1
          }
          if (nComp == 3)
            require((sampH.toSeq == Seq(1, 1, 1) && sampV.toSeq == Seq(1, 1, 1)) ||
              (sampH.toSeq == Seq(2, 1, 1) && sampV.toSeq == Seq(2, 1, 1)),
              s"only 4:4:4 or 2x2 4:2:0 sampling supported, got " +
                sampH.zip(sampV).map { case (h, v) => s"${h}x$v" }.mkString(","))
          else {
            // T.81: a single-component scan is NON-interleaved — one 8x8
            // data unit per MCU, the SOF sampling factors are ignored (a
            // grayscale file may legally declare 2x2; libjpeg normalizes
            // it the same way)
            sampH(0) = 1; sampV(0) = 1
          }
          sofSeen = true
          off = bodyOff + bodyLen
        case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          throw new IllegalArgumentException(
            f"unsupported JPEG mode (SOF marker 0x$marker%02x): only baseline sequential (SOF0/SOF1) is implemented")
        case 0xdd => // DRI
          require(bodyLen >= 2, "DRI truncated")
          restartInterval = readBe2(payload, bodyOff)
          off = bodyOff + bodyLen
        case 0xda => // SOS
          require(sofSeen, "SOS before SOF")
          require(bodyLen >= 1, "SOS truncated")
          val ns = payload(bodyOff) & 0xff
          require(ns == nComp, s"SOS component count $ns != SOF's $nComp (multi-scan unsupported)")
          require(bodyLen >= 1 + 2 * ns + 3, "SOS truncated")
          compDc = new Array[Int](nComp); compAc = new Array[Int](nComp)
          var i = 0
          while (i < ns) {
            val cs = payload(bodyOff + 1 + i * 2) & 0xff
            val tt = payload(bodyOff + 2 + i * 2) & 0xff
            require(cs == i + 1, s"non-sequential SOS component id $cs")
            compDc(i) = tt >> 4; compAc(i) = tt & 0x0f
            require(compDc(i) <= 3 && compAc(i) <= 3,
              s"bad SOS Huffman table ids dc=${compDc(i)} ac=${compAc(i)}")
            i += 1
          }
          val ss = payload(bodyOff + 1 + 2 * ns) & 0xff
          val se = payload(bodyOff + 2 + 2 * ns) & 0xff
          require(ss == 0 && se == 63,
            s"spectral selection $ss..$se unsupported (baseline requires 0..63)")
          scanStart = bodyOff + bodyLen
        case 0xd9 =>
          throw new IllegalArgumentException("JPEG has no scan (EOI before SOS)")
        case _ => // APPn / COM / other ancillary segments skipped per spec
          off = bodyOff + bodyLen
      }
    }

    val hMax = sampH.max; val vMax = sampV.max
    val mcusX = ceilDiv(width, 8 * hMax)
    val mcusY = ceilDiv(height, 8 * vMax)
    val planeW = Array.tabulate(nComp)(c => mcusX * sampH(c) * 8)
    val planeH = Array.tabulate(nComp)(c => mcusY * sampV(c) * 8)
    val planes = Array.tabulate(nComp)(c => new Array[Byte](planeW(c) * planeH(c)))
    var c = 0
    while (c < nComp) {
      require(qtabs(compQ(c)) != null, s"component $c references missing quant table ${compQ(c)}")
      require(dcTabs(compDc(c)) != null && acTabs(compAc(c)) != null,
        s"component $c references missing Huffman table dc=${compDc(c)} ac=${compAc(c)}")
      c += 1
    }

    val br = new BitReader(payload, scanStart)
    val dcPred = new Array[Int](nComp)
    val coef = new Array[Double](64)
    var mcu = 0
    var rstIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.expectRestart(rstIdx)
          rstIdx += 1
          java.util.Arrays.fill(dcPred, 0)
        }
        c = 0
        while (c < nComp) {
          val qt = qtabs(compQ(c))
          val dcT = dcTabs(compDc(c)); val acT = acTabs(compAc(c))
          var by = 0
          while (by < sampV(c)) {
            var bx = 0
            while (bx < sampH(c)) {
              java.util.Arrays.fill(coef, 0.0)
              // DC
              val ds = br.decodeHuff(dcT)
              require(ds <= 11, s"invalid DC category $ds")
              if (ds > 0) {
                val bits = br.readBits(ds)
                val diff = if (bits < (1 << (ds - 1))) bits - (1 << ds) + 1 else bits
                dcPred(c) += diff
              }
              coef(0) = dcPred(c).toDouble * qt(0)
              // AC
              var k = 1
              while (k < 64) {
                val rs = br.decodeHuff(acT)
                val run = rs >> 4; val size = rs & 0x0f
                if (size == 0) {
                  if (run == 15) k += 16 // ZRL
                  else k = 64 // EOB
                } else {
                  k += run
                  require(k < 64, s"AC run overflows block (run=$run at k=${k - run})")
                  val bits = br.readBits(size)
                  val v = if (bits < (1 << (size - 1))) bits - (1 << size) + 1 else bits
                  coef(ZigZag(k)) = v.toDouble * qt(ZigZag(k))
                  k += 1
                }
              }
              val px = idct(coef)
              val ox = (mx * sampH(c) + bx) * 8
              val oy = (my * sampV(c) + by) * 8
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  planes(c)((oy + y) * planeW(c) + (ox + x)) =
                    clamp255(math.round(px(y * 8 + x) + 128.0).toInt).toByte
                  x += 1
                }
                y += 1
              }
              bx += 1
            }
            by += 1
          }
          c += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }

    // the scan must be followed by EOI — a truncated tail is corrupt even
    // when every MCU already decoded (keeps the totality contract strict)
    val tail = br.pos
    require(tail + 2 <= payload.length &&
      (payload(tail) & 0xff) == 0xff && (payload(tail + 1) & 0xff) == 0xd9,
      s"JPEG missing EOI after scan (offset $tail of ${payload.length})")

    // color conversion + chroma upsample (nearest replication)
    val out = new Array[Byte](width * height * 3)
    if (nComp == 1) {
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val v = planes(0)(y * planeW(0) + x)
          val d = (y * width + x) * 3
          out(d) = v; out(d + 1) = v; out(d + 2) = v
          x += 1
        }
        y += 1
      }
    } else {
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yy = planes(0)(y * planeW(0) + x) & 0xff
          val cx1 = x * sampH(1) / hMax; val cy1 = y * sampV(1) / vMax
          val cb = (planes(1)(cy1 * planeW(1) + cx1) & 0xff) - 128
          val cx2 = x * sampH(2) / hMax; val cy2 = y * sampV(2) / vMax
          val cr = (planes(2)(cy2 * planeW(2) + cx2) & 0xff) - 128
          val d = (y * width + x) * 3
          out(d) = clamp255(math.round(yy + 1.402 * cr).toInt).toByte
          out(d + 1) = clamp255(math.round(yy - 0.344136 * cb - 0.714136 * cr).toInt).toByte
          out(d + 2) = clamp255(math.round(yy + 1.772 * cb).toInt).toByte
          x += 1
        }
        y += 1
      }
    }
    JpegImage(width, height, out)
  }

  /** Image feature vector over a JPEG payload — same 16-float kernel as
    * the BMP/PNG paths ([[MediaCodecs.rgbFeatureVector]]), so identical
    * pixels yield bit-identical features regardless of container format. */
  def jpegFeatures(payload: Array[Byte]): Array[Float] = {
    val img = decodeJpeg(payload)
    MediaCodecs.rgbFeatureVector(img.width, img.height, img.pixels)
  }

  /** The SINGLE source of the block-flat fixture content: a grayscale RGB
    * buffer whose 8x8 blocks are each constant at
    * v(bx,by) = (7·bx + 5·by + seed mod 256) mod 256. Everything that
    * relies on this formula ([[synthJpeg]], the cross-codec parity gate,
    * JpegCodecSpec, and the closed-form
    * [[Multimodal.theoryJpegFeature0]] sum) derives from or mirrors THIS
    * definition. */
  def blockFlatPixels(width: Int, height: Int, seed: Long): Array[Byte] = {
    val s = (seed & 0xff).toInt
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = (((x / 8) * 7 + (y / 8) * 5 + s) % 256).toByte
        val o = (y * width + x) * 3
        rgb(o) = v; rgb(o + 1) = v; rgb(o + 2) = v
        x += 1
      }
      y += 1
    }
    rgb
  }

  /** Deterministic synthetic fixture in the exactly-representable subspace
    * (see object docstring): [[blockFlatPixels]] content — the full
    * Huffman/DCT encode-decode path must reproduce every pixel
    * bit-for-bit because flat blocks are DC-only and [[FlatQ8]]'s DC
    * step 8 is exact. Width and height must be multiples of 8. */
  def synthJpeg(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width % 8 == 0 && height % 8 == 0,
      s"synthJpeg requires block-aligned dimensions, got ${width}x$height")
    encodeJpeg(width, height, blockFlatPixels(width, height, seed),
      grayscale = true, qtab = FlatQ8)
  }
}
