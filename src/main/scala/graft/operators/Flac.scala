package graft.operators

/** Dependency-free FLAC codec for the multimodal tier's compressed-audio
  * story (the audio sibling of [[JpegCodec]]): a real encoder AND decoder
  * for 16-bit mono streams — "fLaC" stream framing, STREAMINFO with the
  * spec's MD5 of the unencoded samples, frame headers with CRC-8, frame
  * CRC-16, CONSTANT / VERBATIM / FIXED(0-4) subframes, and partitioned
  * Rice residual coding with the escape-to-raw fallback. FLAC is
  * LOSSLESS, so unlike JPEG no fixture subspace is needed: decode∘encode
  * must reproduce EVERY input bit-for-bit, and the d_multimodal_flac gate
  * pins exactly that against the same closed-form sine theory as the WAV
  * path.
  *
  * Scope (honest, spec-cited): 16-bit mono with fixed predictors — the
  * subset the encoder emits. The decoder additionally handles any Rice
  * partition order, both Rice parameter widths, wasted bits and escaped
  * partitions; LPC subframes, stereo decorrelation modes and other sample
  * widths raise typed errors instead of wrong samples. Every length is
  * validated and every allocation bounded by checked header fields, since
  * this runs distributed over untrusted bytes. */
object FlacCodec {

  private val BlockSize = 4096

  // ---- CRCs (FLAC spec: CRC-8 poly 0x07 init 0; CRC-16 poly 0x8005 init 0) ----

  private val crc8Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i
      var b = 0
      while (b < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff; b += 1 }
      t(i) = c; i += 1
    }
    t
  }

  private val crc16Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 8
      var b = 0
      while (b < 8) { c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff; b += 1 }
      t(i) = c; i += 1
    }
    t
  }

  private def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = crc8Table(c ^ (bytes(i) & 0xff)); i += 1 }
    c
  }

  private def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = crc16Table(((c >> 8) ^ (bytes(i) & 0xff)) & 0xff) ^ ((c << 8) & 0xffff); i += 1 }
    c
  }

  // ---- bit IO (MSB-first, no stuffing) ----

  private final class BitWriter {
    val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def writeBits(v: Long, nbits: Int): Unit = {
      var i = nbits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1L).toInt
        n += 1
        if (n == 8) { out.write(acc); acc = 0; n = 0 }
        i -= 1
      }
    }
    /** FLAC unary: v zero-bits followed by a one-bit. */
    def writeUnary(v: Int): Unit = {
      var i = 0
      while (i < v) { writeBits(0, 1); i += 1 }
      writeBits(1, 1)
    }
    def alignToByte(): Unit = while (n != 0) writeBits(0, 1)
    def toByteArray: Array[Byte] = { require(n == 0, "unaligned"); out.toByteArray }
  }

  private final class BitReader(payload: Array[Byte], startByte: Int) {
    var pos: Int = startByte // byte position of the NEXT unread byte
    private var acc = 0
    private var n = 0
    def readBit(): Int = {
      if (n == 0) {
        require(pos < payload.length, "FLAC stream truncated mid-frame")
        acc = payload(pos) & 0xff; pos += 1; n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }
    def readBits(k: Int): Long = {
      var v = 0L
      var i = 0
      while (i < k) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) {
        q += 1
        require(q <= (1 << 20), "corrupt FLAC unary run (quotient bound exceeded)")
      }
      q
    }
    def alignToByte(): Unit = n = 0
    def atByteBoundary: Boolean = n == 0
  }

  // ---- encoder ----

  private def writeBe(out: java.io.ByteArrayOutputStream, v: Long, nBytes: Int): Unit = {
    var i = nBytes - 1
    while (i >= 0) { out.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }
  }

  /** Fixed-predictor residual of the given order over `x(from until until)`,
    * reading warmup history from `x` itself. */
  private def fixedResidual(x: Array[Int], from: Int, until: Int, order: Int): Array[Int] = {
    val e = new Array[Int](until - from)
    var i = from
    while (i < until) {
      val r = order match {
        case 0 => x(i)
        case 1 => x(i) - x(i - 1)
        case 2 => x(i) - 2 * x(i - 1) + x(i - 2)
        case 3 => x(i) - 3 * x(i - 1) + 3 * x(i - 2) - x(i - 3)
        case 4 => x(i) - 4 * x(i - 1) + 6 * x(i - 2) - 4 * x(i - 3) + x(i - 4)
      }
      e(i - from) = r
      i += 1
    }
    e
  }

  /** Rice parameter minimizing the estimated size for the residual set:
    * k ≈ log2(mean |zigzag|), clamped to the 4-bit parameter range. */
  private def bestRiceParam(res: Array[Int]): Int = {
    var sum = 0L
    var i = 0
    while (i < res.length) {
      val e = res(i)
      sum += ((e << 1) ^ (e >> 31)).toLong & 0xffffffffL
      i += 1
    }
    val mean = if (res.length == 0) 0.0 else sum.toDouble / res.length
    var k = 0
    while (k < 14 && (1L << (k + 1)) < mean + 1) k += 1
    k
  }

  /** Encode 16-bit mono PCM as a spec-conforming FLAC stream. Each 4096-
    * sample block becomes one frame; per block the encoder picks CONSTANT
    * (all-equal), else the fixed predictor order 0-4 with the smallest
    * summed |residual|, Rice-coded at partition order 0 with the escape
    * to raw when residuals are wider than the 4-bit parameter range. */
  def encodeFlac(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20), s"bad sample rate $sampleRate")
    val out = new java.io.ByteArrayOutputStream(samples.length + 128)
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO metadata block (last-metadata flag set, type 0, length 34)
    // the min/max block-size fields EXCLUDE the final (possibly shorter)
    // block per spec, so with fixed 4096 blocking both are 4096 unless the
    // whole stream is one short block (then clamp to the spec floor of 16)
    val nBlocks = math.max(1, ceilDiv(samples.length, BlockSize))
    val minBlock = if (nBlocks == 1) math.min(BlockSize, math.max(16, samples.length))
      else BlockSize
    out.write(0x80); writeBe(out, 34, 3)
    val si = new BitWriter
    si.writeBits(minBlock.toLong, 16)
    si.writeBits(BlockSize.toLong, 16)              // max block size
    si.writeBits(0L, 24); si.writeBits(0L, 24)      // min/max frame size unknown
    si.writeBits(sampleRate.toLong, 20)
    si.writeBits(0L, 3)                             // channels - 1 = 0 (mono)
    si.writeBits(15L, 5)                            // bits per sample - 1 = 15
    si.writeBits(samples.length.toLong, 36)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val le = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      le(i * 2) = (samples(i) & 0xff).toByte
      le(i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    md5.update(le)
    val siBytes = si.toByteArray
    out.write(siBytes, 0, siBytes.length)
    out.write(md5.digest(), 0, 16)

    var frameNo = 0
    var off = 0
    while (off < samples.length) {
      val bs = math.min(BlockSize, samples.length - off)
      locally {
        val bw = new BitWriter
        // frame header: sync(14) 0b11111111111110, reserved 0, fixed-blocksize strategy 0
        bw.writeBits(0x3ffe, 14); bw.writeBits(0, 1); bw.writeBits(0, 1)
        bw.writeBits(7, 4)  // block size code 7: 16-bit value-1 at header end
        bw.writeBits(0, 4)  // sample rate code 0: from STREAMINFO
        bw.writeBits(0, 4)  // channel assignment: mono
        bw.writeBits(4, 3)  // sample size code 4: 16 bits
        bw.writeBits(0, 1)  // reserved
        // coded frame number, UTF-8 style (supports the full 31-bit range)
        writeCodedNumber(bw, frameNo)
        bw.writeBits((bs - 1).toLong, 16)
        // CRC-8 over the header so far
        bw.alignToByte()
        val headBytes = bw.out.toByteArray
        bw.writeBits(crc8(headBytes, 0, headBytes.length).toLong, 8)

        // subframe
        val x = new Array[Int](bs)
        var j = 0
        var allEqual = true
        while (j < bs) {
          x(j) = samples(off + j).toInt
          if (j > 0 && x(j) != x(0)) allEqual = false
          j += 1
        }
        if (allEqual) {
          bw.writeBits(0, 1); bw.writeBits(0, 6); bw.writeBits(0, 1) // CONSTANT, no wasted bits
          bw.writeBits((x(0).toLong & 0xffff), 16)
        } else {
          val maxOrder = math.min(4, bs - 1)
          var best = 0
          var bestCost = Long.MaxValue
          var o = 0
          while (o <= maxOrder) {
            val res = fixedResidual(x, o, bs, o)
            var cost = 0L
            var r = 0
            while (r < res.length) { cost += math.abs(res(r).toLong); r += 1 }
            if (cost < bestCost) { bestCost = cost; best = o }
            o += 1
          }
          val res = fixedResidual(x, best, bs, best)
          bw.writeBits(0, 1); bw.writeBits((8 + best).toLong, 6); bw.writeBits(0, 1) // FIXED(order)
          var w = 0
          while (w < best) { bw.writeBits(x(w).toLong & 0xffff, 16); w += 1 } // warmup
          // residual: method 00 (4-bit Rice), partition order 0
          bw.writeBits(0, 2); bw.writeBits(0, 4)
          val k = bestRiceParam(res)
          val maxZig = res.foldLeft(0L)((m, e) => math.max(m, ((e << 1) ^ (e >> 31)).toLong & 0xffffffffL))
          if ((maxZig >>> k) > (1 << 10)) { // bound unary runs: outliers escape to raw
            // escape to raw: param 15, then 5-bit width, then signed raw residuals
            bw.writeBits(15, 4)
            var width = 1
            while (width < 32 && res.exists(e => e < -(1L << (width - 1)) || e >= (1L << (width - 1)))) width += 1
            bw.writeBits(width.toLong, 5)
            res.foreach(e => bw.writeBits(e.toLong & ((1L << width) - 1), width))
          } else {
            bw.writeBits(k.toLong, 4)
            res.foreach { e =>
              val u = ((e << 1) ^ (e >> 31)).toLong & 0xffffffffL
              bw.writeUnary((u >>> k).toInt)
              if (k > 0) bw.writeBits(u & ((1L << k) - 1), k)
            }
          }
        }
        bw.alignToByte()
        val frameBytes = bw.toByteArray
        out.write(frameBytes, 0, frameBytes.length)
        writeBe(out, crc16(frameBytes, 0, frameBytes.length).toLong, 2)
      }
      off += bs
      frameNo += 1
    }
    out.toByteArray
  }

  private def ceilDiv(a: Int, b: Int): Int = (a + b - 1) / b

  /** FLAC's UTF-8-style coded number (frame index under fixed blocking). */
  private def writeCodedNumber(bw: BitWriter, v: Int): Unit = {
    if (v < 0x80) bw.writeBits(v.toLong, 8)
    else if (v < 0x800) {
      bw.writeBits(0xc0L | (v >> 6), 8); bw.writeBits(0x80L | (v & 0x3f), 8)
    } else if (v < 0x10000) {
      bw.writeBits(0xe0L | (v >> 12), 8)
      bw.writeBits(0x80L | ((v >> 6) & 0x3f), 8); bw.writeBits(0x80L | (v & 0x3f), 8)
    } else {
      require(v < 0x200000, s"frame number $v out of coded range")
      bw.writeBits(0xf0L | (v >> 18), 8)
      bw.writeBits(0x80L | ((v >> 12) & 0x3f), 8)
      bw.writeBits(0x80L | ((v >> 6) & 0x3f), 8); bw.writeBits(0x80L | (v & 0x3f), 8)
    }
  }

  private def readCodedNumber(br: BitReader): Long = {
    val b0 = br.readBits(8).toInt
    val extra =
      if (b0 < 0x80) 0
      else if ((b0 & 0xe0) == 0xc0) 1
      else if ((b0 & 0xf0) == 0xe0) 2
      else if ((b0 & 0xf8) == 0xf0) 3
      else if ((b0 & 0xfc) == 0xf8) 4
      else if ((b0 & 0xfe) == 0xfc) 5
      else if (b0 == 0xfe) 6
      else throw new IllegalArgumentException(f"invalid coded-number lead byte 0x$b0%02x")
    var v: Long =
      if (extra == 0) b0.toLong else (b0 & (0x3f >> extra)).toLong
    var i = 0
    while (i < extra) {
      val b = br.readBits(8).toInt
      require((b & 0xc0) == 0x80, f"invalid coded-number continuation 0x$b%02x")
      v = (v << 6) | (b & 0x3f)
      i += 1
    }
    v
  }

  final case class FlacAudio(sampleRate: Int, samples: Array[Short])

  /** Real FLAC parse: magic + metadata-block walk (STREAMINFO required
    * first), then frame-by-frame entropy decode — header field codes,
    * CRC-8 and CRC-16 validation, CONSTANT/VERBATIM/FIXED subframes with
    * wasted bits, Rice residuals at any partition order in both parameter
    * widths plus escaped raw partitions — and a final MD5 check of the
    * reconstructed samples against STREAMINFO's signature (the spec's own
    * end-to-end integrity proof). LPC subframes, multi-channel streams and
    * non-16-bit widths raise typed errors. */
  def decodeFlac(payload: Array[Byte]): FlacAudio = {
    require(payload.length >= 42 && payload(0) == 'f' && payload(1) == 'L' &&
      payload(2) == 'a' && payload(3) == 'C', "not a FLAC payload")
    var off = 4
    var sampleRate = 0
    var totalSamples = 0L
    var streamMd5: Array[Byte] = null
    var last = false
    var first = true
    while (!last) {
      require(off + 4 <= payload.length, "FLAC truncated in metadata header")
      val h = payload(off) & 0xff
      last = (h & 0x80) != 0
      val typ = h & 0x7f
      val len = ((payload(off + 1) & 0xff) << 16) | ((payload(off + 2) & 0xff) << 8) | (payload(off + 3) & 0xff)
      require(off + 4 + len <= payload.length,
        s"FLAC metadata block claims $len bytes beyond payload")
      if (first) {
        require(typ == 0 && len == 34, s"first metadata block must be STREAMINFO(34), got type $typ len $len")
        val br = new BitReader(payload, off + 4)
        br.readBits(16); br.readBits(16) // min/max block size
        br.readBits(24); br.readBits(24) // min/max frame size
        sampleRate = br.readBits(20).toInt
        val channels = br.readBits(3).toInt + 1
        val bps = br.readBits(5).toInt + 1
        require(channels == 1, s"only mono FLAC supported, got $channels channels")
        require(bps == 16, s"only 16-bit FLAC supported, got $bps bits")
        totalSamples = br.readBits(36)
        require(sampleRate > 0, "invalid sample rate")
        // bound the decode allocation from the 36-bit header field: 2^28
        // samples = 512 MB of shorts is already past any sane payload, and
        // the bound keeps .toInt exact (a hostile 42-byte header must not
        // drive a negative-size or multi-GB allocation)
        require(totalSamples >= 0 && totalSamples <= (1L << 28),
          s"implausible total samples $totalSamples")
        streamMd5 = java.util.Arrays.copyOfRange(payload, off + 22, off + 38)
        first = false
      }
      off += 4 + len
    }
    require(!first, "missing STREAMINFO")

    val samples = new Array[Short](totalSamples.toInt)
    var got = 0
    while (got < totalSamples) {
      val frameStart = off
      val br = new BitReader(payload, off)
      require(br.readBits(14) == 0x3ffe, s"bad frame sync at offset $frameStart")
      require(br.readBits(1) == 0, "reserved frame-header bit set")
      br.readBits(1) // blocking strategy
      val bsCode = br.readBits(4).toInt
      val srCode = br.readBits(4).toInt
      val chanAsgn = br.readBits(4).toInt
      val ssCode = br.readBits(3).toInt
      require(br.readBits(1) == 0, "reserved frame-header bit set")
      require(chanAsgn == 0, s"only mono frames supported, got channel assignment $chanAsgn")
      require(ssCode == 4, s"only 16-bit frames supported, got sample-size code $ssCode")
      readCodedNumber(br)
      val blockSize = bsCode match {
        case 0 => throw new IllegalArgumentException("reserved block size code 0")
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => br.readBits(8).toInt + 1
        case 7 => br.readBits(16).toInt + 1
        case c => 256 << (c - 8)
      }
      srCode match {
        case 0 => () // from STREAMINFO
        case 12 => br.readBits(8)
        case 13 | 14 => br.readBits(16)
        case 15 => throw new IllegalArgumentException("invalid sample rate code 15")
        case _ => () // table-coded rates carry no extra bits
      }
      require(blockSize > 0 && got + blockSize <= totalSamples,
        s"frame block size $blockSize overruns total $totalSamples at sample $got")
      // CRC-8 covers the header bytes up to (not including) the CRC byte
      require(br.atByteBoundary, "frame header not byte-aligned before CRC-8")
      val headerEnd = br.pos
      val expectedCrc8 = br.readBits(8).toInt
      require(crc8(payload, frameStart, headerEnd) == expectedCrc8,
        s"frame header CRC-8 mismatch at offset $frameStart")

      // subframe (mono: exactly one)
      require(br.readBits(1) == 0, "subframe padding bit set")
      val sfType = br.readBits(6).toInt
      val wastedFlag = br.readBits(1).toInt
      val wasted = if (wastedFlag == 1) br.readUnary() + 1 else 0
      require(wasted <= 15, s"implausible wasted bits $wasted")
      val eff = 16 - wasted
      val x = new Array[Int](blockSize)
      def signExtend(v: Long, bits: Int): Int = {
        val shifted = v << (64 - bits)
        (shifted >> (64 - bits)).toInt
      }
      sfType match {
        case 0 => // CONSTANT
          val v = signExtend(br.readBits(eff), eff)
          java.util.Arrays.fill(x, v)
        case 1 => // VERBATIM
          var i = 0
          while (i < blockSize) { x(i) = signExtend(br.readBits(eff), eff); i += 1 }
        case t if t >= 8 && t <= 12 => // FIXED(order)
          val order = t - 8
          require(order <= blockSize, s"FIXED order $order exceeds block size $blockSize")
          var i = 0
          while (i < order) { x(i) = signExtend(br.readBits(eff), eff); i += 1 }
          decodeResidual(br, x, order, blockSize)
          // reconstruct in place
          i = order
          while (i < blockSize) {
            x(i) = order match {
              case 0 => x(i)
              case 1 => x(i) + x(i - 1)
              case 2 => x(i) + 2 * x(i - 1) - x(i - 2)
              case 3 => x(i) + 3 * x(i - 1) - 3 * x(i - 2) + x(i - 3)
              case 4 => x(i) + 4 * x(i - 1) - 6 * x(i - 2) + 4 * x(i - 3) - x(i - 4)
            }
            i += 1
          }
        case t if t >= 32 =>
          throw new IllegalArgumentException(
            s"LPC subframes (order ${t - 31}) not supported — fixed-predictor subset only")
        case t =>
          throw new IllegalArgumentException(s"reserved subframe type $t")
      }
      br.alignToByte()
      val expectedCrc16 = ((payload.lift(br.pos).map(_ & 0xff).getOrElse(
        throw new IllegalArgumentException("FLAC truncated at frame CRC-16")) << 8) |
        payload.lift(br.pos + 1).map(_ & 0xff).getOrElse(
          throw new IllegalArgumentException("FLAC truncated at frame CRC-16")))
      require(crc16(payload, frameStart, br.pos) == expectedCrc16,
        s"frame CRC-16 mismatch at offset $frameStart")
      var i = 0
      while (i < blockSize) {
        val v = x(i) << wasted
        require(v >= Short.MinValue && v <= Short.MaxValue,
          s"decoded sample $v out of 16-bit range at index ${got + i}")
        samples(got + i) = v.toShort
        i += 1
      }
      got += blockSize
      off = br.pos + 2
    }
    // MD5 integrity: the spec's own whole-stream proof
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val le = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      le(i * 2) = (samples(i) & 0xff).toByte
      le(i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    md5.update(le)
    require(java.util.Arrays.equals(md5.digest(), streamMd5),
      "decoded samples fail STREAMINFO's MD5 signature")
    FlacAudio(sampleRate, samples)
  }

  /** Rice-coded residual per the spec: 2-bit method (4- or 5-bit params),
    * 4-bit partition order, per-partition parameter with the all-ones
    * escape to fixed-width raw. Fills `x(order until blockSize)` with raw
    * residuals (caller reconstructs). */
  private def decodeResidual(br: BitReader, x: Array[Int], order: Int, blockSize: Int): Unit = {
    val method = br.readBits(2).toInt
    require(method <= 1, s"reserved residual coding method $method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val partOrder = br.readBits(4).toInt
    val nParts = 1 << partOrder
    require(blockSize % nParts == 0, s"partition order $partOrder does not divide block size $blockSize")
    require(blockSize >> partOrder > 0, "empty Rice partition")
    var idx = order
    var p = 0
    while (p < nParts) {
      val count = (blockSize >> partOrder) - (if (p == 0) order else 0)
      require(count >= 0, s"partition 0 smaller than predictor order $order")
      val param = br.readBits(paramBits).toInt
      if (param == escape) {
        val width = br.readBits(5).toInt
        var i = 0
        while (i < count) {
          x(idx) = if (width == 0) 0 else {
            val raw = br.readBits(width)
            ((raw << (64 - width)) >> (64 - width)).toInt
          }
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < count) {
          val q = br.readUnary().toLong
          val u = (q << param) | (if (param > 0) br.readBits(param) else 0L)
          require(u <= Int.MaxValue.toLong * 2 + 1, "Rice residual overflows")
          x(idx) = (((u >>> 1) ^ -(u & 1L))).toInt // un-zigzag
          idx += 1; i += 1
        }
      }
      p += 1
    }
    require(idx == blockSize, s"residual decode filled $idx of $blockSize")
  }

  /** Deterministic synthetic fixture: the SAME seed-pitched sine as
    * [[MediaCodecs.synthWav]] (220 + seed mod 220 Hz, half amplitude,
    * truncation-quantized), FLAC-encoded — so the closed-form RMS theory
    * shared with the WAV gate pins the full lossless encode→decode path. */
  def synthFlac(nSamples: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    val freq = 220.0 + java.lang.Math.floorMod(seed, 220L).toDouble
    val samples = new Array[Short](nSamples)
    var i = 0
    while (i < nSamples) {
      samples(i) = (0.5 * 32767.0 *
        math.sin(2.0 * math.Pi * freq * i / sampleRate)).toInt.toShort
      i += 1
    }
    encodeFlac(samples, sampleRate)
  }

  /** Audio feature vector over a FLAC payload — identical 16-float kernel
    * shape as [[MediaCodecs.wavFeatures]] (RMS, zero-cross rate, kHz,
    * duration, 12-bin |amplitude| histogram), computed over the decoded
    * samples, so identical PCM yields bit-identical features regardless of
    * container format. */
  def flacFeatures(payload: Array[Byte]): Array[Float] = {
    val audio = decodeFlac(payload)
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
