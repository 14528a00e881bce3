package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM codec tests: the BMP/WAV paths are REAL parsers, so they are
  * pinned against the byte-level format spec, not just round-trips. */
class MediaCodecsSpec extends AnyFunSuite {

  test("BMP: synth → decode round-trips exact pixels (spec layout: bottom-up BGR, padded rows)") {
    val seed = 7L
    val s = (seed & 0xff).toInt
    val img = MediaCodecs.decodeBmp(MediaCodecs.synthBmp(16, 12, seed))
    assert(img.width == 16 && img.height == 12)
    for (x <- 0 until 16; y <- 0 until 12) {
      val (r, g, b) = img.rgb(x, y)
      assert(r == (x * 7 + s) % 256 && g == (y * 5 + s) % 256 && b == (x + y + s) % 256,
        s"pixel ($x,$y)")
    }
    // width 15 forces row padding (45 bytes → 48): still exact
    val padded = MediaCodecs.decodeBmp(MediaCodecs.synthBmp(15, 3, seed))
    assert(padded.rgb(14, 2) == ((14 * 7 + s) % 256, (2 * 5 + s) % 256, (14 + 2 + s) % 256))
  }

  test("BMP: nearest-neighbor resize samples real source pixels and emits a valid BMP") {
    val src = MediaCodecs.synthBmp(16, 12, 3L)
    val out = MediaCodecs.decodeBmp(MediaCodecs.resizeBmp(src, 8, 6))
    val orig = MediaCodecs.decodeBmp(src)
    assert(out.width == 8 && out.height == 6)
    for (x <- 0 until 8; y <- 0 until 6)
      assert(out.rgb(x, y) == orig.rgb(x * 2, y * 2), s"pixel ($x,$y)")
  }

  test("BMP features: means match a reference loop; luma histogram sums to 1") {
    val payload = MediaCodecs.synthBmp(16, 12, 9L)
    val img = MediaCodecs.decodeBmp(payload)
    val f = MediaCodecs.bmpFeatures(payload)
    val n = img.width * img.height
    val meanR = (0 until n).map(i => img.pixels(i * 3) & 0xff).sum.toFloat / n / 255f
    assert(math.abs(f(0) - meanR) < 1e-6)
    assert(f(3) == 16f && f(4) == 12f)
    assert(math.abs((5 until 16).map(f).sum - 1f) < 1e-5)
  }

  test("WAV: synth → decode recovers PCM-16 samples; sine RMS and zero-crossings match theory") {
    val payload = MediaCodecs.synthWav(4000, 16000, 5L)
    val audio = MediaCodecs.decodeWav(payload)
    assert(audio.sampleRate == 16000 && audio.samples.length == 4000)
    // first sample of a sine is 0; quarter-period near the crest
    assert(audio.samples(0) == 0)
    val f = MediaCodecs.wavFeatures(payload)
    val freq = 220.0 + (5L % 220)
    assert(math.abs(f(0) - 0.5 / math.sqrt(2)) < 0.01, s"rms ${f(0)}")   // A·/√2
    assert(math.abs(f(1) - 2 * freq / 16000) < 0.01, s"zcr ${f(1)}")      // 2f/fs
    assert(f(2) == 16f && math.abs(f(3) - 0.25f) < 1e-6)
    assert(math.abs((4 until 16).map(f).sum - 1f) < 1e-5)
  }

  test("BMP: top-down (negative height) images decode; lying headers raise, not crash") {
    // flip a synth image to top-down: negate height, reverse row order
    val src = MediaCodecs.synthBmp(5, 4, 2L)
    val rowSize = (5 * 3 + 3) / 4 * 4
    val topDown = src.clone()
    val h = -4
    topDown(22) = (h & 0xff).toByte; topDown(23) = ((h >> 8) & 0xff).toByte
    topDown(24) = ((h >> 16) & 0xff).toByte; topDown(25) = ((h >> 24) & 0xff).toByte
    for (y <- 0 until 4)
      System.arraycopy(src, 54 + (4 - 1 - y) * rowSize, topDown, 54 + y * rowSize, rowSize)
    assert(MediaCodecs.decodeBmp(topDown).pixels.toSeq ==
      MediaCodecs.decodeBmp(src).pixels.toSeq)
    // truncated payload: IllegalArgumentException, not ArrayIndexOutOfBounds
    intercept[IllegalArgumentException] {
      MediaCodecs.decodeBmp(src.slice(0, 60))
    }
  }

  test("WAV: corrupt chunk sizes raise instead of hanging or overreading") {
    val base = MediaCodecs.synthWav(100, 8000, 1L)
    // negative chunk size (would otherwise loop forever at offset 12)
    val negSize = base.clone()
    negSize(16) = 0xf8.toByte; negSize(17) = 0xff.toByte
    negSize(18) = 0xff.toByte; negSize(19) = 0xff.toByte
    intercept[IllegalArgumentException] { MediaCodecs.decodeWav(negSize) }
    // data chunk claiming more bytes than the payload holds
    val tooBig = base.clone()
    tooBig(40) = 0xff.toByte; tooBig(41) = 0xff.toByte
    intercept[IllegalArgumentException] { MediaCodecs.decodeWav(tooBig) }
  }

  test("WAV: chunk walker skips unknown chunks per RIFF spec") {
    val base = MediaCodecs.synthWav(100, 8000, 1L)
    // splice a LIST chunk between fmt and data
    val fmtEnd = 12 + 8 + 16
    val extra = Array[Byte]('L', 'I', 'S', 'T', 4, 0, 0, 0, 1, 2, 3, 4)
    val spliced = base.slice(0, fmtEnd) ++ extra ++ base.slice(fmtEnd, base.length)
    val audio = MediaCodecs.decodeWav(spliced)
    assert(audio.sampleRate == 8000 && audio.samples.length == 100)
  }

  // =================== PNG ===================

  private def gradientRgb(w: Int, h: Int, seed: Long): Array[Byte] = {
    val s = (seed & 0xff).toInt
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      px(o) = (((x * 7 + s) % 256) & 0xff).toByte
      px(o + 1) = (((y * 5 + s) % 256) & 0xff).toByte
      px(o + 2) = (((x + y + s) % 256) & 0xff).toByte
    }
    px
  }

  test("PNG: encode → decode round-trips exact pixels under ALL FIVE filter types") {
    val (w, h) = (23, 17) // non-multiple-of-4 width exercises odd strides
    val px = gradientRgb(w, h, 9L)
    for (ft <- 0 to 4) {
      val img = MediaCodecs.decodePng(MediaCodecs.encodePng(w, h, px, filterType = ft))
      assert(img.width == w && img.height == h, s"filter $ft geometry")
      assert(java.util.Arrays.equals(img.pixels, px), s"filter $ft pixels differ")
    }
  }

  test("PNG: RGBA (color type 6) round-trips with alpha dropped") {
    val (w, h) = (11, 7)
    val px = gradientRgb(w, h, 3L)
    for (ft <- Seq(1, 4)) {
      val img = MediaCodecs.decodePng(
        MediaCodecs.encodePng(w, h, px, filterType = ft, withAlpha = true))
      assert(java.util.Arrays.equals(img.pixels, px), s"RGBA filter $ft")
    }
  }

  test("PNG ≡ BMP: same gradient, two container formats, bit-identical features") {
    for (seed <- Seq(0L, 1L, 2L, 3L, 4L, 77L)) { // covers every rotated filter
      val (w, h) = (16 + (seed % 16).toInt, 16 + (seed % 12).toInt)
      val fPng = MediaCodecs.pngFeatures(MediaCodecs.synthPng(w, h, seed))
      val fBmp = MediaCodecs.bmpFeatures(MediaCodecs.synthBmp(w, h, seed))
      assert(fPng.toSeq == fBmp.toSeq, s"seed $seed: PNG and BMP features diverge")
    }
  }

  test("encodeBmp: arbitrary pixel content round-trips exactly (incl. padded odd widths)") {
    for ((w, h) <- Seq((16, 12), (15, 3), (7, 9))) {
      val rgb = Array.tabulate(w * h * 3)(i => ((i * 131 + 17) % 256).toByte)
      val img = MediaCodecs.decodeBmp(MediaCodecs.encodeBmp(w, h, rgb))
      assert(img.width == w && img.height == h)
      assert(img.pixels.sameElements(rgb), s"${w}x$h")
    }
  }

  test("PNG: ancillary chunks are skipped; IDAT may split across chunks") {
    val base = MediaCodecs.encodePng(9, 5, gradientRgb(9, 5, 2L), filterType = 2)
    // re-frame: signature + IHDR, then a tEXt chunk, then the IDAT split in two
    def be4(v: Int) = Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(typ: String, data: Array[Byte]) = {
      val t = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32; crc.update(t); crc.update(data)
      be4(data.length) ++ t ++ data ++ be4(crc.getValue.toInt)
    }
    val ihdrLen = java.nio.ByteBuffer.wrap(base, 8, 4).getInt
    val ihdrEnd = 8 + 12 + ihdrLen
    val idatLen = java.nio.ByteBuffer.wrap(base, ihdrEnd, 4).getInt
    val idat = base.slice(ihdrEnd + 8, ihdrEnd + 8 + idatLen)
    val (i1, i2) = idat.splitAt(idatLen / 2)
    val reframed = base.slice(0, ihdrEnd) ++
      chunk("tEXt", "comment".getBytes("US-ASCII")) ++
      chunk("IDAT", i1) ++ chunk("IDAT", i2) ++ chunk("IEND", Array.empty)
    val img = MediaCodecs.decodePng(reframed)
    assert(java.util.Arrays.equals(img.pixels, gradientRgb(9, 5, 2L)))
  }

  test("PNG theory pins hold for NEGATIVE ids (floorMod geometry)") {
    for (id <- Seq(-1L, -7L, -16L)) {
      val w = 16 + java.lang.Math.floorMod(id, 16L).toInt
      val h = 16 + java.lang.Math.floorMod(id, 12L).toInt
      val f = MediaCodecs.pngFeatures(MediaCodecs.synthPng(w, h, id))
      assert(f(0) == graft.operators.Multimodal.theoryPngFeature0(id), s"id $id feat0")
      assert(f(3) == w.toFloat && f(4) == h.toFloat, s"id $id dims")
    }
  }

  test("PNG: corrupt payloads raise bounded errors, never crash or hang") {
    val good = MediaCodecs.synthPng(20, 16, 5L)
    // flipped IDAT byte → CRC mismatch
    val badCrc = good.clone()
    badCrc(good.length - 20) = (badCrc(good.length - 20) ^ 0x41).toByte
    val e1 = intercept[IllegalArgumentException] { MediaCodecs.decodePng(badCrc) }
    assert(e1.getMessage.contains("CRC"))
    // truncated mid-chunk
    intercept[IllegalArgumentException] {
      MediaCodecs.decodePng(good.slice(0, good.length / 2))
    }
    // not a PNG at all
    intercept[IllegalArgumentException] {
      MediaCodecs.decodePng(MediaCodecs.synthBmp(8, 8, 1L))
    }
    // header claims wrong geometry vs the deflated stream: rebuild IHDR
    // with height+1 and a fresh CRC → inflate must stop at a typed error
    def be4(v: Int) = Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    val lying = good.clone()
    System.arraycopy(be4(17), 0, lying, 8 + 8 + 4, 4) // height 16 → 17
    val crc = new java.util.zip.CRC32
    crc.update(lying, 12, 4 + 13)
    System.arraycopy(be4(crc.getValue.toInt), 0, lying, 8 + 8 + 13, 4)
    val e2 = intercept[IllegalArgumentException] { MediaCodecs.decodePng(lying) }
    assert(e2.getMessage.contains("pixel stream"), e2.getMessage)
  }
}
