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
}
