package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property contract for the baseline JPEG codec: over the whole
  * exactly-representable subspace (arbitrary block-flat grayscale content
  * at arbitrary block-aligned geometry), decode ∘ encode is the IDENTITY;
  * arbitrary NON-flat grayscale content with [[JpegCodec.FlatQ8]] stays
  * within the quantizer's worst-case pixel bound; and random single-byte
  * corruptions decode-or-raise typed errors. */
class JpegPropSpec extends AnyFunSuite {

  private val genGeom: Gen[(Int, Int, Long)] = for {
    wb <- Gen.chooseNum(1, 6)
    hb <- Gen.chooseNum(1, 5)
    seed <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
  } yield (wb * 8, hb * 8, seed)

  test("block-flat grayscale: decode ∘ encode ≡ identity over random geometry × seeds") {
    val prop = Prop.forAll(genGeom) { case (w, h, seed) =>
      val img = JpegCodec.decodeJpeg(JpegCodec.synthJpeg(w, h, seed))
      img.width == w && img.height == h &&
        java.util.Arrays.equals(img.pixels, JpegCodec.blockFlatPixels(w, h, seed))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("arbitrary grayscale content: error bounded by the flat quantizer, never structural") {
    // FlatQ8: every coefficient quantizes with error <= 4; the IDCT of the
    // 64-term error block is bounded well under 64 gray levels. A
    // geometry/ordering bug shifts planes and diverges by ~128.
    val gen = for {
      (w, h, seed) <- genGeom
      r = new scala.util.Random(seed)
    } yield (w, h, Array.tabulate(w * h * 3) { i =>
      val p = i / 3; val v = ((p * 37 + seed) % 256 + r.nextInt(64)).toByte
      v
    })
    val prop = Prop.forAll(gen) { case (w, h, rgbRaw) =>
      // grayscale the content (same value per channel)
      val rgb = new Array[Byte](w * h * 3)
      var p = 0
      while (p < w * h) {
        val v = rgbRaw(p * 3)
        rgb(p * 3) = v; rgb(p * 3 + 1) = v; rgb(p * 3 + 2) = v
        p += 1
      }
      val img = JpegCodec.decodeJpeg(
        JpegCodec.encodeJpeg(w, h, rgb, grayscale = true, qtab = JpegCodec.FlatQ8))
      var maxErr = 0
      var i = 0
      while (i < w * h * 3) {
        maxErr = math.max(maxErr, math.abs((img.pixels(i) & 0xff) - (rgb(i) & 0xff)))
        i += 1
      }
      maxErr <= 48
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  test("random single-byte corruption decodes-or-raises IllegalArgumentException") {
    val prop = Prop.forAll(genGeom, Gen.chooseNum(0, 1 << 20)) { case ((w, h, seed), pick) =>
      val jp = JpegCodec.synthJpeg(w, h, seed)
      val i = pick % jp.length
      val c = jp.clone
      c(i) = (c(i) ^ (1 + (pick % 255))).toByte
      try { JpegCodec.decodeJpeg(c); true }
      catch { case _: IllegalArgumentException => true }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }
}
