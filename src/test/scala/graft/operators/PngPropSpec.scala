package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property contract for the pure-JDK PNG codec: for ARBITRARY pixel
  * buffers, dimensions, filter types and color modes, decode ∘ encode is
  * the identity on pixels; and ANY single-byte corruption of an encoded
  * payload raises a typed IllegalArgumentException (the CRC / framing /
  * bounded-inflate net) — never wrong pixels, never an unbounded error,
  * never a hang. Pure JVM (no Spark session): thousands of cases in
  * seconds. */
class PngPropSpec extends AnyFunSuite {

  private val genImage: Gen[(Int, Int, Array[Byte])] = for {
    w <- Gen.chooseNum(1, 40)
    h <- Gen.chooseNum(1, 30)
    px <- Gen.containerOfN[Array, Byte](w * h * 3, Gen.chooseNum(-128, 127).map(_.toByte))
  } yield (w, h, px)

  test("decode ∘ encode ≡ identity for arbitrary pixels × filters × color modes") {
    val prop = Prop.forAll(genImage, Gen.chooseNum(0, 4), Gen.oneOf(true, false)) {
      case ((w, h, px), ft, alpha) =>
        val img = MediaCodecs.decodePng(
          MediaCodecs.encodePng(w, h, px, filterType = ft, withAlpha = alpha))
        img.width == w && img.height == h && java.util.Arrays.equals(img.pixels, px)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("any single-byte corruption raises IllegalArgumentException, nothing else") {
    val prop = Prop.forAll(genImage, Gen.chooseNum(0, 4),
      Gen.chooseNum(0, Int.MaxValue), Gen.chooseNum(1, 255)) {
      case ((w, h, px), ft, posSeed, xorByte) =>
        val enc = MediaCodecs.encodePng(w, h, px, filterType = ft)
        val pos = posSeed % enc.length
        val bad = enc.clone()
        bad(pos) = (bad(pos) ^ xorByte).toByte
        try {
          val img = MediaCodecs.decodePng(bad)
          // astronomically unlikely (a 2^-32 CRC collision would be
          // needed) — but if a flip survives, pixels must still be right
          // (e.g. a flip inside zlib padding bits that inflates equally)
          java.util.Arrays.equals(img.pixels, px)
        } catch {
          case _: IllegalArgumentException => true
          case _: Throwable => false
        }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }
}
