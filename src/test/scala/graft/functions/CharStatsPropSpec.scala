package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property contract for the fused [[TextQuality.charStats]] kernel: for
  * ARBITRARY unicode strings and every n in 1..8, the packed-long /
  * wide-set split must agree exactly with a naive per-gram recomputation
  * over code points — the invariant the `d_text_normalize` oracle leans
  * on. Pure JVM (no Spark session needed): the kernel is a static
  * function, so thousands of cases run in milliseconds. */
class CharStatsPropSpec extends AnyFunSuite {

  private def naive(s: String, n: Int): (Int, Int, Int) = {
    val cps = s.codePoints().toArray
    val nChars = cps.length
    if (nChars <= n) (nChars, 1, 1)
    else {
      val grams = (0 to nChars - n).map(i =>
        new String(cps.slice(i, i + n), 0, n))
      (nChars, grams.length, grams.distinct.length)
    }
  }

  // mix of ASCII, multibyte BMP, astral (surrogate-pair) and boundary chars
  private val genChar: Gen[String] = Gen.frequency(
    6 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.oneOf(" ", ".", "\t"),
    2 -> Gen.oneOf("é", "ü", "日", "本", "語", "ẞ"),
    1 -> Gen.oneOf("😀", "🤖")) // astral: 😀 🤖
  private val genText: Gen[String] =
    Gen.chooseNum(0, 120).flatMap(len =>
      Gen.listOfN(len, genChar).map(_.mkString))

  test("fused charStats ≡ naive code-point recomputation for arbitrary unicode") {
    val prop = Prop.forAll(genText, Gen.chooseNum(1, 8)) { (s: String, n: Int) =>
      val got = TextQuality.charStats(UTF8String.fromString(s), n)
      val (nc, ng, nd) = naive(s, n)
      got.getInt(0) == nc && got.getInt(1) == ng && got.getInt(2) == nd
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(2000), prop)
    assert(res.passed, res.status.toString)
  }
}
