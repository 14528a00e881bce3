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

  // ---- repetition kernel: same treatment over arbitrary token streams ----

  private def naiveRep(s: String): (Int, Int, Int, Int, Int, Int) = {
    val toks = s.split(" ", -1)
    val n = toks.length
    val maxFreq = if (n == 0) 0 else toks.groupBy(identity).values.map(_.length).max
    var maxRun = if (n > 0) 1 else 0
    var run = 1
    for (i <- 1 until n) {
      if (toks(i) == toks(i - 1)) { run += 1; if (run > maxRun) maxRun = run }
      else run = 1
    }
    val n3 = if (n >= 3) n - 2 else 0
    val grams = (0 until n3).map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}")
    val dup3 = grams.length - grams.distinct.length
    (n, toks.distinct.length, maxFreq, n3, dup3, maxRun)
  }

  private val genToken: Gen[String] =
    Gen.frequency(5 -> Gen.oneOf("a", "b", "c", "the", "=", "é"),
      1 -> Gen.alphaNumStr.map(_.take(4)))
  private val genDoc: Gen[String] =
    Gen.chooseNum(0, 60).flatMap(len =>
      Gen.listOfN(len, genToken).map(_.mkString(" ")))

  test("fused repetitionStats ≡ naive recomputation for arbitrary token streams") {
    val prop = Prop.forAll(genDoc) { (s: String) =>
      val got = TextQuality.stats(UTF8String.fromString(s))
      val (n, nd, mf, n3, d3, mr) = naiveRep(s)
      got.getInt(0) == n && got.getInt(1) == nd && got.getInt(2) == mf &&
        got.getInt(3) == n3 && got.getInt(4) == d3 && got.getInt(5) == mr
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(2000), prop)
    assert(res.passed, res.status.toString)
  }
}
