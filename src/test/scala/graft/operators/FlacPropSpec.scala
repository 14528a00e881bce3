package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property contract for the FLAC codec: for ARBITRARY 16-bit PCM —
  * any length (including empty and multi-frame), any sample values —
  * decode ∘ encode is the IDENTITY (FLAC is lossless; this is the whole
  * claim, over the full input space, not fixture classes), and ANY
  * single-byte corruption of an encoded stream decodes-or-raises a typed
  * IllegalArgumentException (the CRC-8/CRC-16/MD5 net) — never wrong
  * samples. Pure JVM: hundreds of cases in seconds. */
class FlacPropSpec extends AnyFunSuite {

  private val genPcm: Gen[Array[Short]] = for {
    n <- Gen.frequency(
      (1, Gen.const(0)),
      (4, Gen.chooseNum(1, 300)),
      (2, Gen.chooseNum(4000, 9000))) // spans the 4096 frame boundary
    kind <- Gen.chooseNum(0, 3)
    seed <- Gen.chooseNum(0L, Long.MaxValue / 2)
  } yield {
    val r = new scala.util.Random(seed)
    kind match {
      case 0 => Array.fill(n)(r.nextInt(65536).toShort)            // white noise
      case 1 => val v = r.nextInt(65536).toShort; Array.fill(n)(v)  // constant
      case 2 => Array.tabulate(n)(i => (i * 13 + r.nextInt(3)).toShort) // near-linear
      case 3 => Array.tabulate(n)(i =>                              // smooth wave
        (16000 * math.sin(i / (1.0 + (seed % 37)))).toInt.toShort)
    }
  }

  test("decode ∘ encode ≡ identity for arbitrary PCM (any length, any content)") {
    val prop = Prop.forAll(genPcm) { pcm =>
      val out = FlacCodec.decodeFlac(FlacCodec.encodeFlac(pcm, 16000))
      out.sampleRate == 16000 && java.util.Arrays.equals(out.samples, pcm)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("any single-byte corruption decodes-or-raises IAE; a changed sample never survives MD5") {
    val prop = Prop.forAll(genPcm.suchThat(_.length > 0), Gen.chooseNum(0, 1 << 20)) {
      (pcm, pick) =>
        val fl = FlacCodec.encodeFlac(pcm, 16000)
        val i = pick % fl.length
        val c = fl.clone
        c(i) = (c(i) ^ (1 + (pick % 255))).toByte
        try {
          val out = FlacCodec.decodeFlac(c)
          // decode surviving corruption is only acceptable if the samples
          // are STILL exactly the input (the flipped byte was redundant
          // framing it tolerates, e.g. a skipped metadata region)
          java.util.Arrays.equals(out.samples, pcm)
        } catch {
          case _: IllegalArgumentException => true
        }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
