package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** FLAC codec tests: lossless round-trip identity over every input class
  * (the whole point of FLAC — no fixture subspace needed), stream-framing
  * spec pins, MD5/CRC integrity enforcement, and corruption/truncation
  * totality over untrusted bytes. */
class FlacCodecSpec extends AnyFunSuite {

  private def sine(n: Int, seed: Long): Array[Short] = {
    val freq = 220.0 + java.lang.Math.floorMod(seed, 220L).toDouble
    Array.tabulate(n)(i =>
      (0.5 * 32767.0 * math.sin(2.0 * math.Pi * freq * i / 16000.0)).toInt.toShort)
  }

  test("lossless: sine round-trips bit-exactly, including multi-frame streams") {
    for ((n, seed) <- Seq((2000, 5L), (4096, 0L), (9000, 17L), (1, 3L), (4097, 200L))) {
      val out = FlacCodec.decodeFlac(FlacCodec.encodeFlac(sine(n, seed), 16000))
      assert(out.sampleRate == 16000)
      assert(out.samples.sameElements(sine(n, seed)), s"n=$n seed=$seed")
    }
  }

  test("lossless: constant, ramp, step, extreme and pseudo-random PCM all round-trip exactly") {
    val cases: Seq[Array[Short]] = Seq(
      Array.fill(5000)(1234.toShort),                         // CONSTANT subframes
      Array.tabulate(5000)(i => (i - 2500).toShort),          // linear ramp (order-2 residual 0)
      Array.tabulate(5000)(i => if (i < 2500) Short.MinValue else Short.MaxValue), // step + extremes
      Array.tabulate(6000)(i => (((i * 2654435761L) >> 7) & 0xffff).toShort), // wideband noise
      Array.tabulate(100)(i => ((i * 37) % 251 - 125).toShort)) // short single frame
    for ((pcm, i) <- cases.zipWithIndex) {
      val out = FlacCodec.decodeFlac(FlacCodec.encodeFlac(pcm, 44100))
      assert(out.sampleRate == 44100 && out.samples.sameElements(pcm), s"case $i")
    }
  }

  test("stream framing: fLaC magic, STREAMINFO geometry, frame sync code") {
    val pcm = sine(3000, 9L)
    val fl = FlacCodec.encodeFlac(pcm, 16000)
    assert(new String(fl.slice(0, 4), "US-ASCII") == "fLaC")
    assert((fl(4) & 0xff) == 0x80, "single last-metadata STREAMINFO block")
    assert(((fl(5) & 0xff) << 16 | (fl(6) & 0xff) << 8 | (fl(7) & 0xff)) == 34)
    // sample rate: 20 bits starting at byte 8+10
    val sr = ((fl(18) & 0xff) << 12) | ((fl(19) & 0xff) << 4) | ((fl(20) & 0xff) >> 4)
    assert(sr == 16000)
    // total samples: low 4 bits of byte 21 + bytes 22..25
    val total = ((fl(21) & 0x0f).toLong << 32) | ((fl(22) & 0xff).toLong << 24) |
      ((fl(23) & 0xff) << 16) | ((fl(24) & 0xff) << 8) | (fl(25) & 0xff)
    assert(total == 3000)
    // first frame header starts right after the 4+4+34+16-byte prologue
    assert((fl(42) & 0xff) == 0xff && ((fl(43) & 0xff) >> 2) == 0x3e, "frame sync 0b11111111111110")
  }

  test("integrity: flipping one PCM-derived byte breaks CRC or MD5 as a typed error") {
    val fl = FlacCodec.encodeFlac(sine(2000, 7L), 16000)
    // corrupt one byte inside the first frame's entropy data (well past the header)
    val c = fl.clone
    c(c.length - 5) = (c(c.length - 5) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException](FlacCodec.decodeFlac(c))
    assert(e.getMessage.contains("CRC") || e.getMessage.contains("MD5") ||
      e.getMessage.contains("truncated") || e.getMessage.contains("corrupt"),
      s"got: ${e.getMessage}")
  }

  test("corruption totality: every single-byte flip decodes-or-raises IAE, never hangs or OOBs") {
    val fl = FlacCodec.encodeFlac(sine(500, 42L), 16000)
    var other = 0
    for (i <- fl.indices) {
      val c = fl.clone
      c(i) = (c(i) ^ 0x55).toByte
      try FlacCodec.decodeFlac(c)
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable =>
          other += 1
          if (other == 1) info(s"non-IAE escape at byte $i: ${e.getClass} ${e.getMessage}")
      }
    }
    assert(other == 0, s"$other corrupt payloads escaped the typed-error contract")
  }

  test("truncation totality: every strict prefix raises IllegalArgumentException") {
    val fl = FlacCodec.encodeFlac(sine(300, 3L), 16000)
    for (len <- 0 until fl.length) {
      intercept[IllegalArgumentException] {
        FlacCodec.decodeFlac(java.util.Arrays.copyOf(fl, len))
      }
    }
  }

  test("synthFlac features agree bit-for-bit with wavFeatures on the same synthetic PCM") {
    for (seed <- Seq(1L, 5L, 100L)) {
      val n = 2000 + java.lang.Math.floorMod(seed, 1000L).toInt
      val fromFlac = FlacCodec.flacFeatures(FlacCodec.synthFlac(n, 16000, seed))
      val fromWav = MediaCodecs.wavFeatures(MediaCodecs.synthWav(n, 16000, seed))
      assert(fromFlac.sameElements(fromWav), s"seed=$seed")
    }
  }

  test("hostile totalSamples header values are typed errors, never giant or negative allocations") {
    val fl = FlacCodec.encodeFlac(sine(100, 1L), 16000)
    // the 36-bit total-samples field: low nibble of byte 21 + bytes 22..25
    def withTotal(total: Long): Array[Byte] = {
      val c = fl.clone
      c(21) = ((c(21) & 0xf0) | ((total >> 32) & 0x0f)).toByte
      c(22) = ((total >> 24) & 0xff).toByte
      c(23) = ((total >> 16) & 0xff).toByte
      c(24) = ((total >> 8) & 0xff).toByte
      c(25) = (total & 0xff).toByte
      c
    }
    for (total <- Seq(3000000000L, 1L << 32, Int.MaxValue.toLong, (1L << 28) + 1)) {
      val e = intercept[IllegalArgumentException](FlacCodec.decodeFlac(withTotal(total)))
      assert(e.getMessage.contains("implausible"), s"total=$total: ${e.getMessage}")
    }
  }

  test("unsupported shapes are typed errors with actionable messages") {
    // craft a stereo STREAMINFO by flipping the channels-1 field
    val fl = FlacCodec.encodeFlac(sine(100, 1L), 16000)
    val stereo = fl.clone
    // channels-1 sits in bits 4..6 of byte 20 (after 20-bit sample rate)
    stereo(20) = ((stereo(20) & 0xf1) | (1 << 1)).toByte
    val e = intercept[IllegalArgumentException](FlacCodec.decodeFlac(stereo))
    assert(e.getMessage.contains("mono"))
    intercept[IllegalArgumentException](FlacCodec.decodeFlac("nope".getBytes))
  }
}
