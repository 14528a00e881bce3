package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG codec tests: the exact-subspace round trip (flat 8x8
  * blocks are DC-only, so a REAL lossy DCT codec reproduces them
  * bit-for-bit — the theory behind the d_multimodal_jpeg gate), the lossy
  * color paths under tolerance pins, marker-structure spec pins, and
  * corruption totality over untrusted bytes. */
class JpegCodecSpec extends AnyFunSuite {

  private def blockFlatGray(w: Int, h: Int, seed: Int): Array[Byte] =
    JpegCodec.blockFlatPixels(w, h, seed.toLong)

  test("grayscale block-flat images round-trip BIT-EXACTLY through the full Huffman/DCT path") {
    for (id <- Seq(0L, 1L, 5L, 17L, 123L, 254L, 255L, -7L)) {
      val w = 16 + 8 * java.lang.Math.floorMod(id, 3L).toInt
      val h = 16 + 8 * java.lang.Math.floorMod(id, 2L).toInt
      val img = JpegCodec.decodeJpeg(JpegCodec.synthJpeg(w, h, id))
      assert(img.width == w && img.height == h, s"dims for id=$id")
      val s = (id & 0xff).toInt
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((x / 8) * 7 + (y / 8) * 5 + s) % 256
        assert(img.rgb(x, y) == ((v, v, v)), s"pixel ($x,$y) id=$id")
      }
    }
  }

  test("marker structure: SOI/APP0-JFIF/DQT/SOF0/DHT/SOS/EOI framing with big-endian geometry") {
    val jp = JpegCodec.synthJpeg(24, 16, 9L)
    assert((jp(0) & 0xff) == 0xff && (jp(1) & 0xff) == 0xd8, "SOI")
    assert((jp(2) & 0xff) == 0xff && (jp(3) & 0xff) == 0xe0, "APP0 first")
    assert(new String(jp.slice(6, 10), "US-ASCII") == "JFIF")
    assert((jp(jp.length - 2) & 0xff) == 0xff && (jp(jp.length - 1) & 0xff) == 0xd9, "EOI")
    // find SOF0 and pin the big-endian height/width fields
    val sof = jp.indices.dropRight(1).find(i =>
      (jp(i) & 0xff) == 0xff && (jp(i + 1) & 0xff) == 0xc0).get
    val height = ((jp(sof + 5) & 0xff) << 8) | (jp(sof + 6) & 0xff)
    val width = ((jp(sof + 7) & 0xff) << 8) | (jp(sof + 8) & 0xff)
    assert(width == 24 && height == 16)
    assert((jp(sof + 4) & 0xff) == 8, "8-bit precision")
    assert((jp(sof + 9) & 0xff) == 1, "grayscale = 1 component")
  }

  test("color 4:4:4: gray-content block-flat images round-trip within YCbCr rounding (<=2)") {
    val (w, h) = (24, 16)
    val rgb = blockFlatGray(w, h, 33)
    val img = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(w, h, rgb, grayscale = false))
    var maxErr = 0
    for (i <- 0 until w * h * 3)
      maxErr = math.max(maxErr, math.abs((img.pixels(i) & 0xff) - (rgb(i) & 0xff)))
    assert(maxErr <= 2, s"maxErr=$maxErr")
  }

  test("color 4:2:0 with restart markers: subsampled MCU interleave + RSTn resync decode") {
    val (w, h) = (32, 32)
    val rgb = blockFlatGray(w, h, 7)
    val jp = JpegCodec.encodeJpeg(w, h, rgb, grayscale = false,
      subsample420 = true, restartInterval = 1)
    // DRI marker present, and at least one RST0 in the scan
    assert(jp.indices.dropRight(1).exists(i =>
      (jp(i) & 0xff) == 0xff && (jp(i + 1) & 0xff) == 0xdd), "DRI emitted")
    assert(jp.indices.dropRight(1).exists(i =>
      (jp(i) & 0xff) == 0xff && (jp(i + 1) & 0xff) == 0xd0), "RST0 emitted")
    val img = JpegCodec.decodeJpeg(jp)
    var maxErr = 0
    for (i <- 0 until w * h * 3)
      maxErr = math.max(maxErr, math.abs((img.pixels(i) & 0xff) - (rgb(i) & 0xff)))
    assert(maxErr <= 2, s"maxErr=$maxErr")
  }

  test("non-block-aligned dimensions: edge-padded encode, cropped decode, std quant table") {
    val (w, h) = (19, 13)
    // smooth low-frequency content: lossy error stays small under the std
    // table, while a geometry/ordering bug would diverge by ~100s
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (40 + 5 * x + 7 * y).toByte
      val o = (y * w + x) * 3; rgb(o) = v; rgb(o + 1) = v; rgb(o + 2) = v
    }
    val img = JpegCodec.decodeJpeg(
      JpegCodec.encodeJpeg(w, h, rgb, grayscale = true, qtab = JpegCodec.StdLuminanceQ))
    assert(img.width == w && img.height == h)
    var maxErr = 0
    for (i <- 0 until w * h * 3)
      maxErr = math.max(maxErr, math.abs((img.pixels(i) & 0xff) - (rgb(i) & 0xff)))
    assert(maxErr <= 16, s"maxErr=$maxErr")
  }

  test("jpegFeatures agrees bit-for-bit with the shared RGB kernel on decoded pixels") {
    val jp = JpegCodec.synthJpeg(16, 24, 5L)
    val f = JpegCodec.jpegFeatures(jp)
    assert(f(3) == 16f && f(4) == 24f)
    // feature[0] = mean R / 255, exactly the closed-form block sum
    val s = 5
    var sum = 0L
    for (by <- 0 until 3; bx <- 0 until 2) sum += 64L * ((bx * 7 + by * 5 + s) % 256)
    assert(f(0) == sum.toFloat / (16 * 24) / 255f)
    assert(math.abs((5 until 16).map(f).sum - 1f) < 1e-5)
  }

  test("corruption totality: every single-byte flip decodes or raises IllegalArgumentException") {
    val jp = JpegCodec.synthJpeg(16, 16, 42L)
    var other = 0
    for (i <- jp.indices) {
      val c = jp.clone
      c(i) = (c(i) ^ 0x55).toByte
      try JpegCodec.decodeJpeg(c)
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable =>
          other += 1
          if (other == 1) info(s"non-IAE escape at byte $i: ${e.getClass} ${e.getMessage}")
      }
    }
    assert(other == 0, s"$other corrupt payloads escaped the typed-error contract")
  }

  test("truncation totality: every prefix raises IllegalArgumentException, never hangs or OOBs") {
    val jp = JpegCodec.synthJpeg(16, 16, 3L)
    for (len <- 0 until jp.length) {
      intercept[IllegalArgumentException] {
        JpegCodec.decodeJpeg(java.util.Arrays.copyOf(jp, len))
      }
    }
  }

  test("grayscale with declared 2x2 sampling decodes non-interleaved per T.81 (factors ignored)") {
    val jp = JpegCodec.synthJpeg(16, 16, 9L)
    val sof = jp.indices.dropRight(1).find(i =>
      (jp(i) & 0xff) == 0xff && (jp(i + 1) & 0xff) == 0xc0).get
    // component list starts at sof+10 (marker+len+precision+h+w+ncomp);
    // sampling byte of component 1 is at sof+11
    assert((jp(sof + 11) & 0xff) == 0x11)
    val declared22 = jp.clone
    declared22(sof + 11) = 0x22.toByte
    val img = JpegCodec.decodeJpeg(declared22)
    val ref = JpegCodec.decodeJpeg(jp)
    assert(img.pixels.sameElements(ref.pixels),
      "single-component scan must ignore SOF sampling factors")
  }

  test("encoder rejects SOF-overflowing dimensions as typed errors") {
    intercept[IllegalArgumentException](
      JpegCodec.encodeJpeg(70000, 1, new Array[Byte](0)))
    intercept[IllegalArgumentException](
      JpegCodec.encodeJpeg(65535, 65535, new Array[Byte](0))) // area cap
  }

  test("unsupported modes are typed errors: progressive SOF2 and missing-scan streams") {
    val jp = JpegCodec.synthJpeg(16, 16, 1L)
    // rewrite SOF0 marker to SOF2 (progressive)
    val sof = jp.indices.dropRight(1).find(i =>
      (jp(i) & 0xff) == 0xff && (jp(i + 1) & 0xff) == 0xc0).get
    val prog = jp.clone
    prog(sof + 1) = 0xc2.toByte
    val e = intercept[IllegalArgumentException](JpegCodec.decodeJpeg(prog))
    assert(e.getMessage.contains("baseline"))
    intercept[IllegalArgumentException](
      JpegCodec.decodeJpeg(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)))
  }
}
