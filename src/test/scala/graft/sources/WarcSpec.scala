package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** [[Warc]] parser/builder: ISO 28500 framing pins, Content-Length-driven
  * payload extraction (bodies may contain CRLFs and binary bytes), gzip
  * member handling, and typed errors on hostile bytes. */
class WarcSpec extends AnyFunSuite {

  test("response record round-trips: headers, HTTP status/mime, exact body bytes") {
    val body = "line one\r\nline twoé 中文".getBytes("UTF-8")
    val rec = Warc.buildResponseRecord(
      "https://example.com/x", body, recordId = "r1", gzip = false)
    val parsed = Warc.parseWarcFile(rec)
    assert(parsed.size == 1)
    val r = parsed.head
    assert(r.warc_type == "response" && r.url == "https://example.com/x")
    assert(r.http_status == 200 && r.mime == "text/plain; charset=utf-8")
    assert(r.body.sameElements(body))
  }

  test("multi-record files parse in order; warcinfo surfaces with its type") {
    val f = Warc.buildWarcinfoRecord("f.warc", gzip = false) ++
      Warc.buildResponseRecord("u1", "a".getBytes, "r1", gzip = false) ++
      Warc.buildResponseRecord("u2", "bb".getBytes, "r2", gzip = false)
    val parsed = Warc.parseWarcFile(f)
    assert(parsed.map(_.warc_type) == Seq("warcinfo", "response", "response"))
    assert(parsed(1).url == "u1" && new String(parsed(2).body) == "bb")
  }

  test("per-record gzip members read as one concatenated stream (the .warc.gz convention)") {
    val f = Warc.buildWarcinfoRecord("f.warc.gz", gzip = true) ++
      Warc.buildResponseRecord("u1", "hello".getBytes, "r1", gzip = true) ++
      Warc.buildResponseRecord("u2", "world".getBytes, "r2", gzip = true)
    val parsed = Warc.parseWarcFile(f)
    assert(parsed.size == 3)
    assert(new String(parsed(1).body) == "hello" && new String(parsed(2).body) == "world")
  }

  test("bodies containing WARC/HTTP-looking text do not confuse the parser (length-driven)") {
    val tricky = "WARC/1.0\r\nContent-Length: 9999\r\n\r\nHTTP/1.1 500".getBytes("UTF-8")
    val f = Warc.buildResponseRecord("u", tricky, "r", gzip = false) ++
      Warc.buildResponseRecord("u2", "next".getBytes, "r2", gzip = false)
    val parsed = Warc.parseWarcFile(f)
    assert(parsed.size == 2)
    assert(parsed.head.body.sameElements(tricky))
    assert(new String(parsed(1).body) == "next")
  }

  test("Spark write -> read: multi-partition .warc.gz via the Hadoop FS path, bodies byte-exact") {
    val spark = graft.SparkTestBase.session
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("warc_spec")
    try {
      val d = (0L until 37L).map(i => (i, s"https://ex.com/doc/$i", s"body of $i with ünïcode"))
        .toDF("doc_id", "url", "text")
      Warc.writeWarc(d.repartition(5, col("doc_id")), out.toString)
      val files = new java.io.File(out.toString).listFiles().filter(_.getName.endsWith(".warc.gz"))
      assert(files.length >= 2, "expected multiple part files")
      val back = Warc.readWarc(spark, out.toString)
      assert(back.filter(col("warc_type") === "warcinfo").count() == files.length)
      val rows = back.filter(col("warc_type") === "response")
        .select(col("url"), decode(col("body"), "UTF-8").as("text"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(rows.size == 37)
      (0L until 37L).foreach { i =>
        assert(rows(s"https://ex.com/doc/$i") == s"body of $i with ünïcode", s"doc $i")
      }
    } finally graft.plans.CorpusExport.deleteRecursively(out.toFile)
  }

  // ---- raw-record builders for paths buildResponseRecord cannot emit ----

  /** WARC response record around an arbitrary pre-built HTTP payload. */
  private def rawResponseRecord(http: Array[Byte],
      url: String = "https://example.com/r"): Array[Byte] =
    (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:t>\r\n" +
      s"WARC-Date: 2024-01-01T00:00:00Z\r\nWARC-Target-URI: $url\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("UTF-8") ++
      http ++ "\r\n\r\n".getBytes("UTF-8")

  /** HTTP/1.1 200 payload with caller-supplied header lines + raw body. */
  private def httpPayload(headerLines: String, body: Array[Byte]): Array[Byte] =
    (s"HTTP/1.1 200 OK\r\n$headerLines\r\n").getBytes("UTF-8") ++ body

  test("chunked round-trip: multi-chunk body >4KiB de-frames byte-exactly") {
    val body = (0 until 600).map(i => s"row $i é中文 payload").mkString("\n")
      .getBytes("UTF-8")
    assert(body.length > 8192, "fixture must span >2 chunks")
    val rec = Warc.buildResponseRecord(
      "https://example.com/big", body, "r1", gzip = false, chunked = true)
    val r = Warc.parseWarcFile(rec).head
    assert(r.http_status == 200)
    assert(r.body.sameElements(body), "de-chunked body must be byte-exact")
    assert(r.body_text == new String(body, "UTF-8"))
  }

  test("chunked: chunk extensions and trailer headers are parsed and ignored") {
    val framed = ("4;ext=\"quoted\"\r\nWiki\r\n5 ; name\r\npedia\r\n0\r\n" +
      "X-Trailer: seen\r\nX-Other: also\r\n\r\n").getBytes("UTF-8")
    val http = httpPayload(
      "Content-Type: text/plain; charset=utf-8\r\nTransfer-Encoding: chunked\r\n",
      framed)
    val r = Warc.parseWarcFile(rawResponseRecord(http)).head
    assert(r.body_text == "Wikipedia")
  }

  test("hostile chunk framing is a typed error: bad hex, bad CRLF, truncation, lying size") {
    def rec(framed: String): Array[Byte] = rawResponseRecord(httpPayload(
      "Transfer-Encoding: chunked\r\n", framed.getBytes("UTF-8")))
    val badHex = intercept[IllegalArgumentException](
      Warc.parseWarcFile(rec("zz\r\ndata\r\n0\r\n\r\n")))
    assert(badHex.getMessage.contains("malformed chunk size"))
    val badCrlf = intercept[IllegalArgumentException](
      Warc.parseWarcFile(rec("4\r\nWikiXX5\r\npedia\r\n0\r\n\r\n")))
    assert(badCrlf.getMessage.contains("not CRLF-terminated"))
    val truncated = intercept[IllegalArgumentException](
      Warc.parseWarcFile(rec("4\r\nWi")))
    assert(truncated.getMessage.contains("truncated") ||
      truncated.getMessage.contains("beyond body end"))
    val lying = intercept[IllegalArgumentException](
      Warc.parseWarcFile(rec("ffffff\r\nWiki\r\n0\r\n\r\n")))
    assert(lying.getMessage.contains("beyond body end"))
    // 8 hex digits reach past Int.MaxValue — must stay the typed error,
    // not an integer-overflow NumberFormatException/IndexOutOfBounds
    val huge = intercept[IllegalArgumentException](
      Warc.parseWarcFile(rec("ffffffff\r\nWiki\r\n0\r\n\r\n")))
    assert(huge.getMessage.contains("beyond body end"))
  }

  test("charset honored: windows-1252 body decodes exactly") {
    val text = "café €100 — naïve"
    val body = text.getBytes("windows-1252")
    assert(!body.sameElements(text.getBytes("UTF-8")), "fixture must be non-UTF-8")
    val http = httpPayload(
      s"Content-Type: text/html; charset=windows-1252\r\nContent-Length: ${body.length}\r\n",
      body)
    val r = Warc.parseWarcFile(rawResponseRecord(http)).head
    assert(r.charset == "windows-1252")
    assert(r.body_text == text)
  }

  test("no charset declared defaults to ISO-8859-1 (HTTP/1.1), not UTF-8") {
    val body = Array[Byte](0xE9.toByte, 0x20, 0xFC.toByte) // é ü in latin-1
    val http = httpPayload(
      s"Content-Type: text/html\r\nContent-Length: ${body.length}\r\n", body)
    val r = Warc.parseWarcFile(rawResponseRecord(http)).head
    assert(r.charset == "iso-8859-1")
    assert(r.body_text == "é ü")
  }

  test("unsupported and malformed charset declarations are typed errors") {
    def rec(cs: String): Array[Byte] = rawResponseRecord(httpPayload(
      s"Content-Type: text/plain; charset=$cs\r\nContent-Length: 2\r\n",
      "hi".getBytes))
    val unsupported = intercept[IllegalArgumentException](
      Warc.parseWarcFile(rec("x-no-such-charset-xyz")))
    assert(unsupported.getMessage.contains("unsupported charset"))
    val malformed = intercept[IllegalArgumentException](
      Warc.parseWarcFile(rec(".bad")))
    assert(malformed.getMessage.contains("malformed charset"))
  }

  test("folded (SP/TAB-continued) header lines unfold onto the previous header") {
    val rec = ("WARC/1.0\r\nWARC-Type: resource\r\n" +
      "WARC-Target-URI: https://example.com/very\r\n" +
      " long/path\r\n" + // folded continuation
      "Content-Type: text/x-fixture\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n")
      .getBytes("UTF-8")
    val r = Warc.parseWarcFile(rec).head
    assert(r.url == "https://example.com/very long/path")
    assert(new String(r.body) == "hi")
  }

  test("non-ASCII WARC header values decode as UTF-8 (IRI target URIs)") {
    val url = "https://example.com/café/中文?q=naïve"
    val rec = Warc.buildResponseRecord(url, "x".getBytes, "r", gzip = false)
    assert(Warc.parseWarcFile(rec).head.url == url)
  }

  test("header geometry bounds: oversized line and oversized block are typed errors") {
    val longLine = ("WARC/1.0\r\nX-Evil: " + "a" * 70000 + "\r\n").getBytes("UTF-8")
    val lineErr = intercept[IllegalArgumentException](Warc.parseWarcFile(longLine))
    assert(lineErr.getMessage.contains("header line exceeds"))
    val manyLines = ("WARC/1.0\r\n" +
      (1 to 1100).map(i => s"X-$i: v\r\n").mkString).getBytes("UTF-8")
    val blockErr = intercept[IllegalArgumentException](Warc.parseWarcFile(manyLines))
    assert(blockErr.getMessage.contains("exceeds 1024 lines"))
  }

  test("lying 100MB Content-Length over a tiny stream errors fast without a 100MB allocation") {
    val tail = "\r\n\r\nHTTP tiny"
    val rec = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${100 * 1024 * 1024}$tail").getBytes("UTF-8")
    val t0 = System.nanoTime()
    val e = intercept[IllegalArgumentException](Warc.parseWarcFile(rec))
    assert(e.getMessage.contains("beyond file end"))
    assert((System.nanoTime() - t0) < 2e9, "bounded-allocation path must fail fast")
  }

  /** Serves `chunk` repeated `repeats` times, counting bytes handed out —
    * the probe for the laziness pin below. */
  private final class CycleStream(chunk: Array[Byte], repeats: Long)
      extends java.io.InputStream {
    var served = 0L
    private val total = chunk.length.toLong * repeats
    override def read(): Int =
      if (served >= total) -1
      else { val b = chunk((served % chunk.length).toInt) & 0xff; served += 1; b }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (served >= total) return -1
      val n = math.min(len.toLong, total - served).toInt
      var i = 0
      while (i < n) {
        b(off + i) = chunk(((served + i) % chunk.length).toInt); i += 1
      }
      served += n
      n
    }
  }

  test("recordIterator is lazy: first records of a ~500MB stream cost O(buffer), not O(stream)") {
    val one = Warc.buildResponseRecord(
      "https://example.com/cycle", ("b" * 800).getBytes, "r", gzip = false)
    val repeats = (500L * 1024 * 1024) / one.length + 1
    val probe = new CycleStream(one, repeats)
    val it = Warc.recordIterator(probe)
    val first3 = it.take(3).toVector
    assert(first3.size == 3 && first3.forall(_.body.length == 800))
    // the read-ahead fills at most Warc.ReadBufferSize per pull; three
    // ~1KB records must cost O(buffer) from the raw stream, never
    // O(stream). The 4× slack absorbs a JDK wrapper fill or two without
    // ever letting a truly eager parse (500 MB) slip through.
    assert(probe.served <= 4L * Warc.ReadBufferSize,
      s"streaming parse consumed ${probe.served} bytes for 3 records — not lazy")
  }

  test("writeWarc charsetEvery: every Nth record declared+encoded UTF-16BE, decode lossless") {
    val spark = graft.SparkTestBase.session
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("warc_cs")
    try {
      val d = (0L until 10L).map(i => (i, s"https://ex.com/d/$i", s"doc $i é中"))
        .toDF("doc_id", "url", "text")
      Warc.writeWarc(d.repartition(2, col("doc_id")), out.toString, charsetEvery = 5)
      val rows = Warc.readWarc(spark, out.toString)
        .filter(col("warc_type") === "response")
        .select("url", "mime", "charset", "body_text")
        .collect().map(r => (r.getString(0), (r.getString(1), r.getString(2), r.getString(3))))
        .toMap
      assert(rows.size == 10)
      (0L until 10L).foreach { i =>
        val (mime, cs, text) = rows(s"https://ex.com/d/$i")
        val expectCs = if (i % 5 == 0) "utf-16be" else "utf-8"
        assert(cs == expectCs && mime == s"text/plain; charset=$expectCs", s"doc $i")
        assert(text == s"doc $i é中", s"doc $i decode")
      }
    } finally graft.plans.CorpusExport.deleteRecursively(out.toFile)
  }

  test("HTTP payload opening with a blank line is a typed error, not a missing-key crash") {
    val rec = rawResponseRecord("\r\nHTTP/1.1 200 OK\r\n\r\nbody".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](Warc.parseWarcFile(rec))
    assert(e.getMessage.contains("not an HTTP response"))
  }

  test("random chunk geometries round-trip: 1-byte chunks, ragged sizes, extension noise") {
    val r = new scala.util.Random(99)
    (0 until 30).foreach { trial =>
      val body = (0 until 50 + r.nextInt(3000)).map(_ => (32 + r.nextInt(90)).toChar)
        .mkString.getBytes("UTF-8")
      val out = new java.io.ByteArrayOutputStream()
      var off = 0
      while (off < body.length) {
        val n = 1 + r.nextInt(511)
        val take = math.min(n, body.length - off)
        val ext = if (r.nextBoolean()) s";x=${r.nextInt(9)}" else ""
        out.write(s"${take.toHexString}$ext\r\n".getBytes("US-ASCII"))
        out.write(body, off, take)
        out.write("\r\n".getBytes("US-ASCII"))
        off += take
      }
      out.write("0\r\n\r\n".getBytes("US-ASCII"))
      val http = httpPayload(
        "Content-Type: text/plain; charset=utf-8\r\nTransfer-Encoding: chunked\r\n",
        out.toByteArray)
      val got = Warc.parseWarcFile(rawResponseRecord(http)).head
      assert(got.body.sameElements(body), s"trial $trial")
    }
  }

  test("fuzz: random byte corruption parses or dies typed — never a raw runtime exception") {
    val base = Warc.buildResponseRecord(
      "https://example.com/fuzz", ("payload line é 中\n" * 20).getBytes("UTF-8"),
      "r", gzip = false, chunked = true)
    val r = new scala.util.Random(7)
    (0 until 600).foreach { trial =>
      val b = base.clone()
      (0 to r.nextInt(3)).foreach { _ =>
        // offsets >= 2: flipping the first two bytes to the gzip magic
        // legitimately routes the stream to the JDK inflater, whose
        // IOExceptions are the decompressor's contract, not the parser's
        b(2 + r.nextInt(b.length - 2)) = r.nextInt(256).toByte
      }
      try { Warc.parseWarcFile(b); () }
      catch {
        case _: IllegalArgumentException => () // the parser's typed error
        case e: Throwable =>
          fail(s"trial $trial: untyped ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("gzip-member corruption surfaces as the inflater's IOException or a typed error — never other exception kinds") {
    val base = Warc.buildResponseRecord(
      "https://example.com/gz", ("gz body " * 40).getBytes, "r", gzip = true)
    val r = new scala.util.Random(11)
    (0 until 200).foreach { trial =>
      val b = base.clone()
      b(r.nextInt(b.length)) = r.nextInt(256).toByte
      try { Warc.parseWarcFile(b); () }
      catch {
        case _: IllegalArgumentException => () // parser's typed error
        case _: java.io.IOException => ()      // inflater's contract (ZipException et al.)
        case e: Throwable =>
          fail(s"trial $trial: unexpected ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("hostile bytes are typed errors: lying Content-Length, truncation, junk") {
    val good = Warc.buildResponseRecord("u", "abc".getBytes, "r", gzip = false)
    // lying length: patch the WARC Content-Length digits up
    val s = new String(good, "UTF-8")
    val lying = s.replaceFirst("Content-Length: (\\d+)\r\n\r\nHTTP", "Content-Length: 99999\r\n\r\nHTTP")
      .getBytes("UTF-8")
    val e = intercept[IllegalArgumentException](Warc.parseWarcFile(lying))
    assert(e.getMessage.contains("beyond file end"))
    intercept[IllegalArgumentException](
      Warc.parseWarcFile(java.util.Arrays.copyOf(good, good.length / 2)))
    intercept[IllegalArgumentException](
      Warc.parseWarcFile("totally not a warc\r\n\r\n".getBytes))
  }
}
