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
