package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500 Web ARChive) source + sink — the container format
  * web-crawl corpora (Common Crawl) actually ship in, so an ingestion
  * pipeline can read crawl segments directly instead of a pre-converted
  * copy. Pure JDK: WARC framing is CRLF header lines + Content-Length
  * payloads; `.warc.gz` uses one gzip member PER RECORD (the spec's
  * random-access convention), which `GZIPInputStream` reads transparently
  * as a concatenated stream.
  *
  * Scale shape: FILES are the parallel unit (crawl segments are ~1 GB) —
  * `readWarc` rides Spark's `binaryFile` source, one task per file, and
  * record parsing is a per-partition iterator walk; nothing touches the
  * driver. Every length field is validated against the remaining bytes
  * (typed errors, bounded allocations — the MediaCodecs discipline),
  * because crawl archives are untrusted bytes. */
object Warc {

  private val WarcVersion = "WARC/1.0"
  private val FixtureDate = "2024-01-01T00:00:00Z"

  /** One spec-conforming response record: WARC headers + an embedded HTTP
    * response, gzip-compressed as its OWN member when `gzip` is set. */
  def buildResponseRecord(url: String, body: Array[Byte],
      recordId: String, gzip: Boolean): Array[Byte] = {
    val http = (s"HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/plain; charset=utf-8\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("UTF-8") ++ body
    val rec = (s"$WarcVersion\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:uuid:$recordId>\r\n" +
      s"WARC-Date: $FixtureDate\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("UTF-8") ++
      http ++ "\r\n\r\n".getBytes("UTF-8")
    if (gzip) gzipMember(rec) else rec
  }

  /** The per-file warcinfo header record crawl writers emit first. */
  def buildWarcinfoRecord(filename: String, gzip: Boolean): Array[Byte] = {
    val info = "software: graft-warc/1.0\r\nformat: WARC File Format 1.0\r\n"
      .getBytes("UTF-8")
    val rec = (s"$WarcVersion\r\n" +
      "WARC-Type: warcinfo\r\n" +
      s"WARC-Record-ID: <urn:uuid:warcinfo-$filename>\r\n" +
      s"WARC-Date: $FixtureDate\r\n" +
      s"WARC-Filename: $filename\r\n" +
      "Content-Type: application/warc-fields\r\n" +
      s"Content-Length: ${info.length}\r\n\r\n").getBytes("UTF-8") ++
      info ++ "\r\n\r\n".getBytes("UTF-8")
    if (gzip) gzipMember(rec) else rec
  }

  private def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.finish(); gz.close()
    bos.toByteArray
  }

  /** Write `df` (doc_id, url, text) as spec-conforming `.warc.gz` files,
    * one file per partition, executor-side (the parallel write a crawl
    * exporter runs — nothing is collected). Each file opens with a
    * warcinfo record; each record is its own gzip member. Files go
    * through the Hadoop FileSystem API, so `outDir` may be any supported
    * scheme (hdfs://, s3a://, file:…) — executors never assume a shared
    * local disk. */
  def writeWarc(df: DataFrame, outDir: String): Unit = {
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.select(col("doc_id").cast("long"), col("url"), col("text"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val buffered = rows.buffered
        if (buffered.hasNext) {
          val name = f"part-$pid%05d.warc.gz"
          val path = new org.apache.hadoop.fs.Path(outDir, name)
          val fs = path.getFileSystem(hadoopConf.value)
          val out = new java.io.BufferedOutputStream(fs.create(path, true))
          try {
            out.write(buildWarcinfoRecord(name, gzip = true))
            buffered.foreach { r =>
              val id = r.getLong(0)
              out.write(buildResponseRecord(
                r.getString(1), r.getString(2).getBytes("UTF-8"),
                recordId = f"doc-$id%016x", gzip = true))
            }
          } finally out.close()
        }
      }
  }

  final case class WarcRecord(
      warc_type: String, url: String, record_id: String,
      http_status: Int, mime: String, body: Array[Byte])

  /** Parse one (possibly multi-member-gzip) WARC file's bytes into its
    * records. Gzip is detected by magic, not filename. */
  def parseWarcFile(bytes: Array[Byte]): Seq[WarcRecord] = {
    val raw: Array[Byte] =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b) {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(bytes), 1 << 16)
        // initial capacity only — the stream grows as needed; the Long
        // math avoids the Int overflow a >=512 MiB segment would hit
        val bos = new java.io.ByteArrayOutputStream(
          math.min(bytes.length.toLong * 4, 1L << 26).toInt)
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
        in.close()
        bos.toByteArray
      } else bytes
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var off = 0
    while (off < raw.length) {
      // tolerate inter-record CRLF padding
      while (off < raw.length && (raw(off) == '\r' || raw(off) == '\n')) off += 1
      if (off < raw.length) {
        val (headers, bodyStart) = parseHeaderBlock(raw, off)
        require(headers.getOrElse("__version__", "").startsWith("WARC/"),
          s"not a WARC record at offset $off")
        val lenStr = headers.getOrElse("content-length",
          throw new IllegalArgumentException(s"WARC record at $off missing Content-Length")).trim
        require(lenStr.nonEmpty && lenStr.forall(_.isDigit) && lenStr.length <= 18,
          s"WARC record at $off has malformed Content-Length '$lenStr'")
        val len = lenStr.toLong
        require(len >= 0 && bodyStart + len <= raw.length,
          s"WARC record at $off claims $len payload bytes beyond file end")
        val payload = java.util.Arrays.copyOfRange(raw, bodyStart, bodyStart + len.toInt)
        val typ = headers.getOrElse("warc-type", "unknown")
        val (status, mime, body) =
          if (typ == "response" &&
            headers.getOrElse("content-type", "").startsWith("application/http"))
            parseHttpResponse(payload)
          else (0, headers.getOrElse("content-type", ""), payload)
        out += WarcRecord(
          typ,
          headers.getOrElse("warc-target-uri", ""),
          headers.getOrElse("warc-record-id", ""),
          status, mime, body)
        off = bodyStart + len.toInt
      }
    }
    out.toSeq
  }

  /** CRLF header block at `off`: first line is the version, then
    * `Key: Value` lines until the blank line. Returns (lower-cased keys,
    * offset of the byte after the blank line). */
  private def parseHeaderBlock(raw: Array[Byte], off: Int): (Map[String, String], Int) = {
    var p = off
    var headers = Map.empty[String, String]
    var first = true
    while (true) {
      val eol = indexOfCrlf(raw, p)
      val line = new String(raw, p, eol - p, "UTF-8")
      p = eol + 2
      if (line.isEmpty) return (headers, p)
      if (first) { headers += ("__version__" -> line); first = false }
      else {
        val i = line.indexOf(':')
        require(i > 0, s"malformed header line: $line")
        headers += (line.substring(0, i).toLowerCase -> line.substring(i + 1).trim)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def indexOfCrlf(raw: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < raw.length) {
      if (raw(i) == '\r' && raw(i + 1) == '\n') return i
      i += 1
    }
    throw new IllegalArgumentException(
      s"WARC header block truncated (no CRLF after offset $from)")
  }

  private def parseHttpResponse(payload: Array[Byte]): (Int, String, Array[Byte]) = {
    val (headers, bodyStart) = parseHeaderBlock(payload, 0)
    val statusLine = headers("__version__")
    require(statusLine.startsWith("HTTP/"), s"not an HTTP response: $statusLine")
    val parts = statusLine.split(" ")
    require(parts.length >= 2 && parts(1).nonEmpty &&
      parts(1).forall(_.isDigit) && parts(1).length <= 3,
      s"malformed HTTP status line: $statusLine")
    val status = parts(1).toInt
    (status, headers.getOrElse("content-type", ""),
      java.util.Arrays.copyOfRange(payload, bodyStart, payload.length))
  }

  /** Read a directory of `.warc` / `.warc.gz` files as a DataFrame of
    * records — one Spark task per file via the binaryFile source, parse
    * executor-side. */
  def readWarc(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("content"))
      .as[Array[Byte]]
      .mapPartitions(_.flatMap(parseWarcFile))
      .toDF()
  }
}
