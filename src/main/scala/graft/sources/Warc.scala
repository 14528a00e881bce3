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
  * `readWarc` lists segment paths and opens each through the Hadoop
  * FileSystem API inside `mapPartitions`, and records are parsed by a
  * STREAMING iterator over the (decompressing) input stream: one header
  * block, then exactly `Content-Length` payload bytes, emit, repeat.
  * Memory is O(one record), never O(segment) — a 5 GB decompressed
  * crawl segment parses in a few MB of heap, where a whole-segment
  * inflate would hit the JVM's 2 GiB array cap. Every length field is
  * validated (typed errors, bounded allocations — the MediaCodecs
  * discipline), because crawl archives are untrusted bytes.
  *
  * HTTP payloads: response bodies with `Transfer-Encoding: chunked` are
  * de-framed, and `body_text` decodes the body with the charset declared
  * in Content-Type (HTTP/1.1 default ISO-8859-1 when absent) — real
  * crawl responses are routinely chunked and non-UTF-8, and a curation
  * front door that ignored either would ingest framing garbage or
  * mojibake. Folded (SP/TAB-continued) header lines, legal in both WARC
  * and classic HTTP, unfold onto the previous header.
  *
  * Reference semantics: the reference's multi-format I/O contract is
  * source⇄sink round-trip fidelity (doc-01.md:136-158); WARC is the
  * crawl-corpus instantiation of that contract. */
object Warc {

  private val WarcVersion = "WARC/1.0"
  /** Deterministic record date for fixture/oracle paths; real exports
    * pass their own timestamp to [[writeWarc]]/[[buildResponseRecord]]. */
  val FixtureDate = "2024-01-01T00:00:00Z"

  /** Hard caps on header geometry so hostile bytes cannot make the
    * streaming parser buffer unboundedly: no header LINE above 64 KiB,
    * no header BLOCK above 1024 lines. Real WARC/HTTP headers are tiny. */
  private val MaxHeaderLine = 1 << 16

  /** Read-ahead buffer size of [[recordIterator]]'s raw and gzip streams.
    * Public so the laziness pin in WarcSpec can bound its byte-count
    * assertion by THIS value instead of a hard-coded guess that drifts
    * if the buffer is ever retuned. */
  val ReadBufferSize: Int = 1 << 16
  private val MaxHeaderLines = 1024

  /** One spec-conforming response record: WARC headers + an embedded HTTP
    * response, gzip-compressed as its OWN member when `gzip` is set.
    * `chunked` frames the HTTP body as Transfer-Encoding: chunked (what
    * most live origin servers actually send); `charset` is declared in
    * the HTTP Content-Type — the caller encodes `body` to match. */
  def buildResponseRecord(url: String, body: Array[Byte],
      recordId: String, gzip: Boolean, chunked: Boolean = false,
      charset: String = "utf-8", date: String = FixtureDate,
      status: Int = 200, reason: String = "OK"): Array[Byte] = {
    val (framing, payload) =
      if (chunked) ("Transfer-Encoding: chunked\r\n", chunkFrame(body))
      else (s"Content-Length: ${body.length}\r\n", body)
    val http = (s"HTTP/1.1 $status $reason\r\n" +
      s"Content-Type: text/plain; charset=$charset\r\n" +
      framing + "\r\n").getBytes("UTF-8") ++ payload
    val rec = (s"$WarcVersion\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:uuid:$recordId>\r\n" +
      s"WARC-Date: $date\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("UTF-8") ++
      http ++ "\r\n\r\n".getBytes("UTF-8")
    if (gzip) gzipMember(rec) else rec
  }

  /** RFC 9112 §7.1 chunk framing: hex-size CRLF data CRLF …, terminated
    * by a zero-size chunk + blank trailer line. Splits into ≤4 KiB chunks
    * so multi-chunk parsing is actually exercised. */
  private def chunkFrame(body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length + 64)
    var off = 0
    while (off < body.length) {
      val n = math.min(4096, body.length - off)
      out.write(s"${n.toHexString}\r\n".getBytes("US-ASCII"))
      out.write(body, off, n)
      out.write('\r'); out.write('\n')
      off += n
    }
    out.write("0\r\n\r\n".getBytes("US-ASCII"))
    out.toByteArray
  }

  /** The per-file warcinfo header record crawl writers emit first. */
  def buildWarcinfoRecord(filename: String, gzip: Boolean,
      date: String = FixtureDate): Array[Byte] = {
    val info = "software: graft-warc/1.0\r\nformat: WARC File Format 1.0\r\n"
      .getBytes("UTF-8")
    val rec = (s"$WarcVersion\r\n" +
      "WARC-Type: warcinfo\r\n" +
      s"WARC-Record-ID: <urn:uuid:warcinfo-$filename>\r\n" +
      s"WARC-Date: $date\r\n" +
      s"WARC-Filename: $filename\r\n" +
      "Content-Type: application/warc-fields\r\n" +
      s"Content-Length: ${info.length}\r\n\r\n").getBytes("UTF-8") ++
      info ++ "\r\n\r\n".getBytes("UTF-8")
    if (gzip) gzipMember(rec) else rec
  }

  /** One generic NON-response record — the realism surface: real crawl
    * segments are ~half request/metadata/revisit/warcinfo records a
    * curation reader must carry through typed (and its consumers must
    * SKIP), never parse as an HTTP response. The parser's http-parse
    * branch keys on `WARC-Type: response` + an `application/http`
    * Content-Type, so these flow through with raw payloads and
    * `http_status = 0`. */
  def buildRecord(warcType: String, url: String, recordId: String,
      contentType: String, payload: Array[Byte], gzip: Boolean,
      extraHeaders: Seq[(String, String)] = Nil,
      date: String = FixtureDate): Array[Byte] = {
    val extras = extraHeaders.map { case (k, v) => s"$k: $v\r\n" }.mkString
    val rec = (s"$WarcVersion\r\n" +
      s"WARC-Type: $warcType\r\n" +
      s"WARC-Record-ID: <urn:uuid:$recordId>\r\n" +
      s"WARC-Date: $date\r\n" +
      (if (url.nonEmpty) s"WARC-Target-URI: $url\r\n" else "") +
      extras +
      s"Content-Type: $contentType\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("UTF-8") ++
      payload ++ "\r\n\r\n".getBytes("UTF-8")
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
    * local disk. `date` stamps every record's WARC-Date (a real export
    * passes its wall-clock; fixtures keep the deterministic default).
    * `chunkEvery` > 0 writes every Nth record's HTTP body with chunked
    * transfer-encoding — fixture knob so the gate oracles exercise the
    * de-chunking read path on real round-trip data. `charsetEvery` > 0
    * writes every Nth record's body as UTF-16BE with a matching
    * `charset=utf-16be` Content-Type declaration — same idea for the
    * charset-honoring decode path (UTF-16BE covers all of Unicode, so
    * the round trip stays lossless for arbitrary corpus text and the
    * byte-exact oracles hold unchanged). */
  def writeWarc(df: DataFrame, outDir: String,
      date: String = FixtureDate, chunkEvery: Int = 0,
      charsetEvery: Int = 0): Unit = {
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
            out.write(buildWarcinfoRecord(name, gzip = true, date = date))
            buffered.foreach { r =>
              val id = r.getLong(0)
              val nonUtf8 = charsetEvery > 0 && id % charsetEvery == 0
              val cs = if (nonUtf8) "utf-16be" else "utf-8"
              out.write(buildResponseRecord(
                r.getString(1), r.getString(2).getBytes(cs),
                recordId = f"doc-$id%016x", gzip = true,
                chunked = chunkEvery > 0 && id % chunkEvery == 0,
                charset = cs, date = date))
            }
          } finally out.close()
        }
      }
  }

  /** One parsed record. `body` is the de-framed payload bytes (chunk
    * framing already removed for chunked HTTP responses); `body_text` is
    * the charset-honoring decode — the Content-Type `charset=` parameter
    * for HTTP responses (ISO-8859-1 when absent, per HTTP/1.1), UTF-8
    * for non-HTTP records (application/warc-fields is UTF-8 by spec). */
  final case class WarcRecord(
      warc_type: String, url: String, record_id: String,
      http_status: Int, mime: String, charset: String,
      body: Array[Byte], body_text: String)

  /** Streaming record iterator over a (possibly gzip) WARC stream —
    * the scale path: reads one header block, then exactly
    * `Content-Length` payload bytes, emits, repeats. Memory is O(one
    * record); the stream is never buffered whole, so segments larger
    * than the JVM's 2 GiB array cap parse fine. Gzip is detected by
    * magic (two pushback bytes), not filename; per-record gzip members
    * read as one concatenated stream. Closes `in` at exhaustion and on
    * parse error. */
  def recordIterator(in: java.io.InputStream): Iterator[WarcRecord] = {
    val pb = new java.io.PushbackInputStream(
      new java.io.BufferedInputStream(in, ReadBufferSize), 2)
    val b0 = pb.read(); val b1 = if (b0 >= 0) pb.read() else -1
    if (b1 >= 0) pb.unread(b1)
    if (b0 >= 0) pb.unread(b0)
    val stream: java.io.InputStream =
      if (b0 == 0x1f && b1 == 0x8b)
        new java.util.zip.GZIPInputStream(pb, ReadBufferSize)
      else pb

    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = null
      private var done = b0 < 0 // empty stream ⇒ no records
      private var recOff = 0L   // decompressed offset, error context only
      if (done) stream.close()

      private def advance(): Unit = {
        try {
          // tolerate inter-record CRLF padding
          var c = stream.read()
          while (c == '\r' || c == '\n') { recOff += 1; c = stream.read() }
          if (c < 0) { done = true; stream.close(); return }
          val headers = readHeaderBlock(stream, recOff, firstByte = c)
          require(headers.getOrElse("__version__", "").startsWith("WARC/"),
            s"not a WARC record at offset $recOff")
          val lenStr = headers.getOrElse("content-length",
            throw new IllegalArgumentException(
              s"WARC record at $recOff missing Content-Length")).trim
          require(lenStr.nonEmpty && lenStr.forall(_.isDigit) && lenStr.length <= 18,
            s"WARC record at $recOff has malformed Content-Length '$lenStr'")
          val len = lenStr.toLong
          require(len <= Int.MaxValue - 8,
            s"WARC record at $recOff claims a $len-byte payload — " +
              "above the JVM single-array cap; split the record")
          val payload = readExactly(stream, len.toInt, recOff)
          recOff += len
          val typ = headers.getOrElse("warc-type", "unknown")
          val (status, mime, charset, body, text) =
            if (typ == "response" &&
              headers.getOrElse("content-type", "").startsWith("application/http"))
              parseHttpResponse(payload)
            else {
              val m = headers.getOrElse("content-type", "")
              (0, m, "utf-8", payload, new String(payload, "UTF-8"))
            }
          nextRec = WarcRecord(
            typ,
            headers.getOrElse("warc-target-uri", ""),
            headers.getOrElse("warc-record-id", ""),
            status, mime, charset, body, text)
        } catch {
          case e: Throwable =>
            try stream.close() catch { case _: Throwable => () }
            done = true
            throw e
        }
      }

      override def hasNext: Boolean = {
        if (!done && nextRec == null) advance()
        nextRec != null
      }
      override def next(): WarcRecord = {
        if (!hasNext) throw new NoSuchElementException("WARC stream exhausted")
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** Read exactly `n` payload bytes or die typed — a premature EOF means
    * the record's Content-Length lies past the file end (truncated or
    * hostile segment). Allocation is bounded by bytes ACTUALLY received
    * (amortized-doubling growth from a 1 MiB seed, capped at `n`), never
    * by the untrusted Content-Length itself — a tiny hostile record
    * claiming a 2 GiB payload costs ~1 MiB before the typed error. */
  private def readExactly(in: java.io.InputStream, n: Int, at: Long): Array[Byte] = {
    var buf = new Array[Byte](math.min(n, 1 << 20))
    var off = 0
    while (off < n) {
      if (off == buf.length) // grow only once bytes have actually arrived
        buf = java.util.Arrays.copyOf(buf, math.min(n.toLong, buf.length * 2L).toInt)
      val r = in.read(buf, off, buf.length - off)
      if (r < 0) throw new IllegalArgumentException(
        s"WARC record at $at claims $n payload bytes beyond file end (got $off)")
      off += r
    }
    buf
  }

  /** CRLF header block read from the stream: first line is the version,
    * then `Key: Value` lines until the blank line. Lines starting with
    * SP/TAB are folded continuations of the previous header (legal WARC/
    * classic-HTTP framing). Returns lower-cased keys. `firstByte` is the
    * single byte the caller already consumed probing for EOF. */
  private def readHeaderBlock(in: java.io.InputStream, at: Long,
      firstByte: Int = -1): Map[String, String] = {
    var headers = Map.empty[String, String]
    var lastKey: String = null
    var first = true
    var lines = 0
    var carry = firstByte
    while (lines < MaxHeaderLines) {
      // accumulate raw BYTES per line and decode the line as UTF-8 —
      // WARC header values (WARC-Target-URI IRIs in real crawls) are
      // UTF-8; a per-byte toChar decode would mojibake non-ASCII urls
      val sb = new java.io.ByteArrayOutputStream(64)
      if (carry >= 0) { sb.write(carry); carry = -1 }
      var c = in.read()
      var prevCr = false
      var eol = false
      while (!eol) {
        if (c < 0) throw new IllegalArgumentException(
          s"WARC header block truncated (no CRLF after offset $at)")
        if (prevCr && c == '\n') eol = true
        else {
          if (prevCr) sb.write('\r')
          prevCr = c == '\r'
          if (!prevCr) sb.write(c)
          c = in.read()
        }
        require(sb.size <= MaxHeaderLine,
          s"WARC header line exceeds $MaxHeaderLine bytes at offset $at")
      }
      lines += 1
      val line = new String(sb.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      if (line.isEmpty) return headers
      if (first) { headers += ("__version__" -> line); first = false }
      else if (line.charAt(0) == ' ' || line.charAt(0) == '\t') {
        // folded continuation: append to the previous header's value
        require(lastKey != null, s"folded header with no previous line: $line")
        headers += (lastKey -> (headers(lastKey) + " " + line.trim))
      } else {
        val i = line.indexOf(':')
        require(i > 0, s"malformed header line: $line")
        lastKey = line.substring(0, i).toLowerCase
        headers += (lastKey -> line.substring(i + 1).trim)
      }
    }
    throw new IllegalArgumentException(
      s"WARC header block exceeds $MaxHeaderLines lines at offset $at")
  }

  /** Parse one WARC file's bytes into its records — in-memory
    * convenience over [[recordIterator]] (tests, small fixtures). The
    * Spark read path never calls this; it streams. */
  def parseWarcFile(bytes: Array[Byte]): Seq[WarcRecord] =
    recordIterator(new java.io.ByteArrayInputStream(bytes)).toVector

  /** HTTP response payload → (status, mime, charset, body, body_text).
    * De-frames `Transfer-Encoding: chunked` bodies (RFC 9112 §7.1 —
    * malformed framing is a typed error, never silently-retained chunk
    * garbage); decodes text with the Content-Type `charset=` parameter,
    * ISO-8859-1 when absent (the HTTP/1.1 default). Unknown charsets are
    * typed errors — crawl curation must not silently mojibake. */
  private def parseHttpResponse(
      payload: Array[Byte]): (Int, String, String, Array[Byte], String) = {
    val in = new java.io.ByteArrayInputStream(payload)
    val headers = readHeaderBlock(in, 0L)
    // getOrElse, not apply: a payload that OPENS with a blank line yields
    // an empty header map, and the missing status line must stay a typed
    // error (the require below), not a NoSuchElementException
    val statusLine = headers.getOrElse("__version__", "")
    require(statusLine.startsWith("HTTP/"), s"not an HTTP response: $statusLine")
    val parts = statusLine.split(" ")
    require(parts.length >= 2 && parts(1).nonEmpty &&
      parts(1).forall(_.isDigit) && parts(1).length <= 3,
      s"malformed HTTP status line: $statusLine")
    val status = parts(1).toInt
    val rest = new Array[Byte](in.available())
    in.read(rest)
    val body =
      if (headers.getOrElse("transfer-encoding", "").toLowerCase.contains("chunked"))
        dechunk(rest)
      else rest
    val mime = headers.getOrElse("content-type", "")
    val charset = charsetOf(mime)
    // resolve through Charset.forName — it is what actually throws the
    // typed charset exceptions (String's charset-NAME constructor throws
    // UnsupportedEncodingException instead and would dodge these clauses)
    val cs = try java.nio.charset.Charset.forName(charset)
    catch {
      case e: java.nio.charset.UnsupportedCharsetException =>
        throw new IllegalArgumentException(
          s"HTTP response declares unsupported charset '$charset'", e)
      case e: java.nio.charset.IllegalCharsetNameException =>
        throw new IllegalArgumentException(
          s"HTTP response declares malformed charset '$charset'", e)
    }
    (status, mime, charset.toLowerCase, body, new String(body, cs))
  }

  /** `charset=` parameter from a Content-Type value (case-insensitive,
    * optional quotes), else the HTTP/1.1 default ISO-8859-1. */
  private def charsetOf(contentType: String): String = {
    val m = java.util.regex.Pattern
      .compile("(?i)charset\\s*=\\s*\"?([A-Za-z0-9._:\\-]+)\"?")
      .matcher(contentType)
    if (m.find()) m.group(1) else "ISO-8859-1"
  }

  /** De-frame an RFC 9112 chunked body: hex-size CRLF data CRLF …,
    * zero-size terminator, optional trailer lines to the blank line.
    * Chunk extensions (`;ext=…` after the size) are legal and ignored. */
  private def dechunk(framed: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(framed.length)
    var p = 0
    def readLine(): String = {
      val start = p
      while (p + 1 < framed.length && !(framed(p) == '\r' && framed(p + 1) == '\n')) p += 1
      require(p + 1 < framed.length, "chunked body truncated mid-line")
      val s = new String(framed, start, p - start, "US-ASCII")
      p += 2
      s
    }
    while (true) {
      val sizeLine = readLine()
      val hexPart = sizeLine.split(";", 2)(0).trim
      require(hexPart.nonEmpty && hexPart.length <= 8 &&
        hexPart.forall(c => Character.digit(c, 16) >= 0),
        s"malformed chunk size line: '$sizeLine'")
      // parse as Long and bound-check in Long arithmetic: 8 hex digits
      // reach 0xFFFFFFFF (> Int.MaxValue), and p + n + 2 can wrap Int —
      // either would turn the typed framing error into a raw overflow
      val nL = java.lang.Long.parseLong(hexPart, 16)
      if (nL == 0) {
        // trailer section: zero or more header lines, then the blank line
        var t = readLine()
        while (t.nonEmpty) t = readLine()
        return out.toByteArray
      }
      require(p.toLong + nL + 2 <= framed.length,
        s"chunk claims $nL bytes beyond body end")
      val n = nL.toInt
      out.write(framed, p, n)
      p += n
      require(framed(p) == '\r' && framed(p + 1) == '\n',
        "chunk data not CRLF-terminated")
      p += 2
    }
    throw new IllegalStateException("unreachable")
  }

  /** Read a directory (or glob) of `.warc` / `.warc.gz` files as a
    * DataFrame of records — files listed through the Hadoop FileSystem
    * API (any scheme), ONE Spark task per file (crawl segments are the
    * unit of parallelism), each parsed by the streaming [[recordIterator]]
    * with O(record) memory. Hidden files (`_SUCCESS`, dotfiles) are
    * skipped; gzip is detected by magic, not extension. The listing is
    * single-level: a directory path lists its immediate files; NESTED
    * layouts (crawl=… over segment=… subdirectories) must pass the glob
    * form (a star per directory level) — `listStatus` does not recurse. */
  def readWarc(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(hadoopConf.value)
    val statuses =
      if (fs.exists(root) && fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).toSeq
      else Option(fs.globStatus(root)).map(_.toSeq).getOrElse(Seq.empty)
    val files = statuses.filter(_.isFile).map(_.getPath.toString)
      .filterNot { p =>
        val n = p.substring(p.lastIndexOf('/') + 1)
        n.startsWith("_") || n.startsWith(".")
      }.sorted
    require(files.nonEmpty, s"no WARC files under $path")
    spark.createDataset(files)
      .repartition(files.size) // one segment per task
      .mapPartitions { paths =>
        val conf = hadoopConf.value
        // recordIterator closes its stream on exhaustion/parse error, but
        // an ABANDONED iterator (limit/take, task kill) never exhausts —
        // close the in-flight file handle at task completion instead of
        // leaking it on a long-lived executor (close is a no-op if the
        // iterator already closed it)
        var openStream: java.io.InputStream = null
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
          if (openStream != null)
            try openStream.close() catch { case _: Throwable => () }
        }
        paths.flatMap { p =>
          val fp = new org.apache.hadoop.fs.Path(p)
          val raw = fp.getFileSystem(conf).open(fp)
          openStream = raw
          recordIterator(raw)
        }
      }
      .toDF()
  }
}
