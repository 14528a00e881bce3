package graft.render

import graft.compile.QuerySpec
import graft.core.TableSpec
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{NumericType, StringType, StructField, StructType}

/** Binary Excel (.xlsx) sink/source with NO third-party dependencies: an
  * xlsx file is a ZIP container of OOXML XML parts, and both `java.util.zip`
  * and an XML DOM parser ship with the JDK — so the one reference surface
  * that previously stayed behind the POI boundary (Excel formats driven by
  * the column declaration, reference: documentation/doc-01.md:109-115;
  * POI wrapper documentation/backup/README.md:147-149,199-202) is now a
  * real binary format, not just the [[FormattedSink]] CSV analog.
  *
  * Declarations map to real spreadsheet semantics: `.decimals(n)` becomes a
  * number format in `xl/styles.xml` applied to the column's cells (the raw
  * numeric value is preserved — formatting is display-only, exactly like
  * Excel); `.width(n)` becomes a `<col customWidth>` element.
  *
  * Scale posture: a spreadsheet is a REPORT artifact with a hard
  * 1,048,576-row sheet limit in the format itself — this sink streams rows
  * through `toLocalIterator` (one partition in driver memory at a time) and
  * refuses result sets beyond the sheet limit rather than truncating. Bulk
  * formatted output belongs to [[FormattedSink.writeFormattedCsv]], which
  * writes distributed.
  */
object XlsxSink {

  /** 0-based column index → A1-style letters (0→A, 25→Z, 26→AA). */
  private[render] def colLetters(i: Int): String = {
    var n = i
    val sb = new StringBuilder
    while (n >= 0) {
      sb.insert(0, ('A' + n % 26).toChar)
      n = n / 26 - 1
    }
    sb.toString
  }

  /** 'BC' → 54: inverse of [[colLetters]]. */
  private def lettersToIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1
  }

  /** OOXML string escaping: XML entities; control characters as the
    * spec's `_xHHHH_` marker; and — so the marker stays unambiguous — a
    * LITERAL `_xHHHH_` already present in the data gets its leading
    * underscore escaped as `_x005F_` (ECMA-376 §22.4.2.4). [[decodeText]]
    * is the exact inverse, so round trips preserve bytes and compliant
    * readers agree. */
  private def xml(s0: String): String = {
    val s = s0.replaceAll("_(?=x[0-9A-Fa-f]{4}_)", "_x005F_")
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' =>
        sb.append(f"_x${c.toInt}%04X_")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Decode `_xHHHH_` escapes (matches are consumed left-to-right, so
    * `_x005F_x0041_` → literal `_x0041_`, per the spec). */
  private def decodeText(s: String): String =
    if (!s.contains("_x")) s
    else {
      val m = java.util.regex.Pattern.compile("_x([0-9A-Fa-f]{4})_").matcher(s)
      val sb = new StringBuffer
      while (m.find())
        m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(
          Integer.parseInt(m.group(1), 16).toChar.toString))
      m.appendTail(sb)
      sb.toString
    }

  private val ContentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
      |<Default Extension="xml" ContentType="application/xml"/>
      |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
      |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
      |<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
      |</Types>""".stripMargin

  private val RootRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
      |</Relationships>""".stripMargin

  private val WorkbookXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
      |<sheets><sheet name="graft" sheetId="1" r:id="rId1"/></sheets>
      |</workbook>""".stripMargin

  private val WorkbookRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
      |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
      |</Relationships>""".stripMargin

  /** styles.xml: one custom numFmt per DISTINCT declared decimal count,
    * one cellXf per column style. Returns (xml, per-column style index:
    * 0 = default). Custom numFmtIds start at 164 per the spec (below are
    * reserved built-ins). */
  private def stylesXml(decimalsByCol: Seq[Option[Int]]): (String, Seq[Int]) = {
    val distinct = decimalsByCol.flatten.distinct.sorted
    val fmtId = distinct.zipWithIndex.map { case (d, i) => d -> (164 + i) }.toMap
    val numFmts = distinct.map { d =>
      val code = if (d == 0) "0" else "0." + "0" * d
      s"""<numFmt numFmtId="${fmtId(d)}" formatCode="${code}"/>"""
    }.mkString
    // xf index 0 is the default; declared-decimals columns get 1-based xfs
    val xfByDecimals = distinct.zipWithIndex.map { case (d, i) => d -> (i + 1) }.toMap
    val xfs = """<xf numFmtId="0" fontId="0" fillId="0" borderId="0"/>""" +
      distinct.map(d =>
        s"""<xf numFmtId="${fmtId(d)}" fontId="0" fillId="0" borderId="0" applyNumberFormat="1"/>""").mkString
    val sx =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<numFmts count="${distinct.size}">$numFmts</numFmts>
         |<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>
         |<fills count="1"><fill><patternFill patternType="none"/></fill></fills>
         |<borders count="1"><border/></borders>
         |<cellXfs count="${distinct.size + 1}">$xfs</cellXfs>
         |</styleSheet>""".stripMargin
    (sx, decimalsByCol.map(_.map(xfByDecimals).getOrElse(0)))
  }

  /** The xlsx sheet row limit (2^20); results beyond it are refused, not
    * silently truncated. */
  val MaxRows: Int = 1 << 20

  /** Write the query result as a real .xlsx at `path` (any Hadoop FS URI).
    * Header row + data rows; numeric cells carry raw values styled by the
    * declaration's decimals; strings are inline (no shared-strings table —
    * self-contained parts, one pass). */
  def writeXlsx(table: TableSpec, qs: QuerySpec = QuerySpec(), path: String): Unit = {
    val df = table.query(qs)
    val fields = df.schema.fields
    val decimalsByCol = fields.toSeq.map(f =>
      table.registry.get(f.name).flatMap(_.formatDecimals)
        .filter(_ => f.dataType.isInstanceOf[NumericType]))
    val widthByCol = fields.toSeq.map(f =>
      table.registry.get(f.name).flatMap(_.formatWidth))
    val (styles, styleIdx) = stylesXml(decimalsByCol)

    val spark = df.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    // stream into a temp sibling and swap in only on success — a failure
    // mid-write (including the MaxRows refusal) must never have destroyed
    // a pre-existing file at `path` or left a corrupt partial ZIP there
    val target = new org.apache.hadoop.fs.Path(path)
    val tmpTarget = new org.apache.hadoop.fs.Path(path + ".graft_tmp")
    val out = new java.util.zip.ZipOutputStream(
      fs.create(tmpTarget, true),
      java.nio.charset.StandardCharsets.UTF_8)
    try {
      def part(name: String, content: String): Unit = {
        out.putNextEntry(new java.util.zip.ZipEntry(name))
        out.write(content.getBytes("UTF-8"))
        out.closeEntry()
      }
      part("[Content_Types].xml", ContentTypes)
      part("_rels/.rels", RootRels)
      part("xl/workbook.xml", WorkbookXml)
      part("xl/_rels/workbook.xml.rels", WorkbookRels)
      part("xl/styles.xml", styles)

      out.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
      val w = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(out, "UTF-8"))
      w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      w.write("\n<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\">")
      val colDefs = widthByCol.zipWithIndex.collect { case (Some(width), i) =>
        s"""<col min="${i + 1}" max="${i + 1}" width="$width" customWidth="1"/>"""
      }
      if (colDefs.nonEmpty) w.write(colDefs.mkString("<cols>", "", "</cols>"))
      w.write("<sheetData>")
      w.write("<row r=\"1\">")
      fields.zipWithIndex.foreach { case (f, i) =>
        w.write(s"""<c r="${colLetters(i)}1" t="inlineStr"><is><t>${xml(f.name)}</t></is></c>""")
      }
      w.write("</row>")
      var r = 1 // header occupied row 1
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val row: Row = it.next()
        r += 1
        require(r <= MaxRows,
          s"result exceeds the xlsx sheet limit of $MaxRows rows — " +
            "page the request (QuerySpec limit/offset) or use writeFormattedCsv")
        w.write(s"""<row r="$r">""")
        var i = 0
        while (i < fields.length) {
          if (!row.isNullAt(i)) {
            val ref = s"${colLetters(i)}$r"
            val s = if (styleIdx(i) != 0) s""" s="${styleIdx(i)}"""" else ""
            fields(i).dataType match {
              case _: NumericType =>
                w.write(s"""<c r="$ref"$s><v>${row.get(i)}</v></c>""")
              case org.apache.spark.sql.types.BooleanType =>
                w.write(s"""<c r="$ref" t="b"><v>${if (row.getBoolean(i)) 1 else 0}</v></c>""")
              case _ =>
                w.write(s"""<c r="$ref" t="inlineStr"><is><t>${xml(String.valueOf(row.get(i)))}</t></is></c>""")
            }
          }
          i += 1
        }
        w.write("</row>")
      }
      w.write("</sheetData></worksheet>")
      w.flush()
      out.closeEntry()
    } catch {
      case e: Throwable =>
        try { out.close(); fs.delete(tmpTarget, false); () }
        catch { case c: Throwable => e.addSuppressed(c) }
        throw e
    }
    out.close()
    fs.delete(target, false)
    if (!fs.rename(tmpTarget, target))
      throw new java.io.IOException(s"could not move $tmpTarget to $target")
  }

  /** Minimal xlsx reader (sheets this sink produces, or any single-sheet
    * file using inline strings / raw numeric cells — shared-strings tables
    * are resolved too): first row = column names, every value read as a
    * string column (schema-on-read casts are the caller's, same contract
    * as [[Sources.readCsv]] without an explicit schema). JDK DOM parser —
    * no third-party XML or ZIP code. */
  def readXlsx(spark: SparkSession, path: String): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val zin = new java.util.zip.ZipInputStream(
      fs.open(new org.apache.hadoop.fs.Path(path)))
    var sheetBytes: Array[Byte] = null
    var sharedBytes: Array[Byte] = null
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (e.getName == "xl/worksheets/sheet1.xml") sheetBytes = zin.readAllBytes()
        else if (e.getName == "xl/sharedStrings.xml") sharedBytes = zin.readAllBytes()
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()
    require(sheetBytes != null, s"no xl/worksheets/sheet1.xml in $path")

    def parse(bytes: Array[Byte]): org.w3c.dom.Document = {
      val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      dbf.setNamespaceAware(false)
      // parsing spreadsheet files from disk: no external entity resolution
      dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      dbf.newDocumentBuilder().parse(new java.io.ByteArrayInputStream(bytes))
    }
    val shared: IndexedSeq[String] =
      if (sharedBytes == null) IndexedSeq.empty
      else {
        val els = parse(sharedBytes).getElementsByTagName("si")
        (0 until els.getLength).map(i => decodeText(els.item(i).getTextContent))
      }

    val rows = parse(sheetBytes).getElementsByTagName("row")
    val parsed: Seq[Map[Int, String]] = (0 until rows.getLength).map { ri =>
      val cells = rows.item(ri).asInstanceOf[org.w3c.dom.Element]
        .getElementsByTagName("c")
      (0 until cells.getLength).flatMap { ci =>
        val c = cells.item(ci).asInstanceOf[org.w3c.dom.Element]
        val idx = lettersToIndex(c.getAttribute("r"))
        // ECMA-376 makes r= optional (cells become positional); this
        // reader doesn't track a positional cursor, so fail LOUDLY rather
        // than silently mis-keying the row's data
        require(idx >= 0,
          s"cell without an r= reference in row $ri — positional cells unsupported")
        val t = c.getAttribute("t")
        val value = t match {
          case "inlineStr" => Some(decodeText(c.getTextContent))
          case "s" =>
            val vs = c.getElementsByTagName("v")
            if (vs.getLength > 0) Some(shared(vs.item(0).getTextContent.trim.toInt))
            else None
          case _ =>
            val vs = c.getElementsByTagName("v")
            if (vs.getLength > 0) Some(vs.item(0).getTextContent) else None
        }
        value.map(idx -> _)
      }.toMap
    }
    require(parsed.nonEmpty, s"empty sheet in $path")
    val header = parsed.head
    val nCols = (header.keys ++ parsed.flatMap(_.keys)).max + 1
    val names = (0 until nCols).map(i => header.getOrElse(i, s"_c$i"))
    val schema = StructType(names.map(n => StructField(n, StringType)))
    val data = parsed.tail.map { m =>
      Row.fromSeq((0 until nCols).map(i => m.get(i).orNull))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toIndexedSeq), schema)
  }
}
