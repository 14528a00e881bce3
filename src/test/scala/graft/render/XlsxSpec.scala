package graft.render

import graft.SparkTestBase
import graft.compile.QuerySpec
import graft.core.TableSpec
import graft.core.ColumnSpec.dsl._
import org.apache.spark.sql.functions.col

/** Spec-level pins for the dependency-free .xlsx sink: container layout,
  * OOXML part well-formedness (JDK DOM parse), declaration-driven number
  * formats and widths, escaping, and a full write→read round trip — the
  * same own-codec verification standard as the BMP/WAV specs. */
class XlsxSpec extends SparkTestBase {

  private def table = TableSpec(friend, Seq(
    "id".ofCol(col("id")).width(4),
    "name".ofCol(col("name")).describe("昵称"),
    "ageOpt".ofCol(col("age")).decimals(2).width(10)))

  private def zipEntries(path: String): Map[String, Array[Byte]] = {
    val zin = new java.util.zip.ZipInputStream(
      new java.io.FileInputStream(path))
    val out = scala.collection.mutable.Map[String, Array[Byte]]()
    try {
      var e = zin.getNextEntry
      while (e != null) {
        out(e.getName) = zin.readAllBytes(); zin.closeEntry(); e = zin.getNextEntry
      }
    } finally zin.close()
    out.toMap
  }

  test("xlsx container: exactly the mandatory OOXML parts, all XML well-formed") {
    val path = s"target/xlsx_${System.nanoTime()}.xlsx"
    XlsxSink.writeXlsx(table, QuerySpec(), path)
    val entries = zipEntries(path)
    assert(entries.keySet == Set(
      "[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
      "xl/_rels/workbook.xml.rels", "xl/styles.xml", "xl/worksheets/sheet1.xml"))
    // every part must survive a strict JDK DOM parse
    entries.foreach { case (name, bytes) =>
      val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      dbf.newDocumentBuilder().parse(new java.io.ByteArrayInputStream(bytes))
    }
    val sheet = new String(entries("xl/worksheets/sheet1.xml"), "UTF-8")
    // raw value preserved, declared-decimals style applied
    assert(sheet.contains("""<c r="C2" s="1"><v>2333</v></c>"""), sheet)
    // declared width → real col element (1-based: id is col 1, ageOpt col 3)
    assert(sheet.contains("""<col min="1" max="1" width="4" customWidth="1"/>"""))
    assert(sheet.contains("""<col min="3" max="3" width="10" customWidth="1"/>"""))
    // null age (row 5 = doc row 4) emits NO cell, never an empty string
    assert(!sheet.contains("""r="C5""""), sheet)
    val styles = new String(entries("xl/styles.xml"), "UTF-8")
    assert(styles.contains("""formatCode="0.00""""), styles)
  }

  test("xlsx round trip: values and header survive write → read") {
    val path = s"target/xlsx_rt_${System.nanoTime()}.xlsx"
    XlsxSink.writeXlsx(table, QuerySpec(), path)
    val back = XlsxSink.readXlsx(spark, path)
    assert(back.columns.toSeq == Seq("id", "name", "ageOpt"))
    val rows = back.orderBy(col("id").cast("long"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(
      ("1", "魔理沙", "2333"),
      ("2", "jilen", "30"),
      ("3", "品神", "28"),
      ("4", "廖师虎", null)))
  }

  test("xlsx escaping: markup, control bytes, and literal _xHHHH_ round-trip EXACTLY") {
    import spark.implicits._
    // markup + a raw BEL control char + a literal _x0041_ marker: the
    // control char must travel as the spec's _xHHHH_ escape, the literal
    // marker must be protected with the mandatory _x005F_ prefix
    // (ECMA-376 par. 22.4.2.4) -- and the reader must invert both
    val value = "<b>&\"quoted\"</b>\u0007tail_x0041_end"
    val tricky = Seq((1L, value)).toDF("id", "name")
    val t = TableSpec(tricky, Seq("id".ofCol(col("id")), "name".ofCol(col("name"))))
    val path = s"target/xlsx_esc_${System.nanoTime()}.xlsx"
    XlsxSink.writeXlsx(t, QuerySpec(), path)
    assert(XlsxSink.readXlsx(spark, path).collect().head.getString(1) == value)
    // the raw sheet bytes must carry the escapes (a compliant reader
    // would decode them identically), never a bare control byte
    val sheet = new String(zipEntries(path)("xl/worksheets/sheet1.xml"), "UTF-8")
    assert(sheet.contains("_x0007_") && sheet.contains("_x005F_x0041_"), sheet)
    assert(!sheet.exists(c => c < ' ' && c != '\t' && c != '\n' && c != '\r'))
  }

  test("readXlsx resolves shared-strings sheets (files from other writers)") {
    // hand-build a minimal xlsx whose cells use the sharedStrings table
    // (t="s") — the layout Excel itself writes — to pin the reader's
    // claim beyond the inline-string files our own sink produces
    val path = s"target/xlsx_shared_${System.nanoTime()}.xlsx"
    val zout = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def part(name: String, body: String): Unit = {
      zout.putNextEntry(new java.util.zip.ZipEntry(name))
      zout.write(body.getBytes("UTF-8")); zout.closeEntry()
    }
    try {
      part("xl/sharedStrings.xml",
        """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">""" +
          "<si><t>name</t></si><si><t>alpha</t></si><si><t>beta_x005F_x0041_</t></si></sst>")
      part("xl/worksheets/sheet1.xml",
        """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
          """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="inlineStr"><is><t>n</t></is></c></row>""" +
          """<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>7</v></c></row>""" +
          """<row r="3"><c r="A3" t="s"><v>2</v></c></row>""" +
          "</sheetData></worksheet>")
    } finally zout.close()
    val back = XlsxSink.readXlsx(spark, path)
    assert(back.columns.toSeq == Seq("name", "n"))
    val rows = back.orderBy(col("name")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    // shared-string escapes decode too: _x005F_x0041_ → literal _x0041_
    assert(rows.toSeq == Seq(("alpha", "7"), ("beta_x0041_", null)))
  }

  test("xlsx honors the request: projection + pagination reach the sheet") {
    val path = s"target/xlsx_req_${System.nanoTime()}.xlsx"
    XlsxSink.writeXlsx(table,
      QuerySpec(columns = Some(Seq("name")), take = Some(2L)), path)
    val back = XlsxSink.readXlsx(spark, path)
    assert(back.columns.toSeq == Seq("name"))
    assert(back.count() == 2)
  }
}
