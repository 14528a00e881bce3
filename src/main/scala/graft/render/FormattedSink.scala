package graft.render

import graft.compile.QuerySpec
import graft.core.TableSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, format_number, length, lpad, when}

/** Declaration-driven formatted writer — the POI-free analog of the
  * reference's Excel sink, whose column widths and decimal formats come
  * from the column declaration (reference: documentation/doc-01.md:111-115;
  * `.decimals(n)` / `.width(n)` on [[graft.core.ColumnSpec]]).
  *
  * Formatting runs DISTRIBUTED: `format_number`/`lpad` are codegen'd
  * built-ins applied in the projection, so the sink scales with the write,
  * not the driver. The declaration metadata itself (type, describe,
  * decimals, width per column) is emitted as a `_format.json` sidecar next
  * to the CSV so a spreadsheet-producing downstream can apply real column
  * widths and number formats without re-deriving them. */
object FormattedSink {

  /** The compiled query with declaration formats applied: numeric columns
    * with `.decimals(n)` render via format_number (fixed n decimals,
    * thousands grouping — the Excel display convention); `.width(n)`
    * right-aligns into an n-character field. A value WIDER than the
    * declared width passes through untouched — like a spreadsheet column
    * width, the format never truncates data. */
  def formattedFrame(table: TableSpec, qs: QuerySpec = QuerySpec()): DataFrame = {
    val df = table.query(qs)
    val byName = table.registry
    val cols = df.schema.fields.map { f =>
      val spec = byName.get(f.name)
      val isNumeric = f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
      var c = col(f.name)
      spec.flatMap(_.formatDecimals).filter(_ => isNumeric)
        .foreach(d => c = format_number(col(f.name), d))
      spec.flatMap(_.formatWidth).foreach { w =>
        val s = c.cast("string")
        c = when(length(s) < w, lpad(s, w, " ")).otherwise(s)
      }
      c.as(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** One sidecar line per column OF THE REQUEST's projection (same columns,
    * same order as the CSV the request produced). */
  def formatMetadataJson(table: TableSpec, qs: QuerySpec = QuerySpec()): String = {
    import JsonWriter.{jsonString => js}
    val propsByName = table.properties.map(p => p.property -> p).toMap
    val emitted = table.query(qs).schema.fieldNames.toSeq
    emitted.flatMap { name =>
      for (p <- propsByName.get(name); s <- table.registry.get(name)) yield
        s"""{"property":${js(p.property)},"typeName":${js(p.typeName)},""" +
          s""""describe":${p.describe.map(js).getOrElse("null")},""" +
          s""""decimals":${s.formatDecimals.getOrElse(-1)},""" +
          s""""width":${s.formatWidth.getOrElse(-1)}}"""
    }.mkString("[", ",", "]")
  }

  /** Write the formatted CSV (distributed) plus the `_format.json` sidecar
    * (via the Hadoop FS API, so the same code targets HDFS/object stores). */
  def writeFormattedCsv(table: TableSpec, qs: QuerySpec, path: String): Unit = {
    val df = formattedFrame(table, qs)
    df.write.mode("overwrite").option("header", "true").csv(path)
    val spark = table.df.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(path, "_format.json"), true)
    try out.write(formatMetadataJson(table, qs).getBytes("UTF-8"))
    finally out.close()
  }
}
