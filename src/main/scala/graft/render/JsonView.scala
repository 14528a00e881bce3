package graft.render

import graft.compile.QuerySpec
import graft.core.TableSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** One entry of the client-facing column-descriptor array — field-for-field
  * the reference's properties object (reference: documentation/doc-02.md:110-114). */
final case class PropertyInfo(
    property: String,
    typeName: String,
    inRetrieve: Boolean,
    canOrder: Boolean,
    isDefaultDesc: Boolean,
    describe: Option[String]) {

  def toJson: String = {
    import JsonWriter.{jsonString => js}
    s"""{"property":${js(property)},"typeName":${js(typeName)},""" +
      s""""inRetrieve":$inRetrieve,"canOrder":$canOrder,""" +
      s""""isDefaultDesc":$isDefaultDesc,""" +
      s""""describe":${describe.map(js).getOrElse("null")}}"""
  }
}

/** The JSON view sink: column descriptors + one JSON object per row
  * (reference: Sample05.scala:35-36, shape at doc-02.md:96-117, assembled by
  * Helper.prettyPrint Helper.scala:38-41).
  *
  * Unlike Spark's own `toJSON`, null cells are rendered explicitly
  * (`"ageOpt": null`) to match the reference's circe output (doc-02.md:103).
  */
final case class JsonView(properties: Seq[PropertyInfo], data: Seq[String]) {
  def propertiesJson: String = properties.map(_.toJson).mkString("[", ",", "]")
  def dataJson: String = data.mkString("[", ",", "]")
  def toJson: String = s"""{"properties":$propertiesJson,"data":$dataJson}"""
}

/** A [[JsonView]] page plus the unpaged result total — the pager contract
  * implied by pageIndex/pageSize requests (reference: doc-02.md:135). */
final case class PagedView(total: Long, view: JsonView) {
  def toJson: String =
    s"""{"total":$total,"properties":${view.propertiesJson},"data":${view.dataJson}}"""
}

object JsonView {
  def render(table: TableSpec, qs: QuerySpec): JsonView = {
    val df = table.query(qs)
    val schema = df.schema
    // collect() is the sink action: bounded by the request's pagination.
    val rows = df.collect()
    JsonView(table.properties, rows.toIndexedSeq.map(JsonWriter.writeRow(schema)))
  }
}

/** Minimal JSON serializer for Spark rows with explicit nulls.
  * Covers the types the engine emits: numerics, strings, booleans,
  * timestamps/dates (ISO-8601), arrays, structs, maps, binary (base64),
  * decimals. */
object JsonWriter {

  def writeRow(schema: StructType)(row: Row): String =
    schema.fields.zipWithIndex
      .map { case (f, i) =>
        val v = row.get(i)
        // rawJson columns (ColumnSpec.asRawJson) hold serialized JSON: emit verbatim
        val rendered =
          if (v != null && f.metadata.contains("rawJson") &&
            f.metadata.getBoolean("rawJson")) v.toString
          else value(f.dataType, v)
        s"${jsonString(f.name)}:$rendered"
      }
      .mkString("{", ",", "}")

  def value(dt: DataType, v: Any): String =
    if (v == null) "null"
    else
      dt match {
        case StringType => jsonString(v.toString)
        case _: DecimalType => v.asInstanceOf[java.math.BigDecimal].toPlainString
        case TimestampType | TimestampNTZType | DateType => jsonString(v.toString)
        case BinaryType =>
          jsonString(java.util.Base64.getEncoder.encodeToString(v.asInstanceOf[Array[Byte]]))
        case ArrayType(et, _) =>
          v.asInstanceOf[scala.collection.Seq[Any]]
            .map(value(et, _)).mkString("[", ",", "]")
        case st: StructType => writeRow(st)(v.asInstanceOf[Row])
        case MapType(_, vt, _) =>
          v.asInstanceOf[scala.collection.Map[Any, Any]]
            .map { case (k, mv) => s"${jsonString(String.valueOf(k))}:${value(vt, mv)}" }
            .mkString("{", ",", "}")
        case DoubleType | FloatType =>
          val d = v.toString.toDouble
          if (d.isNaN || d.isInfinite) jsonString(v.toString) else v.toString
        case _ => v.toString // integral numerics, boolean
      }

  def jsonString(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"'            => sb.append("\\\"")
      case '\\'           => sb.append("\\\\")
      case '\n'           => sb.append("\\n")
      case '\r'           => sb.append("\\r")
      case '\t'           => sb.append("\\t")
      case c if c < ' '   => sb.append(f"\\u${c.toInt}%04x")
      case c              => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }
}
