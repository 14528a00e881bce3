package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr
import scala.jdk.CollectionConverters._

/** JSON column-declaration config → [[TableSpec]] — the Spark-native
  * `SimpleTable`: declaring a queryable surface over a schema-less source
  * entirely from runtime strings (reference: sample/commonSlick/.../
  * Models.scala:26-34, Sample08.scala:24-33; docs call out building the
  * whole declaration from JSON, doc-01.md:136-158).
  *
  * Column entry shape:
  * {{{
  * { "name": "bal", "expr": "c_acctbal",     // any SQL expression
  *   "describe": "balance", "inView": true,
  *   "order": true, "orderTarget": "other", "defaultDesc": false,
  *   "filters": ["eq", "ge", "like"], "default": 0 }
  * }}}
  */
object DynamicTable {

  private val mapper = new ObjectMapper()

  def fromJson(df: DataFrame, json: String, strict: Boolean = false): TableSpec = {
    val root = mapper.readTree(json)
    val cols = root.get("columns").elements().asScala.map(parseColumn).toSeq
    TableSpec(df, cols, strict)
  }

  private def parseColumn(n: JsonNode): ColumnSpec = {
    def opt(name: String): Option[JsonNode] =
      Option(n.get(name)).filterNot(_.isNull)
    var spec = ColumnSpec(
      name = n.get("name").asText(),
      col = expr(opt("expr").map(_.asText()).getOrElse(n.get("name").asText())))
    opt("describe").foreach(d => spec = spec.describe(d.asText()))
    opt("inView").foreach(v => spec = spec.visible(v.asBoolean(true)))
    if (opt("order").exists(_.asBoolean(false))) spec = spec.order
    opt("orderTarget").foreach(t => spec = spec.orderTarget(t.asText()))
    opt("defaultDesc").foreach(d =>
      spec = if (d.asBoolean(true)) spec else spec.defaultAsc)
    opt("filters").foreach { fs =>
      val ops = fs.elements().asScala.flatMap(f => FilterOp.byName.get(f.asText())).toSeq
      spec = spec.filterable(ops: _*)
    }
    opt("default").foreach { d =>
      // keep integral defaults as Int when they fit, so coalesce doesn't
      // silently widen an Int column to Long
      val v: Any =
        if (d.isBoolean) d.asBoolean()
        else if (d.isIntegralNumber)
          if (d.canConvertToInt) d.asInt() else d.asLong()
        else if (d.isNumber) d.asDouble()
        else d.asText()
      spec = spec.withDefault(v)
    }
    spec
  }
}
