package graft.compile

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** JSON request → [[QuerySpec]] — the reference's stated goal of driving
  * whole queries from a JSON/XML description sent by a client
  * (reference: documentation/doc-03.md:84, doc-01.md:136-158; the filter
  * map shape `{"name": {"like": "%魔%"}}` is Sample09.scala:56).
  *
  * Accepted shape (all fields optional):
  * {{{
  * { "columns": ["cust_name", "cust_key"],
  *   "filters": {"segment": {"eq": "BUILDING"}, "bal": {"ge": 1000}},
  *   "orders":  [{"column": "cust_name", "desc": true}],
  *   "drop": 5, "take": 10, "pageIndex": 0, "pageSize": 20 }
  * }}}
  */
object RequestJson {

  private val mapper = new ObjectMapper()

  def parseQuerySpec(json: String): QuerySpec = {
    val root = mapper.readTree(json)
    def opt(name: String): Option[JsonNode] =
      Option(root.get(name)).filterNot(_.isNull)

    QuerySpec(
      columns = opt("columns").map(_.elements().asScala.map(_.asText()).toSeq),
      filters = opt("filters").map { f =>
        f.properties().asScala.map { e =>
          e.getKey -> e.getValue.properties().asScala
            .map(op => op.getKey -> value(op.getValue)).toMap
        }.toMap
      }.getOrElse(Map.empty),
      orders = opt("orders").map(_.elements().asScala.map { o =>
        ColumnOrder(o.get("column").asText(),
          Option(o.get("desc")).exists(_.asBoolean(false)))
      }.toSeq).getOrElse(Nil),
      drop = opt("drop").map(_.asLong()),
      take = opt("take").map(_.asLong()),
      pageIndex = opt("pageIndex").map(_.asLong()),
      pageSize = opt("pageSize").map(_.asLong()))
  }

  /** JSON scalar/array → the Any the predicate builder understands. */
  private def value(n: JsonNode): Any =
    if (n.isArray) n.elements().asScala.map(value).toSeq
    else if (n.isBoolean) n.asBoolean()
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isNumber) n.asDouble()
    else n.asText()
}
