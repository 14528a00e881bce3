package graft.queries

import graft.Tables
import graft.compile.{ColumnOrder, QuerySpec}
import graft.core.ColumnSpec.dsl._
import graft.core.TableSpec
import graft.transform.Derive
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's own declaration/dynamic-query surface (SURVEY §2.1,
  * C1–C18) exercised through the driver gate on the real parquet tables.
  * Every query here is compiled by [[graft.compile.QueryCompiler]] from a
  * `TableSpec` + `QuerySpec` — the oracle SQL states the contract the
  * compiler must produce. */
object CoreSurface {

  private def customer(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer")

  /** C1/C2 name binding + GraphQL-style per-request projection. */
  def projection(s: SparkSession, dir: String): DataFrame =
    TableSpec(customer(s, dir), Seq(
      "cust_key".ofCol(col("c_custkey")).order,
      "cust_name".ofCol(col("c_name")),
      "segment".ofCol(col("c_mktsegment"))))
      .query(QuerySpec(columns = Some(Seq("cust_name", "cust_key"))))

  val projectionSql: String =
    "SELECT c_name AS cust_name, c_custkey AS cust_key FROM customer"

  /** C4 dynamic sort with orderTarget redirection + pagination: request
    * sorts `cust_name desc` → redirected to balance desc; tiebreak key asc;
    * rows 6..15 of the total order. */
  def orderPage(s: SparkSession, dir: String): DataFrame =
    TableSpec(customer(s, dir), Seq(
      "cust_name".ofCol(col("c_name")).orderTarget("bal"),
      "cust_key".ofCol(col("c_custkey")).order,
      "bal".ofCol(col("c_acctbal")).order))
      .query(QuerySpec(
        orders = Seq(ColumnOrder("cust_name", desc = true),
                     ColumnOrder("cust_key", desc = false)),
        drop = Some(5), take = Some(10)))

  val orderPageSql: String =
    """SELECT c_name AS cust_name, c_custkey AS cust_key, c_acctbal AS bal
      |FROM customer
      |ORDER BY c_acctbal DESC NULLS LAST, c_custkey ASC NULLS LAST
      |LIMIT 10 OFFSET 5""".stripMargin

  /** C8 dynamic per-request filters: like + comparison, unknown keys elided. */
  def dynamicFilter(s: SparkSession, dir: String): DataFrame =
    TableSpec(customer(s, dir), Seq(
      "cust_key".ofCol(col("c_custkey")).order,
      "cust_name".ofCol(col("c_name")).likeable,
      "segment".ofCol(col("c_mktsegment")).filterable(graft.core.FilterOp.Eq),
      "bal".ofCol(col("c_acctbal")).comparable))
      .query(QuerySpec(filters = Map(
        "segment" -> Map("eq" -> "BUILDING"),
        "bal" -> Map("ge" -> 1000),
        "no_such_column" -> Map("eq" -> 1),      // silently elided
        "cust_name" -> Map("like" -> "%1%"))))

  val dynamicFilterSql: String =
    """SELECT c_custkey AS cust_key, c_name AS cust_name,
      |       c_mktsegment AS segment, c_acctbal AS bal
      |FROM customer
      |WHERE c_acctbal >= 1000 AND c_name LIKE '%1%' AND c_mktsegment = 'BUILDING'""".stripMargin

  /** C9 poly/derived column in the native-expression tier (whole-stage
    * codegen, no UDF): balance tier + a merged display name. */
  def polyDerive(s: SparkSession, dir: String): DataFrame = {
    val key = "cust_key".ofCol(col("c_custkey")).order
    val name = "cust_name".ofCol(col("c_name"))
    val bal = "bal".ofCol(col("c_acctbal"))
    val seg = "segment".ofCol(col("c_mktsegment"))
    val tier = Derive.expr("tier", bal) { case Seq(b) =>
      when(b < 0, lit("neg")).when(b < 5000, lit("mid")).otherwise(lit("high"))
    }
    val display = Derive.expr("display", name, seg) { case Seq(n, g) =>
      concat(n, lit(" ["), g, lit("]"))
    }
    TableSpec(customer(s, dir), Seq(key, tier, display)).query(QuerySpec())
  }

  val polyDeriveSql: String =
    """SELECT c_custkey AS cust_key,
      |  CASE WHEN c_acctbal < 0 THEN 'neg'
      |       WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS tier,
      |  c_name || ' [' || c_mktsegment || ']' AS display
      |FROM customer""".stripMargin

  /** C7/readJ + SimpleTable: the entire query — column declarations AND the
    * request — arrives as JSON strings, exactly the client-driven flow the
    * reference documents (doc-03.md:84, doc-01.md:136-158). Declaration
    * order puts `bal` before `cust_key`, so the requested sort resolves to
    * `bal desc, cust_key asc`. */
  /** Binary Excel round trip through the declaration-driven xlsx sink
    * (reference Excel surface, doc-01.md:109-115): nation → real .xlsx
    * (JDK-only OOXML; `.decimals`/`.width` become real number formats /
    * column widths) → read back. The oracle pins the VALUES that survive
    * the container round trip — integers keep their raw lexical form, so
    * the string compare is engine-portable. */
  def xlsxRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val t = TableSpec(Tables.load(s, dir, "nation"), Seq(
      "n_nationkey".ofCol(col("n_nationkey")).width(6),
      "n_name".ofCol(col("n_name")),
      "n_regionkey".ofCol(col("n_regionkey")).decimals(0)))
    val tmp = java.nio.file.Files.createTempDirectory("graft_xlsx")
    val path = tmp.resolve("nation.xlsx").toString
    try {
      graft.render.XlsxSink.writeXlsx(t, QuerySpec(), path)
      // readXlsx materializes driver-side rows, so the temp file can go
      graft.render.XlsxSink.readXlsx(s, path)
    } finally {
      // the local Hadoop FS also leaves a .crc sidecar → sweep the dir
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  val xlsxRoundtripSql: String =
    """SELECT CAST(n_nationkey AS VARCHAR) AS n_nationkey, n_name,
      |       CAST(n_regionkey AS VARCHAR) AS n_regionkey
      |FROM nation""".stripMargin

  def jsonRequest(s: SparkSession, dir: String): DataFrame = {
    val config =
      """{"columns": [
        |  {"name": "cust_name", "expr": "c_name", "filters": ["like"]},
        |  {"name": "bal", "expr": "c_acctbal", "order": true, "filters": ["ge", "le"]},
        |  {"name": "cust_key", "expr": "c_custkey", "order": true},
        |  {"name": "segment", "expr": "c_mktsegment", "filters": ["eq"]}]}""".stripMargin
    val request =
      """{"filters": {"segment": {"eq": "MACHINERY"}, "bal": {"ge": 2000}},
        |  "orders": [{"column": "bal", "desc": true}, {"column": "cust_key"}],
        |  "take": 25}""".stripMargin
    graft.core.DynamicTable.fromJson(customer(s, dir), config)
      .query(graft.compile.RequestJson.parseQuerySpec(request))
  }

  val jsonRequestSql: String =
    """SELECT c_name AS cust_name, c_acctbal AS bal, c_custkey AS cust_key,
      |       c_mktsegment AS segment
      |FROM customer
      |WHERE c_mktsegment = 'MACHINERY' AND c_acctbal >= 2000
      |ORDER BY c_acctbal DESC NULLS LAST, c_custkey ASC NULLS LAST
      |LIMIT 25""".stripMargin

  /** C6 hidden columns: sort key pruned from output but still applied. */
  def hiddenSort(s: SparkSession, dir: String): DataFrame =
    TableSpec(customer(s, dir), Seq(
      "cust_key".ofCol(col("c_custkey")).order.hidden,
      "cust_name".ofCol(col("c_name")),
      "bal".ofCol(col("c_acctbal"))))
      .query(QuerySpec(orders = Seq(ColumnOrder("cust_key", desc = false)),
        take = Some(20)))

  val hiddenSortSql: String =
    """SELECT c_name AS cust_name, c_acctbal AS bal FROM customer
      |ORDER BY c_custkey ASC LIMIT 20""".stripMargin

  /** C18 DefaultValue: absent value replaced at declaration level. */
  def defaultValue(s: SparkSession, dir: String): DataFrame =
    TableSpec(customer(s, dir), Seq(
      "cust_key".ofCol(col("c_custkey")).order,
      "pos_bal".ofCol(when(col("c_acctbal") >= 0, col("c_acctbal")))
        .withDefault(0.0)))
      .query(QuerySpec())

  val defaultValueSql: String =
    """SELECT c_custkey AS cust_key,
      |  COALESCE(CASE WHEN c_acctbal >= 0 THEN c_acctbal END, 0.0) AS pos_bal
      |FROM customer""".stripMargin
}
