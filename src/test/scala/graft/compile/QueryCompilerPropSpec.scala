package graft.compile

import graft.SparkTestBase
import graft.core.{ColumnSpec, FilterOp, TableSpec}
import graft.core.ColumnSpec.dsl._
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based contract for the dynamic-query compiler (SURVEY §5 item 3):
  * for arbitrary capability declarations and arbitrary requests, the lenient
  * compiler (a) never throws, and (b) agrees with a naive in-memory
  * evaluation of the documented semantics — declaration-order sort keys,
  * orderTarget redirection, elision of unknown/uncapable requests, nulls
  * last, offset/limit after sort. */
class QueryCompilerPropSpec extends SparkTestBase {

  // the friend fixture rows as an in-memory model: (id, name, nick, age)
  private val data: Seq[(Long, String, String, Option[Int])] = Seq(
    (1L, "魔理沙", "小莎莎", Some(2333)),
    (2L, "jilen", "jilen 酱", Some(30)),
    (3L, "品神", "kerr", Some(28)),
    (4L, "廖师虎", "shihu", None))

  private case class Caps(sortable: Boolean, redirect: Option[String], filterable: Boolean)

  private val colNames = Seq("name", "nick", "ageOpt")

  private val genCaps: Gen[Caps] = for {
    sortable <- Gen.oneOf(true, false)
    redirect <- Gen.option(Gen.oneOf("id", "nick", "ageOpt"))
    filterable <- Gen.oneOf(true, false)
  } yield Caps(sortable, redirect, filterable)

  private val genOrders: Gen[Seq[ColumnOrder]] = for {
    names <- Gen.someOf("id" +: colNames :+ "bogus")
    dirs <- Gen.listOfN(names.size, Gen.oneOf(true, false))
  } yield names.toSeq.zip(dirs).map { case (n, d) => ColumnOrder(n, d) }

  private val genFilter: Gen[Map[String, Map[String, Any]]] = for {
    useAge <- Gen.oneOf(true, false)
    ageOp <- Gen.oneOf("ge", "lt", "eq")
    ageV <- Gen.oneOf(28, 30, 100, 2333)
    useName <- Gen.oneOf(true, false)
    pat <- Gen.oneOf("%i%", "%魔%", "nope")
    bogus <- Gen.oneOf(true, false)
  } yield {
    var m = Map.empty[String, Map[String, Any]]
    if (useAge) m += "ageOpt" -> Map(ageOp -> ageV)
    if (useName) m += "name" -> Map("like" -> pat)
    if (bogus) m += "bogus" -> Map("eq" -> 1)
    m
  }

  private val genPage: Gen[(Option[Long], Option[Long])] = for {
    drop <- Gen.option(Gen.choose(0L, 5L))
    take <- Gen.option(Gen.choose(0L, 5L))
  } yield (drop, take)

  test("lenient compiler ≡ in-memory reference semantics (scalacheck)") {
    val prop = Prop.forAll(genCaps, genCaps, genCaps, genOrders, genFilter, genPage) {
      (nameCaps: Caps, nickCaps: Caps, ageCaps: Caps,
       orders: Seq[ColumnOrder], filters: Map[String, Map[String, Any]],
       page: (Option[Long], Option[Long])) =>

        val capsByName = Map("name" -> nameCaps, "nick" -> nickCaps, "ageOpt" -> ageCaps)
        def build(name: String, c: ColumnSpec, caps: Caps): ColumnSpec = {
          var s = c
          if (caps.sortable) s = s.order
          caps.redirect.foreach(r => s = s.orderTarget(r))
          if (caps.filterable) s = s.comparable.likeable
          s
        }
        val specs = Seq(
          "id".ofCol(col("id")).order, // unique key, always sortable
          build("name", "name".ofCol(col("name")), nameCaps),
          build("nick", "nick".ofCol(col("nick")), nickCaps),
          build("ageOpt", "ageOpt".ofCol(col("age")), ageCaps))
        val table = TableSpec(friend, specs)
        // force a total order so Spark/model agree on ties
        val req = QuerySpec(
          orders = orders :+ ColumnOrder("id", desc = false),
          filters = filters, drop = page._1, take = page._2)

        val got = table.query(req).select("id").collect().map(_.getLong(0)).toSeq

        // ---- in-memory model ----
        def cell(row: (Long, String, String, Option[Int]), name: String): Option[Any] =
          name match {
            case "id" => Some(row._1)
            case "name" => Some(row._2)
            case "nick" => Some(row._3)
            case "ageOpt" => row._4
            case _ => None
          }
        // filters: AND of declared+capable predicates, unknown elided
        def passes(row: (Long, String, String, Option[Int])): Boolean =
          filters.forall { case (name, ops) =>
            if (!capsByName.contains(name) && name != "id") true // unknown
            else if (name == "id") true // id declared without filter caps
            else if (!capsByName(name).filterable) true // uncapable → elided
            else ops.forall { case (op, v) =>
              val c = cell(row, name)
              (op, c) match {
                case (_, None) => false // SQL null comparisons are not true
                case ("like", Some(s: String)) =>
                  val pat = v.toString.replace("%", ".*")
                  s.matches(pat)
                case ("eq", Some(a: Int)) => a == v.asInstanceOf[Int]
                case ("ge", Some(a: Int)) => a >= v.asInstanceOf[Int]
                case ("lt", Some(a: Int)) => a < v.asInstanceOf[Int]
                case _ => true
              }
            }
          }
        // orders: first request per name, applied in declaration order
        val reqByName = req.orders.reverse.map(o => o.name -> o.desc).toMap
        val declOrder = Seq("id", "name", "nick", "ageOpt")
        def sortKey(name: String): Option[String] = {
          val caps = capsByName.get(name)
          name match {
            case "id" => Some("id")
            case _ =>
              caps.flatMap(_.redirect).filter(r => r == "id" || capsByName.contains(r))
                .orElse(if (caps.exists(_.sortable)) Some(name) else None)
          }
        }
        val effKeys: Seq[(String, Boolean)] = declOrder.flatMap { n =>
          reqByName.get(n).flatMap(desc => sortKey(n).map(k => (k, desc)))
        }
        implicit val anyOrd: Ordering[(Option[Any], Boolean)] = Ordering.fromLessThan {
          case ((None, _), (None, _)) => false
          case ((None, _), _) => false // nulls last regardless of direction
          case (_, (None, _)) => true
          case ((Some(a), desc), (Some(b), _)) =>
            val cmp = (a, b) match {
              case (x: Long, y: Long) => x.compareTo(y)
              case (x: Int, y: Int) => x.compareTo(y)
              case (x: String, y: String) => x.compareTo(y)
              case _ => 0
            }
            if (desc) cmp > 0 else cmp < 0
        }
        val filtered = data.filter(passes)
        val sorted = filtered.sortBy(r => effKeys.map { case (k, desc) =>
          (cell(r, k), desc)
        })(Ordering.Implicits.seqOrdering(anyOrd))
        val offset = req.effectiveOffset.getOrElse(0L).toInt
        val sliced = req.effectiveLimit
          .map(l => sorted.slice(offset, offset + l.toInt))
          .getOrElse(sorted.drop(offset))
        val expected = sliced.map(_._1)

        val ok = got == expected
        if (!ok) System.err.println(
          s"[prop-fail] got=$got expected=$expected caps=$capsByName " +
            s"orders=${req.orders} filters=$filters page=$page")
        ok
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(result.passed, result.status.toString)
  }
}
