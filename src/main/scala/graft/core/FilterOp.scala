package graft.core

/** Dynamic-filter predicate kinds a column can opt into.
  *
  * Spark-native rendition of the reference's per-column filter capability
  * (reference: sample/commonSlick/src/main/scala/Sample09.scala:31-35, where
  * `.filter.likeable` opts a column into a request-time `like` predicate, and
  * the request is a `Map[property -> Map[opName -> value]]`).
  */
sealed abstract class FilterOp(val opName: String) extends Product with Serializable

object FilterOp {
  case object Eq      extends FilterOp("eq")
  case object Ne      extends FilterOp("ne")
  case object Like    extends FilterOp("like")
  case object Gt      extends FilterOp("gt")
  case object Ge      extends FilterOp("ge")
  case object Lt      extends FilterOp("lt")
  case object Le      extends FilterOp("le")
  case object In      extends FilterOp("in")
  case object Between extends FilterOp("between")

  val all: Seq[FilterOp] = Seq(Eq, Ne, Like, Gt, Ge, Lt, Le, In, Between)
  val byName: Map[String, FilterOp] = all.map(op => op.opName -> op).toMap

  /** the comparison family, minus `like` (for non-string columns) */
  val comparisons: Set[FilterOp] = Set(Eq, Ne, Gt, Ge, Lt, Le, In, Between)
}
