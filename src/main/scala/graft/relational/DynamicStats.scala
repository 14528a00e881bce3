package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Dynamic multi-dimensional statistics — the Spark-native rendition of the
  * reference's "fQuery with groupBy that aggregates over different dimensions
  * chosen per request" (reference: documentation/doc-03.md:86).
  *
  * Dimensions arrive as runtime strings (e.g. parsed from a JSON request),
  * measures as named aggregate expressions; the mode lifts the same request
  * to rollup/cube super-aggregates — a strict superset of what Slick gave
  * the reference. Everything stays one Catalyst plan: partial (map-side)
  * aggregation, AQE-sized shuffles, codegen all apply, so the same request
  * scales from 6k rows to 100 TB without a code change.
  */
object DynamicStats {

  sealed trait Mode
  object Mode {
    case object Flat   extends Mode
    case object Rollup extends Mode
    case object Cube   extends Mode
    /** Arbitrary GROUPING SETS — each inner Seq names the dimensions kept in
      * that grouping (all must be members of `dims`). Rollup/Cube are the
      * prefix-chain / power-set special cases; this is the general request. */
    final case class GroupingSets(sets: Seq[Seq[String]]) extends Mode
  }

  final case class Measure(name: String, agg: Column)

  def stats(
      df: DataFrame,
      dims: Seq[String],
      measures: Seq[Measure],
      mode: Mode = Mode.Flat): DataFrame = {
    require(measures.nonEmpty, "at least one measure required")
    val d = dims.map(col)
    val grouped = mode match {
      case Mode.Flat   => df.groupBy(d: _*)
      case Mode.Rollup => df.rollup(d: _*)
      case Mode.Cube   => df.cube(d: _*)
      case Mode.GroupingSets(sets) =>
        require(sets.nonEmpty, "at least one grouping set required")
        val unknown = sets.flatten.distinct.filterNot(dims.contains)
        require(unknown.isEmpty, s"grouping-set dims not in dims: $unknown")
        df.groupingSets(sets.map(_.map(col)), d: _*)
    }
    val aggs = measures.map(m => m.agg.as(m.name))
    grouped.agg(aggs.head, aggs.tail: _*)
  }
}
