package graft.transform

import graft.core.ColumnSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

import scala.reflect.runtime.universe.TypeTag

/** Row-level N→1 derived columns — the Spark-native `poly(...).transform{...}`
  * (reference: framework/ubw-core/src/main/scala/net/scalax/ubw/core/PileHelper.scala:117-179,
  * usage sample/commonSlick/src/main/scala/Sample07.scala:36-51, semantics
  * documentation/doc-03.md:7-65).
  *
  * Two tiers, per SURVEY §7.3:
  *  - [[expr]]: compose native `Column` expressions (`when`/`concat`/…) —
  *    stays inside whole-stage codegen; always prefer this.
  *  - [[poly1]]/[[poly2]]/[[poly3]]/[[poly4]]: typed Scala-function fallback
  *    for logic `Column` algebra can't express. Inputs and output are
  *    `Option`-lifted so the reference's absent-value algebra
  *    (`FSomeValue`/`emptyValue`/`Zero`, AtomicValue.scala:26-48,
  *    Sample09.scala:38-39) maps exactly onto Spark nulls: null cell ⇔ `None`.
  *
  * Derived columns re-declare their JSON name, report their own (unqualified)
  * result-type name, and recompute orderability from the consumed inputs —
  * all three observable in the doc-03 golden (properties after poly,
  * doc-03.md:56-59).
  */
object Derive {

  /** Native-expression derived column (preferred tier). */
  def expr(name: String, inputs: ColumnSpec*)(f: Seq[Column] => Column): ColumnSpec =
    ColumnSpec(name, f(inputs.map(_.effCol)), polyInputs = inputs.toSeq)

  private def shortName[R: TypeTag]: String =
    scala.reflect.runtime.universe.typeOf[R].dealias.toString.split('.').last

  def poly1[A1: TypeTag, R: TypeTag](name: String, s1: ColumnSpec)(
      f: Option[A1] => Option[R]): ColumnSpec = {
    val u = udf((a1: Option[A1]) => f(a1))
    ColumnSpec(name, u(s1.effCol), polyInputs = Seq(s1),
      typeNameOverride = Some(shortName[R]))
  }

  def poly2[A1: TypeTag, A2: TypeTag, R: TypeTag](
      name: String, s1: ColumnSpec, s2: ColumnSpec)(
      f: (Option[A1], Option[A2]) => Option[R]): ColumnSpec = {
    val u = udf((a1: Option[A1], a2: Option[A2]) => f(a1, a2))
    ColumnSpec(name, u(s1.effCol, s2.effCol), polyInputs = Seq(s1, s2),
      typeNameOverride = Some(shortName[R]))
  }

  def poly3[A1: TypeTag, A2: TypeTag, A3: TypeTag, R: TypeTag](
      name: String, s1: ColumnSpec, s2: ColumnSpec, s3: ColumnSpec)(
      f: (Option[A1], Option[A2], Option[A3]) => Option[R]): ColumnSpec = {
    val u = udf((a1: Option[A1], a2: Option[A2], a3: Option[A3]) => f(a1, a2, a3))
    ColumnSpec(name, u(s1.effCol, s2.effCol, s3.effCol),
      polyInputs = Seq(s1, s2, s3), typeNameOverride = Some(shortName[R]))
  }

  def poly4[A1: TypeTag, A2: TypeTag, A3: TypeTag, A4: TypeTag, R: TypeTag](
      name: String, s1: ColumnSpec, s2: ColumnSpec, s3: ColumnSpec, s4: ColumnSpec)(
      f: (Option[A1], Option[A2], Option[A3], Option[A4]) => Option[R]): ColumnSpec = {
    val u = udf((a1: Option[A1], a2: Option[A2], a3: Option[A3], a4: Option[A4]) =>
      f(a1, a2, a3, a4))
    ColumnSpec(name, u(s1.effCol, s2.effCol, s3.effCol, s4.effCol),
      polyInputs = Seq(s1, s2, s3, s4), typeNameOverride = Some(shortName[R]))
  }
}
