package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the single right row with
  * the same key and the greatest right-time ≤ left-time (the classic
  * event/quote alignment operator; absent from both the reference and Spark
  * core — SURVEY §2.2 "semi/anti/range/as-of" row).
  *
  * Built by composition (custom-operator preference (a), no custom
  * strategy needed): tag both sides, union on (keys, time), and carry the
  * latest right payload forward with `last(_, ignoreNulls)` over a
  * keys-partitioned time-ordered window. ONE shuffle of |L|+|R| rows —
  * the same exchange a plain equi-join would pay — and no range-explosion,
  * so it holds at 100 TB. Right rows sort before left rows at equal
  * timestamps, giving the standard inclusive (≥) semantics; ties among
  * right rows resolve to the latest by the extra `rightTieBreak` ordering.
  */
object AsOfJoin {

  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      rightTieBreak: Seq[String] = Nil): DataFrame = {

    val keyCols = keys.map(col)
    val payload = struct((rightPayload ++ rightTieBreak).distinct.map(col): _*)

    val taggedLeft = left.select(
      keyCols ++ Seq(
        col(leftTime).as("__t"),
        lit(1).as("__side"),
        struct(left.columns.toIndexedSeq.map(col): _*).as("__l"),
        lit(null).cast(
          right.select(payload).schema.fields.head.dataType).as("__r")): _*)
    val taggedRight = right.select(
      keyCols ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__side"), // right first at equal time → inclusive match
        lit(null).cast(
          left.select(struct(left.columns.toIndexedSeq.map(col): _*)).schema.fields.head.dataType)
          .as("__l"),
        payload.as("__r")): _*)

    val ordering: Seq[Column] =
      Seq(col("__t").asc, col("__side").asc) ++
        rightTieBreak.map(c => col("__r").getField(c).asc_nulls_first)
    val w = Window.partitionBy(keyCols: _*).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedLeft.unionByName(taggedRight)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        left.columns.toIndexedSeq.map(c => col("__l").getField(c).as(c)) ++
          rightPayload.map(c => col("__match").getField(c).as(s"asof_$c")): _*)
  }
}
