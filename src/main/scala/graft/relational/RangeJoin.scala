package graft.relational

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: pairs of rows with equal keys whose event times
  * lie within `toleranceSec` of each other — the remaining join variant
  * from SURVEY §2.2's "semi/anti/range/as-of" row.
  *
  * A naive `a.join(b, |ta−tb| ≤ tol)` is a per-key nested loop. Here both
  * sides are bucketed into tolerance-width time cells; the left side probes
  * its own and both adjacent cells (any within-tolerance pair must share or
  * neighbor a cell), so the plan is a plain equi-join on (keys, bucket)
  * followed by the exact microsecond filter. Cost is O(matches + 3·|L|)
  * rows through one shuffle — the shape that survives 100 TB event tables.
  */
object RangeJoin {

  /** All (left, right) pairs with equal `keys` and |leftTime − rightTime| ≤
    * toleranceSec. Output: left columns + right payload columns renamed
    * `range_<name>`. */
  def withinTolerance(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      toleranceSec: Long,
      rightPayload: Seq[String]): DataFrame = {
    require(toleranceSec > 0)
    val tolUs = toleranceSec * 1000000L
    val keyCols = keys.map(col)

    val l = left
      .withColumn("__lus", unix_micros(col(leftTime)))
      .withColumn("__off", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__bucket", col("__off") + floor(col("__lus") / tolUs))
      .drop("__off")
    val r = right.select(
      keyCols ++
        Seq(unix_micros(col(rightTime)).as("__rus"),
          floor(unix_micros(col(rightTime)) / tolUs).as("__bucket")) ++
        rightPayload.map(c => col(c).as(s"range_$c")): _*)

    l.join(r, keys :+ "__bucket")
      .filter(abs(col("__lus") - col("__rus")) <= tolUs)
      .drop("__lus", "__rus", "__bucket")
  }
}
