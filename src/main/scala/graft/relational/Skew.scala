package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose hot keys would overload single reducers
  * at scale (SURVEY §7.1 step 5 / the 100 TB design notes). AQE's skew-join
  * handles sort-merge cases adaptively; explicit salting remains the tool
  * when the right side must be replicated (e.g. a medium dimension too big
  * to broadcast but joined on a power-law key).
  */
object Skew {

  /** Salted equi-join: the left (large, skewed) side gets a deterministic
    * salt in [0, saltFactor) hashed from its whole row context, the right
    * side is replicated once per salt value, and the join key becomes
    * (keys..., salt) — hot keys spread over `saltFactor` reducers.
    * Semantically identical to `left.join(right, keys, "inner")` for
    * duplicate-free right keys. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0)
    // salt must NOT depend only on the join key (that would keep hot keys
    // together) — spread rows of the same key via a per-row uniform hash
    val allLeftCols = left.columns.map(col).toSeq
    val salted = left.withColumn("__salt",
      pmod(xxhash64(allLeftCols: _*), lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
