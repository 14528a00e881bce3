package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bit-exact numeric conventions shared by every query that must hash-match
  * the DuckDB oracle.
  *
  * Monetary columns in the fixtures are exact 2-decimal values stored as
  * doubles. Summing doubles is order-dependent (Spark's partial aggregation
  * order differs from DuckDB's), so any SUM over money is computed in exact
  * decimal arithmetic and only cast back to double at the very end — both
  * engines then round the identical exact value to the identical double.
  */
object Exact {
  /** money column (<= ~1e8, 2 decimals) as exact decimal */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** rate column (discount/tax, 2 decimals, < 10) as exact decimal */
  def rate(c: Column): Column = c.cast(DecimalType(3, 2))

  /** exact decimal sum of a money column, returned as double */
  def sumMoney(c: Column): Column = sum(dec2(c)).cast("double")

  /** exact mean of a money column: exact decimal sum / count, as double */
  def avgMoney(c: Column): Column =
    sum(dec2(c)).cast("double") / count(lit(1))

  /** DuckDB-side equivalents, for composing oracle SQL strings. */
  def sqlDec2(e: String): String = s"CAST($e AS DECIMAL(12,2))"
  def sqlRate(e: String): String = s"CAST($e AS DECIMAL(3,2))"
  def sqlSumMoney(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(12,2))) AS DOUBLE)"
  def sqlAvgMoney(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)"
}
