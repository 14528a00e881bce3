package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimension file skipping
  * (Morton 1966; Bayer's UB-tree, 1997 — the interleaved-key clustering
  * every lakehouse layout optimizer ships).
  *
  * A single-column sort localizes ONE dimension per file: filters on any
  * other column still touch every file. Interleaving the bits of k
  * rank-quantized dimensions into one sort key makes each written file
  * cover a small hypercube of the key space, so parquet row-group min/max
  * stats prune scans filtered on ANY prefix-free subset of the dimensions
  * — the layout-level complement to predicate pushdown.
  *
  * 100 TB shape: the write is `repartitionByRange` on the z-value (one
  * range-exchange over sampled bounds — Spark's own range partitioner,
  * no driver materialization) + an in-partition sort; both scale linearly
  * and the quantization ranges come from ONE tiny agg job. The z-value
  * itself is a static expression tree (`bits` terms of shift/mask per
  * dimension), entirely inside whole-stage codegen — no UDF, engine-
  * portable integer math (floor-div quantization, exactly replicated by
  * the DuckDB oracle in the `d_zorder_layout` gate).
  */
object Layout {

  /** Rank-quantize an integral column to `[0, 2^bits)` with pure integer
    * math: `((v − min) · (2^bits − 1)) div (max − min)` — identical in any
    * engine with 64-bit integer floor division (operands are
    * non-negative). Callers must keep `(max − min) · (2^bits − 1)` inside
    * Long range (enforced in [[zValue]]); for wider domains pre-shift the
    * column. */
  private def quantize(name: String, mn: Long, mx: Long, bits: Int): Column =
    if (mx == mn) lit(0L)
    else expr(s"((`$name` - ${mn}L) * ${(1L << bits) - 1}L) div ${mx - mn}L")

  /** The interleaved z-value of `dims` (dimension d's bit i lands at key
    * bit `i·D + d`): one Long column, `D·bits ≤ 63`. `ranges` are the
    * (min, max) quantization bounds per dimension — computed once by
    * [[dimRanges]] and shared with any reader that wants to recompute the
    * key. */
  def zValue(dims: Seq[String], ranges: Seq[(Long, Long)], bits: Int = 16): Column = {
    val d = dims.length
    require(bits >= 1 && d >= 1 && d * bits <= 63,
      s"need bits >= 1 and 1 <= dims*bits <= 63, got $d x $bits")
    // a dims/ranges length mismatch (a stale or mis-ordered persisted
    // ranges artifact) must fail, not silently zip-truncate: the bit
    // spacing below still uses d = dims.length, so every key would be
    // wrong while looking plausible
    require(ranges.length == d,
      s"ranges must pair 1:1 with dims: ${ranges.length} ranges for $d dims")
    ranges.foreach { case (mn, mx) =>
      require(mx >= mn, s"invalid range ($mn, $mx)")
      // subtractExact: a signed domain wider than Long would otherwise
      // wrap the range negative in quantize's `mx - mn` SQL literal and
      // produce silent garbage keys — FAIL instead (Long.MaxValue as a
      // stand-in would itself slip past the bits=1 divisor check)
      val range =
        try Math.subtractExact(mx, mn)
        catch {
          case _: ArithmeticException => throw new IllegalArgumentException(
            s"dimension range [$mn, $mx] is wider than Long " +
              "- pre-shift the column to a narrower domain")
        }
      require(range <= Long.MaxValue / ((1L << bits) - 1),
        s"dimension range [$mn, $mx] overflows the quantizer at $bits bits " +
          "- pre-shift the column to a narrower domain") }
    val qs = dims.zip(ranges).map { case (n, (mn, mx)) => quantize(n, mn, mx, bits) }
    val terms = for {
      (q, dim) <- qs.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(q, i).bitwiseAND(lit(1L)), i * d + dim)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The (min, max) bounds of each dimension — ONE aggregation job, 2·D
    * values to the driver. */
  def dimRanges(df: DataFrame, dims: Seq[String]): Seq[(Long, Long)] = {
    val aggs = dims.flatMap(c =>
      Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    dims.indices.map { i =>
      require(!row.isNullAt(2 * i) && !row.isNullAt(2 * i + 1),
        s"cannot z-order on '${dims(i)}': no non-null values (empty input?)")
      (row.getLong(2 * i), row.getLong(2 * i + 1))
    }
  }

  /** Write `df` z-ordered on `dims` into `numFiles` range partitions of
    * the interleaved key, sorted within each — every output file covers a
    * compact z-interval, i.e. a small hypercube in dimension space.
    * Returns the quantization ranges (persist them next to the data if
    * readers will recompute keys). */
  def zorderWrite(
      df: DataFrame, dims: Seq[String], path: String,
      numFiles: Int, bits: Int = 16): Seq[(Long, Long)] = {
    val ranges = dimRanges(df, dims)
    val z = zValue(dims, ranges, bits)
    df.withColumn("__zval", z)
      .repartitionByRange(numFiles, col("__zval"))
      .sortWithinPartitions("__zval")
      .drop("__zval")
      .write.mode("overwrite").parquet(path)
    ranges
  }
}
