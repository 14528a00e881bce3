package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface (SURVEY §2.2: absent in the reference, exposed here as
  * an extension) — `Aggregator[IN, BUF, OUT]` keeps the whole aggregation in
  * Tungsten rows with map-side partial merge, the scale-correct UDAF shape.
  */
object Aggregators {

  /** Quantity-weighted average of an exact-2-decimal money column, carried
    * as integer cents so the result is bit-reproducible against a decimal
    * oracle regardless of partial-aggregation order. Inputs: (money, weight)
    * where weight is integral. */
  val weightedAvg: Aggregator[(Double, Double), (Long, Long), Double] =
    new Aggregator[(Double, Double), (Long, Long), Double] {
      override def zero: (Long, Long) = (0L, 0L)
      override def reduce(b: (Long, Long), in: (Double, Double)): (Long, Long) = {
        val cents = math.round(in._1 * 100) // exact: inputs are 2-decimal
        val w = math.round(in._2)
        (b._1 + cents * w, b._2 + w)
      }
      override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
        (a._1 + b._1, a._2 + b._2)
      override def finish(r: (Long, Long)): Double =
        if (r._2 == 0) 0.0 else (r._1 / 100.0) / r._2
      override def bufferEncoder: Encoder[(Long, Long)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Column form: weighted_avg(money, weight). */
  def weightedAvgCol(money: Column, weight: Column): Column =
    udaf(weightedAvg).apply(money, weight)

  /** Bloom bitset over a 64-bit fingerprint column ([[BloomOps]]): each
    * partition ORs its fingerprints' probe bits into a local m-bit buffer,
    * partials merge by byte-wise OR — ONE aggregation job, no shuffle of
    * positions, and the result is byte-identical on any partitioning
    * (OR is commutative; probe positions depend only on the fingerprint).
    * `numBits` must be a power of two (the probe mask is numBits−1). */
  def bloomBuild(numBits: Int, k: Int): Aggregator[Long, Array[Byte], Array[Byte]] = {
    require(numBits >= 8 && (numBits & (numBits - 1)) == 0,
      s"numBits must be a power of two >= 8, got $numBits")
    new Aggregator[Long, Array[Byte], Array[Byte]] {
      override def zero: Array[Byte] = new Array[Byte](numBits >>> 3)
      override def reduce(b: Array[Byte], fp: Long): Array[Byte] = {
        BloomOps.set(b, fp, k); b
      }
      override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
        BloomOps.orInto(a, b); a
      }
      override def finish(r: Array[Byte]): Array[Byte] = r
      override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }
  }

  /** Column form: bloom_build(fp) → binary bitset. */
  def bloomBuildCol(fp: Column, numBits: Int, k: Int): Column =
    udaf(bloomBuild(numBits, k)).apply(fp)
}
