package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** JVM-static bucket pair-expansion kernels for the LSH dedup family —
  * called from both interpreted and whole-stage-codegen paths of the
  * expressions in expressions.scala.
  *
  * The higher-order-function formulation (nested transform/slice/filter)
  * is interpreted by Catalyst and does an array copy per element: a bucket
  * with m members costs O(m²) boxed slices. These kernels do the same
  * expansion in one tight loop — the difference is minutes vs seconds when
  * near-duplicate cliques make buckets large. */
object PairOps {

  /** All unordered id pairs of a long-array bucket as (id_a ≤ id_b). */
  def expandIdPairs(ids: ArrayData): ArrayData = {
    val m = ids.numElements()
    // capacity hint clamped: m*(m-1)/2 overflows Int past ~65k members
    val cap = math.min(m.toLong * (m - 1) / 2, 1 << 20).toInt
    val out = new java.util.ArrayList[InternalRow](math.max(cap, 0))
    var i = 0
    while (i < m) {
      val a = ids.getLong(i)
      var j = i + 1
      while (j < m) {
        val b = ids.getLong(j)
        out.add(new GenericInternalRow(
          Array[Any](math.min(a, b), math.max(a, b))))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[InternalRow](out.size)))
  }

  /** Unordered pairs of a (doc_id, sig) bucket with Hamming distance
    * ≤ maxHamming, as (id_a, id_b, hamming). Filtering inside the kernel
    * keeps far pairs out of the downstream dedup shuffle. */
  def expandSigPairs(ms: ArrayData, maxHamming: Int): ArrayData = {
    val m = ms.numElements()
    val out = new java.util.ArrayList[InternalRow]()
    var i = 0
    while (i < m) {
      val ri = ms.getStruct(i, 2)
      val ida = ri.getLong(0); val siga = ri.getLong(1)
      var j = i + 1
      while (j < m) {
        val rj = ms.getStruct(j, 2)
        val idb = rj.getLong(0); val sigb = rj.getLong(1)
        val h = java.lang.Long.bitCount(siga ^ sigb)
        if (h <= maxHamming) {
          out.add(new GenericInternalRow(
            Array[Any](math.min(ida, idb), math.max(ida, idb), h)))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[InternalRow](out.size)))
  }

  /** Unordered pairs of a (doc_id, sz, bandHashes) bucket, emitted only when
    *  (a) sizes are jaccard-compatible: min ≥ t·max − ε, and
    *  (b) `band` is the FIRST band in which the two docs collide
    *      (∀ b' < band: bandHashes differ).
    * (b) makes the union over bands duplicate-free BY CONSTRUCTION: a
    * near-dup clique colliding in all b bands emits each pair once instead
    * of b times, and the downstream dropDuplicates shuffle disappears. */
  def expandSizedPairsFirstBand(
      ms: ArrayData, band: Int, threshold: Double): ArrayData = {
    val m = ms.numElements()
    val out = new java.util.ArrayList[InternalRow]()
    var i = 0
    while (i < m) {
      val ri = ms.getStruct(i, 3)
      val ida = ri.getLong(0); val sza = ri.getInt(1)
      val bha = ri.getArray(2)
      var j = i + 1
      while (j < m) {
        val rj = ms.getStruct(j, 3)
        val idb = rj.getLong(0); val szb = rj.getInt(1)
        val mn = math.min(sza, szb).toDouble
        val mx = math.max(sza, szb).toDouble
        if (mn >= threshold * mx - 1e-9) {
          val bhb = rj.getArray(2)
          var first = true
          var b = 0
          while (first && b < band) {
            if (bha.getLong(b) == bhb.getLong(b)) first = false
            b += 1
          }
          if (first) {
            out.add(new GenericInternalRow(
              Array[Any](math.min(ida, idb), math.max(ida, idb))))
          }
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[InternalRow](out.size)))
  }
}
