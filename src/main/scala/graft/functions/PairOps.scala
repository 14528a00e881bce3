package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** JVM-static bucket pair-expansion kernels for the LSH dedup family —
  * called from both interpreted and whole-stage-codegen paths of the
  * expressions in expressions.scala.
  *
  * All kernels are MEMBER-WISE: they emit only member `i`'s pairs against
  * members j > i, so the caller explodes a bucket into one row per member
  * and no single row ever holds the bucket's whole O(m²) pair set — the
  * largest allocation is O(m). Both the member explode and the pair explode
  * are narrow Generate operators fused into one whole-stage-codegen span,
  * so the member array is read in place, not re-materialized per row.
  *
  * All kernels are also FIRST-COLLISION: a pair is emitted only in the
  * first band/table/chunk in which the two members collide, so the union
  * over bands is duplicate-free BY CONSTRUCTION — a near-dup clique
  * colliding in all b bands emits each pair once instead of b times, and
  * no pair-keyed dropDuplicates shuffle is needed downstream. */
object PairOps {

  /** Pairs (id_a ≤ id_b) of member `i` vs members j > i of a
    * (id, keys) bucket, where `keys` is the per-band/table bucket-key
    * array; emitted only when `band` is the FIRST index at which the two
    * members' keys agree (∀ b' < band: keys differ). Serves both the
    * MinHash banding path (keys = band-slice hashes) and the hyperplane
    * LSH path (keys = per-table sign buckets). */
  def keyedMemberPairs(ms: ArrayData, i: Int, band: Int): ArrayData = {
    val m = ms.numElements()
    val out = new java.util.ArrayList[InternalRow](math.max(m - 1 - i, 0))
    val ri = ms.getStruct(i, 2)
    val ida = ri.getLong(0)
    val ka = ri.getArray(1)
    var j = i + 1
    while (j < m) {
      val rj = ms.getStruct(j, 2)
      val kb = rj.getArray(1)
      var first = true
      var b = 0
      while (first && b < band) {
        if (ka.getLong(b) == kb.getLong(b)) first = false
        b += 1
      }
      if (first) {
        val idb = rj.getLong(0)
        out.add(new GenericInternalRow(
          Array[Any](math.min(ida, idb), math.max(ida, idb))))
      }
      j += 1
    }
    new GenericArrayData(out.toArray(new Array[InternalRow](out.size)))
  }

  /** Pairs (id_a ≤ id_b, hamming) of member `i` vs members j > i of a
    * (id, sig) SimHash bucket: emitted only when hamming ≤ maxHamming AND
    * `chunk` is the FIRST 16-bit chunk on which the signatures agree
    * (chunk keys are derived from the signatures in place — the banding
    * needs no extra payload). Filtering hamming inside the kernel keeps
    * far pairs out of every downstream operator. */
  def sigMemberPairs(ms: ArrayData, i: Int, chunk: Int, maxHamming: Int): ArrayData = {
    val m = ms.numElements()
    val out = new java.util.ArrayList[InternalRow]()
    val ri = ms.getStruct(i, 2)
    val ida = ri.getLong(0); val siga = ri.getLong(1)
    var j = i + 1
    while (j < m) {
      val rj = ms.getStruct(j, 2)
      val sigb = rj.getLong(1)
      val h = java.lang.Long.bitCount(siga ^ sigb)
      if (h <= maxHamming) {
        var first = true
        var c = 0
        while (first && c < chunk) {
          if (((siga >>> (16 * c)) & 0xffffL) == ((sigb >>> (16 * c)) & 0xffffL))
            first = false
          c += 1
        }
        if (first) {
          val idb = rj.getLong(0)
          out.add(new GenericInternalRow(
            Array[Any](math.min(ida, idb), math.max(ida, idb), h)))
        }
      }
      j += 1
    }
    new GenericArrayData(out.toArray(new Array[InternalRow](out.size)))
  }

  /** Pairs (id_a ≤ id_b) of member `i` vs members j > i of a
    * (id, sz, keys) bucket — [[keyedMemberPairs]] plus the jaccard
    * size-compatibility law (j ≥ t ⇒ min|A|,|B| ≥ t·max|A|,|B|), which
    * prunes pairs before they exist anywhere else. The exact-jaccard
    * tier's candidate kernel. */
  def sizedMemberPairs(ms: ArrayData, i: Int, band: Int, threshold: Double): ArrayData = {
    val m = ms.numElements()
    val out = new java.util.ArrayList[InternalRow]()
    val ri = ms.getStruct(i, 3)
    val ida = ri.getLong(0); val sza = ri.getInt(1)
    val ka = ri.getArray(2)
    var j = i + 1
    while (j < m) {
      val rj = ms.getStruct(j, 3)
      val szb = rj.getInt(1)
      val mn = math.min(sza, szb).toDouble
      val mx = math.max(sza, szb).toDouble
      if (mn >= threshold * mx - 1e-9) {
        val kb = rj.getArray(2)
        var first = true
        var b = 0
        while (first && b < band) {
          if (ka.getLong(b) == kb.getLong(b)) first = false
          b += 1
        }
        if (first) {
          val idb = rj.getLong(0)
          out.add(new GenericInternalRow(
            Array[Any](math.min(ida, idb), math.max(ida, idb))))
        }
      }
      j += 1
    }
    new GenericArrayData(out.toArray(new Array[InternalRow](out.size)))
  }
}
