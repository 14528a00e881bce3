package graft.functions

/** Bloom-filter bit math over a plain byte array (Bloom, CACM 1970).
  *
  * The k probe positions are derived from ONE 64-bit fingerprint by double
  * hashing, position_i = h1 + i·h2 (Kirsch & Mitzenmacher, ESA 2006: two
  * streams give the asymptotic false-positive rate of k independent
  * hashes). h1 is the fingerprint itself (already an FNV-1a stream,
  * [[TextHash.fnv1a64]]); h2 is a splitmix64-style remix forced odd so it
  * generates the full power-of-two ring. Everything here is static
  * primitive math — the codegen target for
  * [[BloomMightContain]] — and deterministic across JVMs/partitionings,
  * so a bloom built anywhere equals a bloom built anywhere else byte for
  * byte (asserted in BloomSpec).
  */
object BloomOps {

  /** splitmix64 finalizer (Steele et al., OOPSLA 2014 — public domain
    * reference constants) — decorrelates the second probe stream from h1. */
  def remix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Set the k probe bits of `fp` in `bloom` (length must be a power of
    * two; mutates in place — the aggregation-buffer hot path). */
  def set(bloom: Array[Byte], fp: Long, k: Int): Unit = {
    val mask = (bloom.length.toLong << 3) - 1L
    val h2 = remix(fp) | 1L
    var i = 0
    while (i < k) {
      val pos = ((fp + i.toLong * h2) & mask).toInt
      bloom(pos >>> 3) = (bloom(pos >>> 3) | (1 << (pos & 7))).toByte
      i += 1
    }
  }

  /** True iff every probe bit of `fp` is set — no false negatives by
    * construction; false positives at the standard (1 − e^(−kn/m))^k
    * rate. */
  def mightContain(bloom: Array[Byte], fp: Long, k: Int): Boolean = {
    val mask = (bloom.length.toLong << 3) - 1L
    val h2 = remix(fp) | 1L
    var i = 0
    while (i < k) {
      val pos = ((fp + i.toLong * h2) & mask).toInt
      if ((bloom(pos >>> 3) & (1 << (pos & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** a |= b, element-wise (the aggregation merge). */
  def orInto(a: Array[Byte], b: Array[Byte]): Unit = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
  }
}
