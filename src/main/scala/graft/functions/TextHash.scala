package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** JVM-static hash kernels shared by the interpreted and codegen paths of
  * the custom expressions below. Self-contained FNV-1a (public-domain
  * constants) so results are reproducible across engines and rounds. */
object TextHash {

  /** FNV-1a 64-bit over raw bytes. */
  def fnv1a64(bytes: Array[Byte]): Long = fnv1a64From(bytes, 0xcbf29ce484222325L)

  /** Domain-separated second FNV-1a stream: initial state = one FNV step
    * absorbing byte 0x01 (≡ hashing the input with a 0x01 prefix). Paired
    * with [[fnv1a64]] it forms a 128-bit fingerprint: at trillion-doc
    * scale a single 64-bit key expects ~n²/2⁶⁵ birthday collisions
    * (thousands of silently merged groups); the pair pushes the aggregate
    * expectation back below 10⁻¹⁸. */
  val Fnv1a64AltBasis: Long = (0xcbf29ce484222325L ^ 0x01L) * 0x100000001b3L

  def fnv1a64Alt(bytes: Array[Byte]): Long = fnv1a64From(bytes, Fnv1a64AltBasis)

  private def fnv1a64From(bytes: Array[Byte], basis: Long): Long = {
    var h = basis
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  import java.util.concurrent.ConcurrentHashMap
  private val coeffCache = new ConcurrentHashMap[(Int, Long), (Array[Long], Array[Long])]()

  /** Mersenne prime 2^31−1: universal-hash modulus. a·h ≤ (2^31)^2 < 2^63,
    * so the arithmetic is exact in a signed long (no overflow under ANSI). */
  val MinhashPrime: Long = (1L << 31) - 1

  /** Deterministic universal-hash coefficients for [[minhashSig]]:
    * a_i ∈ [1, p), b_i ∈ [0, p). The mod-p step below is essential — an
    * un-modded a·h+b is monotone in h, which makes every signature slot pick
    * the same min shingle and collapses all LSH bands to one. */
  def minhashCoeffs(numHashes: Int, seed: Long): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent((numHashes, seed), { _ =>
      val rnd = new scala.util.Random(seed)
      val p = MinhashPrime.toInt
      val a = Array.fill(numHashes)((rnd.nextInt(p - 1) + 1).toLong)
      val b = Array.fill(numHashes)(rnd.nextInt(p).toLong)
      (a, b)
    })

  /** MinHash signature in one pass: base FNV-1a hash per shingle, then
    * min over shingles of (a_i·h + b_i) mod p for each i. A single JVM loop
    * instead of `numHashes` interpreted higher-order transforms — the
    * difference between O(ms) and O(minutes) per million rows. */
  def minhashSig(shingles: org.apache.spark.sql.catalyst.util.ArrayData,
      numHashes: Int, seed: Long): org.apache.spark.sql.catalyst.util.ArrayData = {
    val (a, b) = minhashCoeffs(numHashes, seed)
    minhashSigWith(shingles, a, b)
  }

  /** [[minhashSig]] over PRE-RESOLVED coefficient arrays — the expression
    * resolves them once per plan (lazy val / codegen reference object), so
    * the hottest dedup kernel pays zero per-row cache lookups and boxed
    * tuple-key allocations. */
  def minhashSigWith(shingles: org.apache.spark.sql.catalyst.util.ArrayData,
      a: Array[Long], b: Array[Long]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val numHashes = a.length
    val p = MinhashPrime
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < shingles.numElements()) {
      if (!shingles.isNullAt(i)) {
        val hm = (fnv1a64(shingles.getUTF8String(i).getBytes) & Long.MaxValue) % p
        var k = 0
        while (k < numHashes) {
          val v = (a(k) * hm + b(k)) % p
          if (v < sig(k)) sig(k) = v
          k += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  /** Word k-shingles of a single-space-tokenized string: k consecutive
    * tokens joined by ' '; texts shorter than k tokens yield one shingle of
    * all tokens. Exact kernel twin of the former higher-order-function
    * formulation (transform+slice+array_join), which Catalyst interprets —
    * per-shingle array copies made shingling the dominant cost of the
    * MinHash pipeline. */
  def wordShingles(text: org.apache.spark.unsafe.types.UTF8String, k: Int): ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val toks = text.toString.split(" ", -1)
    if (toks.length < k) {
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](UTF8String.fromString(toks.mkString(" "))))
    } else {
      val n = toks.length - k + 1
      val out = new Array[Any](n)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < n) {
        sb.setLength(0)
        var j = 0
        while (j < k) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  /** Feature-hashed, L2-normalized tf vector ("hashing trick"): FNV-1a
    * bucket per token, count accumulation in float, one double pass for the
    * norm, float32 rounding on the normalized output. Single JVM pass —
    * kernel for the [[graft.functions.HashedTfVector]] codegen expression. */
  def hashedTfVector(tokens: ArrayData, dim: Int): ArrayData = {
    val v = new Array[Float](dim)
    var i = 0
    while (i < tokens.numElements()) {
      if (!tokens.isNullAt(i)) {
        val b = ((fnv1a64(tokens.getUTF8String(i).getBytes) % dim).toInt + dim) % dim
        v(b) += 1f
      }
      i += 1
    }
    var norm = 0.0
    var j = 0
    while (j < dim) { norm += v(j).toDouble * v(j).toDouble; j += 1 }
    val s = math.sqrt(norm)
    if (s > 0) { j = 0; while (j < dim) { v(j) = (v(j) / s).toFloat; j += 1 } }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(v)
  }

  /** 64-bit SimHash over a token array: per-token FNV-1a votes each bit
    * up/down; the sign of each bit's tally forms the signature. Documents
    * with small Hamming distance between signatures are near-duplicates. */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    while (i < tokens.numElements()) {
      if (!tokens.isNullAt(i)) {
        val h = fnv1a64(tokens.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Unicode NFC (canonical composition) with an ASCII fast path: pure
    * ASCII bytes are already in NFC, so the Normalizer (and the
    * UTF8String→String→UTF8String round trip) only runs when a byte ≥
    * 0x80 is present. Called from the [[NfcNormalize]] codegen. */
  def nfc(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) {
        val str = s.toString
        val norm = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
        return if (norm == str) s
          else org.apache.spark.unsafe.types.UTF8String.fromString(norm)
      }
      i += 1
    }
    s
  }
}
