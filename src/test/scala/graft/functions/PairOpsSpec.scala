package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

/** Kernel-level invariants for the bucket pair-expansion kernels — the
  * candidate-generation layer every dedup operator rests on. */
class PairOpsSpec extends AnyFunSuite {

  test("expandIdPairs ≡ brute-force unordered pairs") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val ids = Seq.fill(rnd.nextInt(30) + 2)(rnd.nextLong())
      val got = PairOps.expandIdPairs(new GenericArrayData(ids.toArray))
      val gotPairs = (0 until got.numElements())
        .map(i => (got.getStruct(i, 2).getLong(0), got.getStruct(i, 2).getLong(1)))
      val want = for {
        i <- ids.indices; j <- (i + 1) until ids.size
      } yield (math.min(ids(i), ids(j)), math.max(ids(i), ids(j)))
      assert(gotPairs.sorted == want.sorted)
    }
  }

  test("expandSigPairs filters by hamming inside the kernel") {
    val ms = new GenericArrayData(Array[Any](
      new GenericInternalRow(Array[Any](1L, 0x0FL)),  // 4 bits
      new GenericInternalRow(Array[Any](2L, 0x0EL)),  // hamming 1 vs 1
      new GenericInternalRow(Array[Any](3L, 0xFFL)))) // hamming 4 vs 1
    val got = PairOps.expandSigPairs(ms, maxHamming = 2)
    val pairs = (0 until got.numElements()).map { i =>
      val r = got.getStruct(i, 3); (r.getLong(0), r.getLong(1), r.getInt(2))
    }
    assert(pairs == Seq((1L, 2L, 1)))
  }

  test("expandSizedPairsFirstBand: union over bands emits each qualifying pair EXACTLY once") {
    val rnd = new scala.util.Random(13)
    val bands = 6
    for (_ <- 1 to 10) {
      val n = rnd.nextInt(20) + 4
      // docs: id, size, and per-band hashes drawn from a tiny space so
      // collisions (incl. multi-band collisions) are common
      val docs = (0 until n).map { i =>
        (i.toLong, rnd.nextInt(40) + 10, Array.fill(bands)(rnd.nextInt(3).toLong))
      }
      val t = 0.8
      // reference: all pairs sharing ≥1 band hash AND size-compatible
      val want = (for {
        i <- docs.indices; j <- (i + 1) until n
        (ida, sza, bha) = docs(i); (idb, szb, bhb) = docs(j)
        if (0 until bands).exists(b => bha(b) == bhb(b))
        if math.min(sza, szb) >= t * math.max(sza, szb) - 1e-9
      } yield (math.min(ida, idb), math.max(ida, idb))).toSeq

      // kernel: run per (band, bucket) exactly as the operator does
      val emitted = (0 until bands).flatMap { b =>
        docs.groupBy(_._3(b)).values.filter(_.size >= 2).flatMap { members =>
          val ms = new GenericArrayData(members.map { case (id, sz, bh) =>
            new GenericInternalRow(Array[Any](id, sz, new GenericArrayData(bh))): Any
          }.toArray)
          val out = PairOps.expandSizedPairsFirstBand(ms, b, t)
          (0 until out.numElements()).map { k =>
            val r = out.getStruct(k, 2); (r.getLong(0), r.getLong(1))
          }
        }
      }
      assert(emitted.size == emitted.distinct.size,
        s"duplicate pairs emitted: ${emitted.diff(emitted.distinct)}")
      assert(emitted.sorted == want.sorted)
    }
  }
}
