package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

/** Kernel-level invariants for the member-wise first-collision pair
  * expansion kernels — the candidate-generation layer every dedup operator
  * rests on. Each test replays the operator's full explode structure
  * (per band/chunk/table buckets, per-member rows) in plain Scala and
  * checks the union of all emissions against a brute-force reference. */
class PairOpsSpec extends AnyFunSuite {

  /** Run a keyed kernel the way the operators do: group by each band's
    * key, and for every bucket of ≥2 members call the kernel once per
    * member index. */
  private def runKeyed(
      docs: Seq[(Long, Array[Long])], bands: Int): Seq[(Long, Long)] =
    (0 until bands).flatMap { b =>
      docs.groupBy(_._2(b)).values.filter(_.size >= 2).flatMap { members =>
        val ms = new GenericArrayData(members.map { case (id, keys) =>
          new GenericInternalRow(Array[Any](id, new GenericArrayData(keys))): Any
        }.toArray)
        (0 until members.size - 1).flatMap { i =>
          val out = PairOps.keyedMemberPairs(ms, i, b)
          (0 until out.numElements()).map { k =>
            val r = out.getStruct(k, 2); (r.getLong(0), r.getLong(1))
          }
        }
      }
    }

  test("keyedMemberPairs: union over bands ≡ brute-force colliding pairs, each EXACTLY once") {
    val rnd = new scala.util.Random(7)
    val bands = 5
    for (_ <- 1 to 20) {
      val n = rnd.nextInt(25) + 4
      // keys from a tiny space so multi-band collisions are common
      val docs = (0 until n).map(i => (i.toLong, Array.fill(bands)(rnd.nextInt(3).toLong)))
      val want = (for {
        i <- docs.indices; j <- (i + 1) until n
        if (0 until bands).exists(b => docs(i)._2(b) == docs(j)._2(b))
      } yield (docs(i)._1, docs(j)._1)).toSeq
      val emitted = runKeyed(docs, bands)
      assert(emitted.size == emitted.distinct.size,
        s"duplicate pairs emitted: ${emitted.diff(emitted.distinct)}")
      assert(emitted.sorted == want.sorted)
    }
  }

  test("keyedMemberPairs emits only member i's pairs (j > i)") {
    val docs = (0L to 4L).map(id => (id, Array(1L))) // all in one bucket
    val ms = new GenericArrayData(docs.map { case (id, keys) =>
      new GenericInternalRow(Array[Any](id, new GenericArrayData(keys))): Any
    }.toArray)
    val out = PairOps.keyedMemberPairs(ms, 2, 0)
    val pairs = (0 until out.numElements()).map { k =>
      val r = out.getStruct(k, 2); (r.getLong(0), r.getLong(1))
    }
    assert(pairs == Seq((2L, 3L), (2L, 4L)))
  }

  test("sigMemberPairs: hamming filtered in-kernel; first-chunk union is duplicate-free") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 20) {
      val n = rnd.nextInt(20) + 4
      // signatures from a small pool so chunk collisions and near-dups occur
      val pool = Array.fill(6)(rnd.nextLong())
      val docs = (0 until n).map { i =>
        val base = pool(rnd.nextInt(pool.length))
        // flip up to 2 random bits → hamming 0-4 between related sigs
        val sig = base ^ (if (rnd.nextBoolean()) 1L << rnd.nextInt(64) else 0L) ^
          (if (rnd.nextBoolean()) 1L << rnd.nextInt(64) else 0L)
        (i.toLong, sig)
      }
      val maxH = 3
      def chunkKey(sig: Long, c: Int): Long = (sig >>> (16 * c)) & 0xffffL
      val want = (for {
        i <- docs.indices; j <- (i + 1) until n
        if (0 until 4).exists(c => chunkKey(docs(i)._2, c) == chunkKey(docs(j)._2, c))
        h = java.lang.Long.bitCount(docs(i)._2 ^ docs(j)._2)
        if h <= maxH
      } yield (docs(i)._1, docs(j)._1, h)).toSeq

      val emitted = (0 until 4).flatMap { c =>
        docs.groupBy(d => chunkKey(d._2, c)).values.filter(_.size >= 2).flatMap { members =>
          val ms = new GenericArrayData(members.map { case (id, sig) =>
            new GenericInternalRow(Array[Any](id, sig)): Any
          }.toArray)
          (0 until members.size - 1).flatMap { i =>
            val out = PairOps.sigMemberPairs(ms, i, c, maxH)
            (0 until out.numElements()).map { k =>
              val r = out.getStruct(k, 3); (r.getLong(0), r.getLong(1), r.getInt(2))
            }
          }
        }
      }
      assert(emitted.size == emitted.distinct.size,
        s"duplicate pairs emitted: ${emitted.diff(emitted.distinct)}")
      assert(emitted.sorted == want.sorted)
    }
  }

  test("sizedMemberPairs: union over bands ≡ size-compatible colliding pairs, each EXACTLY once") {
    val rnd = new scala.util.Random(13)
    val bands = 6
    for (_ <- 1 to 10) {
      val n = rnd.nextInt(20) + 4
      val docs = (0 until n).map { i =>
        (i.toLong, rnd.nextInt(40) + 10, Array.fill(bands)(rnd.nextInt(3).toLong))
      }
      val t = 0.8
      val want = (for {
        i <- docs.indices; j <- (i + 1) until n
        (ida, sza, bha) = docs(i); (idb, szb, bhb) = docs(j)
        if (0 until bands).exists(b => bha(b) == bhb(b))
        if math.min(sza, szb) >= t * math.max(sza, szb) - 1e-9
      } yield (math.min(ida, idb), math.max(ida, idb))).toSeq

      val emitted = (0 until bands).flatMap { b =>
        docs.groupBy(_._3(b)).values.filter(_.size >= 2).flatMap { members =>
          val ms = new GenericArrayData(members.map { case (id, sz, bh) =>
            new GenericInternalRow(Array[Any](id, sz, new GenericArrayData(bh))): Any
          }.toArray)
          (0 until members.size - 1).flatMap { i =>
            val out = PairOps.sizedMemberPairs(ms, i, b, t)
            (0 until out.numElements()).map { k =>
              val r = out.getStruct(k, 2); (r.getLong(0), r.getLong(1))
            }
          }
        }
      }
      assert(emitted.size == emitted.distinct.size,
        s"duplicate pairs emitted: ${emitted.diff(emitted.distinct)}")
      assert(emitted.sorted == want.sorted)
    }
  }
}
