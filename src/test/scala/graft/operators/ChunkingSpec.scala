package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkTestBase {

  import spark.implicits._

  test("hand-checked windows: stride-2 over 7 tokens, max 4") {
    val df = Seq((1L, "t1 t2 t3 t4 t5 t6 t7")).toDF("doc_id", "text")
    val got = Chunking.slidingWindows(df, "doc_id", "text", maxTokens = 4, stride = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getString(3))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (0, 4L, "t1 t2 t3 t4"),
      (1, 4L, "t3 t4 t5 t6"),
      (2, 3L, "t5 t6 t7"),
      (3, 1L, "t7")))
  }

  test("short doc yields one whole-doc window; coverage loses no token") {
    val df = Seq((1L, "a b"), (2L, ("x " * 100).trim)).toDF("doc_id", "text")
    val rows = Chunking.slidingWindows(df, "doc_id", "text", maxTokens = 64, stride = 48)
      .collect()
    val short = rows.filter(_.getLong(0) == 1L)
    assert(short.length == 1 && short.head.getString(3) == "a b")
    // every token position of doc 2 is inside some window: with stride 48
    // and max 64, windows [0,64) and [48,100) cover 0..99
    val longChunks = rows.filter(_.getLong(0) == 2L)
    assert(longChunks.map(_.getLong(2)).sum >= 100,
      "windows must cover at least every token once")
  }

  test("reconstruction: stride == maxTokens chunks concatenate back to the document") {
    val texts = (0 until 50).map(i =>
      (i.toLong, (0 until (1 + i * 7 % 90)).map(j => s"w${(i + j) % 13}").mkString(" ")))
    val df = texts.toDF("doc_id", "text")
    val rebuilt = Chunking.slidingWindows(df, "doc_id", "text", maxTokens = 16, stride = 16)
      .groupBy(col("doc_id"))
      .agg(array_join(array_sort(collect_list(struct(col("chunk_id"), col("chunk"))))
        .getField("chunk"), " ").as("re"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, t) =>
      assert(rebuilt(id) == t, s"doc $id reconstruction mismatch")
    }
  }

  test("plan: zero exchanges — chunking is a pure per-row generator") {
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val plan = Chunking.slidingWindows(df, "doc_id", "text", 4, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
