package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BpeSpec extends SparkTestBase {

  import spark.implicits._

  test("hand-checked merges: frequency-weighted pair argmax with deterministic tie-break") {
    // corpus: "ab" ×3, "abc" ×2 → round 1 pairs: (a,b)=5, (b,c)=2 → merge (a,b)
    // round 2: ("ab","c")=2 → merge; round 3: no pairs left → early stop
    val docs = Seq((1L, "ab ab abc"), (2L, "ab abc")).toDF("doc_id", "text")
    val (table, vocab) = Bpe.trainMerges(spark, docs, "text", rounds = 5)
    val merges = table.orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(merges == Seq((1, "a", "b", 5L), (2, "ab", "c", 2L)),
      s"unexpected merges: $merges")
    val syms = vocab.orderBy("word").collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(syms("ab") == Seq("ab"))
    assert(syms("abc") == Seq("abc"))
    Bpe.freeVocab(vocab)
  }

  test("greedy left-to-right non-overlap: 'aaaa'→[aa,aa], 'aaa'→[aa,a]") {
    val df = Seq((1L, Seq("a", "a", "a", "a")), (2L, Seq("a", "a", "a"))).toDF("id", "syms")
    val got = df.select(col("id"), Bpe.mergeStep(col("syms"), "a", "a").as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("aa", "aa"), got)
    assert(got(2L) == Seq("aa", "a"), got)
  }

  test("tokenize reassembles every word exactly; broadcast join, no corpus re-fold") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    val (_, vocab) = Bpe.trainMerges(spark, docs, "text", rounds = 6)
    val toks = Bpe.tokenize(docs, "doc_id", "text", vocab)
    // every (doc, word) position's tokens concatenate back to the original word
    val rebuilt = toks.groupBy(col("doc_id"), col("word_pos"))
      .agg(sort_array(collect_list(struct(col("sym_pos"), col("token")))).as("ps"))
      .select(col("doc_id"), col("word_pos"),
        concat_ws("", transform(col("ps"), p => p.getField("token"))).as("w"))
    val orig = docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("word_pos", "word")))
      .filter(length(col("word")) > 0)
    val bad = orig.join(rebuilt, Seq("doc_id", "word_pos"), "left")
      .filter(col("w").isNull || col("w") =!= col("word")).count()
    assert(bad == 0L, s"$bad word positions fail to reassemble")
    // the vocab rides a broadcast join — the corpus is never shuffled by word
    val plan = toks.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    Bpe.freeVocab(vocab)
  }

  test("early stop when the vocabulary runs out of pairs") {
    val docs = Seq((1L, "x y z")).toDF("doc_id", "text")
    val (table, vocab) = Bpe.trainMerges(spark, docs, "text", rounds = 10)
    assert(table.count() == 0L, "single-char words have no pairs to merge")
    Bpe.freeVocab(vocab)
  }

  test("vocab artifact round-trips; loaded tokenization equals trained tokenization") {
    val docs = Seq((1L, "ab ab abc"), (2L, "ab abc cd")).toDF("doc_id", "text")
    val (_, vocab) = Bpe.trainMerges(spark, docs, "text", rounds = 3)
    val tmp = java.nio.file.Files.createTempDirectory("bpe_vocab_spec")
    try {
      Bpe.saveVocab(vocab, tmp.toString)
      val loaded = Bpe.loadVocab(spark, tmp.toString)
      // load ∘ save is the identity on the vocab table
      val a = vocab.orderBy("word").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2))).toSeq
      val b = loaded.orderBy("word").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2))).toSeq
      assert(a === b)
      // and the serve path tokenizes identically
      val t1 = Bpe.tokenize(docs, "doc_id", "text", vocab)
        .orderBy("doc_id", "word_pos", "sym_pos").collect().toSeq
      val t2 = Bpe.tokenize(docs, "doc_id", "text", loaded)
        .orderBy("doc_id", "word_pos", "sym_pos").collect().toSeq
      assert(t1 === t2)
    } finally {
      Bpe.freeVocab(vocab)
      graft.plans.CorpusExport.deleteRecursively(tmp.toFile)
    }
  }

  test("merges are partitioning-invariant (pure integer/string argmax)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(150)
    val (a, va) = Bpe.trainMerges(spark, docs, "text", rounds = 4)
    val (b, vb) = Bpe.trainMerges(spark, docs.repartition(13), "text", rounds = 4)
    assert(a.collect().toSeq == b.collect().toSeq)
    Bpe.freeVocab(va); Bpe.freeVocab(vb)
  }
}
