package graft.operators

import graft.core.Checkpoint.Ops
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** Byte-pair-encoding merge training over a document corpus — the
  * tokenizer-prep step after vocabulary sizing (`d_vocab_coverage` gives
  * the curve; this trains the merges). Standard BPE (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units" — public):
  * start from characters, repeatedly merge the most frequent adjacent
  * symbol pair, weighted by word frequency.
  *
  * 100 TB shape: the corpus is touched ONCE — the word-frequency table
  * (vocabulary-bounded, orders of magnitude smaller than the corpus) is
  * what iterates. Each round is one vocab-sized aggregation for the pair
  * argmax (a single row to the driver) plus one narrow projection applying
  * the merge as a greedy left-to-right fold INSIDE a higher-order
  * `aggregate` expression — no explode, no shuffle, no per-round corpus
  * pass. Rounds checkpoint through the session's
  * [[graft.core.Checkpoint]] strategy with eager block-freeing (the
  * [[Clusters.resolve]] loop discipline), so the plan and the block
  * manager stay O(1) in the round count — and `mode=reliable` makes the
  * rounds survive a lost executor.
  *
  * Determinism: every value is an integer count or an ASCII-ordered
  * string; ties in the argmax break by (count DESC, left ASC, right ASC),
  * which both the JVM and the DuckDB oracle compare bytewise — no floats
  * anywhere, so the gate is hash-exact by construction. */
object Bpe {

  /** Word-frequency vocabulary with each word as its character-symbol
    * sequence — the frame the merge rounds iterate on. */
  def initialVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("f"))
      .select(col("word"), col("f"), split(col("word"), "").as("syms"))

  /** One greedy left-to-right non-overlapping merge pass of the pair
    * (a, b) over a symbol array, as a single codegen-friendly higher-order
    * fold: acc = (output, skip-next). Never touches the driver. */
  def mergeStep(syms: Column, a: String, b: String): Column = {
    val n = size(syms)
    aggregate(
      sequence(lit(0), n - 1),
      struct(array().cast("array<string>").as("out"), lit(false).as("skip")),
      (acc, i) =>
        when(acc.getField("skip"),
          struct(acc.getField("out").as("out"), lit(false).as("skip")))
          .when(i < n - 1 &&
            element_at(syms, i + 1) === lit(a) &&
            element_at(syms, i + 2) === lit(b),
            struct(concat(acc.getField("out"), array(lit(a + b))).as("out"),
              lit(true).as("skip")))
          .otherwise(
            struct(concat(acc.getField("out"), array(element_at(syms, i + 1))).as("out"),
              lit(false).as("skip"))),
      acc => acc.getField("out"))
  }

  /** Release a returned vocab's checkpoint blocks once the caller is done
    * with it (the merges table is driver-held and independent). */
  def freeVocab(vocab: DataFrame): Unit = freeBlocks(vocab)

  private def freeBlocks(df: DataFrame): Unit = graft.core.Checkpoint.free(df)

  /** Train `rounds` merges. Returns (merge table, final vocab): the table
    * is (round, lhs, rhs, pair_count) — the trained tokenizer artifact —
    * and the vocab carries each word's post-merge symbol sequence for
    * downstream tokenization. Stops early if the vocabulary runs out of
    * adjacent pairs (every word fully merged). */
  def trainMerges(
      spark: SparkSession, docs: DataFrame, textCol: String,
      rounds: Int): (DataFrame, DataFrame) = {
    var vocab = initialVocab(docs, textCol).graftCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    try {
      var r = 0
      var exhausted = false
      while (r < rounds && !exhausted) {
        val prs = zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (x, y) => struct(x.as("l"), y.as("r")))
        val top = vocab.filter(size(col("syms")) >= 2)
          .select(col("f"), explode(prs).as("p"))
          .groupBy(col("p").getField("l").as("l"), col("p").getField("r").as("r"))
          .agg(sum(col("f")).as("cnt"))
          .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((r + 1, a, b, cnt))
          val next = vocab
            .select(col("word"), col("f"), mergeStep(col("syms"), a, b).as("syms"))
            .graftCheckpoint()
          freeBlocks(vocab)
          vocab = next
          r += 1
        }
      }
      val rows = merges.map { case (rd, l, rr, c) => Row(rd, l, rr, c) }
      val table = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1),
        StructType(Seq(
          StructField("round", IntegerType, nullable = false),
          StructField("lhs", StringType, nullable = false),
          StructField("rhs", StringType, nullable = false),
          StructField("pair_count", LongType, nullable = false))))
      (table, vocab)
    } catch {
      case t: Throwable => freeBlocks(vocab); throw t
    }
  }

  /** Persist a trained vocabulary (word → merged symbol sequence +
    * frequency) as an on-disk artifact — the train-once / serve-many
    * split the PCA/PQ/centroid tiers already have: tokenization jobs and
    * streams LOAD the frozen artifact instead of replaying the merge
    * rounds. Strings and longs round-trip parquet bit-exactly, so
    * load ∘ save is the identity and a loaded tokenization is row-equal
    * to a freshly-trained one (asserted in BpeSpec). */
  def saveVocab(vocab: DataFrame, path: String): Unit =
    vocab.select(col("word"), col("f"), col("syms"))
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** Load a [[saveVocab]] artifact for [[tokenize]]. */
  def loadVocab(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Tokenize a corpus with a trained vocab: each word looks up its merged
    * symbol sequence via a BROADCAST join of the (small) vocabulary — the
    * corpus is never re-folded per merge round. Returns one row per
    * (doc, token) with its position. */
  def tokenize(
      docs: DataFrame, idCol: String, textCol: String,
      trainedVocab: DataFrame): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("word_pos", "word")))
      .filter(length(col("word")) > 0)
      .join(broadcast(trainedVocab.select(col("word"), col("syms"))), "word")
      .select(col("doc_id"), col("word_pos"),
        posexplode(col("syms")).as(Seq("sym_pos", "token")))
      .select(col("doc_id"), col("word_pos").cast("int").as("word_pos"),
        col("sym_pos").cast("int").as("sym_pos"), col("token"))
}
