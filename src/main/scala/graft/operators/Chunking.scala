package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking — the sequence-prep step between curation and
  * [[Sampling.packByTokenBudget]]: documents longer than a model's context
  * length are split into overlapping token windows (the standard sliding
  * window: window w starts at token w·stride and takes up to `maxTokens`
  * tokens; stride < maxTokens gives the overlap that keeps spans crossing
  * a boundary learnable).
  *
  * 100 TB shape: ONE narrow projection + generator — per-row arithmetic
  * over the token array, zero shuffles, stays in whole-stage codegen
  * (sequence/transform/slice are all codegen built-ins). Row growth is
  * ⌈n/stride⌉ per doc, the contract of the operator itself.
  */
object Chunking {

  /** Split each document into sliding token windows. Every start offset
    * 0, stride, 2·stride, … < n emits a window (the tail window may be
    * short — standard convention, so the final tokens are never dropped).
    * Output: doc_id, chunk_id (0-based window index), n_chunk_tokens,
    * chunk (the window text re-joined with single spaces). */
  def slidingWindows(
      docs: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, stride: Int): DataFrame = {
    require(maxTokens > 0 && stride > 0 && stride <= maxTokens,
      s"need 0 < stride <= maxTokens, got stride=$stride maxTokens=$maxTokens")
    val ts = GraftFunctions.tokens(col(textCol))
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(transform(
          sequence(lit(0), size(ts) - 1, lit(stride)),
          st => struct(
            least(lit(maxTokens), size(ts) - st).as("n"),
            array_join(slice(ts, st + 1, lit(maxTokens)), " ").as("chunk")))))
      .select(col("doc_id"), col("pos").cast("int").as("chunk_id"),
        col("col").getField("n").cast("long").as("n_chunk_tokens"),
        col("col").getField("chunk").as("chunk"))
  }
}
