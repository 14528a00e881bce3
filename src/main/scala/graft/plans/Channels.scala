package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Multi-sink execution over one plan — the Spark-native rendition of the
  * reference's channel composition and `afterResult` secondary outputs
  * (reference: framework/ubw-core/.../Channel.scala:18-57,
  * PileSyntax.scala:95-112, FoldableChannel.scala:115-192).
  *
  * In ubw a channel pipeline re-packs rows between stages; in Spark the lazy
  * logical plan *is* the channel, so composing stages is function
  * composition, and a multi-output channel is several actions over one
  * cached plan — the input is computed once, not once per sink.
  */
object Channels {

  /** Compose transformation stages left-to-right (ubw's `next`/`compose`). */
  def pipeline(stages: (DataFrame => DataFrame)*): DataFrame => DataFrame =
    stages.reduceLeft(_ andThen _)

  /** Run every sink against one cached materialization of `df`; the cache is
    * dropped afterwards. At cluster scale, prefer MEMORY_AND_DISK (default
    * here) so a large intermediate spills instead of recomputing per sink.
    *
    * Contract: sinks must RUN an action and return its materialized result
    * (count, collect, write). The input is force-materialized before the
    * first sink, so every sink is guaranteed a warm cache regardless of
    * order — but a sink that returns a *lazy* DataFrame gets no protection:
    * the cache is dropped when this method returns, and consuming that
    * DataFrame later recomputes the full input. */
  def multiSink[T](df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK)(
      sinks: Seq[DataFrame => T]): Seq[T] = {
    val cached = df.persist(level)
    try {
      cached.count() // materialize once, up front
      sinks.map(sink => sink(cached))
    } finally cached.unpersist(blocking = false)
  }
}
