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

  /** Compose transformation stages left-to-right (ubw's `next`/`compose`);
    * zero stages compose to the identity transform, not a crash. */
  def pipeline(stages: (DataFrame => DataFrame)*): DataFrame => DataFrame =
    stages.foldLeft(identity[DataFrame] _)(_ andThen _)

  /** Run every sink against one cached materialization of `df`; the cache is
    * dropped afterwards. At cluster scale, prefer MEMORY_AND_DISK (default
    * here) so a large intermediate spills instead of recomputing per sink.
    *
    * Contract: sinks must RUN an action and return its materialized result
    * (count, collect, write). The input is force-materialized before the
    * first sink, so every sink is guaranteed a warm cache regardless of
    * order — but a sink that returns a *lazy* DataFrame gets no protection:
    * the cache is dropped when this method returns, and consuming that
    * DataFrame later recomputes the full input.
    *
    * A frame the CALLER already persisted is left persisted: unpersisting
    * it here would silently destroy the caller's cache for every use
    * after this call (persist-on-persisted is a no-op, so this method
    * never owned that cache entry). */
  def multiSink[T](df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK)(
      sinks: Seq[DataFrame => T]): Seq[T] = {
    val callerCached = df.storageLevel != StorageLevel.NONE
    val cached = if (callerCached) df else df.persist(level)
    try {
      cached.count() // materialize once, up front
      sinks.map(sink => sink(cached))
    } finally {
      if (!callerCached) cached.unpersist(blocking = false); ()
    }
  }
}
