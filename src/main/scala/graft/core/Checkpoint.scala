package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Session-configurable checkpoint strategy for every iterative and
  * orchestration path in the engine (connected-components rounds, PageRank
  * and BFS frontiers, BPE merge rounds, corpus-export manifests, …).
  *
  * The reference has no execution tier at all (SURVEY §0: relational work
  * is delegated to Slick), so lineage management is a Spark-native concern
  * this engine must own. The failure mode it guards: an N-round loop whose
  * plan doubles every round (analysis cost explodes), or — with
  * `localCheckpoint` — whose truncated-lineage blocks live UNREPLICATED on
  * executors, so one lost executor kills a multi-hour job on a real
  * cluster. Local checkpoints are the right call for `local[*]` and tests
  * (no DFS round-trip); reliable checkpoints are the right call on
  * preemptible/shared clusters. The choice is a DEPLOYMENT property, not a
  * per-operator one — so it is a session conf, honored by every operator,
  * read at call time:
  *
  *   - `spark.graft.checkpoint.mode` = `local` (default) | `reliable`
  *   - `spark.graft.checkpoint.dir`  = DFS path for `reliable` mode
  *     (falls back to an already-set `SparkContext.setCheckpointDir`)
  *
  * Eagerness is a per-call-site decision and is preserved IN LOCAL MODE:
  * loops whose next action doubles as the materializer pass
  * `eager = false` (one job per round, not two); result hand-offs that
  * must outlive freed inputs pass `eager = true`. Reliable mode is
  * always eager (see [[apply]]): Spark writes only the TOPMOST marked
  * RDD per job, so laziness there would silently skip the very
  * checkpoint the mode exists for.
  *
  * [[free]] releases a SUPERSEDED checkpoint no matter the mode: block
  * manager blocks always; reliable-mode checkpoint FILES too (best-effort
  * DFS delete) — without that, a 20-round resolve leaves 20 dead rdd-*
  * directories for the cleaner to maybe find.
  *
  * TERMINAL checkpoints (a gate result's lineage cut, a mid-plan
  * artifact) have no free() site — in reliable mode their DFS files are
  * reclaimed by the ContextCleaner after the RDD is GC'd, which requires
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` at context
  * creation (Spark defaults it OFF; [[Sessions.graftBuilder]] sets it).
  */
object Checkpoint {

  /** Session conf key selecting the strategy: `local` | `reliable`. */
  val ModeKey = "spark.graft.checkpoint.mode"

  /** Session conf key giving `reliable` mode its DFS directory. */
  val DirKey = "spark.graft.checkpoint.dir"

  /** Checkpoint `df` under the session's configured strategy, truncating
    * plan lineage. `eager = false` defers materialization to the caller's
    * next action over the result (which must happen before any input
    * frames are freed); it is honored in LOCAL mode only — see the
    * reliable branch for why.
    *
    * The reliable branch is ALWAYS eager, through a transient cache:
    *   - `eager = false` cannot be honored there: Spark checkpoints only
    *     the TOPMOST marked RDD per job
    *     (`spark.checkpoint.checkpointAllMarkedAncestors` defaults
    *     false), so a lazily-marked frame whose successor also
    *     checkpoints — every round of an iterative loop — would NEVER be
    *     written: no files, no lineage cut, silently unprotected, and
    *     its upstream plan recomputed per consuming job;
    *   - without the cache, `checkpoint(eager = true)` computes the plan
    *     TWICE (the materializing count, then the uncached DFS write
    *     job). Persist → checkpoint → unpersist computes once and writes
    *     from the cache; the returned frame reads the checkpoint FILES,
    *     independent of the freed cache.
    * A reliable round therefore costs one compute + one cache-read write
    * — the price of surviving a lost executor. */
  def apply(df: DataFrame, eager: Boolean = true): DataFrame = {
    val conf = df.sparkSession.conf
    conf.get(ModeKey, "local") match {
      case "local" => df.localCheckpoint(eager)
      case "reliable" =>
        val sc = df.sparkSession.sparkContext
        conf.getOption(DirKey) match {
          // THIS session's DirKey always wins: the context-level dir is
          // shared mutable state another session may have set — silently
          // landing this session's checkpoints under someone else's dir
          // means their cleanup deletes our live files. Reset ONLY when
          // the context dir isn't already under DirKey: setCheckpointDir
          // mkdirs a fresh UUID subdirectory per call, and free()/the
          // cleaner delete only rdd-N dirs inside it, so per-call resets
          // would strand one empty UUID dir per checkpoint forever.
          // (The context dir is process-global, so two sessions
          // checkpointing CONCURRENTLY with different DirKeys can still
          // interleave — give them the same dir, or separate contexts.)
          case Some(dir) =>
            // Qualify BOTH sides (scheme + authority + path) before
            // comparing: a bare-path match alone would let `/ckpt` on the
            // local FS shadow `hdfs://nn/ckpt`, skipping setCheckpointDir
            // and landing reliable checkpoints on the wrong filesystem.
            val hadoopConf = sc.hadoopConfiguration
            def qualified(s: String): java.net.URI = {
              val p = new org.apache.hadoop.fs.Path(s)
              p.getFileSystem(hadoopConf).makeQualified(p).toUri
            }
            val target = qualified(dir)
            val already = sc.getCheckpointDir.exists { c =>
              val p = new org.apache.hadoop.fs.Path(c).getParent
              p != null && qualified(p.toString) == target
            }
            if (!already) sc.setCheckpointDir(dir)
          case None =>
            // a SET context dir is only trustworthy if it still EXISTS:
            // the context-level value is process-global and outlives the
            // session that set it (e.g. an isolated gate's temp dir,
            // swept on its way out) — silently accepting a stale path
            // would recreate it wherever the path string lands, the
            // wrong-filesystem outcome the qualified compare above
            // guards against
            val stale = sc.getCheckpointDir.filterNot { c =>
              val p = new org.apache.hadoop.fs.Path(c)
              p.getFileSystem(sc.hadoopConfiguration).exists(p)
            }
            if (sc.getCheckpointDir.isEmpty || stale.nonEmpty)
              throw GraftAnalysisException(Seq(
                s"$ModeKey=reliable needs a checkpoint directory: set $DirKey " +
                  "(a DFS path) or SparkContext.setCheckpointDir before running" +
                  stale.fold("")(c => s" (the context dir $c no longer exists)")))
        }
        // A caller-persisted frame already computes once and feeds the
        // DFS write from its own cache — persisting again would be a
        // no-op, but the finally-unpersist would silently destroy the
        // caller's cache (same caller-owned-cache guard as
        // Channels.multiSink).
        if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
          df.checkpoint(eager = true)
        else {
          val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try cached.checkpoint(eager = true)
          finally { cached.unpersist(blocking = false); () }
        }
      case other => throw GraftAnalysisException(Seq(
        s"unknown $ModeKey '$other' (expected 'local' or 'reliable')"))
    }
  }

  /** Release a superseded checkpointed frame's storage: unpersist its
    * blocks, and in reliable mode delete its checkpoint files. No-op for
    * non-checkpointed plans (e.g. an identity strategy injected by a
    * test). Callers invoke this the moment a round's successor is
    * materialized — a long-lived session (a curation service, a bench
    * loop) must not accumulate every round of every invocation until the
    * async context cleaner happens to run. */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val rdd = lr.rdd
        rdd.unpersist(blocking = false): Unit
        rdd.getCheckpointFile.foreach { path =>
          try {
            val p = new org.apache.hadoop.fs.Path(path)
            val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
            fs.delete(p, true): Unit
          } catch { case _: java.io.IOException => () } // cleaner's job then
        }
      case _ => ()
    }

  /** Chain-position syntax: `df.graftCheckpoint()` ≡ `Checkpoint(df)` —
    * lets call sites keep the `.localCheckpoint(…)` shape they had while
    * honoring the session strategy. */
  implicit final class Ops(private val df: DataFrame) extends AnyVal {
    def graftCheckpoint(eager: Boolean = true): DataFrame = Checkpoint(df, eager)
  }
}
