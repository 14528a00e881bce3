package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** OUTPUT DISTRIBUTION for dynamic-partitioned writes (r16, optimization
  * guide §2.4/§6): a `partitionBy(k)` write emits up to
  * (input tasks × distinct k per task) files — at 32 local tasks over a
  * 64-bucket store that is ~2,000 tiny files per commit, and at cluster
  * scale it is the classic small-files explosion (object-store listing and
  * open cost compound across every later read) plus a same-key row-group
  * interleave that dilutes any in-partition clustering.
  *
  * `REBALANCE(k)` keys the exchange by the partition column and lets AQE
  * size the output: small keys coalesce into shared tasks (few files), a
  * skewed key fans out over several tasks of advisory-partition size
  * (write parallelism preserved) — the Iceberg
  * `write.distribution-mode=hash` shape, scale-adaptive by construction.
  * Cost: one exchange of the DATA BEING WRITTEN (a commit delta, an index
  * batch — never a standing corpus).
  *
  * Knob `spark.graft.write.distribution`:
  *   - `rebalance` (default) — AQE-sized per-key writers;
  *   - `hash` — plain `repartition(k)`: fixed per-key writers, no AQE
  *     dependence (one task per key hash; beware giant keys);
  *   - `none` — the shuffle-free layout, for callers whose input is
  *     already clustered by the partition key.
  */
object Distribute {

  val Key = "spark.graft.write.distribution"

  def forWrite(df: DataFrame, partCol: String): DataFrame =
    df.sparkSession.conf.getOption(Key).getOrElse("rebalance") match {
      case "none" => df
      case "hash" => df.repartition(col(partCol))
      case "rebalance" => df.hint("rebalance", col(partCol))
      case other => throw GraftAnalysisException(Seq(
        s"unknown $Key '$other' (expected 'rebalance', 'hash' or 'none')"))
    }
}
