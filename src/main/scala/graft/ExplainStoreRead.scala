package graft

import org.apache.spark.sql.functions._

/** Dev tool (optimization rounds): print the `.explain("formatted")` of a
  * snapshot-store `readAt` and a stats-pruned `readAtWhere` over a scratch
  * N-split store — the internal store-read plans the gate-level
  * [[ExplainGate]] cannot surface (lifecycle gates return post-checkpoint
  * frames). The interesting field is the scan's `Location`: how many
  * `split=` paths the read LISTED (r16 leaf-path pruning bounds it by the
  * splits read; before, it was the whole version dir).
  *
  *   sbt "runMain graft.ExplainStoreRead [nSplits]"   # default 8
  */
object ExplainStoreRead {
  def main(args: Array[String]): Unit = {
    val nSplits = args.headOption match {
      case None => 8
      case Some(a) => a.toIntOption.filter(_ > 0).getOrElse(
        sys.error(s"usage: ExplainStoreRead [nSplits > 0] (got '$a')"))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.core.Sessions.local(cpus)
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_explain_store")
    try {
      val rows = (0L until nSplits * 5L).map(i =>
        (i, s"s${i / 5}", s"text-$i", i))
      graft.plans.Snapshots.commitFull(spark,
        rows.toDF("doc_id", "split", "text", "n_tokens"), root.toString,
        statsCols = Seq("n_tokens"))
      val readAt = graft.plans.Snapshots.readAt(spark, root.toString, 1)
      println(s"===== readAt v1 ($nSplits splits, all referenced) =====")
      println(readAt.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      // n_tokens ranges are disjoint per split ([5k, 5k+4]) — the
      // predicate survives exactly one split
      val pruned = graft.plans.Snapshots.readAtWhere(spark, root.toString, 1,
        col("n_tokens") === 7)
      println(s"===== readAtWhere n_tokens=7 (stats-pruned to 1 split) =====")
      println(pruned.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println(s"inputFiles: ${pruned.inputFiles.length} file(s)")
      pruned.inputFiles.sorted.foreach(f => println(s"  $f"))
      // r17: the commit WRITE's distribution plan under each knob value —
      // the exchange shape gate plans cannot surface (commits run inside
      // gate builders; the returned frames are post-checkpoint)
      val delta = rows.take(10).toDF("doc_id", "split", "text", "n_tokens")
      Seq("rebalance", "hash", "none").foreach { mode =>
        println(s"===== commit-write distribution plan: mode=$mode =====")
        println(graft.core.Distribute
          .forWrite(delta, "split", scope = "", scopeDefault = mode)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      }
    } finally {
      graft.plans.CorpusExport.deleteRecursively(root.toFile)
      spark.stop()
    }
  }
}
