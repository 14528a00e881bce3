package graft.sources

import graft.SparkTestBase
import graft.plans.{CorpusExport, Snapshots}
import org.apache.spark.sql.functions._

/** MEASUREMENT harness (env-gated, not a CI pin): quantifies the
  * front-door "row-boundary tax" — the `V1Scan` body serves
  * `scanFrame(...).rdd`, so every row crosses
  * `InternalRow → Row → InternalRow` with no codegen fusion into the
  * outer query, while the native `Snapshots.readAt` lane stays
  * columnar under whole-stage codegen. Run with
  *
  *   GRAFT_TAX_ROWS=5000000 sbt "testOnly graft.sources.FrontDoorTaxSpec"
  *
  * and record the printed ratios in SCALE.md. Unset, the suite cancels
  * (measurements don't belong in the correctness wall). */
class FrontDoorTaxSpec extends SparkTestBase {

  test("front-door scan/agg vs native readAt (prints ratios; env-gated)") {
    val rows = sys.env.get("GRAFT_TAX_ROWS").map(_.toLong).getOrElse {
      cancel("set GRAFT_TAX_ROWS to run the measurement")
    }
    val root = java.nio.file.Files.createTempDirectory("graft_tax")
    try {
      val d = spark.range(rows).select(
        col("id").as("doc_id"),
        concat(lit("s"), pmod(col("id"), lit(16))).as("split"),
        (col("id") % 997).cast("double").as("score"),
        concat(lit("payload-"), (col("id") % 10000).cast("string"))
          .as("text"))
      Snapshots.commitFull(spark, d, root.toString)

      def time[A](what: String)(body: => A): Double = {
        body // warm
        val samples = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }
        val best = samples.min
        info(f"$what%-28s ${best}%.2f s (min of 3)")
        best
      }

      val door = spark.read.format("graft-snapshot").load(root.toString)
      val native = Snapshots.readAt(spark, root.toString, 1)

      // scan-heavy aggregate: full row width crosses the boundary
      val aggDoor = time("agg through front door") {
        door.agg(sum(col("score")), sum(length(col("text")))).collect()
      }
      val aggNative = time("agg through readAt") {
        native.agg(sum(col("score")), sum(length(col("text")))).collect()
      }

      // split-keyed join shape: the scan reports no partitioning, so
      // the door side always shuffles; native reads shuffle too (plain
      // parquet), isolating the per-row conversion cost
      val dim = spark.range(16).select(
        concat(lit("s"), col("id")).as("split"),
        (col("id") * 10).as("weight"))
      val joinDoor = time("split-join through front door") {
        door.join(broadcast(dim), "split")
          .agg(sum(col("weight") * col("score"))).collect()
      }
      val joinNative = time("split-join through readAt") {
        native.join(broadcast(dim), "split")
          .agg(sum(col("weight") * col("score"))).collect()
      }

      info(f"row-boundary tax: agg ${aggDoor / aggNative}%.2fx, " +
        f"join ${joinDoor / joinNative}%.2fx (rows=$rows)")
    } finally CorpusExport.deleteRecursively(root.toFile)
  }
}
