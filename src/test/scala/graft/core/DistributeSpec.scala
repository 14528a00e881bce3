package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins for the r16 write-distribution helper: the file-count bound the
  * REBALANCE mode exists for, the shuffle-free `none` escape hatch, and
  * the loud refusal on an unknown knob value. */
class DistributeSpec extends SparkTestBase {

  import spark.implicits._

  private def withKnob[T](v: Option[String])(body: => T): T = {
    val prev = spark.conf.getOption(Distribute.Key)
    v match {
      case Some(x) => spark.conf.set(Distribute.Key, x)
      case None => spark.conf.unset(Distribute.Key)
    }
    try body
    finally {
      prev match {
        case Some(p) => spark.conf.set(Distribute.Key, p)
        case None => spark.conf.unset(Distribute.Key)
      }
    }
  }

  private def partFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).toSeq.flatten.flatMap { f =>
      if (f.isDirectory) partFiles(f)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Nil
    }

  // 8 splits spread over MANY input partitions: the naive dynamic write's
  // file count scales with tasks × splits; the distributed write's with
  // splits alone
  private def wide = spark.range(0, 4096, 1, 16)
    .select(col("id").as("doc_id"),
      concat(lit("s"), pmod(col("id"), lit(8))).as("split"))

  test("rebalance bounds a partitioned write's files at ~#splits, content intact") {
    val out = java.nio.file.Files.createTempDirectory("graft_dist_reb").toFile
    try {
      withKnob(Some("rebalance")) {
        Distribute.forWrite(wide, "split")
          .write.mode("overwrite").partitionBy("split").parquet(out.getPath)
      }
      val files = partFiles(out)
      // 16 input partitions × 8 splits = up to 128 files undistributed;
      // the rebalanced write must stay within a small factor of #splits
      // (AQE may keep a few writers, never tasks × splits)
      assert(files.size <= 16, s"expected ≤ 2×#splits files, got ${files.size}")
      val back = spark.read.parquet(out.getPath)
      assert(back.count() == 4096)
      assert(back.select(countDistinct(col("split"))).head().getLong(0) == 8)
      assert(back.agg(sum(col("doc_id"))).head().getLong(0) ==
        wide.agg(sum(col("doc_id"))).head().getLong(0))
    } finally graft.plans.CorpusExport.deleteRecursively(out)
  }

  test("none is the identity — no exchange is added to the plan") {
    withKnob(Some("none")) {
      val df = wide
      val out = Distribute.forWrite(df, "split")
      assert(out.queryExecution.logical eq df.queryExecution.logical)
    }
  }

  test("default (knob unset) distributes; unknown knob value refuses loudly") {
    withKnob(None) {
      val planned = Distribute.forWrite(wide, "split")
        .queryExecution.optimizedPlan.toString
      assert(planned.toLowerCase.contains("rebalance") ||
        planned.contains("RepartitionByExpression"),
        s"default mode must plan a distribution:\n$planned")
    }
    withKnob(Some("zorder")) {
      val e = intercept[GraftAnalysisException] {
        Distribute.forWrite(wide, "split")
      }
      assert(e.getMessage.contains("zorder") &&
        e.getMessage.contains(Distribute.Key))
    }
  }

  // r17: the per-scope override — scoped conf beats global conf beats the
  // call site's default; an unscoped call never reads another scope's conf
  test("scoped resolution: scoped conf > global conf > call-site default") {
    def isIdentity(scope: String, dflt: String): Boolean = {
      val df = wide // bind: `wide` is a def, each call is a fresh frame
      val out = Distribute.forWrite(df, "split", scope, dflt)
      out.queryExecution.logical eq df.queryExecution.logical
    }
    val scoped = s"${Distribute.Key}.ivf"
    withKnob(None) {
      spark.conf.unset(scoped)
      // nothing set: the call site's default rules
      assert(isIdentity("ivf", "none"))
      assert(!isIdentity("ivf", "rebalance"))
      // global set: beats the call-site default
      withKnob(Some("rebalance")) { assert(!isIdentity("ivf", "none")) }
      withKnob(Some("none")) { assert(isIdentity("ivf", "rebalance")) }
      // scoped set: beats the global knob, for its scope only
      try {
        spark.conf.set(scoped, "none")
        withKnob(Some("rebalance")) {
          assert(isIdentity("ivf", "rebalance"))
          assert(!isIdentity("store", "rebalance"), "other scopes unaffected")
          assert(!isIdentity("", "rebalance"), "unscoped calls unaffected")
        }
        spark.conf.set(scoped, "rebalance")
        withKnob(Some("none")) { assert(!isIdentity("ivf", "none")) }
      } finally spark.conf.unset(scoped)
    }
  }
}
