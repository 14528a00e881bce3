package graft.core

import org.apache.spark.sql.SparkSession

/** Job-description scoping for the engine's internal actions (the
  * optimization guide's "label your jobs" discipline): a multi-action
  * operator (a store commit, an export, an index refresh) wraps each
  * phase's action so the Spark UI / job listeners attribute cost to the
  * phase, not to an anonymous `collect at Snapshots.scala:…`.
  *
  * Descriptions are thread-local in Spark, so scoping restores the
  * caller's own description (a user pipeline labeling its steps keeps
  * its labels; concurrent committers on separate threads don't clobber
  * each other). Zero cost beyond two local-property writes per phase.
  */
object Labeled {
  def apply[T](s: SparkSession, desc: String)(body: => T): T = {
    val sc = s.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body
    finally sc.setJobDescription(prev)
  }
}
