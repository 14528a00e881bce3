package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the contract checks a
  * production pipeline runs against every ingested batch (the Deequ /
  * dbt-test shape, engine-native): row-level predicates, column
  * completeness, range and set membership, plus key-uniqueness, evaluated
  * in as few passes as the constraint mix allows.
  *
  * 100 TB posture: every row-level expectation folds into ONE aggregation
  * over one scan (a sum(violations) per constraint — map-side partial,
  * group-count-bounded shuffle of exactly one row); uniqueness
  * constraints each add one key-grouped aggregation (the unavoidable
  * shuffle, keyed and partial-agged). Nothing is collected; the report
  * is constraint-count rows. */
object Expectations {

  sealed trait Expectation { def name: String }

  /** Row-level predicate that every row must satisfy (nulls FAIL —
    * an unknown is not a pass; wrap in coalesce to opt out). */
  final case class Satisfies(name: String, predicate: Column) extends Expectation

  /** Column must be non-null everywhere. */
  final case class NotNull(name: String, column: String) extends Expectation

  /** Key column set must be unique across the table. */
  final case class Unique(name: String, columns: Seq[String]) extends Expectation

  /** Evaluate expectations into a per-constraint report:
    * (check_name, n_rows, n_violations, pass). Row-level constraints
    * share one aggregation pass; each Unique adds one keyed aggregation,
    * counting every row that shares its key with another (so a key seen
    * 3 times contributes 3 violations). */
  def check(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "no expectations given")
    require(expectations.map(_.name).distinct.size == expectations.size,
      "expectation names must be unique")
    val rowLevel: Seq[(String, Column)] = expectations.collect {
      case Satisfies(n, p) => n -> !coalesce(p, lit(false))
      case NotNull(n, c) => n -> col(c).isNull
    }
    val uniques = expectations.collect { case u: Unique => u }

    val reports = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (rowLevel.nonEmpty) {
      val aggs = count(lit(1)).as("n_rows") +:
        rowLevel.map { case (n, viol) =>
          // coalesce: an EMPTY batch must report 0 violations / pass=true
          // (a NULL verdict silently vanishes from a filter(pass) consumer)
          coalesce(sum(when(viol, 1L).otherwise(0L)), lit(0L)).as(s"v_$n")
        }
      val one = df.agg(aggs.head, aggs.tail: _*)
      reports += one.select(explode(array(rowLevel.map { case (n, _) =>
        struct(lit(n).as("check_name"), col("n_rows"),
          col(s"v_$n").as("n_violations"))
      }: _*)).as("r")).select(col("r.*"))
    }
    uniques.foreach { u =>
      val keyed = df.groupBy(u.columns.map(col): _*)
        .agg(count(lit(1)).as("n"))
      reports += keyed.agg(
        coalesce(sum(col("n")), lit(0L)).as("n_rows"),
        coalesce(sum(when(col("n") > 1, col("n")).otherwise(0L)), lit(0L))
          .as("n_violations"))
        .select(lit(u.name).as("check_name"), col("n_rows"), col("n_violations"))
    }
    reports.reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
  }

  /** Split `df` into (accepted, quarantined) by the row-level
    * expectations: a row failing ANY predicate lands in quarantine with a
    * `failed` array naming the violated constraints — the dead-letter
    * pattern ([[graft.sources.Sources.readJsonQuarantine]]'s sibling for
    * semantic, not syntactic, rejects). One shared scan, two filters. */
  def quarantine(df: DataFrame, expectations: Seq[Expectation]): (DataFrame, DataFrame) = {
    val rowLevel: Seq[(String, Column)] = expectations.collect {
      case Satisfies(n, p) => n -> !coalesce(p, lit(false))
      case NotNull(n, c) => n -> col(c).isNull
    }
    require(rowLevel.nonEmpty, "quarantine needs at least one row-level expectation")
    require(!df.columns.contains("failed"),
      "input already has a 'failed' column — rename it before quarantine()")
    val failed = filter(
      array(rowLevel.map { case (n, viol) =>
        when(viol, lit(n)).otherwise(lit(null))
      }: _*),
      e => e.isNotNull)
    val flagged = df.withColumn("failed", failed)
    (flagged.filter(size(col("failed")) === 0).drop("failed"),
      flagged.filter(size(col("failed")) > 0))
  }
}
