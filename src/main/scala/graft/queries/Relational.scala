package graft.queries

import graft.core.Checkpoint.Ops
import graft.Tables
import graft.queries.Exact._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator inventory (SURVEY.md §2.2) expressed Spark-first.
  *
  * The reference delegates all relational execution to Slick
  * (reference: documentation/doc-01.md:154, doc-03.md:84-86); here each
  * capability is a native DataFrame pipeline that Catalyst optimizes
  * (pushdown, pruning, broadcast, whole-stage codegen). Every query takes
  * `(spark, sfDir)` and has a DuckDB oracle in [[graft.SparkEntry.oracleSql]].
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** TPC-H Q1 flavor: scan + filter + groupBy aggregation with map-side
    * partial aggregation; the shipdate filter is pushed to the parquet scan. */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (rate(lit(1)) - rate(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec2(col("l_extendedprice")) * (rate(lit(1)) - rate(col("l_discount")))
          * (rate(lit(1)) + rate(col("l_tax")))).cast("double").as("sum_charge"),
        avg(col("l_quantity")).as("avg_qty"),
        avgMoney(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Fact⋈dim join with an explicit broadcast of the small side — at 100 TB
    * the part table is the broadcastable dimension, lineitem the fact. */
  def joinBroadcast(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        sumMoney(col("l_extendedprice")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("p_brand"))

  val joinBroadcastSql: String =
    s"""SELECT p_brand, ${sqlSumMoney("l_extendedprice")} AS revenue, COUNT(*) AS n_items
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** TPC-H Q5 flavor: five-way join; dims (region/nation/supplier) broadcast,
    * the customer⋈orders⋈lineitem chain shuffles on its join keys. */
  def q5Multijoin(s: SparkSession, dir: String): DataFrame = {
    val region = broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA"))
    val nation = broadcast(t(s, dir, "nation"))
    val supplier = broadcast(t(s, dir, "supplier"))
    t(s, dir, "customer")
      .join(t(s, dir, "orders"),
        col("c_custkey") === col("o_custkey") &&
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .join(supplier,
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec2(col("l_extendedprice")) * (rate(lit(1)) - rate(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5MultijoinSql: String =
    s"""SELECT n_name,
       |  CAST(SUM(${sqlDec2("l_extendedprice")} * (${sqlRate("1")} - ${sqlRate("l_discount")})) AS DOUBLE) AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** Semi join (EXISTS): customers having a high-value order. */
  def semiJoin(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "orders").filter(col("o_totalprice") > 200000)
    t(s, dir, "customer")
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  val semiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 200000)""".stripMargin

  /** Anti join (NOT EXISTS): customers with no order above 250k. */
  def antiJoin(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "orders").filter(col("o_totalprice") > 250000)
    t(s, dir, "customer")
      .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  val antiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 250000)""".stripMargin

  /** Rollup super-aggregate over the region→nation hierarchy (dynamic
    * multi-dimensional statistics in Rollup mode, doc-03.md:86). */
  def rollupStats(s: SparkSession, dir: String): DataFrame = {
    val joined = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
    graft.relational.DynamicStats.stats(
      joined,
      Seq("r_name", "n_name"),
      Seq(
        graft.relational.DynamicStats.Measure("total_bal", sumMoney(col("c_acctbal"))),
        graft.relational.DynamicStats.Measure("n_cust", count(lit(1))),
        graft.relational.DynamicStats.Measure("gid", grouping_id().cast("long"))),
      graft.relational.DynamicStats.Mode.Rollup)
  }

  val rollupStatsSql: String =
    s"""SELECT r_name, n_name,
       |  ${sqlSumMoney("c_acctbal")} AS total_bal,
       |  COUNT(*) AS n_cust,
       |  CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP (r_name, n_name)""".stripMargin

  /** Arbitrary GROUPING SETS over the same region→nation join — NOT a
    * rollup chain: `{(r,n), (n), ()}` asks for per-nation totals without
    * the per-region stratum, which neither ROLLUP nor CUBE can request.
    * One Expand + one aggregate in the plan (no union of scans). */
  def groupingSetsStats(s: SparkSession, dir: String): DataFrame = {
    val joined = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
    graft.relational.DynamicStats.stats(
      joined,
      Seq("r_name", "n_name"),
      Seq(
        graft.relational.DynamicStats.Measure("total_bal", sumMoney(col("c_acctbal"))),
        graft.relational.DynamicStats.Measure("n_cust", count(lit(1))),
        graft.relational.DynamicStats.Measure("gid", grouping_id().cast("long"))),
      graft.relational.DynamicStats.Mode.GroupingSets(
        Seq(Seq("r_name", "n_name"), Seq("n_name"), Seq())))
  }

  val groupingSetsStatsSql: String =
    s"""SELECT r_name, n_name,
       |  ${sqlSumMoney("c_acctbal")} AS total_bal,
       |  COUNT(*) AS n_cust,
       |  CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY GROUPING SETS ((r_name, n_name), (n_name), ())""".stripMargin

  /** Exact distinct aggregation (Spark expand+two-phase distinct count). */
  def distinctAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  val distinctAggSql: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** HLL sketch next to the exact count it approximates. Both values, for
    * SketchSpec's band assertions; the gate ([[approxDistinct]]) projects
    * the engine-specific estimate away. The bound is 5× the configured
    * relative standard deviation (0.05): rsd is a STANDARD DEVIATION, not
    * a bound — a healthy sketch lands outside 3σ ~0.3% of the time per
    * group (a real gate-flake rate over rounds), outside 5σ ~6·10⁻⁷ —
    * negligible, while a broken sketch (off by ≥25%) still fails loudly. */
  def approxDistinctFull(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), rsd = 0.05).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .withColumn("within_bound",
        abs(col("approx_parts").cast("double") - col("exact_parts").cast("double"))
          <= lit(5 * 0.05) * col("exact_parts").cast("double"))

  /** Gate form of [[approxDistinctFull]] — oracle-exact (round 8): the
    * hashed output carries only DuckDB-computable columns (the exact
    * distinct counts) plus the `within_bound` verdict, whose truth is
    * ENFORCED IN-QUERY — a sketch outside 5σ doesn't emit `false` (which
    * a hash mismatch would merely flag), it aborts the job via
    * `raise_error`, so the oracle can assert the literal TRUE. The HLL
    * estimate itself (engine-specific by nature) lives in
    * [[approxDistinctFull]] + SketchSpec, where engine numbers belong. */
  def approxDistinct(s: SparkSession, dir: String): DataFrame =
    approxDistinctFull(s, dir)
      .select(
        col("l_returnflag"),
        col("exact_parts"),
        when(col("within_bound"), lit(true))
          .otherwise(raise_error(concat(
            lit("HLL estimate outside 5*rsd for flag "), col("l_returnflag"),
            lit(": approx="), col("approx_parts").cast("string"),
            lit(" exact="), col("exact_parts").cast("string"))))
          .as("within_bound"))
      .orderBy(col("l_returnflag"))

  val approxDistinctSql: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
      |  TRUE AS within_bound
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** lgConfigK of the mergeable-sketch gate: 2^12 registers → relative
    * standard error ≈ 1.04/√4096 ≈ 1.63%. Shared with the verdict bound
    * (5σ, the [[approxDistinctFull]] flake-rate reasoning). */
  val SketchMergeLgK: Int = 12

  /** Mergeable sketch COLUMNS — the pre-aggregated sketch-table pattern
    * that matters at 100 TB: a daily job maintains per-(flag, month) HLL
    * sketches (Apache DataSketches via `hll_sketch_agg`), and any rollup
    * UNIONS the standing sketches (`hll_union_agg`) instead of
    * re-scanning the fact table — distinct counts over arbitrary slice
    * unions at pre-aggregate cost. The fact-table pass here exists only
    * to build the slices and the exact twin the verdict needs; a real
    * deployment reads the sketch table. Gate form follows the round-8
    * sketch discipline: the hashed output is DuckDB-computable (slice
    * count, exact distinct) plus a `raise_error`-enforced verdict that
    * the merged estimate landed within 5× the configured RSE; the
    * estimate itself stays in [[sketchMergeFull]] + SketchSpec. */
  def sketchMergeFull(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val slices = li
      .groupBy(col("l_returnflag"), date_trunc("month", col("l_shipdate")).as("m"))
      .agg(expr(s"hll_sketch_agg(l_partkey, $SketchMergeLgK)").as("sk"))
    val merged = slices.groupBy(col("l_returnflag"))
      .agg(
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"),
        count(lit(1)).as("n_slices"))
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
    merged.join(exact, "l_returnflag")
      .withColumn("within_bound",
        abs(col("est").cast("double") - col("exact_parts").cast("double"))
          <= lit(5 * 1.04 / math.sqrt((1 << SketchMergeLgK).toDouble))
            * col("exact_parts").cast("double"))
  }

  /** Gate form of [[sketchMergeFull]] (see [[approxDistinct]]). */
  def sketchMerge(s: SparkSession, dir: String): DataFrame =
    sketchMergeFull(s, dir)
      .select(
        col("l_returnflag"), col("n_slices"), col("exact_parts"),
        when(col("within_bound"), lit(true))
          .otherwise(raise_error(concat(
            lit("merged HLL estimate outside 5*rse for flag "), col("l_returnflag"),
            lit(": est="), col("est").cast("string"),
            lit(" exact="), col("exact_parts").cast("string"))))
          .as("within_bound"))
      .orderBy(col("l_returnflag"))

  val sketchMergeSql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT date_trunc('month', CAST(l_shipdate AS TIMESTAMP))) AS n_slices,
      |  COUNT(DISTINCT l_partkey) AS exact_parts,
      |  TRUE AS within_bound
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** The raw-SQL front door: the engine's tables registered as views and
    * an ANSI query with BOTH correlated-subquery forms — a correlated
    * scalar subquery (per-customer order count) and a correlated NOT
    * EXISTS (no order above the threshold) — answered by `spark.sql`.
    * Catalyst DECORRELATES both: the scalar subquery becomes an
    * aggregate + left outer join, the NOT EXISTS an anti join — no
    * per-row re-execution anywhere (SqlFrontDoorSpec pins the join nodes
    * and the absence of any remaining correlated predicate). A user of
    * the reference's declaration surface and a SQL-speaking client hit
    * the same engine. */
  def sqlCorrelated(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("customer_v")
    t(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT c.c_custkey, c.c_name,
        |  (SELECT COUNT(*) FROM orders_v o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders
        |FROM customer_v c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders_v o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
        |ORDER BY c.c_custkey""".stripMargin)
  }

  val sqlCorrelatedSql: String =
    """SELECT c.c_custkey, c.c_name,
      |  (SELECT COUNT(*) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey) AS n_orders
      |FROM customer c
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
      |ORDER BY c.c_custkey""".stripMargin

  /** ANSI RECURSIVE CTE — the iterative-fixpoint front door (hierarchy
    * walks, transitive closure) Spark 4 executes natively as a
    * UnionLoop: a binary-heap tree over `documents` (node i's parent is
    * floor((i-1)/2), root 0) walked from the root, every document's
    * depth computed by the recursion and aggregated per level. The
    * recursion is O(log n) iterations of a frontier join — a 5k-doc
    * tree takes 13, a trillion-doc tree 40; each iteration is one
    * distributed join, so the shape survives any corpus. DuckDB runs
    * the same ANSI text — the engines must agree on the fixpoint. */
  def recursiveCte(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "documents").select(col("doc_id"))
      .createOrReplaceTempView("docs_v")
    s.sql(
      """WITH RECURSIVE tree(doc_id, depth) AS (
        |  SELECT doc_id, 0 AS depth FROM docs_v WHERE doc_id = 0
        |  UNION ALL
        |  SELECT d.doc_id, t.depth + 1
        |  FROM docs_v d JOIN tree t
        |    ON CAST(FLOOR((d.doc_id - 1) / 2) AS BIGINT) = t.doc_id
        |  WHERE d.doc_id > 0)
        |SELECT depth, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM tree GROUP BY depth""".stripMargin)
  }

  val recursiveCteSql: String =
    """WITH RECURSIVE tree(doc_id, depth) AS (
      |  SELECT doc_id, 0 AS depth FROM documents WHERE doc_id = 0
      |  UNION ALL
      |  SELECT d.doc_id, t.depth + 1
      |  FROM documents d JOIN tree t
      |    ON CAST(FLOOR((d.doc_id - 1) / 2) AS BIGINT) = t.doc_id
      |  WHERE d.doc_id > 0)
      |SELECT depth, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_sum
      |FROM tree GROUP BY depth""".stripMargin

  /** Unpivot/melt — the wide→long reshape (the inverse of [[pivotAgg]]):
    * per-flag aggregates melted to (flag, metric, value) rows via the
    * native `Dataset.unpivot` (Catalyst Expand, one pass, no join).
    * Money math follows the Exact decimal convention so the doubles
    * hash-match. */
  def unpivotMetrics(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("qty"),
        sumMoney(col("l_extendedprice")).as("price"),
        count(lit(1)).cast("double").as("n"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("qty"), col("price"), col("n")),
        "metric", "value")
      .orderBy(col("l_returnflag"), col("metric"))

  val unpivotMetricsSql: String =
    s"""WITH a AS (
       |  SELECT l_returnflag,
       |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty,
       |    ${sqlSumMoney("l_extendedprice")} AS price,
       |    CAST(COUNT(*) AS DOUBLE) AS n
       |  FROM lineitem GROUP BY l_returnflag)
       |SELECT l_returnflag, metric, value FROM (
       |  SELECT l_returnflag, 'qty' AS metric, qty AS value FROM a
       |  UNION ALL SELECT l_returnflag, 'price', price FROM a
       |  UNION ALL SELECT l_returnflag, 'n', n FROM a)
       |ORDER BY l_returnflag, metric""".stripMargin

  /** Window ranking: top-3 orders per customer (row_number + filter). */
  def windowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
  }

  val windowRankSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders) WHERE rn <= 3""".stripMargin

  /** Distribution-family window functions over the same per-customer
    * total order as [[windowRank]]: ntile quartiles, percent_rank,
    * cume_dist, lead and first_value in one pass. The partition key is
    * o_custkey (millions of small partitions at scale — never a global
    * sort), and the ORDER BY ends in the unique o_orderkey so every rank
    * — and therefore every (rank-1)/(n-1) double — is deterministic and
    * engine-identical. Single-row partitions exercise the percent_rank=0 /
    * cume_dist=1 degenerate definitions. */
  def windowDist(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        first_value(col("o_totalprice")).over(w).as("top_price"))
  }

  val windowDistSql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
      |  PERCENT_RANK() OVER w AS pct_rank,
      |  CUME_DIST() OVER w AS cume,
      |  LEAD(o_totalprice, 1) OVER w AS next_price,
      |  FIRST_VALUE(o_totalprice) OVER w AS top_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY o_totalprice DESC, o_orderkey ASC)""".stripMargin

  /** Running total per supplier — exact decimal inside the frame so the
    * accumulation order can't change the double result. (l_orderkey,
    * l_linenumber) is NOT unique in the synthetic data, so the summand
    * itself is the final sort key: rows tied on the full key then contribute
    * equal increments and the prefix sums are order-independent. */
  def windowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "lineitem")
      .select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        sum(dec2(col("l_extendedprice"))).over(w).cast("double").as("running_rev"))
  }

  val windowRunningSql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) OVER (
      |    PARTITION BY l_suppkey
      |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_rev
      |FROM lineitem""".stripMargin

  /** Top-K: Catalyst compiles orderBy+limit to TakeOrderedAndProject —
    * no global sort, each partition keeps K rows then the driver merges. */
  def topK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .limit(10)

  val topKSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin

  /** Set operations: INTERSECT / EXCEPT (distinct set semantics) composed
    * into one labeled result. */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val building = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val bigSpenders = t(s, dir, "orders")
      .filter(col("o_totalprice") > 200000)
      .select(col("o_custkey").as("custkey")).distinct()
    building.intersect(bigSpenders).withColumn("op", lit("both"))
      .union(building.except(bigSpenders).withColumn("op", lit("building_only")))
      .union(bigSpenders.except(building).withColumn("op", lit("spender_only")))
  }

  val setOpsSql: String =
    """WITH b AS (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
      |     s AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000)
      |SELECT custkey, 'both' AS op FROM (SELECT custkey FROM b INTERSECT SELECT custkey FROM s)
      |UNION ALL
      |SELECT custkey, 'building_only' AS op FROM (SELECT custkey FROM b EXCEPT SELECT custkey FROM s)
      |UNION ALL
      |SELECT custkey, 'spender_only' AS op FROM (SELECT custkey FROM s EXCEPT SELECT custkey FROM b)""".stripMargin

  /** Dynamic multi-dimensional statistics, dims chosen at request time
    * (doc-03.md:86) — flat mode over two order dimensions. */
  def dynamicStats(s: SparkSession, dir: String): DataFrame =
    graft.relational.DynamicStats.stats(
      t(s, dir, "orders"),
      Seq("o_orderstatus", "o_orderpriority"),
      Seq(
        graft.relational.DynamicStats.Measure("revenue", sumMoney(col("o_totalprice"))),
        graft.relational.DynamicStats.Measure("avg_price", avgMoney(col("o_totalprice"))),
        graft.relational.DynamicStats.Measure("n", count(lit(1)))))

  val dynamicStatsSql: String =
    s"""SELECT o_orderstatus, o_orderpriority,
       |  ${sqlSumMoney("o_totalprice")} AS revenue,
       |  ${sqlAvgMoney("o_totalprice")} AS avg_price,
       |  COUNT(*) AS n
       |FROM orders GROUP BY o_orderstatus, o_orderpriority""".stripMargin

  /** Scalar function library over codegen'd built-ins (dates, strings,
    * math) — the reference reaches these via poly/Slick (doc-01.md:107). */
  def scalarFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("yr"),
      month(col("o_orderdate")).cast("long").as("mth"),
      upper(substring(col("o_orderpriority"), 3, 20)).as("prio"),
      length(col("o_orderstatus")).cast("long").as("status_len"),
      floor(col("o_totalprice")).as("price_floor"),
      concat(lit("order-"), col("o_orderkey")).as("tag"))

  val scalarFuncsSql: String =
    """SELECT o_orderkey,
      |  CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
      |  CAST(MONTH(o_orderdate) AS BIGINT) AS mth,
      |  UPPER(SUBSTRING(o_orderpriority, 3, 20)) AS prio,
      |  CAST(LENGTH(o_orderstatus) AS BIGINT) AS status_len,
      |  CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
      |  'order-' || o_orderkey AS tag
      |FROM orders""".stripMargin

  /** Date/time scalar-function surface: truncation, month arithmetic with
    * end-of-month clamping, day diffs, Monday-based weekday, quarter and
    * date construction — the calendar half of the scalar tier
    * ([[scalarFuncs]] covers the string/numeric half). Engine-parity
    * notes: Spark's `weekday` (0 = Monday) is DuckDB's `isodow - 1`;
    * `add_months` and `date + INTERVAL` share Postgres end-of-month
    * clamping; everything is computed on DATE (the timestamp column is
    * midnight-valued UTC, [[graft.Tables]] guards the session zone). */
  def datetimeFuncs(s: SparkSession, dir: String): DataFrame = {
    val d = to_date(col("o_orderdate"))
    t(s, dir, "orders").select(
      col("o_orderkey"),
      trunc(d, "month").as("month_start"),
      add_months(d, 3).as("plus3m"),
      last_day(d).as("month_end"),
      datediff(d, lit("1995-01-01").cast("date")).cast("long").as("days_since"),
      weekday(d).cast("long").as("dow_mon0"),
      quarter(d).cast("long").as("qtr"),
      make_date(year(d) + 1, lit(1), lit(1)).as("next_jan1"))
  }

  val datetimeFuncsSql: String =
    """SELECT o_orderkey,
      |  date_trunc('month', CAST(o_orderdate AS DATE)) AS month_start,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
      |  CAST(isodow(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS dow_mon0,
      |  CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS qtr,
      |  make_date(YEAR(o_orderdate) + 1, 1, 1) AS next_jan1
      |FROM orders""".stripMargin

  /** Per-group outlier detection WITHOUT floating point: |x−μ| > 1.5σ
    * decided as 4·(n·x − S)² > 9·(n·SS − S²) — all integer-cents decimal
    * arithmetic (μ and σ never materialize, no sqrt, no doubles), so the
    * verdict is EXACT and engine-identical. The group stats are a
    * broadcast (one row per return flag); the verdict rides the scan
    * projection. The z-score-outlier sweep a feature-QA pass runs, in the
    * engine's bit-exact house style. */
  def outliers(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_returnflag").as("flag"),
      (dec2(col("l_extendedprice")) * 100).cast(DecimalType(38, 0)).as("c"))
    val stats = li.groupBy(col("flag")).agg(
      count(lit(1)).cast(DecimalType(38, 0)).as("n"),
      sum(col("c")).cast(DecimalType(38, 0)).as("s"),
      sum(col("c") * col("c")).cast(DecimalType(38, 0)).as("ss"))
    val dev = col("n") * col("c") - col("s")
    li.join(broadcast(stats), "flag")
      .select(col("flag"),
        (lit(4) * dev * dev > lit(9) * (col("n") * col("ss") - col("s") * col("s")))
          .as("is_out"))
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("is_out"), 1L).otherwise(0L)).as("n_outliers"))
  }

  /** Mirrors [[outliers]] in HUGEINT (exact to 1.7e38; the products top
    * out near 1e24): same cents quantization, same no-sqrt inequality. The
    * 1.5σ band is non-vacuous on the uniform synthetic prices (a 3σ band
    * catches nothing under max |z| = √3). */
  val outliersSql: String =
    """WITH c AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS HUGEINT) AS c
      |  FROM lineitem),
      |st AS (
      |  SELECT flag, CAST(COUNT(*) AS HUGEINT) AS n,
      |    CAST(SUM(c) AS HUGEINT) AS s, CAST(SUM(c * c) AS HUGEINT) AS ss
      |  FROM c GROUP BY flag)
      |SELECT c.flag, COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN 4 * (st.n * c.c - st.s) * (st.n * c.c - st.s)
      |         > 9 * (st.n * st.ss - st.s * st.s) THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM c JOIN st USING (flag) GROUP BY c.flag""".stripMargin

  /** Declarative data-quality expectations over lineitem
    * ([[graft.operators.Expectations.check]]): range, enum membership, completeness in ONE aggregation pass, plus a
    * key-uniqueness check — a mix chosen so the report contains real
    * violations (the synthetic (l_orderkey, l_linenumber) is NOT unique,
    * and the tight discount bound fails on purpose), proving the counts
    * are measured, not vacuous. */
  def expectations(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Expectations._
    check(t(s, dir, "lineitem"), Seq(
      Satisfies("qty_in_range", col("l_quantity") >= 1 && col("l_quantity") <= 50),
      Satisfies("tax_range", col("l_tax") >= 0 && col("l_tax") <= 0.08),
      Satisfies("returnflag_enum", col("l_returnflag").isin("A", "N", "R")),
      Satisfies("discount_tight", col("l_discount") <= 0.05),
      NotNull("orderkey_notnull", "l_orderkey"),
      Unique("pk_unique", Seq("l_orderkey", "l_linenumber"))))
  }

  val expectationsSql: String =
    """SELECT 'qty_in_range' AS check_name, COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN NOT coalesce(l_quantity BETWEEN 1 AND 50, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
      |  SUM(CASE WHEN NOT coalesce(l_quantity BETWEEN 1 AND 50, FALSE) THEN 1 ELSE 0 END) = 0 AS pass
      |FROM lineitem
      |UNION ALL
      |SELECT 'tax_range', COUNT(*),
      |  CAST(SUM(CASE WHEN NOT coalesce(l_tax BETWEEN 0 AND 0.08, FALSE) THEN 1 ELSE 0 END) AS BIGINT),
      |  SUM(CASE WHEN NOT coalesce(l_tax BETWEEN 0 AND 0.08, FALSE) THEN 1 ELSE 0 END) = 0
      |FROM lineitem
      |UNION ALL
      |SELECT 'returnflag_enum', COUNT(*),
      |  CAST(SUM(CASE WHEN NOT coalesce(l_returnflag IN ('A','N','R'), FALSE) THEN 1 ELSE 0 END) AS BIGINT),
      |  SUM(CASE WHEN NOT coalesce(l_returnflag IN ('A','N','R'), FALSE) THEN 1 ELSE 0 END) = 0
      |FROM lineitem
      |UNION ALL
      |SELECT 'discount_tight', COUNT(*),
      |  CAST(SUM(CASE WHEN NOT coalesce(l_discount <= 0.05, FALSE) THEN 1 ELSE 0 END) AS BIGINT),
      |  SUM(CASE WHEN NOT coalesce(l_discount <= 0.05, FALSE) THEN 1 ELSE 0 END) = 0
      |FROM lineitem
      |UNION ALL
      |SELECT 'orderkey_notnull', COUNT(*),
      |  CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) = 0
      |FROM lineitem
      |UNION ALL
      |SELECT 'pk_unique', CAST(SUM(n) AS BIGINT),
      |  CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT),
      |  SUM(CASE WHEN n > 1 THEN n ELSE 0 END) = 0
      |FROM (SELECT COUNT(*) AS n FROM lineitem GROUP BY l_orderkey, l_linenumber)""".stripMargin

  /** Typed UDAF (Aggregator with map-side partial merge): quantity-weighted
    * average price per return flag, integer-cents buffer for bit-exactness. */
  def udafWavg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        graft.functions.Aggregators
          .weightedAvgCol(col("l_extendedprice"), col("l_quantity")).as("wavg_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  val udafWavgSql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(4,0))) AS DOUBLE)
      |    / SUM(l_quantity) AS wavg_price,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Exact percentiles (sort-based, interpolated) — matches DuckDB's
    * quantile_cont bit-for-bit (verified incl. interpolated values).
    * Round 7: computed by the DISTRIBUTED rank-select operator
    * ([[graft.relational.Percentiles.exactInterpolated]]) instead of the
    * builtin `percentile` aggregate, whose buffer holds every group
    * member in memory with no spill path — the exact tier now has a
    * 100 TB shape too (the GK twin remains the cheap path). Same doubles
    * bit-for-bit (PercentilesSpec asserts ≡ builtin ≡ oracle). */
  def percentiles(s: SparkSession, dir: String): DataFrame =
    graft.relational.Percentiles.exactInterpolated(
      t(s, dir, "lineitem"), "l_returnflag",
      Seq(
        ("l_quantity", 0.5, "qty_p50"),
        ("l_quantity", 0.9, "qty_p90"),
        ("l_extendedprice", 0.25, "price_p25")))
      .orderBy(col("l_returnflag"))

  val percentilesSql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS qty_p50,
      |  quantile_cont(l_quantity, 0.9) AS qty_p90,
      |  quantile_cont(l_extendedprice, 0.25) AS price_p25
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Rank-error budget of the [[percentilesApprox]] sketch: observed rank
    * within ±1/accuracy of the requested percentile (Greenwald-Khanna
    * guarantee). Shared with SketchSpec's bound assertion. */
  val PercentileAccuracy: Int = 10000

  /** Sketch twin of [[percentiles]] — the 100 TB scale path. The exact
    * operator materializes the group's rank space via a spillable sort
    * (fine, but a full extra exchange); `approx_percentile` keeps a
    * bounded mergeable Greenwald-Khanna summary with rank error ≤
    * n/[[PercentileAccuracy]], so group state no longer grows with group
    * size. Raw sketch VALUES, for SketchSpec's band assertions; the gate
    * ([[percentilesApprox]]) replaces them with rank-verified verdicts. */
  def percentilesApproxValues(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr(s"approx_percentile(l_quantity, 0.5, $PercentileAccuracy)").as("qty_p50"),
        expr(s"approx_percentile(l_quantity, 0.9, $PercentileAccuracy)").as("qty_p90"),
        expr(s"approx_percentile(l_extendedprice, 0.25, $PercentileAccuracy)").as("price_p25"))
      .orderBy(col("l_returnflag"))

  /** Gate form of [[percentilesApproxValues]] — oracle-exact (round 8).
    * The GK guarantee is about RANK, not value: the sketch returns an
    * actual group member whose rank is within n/accuracy of the target
    * p·n. So the gate VERIFIES exactly that, in-plan: broadcast the tiny
    * per-group sketch row back into the lineitem scan, count members
    * strictly below / at-or-below each returned value (the value's
    * feasible rank interval [lt+1, le]), and demand that interval
    * intersect [p·n − slack, p·n + slack] with slack = n/accuracy + 1
    * (one rank absorbs the floor/ceil convention). A violated bound
    * aborts via `raise_error` rather than emitting `false`, so the
    * hashed output is fully DuckDB-computable: the group key, the exact
    * group count, and three literal-TRUE verdicts. The sketch values
    * themselves stay in [[percentilesApproxValues]] + SketchSpec.
    * Scale shape: one extra pass over lineitem against a broadcast
    * 3-row aggregate — no new shuffle of the fact table. */
  def percentilesApprox(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
    val sketch = percentilesApproxValues(s, dir)
    val counted = li.join(broadcast(sketch), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("l_quantity") < col("qty_p50"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("l_quantity") <= col("qty_p50"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("l_quantity") < col("qty_p90"), 1L).otherwise(0L)).as("lt90"),
        sum(when(col("l_quantity") <= col("qty_p90"), 1L).otherwise(0L)).as("le90"),
        sum(when(col("l_extendedprice") < col("price_p25"), 1L).otherwise(0L)).as("lt25"),
        sum(when(col("l_extendedprice") <= col("price_p25"), 1L).otherwise(0L)).as("le25"))
    def verdict(name: String, p: Double, lt: Column, le: Column): Column = {
      val n = col("n").cast("double")
      val slack = n / lit(PercentileAccuracy.toDouble) + lit(1.0)
      val target = lit(p) * n
      val ok = (lt.cast("double") + lit(1.0) <= target + slack) &&
        (le.cast("double") >= target - slack)
      when(ok, lit(true))
        .otherwise(raise_error(concat(
          lit(s"GK rank bound violated for $name in flag "), col("l_returnflag"),
          lit(": feasible ranks ["), (lt + lit(1L)).cast("string"),
          lit(","), le.cast("string"),
          lit("] vs target "), target.cast("string"),
          lit(" +- "), slack.cast("string"))))
        .as(name)
    }
    counted.select(
      col("l_returnflag"), col("n"),
      verdict("p50_ok", 0.5, col("lt50"), col("le50")),
      verdict("p90_ok", 0.9, col("lt90"), col("le90")),
      verdict("p25_ok", 0.25, col("lt25"), col("le25")))
      .orderBy(col("l_returnflag"))
  }

  val percentilesApproxSql: String =
    """SELECT l_returnflag, COUNT(*) AS n, TRUE AS p50_ok, TRUE AS p90_ok,
      |  TRUE AS p25_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Generator/UDTF surface: explode documents into tokens, global top-20
    * token frequencies (deterministic tie-break). */
  def explodeTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(20)

  val explodeTokensSql: String =
    """SELECT token, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |GROUP BY token ORDER BY n DESC, token ASC LIMIT 20""".stripMargin

  /** Backward as-of join: each purchase event aligned with the user's most
    * recent click at-or-before it (DuckDB's native ASOF JOIN is the oracle). */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    graft.relational.AsOfJoin.asofBackward(
      purchases, clicks, Seq("user_id"), "ts", "click_ts",
      rightPayload = Seq("click_id", "click_ts"),
      rightTieBreak = Seq("click_id")) // deterministic under equal timestamps
  }

  val asofJoinSql: String =
    """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |           FROM events WHERE event_type = 'purchase'),
      |     c AS (SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS click_ts
      |           FROM events WHERE event_type = 'click')
      |SELECT p.event_id, p.user_id, p.ts,
      |       c.click_id AS asof_click_id, c.click_ts AS asof_click_ts
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.click_ts""".stripMargin

  /** Interval join via time bucketing: clicks of the same user within ±30
    * minutes of each purchase, counted per purchase (zero-match purchases
    * kept with 0). */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val pairs = graft.relational.RangeJoin.withinTolerance(
      purchases, clicks, Seq("user_id"), "ts", "click_ts",
      toleranceSec = 1800, rightPayload = Seq("click_id"))
    val counts = pairs.groupBy(col("event_id"))
      .agg(count(lit(1)).as("__n"))
    purchases.join(counts, Seq("event_id"), "left_outer")
      .select(col("event_id"), col("user_id"),
        coalesce(col("__n"), lit(0L)).as("n_nearby"))
  }

  val rangeJoinSql: String =
    """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |           FROM events WHERE event_type = 'purchase'),
      |     c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
      |           FROM events WHERE event_type = 'click')
      |SELECT p.event_id, p.user_id, CAST(COALESCE(x.cnt, 0) AS BIGINT) AS n_nearby
      |FROM p LEFT JOIN (
      |  SELECT p.event_id AS eid, COUNT(*) AS cnt
      |  FROM p JOIN c ON p.user_id = c.user_id
      |    AND abs(epoch_us(p.ts) - epoch_us(c.ts)) <= 1800000000
      |  GROUP BY 1) x ON x.eid = p.event_id""".stripMargin

  /** Post-aggregation filter (HAVING): customers with 3+ orders over 100k. */
  def havingAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_totalprice") > 100000)
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_big"),
        sumMoney(col("o_totalprice")).as("total"))
      .filter(col("n_big") >= 3)

  val havingAggSql: String =
    s"""SELECT o_custkey, COUNT(*) AS n_big, ${sqlSumMoney("o_totalprice")} AS total
       |FROM orders WHERE o_totalprice > 100000
       |GROUP BY o_custkey HAVING COUNT(*) >= 3""".stripMargin

  /** Pivot (wide-form dynamic statistics): quantity by line status across
    * return flags as columns — `sum(CASE WHEN…)` per flag in the oracle. */
  def pivotAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(col("l_quantity")))
      .orderBy(col("l_linestatus"))

  val pivotAggSql: String =
    """SELECT l_linestatus,
      |  SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS A,
      |  SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS N,
      |  SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS R
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** Semi-structured JSON column access (the reference's Map[String,Json]
    * cells, Sample07.scala:98-105, as a scan-side primitive): extract a
    * field from the events props JSON and aggregate it. */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("k")).cast("long").as("sum_k"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  val jsonExtractSql: String =
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      |  COUNT(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Tumbling event-time window aggregation (micro-truncated nanos). */
  def eventsWindow(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sumMoney(col("value")).as("total_value"))
      .orderBy(col("hour"), col("event_type"))

  val eventsWindowSql: String =
    s"""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
       |  COUNT(*) AS n, ${sqlSumMoney("value")} AS total_value
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Gap-based sessionization (30-min inactivity) with window functions —
    * the batch twin of the streaming session operator. Gap math is integer
    * microseconds on both engines so boundaries agree exactly. */
  def sessionize(s: SparkSession, dir: String): DataFrame =
    sessionizeOver(t(s, dir, "events"))

  /** The sessionizer over ANY events-shaped frame (user_id, event_id, ts)
    * — single-sourced so the flat gate and the day-partitioned-layout gate
    * ([[eventsPartitioned]]) can never test different gap semantics. */
  private[graft] def sessionizeOver(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1).otherwise(0))
      .withColumn("sess", sum(col("new_s")).over(cum))
      .groupBy(col("user_id"), col("sess"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Shared CTE prefix of the two sessionization oracles: ONE definition of
    * the 30-minute gap rule and the (ts, event_id) tie-break, so the batch
    * and streaming gate queries can never silently test different
    * semantics. */
  private def sessionizeCtesFrom(sourceCtes: String): String =
    s"""WITH $sourceCtes,
       |g AS (SELECT *, CASE WHEN prev_us IS NULL
       |                       OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_s
       |      FROM (SELECT *, LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us FROM e)),
       |s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess FROM g)""".stripMargin

  private val sessionizeCtes: String = sessionizeCtesFrom(
    "e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events)")

  val sessionizeSql: String =
    s"""$sessionizeCtes
       |SELECT user_id, CAST(sess AS BIGINT) AS sess,
       |       MIN(ts) AS session_start, MAX(ts) AS session_end,
       |       COUNT(*) AS n_events
       |FROM s GROUP BY user_id, sess""".stripMargin

  /** [[sessionizeSql]] without the internal session ordinal — the streaming
    * sessionizer identifies sessions by (user, start, end), not by index. */
  val streamSessionizeSql: String =
    s"""$sessionizeCtes
       |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       |       COUNT(*) AS n_events
       |FROM s GROUP BY user_id, sess""".stripMargin

  /** Z-order layout gate ([[graft.plans.Layout]]): lineitem is written
    * z-ordered on (l_partkey, l_suppkey) into range-partitioned files,
    * read BACK from disk, and the interleaved key recomputed over the
    * round-tripped rows — so the hash check pins the quantize/interleave
    * math AND the written artifact. The layout property itself (per-file
    * hypercube locality, second-dimension row-group skipping) is pinned
    * in LayoutSpec where file boundaries are observable. */
  def zorderLayout(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val out = java.nio.file.Files.createTempDirectory("graft_zorder")
    try {
      val dims = Seq("l_partkey", "l_suppkey")
      val ranges = graft.plans.Layout.zorderWrite(li, dims, out.toString, numFiles = 8)
      s.read.parquet(out.toString)
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.plans.Layout.zValue(dims, ranges).as("zval"))
        .orderBy(col("zval"), col("l_orderkey"), col("l_linenumber"))
        .limit(100)
        .graftCheckpoint()
    } finally graft.plans.CorpusExport.deleteRecursively(out.toFile)
  }

  /** Mirrors [[zorderLayout]]: integer floor-div quantization to 16 bits
    * per dimension, bit i of dim d at key bit 2i+d. */
  val zorderLayoutSql: String =
    """WITH r AS (
      |  SELECT min(l_partkey) AS pmn, max(l_partkey) AS pmx,
      |         min(l_suppkey) AS smn, max(l_suppkey) AS smx FROM lineitem),
      |q AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CASE WHEN pmx = pmn THEN 0
      |         ELSE ((l_partkey - pmn) * 65535) // (pmx - pmn) END AS qp,
      |    CASE WHEN smx = smn THEN 0
      |         ELSE ((l_suppkey - smn) * 65535) // (smx - smn) END AS qs
      |  FROM lineitem CROSS JOIN r)
      |SELECT l_orderkey, l_linenumber,
      |  CAST(list_sum(list_transform(range(0, 16), i ->
      |    (((qp >> i) & 1) << (2*i)) + (((qs >> i) & 1) << (2*i + 1))))
      |    AS BIGINT) AS zval
      |FROM q
      |ORDER BY zval, l_orderkey, l_linenumber LIMIT 100""".stripMargin

  /** Day-partitioned events layout gate ([[graft.plans.EventsLayout]]):
    * events are written hive-partitioned by UTC event date, then the
    * flagship sessionizer runs over a TWO-DAY probe window read from that
    * layout — the date predicate binds as `PartitionFilters`, so only the
    * probed days' files are read (EventsLayoutSpec pins the pruning and
    * the file counts; this gate pins the ANSWER against DuckDB's
    * date-filtered replay over the flat table). The probe window is
    * derived from the data (min event date + 1, two days wide) via one
    * bounded 1-row action, so the gate self-scales to any fixture. */
  def eventsPartitioned(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val out = java.nio.file.Files.createTempDirectory("graft_events_days")
    try {
      graft.plans.EventsLayout.writePartitionedByDay(ev, out.toString)
      val d0 = ev.agg(min(to_date(col("ts")))).head().getDate(0).toLocalDate
      val probe = graft.plans.EventsLayout.readDayWindow(
        s, out.toString, d0.plusDays(1), days = 2)
      sessionizeOver(probe).graftCheckpoint()
    } finally graft.plans.CorpusExport.deleteRecursively(out.toFile)
  }

  /** Oracle of the exactly-once streaming JDBC sink gate: the sunk
    * table's per-type counts and id sums must equal the source events
    * exactly — the gate REDELIVERS batch 0 through the commit path, so
    * a broken ledger skip doubles every figure here and mismatches. */
  val streamJdbcSinkSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |       CAST(SUM(event_id) AS BIGINT) AS id_sum
      |FROM events GROUP BY event_type""".stripMargin

  /** Mirrors [[eventsPartitioned]]: the same sessionize CTEs over the
    * date-bounded slice — partition pruning is an EXECUTION strategy, so
    * the oracle expresses the probe as a plain date filter. */
  val eventsPartitionedSql: String =
    sessionizeCtesFrom(
      """md AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events),
        |e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events CROSS JOIN md
        |      WHERE CAST(ts AS DATE) >= d0 + 1 AND CAST(ts AS DATE) < d0 + 3)""".stripMargin) +
      """
        |SELECT user_id, CAST(sess AS BIGINT) AS sess,
        |       MIN(ts) AS session_start, MAX(ts) AS session_end,
        |       COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sess""".stripMargin

  /** RANGE-frame sliding window: per event, the count and exact money sum
    * of the SAME user's events in the preceding hour — a time-range frame
    * (all rows within the interval, however many), which a ROWS frame
    * cannot express. The frame bound is integer microseconds on both
    * engines, and ties (equal order values) are in-frame by RANGE
    * semantics identically, so the gate is hash-exact. */
  def windowRange(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600L * 1000000, 0)
    t(s, dir, "events").select(
      col("user_id"), col("event_id"),
      count(lit(1)).over(w).as("n_1h"),
      sum(dec2(col("value"))).over(w).cast("double").as("v_1h"))
  }

  val windowRangeSql: String =
    """SELECT user_id, event_id,
      |  COUNT(*) OVER w AS n_1h,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS v_1h
      |FROM events
      |WINDOW w AS (
      |  PARTITION BY user_id
      |  ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin

  /** Conversion-window microseconds of the [[funnel]] gate: each stage must
    * land within 24h of the previous one or the user drops out. */
  val FunnelWindowUs: Long = 24L * 3600 * 1000 * 1000

  /** Ordered-funnel conversion over the events stream: users who signed up,
    * then clicked within [[FunnelWindowUs]] AFTER signing up, then
    * purchased within the window after that click — each stage the
    * min-timestamp qualifying event. Gap math is integer microseconds on
    * both engines (the sessionize discipline), so stage membership is
    * exact. Three user-keyed min-aggregations chained by co-partitioned
    * joins (every shuffle is on user_id, so AQE plans one exchange per
    * stage and the stage tables shrink monotonically); the final counts
    * are three 1-row aggregates unioned with stage literals. */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    def stage(typ: String) = ev.filter(col("event_type") === typ)
      .select(col("user_id"), col("ts"))
    def within(prev: String) = {
      val gap = unix_micros(col("ts")) - unix_micros(col(prev))
      gap > 0 && gap <= FunnelWindowUs
    }
    val signup = stage("signup").groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val click = stage("click").join(signup, "user_id")
      .filter(within("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val purchase = stage("purchase").join(click, "user_id")
      .filter(within("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    signup.agg(count(lit(1)).as("n_users")).select(lit("1_signup").as("stage"), col("n_users"))
      .unionAll(click.agg(count(lit(1)).as("n_users"))
        .select(lit("2_click").as("stage"), col("n_users")))
      .unionAll(purchase.agg(count(lit(1)).as("n_users"))
        .select(lit("3_purchase").as("stage"), col("n_users")))
  }

  val funnelSql: String = {
    def gap(prev: String) =
      s"epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us($prev)"
    s"""WITH s1 AS (
       |  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t1 FROM events
       |  WHERE event_type = 'signup' GROUP BY user_id),
       |s2 AS (
       |  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t2
       |  FROM events e JOIN s1 ON e.user_id = s1.user_id
       |  WHERE e.event_type = 'click'
       |    AND ${gap("s1.t1")} > 0 AND ${gap("s1.t1")} <= $FunnelWindowUs
       |  GROUP BY e.user_id),
       |s3 AS (
       |  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t3
       |  FROM events e JOIN s2 ON e.user_id = s2.user_id
       |  WHERE e.event_type = 'purchase'
       |    AND ${gap("s2.t2")} > 0 AND ${gap("s2.t2")} <= $FunnelWindowUs
       |  GROUP BY e.user_id)
       |SELECT '1_signup' AS stage, COUNT(*) AS n_users FROM s1
       |UNION ALL SELECT '2_click', COUNT(*) FROM s2
       |UNION ALL SELECT '3_purchase', COUNT(*) FROM s3""".stripMargin
  }

  /** Cohort retention: users grouped by first-activity date, distinct
    * active users counted per (cohort, day-offset) cell — the standard
    * retention triangle. Two user-keyed aggregations and one join, all
    * shuffles on user_id; the triangle itself is a (cohort, offset)-keyed
    * distinct count that partial-aggregates map-side. */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val cohort = ev.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_date"))
    val activity = ev.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    activity.join(cohort, "user_id")
      .groupBy(col("cohort_date"),
        datediff(col("d"), col("cohort_date")).as("day_offset"))
      .agg(count_distinct(col("user_id")).as("n_active"))
  }

  val cohortRetentionSql: String =
    """WITH c AS (
      |  SELECT user_id, MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS cohort_date
      |  FROM events GROUP BY user_id),
      |a AS (
      |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events)
      |SELECT c.cohort_date,
      |  CAST(date_diff('day', c.cohort_date, a.d) AS INT) AS day_offset,
      |  COUNT(DISTINCT a.user_id) AS n_active
      |FROM a JOIN c ON a.user_id = c.user_id
      |GROUP BY 1, 2""".stripMargin

  /** Per-user daily time grid with forward fill: daily activity rolled up,
    * the missing days of each user's [first, last] span generated in-plan
    * (`sequence` + explode — per-user bounded, never a global calendar
    * join), and the last seen daily total carried forward across the gaps.
    * The fill is a running `last(ignoreNulls)` window — state is one value
    * per partition, and every shuffle is on user_id. */
  def gapFill(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val daily = ev.groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n_events"), sumMoney(col("value")).as("v"))
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("d"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "d"), "left")
      .select(col("user_id"), col("d"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("v"), ignoreNulls = true).over(w).as("v_fill"))
  }

  val gapFillSql: String =
    s"""WITH daily AS (
       |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
       |    COUNT(*) AS n_events, ${sqlSumMoney("value")} AS v
       |  FROM events GROUP BY 1, 2),
       |grid AS (
       |  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS d
       |  FROM (SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY user_id))
       |SELECT g.user_id, g.d,
       |  COALESCE(daily.n_events, 0) AS n_events,
       |  last_value(daily.v IGNORE NULLS) OVER (
       |    PARTITION BY g.user_id ORDER BY g.d
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill
       |FROM grid g LEFT JOIN daily ON daily.user_id = g.user_id AND daily.d = g.d""".stripMargin

  val q1AggSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  SUM(l_quantity) AS sum_qty,
       |  ${sqlSumMoney("l_extendedprice")} AS sum_base_price,
       |  CAST(SUM(${sqlDec2("l_extendedprice")} * (${sqlRate("1")} - ${sqlRate("l_discount")})) AS DOUBLE) AS sum_disc_price,
       |  CAST(SUM(${sqlDec2("l_extendedprice")} * (${sqlRate("1")} - ${sqlRate("l_discount")}) * (${sqlRate("1")} + ${sqlRate("l_tax")})) AS DOUBLE) AS sum_charge,
       |  AVG(l_quantity) AS avg_qty,
       |  ${sqlAvgMoney("l_extendedprice")} AS avg_price,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
