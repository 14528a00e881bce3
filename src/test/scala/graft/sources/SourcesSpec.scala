package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkTestBase {

  private val base = "target/sources_test"

  test("parquet reader matches the native scan") {
    val direct = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    val viaSources = Sources.readParquet(spark, "/root/testdata/sf0.001/region.parquet")
    assert(viaSources.schema == direct.schema)
    assert(viaSources.collect().toSeq == direct.collect().toSeq)
  }

  test("csv round-trip preserves schema-on-read and values") {
    val customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    Sources.writeCsv(customer, s"$base/customer_csv")
    val back = Sources.readCsv(spark, s"$base/customer_csv", customer.schema)
    assert(back.schema == customer.schema)
    assert(back.count() == customer.count())
    val a = customer.orderBy("c_custkey").collect().map(_.toSeq)
    val b = back.orderBy("c_custkey").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("json round-trip preserves values") {
    val nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    Sources.writeJson(nation, s"$base/nation_json")
    val back = Sources.readJson(spark, s"$base/nation_json", nation.schema)
    assert(back.orderBy("n_nationkey").collect().map(_.toSeq).toSeq ==
      nation.orderBy("n_nationkey").collect().map(_.toSeq).toSeq)
  }

  test("orc round-trip preserves values; predicate pushdown reaches the ORC scan") {
    val nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    Sources.writeOrc(nation, s"$base/nation_orc")
    val back = Sources.readOrc(spark, s"$base/nation_orc")
    assert(back.orderBy("n_nationkey").collect().map(_.toSeq).toSeq ==
      nation.orderBy("n_nationkey").collect().map(_.toSeq).toSeq)
    val plan = back.filter(col("n_regionkey") === 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_regionkey"), plan)
  }

  test("partitioned parquet write prunes partitions on read") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("status", col("o_orderstatus"))
    Sources.writeParquet(orders, s"$base/orders_part", partitionBy = Seq("status"))
    val pruned = spark.read.parquet(s"$base/orders_part").filter(col("status") === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    // partition filter must land in the scan, not a post-filter
    assert(plan.contains("PartitionFilters") && plan.contains("status"), plan)
    assert(pruned.count() ==
      orders.filter(col("o_orderstatus") === "F").count())
  }

  test("commitBatchJdbc: exactly-once ledger — replay skipped, crashed staging overwritten, queries independent") {
    import spark.implicits._
    val db = s"memory:graftep${System.nanoTime()}"
    val url = s"jdbc:derby:$db;create=true"
    try {
      val b0 = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("k", "v")
      assert(Sources.commitBatchJdbc(b0, url, "tgt", "led", "q1", 0L))
      // at-least-once redelivery of batch 0: the ledger must skip it
      assert(!Sources.commitBatchJdbc(b0, url, "tgt", "led", "q1", 0L))
      assert(Sources.readJdbc(spark, url, "tgt").count() === 3L)
      // crash recovery: a previous attempt died after writing PARTIAL
      // staging for batch 1 — the replay must overwrite it, never trust
      // or append to it (name replicates the prefix+hash staging scheme)
      val stg1 = "tgt_graft_ep_" + "q1" +
        java.lang.Integer.toHexString("q1".hashCode).take(8) + "_b1"
      Seq((99L, "stale")).toDF("k", "v")
        .write.mode("overwrite").jdbc(url, stg1, new java.util.Properties())
      assert(Sources.commitBatchJdbc(
        Seq((4L, "c")).toDF("k", "v"), url, "tgt", "led", "q1", 1L))
      val rows = Sources.readJdbc(spark, url, "tgt")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows === Set((1L, "a"), (2L, "b"), (3L, "a"), (4L, "c")),
        s"stale staging leaked into the target: $rows")
      // a different query's ledger is independent — same batch id commits
      assert(Sources.commitBatchJdbc(
        Seq((5L, "d")).toDF("k", "v"), url, "tgt", "led", "q2", 1L))
      assert(Sources.readJdbc(spark, url, "tgt").count() === 5L)
      // an EMPTY batch still gets its ledger row (its redelivery could
      // otherwise carry rows and double-commit)
      assert(Sources.commitBatchJdbc(b0.limit(0), url, "tgt", "led", "q1", 2L))
      assert(!Sources.commitBatchJdbc(b0, url, "tgt", "led", "q1", 2L))
      assert(Sources.readJdbc(spark, url, "tgt").count() === 5L)
      // long queryIds sharing a prefix stay INDEPENDENT ledger keys —
      // the identity deciding skip-vs-commit is the full sanitized id
      assert(Sources.commitBatchJdbc(Seq((6L, "e")).toDF("k", "v"),
        url, "tgt", "led", "ingest_orders_eu_daily", 0L))
      assert(Sources.commitBatchJdbc(Seq((7L, "f")).toDF("k", "v"),
        url, "tgt", "led", "ingest_orders_eu_hourly", 0L))
      assert(Sources.readJdbc(spark, url, "tgt").count() === 7L)
      // no staging debris survives a completed commit
      val stray = Sources.readJdbc(spark, url,
        "(SELECT tablename FROM sys.systables WHERE tablename LIKE '%GRAFT_EP%') t")
      assert(stray.count() === 0L, stray.collect().mkString(","))
    } finally {
      try java.sql.DriverManager.getConnection(s"jdbc:derby:$db;drop=true").close()
      catch { case _: java.sql.SQLException => () }
    }
  }

  test("JDBC round-trip + CRUD on embedded Derby (the reference's DB write-back surface)") {
    import spark.implicits._
    val url = s"jdbc:derby:memory:graft${System.nanoTime()};create=true"
    val people = Seq((1L, "a", 10.5), (2L, "b", 20.5)).toDF("id", "name", "score")

    // create + read back
    Sources.writeJdbc(people, url, "people", mode = "overwrite")
    def readBack(): Seq[(Long, String, Double)] =
      Sources.readJdbc(spark, url, "people").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(readBack() == Seq((1L, "a", 10.5), (2L, "b", 20.5)))

    // INSERT (append)
    Sources.writeJdbc(Seq((3L, "c", 30.5)).toDF("id", "name", "score"), url, "people")
    assert(readBack().size == 3)

    // UPDATE-or-INSERT by key: id 2 replaced, id 4 added, others untouched
    Sources.upsertJdbc(spark,
      Seq((2L, "B", 21.0), (4L, "d", 40.5)).toDF("id", "name", "score"),
      url, "people", Seq("id"))
    assert(readBack() == Seq(
      (1L, "a", 10.5), (2L, "B", 21.0), (3L, "c", 30.5), (4L, "d", 40.5)))

    // DELETE by predicate, with count (identifiers quoted: Spark's JDBC
    // writer creates case-sensitive quoted columns)
    assert(Sources.deleteJdbc(url, "people", "\"id\" = 1") == 1)
    assert(readBack().map(_._1) == Seq(2L, 3L, 4L))

    // partitioned parallel read: N range-query partitions, same data,
    // and filters still push down into the database-side scan
    val part = Sources.readJdbcPartitioned(spark, url, "people", "id",
      lower = 0L, upper = 10L, numPartitions = 3)
    assert(part.rdd.getNumPartitions == 3)
    assert(part.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L))
    val filtered = part.filter(col("score") > 25.0)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("score"),
      s"JDBC predicate not pushed:\n$plan")
    assert(filtered.count() == 2)
  }

  test("multi-table upsert: one transaction across tables, atomic rollback on failure") {
    import spark.implicits._
    val url = s"jdbc:derby:memory:graftmulti${System.nanoTime()};create=true"
    Sources.writeJdbc(Seq((1L, "a"), (2L, "b")).toDF("id", "name"),
      url, "t_users", mode = "overwrite")
    Sources.writeJdbc(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount"),
      url, "t_accounts", mode = "overwrite")

    // one request updating BOTH tables
    Sources.upsertJdbcMulti(spark, Seq(
      ("t_users", Seq((2L, "B"), (3L, "c")).toDF("id", "name"), Seq("id")),
      ("t_accounts", Seq((2L, 21.0)).toDF("id", "amount"), Seq("id"))), url)
    val users = Sources.readJdbc(spark, url, "t_users").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val accounts = Sources.readJdbc(spark, url, "t_accounts").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(users == Seq((1L, "a"), (2L, "B"), (3L, "c")))
    assert(accounts == Seq((1L, 10.0), (2L, 21.0)))

    // a failing member (missing table) must roll the WHOLE request back:
    // t_users keeps its pre-request contents, and no staging table leaks
    val ex = intercept[Exception] {
      Sources.upsertJdbcMulti(spark, Seq(
        ("t_users", Seq((1L, "MUTATED")).toDF("id", "name"), Seq("id")),
        ("t_missing", Seq((1L, "x")).toDF("id", "name"), Seq("id"))), url)
    }
    val usersAfter = Sources.readJdbc(spark, url, "t_users").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(usersAfter == users, "partial multi-table request mutated a table")
    // the run-unique staging tables must be swept on failure
    assert(stagingTables(url).isEmpty,
      s"failed request left staging tables: ${stagingTables(url)}")
    assert(ex != null)
  }

  /** All tables whose name carries the upsert staging marker. */
  private def stagingTables(url: String): Seq[String] = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, null, "%GRAFT_STG%", null)
      val out = scala.collection.mutable.ArrayBuffer[String]()
      while (rs.next()) out += rs.getString("TABLE_NAME")
      rs.close()
      out.toSeq
    } finally conn.close()
  }

  test("upsert refuses duplicate target tables (auto-commit-DDL data-loss guard)") {
    import spark.implicits._
    val url = s"jdbc:derby:memory:graftdup${System.nanoTime()};create=true"
    Seq((1L, "a")).toDF("id", "name").write.mode("overwrite").jdbc(url, "t_d", new java.util.Properties())
    val ex = intercept[IllegalArgumentException] {
      Sources.upsertJdbcMulti(spark, Seq(
        ("t_d", Seq((1L, "x")).toDF("id", "name"), Seq("id")),
        ("t_d", Seq((1L, "y")).toDF("id", "name"), Seq("id"))), url)
    }
    assert(ex.getMessage.contains("duplicate target tables"))
  }

  test("successive upserts leave no staging tables behind (run-unique names swept)") {
    import spark.implicits._
    val url = s"jdbc:derby:memory:graftstg${System.nanoTime()};create=true"
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("overwrite").jdbc(url, "t_s", new java.util.Properties())
    Sources.upsertJdbc(spark, Seq((2L, "B2")).toDF("id", "name"), url, "t_s", Seq("id"))
    Sources.upsertJdbc(spark, Seq((3L, "c")).toDF("id", "name"), url, "t_s", Seq("id"))
    val rows = Sources.readJdbc(spark, url, "t_s").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((1L, "a"), (2L, "B2"), (3L, "c")))
    assert(stagingTables(url).isEmpty, s"stagings leaked: ${stagingTables(url)}")
  }

  test("upsert handles dotted column names (no nested-field mis-parse)") {
    import spark.implicits._
    val url = s"jdbc:derby:memory:graftdot${System.nanoTime()};create=true"
    val props = new java.util.Properties()
    // a quoted dotted column: col("user.name") would parse as field access
    Seq((1L, "a"), (2L, "b")).toDF("id", "user.name")
      .write.mode("overwrite").jdbc(url, "t_dot", props)
    Sources.upsertJdbc(spark,
      Seq((2L, "B2"), (3L, "c")).toDF("id", "user.name"), url, "t_dot", Seq("id"), props)
    val rows = Sources.readJdbc(spark, url, "t_dot").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((1L, "a"), (2L, "B2"), (3L, "c")))
  }

  test("readJsonQuarantine is idempotent for schemas already carrying _corrupt_record") {
    val dir = java.nio.file.Files.createTempDirectory("graft_quar")
    try {
      java.nio.file.Files.writeString(dir.resolve("a.jsonl"),
        "{\"id\": 1}\nnot json at all\n")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType)))
      val first = Sources.readJsonQuarantine(spark, dir.toString, schema)
      assert(first.schema.fieldNames.count(_ == "_corrupt_record") === 1)
      // re-read with the ALREADY-augmented schema: must not duplicate
      val again = Sources.readJsonQuarantine(spark, dir.toString, first.schema)
      assert(again.schema.fieldNames.count(_ == "_corrupt_record") === 1)
      // reference a data column alongside the corrupt one — the exact
      // dead-letter caveat the Scaladoc documents (corrupt-column-only
      // queries over raw JSON are disallowed by Spark)
      val rows = again.select("id", "_corrupt_record").collect()
      assert(rows.count(r => !r.isNullAt(1)) === 1)
      assert(rows.count(_.isNullAt(1)) === 1)
    } finally {
      Option(dir.toFile.listFiles()).foreach(_.foreach(f => f.delete(): Unit))
      dir.toFile.delete(): Unit
    }
  }
}
