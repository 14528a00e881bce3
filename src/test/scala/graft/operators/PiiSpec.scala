package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PiiSpec extends SparkTestBase {

  import spark.implicits._

  private def scanOne(text: String) = {
    val r = Pii.scan(Seq((1L, text)).toDF("id", "t"), col("id"), col("t")).head()
    (r.getLong(1), r.getLong(2), r.getLong(3))
  }

  private def redactOne(text: String): String =
    Seq((1L, text)).toDF("id", "t")
      .select(Pii.redact(col("t")).as("red")).head().getString(0)

  test("counts each category, multiple and adjacent matches") {
    assert(scanOne("a@b.com and c.d-e@f.org.uk end") == (2L, 0L, 0L))
    assert(scanOne("(555) 123-4567 (555) 000-1111") == (0L, 2L, 0L))
    assert(scanOne("10.0.0.1 192.168.255.254") == (0L, 0L, 2L))
    assert(scanOne("no pii at all") == (0L, 0L, 0L))
  }

  test("redaction masks every category in order") {
    assert(redactOne("mail a@b.co ip 10.0.0.1 tel (555) 123-4567 x") ==
      "mail <EMAIL> ip <IP> tel <PHONE> x")
    // email domain absorbs its dots before the IP pass can see them
    assert(redactOne("x user@host.example.com y") == "x <EMAIL> y")
    assert(redactOne("clean text stays untouched") == "clean text stays untouched")
  }

  test("scan reports redacted length and fingerprint consistent with redact") {
    val df = Seq((7L, "a@b.com at 10.1.2.3")).toDF("id", "t")
    val row = Pii.scan(df, col("id"), col("t")).head()
    val red = redactOne("a@b.com at 10.1.2.3")
    assert(red == "<EMAIL> at <IP>")
    assert(row.getLong(4) == red.length.toLong)
    val expectedFp = df.sparkSession.sql(
      s"SELECT graft_fingerprint64('$red')").head().getLong(0)
    assert(row.getLong(5) == expectedFp)
  }

  test("scan runs in one projection with the replace chain aliased once") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Pii.scan(docs, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    // three regexp_replace total (one chain), not six (chain duplicated
    // into the length and fingerprint derivations)
    val n = "regexp_replace".r.findAllIn(plan).length
    assert(n == 3, s"expected 3 regexp_replace occurrences, got $n\n${plan.take(3000)}")
  }
}
