package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextExtractSpec extends SparkTestBase {

  import spark.implicits._

  private def strip(html: String): String =
    Seq(html).toDF("h")
      .select(TextExtract.stripHtml(col("h")).as("t"))
      .head().getString(0)

  test("hand-checked page: markup gone, block boundaries become spaces") {
    val got = strip(
      "<html><head><title>My Page</title></head>" +
        "<body><h1>Hello</h1><p>world and</p><div>more</div></body></html>")
    assert(got == "My Page Hello world and more")
  }

  test("script and style CONTENT vanishes, including a bare < inside inline JS") {
    val got = strip(
      "<style>p { margin: 0; }</style><p>keep</p>" +
        "<script type=\"text/javascript\">\nvar a = 1 < 2;\nif (a) { f(); }\n</script><p>this</p>")
    assert(got == "keep this")
  }

  test("comments vanish across lines; attributes never leak") {
    val got = strip("a<!-- hidden\nlines -->b <p class=\"x\" id='y'>c</p>")
    assert(got == "a b c")
  }

  test("entities decode after tag stripping; &amp; decodes LAST (no double decode)") {
    assert(strip("1 &lt; 2 &amp;&amp; 3 &gt; 2") == "1 < 2 && 3 > 2")
    // &amp;lt; is the TEXT "&lt;", never a second-round "<"
    assert(strip("<p>literal &amp;lt; stays</p>") == "literal &lt; stays")
    assert(strip("say &quot;hi&quot;, don&#39;t shout,&nbsp;ok") ==
      "say \"hi\", don't shout, ok")
    // a decoded < is text, not markup: following words survive
    assert(strip("&lt;p&gt;not a tag&lt;/p&gt;") == "<p>not a tag</p>")
  }

  test("whitespace collapses; uppercase preserved (extraction is not normalization)") {
    assert(strip("  <p>Mixed   CASE\n\tText</p>  ") == "Mixed CASE Text")
  }

  test("stray < without a closing > survives as text") {
    assert(strip("a < b and <p>c</p>") == "a < b and c")
  }

  test("stays in whole-stage codegen: one projection, no UDF, no exchange") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(TextExtract.stripHtml(concat(lit("<p>"), col("text"), lit("</p>"))).as("t"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"projection not in WSCG:\n$plan")
    assert(!plan.contains("Exchange") && !plan.toLowerCase.contains("batchevalpython"))
    assert(df.filter(col("t").startsWith("<")).isEmpty)
  }
}
