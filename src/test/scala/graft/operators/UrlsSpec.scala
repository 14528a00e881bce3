package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Urls.canonicalize]]: each RFC 3986 / crawl-convention rule on
  * hand-built URLs, idempotence, and the gate's collapse behavior. */
class UrlsSpec extends SparkTestBase {

  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Urls.canonicalize(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("scheme/host case, www, default port, fragment, trailing slash") {
    assert(canon("HTTPS://WWW.Example.COM:443/a/b/#frag")
      === Seq("https://example.com/a/b"))
    assert(canon("http://example.com:80/x") === Seq("http://example.com/x"))
    // non-default ports survive; https does not excuse :80
    assert(canon("http://example.com:8080/x") === Seq("http://example.com:8080/x"))
    assert(canon("https://example.com:80/x") === Seq("https://example.com:80/x"))
  }

  test("query: utm_* stripped, params sorted, empty query dropped") {
    assert(canon("http://h.com/p?utm_source=feed&b=2&a=1")
      === Seq("http://h.com/p?a=1&b=2"))
    assert(canon("http://h.com/p?utm_source=x&utm_campaign=y")
      === Seq("http://h.com/p"))
    assert(canon("http://h.com/p?") === Seq("http://h.com/p"))
  }

  test("path: repeated slashes collapse, bare host canonicalizes to no path") {
    assert(canon("http://h.com//a///b/") === Seq("http://h.com/a/b"))
    assert(canon("http://h.com/") === Seq("http://h.com"))
    assert(canon("http://h.com") === Seq("http://h.com"))
  }

  test("canonicalization is idempotent") {
    val messy = Seq(
      "HTTPS://WWW.Example.COM:443/a//b/?utm_source=f&z=9&a=0#frag",
      "http://h.com:8080//x/?b=2&a=1")
    val once = canon(messy: _*)
    assert(canon(once: _*) === once)
  }

  test("designed variants collapse: slash/port/utm/fragment mods share a canonical") {
    assert(canon(
      "https://www.h.com:443/p/1?utm_source=feed&a=2",
      "https://h.com/p/1/?a=2&utm_campaign=x",
      "https://H.COM/p/1?a=2#sec3").distinct.size === 1)
  }

  test("host report: covers every doc, keep accounting is consistent per host") {
    val rows = graft.queries.LlmOps.hostReport(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === 500L)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_keep") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_urls") <= r.getAs[Long]("n_docs"))
      val rate = r.getAs[Double]("keep_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(rate == r.getAs[Long]("n_keep").toDouble / r.getAs[Long]("n_docs").toDouble)
    }
    // the verdicts vary by host (the report is a decision table, not a constant)
    assert(rows.map(_.getAs[Double]("keep_rate")).distinct.length > 1)
  }

  test("gate: keeps one keeper per canonical and covers every doc") {
    val df = graft.queries.LlmOps.urlCanonicalize(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.map(_.getString(0)).distinct.length === rows.length)
    assert(rows.map(_.getAs[Long]("n_copies")).sum === 500L)
    assert(rows.exists(_.getAs[Long]("n_copies") > 1), "variants must collide")
    rows.foreach { r =>
      assert(r.getAs[String]("host") ==
        r.getString(0).replaceAll("^https?://", "").replaceAll("[/:?].*$", ""))
    }
  }
}
