package graft

import graft.functions.Urls
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.canonicalize(col("u"))).collect().map(_.getString(0)).toSeq

  test("scheme/host case, www, fragment") {
    assert(canon("HTTP://WWW.Example.COM/A/b#frag") == Seq("http://example.com/A/b"))
  }

  test("default ports drop per scheme; explicit ports survive") {
    assert(canon(
      "http://a.com:80/x", "https://a.com:443/x", "http://a.com:8080/x", "https://a.com:80/x") ==
      Seq("http://a.com/x", "https://a.com/x", "http://a.com:8080/x", "https://a.com:80/x"))
  }

  test("trailing slashes strip; bare host gets '/'") {
    assert(canon("http://a.com/x/y//", "http://a.com", "http://a.com/") ==
      Seq("http://a.com/x/y", "http://a.com/", "http://a.com/"))
  }

  test("tracking params drop, survivors sort, empty query drops '?'") {
    assert(canon(
      "http://a.com/p?utm_source=x&b=2&a=1",
      "http://a.com/p?a=1&b=2",
      "http://a.com/p?utm_campaign=z&gclid=g&fbclid=f") ==
      Seq("http://a.com/p?a=1&b=2", "http://a.com/p?a=1&b=2", "http://a.com/p"))
  }

  test("tracking-param strip is case-insensitive (r11 advice: UTM_SOURCE= variants must collapse too)") {
    assert(canon(
      "http://a.com/p?UTM_SOURCE=x&b=2&a=1",
      "http://a.com/p?FBCLID=f&a=1&b=2",
      "http://a.com/p?Gclid=g&a=1&b=2") ==
      Seq("http://a.com/p?a=1&b=2", "http://a.com/p?a=1&b=2", "http://a.com/p?a=1&b=2"))
  }

  test("null in, null out") {
    val out = Seq[Option[String]](None).toDF("u")
      .select(Urls.canonicalize(col("u"))).collect()
    assert(out.head.isNullAt(0))
  }

  test("q_url_canon collapses variants: n_raw >= n_variants >= 1 and raw count is conserved") {
    val total = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val rows = graft.queries.LlmQueries.qUrlCanon(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2) && r.getLong(2) >= 1L)
      val cu = r.getString(0)
      assert(cu.startsWith("http://") && !cu.contains("#") && !cu.contains("utm_") &&
        !cu.contains("WWW.") && !cu.contains(":80"))
    }
    // the case/www/port/slash/fragment variance must actually collapse
    // something: fewer canonical urls than raw variants overall
    assert(rows.map(_.getLong(2)).sum > rows.length)
  }
}
