package graft

import org.apache.spark.sql.functions._
import graft.functions.UrlFunctions._

/** Rule-by-rule witnesses for crawl-frontier URL canonicalization. */
class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(canonicalUrl(col("u"))).as[String].collect().toSeq

  test("scheme and host lowercase; path keeps case") {
    canon("HTTP://WWW.Example.COM/CaseSensitive/Path") shouldBe
      Seq("http://example.com/CaseSensitive/Path")
  }

  test("default ports strip per scheme; explicit non-default ports survive") {
    canon(
      "http://a.com:80/x", "https://a.com:443/x",
      "http://a.com:8080/x", "https://a.com:80/x") shouldBe Seq(
      "http://a.com/x", "https://a.com/x",
      "http://a.com:8080/x", "https://a.com:80/x")
  }

  test("fragment drops; duplicate and trailing slashes collapse; empty path is /") {
    canon(
      "https://a.com/x//y///z/#frag", "https://a.com", "https://a.com///") shouldBe
      Seq("https://a.com/x/y/z", "https://a.com/", "https://a.com/")
  }

  test("tracking params drop parameter-exact and survivors sort") {
    canon(
      "https://a.com/x?utm_source=f&b=2&utm_campaign=c&a=1",
      "https://a.com/x?pref=keep&ref=drop",
      "https://a.com/x?gclid=g&fbclid=f",
      "https://a.com/x?UTM_SOURCE=f&a=1") shouldBe Seq(
      "https://a.com/x?a=1&b=2",
      "https://a.com/x?pref=keep",
      "https://a.com/x",
      "https://a.com/x?a=1")
  }

  test("valueless tracking params strip too; valueless content params survive") {
    canon(
      "https://a.com/x?fbclid",
      "https://a.com/x?a=1&ref",
      "https://a.com/x?flag&utm_source") shouldBe Seq(
      "https://a.com/x",
      "https://a.com/x?a=1",
      "https://a.com/x?flag")
  }

  test("two frontier spellings of one resource canonicalize equal") {
    val c = canon(
      "HTTPS://WWW.Shop.COM:443/p//1/?b=2&a=1&utm_source=mail#top",
      "https://shop.com/p/1?a=1&b=2")
    c.head shouldBe c(1)
  }

  test("urlHost extracts the canonical host") {
    Seq("HTTP://WWW.A.B.com:80/x").toDF("u")
      .select(urlHost(col("u"))).as[String].head() shouldBe "a.b.com"
  }
}
