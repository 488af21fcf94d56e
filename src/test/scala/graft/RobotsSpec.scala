package graft

import org.apache.spark.sql.functions._
import graft.operators.Robots

/** robots.txt parse + precedence witnesses (RFC 9309 core). */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val body =
    """# global comment
      |User-agent: fancybot
      |Disallow: /
      |
      |User-agent: extra
      |User-agent: *
      |Disallow: /private
      |Allow: /private/ok
      |Allow: /tie
      |Disallow: /tie
      |Disallow:
      |Crawl-delay: 10
      |Sitemap: https://a.com/s.xml
      |""".stripMargin

  private def rules = Robots.parseRules(
    Seq(("a.com", body)).toDF("host", "body"))

  test("parseRules keeps only generic-agent groups, drops empty Disallow and unknown fields") {
    val got = rules.select("allow", "path").as[(Boolean, String)]
      .collect().toSet
    got shouldBe Set(
      (false, "/private"), (true, "/private/ok"),
      (true, "/tie"), (false, "/tie"))
    // fancybot's Disallow: / must NOT leak into the * group
  }

  test("evaluate: longest match wins, Allow wins ties, no rule means allowed") {
    val frontier = Seq(
      ("u1", "a.com", "/private/ok/page"), // Allow /private/ok (longer) beats Disallow /private
      ("u2", "a.com", "/private/secret"),  // only Disallow matches
      ("u3", "a.com", "/public"),          // no rule
      ("u4", "a.com", "/tie/x"),           // equal-length Allow + Disallow -> Allow
      ("u5", "b.com", "/private/secret"))  // unknown host: no rules at all
      .toDF("url", "host", "path")
    val got = Robots.evaluate(frontier, rules)
      .select("url", "allowed").as[(String, Boolean)].collect().toMap
    got shouldBe Map(
      "u1" -> true, "u2" -> false, "u3" -> true, "u4" -> true, "u5" -> true)
  }

  test("a User-agent line after rules starts a new group") {
    val b =
      """User-agent: *
        |Disallow: /a
        |User-agent: fancybot
        |Disallow: /b
        |""".stripMargin
    val r = Robots.parseRules(Seq(("h", b)).toDF("host", "body"))
      .select("path").as[String].collect().toSeq
    r shouldBe Seq("/a") // /b belongs to the NEW fancybot-only group
  }

  test("rules before any User-agent line are invalid and ignored") {
    val b = "Disallow: /orphan\nUser-agent: *\nDisallow: /x\n"
    Robots.parseRules(Seq(("h", b)).toDF("host", "body"))
      .select("path").as[String].collect().toSeq shouldBe Seq("/x")
  }
}
