package graft

import graft.functions.HtmlFunctions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** jusText-lite witnesses on hand-built pages: scaffold stripping,
  * entity decoding (order), the three block rules, assembly, and
  * graceful degradation on malformed markup. */
class HtmlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String, minStop: Double = 0.02): Row =
    Seq(html).toDF("h")
      .select(extractContent(col("h"), minWords = 5, maxLinkDensity = 0.2,
        minStopDensity = minStop).as("x"))
      .select("x.*").collect()(0)

  private def blocks(html: String): Seq[Row] =
    Seq(html).toDF("h")
      .select(explode(htmlBlocks(col("h"), minWords = 5, maxLinkDensity = 0.2,
        minStopDensity = 0.02)).as("b"))
      .select("b.*").collect().toSeq

  test("scaffold strips wholesale: script, style, comments, head never reach a block") {
    val page = "<html><head><title>secret title</title></head><body>" +
      "<script>var the = 1; of and to in code;</script>" +
      "<style>.the { of: and; }</style>" +
      "<!-- the hidden of and to comment -->" +
      "<p>the visible paragraph is full of plain and ordinary words</p>" +
      "</body></html>"
    val r = extract(page)
    r.getAs[Long]("n_blocks") shouldBe 1L
    r.getAs[String]("content") shouldBe
      "the visible paragraph is full of plain and ordinary words"
  }

  test("entities decode once, &amp; last: '&amp;lt;' means the literal '&lt;'") {
    val page = "<p>the cat &amp; the dog of it &lt;tag&gt; &#39;q&#39; &amp;lt; stays</p>"
    val r = extract(page)
    r.getAs[String]("content") shouldBe "the cat & the dog of it <tag> 'q' &lt; stays"
  }

  test("link-dense, short, and low-stopword blocks are boilerplate; stats are per-block") {
    val page = "<div><a href='/'>home page</a> <a href='/a'>about us</a></div>" +
      "<p>the quick brown fox jumps over the lazy dog in a field</p>" +
      "<h1>Short Head</h1>" +
      "<p>alpha beta gamma delta epsilon zeta eta theta iota kappa</p>" +
      "<div>read more <a href='/x'>click here for the full story today</a></div>"
    val bs = blocks(page).filter(_.getAs[Long]("n_words") > 0)
    bs.size shouldBe 5
    val Seq(nav, good, short, salad, mixed) = bs
    nav.getAs[Double]("link_density") shouldBe 1.0
    nav.getAs[Boolean]("content") shouldBe false
    good.getAs[Double]("link_density") shouldBe 0.0
    good.getAs[Boolean]("content") shouldBe true
    short.getAs[Long]("n_words") shouldBe 2L
    short.getAs[Boolean]("content") shouldBe false
    // 10 greek letters, zero stopwords: long and link-free but not prose
    salad.getAs[Double]("stop_density") shouldBe 0.0
    salad.getAs[Boolean]("content") shouldBe false
    // 2 of 9 words outside the anchor: 7/9 inside → over the 0.2 cap
    mixed.getAs[Double]("link_density") shouldBe 0.777778
    mixed.getAs[Boolean]("content") shouldBe false
    val r = extract(page)
    r.getAs[Long]("n_blocks") shouldBe 5L
    r.getAs[Long]("n_content") shouldBe 1L
    r.getAs[String]("content") shouldBe
      "the quick brown fox jumps over the lazy dog in a field"
  }

  test("content joins in page order with newlines; empty page and no-survivor page give ''") {
    val page = "<p>the first of the two content paragraphs is right here</p>" +
      "<ul><li>item</li></ul>" +
      "<p>and the second one follows it with more of the words</p>"
    val r = extract(page)
    r.getAs[Long]("n_content") shouldBe 2L
    r.getAs[String]("content") shouldBe
      "the first of the two content paragraphs is right here\n" +
        "and the second one follows it with more of the words"
    extract("").getAs[Long]("n_blocks") shouldBe 0L
    extract("").getAs[String]("content") shouldBe ""
    extract("<p>tiny</p>").getAs[String]("content") shouldBe ""
  }

  test("malformed markup degrades gracefully: an unclosed tag shifts boundaries, never throws") {
    val page = "<p>the start of a paragraph with plenty of honest words" + // no </p>
      "<div>and a <b>bold run that never closes in the middle of it all"
    val r = extract(page)
    r.getAs[Long]("n_blocks") shouldBe 2L
    // both halves are long, link-free, stopword-bearing prose → content
    r.getAs[Long]("n_content") shouldBe 2L
  }

  test("NULL html is null-safe (no throw); nested inline tags inside anchors count once") {
    Seq(Option.empty[String]).toDF("h")
      .select(extractContent(col("h")).as("x")).select("x.*")
      .collect()(0).isNullAt(0) shouldBe true
    // anchor words counted after stripping the nested <b>
    val bs = blocks("<div>plain words then <a href='/'>a <b>bold</b> link</a> here</div>")
    val b = bs.filter(_.getAs[Long]("n_words") > 0).head
    b.getAs[Long]("n_words") shouldBe 7L
    b.getAs[Double]("link_density") shouldBe 0.428571
  }
}
