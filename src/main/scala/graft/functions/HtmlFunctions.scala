package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * HTML boilerplate extraction — jusText-lite (Pomikálek 2011's block
 * model, simplified to deterministic closed-form rules): real crawl
 * pipelines start from MARKUP, while every quality operator downstream
 * (token stats, Gopher rules, LM scoring, classifiers) assumes cleaned
 * text. This is the missing front step: strip the non-content scaffold
 * (script/style/comments/head), segment the page into text blocks at
 * block-level tag boundaries, score each block by length, link density
 * (the share of its words living inside <a> elements — navigation and
 * footers are link-dense), and stopword density (natural prose carries
 * function words; tag soup, code, and keyword lists don't), and keep
 * only the content blocks.
 *
 * Everything is ONE map-only pure-Column projection (regexps + HOFs
 * over the split block array) — no UDF, no shuffle, no state: pages
 * clean at scan speed, stream unchanged, and stay inside codegen.
 * Densities round 1e-6 BEFORE thresholds (the engine's reproducible-
 * boundary convention) and every rule is replayed verbatim by the
 * DuckDB oracle (q144).
 *
 * Deliberately NOT a parser: no DOM, no entity table beyond the six
 * ubiquitous ones, no tree context (jusText's neighbor-smoothing pass
 * needs block adjacency, which the planted-fixture gate doesn't
 * exercise — a production deployment would tune thresholds per crawl
 * anyway). Malformed markup degrades gracefully: an unclosed tag just
 * shifts block boundaries.
 */
object HtmlFunctions {

  /** Block-level tags: a boundary both when opened and when closed. */
  val BlockTagPattern: String =
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|br|table|tr|td|th|blockquote|section|" +
      "article|header|footer|nav|aside|body|html)\\b[^>]*>"

  private val AnchorPattern = "(?is)<a\\b[^>]*>(.*?)</a>"

  /** Remove the non-content scaffold wholesale: comments first (they may
    * wrap anything), then script/style bodies, then the whole head
    * (title/meta/style live there; none of it is page text). */
  def stripScaffold(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(c,
      "(?s)<!--.*?-->", " "),
      "(?is)<script\\b[^>]*>.*?</script>", " "),
      "(?is)<style\\b[^>]*>.*?</style>", " "),
      "(?is)<head\\b[^>]*>.*?</head>", " ")

  /** Replace every remaining tag with a space (inline tags separate
    * words: "a<br>b" must not fuse). */
  def stripTags(c: Column): Column = regexp_replace(c, "<[^>]+>", " ")

  /** The six ubiquitous entities; `&amp;` LAST so "&amp;lt;" decodes to
    * the literal "&lt;" its author wrote, never twice to "<". Literal
    * `replace`, not regexp — identical semantics, no pattern machinery
    * in the per-block hot path. */
  def decodeEntities(c: Column): Column =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(c) { case (acc, (k, v)) => replace(acc, lit(k), lit(v)) }

  private def normWs(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  /** Tag-strip + entity-decode + whitespace-normalize: block → text. */
  def blockText(c: Column): Column = normWs(decodeEntities(stripTags(c)))

  private def wordsOf(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /**
   * Per-block stats of an HTML page: array of (text, n_words,
   * link_density, stop_density, content). `link_density` = words inside
   * <a> elements / total words; `stop_density` = stopword tokens (after
   * stripping non-alphabetic edges) / total words; both NULL when the
   * block has no words, rounded 1e-6 before the thresholds. A block is
   * CONTENT iff n_words ≥ minWords AND link_density ≤ maxLinkDensity
   * AND stop_density ≥ minStopDensity (NULL densities fail — no words,
   * no evidence).
   */
  def htmlBlocks(c: Column, minWords: Int = 5,
                 maxLinkDensity: Double = 0.2,
                 minStopDensity: Double = 0.02,
                 stopwords: Seq[String] = TextFunctions.Stopwords): Column = {
    // STAGED transforms, one per cost tier: higher-order functions are
    // interpreted (no codegen subexpression elimination), so a Column
    // tree referenced twice inside one lambda EVALUATES twice — naming
    // each expensive value as a struct field of its own stage makes
    // every regex pass run exactly once per block (measured 7× on the
    // planted-page bench before staging).
    val blocks = split(stripScaffold(c), BlockTagPattern)
    // tier 1: the per-block regex work — text extraction + anchor words
    // (summed as longs, never via string concat: an empty anchor list
    // must count 0, not NULL)
    val s1 = transform(blocks, b => struct(
      blockText(b).as("text"),
      aggregate(
        regexp_extract_all(b, lit(AnchorPattern), lit(1)),
        lit(0L),
        (acc, a) => acc + size(wordsOf(normWs(stripTags(a)))).cast("long"))
        .as("lw")))
    // tier 2: tokenize the extracted text once
    val s2 = transform(s1, s => struct(
      s.getField("text").as("text"),
      wordsOf(s.getField("text")).as("words"),
      s.getField("lw").as("lw")))
    // tier 3: per-word stopword normalization (the only remaining
    // per-token regex) over the materialized token array
    val s3 = transform(s2, s => struct(
      s.getField("text").as("text"),
      size(s.getField("words")).cast("long").as("n_words"),
      size(filter(s.getField("words"), t =>
        array_contains(typedlit(stopwords),
          regexp_replace(lower(t), "[^a-z]", "")))).cast("long").as("n_stop"),
      s.getField("lw").as("lw")))
    // tier 4: scalar arithmetic + rules (cheap to duplicate)
    transform(s3, s => {
      val n = s.getField("n_words")
      val nD = n.cast("double")
      val linkDensity = when(n === 0, lit(null).cast("double"))
        .otherwise(round(s.getField("lw").cast("double") / nD, 6))
      val stopDensity = when(n === 0, lit(null).cast("double"))
        .otherwise(round(s.getField("n_stop").cast("double") / nD, 6))
      struct(
        s.getField("text").as("text"),
        n.as("n_words"),
        linkDensity.as("link_density"),
        stopDensity.as("stop_density"),
        (n >= minWords &&
          coalesce(linkDensity <= maxLinkDensity, lit(false)) &&
          coalesce(stopDensity >= minStopDensity, lit(false))).as("content"))
    })
  }

  /** The page-level extraction: (n_blocks, n_content, content) with
    * n_blocks counting non-empty text blocks and `content` the
    * newline-joined content-block texts ('' when nothing survives).
    * ONE fold over the stats array — three separate aggregations would
    * re-evaluate the whole interpreted block pipeline three times. */
  def extractContent(c: Column, minWords: Int = 5,
                     maxLinkDensity: Double = 0.2,
                     minStopDensity: Double = 0.02,
                     stopwords: Seq[String] = TextFunctions.Stopwords): Column = {
    val stats = htmlBlocks(c, minWords, maxLinkDensity, minStopDensity, stopwords)
    aggregate(stats,
      struct(lit(0L).as("n_blocks"), lit(0L).as("n_content"),
        lit("").as("content")),
      (acc, s) => struct(
        (acc.getField("n_blocks") +
          when(s.getField("n_words") > 0, lit(1L)).otherwise(lit(0L)))
          .as("n_blocks"),
        (acc.getField("n_content") +
          when(s.getField("content"), lit(1L)).otherwise(lit(0L)))
          .as("n_content"),
        when(s.getField("content"),
          when(acc.getField("n_content") === 0, s.getField("text"))
            .otherwise(concat(acc.getField("content"), lit("\n"),
              s.getField("text"))))
          .otherwise(acc.getField("content")).as("content")))
  }
}
