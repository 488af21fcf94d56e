package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * robots.txt evaluation — the crawl-pipeline gate between URL
 * canonicalization (`UrlFunctions`) and fetch: every production crawler
 * filters its frontier through per-host robots rules before spending a
 * request. Implements the de-facto standard (RFC 9309) for the
 * wildcard-free core every robots.txt uses:
 *
 *   - group structure: one or more `User-agent:` lines introduce a
 *     group; the `Allow:`/`Disallow:` rules that follow (until the next
 *     group) belong to every agent named above them. Only groups
 *     containing `*` apply here (we crawl as the generic agent).
 *   - precedence: the MOST SPECIFIC (longest-path) matching rule wins;
 *     on a length tie, Allow wins. No matching rule ⇒ allowed.
 *   - `Disallow:` with an empty path matches nothing (explicitly
 *     allowed-all, per the RFC).
 *   - comments (`#…`) strip; field names are case-insensitive;
 *     unknown fields (Crawl-delay, Sitemap) are ignored.
 *
 * Dataflow is fully relational — no UDFs, every step replayable in
 * ANSI SQL: robots bodies split to lines (posexplode keeps order),
 * group membership is a running `max` window over `User-agent` marker
 * lines keyed by host (robots files are a few KB — the window
 * partitions by host and is bounded by file line count, never corpus
 * size), the frontier joins its host's rule table on host + `startsWith`
 * (a broadcast join when the rule table fits — rule tables saturate:
 * hosts × a handful of rules), and the winner is one min(struct(...))
 * aggregate encoding (longest, Allow-first) order.
 */
object Robots {

  /** Parse per-host robots.txt bodies into the generic-agent rule table:
    * (host, allow: boolean, path). Input: (hostCol, bodyCol). */
  def parseRules(robots: DataFrame, hostCol: String = "host",
                 bodyCol: String = "body"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = robots
      .select(col(hostCol).as("host"),
        posexplode(split(col(bodyCol), "\n")).as(Seq("lineno", "raw")))
      // strip comments + whitespace; robots fields are `Name: value`
      .select(col("host"), col("lineno"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .where(col("line") =!= "")
      .select(col("host"), col("lineno"),
        lower(trim(regexp_extract(col("line"), "^([^:]+):", 1))).as("field"),
        trim(regexp_extract(col("line"), "^[^:]+:(.*)$", 1)).as("value"))
    // group id = line number of the group's FIRST User-agent line. A
    // User-agent line directly following rules starts a NEW group; one
    // following another User-agent line extends the same group.
    val w = Window.partitionBy(col("host")).orderBy(col("lineno"))
    val withPrev = lines
      .withColumn("prev_field", lag(col("field"), 1).over(w))
      .withColumn("grp_start",
        when(col("field") === "user-agent" &&
          (col("prev_field").isNull || col("prev_field") =!= "user-agent"),
          col("lineno")))
      .withColumn("grp", last(col("grp_start"), ignoreNulls = true).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("grp").isNotNull)
    // groups that name the generic agent
    val starGroups = withPrev
      .where(col("field") === "user-agent" && col("value") === "*")
      .select(col("host"), col("grp")).distinct()
    withPrev
      .where(col("field").isin("allow", "disallow"))
      .join(starGroups, Seq("host", "grp"))
      // empty-path Disallow matches nothing — drop it here; an empty
      // Allow is equally vacuous under longest-match
      .where(col("value") =!= "")
      .select(col("host"), (col("field") === "allow").as("allow"),
        col("value").as("path"))
  }

  /** Gate a frontier (urlCol + hostCol + pathCol) against the rule
    * table: adds `allowed` (no matching rule ⇒ true; else longest rule,
    * Allow on ties). */
  def evaluate(frontier: DataFrame, rules: DataFrame,
               hostCol: String = "host", pathCol: String = "path",
               idCol: String = "url"): DataFrame = {
    val r = rules.select(col("host").as("__rhost"), col("allow"),
      col("path").as("rule_path"))
    val matched = frontier
      .join(broadcast(r),
        col(hostCol) === col("__rhost") &&
          col(pathCol).startsWith(col("rule_path")), "left")
      .drop("__rhost")
    // winner per url: longest rule_path, Allow first on ties — encoded
    // so min(struct) picks it: (-len, !allow, rule_path)
    matched
      .groupBy(col(idCol), col(hostCol), col(pathCol))
      .agg(min(when(col("rule_path").isNotNull,
        struct((-length(col("rule_path"))).as("neglen"),
          (!col("allow")).as("dis"), col("rule_path").as("p"))))
        .as("w"))
      .select(col(idCol), col(hostCol), col(pathCol),
        coalesce(!col("w").getField("dis"), lit(true)).as("allowed"))
  }
}
