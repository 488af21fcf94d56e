package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Crawl-frontier politeness scheduling — the step after the robots gate
 * (`Robots`): a crawler may hit one host only every `delayMs`, so the
 * frontier's per-host queue becomes (slot, fetch_at_ms) assignments in
 * priority order. Deterministic: slot is the 0-based `row_number` over
 * (priority DESC, url ASC) within the host — re-running on the same
 * frontier reproduces the same schedule, and two engines agree on it
 * (the tie-break is total).
 *
 * Scale shape: ONE host-keyed window. Politeness is inherently
 * per-host-sequential — the window partition IS the semantic unit, and
 * its size is the per-host frontier depth (what `maxPerHost` caps:
 * real crawlers bound per-host queues precisely so hot hosts cannot
 * monopolize the fetch fleet — and so this window stays bounded).
 */
object Frontier {

  /** Adds (slot, fetch_at_ms) per host in priority order; rows beyond
    * `maxPerHost` (if set) are dropped — the budget face. */
  def schedule(frontier: DataFrame, delayMs: Long,
               maxPerHost: Option[Long] = None,
               hostCol: String = "host", priCol: String = "priority",
               urlCol: String = "url"): DataFrame = {
    require(delayMs >= 0, "delayMs must be non-negative")
    val w = Window.partitionBy(col(hostCol))
      .orderBy(col(priCol).desc, col(urlCol))
    val s = frontier
      .withColumn("slot", (row_number().over(w) - 1).cast("long"))
      .withColumn("fetch_at_ms", col("slot") * delayMs)
    maxPerHost.map(m => s.where(col("slot") < m)).getOrElse(s)
  }
}
