package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Host-level (provenance-level) quality gating — the RefinedWeb/C4 move
 * of scoring documents individually but GATING at the host/site/feed
 * granularity: a spam network's individual pages each look
 * borderline-acceptable to per-document filters, while the host-level
 * mean exposes the farm. Flags the bottom `bottomFrac` tail of hosts by
 * mean document quality; every document of a flagged host is gated.
 *
 * Scale shape: per-host stats are ONE map-side-combinable keyed
 * aggregation; the tail flag needs a GLOBAL rank over hosts, which at
 * crawl scale is ~10⁸ rows — an unpartitioned `row_number` window would
 * funnel them through one task, so the rank is `Ids.denseIds` (two-phase
 * distributed rank, no single-partition stage) and the host count joins
 * back as a broadcast 1-row scalar. Selection is rank-based
 * (`rank < ⌈frac·H⌉` under the total order (mean, host)), never a
 * float-threshold comparison — no epsilon boundary for an oracle to
 * disagree on.
 *
 * Hosts must be non-null (coalesce upstream): engines order NULL keys
 * differently, and a null host is a data bug, not a tail host.
 */
object HostCuration {

  /** Per-host gate table: (hostCol, n_docs, mean_quality, flagged) —
    * `flagged` marks the bottom `bottomFrac` of hosts ranked by
    * (mean_quality asc, host asc); mean_quality is rounded to 1e-6
    * BEFORE ranking so the order is engine-reproducible. NULL qualities
    * are ignored by the mean but still counted in n_docs. */
  def hostQualityGate(docs: DataFrame, hostCol: String, qualityCol: String,
                      bottomFrac: Double): DataFrame = {
    require(bottomFrac > 0.0 && bottomFrac < 1.0, "bottomFrac must be in (0, 1)")
    val stats = docs.groupBy(col(hostCol))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col(qualityCol)), 6).as("mean_quality"))
    val ranked = Ids.denseIds(stats,
      Seq(col("mean_quality").asc, col(hostCol).asc), "__rk")
    val total = stats.agg(count(lit(1)).as("__h"))
    ranked.crossJoin(broadcast(total))
      .select(col(hostCol), col("n_docs"), col("mean_quality"),
        (col("__rk") < ceil(lit(bottomFrac) * col("__h"))).as("flagged"))
  }

  /** Drop every document of a flagged host. The flagged set is a small
    * projection of the gate table — AQE broadcasts the anti-join when it
    * fits; at worst it is a keyed shuffle on the host. */
  def gateDocs(docs: DataFrame, gate: DataFrame, hostCol: String): DataFrame =
    docs.join(gate.where(col("flagged")).select(col(hostCol)),
      Seq(hostCol), "left_anti")
}
