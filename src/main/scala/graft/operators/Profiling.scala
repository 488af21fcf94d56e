package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact grouped quantiles from a value HISTOGRAM — the scale-correct
 * shape when the value domain is small relative to the data (status
 * codes, quantities, prices in cents, token counts): a naive exact
 * `percentile` drags every ROW into its group's partition (and fused
 * with other aggregates plans an Expand); here every full-data pass is
 * a map-side-combinable hash agg on (group, value), and the
 * rank/interpolation windows run over the tiny histogram. Continuous
 * interpolation (`percentile` / `quantile_cont` semantics): rank
 * r = 1 + (n−1)·p over value-ordered cumulative counts, interpolating
 * between the values at ⌊r⌋ and ⌈r⌉.
 *
 * At 100 TB: histogram size = groups × distinct values — if the value
 * domain is genuinely high-cardinality, use `percentile_approx` (the
 * q69 sketch gate measures that tradeoff); this operator is the EXACT
 * path that stays cheap when cardinality allows.
 */
object Profiling {

  /** (groupCol, p, q) for every group × requested quantile. NULL values of
    * `valCol` are ignored — `percentile` / `quantile_cont` semantics; a
    * NULL histogram row would inflate the rank denominator and shift every
    * cumulative count. A group whose values are all NULL emits no rows. */
  def histQuantiles(df: DataFrame, groupCol: String, valCol: String,
                    ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      "quantiles must be within [0, 1]")
    val hist = df.where(col(valCol).isNotNull)
      .groupBy(col(groupCol), col(valCol).cast("double").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
    hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(col(groupCol))))
      .withColumn("p", explode(array(ps.map(lit(_)): _*)))
      .withColumn("__r", lit(1.0) + (col("__n") - 1) * col("p"))
      .groupBy(col(groupCol), col("p"))
      .agg(
        min(when(col("__cum") >= floor(col("__r")), col("__v"))).as("__vlow"),
        min(when(col("__cum") >= ceil(col("__r")), col("__v"))).as("__vhigh"),
        (max(col("__r")) - floor(max(col("__r")))).as("__frac"))
      .select(col(groupCol), col("p"),
        (col("__vlow") + col("__frac") * (col("__vhigh") - col("__vlow"))).as("q"))
  }

  /**
   * Key-skew diagnosis — the measurement BEHIND every salting/AQE-skew
   * decision (`Joins.saltedEquiJoin`, `Correlation.probeSkew`'s gate):
   * one report row quantifying how unevenly a join/agg key distributes.
   *   - top1_share / topk_share: the hot key's (top-k keys') row share —
   *     what a single reducer would carry;
   *   - p99_over_p50: tail-to-median ratio of per-key counts — exact
   *     `quantile_cont` semantics, read off the SAME distributed rank
   *     the Gini pass builds (interpolation rows selected by rank — no
   *     unpartitioned window, no histogram assumption: correct even
   *     when every key has a distinct count);
   *   - gini: 0 = uniform, →1 = one key owns everything, computed from
   *     the rank identity G = 2·Σ rᵢcᵢ / (n·Σc) − (n+1)/n with rᵢ the
   *     1-based (count, key) rank via the two-phase distributed rank —
   *     no single-partition stage on the |keys|-row table.
   * All passes are keyed aggregates over (key) then (count) — the raw
   * table is scanned once.
   *
   * Output: (n_rows, n_keys, top1_share, topk_share, p99_over_p50, gini),
   * shares and ratios rounded 1e-6.
   */
  def keySkew(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK >= 1, "topK must be positive")
    val counts = graft.core.Caches.cacheOnce(
      df.groupBy(col(keyCol)).agg(count(lit(1)).as("c")))
    val totals = counts.agg(sum(col("c")).as("n_rows"),
      count(lit(1)).as("n_keys"))
    val top = counts.orderBy(col("c").desc, col(keyCol).asc).limit(topK)
      .agg(max(col("c")).as("top1"), sum(col("c")).as("topk"))
    val ranked = graft.core.Caches.cacheOnce(
      Ids.denseIds(counts, Seq(col("c").asc, col(keyCol).asc), "__r"))
    val giniNum = ranked.agg(sum((col("__r") + 1L) * col("c")).as("rc"))
    // quantile_cont over the count distribution, read off the rank:
    // r_p = 1 + (n−1)·p; interpolate between the values at ⌊r_p⌋/⌈r_p⌉
    val qs = ranked.crossJoin(broadcast(totals.select(col("n_keys").as("__n"))))
      .select(col("c").cast("double").as("cv"), (col("__r") + 1L).as("r1"),
        (lit(1.0) + (col("__n") - 1L) * 0.5).as("r50"),
        (lit(1.0) + (col("__n") - 1L) * 0.99).as("r99"))
      .where(col("r1") === floor(col("r50")) || col("r1") === ceil(col("r50")) ||
        col("r1") === floor(col("r99")) || col("r1") === ceil(col("r99")))
      .agg(
        min(when(col("r1") === floor(col("r50")), col("cv"))).as("v50lo"),
        min(when(col("r1") === ceil(col("r50")), col("cv"))).as("v50hi"),
        min(when(col("r1") === floor(col("r99")), col("cv"))).as("v99lo"),
        min(when(col("r1") === ceil(col("r99")), col("cv"))).as("v99hi"),
        min(col("r50") - floor(col("r50"))).as("f50"),
        min(col("r99") - floor(col("r99"))).as("f99"))
      .select(
        (col("v50lo") + col("f50") * (col("v50hi") - col("v50lo"))).as("p50"),
        (col("v99lo") + col("f99") * (col("v99hi") - col("v99lo"))).as("p99"))
    totals.crossJoin(broadcast(top)).crossJoin(broadcast(qs))
      .crossJoin(broadcast(giniNum))
      .select(col("n_rows"), col("n_keys"),
        round(col("top1").cast("double") / col("n_rows").cast("double"), 6)
          .as("top1_share"),
        round(col("topk").cast("double") / col("n_rows").cast("double"), 6)
          .as("topk_share"),
        round(col("p99") / col("p50"), 6).as("p99_over_p50"),
        round(lit(2.0) * col("rc").cast("double") /
          (col("n_keys") * col("n_rows")).cast("double") -
          (col("n_keys") + 1L).cast("double") / col("n_keys").cast("double"), 6)
          .as("gini"))
  }
}
