package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental model maintenance — the operational gap the reference never
 * closes: `/root/reference/propius/similarity.py:92-117` rebuilds the whole
 * model from the full occurrence log on every ingest. This engine's
 * sufficient-statistics core is ADDITIVE, so appending new occurrences
 * costs one aggregate over the DELTA plus merges against persisted
 * summaries — never a rescan of the occurrence history.
 *
 * The persisted state is the `Stats` snapshot:
 *
 *  - `cells` — the sparse crosstab (item, ctx, cnt): cell counts add, so
 *    `Crosstab.merge(base, delta)` IS the update (cells are the one
 *    summary the co-moment update must consult, see below);
 *  - `items` — per-item (sx, sxx);
 *  - `co` — upper-triangle pair co-moments (item_a, item_b, sxy);
 *  - `n` — the 1-row context count.
 *
 * Why the update is O(delta), not O(history): a new occurrence only
 * changes statistics through the CONTEXTS it touches. For every context
 * absent from the delta, its cells, its item-stat contributions, and its
 * pair products are untouched. So the update
 *
 *  1. semi-joins the base cell summary down to the delta's context set
 *     (`touched` — |delta contexts| × avg degree rows, independent of
 *     history size),
 *  2. recomputes item stats and co-moments over `merged = touched ∪ delta`
 *     and over `touched` alone, and
 *  3. folds `base + (merged − touched)` — every sum is an exact integer
 *     in binary64, so the merged statistics are BIT-IDENTICAL to a full
 *     rebuild over the unioned history (gated by q53 against the
 *     full-rebuild oracle, and by the randomized battery in
 *     `IncrementalSpec`).
 *
 * The expensive quadratic step — the ctx self-join behind `sxy` — runs
 * only over delta-context cells. The base OCCURRENCE LOG appears nowhere
 * in the update plan (spec-guarded); the base cell/stat SUMMARIES are
 * scanned once each, and they are orders of magnitude smaller than the
 * history (distinct cells vs raw events). At 100 TB: persist `Stats` as
 * parquet after each ingest; the daily update reads yesterday's summaries
 * + today's events only.
 */
object Incremental {

  /** Additive sufficient-statistics snapshot. All four tables are plain
    * DataFrames — persist them with `save` / any writer and read back to
    * resume; nothing here executes until an action. */
  final case class Stats(cells: DataFrame, items: DataFrame,
                         co: DataFrame, n: DataFrame)

  /** Build a snapshot from an occurrence log (the from-scratch path —
    * what the reference does on EVERY ingest; here it runs once). */
  def fromOccurrences(occ: DataFrame): Stats = fromCells(Crosstab.build(occ))

  /** Build a snapshot from an existing crosstab cell table. */
  def fromCells(cells0: DataFrame): Stats = {
    val cells = Caches.cacheOnce(cells0) // feeds three aggregations
    Stats(cells, Correlation.itemStats(cells),
      Correlation.sparseCoMoments(cells), Correlation.nContexts(cells))
  }

  /** Apply a delta occurrence log to a base snapshot. */
  def update(base: Stats, deltaOcc: DataFrame): Stats =
    updateCells(base, Crosstab.build(deltaOcc))

  /** Apply a delta CELL table (a crosstab of the new occurrences only). */
  def updateCells(base: Stats, deltaCells0: DataFrame): Stats = {
    val deltaCells = Caches.cacheOnce(deltaCells0)
    val dctx = deltaCells.select("ctx").distinct()

    // Base summary pruned to the touched contexts: the only base rows any
    // recomputation below ever reads.
    val touched = Caches.cacheOnce(
      base.cells.join(dctx, Seq("ctx"), "left_semi"))
    val merged = Caches.cacheOnce(Crosstab.merge(touched, deltaCells))

    // Item stats: sxx is NOT additive across overlapping cells
    // ((c₁+c₂)² ≠ c₁²+c₂²), so recompute the touched contribution and fold
    // base + add − sub. Three integer-valued rows per item — exact.
    val addI = Correlation.itemStats(merged)
    val subI = Correlation.itemStats(touched)
    val items = base.items
      .unionByName(addI)
      .unionByName(subI.select(col("item"),
        (-col("sx")).as("sx"), (-col("sxx")).as("sxx")))
      .groupBy("item")
      .agg(sum(col("sx")).as("sx"), sum(col("sxx")).as("sxx"))

    // Pair co-moments: the same add − sub fold. Every pair in `sub` has
    // base co-occurrence (it is in base.co), and a pair only in `add` has
    // positive net weight, so no spurious zero rows can appear.
    val addC = Correlation.sparseCoMoments(merged)
    val subC = Correlation.sparseCoMoments(touched)
    val co = base.co
      .unionByName(addC)
      .unionByName(subC.select(col("item_a"), col("item_b"), (-col("sxy")).as("sxy")))
      .groupBy("item_a", "item_b")
      .agg(sum(col("sxy")).as("sxy"))

    // Context count: + contexts the corpus has never seen.
    val freshCtx = dctx
      .join(base.cells.select("ctx").distinct(), Seq("ctx"), "left_anti")
      .agg(count(lit(1)).cast("double").as("dn"))
    val n = base.n.crossJoin(freshCtx).select((col("n") + col("dn")).as("n"))

    // New cell summary for the NEXT update: untouched base cells + merged.
    // Lazy — consumers that only read `pairs` never execute this branch.
    val cells = base.cells.join(dctx, Seq("ctx"), "left_anti").unionByName(merged)

    Stats(cells, items, co, n)
  }

  /** Correlation pairs from a snapshot — identical arithmetic (and
    * therefore identical binary64 output) to `Correlation.sparsePairs`
    * over the equivalent full crosstab. */
  def pairs(stats: Stats): DataFrame =
    Correlation.pairsFromStats(stats.items, stats.co, stats.n)

  /** Persist a snapshot as four parquet tables under `path`. */
  def save(stats: Stats, path: String): Unit = {
    stats.cells.write.mode("overwrite").parquet(s"$path/cells")
    stats.items.write.mode("overwrite").parquet(s"$path/items")
    stats.co.write.mode("overwrite").parquet(s"$path/co")
    stats.n.write.mode("overwrite").parquet(s"$path/n")
  }

  /** Load a snapshot persisted by `save`. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Stats =
    Stats(spark.read.parquet(s"$path/cells"), spark.read.parquet(s"$path/items"),
      spark.read.parquet(s"$path/co"), spark.read.parquet(s"$path/n"))
}
