package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokensWs

/**
 * Reference-based text overlap metrics (ROUGE-N, Lin 2004) — the
 * evaluation face of near-duplicate detection and of any
 * generate-vs-reference QA loop (summary vs source, rewrite vs
 * original, decontamination audits): per pair, the CLIPPED n-gram
 * multiset overlap — each gram counts min(cand occurrences, ref
 * occurrences) — yields precision (overlap / candidate grams), recall
 * (overlap / reference grams), and F1.
 *
 * Fully relational: both sides explode to (pair, gram, count) rows, a
 * full-outer join on (pair, gram) aligns the multisets, and one keyed
 * aggregate emits the three ratios — no per-pair UDF, no driver loops;
 * cost ∝ total grams, shuffles keyed on (pair, gram). Pairs with an
 * empty side score 0 on that side's ratio (and F1 = 0), never NULL/NaN.
 */
object TextMetrics {

  /** Per-pair ROUGE-N over a pairs frame carrying (idCol, candCol,
    * refCol) text columns. Output: (idCol, precision, recall, f1),
    * rounded 1e-6. */
  def rougeN(pairs: DataFrame, n: Int, idCol: String = "pair_id",
             candCol: String = "cand", refCol: String = "ref"): DataFrame = {
    require(n >= 1, "rougeN: n must be >= 1")
    def gramCounts(c: String, cnt: String): DataFrame = {
      val tk = tokensWs(col(c))
      pairs.select(col(idCol),
          explode(when(size(tk) < n, array().cast("array<string>"))
            .otherwise(transform(sequence(lit(1), size(tk) - (n - 1)),
              i => concat_ws(" ", slice(tk, i, lit(n)))))).as("gram"))
        .groupBy(col(idCol), col("gram"))
        .agg(count(lit(1)).as(cnt))
    }
    val gc = gramCounts(candCol, "cc")
    val gr = gramCounts(refCol, "rc")
    val scored = gc.join(gr, Seq(idCol, "gram"), "full_outer")
      .groupBy(col(idCol))
      .agg(
        sum(least(coalesce(col("cc"), lit(0L)), coalesce(col("rc"), lit(0L))))
          .as("ov"),
        sum(coalesce(col("cc"), lit(0L))).as("ct"),
        sum(coalesce(col("rc"), lit(0L))).as("rt"))
    // A pair whose candidate AND reference are both shorter than n grams
    // produces no (pair, gram) rows at all — join the scores back onto
    // the full pair-id set so such pairs surface as all-zero rows (the
    // documented contract) instead of silently vanishing.
    pairs.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("ov"), lit(0L)).as("ov"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("rt"), lit(0L)).as("rt"))
      .select(col(idCol),
        round(when(col("ct") === 0L, 0.0)
          .otherwise(col("ov").cast("double") / col("ct").cast("double")), 6)
          .as("precision"),
        round(when(col("rt") === 0L, 0.0)
          .otherwise(col("ov").cast("double") / col("rt").cast("double")), 6)
          .as("recall"),
        round(when(col("ov") === 0L, 0.0)
          .otherwise(lit(2.0) * col("ov").cast("double") /
            (col("ct") + col("rt")).cast("double")), 6)
          .as("f1"))
  }
}
