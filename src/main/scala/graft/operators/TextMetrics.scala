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
    // ONE evaluation of the caller's pair plan, width-gated spread (r13):
    // the gram explodes are the hot map stages — a single-split input
    // (one collected fixture file) would run them on one task — and the
    // cand/ref/ids consumers would otherwise re-evaluate the input 3×.
    val p = graft.core.Caches.cacheOnce(graft.core.Spread.byKey(
      pairs.select(col(idCol), col(candCol), col(refCol)), col(idCol)))
    def gramCounts(c: String, cnt: String): DataFrame = {
      val tk = tokensWs(col(c))
      p.select(col(idCol),
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
    p.select(col(idCol)).distinct()
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

  /**
   * Per-pair BLEU with brevity penalty (Papineni et al. 2002, "BLEU: a
   * Method for Automatic Evaluation of Machine Translation") — the MT
   * gate the curation loop's bitext tier feeds, beside [[rougeN]]'s
   * recall-oriented face:
   *
   *   p_k  = Σ_g min(cnt_cand(g), cnt_ref(g)) / Σ_g cnt_cand(g)
   *          (clipped modified precision per n-gram order k = 1..n)
   *   BP   = 1 if c > r else exp(1 − r/c)   (c, r = token lengths)
   *   BLEU = BP · exp(Σ_k ln p_k / n)
   *
   * Unsmoothed: any p_k = 0 (or a candidate shorter than n tokens, or
   * empty) scores 0 — the convention the uniform-weight geometric mean
   * forces. Every ratio is exact-integer longs; only the final
   * ln/exp/÷ run in binary64, 1e-6-rounded.
   *
   * Relational shape (one pass for ALL orders): each side explodes once
   * to (pair, k, gram) rows — k = 1..n from a single nested transform,
   * so cost is n·grams with no per-order rescan — the multisets align
   * on a (pair, k, gram)-keyed full-outer join, one aggregate per
   * (pair, k) clips, one per pair folds the geometric mean. No UDFs, no
   * driver loops.
   *
   * Output: (idCol, c_len, r_len, bp, p_1..p_n, bleu), doubles rounded
   * 1e-6; p_k = 0.0 when the candidate has no order-k grams.
   */
  def bleuN(pairs: DataFrame, n: Int, idCol: String = "pair_id",
            candCol: String = "cand", refCol: String = "ref"): DataFrame = {
    require(n >= 1, "bleuN: n must be >= 1")
    // same one-evaluation + width-gated-spread stance as rougeN (r13)
    val p = graft.core.Caches.cacheOnce(graft.core.Spread.byKey(
      pairs.select(col(idCol), col(candCol), col(refCol)), col(idCol)))
    val emptyGrams = array().cast("array<struct<k:int,gram:string>>")
    def gramCounts(c: String, cnt: String): DataFrame = {
      val tk = tokensWs(col(c))
      val all = concat((1 to n).map { k =>
        when(size(tk) < k, emptyGrams)
          .otherwise(transform(sequence(lit(1), size(tk) - (k - 1)),
            i => struct(lit(k).as("k"),
              concat_ws(" ", slice(tk, i, lit(k))).as("gram"))))
      }: _*)
      p.select(col(idCol), explode(all).as("kg"))
        .select(col(idCol), col("kg.k").as("k"), col("kg.gram").as("gram"))
        .groupBy(col(idCol), col("k"), col("gram"))
        .agg(count(lit(1)).as(cnt))
    }
    val perK = gramCounts(candCol, "cc")
      .join(gramCounts(refCol, "rc"), Seq(idCol, "k", "gram"), "full_outer")
      .groupBy(col(idCol), col("k"))
      .agg(
        sum(least(coalesce(col("cc"), lit(0L)), coalesce(col("rc"), lit(0L))))
          .as("ov"),
        sum(coalesce(col("cc"), lit(0L))).as("ct"))
      .where(col("ct") > 0L) // reference-only grams don't define a p_k
    val pkCols = (1 to n).map { k =>
      max(when(col("k") === k,
        round(col("ov").cast("double") / col("ct").cast("double"), 6)))
        .as(s"p_$k")
    }
    val foldExprs = Seq(
      sum(when(col("ov") > 0L,
        log(col("ov").cast("double") / col("ct").cast("double")))).as("sl"),
      count(when(col("ov") > 0L, lit(1))).as("kpos")) ++ pkCols
    val folded = perK.groupBy(col(idCol))
      .agg(foldExprs.head, foldExprs.tail: _*)
    val lens = p.select(col(idCol),
      size(tokensWs(col(candCol))).cast("long").as("c_len"),
      size(tokensWs(col(refCol))).cast("long").as("r_len"))
    val bp = when(col("c_len") === 0L, 0.0)
      .when(col("c_len") > col("r_len"), 1.0)
      .otherwise(exp(lit(1.0) -
        col("r_len").cast("double") / col("c_len").cast("double")))
    lens.join(folded, Seq(idCol), "left")
      .select(Seq(col(idCol), col("c_len"), col("r_len"),
        round(bp, 6).as("bp")) ++
        (1 to n).map(k => coalesce(col(s"p_$k"), lit(0.0)).as(s"p_$k")) ++
        Seq(round(when(col("c_len") === 0L ||
            coalesce(col("kpos"), lit(0L)) < n, 0.0)
          .otherwise(bp * exp(col("sl") / n)), 6).as("bleu")): _*)
  }

  /**
   * Per-pair chrF (Popović 2015, "chrF: character n-gram F-score for
   * automatic MT evaluation") — the tokenization-free member of the
   * metric trio (ROUGE recall-oriented, BLEU precision-oriented, chrF
   * character-level): whitespace strips entirely, both sides explode to
   * CHARACTER n-grams for every order 1..n, per-order clipped precision
   * P_k and recall R_k average into P̄/R̄, and
   *
   *   chrF_β = (1 + β²)·P̄·R̄ / (β²·P̄ + R̄)   (β = 2 favors recall)
   *
   * Closed-form conventions (deterministic, engine-portable): an order
   * with no candidate grams contributes P_k = 0; no reference grams,
   * R_k = 0; both averages always divide by n; chrF = 0 when the
   * denominator is 0. All gram counts exact longs.
   *
   * Shape mirrors [[bleuN]]: one (pair, k, gram) explode per side (all
   * orders in one pass), a keyed full-outer join, one aggregate per
   * (pair, k), one per pair. Output: (idCol, precision, recall, chrf),
   * 1e-6-rounded.
   */
  def chrF(pairs: DataFrame, n: Int, beta: Double = 2.0,
           idCol: String = "pair_id", candCol: String = "cand",
           refCol: String = "ref"): DataFrame = {
    require(n >= 1, "chrF: n must be >= 1")
    require(beta > 0, "chrF: beta must be positive")
    // same one-evaluation + width-gated-spread stance as rougeN (r13);
    // chrF explodes CHAR grams (≈ 4× the token-gram row count), so the
    // single-task explode was the whole wall (measured: q241 two ~10 s
    // one-task stages at sf0.1)
    val p = graft.core.Caches.cacheOnce(graft.core.Spread.byKey(
      pairs.select(col(idCol), col(candCol), col(refCol)), col(idCol)))
    val emptyGrams = array().cast("array<struct<k:int,gram:string>>")
    def gramCounts(c: String, cnt: String): DataFrame = {
      val s = regexp_replace(col(c), "\\s+", "")
      val all = concat((1 to n).map { k =>
        when(length(s) < k, emptyGrams)
          .otherwise(transform(sequence(lit(1), length(s) - (k - 1)),
            i => struct(lit(k).as("k"), s.substr(i, lit(k)).as("gram"))))
      }: _*)
      p.select(col(idCol), explode(all).as("kg"))
        .select(col(idCol), col("kg.k").as("k"), col("kg.gram").as("gram"))
        .groupBy(col(idCol), col("k"), col("gram"))
        .agg(count(lit(1)).as(cnt))
    }
    val perK = gramCounts(candCol, "cc")
      .join(gramCounts(refCol, "rc"), Seq(idCol, "k", "gram"), "full_outer")
      .groupBy(col(idCol), col("k"))
      .agg(
        sum(least(coalesce(col("cc"), lit(0L)), coalesce(col("rc"), lit(0L))))
          .as("ov"),
        sum(coalesce(col("cc"), lit(0L))).as("ct"),
        sum(coalesce(col("rc"), lit(0L))).as("rt"))
    val folded = perK.groupBy(col(idCol))
      .agg(
        (sum(when(col("ct") > 0L,
          col("ov").cast("double") / col("ct").cast("double"))
          .otherwise(lit(0.0))) / n).as("pbar"),
        (sum(when(col("rt") > 0L,
          col("ov").cast("double") / col("rt").cast("double"))
          .otherwise(lit(0.0))) / n).as("rbar"))
    val b2 = beta * beta
    val den = lit(b2) * col("pbar") + col("rbar")
    p.select(col(idCol)).distinct()
      .join(folded, Seq(idCol), "left")
      .select(col(idCol),
        round(coalesce(col("pbar"), lit(0.0)), 6).as("precision"),
        round(coalesce(col("rbar"), lit(0.0)), 6).as("recall"),
        round(coalesce(
          when(den === 0.0, 0.0)
            .otherwise(lit(1.0 + b2) * col("pbar") * col("rbar") / den),
          lit(0.0)), 6).as("chrf"))
  }
}
