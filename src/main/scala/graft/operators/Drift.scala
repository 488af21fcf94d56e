package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distribution drift between two corpus snapshots — the population
 * stability index (PSI), the standard data-quality monitor that catches
 * "the new crawl's documents are systematically shorter/longer" class
 * regressions BEFORE they reach training.
 *
 * PSI = Σ_bins (q_i − p_i)·ln(q_i / p_i) over a fixed equi-width binning
 * (p = baseline share, q = current share). Rule-of-thumb gates: < 0.1
 * stable, 0.1–0.25 drifting, > 0.25 broken. Add-one (Laplace) smoothing
 * keeps empty bins finite and is part of the published metric's standard
 * practice.
 *
 * Scale shape: one map-side binning + hash aggregate PER SNAPSHOT (each
 * emits ≤ nBins rows), a broadcast join on the bin spine, and scalar
 * totals — cost is two scans, state is O(bins). Nothing here grows with
 * corpus size.
 */
object Drift {

  /** The equi-width bin id of `value`: ⌊value / binWidth⌋ clamped to
    * [0, nBins), NULL for NULL values. The NULL case is explicit because
    * Spark's greatest/least SKIP null arguments — a bare
    * greatest(0, floor(NULL)) yields 0, silently inflating the first PSI
    * bin with null observations instead of excluding them. NULL bins
    * drop out of both snapshots (psiFromCounts joins from the dense bin
    * spine; a NULL-keyed group matches no spine row). Map-only and
    * streaming-safe — a `readStream.groupBy` over this column is the
    * ONLINE face of the monitor (bounded state: one row per bin; the
    * spec proves stream and batch counts agree). */
  def binOf(value: Column, binWidth: Long, nBins: Int): Column =
    when(value.isNull, lit(null).cast("long"))
      .otherwise(least(lit(nBins - 1L),
        greatest(lit(0L), floor(value / binWidth).cast("long"))))

  /** Per-bin PSI decomposition of `valueCol` between `base` and `cur`:
    * (bin, n_base, n_cur, p, q, psi_contrib, psi_total), bins are
    * [i·binWidth, (i+1)·binWidth) clamped to [0, nBins), shares are
    * add-one smoothed: p_i = (n_i + 1) / (N + nBins). `psi_total` is
    * repeated on every row (the headline number riding along with its
    * decomposition). */
  def psiBins(base: DataFrame, cur: DataFrame, valueCol: String,
              binWidth: Long, nBins: Int): DataFrame = {
    require(binWidth > 0 && nBins > 0, "binWidth and nBins must be positive")
    def binned(df: DataFrame, cntName: String): DataFrame =
      df.select(binOf(col(valueCol), binWidth, nBins).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(cntName))
    psiFromCounts(binned(base, "n_base"), binned(cur, "n_cur"), nBins)
  }

  /** PSI from PRE-AGGREGATED bin counts (bin, n_base) / (bin, n_cur) —
    * the face an online monitor feeds: snapshot a streaming
    * `groupBy(binOf(...)).count()` state table against the frozen
    * baseline counts. Same spine/smoothing/decomposition as `psiBins`. */
  def psiFromCounts(b: DataFrame, c: DataFrame, nBins: Int): DataFrame = {
    val nb = b.agg(sum(col("n_base")).as("tot_base"))
    val nc = c.agg(sum(col("n_cur")).as("tot_cur"))
    val spine = b.sparkSession.range(nBins.toLong).select(col("id").as("bin"))
    val joined = spine
      .join(b, Seq("bin"), "left").join(c, Seq("bin"), "left")
      .na.fill(0L, Seq("n_base", "n_cur"))
      .crossJoin(broadcast(nb)).crossJoin(broadcast(nc))
    val p = (col("n_base") + 1.0) / (col("tot_base") + lit(nBins.toDouble))
    val q = (col("n_cur") + 1.0) / (col("tot_cur") + lit(nBins.toDouble))
    val contrib = (q - p) * log(q / p)
    val perBin = joined.select(col("bin"), col("n_base"), col("n_cur"),
      round(p, 6).as("p"), round(q, 6).as("q"),
      round(contrib, 6).as("psi_contrib"), contrib.as("__c"))
    val total = perBin.agg(sum(col("__c")).as("__t"))
    perBin.crossJoin(broadcast(total))
      .select(col("bin"), col("n_base"), col("n_cur"), col("p"), col("q"),
        col("psi_contrib"), round(col("__t"), 6).as("psi_total"))
  }

  /** Per-source KL divergence from the corpus unigram distribution —
    * the lexical drift monitor: which sources' language is furthest from
    * the corpus mixture (PSI's categorical sibling, over the open token
    * vocabulary instead of fixed numeric bins).
    *
    * Both sides are add-one smoothed over the corpus vocabulary V:
    * p_s(t) = (c_s(t)+1)/(N_s+|V|), q(t) = (c(t)+1)/(N+|V|), and
    * KL(s) = Σ_{t∈V} p_s(t)·ln(p_s(t)/q(t)).
    *
    * The sum is computed in CLOSED FORM over observed (source, token)
    * pairs only: every token a source never uses contributes the same
    * smoothing floor p0 = 1/(N_s+|V|), so the unobserved mass collapses
    * to p0·[(|V|−|V_s|)·ln p0 − (G − G_s)] with G = Σ_{t∈V} ln q(t) and
    * G_s the observed-token part. The dense source × vocabulary grid —
    * the thing that would NOT survive a 100 TB corpus with a 10M-token
    * vocabulary and thousands of sources — never materializes; cost is
    * one (source, token) aggregate plus two saturating side tables.
    * Output: (source, n_toks, n_vocab, kl), kl rounded 1e-6. */
  /**
   * Robust time-series anomaly flags by median absolute deviation — the
   * ops-monitoring face of the drift tier (PSI compares two snapshots;
   * this watches ONE series for outlier points): per series key, the
   * median of the daily values and the MAD around it, each point flagged
   * when |x − median| > k · MAD (the Hampel identifier; with k ≈ 3·1.4826
   * it matches the classic 3σ rule on Gaussian data but survives the
   * very outliers it hunts, which a mean/stddev fence does not).
   *
   * Scale shape: the input here is an already-aggregated series table
   * (key × grid rows — e.g. `resampleDailyFfill`'s output or a daily
   * count rollup), so the per-key percentile windows run over bounded
   * groups; the corpus-sized aggregation happened upstream. Zero-MAD
   * series (constant but for spikes) flag any deviation at all.
   * Output: input keys + (value, med, mad, flagged).
   */
  def madOutliers(series: DataFrame, keyCol: String, valueCol: String,
                  k: Double = 4.4478): DataFrame = {
    require(k > 0.0, "madOutliers: k must be > 0")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
    val v = col(valueCol).cast("double")
    val withMed = series.withColumn("med", percentile(v, lit(0.5)).over(w))
    val withMad = withMed.withColumn("mad",
      percentile(abs(v - col("med")), lit(0.5)).over(w))
    withMad.select(series.columns.map(col) ++ Seq(
      round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"),
      when(col("mad") === 0.0, abs(v - col("med")) > 0.0)
        .otherwise(abs(v - col("med")) > lit(k) * col("mad")).as("flagged")): _*)
  }

  def sourceTokenKl(docs: DataFrame, srcCol: String = "source",
                    textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions.tokensWs
    val toks = docs.select(col(srcCol).as("source"),
      explode(tokensWs(col(textCol))).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val corpusTotals = vocab.agg(sum(col("c")).as("n"),
      count(lit(1)).as("v"))
    val lnq = vocab.crossJoin(broadcast(corpusTotals))
      .select(col("tok"),
        log((col("c") + 1L).cast("double") /
          (col("n") + col("v")).cast("double")).as("lnq"))
    val g = lnq.agg(sum(col("lnq")).as("g"))
    val st = toks.groupBy(col("source"), col("tok")).agg(count(lit(1)).as("cs"))
    val perSource = st.groupBy(col("source")).agg(sum(col("cs")).as("n_toks"))
    val ps = (col("cs") + 1L).cast("double") /
      (col("n_toks") + col("v")).cast("double")
    val obs = st
      .join(lnq, Seq("tok"))
      .join(broadcast(perSource), Seq("source"))
      .crossJoin(broadcast(corpusTotals))
      .groupBy(col("source"), col("n_toks"), col("v"))
      .agg(count(lit(1)).as("n_vocab"),
        sum(ps * (log(ps) - col("lnq"))).as("obs_kl"),
        sum(col("lnq")).as("g_s"))
    val p0 = lit(1.0) / (col("n_toks") + col("v")).cast("double")
    obs.crossJoin(broadcast(g))
      .select(col("source"), col("n_toks"), col("n_vocab"),
        round(col("obs_kl") +
          p0 * ((col("v") - col("n_vocab")).cast("double") * log(p0) -
            (col("g") - col("g_s"))), 6).as("kl"))
  }
}
