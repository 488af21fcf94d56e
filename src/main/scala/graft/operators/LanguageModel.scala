package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokensWs

/**
 * Corpus-trained unigram language-model scoring — the CCNet-style
 * perplexity proxy (Wenzek et al. 2020): score each document by the
 * average negative log-probability of its tokens under a unigram model
 * trained on the corpus itself. Low scores = predictable, common
 * language; high scores = rare-token noise (gibberish, boilerplate
 * codes, OCR junk) — the standard unsupervised quality signal used to
 * tier pre-training data.
 *
 * Shape at 100 TB: one token explode + hash aggregate builds the
 * vocabulary (a table that SATURATES as the corpus grows), one scalar
 * total, then a token→vocab join (AQE broadcasts the saturating vocab
 * when it fits; otherwise it shuffles on the token — the same exchange
 * the tf aggregate already created) and one per-document aggregate.
 * Nothing driver-side; no iteration.
 */
object LanguageModel {

  /** Per-document average negative log-probability under the corpus
    * unigram model: (doc_id, n_tokens, nll) with
    * nll = −Σ ln(cnt(tok)/N) / n_tokens, rounded 1e-6. Documents with no
    * tokens produce no row (no probability mass to average). Every token
    * is in-vocabulary by construction (the model is trained on the same
    * corpus). */
  def unigramNegLogProb(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokensWs(col(textCol))).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("n_total"))
    toks.join(vocab, Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(-log(col("cnt").cast("double") / col("n_total").cast("double")))
          .as("nll_sum"))
      .select(col(idCol), col("n_tokens"),
        round(col("nll_sum") / col("n_tokens").cast("double"), 6).as("nll"))
  }

  /** Interpolated bigram scoring — one order up from the unigram proxy:
    * p(w_i | w_{i−1}) = λ·c(w_{i−1}, w_i)/c(w_{i−1}) + (1−λ)·c(w_i)/N,
    * scored over positions i ≥ 1 (documents with < 2 tokens produce no
    * row). The Jelinek–Mercer interpolation keeps every probability
    * positive without held-out tuning; the bigram table is the only
    * state beyond the unigram model and still saturates far below
    * corpus size. Shape: one doc-partitioned `lag` window builds the
    * transition pairs map-side; two token-key joins attach the counts;
    * one per-document aggregate. Output: (doc_id, n_bigrams, nll). */
  def bigramNegLogProb(docs: DataFrame, lambda: Double = 0.7,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    require(lambda > 0 && lambda < 1, "lambda must be in (0, 1)")
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val toks = docs.select(col(idCol),
      posexplode(tokensWs(col(textCol))).as(Seq("pos", "tok")))
    val pairs = toks.withColumn("prev", lag(col("tok"), 1).over(w))
      .where(col("prev").isNotNull)
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt1"))
    val total = uni.agg(sum(col("cnt1")).as("n_total"))
    val bi = pairs.groupBy(col("prev"), col("tok")).agg(count(lit(1)).as("cnt2"))
    val p = lit(lambda) * col("cnt2").cast("double") / col("cprev").cast("double") +
      lit(1.0 - lambda) * col("cnt1").cast("double") / col("n_total").cast("double")
    pairs
      .join(bi, Seq("prev", "tok"))
      .join(uni.select(col("tok").as("prev"), col("cnt1").as("cprev")), Seq("prev"))
      .join(uni, Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(-log(p)).as("nll_sum"))
      .select(col(idCol), col("n_bigrams"),
        round(col("nll_sum") / col("n_bigrams").cast("double"), 6).as("nll"))
  }

  /**
   * Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; the
   * Chen & Goodman 1999 interpolated form) — the smoothing that actually
   * wins n-gram evaluations, one rung above Jelinek–Mercer
   * (`bigramNegLogProb`) and the backoff trigram: the lower-order
   * distribution is the CONTINUATION probability (how many distinct
   * contexts a word follows — "Francisco" is frequent but only ever
   * follows "San", so its continuation mass is tiny), which is exactly
   * the distinction a quality scorer wants between genuinely productive
   * words and frozen-collocation tails:
   *
   *   p(w₂|w₁) = (c(w₁w₂) − D + D·N₁₊(w₁·)·P_cont(w₂)) / c(w₁·)
   *   P_cont(w₂) = N₁₊(·w₂) / |{distinct bigram types}|
   *
   * with absolute discount D ∈ (0,1), c(w₁·) the CONTEXT count (Σ over
   * followers — keeps Σ_w₂ p = 1 exactly), N₁₊(w₁·)/N₁₊(·w₂) the
   * distinct follower/context type counts. Scored over the training
   * corpus itself (the q120/q125 stance), so every bigram has c ≥ 1 > D
   * and the max(·−D, 0) clip never binds — every quantity is exact
   * integer counts + one discount literal, replayable bitwise in SQL.
   *
   * Shape: the q125 bill exactly — one doc-partitioned lag window, the
   * SATURATING bigram table with three keyed aggregates over it (context
   * stats, continuation counts, 1-row type total), two token-key joins
   * back, one per-document aggregate. Output: (idCol, n_bigrams, nll),
   * documents with < 2 tokens produce no row.
   */
  def kneserNeyBigramNll(docs: DataFrame, discount: Double = 0.75,
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    require(discount > 0 && discount < 1, "discount must be in (0, 1)")
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val toks = docs.select(col(idCol),
      posexplode(tokensWs(col(textCol))).as(Seq("pos", "tok")))
    val pairs = toks.withColumn("prev", lag(col("tok"), 1).over(w))
      .where(col("prev").isNotNull)
    val bi = pairs.groupBy(col("prev"), col("tok")).agg(count(lit(1)).as("c12"))
    val ctx = bi.groupBy(col("prev"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("nf"))
    val cont = bi.groupBy(col("tok")).agg(count(lit(1)).as("nb"))
    val types = bi.agg(count(lit(1)).as("btypes"))
    val p = (col("c12").cast("double") - lit(discount) +
      lit(discount) * col("nf").cast("double") *
        (col("nb").cast("double") / col("btypes").cast("double"))) /
      col("c1").cast("double")
    pairs
      .join(bi, Seq("prev", "tok"))
      .join(ctx, Seq("prev"))
      .join(cont, Seq("tok"))
      .crossJoin(broadcast(types))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(-log(p)).as("nll_sum"))
      .select(col(idCol), col("n_bigrams"),
        round(col("nll_sum") / col("n_bigrams").cast("double"), 6).as("nll"))
  }

  /** CCNet-style perplexity tiering (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    * score every document under ITS OWN language's unigram LM, then
    * split each language into head / middle / tail perplexity terciles —
    * the bucket layout CommonCrawl pipelines ship (head ≈ Wikipedia-like,
    * tail ≈ noise) and downstream mixing reads.
    *
    * Cutoffs come from a deterministic hash sample of the scored docs
    * (`pmod(hash60(id), sampleMod) = 0`) — exactly CCNet's move: tier
    * boundaries are ESTIMATES from a bounded sample, the assignment is
    * exact over the full corpus. That keeps the only order-statistic in
    * the job (a per-language cumulative window over the sample's distinct
    * rounded scores) bounded by the sample size the caller picks, never
    * by the corpus: at 100 TB you size sampleMod so each language's
    * sample fits one task, and everything else is the q120 scoring shape
    * (saturating per-language count tables + one per-doc aggregate) plus
    * one broadcast of the 2-row-per-language cutoff table.
    *
    * Cutoff definition (exact, engine-portable — no interpolation):
    * cut_k = smallest sampled nll whose cumulative sample count reaches
    * ⌈k·m/3⌉ (m = language sample size); tiers compare the 1e-6-rounded
    * nll against cut1/cut2 with ≤, so ties share a tier. Languages with
    * no sampled document are dropped (no boundary estimate — CCNet
    * requires a per-language model; size sampleMod accordingly).
    * Output: (idCol, langCol, n_tokens, nll, tier). */
  def perplexityTiers(docs: DataFrame, sampleMod: Long = 1L,
                      textCol: String = "text", idCol: String = "doc_id",
                      langCol: String = "lang"): DataFrame = {
    require(sampleMod >= 1, "sampleMod must be >= 1")
    val toks = docs.select(col(idCol), col(langCol),
      explode(tokensWs(col(textCol))).as("tok"))
    // vocab feeds BOTH its own totals and the scoring join, and scored
    // feeds the sample (vals + m) AND the final assignment — without the
    // caches each downstream consumer replays the caller's whole input
    // plan through the token explode (measured: the q232 composition,
    // whose input is the full CCNet flag pipeline, evaluated it ~9× —
    // 390 s for the query; a raw parquet input like q147's hides the
    // same fan-out behind a cheap scan). Both tables are bounded: vocab
    // saturates with the per-language vocabulary, scored is one narrow
    // row per document. Input is now evaluated exactly twice (vocab
    // build + scoring join).
    val vocab = graft.core.Caches.cacheOnce(
      toks.groupBy(col(langCol), col("tok")).agg(count(lit(1)).as("cnt")))
    val totals = vocab.groupBy(col(langCol)).agg(sum(col("cnt")).as("n_total"))
    val scored = graft.core.Caches.cacheOnce(toks.join(vocab, Seq(langCol, "tok"))
      .join(broadcast(totals), Seq(langCol))
      .groupBy(col(idCol), col(langCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(-log(col("cnt").cast("double") / col("n_total").cast("double")))
          .as("nll_sum"))
      .select(col(idCol), col(langCol), col("n_tokens"),
        round(col("nll_sum") / col("n_tokens").cast("double"), 6).as("nll")))
    val samp = scored.where(
      pmod(graft.functions.TextFunctions.hash60(col(idCol).cast("string")),
        lit(sampleMod)) === 0)
    // cumulative counts over the sample's DISTINCT (lang, nll) values —
    // the aggregate runs map-side-partial first, the window sees only
    // value rows
    val vals = samp.groupBy(col(langCol), col("nll")).agg(count(lit(1)).as("nv"))
    val w = Window.partitionBy(col(langCol)).orderBy(col("nll"))
    val cum = vals.withColumn("cum", sum(col("nv")).over(w))
    val m = samp.groupBy(col(langCol)).agg(count(lit(1)).as("m_docs"))
    val cuts = cum.join(m, Seq(langCol))
      .groupBy(col(langCol))
      .agg(min(when(col("cum") * 3 >= col("m_docs"), col("nll"))).as("cut1"),
        min(when(col("cum") * 3 >= col("m_docs") * 2, col("nll"))).as("cut2"))
    // LEFT join: a language with zero sampled docs (sampleMod too coarse
    // for its cardinality) must stay VISIBLE as tier='unsampled', not
    // silently vanish — downstream allocation (tierQuotas) rejects the
    // unknown tier loudly instead of under-allocating in silence.
    scored.join(broadcast(cuts), Seq(langCol), "left")
      .select(col(idCol), col(langCol), col("n_tokens"), col("nll"),
        when(col("cut1").isNull, "unsampled")
          .when(col("nll") <= col("cut1"), "head")
          .when(col("nll") <= col("cut2"), "middle")
          .otherwise("tail").as("tier"))
  }

  /** Stupid-Backoff trigram scoring (Brants et al. 2007, "Large Language
    * Models in Machine Translation") — the order the web-scale pipelines
    * actually run, completing the LM tier (unigram → JM bigram → backoff
    * trigram). Counts train on `train`; `score` documents are scored
    * held-out, so the backoff chain is genuinely exercised (a model
    * scored on its own training corpus never leaves the trigram branch):
    *
    *   S(w | w₂w₁) = c₃(w₂w₁w)/c₂(w₂w₁)          if the trigram was seen
    *               = α · c₂(w₁w)/c₁(w₁)           else if the bigram was
    *               = α² · (c₁(w)+1)/(N+V+1)       else (add-one unigram —
    *                                               OOV words keep positive
    *                                               mass, no tuning)
    *
    * Scores are relative frequencies, not a normalized distribution —
    * Stupid Backoff's deliberate trade (no discount estimation, one
    * constant α) which is why it scales to web corpora. All three count
    * tables SATURATE with corpus growth; transitions build map-side from
    * one doc-partitioned lag window (the bigram shape, one order up);
    * the scoring joins ride the count tables (AQE broadcasts them when
    * they fit). Output: (idCol, n_trigrams, nll) over positions i ≥ 2,
    * nll rounded 1e-6; documents with < 3 tokens produce no row. */
  def trigramBackoffNll(train: DataFrame, score: DataFrame,
                        alpha: Double = 0.4,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0, 1)")
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    def lagged(docs: DataFrame): DataFrame =
      docs.select(col(idCol), posexplode(tokensWs(col(textCol))).as(Seq("pos", "tok")))
        .withColumn("p1", lag(col("tok"), 1).over(w))
        .withColumn("p2", lag(col("tok"), 2).over(w))
    val tt = lagged(train)
    val uni = tt.groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val totals = broadcast(uni.agg(
      sum(col("c1")).cast("double").as("n_total"),
      count(lit(1)).cast("double").as("v_size")))
    val bi = tt.where(col("p1").isNotNull)
      .groupBy(col("p1"), col("tok")).agg(count(lit(1)).as("c2"))
    val tri = tt.where(col("p2").isNotNull)
      .groupBy(col("p2"), col("p1"), col("tok")).agg(count(lit(1)).as("c3"))
    val st = lagged(score).where(col("p2").isNotNull)
    val joined = st
      .join(tri, Seq("p2", "p1", "tok"), "left")
      .join(bi, Seq("p1", "tok"), "left")
      // context-bigram count c₂(w₂w₁): the same bi table keyed one back
      .join(bi.select(col("p1").as("p2"), col("tok").as("p1"),
        col("c2").as("cctx")), Seq("p2", "p1"), "left")
      .join(uni.select(col("tok").as("p1"), col("c1").as("c1p1")), Seq("p1"), "left")
      .join(uni, Seq("tok"), "left")
      .crossJoin(totals)
    // a seen trigram implies its context bigram (cctx) and a seen bigram
    // its unigram (c1p1) — the higher branches never divide by NULL
    val sUni = (coalesce(col("c1"), lit(0L)).cast("double") + lit(1.0)) /
      (col("n_total") + col("v_size") + lit(1.0))
    val s = when(col("c3").isNotNull,
        col("c3").cast("double") / col("cctx").cast("double"))
      .when(col("c2").isNotNull,
        lit(alpha) * col("c2").cast("double") / col("c1p1").cast("double"))
      .otherwise(lit(alpha * alpha) * sUni)
    joined.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"), sum(-log(s)).as("nll_sum"))
      .select(col(idCol), col("n_trigrams"),
        round(col("nll_sum") / col("n_trigrams").cast("double"), 6).as("nll"))
  }

  /**
   * LINE-granular LM quality filtering — CCNet's actual filtering
   * granularity (Wenzek et al. 2020 filter PARAGRAPHS by LM perplexity,
   * not whole documents): score every newline-delimited line by mean
   * unigram NLL under the corpus's own saturating vocabulary, strike
   * the corpus-wide WORST `dropFrac` fraction of lines, and reassemble
   * each document from its surviving lines — a noisy footer no longer
   * sinks an otherwise-good page, and a good quote no longer rescues a
   * spam page it is embedded in.
   *
   * Selection is rank-based under the total order (nll rounded 1e-6
   * DESC, doc, line_no) via the two-phase distributed rank — no
   * unpartitioned window over the corpus line table, no float-threshold
   * boundary. Token-less lines (blank separators) carry no LM evidence
   * and are always kept. Output: (idCol, n_lines, n_removed, textCol) —
   * every document present, '' if every line was struck.
   */
  def lineNllFilter(docs: DataFrame, dropFrac: Double,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(dropFrac > 0.0 && dropFrac < 1.0, "dropFrac must be in (0, 1)")
    val ltoks = docs
      .select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("line_no", "line")))
      .select(col(idCol), col("line_no"),
        explode(tokensWs(col("line"))).as("tok"))
    val vocab = ltoks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("n_total"))
    val scored = ltoks.join(vocab, Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy(col(idCol), col("line_no"))
      .agg(round(
        sum(-log(col("cnt").cast("double") / col("n_total").cast("double"))) /
          count(lit(1)).cast("double"), 6).as("nll"))
    val ranked = Ids.denseIds(scored,
      Seq(col("nll").desc, col(idCol).asc, col("line_no").asc), "__rk")
    val nLines = scored.agg(count(lit(1)).as("__l"))
    val strikes = ranked.crossJoin(broadcast(nLines))
      .where(col("__rk") < ceil(lit(dropFrac) * col("__l")))
      .groupBy(col(idCol))
      .agg(collect_set(col("line_no")).as("rm"), count(lit(1)).as("n_removed"))
    Dedup.lineReassemble(docs, strikes, idCol, textCol)
  }
}
