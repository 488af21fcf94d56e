package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.hash60

/**
 * Trained language identification — a multinomial naive-Bayes classifier
 * over hashed character n-grams with G²-based feature selection (the
 * langid.py recipe, Lui & Baldwin 2012; fastText-family shape, all
 * public methods), trained IN-ENGINE on a labeled corpus. Replaces the
 * marker-word heuristic (`TextFunctions.langId`) as the production
 * signal: the heuristic needs hand-curated function-word lists and
 * scores zero on texts avoiding them; the trained model learns whatever
 * character statistics separate the corpus's languages.
 *
 * Feature selection is what makes naive Bayes behave on BOTH kinds of
 * corpus: a bucket is kept only if its observed per-language counts
 * deviate from the language marginals by G² = 2·Σ O·ln(O/E) ≥ `minG2`
 * (the log-likelihood-ratio statistic; 20 ≈ the χ²₄ 0.9995 quantile).
 * On a corpus whose labels genuinely separate, discriminative grams
 * have G² in the thousands and survive; on label-noise text every
 * bucket is marginal sampling noise, almost nothing survives, and the
 * classifier correctly degrades to the prior (majority class) instead
 * of amplifying noise through hundreds of per-doc gram terms.
 *
 * Model = (lang, bucket, lp) over selected buckets — at most
 * |langs|·numBuckets rows REGARDLESS of corpus size (the hashed feature
 * space is fixed, counts saturate), so it always broadcasts. Scoring is
 * declarative end-to-end: explode grams → per-(doc, bucket) counts →
 * semi-join the selected set → cross the bounded language table (so
 * selected-but-unseen buckets contribute the language's smoothed miss
 * mass — exact NB over the selected feature set) → one (doc, lang)
 * aggregate → argmax with an alphabetical tie-break. No UDFs, no
 * driver state; one corpus pass at any scale.
 */
object LangId {

  /** Hashed char n-gram buckets of the lowercased text: one entry per
    * POSITION (multiset — NB counts occurrences), empty array when the
    * text is shorter than n. */
  def charGramBuckets(text: Column, n: Int, numBuckets: Int): Column = {
    val t = lower(text)
    when(length(t) < n, array().cast("array<long>"))
      .otherwise(transform(sequence(lit(1), length(t) - (n - 1)),
        i => pmod(hash60(t.substr(i, lit(n))), lit(numBuckets.toLong))))
  }

  /** Train on the labeled rows of `docs`: the bounded model
    * (lang, bucket, lp) over G²-selected buckets — log p(bucket|lang),
    * add-1 smoothed over `numBuckets`. Pair with [[langTable]]. */
  def train(docs: DataFrame, n: Int = 3, numBuckets: Int = 512,
            minG2: Double = 20.0,
            langCol: String = "lang", textCol: String = "text"): DataFrame = {
    // cacheOnce'd (r13): tot/bt/gt/G²-selection/model each consume this
    // table, and every one of them is evaluated inside its own broadcast
    // subtree — uncached, each re-ran the corpus char-gram explode (one
    // md5 per character position). The table is ≤ |langs|·numBuckets
    // rows at any corpus size.
    val grams = graft.core.Caches.cacheOnce(
      docs.select(col(langCol).as("lang"),
          explode(charGramBuckets(col(textCol), n, numBuckets)).as("bucket"))
        .groupBy(col("lang"), col("bucket")).agg(count(lit(1)).as("cnt")))
    val tot = grams.groupBy(col("lang")).agg(sum(col("cnt")).as("tot"))
    val bt = grams.groupBy(col("bucket")).agg(sum(col("cnt")).as("bcnt"))
    val gt = grams.agg(sum(col("cnt")).cast("double").as("gt"))
    // G² per bucket: 2·Σ_lang O·ln(O/E), E = tot_lang·bcnt/grand; zero-
    // count cells contribute 0 (lim x→0 x·ln x), so summing observed
    // rows IS the statistic. Rounded 1e-6 before the threshold compare
    // so the oracle's ln ULP differences cannot flip selection.
    val sel = grams.join(tot, Seq("lang")).join(bt, Seq("bucket"))
      .crossJoin(broadcast(gt))
      .groupBy(col("bucket"))
      .agg(round(lit(2.0) * sum(col("cnt") *
        log(col("cnt") / (col("tot").cast("double") * col("bcnt") / col("gt")))),
        6).as("g2"))
      .where(col("g2") >= minG2)
      .select(col("bucket"))
    grams.join(sel, Seq("bucket"))
      .join(tot, Seq("lang"))
      .select(col("lang"), col("bucket"),
        log((col("cnt") + 1).cast("double") /
          (col("tot") + numBuckets).cast("double")).as("lp"))
  }

  /** The bounded per-language table: prior log p(lang) and the smoothed
    * miss log-prob for selected buckets the language never saw. One row
    * per language at any corpus size. */
  def langTable(docs: DataFrame, n: Int = 3, numBuckets: Int = 512,
                langCol: String = "lang", textCol: String = "text"): DataFrame = {
    val perLang = docs.groupBy(col(langCol).as("lang")).agg(
      count(lit(1)).as("n_docs"),
      sum(greatest(length(lower(col(textCol))) - (n - 1), lit(0)).cast("long"))
        .as("tot"))
    val nAll = perLang.agg(sum(col("n_docs")).as("n_all"))
    perLang.crossJoin(broadcast(nAll))
      .select(col("lang"),
        log(col("n_docs").cast("double") / col("n_all").cast("double"))
          .as("prior_lp"),
        log(lit(1.0) / (col("tot") + numBuckets).cast("double")).as("miss_lp"))
  }

  /** Classify every document: (idCol, predicted). Docs shorter than n
    * chars predict "und"; docs whose grams all fell outside the selected
    * feature set score on the prior alone. Ties break alphabetically —
    * deterministic, engine-replayable. */
  def classify(docs: DataFrame, model: DataFrame, langs: DataFrame,
               n: Int = 3, numBuckets: Int = 512,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val selected = model.select(col("bucket")).distinct()
    val kept = docs.select(col(idCol),
        explode(charGramBuckets(col(textCol), n, numBuckets)).as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("c"))
      .join(broadcast(selected), Seq("bucket"))
    val evidence = kept
      .crossJoin(broadcast(langs.select(col("lang"), col("miss_lp"))))
      .join(broadcast(model), Seq("lang", "bucket"), "left")
      .groupBy(col(idCol), col("lang"))
      .agg(sum(col("c") * coalesce(col("lp"), col("miss_lp"))).as("ev"))
    val scored = docs.select(col(idCol), length(lower(col(textCol))).as("len"))
      .crossJoin(broadcast(langs.select(col("lang"), col("prior_lp"))))
      .join(evidence, Seq(idCol, "lang"), "left")
      .select(col(idCol), col("len"), col("lang"),
        (col("prior_lp") + coalesce(col("ev"), lit(0.0))).as("score"))
    scored
      .groupBy(col(idCol))
      .agg(min(struct((-col("score")).as("negscore"), col("lang").as("lang")))
        .as("best"), first(col("len")).as("len"))
      .select(col(idCol),
        when(col("len") >= n, col("best").getField("lang"))
          .otherwise(lit("und")).as("predicted"))
  }
}
