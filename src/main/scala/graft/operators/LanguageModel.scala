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
}
