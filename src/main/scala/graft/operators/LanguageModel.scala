package graft.operators

import org.apache.spark.sql.DataFrame
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
}
