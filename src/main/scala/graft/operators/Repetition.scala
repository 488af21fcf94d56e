package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/**
 * Repetition-based quality signals (the Gopher/C4 family of pre-training
 * filters, adapted to word n-grams): highly repetitive documents — boiler-
 * plate, scraped templates, degenerate generations — are the single most
 * common low-quality class at corpus scale, and these three fractions are
 * the standard gates for them:
 *
 *  - `dup_token_frac`   — fraction of tokens that are repeats of an
 *                         earlier token: (n_tokens − n_distinct)/n_tokens.
 *  - `top{N}_char_frac` — characters covered by the single most frequent
 *                         word N-gram (count × gram length, over total
 *                         chars), capped at 1. Argmax ties break to the
 *                         lexicographically smallest gram — deterministic.
 *  - `dup{M}_char_frac` — characters covered by ALL word M-grams occurring
 *                         more than once (Σ count × length over total
 *                         chars), capped at 1. Overlaps double-count by
 *                         design; the cap keeps the signal in [0,1].
 *
 * Scale: ONE hash partition on the doc id serves everything — the shingle
 * streams' window sort, both (id, gram) count aggregates, the per-doc
 * rollups, and the joins back are all exchange-free under it (grouping on
 * (id, gram) is satisfied by id-partitioning). The document body never
 * shuffles; only (id, gram) rows do. Empty/short docs yield all-zero rows.
 */
object Repetition {

  def repetitionStats(docs: DataFrame, topN: Int = 2, dupN: Int = 5,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol),
      length(col(textCol)).cast("long").as("nc"),
      tokenCountWs(col(textCol)).cast("long").as("nt"),
      size(array_distinct(tokensWs(col(textCol)))).cast("long").as("nd"))
    // most frequent topN-gram: min over (−count, gram) structs = argmax by
    // count, ties to the smallest gram — one aggregate, no window
    val top = shingleStream(docs, topN, idCol, textCol)
      .groupBy(col(idCol), col("sh")).agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(min(struct((-col("cnt")).as("negCnt"), col("sh").as("sh"))).as("top"))
      .select(col(idCol), (-col("top.negCnt")).as("top_cnt"),
        length(col("top.sh")).cast("long").as("top_len"))
    val dup = shingleStream(docs, dupN, idCol, textCol)
      .groupBy(col(idCol), col("sh")).agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(sum(when(col("cnt") >= 2, col("cnt") * length(col("sh")).cast("long")))
        .as("dup_chars"))
    base
      .join(top, Seq(idCol), "left")
      .join(dup, Seq(idCol), "left")
      .select(col(idCol),
        when(col("nt") === 0, 0.0)
          .otherwise((col("nt") - col("nd")).cast("double") / col("nt").cast("double"))
          .as("dup_token_frac"),
        when(col("nc") === 0 || col("top_cnt").isNull, 0.0)
          .otherwise(least(lit(1.0),
            (col("top_cnt") * col("top_len")).cast("double") / col("nc").cast("double")))
          .as(s"top${topN}_char_frac"),
        when(col("nc") === 0 || col("dup_chars").isNull, 0.0)
          .otherwise(least(lit(1.0),
            col("dup_chars").cast("double") / col("nc").cast("double")))
          .as(s"dup${dupN}_char_frac"))
  }
}
