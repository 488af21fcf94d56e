package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokensWs

/**
 * Document chunking: split each document into token windows of
 * `chunkTokens` tokens starting every `stride` tokens (stride <
 * chunkTokens ⇒ overlapping windows) — context-window packing for
 * training-data pipelines.
 *
 * Relational shape: tokenize ONCE into an array column, explode the
 * window STARTS (a `sequence` — ~len/stride rows per doc), then slice +
 * join the tokens per start as plain projections. Nothing runs inside a
 * HOF lambda, so the tokenizer is never re-evaluated per window (the
 * trap `shingleStream` documents) and the whole operator is map-only —
 * no shuffle, linear in emitted chunk text.
 */
object Chunking {

  /** (idCol, chunk_id, n_tokens, chunk_text); empty docs emit no rows,
    * the final window is the (possibly short) tail. */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int, stride: Int,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkTokens > 0 && stride > 0, "chunkTokens and stride must be positive")
    docs
      .select(col(idCol), tokensWs(col(textCol)).as("tk"))
      .select(col(idCol), col("tk"),
        explode(sequence(lit(0), greatest(size(col("tk")) - 1, lit(0)), lit(stride)))
          .as("start"))
      .where(col("start") < size(col("tk")))
      .select(col(idCol),
        (col("start") / stride).cast("long").as("chunk_id"),
        least(lit(chunkTokens), size(col("tk")) - col("start")).cast("long")
          .as("n_tokens"),
        concat_ws(" ", slice(col("tk"), col("start") + 1, lit(chunkTokens))).as("chunk_text"))
  }

  /**
   * Sequence packing (concat-and-chunk accounting): lay the chunks of a
   * stratum end to end in a deterministic order and slice the resulting
   * token stream every `budget` tokens — the packing step that turns a
   * chunked corpus into fixed-length training sequences. Each input row
   * occupies the token interval [cum_before, cum_before + n_tokens);
   * `pack_id` / `pack_offset` locate its start, and `straddles` marks
   * rows the physical concat would split across a pack boundary.
   *
   * Packing is inherently sequential — the parallelism axis is the
   * STRATUM (shard/language/source): one window shuffle partitioned by
   * `strataCol`, running-sum within. A single global stream would plan a
   * single-partition window; sharding is how real pipelines pack, and the
   * assignment stays deterministic per stratum regardless of shard count.
   * Output: input columns + (cum_before, pack_id, pack_offset, straddles).
   */
  def packSequences(chunks: DataFrame, budget: Int, strataCol: String,
                    orderCols: Seq[String],
                    tokenCol: String = "n_tokens"): DataFrame = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol)).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    chunks
      .withColumn("cum_before", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("pack_id", (col("cum_before") / budget).cast("long"))
      .withColumn("pack_offset", col("cum_before") % budget)
      .withColumn("straddles",
        col("pack_offset") + col(tokenCol) > budget)
  }
}
