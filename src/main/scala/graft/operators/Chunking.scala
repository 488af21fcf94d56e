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

  /**
   * Length-bucketed batch shaping — the inference/eval counterpart of
   * sequence packing: padded batching wastes compute proportional to
   * (batch max length − item length), so production serving buckets
   * items by length and sizes each batch inversely to its bucket's
   * padded width (rows/batch = ⌊tokenBudget / bucketUpper⌋, min 1 —
   * a fixed token budget per batch regardless of length class).
   *
   * `boundaries` (ascending) define the padded widths; an item lands in
   * the smallest boundary ≥ its length, and items longer than the last
   * boundary are EXCLUDED (they need truncation/chunking first — making
   * that loud beats silently padding to an unplanned width). Assignment
   * is deterministic: items order by (tokenCol, idCol) inside the
   * bucket, batch_id = position div rows/batch.
   *
   * Scale: one bucket-keyed window. Buckets are wide partitions (a
   * corpus-sized bucket holds most rows) — for corpus-scale batch
   * materialization compose a shard axis exactly like
   * [[packIdSequences]]'s lang×shard strata; for eval/serving sets (the
   * actual use) buckets are modest. Output: input columns +
   * (bucket_upper, batch_id, pad_tokens).
   */
  def lengthBatches(rows: DataFrame, tokenBudget: Int, boundaries: Seq[Int],
                    tokenCol: String = "n_tokens",
                    idCol: String = "doc_id"): DataFrame = {
    require(boundaries.nonEmpty && boundaries == boundaries.sorted &&
      boundaries.distinct == boundaries, "boundaries must be ascending")
    require(tokenBudget >= boundaries.head,
      "tokenBudget must fit at least one row of the smallest bucket")
    val upper = boundaries.foldRight(lit(null).cast("int")) { (b, acc) =>
      when(col(tokenCol) <= b, lit(b)).otherwise(acc)
    }
    rows
      .where(col(tokenCol) <= boundaries.last && col(tokenCol) > 0)
      .withColumn("bucket_upper", upper)
      .withColumn("__rpb", greatest(expr(s"$tokenBudget div bucket_upper"), lit(1)))
      .withColumn("batch_id",
        expr("(row_number() over (partition by bucket_upper " +
          s"order by $tokenCol, $idCol) - 1) div __rpb").cast("long"))
      .withColumn("pad_tokens",
        (col("bucket_upper") - col(tokenCol)).cast("long"))
      .drop("__rpb")
  }

  /** MATERIALIZED sequence packing — where `packSequences` assigns pack
    * ids to counted chunks, this lays the actual token-id CONTENT end to
    * end: per stratum, document id sequences (`idsCol`, array<long>,
    * from `Bpe.encodedIds` or the unigram encode face) concatenate in
    * `idCol` order and slice every `seqLen` ids — a document straddling
    * a boundary SPLITS, its head finishing one training sequence and its
    * tail opening the next (concat-and-chunk, no padding). Output one
    * row per (strataCol, pack_id): `seq` = the packed id array, in order;
    * the final pack of a stratum may be short.
    *
    * Scale shape: one stratum-partitioned running-sum window (the
    * `packSequences` exchange) + one explode into the ≤ ⌈n/seqLen⌉ + 1
    * packs each document intersects + one (stratum, pack) aggregate
    * whose groups are bounded by seqLen ids — no stage sees more than
    * the document's own array. Pack arithmetic is integer (`div`), so
    * offsets stay exact at any corpus size. */
  def packIdSequences(docIds: DataFrame, seqLen: Int, strataCol: String,
                      idCol: String = "doc_id",
                      idsCol: String = "ids"): DataFrame =
    packIdSequences(docIds, seqLen, Seq(strataCol), idCol, idsCol)

  /** Multi-column stratum variant: the packing stream is the CONCATENATION
    * axis, and its width bounds parallelism — a single `lang` stratum
    * carries its language's entire token stream through one window
    * partition at any corpus size. Real pipelines pack per (lang, shard)
    * with content-stable shard ids (`Sampling.shardAssignment`'s
    * hash-mod), so each running sum sees corpus/|strata| tokens and the
    * shard count is the scale knob. Determinism is unchanged: within a
    * stratum the order is `idCol`, and a document's (stratum, pack,
    * offset) depends only on ids and the shard function. */
  def packIdSequences(docIds: DataFrame, seqLen: Int, strataCols: Seq[String],
                      idCol: String, idsCol: String): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    require(strataCols.nonEmpty, "need at least one stratum column")
    import org.apache.spark.sql.expressions.Window
    val strata = strataCols.map(col)
    val w = Window.partitionBy(strata: _*).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val sized = docIds
      .withColumn("n", size(col(idsCol)).cast("long"))
      .where(col("n") > 0)
      .withColumn("cb", coalesce(sum(col("n")).over(w), lit(0L)))
    val spans = sized
      .withColumn("pack_id", explode(sequence(
        expr(s"cb div $seqLen"), expr(s"(cb + n - 1) div $seqLen"))))
      .withColumn("lo", greatest(col("pack_id") * seqLen, col("cb")))
      .withColumn("hi", least((col("pack_id") + 1) * seqLen, col("cb") + col("n")))
      .select(strata :+ col("pack_id") :+ col("cb") :+
        slice(col(idsCol), (col("lo") - col("cb") + 1).cast("int"),
          (col("hi") - col("lo")).cast("int")).as("piece"): _*)
    spans.groupBy(strata :+ col("pack_id"): _*)
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("cb"), col("piece")))),
        s => s.getField("piece"))).as("seq"))
  }

  /** Packing WITH PROVENANCE — `packIdSequences` plus the per-pack
    * document-boundary map a training loader actually needs: attention
    * masks must not cross document boundaries inside a packed sequence
    * (the "eod-masking" convention), and data attribution needs to know
    * which document produced which positions. Output adds `spans`:
    * array<struct<doc: long, start: int, len: int>> in position order —
    * `start` is the 0-based offset inside THIS pack, and Σ len =
    * len(seq). A document straddling pack boundaries contributes one
    * span to each pack it touches, so the loader reconstructs full
    * provenance by (doc, pack, start). Same plan shape as
    * `packIdSequences` (the span struct rides the existing explode and
    * aggregate — no extra pass, no extra shuffle); `idCol` must be a
    * numeric document id. */
  def packIdSequencesWithSpans(docIds: DataFrame, seqLen: Int,
                               strataCols: Seq[String], idCol: String,
                               idsCol: String): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    require(strataCols.nonEmpty, "need at least one stratum column")
    import org.apache.spark.sql.expressions.Window
    val strata = strataCols.map(col)
    val w = Window.partitionBy(strata: _*).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val sized = docIds
      .withColumn("n", size(col(idsCol)).cast("long"))
      .where(col("n") > 0)
      .withColumn("cb", coalesce(sum(col("n")).over(w), lit(0L)))
    val spans = sized
      .withColumn("pack_id", explode(sequence(
        expr(s"cb div $seqLen"), expr(s"(cb + n - 1) div $seqLen"))))
      .withColumn("lo", greatest(col("pack_id") * seqLen, col("cb")))
      .withColumn("hi", least((col("pack_id") + 1) * seqLen, col("cb") + col("n")))
      .select(strata :+ col("pack_id") :+ col("cb") :+
        slice(col(idsCol), (col("lo") - col("cb") + 1).cast("int"),
          (col("hi") - col("lo")).cast("int")).as("piece") :+
        struct(col(idCol).cast("long").as("doc"),
          (col("lo") - col("pack_id") * seqLen).cast("int").as("start"),
          (col("hi") - col("lo")).cast("int").as("len")).as("span"): _*)
    spans.groupBy(strata :+ col("pack_id"): _*)
      .agg(
        flatten(transform(
          array_sort(collect_list(struct(col("cb"), col("piece")))),
          s => s.getField("piece"))).as("seq"),
        transform(
          array_sort(collect_list(struct(col("cb"), col("span")))),
          s => s.getField("span")).as("spans"))
  }

  /**
   * CONTENT-DEFINED chunking (the CDC family: Muthitacharoen et al. 2001
   * LBFS, Xia et al. 2016 FastCDC) — chunk boundaries cut where the
   * rolling hash of the trailing `windowTokens`-token window ≡ 0
   * mod `modK`, so boundaries are a function of LOCAL CONTENT, not
   * position: insert or delete a token and only the chunks touching the
   * edit change — every later chunk re-aligns and hashes identically.
   * Fixed-width chunking (`chunkDocuments`) shifts every downstream
   * boundary instead, which is why storage dedup and chunk-level corpus
   * dedup use CDC. Expected chunk length ≈ modK tokens; production CDC
   * adds min/max clamps against tiny/huge chunks — a stateful scan left
   * out here to keep the cut rule pure (declare bounds by post-splitting
   * oversize chunks with `chunkDocuments` if needed).
   *
   * Scale: window hashing is the ExactSubstr map-only explode (24-byte
   * rows); boundary selection is a filter; chunk spans are one lag
   * window + the token-array join, both on the doc key — one id-keyed
   * exchange total. Empty documents produce no chunks.
   *
   * Output: (idCol, chunk_no, start, n_tokens, chunk_md5) — the hash is
   * of the space-joined token slice, so identical text regions yield
   * identical chunk_md5 at ANY offset in ANY document.
   */
  def cdcChunks(docs: DataFrame, windowTokens: Int, modK: Int,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(windowTokens > 0, "windowTokens must be positive")
    require(modK > 1, "modK must be > 1 (1 cuts after every window)")
    val toks = Dedup.substrTokens(docs, idCol, textCol)
    val wins = Dedup.substrWindowHashes(toks, windowTokens, idCol)
    val cuts = wins.where(col("h") % modK === 0)
      .select(col(idCol), (col("pos") + windowTokens).cast("long").as("cut"))
      .unionByName(toks.where(size(col("tk")) > 0)
        .select(col(idCol), size(col("tk")).cast("long").as("cut")))
      .distinct()
    val w = Window.partitionBy(col(idCol)).orderBy(col("cut"))
    cuts
      .withColumn("start", coalesce(lag(col("cut"), 1).over(w), lit(0L)))
      .withColumn("chunk_no", (row_number().over(w) - 1).cast("long"))
      .where(col("cut") > col("start"))
      .join(toks, Seq(idCol))
      .select(col(idCol), col("chunk_no"), col("start"),
        (col("cut") - col("start")).as("n_tokens"),
        md5(concat_ws(" ",
          slice(col("tk"), (col("start") + 1).cast("int"),
            (col("cut") - col("start")).cast("int")))).as("chunk_md5"))
  }
}
