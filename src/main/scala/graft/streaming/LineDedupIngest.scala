package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.core.Caches
import graft.store.LineDedupStore

/**
 * Continuous line-level boilerplate dedup — the streaming face of
 * `LineDedupStore.dedupDelta` (the crawl loop beside `DedupIngest`):
 * fold a micro-batched document stream through the persisted
 * per-line-hash df ledger with `foreachBatch`. Each batch strikes lines
 * whose merged (ledger + batch) document frequency crosses the gate,
 * appends its own df batch under a directory named by the BATCH ID, and
 * lands the cleaned documents in `keptPath/batch=<id>` — so the stream
 * fold equals calling `dedupDelta` sequentially on the same batches
 * (spec-gated in `LineDedupStoreSpec`).
 *
 * Redelivery-idempotent the `DedupIngest` way: the store view excludes
 * the batch's own df directory, so a redelivered batch recomputes
 * identical strikes against the identical ledger view and overwrites
 * its own directories with identical content — a no-op on the store's
 * logical state. Per-batch caches release once the cleaned batch is
 * durable (O(1) cache entries on a long-running crawl).
 */
object LineDedupIngest {

  /** One document micro-batch through the incremental line dedup;
    * exposed so a nightly batch job shares the exact stream code path. */
  def applyBatch(batch: DataFrame, batchId: Long, storePath: String,
                 keptPath: String, maxDocFreq: Long,
                 idCol: String = "doc_id", textCol: String = "text"): Unit =
    // Scoped, not clearAll: release only this batch's caches so
    // concurrent serving queries on the same session keep theirs.
    Caches.scoped {
      val cleaned = LineDedupStore.dedupDelta(batch, storePath, maxDocFreq,
        idCol, textCol, deltaId = Some(s"stream$batchId"))
      cleaned.write.mode("overwrite").parquet(s"$keptPath/batch=$batchId")
    }

  /** Start the crawl line-dedup ingest: `docs` is a STREAMING DataFrame
    * with (idCol, textCol) columns; the store must already exist
    * (`LineDedupStore.write` — an empty base corpus is fine). */
  def start(docs: DataFrame, storePath: String, keptPath: String,
            checkpointPath: String, maxDocFreq: Long,
            idCol: String = "doc_id", textCol: String = "text"): StreamingQuery = {
    val fn: (Dataset[Row], Long) => Unit =
      (batch, id) => applyBatch(batch.toDF(), id, storePath, keptPath,
        maxDocFreq, idCol, textCol)
    docs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch(fn)
      .start()
  }
}
