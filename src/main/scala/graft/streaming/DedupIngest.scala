package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.core.Caches
import graft.store.DedupStore

/**
 * Continuous corpus dedup — the streaming face of
 * `DedupStore.dedupDelta` (the crawl loop): fold a micro-batched
 * document stream through the persisted signature store with
 * `foreachBatch`. Each batch dedups against everything kept so far
 * (keep-first), appends its survivors' signatures under a batch
 * directory named by the BATCH ID, and lands the kept documents in
 * `keptPath/batch=<id>` — so the stream fold equals calling `dedupDelta`
 * sequentially on the same batches (spec-gated in `DedupStoreSpec`).
 *
 * Redelivery-idempotent like `AnnIngest`, and stronger: `dedupDelta`'s
 * store view EXCLUDES the batch's own signature directory, so a
 * redelivered batch recomputes the identical kept set against the
 * identical store view, overwrites its own directories with identical
 * content, and re-touches its marker — a no-op on the store's logical
 * state, with no restore step after a crash mid-append.
 *
 * Per-batch caches (delta signatures, dropped set) are released once the
 * kept batch is durable, so a long-running crawl holds O(1) cache
 * entries — the `IncrementalIngest` pattern.
 */
object DedupIngest {

  /** One document micro-batch through the incremental dedup; exposed so a
    * nightly batch job shares the exact code path the stream runs. */
  def applyBatch(batch: DataFrame, batchId: Long, storePath: String,
                 keptPath: String, n: Int, numPerms: Int, bands: Int,
                 estThreshold: Double, idCol: String = "doc_id",
                 textCol: String = "text",
                 maxBandDegree: Option[Int] = None): Unit =
    // Scoped, not clearAll: release only this batch's caches so
    // concurrent serving queries on the same session keep theirs.
    Caches.scoped {
      val kept = DedupStore.dedupDelta(batch, storePath, n, numPerms, bands,
        estThreshold, idCol, textCol, deltaId = Some(s"stream$batchId"),
        maxBandDegree = maxBandDegree)
      kept.write.mode("overwrite").parquet(s"$keptPath/batch=$batchId")
    }

  /** Start the crawl-dedup ingest: `docs` is a STREAMING DataFrame with
    * (idCol, textCol) columns; the store must already exist
    * (`DedupStore.write` — an empty base corpus is fine). */
  def start(docs: DataFrame, storePath: String, keptPath: String,
            checkpointPath: String, n: Int, numPerms: Int, bands: Int,
            estThreshold: Double, idCol: String = "doc_id",
            textCol: String = "text",
            maxBandDegree: Option[Int] = None): StreamingQuery = {
    val fn: (Dataset[Row], Long) => Unit =
      (batch, id) => applyBatch(batch.toDF(), id, storePath, keptPath,
        n, numPerms, bands, estThreshold, idCol, textCol, maxBandDegree)
    docs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch(fn)
      .start()
  }
}
