package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.core.Caches
import graft.store.FrontierStore

/**
 * Continuous frontier intake — the streaming face of
 * `FrontierStore.offer` (the crawl loop beside `DedupIngest` /
 * `LineDedupIngest`, completing the crawl-increment matrix at the URL
 * tier): a micro-batched stream of discovered frontier entries folds
 * through the persisted seen-URL ledger with `foreachBatch`. Each batch
 * canonicalizes, keep-first collapses within itself, drops everything
 * the ledger has seen, appends its first-claims under a directory named
 * by the BATCH ID, and lands the batch's FETCH LIST (the URLs a fetcher
 * should actually spend requests on) in `fetchPath/batch=<id>` — so the
 * stream fold equals calling `offer` sequentially on the same batches
 * (spec-gated in `FrontierStoreSpec`).
 *
 * Redelivery-idempotent the `DedupIngest` way: the ledger view excludes
 * the batch's own directory, so a redelivered batch recomputes the
 * identical fetch list against the identical view and overwrites its
 * own directories with identical content — a no-op on the ledger's
 * logical state. Per-batch caches release once the fetch list is
 * durable (O(1) cache entries on a long-running crawl).
 */
object FrontierIngest {

  /** One frontier micro-batch through the ledger; exposed so a nightly
    * batch job shares the exact stream code path. */
  def applyBatch(batch: DataFrame, batchId: Long, storePath: String,
                 fetchPath: String,
                 urlCol: String = "url", idCol: String = "doc_id"): Unit =
    // Scoped, not clearAll: release only this batch's caches so
    // concurrent serving queries on the same session keep theirs.
    Caches.scoped {
      val fresh = FrontierStore.offer(batch, storePath,
        batchId = Some(s"stream$batchId"), urlCol, idCol)
      fresh.write.mode("overwrite").parquet(s"$fetchPath/batch=$batchId")
    }

  /** Start the frontier ingest: `entries` is a STREAMING DataFrame with
    * (urlCol, idCol) columns; the ledger must already exist
    * (`FrontierStore.write` — an empty base frontier is fine). */
  def start(entries: DataFrame, storePath: String, fetchPath: String,
            checkpointPath: String,
            urlCol: String = "url", idCol: String = "doc_id"): StreamingQuery = {
    val fn: (Dataset[Row], Long) => Unit =
      (batch, id) => applyBatch(batch.toDF(), id, storePath, fetchPath,
        urlCol, idCol)
    entries.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch(fn)
      .start()
  }
}
