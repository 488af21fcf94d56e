package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.core.Caches
import graft.store.Bm25Store

/**
 * Continuous retrieval-index maintenance — the streaming face of
 * `Bm25Store.append` (the crawl loop beside `DedupIngest` /
 * `LineDedupIngest` / `AnnIngest`): each document micro-batch lands its
 * postings/doclens/stats batch under a directory named by the BATCH ID,
 * so the stream fold equals calling `append` sequentially on the same
 * batches and a redelivered batch (foreachBatch replays after a crash)
 * OVERWRITES its own directory with identical content — a logical
 * no-op on the served index (spec-gated in `Bm25StoreSpec`'s
 * idempotence law; the streaming twin in `StreamingSpec`).
 *
 * Serving keeps running throughout: queries resolve the store's
 * committed batches at call time, and the marker-last append protocol
 * means a half-written batch is never visible.
 */
object Bm25Ingest {

  /** One document micro-batch into the index; exposed so a nightly batch
    * job shares the exact stream code path. */
  def applyBatch(batch: DataFrame, batchId: Long, storePath: String,
                 idCol: String = "doc_id", textCol: String = "text"): Unit =
    // Scoped, not clearAll: release only this batch's caches so
    // concurrent serving queries on the same session keep theirs.
    Caches.scoped {
      Bm25Store.append(batch, storePath, Some(s"stream$batchId"), idCol, textCol)
    }

  /** Start the index ingest: `docs` is a STREAMING DataFrame with
    * (idCol, textCol) columns; the store must already exist
    * (`Bm25Store.write` — an empty base corpus is fine). */
  def start(docs: DataFrame, storePath: String, checkpointPath: String,
            idCol: String = "doc_id", textCol: String = "text"): StreamingQuery = {
    val fn: (Dataset[Row], Long) => Unit =
      (batch, id) => applyBatch(batch.toDF(), id, storePath, idCol, textCol)
    docs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch(fn)
      .start()
  }
}
