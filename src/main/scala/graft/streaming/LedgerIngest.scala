package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.core.Caches
import graft.store.{FrequencyLedger, QuantileLedger}

/**
 * Continuous ledger maintenance — the streaming faces of
 * `QuantileLedger.append` and `FrequencyLedger.append` (the crawl loop
 * beside `Bm25Ingest` / `DedupIngest` / `LineDedupIngest`): each
 * micro-batch lands its bounded histogram / sketch-cell batch under a
 * directory named by the BATCH ID, so the stream fold equals calling
 * `append` sequentially on the same batches, and a redelivered batch
 * (foreachBatch replays after a crash) OVERWRITES its own directory
 * with identical content — a logical no-op on the served state. Both
 * folds are LOSSLESS (counts add), so streaming ingestion costs zero
 * accuracy: the served quantiles / frequencies equal the one-shot
 * batch computation over everything ingested (spec-gated in
 * `StreamingSpec`).
 *
 * Serving keeps running throughout: reads resolve committed batches at
 * call time, and the marker-last protocol means a half-written batch
 * is never visible.
 */
object LedgerIngest {

  /** One micro-batch into the quantile-histogram ledger; exposed so a
    * nightly batch job shares the exact stream code path. */
  def applyQuantileBatch(batch: DataFrame, batchId: Long, storePath: String,
                         scopeCol: String, valueCol: String): Unit =
    // Scoped, not clearAll: release only caches this batch created —
    // "serving keeps running throughout" means concurrent readers on the
    // same session must keep their own cached state.
    Caches.scoped {
      QuantileLedger.append(batch, storePath, scopeCol, valueCol,
        Some(s"stream$batchId"))
    }

  /** One micro-batch into the count-min frequency ledger. */
  def applyFrequencyBatch(batch: DataFrame, batchId: Long, storePath: String,
                          keyCol: String): Unit =
    Caches.scoped {
      FrequencyLedger.append(batch, storePath, keyCol, Some(s"stream$batchId"))
    }

  /** Start quantile-ledger ingest: `rows` is a STREAMING DataFrame with
    * (scopeCol, valueCol); the ledger must already exist
    * (`QuantileLedger.write` — an empty base is fine). */
  def startQuantiles(rows: DataFrame, storePath: String, checkpointPath: String,
                     scopeCol: String, valueCol: String): StreamingQuery = {
    val fn: (Dataset[Row], Long) => Unit =
      (b, id) => applyQuantileBatch(b.toDF(), id, storePath, scopeCol, valueCol)
    rows.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch(fn)
      .start()
  }

  /** Start frequency-ledger ingest. */
  def startFrequencies(rows: DataFrame, storePath: String,
                       checkpointPath: String, keyCol: String): StreamingQuery = {
    val fn: (Dataset[Row], Long) => Unit =
      (b, id) => applyFrequencyBatch(b.toDF(), id, storePath, keyCol)
    rows.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch(fn)
      .start()
  }
}
