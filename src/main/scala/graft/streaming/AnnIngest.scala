package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.store.AnnStore

/**
 * Continuous ANN index maintenance — the streaming face of
 * `AnnStore.appendSrp/appendIvf` (EXT-A9): fold a micro-batched vector
 * stream into the persisted index with `foreachBatch`. Each batch is
 * bucketed/assigned against the PERSISTED planes/centroids (one pass
 * over the batch, the corpus is never rebuilt) and lands through the
 * store's marker-committed batch protocol under the name
 * `stream_<batchId>` — a redelivered batch after a crash is a no-op
 * once its `_committed_` marker exists (assignment is deterministic per
 * vector, so the committed content IS what the retry would write), and
 * a batch that crashed BEFORE the marker is invisible to readers and
 * cleanly overwritten by the retry.
 *
 * Serving (`AnnStore.readTree`) reads exactly the committed batch
 * directories of the served version, so base files and streamed batches
 * serve through the same path, and results stay identical to an index
 * built over everything at once (per-vector assignment — q75's
 * contract). Each batch takes the store writer lease for its duration —
 * an ingest racing an offline compaction now fails loudly instead of
 * landing rows in a superseded version.
 */
object AnnIngest {

  /** Assign one vector micro-batch against the persisted IVF centroids
    * and land it as the committed batch `stream_<id>`. Shares the exact
    * serving layout (cent_id-partitioned, in-file sorted). */
  def applyIvfBatch(batch: DataFrame, batchId: Long, storePath: String): Unit =
    AnnStore.appendIvf(batch, storePath, batchName = Some(s"stream_$batchId"))

  /** Bucket one vector micro-batch with the persisted SRP planes and
    * land it as the committed batch `stream_<id>`. */
  def applySrpBatch(batch: DataFrame, batchId: Long, storePath: String): Unit =
    AnnStore.appendSrp(batch, storePath, batchName = Some(s"stream_$batchId"))

  /** Start continuous IVF ingest: `vectors` is a STREAMING DataFrame with
    * (vec_id, embedding) columns; the store must already hold a centroid
    * table (from `AnnStore.writeIvf`). */
  def startIvf(vectors: DataFrame, storePath: String,
               checkpointPath: String): StreamingQuery = {
    val fn: (Dataset[Row], Long) => Unit =
      (batch, id) => applyIvfBatch(batch.toDF(), id, storePath)
    vectors.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch(fn)
      .start()
  }

  /** Start continuous SRP ingest (store must hold a plane table). */
  def startSrp(vectors: DataFrame, storePath: String,
               checkpointPath: String): StreamingQuery = {
    val fn: (Dataset[Row], Long) => Unit =
      (batch, id) => applySrpBatch(batch.toDF(), id, storePath)
    vectors.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch(fn)
      .start()
  }
}
