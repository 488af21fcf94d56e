package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.SimilaritySearch
import graft.store.AnnStore

/**
 * Continuous ANN index maintenance — the streaming face of
 * `AnnStore.appendSrp/appendIvf` (EXT-A9): fold a micro-batched vector
 * stream into the persisted index with `foreachBatch`. Each batch is
 * bucketed/assigned against the PERSISTED planes/centroids (one pass
 * over the batch, the corpus is never rebuilt) and lands in its own
 * `batch=<id>` subdirectory written in OVERWRITE mode — so a redelivered
 * batch after a crash rewrites the same directory with identical content
 * instead of double-appending. No marker file is needed: the write
 * itself is idempotent.
 *
 * Serving reads the index tree recursively (`AnnStore` sets
 * `recursiveFileLookup`), so base files and batch subdirectories serve
 * through the same path, and results stay identical to an index built
 * over everything at once (per-vector assignment — q75's contract).
 */
object AnnIngest {

  /** Assign one vector micro-batch against the persisted IVF centroids
    * and land it as `batch=<id>`. Shares the exact serving layout
    * (cent_id-partitioned, in-file sorted). */
  def applyIvfBatch(batch: DataFrame, batchId: Long, storePath: String): Unit = {
    val cents = batch.sparkSession.read
      .parquet(s"$storePath/${AnnStore.IvfCentroids}")
    SimilaritySearch.ivfLists(batch, cents)
      .repartition(col("cent_id")).sortWithinPartitions("cent_id", "vec_id")
      .write.mode("overwrite")
      .parquet(s"$storePath/${AnnStore.IvfLists}/batch=$batchId")
  }

  /** Bucket one vector micro-batch with the persisted SRP planes and
    * land it as `batch=<id>`. */
  def applySrpBatch(batch: DataFrame, batchId: Long, storePath: String): Unit = {
    val planes = AnnStore.readPlanes(batch.sparkSession, storePath)
    SimilaritySearch.withBucket(batch.repartition(col("vec_id")), planes)
      .select(col("vec_id"), col("embedding"),
        SimilaritySearch.l2Norm(col("embedding")).as("nrm"), col("bucket"))
      .repartition(col("bucket")).sortWithinPartitions("bucket", "vec_id")
      .write.mode("overwrite")
      .parquet(s"$storePath/${AnnStore.SrpBuckets}/batch=$batchId")
  }

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
