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
 *
 * Batch directories land INSIDE the currently-served version of the
 * versioned table (`Compaction.currentDir`); like all appends, the ingest
 * must PAUSE around an offline compaction (the rewrite is a point-in-time
 * copy — a batch racing the swap would land in the superseded version).
 */
object AnnIngest {

  /** Assign one vector micro-batch against the persisted IVF centroids
    * and land it as `batch=<id>`. Shares the exact serving layout
    * (cent_id-partitioned, in-file sorted). */
  def applyIvfBatch(batch: DataFrame, batchId: Long, storePath: String): Unit = {
    val spark = batch.sparkSession
    val cents = spark.read.parquet(s"$storePath/${AnnStore.IvfCentroids}")
    val cur = graft.store.Compaction.currentDir(spark, s"$storePath/${AnnStore.IvfLists}")
    SimilaritySearch.ivfLists(batch, cents)
      .repartition(col("cent_id")).sortWithinPartitions("cent_id", "vec_id")
      .write.mode("overwrite")
      .parquet(s"$cur/batch=$batchId")
  }

  /** Bucket one vector micro-batch with the persisted SRP planes and
    * land it as `batch=<id>`. */
  def applySrpBatch(batch: DataFrame, batchId: Long, storePath: String): Unit = {
    val spark = batch.sparkSession
    val planes = AnnStore.readPlanes(spark, storePath)
    val cur = graft.store.Compaction.currentDir(spark, s"$storePath/${AnnStore.SrpBuckets}")
    SimilaritySearch.withBucket(graft.core.Spread.byKey(batch, col("vec_id")), planes)
      .select(col("vec_id"), col("embedding"),
        SimilaritySearch.l2Norm(col("embedding")).as("nrm"), col("bucket"))
      .repartition(col("bucket")).sortWithinPartitions("bucket", "vec_id")
      .write.mode("overwrite")
      .parquet(s"$cur/batch=$batchId")
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
