package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.SimilaritySearch

/**
 * Persisted ANN index — the serving analogue of `SimilarityStore` for the
 * embedding tier. The computed structures the ANN operators build per
 * query (SRP buckets, IVF centroid assignments) are written ONCE in the
 * store layout and served from parquet, so a serving query costs a
 * bucket/list hash join against the persisted index instead of
 * recomputing buckets or assignments over the corpus:
 *
 *  - `srp_planes`   (plane_id, weights)            — the ±1 hyperplanes,
 *    persisted so the index is self-describing: serving re-buckets only
 *    the (tiny, broadcast) query set with the SAME planes;
 *  - `srp_buckets`  (vec_id, embedding, nrm, bucket) — partitioned and
 *    in-file sorted by bucket → row-group pruning on the bucket key;
 *  - `ivf_centroids`(cent_id, cent_emb, cent_nrm)  — nlist rows;
 *  - `ivf_lists`    (cent_id, vec_id, embedding, nrm) — partitioned and
 *    in-file sorted by cent_id.
 *
 * Served results are IDENTICAL to the freshly-computed `lshTopK` /
 * `ivfTopK` (same kernels, same persisted norms — gated by q55 against
 * the q26/q34 oracles). At 100 TB the index build is the one pass over
 * the corpus; serving touches only the probed buckets/lists.
 */
object AnnStore {

  val SrpPlanes = "srp_planes"
  val SrpBuckets = "srp_buckets"
  val IvfCentroids = "ivf_centroids"
  val IvfLists = "ivf_lists"

  /** Build + persist the SRP index (planes table + bucketed corpus). */
  def writeSrp(corpus: DataFrame, planes: Seq[Seq[Int]], storePath: String): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    planes.zipWithIndex
      .map { case (p, i) => (i, p.map(_.toFloat)) }
      .toDF("plane_id", "weights")
      .coalesce(1).write.mode("overwrite").parquet(s"$storePath/$SrpPlanes")
    SimilaritySearch.withBucket(corpus.repartition(col("vec_id")), planes)
      .select(col("vec_id"), col("embedding"),
        SimilaritySearch.l2Norm(col("embedding")).as("nrm"), col("bucket"))
      .repartition(col("bucket")).sortWithinPartitions("bucket", "vec_id")
      .write.mode("overwrite").parquet(s"$storePath/$SrpBuckets")
  }

  /** Build + persist the IVF index (centroids + inverted lists). The
    * centroid table may be the deterministic sample (`ivfCentroids`) or a
    * trained one (`trainedCentroids`) — the layout is identical. */
  def writeIvf(corpus: DataFrame, cents: DataFrame, storePath: String): Unit = {
    val c = graft.core.Caches.cacheOnce(cents) // feeds the write AND the lists build
    c.coalesce(1).write.mode("overwrite").parquet(s"$storePath/$IvfCentroids")
    SimilaritySearch.ivfLists(corpus, c)
      .repartition(col("cent_id")).sortWithinPartitions("cent_id", "vec_id")
      .write.mode("overwrite").parquet(s"$storePath/$IvfLists")
  }

  /** Append a delta corpus to the persisted SRP index. The delta is
    * bucketed with the PERSISTED planes, so the refreshed bucket table is
    * row-identical to rebuilding over base ∪ delta (bucketing is
    * per-vector); appended files carry the same in-file bucket sort, so
    * row-group pruning still holds per file. The incremental-maintenance
    * path for the ANN tier: an ingest batch costs one pass over the
    * DELTA, never a corpus rebuild. */
  def appendSrp(delta: DataFrame, storePath: String): Unit = {
    val spark = delta.sparkSession
    SimilaritySearch.withBucket(delta.repartition(col("vec_id")),
        readPlanes(spark, storePath))
      .select(col("vec_id"), col("embedding"),
        SimilaritySearch.l2Norm(col("embedding")).as("nrm"), col("bucket"))
      .repartition(col("bucket")).sortWithinPartitions("bucket", "vec_id")
      .write.mode("append").parquet(s"$storePath/$SrpBuckets")
  }

  /** Append a delta corpus to the persisted IVF index: delta vectors are
    * assigned against the PERSISTED centroids (assignment is per-vector,
    * so refreshed lists == lists rebuilt over base ∪ delta with the same
    * centroid table) and appended to the list files. Centroids drift as
    * deltas accumulate — recall-gate with the q41 machinery and re-train
    * when it degrades; exactness of the SERVED result vs the current
    * centroid table is unconditional. */
  def appendIvf(delta: DataFrame, storePath: String): Unit = {
    val spark = delta.sparkSession
    SimilaritySearch.ivfLists(delta,
        spark.read.parquet(s"$storePath/$IvfCentroids"))
      .repartition(col("cent_id")).sortWithinPartitions("cent_id", "vec_id")
      .write.mode("append").parquet(s"$storePath/$IvfLists")
  }

  /** The persisted hyperplanes, reconstructed for query-side bucketing
    * (collect is bounded by L — the plane count, not the corpus). */
  def readPlanes(spark: SparkSession, storePath: String): Seq[Seq[Int]] =
    spark.read.parquet(s"$storePath/$SrpPlanes")
      .orderBy(col("plane_id"))
      .collect()
      .map(_.getSeq[Float](1).map(_.toInt).toSeq)
      .toSeq

  /** Bucket/list tables may hold flat files (batch writes/appends) plus
    * `batch=<id>` subdirectories (streaming ingest, `AnnIngest`) — read
    * the whole tree as one table, skipping partition inference. */
  private def readTree(spark: SparkSession, path: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(path)

  /** Compact the SRP bucket table: fold every append file and streaming
    * `batch=<id>` subdirectory into one freshly-partitioned flat layout.
    * High batch counts hit the small-files wall — `readTree`'s recursive
    * listing and one parquet footer per tiny file dominate serving cost
    * long before data size does; compaction restores the single
    * bucket-partitioned, in-file-sorted layout `writeSrp` produces, so
    * row-group pruning covers the whole corpus again. Served top-k is
    * IDENTICAL before and after (same rows, same layout contract —
    * spec-gated). Run OFFLINE: the swap is not atomic for concurrent
    * readers (a serving query between the two renames fails and is
    * retried); on a real deployment the swap would be a metastore /
    * table-format pointer flip instead. */
  def compactSrp(spark: SparkSession, storePath: String): Unit =
    compactTable(spark, s"$storePath/$SrpBuckets", "bucket")

  /** Compact the IVF inverted-list table (see `compactSrp`). */
  def compactIvf(spark: SparkSession, storePath: String): Unit =
    compactTable(spark, s"$storePath/$IvfLists", "cent_id")

  private def compactTable(spark: SparkSession, path: String, key: String): Unit =
    Compaction.rewriteInPlace(path) {
      readTree(spark, path)
        .repartition(col(key)).sortWithinPartitions(key, "vec_id")
    }

  /** SRP top-k served from the persisted index: queries are bucketed with
    * the stored planes and hash-joined against the bucket table. */
  def srpTopK(spark: SparkSession, storePath: String, queries: DataFrame,
              k: Int): DataFrame =
    SimilaritySearch.srpServe(
      readTree(spark, s"$storePath/$SrpBuckets"),
      queries, readPlanes(spark, storePath), k)

  /** IVF top-k served from the persisted index: queries rank against the
    * stored centroids and probe the persisted inverted lists. */
  def ivfTopK(spark: SparkSession, storePath: String, queries: DataFrame,
              nprobe: Int, k: Int): DataFrame =
    SimilaritySearch.ivfServe(
      readTree(spark, s"$storePath/$IvfLists"),
      spark.read.parquet(s"$storePath/$IvfCentroids"),
      queries, nprobe, k)
}
