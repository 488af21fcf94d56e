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
  val PqCodebooks = "pq_codebooks"
  val IvfPqCentroids = "ivf_pq_centroids"
  val IvfPqLists = "ivf_pq_lists"

  /** Build + persist the SRP index (planes table + bucketed corpus). The
    * bucket table is VERSIONED (`srp_buckets/v<k>` + `LATEST` marker, see
    * `Compaction`) so compaction swaps are invisible to live readers; the
    * plane table is tiny, immutable after init, and stays flat. */
  def writeSrp(corpus: DataFrame, planes: Seq[Seq[Int]], storePath: String): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    planes.zipWithIndex
      .map { case (p, i) => (i, p.map(_.toFloat)) }
      .toDF("plane_id", "weights")
      .coalesce(1).write.mode("overwrite").parquet(s"$storePath/$SrpPlanes")
    val root = s"$storePath/$SrpBuckets"
    SimilaritySearch.withBucket(graft.core.Spread.byKey(corpus, col("vec_id")), planes)
      .select(col("vec_id"), col("embedding"),
        SimilaritySearch.l2Norm(col("embedding")).as("nrm"), col("bucket"))
      .repartition(col("bucket")).sortWithinPartitions("bucket", "vec_id")
      .write.mode("overwrite").parquet(Compaction.initDir(root))
    Compaction.commit(spark, root, 0L)
  }

  /** Build + persist the IVF index (centroids + inverted lists). The
    * centroid table may be the deterministic sample (`ivfCentroids`) or a
    * trained one (`trainedCentroids`) — the layout is identical. */
  def writeIvf(corpus: DataFrame, cents: DataFrame, storePath: String): Unit = {
    val c = graft.core.Caches.cacheOnce(cents) // feeds the write AND the lists build
    c.coalesce(1).write.mode("overwrite").parquet(s"$storePath/$IvfCentroids")
    val root = s"$storePath/$IvfLists"
    SimilaritySearch.ivfLists(corpus, c)
      .repartition(col("cent_id")).sortWithinPartitions("cent_id", "vec_id")
      .write.mode("overwrite").parquet(Compaction.initDir(root))
    Compaction.commit(corpus.sparkSession, root, 0L)
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
    SimilaritySearch.withBucket(graft.core.Spread.byKey(delta, col("vec_id")),
        readPlanes(spark, storePath))
      .select(col("vec_id"), col("embedding"),
        SimilaritySearch.l2Norm(col("embedding")).as("nrm"), col("bucket"))
      .repartition(col("bucket")).sortWithinPartitions("bucket", "vec_id")
      .write.mode("append")
      .parquet(Compaction.currentDir(spark, s"$storePath/$SrpBuckets"))
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
      .write.mode("append")
      .parquet(Compaction.currentDir(spark, s"$storePath/$IvfLists"))
  }

  /** Build + persist the IVF-PQ index — the billion-vector deployment
    * shape (SimilaritySearch.ivfPqServe): deterministic PQ codebooks,
    * the corpus PQ-encoded, inverted lists assigned over the
    * RECONSTRUCTED vectors (what the index serves, mirroring the int8-IVF
    * stance of q97), each list row carrying the m codes + the
    * reconstruction norm — m bytes/vector at scale instead of 4·dim.
    * Centroids are the deterministic sample of the reconstruction. The
    * list table is versioned like the other index tables. */
  def writeIvfPq(corpus: DataFrame, m: Int, dim: Int, codeMod: Int,
                 centroidMod: Int, storePath: String): Unit = {
    val spark = corpus.sparkSession
    val books = graft.core.Caches.cacheOnce(
      SimilaritySearch.pqCodebooks(corpus, m, dim, codeMod))
    books.coalesce(1).write.mode("overwrite").parquet(s"$storePath/$PqCodebooks")
    val codes = SimilaritySearch.pqEncode(corpus, books, m, dim)
    // one shuffle keyed on vec_id packs codes AND reassembles the served
    // reconstruction (needed once here for assignment + stored norm)
    val packed = graft.core.Caches.cacheOnce(codes
      .join(broadcast(books), Seq("sub_id", "code_id"))
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(
        struct(col("sub_id"), col("code_id"), col("code_emb")))).as("scl"))
      .select(col("vec_id"),
        transform(col("scl"), x => x.getField("code_id")).as("codes"),
        flatten(transform(col("scl"), x => x.getField("code_emb"))).as("embedding")))
    val cents = graft.core.Caches.cacheOnce(
      SimilaritySearch.ivfCentroids(packed.select(col("vec_id"), col("embedding")), centroidMod))
    // own centroid table — an IVF-PQ index can share a store path with a
    // plain IVF index (whose centroids sample the RAW corpus, not the
    // reconstruction) without the two clobbering each other
    cents.coalesce(1).write.mode("overwrite").parquet(s"$storePath/$IvfPqCentroids")
    val root = s"$storePath/$IvfPqLists"
    SimilaritySearch.ivfLists(packed.select(col("vec_id"), col("embedding")), cents)
      .select(col("cent_id"), col("vec_id"), col("nrm"))
      .join(packed.select(col("vec_id"), col("codes")), Seq("vec_id"))
      .repartition(col("cent_id")).sortWithinPartitions("cent_id", "vec_id")
      .write.mode("overwrite").parquet(Compaction.initDir(root))
    Compaction.commit(spark, root, 0L)
  }

  /** IVF-PQ top-k served from the persisted index: queries rank against
    * the stored centroids, probed lists decode against the stored
    * codebooks, ADC scoring via the reconstruction (`ivfPqServe`). */
  def ivfPqTopK(spark: SparkSession, storePath: String, queries: DataFrame,
                nprobe: Int, k: Int): DataFrame =
    SimilaritySearch.ivfPqServe(
      readTree(spark, s"$storePath/$IvfPqLists"),
      spark.read.parquet(s"$storePath/$PqCodebooks"),
      spark.read.parquet(s"$storePath/$IvfPqCentroids"),
      queries, nprobe, k)

  /** Compact the IVF-PQ coded-list table (see `compactSrp`). */
  def compactIvfPq(spark: SparkSession, storePath: String): Unit =
    compactTable(spark, s"$storePath/$IvfPqLists", "cent_id")

  /** The persisted hyperplanes, reconstructed for query-side bucketing
    * (collect is bounded by L — the plane count, not the corpus). */
  def readPlanes(spark: SparkSession, storePath: String): Seq[Seq[Int]] =
    spark.read.parquet(s"$storePath/$SrpPlanes")
      .orderBy(col("plane_id"))
      .collect()
      .map(_.getSeq[Float](1).map(_.toInt).toSeq)
      .toSeq

  /** A versioned table's SERVED version may hold flat files (batch
    * writes/appends) plus `batch=<id>` subdirectories (streaming ingest,
    * `AnnIngest`) — read the whole version tree as one table, skipping
    * partition inference. The marker resolves ONCE here, so a frame built
    * over this stays on its version however often it re-evaluates, even
    * across a concurrent compaction (the previous version is retained —
    * `Compaction`'s reader guarantee). */
  private def readTree(spark: SparkSession, path: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true")
      .parquet(Compaction.currentDir(spark, path))

  /** Compact the SRP bucket table: fold every append file and streaming
    * `batch=<id>` subdirectory into one freshly-partitioned flat layout.
    * High batch counts hit the small-files wall — `readTree`'s recursive
    * listing and one parquet footer per tiny file dominate serving cost
    * long before data size does; compaction restores the single
    * bucket-partitioned, in-file-sorted layout `writeSrp` produces, so
    * row-group pruning covers the whole corpus again. Served top-k is
    * IDENTICAL before and after (same rows, same layout contract —
    * spec-gated). The swap is the versioned marker-last protocol
    * (`Compaction`): concurrent READERS are safe — open frames keep their
    * resolved version, new frames see old-or-new, never a half tree;
    * only concurrent APPENDS must pause around the compaction. */
  def compactSrp(spark: SparkSession, storePath: String): Unit =
    compactTable(spark, s"$storePath/$SrpBuckets", "bucket")

  /** Compact the IVF inverted-list table (see `compactSrp`). */
  def compactIvf(spark: SparkSession, storePath: String): Unit =
    compactTable(spark, s"$storePath/$IvfLists", "cent_id")

  private def compactTable(spark: SparkSession, path: String, key: String): Unit =
    Compaction.compact(spark, path) { cur =>
      spark.read.option("recursiveFileLookup", "true").parquet(cur)
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
