package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.hash60
import graft.operators.SimilaritySearch.{cosineWithNorms, l2Norm}

/**
 * Embedding-side corpus curation: cluster-balanced downsampling,
 * contrastive hard-negative mining, and kNN label evaluation — the three
 * faces a training-data pipeline runs over its embedding table between
 * dedup and training (diversity-preserving pruning; building contrastive
 * training pairs; sanity-scoring the embedding space against labels).
 *
 * All three ride the engine's existing ANN kernels: centroid assignment
 * is the IVF inverted-list build (corpus shuffles once by centroid),
 * neighbor scoring broadcasts the bounded query panel against the corpus
 * and ranks inside per-query windows — never an unpartitioned sort.
 */
object EmbeddingCuration {

  /** Cluster-balanced downsampling: file every vector under its nearest
    * centroid (the IVF assignment), keep a deterministic per-cluster
    * sample of at most `perClusterQuota` (rank by md5-derived hash of the
    * vec id — engine-reproducible, no RNG state). The diversity-
    * preserving alternative to uniform sampling: dominant clusters are
    * capped, sparse clusters survive whole.
    * Output: (cent_id, vec_id, rnk ≤ quota) — the kept corpus.
    * Scale: one corpus shuffle (by centroid), per-cluster windows. */
  def clusterBalancedSample(corpus: DataFrame, cents: DataFrame,
                            perClusterQuota: Int): DataFrame = {
    require(perClusterQuota > 0, "clusterBalancedSample: quota must be positive")
    val assigned = SimilaritySearch.ivfLists(corpus, cents)
      .select(col("cent_id"), col("vec_id"))
    val w = Window.partitionBy(col("cent_id"))
      .orderBy(hash60(col("vec_id").cast("string")), col("vec_id"))
    assigned.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= perClusterQuota)
  }

  /** Exact neighbor panel: every (query, corpus) cosine with both labels,
    * self-pairs excluded. Queries broadcast (bounded panel). */
  private def scoredWithLabels(queries: DataFrame, corpus: DataFrame): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"), l2Norm(col("embedding")).as("q_nrm"),
      col("label").as("q_label")))
    graft.core.Spread.byKey(corpus, col("vec_id"))
      .select(col("vec_id"), col("label"), col("embedding"),
        l2Norm(col("embedding")).as("nrm"))
      .crossJoin(q)
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("q_label"), col("vec_id"), col("label"),
        cosineWithNorms(col("q_emb"), col("embedding"), col("q_nrm"), col("nrm"))
          .as("cos"))
  }

  /** Contrastive hard-negative mining: for each query, the `k` most
    * similar corpus vectors whose label DIFFERS from the query's — the
    * near-boundary negatives contrastive training wants (easy negatives
    * teach nothing; same-label neighbors are positives, not negatives).
    * Output: (query_id, vec_id, label, cos). */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc_nulls_last, col("vec_id"))
    scoredWithLabels(queries, corpus)
      .where(col("label") =!= col("q_label"))
      .withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("label"), col("cos"))
  }

  /** kNN label evaluation: predict each query's label by majority vote
    * over its `k` exact nearest neighbors (ties → smallest label), then
    * report per-true-label accuracy — the standard embedding-space
    * sanity check before a corpus's vectors are trusted for retrieval
    * or dedup. Output: (label, n_queries, acc). */
  def knnLabelEval(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc_nulls_last, col("vec_id"))
    val votes = scoredWithLabels(queries, corpus)
      .withColumn("rnk", row_number().over(wTop)).where(col("rnk") <= k)
      .groupBy(col("query_id"), col("q_label"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val wVote = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label"))
    votes.withColumn("vrnk", row_number().over(wVote)).where(col("vrnk") === 1)
      .select(col("query_id"), col("q_label"), col("label").as("pred"))
      .groupBy(col("q_label"))
      .agg(count(lit(1)).as("n_queries"),
        round(sum(when(col("pred") === col("q_label"), 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 6).as("acc"))
      .select(col("q_label").as("label"), col("n_queries"), col("acc"))
  }
}
