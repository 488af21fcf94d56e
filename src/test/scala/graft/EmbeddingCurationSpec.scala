package graft

import graft.operators.{EmbeddingCuration, SimilaritySearch}
import org.apache.spark.sql.functions._

/** Hand-computed witnesses for the embedding-curation faces (q129-q131):
  * cluster-balanced sampling, hard-negative mining, kNN label eval. */
class EmbeddingCurationSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters on the x/y axes plus labels; label 0 = x-ish,
  // label 1 = y-ish, with vec 6 mislabeled to exercise the eval
  private val embs = Seq(
    (1L, Seq(1.0f, 0.0f), 0),
    (2L, Seq(0.95f, 0.05f), 0),
    (3L, Seq(0.9f, 0.1f), 0),
    (4L, Seq(0.0f, 1.0f), 1),
    (5L, Seq(0.05f, 0.95f), 1),
    (6L, Seq(0.1f, 0.9f), 0))
    .toDF("vec_id", "embedding", "label")

  test("clusterBalancedSample caps dominant clusters, keeps sparse ones whole") {
    // centroids = vecs 1 (x-axis) and 4 (y-axis)
    val cents = embs.where(col("vec_id").isin(1L, 4L))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"),
        SimilaritySearch.l2Norm(col("embedding")).as("cent_nrm"))
    val kept = EmbeddingCuration.clusterBalancedSample(embs, cents, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byCluster = kept.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // x-cluster {1,2,3} capped at 2; y-cluster {4,5,6} capped at 2
    byCluster(1L).size shouldBe 2
    byCluster(4L).size shouldBe 2
    assert(byCluster(1L).subsetOf(Set(1L, 2L, 3L)))
    assert(byCluster(4L).subsetOf(Set(4L, 5L, 6L)))
    kept.foreach { case (_, _, rnk) => assert(rnk >= 1 && rnk <= 2) }
    // deterministic: the same call keeps the same ids
    val again = EmbeddingCuration.clusterBalancedSample(embs, cents, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    again shouldBe kept.map(t => (t._1, t._2)).toSet
  }

  test("hardNegatives returns only differing-label neighbors, nearest first") {
    val q = embs.where(col("vec_id") === 1L)
    val got = EmbeddingCuration.hardNegatives(q, embs, 2).collect()
      .map(r => (r.getLong(1), r.getInt(2)))
    // label-0 query: negatives are 4 and 5 (label 1); 5 is closer to x
    got.map(_._2).foreach(_ shouldBe 1)
    got.map(_._1).toSeq shouldBe Seq(5L, 4L)
  }

  test("knnLabelEval majority-votes and reports per-label accuracy") {
    // k=3, all 6 as queries. Hand-walk: queries 1,2,3 see their x-cluster
    // peers -> pred 0, correct. The mislabeled vec 6 poisons the
    // y-cluster: queries 4 and 5 each see {the other y-vec, 6(label 0),
    // one x-vec} -> votes 0:2 vs 1:1 -> pred 0, BOTH wrong; query 6's
    // own 3-NN are y-vectors -> pred 1, wrong for its label 0.
    val out = EmbeddingCuration.knnLabelEval(embs, embs, 3).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    out(0)._1 shouldBe 4L // labels: four 0s (1,2,3,6), two 1s
    out(1)._1 shouldBe 2L
    out(0)._2 shouldBe 0.75 +- 1e-9 // 1,2,3 right; 6 wrong
    out(1)._2 shouldBe 0.0 +- 1e-9 // 4 and 5 both outvoted by the mislabel
  }
}
