package graft

import graft.store.Bm25Store
import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** Incremental BM25 index contract: the store-served top-k over
  * base ∪ delta equals the one-shot corpus scan bitwise (integer-exact
  * summed scalars), redelivery is idempotent, compaction invariant. */
class Bm25StoreSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark streams data fast spark"),
    (2L, "vector search over spark"),
    (3L, "stream processing with state"),
    (4L, "unrelated words entirely here"),
    (5L, ""), // empty doc still counts toward n_docs/avgdl
    (6L, "spark spark spark vector"),
    (7L, "stream stream vector")).toDF("doc_id", "text")
  private val terms = Seq("spark", "vector", "stream")

  private def served(store: String): Seq[(Long, Double)] =
    Bm25Store.topK(spark, store, terms, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("store-served top-k over base ∪ delta equals the one-shot corpus scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25s").toString
    val store = s"$dir/store"
    Bm25Store.write(docs.where(col("doc_id") <= 4), store)
    Bm25Store.append(docs.where(col("doc_id") > 4), store, Some("d1"))
    val oneShot = Retrieval.bm25TopK(docs, terms, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    served(store) shouldBe oneShot
    // scalars are exact: 7 docs, 24 tokens (5+4+4+4+0+4+3) → avgdl 24/7
    val st = Bm25Store.stats(spark, store).collect()(0)
    st.getLong(0) shouldBe 7L
    st.getDouble(1) shouldBe (24.0 / 7.0) +- 1e-12
  }

  test("redelivery under the same batch name is idempotent; compaction changes nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25s2").toString
    val store = s"$dir/store"
    Bm25Store.write(docs.where(col("doc_id") <= 4), store)
    Bm25Store.append(docs.where(col("doc_id") > 4), store, Some("d1"))
    val first = served(store)
    Bm25Store.append(docs.where(col("doc_id") > 4), store, Some("d1")) // crash retry
    served(store) shouldBe first
    Bm25Store.compact(spark, store)
    served(store) shouldBe first
    // post-compaction appends still fold
    Bm25Store.append(Seq((8L, "vector stream")).toDF("doc_id", "text"), store)
    val all = docs.unionByName(Seq((8L, "vector stream")).toDF("doc_id", "text"))
    served(store) shouldBe Retrieval.bm25TopK(all, terms, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  test("empty-query and reserved batch name fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25s3").toString
    val store = s"$dir/store"
    Bm25Store.write(docs, store)
    an[IllegalArgumentException] should be thrownBy
      Bm25Store.topK(spark, store, Seq.empty, 5)
    an[IllegalArgumentException] should be thrownBy
      Bm25Store.append(docs, store, Some("base"))
  }
}
