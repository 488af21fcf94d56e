package graft

import org.apache.spark.sql.functions._
import graft.store.MomentsLedger

/** Moments ledger: additive fold equals the one-shot pass on the 1e-9
  * covariance grid, redelivery idempotence, compaction invariance,
  * dimension-mismatch rejection. */
class MomentsLedgerSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(ids: Range, d: Int = 4) = ids.map { i =>
    (i.toLong, Seq.tabulate(d)(k => ((i * 31 + k * 7) % 13).toFloat - 6.0f))
  }.toDF("vec_id", "embedding")

  private def covMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      ((r.getLong(2), r.getDouble(3)))).toMap

  test("split appends serve the one-shot covariance; redelivery and compaction no-ops") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mom1").toString
    val store = s"$dir/store"
    val all = vecs(1 to 90)
    MomentsLedger.write(all.where(col("vec_id") % 3 === 1), store, "embedding", 4)
    val d2 = all.where(col("vec_id") % 3 === 2)
    MomentsLedger.append(d2, store, "embedding", 4, Some("d2"))
    MomentsLedger.append(all.where(col("vec_id") % 3 === 0), store, "embedding", 4)
    val oneShot = covMap(graft.operators.Pca.covarianceLong(all, "embedding", 4))
    covMap(MomentsLedger.covarianceLong(spark, store, 4)) shouldBe oneShot
    MomentsLedger.append(d2, store, "embedding", 4, Some("d2")) // crash retry
    covMap(MomentsLedger.covarianceLong(spark, store, 4)) shouldBe oneShot
    MomentsLedger.compact(spark, store)
    covMap(MomentsLedger.covarianceLong(spark, store, 4)) shouldBe oneShot
    // post-compaction appends keep folding
    val extra = vecs(91 to 120)
    MomentsLedger.append(extra, store, "embedding", 4)
    covMap(MomentsLedger.covarianceLong(spark, store, 4)) shouldBe
      covMap(graft.operators.Pca.covarianceLong(
        all.unionByName(extra), "embedding", 4))
  }

  test("dimension mismatch between batches fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mom2").toString
    val store = s"$dir/store"
    MomentsLedger.write(vecs(1 to 10, d = 4), store, "embedding", 4)
    MomentsLedger.append(vecs(11 to 20, d = 3), store, "embedding", 3)
    an[IllegalArgumentException] should be thrownBy
      MomentsLedger.served(spark, store)
  }
}
