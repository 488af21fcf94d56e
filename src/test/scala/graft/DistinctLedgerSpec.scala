package graft

import graft.store.DistinctLedger
import org.apache.spark.sql.functions._

/** HLL distinct ledger: split-invariant union, redelivery idempotence,
  * compaction invariance, small-set exactness. */
class DistinctLedgerSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("en", "a"), ("en", "b"), ("en", "b"), ("en", "c"),
    ("fr", "a"), ("fr", "a"), ("fr", "x"))
    .toDF("lang", "v")

  private def est(store: String): Map[String, Long] =
    DistinctLedger.estimates(spark, store)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("union of per-batch sketches == sketch of the union; small sets exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hll1").toString
    val (split, whole) = (s"$dir/split", s"$dir/whole")
    DistinctLedger.write(rows.where(col("v") <= "b"), split, "lang", "v")
    DistinctLedger.append(rows.where(col("v") > "b"), split, "lang", "v")
    DistinctLedger.write(rows, whole, "lang", "v")
    est(split) shouldBe est(whole) // register-max union is lossless
    est(split) shouldBe Map("en" -> 3L, "fr" -> 2L) // HLL sparse mode: exact here
  }

  test("redelivery overwrites in place; compaction folds without changing estimates") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hll2").toString
    val store = s"$dir/store"
    DistinctLedger.write(rows.where(col("lang") === "en"), store, "lang", "v")
    val delta = rows.where(col("lang") === "fr")
    DistinctLedger.append(delta, store, "lang", "v", Some("d1"))
    val before = est(store)
    DistinctLedger.append(delta, store, "lang", "v", Some("d1")) // crash retry
    est(store) shouldBe before
    DistinctLedger.compact(spark, store)
    est(store) shouldBe before
    // the compacted version carries exactly one base row per scope
    val vdir = graft.store.Compaction.currentDir(spark,
      s"$store/${DistinctLedger.Root}")
    spark.read.parquet(s"$vdir/batch_base").count() shouldBe 2L
    // post-compaction appends keep folding
    DistinctLedger.append(Seq(("fr", "y")).toDF("lang", "v"), store, "lang", "v")
    est(store)("fr") shouldBe 3L
  }
}
