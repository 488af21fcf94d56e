package graft

import graft.core.{Correlation, Crosstab, Incremental}
import org.apache.spark.sql.functions._

/** Incremental maintenance contract: (1) merged sufficient statistics are
  * BIT-identical to a full rebuild over the unioned occurrence log — on
  * randomized logs with overlapping contexts and cells; (2) the delta
  * update plan never scans the base occurrence history, only the
  * persisted summaries + the delta. */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def rebuildPairs(occ: Seq[(Long, Long)]) =
    Correlation.sparsePairs(Crosstab.build(occ.toDF("item_id", "reference_id")))

  private def incrementalPairs(base: Seq[(Long, Long)], delta: Seq[(Long, Long)]) = {
    val b = Incremental.fromOccurrences(base.toDF("item_id", "reference_id"))
    Incremental.pairs(Incremental.update(b, delta.toDF("item_id", "reference_id")))
  }

  test("update == full rebuild, bit-for-bit, on randomized logs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 150 + rnd.nextInt(100)
      val all = Seq.fill(n)((rnd.nextInt(12).toLong, rnd.nextInt(20).toLong))
      // Delta = a random slice: shares contexts AND exact cells with base.
      val (base, delta) = all.partition(_ => rnd.nextBoolean())
      val got = pairMap(incrementalPairs(base, delta))
      val want = pairMap(rebuildPairs(all))
      assert(got == want, s"trial $trial: incremental != rebuild")
    }
  }

  test("update handles brand-new items, brand-new contexts, and empty deltas") {
    val base = Seq((1L, 10L), (2L, 10L), (1L, 11L), (3L, 11L))
    // new item 9, new context 99, plus a repeat of an existing cell
    val delta = Seq((9L, 10L), (1L, 99L), (9L, 99L), (1L, 10L))
    pairMap(incrementalPairs(base, delta)) shouldBe pairMap(rebuildPairs(base ++ delta))
    // empty delta → identical statistics
    pairMap(incrementalPairs(base, Seq.empty)) shouldBe pairMap(rebuildPairs(base))
  }

  test("delta update plan reads summaries + delta only — never the base log") {
    val dir = java.nio.file.Files.createTempDirectory("graft_inc").toString
    val baseOccPath = s"$dir/base_occ"
    val deltaOccPath = s"$dir/delta_occ"
    Seq((1L, 10L), (2L, 10L), (1L, 11L), (3L, 11L), (2L, 12L))
      .toDF("item_id", "reference_id").write.parquet(baseOccPath)
    Seq((3L, 12L), (1L, 10L), (4L, 13L))
      .toDF("item_id", "reference_id").write.parquet(deltaOccPath)

    // Ingest day 0: build from the base log, persist the summaries.
    Incremental.save(
      Incremental.fromOccurrences(spark.read.parquet(baseOccPath)), s"$dir/state")

    // Ingest day 1: resume from summaries, apply the delta.
    val resumed = Incremental.load(spark, s"$dir/state")
    val updated = Incremental.update(resumed, spark.read.parquet(deltaOccPath))
    val out = Incremental.pairs(updated)

    // The base occurrence log must appear in NO scan of the update plan.
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains(baseOccPath), "update plan scans the base occurrence log")
    assert(plan.contains(s"$dir/state"), "update plan should read the persisted summaries")
    assert(plan.contains(deltaOccPath), "update plan should read the delta")

    // And the answer still matches the full rebuild over the union.
    val all = spark.read.parquet(baseOccPath).unionByName(spark.read.parquet(deltaOccPath))
    pairMap(out) shouldBe pairMap(Correlation.sparsePairs(Crosstab.build(all)))
  }
}
