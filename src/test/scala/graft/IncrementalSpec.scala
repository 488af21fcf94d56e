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

  test("retract == full rebuild over (history − deletions), bit-for-bit, randomized") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val n = 150 + rnd.nextInt(100)
      val all = Seq.fill(n)((rnd.nextInt(12).toLong, rnd.nextInt(20).toLong))
      // remove a random slice of the folded history (multiset-valid:
      // every removed occurrence is an actual history row)
      val (removed, remaining) = all.partition(_ => rnd.nextInt(4) == 0)
      val base = Incremental.fromOccurrences(all.toDF("item_id", "reference_id"))
      val got = pairMap(Incremental.pairs(
        Incremental.retract(base, removed.toDF("item_id", "reference_id"))))
      assert(got == pairMap(rebuildPairs(remaining)), s"trial $trial: retract != rebuild")
    }
  }

  test("interleaved add/remove rounds track the surviving log exactly") {
    // Persist each round like the operational loop (IncrementalIngest)
    // does: chaining many folds in one session without a snapshot grows
    // the logical plan multiplicatively (see the updateCells scaladoc).
    val dir = java.nio.file.Files.createTempDirectory("graft_inc_rounds").toString
    val rnd = new scala.util.Random(13)
    var history = Seq.fill(120)((rnd.nextInt(10).toLong, rnd.nextInt(15).toLong))
    Incremental.save(
      Incremental.fromOccurrences(history.toDF("item_id", "reference_id")), s"$dir/v0")
    for (round <- 1 to 4) {
      val prev = Incremental.load(spark, s"$dir/v${round - 1}")
      val adds = Seq.fill(40)((rnd.nextInt(10).toLong, rnd.nextInt(15).toLong))
      history = history ++ adds
      val (removed, remaining) = history.partition(_ => rnd.nextInt(5) == 0)
      history = remaining
      val next = Incremental.retract(
        Incremental.update(prev, adds.toDF("item_id", "reference_id")),
        removed.toDF("item_id", "reference_id"))
      Incremental.save(next, s"$dir/v$round")
      assert(pairMap(Incremental.pairs(Incremental.load(spark, s"$dir/v$round"))) ==
        pairMap(rebuildPairs(history)),
        s"round $round: folded stats diverged from the surviving log")
    }
  }

  test("retraction prunes emptied cells, items, pairs, and contexts") {
    val base = Seq((1L, 10L), (2L, 10L), (1L, 11L), (3L, 11L), (4L, 12L))
    val b = Incremental.fromOccurrences(base.toDF("item_id", "reference_id"))
    // remove item 4 entirely (its context 12 empties) + item 1's ctx-10 cell
    val after = Incremental.retract(b,
      Seq((4L, 12L), (1L, 10L)).toDF("item_id", "reference_id"))
    after.n.head().getDouble(0) shouldBe 2.0 // ctx 12 gone, 10 and 11 survive
    after.items.select("item").collect().map(_.getLong(0)).toSet shouldBe Set(1L, 2L, 3L)
    // the maintained cell table IS the crosstab of the remaining history
    val remaining = Seq((2L, 10L), (1L, 11L), (3L, 11L))
    after.cells.select("item", "ctx", "cnt").orderBy("item", "ctx").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))) shouldBe
      Crosstab.build(remaining.toDF("item_id", "reference_id"))
        .select("item", "ctx", "cnt")
        .orderBy("item", "ctx").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // pair (1,2) lost its only shared context → its co-moment row is gone
    after.co.select("item_a", "item_b").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSet shouldBe Set((1L, 3L))
    pairMap(Incremental.pairs(after)) shouldBe pairMap(rebuildPairs(remaining))
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
