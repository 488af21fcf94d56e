package graft

import org.apache.spark.sql.functions._
import graft.store.FrontierSchedule

/** Frontier schedule ledger: delta continuation equals the one-shot
  * arrival-ordered schedule over the union, per-host caps compose with
  * the fold, redelivery is idempotent, compaction preserves state. */
class FrontierScheduleSpec extends SparkSpec {
  import spark.implicits._

  /** 3 hosts × mixed priorities × 3 arrival epochs — host (i % 3) and
    * epoch (i div 3 % 3) deliberately independent so every host sees
    * every epoch (5 rows per host per epoch). */
  private def frontier = (1L to 45L).map { i =>
    (s"h${i % 3}.example.com", s"https://h${i % 3}.example.com/p$i",
      (i * 37) % 10, (i / 3) % 3)
  }.toDF("host", "url", "priority", "epoch")

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select(col("url"), col("slot"), col("fetch_at_ms")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  /** One-shot witness: rank within host by (epoch, priority DESC, url). */
  private def oneShot(cap: Option[Long]): Map[String, (Long, Long)] = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("host"))
      .orderBy(col("epoch"), col("priority").desc, col("url"))
    val s = frontier.withColumn("slot", (row_number().over(w) - 1).cast("long"))
      .withColumn("fetch_at_ms", col("slot") * 500L)
    pairs(cap.map(m => s.where(col("slot") < m)).getOrElse(s))
  }

  test("delta schedules continue the committed slot clock (fold law)") {
    val store = graft.core.Scratch.dir("sched_fold")
    val base = FrontierSchedule.write(
      frontier.where(col("epoch") === 0), store, 500L)
    val d1 = FrontierSchedule.scheduleDelta(
      frontier.where(col("epoch") === 1), store, 500L, batchId = Some("d1"))
    val d2 = FrontierSchedule.scheduleDelta(
      frontier.where(col("epoch") === 2), store, 500L, batchId = Some("d2"))
    (pairs(base) ++ pairs(d1) ++ pairs(d2)) shouldBe oneShot(None)
  }

  test("maxPerHost caps TOTAL slots across deltas; capped hosts stop") {
    val store = graft.core.Scratch.dir("sched_cap")
    // 15 rows/host over 3 epochs (5 each); cap 8 → epoch0 keeps 5,
    // epoch1 keeps 3, epoch2 keeps 0
    val cap = Some(8L)
    val base = FrontierSchedule.write(
      frontier.where(col("epoch") === 0), store, 500L, cap)
    val d1 = FrontierSchedule.scheduleDelta(
      frontier.where(col("epoch") === 1), store, 500L, cap, Some("d1"))
    val d2 = FrontierSchedule.scheduleDelta(
      frontier.where(col("epoch") === 2), store, 500L, cap, Some("d2"))
    d2.count() shouldBe 0L
    (pairs(base) ++ pairs(d1)) shouldBe oneShot(cap)
    // only KEPT rows advanced the state
    FrontierSchedule.state(spark, store).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
      .values.toSet shouldBe Set(8L)
  }

  test("redelivery under one batch id recomputes identically; compaction is a no-op") {
    val store = graft.core.Scratch.dir("sched_redeliver")
    FrontierSchedule.write(frontier.where(col("epoch") === 0), store, 500L)
    val first = pairs(FrontierSchedule.scheduleDelta(
      frontier.where(col("epoch") === 1), store, 500L, batchId = Some("d1")))
    val again = pairs(FrontierSchedule.scheduleDelta(
      frontier.where(col("epoch") === 1), store, 500L, batchId = Some("d1")))
    again shouldBe first
    val st = FrontierSchedule.state(spark, store).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    FrontierSchedule.compact(spark, store)
    FrontierSchedule.state(spark, store).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe st
    // post-compaction deltas keep continuing
    val d2 = pairs(FrontierSchedule.scheduleDelta(
      frontier.where(col("epoch") === 2), store, 500L, batchId = Some("d2")))
    (pairs(FrontierSchedule.write(
      frontier.where(col("epoch") === 0),
      graft.core.Scratch.dir("sched_scratch"), 500L)) ++ first ++ d2) shouldBe
      oneShot(None)
    an[IllegalArgumentException] should be thrownBy
      FrontierSchedule.scheduleDelta(frontier, store, 500L,
        batchId = Some("base"))
  }
}
