package graft

import graft.core.{Correlation, Crosstab, Incremental}
import graft.streaming.IncrementalIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming model maintenance: folding micro-batches of occurrences into
  * persisted snapshots must equal a full rebuild over everything the
  * stream ever saw, and redelivered batches must not double-count. */
class IncrementalIngestSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batched ingest converges to the full-rebuild statistics") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val mem = MemoryStream[(Long, Long)]
    val occ = mem.toDF().toDF("item_id", "reference_id")
    val sq = IncrementalIngest.start(occ, s"$dir/state", s"$dir/ckpt")
    val rnd = new scala.util.Random(13)
    val batches = Seq.fill(3)(
      Seq.fill(120)((rnd.nextInt(10).toLong, rnd.nextInt(15).toLong)))
    try {
      batches.foreach { b => mem.addData(b: _*); sq.processAllAvailable() }
    } finally sq.stop()

    val got = IncrementalIngest.loadLatest(spark, s"$dir/state").get
    val want = Correlation.sparsePairs(
      Crosstab.build(batches.flatten.toDF("item_id", "reference_id")))
    pairMap(Incremental.pairs(got)) shouldBe pairMap(want)
    IncrementalIngest.latestVersion(spark, s"$dir/state") shouldBe Some(2L)
  }

  test("a redelivered batch (id at or below the marker) is skipped, not re-folded") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest2").toString
    val b0 = Seq((1L, 10L), (2L, 10L)).toDF("item_id", "reference_id")
    val b1 = Seq((1L, 11L), (2L, 11L)).toDF("item_id", "reference_id")
    IncrementalIngest.applyBatch(b0, 0L, s"$dir/state")
    IncrementalIngest.applyBatch(b1, 1L, s"$dir/state")
    val before = pairMap(Incremental.pairs(
      IncrementalIngest.loadLatest(spark, s"$dir/state").get))
    // crash-redelivery of batch 1: must be a no-op
    IncrementalIngest.applyBatch(b1, 1L, s"$dir/state")
    val after = pairMap(Incremental.pairs(
      IncrementalIngest.loadLatest(spark, s"$dir/state").get))
    after shouldBe before
    IncrementalIngest.latestVersion(spark, s"$dir/state") shouldBe Some(1L)
  }
}
