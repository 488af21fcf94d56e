package graft

import graft.core.Neighbors
import org.apache.spark.sql.functions._

class NeighborsSpec extends SparkSpec {
  import spark.implicits._

  // one item's full correlation vector (item_a = 1)
  private def vec(scores: (Long, java.lang.Double)*) =
    scores.map { case (b, c) => (1L, b, c) }.toDF("item_a", "item_b", "corr")
      .select(col("item_a"), col("item_b"), col("corr").cast("double").as("corr"))

  test("rawStdDevThreshold keeps scores >= mean + k*sample-std, skipping NULLs (§7.4.1/2)") {
    // scores 0.9, 0.1, 0.2, 0.3 (+ one NULL, ignored like pandas NaN):
    // mean=0.375, std(ddof=1)=0.358701..., thr(k=1)=0.733701...
    val df = vec(2L -> 0.9, 3L -> 0.1, 4L -> 0.2, 5L -> 0.3, 6L -> null)
    val kept = Neighbors.rawStdDevThreshold(df, 1.0).select("item_b").as[Long].collect()
    kept.toSeq shouldBe Seq(2L)
  }

  test("sample std is ddof=1 — k=0 threshold equals the mean") {
    val df = vec(2L -> 1.0, 3L -> 0.0)
    // mean = 0.5; stddev_samp = 0.7071; k=0 → keep >= 0.5
    val kept = Neighbors.rawStdDevThreshold(df, 0.0).select("item_b").as[Long].collect()
    kept.toSeq shouldBe Seq(2L)
  }

  test("minMaxScale maps per-item range to [0,1]; zero range → 0.0 (§7.4.7)") {
    val df = vec(2L -> 0.2, 3L -> 0.6, 4L -> 1.0)
      .unionByName(Seq((7L, 8L, 0.5), (7L, 9L, 0.5)).toDF("item_a", "item_b", "corr"))
    val got = pairMap(Neighbors.minMaxScale(df), "scaled_score")
    got((1L, 2L)).get shouldBe 0.0
    assert(approx(got((1L, 3L)).get, 0.5))
    got((1L, 4L)).get shouldBe 1.0
    // constant vector for item 7 → all zeros, not NaN/div-by-zero
    got((7L, 8L)).get shouldBe 0.0
    got((7L, 9L)).get shouldBe 0.0
  }

  test("scaledStdDevThreshold thresholds the SCALED scores and renames to store schema") {
    val df = vec(2L -> 0.9, 3L -> 0.1, 4L -> 0.2, 5L -> 0.3)
    // scaled: 1.0, 0.0, 0.125, 0.25 → mean=0.34375, std=0.450936, thr(k=1)=0.794686
    val out = Neighbors.scaledStdDevThreshold(df, 1.0)
    out.columns.toSeq shouldBe Seq("item_a_id", "item_b_id", "scaled_score")
    val rows = out.collect().map(r => (r.getLong(1), r.getDouble(2)))
    rows.toSeq shouldBe Seq((2L, 1.0))
  }

  test("absoluteThreshold is a plain >= filter") {
    val df = vec(2L -> 0.9, 3L -> 0.1)
    Neighbors.absoluteThreshold(df, 0.5).select("item_b").as[Long].collect().toSeq shouldBe Seq(2L)
  }

  test("topK takes k best per item with deterministic item_b tie-break") {
    val df = Seq(
      (1L, 2L, 0.9), (1L, 3L, 0.9), (1L, 4L, 0.1),
      (5L, 6L, 0.5)).toDF("item_a", "item_b", "corr")
    val got = Neighbors.topK(df, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe Set((1L, 2L), (1L, 3L), (5L, 6L))
  }

  test("dropSelf removes the diagonal") {
    val df = Seq((1L, 1L, 1.0), (1L, 2L, 0.5)).toDF("item_a", "item_b", "corr")
    Neighbors.dropSelf(df).select("item_b").as[Long].collect().toSeq shouldBe Seq(2L)
  }
}
