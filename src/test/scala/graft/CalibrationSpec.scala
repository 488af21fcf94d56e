package graft

import org.apache.spark.sql.functions._
import graft.operators.Calibration

/** Witnesses for cross-source quantile normalization (EXT-T72). */
class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("equal within-source ranks calibrate to equal global values") {
    // source A is harsh (0.1/0.2/0.3), B is lenient (0.7/0.8/0.9): after
    // calibration the rank-matched documents share one scale exactly
    val rows = Seq(
      (1L, "A", 0.1), (2L, "A", 0.2), (3L, "A", 0.3),
      (4L, "B", 0.7), (5L, "B", 0.8), (6L, "B", 0.9)).toDF("id", "src", "s")
    val got = Calibration.quantileNormalize(rows, "id", "src", "s")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(3), r.getDouble(4)))).toMap
    // within-source percentiles: 0, 0.5, 1 in both sources
    got(1L)._1 shouldBe 0.0
    got(2L)._1 shouldBe 0.5
    got(3L)._1 shouldBe 1.0
    // global inverse CDF at those percentiles: ranks 1, 3.5, 6 over the
    // six bucket counts → bucket midpoints 0.1025 / 0.7025 / 0.9025
    got(1L)._2 shouldBe 0.1025
    got(2L)._2 shouldBe 0.7025
    got(3L)._2 shouldBe 0.9025
    // the lenient source's rank-matched docs land on the SAME values
    got(4L)._2 shouldBe got(1L)._2
    got(5L)._2 shouldBe got(2L)._2
    got(6L)._2 shouldBe got(3L)._2
  }

  test("ties share a rank; a single-document source sits at p = 0.5") {
    val rows = Seq(
      (1L, "A", 0.4), (2L, "A", 0.4), (3L, "A", 0.6),
      (4L, "B", 0.5)).toDF("id", "src", "s")
    val got = Calibration.quantileNormalize(rows, "id", "src", "s")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    got(1L) shouldBe got(2L) // RANK semantics: equal scores, equal p
    got(3L) shouldBe 1.0
    got(4L) shouldBe 0.5
  }

  test("calibration preserves within-source order and is rerun-stable") {
    val rows = (1L to 40L).map(i =>
      (i, if (i % 2 == 0) "even" else "odd", (i % 7).toDouble / 10.0))
      .toDF("id", "src", "s")
    val out = Calibration.quantileNormalize(rows, "id", "src", "s")
    val a = out.orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(4)))
    a.groupBy(_._2).values.foreach { grp =>
      val byScore = grp.sortBy(_._3).map(_._4)
      byScore shouldBe byScore.sorted // monotone in the raw score
    }
    val b = out.orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(4)))
    a.map(x => (x._1, x._4)).toSeq shouldBe b.toSeq
  }
}
