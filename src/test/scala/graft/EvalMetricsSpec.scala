package graft

import org.apache.spark.sql.functions._
import graft.operators.EvalMetrics

class EvalMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Boolean)], k: Int): Map[Long, Option[Double]] =
    EvalMetrics.passAtK(rows.toDF("pid", "ok"), "pid", "ok", k)
      .collect().map { r =>
        r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))
      }.toMap

  test("pass@3 matches the hand-computed estimator") {
    // n=10, c=3: 1 − (7·6·5)/(10·9·8) = 1 − 210/720 = 0.708333
    val p1 = (1 to 10).map(i => (1L, i <= 3))
    // n=10, c=0: pass = 0
    val p2 = (1 to 10).map(_ => (2L, false))
    // n=10, c=10: pass = 1
    val p3 = (1 to 10).map(_ => (3L, true))
    // n=4, c=2 < k=3 incorrect survivors: n−c=2 < 3 → a factor is 0 → 1
    val p4 = Seq((4L, true), (4L, true), (4L, false), (4L, false))
    // n=2 < k → undefined
    val p5 = Seq((5L, true), (5L, false))
    val got = run(p1 ++ p2 ++ p3 ++ p4 ++ p5, 3)
    got(1L).get shouldBe 0.708333 +- 1e-9
    got(2L).get shouldBe 0.0
    got(3L).get shouldBe 1.0
    got(4L).get shouldBe 1.0
    got(5L) shouldBe None
  }

  test("pass@1 reduces to the success rate") {
    val rows = (1 to 10).map(i => (1L, i <= 4))
    run(rows, 1)(1L).get shouldBe 0.4 +- 1e-9
  }

  private def signTest(rows: Seq[(Double, Double)]) = {
    val r = EvalMetrics.pairedSignTest(
      rows.toDF("a", "b"), "a", "b").collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
  }

  test("pairedSignTest: hand-computed exact binomial tails; ties drop") {
    // 5 wins for a, 2 for b, 1 tie: p = 2·(C(7,0)+C(7,1)+C(7,2))/2^7
    //                                 = 2·29/128 = 0.453125
    val rows = Seq.fill(5)((1.0, 0.0)) ++ Seq.fill(2)((0.0, 1.0)) :+ ((0.5, 0.5))
    signTest(rows) shouldBe ((8L, 7L, 5L, 2L, 0.453125))
    // 9-0 sweep: p = 2·C(9,0)/2^9 = 2/512
    signTest(Seq.fill(9)((1.0, 0.0))) shouldBe ((9L, 9L, 9L, 0L, 0.00390625))
    // all ties: nothing to test — p = 1
    signTest(Seq.fill(4)((0.3, 0.3))) shouldBe ((4L, 0L, 0L, 0L, 1.0))
    // even split: the two-sided cap engages (2·P(X ≤ n/2) > 1)
    signTest(Seq.fill(2)((1.0, 0.0)) ++ Seq.fill(2)((0.0, 1.0)))._5 shouldBe 1.0
  }

  test("pairedSignTest rejects unboundedly many differing pairs") {
    val rows = (1 to 60).map(i => (i.toDouble, 0.0))
    an[IllegalArgumentException] should be thrownBy signTest(rows)
  }

  private def ci(rows: Seq[(Long, Double)], reps: Int = 100) = {
    val r = EvalMetrics.bootstrapCi(rows.toDF("id", "m"), "id", "m", reps)
      .collect().head
    (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
  }

  test("bootstrapCi: constant metric collapses; bounds bracket; rerun-stable") {
    val const = (1L to 20L).map(i => (i, 0.7))
    ci(const) shouldBe ((20L, 100L, 0.7, 0.7, 0.7))
    val spread = (1L to 20L).map(i => (i, if (i <= 10) 0.0 else 1.0))
    val (n, _, mean, lo, hi) = ci(spread)
    n shouldBe 20L
    mean shouldBe 0.5
    lo should be < mean
    hi should be > mean
    lo should be >= 0.0
    hi should be <= 1.0
    ci(spread) shouldBe ci(spread) // hash-driven draws: no RNG state
    // a tighter panel gives a narrower interval
    val tight = (1L to 20L).map(i => (i, if (i <= 10) 0.45 else 0.55))
    val (_, _, _, tlo, thi) = ci(tight)
    (thi - tlo) should be < (hi - lo)
  }

  test("bootstrapCi rejects degenerate inputs") {
    an[IllegalArgumentException] should be thrownBy ci(Seq((1L, 0.5)))
    an[IllegalArgumentException] should be thrownBy
      ci((1L to 5L).map(i => (i, 0.5)), reps = 5)
  }

  private def perm(rows: Seq[(Long, Double, Double)], reps: Int = 200) = {
    val r = EvalMetrics.pairedPermTest(rows.toDF("id", "a", "b"),
      "id", "a", "b", reps).collect().head
    (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
  }

  test("pairedPermTest: null panel -> p = 1; dominance -> small p; rerun-stable") {
    // all-zero differences: every resample mean equals the observed 0
    val equal = (1L to 20L).map(i => (i, 0.5, 0.5))
    perm(equal) shouldBe ((20L, 200L, 0.0, 1.0))
    // A beats B on every one of 20 units: the all-positive assignment is
    // extreme among sign flips — p lands at (or near) the add-one floor
    val dom = (1L to 20L).map(i => (i, 0.9, 0.1))
    val (_, _, md, p) = perm(dom)
    md shouldBe 0.8 +- 1e-9
    p should be < 0.05
    perm(dom) shouldBe perm(dom) // keyed-hash flips: no RNG state
    // a mixed panel with no real signal keeps a large p
    val mixed = (1L to 20L).map(i =>
      (i, if (i % 2 == 0) 0.6 else 0.4, if (i % 2 == 0) 0.4 else 0.6))
    perm(mixed)._4 should be > 0.3
  }

  test("pairedPermTest rejects degenerate inputs") {
    an[IllegalArgumentException] should be thrownBy perm(Seq((1L, 1.0, 0.0)))
    an[IllegalArgumentException] should be thrownBy
      perm((1L to 5L).map(i => (i, 1.0, 0.0)), reps = 5)
    val withNull = Seq((1L, java.lang.Double.valueOf(0.5), java.lang.Double.valueOf(0.1)),
      (2L, null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(0.2)))
      .toDF("id", "a", "b")
    an[IllegalArgumentException] should be thrownBy
      EvalMetrics.pairedPermTest(withNull, "id", "a", "b", 100).collect()
    val big = (1L to 30L).map(i => (i, 0.5, 0.4)).toDF("id", "a", "b")
    an[IllegalArgumentException] should be thrownBy
      EvalMetrics.pairedPermTest(big, "id", "a", "b", 100, maxN = 20).collect()
  }

  test("fleissKappa: hand-computed case, perfect agreement, broken rubric, unequal m raises") {
    // Textbook shape: 4 items × 3 raters, labels in {a, b}
    //   item 1: a a a (n_a=3)        item 2: a a b
    //   item 3: b b b                item 4: a b b
    val ann = Seq(
      (1L, 0L, "a"), (1L, 1L, "a"), (1L, 2L, "a"),
      (2L, 0L, "a"), (2L, 1L, "a"), (2L, 2L, "b"),
      (3L, 0L, "b"), (3L, 1L, "b"), (3L, 2L, "b"),
      (4L, 0L, "a"), (4L, 1L, "b"), (4L, 2L, "b")).toDF("item", "rater", "label")
    val r = EvalMetrics.fleissKappa(ann, "item", "rater", "label").collect().head
    r.getLong(0) shouldBe 4L
    r.getLong(1) shouldBe 3L
    // P̄ = (6 + 2 + 6 + 2) / (4·3·2) = 16/24; p_a = 6/12, p_b = 6/12 → P̄e = 0.5
    r.getDouble(2) shouldBe (16.0 / 24.0) +- 1e-9
    r.getDouble(3) shouldBe 0.5 +- 1e-9
    r.getDouble(4) shouldBe ((16.0 / 24.0 - 0.5) / 0.5) +- 1e-6
    // perfect agreement on a two-label rubric → κ = 1
    val perfect = Seq((1L, 0L, "a"), (1L, 1L, "a"), (2L, 0L, "b"), (2L, 1L, "b"))
      .toDF("item", "rater", "label")
    EvalMetrics.fleissKappa(perfect, "item", "rater", "label")
      .collect().head.getDouble(4) shouldBe 1.0
    // a single label everywhere → P̄e = 1 → κ NULL (undefined, not perfect)
    val mono = Seq((1L, 0L, "a"), (1L, 1L, "a"), (2L, 0L, "a"), (2L, 1L, "a"))
      .toDF("item", "rater", "label")
    EvalMetrics.fleissKappa(mono, "item", "rater", "label")
      .collect().head.isNullAt(4) shouldBe true
    // unequal ratings per item must raise
    val uneven = Seq((1L, 0L, "a"), (1L, 1L, "a"), (2L, 0L, "a"))
      .toDF("item", "rater", "label")
    an[IllegalArgumentException] should be thrownBy
      EvalMetrics.fleissKappa(uneven, "item", "rater", "label").collect()
  }

  test("bootstrapCi rejects NULL metrics instead of counting them as 0.0") {
    val withNull = Seq((1L, java.lang.Double.valueOf(0.5)),
      (2L, null.asInstanceOf[java.lang.Double]), (3L, java.lang.Double.valueOf(0.7)))
      .toDF("id", "m")
    val e = the[IllegalArgumentException] thrownBy
      EvalMetrics.bootstrapCi(withNull, "id", "m", 100).collect()
    e.getMessage should include("NULL")
  }

  test("bootstrapCi enforces the caller's panel cap") {
    val panel = (1L to 30L).map(i => (i, 0.5)).toDF("id", "m")
    val e = the[IllegalArgumentException] thrownBy
      EvalMetrics.bootstrapCi(panel, "id", "m", 100, maxN = 20).collect()
    e.getMessage should include("cap 20")
    // at or under the cap the fit runs
    EvalMetrics.bootstrapCi(panel, "id", "m", 100, maxN = 30)
      .collect().head.getLong(0) shouldBe 30L
  }

  test("plan is one hash aggregate — no window, no join") {
    val plan = EvalMetrics.passAtK(
        Seq((1L, true)).toDF("pid", "ok"), "pid", "ok", 3)
      .queryExecution.executedPlan.toString
    plan should not include "Window"
    plan should not include "Join"
  }
}
