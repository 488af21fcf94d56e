package graft

import org.apache.spark.sql.functions._
import graft.operators.Pca

class PcaSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic planted-structure corpus: vectors concentrated along
    * (3, 4)/5 in dims (1, 2) with small hash-driven wiggle in dim 3. */
  private def planted(n: Int) = {
    (1 to n).map { i =>
      val t = (i * 37 % 19).toDouble - 9.0 // spread along the main axis
      val w = ((i * 17 % 7).toDouble - 3.0) * 0.05
      (i.toLong, Seq(0.6f * t.toFloat, 0.8f * t.toFloat, w.toFloat, 0.0f))
    }.toDF("vec_id", "embedding")
  }

  test("moments matches the hand-computed sample covariance") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f)),
      (2L, Seq(3.0f, 6.0f)),
      (3L, Seq(5.0f, 7.0f))).toDF("vec_id", "embedding")
    val (n, mean, cov) = Pca.moments(df, "embedding", 2)
    n shouldBe 3L
    mean(0) shouldBe 3.0 +- 1e-12
    mean(1) shouldBe 5.0 +- 1e-12
    cov(0)(0) shouldBe 4.0 +- 1e-9   // var of 1,3,5
    cov(1)(1) shouldBe 7.0 +- 1e-9   // var of 2,6,7
    cov(0)(1) shouldBe 5.0 +- 1e-9   // Σ(x-3)(y-5)/2 = (−2·−3 + 0·1 + 2·2)/2
    cov(1)(0) shouldBe cov(0)(1)
  }

  test("moments excludes NULL vectors and is layout-independent") {
    val base = planted(30)
    val withNull = base.unionAll(
      Seq((999L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"))
    val (n1, _, c1) = Pca.moments(withNull, "embedding", 4)
    val (n2, _, c2) = Pca.moments(base.repartition(7), "embedding", 4)
    n1 shouldBe 30L
    n2 shouldBe 30L
    for (i <- 0 until 4; j <- 0 until 4) c1(i)(j) shouldBe c2(i)(j) +- 1e-9
  }

  test("jacobiEigen: orthonormal basis, A·v = λ·v, eigenvalues descending") {
    val (_, _, cov) = Pca.moments(planted(50), "embedding", 4)
    val (values, vectors) = Pca.jacobiEigen(cov)
    values.sliding(2).foreach { case Array(a, b) => a should be >= b - 1e-12 }
    for (a <- 0 until 4; b <- 0 until 4) {
      val d = (0 until 4).map(k => vectors(a)(k) * vectors(b)(k)).sum
      d shouldBe (if (a == b) 1.0 else 0.0) +- 1e-8
    }
    for (e <- 0 until 4; i <- 0 until 4) {
      val av = (0 until 4).map(j => cov(i)(j) * vectors(e)(j)).sum
      av shouldBe values(e) * vectors(e)(i) +- 1e-7
    }
  }

  test("jacobiEigen recovers the planted principal direction") {
    val (_, _, cov) = Pca.moments(planted(50), "embedding", 4)
    val (values, vectors) = Pca.jacobiEigen(cov)
    // dominant axis ∝ (0.6, 0.8, ~0, 0), sign-normalized positive
    vectors(0)(0) shouldBe 0.6 +- 0.02
    vectors(0)(1) shouldBe 0.8 +- 0.02
    math.abs(vectors(0)(2)) should be < 0.05
    values(0) / values.sum should be > 0.99
  }

  test("powerIteration converges to the Jacobi dominant eigenvalue") {
    val (_, _, cov) = Pca.moments(planted(50), "embedding", 4)
    val (values, _) = Pca.jacobiEigen(cov)
    val traj = Pca.powerIteration(spark, cov, 8).collect()
    val lamLast = traj.filter(_.getLong(0) == 8L).head.getDouble(3)
    lamLast shouldBe values(0) +- 1e-4
    // trajectory emits (rounds+1) × d rows, round 0 uniform
    traj.length shouldBe 9 * 4
    traj.filter(_.getLong(0) == 0L).map(_.getDouble(2)).distinct.length shouldBe 1
  }

  test("project scores rows against the basis; planted data collapses to axis 1") {
    val df = planted(50)
    val basis = Pca.principalBasis(df, "embedding", 4, 2)
    val proj = Pca.project(df, "embedding", basis)
      .select(col("vec_id"), col("proj"))
      .as[(Long, Seq[Double])].collect()
    proj.length shouldBe 50
    // variance along component 1 dominates component 2
    def variance(xs: Seq[Double]) = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    val v1 = variance(proj.map(_._2.head).toSeq)
    val v2 = variance(proj.map(_._2(1)).toSeq)
    v1 / (v1 + v2) should be > 0.99
  }

  test("moments plan: partial aggregate feeds the single-partition reduce") {
    val plan = Pca.momentsDs(planted(20), "embedding", 4)
      .queryExecution.executedPlan.toString.toLowerCase
    plan should include("partial")
    plan should not include "exchange hashpartitioning" // no keyed shuffle
  }
}
