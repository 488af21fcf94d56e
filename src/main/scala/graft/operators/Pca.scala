package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Distributed PCA over an embedding column — the analysis/compression
 * tier every embedding corpus eventually needs (drift axes, whitening,
 * dimension-budget serving like the q186 matryoshka eval but for a
 * LEARNED basis instead of a trained-in prefix).
 *
 * Scale shape: the ONLY corpus pass is `moments` — a typed
 * `Aggregator` folding each vector into a d + d(d+1)/2 + 1 double
 * buffer (sums, upper-triangle raw second moments, count). Partial
 * buffers merge associatively map-side, the final reduce sees one
 * ~2 k-double buffer per partition, and everything downstream
 * (covariance, eigenvectors, the power-iteration trajectory) is
 * driver-side arithmetic on that d×d summary — the q137/Lloyd
 * bounded-state pattern. Nothing corpus-sized ever reaches the driver,
 * and the corpus is never shuffled at all (no groupBy key: partial
 * aggregation IS the whole plan).
 *
 * Determinism: covariance entries round 1e-9 before anything consumes
 * them (both engines see the identical matrix); the power-iteration
 * trajectory rounds v and λ 1e-9 per round, so the whole chain replays
 * in unrolled oracle SQL. The Jacobi eigensolver (full basis — not
 * SQL-expressible) is spec-gated instead: orthonormality, A·v = λ·v,
 * descending eigenvalues, agreement with the power iteration's top λ.
 */
object Pca {

  /** Packed moment buffer: n, Σx (d), upper-triangle Σx_i·x_j. */
  final case class Mom(n: Long, m: Array[Double])

  private final class MomentsAgg(d: Int) extends Aggregator[Seq[Double], Mom, Mom] {
    private val len = d + d * (d + 1) / 2
    override def zero: Mom = Mom(0L, new Array[Double](len))
    override def reduce(b: Mom, x: Seq[Double]): Mom = {
      require(x.length == d, s"pca: expected dim $d, got ${x.length}")
      val m = b.m
      var i = 0
      while (i < d) { m(i) += x(i); i += 1 }
      var k = d
      i = 0
      while (i < d) {
        var j = i
        while (j < d) { m(k) += x(i) * x(j); j += 1; k += 1 }
        i += 1
      }
      Mom(b.n + 1, m)
    }
    override def merge(a: Mom, b: Mom): Mom = {
      val m = a.m
      var i = 0
      while (i < len) { m(i) += b.m(i); i += 1 }
      Mom(a.n + b.n, m)
    }
    override def finish(r: Mom): Mom = r
    override def bufferEncoder: Encoder[Mom] = Encoders.product[Mom]
    override def outputEncoder: Encoder[Mom] = Encoders.product[Mom]
  }

  /** The one corpus pass, unexecuted — a grouping-free typed aggregation
    * whose partial buffers combine map-side (plan-shape-gated in
    * PcaSpec: the single-partition exchange only ever carries reduced
    * ~2 k-double buffers). */
  def momentsDs(df: DataFrame, vecCol: String, d: Int): org.apache.spark.sql.Dataset[Mom] = {
    require(d >= 2, "pca: need dim >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new MomentsAgg(d)
    df.where(col(vecCol).isNotNull)
      .select(col(vecCol).cast("array<double>").as[Seq[Double]])
      .select(agg.toColumn.as[Mom])
  }

  /** Mean + 1e-9-rounded sample covariance from a raw moment buffer —
    * shared by the one-shot pass and the additive `MomentsLedger`
    * (raw moments are exactly additive across batches, so both paths
    * reach the IDENTICAL matrix). */
  def covFromRaw(mom: Mom, d: Int): (Array[Double], Array[Array[Double]]) = {
    require(mom.n >= 2, "pca: need at least 2 vectors")
    val n = mom.n.toDouble
    def rnd9(x: Double) = math.rint(x * 1e9) / 1e9
    val mean = Array.tabulate(d)(i => mom.m(i) / n)
    val cov = Array.ofDim[Double](d, d)
    var k = d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = rnd9((mom.m(k) - mom.m(i) * mom.m(j) / n) / (n - 1.0))
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1; k += 1
      }
      i += 1
    }
    (mean, cov)
  }

  /** Long-form (dim_i, dim_j, n, cov) rows from a raw moment buffer. */
  def covarianceLongFromRaw(spark: SparkSession, mom: Mom, d: Int): DataFrame = {
    val (_, cov) = covFromRaw(mom, d)
    val rows = for (i <- 0 until d; j <- i until d)
      yield Row((i + 1).toLong, (j + 1).toLong, mom.n, cov(i)(j))
    val schema = StructType(Seq(
      StructField("dim_i", LongType, nullable = false),
      StructField("dim_j", LongType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("cov", DoubleType, nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** One corpus pass → (n, mean vector, sample covariance matrix),
    * covariance entries rounded 1e-9 (the cross-engine contract for
    * everything derived from them). NULL vectors are excluded. */
  def moments(df: DataFrame, vecCol: String, d: Int): (Long, Array[Double], Array[Array[Double]]) = {
    val mom = momentsDs(df, vecCol, d).head()
    val (mean, cov) = covFromRaw(mom, d)
    (mom.n, mean, cov)
  }

  /** Long-form sample covariance: (dim_i, dim_j, n, cov) for i ≤ j,
    * 1-based dims, cov rounded 1e-9 — the oracle-checkable face. */
  def covarianceLong(df: DataFrame, vecCol: String, d: Int): DataFrame =
    covarianceLongFromRaw(df.sparkSession, momentsDs(df, vecCol, d).head(), d)

  /** Power-iteration trajectory on the (already 1e-9-rounded) covariance:
    * v₀ = 1/√d̂ with d̂ forced to an exact-binary value via the 1e-9 grid,
    * then `rounds` steps of v ← A·v / ‖A·v‖₂, each v and λ = ‖A·v‖₂
    * rounded 1e-9. Output: (round, dim, v, lambda) — λ converges to the
    * dominant eigenvalue (spec-gated against the Jacobi solver). */
  def powerIteration(spark: SparkSession, cov: Array[Array[Double]],
                     rounds: Int): DataFrame = {
    require(rounds >= 1, "pca: rounds must be >= 1")
    val d = cov.length
    def rnd9(x: Double) = math.rint(x * 1e9) / 1e9
    var v = Array.fill(d)(rnd9(1.0 / math.sqrt(d.toDouble)))
    val traj = Seq.newBuilder[(Long, Long, Double, Double)]
    for (i <- 0 until d) traj += ((0L, (i + 1).toLong, v(i), 0.0))
    for (r <- 1 to rounds) {
      val av = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val lam = rnd9(math.sqrt(av.map(x => x * x).sum))
      require(lam > 0.0, "pca: zero covariance — power iteration undefined")
      v = av.map(x => rnd9(x / lam))
      for (i <- 0 until d) traj += ((r.toLong, (i + 1).toLong, v(i), lam))
    }
    val schema = StructType(Seq(
      StructField("round", LongType, nullable = false),
      StructField("dim", LongType, nullable = false),
      StructField("v", DoubleType, nullable = false),
      StructField("lambda", DoubleType, nullable = false)))
    val rows = traj.result().map { case (r, i, x, l) => Row(r, i, x, l) }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** Cyclic Jacobi eigensolver for the symmetric d×d covariance —
    * deterministic (fixed sweep order, fixed sweep count), driver-side
    * (d is an index parameter, never corpus-sized). Returns
    * (eigenvalues desc, eigenvectors as rows, matching order), each
    * vector sign-normalized so its largest-|coordinate| entry is
    * positive (first such index on ties). */
  def jacobiEigen(cov: Array[Array[Double]], sweeps: Int = 12): (Array[Double], Array[Array[Double]]) = {
    val d = cov.length
    val a = Array.tabulate(d, d)((i, j) => cov(i)(j))
    val vt = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 0 until sweeps; p <- 0 until d - 1; q <- p + 1 until d) {
      if (math.abs(a(p)(q)) > 1e-14) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (k <- 0 until d) {
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = c * akp - s * akq
          a(k)(q) = s * akp + c * akq
        }
        for (k <- 0 until d) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = c * apk - s * aqk
          a(q)(k) = s * apk + c * aqk
        }
        for (k <- 0 until d) {
          val vp = vt(p)(k); val vq = vt(q)(k)
          vt(p)(k) = c * vp - s * vq
          vt(q)(k) = s * vp + c * vq
        }
      }
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map { i =>
      val v = vt(i).clone()
      val m = v.indices.maxBy(k => (math.abs(v(k)), -k))
      if (v(m) < 0.0) v.map(x => -x) else v
    }.toArray
    (values, vectors)
  }

  /** Top-r principal basis of the embedding corpus: one `moments` pass +
    * the driver-side Jacobi solve. */
  def principalBasis(df: DataFrame, vecCol: String, d: Int, r: Int): Array[Array[Double]] = {
    require(r >= 1 && r <= d, "pca: need 1 <= r <= d")
    val (_, _, cov) = moments(df, vecCol, d)
    jacobiEigen(cov)._2.take(r)
  }

  /** Project the (float) embedding column onto a basis: r codegen'd
    * `VecDot` scores per row against broadcast float32 literals — the
    * serving-precision face (indexes store float32 anyway). Appends
    * `outCol` as array<double> of length r. */
  def project(df: DataFrame, vecCol: String, basis: Array[Array[Double]],
              outCol: String = "proj"): DataFrame = {
    require(basis.nonEmpty, "pca: empty basis")
    val comps = basis.map { b =>
      SimilaritySearch.dot(col(vecCol), typedlit(b.map(_.toFloat).toSeq))
    }
    df.withColumn(outCol, array(comps: _*))
  }
}
