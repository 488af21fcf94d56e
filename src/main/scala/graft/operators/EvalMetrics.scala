package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/**
 * Sample-based evaluation estimators — the metrics a model-eval pipeline
 * computes over per-sample outcome logs at corpus scale.
 */
object EvalMetrics {

  /**
   * Unbiased pass@k (Chen et al. 2021, "Evaluating LLMs Trained on Code",
   * eq. 1): per problem with n samples and c correct,
   * pass@k = 1 − C(n−c, k)/C(n, k), computed as the product
   * Π_{j=0}^{k−1} (n−c−j)/(n−j) — numerically safe for any n (no
   * factorials), exactly the reference implementation's form. n < k →
   * NULL (the estimator is undefined); n−c < k → pass@k = 1 (some factor
   * hits 0). ONE map-side-combinable hash aggregate over the problem key
   * plus a scalar projection — group count grows with the eval set,
   * group size is the (bounded) sample budget.
   *
   * Output: (problemCol, n, c, pass_at_<k>), the rate rounded 1e-6. The
   * product multiplies the per-j fractions in ascending-j order — the
   * oracle replays the identical factor sequence.
   */
  def passAtK(df: DataFrame, problemCol: String, correctCol: String,
              k: Int): DataFrame = {
    require(k >= 1, "passAtK: k must be >= 1")
    val g = df.groupBy(col(problemCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col(correctCol), 1L).otherwise(0L)).as("c"))
    val prod = (0 until k).map { j =>
      greatest(col("n") - col("c") - j, lit(0L)).cast("double") /
        (col("n") - j).cast("double")
    }.reduce(_ * _)
    g.select(col(problemCol), col("n"), col("c"),
      when(col("n") < k, lit(null).cast("double"))
        .otherwise(round(lit(1.0) - prod, 6)).as(s"pass_at_$k"))
  }
}
