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

  /**
   * Exact paired sign test — "is system A actually better than system
   * B, or is the eval too small to tell?": given one row per evaluation
   * unit with both systems' metrics, count strict wins each way (ties
   * carry no information and drop, the standard convention) and report
   * the EXACT two-sided binomial p-value under the null that wins are
   * coin flips: p = min(1, 2·Σ_{k ≤ min(w_a, w_b)} C(n_d, k)/2^{n_d}).
   *
   * The metric comparison is one corpus aggregate; the binomial tail is
   * driver-side EXACT integer arithmetic (BigInt Pascal recurrence) on
   * the collected (wins_a, wins_b) — bounded state. The tail sum must
   * fit an exact double, so n_d ≤ 52 is required — evaluation panels
   * are index-parameter-sized by design (q41's is), and past ~50
   * differing pairs a sign test is not the binding analysis anyway.
   * Output: one row (n_pairs, n_diff, wins_a, wins_b, p_value 1e-9).
   */
  def pairedSignTest(pairs: DataFrame, metricA: String, metricB: String): DataFrame = {
    val spark = pairs.sparkSession
    val a = pairs.agg(
      count(lit(1)).as("n_pairs"),
      sum(when(col(metricA) > col(metricB), 1L).otherwise(0L)).as("wins_a"),
      sum(when(col(metricB) > col(metricA), 1L).otherwise(0L)).as("wins_b"))
      .head()
    val (np, wa, wb) = (a.getLong(0), a.getLong(1), a.getLong(2))
    val nd = wa + wb
    require(nd <= 52, s"pairedSignTest: $nd differing pairs — the exact " +
      "binomial tail needs n_diff <= 52 (evaluation panels are bounded)")
    val p = if (nd == 0L) 1.0
    else {
      val m = math.min(wa, wb)
      var c = BigInt(1)
      var s = BigInt(1) // k = 0 term
      for (k <- 1L to m) {
        c = c * BigInt(nd - k + 1) / BigInt(k)
        s += c
      }
      math.min(1.0, 2.0 * (s.toDouble / math.pow(2.0, nd.toDouble)))
    }
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("n_pairs", LongType, nullable = false),
      StructField("n_diff", LongType, nullable = false),
      StructField("wins_a", LongType, nullable = false),
      StructField("wins_b", LongType, nullable = false),
      StructField("p_value", DoubleType, nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(
      Row(np, nd, wa, wb, math.rint(p * 1e9) / 1e9)), schema)
  }
}
