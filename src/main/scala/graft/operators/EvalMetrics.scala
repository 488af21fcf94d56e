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

  /**
   * Fleiss' kappa (Fleiss 1971, "Measuring nominal scale agreement
   * among many raters") — the labeling-pipeline QC number: after a
   * Neyman-style budget sends items to m annotators, kappa says whether
   * they agree beyond chance (κ ≤ 0 ⇒ the rubric is broken; the labels
   * should not train anything).
   *
   *   P̄  = Σ_items Σ_labels n_ik(n_ik−1) / (N·m·(m−1))   (observed)
   *   P̄e = Σ_labels (Σ_items n_ik / (N·m))²              (chance)
   *   κ  = (P̄ − P̄e) / (1 − P̄e), NULL when P̄e = 1 (a single label
   *        everywhere — agreement is undefined, not perfect)
   *
   * One (item, label) hash aggregate over the annotation log; the label
   * marginals are a ≤-|labels|-row table. Every rating counts — Fleiss
   * requires the same m per item, enforced loudly via the bounded
   * distinct-m set. P̄/P̄e round 1e-9, κ 1e-6 (the replay discipline).
   * Output: one row (n_items, n_annotators, p_bar, p_e, kappa).
   */
  def fleissKappa(ann: DataFrame, itemCol: String, annotatorCol: String,
                  labelCol: String): DataFrame = {
    // three consumers (the distinct-m validation collect, `base`, `marg`)
    // over one (item, label) aggregate — cache so the annotation log is
    // scanned once, not three times (released with the session's
    // clearAll; the table is ≤ items × labels, far below the log)
    val cells = graft.core.Caches.cacheOnce(ann
      .groupBy(col(itemCol).as("item"), col(labelCol).cast("string").as("label"))
      .agg(count(lit(1)).as("n")))
    val ms = cells.groupBy(col("item")).agg(sum(col("n")).as("m"))
      .select(col("m")).distinct().collect().map(_.getLong(0))
    require(ms.length == 1, "fleissKappa: items have differing rating " +
      s"counts {${ms.sorted.mkString(", ")}} — Fleiss requires the same " +
      "number of ratings per item")
    val m = ms.head
    require(m >= 2, "fleissKappa: need at least 2 ratings per item")
    val base = cells.agg(
      count_distinct(col("item")).as("nitems"),
      sum(col("n") * (col("n") - 1)).as("agr"))
    val marg = cells.groupBy(col("label")).agg(sum(col("n")).as("s"))
    marg.crossJoin(broadcast(base))
      .agg(
        max(col("nitems")).as("n_items"),
        lit(m).as("n_annotators"),
        round(max(col("agr").cast("double") /
          (col("nitems") * m * (m - 1))), 9).as("p_bar"),
        round(sum(pow(col("s").cast("double") / (col("nitems") * m), 2)), 9)
          .as("p_e"))
      .withColumn("kappa",
        when(col("p_e") >= 1.0, lit(null).cast("double"))
          .otherwise(round((col("p_bar") - col("p_e")) / (lit(1.0) - col("p_e")), 6)))
  }

  /**
   * Deterministic paired PERMUTATION test — the magnitude-aware
   * complement of [[pairedSignTest]] (the sign test sees only win
   * direction; the permutation test works on the mean paired difference,
   * so many small wins and one huge loss resolve differently): under the
   * exchangeability null each unit's difference d_i = a_i − b_i is
   * sign-symmetric, so `reps` resamples flip each d_i by a KEYED HASH of
   * (rep, unit index) — no RNG state, rerun/partitioning/engine stable —
   * and the two-sided p-value is the add-one-smoothed fraction of
   * resampled |mean| at or above the observed |mean|
   * (p = (1 + #{r : |m_r| ≥ |obs|}) / (reps + 1), the standard
   * Monte-Carlo-validity correction).
   *
   * The bounded panel collects and re-enters the plan as a broadcast
   * literal (the [[bootstrapCi]] shape); the reps × n flip table and the
   * per-rep means stay relational. Resample means round 1e-9 before the
   * tail comparison so the boundary replays in oracle SQL. Output: one
   * row (n_units, n_reps, mean_diff, p_value).
   */
  def pairedPermTest(units: DataFrame, idCol: String, aCol: String,
                     bCol: String, reps: Int,
                     maxN: Int = 100000): DataFrame = {
    require(reps >= 10, "pairedPermTest: reps must be >= 10")
    require(maxN >= 2, "pairedPermTest: maxN must be >= 2")
    import graft.functions.TextFunctions.hash60
    val spark = units.sparkSession
    val panel = units.select(col(idCol), col(aCol).cast("double"),
      col(bCol).cast("double")).orderBy(col(idCol)).collect()
    val n = panel.length
    require(n >= 2, "pairedPermTest: need at least 2 panel units")
    require(n <= maxN, s"pairedPermTest: panel of $n units exceeds cap " +
      s"$maxN — evaluation panels are bounded by design")
    require(panel.forall(r => !r.isNullAt(1) && !r.isNullAt(2)),
      s"pairedPermTest: NULL $aCol/$bCol in the panel — exclude or fix upstream")
    val ds = panel.map(r => r.getDouble(1) - r.getDouble(2)).toSeq
    val obs = math.rint(ds.sum / n * 1e9) / 1e9
    val flips = spark.range(reps.toLong * n).select(
      (col("id") / n).cast("long").as("rep"),
      pmod(col("id"), lit(n.toLong)).as("i"))
    val draws = flips.select(col("rep"),
      (when(hash60(concat(col("rep").cast("string"), lit(":"),
          col("i").cast("string"))) % 2L === 0L, lit(1.0)).otherwise(lit(-1.0))
        * element_at(typedlit(ds), (col("i") + 1).cast("int"))).as("sd"))
    val means = draws.groupBy(col("rep")).agg(round(avg(col("sd")), 9).as("m"))
    means.agg(
      lit(n.toLong).as("n_units"),
      lit(reps.toLong).as("n_reps"),
      round(lit(obs), 6).as("mean_diff"),
      round((sum(when(abs(col("m")) >= math.abs(obs), 1L).otherwise(0L)) + 1L)
        .cast("double") / (reps + 1.0), 6).as("p_value"))
  }

  /**
   * Deterministic bootstrap confidence interval for a panel metric's
   * mean — the error bar every recall/NDCG point estimate should ship
   * with: `reps` resamples of the n panel units WITH replacement, each
   * draw indexed by the engine's keyed hash family instead of RNG state
   * (draw j picks unit hashPerm(j) mod n — reproducible across engines,
   * reruns, partitionings), percentile CI over the 1e-9-rounded
   * resample means.
   *
   * The panel collects to the driver (evaluation panels are
   * index-parameter-sized — the same bound `pairedSignTest` documents)
   * and re-enters the plan as a broadcast literal; the reps × n draw
   * table and the per-rep means stay relational, so a larger reps knob
   * costs executor time, not driver memory. Output: one row
   * (n_units, n_reps, mean, ci_lo, ci_hi), bounds at (alpha/2,
   * 1 − alpha/2) with `quantile_cont` interpolation.
   */
  def bootstrapCi(units: DataFrame, idCol: String, metricCol: String,
                  reps: Int, alpha: Double = 0.05,
                  maxN: Int = 100000): DataFrame = {
    require(reps >= 10, "bootstrapCi: reps must be >= 10")
    require(alpha > 0.0 && alpha < 1.0, "bootstrapCi: alpha in (0, 1)")
    require(maxN >= 2, "bootstrapCi: maxN must be >= 2")
    import graft.functions.TextFunctions.{hash60, hashPermOf, HashPermMod}
    val spark = units.sparkSession
    val panel = units.select(col(idCol), col(metricCol).cast("double"))
      .orderBy(col(idCol)).collect()
    val n = panel.length
    require(n >= 2, "bootstrapCi: need at least 2 panel units")
    require(n <= maxN, s"bootstrapCi: panel of $n units exceeds cap $maxN — " +
      "evaluation panels are bounded by design")
    // A NULL metric must error, not silently read as 0.0 (getDouble's
    // unboxing default) — a NULL panel row means the upstream join lost
    // a unit, and counting it as 0 would skew the mean and both bounds.
    require(panel.forall(!_.isNullAt(1)),
      s"bootstrapCi: NULL $metricCol in the panel — exclude or fix upstream")
    val ms = panel.map(_.getDouble(1)).toSeq
    val draws = spark.range(reps.toLong * n).select(
      (col("id") / n).cast("long").as("rep"),
      element_at(typedlit(ms),
        (hashPermOf(hash60(col("id").cast("string")) % HashPermMod, lit(0))
          % n + 1).cast("int")).as("m"))
    val means = draws.groupBy(col("rep")).agg(round(avg(col("m")), 9).as("mm"))
    means.agg(
        lit(n.toLong).as("n_units"),
        lit(reps.toLong).as("n_reps"),
        round(lit(ms.sum / n), 6).as("mean"),
        round(percentile(col("mm"), lit(alpha / 2.0)), 6).as("ci_lo"),
        round(percentile(col("mm"), lit(1.0 - alpha / 2.0)), 6).as("ci_hi"))
  }
}
