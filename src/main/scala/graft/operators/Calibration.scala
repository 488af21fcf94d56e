package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Cross-source score calibration by quantile normalization — the fix
 * for mixing per-source quality scores that were produced by DIFFERENT
 * scorers (or the same scorer on very different text): a source whose
 * classifier is systematically harsh ranks its own documents correctly
 * but its raw scores are not comparable to another source's, so a
 * global threshold silently over-filters it. Rank-based calibration
 * (the microarray quantile-normalization idea, Bolstad et al. 2003,
 * applied per source) replaces each score with the GLOBAL score
 * distribution's value at the document's WITHIN-SOURCE percentile rank:
 * per-source orderings are preserved exactly, and the calibrated values
 * of all sources share one distribution by construction.
 */
object Calibration {

  /**
   * Quantile-normalize `scoreCol` across `sourceCol` groups.
   *
   * Steps (each engine-reproducible, the whole chain replays in SQL):
   *  1. within-source percentile rank p = (rank − 1)/(n_s − 1) with
   *     RANK() semantics (equal scores share a rank), 1e-9-rounded;
   *     a single-document source sits at p = 0.5;
   *  2. the global distribution compresses to a `bins`-bucket
   *     equal-width histogram over [0, 1] (scores are 1e-6-rounded and
   *     clamped into [0, 1] — quality scores live there);
   *  3. the inverse CDF is tabulated at `grid`+1 points: grid point j
   *     reads off the midpoint of the lowest bucket whose cumulative
   *     count reaches rank 1 + (N−1)·j/grid (the `quantile_cont` rank
   *     convention over bucket-cumulative counts, the q86 read-off);
   *  4. each document maps through its nearest grid point
   *     j = ⌊p·grid + 0.5⌋ (explicit floor-plus-half — identical
   *     half-up semantics in every engine).
   *
   * Scale shape: one rank window PARTITIONED BY SOURCE (the only
   * corpus-sized exchange), one map-side-combinable histogram
   * aggregate; the cumulative window and the grid×histogram join run
   * on ≤ bins and ≤ (grid+1)·bins rows — bounded at any corpus size —
   * and the (grid+1)-row lookup table broadcast-joins back. Output:
   * (idCol, source, score, p, calibrated), calibrated 1e-6-rounded.
   */
  def quantileNormalize(df: DataFrame, idCol: String, sourceCol: String,
                        scoreCol: String, bins: Int = 200,
                        grid: Int = 200): DataFrame = {
    require(bins >= 2, "quantileNormalize: bins must be >= 2")
    require(grid >= 2, "quantileNormalize: grid must be >= 2")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val base = graft.core.Caches.cacheOnce(
      df.select(col(idCol), col(sourceCol).as("source"),
        round(col(scoreCol).cast("double"), 6).as("score")))
    val wR = Window.partitionBy(col("source")).orderBy(col("score"))
    val ranked = base
      .withColumn("rk", rank().over(wR))
      .withColumn("ns", count(lit(1)).over(Window.partitionBy(col("source"))))
      .withColumn("p", when(col("ns") === 1, lit(0.5))
        .otherwise(round((col("rk") - 1).cast("double") / (col("ns") - 1), 9)))
      .withColumn("j", floor(col("p") * grid + 0.5).cast("long"))
      .drop("rk", "ns")
    val hist = base.groupBy(
        least(greatest(floor(col("score") * bins), lit(0)), lit(bins - 1))
          .cast("long").as("bin"))
      .agg(count(lit(1)).as("cnt"))
    // bounded unpartitioned window: ≤ bins rows by construction
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("bin"))))
    val tot = hist.agg(sum(col("cnt")).as("nn"))
    val gridTable = spark.range(0, grid + 1L).select(col("id").as("j"))
      .crossJoin(tot)
      .withColumn("r", lit(1.0) + (col("nn") - 1).cast("double") * col("j") / grid)
    val lookup = gridTable.join(cum, col("cum") >= col("r"))
      .groupBy(col("j"))
      .agg(round((min(col("bin")) + 0.5) / bins, 6).as("calibrated"))
    ranked.join(broadcast(lookup), Seq("j"))
      .select(col(idCol), col("source"), col("score"), col("p"),
        col("calibrated"))
  }
}
