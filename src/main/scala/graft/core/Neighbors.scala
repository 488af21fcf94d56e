package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Neighbor extraction over the correlation pair table: thresholds, min-max
 * scaling, top-k (SURVEY §2.2/§2.4/§2.5: OP-09..11, OP-20/21, OP-24/26,
 * OP-28).
 *
 * The reference has TWO deliberately different threshold paths
 * (SURVEY §7.4.3):
 *  - query path (`get_similar_items`, `/root/reference/propius/similarity.py:133-167`):
 *    mean + k·σ over the item's RAW correlation vector;
 *  - store path (`populate_similar_items`, `/root/reference/propius/data.py:116-149`):
 *    per-item MIN-MAX SCALE first, then mean + k·σ over the SCALED scores.
 * Both use sample σ (pandas ddof=1 → `stddev_samp`, SURVEY §7.4.2) and
 * NaN-skipping statistics (our corr is already NULL-normalized, which Spark
 * aggregates and window functions skip, matching pandas).
 *
 * Everything here is one pass of window functions partitioned by item_a:
 * a single hash shuffle on item_a replaces the reference's O(items) Python
 * loop with a per-item SQLite round-trip (SURVEY §3 EP-2). At 100 TB the
 * pair table is hash-partitioned by item_a; no window spans more than one
 * item's neighbor list, and AQE handles size skew between items.
 */
object Neighbors {

  private def wItem = Window.partitionBy(col("item_a"))

  /** OP-10: drop self-pairs (`similarity.py:154`, `data.py:133,187`). */
  def dropSelf(pairs: DataFrame): DataFrame =
    pairs.where(col("item_a") =!= col("item_b"))

  /**
   * Query path (`get_similar_items`): keep neighbors whose RAW correlation
   * ≥ mean + k·σ of the item's full correlation vector; descending by score.
   * `pairs` must carry the complete per-item_a vector (self excluded) for
   * the statistics to match the reference — see `Correlation.fullPairs`.
   */
  def rawStdDevThreshold(pairs: DataFrame, k: Double): DataFrame = {
    val thr = avg(col("corr")).over(wItem) + stddev_samp(col("corr")).over(wItem) * lit(k)
    pairs.withColumn("thr", thr)
      .where(col("corr") >= col("thr"))
      .drop("thr")
  }

  /** Absolute-threshold variant (`similarity.py:160-164` "absolute" mode). */
  def absoluteThreshold(pairs: DataFrame, t: Double): DataFrame =
    pairs.where(col("corr") >= lit(t))

  /**
   * OP-21: per-item min-max scaling of `corr` → `scaled_score`
   * (sklearn MinMaxScaler, `data.py:135-138`); a zero range maps to 0.0
   * (SURVEY §7.4.7).
   */
  def minMaxScale(pairs: DataFrame): DataFrame = {
    val mn = min(col("corr")).over(wItem)
    val mx = max(col("corr")).over(wItem)
    pairs.withColumn("scaled_score",
      when(mx === mn, lit(0.0)).otherwise((col("corr") - mn) / (mx - mn)))
  }

  /**
   * Store path (`populate_similar_items`): scale per item, then keep
   * neighbors with scaled score ≥ mean + k·σ of the SCALED vector.
   * Output schema matches the reference store: (item_a_id, item_b_id,
   * scaled_score) (`data.py:73-78`).
   */
  def scaledStdDevThreshold(pairs: DataFrame, k: Double): DataFrame = {
    val scaled = minMaxScale(pairs)
    val thr = avg(col("scaled_score")).over(wItem) +
      stddev_samp(col("scaled_score")).over(wItem) * lit(k)
    scaled.withColumn("thr", thr)
      .where(col("scaled_score") >= col("thr"))
      .select(col("item_a").as("item_a_id"), col("item_b").as("item_b_id"),
        col("scaled_score"))
  }

  /**
   * OP-24+OP-26 per item: top-k neighbors by score descending (the
   * reference's "kNN per each unique item", `/root/reference/README.md:13`).
   * Deterministic tie-break on item_b. Catalyst plans rank-filter windows
   * with partial top-k pushdown (WindowGroupLimit) — no full sort of the
   * pair table.
   */
  def topK(pairs: DataFrame, k: Int, scoreCol: String = "corr"): DataFrame = {
    val w = wItem.orderBy(col(scoreCol).desc, col("item_b").asc)
    pairs.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .drop("rnk")
  }
}
