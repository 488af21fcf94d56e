package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.hash60

/**
 * Deterministic sampling for training-data pipelines. `Dataset.sample` is
 * seed-dependent AND partitioning-dependent — rerun the job with a
 * different split layout and you get a different corpus. Hash-slice
 * sampling keys membership on a content-stable hash of the ID alone, so
 * the same row is in or out on every engine, every layout, every rerun —
 * which also makes it oracle-checkable and incrementally stable (new data
 * doesn't resample old data). Map-only: no shuffle, no state.
 */
object Sampling {

  /** Membership of the `permille`‰ hash slice for this id (0 ≤ p ≤ 1000).
    * The md5-derived hash60 is uniform over ids and engine-reproducible. */
  def hashSlice(id: Column, permille: Int): Column =
    hash60(id.cast("string")) % 1000L < permille.toLong

  /** Uniform deterministic sample: keep the `permille`‰ slice. */
  def sample(df: DataFrame, idCol: String, permille: Int): DataFrame =
    df.where(hashSlice(col(idCol), permille))

  /**
   * Stratified deterministic sample: per-stratum keep rates (‰), e.g.
   * rebalancing languages or sources before training. Strata not in
   * `rates` fall back to `defaultPermille`.
   */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
                 rates: Map[String, Int], defaultPermille: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPermille)) { case (acc, (s, p)) =>
      when(col(strataCol) === s, lit(p)).otherwise(acc)
    }
    df.where(hash60(col(idCol).cast("string")) % 1000L < rate.cast("long"))
  }
}
