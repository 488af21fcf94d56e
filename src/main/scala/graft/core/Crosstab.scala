package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * OP-18 (SURVEY §2.4): occurrence log → long-form sparse crosstab.
 *
 * The reference (`/root/reference/propius/similarity.py:47-89`) streams the
 * occurrence CSV, assigns a dense "context serial" that increments whenever
 * the (pre-sorted) `reference_id` changes, and sums duplicate (item, ctx)
 * cells into a scipy CSR matrix — i.e. cells are CO-OCCURRENCE COUNTS, not
 * 0/1 flags (`similarity.py:89`, SURVEY §7.4.5).
 *
 * Spark-first design: the long-form DataFrame [(item, ctx, cnt)] IS the
 * sparse matrix — `groupBy.count` is the duplicate-sum, and Pearson is
 * invariant to context-column permutation, so grouping by the raw
 * `reference_id` is equivalent to the reference's run-based serials under
 * its own sorted-input contract (SURVEY §7.4.4). One shuffle, map-side
 * partial aggregation for free, no dense materialization, no 1-based-id
 * assumption (items stay opaque Longs; SURVEY §7.4.6).
 */
object Crosstab {

  /** Build the crosstab from an occurrence log with the reference's
    * canonical column names (`item_id`, `reference_id`). */
  def build(occurrences: DataFrame): DataFrame =
    build(occurrences, "item_id", "reference_id")

  /** Build the crosstab: one row per (item, ctx) with its occurrence count.
    * Scale: a single hash-aggregate shuffle keyed on (item, ctx); partial
    * (map-side) aggregation bounds shuffle volume by distinct cells, not
    * input rows.
    */
  def build(occurrences: DataFrame, itemCol: String, refCol: String): DataFrame =
    occurrences
      .select(col(itemCol).cast("long").as("item"), col(refCol).cast("long").as("ctx"))
      .groupBy("item", "ctx")
      .agg(count(lit(1)).as("cnt"))

  /**
   * Merge two cell tables over the SAME item/ctx space: cells are
   * occurrence COUNTS, so merging is cell-wise addition — the crosstab of
   * a union of occurrence logs equals the merge of their crosstabs. This
   * additivity is what makes the model incrementally maintainable
   * (`Incremental`): appending a day of occurrences is one delta
   * aggregate + this merge, never a rescan of history.
   */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("item", "ctx").agg(sum("cnt").as("cnt"))

  /**
   * OP-27 (SURVEY §2.6): vstack / union of two crosstabs over the same
   * context space (`similarity.py:28-29`). Caller guarantees disjoint item
   * id spaces (the reference requires the same via offset item ids), so
   * this is `merge` where no cell can collide.
   */
  def vstack(a: DataFrame, b: DataFrame): DataFrame = merge(a, b)
}
