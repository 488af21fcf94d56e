package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality constraint checks (the Deequ/Great-Expectations
 * tier, Schelter et al. 2018 "Automating Large-Scale Data Quality
 * Verification") — the gate a pipeline runs BEFORE training-data jobs
 * consume a freshly-landed table: completeness (null fraction), key
 * uniqueness, referential integrity, and value bounds, each reported as
 * one (check, target, metric, passed) row so a scheduler can fail the
 * run on any `passed = false`.
 *
 * Every check is a single aggregate over the target table — map-side
 * combinable, no windows; referential integrity is one LEFT ANTI join
 * keyed on the parent key (AQE broadcasts dimension-sized parents).
 * Checks UNION into one report, so N checks over one table share its
 * scan when Spark can (each aggregate is still independent — run what
 * you declare, pay for what you run). Pass/fail verdicts compare exact
 * COUNTs (integers), never floating thresholds; metrics round 1e-6 for
 * reporting only.
 */
object DataQuality {

  /** Completeness: fraction of NULL values in `c`; passes when exactly
    * zero nulls. */
  def nullFracCheck(df: DataFrame, c: String, target: String): DataFrame =
    df.agg(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("nulls"),
        count(lit(1)).as("n"))
      .select(lit(s"null_frac:$target").as("check"),
        round(coalesce(col("nulls"), lit(0L)).cast("double") /
          greatest(col("n"), lit(1L)).cast("double"), 6).as("metric"),
        (coalesce(col("nulls"), lit(0L)) === 0L).as("passed"))

  /** Key uniqueness: distinct/count ratio of `c` (NULLs count as
    * violations — a NULL key is not unique evidence); passes when every
    * row has a distinct non-null key. */
  def uniqueCheck(df: DataFrame, c: String, target: String): DataFrame =
    df.agg(
        count_distinct(col(c)).as("d"),
        count(lit(1)).as("n"))
      .select(lit(s"unique:$target").as("check"),
        round(col("d").cast("double") /
          greatest(col("n"), lit(1L)).cast("double"), 6).as("metric"),
        (col("d") === col("n")).as("passed"))

  /** Referential integrity: metric = orphan-row count of `childKey`
    * values absent from `parentKey` (NULL child keys are orphans — they
    * reference nothing); passes at zero orphans. */
  def fkCheck(child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String,
              target: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("orphans"))
      .select(lit(s"fk:$target").as("check"),
        col("orphans").cast("double").as("metric"),
        (col("orphans") === 0L).as("passed"))

  /** Lower value bound: metric = count of rows with `c` ≤ `lo` (NULLs
    * don't violate a bound — completeness is `nullFracCheck`'s job);
    * passes when every non-null value is strictly above `lo`. */
  def minBoundCheck(df: DataFrame, c: String, lo: Double,
                    target: String): DataFrame =
    df.agg(sum(when(col(c) <= lo, 1L).otherwise(0L)).as("viol"))
      .select(lit(s"min_bound:$target").as("check"),
        coalesce(col("viol"), lit(0L)).cast("double").as("metric"),
        (coalesce(col("viol"), lit(0L)) === 0L).as("passed"))

  /** Non-emptiness: metric = row count; passes when above `atLeast`. */
  def rowCountCheck(df: DataFrame, atLeast: Long, target: String): DataFrame =
    df.agg(count(lit(1)).as("n"))
      .select(lit(s"row_count:$target").as("check"),
        col("n").cast("double").as("metric"),
        (col("n") >= atLeast).as("passed"))

  /** One report from many checks: UNION ALL, ordered by check name. */
  def report(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "report: declare at least one check")
    checks.reduce(_.unionByName(_)).orderBy(col("check"))
  }
}
