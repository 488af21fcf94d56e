package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact grouped quantiles from a value HISTOGRAM — the scale-correct
 * shape when the value domain is small relative to the data (status
 * codes, quantities, prices in cents, token counts): a naive exact
 * `percentile` drags every ROW into its group's partition (and fused
 * with other aggregates plans an Expand); here every full-data pass is
 * a map-side-combinable hash agg on (group, value), and the
 * rank/interpolation windows run over the tiny histogram. Continuous
 * interpolation (`percentile` / `quantile_cont` semantics): rank
 * r = 1 + (n−1)·p over value-ordered cumulative counts, interpolating
 * between the values at ⌊r⌋ and ⌈r⌉.
 *
 * At 100 TB: histogram size = groups × distinct values — if the value
 * domain is genuinely high-cardinality, use `percentile_approx` (the
 * q69 sketch gate measures that tradeoff); this operator is the EXACT
 * path that stays cheap when cardinality allows.
 */
object Profiling {

  /** (groupCol, p, q) for every group × requested quantile. NULL values of
    * `valCol` are ignored — `percentile` / `quantile_cont` semantics; a
    * NULL histogram row would inflate the rank denominator and shift every
    * cumulative count. A group whose values are all NULL emits no rows. */
  def histQuantiles(df: DataFrame, groupCol: String, valCol: String,
                    ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      "quantiles must be within [0, 1]")
    val hist = df.where(col(valCol).isNotNull)
      .groupBy(col(groupCol), col(valCol).cast("double").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
    hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(col(groupCol))))
      .withColumn("p", explode(array(ps.map(lit(_)): _*)))
      .withColumn("__r", lit(1.0) + (col("__n") - 1) * col("p"))
      .groupBy(col(groupCol), col("p"))
      .agg(
        min(when(col("__cum") >= floor(col("__r")), col("__v"))).as("__vlow"),
        min(when(col("__cum") >= ceil(col("__r")), col("__v"))).as("__vhigh"),
        (max(col("__r")) - floor(max(col("__r")))).as("__frac"))
      .select(col(groupCol), col("p"),
        (col("__vlow") + col("__frac") * (col("__vhigh") - col("__vlow"))).as("q"))
  }
}
