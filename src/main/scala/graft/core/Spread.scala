package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/**
 * Input-spread gate for the corpus-body entry points (shingling, SimHash,
 * ANN scoring): the hash-heavy map stages want at least session-parallelism
 * partitions, but an UNCONDITIONAL `repartition` is a full body shuffle —
 * at 100 TB the input already arrives in thousands of splits and spreading
 * it again just moves every document once for nothing. Spread only when the
 * input genuinely under-parallelizes: fewer partitions than the session's
 * default parallelism (the single-big-file / collected-fixture case).
 *
 * `spark.graft.spread` overrides the heuristic: `always` restores the
 * unconditional spread, `never` disables it (bucketed upstreams that must
 * keep their partitioning), default `auto`.
 */
object Spread {

  val Conf = "spark.graft.spread"

  /** `df` hash-partitioned on `key` iff it arrives narrower than the
    * session parallelism (or the conf forces a side). Checking width costs
    * one driver-side physical plan of `df`, no job. */
  def byKey(df: DataFrame, key: Column): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get(Conf, "auto") match {
      case "always" => df.repartition(key)
      case "never"  => df
      case _ =>
        if (df.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
          df.repartition(key)
        else df
    }
  }
}
