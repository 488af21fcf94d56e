package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale-machinery queries (SURVEY §2.11): interchange formats beyond
 * parquet/CSV/JSONL, sketch aggregates with in-engine accuracy gates, and
 * explicit join-pruning structures. These operators exist FOR the 100 TB
 * case; the oracles gate their exactness (round-trips, bloom-pruned
 * joins) or their measured accuracy (sketches vs the exact answer).
 */
object ScaleQueries extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // EXT-J2: ORC round-trip — write a lineitem projection as ORC, read
    // it back. Columnar handover from Hive-era warehouses; the oracle is
    // the original table, so the round-trip must be byte-exact.
    "q68_orc_roundtrip" -> ((s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("graft_orc").toString
      val d = Tables.read(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"),
        col("l_returnflag"), col("l_linestatus"))
      graft.sources.Sources.saveOrc(d, out)
      graft.sources.Sources.orc(s, out)
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // EXT-X1: sketch profile with an in-engine accuracy gate — HLL++
    // approx-distinct (rsd 2%) and approx-percentile vs their exact
    // counterparts, per group. At 100 TB the sketches are the only
    // affordable path (fixed-size partial state, one pass, no expand);
    // this query MEASURES that they stay within tolerance, the same way
    // q41 gates ANN recall. The oracle pins the exact values and expects
    // both gates to hold (literal TRUE).
    "q69_sketch_profile" -> ((s, dir) =>
      Tables.read(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_partkey"), 0.02).as("hll"),
          percentile(col("l_quantity"), lit(0.5)).as("exact_p50"),
          percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("apx_p50"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("hll").cast("double") / col("exact_parts") - 1.0) <= 0.1)
            .as("hll_ok"),
          round(col("exact_p50"), 6).as("exact_p50"),
          (abs(col("apx_p50") - col("exact_p50")) <= 1.0).as("p50_ok"))
        .orderBy(col("l_returnflag"))),

    // EXT-C10: bloom-pruned semi-join — lineitem pruned by the small-part
    // key set BELOW its shuffle via a broadcast bloom filter, then
    // exactly semi-joined (false positives removed). Result is identical
    // to the plain semi-join; the bloom only cuts what the exchange
    // carries.
    "q71_bloom_prune" -> ((s, dir) =>
      graft.operators.Joins.bloomSemiJoin(
          Tables.read(s, dir, "lineitem"),
          Tables.read(s, dir, "part").where(col("p_size") <= 5),
          "l_partkey", "p_partkey", expectedKeys = 100000L)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity")), 6).as("sum_qty"))
        .orderBy(col("l_returnflag")))
  )

  val oracleSql: Map[String, String] = Map(
    "q68_orc_roundtrip" ->
      """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity,
        |       l_extendedprice, l_returnflag, l_linestatus
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q69_sketch_profile" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  TRUE AS hll_ok,
        |  ROUND(quantile_cont(l_quantity, 0.5), 6) AS exact_p50,
        |  TRUE AS p50_ok
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q71_bloom_prune" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       ROUND(SUM(l_quantity), 6) AS sum_qty
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 5)
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
