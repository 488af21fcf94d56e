package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named set of driver-checkable queries. Each entry in `queries` takes
  * (session, sfDir) and returns a deterministic DataFrame (total ORDER BY,
  * doubles rounded 1e-6, NaN→NULL — SURVEY §5.3). `oracleSql` holds the
  * DuckDB-equivalent SQL over the same parquet tables, with IDENTICAL
  * output column names and row order. */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}

object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table with its parquet timestamp normalized to a
    * microsecond TimestampType column, whatever the file encodes:
    *
    *  - NANOS (older fixtures): Spark 4 has no native nanos timestamp, so
    *    under `spark.sql.legacy.parquet.nanosAsLong=true` (set by every
    *    session builder in this project) the column arrives as a long and
    *    is floor-divided to µs — exactly how DuckDB truncates that file;
    *  - MICROS, isAdjustedToUTC=false (current fixtures): arrives as
    *    TIMESTAMP_NTZ; the wall clock is interpreted as UTC (sessions pin
    *    `spark.sql.session.timeZone=UTC`), the same instants DuckDB reads;
    *  - MICROS, adjusted: already TimestampType — as-is. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = read(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Occurrence-log derivation "orders-basket" (FIXTURES.md §B): items
    * co-occurring within an order. */
  def occOrders(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    read(spark, dir, "lineitem")
      .select(col("l_partkey").as("item_id"), col("l_orderkey").as("reference_id"))
  }

  /** Occurrence-log derivation "customer-history": items co-occurring per
    * customer (lineitem ⋈ orders — orders is the smaller side at any SF but
    * still scales with fact data; Catalyst/AQE picks broadcast when it
    * fits). */
  def occCustomers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val li = read(spark, dir, "lineitem")
    val o = read(spark, dir, "orders")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select(col("l_partkey").as("item_id"), col("o_custkey").as("reference_id"))
  }

  /** Item dictionary fixture: part names (FIXTURES.md §B). */
  def dictionary(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    read(spark, dir, "part")
      .select(col("p_partkey").as("id"), col("p_name").as("key"))
  }
}
