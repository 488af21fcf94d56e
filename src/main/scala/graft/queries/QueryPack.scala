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

  /** The events table with its nanosecond parquet timestamp normalized to
    * a microsecond TimestampType column. Requires
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set by every session
    * builder in this project): Spark 4 has no native NANOS timestamp, so
    * the column arrives as a long and is floor-divided to µs — exactly
    * how DuckDB truncates the same file. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    read(spark, dir, "events").withColumn("ts",
      expr("timestamp_micros(ts div 1000)"))
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
