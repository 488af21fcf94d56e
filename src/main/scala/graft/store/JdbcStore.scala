package graft.store

import java.sql.DriverManager
import java.util.Properties
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * JDBC face of the similarity store — OP-06..08 literal parity with the
 * reference's SQLite sink: `/root/reference/propius/data.py:44-87`
 * prepares `correlated_items(id, key, human_label)` and
 * `similar_items(item_a_id, item_b_id, scaled_score)` with unique
 * indexes, then populates them row-by-row. A propius user serving an
 * existing SQLite/JDBC consumer points this face at the same database
 * (`jdbc:sqlite:...` with the driver on the classpath — in-sandbox the
 * spec gates it against Spark's bundled embedded Derby):
 *
 *  - DDL (drop/create tables + unique indexes) runs over ONE driver-side
 *    connection — schema setup is metadata, not data;
 *  - rows land through `DataFrameWriter.jdbc` in append mode: each
 *    partition batches inserts over its own connection, the bulk-load
 *    shape (the reference's per-row `executemany` loop is the part NOT
 *    worth reproducing). For a server database, size the write with
 *    `numPartitions`/`batchsize` in `props`.
 *
 * The unique indexes keep the reference's contract active: a duplicate
 * (item_a_id, item_b_id) append fails loudly instead of silently
 * double-serving a pair. Types are portable ANSI (BIGINT/VARCHAR/DOUBLE
 * PRECISION) rather than SQLite's affinity names.
 */
object JdbcStore {

  val CorrelatedItems = "correlated_items"
  val SimilarItems = "similar_items"

  /** Drop-if-exists portability: Derby (and some server dialects) lack
    * `DROP TABLE IF EXISTS`; a failed drop of a missing object is the
    * IF EXISTS semantics. */
  private def dropQuietly(stmt: java.sql.Statement, sql: String): Unit =
    try { stmt.executeUpdate(sql); () } catch { case _: java.sql.SQLException => () }

  /** Prepare the two tables + unique indexes (`data.py:44-87`). */
  def prepareTables(url: String, props: Properties = new Properties): Unit = {
    val conn = DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try {
        // Column identifiers are ANSI-quoted lowercase: Spark's JDBC
        // writer quotes the DataFrame's column names on INSERT, and an
        // unquoted DDL name would canonicalize to uppercase on Derby and
        // never match ("key" is also a reserved word there).
        dropQuietly(st, s"DROP TABLE $CorrelatedItems")
        // human_label is CLOB, not VARCHAR: it is always-NULL
        // (`data.py:109`) and Spark's Derby dialect binds StringType
        // NULLs with the CLOB type code, which Derby refuses against a
        // VARCHAR parameter; the indexed `key` column stays VARCHAR
        // (non-null values bind as strings, and CLOB columns cannot
        // carry the unique index). SQLite ignores both names (type
        // affinity), so the reference contract is unchanged there.
        st.executeUpdate(
          s"""CREATE TABLE $CorrelatedItems(
             |  "id" BIGINT PRIMARY KEY,
             |  "key" VARCHAR(1024),
             |  "human_label" CLOB)""".stripMargin)
        st.executeUpdate(
          s"""CREATE UNIQUE INDEX ux__${CorrelatedItems}__key ON $CorrelatedItems ("key")""")
        dropQuietly(st, s"DROP TABLE $SimilarItems")
        st.executeUpdate(
          s"""CREATE TABLE $SimilarItems(
             |  "item_a_id" BIGINT,
             |  "item_b_id" BIGINT,
             |  "scaled_score" DOUBLE PRECISION)""".stripMargin)
        st.executeUpdate(
          s"""CREATE UNIQUE INDEX ux__${SimilarItems}__item_a_id__item_b_id """ +
            s"""ON $SimilarItems ("item_a_id", "item_b_id")""")
      } finally st.close()
    } finally conn.close()
  }

  /** OP-06..08 over JDBC: prepare the schema, then bulk-append the
    * dictionary (human_label NULL — the reference never populates it,
    * `data.py:109`) and the thresholded pair table. */
  def storeIn(dictionary: DataFrame, pairs: DataFrame, url: String,
              props: Properties = new Properties): Unit = {
    prepareTables(url, props)
    dictionary
      .select(col("id").cast("long"), col("key").cast("string"),
        lit(null).cast("string").as("human_label"))
      .write.mode("append").jdbc(url, CorrelatedItems, props)
    pairs
      .select(col("item_a_id").cast("long"), col("item_b_id").cast("long"),
        col("scaled_score").cast("double"))
      .write.mode("append").jdbc(url, SimilarItems, props)
  }

  def readCorrelatedItems(spark: SparkSession, url: String,
                          props: Properties = new Properties): DataFrame =
    spark.read.jdbc(url, CorrelatedItems, props)

  def readSimilarItems(spark: SparkSession, url: String,
                       props: Properties = new Properties): DataFrame =
    spark.read.jdbc(url, SimilarItems, props)
}
