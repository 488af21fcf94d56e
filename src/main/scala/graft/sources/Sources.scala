package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Source/sink facades (SURVEY §2.1: OP-01..05).
 *
 * The reference streams CSV in 1000-row pandas chunks for out-of-core batch
 * ingestion (`/root/reference/propius/utils.py:6-25`) and routes `s3://`
 * URLs to a boto-backed reader (`utils.py:28-35`). Spark's partitioned file
 * scan subsumes the chunking (splits sized by
 * `spark.sql.files.maxPartitionBytes`), and the Hadoop filesystem layer
 * handles scheme dispatch natively — `s3a://` paths work with the standard
 * credential chain; `s3Credentials` mirrors the reference's explicit
 * env-var wiring when needed.
 */
object Sources {

  /** OP-01/02/03: CSV scan. Explicit schema per the input contract
    * (FIXTURES.md §A); header assumed like pandas' default. */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** Dev-only inferring variant (matches pandas type inference). */
  def csvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** OP-02: explicit S3 credentials (the reference reads
    * AWS_ACCESS_KEY_ID / AWS_SECRET_ACCESS_KEY, `utils.py:16-20`). */
  def s3Credentials(spark: SparkSession, accessKey: String, secretKey: String): Unit = {
    spark.conf.set("spark.hadoop.fs.s3a.access.key", accessKey)
    spark.conf.set("spark.hadoop.fs.s3a.secret.key", secretKey)
  }

  /** OP-04: matrix/pair-table sink. CSV kept for reference parity
    * (`similarity.py:170-187`); parquet replaces `.npy`. */
  def saveCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def saveParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** OP-05: matrix source (CSV round-trip needs the schema back). */
  def loadCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** JSONL (newline-delimited JSON) — the lingua franca of training-data
    * corpora. Explicit schema: at 100 TB, schema inference means a full
    * extra pass over the data. */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** JSONL sink (one JSON object per line, splittable by any consumer). */
  def saveJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC source/sink — the second columnar interchange format (Hive
    * warehouses hand corpora over as ORC as often as parquet). Same
    * pushdown/pruning contract as the parquet path. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def saveOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
