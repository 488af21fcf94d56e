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

  /** `.npy` similarity-matrix sink — the MIGRATION utility for the
    * reference's matrix dumps (`similarity.py:173-186`): densify a
    * (item_a, item_b, valueCol) pair table into the row-major float32
    * square matrix numpy would have saved, ids sorted ascending as the
    * row/col order (returned for the caller's id↔index map). Explicitly
    * a one-off converter, NOT a scale path: it materializes the I×I
    * dense matrix driver-side and is guarded by `maxItems` exactly like
    * `SimilarityModel.wideMatrix`. Absent pairs densify to 0.0, the
    * diagonal to `diag` (the reference's self-correlation 1.0). */
  def saveNpyMatrix(pairs: DataFrame, path: String, valueCol: String = "corr",
                    diag: Float = 1.0f, maxItems: Int = 20000): Seq[Long] = {
    import org.apache.spark.sql.functions.col
    val ids = pairs.select(col("item_a")).unionByName(
        pairs.select(col("item_b")).withColumnRenamed("item_b", "item_a"))
      .distinct().collect().map(_.getLong(0)).sorted.toSeq
    require(ids.size <= maxItems,
      s"${ids.size} items exceed maxItems=$maxItems — .npy is a dense driver-side " +
        "format; use the parquet store for matrices at scale")
    val idx = ids.zipWithIndex.toMap
    val n = ids.size
    val dense = new Array[Float](n * n)
    var i = 0
    while (i < n) { dense(i * n + i) = diag; i += 1 }
    pairs.select(col("item_a"), col("item_b"), col(valueCol).cast("double"))
      .collect().foreach { r =>
        if (!r.isNullAt(2))
          dense(idx(r.getLong(0)) * n + idx(r.getLong(1))) = r.getDouble(2).toFloat
      }
    Npy.write(pairs.sparkSession, path, n, n, dense)
    ids
  }

  /** `.npy` matrix source — reads a reference-era dump back into the
    * engine's long-form pair table (item_a, item_b, value), off-diagonal
    * non-zero cells only (the sparse invariant of `sparsePairs`). `ids`
    * maps row/col indices to item ids — the order `saveNpyMatrix`
    * returned, or the id list the reference's dictionary implies. */
  def loadNpyMatrix(spark: SparkSession, path: String, ids: Seq[Long]): DataFrame = {
    val (rows, cols, values) = Npy.read(spark, path)
    require(rows == ids.size && cols == ids.size,
      s"matrix is $rows x $cols but ${ids.size} ids were supplied")
    val cells = for {
      r <- 0 until rows
      c <- 0 until cols
      v = values(r * cols + c)
      if r != c && v != 0.0
    } yield (ids(r), ids(c), v)
    import spark.implicits._
    cells.toDF("item_a", "item_b", "value")
  }
}
