package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Persisted HLL distinct-count ledger — incremental cardinality over a
 * growing crawl: "how many distinct URLs / content digests / tokens per
 * scope so far" must not rescan history per report, and exact distinct
 * state is corpus-sized. The ledger keeps one DataSketches HLL sketch
 * per (scope, ingest batch) — KILOBYTES per scope, bounded regardless
 * of corpus — and serves estimates by lossless register-max union
 * across committed batches (`hll_union_agg`): the union of per-batch
 * sketches IS the sketch of the union, bit-for-bit, however the stream
 * was split (spec-gated), so appends never degrade accuracy.
 *
 * Layout: the `Compaction`/`DedupStore` protocol — one versioned root,
 * `distinct_hll/v<k>/batch_<name>` parquet of (scope, sk binary)
 * committed by a trailing `_committed_<name>` marker; redelivery under
 * one batch name overwrites the same directory (idempotent — and even
 * a DOUBLE-counted batch would be a no-op, HLL union being
 * insert-idempotent); `compact` folds batches into one base sketch row
 * per scope.
 *
 * Accuracy is the default Spark lgConfigK = 12 (~1.6 % standard error);
 * the q191 gate asserts the served estimates in-engine against exact
 * counts (the q69 pattern — the oracle checks the exact side and the
 * asserted booleans).
 */
object DistinctLedger {

  val Root = "distinct_hll"

  private def root(storePath: String) = s"$storePath/$Root"

  private def requireName(name: String): Unit = {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_'),
      s"batch name '$name' must be [A-Za-z0-9_]+ — it becomes a directory name")
    require(name != "base", "batch name 'base' is reserved for the fold product")
  }

  private def freshName(): String =
    java.util.UUID.randomUUID().toString.replace("-", "")

  private def sketchBatch(df: DataFrame, scopeCol: String,
                          valueCol: String): DataFrame =
    df.groupBy(col(scopeCol).as("scope"))
      .agg(hll_sketch_agg(col(valueCol)).as("sk"))

  /** Initialize the ledger from the base corpus (version 0). */
  def write(df: DataFrame, storePath: String,
            scopeCol: String, valueCol: String): Unit = {
    val spark = df.sparkSession
    Compaction.withLease(spark, storePath, "hll:write") {
      val r = root(storePath)
      Compaction.clearRoot(spark, r)
      val vdir = Compaction.initDir(r)
      sketchBatch(df, scopeCol, valueCol)
        .write.mode("overwrite").parquet(s"$vdir/batch_base")
      DedupStore.touch(Compaction.fs(spark, r), s"$vdir/_committed_base")
      Compaction.commit(spark, r, 0L)
    }
  }

  /** Fold one delta: one sketch pass over the DELTA only, marker LAST. */
  def append(delta: DataFrame, storePath: String,
             scopeCol: String, valueCol: String,
             batchName: Option[String] = None): Unit = {
    val spark = delta.sparkSession
    val name = batchName.getOrElse(freshName())
    requireName(name)
    Compaction.withLease(spark, storePath, s"hll:append:$name") {
      val vdir = Compaction.currentDir(spark, root(storePath))
      sketchBatch(delta, scopeCol, valueCol)
        .write.mode("overwrite").parquet(s"$vdir/batch_$name")
      DedupStore.touch(Compaction.fs(spark, root(storePath)),
        s"$vdir/_committed_$name")
    }
  }

  private def view(spark: SparkSession, storePath: String): DataFrame = {
    val r = root(storePath)
    val vdir = Compaction.currentDir(spark, r)
    val dirs = DedupStore.committedDirs(Compaction.fs(spark, r), vdir,
      "_committed_", "batch_", None)
    require(dirs.nonEmpty, s"no committed sketch batches under $vdir — write() first")
    spark.read.parquet(dirs: _*)
  }

  /** Served estimates: (scope, distinct_est) — register-max union across
    * committed batches, one sketch row per scope read, never the corpus. */
  def estimates(spark: SparkSession, storePath: String): DataFrame =
    view(spark, storePath)
      .groupBy(col("scope"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("distinct_est"))

  /** Fold committed batches into one base sketch row per scope. */
  def compact(spark: SparkSession, storePath: String): Unit =
    Compaction.withLease(spark, storePath, "hll:compact") {
      val r = root(storePath)
      val cur = Compaction.currentVersion(spark, r).getOrElse(
        throw new java.io.FileNotFoundException(s"no LATEST marker under $r"))
      val next = cur + 1
      val vdir = s"$r/v$next"
      val dirs = DedupStore.committedDirs(Compaction.fs(spark, r), s"$r/v$cur",
        "_committed_", "batch_", None)
      spark.read.parquet(dirs: _*)
        .groupBy(col("scope")).agg(hll_union_agg(col("sk")).as("sk"))
        .write.mode("overwrite").parquet(s"$vdir/batch_base")
      DedupStore.touch(Compaction.fs(spark, r), s"$vdir/_committed_base")
      Compaction.commit(spark, r, next)
      Compaction.pruneBelow(spark, r, cur)
    }
}
