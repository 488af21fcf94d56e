package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multi-dimensional data layout: Morton (Z-order) clustering.
 *
 * A 100 TB table filtered on TWO dimensions can only skip files for one
 * of them if it is sorted lexicographically; interleaving the bits of
 * both keys into a single Z-value and range-partitioning + sorting on it
 * gives every file a small RECTANGLE of the (x, y) key space, so min/max
 * footer stats prune scans for predicates on either dimension. This is
 * the standard layout move behind Delta/Iceberg `ZORDER BY`, expressed
 * here as plain Spark arithmetic: the Z-value is a codegen'd integer
 * expression (no UDF), and the layout itself is `repartitionByRange` +
 * `sortWithinPartitions` — one exchange, then a local sort that the
 * parquet writer streams.
 *
 * Reference scope note: the reference engine (propius) has no layout
 * story at all — its store is a single SQLite file. This operator is
 * part of the warehouse-scale surface this engine adds.
 */
object Layout {

  /** Morton interleave of two non-negative integer columns, `bits` bits
    * each (callers bound the inputs, e.g. via `pmod`, to [0, 2^bits)).
    * Bit i of x lands at position 2i, bit i of y at 2i+1 — pure
    * shift/mask arithmetic, whole-stage-codegen friendly, and replayable
    * verbatim in any SQL engine (the oracle re-derives it). */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The physical layout: cluster `df` by the Z-value of (x, y). One
    * range exchange on the Z-value, then a partition-local sort — the
    * shape a writer wants (each output file covers a contiguous Z-range,
    * i.e. a bounded (x, y) rectangle). The Z-column is kept (callers
    * drop it after writing if undesired). */
  def clusterByZ(df: DataFrame, x: Column, y: Column, bits: Int,
                 zName: String = "zv"): DataFrame =
    df.withColumn(zName, zValue(x, y, bits))
      .repartitionByRange(col(zName))
      .sortWithinPartitions(col(zName))

  /** Z-clustered parquet write targeting an output-file SIZE instead of
    * inheriting `spark.sql.shuffle.partitions` — the knob that decides
    * whether a 100 TB table lands as healthy ~512 MB files or as a
    * million 50 KB shards (metadata death) / a handful of 100 GB ones
    * (no scan parallelism). File count comes from Catalyst's
    * size-in-bytes estimate scaled by `parquetFactor` (columnar
    * compression vs the in-memory estimate; measure once per table
    * class and pin). Returns the file count used. */
  def sizedClusteredWrite(df: DataFrame, x: Column, y: Column, bits: Int,
                          path: String, targetFileBytes: Long,
                          parquetFactor: Double = 0.5): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes.toDouble
    val nFiles = math.max(1, math.ceil(est * parquetFactor / targetFileBytes).toInt)
    df.withColumn("zv", zValue(x, y, bits))
      .repartitionByRange(nFiles, col("zv"))
      .sortWithinPartitions(col("zv"))
      .write.mode("overwrite").parquet(path)
    nFiles
  }

  /** Parquet write with BLOOM FILTERS on the named columns — the
    * point-lookup knob for serving/dictionary tables: row groups whose
    * bloom filter excludes the probed key are skipped without decoding
    * (min/max stats can't prune high-cardinality UNSORTED keys, blooms
    * can). `expectedNdv` sizes each filter (per row group); oversizing
    * wastes footer bytes, undersizing inflates the false-positive rate
    * toward "never skips". Costs write-side memory ∝ ndv and footer
    * bytes — reserve it for columns that are genuinely point-probed
    * (item ids, digests), not for every column. Readers need nothing:
    * parquet bloom pruning engages automatically under pushed equality
    * predicates. */
  def bloomFilteredWrite(df: DataFrame, path: String, bloomCols: Seq[String],
                         expectedNdv: Long): Unit = {
    require(bloomCols.nonEmpty, "name at least one bloom column")
    require(expectedNdv > 0, "expectedNdv must be positive")
    bloomCols.foldLeft(df.write.mode("overwrite")) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", expectedNdv.toString)
    }.parquet(path)
  }

  /** Deterministic multi-epoch shuffle order — the data-loader step after
    * the token-shard write (EXT-J5): training wants each epoch to visit
    * the corpus in a DIFFERENT pseudo-random order, reproducibly across
    * reruns, partitionings, and engines. Each epoch keys every row with
    * the engine's hash-permutation family (`hashPermOf`, epoch = the
    * permutation index — no RNG state, so the order is a pure function of
    * (id, epoch)) and `step` is the global 0-based consumption index
    * under (epoch, key, id). No unpartitioned window anywhere: the rank
    * is `Ids.denseIds`' two-phase distributed numbering, so the sort that
    * defines the order is a range exchange, exactly the shuffle a shard
    * writer needs anyway. Requires `idCol` unique (the usual training-set
    * contract) for a total order. */
  def epochOrder(df: DataFrame, idCol: String, epochs: Int): DataFrame = {
    require(epochs >= 1, "epochOrder: epochs must be >= 1")
    import graft.functions.TextFunctions.{hash60, hashPermOf, HashPermMod}
    val reps = df.select(col(idCol))
      .withColumn("epoch", explode(sequence(lit(0L), lit(epochs - 1L))))
      .withColumn("__k",
        hashPermOf(hash60(col(idCol).cast("string")) % HashPermMod, col("epoch")))
    Ids.denseIds(reps, Seq(col("epoch"), col("__k"), col(idCol)), "step")
      .select(col("epoch"), col(idCol), col("step"))
  }
}
