package graft.operators

import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Cast, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/**
 * Join-side pruning structures for fact tables too large to shuffle
 * casually.
 *
 * `bloomSemiJoin` covers the gap between Spark's two built-in answers:
 * a broadcast hash join needs the key SET to fit in memory on every
 * executor, and Catalyst's automatic runtime bloom filter
 * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) only injects when
 * its creation-side heuristics fire inside a single query. This operator
 * is the explicit surface: build the bloom ONCE (one aggregate over the
 * key side — a few MB regardless of key count), embed it as a literal in
 * the probe, and pre-filter the fact side BELOW its shuffle, so rows that
 * cannot match never leave the scan stage. The exact semi-join afterwards
 * removes the false positives, so results are EXACT — the bloom only
 * prunes.
 *
 * At 100 TB: a 1% fpp bloom over 10^8 keys is ~120 MB of bitset versus
 * shuffling the full fact table; the pruned exchange carries only the
 * (small) matching fraction plus fpp × non-matching.
 */
object Joins {

  /** Exact left-semi join of `big` against `keys`, with a bloom filter
    * pruning `big` before its shuffle. `expectedKeys`/`fpp` size the
    * bitset (see `BloomFilter.optimalNumOfBits`). Key columns must be
    * integral (LONG-compatible) — the hot path for surrogate keys.
    *
    * Build and probe are the NATIVE Catalyst expressions
    * (`bloom_filter_agg` / `might_contain` over `xxhash64`), so the probe
    * stays inside whole-stage codegen on the fact-table scan — the one
    * stage this operator exists to keep cheap; a Scala UDF there would
    * break codegen for the whole stage. The aggregate enforces
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` /
    * `.maxNumBits` (defaults 4M items / 8 MB) — raise those confs for
    * larger key sides. NULL fact keys may pass the bloom (xxhash64 of
    * NULL is the seed) but never survive the exact semi-join. */
  def bloomSemiJoin(big: DataFrame, keys: DataFrame,
                    bigKey: String, keyCol: String,
                    expectedKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val numBits = BloomFilter.optimalNumOfBits(expectedKeys, fpp)
    // XxHash64 hashes INT and LONG inputs DIFFERENTLY, so a 32-bit key
    // side probed by a 64-bit fact key (both within the documented
    // integral contract) would silently prune every matching row. Cast
    // both sides to LONG so build and probe hash the same bit pattern.
    def longHash(c: String, df: DataFrame) =
      new XxHash64(Seq(Cast(GraftColumnBridge.expression(df(c)), LongType)))
    val buildHash = longHash(keyCol, keys)
    val agg = GraftColumnBridge.column(
      new BloomFilterAggregate(buildHash, Literal(expectedKeys), Literal(numBits))
        .toAggregateExpression())
    // One bounded driver action: the serialized bitset (numBits/8 bytes,
    // independent of key count), embedded as a foldable literal so the
    // probe expression codegens against a constant.
    val bytes = keys.agg(agg.as("bf")).head().getAs[Array[Byte]](0)
    val pruned =
      if (bytes == null) big.where(lit(false)) // empty key side: nothing can match
      else big.where(GraftColumnBridge.column(BloomFilterMightContain(
        Literal(bytes, BinaryType),
        longHash(bigKey, big))))
    pruned.join(keys.select(col(keyCol).as(bigKey)).distinct(), Seq(bigKey), "left_semi")
  }

  /** Interval containment join: every (point, range) pair with
    * `lo <= point < hi` — the IP-to-geo / timestamp-to-validity-window
    * lookup class that Spark's planner can only express as a
    * BroadcastNestedLoopJoin (a scan of EVERY range per point).
    *
    * Bucket decomposition turns it into an EQUI join: the number line is
    * cut into `bucketWidth`-sized buckets, each range is exploded to the
    * buckets it touches (⌈len/W⌉+1 rows), each point maps to exactly one
    * bucket, and a plain hash join on the bucket id + an exact residual
    * containment filter yields the identical pair set. Cost is
    * |points| + Σ(range_len/W) join rows instead of |points|×|ranges|.
    *
    * At 100 TB: the point side shuffles ONCE on a uniformly-distributed
    * integer key (or not at all — a lookup-table range side small enough
    * to broadcast keeps the whole join map-side, which AQE picks
    * automatically since the exploded range table is still tiny). Pick
    * `bucketWidth` near the median range length: too small multiplies
    * the range side, too large piles unrelated ranges into one bucket.
    * Overlapping ranges are supported — a point matches each container.
    *
    * Keys must be integral; bucket arithmetic uses true floor division
    * (`pmod`), so negative domains bucket correctly. Empty ranges
    * (`hi <= lo`) match nothing, NULL bounds/points drop out (no bucket).
    */
  def intervalJoin(points: DataFrame, ranges: DataFrame, pointCol: String,
                   loCol: String, hiCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: String) =
      expr(s"(($c - pmod($c, ${bucketWidth}L)) DIV ${bucketWidth}L)")
    val rb = ranges
      .where(col(hiCol) > col(loCol))
      .withColumn("__gbkt",
        explode(sequence(bucketOf(loCol), bucketOf(s"$hiCol - 1"))))
    points
      .withColumn("__gbkt", bucketOf(pointCol))
      .join(rb, Seq("__gbkt"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__gbkt")
  }

  /** Skew-salted equi inner join: `facts ⋈ dim` on `key`, with the fact
    * side's hot keys SPREAD across `salts` shuffle partitions instead of
    * funneled into one task.
    *
    * A plain shuffle join hashes every row of a hot key to the same
    * reducer — the classic 100 TB straggler (one task holds the whole
    * key while 999 executors idle). Salting re-keys the join on
    * (key, salt): each fact row gets a deterministic salt derived from a
    * second column (spreading a hot key's rows uniformly), and the dim
    * side is exploded ×`salts` so every (key, salt) bucket still finds
    * its dim row. The join OUTPUT is provably identical to the unsalted
    * join — each fact row meets exactly the one dim replica carrying its
    * salt — which the oracle checks by running the NAIVE join (the gate
    * doubles as a machine-checked losslessness proof, like the q110
    * blocking gate). AQE's skew-join split covers sort-merge joins
    * after the fact; explicit salting also covers hash joins, grace
    * periods before AQE statistics exist, and aggregations downstream
    * that inherit the salted partitioning.
    *
    * Replication cost: |dim| × `salts` extra build rows — pick `salts`
    * near the ratio (hot-key rows / average-key rows). `saltSource`
    * must be integral and reasonably spread per key (a line number, an
    * event id, a timestamp); its value never affects the result, only
    * the balance. */
  def saltedEquiJoin(facts: DataFrame, dim: DataFrame, key: String,
                     saltSource: org.apache.spark.sql.Column,
                     salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // Knuth multiplicative spread of the salt source, pre-reduced so the
    // product stays far from Long overflow under ANSI arithmetic. The
    // source is NULL-coalesced first: a NULL (or NULL-casting) salt
    // source would derive __salt = NULL and the inner join on
    // (key, __salt) would silently DROP rows the unsalted join keeps —
    // breaking the losslessness guarantee. NULL sources all land in
    // bucket 0 (skewed but correct; pick a non-null source for balance).
    val salted = facts.withColumn("__salt",
      pmod(pmod(coalesce(saltSource.cast("long"), lit(0L)), lit(1000003L))
        * lit(2654435761L), lit(salts.toLong)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
