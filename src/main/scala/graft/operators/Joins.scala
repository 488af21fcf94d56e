package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
 * key side — a few MB regardless of key count), broadcast it, and
 * pre-filter the fact side BELOW its shuffle, so rows that cannot match
 * never leave the scan stage. The exact semi-join afterwards removes the
 * false positives, so results are EXACT — the bloom only prunes.
 *
 * At 100 TB: a 1% fpp bloom over 10^8 keys is ~120 MB of bitset versus
 * shuffling the full fact table; the pruned exchange carries only the
 * (small) matching fraction plus fpp × non-matching.
 */
object Joins {

  /** Exact left-semi join of `big` against `keys`, with a broadcast
    * bloom filter pruning `big` before its shuffle. `expectedKeys`/`fpp`
    * size the bitset (see `BloomFilter.create`). Key columns must be
    * integral (LONG-compatible) — the hot path for surrogate keys. */
  def bloomSemiJoin(big: DataFrame, keys: DataFrame,
                    bigKey: String, keyCol: String,
                    expectedKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bf = keys.stat.bloomFilter(keyCol, expectedKeys, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((v: java.lang.Long) =>
      v != null && bc.value.mightContainLong(v))
    big.filter(mightContain(col(bigKey)))
      .join(keys.select(col(keyCol).as(bigKey)).distinct(), Seq(bigKey), "left_semi")
  }
}
