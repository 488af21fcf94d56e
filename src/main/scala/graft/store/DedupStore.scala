package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Caches
import graft.operators.Dedup

/**
 * Persisted dedup state — the incremental face of the MinHash-LSH tier
 * (the crawl-increment protocol): the kept corpus is represented on disk
 * by its SIGNATURE table, and each day's delta dedups against that state
 * with one pass over the DELTA — the base corpus TEXT is never rescanned
 * (plan-guarded in `DedupStoreSpec`).
 *
 * Semantics are KEEP-FIRST, the streaming-corpus rule: an earlier-kept
 * document always beats a later near-duplicate (`dedupKeepFirst`'s
 * contract at the near-dup tier). Within one delta, near-dup components
 * keep their minimum id — unless that survivor itself near-matches the
 * store, in which case nothing of its component survives (the others
 * were only ever near-dups of a doc that lost to kept content). The
 * drop criterion is the SIGNATURE
 * similarity estimate (`Dedup.estSim` ≥ threshold) — the decision an
 * index-only system can make without refetching base text; an exact
 * Jaccard re-check would need base shingle sets, i.e. a second, far
 * larger persisted table. Documents too short to shingle (< n tokens)
 * carry no signature and always pass — no evidence, no drop.
 *
 * Scale: the store holds numPerms longs per kept document; the delta
 * pass is delta shingling (map-only) + band hash joins whose candidate
 * cost tracks LSH collision probability; band keys are recomputed from
 * stored signatures map-side (signatures are the state — persisting the
 * derivable band table would only trade IO for md5).
 */
object DedupStore {

  val Signatures = "minhash_sigs"

  /** Initialize the store: persist the signature table of an
    * (ideally already-deduplicated) base corpus. */
  def write(docs: DataFrame, n: Int, numPerms: Int, storePath: String,
            idCol: String = "doc_id", textCol: String = "text"): Unit =
    Dedup.minHashSignatures(docs, n, numPerms, idCol, textCol)
      .write.mode("overwrite").parquet(s"$storePath/$Signatures")

  /** The stored signature table (id, sig) — the LIVE view (re-lists
    * files on evaluation, so it sees appends). */
  def signatures(spark: SparkSession, storePath: String): DataFrame =
    spark.read.parquet(s"$storePath/$Signatures")

  /** Compact the signature table: every `dedupDelta` appends a few part
    * files, and a long-lived store accumulates them until listing + one
    * footer per tiny file dominates the band join's scan. One
    * id-partitioned rewrite restores the bulk layout; dedup decisions
    * are unaffected (same rows). Run OFFLINE (see `Compaction`). */
  def compact(spark: SparkSession, storePath: String): Unit =
    Compaction.rewriteInPlace(s"$storePath/$Signatures") {
      signatures(spark, storePath).repartition(col("id"))
    }

  /** The signature table pinned to the files present NOW: appends write
    * new part files, so a frame built over this enumeration stays stable
    * however often it re-evaluates. `dedupDelta` reads through this —
    * its own survivor append must not change the answer the caller's
    * later actions see. */
  private def signaturesPinned(spark: SparkSession, storePath: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val dir = new Path(s"$storePath/$Signatures")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
    require(files.nonEmpty, s"no signature files under $dir — initialize with write()")
    spark.read.parquet(files: _*)
  }

  /**
   * Dedup one DELTA against the store, append the survivors' signatures
   * (the ingest step — the append is this call's action), and return the
   * kept delta documents schema-preserving. `estThreshold` is on
   * signature agreement; `bands` must divide `numPerms`.
   */
  def dedupDelta(delta: DataFrame, storePath: String, n: Int, numPerms: Int,
                 bands: Int, estThreshold: Double,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(numPerms % bands == 0, s"bands $bands must divide numPerms $numPerms")
    val spark = delta.sparkSession
    val r = numPerms / bands
    val dsig = Caches.cacheOnce(
      Dedup.minHashSignatures(delta, n, numPerms, idCol, textCol))
    val bsig = signaturesPinned(spark, storePath)
    val dBands = Dedup.lshBands(dsig, bands, r)
    val bBands = Dedup.lshBands(bsig, bands, r)
    // Delta docs whose signature near-matches ANY stored doc: first
    // arrival wins, the delta copy drops.
    val dupOfStore = dBands
      .join(bBands.select(col("id").as("bid"), col("band"), col("bk")), Seq("band", "bk"))
      .select(col("id"), col("bid")).distinct()
      .join(dsig.select(col("id"), col("sig").as("dsg")), Seq("id"))
      .join(bsig.select(col("id").as("bid"), col("sig").as("bsg")), Seq("bid"))
      .where(Dedup.estSim(col("dsg"), col("bsg"), numPerms) >= estThreshold)
      .select(col("id")).distinct()
    // Intra-delta components: min-id survivor (keep-first has no quality
    // tier — arrival order, then id, is the rule).
    val pairs = Dedup.lshCandidates(dsig, bands, r)
      .where(col("est_sim") >= estThreshold)
      .select(col("doc_a"), col("doc_b"))
    val comps = Dedup.connectedComponents(pairs)
    val intraDropped = comps.where(col("id") =!= col("component")).select(col("id"))
    val dropped = Caches.cacheOnce(
      dupOfStore.unionByName(intraDropped).distinct()
        .withColumnRenamed("id", idCol))
    val kept = Dedup.keepCorpus(delta, dropped, idCol, dropped.count())
    // Ingest: survivors' signatures join the store for the NEXT delta.
    dsig.join(kept.select(col(idCol).as("id")), Seq("id"), "left_semi")
      .write.mode("append").parquet(s"$storePath/$Signatures")
    kept
  }
}
