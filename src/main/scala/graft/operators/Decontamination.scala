package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination — the training-data hygiene operator: find
 * corpus documents that share any word n-gram with a held-out benchmark
 * set, so evaluation data can be scrubbed from the training corpus
 * (the standard 13-gram-collision protocol, parameterized n).
 *
 * Scale shape: a benchmark set is megabytes while the corpus is the
 * 100 TB side, so the benchmark's distinct n-gram hash set is BROADCAST
 * and the corpus side is a map-side hash-join probe — the corpus body
 * never shuffles for the probe. The only corpus shuffle is the
 * shingle window's id-partition (shared with every other shingle
 * consumer) and the per-doc hit count, which is co-partitioned with it.
 * Reuses `Dedup.shingleSets`, so the n-gram normalization (distinct,
 * md5-derived `hash60`) is identical to the dedup tier and the DuckDB
 * oracle.
 */
object Decontamination {

  /** Contaminated documents: (idCol, n_hits) — distinct benchmark
    * n-grams appearing in each train document; only documents with at
    * least one hit are returned. */
  def contaminated(train: DataFrame, benchmark: DataFrame, n: Int,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val benchGrams = broadcast(
      Dedup.shingleSets(benchmark, n, idCol, textCol).select("g").distinct())
    Dedup.shingleSets(train, n, idCol, textCol)
      .join(benchGrams, Seq("g"))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** The scrubbed corpus: train documents with zero benchmark n-gram
    * collisions. The contaminated id set is tiny — broadcast anti-join,
    * corpus body untouched. */
  def scrub(train: DataFrame, benchmark: DataFrame, n: Int,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    train.join(
      broadcast(contaminated(train, benchmark, n, idCol, textCol).select(idCol)),
      Seq(idCol), "left_anti")

  /** FUZZY decontamination — the near-duplicate face: a rephrased or
    * lightly-edited benchmark item shares no exact n-gram run but still
    * leaks the answer, so production scrubbing pairs the exact-collision
    * protocol with a MinHash similarity sweep. Cross-set MinHash-LSH
    * candidates (train bands probe the BROADCAST benchmark band table —
    * the benchmark is megabytes, the corpus never shuffles for the
    * probe) → EXACT Jaccard refine on candidates only (precision is
    * exact; recall tracks the LSH collision curve, as in the dedup
    * tier). Ids must be unique ACROSS both inputs (they key the refine's
    * shingle union). Output: (idCol, n_bench_matches, max_jaccard), one
    * row per contaminated train doc. */
  def contaminatedFuzzy(train: DataFrame, benchmark: DataFrame,
                        n: Int, numPerms: Int, bands: Int,
                        threshold: Double,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    require(numPerms % bands == 0, "numPerms must divide into bands")
    val rows = numPerms / bands
    val tb = Dedup.lshBands(
      Dedup.minHashSignatures(train, n, numPerms, idCol, textCol), bands, rows)
    val bb = Dedup.lshBands(
      Dedup.minHashSignatures(benchmark, n, numPerms, idCol, textCol), bands, rows)
      .select(col("band"), col("bk"), col("id").as("bench_id"))
    val cand = tb.join(broadcast(bb), Seq("band", "bk"))
      .select(col("id").as("doc_a"), col("bench_id").as("doc_b")).distinct()
    val sh = Dedup.shingleSets(train, n, idCol, textCol)
      .unionByName(Dedup.shingleSets(benchmark, n, idCol, textCol))
    Dedup.refineJaccard(cand, sh, threshold)
      .groupBy(col("doc_a").as(idCol))
      .agg(count(lit(1)).as("n_bench_matches"),
        round(max(col("jaccard")), 6).as("max_jaccard"))
  }

  /** Scrub face of [[contaminatedFuzzy]] — broadcast anti-join on the
    * (tiny) contaminated id set. */
  def scrubFuzzy(train: DataFrame, benchmark: DataFrame,
                 n: Int, numPerms: Int, bands: Int, threshold: Double,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    train.join(
      broadcast(contaminatedFuzzy(train, benchmark, n, numPerms, bands,
        threshold, idCol, textCol).select(idCol)),
      Seq(idCol), "left_anti")
}
