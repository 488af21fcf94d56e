package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Edit-distance similarity join — the data-cleaning face of entity
 * resolution: find string pairs within Levenshtein distance 1 (typos,
 * OCR slips, vendor-name drift) WITHOUT the all-pairs product that a
 * naive `levenshtein(a, b) <= k` theta join plans as.
 *
 * Blocking is the FastSS deletion neighborhood [Bocek et al. 2007,
 * "Fast Similarity Search in Large Dictionaries"]: every string emits
 * itself plus each single-character deletion (|s|+1 variants), and two
 * strings within edit distance 1 PROVABLY share ≥1 variant —
 *  - equal strings share themselves;
 *  - an insertion/deletion apart: deleting the inserted char from the
 *    longer side yields the shorter side verbatim;
 *  - a substitution apart: deleting the differing position from both
 *    sides yields the same string.
 * So an EQUI join on the variant is a complete candidate generator, and
 * the exact `levenshtein <= 1` residual only REMOVES false candidates
 * (e.g. transpositions) — results are exact. The oracle runs the naive
 * all-pairs join, so the correctness gate doubles as a losslessness
 * proof of the blocking.
 *
 * Scale shape: one exchange keyed on the variant hash (strings are
 * short; the exploded side is |s|+1 × input, still linear), then a hash
 * join. `maxVariantDegree` drops variants shared by more strings — a
 * fragment common to thousands of catalog entries is boilerplate (the
 * `capBandDegree` argument), and its self-join is the one quadratic
 * cliff of the plan.
 */
object FuzzyJoin {

  /** The FastSS-1 neighborhood: `s` plus each single-deletion of `s`. */
  private def deletionVariants(s: Column): Column =
    array_union(array(s),
      transform(sequence(lit(1), length(s)),
        i => concat(substring(s, lit(1), i - 1), substring(s, i + 1, length(s)))))

  /** Distinct pairs of `strCol` values within Levenshtein distance 1
    * (a < b lexicographically), with the distance.
    * Output: (name_a, name_b, dist). Input rows are deduplicated on
    * `strCol` first — this is a vocabulary-level join. */
  def levenshtein1Pairs(df: DataFrame, strCol: String,
                        maxVariantDegree: Option[Int] = None): DataFrame = {
    val names = df.select(col(strCol).as("s")).where(col("s").isNotNull).distinct()
    val exploded = names.select(col("s"),
      explode(deletionVariants(col("s"))).as("v"))
    val keyed = maxVariantDegree match {
      case Some(d) =>
        val deg = exploded.groupBy("v").agg(count(lit(1)).as("deg"))
        exploded.join(deg.where(col("deg") <= d).select("v"), Seq("v"), "left_semi")
      case None => exploded
    }
    keyed.select(col("v"), col("s").as("name_a"))
      .join(keyed.select(col("v"), col("s").as("name_b")), Seq("v"))
      .where(col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b")).distinct()
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).as("dist"))
      .where(col("dist") <= 1)
  }
}
