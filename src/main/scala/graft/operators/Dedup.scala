package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/**
 * Document deduplication for training-data pipelines, four tiers:
 *
 *  - EXACT: hash-groupBy on a content digest — one shuffle keyed on a
 *    16-byte digest, never on the document body.
 *  - NEAR (n-gram Jaccard): inverted-index self-join on shingle hashes —
 *    exact set similarity, cost bounded by shared-shingle candidates.
 *  - NEAR (MinHash + LSH): per-doc signatures are a MAP-ONLY expression
 *    (no shuffle); banding explodes b rows/doc and self-joins on the
 *    band bucket — the classic shingle→minhash→band→bucket-join pipeline.
 *    At 100 TB this is the path: candidate count is driven by collision
 *    probability, not |docs|².
 *  - NEAR (SimHash): 60-bit signature, map-only; banded Hamming blocking
 *    (pigeonhole: distance ≤ k pairs must share one of k+1 bands).
 *
 * Embedding-cosine near-dup lives in `SimilaritySearch` (same cosine core).
 *
 * All hashes are md5-derived (`TextFunctions.hash60`) so every step is
 * reproducible in any SQL engine — the DuckDB oracle recomputes the whole
 * pipeline, LSH included.
 */
object Dedup {

  /** EXACT dedup: one row per distinct text; canonical id = min(id).
    * Output: (digest, canonical_id, n_dups). */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_dups"))

  /** Survivors of exact dedup (the kept rows, by canonical id). */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.join(
      exactGroups(docs, idCol, textCol).select(col("canonical_id").as(idCol)),
      Seq(idCol), "left_semi")

  /**
   * Streaming exact dedup — the online face of the digest tier: keep the
   * FIRST arrival of each content digest; duplicates arriving within the
   * watermark horizon are dropped with BOUNDED state
   * (`dropDuplicatesWithinWatermark` evicts expired digests, so state
   * tracks the horizon, not history — the only shape that survives an
   * unbounded stream; a plain streaming `dropDuplicates` would grow
   * forever). Batch frames take the deterministic min-id path
   * (`exactDedup`); the spec cross-checks the two faces on an id-ordered
   * arrival, where first-arrival == min-id.
   */
  def dedupKeepFirst(docs: DataFrame, watermarkDelay: String,
                     idCol: String = "doc_id", tsCol: String = "ts",
                     textCol: String = "text"): DataFrame =
    if (docs.isStreaming)
      docs.withColumn("__digest", md5(col(textCol)))
        .withWatermark(tsCol, watermarkDelay)
        .dropDuplicatesWithinWatermark("__digest")
        .drop("__digest")
    else
      exactDedup(docs, idCol, textCol)

  /** Distinct reduced shingle-hash set per document, exploded long form:
    * (id, g) with g = hash60(shingle) mod 2^31−1. Docs with fewer than n
    * tokens contribute no rows. Built on the window-based shingle stream
    * (`TextFunctions.shingleStream`) — the HOF formulation re-evaluates
    * the tokenizer per shingle and falls out of codegen. */
  def shingleSets(docs: DataFrame, n: Int,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    // spread documents across the cluster BEFORE the md5-heavy shingle
    // hashing — a corpus that arrives as few large files would otherwise
    // run the whole hash pipeline on as many cores as there are files;
    // gated on input width so a pre-split 100 TB corpus pays no body shuffle
    shingleStream(graft.core.Spread.byKey(docs, col(idCol)), n, idCol, textCol)
      .select(col(idCol).as("id"), (hash60(col("sh")) % HashPermMod).as("g"))
      .distinct()

  /**
   * NEAR dedup via exact n-gram Jaccard: inverted-index join on shingle
   * hash, then |A∩B| / (|A|+|B|−|A∩B|) ≥ threshold. Hot shingles (shared
   * by many docs) are the skew risk at scale — `maxShingleDegree` drops
   * them (a shingle in thousands of docs is boilerplate, not signal),
   * mirroring `Correlation.maxContextDegree`.
   * Output: (doc_a, doc_b, jaccard), a < b.
   */
  def jaccardPairs(shingles: DataFrame, threshold: Double,
                   maxShingleDegree: Option[Int] = None): DataFrame = {
    // The shingle set feeds three consumers (sizes + both join sides);
    // persist so the hash pipeline runs once. The table is (id, g) longs —
    // tiny next to the corpus — and spills to disk if not. (Catalyst gives
    // no cross-branch common-subexpression reuse; this is the same
    // explicit-persist pattern MLlib uses for iterative reuse.)
    val sh = graft.core.Caches.cacheOnce(maxShingleDegree match {
      case Some(d) =>
        val deg = shingles.groupBy("g").agg(count(lit(1)).as("deg"))
        shingles.join(deg.where(col("deg") <= d).select("g"), Seq("g"), "left_semi")
      case None => shingles
    })
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val a = sh.select(col("id").as("doc_a"), col("g"))
    val b = sh.select(col("id").as("doc_b"), col("g"))
    val inter = a.join(b, Seq("g")).where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
      .join(sizes.select(col("id").as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")).cast("double")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /**
   * LSH band-plan auto-tune — the (bands, rows-per-band) decision made
   * from the collision S-curve instead of folklore: a (b, r) split
   * catches a pair of true similarity s with probability
   * p(s) = 1 − (1 − sʳ)ᵇ, so feasibility is two-sided — catch enough at
   * the operating threshold (p(sHigh) ≥ minCatch) AND stay quiet on
   * noise (p(sLow) ≤ maxNoise; r = 1 "catches everything" only by
   * flooding the band join with junk pairs). Among feasible splits the
   * cheapest (fewest bands — bands multiply the banding stage's shuffle
   * volume) wins. Driver-side closed form over the divisor grid of
   * `numPerms` (bounded — index parameters, not data); the MEASURED
   * validation of the chosen split against the exact-Jaccard truth set
   * is the q210 gate's other half. Probabilities round 1e-6 BEFORE the
   * feasibility comparison so the decision replays in oracle SQL.
   *
   * Output: (bands, rows_per_band, p_catch, p_noise, feasible, chosen).
   */
  def tuneLshPlan(spark: org.apache.spark.sql.SparkSession, numPerms: Int,
                  sHigh: Double, sLow: Double,
                  minCatch: Double, maxNoise: Double): DataFrame = {
    require(numPerms >= 2, "tuneLshPlan: numPerms must be >= 2")
    require(sLow < sHigh, "tuneLshPlan: sLow must be below sHigh")
    def rnd6(x: Double) = math.rint(x * 1e6) / 1e6
    val grid = (1 to numPerms).filter(numPerms % _ == 0).map { b =>
      val r = numPerms / b
      val pc = rnd6(1.0 - math.pow(1.0 - math.pow(sHigh, r), b))
      val pn = rnd6(1.0 - math.pow(1.0 - math.pow(sLow, r), b))
      (b.toLong, r.toLong, pc, pn, pc >= minCatch && pn <= maxNoise)
    }
    val feasible = grid.filter(_._5).map(_._1)
    require(feasible.nonEmpty,
      s"tuneLshPlan: no feasible (bands, rows) split of $numPerms — " +
        "raise numPerms or relax the catch/noise bounds")
    val chosen = feasible.min
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("bands", LongType, nullable = false),
      StructField("rows_per_band", LongType, nullable = false),
      StructField("p_catch", DoubleType, nullable = false),
      StructField("p_noise", DoubleType, nullable = false),
      StructField("feasible", BooleanType, nullable = false),
      StructField("chosen", BooleanType, nullable = false)))
    val rows = grid.map { case (b, r, pc, pn, f) =>
      Row(b, r, pc, pn, f, b == chosen)
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /**
   * ASYMMETRIC containment pairs — the subset-duplication signal Jaccard
   * structurally misses (Lee et al. 2022 §4: a document embedded inside a
   * longer one has |A∩B|/|A| ≈ 1 but arbitrarily low Jaccard as B grows).
   * Same inverted-index join as `jaccardPairs`, but the intersection
   * normalizes by EACH side's own size and both directions report
   * independently. Output: (inner_id, outer_id, containment) — "inner's
   * shingles are `containment`-covered by outer", containment ≥ threshold,
   * inner ≠ outer; a fully-embedded quote/article scores 1.0 as inner.
   */
  def containmentPairs(shingles: DataFrame, threshold: Double,
                       maxShingleDegree: Option[Int] = None): DataFrame = {
    require(threshold > 0.0, "containmentPairs: threshold must be > 0 — " +
      "at 0 every co-shingled pair reports in both directions")
    val sh = graft.core.Caches.cacheOnce(maxShingleDegree match {
      case Some(d) =>
        val deg = shingles.groupBy("g").agg(count(lit(1)).as("deg"))
        shingles.join(deg.where(col("deg") <= d).select("g"), Seq("g"), "left_semi")
      case None => shingles
    })
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val a = sh.select(col("id").as("doc_a"), col("g"))
    val b = sh.select(col("id").as("doc_b"), col("g"))
    val inter = a.join(b, Seq("g")).where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("id").as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
      .join(sizes.select(col("id").as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
    inter.select(col("doc_a").as("inner_id"), col("doc_b").as("outer_id"),
        (col("inter").cast("double") / col("sz_a").cast("double")).as("containment"))
      .unionAll(inter.select(col("doc_b").as("inner_id"), col("doc_a").as("outer_id"),
        (col("inter").cast("double") / col("sz_b").cast("double")).as("containment")))
      .where(col("containment") >= threshold)
  }

  /**
   * WINNOWING document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
   * the MOSS algorithm): hash every k-gram, slide a window of `window`
   * consecutive k-gram hashes, and select each window's MINIMUM hash
   * (rightmost position on ties — the robust-winnowing rule that makes
   * the selection a function of local content). Guarantees: any shared
   * run of ≥ window+k−1 tokens yields at least one SHARED fingerprint
   * (the detection floor), and ~1/window of positions are selected (the
   * density bound) — the local-selection property MinHash (global min
   * per permutation) does not have, which is why plagiarism/clone
   * detection keys on winnowing: it localizes WHERE the overlap is.
   *
   * The min-with-rightmost-tie selection is ONE window `min` over a
   * packed integer: combined = h₄₀·2²⁰ + (2²⁰−1−pos) — minimum hash
   * first, then maximum position, decoded by shift/mask; both engines
   * do identical exact-integer arithmetic (docs are capped at 2²⁰
   * k-gram positions — far above any real document; enforced loudly).
   * One doc-keyed exchange for the trailing window; hashes, never text.
   *
   * Output: (idCol, h, pos) — DISTINCT selected fingerprints with the
   * position they cover (adjacent windows mostly re-select the same
   * minimum; the distinct is what the density bound prices).
   */
  def winnowFingerprints(docs: DataFrame, k: Int, window: Int,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    require(k >= 1, "winnowFingerprints: k must be >= 1")
    require(window >= 1, "winnowFingerprints: window must be >= 1")
    val tk = tokensWs(col(textCol))
    val grams = when(size(tk) < k, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(tk) - k),
        i => concat_ws(" ", slice(tk, i + 1, lit(k)))))
    val hashed = graft.core.Spread.byKey(docs, col(idCol))
      .select(col(idCol), posexplode(grams).as(Seq("pos", "gram")))
      .select(col(idCol), col("pos"),
        when(col("pos") > lit(1048575L), raise_error(lit(
          "winnowFingerprints: document exceeds 2^20 k-gram positions — " +
            "chunk it first (Chunking.cdcChunks)")).cast("long"))
          .otherwise(
            conv(substring(md5(col("gram")), 1, 10), 16, 10).cast("long") *
              lit(1048576L) + (lit(1048575L) - col("pos"))).as("combined"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(-(window - 1), 0)
    hashed
      .withColumn("sel", min(col("combined")).over(w))
      .where(col("pos") >= window - 1)
      .select(col(idCol), shiftright(col("sel"), 20).as("h"),
        (lit(1048575L) - (col("sel") % lit(1048576L))).as("pos"))
      .distinct()
  }

  /**
   * Winnowing overlap pairs — the MOSS report: documents sharing ≥
   * `minShared` selected fingerprint hashes, with the Jaccard of their
   * fingerprint-hash sets. `maxHashDegree` drops hashes selected in more
   * documents than the cap (a fingerprint in thousands of documents is
   * license-header boilerplate, not copying — `jaccardPairs`'
   * `maxShingleDegree` stance). Exact-integer share threshold; inverted-
   * index join on the hash, fingerprint sets only, never text.
   * Output: (doc_a, doc_b, shared, jaccard), a < b.
   */
  def winnowPairs(docs: DataFrame, k: Int, window: Int, minShared: Long,
                  maxHashDegree: Option[Int] = None,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    require(minShared >= 1, "winnowPairs: minShared must be >= 1")
    val fp0 = winnowFingerprints(docs, k, window, idCol, textCol)
      .select(col(idCol).as("id"), col("h")).distinct()
    val fp = graft.core.Caches.cacheOnce(maxHashDegree match {
      case Some(d) =>
        val deg = fp0.groupBy("h").agg(count(lit(1)).as("deg"))
        fp0.join(deg.where(col("deg") <= d).select("h"), Seq("h"), "left_semi")
      case None => fp0
    })
    val sizes = fp.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = fp.select(col("id").as("doc_a"), col("h"))
      .join(fp.select(col("id").as("doc_b"), col("h")), Seq("h"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
    inter
      .join(sizes.select(col("id").as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
      .join(sizes.select(col("id").as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("shared"),
        (col("shared").cast("double") /
          (col("sz_a") + col("sz_b") - col("shared")).cast("double")).as("jaccard"))
  }

  /** MinHash signatures: (id, sig array<long> of length numPerms), built
    * RELATIONALLY: explode the shingle set once, then numPerms codegen'd
    * `min` aggregates in one hash-aggregate pass. (The tempting nested-HOF
    * formulation — transform over perms of array_min over shingles — makes
    * Catalyst inline the md5 shingle pipeline into every permutation
    * lambda and falls out of codegen: measured 10× slower.) The shuffle
    * carries (id, g) longs, never the text. Docs without shingles (fewer
    * than n tokens) are excluded. */
  def minHashSignatures(docs: DataFrame, n: Int, numPerms: Int,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    shingleSets(docs, n, idCol, textCol)
      .groupBy("id")
      .agg(array((0 until numPerms).map(i =>
        min(hashPermOf(col("g"), lit(i)))): _*).as("sig"))

  /** LSH banding: b bands of r rows; band key = md5 of the ':'-joined
    * signature slice. Output: (id, band, bk). */
  def lshBands(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    sig.select(col("id"), explode(sequence(lit(0), lit(bands - 1))).as("band"), col("sig"))
      .select(col("id"), col("band"),
        md5(concat_ws(":", slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand))))
          .as("bk"))

  /** Estimated Jaccard of two equal-length MinHash signatures: the
    * fraction of agreeing positions (the standard unbiased estimator). */
  def estSim(sigA: Column, sigB: Column, numPerms: Int): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b))
      .cast("double") / numPerms

  /**
   * GROUP-level shingle Jaccard (EXT-D19): pairwise similarity between
   * document GROUPS (crawl sources, snapshots, language slices) over the
   * union of their member shingle sets — the corpus-forensics view that
   * answers "how much does source A overlap source B" before any
   * doc-level dedup. Both the exact Jaccard and its MinHash estimate are
   * computed, so the output doubles as a standing accuracy witness for
   * the signature machinery at `numPerms` (the estimator's σ ≈
   * √(J(1−J)/P)).
   *
   * Scale shape: the corpus collapses to distinct (group, shingle-hash)
   * longs FIRST — one shuffle keyed on the hash, body never moves. The
   * per-group signature uses the MinHash union property (min over the
   * union = min of member minima), so it is ONE hash-aggregate over
   * those longs, not a per-doc signature pass. Exact intersections
   * self-join on the shingle hash — cost tracks shared shingles, and
   * groups are few (the pair table is |G|², driver-small for any sane
   * group count; this is a per-SOURCE report, not a per-doc one).
   *
   * Output: (group_a, group_b, j_exact, j_est), a < b, unrounded.
   */
  def groupShingleJaccard(docs: DataFrame, n: Int, numPerms: Int,
                          groupCol: String = "source",
                          idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    // distinct (grp, g): shingle hashes keyed to their doc, joined to the
    // doc→group mapping on the id they were built under (co-keyed join;
    // the mapping is 2 narrow columns of the corpus), then deduplicated.
    val gs = graft.core.Caches.cacheOnce(
      shingleSets(docs, n, idCol, textCol)
        .join(docs.select(col(idCol).as("id"), col(groupCol).as("grp")), Seq("id"))
        .select(col("grp"), col("g")).distinct())
    val sizes = gs.groupBy("grp").agg(count(lit(1)).as("sz"))
    val inter = gs.select(col("grp").as("group_a"), col("g"))
      .join(gs.select(col("grp").as("group_b"), col("g")), Seq("g"))
      .where(col("group_a") < col("group_b"))
      .groupBy("group_a", "group_b").agg(count(lit(1)).as("inter"))
    val exact = inter
      .join(broadcast(sizes.select(col("grp").as("group_a"), col("sz").as("sz_a"))), Seq("group_a"))
      .join(broadcast(sizes.select(col("grp").as("group_b"), col("sz").as("sz_b"))), Seq("group_b"))
      .select(col("group_a"), col("group_b"),
        (col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")).cast("double")).as("j_exact"))
    // Union-property signature: one aggregate pass over the (grp, g) longs.
    val sig = gs.groupBy("grp")
      .agg(array((0 until numPerms).map(i =>
        min(hashPermOf(col("g"), lit(i)))): _*).as("sig"))
    val est = sig.select(col("grp").as("group_a"), col("sig").as("sig_a"))
      .join(broadcast(sig.select(col("grp").as("group_b"), col("sig").as("sig_b"))),
        col("group_a") < col("group_b"))
      .select(col("group_a"), col("group_b"),
        estSim(col("sig_a"), col("sig_b"), numPerms).as("j_est"))
    exact.join(est, Seq("group_a", "group_b"))
  }

  /** Drop band buckets whose member count exceeds `d` — the hot-bucket
    * guard shared by the LSH and SimHash candidate joins. A band bucket
    * holding thousands of documents is a boilerplate mega-cluster (the
    * same argument as `maxShingleDegree`: past any sane cap the contents
    * are template spam, not signal), and its self-join contributes d²
    * candidate rows on ONE skewed join key — the quadratic cliff of a
    * template-heavy crawl at 100 TB. The degree count is a hash aggregate
    * on the band key, so the count partial-aggregates map-side
    * (plan-guarded in `PlanShapeSpec`); run the exact-dup collapse first
    * (`dedupCorpusLsh` does) so capped buckets cost only redundant
    * evidence, never a genuinely novel pair. */
  private def capBandDegree(keyed: DataFrame, d: Int): DataFrame = {
    val deg = keyed.groupBy("band", "bk").agg(count(lit(1)).as("deg"))
    keyed.join(deg.where(col("deg") <= d).select("band", "bk"),
      Seq("band", "bk"), "left_semi")
  }

  /**
   * MinHash-LSH candidate pairs with estimated similarity (fraction of
   * agreeing signature positions). Pairs must share ≥1 band bucket.
   * `maxBandDegree` (default off) drops band buckets holding more members
   * — see `capBandDegree` for why that is the scale guard, not a recall
   * loss worth measuring at sane caps.
   * Output: (doc_a, doc_b, est_sim), a < b.
   */
  def lshCandidates(sig0: DataFrame, bands: Int, rowsPerBand: Int,
                    maxBandDegree: Option[Int] = None): DataFrame = {
    val numPerms = bands * rowsPerBand
    // 4 plan references (two band sides, two signature re-joins): persist
    // the signature table — numPerms longs per doc — so the MinHash
    // pipeline runs once (see jaccardPairs note).
    val sig = graft.core.Caches.cacheOnce(sig0)
    val bd0 = lshBands(sig, bands, rowsPerBand)
    val bd = maxBandDegree match {
      case Some(d) => graft.core.Caches.cacheOnce(capBandDegree(bd0, d))
      case None => bd0
    }
    val cand = bd.select(col("id").as("doc_a"), col("band"), col("bk"))
      .join(bd.select(col("id").as("doc_b"), col("band"), col("bk")), Seq("band", "bk"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    cand
      .join(sig.select(col("id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(sig.select(col("id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        estSim(col("sig_a"), col("sig_b"), numPerms).as("est_sim"))
  }

  /**
   * Connected components over a near-dup pair graph: label every node
   * with the MINIMUM reachable id — pairwise dedup becomes corpus dedup
   * (keep one survivor per component, not per pair). Min-label
   * propagation: each round every node takes the min of its own and its
   * neighbors' labels; converges in graph-diameter rounds (near-dup
   * components are shallow — duplicates of a common source). The edge
   * set is the SMALL near-dup graph, orders of magnitude below the
   * corpus; each round is one join + one aggregate. Deterministic:
   * min-label is order-independent.
   * Output: (id, component) — component = min doc id of the cluster.
   */
  /** Session memo for `connectedComponents`: the loop drives per-round
    * ACTIONS (convergence checks), which the CacheManager cannot
    * deduplicate across calls the way it dedups plan-equal lazy frames.
    * Keyed by the canonicalized input plan (the same identity the
    * CacheManager uses); a hit returns the converged frame, whose
    * lineage replays deterministically even if its cache was dropped. */
  private val ccMemo =
    scala.collection.concurrent.TrieMap.empty[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame]

  /** Cut a frame's LOGICAL lineage at an iteration boundary: re-root it on
    * its own RDD. Without this, each loop round nests the previous round's
    * plan, and every later ACTION over the converged frame re-analyzes /
    * re-canonicalizes a diameter-deep tree — measured seconds of pure
    * DRIVER planning per downstream query on a ~100-row label table. The
    * RDD keeps full recompute lineage (executor loss replays it; this is
    * not a checkpoint), only the Catalyst tree is truncated. Identity of
    * the converged frame is preserved by the memo, so downstream plan-cache
    * dedup still sees one instance. */
  private def cutLineage(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)

  def connectedComponents(pairs: DataFrame, aCol: String = "doc_a",
                          bCol: String = "doc_b", maxIters: Int = 25): DataFrame = {
    val edges0 = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
    val memoKey = edges0.queryExecution.analyzed.canonicalized
    ccMemo.get(memoKey) match {
      case Some(done) => return done
      case None => ()
    }
    val edges = graft.core.Caches.cacheOnce(edges0)
    var labels = graft.core.Caches.cacheOnce(cutLineage(
      edges.select(col("src").as("id")).distinct()
        .withColumn("component", col("id"))))
    var iters = 0
    var converged = false
    while (!converged && iters < maxIters) {
      // (1) min-label propagation over the edge list — one round moves a
      // label one hop, so alone this needs O(diameter) rounds...
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("component").as("nc")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("nc")).as("nbrComponent"))
      // cached: prop appears TWICE in the jump self-join below, and its
      // subtree embeds the edges-sized nbrMin join+aggregate — without the
      // cache that heavy subplan evaluates twice per round
      val prop = graft.core.Caches.cacheOnce(labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), col("nbrComponent")).as("component")))
      // (2) ...so each round ALSO pointer-jumps: follow the label one
      // more hop (component := component(component)). Labels are min-ids
      // — monotone non-increasing — so the jump is safe, and path
      // lengths HALVE per round: convergence is O(log diameter), not
      // O(diameter). The sf10 probe found a real near-dup graph whose
      // chain diameter exceeded 25 rounds under plain propagation; at
      // 100 TB, long chains (near-dups of near-dups) are the norm, and
      // a diameter-bound loop is a scale defect. Cost: one extra
      // id-keyed join over the label table per round.
      val next = graft.core.Caches.cacheOnce(cutLineage(prop
        .join(prop.select(col("id").as("component"),
          col("component").as("jumped")), Seq("component"), "left")
        .select(col("id"),
          coalesce(col("jumped"), col("component")).as("component"))))
      converged = next.join(labels.withColumnRenamed("component", "old"), Seq("id"))
        .where(col("component") =!= col("old")).isEmpty
      graft.core.Caches.release(prop)
      labels.unpersist()
      labels = next
      iters += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIters rounds")
    ccMemo.put(memoKey, labels)
    labels
  }

  /**
   * Survivor selection over near-dup components: real pipelines keep the
   * BEST document of each duplicate cluster, not the arbitrary min-id one.
   * `components`: (id, component) from `connectedComponents`; `quality`:
   * (id, <scoreCol>) — e.g. `TextFunctions.qualityScore`. One row per
   * component: its argmax-quality member (ties break to the smaller id —
   * deterministic), the winning score, and the member count.
   *
   * Scale: ONE shuffle on component; the rank-1 filter plans as a
   * WindowGroupLimit (partial top-1 pushdown) and the member count shares
   * the same partitioning — a single exchange serves both windows. The
   * component table is the SMALL near-dup graph's node set, not the corpus.
   * Output: (component, survivor_id, best_quality, n_members).
   */
  def survivors(components: DataFrame, quality: DataFrame,
                scoreCol: String = "quality"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = components.join(quality, Seq("id"))
    val wRank = Window.partitionBy(col("component"))
      .orderBy(col(scoreCol).desc, col("id").asc)
    val wAll = Window.partitionBy(col("component"))
    joined
      .withColumn("rnk", row_number().over(wRank))
      .withColumn("n_members", count(lit(1)).over(wAll))
      .where(col("rnk") === 1)
      .select(col("component"), col("id").as("survivor_id"),
        col(scoreCol).as("best_quality"), col("n_members"))
  }

  /** Dropped-id counts up to this are force-broadcast in the one-call
    * keep filters. The near-dup graph's node set is usually orders of
    * magnitude below the corpus, but "usually" is not a plan invariant:
    * at a realistic 30-50% dup rate over a 100 TB corpus the dropped set
    * is billions of ids — past the broadcast hard cap, where an
    * unconditional hint kills the job. Above the gate the anti-join runs
    * un-hinted (AQE still picks a broadcast when runtime stats allow). */
  val BroadcastDroppedThreshold: Long = 10L * 1000 * 1000

  /** Keep-filter shared by the one-call corpus dedups: anti-join `docs`
    * against the dropped ids, force-broadcast only below
    * `BroadcastDroppedThreshold`. `nodeCount` is the component-node count
    * — a cheap upper bound on |dropped| read off the already-cached label
    * table, so the gate never executes the survivor pipeline twice. */
  private[graft] def keepCorpus(docs: DataFrame, dropped: DataFrame,
                                idCol: String, nodeCount: Long): DataFrame =
    if (nodeCount <= BroadcastDroppedThreshold)
      docs.join(broadcast(dropped), Seq(idCol), "left_anti")
    else docs.join(dropped, Seq(idCol), "left_anti")

  /**
   * Exact-duplicate COPIES among the docs a signature tier would process:
   * every id that shares its text with a lower id (the lower id is the
   * canonical representative). `minTokens = Some(n)` restricts the
   * collapse to docs long enough to shingle — shorter docs never enter
   * the near-dup tiers (no shingles → no pairs → always kept), so
   * collapsing them would CHANGE one-call results; `None` covers tiers
   * where every doc carries a signature (SimHash).
   *
   * This is the exact-dedup-first step of the one-call dedups: exact
   * mega-clusters (the most common hot-band-bucket source — a template
   * crawled a million times) collapse to one representative BEFORE any
   * signature is computed or band self-joined, so the candidate stage
   * never sees them. Provably result-preserving: copies share their
   * representative's signature, quality (text-determined) and pairs, and
   * the survivor tie-break (quality desc, id asc) always elects the
   * minimum-id copy of the winning text — exactly the representative.
   * One shuffle on the 16-byte digest, never the body.
   */
  private[graft] def exactDroppedIds(docs: DataFrame, minTokens: Option[Int],
                                     idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val eligible = minTokens match {
      case Some(n) => docs.where(size(tokensWs(col(textCol))) >= n)
      case None => docs
    }
    val keyed = eligible.select(col(idCol).as("id"), md5(col(textCol)).as("digest"))
    val w = Window.partitionBy(col("digest")).orderBy(col("id").asc)
    keyed.withColumn("rnk", row_number().over(w))
      .where(col("rnk") > 1).select(col("id"))
  }

  /** Shared tail of the one-call dedups: components → argmax-quality
    * survivors → kept corpus, with the exact-dup copies unioned into the
    * dropped set. `nExact` rides the broadcast gate with the node count. */
  private def keepFromPairs(docs: DataFrame, pairs: DataFrame,
                            exactDropped: DataFrame, nExact: Long,
                            idCol: String, textCol: String): DataFrame = {
    val comps = connectedComponents(pairs)
    val qual = docs.select(col(idCol).as("id"),
      graft.functions.TextFunctions.qualityScore(col(textCol)).as("quality"))
    val surv = survivors(comps, qual)
    // dropped = clustered members that are not their cluster's survivor,
    // plus the exact copies collapsed before the pair stage
    val dropped = comps
      .join(surv.select(col("survivor_id").as("id")), Seq("id"), "left_anti")
      .select(col("id").as(idCol))
      .unionByName(exactDropped)
    keepCorpus(docs, dropped, idCol, comps.count() + nExact)
  }

  /**
   * End-to-end corpus dedup — the one-call composition of the tiers:
   * exact-dup collapse → n-gram Jaccard near-dup pairs over the
   * representatives → connected components → argmax-quality survivors →
   * the KEPT corpus (every unclustered document plus each cluster's best
   * member). This is the operator a training-data pipeline actually runs;
   * the pieces stay public for custom pipelines (swap the pair source for
   * MinHash-LSH candidates at extreme scale).
   *
   * Scale: the pair graph and its node set are orders of magnitude
   * smaller than the corpus, so the final keep-filter is one anti-join of
   * the corpus against the dropped-id set — broadcast below
   * `BroadcastDroppedThreshold`, shuffled (AQE's call) above it — and the
   * corpus body never shuffles. The exact collapse runs FIRST
   * (`exactDroppedIds`): a template duplicated d times costs one digest
   * row, not d shingle sets and d² inverted-index hits.
   */
  def dedupCorpus(docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val exactDropped = graft.core.Caches.cacheOnce(
      exactDroppedIds(docs, Some(n), idCol, textCol).withColumnRenamed("id", idCol))
    val nExact = exactDropped.count()
    val reps = keepCorpus(docs, exactDropped, idCol, nExact)
    val pairs = jaccardPairs(shingleSets(reps, n, idCol, textCol), threshold)
    keepFromPairs(docs, pairs, exactDropped, nExact, idCol, textCol)
  }

  /**
   * Exact Jaccard for a GIVEN candidate pair set: the refine step of
   * candidate-generation dedup. Work is bounded by |candidates| ×
   * shingles-per-doc — never the all-pairs inverted index. Output:
   * (doc_a, doc_b, jaccard) for candidates meeting the threshold.
   */
  def refineJaccard(candidates: DataFrame, shingles: DataFrame,
                    threshold: Double): DataFrame = {
    val sh = graft.core.Caches.cacheOnce(shingles)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = candidates
      .join(sh.select(col("id").as("doc_a"), col("g")), Seq("doc_a"))
      .join(sh.select(col("id").as("doc_b"), col("g")), Seq("doc_b", "g"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
      .join(sizes.select(col("id").as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")).cast("double")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /**
   * `dedupCorpus` for corpora where even the inverted-index join is too
   * hot: MinHash-LSH candidate generation → EXACT Jaccard refine on the
   * candidates only → components → quality survivors → kept corpus.
   * Candidate cost tracks LSH collision probability; refine cost tracks
   * the candidate count. Recall vs the exact pipeline is what q47
   * measures; precision is exact (the refine re-checks true Jaccard).
   */
  def dedupCorpusLsh(docs: DataFrame, n: Int = 3, numPerms: Int = 16,
                     bands: Int = 4, threshold: Double = 0.5,
                     idCol: String = "doc_id", textCol: String = "text",
                     maxBandDegree: Option[Int] = None): DataFrame = {
    val exactDropped = graft.core.Caches.cacheOnce(
      exactDroppedIds(docs, Some(n), idCol, textCol).withColumnRenamed("id", idCol))
    val nExact = exactDropped.count()
    val reps = keepCorpus(docs, exactDropped, idCol, nExact)
    val cand = lshCandidates(minHashSignatures(reps, n, numPerms, idCol, textCol),
      bands, numPerms / bands, maxBandDegree).select("doc_a", "doc_b")
    val pairs = refineJaccard(cand, shingleSets(reps, n, idCol, textCol), threshold)
    keepFromPairs(docs, pairs, exactDropped, nExact, idCol, textCol)
  }

  /**
   * `dedupCorpus` on the SimHash tier: banded Hamming candidate pairs →
   * components → quality survivors → kept corpus. The cheapest near-dup
   * gate per candidate (one 64-bit XOR/popcount vs a shingle-set
   * intersection) — the right tier when the duplication mode is light
   * token-level edits; pigeonhole-sound for maxDist < bands.
   */
  def dedupCorpusSimHash(docs: DataFrame, maxDist: Int, bands: Int = 5,
                         idCol: String = "doc_id", textCol: String = "text",
                         maxBandDegree: Option[Int] = None): DataFrame = {
    // every doc carries a SimHash (tokenless → 0), so the exact collapse
    // is unrestricted (minTokens = None): copies always pair at dist 0
    val exactDropped = graft.core.Caches.cacheOnce(
      exactDroppedIds(docs, None, idCol, textCol).withColumnRenamed("id", idCol))
    val nExact = exactDropped.count()
    val reps = keepCorpus(docs, exactDropped, idCol, nExact)
    val pairs = simHashPairs(simHashes(reps, idCol, textCol), maxDist, bands, maxBandDegree)
      .select(col("doc_a"), col("doc_b"))
    keepFromPairs(docs, pairs, exactDropped, nExact, idCol, textCol)
  }

  /** SimHash table: (id, sh) — 60-bit SimHash over the document's DISTINCT
    * whitespace tokens: bit j is set iff the majority of token hashes have
    * bit j set. Built RELATIONALLY (explode token hashes once, 60 codegen'd
    * ±1 bit-sum aggregates, then one bit-assembly expression) for the same
    * reason as minHashSignatures: the nested-HOF fold re-evaluates the md5
    * token pipeline per bit position and falls out of codegen. Tokenless
    * docs get signature 0 (the majority-vote of nothing), matching the
    * fold semantics. */
  def simHashes(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val hashed = graft.core.Spread.byKey(docs, col(idCol)) // spread gated on input width
      .select(col(idCol).as("id"),
        explode(array_distinct(transform(tokensWs(col(textCol)), t => hash60(t)))).as("h"))
    val bitCols = (0 until 60).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L)) * 2L - 1L).as(s"b$j"))
    val bitSums = hashed.groupBy("id").agg(bitCols.head, bitCols.tail: _*)
    val assembled = bitSums.select(col("id"),
      (0 until 60).map(j =>
        when(col(s"b$j") > 0L, lit(1L << j)).otherwise(0L)).reduce(_ + _).as("sh"))
    // docs whose token set is empty produce no exploded rows — re-attach
    // them with the empty-majority signature 0
    docs.select(col(idCol).as("id"))
      .join(assembled, Seq("id"), "left")
      .na.fill(0L, Seq("sh"))
  }

  /**
   * SimHash near-dup pairs within Hamming distance `maxDist`, found by
   * banded blocking over `bands` 12-bit bands (sound for
   * maxDist ≤ bands−1 by pigeonhole). Output: (doc_a, doc_b, dist), a < b.
   *
   * SCALE CEILING: a 12-bit band key admits only 4096 buckets per band,
   * so past ~10⁷ docs every bucket fills by pigeonhole and the band join
   * trends to N²/4096 per band REGARDLESS of content — widening the key
   * is not available (60 bits / 5 bands is what makes the pigeonhole
   * guarantee). This tier is for corpora (or blocked partitions) under
   * that ceiling; beyond it use the MinHash-LSH tier, whose 60-bit md5
   * band keys scale with content. `maxBandDegree` (default off) drops
   * over-full buckets (`capBandDegree`) — the guard against template
   * mega-clusters well BELOW the ceiling.
   */
  def simHashPairs(sh0: DataFrame, maxDist: Int, bands: Int = 5,
                   maxBandDegree: Option[Int] = None): DataFrame = {
    // The signature is ONE long, so the band self-join carries it directly
    // — no candidate-distinct + signature re-join round trip (that shape
    // pays off only when signatures are wide, as in lshCandidates). The
    // Hamming filter runs before the dedup, so the distinct sees only
    // near-dup rows (dist is a function of the pair — dedup is safe).
    val sh = graft.core.Caches.cacheOnce(sh0)
    val keyed0 = sh.select(col("id"), explode(sequence(lit(0), lit(bands - 1))).as("band"), col("sh"))
      .withColumn("bk", expr("(sh >> (12 * band)) & 4095"))
    val keyed = maxBandDegree match {
      case Some(d) => graft.core.Caches.cacheOnce(capBandDegree(keyed0, d))
      case None => keyed0
    }
    keyed.select(col("id").as("doc_a"), col("band"), col("bk"), col("sh").as("sh_a"))
      .join(keyed.select(col("id").as("doc_b"), col("band"), col("bk"), col("sh").as("sh_b")),
        Seq("band", "bk"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("dist"))
      .where(col("dist") <= maxDist)
      .distinct()
  }

  /**
   * Span-level corpus dedup (the C4 protocol, deterministic splitter):
   * documents are cut into NON-overlapping `spanTokens`-token spans
   * (`Chunking.chunkDocuments` with stride = span), every span keeps only
   * its FIRST corpus-wide occurrence — ordered by (id, span index), so
   * the earliest document wins and within-document repeats drop too —
   * and each document is reassembled from its surviving spans. Unlike
   * document-level dedup this removes boilerplate STRETCHES shared
   * between otherwise-distinct documents.
   *
   * Scale: two shuffles, both unavoidable for global span semantics —
   * one on the span text (the keep-first decision; spans distribute
   * uniformly, no hot keys) planned as a WindowGroupLimit top-1, one on
   * the doc id for reassembly. The document body never moves whole: only
   * its spans do, exactly once each. Output: (idCol, textCol) — every
   * input document appears; one stripped of all spans keeps ''.
   */
  def spanDedup(docs: DataFrame, spanTokens: Int,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spans = Chunking.chunkDocuments(docs, spanTokens, spanTokens, idCol, textCol)
    val wFirst = Window.partitionBy(col("chunk_text"))
      .orderBy(col(idCol).asc, col("chunk_id").asc)
    val kept = spans
      .withColumn("rnk", row_number().over(wFirst))
      .where(col("rnk") === 1)
    val rebuilt = kept.groupBy(col(idCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
          x => x.getField("chunk_text")),
        " ").as(textCol))
    docs.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col(textCol), lit("")).as(textCol))
  }

  /**
   * Chunk-level corpus dedup over CONTENT-DEFINED boundaries — the
   * storage-dedup recipe (Venti/LBFS lineage) applied to text: CDC
   * chunks (`Chunking.cdcChunks`) keep only their first corpus-wide
   * occurrence by (id, chunk_no); later occurrences drop and documents
   * reassemble from their kept chunks. The middle tier of the
   * offset-robustness/cost matrix: fixed spans (`spanDedup`) miss
   * shifted duplicates entirely, ExactSubstr (`exactSubstrDedup`)
   * catches every offset at one hashed window PER TOKEN — CDC
   * re-aligns after edits (shared runs longer than a couple of chunks
   * dedup at any offset) while hashing one chunk per ~modK tokens.
   *
   * Scale: chunking is map-only + one id-keyed exchange; keep-first is
   * one chunk-hash-keyed rank (16-byte keys, group size = duplicate
   * count); reassembly slices the token array by kept spans — the
   * document body never shuffles on content.
   *
   * Output: (idCol, textCol, n_removed) — every input document appears,
   * whitespace-normalized, n_removed in TOKENS; '' if fully duplicate.
   */
  def cdcDedup(docs: DataFrame, windowTokens: Int, modK: Int,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = substrTokens(docs, idCol, textCol)
    val chunks = Chunking.cdcChunks(docs, windowTokens, modK, idCol, textCol)
    val wFirst = Window.partitionBy(col("chunk_md5"))
      .orderBy(col(idCol).asc, col("chunk_no").asc)
    val kept = chunks
      .withColumn("rnk", row_number().over(wFirst))
      .where(col("rnk") === 1)
    val agg = kept.groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("start"), col("n_tokens")))).as("spans"),
        sum(col("n_tokens")).as("kt"))
    toks.join(agg, Seq(idCol), "left")
      .select(col(idCol),
        when(col("spans").isNull, lit(""))
          .otherwise(concat_ws(" ", flatten(transform(col("spans"),
            sp => slice(col("tk"), (sp.getField("start") + 1).cast("int"),
              sp.getField("n_tokens").cast("int")))))).as(textCol),
        (size(col("tk")) - coalesce(col("kt"), lit(0L))).cast("long").as("n_removed"))
  }

  /**
   * Any-offset exact substring dedup — the ExactSubstr protocol of Lee
   * et al. 2022 ("Deduplicating Training Data Makes Language Models
   * Better"), token-granular: every stride-1 window of `windowTokens`
   * tokens keeps only its FIRST corpus-wide occurrence (ordered by
   * (id, offset) — earliest document, then earliest offset, wins); every
   * LATER occurrence marks its [pos, pos+L) token interval for removal;
   * overlapping removals coalesce into maximal intervals
   * (gaps-and-islands); each document is reassembled from the complement
   * segments. A duplicated run of M ≥ L tokens produces M−L+1 duplicate
   * windows whose union covers the whole run — so shared runs are
   * removed IN FULL at ANY offset, the modality `spanDedup` (fixed
   * non-overlapping span boundaries) structurally misses.
   *
   * Scale: the token stream inflates ×1 per position (each position
   * starts one window), but what SHUFFLES is (id, pos, hash60) — 24
   * bytes/row keyed on the window hash, never window text, never the
   * document body. Two exchanges total, both unavoidable for global
   * keep-first semantics: one on the window hash (the keep-first rank;
   * hashes distribute uniformly — no hot keys by construction), one on
   * the doc id (island coalescing + reassembly; all doc-id windows and
   * the final aggregate share that exchange). The per-doc removed-
   * interval array is bounded by ⌈n_tokens/1⌉ in the adversarial case
   * but O(#distinct shared runs) in practice — and never larger than
   * the token array the row already carries. 60-bit hash collisions
   * would remove a non-duplicated window (P ≈ n²/2^61); the oracle uses
   * the same family, so the gate is exact, and a production run can
   * widen the digest without changing the dataflow.
   *
   * Output: (idCol, textCol, n_removed) — every input document appears,
   * whitespace-normalized (reassembled from its tokens); a document
   * whose every token is covered keeps ''. Effectively idempotent:
   * windows inside kept segments were first occurrences and remain
   * first (doc order and within-doc relative order both survive
   * reassembly); only a window STRADDLING a removal junction could
   * collide with an existing one. The spec gates a second pass removing
   * zero tokens on the fixture.
   */
  def exactSubstrDedup(docs: DataFrame, windowTokens: Int,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(windowTokens > 0, "windowTokens must be positive")
    val L = windowTokens
    val toks = substrTokens(docs, idCol, textCol)
    val wins = substrWindowHashes(toks, L, idCol)
    // keep-first: rank each window's occurrences corpus-wide; rnk > 1 ⇒
    // this occurrence's interval is removed (groups are tiny — the
    // duplicate count of one window — so the per-key sort is bounded)
    val wFirst = Window.partitionBy(col("h")).orderBy(col(idCol).asc, col("pos").asc)
    val dups = wins
      .withColumn("rnk", row_number().over(wFirst))
      .where(col("rnk") > 1)
      .select(col(idCol), col("pos"), (col("pos") + L).as("end"))
    substrRemoveIntervals(toks, dups, idCol, textCol)
  }

  /** The (idCol, tk) whitespace-token table the ExactSubstr family works
    * over — shared by the one-shot pass and the incremental store face. */
  private[graft] def substrTokens(docs: DataFrame, idCol: String,
                                  textCol: String): DataFrame =
    docs.select(col(idCol), tokensWs(col(textCol)).as("tk"))

  /** Stride-1 hashed token windows of a token table: (idCol, pos, h) —
    * one 60-bit hash per window start; what SHUFFLES in every
    * ExactSubstr dataflow (24 bytes/row, never window text). */
  private[graft] def substrWindowHashes(toks: DataFrame, L: Int,
                                        idCol: String): DataFrame =
    toks
      .where(size(col("tk")) >= L)
      .select(col(idCol), col("tk"),
        explode(sequence(lit(0), size(col("tk")) - L)).as("pos"))
      .select(col(idCol), col("pos"),
        hash60(concat_ws(" ", slice(col("tk"), col("pos") + 1, lit(L)))).as("h"))

  /** Interval coalescing + complement reassembly shared by the
    * ExactSubstr faces: `dups` rows (idCol, pos, end) mark half-open
    * token intervals for removal; overlapping removals coalesce into
    * maximal islands and each document is rebuilt from the complement
    * slices. Output: (idCol, textCol, n_removed) — every `toks` row
    * appears, whitespace-normalized. */
  private[graft] def substrRemoveIntervals(toks: DataFrame, dups: DataFrame,
                                           idCol: String,
                                           textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // gaps-and-islands: coalesce overlapping/adjacent-overlapping removal
    // windows into maximal [rm_start, rm_end) intervals per document
    val wDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val wPrev = wDoc.rowsBetween(Window.unboundedPreceding, -1)
    val islands = dups
      .withColumn("pme", max(col("end")).over(wPrev))
      .withColumn("isl", sum(
        when(col("pme").isNull || col("pos") > col("pme"), 1L).otherwise(0L))
        .over(wDoc))
      .groupBy(col(idCol), col("isl"))
      .agg(min(col("pos")).as("rm_start"), max(col("end")).as("rm_end"))
    // complement reassembly: per doc, the sorted removed intervals become
    // segment boundaries — kept text is the concatenation of the slices
    // BETWEEN them (head [0, rm_start_1), gaps, tail [rm_end_k, n))
    val perDoc = islands.groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("rm_start"), col("rm_end"))))
        .as("rms"))
    toks.join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        when(col("rms").isNull, concat_ws(" ", col("tk")))
          .otherwise {
            val starts = concat(array(lit(0L)),
              transform(col("rms"), r => r.getField("rm_end")))
            val ends = concat(transform(col("rms"), r => r.getField("rm_start")),
              array(size(col("tk")).cast("long")))
            concat_ws(" ", flatten(zip_with(starts, ends,
              (st, en) => slice(col("tk"), st + 1, greatest(en - st, lit(0L))))))
          }.as(textCol),
        coalesce(aggregate(col("rms"), lit(0L),
          (acc, r) => acc + r.getField("rm_end") - r.getField("rm_start")),
          lit(0L)).as("n_removed"))
  }

  /**
   * CCNet-style LINE-level boilerplate dedup (Wenzek et al. 2020 §3.1,
   * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
   * Data"): hash every newline-delimited line, count the corpus-wide
   * DOCUMENT frequency of each line hash, and strike every occurrence of
   * any line appearing in more than `maxDocFreq` distinct documents —
   * navigation chrome, cookie banners, and share-bar boilerplate repeat
   * across pages while body text does not. Document frequency (not
   * occurrence count) so a line repeated within ONE document is not
   * boilerplate by itself.
   *
   * Scale shape — the document BODY never keys by line hash: what
   * shuffles on `h` is (id, line_no, hash60) at 28 bytes/row (the
   * distinct + df aggregation and the semi-join against the hot set all
   * share that key, so AQE coalesces them onto one exchange family),
   * and the body pays exactly one keyed exchange — the final `idCol`
   * join of per-doc strike lists back onto the input row, where
   * reassembly is a pure Column filter over the split array (no
   * re-collect of line text). The hot set is bounded by
   * |lines|/maxDocFreq DISTINCT hashes and is typically tiny (true
   * boilerplate is few distinct lines); it stays distributed — no
   * driver collect — and AQE broadcasts the semi-join when it fits.
   *
   * Empty lines (consecutive newlines) hash like any other line: past
   * `maxDocFreq` documents they are struck too — exactly CCNet's
   * behavior of dropping ubiquitous blank separators.
   *
   * Output: (idCol, n_lines, n_removed, textCol) — every input document
   * appears, kept lines rejoined with '\n' in original order; a
   * fully-boilerplate document keeps ''.
   */
  def lineDedup(docs: DataFrame, maxDocFreq: Long,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxDocFreq >= 1, "maxDocFreq must be positive")
    val keyed = lineKeyed(docs, idCol, textCol)
    val hot = lineDf(keyed, idCol)
      .where(col("df") > maxDocFreq)
      .select(col("h"))
    lineStrike(docs, keyed, hot, idCol, textCol)
  }

  /** The (idCol, line_no, hash60) line-key table the line-dedup family
    * works over — what SHUFFLES in every line-dedup dataflow (28
    * bytes/row, never line text). */
  private[graft] def lineKeyed(docs: DataFrame, idCol: String,
                               textCol: String): DataFrame =
    docs
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("line_no", "line")))
      .select(col(idCol), col("line_no"), hash60(col("line")).as("h"))

  /** Per-hash DOCUMENT frequency of a line-key table: (h, df). */
  private[graft] def lineDf(keyed: DataFrame, idCol: String): DataFrame =
    keyed.select(col(idCol), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))

  /** Strike every occurrence of a hot-hash line and reassemble — shared
    * by the one-shot pass and the incremental store face. Output:
    * (idCol, n_lines, n_removed, textCol), every `docs` row present. */
  private[graft] def lineStrike(docs: DataFrame, keyed: DataFrame,
                                hot: DataFrame, idCol: String,
                                textCol: String): DataFrame =
    lineReassemble(docs,
      keyed.join(hot, Seq("h"), "left_semi")
        .groupBy(col(idCol))
        .agg(collect_set(col("line_no")).as("rm"), count(lit(1)).as("n_removed")),
      idCol, textCol)

  /** Rebuild documents from a per-doc strike list (idCol, rm:
    * array<int> of struck line_nos, n_removed) — a pure Column filter
    * over the split array; shared by every line-granular operator
    * (boilerplate dedup, incremental store, LM quality filtering). */
  private[graft] def lineReassemble(docs: DataFrame, strikes: DataFrame,
                                    idCol: String, textCol: String): DataFrame =
    docs.join(strikes, Seq(idCol), "left")
      .select(col(idCol),
        size(split(col(textCol), "\n")).cast("long").as("n_lines"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        array_join(
          filter(split(col(textCol), "\n"),
            (_, i) => !array_contains(coalesce(col("rm"), array().cast("array<int>")), i)),
          "\n").as(textCol))

  // --- CDC partial-overlap (containment) tier ----------------------------

  /**
   * Partial-overlap (containment) pairs over a CDC chunk table
   * (`Chunking.cdcChunks` output — (idCol, chunk_no, start, n_tokens,
   * chunk_md5)) — the near-dup class every whole-document tier MISSES:
   * two documents sharing a large block (a quoted article, a syndicated
   * section) but differing elsewhere sit below any whole-doc
   * Jaccard/SimHash threshold, yet their shared block survives as
   * identical chunk fingerprints because CDC boundaries re-align after
   * edits. This is the REPORTING face of the CDC family beside
   * `cdcDedup`'s rewriting face: which documents partially overlap
   * which, and by how much.
   *
   * containment = |A∩B| / min(|A|,|B|) over DISTINCT chunk fingerprints
   * (Broder's containment — the asymmetric measure that catches a small
   * document embedded in a large one, where Jaccard dilutes); pairs must
   * share ≥ `minShared` chunks (ONE shared chunk is boilerplate
   * evidence, not a partial copy) and reach `minContainment`.
   *
   * Scale: the inverted-index join on chunk_md5 is the jaccardPairs
   * shape — 16-byte keys, never text; `maxChunkDegree` drops
   * fingerprints present in more documents (a chunk in thousands of
   * docs is a template paragraph — the maxShingleDegree argument
   * verbatim), bounding the join at Σ df². Output: (doc_a, doc_b,
   * shared, containment), a < b, containment 1e-6-rounded.
   */
  def cdcOverlapPairs(chunks: DataFrame, minShared: Int, minContainment: Double,
                      maxChunkDegree: Option[Int] = None,
                      idCol: String = "doc_id"): DataFrame = {
    require(minShared >= 1, "minShared must be >= 1")
    val sets0 = chunks.select(col(idCol).as("id"), col("chunk_md5")).distinct()
    val sets = graft.core.Caches.cacheOnce(maxChunkDegree match {
      case Some(d) =>
        val deg = sets0.groupBy("chunk_md5").agg(count(lit(1)).as("df"))
        sets0.join(deg.where(col("df") <= d).select("chunk_md5"),
          Seq("chunk_md5"), "left_semi")
      case None => sets0
    })
    val sizes = sets.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = sets.select(col("id").as("doc_a"), col("chunk_md5"))
      .join(sets.select(col("id").as("doc_b"), col("chunk_md5")), Seq("chunk_md5"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
    inter
      .join(sizes.select(col("id").as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
      .join(sizes.select(col("id").as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
      .where(col("shared") >= minShared)
      .select(col("doc_a"), col("doc_b"), col("shared"),
        round(col("shared").cast("double") /
          least(col("sz_a"), col("sz_b")).cast("double"), 6).as("containment"))
      .where(col("containment") >= minContainment)
  }
}
