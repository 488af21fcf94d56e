package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, SimilaritySearch}

/**
 * Deduplication queries over `documents` / `embeddings` (EXT operators,
 * SURVEY §2.11): exact digest dedup, n-gram Jaccard, MinHash+LSH, SimHash,
 * and embedding-cosine near-dup. The DuckDB oracles recompute every
 * pipeline end-to-end — including the LSH banding — from the same
 * md5-derived hash family, so the match is exact, not statistical.
 */
object DedupQueries extends QueryPack {

  private val ShingleN = 3
  private val JaccardThreshold = 0.5
  private val ContainThreshold = 0.6 // q202 one-sided coverage gate
  private val LshNoiseSim = 0.1 // q210 junk-similarity operating point
  private val LshMinCatch = 0.85 // q210 catch floor at JaccardThreshold
  private val LshMaxNoise = 0.2 // q210 collision ceiling at LshNoiseSim
  private val NumPerms = 16
  private val Bands = 4 // × 4 rows/band
  private val SimHashMaxDist = 2
  private val EstSimThreshold = 0.5 // q103 keep-first signature-agreement cutoff
  private val CosineThreshold = 0.4
  // SRP-blocked variant: 8 seeded ±1 hyperplanes over dim 64 (the same
  // family AnnQueries uses); lower threshold so the blocked pair set stays
  // non-trivial at test SF.
  private val SrpPlanes = 8
  // CDC partial-overlap tier (q227, over the q168/q169 chunker): pairs
  // need ≥ 2 shared chunks at containment ≥ 0.3. Plants re-use the
  // high-bit id offset (no collision at any corpus scale) and copy the
  // leading 60% of every 10th document's tokens plus a distinct tail.
  private val CdcMinShared = 2
  private val CdcMinContainment = 0.3
  private val CdcPlantFrac = 0.6
  private val CdcPlantOffset = 1L << 41
  private val Dim = 64
  private val BlockedCosineThreshold = 0.3
  private val CentroidMod = 37 // SemDeDup clustering seeds (AnnQueries' family)
  private val SpanTokens = 16 // q74 span-dedup window
  private val ExactSubstrL = 16 // q138 any-offset substring window
  private val CdcWindow = 4 // q169 rolling-hash window (tokens)
  private val CdcModK = 16 // q169 cut modulus ⇒ expected ~16-token chunks
  private val LedgerMinWords = 10 // q185 length gate
  private val WinnowK = 4 // q181 k-gram size
  private val WinnowWindow = 5 // q181 selection window ⇒ ~1/5 density
  private val WinnowMinShared = 2L // q181 report floor (shared fingerprints)
  private val WinnowMaxDegree = 50 // q181 boilerplate-hash cap
  private lazy val planes = SimilaritySearch.hyperplanes(SrpPlanes, Dim)

  private def docs(s: SparkSession, dir: String) = Tables.read(s, dir, "documents")
  private def embs(s: SparkSession, dir: String) = Tables.read(s, dir, "embeddings")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // EXT-D1: exact dedup groups by content digest.
    "q19_exact_dedup" -> ((s, dir) =>
      Dedup.exactGroups(docs(s, dir))
        .orderBy(col("digest"))),

    // EXT-D34: partial-overlap REPORT over content-defined chunks — the
    // near-dup class every whole-document tier MISSES: a document
    // embedding a large block of another (quoted article, syndicated
    // section) sits below any whole-doc Jaccard/SimHash threshold, but
    // its CDC chunk fingerprints (the q168/q169 chunker — boundaries
    // re-align after edits) survive verbatim, and the containment join
    // surfaces the pair. Partial copies are PLANTED (every 10th doc's
    // leading 60% of tokens + a distinct tail, under the high-bit id
    // offset) so the pair tier provably fires; the oracle replays
    // boundaries, chunk fingerprints, and the containment join.
    "q227_cdc_overlap" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val tk = graft.functions.TextFunctions.tokensWs(col("text"))
      val planted = d.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + CdcPlantOffset).as("doc_id"),
          concat(
            concat_ws(" ", slice(tk, lit(1),
              greatest(floor(size(tk) * CdcPlantFrac), lit(1)).cast("int"))),
            lit(" unique tail "), col("doc_id").cast("string")).as("text"))
      val chunks = graft.operators.Chunking.cdcChunks(
        d.unionByName(planted), CdcWindow, CdcModK)
      Dedup.cdcOverlapPairs(chunks, CdcMinShared, CdcMinContainment)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // EXT-D8: canonical-form exact dedup — digest over the NORMALIZED text
    // (trim/lowercase/whitespace-collapse), catching case- and
    // spacing-variant duplicates the raw digest misses.
    "q52_canonical_dedup" -> ((s, dir) =>
      Dedup.exactGroups(docs(s, dir).withColumn("text",
          graft.functions.TextFunctions.canonicalText(col("text"))))
        .orderBy(col("digest"))),

    // EXT-D2: n-gram Jaccard near-dup pairs (inverted-index join).
    "q20_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairs(Dedup.shingleSets(docs(s, dir), ShingleN), JaccardThreshold)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))),

    // EXT-D32: asymmetric containment pairs — the subset-duplication
    // signal Jaccard structurally misses (a document embedded in a longer
    // one scores |A∩B|/|A| ≈ 1 as inner with arbitrarily low Jaccard):
    // q20's inverted-index intersection, each side normalized by its OWN
    // shingle count, both directions reported independently.
    "q202_containment" -> ((s, dir) =>
      Dedup.containmentPairs(Dedup.shingleSets(docs(s, dir), ShingleN),
          ContainThreshold)
        .select(col("inner_id"), col("outer_id"),
          round(col("containment"), 6).as("containment"))
        .orderBy(col("inner_id"), col("outer_id"))),

    // EXT-D28: winnowing overlap pairs (the MOSS fingerprint scheme) —
    // per-window rightmost-minimum k-gram hash selection via one packed
    // integer min, then the inverted-index pair report. The guarantee
    // the other tiers lack: any shared run of ≥ window+k−1 tokens
    // produces a SHARED fingerprint, and selection density is ~1/window.
    "q181_winnow_pairs" -> ((s, dir) =>
      Dedup.winnowPairs(docs(s, dir), WinnowK, WinnowWindow, WinnowMinShared,
          Some(WinnowMaxDegree))
        .select(col("doc_a"), col("doc_b"), col("shared"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))),

    // EXT-T62: per-document rejection ledger — every train document's
    // FIRST rejecting stage in pipeline order (too_short → exact_dup →
    // contaminated) or 'kept': the per-row observability face of q149's
    // funnel counts, short-circuit semantics included (a too-short page
    // never reaches dedup, so its verdict is the length gate even when
    // it is also a duplicate).
    "q185_rejection_ledger" -> ((s, dir) => {
      val d = docs(s, dir)
      val train = d.where(col("doc_id") % 17 =!= 0)
      val bench = d.where(col("doc_id") % 17 === 0)
      val tooShort = train.where(
        size(graft.functions.TextFunctions.tokensWs(col("text"))) < LedgerMinWords)
        .select(col("doc_id"))
      val exactDup = Dedup.exactDroppedIds(train, None, "doc_id", "text")
        .select(col("id").as("doc_id"))
      val contaminated = graft.operators.Decontamination
        .contaminated(train, bench, ShingleN).select(col("doc_id"))
      graft.operators.CurationLedger.rejectionLedger(train, Seq(
          "too_short" -> tooShort,
          "exact_dup" -> exactDup,
          "contaminated" -> contaminated))
        .orderBy(col("doc_id"))
    }),

    // EXT-D29: cross-source duplication matrix — which sources copy from
    // which: for every source pair (a < b), the number of distinct
    // content digests present in BOTH (and each side's digest universe
    // for rates). The governance face of exact dedup: a high-overlap
    // pair means one feed mirrors another and deserves source-level
    // dedup before document-level passes pay for it. Digest-keyed
    // aggregates only — text never shuffles.
    "q189_source_overlap" -> ((s, dir) => {
      val ds = docs(s, dir).select(md5(col("text")).as("digest"), col("source"))
        .distinct()
      val sizes = ds.groupBy("source").agg(count(lit(1)).as("n_digests"))
      val shared = ds.select(col("digest"), col("source").as("source_a"))
        .join(ds.select(col("digest"), col("source").as("source_b")), Seq("digest"))
        .where(col("source_a") < col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("shared"))
      // the COMPLETE matrix: zero-shared pairs are the (good) norm and
      // belong in the report — the source list is tiny, so the pair
      // frame is broadcast-size at any corpus scale
      sizes.select(col("source").as("source_a"), col("n_digests").as("n_a"))
        .join(sizes.select(col("source").as("source_b"), col("n_digests").as("n_b")),
          col("source_a") < col("source_b"))
        .join(shared, Seq("source_a", "source_b"), "left")
        .select(col("source_a"), col("source_b"),
          coalesce(col("shared"), lit(0L)).as("shared"),
          round(coalesce(col("shared"), lit(0L)).cast("double") /
            least(col("n_a"), col("n_b")).cast("double"), 6).as("overlap"))
        .orderBy(col("source_a"), col("source_b"))
    }),

    // EXT-D30: n-gram novelty scoring — per document, the fraction of
    // its distinct shingles whose FIRST corpus occurrence (min doc id —
    // the ingestion-order proxy) is this document: ~1 means genuinely
    // new content, ~0 means everything was already said. The
    // contribution-ordering signal dedup-aware curricula and
    // "data freshness" dashboards read; one gram-keyed min aggregate +
    // one join over the same (id, g) table the Jaccard tier builds —
    // hashes shuffle, text never does.
    "q190_gram_novelty" -> ((s, dir) => {
      val sh = Dedup.shingleSets(docs(s, dir), ShingleN)
      val first = sh.groupBy(col("g")).agg(min(col("id")).as("first_id"))
      sh.join(first, Seq("g"))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("first_id") === col("id"), 1L).otherwise(0L)).as("n_novel"))
        .select(col("id").as("doc_id"), col("n_grams"),
          round(col("n_novel").cast("double") / col("n_grams").cast("double"), 6)
            .as("novel_frac"))
        .orderBy(col("doc_id"))
    }),

    // EXT-X11: persisted HLL distinct ledger — per-language distinct
    // content digests maintained incrementally (base write + crawl-delta
    // append of kilobyte sketches; served by lossless register union),
    // gated the q69 way: the served estimates are asserted in-engine
    // against exact distinct counts (|est/exact − 1| ≤ 0.1 — default
    // lgK=12 runs ~1.6%), and the output carries the exact side + the
    // asserted booleans for the oracle.
    "q191_hll_ledger" -> ((s, dir) => {
      val d = docs(s, dir).select(col("lang"), md5(col("text")).as("digest"))
      val out = graft.core.Scratch.dir("graft_hll")
      graft.store.DistinctLedger.write(
        d.where(substring(col("digest"), 1, 1) =!= "a"), out, "lang", "digest")
      graft.store.DistinctLedger.append(
        d.where(substring(col("digest"), 1, 1) === "a"), out, "lang", "digest",
        batchName = Some("delta1"))
      val exact = d.distinct().groupBy(col("lang"))
        .agg(count(lit(1)).as("exact_distinct"))
      graft.store.DistinctLedger.estimates(s, out)
        .join(exact, col("scope") === col("lang"))
        .select(col("lang"), col("exact_distinct"),
          (abs(col("distinct_est").cast("double") /
            col("exact_distinct").cast("double") - 1.0) <= 0.1).as("est_ok"))
        .orderBy(col("lang"))
    }),

    // EXT-T63: contamination ATTRIBUTION — q67 says a train document
    // overlaps the benchmark; this says WHICH benchmark item leaked
    // (most shared distinct n-grams, smallest benchmark id on ties) —
    // what an auditor needs to adjudicate a leak and what a scrub
    // report cites. Benchmark grams broadcast (benchmarks are bounded);
    // the corpus pays the same shingle pass q67 already prices.
    "q192_contamination_map" -> ((s, dir) => {
      val d = docs(s, dir)
      val tg = Dedup.shingleSets(d.where(col("doc_id") % 17 =!= 0), ShingleN)
      val bg = Dedup.shingleSets(d.where(col("doc_id") % 17 === 0), ShingleN)
        .select(col("id").as("bench_id"), col("g"))
      val shared = tg.join(broadcast(bg), Seq("g"))
        .groupBy(col("id"), col("bench_id"))
        .agg(count(lit(1)).as("n_shared"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
        .orderBy(col("n_shared").desc, col("bench_id").asc)
      shared.withColumn("rnk", row_number().over(w)).where(col("rnk") === 1)
        .select(col("id").as("doc_id"), col("bench_id"), col("n_shared"))
        .orderBy(col("doc_id"))
    }),

    // EXT-D31: line document-frequency histogram — the exact distribution
    // of per-line-hash df (doc_freq → how many distinct lines): THE
    // diagnostic that chooses EXT-D25's maxDocFreq knob (the histogram's
    // knee separates content from boilerplate — header df=|corpus|,
    // footers df=|source|, content df≈dup-group size). Same lined corpus
    // as q160; one distinct + two keyed aggregates, hashes only.
    "q193_line_df_hist" -> ((s, dir) =>
      Dedup.lineDf(
          Dedup.lineKeyed(linedDocs(s, dir), "doc_id", "text"), "doc_id")
        .groupBy(col("df").as("doc_freq"))
        .agg(count(lit(1)).as("n_line_hashes"))
        .orderBy(col("doc_freq"))),

    // EXT-D3: MinHash signatures → LSH banding → candidate pairs.
    "q21_minhash_lsh" -> ((s, dir) =>
      Dedup.lshCandidates(
          Dedup.minHashSignatures(docs(s, dir), ShingleN, NumPerms),
          Bands, NumPerms / Bands)
        .select(col("doc_a"), col("doc_b"), round(col("est_sim"), 6).as("est_sim"))
        .orderBy(col("doc_a"), col("doc_b"))),

    // EXT-D4a: per-document 60-bit SimHash (row-level determinism check).
    "q22_simhash" -> ((s, dir) =>
      Dedup.simHashes(docs(s, dir))
        .select(col("id").as("doc_id"), col("sh"))
        .orderBy(col("doc_id"))),

    // EXT-D4b: SimHash near-dup pairs via banded Hamming blocking.
    "q23_simhash_pairs" -> ((s, dir) =>
      Dedup.simHashPairs(Dedup.simHashes(docs(s, dir)), SimHashMaxDist)
        .orderBy(col("doc_a"), col("doc_b"))),

    // EXT-D5: embedding-cosine near-dup pairs (brute force at test SF;
    // the exact baseline the blocked variant is measured against).
    "q24_embed_neardup" -> ((s, dir) =>
      SimilaritySearch.nearDupPairs(embs(s, dir), CosineThreshold)
        .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cos"))
        .orderBy(col("vec_a"), col("vec_b"))),

    // EXT-D7: near-dup CLUSTERS — connected components over the Jaccard
    // pair graph (min-label propagation); component id = the canonical
    // survivor. The oracle recomputes reachability with a recursive CTE.
    "q51_neardup_clusters" -> ((s, dir) =>
      Dedup.connectedComponents(
          Dedup.jaccardPairs(Dedup.shingleSets(docs(s, dir), ShingleN), JaccardThreshold))
        .orderBy(col("id"))),

    // EXT-D9: survivor selection — components (q51's machinery) × quality
    // scoring (q16's machinery): keep the argmax-quality member of each
    // near-dup cluster, deterministic tie-break to the smaller id.
    "q54_dedup_survivors" -> ((s, dir) => {
      val comps = Dedup.connectedComponents(
        Dedup.jaccardPairs(Dedup.shingleSets(docs(s, dir), ShingleN), JaccardThreshold))
      val qual = docs(s, dir).select(col("doc_id").as("id"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("quality"))
      Dedup.survivors(comps, qual)
        .select(col("component"), col("survivor_id"),
          round(col("best_quality"), 6).as("best_quality"), col("n_members"))
        .orderBy(col("component"))
    }),

    // EXT-D10: end-to-end corpus dedup — the one-call composition
    // (pairs → components → quality survivors → kept corpus). Output is
    // the kept document ids; the oracle drops every clustered member
    // ranked below its cluster's argmax-quality survivor.
    "q58_dedup_corpus" -> ((s, dir) =>
      Dedup.dedupCorpus(docs(s, dir), ShingleN, JaccardThreshold)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))),

    // EXT-D11: corpus dedup via LSH candidates + exact refine — the
    // extreme-scale configuration of q58 (candidate cost tracks LSH
    // collision probability, refine re-checks true Jaccard).
    "q61_dedup_corpus_lsh" -> ((s, dir) =>
      Dedup.dedupCorpusLsh(docs(s, dir), ShingleN, NumPerms, Bands, JaccardThreshold)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))),

    // EXT-D12: SemDeDup — semantic dedup via centroid clustering: pairwise
    // cosine only WITHIN each cluster cell, components, keep min id. The
    // quadratic term is Σ|cluster|², not |corpus|².
    "q66_semantic_dedup" -> ((s, dir) =>
      SimilaritySearch.semanticDedup(embs(s, dir), CentroidMod, CosineThreshold)
        .select(col("vec_id"))
        .orderBy(col("vec_id"))),

    // EXT-D15: incremental corpus dedup — the crawl-increment protocol:
    // a signature store is built over the base corpus (doc_id % 4 ≠ 1),
    // then the delta (% 4 = 1) dedups against it keep-first — dup-of-
    // store drops, intra-delta components keep min id — with ONE pass
    // over the delta; base TEXT is never rescanned (plan-guarded in
    // DedupStoreSpec). Output: the kept delta ids; the oracle replays
    // signatures, band joins, and the keep-first rule over the same
    // partition.
    "q103_dedup_delta" -> ((s, dir) => {
      val out = graft.core.Scratch.dir("graft_dedup_store")
      val d = docs(s, dir)
      graft.store.DedupStore.write(
        d.where(col("doc_id") % 4 =!= 1), ShingleN, NumPerms, out)
      graft.store.DedupStore.dedupDelta(
          d.where(col("doc_id") % 4 === 1), out, ShingleN, NumPerms, Bands,
          EstSimThreshold)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // EXT-T12: benchmark decontamination — every 17th document plays the
    // held-out benchmark set; report train documents sharing any 3-gram
    // with it (the n-gram-collision scrub protocol). The benchmark gram
    // set broadcasts; the corpus side never shuffles for the probe.
    "q67_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.operators.Decontamination.contaminated(
          d.where(col("doc_id") % 17 =!= 0),
          d.where(col("doc_id") % 17 === 0), ShingleN)
        .orderBy(col("doc_id"))
    }),

    // EXT-D23: FUZZY benchmark decontamination — the near-duplicate face
    // of q67: cross-set MinHash-LSH candidates (train bands probe the
    // broadcast benchmark band table) + exact Jaccard refine, so a
    // rephrased benchmark item that shares no exact n-gram run is still
    // caught at the similarity threshold. Same hash family, bands, and
    // threshold as the dedup tier; the oracle replays signatures, band
    // buckets, the cross-set candidate join, and the refine.
    "q158_decontaminate_fuzzy" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.operators.Decontamination.contaminatedFuzzy(
          d.where(col("doc_id") % 17 =!= 0),
          d.where(col("doc_id") % 17 === 0),
          ShingleN, NumPerms, Bands, JaccardThreshold)
        .orderBy(col("doc_id"))
    }),

    // EXT-D14: one-call corpus dedup on the SimHash tier — banded
    // Hamming pairs → components → quality survivors → kept corpus; the
    // cheapest per-candidate gate (XOR/popcount), completing the dedup
    // matrix alongside q58 (exact Jaccard) and q61 (LSH + refine).
    "q83_dedup_corpus_simhash" -> ((s, dir) =>
      Dedup.dedupCorpusSimHash(docs(s, dir), SimHashMaxDist)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))),

    // EXT-D13: span-level corpus dedup (C4 protocol) — every 16-token
    // span keeps only its first corpus-wide occurrence and documents are
    // reassembled from their surviving spans; removes boilerplate
    // stretches shared between otherwise-distinct documents, which
    // document-level dedup can't touch.
    "q74_span_dedup" -> ((s, dir) =>
      Dedup.spanDedup(docs(s, dir), SpanTokens)
        .orderBy(col("doc_id"))),

    // EXT-D27: chunk-level dedup over CONTENT-DEFINED boundaries — the
    // storage-dedup recipe on text: CDC chunks keep-first corpus-wide,
    // documents reassemble from kept chunks. The middle tier between
    // q74's fixed spans (miss shifted duplicates) and q138's per-token
    // windows (catch everything, cost ∝ tokens): re-aligns after edits
    // at one hash per ~16 tokens.
    "q169_cdc_dedup" -> ((s, dir) =>
      Dedup.cdcDedup(docs(s, dir), CdcWindow, CdcModK)
        .orderBy(col("doc_id"))),

    // EXT-D21: any-offset exact substring dedup (ExactSubstr, Lee et al.
    // 2022) — every stride-1 16-token window keeps its first corpus-wide
    // occurrence; later occurrences coalesce into maximal removed
    // intervals and documents are reassembled from the complement.
    // Catches duplicated runs at ANY offset — the modality q74's fixed
    // span boundaries structurally miss.
    "q138_exact_substr" -> ((s, dir) =>
      Dedup.exactSubstrDedup(docs(s, dir), ExactSubstrL)
        .orderBy(col("doc_id"))),

    // EXT-D25: CCNet-style LINE-level boilerplate dedup — lines appearing
    // in more than LineMaxDf distinct documents are boilerplate (nav
    // chrome, banners) and every occurrence is struck; body lines stay.
    // The fixture plants the crawl shape deterministically in-query
    // (q63's pattern): a corpus-wide header line (df = |corpus|), a
    // per-source footer (df = 25 per source at sf0.01), and the real
    // token stream re-lined 8 tokens/line (df ≈ duplicate-group size).
    // Output hashes the reassembled text so the gate covers line order
    // and separator reconstruction, not just counts.
    "q160_line_dedup" -> ((s, dir) => {
      Dedup.lineDedup(linedDocs(s, dir), LineMaxDf)
        .select(col("doc_id"), col("n_lines"), col("n_removed"),
          md5(col("text")).as("clean_md5"))
        .orderBy(col("doc_id"))
    }),

    // EXT-T59: line-granular LM quality filtering — CCNet's ACTUAL
    // filtering granularity (paragraph-level perplexity): score every
    // line by mean unigram NLL under the corpus's own vocabulary,
    // strike the corpus-wide worst decile of lines (rank-based — no
    // float threshold), reassemble. A noisy footer no longer sinks a
    // good page; a good quote no longer rescues a spam page.
    "q175_line_nll_filter" -> ((s, dir) =>
      graft.operators.LanguageModel.lineNllFilter(linedDocs(s, dir), LineDropFrac)
        .select(col("doc_id"), col("n_lines"), col("n_removed"),
          md5(col("text")).as("clean_md5"))
        .orderBy(col("doc_id"))),

    // EXT-D26: incremental line dedup — the crawl-delta face of q160:
    // the base corpus (doc_id % 4 ≠ 1) persists as its per-line-hash
    // DOCUMENT-frequency ledger (16 bytes per distinct line, no text);
    // the delta (% 4 = 1) folds in one pass, striking lines whose
    // merged (stored + delta) df crosses the gate. Merged df IS the
    // full-corpus df, so the fold is row-identical to the one-shot q160
    // pass restricted to delta documents — exactly what the oracle
    // checks.
    "q167_line_dedup_delta" -> ((s, dir) => {
      val lined = linedDocs(s, dir)
      val out = graft.core.Scratch.dir("graft_linedf_store")
      graft.store.LineDedupStore.write(
        lined.where(col("doc_id") % 4 =!= 1), out)
      graft.store.LineDedupStore.dedupDelta(
          lined.where(col("doc_id") % 4 === 1), out, LineMaxDf)
        .select(col("doc_id"), col("n_lines"), col("n_removed"),
          md5(col("text")).as("clean_md5"))
        .orderBy(col("doc_id"))
    }),

    // EXT-D22: incremental ExactSubstr — the crawl-delta face of q138:
    // the base corpus (doc_id % 4 ≠ 1) is represented on disk by its
    // window-HASH set (8 bytes/position, no text), the delta (% 4 = 1)
    // folds against it with one pass over the delta — stored hash ⇒ the
    // whole interval drops (arrival order wins), intra-delta occurrences
    // keep-first by (id, pos) — then islands coalesce and documents
    // reassemble exactly as q138. Base text is never rescanned
    // (plan-guarded in ExactSubstrStoreSpec).
    "q143_substr_delta" -> ((s, dir) => {
      val out = graft.core.Scratch.dir("graft_substr_store")
      val d = docs(s, dir)
      graft.store.ExactSubstrStore.write(
        d.where(col("doc_id") % 4 =!= 1), ExactSubstrL, out)
      graft.store.ExactSubstrStore.dedupDelta(
          d.where(col("doc_id") % 4 === 1), out, ExactSubstrL)
        .orderBy(col("doc_id"))
    }),

    // EXT-D6: LSH quality metric — how much of the exact-Jaccard truth set
    // (pairs ≥ threshold) does the MinHash+LSH candidate pipeline recover?
    // One summary row: truth size, candidate size, hits, recall.
    "q47_dedup_recall" -> ((s, dir) => {
      val sh = Dedup.shingleSets(docs(s, dir), ShingleN)
      val truth = Dedup.jaccardPairs(sh, JaccardThreshold).select("doc_a", "doc_b")
      val cand = Dedup.lshCandidates(
          Dedup.minHashSignatures(docs(s, dir), ShingleN, NumPerms),
          Bands, NumPerms / Bands).select("doc_a", "doc_b")
      val hits = truth.join(cand, Seq("doc_a", "doc_b"), "left_semi")
      truth.agg(count(lit(1)).as("n_true"))
        .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
        .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
        .select(col("n_true"), col("n_cand"), col("n_hit"),
          round(col("n_hit").cast("double") /
            when(col("n_true") === 0, lit(null)).otherwise(col("n_true")), 6)
            .as("recall"))
    }),

    // EXT-D33: LSH band-plan auto-tune — the (bands, rows) knob decided
    // from the collision S-curve with a TWO-SIDED feasibility rule
    // (catch ≥ minCatch at the operating threshold, noise ≤ maxNoise at
    // the junk threshold — r = 1 "catches everything" only by flooding
    // the band join), cheapest feasible split chosen, and the chosen
    // split VALIDATED: measured candidate recall against the
    // exact-Jaccard truth set rides the chosen row (the q179 pattern).
    "q210_lsh_tune" -> ((s, dir) => {
      val grid = Dedup.tuneLshPlan(s, NumPerms, JaccardThreshold,
        LshNoiseSim, LshMinCatch, LshMaxNoise)
      val pick = grid.where(col("chosen")).head()
      val (b, r) = (pick.getLong(0).toInt, pick.getLong(1).toInt)
      val truth = Dedup.jaccardPairs(
        Dedup.shingleSets(docs(s, dir), ShingleN), JaccardThreshold)
        .select("doc_a", "doc_b")
      val cand = Dedup.lshCandidates(
          Dedup.minHashSignatures(docs(s, dir), ShingleN, NumPerms), b, r)
        .select("doc_a", "doc_b")
      val hits = truth.join(cand, Seq("doc_a", "doc_b"), "left_semi")
      val measured = truth.agg(count(lit(1)).as("mt"))
        .crossJoin(hits.agg(count(lit(1)).as("mh")))
      grid.crossJoin(broadcast(measured))
        .select(col("bands"), col("rows_per_band"), col("p_catch"),
          col("p_noise"), col("feasible"), col("chosen"),
          when(col("chosen"), col("mt")).as("n_true"),
          when(col("chosen"), col("mh")).as("n_hit"),
          when(col("chosen"), round(col("mh").cast("double") /
            when(col("mt") === 0, lit(null)).otherwise(col("mt")), 6))
            .as("recall"))
        .orderBy(col("bands"))
    }),

    // EXT-D5 (scale path): the SAME operator with SRP-bucket blocking —
    // candidates must share the 8-bit sign bucket, so the pair scan is a
    // hash join on the bucket key instead of an all-pairs nested loop
    // (plan-guarded in PlanShapeSpec). This is the 100 TB configuration.
    "q39_embed_neardup_srp" -> ((s, dir) =>
      SimilaritySearch.nearDupPairs(
          SimilaritySearch.withBucket(embs(s, dir), planes),
          BlockedCosineThreshold, blockCol = Some("bucket"))
        .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cos"))
        .orderBy(col("vec_a"), col("vec_b"))),

    // EXT-D19: source-level shingle Jaccard — exact overlap between
    // crawl sources plus the union-property MinHash estimate, the
    // corpus-forensics report that sizes cross-source duplication before
    // doc-level dedup (and a standing accuracy witness for the signature
    // machinery: |j_est − j_exact| tracks √(J(1−J)/16)).
    "q112_source_jaccard" -> ((s, dir) =>
      graft.operators.Dedup.groupShingleJaccard(
          Tables.read(s, dir, "documents"), ShingleN, NumPerms)
        .select(col("group_a"), col("group_b"),
          round(col("j_exact"), 6).as("j_exact"),
          round(col("j_est"), 6).as("j_est"))
        .orderBy(col("group_a"), col("group_b"))),

    // EXT-D20: sparse TF-IDF cosine similarity join — the WEIGHTED
    // near-dup face (MinHash/Jaccard is unweighted set overlap; SimHash
    // a hashed projection): cosine over tf·idf 3-gram shingle vectors,
    // computed as the exact sparse matrix product via an inverted-index
    // self-join (posting lists bounded by the df cap — boilerplate
    // phrases are excluded from the vectors by definition). The oracle
    // replays tf, df, idf, L2 norms, and the pair dot products in SQL.
    "q122_tfidf_cosine" -> ((s, dir) =>
      graft.operators.SparseSim.tfidfCosinePairs(
          Tables.read(s, dir, "documents"), shingleN = 3,
          minCos = TfidfCosThreshold, maxDfFrac = TfidfMaxDfFrac,
          maxDfAbs = TfidfMaxDfAbs)
        .orderBy(col("doc_a"), col("doc_b")))
  )

  private val TfidfCosThreshold = 0.3
  private val TfidfMaxDfFrac = 0.2
  private val TfidfMaxDfAbs = 256L
  private val LineTokens = 8 // q160 re-lined tokens per content line
  private val LineMaxDf = 5L // q160 boilerplate document-frequency gate
  private val LineHeader = "corpus shared boilerplate header"
  private val LineFooter = "footer navigation for "
  private val LineDropFrac = 0.1 // q175 worst-line fraction struck

  /** The q160/q167 crawl-shaped fixture: documents re-lined 8 tokens per
    * line between a corpus-wide header and a per-source footer (planted
    * deterministically in-query — the q63 pattern). */
  private def linedDocs(s: SparkSession, dir: String): DataFrame = {
    val tk = when(length(trim(col("text"))) === 0, array().cast("array<string>"))
      .otherwise(split(trim(col("text")), "\\s+"))
    docs(s, dir)
      .select(col("doc_id"), col("source"), tk.as("tk"))
      .select(col("doc_id"),
        concat_ws("\n",
          concat(
            array(lit(LineHeader)),
            when(size(col("tk")) === 0, array().cast("array<string>"))
              .otherwise(transform(
                sequence(lit(0),
                  ((size(col("tk")) - 1) / LineTokens).cast("int")),
                g => array_join(
                  slice(col("tk"), g * LineTokens + 1, lit(LineTokens)), " "))),
            array(concat(lit(LineFooter), col("source"))))).as("text"))
  }

  // DuckDB mirrors -----------------------------------------------------------

  /** doc → distinct reduced shingle-hash set (mirrors Dedup.shingleSets). */
  private val ShingleCtes =
    s"""toks AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk FROM documents),
       |shs AS (SELECT doc_id, list_distinct(list_transform(
       |  CASE WHEN len(tk) < $ShingleN THEN []
       |       ELSE list_transform(range(1, len(tk) - ${ShingleN - 2}),
       |              i -> array_to_string(list_slice(tk, i, i + ${ShingleN - 1}), ' ')) END,
       |  s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647)) AS gs FROM toks)""".stripMargin

  /** The hyperplane matrix as a DuckDB nested-list literal (see AnnQueries). */
  private lazy val planesSql: String =
    planes.map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")

  /** SRP bucket of embedding column `e` (mirrors SimilaritySearch.srpBucket). */
  private def bucketSql(e: String) =
    s"""list_reduce(list_prepend(0::BIGINT, list_transform(range(0, $SrpPlanes), x -> x::BIGINT)),
       |  (acc, j) -> acc + CASE WHEN
       |    list_reduce(list_prepend(0.0, list_transform(range(1, len($e) + 1),
       |      i -> $e[i]::DOUBLE * (($planesSql)[j + 1][i])::DOUBLE)), (x, y) -> x + y) > 0.0
       |  THEN (1::BIGINT << j) ELSE 0 END)""".stripMargin

  /** MinHash signatures + LSH band buckets (ends with CTEs `sig` and
    * `bands`; assumes `shs` from ShingleCtes). */
  private lazy val SigBandCtes = {
    val r = NumPerms / Bands
    s"""sig AS (SELECT doc_id, list_transform(range(0, $NumPerms), i ->
       |          list_min(list_transform(gs, g -> (g * (i * 2 + 1) + (i + 1) * 1000003) % 2147483647))) AS sg
       |        FROM shs WHERE len(gs) > 0),
       |bands AS (SELECT doc_id, b,
       |            md5(array_to_string(list_slice(sg, b * $r + 1, b * $r + $r), ':')) AS bk
       |          FROM sig, unnest(range(0, $Bands)) AS t(b))""".stripMargin
  }

  /** SigBandCtes + the same-table candidate pairs (adds CTE `cand`). */
  private lazy val LshCandCtes =
    s"""$SigBandCtes,
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bands a JOIN bands b ON a.b = b.b AND a.bk = b.bk
       |           AND a.doc_id < b.doc_id)""".stripMargin

  /** Signature-agreement similarity estimate (mirrors Dedup.estSim);
    * `a`/`b` are `sig`-CTE aliases exposing `sg`. */
  private def estSimSql(a: String, b: String) =
    s"""len(list_filter(list_transform(range(1, ${NumPerms + 1}),
       |      i -> $a.sg[i] = $b.sg[i]), x -> x))::DOUBLE / $NumPerms.0""".stripMargin

  /** Quality-score CTEs (mirrors TextFunctions.qualityScore with the
    * lowercased stopword hit — q16's formula): ends with `tq(doc_id, q)`. */
  private lazy val QualityCtes = {
    val stop = graft.functions.TextFunctions.Stopwords.map(w => s"'$w'").mkString(", ")
    s"""qtoks AS (SELECT doc_id, text, CASE WHEN length(trim(text)) = 0 THEN []
       |          ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk FROM documents),
       |tq AS (SELECT doc_id,
       |  GREATEST(0.0, LEAST(1.0, len(tk)::DOUBLE / 50.0) * 0.5
       |    + LEAST(1.0, (CASE WHEN len(tk) = 0 THEN 0.0
       |        ELSE len(list_filter(tk, t -> lower(t) IN ($stop)))::DOUBLE
       |             / len(tk)::DOUBLE END) * 4.0) * 0.5
       |    - LEAST(1.0, (CASE WHEN length(text) = 0 THEN 0.0
       |        ELSE len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]'))::DOUBLE
       |             / length(text)::DOUBLE END) * 10.0) * 0.25) AS q
       |  FROM qtoks)""".stripMargin
  }

  /** Fold-based cosine identical to SimilaritySearch.cosine (same order). */
  private def cosSql(a: String, b: String) =
    s"""(list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1),
       |    i -> $a[i]::DOUBLE * $b[i]::DOUBLE)), (x, y) -> x + y)
       | / (sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1),
       |      i -> $a[i]::DOUBLE * $a[i]::DOUBLE)), (x, y) -> x + y))
       |  * sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len($b) + 1),
       |      i -> $b[i]::DOUBLE * $b[i]::DOUBLE)), (x, y) -> x + y))))""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // CDC replay: planted partial copies through the q168/q169 chunk
    // chain (rolling-window cut rule, lag/cut spans, chunk md5), then
    // the distinct-fingerprint containment join.
    "q227_cdc_overlap" ->
      s"""WITH base AS (SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + $CdcPlantOffset AS doc_id,
         |    array_to_string(tk[1:GREATEST(FLOOR(len(tk) * $CdcPlantFrac), 1)::INT], ' ')
         |      || ' unique tail ' || doc_id AS text
         |  FROM (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
         |          ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk
         |        FROM documents WHERE doc_id % 10 = 0)),
         |toks AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
         |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk
         |        FROM base),
         |wins AS (SELECT doc_id, tk,
         |           unnest(range(0, len(tk) - ${CdcWindow - 1})) AS pos
         |         FROM toks WHERE len(tk) >= $CdcWindow),
         |hashed AS (SELECT doc_id,
         |    pos, ('0x' || substr(md5(array_to_string(
         |        list_slice(tk, pos + 1, pos + $CdcWindow), ' ')), 1, 15))::BIGINT AS h
         |  FROM wins),
         |cuts AS (SELECT DISTINCT doc_id, cut FROM (
         |    SELECT doc_id, pos + $CdcWindow AS cut FROM hashed WHERE h % $CdcModK = 0
         |    UNION ALL SELECT doc_id, len(tk) FROM toks WHERE len(tk) > 0)),
         |ch AS (SELECT doc_id, cut,
         |         COALESCE(LAG(cut) OVER (PARTITION BY doc_id ORDER BY cut), 0) AS start
         |       FROM cuts),
         |fp AS (SELECT c.doc_id,
         |         md5(array_to_string(
         |           list_slice(t.tk, (c.start + 1)::INT, c.cut::INT), ' ')) AS chunk_md5
         |       FROM ch c JOIN toks t USING (doc_id) WHERE c.cut > c.start),
         |sets AS (SELECT DISTINCT doc_id, chunk_md5 FROM fp),
         |sz AS (SELECT doc_id, COUNT(*)::BIGINT AS sz FROM sets GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |                 COUNT(*)::BIGINT AS shared
         |          FROM sets a JOIN sets b
         |            ON a.chunk_md5 = b.chunk_md5 AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT doc_a, doc_b, shared,
         |  ROUND(shared::DOUBLE / LEAST(sa.sz, sb.sz)::DOUBLE, 6) AS containment
         |FROM inter JOIN sz sa ON sa.doc_id = inter.doc_a
         |           JOIN sz sb ON sb.doc_id = inter.doc_b
         |WHERE shared >= $CdcMinShared
         |  AND ROUND(shared::DOUBLE / LEAST(sa.sz, sb.sz)::DOUBLE, 6)
         |        >= $CdcMinContainment
         |ORDER BY doc_a, doc_b""".stripMargin,
    // tf (NOT distinct) 3-gram shingles → df-capped idf → L2 norms →
    // pair dot products: the exact metric q122's inverted index computes.
    "q122_tfidf_cosine" ->
      s"""WITH toks AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
         |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk
         |         FROM documents),
         |sh AS (SELECT doc_id AS doc, unnest(CASE WHEN len(tk) < 3 THEN []
         |         ELSE list_transform(range(1, len(tk) - 1),
         |                i -> array_to_string(list_slice(tk, i, i + 2), ' ')) END)
         |         AS sh
         |       FROM toks),
         |tf AS (SELECT doc, sh, COUNT(*)::DOUBLE AS tf FROM sh GROUP BY 1, 2),
         |nd AS (SELECT COUNT(*)::DOUBLE AS n_docs FROM documents),
         |dft AS (SELECT sh, COUNT(*)::DOUBLE AS df FROM tf GROUP BY 1),
         |dfc AS (SELECT sh, df FROM dft, nd
         |        WHERE df <= LEAST(n_docs * $TfidfMaxDfFrac, $TfidfMaxDfAbs)),
         |w AS (SELECT doc, tf.sh, tf * ln(1.0 + n_docs / df) AS w
         |      FROM tf JOIN dfc ON tf.sh = dfc.sh, nd),
         |nrm AS (SELECT doc, sqrt(SUM(w * w)) AS nrm FROM w GROUP BY 1),
         |p AS (SELECT w.sh, w.doc, w / nrm AS wn FROM w JOIN nrm USING (doc))
         |SELECT a.doc AS doc_a, b.doc AS doc_b,
         |       ROUND(SUM(a.wn * b.wn), 6) AS cos
         |FROM p a JOIN p b ON a.sh = b.sh AND a.doc < b.doc
         |GROUP BY 1, 2
         |HAVING ROUND(SUM(a.wn * b.wn), 6) >= $TfidfCosThreshold
         |ORDER BY 1, 2""".stripMargin,

    "q112_source_jaccard" ->
      s"""WITH $ShingleCtes,
         |gs AS (SELECT DISTINCT d.source AS grp, g
         |       FROM shs JOIN documents d USING (doc_id), unnest(shs.gs) AS t(g)),
         |sizes AS (SELECT grp, count(*) AS sz FROM gs GROUP BY 1),
         |inter AS (SELECT a.grp AS group_a, b.grp AS group_b, count(*) AS n_inter
         |          FROM gs a JOIN gs b ON a.g = b.g AND a.grp < b.grp
         |          GROUP BY 1, 2),
         |sig AS (SELECT grp, i,
         |          min((g * (i * 2 + 1) + (i + 1) * 1000003) % 2147483647) AS h
         |        FROM gs, unnest(range(0, $NumPerms)) AS t(i) GROUP BY 1, 2),
         |est AS (SELECT a.grp AS group_a, b.grp AS group_b,
         |          avg(CASE WHEN a.h = b.h THEN 1.0 ELSE 0.0 END) AS j_est
         |        FROM sig a JOIN sig b ON a.i = b.i AND a.grp < b.grp
         |        GROUP BY 1, 2)
         |SELECT group_a, group_b,
         |  ROUND(n_inter::DOUBLE / (sa.sz + sb.sz - n_inter), 6) AS j_exact,
         |  ROUND(j_est, 6) AS j_est
         |FROM inter
         |JOIN sizes sa ON sa.grp = group_a
         |JOIN sizes sb ON sb.grp = group_b
         |JOIN est USING (group_a, group_b)
         |ORDER BY group_a, group_b""".stripMargin,

    "q19_exact_dedup" ->
      """SELECT md5(text) AS digest, MIN(doc_id) AS canonical_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q52_canonical_dedup" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS digest,
        |       MIN(doc_id) AS canonical_id, CAST(COUNT(*) AS BIGINT) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q67_decontaminate" ->
      s"""WITH $ShingleCtes,
         |shd0 AS (SELECT doc_id, unnest(gs) AS g FROM shs),
         |bench AS (SELECT DISTINCT g FROM shd0 WHERE doc_id % 17 = 0)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
         |FROM shd0 JOIN bench USING (g)
         |WHERE doc_id % 17 <> 0
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q74_span_dedup" ->
      s"""WITH toks AS (SELECT doc_id,
         |    CASE WHEN length(trim(text)) = 0 THEN []
         |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk
         |  FROM documents),
         |starts AS (SELECT doc_id, tk,
         |             unnest(range(0, GREATEST(len(tk), 1), $SpanTokens)) AS start
         |           FROM toks),
         |spans AS (SELECT doc_id, CAST(start // $SpanTokens AS BIGINT) AS chunk_id,
         |            array_to_string(list_slice(tk, start + 1, start + $SpanTokens), ' ')
         |              AS chunk_text
         |          FROM starts WHERE start < len(tk)),
         |kept AS (SELECT doc_id, chunk_id, chunk_text FROM (
         |           SELECT doc_id, chunk_id, chunk_text,
         |             ROW_NUMBER() OVER (PARTITION BY chunk_text
         |                                ORDER BY doc_id, chunk_id) AS rnk
         |           FROM spans) WHERE rnk = 1),
         |reb AS (SELECT doc_id, string_agg(chunk_text, ' ' ORDER BY chunk_id) AS text
         |        FROM kept GROUP BY 1)
         |SELECT d.doc_id, COALESCE(r.text, '') AS text
         |FROM documents d LEFT JOIN reb r USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // Full ExactSubstr replay: stride-1 hashed windows → corpus-wide
    // keep-first rank → gaps-and-islands interval union → complement
    // reassembly, all in portable SQL.
    "q138_exact_substr" ->
      s"""WITH toks AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
         |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk FROM documents),
         |wins AS (SELECT doc_id, tk, unnest(range(0, len(tk) - ${ExactSubstrL - 1})) AS pos
         |         FROM toks WHERE len(tk) >= $ExactSubstrL),
         |hashed AS (SELECT doc_id, pos,
         |    ('0x' || substr(md5(array_to_string(
         |        list_slice(tk, pos + 1, pos + $ExactSubstrL), ' ')), 1, 15))::BIGINT AS h
         |  FROM wins),
         |dups AS (SELECT doc_id, pos, pos + $ExactSubstrL AS e FROM (
         |    SELECT doc_id, pos, ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rnk
         |    FROM hashed) WHERE rnk > 1),
         |marked AS (SELECT doc_id, pos, e,
         |    MAX(e) OVER (PARTITION BY doc_id ORDER BY pos
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
         |  FROM dups),
         |isl AS (SELECT doc_id, pos, e,
         |    SUM(CASE WHEN pme IS NULL OR pos > pme THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |  FROM marked),
         |islands AS (SELECT doc_id, island, MIN(pos) AS rm_start, MAX(e) AS rm_end
         |            FROM isl GROUP BY 1, 2),
         |gaps AS (SELECT doc_id,
         |           COALESCE(LAG(rm_end) OVER (PARTITION BY doc_id ORDER BY rm_start), 0) AS s,
         |           rm_start AS e
         |         FROM islands
         |         UNION ALL
         |         SELECT i.doc_id, MAX(i.rm_end) AS s, ANY_VALUE(len(t.tk)) AS e
         |         FROM islands i JOIN toks t USING (doc_id) GROUP BY i.doc_id),
         |reb AS (SELECT g.doc_id,
         |          string_agg(array_to_string(list_slice(t.tk, g.s + 1, g.e), ' '),
         |                     ' ' ORDER BY g.s) AS text
         |        FROM gaps g JOIN toks t USING (doc_id) WHERE g.e > g.s GROUP BY g.doc_id),
         |rm AS (SELECT doc_id, CAST(SUM(rm_end - rm_start) AS BIGINT) AS n_removed
         |       FROM islands GROUP BY 1),
         |isldocs AS (SELECT DISTINCT doc_id FROM islands)
         |SELECT t.doc_id,
         |  CASE WHEN i.doc_id IS NOT NULL THEN COALESCE(r.text, '')
         |       ELSE array_to_string(t.tk, ' ') END AS text,
         |  COALESCE(rm.n_removed, 0) AS n_removed
         |FROM toks t LEFT JOIN isldocs i USING (doc_id)
         |LEFT JOIN reb r ON t.doc_id = r.doc_id
         |LEFT JOIN rm ON t.doc_id = rm.doc_id
         |ORDER BY t.doc_id""".stripMargin,

    // CDC-dedup replay: the q168 chunk chain, corpus-wide keep-first per
    // chunk hash, ordered reassembly of kept spans.
    "q169_cdc_dedup" ->
      s"""WITH toks AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
         |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk FROM documents),
         |wins AS (SELECT doc_id, tk,
         |           unnest(range(0, len(tk) - ${CdcWindow - 1})) AS pos
         |         FROM toks WHERE len(tk) >= $CdcWindow),
         |hashed AS (SELECT doc_id,
         |    pos, ('0x' || substr(md5(array_to_string(
         |        list_slice(tk, pos + 1, pos + $CdcWindow), ' ')), 1, 15))::BIGINT AS h
         |  FROM wins),
         |cuts AS (SELECT DISTINCT doc_id, cut FROM (
         |    SELECT doc_id, pos + $CdcWindow AS cut FROM hashed WHERE h % $CdcModK = 0
         |    UNION ALL SELECT doc_id, len(tk) FROM toks WHERE len(tk) > 0)),
         |ch AS (SELECT doc_id, cut,
         |         COALESCE(LAG(cut) OVER (PARTITION BY doc_id ORDER BY cut), 0) AS start,
         |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cut) - 1 AS chunk_no
         |       FROM cuts),
         |chx AS (SELECT c.doc_id, c.chunk_no, c.start, c.cut - c.start AS n_tokens,
         |          md5(array_to_string(
         |            list_slice(t.tk, (c.start + 1)::INT, c.cut::INT), ' ')) AS cmd5
         |        FROM ch c JOIN toks t USING (doc_id) WHERE c.cut > c.start),
         |kept AS (SELECT doc_id, chunk_no, start, n_tokens FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY cmd5
         |                                 ORDER BY doc_id, chunk_no) AS rnk
         |    FROM chx) WHERE rnk = 1),
         |reb AS (SELECT k.doc_id,
         |          string_agg(array_to_string(list_slice(t.tk, (k.start + 1)::INT,
         |            (k.start + k.n_tokens)::INT), ' '), ' ' ORDER BY k.chunk_no) AS text,
         |          SUM(k.n_tokens) AS kt
         |        FROM kept k JOIN toks t USING (doc_id) GROUP BY 1)
         |SELECT t.doc_id, COALESCE(r.text, '') AS text,
         |  CAST(len(t.tk) - COALESCE(r.kt, 0) AS BIGINT) AS n_removed
         |FROM toks t LEFT JOIN reb r USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin,

    // CCNet line-dedup replay: plant the same header/content/footer line
    // structure, hash lines with the same md5-hash60 family, count
    // DOCUMENT frequency per hash, strike hot lines, and reassemble with
    // an ordered FILTERed string_agg.
    "q160_line_dedup" ->
      s"""WITH toks AS (SELECT doc_id, source, CASE WHEN length(trim(text)) = 0 THEN []
         |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk FROM documents),
         |lined AS (SELECT doc_id,
         |    ['$LineHeader']
         |      || list_transform(range(0, len(tk), $LineTokens),
         |           g -> array_to_string(list_slice(tk, g + 1, g + $LineTokens), ' '))
         |      || ['$LineFooter' || source] AS ls
         |  FROM toks),
         |lines AS (SELECT doc_id, CAST(i AS BIGINT) AS line_no, ls[i + 1] AS line,
         |            ('0x' || substr(md5(ls[i + 1]), 1, 15))::BIGINT AS h
         |          FROM lined, unnest(range(0, len(ls))) AS t(i)),
         |df AS (SELECT h, COUNT(DISTINCT doc_id) AS df FROM lines GROUP BY 1),
         |mk AS (SELECT l.doc_id, l.line_no, l.line, (df.df > $LineMaxDf) AS hot
         |       FROM lines l JOIN df USING (h))
         |SELECT doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_lines,
         |  CAST(COUNT(*) FILTER (WHERE hot) AS BIGINT) AS n_removed,
         |  md5(COALESCE(string_agg(line, chr(10) ORDER BY line_no)
         |        FILTER (WHERE NOT hot), '')) AS clean_md5
         |FROM mk GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Line-NLL replay: the planted line structure, per-line mean unigram
    // NLL over the corpus vocabulary, worst-decile rank strikes, ordered
    // reassembly.
    "q175_line_nll_filter" ->
      s"""WITH toks AS (SELECT doc_id, source, CASE WHEN length(trim(text)) = 0 THEN []
         |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk FROM documents),
         |lined AS (SELECT doc_id,
         |    ['$LineHeader']
         |      || list_transform(range(0, len(tk), $LineTokens),
         |           g -> array_to_string(list_slice(tk, g + 1, g + $LineTokens), ' '))
         |      || ['$LineFooter' || source] AS ls
         |  FROM toks),
         |lines AS (SELECT doc_id, CAST(i AS BIGINT) AS line_no, ls[i + 1] AS line
         |          FROM lined, unnest(range(0, len(ls))) AS t(i)),
         |lt AS (SELECT doc_id, line_no,
         |         unnest(CASE WHEN length(trim(line)) = 0 THEN []
         |           ELSE regexp_split_to_array(trim(line), '\\s+') END) AS tok
         |       FROM lines),
         |vb AS (SELECT tok, COUNT(*) AS cnt FROM lt GROUP BY 1),
         |nn AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n_total FROM vb),
         |sc AS (SELECT doc_id, line_no,
         |         ROUND(SUM(-ln(cnt::DOUBLE / n_total)) / COUNT(*), 6) AS nll
         |       FROM lt JOIN vb USING (tok) CROSS JOIN nn GROUP BY 1, 2),
         |rkl AS (SELECT doc_id, line_no,
         |          ROW_NUMBER() OVER (ORDER BY nll DESC, doc_id, line_no) AS rn,
         |          COUNT(*) OVER () AS l
         |        FROM sc),
         |strikes AS (SELECT doc_id, line_no FROM rkl
         |            WHERE rn <= CEIL($LineDropFrac * l)),
         |mk AS (SELECT l.doc_id, l.line_no, l.line,
         |         (s.line_no IS NOT NULL) AS hot
         |       FROM lines l LEFT JOIN strikes s USING (doc_id, line_no))
         |SELECT doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_lines,
         |  CAST(COUNT(*) FILTER (WHERE hot) AS BIGINT) AS n_removed,
         |  md5(COALESCE(string_agg(line, chr(10) ORDER BY line_no)
         |        FILTER (WHERE NOT hot), '')) AS clean_md5
         |FROM mk GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Incremental line-dedup replay: merged (store + delta) df equals
    // full-corpus df, so the oracle is exactly q160's pipeline with the
    // output restricted to delta documents.
    "q167_line_dedup_delta" ->
      s"""WITH toks AS (SELECT doc_id, source, CASE WHEN length(trim(text)) = 0 THEN []
         |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk FROM documents),
         |lined AS (SELECT doc_id,
         |    ['$LineHeader']
         |      || list_transform(range(0, len(tk), $LineTokens),
         |           g -> array_to_string(list_slice(tk, g + 1, g + $LineTokens), ' '))
         |      || ['$LineFooter' || source] AS ls
         |  FROM toks),
         |lines AS (SELECT doc_id, CAST(i AS BIGINT) AS line_no, ls[i + 1] AS line,
         |            ('0x' || substr(md5(ls[i + 1]), 1, 15))::BIGINT AS h
         |          FROM lined, unnest(range(0, len(ls))) AS t(i)),
         |df AS (SELECT h, COUNT(DISTINCT doc_id) AS df FROM lines GROUP BY 1),
         |mk AS (SELECT l.doc_id, l.line_no, l.line, (df.df > $LineMaxDf) AS hot
         |       FROM lines l JOIN df USING (h))
         |SELECT doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_lines,
         |  CAST(COUNT(*) FILTER (WHERE hot) AS BIGINT) AS n_removed,
         |  md5(COALESCE(string_agg(line, chr(10) ORDER BY line_no)
         |        FILTER (WHERE NOT hot), '')) AS clean_md5
         |FROM mk WHERE doc_id % 4 = 1
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Incremental ExactSubstr replay: base window-hash set (the store),
    // then the delta fold — stored hash removes every delta occurrence,
    // intra-delta keep-first by (id, pos) — then the same island union +
    // complement reassembly as q138, over the delta only.
    "q143_substr_delta" ->
      s"""WITH toks AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
         |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk
         |         FROM documents WHERE doc_id % 4 = 1),
         |btoks AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
         |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk
         |         FROM documents WHERE doc_id % 4 <> 1),
         |bwins AS (SELECT doc_id, tk, unnest(range(0, len(tk) - ${ExactSubstrL - 1})) AS pos
         |          FROM btoks WHERE len(tk) >= $ExactSubstrL),
         |bh AS (SELECT DISTINCT ('0x' || substr(md5(array_to_string(
         |        list_slice(tk, pos + 1, pos + $ExactSubstrL), ' ')), 1, 15))::BIGINT AS h
         |  FROM bwins),
         |wins AS (SELECT doc_id, tk, unnest(range(0, len(tk) - ${ExactSubstrL - 1})) AS pos
         |         FROM toks WHERE len(tk) >= $ExactSubstrL),
         |hashed AS (SELECT doc_id, pos,
         |    ('0x' || substr(md5(array_to_string(
         |        list_slice(tk, pos + 1, pos + $ExactSubstrL), ' ')), 1, 15))::BIGINT AS h
         |  FROM wins),
         |dups AS (SELECT doc_id, pos, pos + $ExactSubstrL AS e FROM (
         |    SELECT doc_id, pos, h,
         |           ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rnk
         |    FROM hashed) WHERE rnk > 1 OR h IN (SELECT h FROM bh)),
         |marked AS (SELECT doc_id, pos, e,
         |    MAX(e) OVER (PARTITION BY doc_id ORDER BY pos
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
         |  FROM dups),
         |isl AS (SELECT doc_id, pos, e,
         |    SUM(CASE WHEN pme IS NULL OR pos > pme THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |  FROM marked),
         |islands AS (SELECT doc_id, island, MIN(pos) AS rm_start, MAX(e) AS rm_end
         |            FROM isl GROUP BY 1, 2),
         |gaps AS (SELECT doc_id,
         |           COALESCE(LAG(rm_end) OVER (PARTITION BY doc_id ORDER BY rm_start), 0) AS s,
         |           rm_start AS e
         |         FROM islands
         |         UNION ALL
         |         SELECT i.doc_id, MAX(i.rm_end) AS s, ANY_VALUE(len(t.tk)) AS e
         |         FROM islands i JOIN toks t USING (doc_id) GROUP BY i.doc_id),
         |reb AS (SELECT g.doc_id,
         |          string_agg(array_to_string(list_slice(t.tk, g.s + 1, g.e), ' '),
         |                     ' ' ORDER BY g.s) AS text
         |        FROM gaps g JOIN toks t USING (doc_id) WHERE g.e > g.s GROUP BY g.doc_id),
         |rm AS (SELECT doc_id, CAST(SUM(rm_end - rm_start) AS BIGINT) AS n_removed
         |       FROM islands GROUP BY 1),
         |isldocs AS (SELECT DISTINCT doc_id FROM islands)
         |SELECT t.doc_id,
         |  CASE WHEN i.doc_id IS NOT NULL THEN COALESCE(r.text, '')
         |       ELSE array_to_string(t.tk, ' ') END AS text,
         |  COALESCE(rm.n_removed, 0) AS n_removed
         |FROM toks t LEFT JOIN isldocs i USING (doc_id)
         |LEFT JOIN reb r ON t.doc_id = r.doc_id
         |LEFT JOIN rm ON t.doc_id = rm.doc_id
         |ORDER BY t.doc_id""".stripMargin,

    // Attribution replay: shared-gram counts per (train, bench) pair,
    // argmax by (count desc, bench id).
    "q192_contamination_map" ->
      s"""WITH $ShingleCtes,
         |shd AS (SELECT doc_id, unnest(gs) AS g FROM shs),
         |shared AS (SELECT t.doc_id, b.doc_id AS bench_id,
         |             CAST(COUNT(*) AS BIGINT) AS n_shared
         |           FROM shd t JOIN shd b ON t.g = b.g
         |           WHERE t.doc_id % 17 <> 0 AND b.doc_id % 17 = 0
         |           GROUP BY 1, 2)
         |SELECT doc_id, bench_id, n_shared FROM (
         |  SELECT doc_id, bench_id, n_shared,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id
         |                       ORDER BY n_shared DESC, bench_id) AS rnk
         |  FROM shared) WHERE rnk = 1 ORDER BY doc_id""".stripMargin,

    // df-histogram replay: q160's lined corpus, per-hash document
    // frequency, then the exact (df → line count) histogram.
    "q193_line_df_hist" ->
      s"""WITH toks AS (SELECT doc_id, source, CASE WHEN length(trim(text)) = 0 THEN []
         |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk FROM documents),
         |lined AS (SELECT doc_id,
         |    ['$LineHeader']
         |      || list_transform(range(0, len(tk), $LineTokens),
         |           g -> array_to_string(list_slice(tk, g + 1, g + $LineTokens), ' '))
         |      || ['$LineFooter' || source] AS ls
         |  FROM toks),
         |lines AS (SELECT doc_id,
         |            ('0x' || substr(md5(ls[i + 1]), 1, 15))::BIGINT AS h
         |          FROM lined, unnest(range(0, len(ls))) AS t(i)),
         |df AS (SELECT h, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
         |       FROM lines GROUP BY 1)
         |SELECT doc_freq, CAST(COUNT(*) AS BIGINT) AS n_line_hashes
         |FROM df GROUP BY 1 ORDER BY 1""".stripMargin,

    // Ledger replay: the exact distinct side; the estimate rides only
    // through the asserted boolean (TRUE for every language, or the
    // engine-side comparison itself failed).
    "q191_hll_ledger" ->
      """SELECT lang, CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS exact_distinct,
        |       TRUE AS est_ok
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // Novelty replay: distinct doc shingles, first-occurrence min id per
    // gram, per-doc novel fraction.
    "q190_gram_novelty" ->
      s"""WITH $ShingleCtes,
         |shd AS (SELECT doc_id, unnest(gs) AS g FROM shs),
         |fo AS (SELECT g, MIN(doc_id) AS first_id FROM shd GROUP BY 1)
         |SELECT shd.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         |  ROUND(CAST(SUM(CASE WHEN fo.first_id = shd.doc_id THEN 1 ELSE 0 END)
         |          AS DOUBLE) / COUNT(*)::DOUBLE, 6) AS novel_frac
         |FROM shd JOIN fo USING (g)
         |GROUP BY shd.doc_id ORDER BY shd.doc_id""".stripMargin,

    // Overlap-matrix replay: distinct (digest, source), per-source digest
    // universes, digest-joined source pairs, shared / min-universe rate.
    "q189_source_overlap" ->
      s"""WITH ds AS (SELECT DISTINCT md5(text) AS digest, source FROM documents),
         |sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM ds GROUP BY 1),
         |pairs AS (SELECT a.source AS source_a, b.source AS source_b,
         |            CAST(COUNT(*) AS BIGINT) AS shared
         |          FROM ds a JOIN ds b ON a.digest = b.digest
         |            AND a.source < b.source
         |          GROUP BY 1, 2)
         |SELECT sa.source AS source_a, sb.source AS source_b,
         |  COALESCE(p.shared, 0) AS shared,
         |  ROUND(COALESCE(p.shared, 0)::DOUBLE / LEAST(sa.n, sb.n)::DOUBLE, 6)
         |    AS overlap
         |FROM sz sa JOIN sz sb ON sa.source < sb.source
         |LEFT JOIN pairs p ON p.source_a = sa.source AND p.source_b = sb.source
         |ORDER BY 1, 2""".stripMargin,

    // Ledger replay: the three stage id-sets as CTEs (length gate, digest
    // rank, benchmark shingle overlap), first-match CASE in declared order.
    "q185_rejection_ledger" ->
      s"""WITH toks AS (SELECT doc_id, text,
         |    CASE WHEN length(trim(text)) = 0 THEN []
         |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk
         |  FROM documents),
         |train AS (SELECT doc_id, text, tk FROM toks WHERE doc_id % 17 <> 0),
         |short AS (SELECT doc_id FROM train WHERE len(tk) < $LedgerMinWords),
         |dup AS (SELECT doc_id FROM (
         |    SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY md5(text)
         |                                      ORDER BY doc_id) AS rnk
         |    FROM train) WHERE rnk > 1),
         |shs AS (SELECT doc_id, list_distinct(list_transform(
         |    CASE WHEN len(tk) < $ShingleN THEN []
         |         ELSE list_transform(range(1, len(tk) - ${ShingleN - 2}),
         |                i -> array_to_string(list_slice(tk, i, i + ${ShingleN - 1}), ' ')) END,
         |    s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647)) AS gs
         |  FROM toks),
         |shd AS (SELECT doc_id, unnest(gs) AS g FROM shs),
         |bench AS (SELECT DISTINCT g FROM shd WHERE doc_id % 17 = 0),
         |cont AS (SELECT DISTINCT doc_id FROM shd JOIN bench USING (g)
         |         WHERE doc_id % 17 <> 0)
         |SELECT t.doc_id,
         |  CASE WHEN s.doc_id IS NOT NULL THEN 'too_short'
         |       WHEN d.doc_id IS NOT NULL THEN 'exact_dup'
         |       WHEN c.doc_id IS NOT NULL THEN 'contaminated'
         |       ELSE 'kept' END AS verdict
         |FROM train t
         |LEFT JOIN short s USING (doc_id)
         |LEFT JOIN dup d USING (doc_id)
         |LEFT JOIN cont c USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin,

    // Winnowing replay: packed-integer window minima (min hash, rightmost
    // tie via the position complement), shift/mask decode, distinct
    // fingerprint sets, degree cap, inverted-index pair counts.
    "q181_winnow_pairs" ->
      s"""WITH toks AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
         |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk
         |       FROM documents),
         |pos AS (SELECT doc_id, tk, unnest(range(0, len(tk) - ${WinnowK - 1})) AS pos
         |        FROM toks WHERE len(tk) >= $WinnowK),
         |hh AS (SELECT doc_id, pos,
         |         ('0x' || substr(md5(array_to_string(
         |             list_slice(tk, pos + 1, pos + $WinnowK), ' ')), 1, 10))::BIGINT
         |           * 1048576 + (1048575 - pos) AS combined
         |       FROM pos),
         |sel AS (SELECT doc_id, pos,
         |          MIN(combined) OVER (PARTITION BY doc_id ORDER BY pos
         |            ROWS BETWEEN ${WinnowWindow - 1} PRECEDING AND CURRENT ROW) AS s
         |        FROM hh),
         |fp AS (SELECT DISTINCT doc_id, s >> 20 AS h FROM sel
         |       WHERE pos >= ${WinnowWindow - 1}),
         |keep AS (SELECT h FROM fp GROUP BY h HAVING COUNT(*) <= $WinnowMaxDegree),
         |fpc AS (SELECT fp.doc_id, fp.h FROM fp JOIN keep USING (h)),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM fpc GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |            CAST(COUNT(*) AS BIGINT) AS shared
         |          FROM fpc a JOIN fpc b ON a.h = b.h AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT doc_a, doc_b, shared,
         |  ROUND(shared::DOUBLE / (sa.n + sb.n - shared)::DOUBLE, 6) AS jaccard
         |FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
         |WHERE shared >= $WinnowMinShared ORDER BY 1, 2""".stripMargin,

    "q20_jaccard_pairs" ->
      s"""WITH $ShingleCtes,
         |shd AS (SELECT doc_id, unnest(gs) AS g FROM shs),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |          FROM shd a JOIN shd b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |       ROUND(i::DOUBLE / (sa.n + sb.n - i)::DOUBLE, 6) AS jaccard
         |FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
         |WHERE i::DOUBLE / (sa.n + sb.n - i)::DOUBLE >= $JaccardThreshold
         |ORDER BY 1, 2""".stripMargin,

    "q202_containment" ->
      s"""WITH $ShingleCtes,
         |shd AS (SELECT doc_id, unnest(gs) AS g FROM shs),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |          FROM shd a JOIN shd b ON a.g = b.g AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |dirs AS (SELECT doc_a AS inner_id, doc_b AS outer_id,
         |           i::DOUBLE / sa.n::DOUBLE AS c
         |         FROM inter JOIN sz sa ON doc_a = sa.doc_id
         |         UNION ALL
         |         SELECT doc_b, doc_a, i::DOUBLE / sb.n::DOUBLE
         |         FROM inter JOIN sz sb ON doc_b = sb.doc_id)
         |SELECT inner_id, outer_id, ROUND(c, 6) AS containment
         |FROM dirs WHERE c >= $ContainThreshold
         |ORDER BY 1, 2""".stripMargin,

    // LSH-tune replay: the S-curve grid (feasibility on the 1e-6-rounded
    // probabilities), the statically-derived chosen split's band chain,
    // and the measured recall against the exact-Jaccard truth set. The
    // chosen (bands, rows) is recomputed at SQL-generation time with the
    // same closed form the engine runs — any drift fails the gate loudly.
    "q210_lsh_tune" -> {
      val divisors = (1 to NumPerms).filter(NumPerms % _ == 0)
      def rnd6(x: Double) = math.rint(x * 1e6) / 1e6
      val feasibleB = divisors.filter { b =>
        val r = NumPerms / b
        rnd6(1 - math.pow(1 - math.pow(JaccardThreshold, r), b)) >= LshMinCatch &&
          rnd6(1 - math.pow(1 - math.pow(LshNoiseSim, r), b)) <= LshMaxNoise
      }
      val cb = feasibleB.min
      val cr = NumPerms / cb
      s"""WITH $ShingleCtes,
         |grid AS (SELECT b, $NumPerms // b AS r
         |         FROM (VALUES ${divisors.map(d => s"($d)").mkString(", ")}) t(b)),
         |gp AS (SELECT b, r,
         |  ROUND(1 - power(1 - power($JaccardThreshold, r), b), 6) AS p_catch,
         |  ROUND(1 - power(1 - power($LshNoiseSim, r), b), 6) AS p_noise
         |  FROM grid),
         |gf AS (SELECT b, r, p_catch, p_noise,
         |  p_catch >= $LshMinCatch AND p_noise <= $LshMaxNoise AS feasible
         |  FROM gp),
         |sg2 AS (SELECT doc_id, list_transform(range(0, $NumPerms), i ->
         |    list_min(list_transform(gs,
         |      g -> (g * (i * 2 + 1) + (i + 1) * 1000003) % 2147483647))) AS sg
         |  FROM shs WHERE len(gs) > 0),
         |bd2 AS (SELECT doc_id, b,
         |    md5(array_to_string(list_slice(sg, b * $cr + 1, b * $cr + $cr), ':')) AS bk
         |  FROM sg2, unnest(range(0, $cb)) AS t(b)),
         |cd2 AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |        FROM bd2 a JOIN bd2 b
         |        ON a.b = b.b AND a.bk = b.bk AND a.doc_id < b.doc_id),
         |shd AS (SELECT doc_id, unnest(gs) AS g FROM shs),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |          FROM shd a JOIN shd b ON a.g = b.g AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |truth AS (SELECT doc_a, doc_b FROM inter
         |          JOIN sz sa ON doc_a = sa.doc_id
         |          JOIN sz sb ON doc_b = sb.doc_id
         |          WHERE i::DOUBLE / (sa.n + sb.n - i)::DOUBLE
         |                >= $JaccardThreshold),
         |hits AS (SELECT t.doc_a, t.doc_b FROM truth t
         |         WHERE EXISTS (SELECT 1 FROM cd2 c
         |                       WHERE c.doc_a = t.doc_a AND c.doc_b = t.doc_b)),
         |ms AS (SELECT (SELECT COUNT(*)::BIGINT FROM truth) AS mt,
         |              (SELECT COUNT(*)::BIGINT FROM hits) AS mh)
         |SELECT CAST(b AS BIGINT) AS bands, CAST(r AS BIGINT) AS rows_per_band,
         |  p_catch, p_noise, feasible, b = $cb AS chosen,
         |  CASE WHEN b = $cb THEN mt END AS n_true,
         |  CASE WHEN b = $cb THEN mh END AS n_hit,
         |  CASE WHEN b = $cb THEN ROUND(mh::DOUBLE / NULLIF(mt, 0), 6) END
         |    AS recall
         |FROM gf, ms ORDER BY bands""".stripMargin
    },

    "q21_minhash_lsh" ->
      s"""WITH $ShingleCtes,
         |$LshCandCtes
         |SELECT doc_a, doc_b,
         |  ROUND(len(list_filter(list_transform(range(1, ${NumPerms + 1}),
         |    i -> sa.sg[i] = sb.sg[i]), x -> x))::DOUBLE / $NumPerms.0, 6) AS est_sim
         |FROM cand JOIN sig sa ON doc_a = sa.doc_id JOIN sig sb ON doc_b = sb.doc_id
         |ORDER BY 1, 2""".stripMargin,

    // Keep-first incremental dedup: dup-of-base via cross-partition band
    // collisions + signature agreement; intra-delta components keep min
    // id (a component whose min id lost to the base loses every member
    // to one of the two rules).
    "q103_dedup_delta" ->
      s"""WITH RECURSIVE $ShingleCtes,
         |$SigBandCtes,
         |dvb AS (SELECT DISTINCT d.doc_id
         |        FROM bands d JOIN bands b
         |          ON d.b = b.b AND d.bk = b.bk
         |          AND d.doc_id % 4 = 1 AND b.doc_id % 4 <> 1
         |        JOIN sig sa ON sa.doc_id = d.doc_id
         |        JOIN sig sb ON sb.doc_id = b.doc_id
         |        WHERE ${estSimSql("sa", "sb")} >= $EstSimThreshold),
         |ipairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |           FROM bands a JOIN bands b
         |             ON a.b = b.b AND a.bk = b.bk AND a.doc_id < b.doc_id
         |             AND a.doc_id % 4 = 1 AND b.doc_id % 4 = 1),
         |itruth AS (SELECT doc_a, doc_b FROM ipairs
         |           JOIN sig sa ON doc_a = sa.doc_id
         |           JOIN sig sb ON doc_b = sb.doc_id
         |           WHERE ${estSimSql("sa", "sb")} >= $EstSimThreshold),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM itruth
         |          UNION ALL SELECT doc_b AS a, doc_a AS b FROM itruth),
         |reach(id, l) AS (
         |  SELECT DISTINCT a AS id, a AS l FROM edges
         |  UNION
         |  SELECT e.b AS id, r.l FROM reach r JOIN edges e ON e.a = r.id),
         |comp AS (SELECT id, MIN(l) AS component FROM reach GROUP BY id),
         |dropped AS (SELECT doc_id FROM dvb
         |            UNION SELECT id AS doc_id FROM comp WHERE id <> component)
         |SELECT doc_id FROM documents
         |WHERE doc_id % 4 = 1 AND doc_id NOT IN (SELECT doc_id FROM dropped)
         |ORDER BY doc_id""".stripMargin,

    "q51_neardup_clusters" ->
      s"""WITH RECURSIVE $ShingleCtes,
         |shd AS (SELECT doc_id, unnest(gs) AS g FROM shs),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |          FROM shd a JOIN shd b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |truth AS (SELECT doc_a, doc_b FROM inter
         |          JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
         |          WHERE i::DOUBLE / (sa.n + sb.n - i)::DOUBLE >= $JaccardThreshold),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM truth
         |          UNION ALL SELECT doc_b AS a, doc_a AS b FROM truth),
         |reach(id, l) AS (
         |  SELECT DISTINCT a AS id, a AS l FROM edges
         |  UNION
         |  SELECT e.b AS id, r.l FROM reach r JOIN edges e ON e.a = r.id)
         |SELECT id, MIN(l) AS component FROM reach GROUP BY id ORDER BY id""".stripMargin,

    "q54_dedup_survivors" ->
      s"""WITH RECURSIVE $ShingleCtes,
         |shd AS (SELECT doc_id, unnest(gs) AS g FROM shs),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |          FROM shd a JOIN shd b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |truth AS (SELECT doc_a, doc_b FROM inter
         |          JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
         |          WHERE i::DOUBLE / (sa.n + sb.n - i)::DOUBLE >= $JaccardThreshold),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM truth
         |          UNION ALL SELECT doc_b AS a, doc_a AS b FROM truth),
         |reach(id, l) AS (
         |  SELECT DISTINCT a AS id, a AS l FROM edges
         |  UNION
         |  SELECT e.b AS id, r.l FROM reach r JOIN edges e ON e.a = r.id),
         |comp AS (SELECT id, MIN(l) AS component FROM reach GROUP BY id),
         |$QualityCtes,
         |jq AS (SELECT c.id, c.component, q.q FROM comp c JOIN tq q ON c.id = q.doc_id),
         |rk AS (SELECT id, component, q,
         |         ROW_NUMBER() OVER (PARTITION BY component ORDER BY q DESC, id) AS rnk,
         |         COUNT(*) OVER (PARTITION BY component) AS n_members
         |       FROM jq)
         |SELECT component, id AS survivor_id, ROUND(q, 6) AS best_quality, n_members
         |FROM rk WHERE rnk = 1 ORDER BY component""".stripMargin,

    "q158_decontaminate_fuzzy" ->
      s"""WITH $ShingleCtes,
         |$SigBandCtes,
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM bands a JOIN bands b ON a.b = b.b AND a.bk = b.bk
         |         WHERE a.doc_id % 17 <> 0 AND b.doc_id % 17 = 0),
         |shd AS (SELECT doc_id, unnest(gs) AS g FROM shs),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY 1),
         |rint AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS i
         |         FROM cand c JOIN shd a ON c.doc_a = a.doc_id
         |         JOIN shd b ON c.doc_b = b.doc_id AND a.g = b.g
         |         GROUP BY 1, 2),
         |hits AS (SELECT doc_a, doc_b,
         |           i::DOUBLE / (sa.n + sb.n - i)::DOUBLE AS j
         |         FROM rint JOIN sz sa ON doc_a = sa.doc_id
         |         JOIN sz sb ON doc_b = sb.doc_id
         |         WHERE i::DOUBLE / (sa.n + sb.n - i)::DOUBLE >= $JaccardThreshold)
         |SELECT doc_a AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_bench_matches,
         |       ROUND(MAX(j), 6) AS max_jaccard
         |FROM hits GROUP BY 1 ORDER BY 1""".stripMargin,

    "q61_dedup_corpus_lsh" ->
      s"""WITH RECURSIVE $ShingleCtes,
         |$LshCandCtes,
         |shd AS (SELECT doc_id, unnest(gs) AS g FROM shs),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY 1),
         |rint AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS i
         |         FROM cand c JOIN shd a ON c.doc_a = a.doc_id
         |         JOIN shd b ON c.doc_b = b.doc_id AND a.g = b.g
         |         GROUP BY 1, 2),
         |rtruth AS (SELECT doc_a, doc_b FROM rint
         |           JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
         |           WHERE i::DOUBLE / (sa.n + sb.n - i)::DOUBLE >= $JaccardThreshold),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM rtruth
         |          UNION ALL SELECT doc_b AS a, doc_a AS b FROM rtruth),
         |reach(id, l) AS (
         |  SELECT DISTINCT a AS id, a AS l FROM edges
         |  UNION
         |  SELECT e.b AS id, r.l FROM reach r JOIN edges e ON e.a = r.id),
         |comp AS (SELECT id, MIN(l) AS component FROM reach GROUP BY id),
         |$QualityCtes,
         |jq AS (SELECT c.id, c.component, q.q FROM comp c JOIN tq q ON c.id = q.doc_id),
         |rk AS (SELECT id, component, q,
         |         ROW_NUMBER() OVER (PARTITION BY component ORDER BY q DESC, id) AS rnk
         |       FROM jq),
         |dropped AS (SELECT id FROM rk WHERE rnk > 1)
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM dropped)
         |ORDER BY doc_id""".stripMargin,

    "q58_dedup_corpus" ->
      s"""WITH RECURSIVE $ShingleCtes,
         |shd AS (SELECT doc_id, unnest(gs) AS g FROM shs),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |          FROM shd a JOIN shd b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |truth AS (SELECT doc_a, doc_b FROM inter
         |          JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
         |          WHERE i::DOUBLE / (sa.n + sb.n - i)::DOUBLE >= $JaccardThreshold),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM truth
         |          UNION ALL SELECT doc_b AS a, doc_a AS b FROM truth),
         |reach(id, l) AS (
         |  SELECT DISTINCT a AS id, a AS l FROM edges
         |  UNION
         |  SELECT e.b AS id, r.l FROM reach r JOIN edges e ON e.a = r.id),
         |comp AS (SELECT id, MIN(l) AS component FROM reach GROUP BY id),
         |$QualityCtes,
         |jq AS (SELECT c.id, c.component, q.q FROM comp c JOIN tq q ON c.id = q.doc_id),
         |rk AS (SELECT id, component, q,
         |         ROW_NUMBER() OVER (PARTITION BY component ORDER BY q DESC, id) AS rnk
         |       FROM jq),
         |dropped AS (SELECT id FROM rk WHERE rnk > 1)
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM dropped)
         |ORDER BY doc_id""".stripMargin,

    "q47_dedup_recall" ->
      s"""WITH $ShingleCtes,
         |$LshCandCtes,
         |shd AS (SELECT doc_id, unnest(gs) AS g FROM shs),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |          FROM shd a JOIN shd b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |truth AS (SELECT doc_a, doc_b FROM inter
         |          JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
         |          WHERE i::DOUBLE / (sa.n + sb.n - i)::DOUBLE >= $JaccardThreshold),
         |hits AS (SELECT t.doc_a, t.doc_b FROM truth t
         |         WHERE EXISTS (SELECT 1 FROM cand c
         |                       WHERE c.doc_a = t.doc_a AND c.doc_b = t.doc_b))
         |SELECT (SELECT COUNT(*) FROM truth) AS n_true,
         |       (SELECT COUNT(*) FROM cand) AS n_cand,
         |       (SELECT COUNT(*) FROM hits) AS n_hit,
         |       ROUND((SELECT COUNT(*) FROM hits)::DOUBLE
         |             / NULLIF((SELECT COUNT(*) FROM truth), 0), 6) AS recall""".stripMargin,

    "q22_simhash" ->
      """WITH toks AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
        |         ELSE list_distinct(regexp_split_to_array(trim(text), '\s+')) END AS tk
        |         FROM documents),
        |hs AS (SELECT doc_id, list_transform(tk,
        |         t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS ghs FROM toks)
        |SELECT doc_id, list_reduce(
        |  list_prepend(0::BIGINT, list_transform(range(0, 60), x -> x::BIGINT)),
        |  (acc, j) -> acc + CASE
        |    WHEN list_reduce(list_prepend(0::BIGINT, ghs),
        |           (a2, h) -> a2 + ((h >> j) & 1) * 2 - 1) > 0
        |    THEN (1::BIGINT << j) ELSE 0 END) AS sh
        |FROM hs ORDER BY doc_id""".stripMargin,

    "q83_dedup_corpus_simhash" ->
      s"""WITH RECURSIVE toks AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
         |         ELSE list_distinct(regexp_split_to_array(trim(text), '\\s+')) END AS tk
         |         FROM documents),
         |hs AS (SELECT doc_id, list_transform(tk,
         |         t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS ghs FROM toks),
         |sh AS (SELECT doc_id, list_reduce(
         |  list_prepend(0::BIGINT, list_transform(range(0, 60), x -> x::BIGINT)),
         |  (acc, j) -> acc + CASE
         |    WHEN list_reduce(list_prepend(0::BIGINT, ghs),
         |           (a2, h) -> a2 + ((h >> j) & 1) * 2 - 1) > 0
         |    THEN (1::BIGINT << j) ELSE 0 END) AS sh FROM hs),
         |bl AS (SELECT doc_id, b, (sh >> (12 * b)) & 4095 AS bk
         |       FROM sh, unnest(range(0, 5)) AS t(b)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM bl a JOIN bl b ON a.b = b.b AND a.bk = b.bk AND a.doc_id < b.doc_id),
         |truth AS (SELECT doc_a, doc_b FROM cand
         |          JOIN sh sa ON doc_a = sa.doc_id JOIN sh sb ON doc_b = sb.doc_id
         |          WHERE bit_count(xor(sa.sh, sb.sh)) <= $SimHashMaxDist),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM truth
         |          UNION ALL SELECT doc_b AS a, doc_a AS b FROM truth),
         |reach(id, l) AS (
         |  SELECT DISTINCT a AS id, a AS l FROM edges
         |  UNION
         |  SELECT e.b AS id, r.l FROM reach r JOIN edges e ON e.a = r.id),
         |comp AS (SELECT id, MIN(l) AS component FROM reach GROUP BY id),
         |$QualityCtes,
         |jq AS (SELECT c.id, c.component, q.q FROM comp c JOIN tq q ON c.id = q.doc_id),
         |rk AS (SELECT id, component, q,
         |         ROW_NUMBER() OVER (PARTITION BY component ORDER BY q DESC, id) AS rnk
         |       FROM jq),
         |dropped AS (SELECT id FROM rk WHERE rnk > 1)
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM dropped)
         |ORDER BY doc_id""".stripMargin,

    "q23_simhash_pairs" ->
      s"""WITH toks AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
         |         ELSE list_distinct(regexp_split_to_array(trim(text), '\\s+')) END AS tk
         |         FROM documents),
         |hs AS (SELECT doc_id, list_transform(tk,
         |         t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS ghs FROM toks),
         |sh AS (SELECT doc_id, list_reduce(
         |  list_prepend(0::BIGINT, list_transform(range(0, 60), x -> x::BIGINT)),
         |  (acc, j) -> acc + CASE
         |    WHEN list_reduce(list_prepend(0::BIGINT, ghs),
         |           (a2, h) -> a2 + ((h >> j) & 1) * 2 - 1) > 0
         |    THEN (1::BIGINT << j) ELSE 0 END) AS sh FROM hs),
         |bl AS (SELECT doc_id, b, (sh >> (12 * b)) & 4095 AS bk
         |       FROM sh, unnest(range(0, 5)) AS t(b)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM bl a JOIN bl b ON a.b = b.b AND a.bk = b.bk AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, bit_count(xor(sa.sh, sb.sh))::BIGINT AS dist
         |FROM cand JOIN sh sa ON doc_a = sa.doc_id JOIN sh sb ON doc_b = sb.doc_id
         |WHERE bit_count(xor(sa.sh, sb.sh)) <= $SimHashMaxDist
         |ORDER BY 1, 2""".stripMargin,

    "q24_embed_neardup" ->
      s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  ROUND(${cosSql("a.embedding", "b.embedding")}, 6) AS cos
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE ${cosSql("a.embedding", "b.embedding")} >= $CosineThreshold
         |ORDER BY 1, 2""".stripMargin,

    "q66_semantic_dedup" ->
      s"""WITH RECURSIVE cents AS (SELECT vec_id AS cent_id, embedding AS cent_emb
         |  FROM embeddings WHERE vec_id % $CentroidMod = 1),
         |ranks AS (SELECT e.vec_id, e.embedding, c.cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${cosSql("e.embedding", "c.cent_emb")} DESC NULLS LAST,
         |               c.cent_id) AS crnk
         |  FROM embeddings e CROSS JOIN cents c),
         |lists AS (SELECT cent_id, vec_id, embedding FROM ranks WHERE crnk = 1),
         |prs AS (SELECT a.vec_id AS va, b.vec_id AS vb
         |        FROM lists a JOIN lists b
         |          ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
         |        WHERE ${cosSql("a.embedding", "b.embedding")} >= $CosineThreshold),
         |edges AS (SELECT va AS a, vb AS b FROM prs
         |          UNION ALL SELECT vb AS a, va AS b FROM prs),
         |reach(id, l) AS (
         |  SELECT DISTINCT a AS id, a AS l FROM edges
         |  UNION
         |  SELECT e.b AS id, r.l FROM reach r JOIN edges e ON e.a = r.id),
         |comp AS (SELECT id, MIN(l) AS component FROM reach GROUP BY id),
         |dropped AS (SELECT id FROM comp WHERE id <> component)
         |SELECT vec_id FROM embeddings
         |WHERE vec_id NOT IN (SELECT id FROM dropped)
         |ORDER BY vec_id""".stripMargin,

    "q39_embed_neardup_srp" ->
      s"""WITH bk AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket
         |            FROM embeddings)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  ROUND(${cosSql("a.embedding", "b.embedding")}, 6) AS cos
         |FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE ${cosSql("a.embedding", "b.embedding")} >= $BlockedCosineThreshold
         |ORDER BY 1, 2""".stripMargin
  )
}
