package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.SimilaritySearch

/**
 * Approximate-nearest-neighbor queries over `embeddings` (EXT operators,
 * SURVEY §2.11): exact brute-force cosine top-k as the baseline, and
 * SRP-LSH (sign-random-projection) bucketed top-k as the scale path.
 * The fixed ±1 hyperplanes come from a seeded LCG shared with the oracle
 * SQL generator, so even the LSH buckets are exactly reproducible.
 */
object AnnQueries extends QueryPack {

  private val K = 5
  private val Planes = 8
  private val Dim = 64
  private val QueryMod = 50 // query set: vec_id % 50 == 0
  // Scale-invariant query panel: fixture scale-ups replicate the id space
  // in 10M-key strides (tools.ScaleData.Stride), so capping the panel
  // inside the first stride keeps the measured QUERY SET constant as the
  // corpus grows — recall/serving harnesses then scale with the corpus
  // only, not quadratically with corpus × panel (sf1 probe: q105's
  // ground-truth pass was 100 s cold uncapped). No-op at sf ≤ 0.1.
  private val QueryCap = 1000000L
  private val CentroidMod = 37 // IVF centroids: vec_id % 37 == 1
  private val NProbe = 2
  private val LloydIters = 3 // q101: refinement rounds
  private val PqM = 8 // PQ subspaces (64-dim → 8 × 8)
  private val HybridTerms = Seq("spark", "vector", "stream") // q128 keywords
  private val HybridQueryId = 0L // q128 dense query vector
  private val HybridTopL = 100 // q128 per-list cap
  private val HybridK = 20 // q128 fused output size
  private val ClusterQuota = 25 // q129 per-cluster keep
  private val OutlierSigma = 2.0 // q162 per-cluster fence width
  private val MmrCandidates = 20 // q135 bounded candidate list
  private val MmrK = 5 // q135 picks
  private val MmrLambda = 0.7 // q135 relevance/diversity balance
  private val NdcgK = 10 // q136 evaluation depth
  private val PcaRounds = 6 // q199 power-iteration steps
  private val BootReps = 200 // q212 bootstrap resamples
  private val BootMaxN = 1000 // q212 oracle's static panel cap (range bound)
  private val TextEncDim = graft.operators.TextEncode.HashDim // q178 width
  private val TextEncQueryMod = 97 // q178 query panel: doc_id % 97 == 0
  private val TuneMaxNProbe = 4 // q179 candidate grid: nprobe 1..4
  private val TuneTargetNum = 9 // q179 recall target 9/10, exact-integer
  private val TuneTargetDen = 10
  private val MarginK = 4 // q184 neighborhood size
  private val MarginThreshold = 1.0 // q184 mining cutoff
  private val TruncDims = Seq(8, 16, 32) // q186 prefix widths (of Dim 64)
  private val KCenterK = 5 // q188 coreset size

  /** One unrolled k-center greedy step for the q188 oracle: pick `i`
    * (the candidate with the SMALLEST rounded max-cosine to the running
    * selection `sel(i-1)`, id tiebreak). */
  private def kcStep(i: Int): String = {
    val prev = s"sel${i - 1}"
    s"""s$i AS (SELECT ${i}::BIGINT AS step, vec_id, mc AS max_cos FROM (
       |  SELECT c.vec_id,
       |    ROUND(MAX(${cosSql("c.embedding", "p.embedding")}), 6) AS mc
       |  FROM kcand c, kcand p
       |  WHERE p.vec_id IN (SELECT vec_id FROM $prev)
       |    AND c.vec_id NOT IN (SELECT vec_id FROM $prev)
       |  GROUP BY c.vec_id)
       |  ORDER BY mc ASC NULLS LAST, vec_id LIMIT 1),
       |sel$i AS (SELECT * FROM $prev UNION ALL
       |          SELECT step, vec_id, max_cos FROM s$i)""".stripMargin
  }

  /** One unrolled MMR greedy step for the q135 oracle: pick `i`, fed by
    * the running selection `sel(i-1)`. */
  private def mmrStep(i: Int): String = {
    val prev = s"sel${i - 1}"
    s"""s$i AS (SELECT ${i}::BIGINT AS step, vec_id, rel, mmr FROM (
       |  SELECT c.vec_id, c.rel,
       |    ROUND($MmrLambda * c.rel - ${1.0 - MmrLambda}
       |          * MAX(${cosSql("c.embedding", "p.embedding")}), 6) AS mmr
       |  FROM cand c, cand p
       |  WHERE p.vec_id IN (SELECT vec_id FROM $prev)
       |    AND c.vec_id NOT IN (SELECT vec_id FROM $prev)
       |  GROUP BY c.vec_id, c.rel)
       |  ORDER BY mmr DESC NULLS LAST, vec_id LIMIT 1),
       |sel$i AS (SELECT * FROM $prev UNION ALL
       |          SELECT step, vec_id, rel, mmr FROM s$i)""".stripMargin
  }
  private val PqCodeMod = 23 // PQ codewords: vec_id % 23 == 1

  private lazy val planes = SimilaritySearch.hyperplanes(Planes, Dim)

  private def embs(s: SparkSession, dir: String) = Tables.read(s, dir, "embeddings")
  private def querySet(s: SparkSession, dir: String) =
    embs(s, dir).where(col("vec_id") % QueryMod === 0 && col("vec_id") < QueryCap)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // EXT-A1: exact brute-force cosine top-k per query vector.
    "q25_ann_brute" -> ((s, dir) =>
      SimilaritySearch.bruteForceTopK(querySet(s, dir), embs(s, dir), K)
        .select(col("query_id"), col("vec_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("cos").desc_nulls_last, col("vec_id"))),

    // EXT-A27: text → vectors → top-k END-TO-END — the embedding
    // inference hook (TextEncode.encodeDocuments, the batched typed
    // partition face a real neural encoder plugs into) run with the
    // deterministic feature-hashing encoder, then exact cosine top-k
    // over the produced vectors. Bounded query panel (mod + stride cap),
    // so the chain is linear in the corpus.
    "q178_text_encode_ann" -> ((s, dir) => {
      val enc = graft.operators.TextEncode.encodeDocuments(
          Tables.read(s, dir, "documents"),
          graft.operators.TextEncode.hashingEncoder(TextEncDim))
        .toDF()
      val corpus = enc.select(col("doc_id").as("vec_id"), col("embedding"))
      val qs = corpus.where(col("vec_id") % TextEncQueryMod === 0 &&
        col("vec_id") < QueryCap)
      SimilaritySearch.bruteForceTopK(qs, corpus, K)
        .select(col("query_id"), col("vec_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("cos").desc_nulls_last, col("vec_id"))
    }),

    // EXT-A2: SRP-LSH bucketed approximate top-k (candidates share the
    // 8-bit sign bucket; exact cosine re-ranks inside the bucket).
    "q26_ann_lsh" -> ((s, dir) =>
      SimilaritySearch.lshTopK(querySet(s, dir), embs(s, dir), planes, K)
        .select(col("query_id"), col("vec_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("cos").desc_nulls_last, col("vec_id"))),

    // EXT-A3: IVF coarse-quantized approximate top-k (deterministic
    // centroid sample; inverted lists probed per query, exact re-rank).
    "q34_ann_ivf" -> ((s, dir) =>
      SimilaritySearch.ivfTopK(querySet(s, dir), embs(s, dir), CentroidMod, NProbe, K)
        .select(col("query_id"), col("vec_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("cos").desc_nulls_last, col("vec_id"))),

    // EXT-A3b: IVF with TRAINED centroids — one deterministic Lloyd
    // refinement (ordered fold means, float32-rounded) behind the same
    // probing dataflow; the oracle recomputes the training step too.
    "q40_ann_ivf_trained" -> ((s, dir) =>
      SimilaritySearch.ivfTopKFrom(
          SimilaritySearch.trainedCentroids(embs(s, dir), CentroidMod, Dim),
          querySet(s, dir), embs(s, dir), NProbe, K)
        .select(col("query_id"), col("vec_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("cos").desc_nulls_last, col("vec_id"))),

    // EXT-A3c: multi-iteration Lloyd — the q40 training step looped to 3
    // refinement rounds under the same ordered-fold determinism; every
    // round's centroids are bit-reproducible, so the oracle replays the
    // whole loop. Spec gates that centroid movement shrinks per round.
    "q101_ann_lloyd3" -> ((s, dir) =>
      SimilaritySearch.ivfTopKFrom(
          SimilaritySearch.trainedCentroids(embs(s, dir), CentroidMod, Dim, LloydIters),
          querySet(s, dir), embs(s, dir), NProbe, K)
        .select(col("query_id"), col("vec_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("cos").desc_nulls_last, col("vec_id"))),

    // EXT-A13: product-quantization serving — the corpus as an m-subspace
    // PQ index reconstructs it (deterministic sampled codebooks, nearest
    // codeword per subspace by squared L2), scored against exact queries;
    // recall@k per query vs the exact ground truth, the q94 pattern one
    // compression tier further (m bytes/vector vs 4·dim).
    "q99_ann_pq" -> ((s, dir) => {
      def ids(df: DataFrame) = df.select(col("query_id"), col("vec_id"))
      val bt = graft.core.Caches.cacheOnce( // shared ground truth: two join
        // branches here, and the identical panel across the recall queries
        ids(SimilaritySearch.bruteForceTopK(querySet(s, dir), embs(s, dir), K)))
      val pt = ids(SimilaritySearch.bruteForceTopK(
        querySet(s, dir), SimilaritySearch.pqRoundtrip(embs(s, dir), PqM, Dim, PqCodeMod), K))
      bt.join(pt.withColumn("hit", lit(1)), Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg(round(sum(coalesce(col("hit"), lit(0))).cast("double") / K, 6)
          .as("recall_pq"))
        .orderBy(col("query_id"))
    }),

    // EXT-A14: IVF-PQ composed persisted serving — the billion-vector
    // deployment shape: the persisted index holds m CODES per vector plus
    // shared codebooks (q99's compression) under inverted lists assigned
    // over the reconstruction (q97's stance: index what you serve);
    // queries rank against the stored centroids, only PROBED lists
    // decode, ADC scoring via the reconstruction. Served from the
    // versioned on-disk layout (`AnnStore.writeIvfPq`/`ivfPqTopK`) — the
    // full build → persist → serve round trip under one oracle.
    "q104_ann_ivf_pq" -> ((s, dir) => {
      val out = graft.core.Scratch.dir("graft_ivfpq")
      graft.store.AnnStore.writeIvfPq(embs(s, dir), PqM, Dim, PqCodeMod, CentroidMod, out,
        sampleFilter = col("vec_id") < QueryCap)
      graft.store.AnnStore.ivfPqTopK(s, out, querySet(s, dir), NProbe, K)
        .select(col("query_id"), col("vec_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("cos").desc_nulls_last, col("vec_id"))
    }),

    // EXT-A15: residual IVF-PQ vs raw IVF-PQ — the standard IVF-ADC
    // refinement: lists keyed by the RAW vector's nearest raw-sampled
    // centroid, PQ encoding the residual x − c(x) (codewords describe the
    // local displacement, not the coarse structure). Per-query recall@k
    // of both forms against the exact ground truth at equal m/nprobe —
    // the q41 pattern deciding whether the refinement pays.
    "q105_ann_pq_residual" -> ((s, dir) => {
      def ids(df: DataFrame) = df.select(col("query_id"), col("vec_id"))
      // index samples (codebooks, centroids) are bounded like the query
      // panel: fixed index parameters, not corpus fractions (no-op ≤ sf0.1)
      val capped = col("vec_id") < QueryCap
      val bt = graft.core.Caches.cacheOnce( // shared ground truth: two join
        // branches here, and the identical panel across the recall queries
        ids(SimilaritySearch.bruteForceTopK(querySet(s, dir), embs(s, dir), K)))
      val rec = graft.core.Caches.cacheOnce( // feeds the centroid sample AND serving
        SimilaritySearch.pqRoundtripFrom(embs(s, dir),
          SimilaritySearch.pqCodebooks(embs(s, dir).where(capped), PqM, Dim, PqCodeMod),
          PqM, Dim))
      val raw = ids(SimilaritySearch.ivfTopKFrom(
        SimilaritySearch.ivfCentroids(rec.where(capped), CentroidMod),
        querySet(s, dir), rec, NProbe, K))
      val res = ids(SimilaritySearch.ivfPqResidualTopK(querySet(s, dir),
        embs(s, dir), PqM, Dim, PqCodeMod, CentroidMod, NProbe, K,
        sampleFilter = capped))
      def recallOf(ann: DataFrame, name: String) = bt
        .join(ann.withColumn("hit", lit(1)), Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg(round(sum(coalesce(col("hit"), lit(0))).cast("double") / K, 6).as(name))
      recallOf(raw, "recall_pq_raw")
        .join(recallOf(res, "recall_pq_res"), Seq("query_id"))
        .orderBy(col("query_id"))
    }),

    // EXT-A17: residual IVF-PQ PERSISTED serving — EXT-A15's index in the
    // versioned store layout (raw centroids + residual codebooks + coded
    // lists carrying m codes and the reconstruction norm), the full
    // build → persist → serve round trip under one oracle — the q104
    // treatment for the residual form.
    "q107_ann_pq_res_store" -> ((s, dir) => {
      val out = graft.core.Scratch.dir("graft_ivfpqres")
      graft.store.AnnStore.writeIvfPqResidual(embs(s, dir), PqM, Dim, PqCodeMod,
        CentroidMod, out, sampleFilter = col("vec_id") < QueryCap)
      graft.store.AnnStore.ivfPqResidualTopK(s, out, querySet(s, dir), NProbe, K)
        .select(col("query_id"), col("vec_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("cos").desc_nulls_last, col("vec_id"))
    }),

    // EXT-A16: Lloyd-trained PQ codebooks — one deterministic per-subspace
    // refinement round of the sampled codewords (ordered fold-means under
    // a (sub_id, code_id) key — the q40 training step applied inside each
    // subspace), measured as per-query recall@k against the sampled-
    // codebook form (q99's metric) under one oracle that replays the
    // refinement.
    "q106_ann_pq_trained" -> ((s, dir) => {
      def ids(df: DataFrame) = df.select(col("query_id"), col("vec_id"))
      // seed codebooks bounded like the query panel (no-op ≤ sf0.1):
      // training assignment stays linear in the corpus
      val seeds = graft.core.Caches.cacheOnce(SimilaritySearch.pqCodebooks(
        embs(s, dir).where(col("vec_id") < QueryCap), PqM, Dim, PqCodeMod))
      val bt = graft.core.Caches.cacheOnce( // shared ground truth: two join
        // branches here, and the identical panel across the recall queries
        ids(SimilaritySearch.bruteForceTopK(querySet(s, dir), embs(s, dir), K)))
      val sampled = ids(SimilaritySearch.bruteForceTopK(querySet(s, dir),
        SimilaritySearch.pqRoundtripFrom(embs(s, dir), seeds, PqM, Dim), K))
      val trained = ids(SimilaritySearch.bruteForceTopK(querySet(s, dir),
        SimilaritySearch.pqRoundtripFrom(embs(s, dir),
          SimilaritySearch.trainedPqCodebooksFrom(embs(s, dir), seeds, PqM, Dim),
          PqM, Dim), K))
      def recallOf(ann: DataFrame, name: String) = bt
        .join(ann.withColumn("hit", lit(1)), Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg(round(sum(coalesce(col("hit"), lit(0))).cast("double") / K, 6).as(name))
      recallOf(sampled, "recall_pq")
        .join(recallOf(trained, "recall_pq_trained"), Seq("query_id"))
        .orderBy(col("query_id"))
    }),

    // EXT-A8: multi-probe SRP top-k — each query also probes its L
    // Hamming-1 neighbor buckets (one flipped hyperplane), the standard
    // LSH recall lever: near neighbors one unlucky plane away are
    // recovered with L tiny probe rows per query, corpus side untouched.
    "q59_ann_multiprobe" -> ((s, dir) =>
      SimilaritySearch.multiProbeTopK(querySet(s, dir), embs(s, dir), planes, K)
        .select(col("query_id"), col("vec_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("cos").desc_nulls_last, col("vec_id"))),

    // EXT-A7: persisted ANN index round-trip — build the SRP bucket table
    // and the IVF centroid/list tables in the store layout, then serve
    // BOTH top-k paths from the persisted parquet (no recompute of
    // buckets or assignments). Must hash-match q26/q34 computed fresh —
    // the ANN analogue of q46.
    "q55_ann_store_roundtrip" -> ((s, dir) => {
      val out = graft.core.Scratch.dir("graft_ann")
      val e = embs(s, dir)
      graft.store.AnnStore.writeSrp(e, planes, out)
      graft.store.AnnStore.writeIvf(e, SimilaritySearch.ivfCentroids(e, CentroidMod), out)
      val srp = graft.store.AnnStore.srpTopK(s, out, querySet(s, dir), K)
        .withColumn("method", lit("srp"))
      val ivf = graft.store.AnnStore.ivfTopK(s, out, querySet(s, dir), NProbe, K)
        .withColumn("method", lit("ivf"))
      srp.unionByName(ivf)
        .select(col("method"), col("query_id"), col("vec_id"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("method"), col("query_id"), col("cos").desc_nulls_last, col("vec_id"))
    }),

    // EXT-A28: serving-parameter auto-tune — recall@k measured per
    // candidate nprobe on the bounded query panel AGAINST the persisted
    // IVF index, then the cheapest candidate clearing the 9/10 target is
    // chosen by exact-integer comparison (no float thresholds anywhere
    // in the decision). One brute-truth pass + one maxNProbe probe join;
    // the per-candidate cuts reuse the cached scored table.
    "q179_ann_tune" -> ((s, dir) => {
      val out = graft.core.Scratch.dir("graft_ann_tune")
      val e = embs(s, dir)
      graft.store.AnnStore.writeIvf(e, SimilaritySearch.ivfCentroids(e, CentroidMod), out)
      graft.store.AnnStore.tuneNProbe(s, out, querySet(s, dir), K,
        TuneMaxNProbe, TuneTargetNum, TuneTargetDen)
    }),

    // EXT-A29: margin-based bitext mining (Artetxe & Schwenk) — parallel-
    // pair extraction from two unaligned corpora (even/odd vec_id halves
    // as src/tgt): SRP-bucket blocking for candidates, neighborhood-
    // normalized margin scoring with ORDERED-fold k-cosine means, best
    // target per source above the margin threshold.
    "q184_bitext_margin" -> ((s, dir) => {
      val e = embs(s, dir)
      SimilaritySearch.marginMinePairs(
          e.where(col("vec_id") % 2 === 0), e.where(col("vec_id") % 2 === 1),
          planes, MarginK, MarginThreshold)
        .orderBy(col("src_id"))
    }),

    // EXT-A36: sentence-granular bitext mining — q184's margin scoring
    // at the granularity production MT curation actually mines: the
    // planted corpus splits into sentences (TextFunctions.sentences,
    // the q234 rules), each sentence embeds via the deterministic
    // hashed-BoW encoder (the q178 inference hook), sides are even vs
    // odd documents, and the SRP-bucketed margin chain mines best
    // cross-side sentence pairs. Sentence id = doc_id·1000 + sent_no
    // (the plant yields ~a dozen sentences per document — far under
    // 1000 at any SF). End-to-end text → sentences → vectors → pairs
    // in one declarative plan.
    "q235_sentence_bitext" -> ((s, dir) => {
      val sents = TextQueries.sentencedDocs(s, dir)
      val enc = graft.operators.TextEncode.encodeDocuments(
          sents.select((col("doc_id") * 1000L + col("sent_no")).as("doc_id"),
            col("sentence").as("text")),
          graft.operators.TextEncode.hashingEncoder(TextEncDim))
        .toDF()
      val vecs = enc.select(col("doc_id").as("vec_id"), col("embedding"))
      def side(par: Int) = vecs.where(
        pmod(floor(col("vec_id") / 1000L).cast("long"), lit(2L)) === par)
      SimilaritySearch.marginMinePairs(side(0), side(1), sentPlanes,
          MarginK, MarginThreshold)
        .orderBy(col("src_id"))
    }),

    // EXT-A30: matryoshka truncation evaluation — recall@k of brute
    // serving under each PREFIX of the embedding (8/16/32 of 64 dims)
    // against the full-dim truth: the measured dims-vs-recall table
    // behind MRL-style serving, where shrinking the vector shrinks every
    // downstream kernel and shuffle by the same factor. Exact-integer
    // hits; one truth pass, one brute pass per candidate width over the
    // bounded panel.
    "q186_matryoshka_eval" -> ((s, dir) => {
      val e = embs(s, dir)
      val q = querySet(s, dir)
      val truth = graft.core.Caches.cacheOnce(
        SimilaritySearch.bruteForceTopK(q, e, K)
          .select(col("query_id"), col("vec_id")))
      val totalRow = broadcast(truth.agg(count(lit(1)).as("total")))
      TruncDims.map { m =>
        SimilaritySearch.bruteForceTopK(
            SimilaritySearch.prefixDims(q, m),
            SimilaritySearch.prefixDims(e, m), K)
          .select(col("query_id"), col("vec_id"))
          .join(truth, Seq("query_id", "vec_id"), "left_semi")
          .agg(count(lit(1)).as("hits"))
          .select(lit(m).as("m"), col("hits"))
      }.reduce(_ unionByName _)
        .crossJoin(totalRow)
        .select(col("m"), col("hits"), col("total"),
          round(col("hits").cast("double") / col("total").cast("double"), 6)
            .as("recall"))
        .orderBy(col("m"))
    }),

    // EXT-A31: greedy k-center coreset selection (farthest-point
    // traversal) over the bounded query panel — the pure-coverage dual
    // of q135's MMR: the k rows that best SPREAD over the panel, the
    // sampler that keeps a fine-tuning subset off the densest mode.
    // Driver sees one bounded row per round (the Lloyd pattern).
    "q188_kcenter_coreset" -> ((s, dir) =>
      SimilaritySearch.kCenterSelect(querySet(s, dir), KCenterK)
        .orderBy(col("step"))),

    // EXT-A9: incremental ANN index refresh — build the persisted index
    // over a base corpus (vec_id % 5 ≠ 3), then APPEND the delta
    // (vec_id % 5 = 3) assigned against the persisted planes/centroids;
    // serving the refreshed index must hash-match an index built over
    // base ∪ delta with the same centroid table. The ANN analogue of
    // q57: an ingest batch costs one pass over the delta, never a
    // corpus rebuild.
    "q75_ann_store_refresh" -> ((s, dir) => {
      val out = graft.core.Scratch.dir("graft_annref")
      val e = embs(s, dir)
      val base = e.where(col("vec_id") % 5 =!= 3)
      val delta = e.where(col("vec_id") % 5 === 3)
      graft.store.AnnStore.writeSrp(base, planes, out)
      graft.store.AnnStore.writeIvf(
        base, SimilaritySearch.ivfCentroids(base, CentroidMod), out)
      graft.store.AnnStore.appendSrp(delta, out)
      graft.store.AnnStore.appendIvf(delta, out)
      val srp = graft.store.AnnStore.srpTopK(s, out, querySet(s, dir), K)
        .withColumn("method", lit("srp"))
      val ivf = graft.store.AnnStore.ivfTopK(s, out, querySet(s, dir), NProbe, K)
        .withColumn("method", lit("ivf"))
      srp.unionByName(ivf)
        .select(col("method"), col("query_id"), col("vec_id"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("method"), col("query_id"), col("cos").desc_nulls_last, col("vec_id"))
    }),

    // EXT-A10: feature-wise embedding standardization — per-dimension
    // corpus mean/std (ONE posexplode pass, 64-row stats table), then
    // z-scores via a broadcast join; zero-variance dims map to 0. The
    // normalize-before-index step of an embedding pipeline: the stats
    // pass is a map-side-combinable agg keyed by dim, the apply pass is
    // map-only. Output pinned on a deterministic vec subset.
    "q78_embed_standardize" -> ((s, dir) => {
      val dims = embs(s, dir).select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim"),
          col("x").cast("double").as("x"))
      val stats = dims.groupBy(col("dim"))
        .agg(avg(col("x")).as("mu"), stddev_samp(col("x")).as("sd"))
      dims.where(col("vec_id") % 25 === 0)
        .join(broadcast(stats), Seq("dim"))
        .select(col("vec_id"), col("dim"),
          round(when(col("sd").isNull || col("sd") === 0.0, 0.0)
            .otherwise((col("x") - col("mu")) / col("sd")), 6).as("z"))
        .orderBy(col("vec_id"), col("dim"))
    }),

    // EXT-A11: int8-quantized serving recall — top-k over the
    // quantize→dequantize corpus (what an int8 index serves, 4× less
    // memory/IO) measured per query against the exact ground truth;
    // the q41 pattern for the quantization tier.
    "q94_ann_quantized" -> ((s, dir) => {
      def ids(df: DataFrame) = df.select(col("query_id"), col("vec_id"))
      val bt = graft.core.Caches.cacheOnce( // shared ground truth: two join
        // branches here, and the identical panel across the recall queries
        ids(SimilaritySearch.bruteForceTopK(querySet(s, dir), embs(s, dir), K)))
      val qt = ids(SimilaritySearch.bruteForceTopK(
        querySet(s, dir), SimilaritySearch.int8Roundtrip(embs(s, dir)), K))
      bt.join(qt.withColumn("hit", lit(1)), Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg(round(sum(coalesce(col("hit"), lit(0))).cast("double") / K, 6)
          .as("recall_q8"))
        .orderBy(col("query_id"))
    }),

    // EXT-A12: int8-quantized IVF — the realistic serving deployment:
    // inverted lists built over the quantize→dequantize corpus (what an
    // int8-backed index stores), probed and re-ranked entirely in the
    // quantized domain. Composes EXT-A11 × EXT-A3 under one oracle.
    "q97_ann_ivf_quantized" -> ((s, dir) => {
      val dq = SimilaritySearch.int8Roundtrip(embs(s, dir))
      SimilaritySearch.ivfTopK(querySet(s, dir), dq, CentroidMod, NProbe, K)
        .select(col("query_id"), col("vec_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("cos").desc_nulls_last, col("vec_id"))
    }),

    // EXT-A4: recall@k of the two approximate paths against the exact
    // brute-force ground truth, computed in-engine per query.
    "q41_ann_recall" -> ((s, dir) => {
      def ids(df: DataFrame) = df.select(col("query_id"), col("vec_id"))
      val bt = graft.core.Caches.cacheOnce( // shared ground truth: two join
        // branches here, and the identical panel across the recall queries
        ids(SimilaritySearch.bruteForceTopK(querySet(s, dir), embs(s, dir), K)))
      val lt = ids(SimilaritySearch.lshTopK(querySet(s, dir), embs(s, dir), planes, K))
      val it = ids(SimilaritySearch.ivfTopK(querySet(s, dir), embs(s, dir), CentroidMod, NProbe, K))
      def recallOf(ann: DataFrame, name: String) = bt
        .join(ann.withColumn("hit", lit(1)), Seq("query_id", "vec_id"), "left")
        .groupBy("query_id")
        .agg(round(sum(coalesce(col("hit"), lit(0))).cast("double") / K, 6).as(name))
      recallOf(lt, "recall_lsh")
        .join(recallOf(it, "recall_ivf"), Seq("query_id"))
        .orderBy(col("query_id"))
    }),

    // EXT-A18: Johnson–Lindenstrauss random projection (64 → 16 dims,
    // Achlioptas ±1 planes) with its distance-preservation witness over
    // the exact top-k panel: original vs reduced-space cosine per pair,
    // plus the panel-wide mean absolute error riding on every row (the
    // q41 pattern — the number that decides whether the 4× kernel/
    // shuffle saving is worth the rank noise). Projection is map-only
    // and codegen'd; at 100 TB it runs inside the scan stage and every
    // downstream shuffle carries K/dim of the bytes.
    "q123_rp_reduce" -> ((s, dir) => {
      val e = embs(s, dir)
      val red = e.select(col("vec_id"),
        SimilaritySearch.rpProject(col("embedding"), rpPlanes).as("remb"))
      val bt = SimilaritySearch.bruteForceTopK(querySet(s, dir), e, K)
      val rcos = SimilaritySearch.cosine(col("qr"), col("cr"))
      val withErr = bt
        .join(red.select(col("vec_id").as("query_id"), col("remb").as("qr")),
          Seq("query_id"))
        .join(red.select(col("vec_id"), col("remb").as("cr")), Seq("vec_id"))
        .select(col("query_id"), col("vec_id"),
          col("cos").as("c_orig"), rcos.as("c_rp"),
          abs(col("cos") - rcos).as("err"))
      val mean = withErr.agg(avg(col("err")).as("m"))
      withErr.crossJoin(broadcast(mean))
        .select(col("query_id"), col("vec_id"),
          round(col("c_orig"), 6).as("cos_orig"),
          round(col("c_rp"), 6).as("cos_rp"),
          round(col("err"), 6).as("abs_err"),
          round(col("m"), 6).as("mean_err"))
        .orderBy(col("query_id"), col("vec_id"))
    }),

    // EXT-A19: chunk→document embedding pooling — mean per dimension +
    // L2 normalization over synthetic 8-chunk documents (vec_id div 8),
    // the aggregation that turns encoder chunk output into the
    // document vectors retrieval and SemDeDup consume. Exploded to
    // (doc, dim, v) rows so the gate compares components exactly.
    "q124_embed_pool" -> ((s, dir) =>
      SimilaritySearch.meanPoolNormalized(
          embs(s, dir), expr(s"vec_id div $PoolChunks"))
        .select(col("grp").as("doc"), col("dim"), col("n_chunks"),
          round(col("v"), 6).as("v"))
        .orderBy(col("doc"), col("dim"))),

    // EXT-A20: hybrid retrieval — reciprocal-rank fusion of the sparse
    // BM25 list (keyword query) and the dense embedding list ("more like
    // doc 0" cosine ranks) per Cormack et al. 2009. Each list is capped
    // to its top-100 BEFORE fusing (TakeOrdered, no global sort
    // partition); ranks come from a broadcast theta self-join over the
    // bounded lists, never an unpartitioned window. Both lists rank AND
    // cut on their ROUNDED scores (bm25TopK rounds before its top-k;
    // the dense side uses the rounded-rank bruteForce variant) so even a
    // rounding collision straddling the top-L cut fuses identically in
    // both engines.
    "q128_hybrid_rrf" -> ((s, dir) => {
      val sparse = graft.operators.Retrieval
        .bm25TopK(Tables.read(s, dir, "documents"), HybridTerms, HybridTopL)
        .select(col("doc_id"), col("bm25").as("score"))
      val dense = SimilaritySearch
        .bruteForceTopKRounded(embs(s, dir).where(col("vec_id") === HybridQueryId),
          embs(s, dir), HybridTopL)
        .select(col("vec_id").as("doc_id"), col("cos").as("score"))
      graft.operators.Retrieval.rrfFuse(Seq(sparse, dense), HybridTopL, HybridK)
    }),

    // EXT-A21: cluster-balanced downsampling — every vector filed under
    // its nearest centroid (the IVF assignment the index already
    // computes), then a deterministic per-cluster keep of ≤ 25 (rank by
    // md5-derived id hash: reproducible, no RNG state). Dominant clusters
    // are capped, sparse clusters survive whole — the diversity-
    // preserving alternative to uniform corpus pruning.
    "q129_cluster_quota" -> ((s, dir) =>
      graft.operators.EmbeddingCuration.clusterBalancedSample(
          embs(s, dir), SimilaritySearch.ivfCentroids(embs(s, dir), CentroidMod),
          ClusterQuota)
        .select(col("cent_id"), col("vec_id"), col("rnk").cast("long").as("rnk"))
        .orderBy(col("cent_id"), col("vec_id"))),

    // EXT-A26: embedding outlier flags — cosine to own nearest centroid,
    // per-CLUSTER mean − 2σ fence (tight and diffuse clusters each get
    // their own); the noise/mislabel filter run before contrastive
    // training. Singleton clusters (NULL σ) are never outliers. The
    // centroid panel is BOUNDED (q105's stance: index parameters are
    // fixed, not corpus fractions — a no-op ≤ sf0.1; without it the
    // sf10 probe measured assignment going N·(N/37)).
    "q162_embed_outliers" -> ((s, dir) =>
      SimilaritySearch.centroidOutliers(embs(s, dir), CentroidMod, OutlierSigma,
          sampleFilter = Some(col("vec_id") < QueryCap))
        .orderBy(col("vec_id"))),

    // EXT-A22: contrastive hard-negative mining — per query, the top-5
    // most similar corpus vectors with a DIFFERENT label: the near-
    // boundary negatives contrastive training wants. Same broadcast-
    // panel + per-query-window shape as the exact ground truth.
    "q130_hard_negatives" -> ((s, dir) =>
      graft.operators.EmbeddingCuration.hardNegatives(
          querySet(s, dir), embs(s, dir), K)
        .select(col("query_id"), col("vec_id"), col("label"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("cos").desc_nulls_last, col("vec_id"))),

    // EXT-A23: kNN label evaluation — majority vote over each query's 5
    // exact nearest neighbors (ties → smallest label), reported as
    // per-true-label accuracy; the embedding-space sanity gate run
    // before vectors are trusted for retrieval or semantic dedup.
    "q131_knn_eval" -> ((s, dir) =>
      graft.operators.EmbeddingCuration.knnLabelEval(
          querySet(s, dir), embs(s, dir), K)
        .orderBy(col("label"))),

    // EXT-A24: MMR diversified reranking — greedy λ·rel − (1−λ)·max-sim
    // over the BOUNDED dense top-20 (diversification runs AFTER the
    // top-L cut, never against the corpus); each of the 5 steps is a
    // broadcast crossJoin over ≤ 20 rows + TakeOrdered(1), scores
    // rounded before every argmax so the greedy trajectory reproduces.
    "q135_mmr_rerank" -> ((s, dir) => {
      val cand = SimilaritySearch
        .bruteForceTopK(embs(s, dir).where(col("vec_id") === HybridQueryId),
          embs(s, dir), MmrCandidates)
        .select(col("vec_id"), round(col("cos"), 6).as("rel"))
      graft.operators.Retrieval.mmrDiversify(cand, embs(s, dir), MmrK, MmrLambda)
        .orderBy(col("step"))
    }),

    // EXT-A25: NDCG@10 ranking evaluation — the graded-relevance metric
    // deciding WHICH retriever serves, computed for the sparse, dense,
    // and RRF-fused rankers against term-overlap grades (0..3 query
    // terms present). Ranks ride the bounded theta join over capped
    // lists; the ideal head is one TakeOrdered over the relevance
    // projection — the metric touches corpus-sized data only there.
    "q136_ndcg_eval" -> ((s, dir) => {
      import graft.functions.TextFunctions.tokensWs
      val d = Tables.read(s, dir, "documents")
      val sparse = graft.operators.Retrieval
        .bm25TopK(d, HybridTerms, HybridTopL)
        .select(col("doc_id"), col("bm25").as("score"))
      val dense = SimilaritySearch
        .bruteForceTopKRounded(embs(s, dir).where(col("vec_id") === HybridQueryId),
          embs(s, dir), HybridTopL)
        .select(col("vec_id").as("doc_id"), col("cos").as("score"))
      val fused = graft.operators.Retrieval
        .rrfFuse(Seq(sparse, dense), HybridTopL, NdcgK)
        .select(col("doc_id"), col("rrf").as("score"))
      val rel = d.select(col("doc_id"),
        size(array_intersect(tokensWs(col("text")), typedlit(HybridTerms)))
          .as("rel"))
      graft.operators.Retrieval.ndcgAt(
          Seq("dense" -> dense, "fused" -> fused, "sparse" -> sparse),
          rel, NdcgK)
        .orderBy(col("list"))
    }),

    // EXT-A33: corpus covariance of the embedding column — the ONE pass
    // behind PCA/whitening/drift-axis analysis: a typed Aggregator folds
    // each vector into a d + d(d+1)/2 + 1 double buffer (map-side
    // partials, no shuffle key — partial aggregation IS the plan), and
    // the d×d summary is driver-side from there. Entries round 1e-9 —
    // the contract every derived face (q199) builds on.
    "q198_embed_cov" -> ((s, dir) =>
      graft.operators.Pca.covarianceLong(embs(s, dir), "embedding", Dim)
        .orderBy(col("dim_i"), col("dim_j"))),

    // EXT-A34: dominant principal axis by power iteration — the
    // trajectory (v, λ) over PcaRounds steps on q198's rounded
    // covariance, each round 1e-9-rounded so the whole chain replays in
    // unrolled oracle SQL (the q137 driver-loop convention; the full
    // Jacobi basis is spec-gated in PcaSpec against this λ).
    "q199_pca_power" -> ((s, dir) => {
      val (_, _, cov) = graft.operators.Pca.moments(embs(s, dir), "embedding", Dim)
      graft.operators.Pca.powerIteration(s, cov, PcaRounds)
        .orderBy(col("round"), col("dim"))
    }),

    // EXT-A35: persisted moment ledger — INCREMENTAL PCA: raw moments
    // are additive, so each embedding delta folds as one kilobyte row
    // under the marker-last protocol and the served covariance equals
    // the one-shot q198 matrix (the oracle IS q198's SQL — base ∪ delta
    // = the whole corpus). The fourth mergeable ledger.
    // EXT-T67: exact paired sign test over q41's per-query recalls — the
    // "is LSH actually better than IVF here, or is the panel too small
    // to tell" number every system comparison needs: strict wins each
    // way (ties drop), exact two-sided binomial p-value from a BigInt
    // Pascal recurrence on the panel-bounded win counts.
    "q211_sign_test" -> ((s, dir) => {
      def ids(df: DataFrame) = df.select(col("query_id"), col("vec_id"))
      val bt = graft.core.Caches.cacheOnce(
        ids(SimilaritySearch.bruteForceTopK(querySet(s, dir), embs(s, dir), K)))
      val lt = ids(SimilaritySearch.lshTopK(querySet(s, dir), embs(s, dir), planes, K))
      val it = ids(SimilaritySearch.ivfTopK(querySet(s, dir), embs(s, dir), CentroidMod, NProbe, K))
      def recallOf(ann: DataFrame, name: String) = bt
        .join(ann.withColumn("hit", lit(1)), Seq("query_id", "vec_id"), "left")
        .groupBy("query_id")
        .agg(round(sum(coalesce(col("hit"), lit(0))).cast("double") / K, 6).as(name))
      graft.operators.EvalMetrics.pairedSignTest(
        recallOf(lt, "recall_lsh").join(recallOf(it, "recall_ivf"), Seq("query_id")),
        "recall_lsh", "recall_ivf")
    }),

    // EXT-T71: deterministic paired permutation test — the magnitude-
    // aware complement of q211's sign test on the same LSH-vs-IVF recall
    // panel: keyed-hash sign flips of the per-query differences (no RNG
    // state), add-one-smoothed two-sided tail. The panel is bounded;
    // the reps × n flip table stays relational.
    "q217_perm_test" -> ((s, dir) => {
      def ids(df: DataFrame) = df.select(col("query_id"), col("vec_id"))
      val bt = graft.core.Caches.cacheOnce(
        ids(SimilaritySearch.bruteForceTopK(querySet(s, dir), embs(s, dir), K)))
      val lt = ids(SimilaritySearch.lshTopK(querySet(s, dir), embs(s, dir), planes, K))
      val it = ids(SimilaritySearch.ivfTopK(querySet(s, dir), embs(s, dir),
        CentroidMod, NProbe, K))
      def recallOf(t: DataFrame, name: String) = bt
        .join(t.withColumn("hit", lit(1)), Seq("query_id", "vec_id"), "left")
        .groupBy("query_id")
        .agg(round(sum(coalesce(col("hit"), lit(0))).cast("double") / K, 6).as(name))
      graft.operators.EvalMetrics.pairedPermTest(
        recallOf(lt, "recall_lsh").join(recallOf(it, "recall_ivf"), Seq("query_id")),
        "query_id", "recall_lsh", "recall_ivf", BootReps, maxN = BootMaxN)
    }),

    // EXT-T68: deterministic bootstrap CI — the error bar the q41 point
    // estimate should ship with: hash-indexed resamples (no RNG state),
    // percentile CI over 1e-9-rounded resample means. The panel is
    // bounded; the reps × n draw table stays relational.
    "q212_bootstrap_ci" -> ((s, dir) => {
      def ids(df: DataFrame) = df.select(col("query_id"), col("vec_id"))
      val bt = graft.core.Caches.cacheOnce(
        ids(SimilaritySearch.bruteForceTopK(querySet(s, dir), embs(s, dir), K)))
      val lt = ids(SimilaritySearch.lshTopK(querySet(s, dir), embs(s, dir), planes, K))
      val rec = bt
        .join(lt.withColumn("hit", lit(1)), Seq("query_id", "vec_id"), "left")
        .groupBy("query_id")
        .agg(round(sum(coalesce(col("hit"), lit(0))).cast("double") / K, 6)
          .as("recall_lsh"))
      // maxN = BootMaxN: the oracle's draw table is statically bounded at
      // BootReps × BootMaxN rows, so a larger panel must fail loudly here
      // rather than silently lose draws on the oracle side.
      graft.operators.EvalMetrics.bootstrapCi(rec, "query_id", "recall_lsh",
        BootReps, maxN = BootMaxN)
    }),

    "q209_moments_ledger" -> ((s, dir) => {
      import graft.store.MomentsLedger
      val store = graft.core.Scratch.dir("graft_momledger")
      val e = embs(s, dir)
      MomentsLedger.write(e.where(col("vec_id") % 3 =!= 0), store,
        "embedding", Dim)
      MomentsLedger.append(e.where(col("vec_id") % 3 === 0), store,
        "embedding", Dim, Some("d1"))
      MomentsLedger.covarianceLong(s, store, Dim)
        .orderBy(col("dim_i"), col("dim_j"))
    })
  )

  /** JL projection planes: 16 of them over Dim, seeded apart from the
    * SRP bucketing family. */
  private lazy val rpPlanes = SimilaritySearch.hyperplanes(16, Dim, seed = 7L)

  /** q124: chunks per pooled document (vec_id div 8 → ~8-chunk docs). */
  private val PoolChunks = 8

  // DuckDB mirrors -----------------------------------------------------------

  /** Shared covariance oracle chain, ending in `cvu(di, dj, nb, cov)` —
    * the q198 one-pass moments replayed relationally (dimension-exploded
    * sums + pair products), entries 1e-9-rounded exactly as
    * `Pca.moments` rounds them; q199's power iteration builds on it. */
  private lazy val covCtes: String =
    s"""cvv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
       |        FROM embeddings WHERE embedding IS NOT NULL),
       |cvn AS (SELECT count(*)::DOUBLE AS nd, count(*)::BIGINT AS nb FROM cvv),
       |cvx AS (SELECT vec_id, i, e[i] AS xi FROM cvv, range(1, ${Dim + 1}) t(i)),
       |cvs AS (SELECT i, SUM(xi) AS sx FROM cvx GROUP BY 1),
       |cvp AS (SELECT a.i AS di, b.i AS dj, SUM(a.xi * b.xi) AS sp
       |        FROM cvx a JOIN cvx b ON a.vec_id = b.vec_id AND a.i <= b.i
       |        GROUP BY 1, 2),
       |cvu AS (SELECT di, dj, nb,
       |          ROUND((sp - sa.sx * sb.sx / cvn.nd) / (cvn.nd - 1.0), 9) AS cov
       |        FROM cvp JOIN cvs sa ON cvp.di = sa.i
       |        JOIN cvs sb ON cvp.dj = sb.i CROSS JOIN cvn)""".stripMargin

  /** One unrolled power-iteration round for the q199 oracle: A·v under
    * v(r−1), λ = ‖A·v‖₂ rounded 1e-9, v(r) = A·v/λ rounded 1e-9. */
  // MATERIALIZED: pa/pl/pv each reference the previous round's CTEs more
  // than once and DuckDB inlines non-materialized CTEs per reference —
  // the unrolled power iteration otherwise re-evaluates exponentially
  // (q199 OOM'd at an 8 GB cap on a Dim×Dim table; same fix as the
  // Bradley–Terry rounds).
  private def pcaRoundCte(r: Int): String =
    s"""pa$r AS MATERIALIZED (SELECT c.di AS dim, SUM(c.cov * v.v) AS av
       |         FROM cvf c JOIN pv${r - 1} v ON c.dj = v.dim GROUP BY 1),
       |pl$r AS MATERIALIZED (SELECT ROUND(sqrt(SUM(av * av)), 9) AS lam FROM pa$r),
       |pv$r AS MATERIALIZED (SELECT dim, ROUND(av / lam, 9) AS v FROM pa$r, pl$r)""".stripMargin

  private def cosSql(a: String, b: String) =
    s"""(list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1),
       |    i -> $a[i]::DOUBLE * $b[i]::DOUBLE)), (x, y) -> x + y)
       | / (sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1),
       |      i -> $a[i]::DOUBLE * $a[i]::DOUBLE)), (x, y) -> x + y))
       |  * sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len($b) + 1),
       |      i -> $b[i]::DOUBLE * $b[i]::DOUBLE)), (x, y) -> x + y))))""".stripMargin

  /** The hyperplane matrix as a DuckDB nested-list literal. */
  private lazy val planesSql: String =
    planes.map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")

  /** Sentence-tier SRP planes: the q235 hashed-BoW vectors are
    * TextEncDim-wide, so they get their own plane family. */
  private lazy val sentPlanes =
    SimilaritySearch.hyperplanes(Planes, TextEncDim)

  private lazy val sentPlanesSql: String =
    sentPlanes.map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")

  /** The JL projection planes as a DuckDB nested-list literal. */
  private lazy val rpPlanesSql: String =
    rpPlanes.map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")

  /** SRP bucket of embedding column `e` (mirrors SimilaritySearch.srpBucket:
    * bit j set iff fold-dot(e, plane_j) > 0). */
  private def bucketSql(e: String) = bucketSqlOver(e, planesSql)

  /** The same SRP bucket against an explicit hyperplane literal (the
    * sentence tier hashes 16-dim BoW vectors, not the 64-dim corpus). */
  private def bucketSqlOver(e: String, planesLit: String) =
    s"""list_reduce(list_prepend(0::BIGINT, list_transform(range(0, $Planes), x -> x::BIGINT)),
       |  (acc, j) -> acc + CASE WHEN
       |    list_reduce(list_prepend(0.0, list_transform(range(1, len($e) + 1),
       |      i -> $e[i]::DOUBLE * (($planesLit)[j + 1][i])::DOUBLE)), (x, y) -> x + y) > 0.0
       |  THEN (1::BIGINT << j) ELSE 0 END)""".stripMargin

  /** `rounds` deterministic Lloyd refinements of the sampled seeds
    * (mirrors SimilaritySearch.trainedCentroids): per round, assignment
    * by cosine rank against the previous round's centroids, then ordered
    * fold-mean per cluster, float32-rounded. Ends with CTE `tc`. */
  private def trainedCentsCtes(rounds: Int): String = {
    val sb = new StringBuilder(
      s"""seeds AS (SELECT vec_id AS cent_id, embedding AS cent_emb
         |          FROM embeddings WHERE vec_id % $CentroidMod = 1)""".stripMargin)
    var prev = "seeds"
    for (r <- 1 to rounds) {
      sb ++= s""",
         |ar$r AS (SELECT e.vec_id, e.embedding, c.cent_id,
         |         ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |           ORDER BY ${cosSql("e.embedding", "c.cent_emb")} DESC NULLS LAST,
         |                    c.cent_id) AS crnk
         |       FROM embeddings e CROSS JOIN $prev c),
         |asg$r AS (SELECT cent_id, vec_id, embedding FROM ar$r WHERE crnk = 1),
         |tcs$r AS (SELECT cent_id, list(embedding ORDER BY vec_id) AS vs, COUNT(*) AS n
         |        FROM asg$r GROUP BY 1),
         |tcm$r AS (SELECT cent_id, list_transform(
         |         list_reduce(
         |           list_prepend(list_transform(range(1, ${Dim + 1}), i -> 0.0), vs),
         |           (acc, v) -> list_transform(range(1, ${Dim + 1}), i -> acc[i] + v[i]::DOUBLE)),
         |         x -> (x / n)::REAL) AS cent_emb FROM tcs$r)""".stripMargin
      prev = s"tcm$r"
    }
    sb ++= s""",
       |tc AS (SELECT cent_id, cent_emb FROM $prev)""".stripMargin
    sb.toString
  }

  private lazy val TrainedCentsCtes = trainedCentsCtes(1)

  private def foldDotSql(x: String, y: String) =
    s"""list_reduce(list_prepend(0.0, list_transform(range(1, len($x) + 1),
       |    i -> $x[i]::DOUBLE * $y[i]::DOUBLE)), (p, q) -> p + q)""".stripMargin
  private def d2Sql(a: String, b: String) =
    s"(${foldDotSql(a, a)} - 2 * ${foldDotSql(a, b)} + ${foldDotSql(b, b)})"

  /** PQ CTE chain (mirrors pqCodebooks → pqEncode → pqRoundtrip) over
    * source CTE/table `src`, names prefixed `p`: sampled codewords
    * `<p>cw`, per-vector subspace slices `<p>cs`, nearest-codeword
    * encodings `<p>enc` (squared L2, tie on code_id), and the
    * reconstructed corpus `<p>rec`. Used by q99/q104 (over `embeddings`)
    * and q105 (over the residual corpus). */
  private def pqCtesFrom(src: String, p: String,
                         cwCap: Option[Long] = None): String = {
    val sd = Dim / PqM
    val capSql = cwCap.map(c => s" AND s.vec_id < $c").getOrElse("")
    s"""${p}cw AS (SELECT t.j AS sub_id, s.vec_id AS code_id,
       |         list_transform(range(t.j * $sd + 1, t.j * $sd + ${sd + 1}),
       |                        i -> s.embedding[i]) AS code_emb
       |       FROM $src s, unnest(range(0, $PqM)) AS t(j)
       |       WHERE s.vec_id % $PqCodeMod = 1$capSql),
       |${p}cs AS (SELECT e.vec_id, t.j AS sub_id,
       |         list_transform(range(t.j * $sd + 1, t.j * $sd + ${sd + 1}),
       |                        i -> e.embedding[i]) AS sub_emb
       |       FROM $src e, unnest(range(0, $PqM)) AS t(j)),
       |${p}enc AS (SELECT vec_id, sub_id, code_id FROM (
       |          SELECT c.vec_id, c.sub_id, w.code_id,
       |            ROW_NUMBER() OVER (PARTITION BY c.vec_id, c.sub_id
       |              ORDER BY ${d2Sql("c.sub_emb", "w.code_emb")} ASC,
       |                       w.code_id) AS crnk
       |          FROM ${p}cs c JOIN ${p}cw w ON c.sub_id = w.sub_id) WHERE crnk = 1),
       |${p}rec AS (SELECT e.vec_id,
       |          flatten(list(w.code_emb ORDER BY e.sub_id)) AS embedding
       |        FROM ${p}enc e JOIN ${p}cw w
       |          ON e.sub_id = w.sub_id AND e.code_id = w.code_id
       |        GROUP BY 1)""".stripMargin
  }

  private lazy val PqRecCtes: String = pqCtesFrom("embeddings", "")

  /** Residual IVF-PQ serving chain (mirrors `ivfPqResidualIndex` /
    * `ivfPqResidualServe` over the capped samples): raw-sampled
    * centroids `rcents` → raw assignment `rasg` → residuals → PQ
    * encode/decode (`rcw`..`rrec`) → reconstruction `serve` → probes →
    * scored candidates `rscored`. Shared by q105 (recall form) and
    * q107 (persisted-serving form). */
  private lazy val ResidualServeCtes: String =
    s"""rcents AS (SELECT vec_id AS cent_id, embedding AS cent_emb
         |           FROM embeddings
         |           WHERE vec_id % $CentroidMod = 1 AND vec_id < $QueryCap),
         |rranks AS (SELECT e.vec_id, e.embedding, c.cent_id,
         |             ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |               ORDER BY ${cosSql("e.embedding", "c.cent_emb")} DESC NULLS LAST,
         |                        c.cent_id) AS crnk
         |           FROM embeddings e CROSS JOIN rcents c),
         |rasg AS (SELECT cent_id, vec_id, embedding FROM rranks WHERE crnk = 1),
         |resid AS (SELECT a.vec_id,
         |            list_transform(range(1, ${Dim + 1}),
         |              i -> (a.embedding[i]::DOUBLE - c.cent_emb[i]::DOUBLE)::REAL)
         |              AS embedding
         |          FROM rasg a JOIN rcents c ON a.cent_id = c.cent_id),
         |${pqCtesFrom("resid", "r", Some(QueryCap))},
         |serve AS (SELECT a.cent_id, r.vec_id,
         |            list_transform(range(1, ${Dim + 1}),
         |              i -> (r.embedding[i]::DOUBLE + c.cent_emb[i]::DOUBLE)::REAL)
         |              AS embedding
         |          FROM rrec r JOIN rasg a ON r.vec_id = a.vec_id
         |          JOIN rcents c ON a.cent_id = c.cent_id),
         |rqprobes AS (SELECT query_id, q_emb, cent_id FROM (
         |               SELECT q2.vec_id AS query_id, q2.embedding AS q_emb, c.cent_id,
         |                 ROW_NUMBER() OVER (PARTITION BY q2.vec_id
         |                   ORDER BY ${cosSql("q2.embedding", "c.cent_emb")} DESC NULLS LAST,
         |                            c.cent_id) AS crnk
         |               FROM embeddings q2 CROSS JOIN rcents c
         |               WHERE q2.vec_id % $QueryMod = 0 AND q2.vec_id < $QueryCap) WHERE crnk <= $NProbe),
         |rscored AS (SELECT p.query_id, l.vec_id,
         |              ${cosSql("p.q_emb", "l.embedding")} AS cos
         |            FROM serve l JOIN rqprobes p ON l.cent_id = p.cent_id
         |            WHERE l.vec_id <> p.query_id)""".stripMargin


  /** q41's per-query recall chain (brute-force truth, SRP-LSH, IVF),
    * ending in `rl(query_id, recall_lsh)` / `ri(query_id, recall_ivf)` —
    * shared by the recall report (q41) and the sign test (q211). */
  private lazy val annRecallCtes: String =
    s"""q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
         |           WHERE vec_id % $QueryMod = 0 AND vec_id < $QueryCap),
         |bscored AS (SELECT q.query_id, c.vec_id, ${cosSql("q.q_emb", "c.embedding")} AS cos
         |            FROM embeddings c CROSS JOIN q WHERE c.vec_id <> q.query_id),
         |bt AS MATERIALIZED (SELECT query_id, vec_id FROM (
         |         SELECT query_id, vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY query_id
         |                              ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |         FROM bscored) WHERE rnk <= $K),
         |bk AS MATERIALIZED (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket
         |       FROM embeddings),
         |lq AS (SELECT vec_id AS query_id, embedding AS q_emb, bucket FROM bk
         |       WHERE vec_id % $QueryMod = 0 AND vec_id < $QueryCap),
         |lscored AS (SELECT lq.query_id, c.vec_id, ${cosSql("lq.q_emb", "c.embedding")} AS cos
         |            FROM bk c JOIN lq ON c.bucket = lq.bucket WHERE c.vec_id <> lq.query_id),
         |lt AS (SELECT query_id, vec_id FROM (
         |         SELECT query_id, vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY query_id
         |                              ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |         FROM lscored) WHERE rnk <= $K),
         |cents AS (SELECT vec_id AS cent_id, embedding AS cent_emb
         |          FROM embeddings WHERE vec_id % $CentroidMod = 1),
         |ranks AS MATERIALIZED (SELECT e.vec_id, e.embedding, c.cent_id,
         |            ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |              ORDER BY ${cosSql("e.embedding", "c.cent_emb")} DESC NULLS LAST,
         |                       c.cent_id) AS crnk
         |          FROM embeddings e CROSS JOIN cents c),
         |lists AS (SELECT cent_id, vec_id, embedding FROM ranks WHERE crnk = 1),
         |probes AS (SELECT vec_id AS query_id, embedding AS q_emb, cent_id
         |           FROM ranks WHERE vec_id % $QueryMod = 0 AND vec_id < $QueryCap AND crnk <= $NProbe),
         |iscored AS (SELECT p.query_id, l.vec_id, ${cosSql("p.q_emb", "l.embedding")} AS cos
         |            FROM lists l JOIN probes p ON l.cent_id = p.cent_id
         |            WHERE l.vec_id <> p.query_id),
         |it AS (SELECT query_id, vec_id FROM (
         |         SELECT query_id, vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY query_id
         |                              ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |         FROM iscored) WHERE rnk <= $K),
         |rl AS (SELECT b.query_id, ROUND(COUNT(l.vec_id)::DOUBLE / $K, 6) AS recall_lsh
         |       FROM bt b LEFT JOIN lt l
         |         ON b.query_id = l.query_id AND b.vec_id = l.vec_id GROUP BY 1),
         |ri AS (SELECT b.query_id, ROUND(COUNT(i.vec_id)::DOUBLE / $K, 6) AS recall_ivf
         |       FROM bt b LEFT JOIN it i
         |         ON b.query_id = i.query_id AND b.vec_id = i.vec_id GROUP BY 1)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q136_ndcg_eval" -> {
      val gain = (relExpr: String, rankExpr: String) =>
        s"(pow(2, $relExpr) - 1) / (ln($rankExpr + 1.0) / ln(2))"
      s"""WITH tk AS (SELECT doc_id,
         |  CASE WHEN length(trim(text)) = 0 THEN []
         |       ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk
         |  FROM documents),
         |dl AS (SELECT doc_id, len(tk)::DOUBLE AS dl FROM tk),
         |stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
         |tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
         |       FROM (SELECT doc_id, unnest(tk) AS term FROM tk)
         |       WHERE term IN (${HybridTerms.map(t => s"'$t'").mkString(", ")})
         |       GROUP BY 1, 2),
         |df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tf GROUP BY 1),
         |bm AS (SELECT doc_id,
         |         ROUND(SUM(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
         |               * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6)
         |           AS score
         |       FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
         |       GROUP BY doc_id),
         |sr AS (SELECT doc_id,
         |         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk FROM bm),
         |q AS (SELECT embedding AS q_emb FROM embeddings
         |      WHERE vec_id = $HybridQueryId),
         |dtop AS (SELECT c.vec_id AS doc_id,
         |           ROUND(${cosSql("q.q_emb", "c.embedding")}, 6) AS score
         |         FROM embeddings c CROSS JOIN q WHERE c.vec_id <> $HybridQueryId),
         |dr AS (SELECT doc_id,
         |         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk FROM dtop),
         |u AS (SELECT doc_id, 1.0 / (60 + rnk) AS contrib FROM sr
         |      WHERE rnk <= $HybridTopL
         |      UNION ALL
         |      SELECT doc_id, 1.0 / (60 + rnk) FROM dr WHERE rnk <= $HybridTopL),
         |fs AS (SELECT doc_id, ROUND(SUM(contrib), 6) AS score FROM u GROUP BY 1),
         |fr AS (SELECT doc_id,
         |         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk FROM fs),
         |rel AS (SELECT doc_id,
         |          len(list_intersect(tk,
         |            [${HybridTerms.map(t => s"'$t'").mkString(", ")}])) AS rel
         |        FROM tk),
         |ideal AS (SELECT rel,
         |            ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS rnk
         |          FROM rel),
         |idcg AS (SELECT COALESCE(SUM(${gain("rel", "rnk")}), 0) AS idcg
         |         FROM ideal WHERE rnk <= $NdcgK),
         |dcgs AS (
         |  SELECT 'dense' AS list,
         |    COALESCE(SUM(${gain("COALESCE(rel.rel, 0)", "r.rnk")}), 0) AS dcg
         |  FROM dr r LEFT JOIN rel ON r.doc_id = rel.doc_id WHERE r.rnk <= $NdcgK
         |  UNION ALL
         |  SELECT 'fused',
         |    COALESCE(SUM(${gain("COALESCE(rel.rel, 0)", "r.rnk")}), 0)
         |  FROM fr r LEFT JOIN rel ON r.doc_id = rel.doc_id WHERE r.rnk <= $NdcgK
         |  UNION ALL
         |  SELECT 'sparse',
         |    COALESCE(SUM(${gain("COALESCE(rel.rel, 0)", "r.rnk")}), 0)
         |  FROM sr r LEFT JOIN rel ON r.doc_id = rel.doc_id WHERE r.rnk <= $NdcgK)
         |SELECT list, ROUND(dcg, 6) AS dcg, ROUND(idcg, 6) AS idcg,
         |  ROUND(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0 END, 6) AS ndcg
         |FROM dcgs CROSS JOIN idcg ORDER BY list""".stripMargin
    },

    "q135_mmr_rerank" ->
      s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings
         |           WHERE vec_id = $HybridQueryId),
         |sc AS (SELECT c.vec_id, c.embedding,
         |         ${cosSql("q.q_emb", "c.embedding")} AS cos
         |       FROM embeddings c CROSS JOIN q
         |       WHERE c.vec_id <> $HybridQueryId),
         |ck AS (SELECT vec_id, embedding, ROUND(cos, 6) AS rel,
         |         ROW_NUMBER() OVER (ORDER BY cos DESC NULLS LAST, vec_id)
         |           AS rnk
         |       FROM sc),
         |cand AS (SELECT vec_id, embedding, rel FROM ck
         |         WHERE rnk <= $MmrCandidates),
         |sel1 AS (SELECT 1::BIGINT AS step, vec_id, rel,
         |           ROUND($MmrLambda * rel, 6) AS mmr
         |         FROM cand ORDER BY mmr DESC NULLS LAST, vec_id LIMIT 1),
         |${(2 to MmrK).map(mmrStep).mkString(",\n")}
         |SELECT step, vec_id, rel, mmr FROM sel$MmrK ORDER BY step""".stripMargin,

    "q129_cluster_quota" ->
      s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cent_emb
         |               FROM embeddings WHERE vec_id % $CentroidMod = 1),
         |ranks AS (SELECT e.vec_id, c.cent_id,
         |            ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |              ORDER BY ${cosSql("e.embedding", "c.cent_emb")} DESC NULLS LAST,
         |                       c.cent_id) AS crnk
         |          FROM embeddings e CROSS JOIN cents c),
         |asg AS (SELECT cent_id, vec_id FROM ranks WHERE crnk = 1),
         |rk AS (SELECT cent_id, vec_id,
         |         ROW_NUMBER() OVER (PARTITION BY cent_id
         |           ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT,
         |                    vec_id) AS rnk
         |       FROM asg)
         |SELECT cent_id, vec_id, CAST(rnk AS BIGINT) AS rnk FROM rk
         |WHERE rnk <= $ClusterQuota ORDER BY cent_id, vec_id""".stripMargin,

    // Outlier replay: same assignment CTEs as q129, then per-cluster
    // mean/stddev_samp and the mean − 2σ fence (NULL σ ⇒ FALSE).
    "q162_embed_outliers" ->
      s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cent_emb
         |               FROM embeddings
         |               WHERE vec_id % $CentroidMod = 1 AND vec_id < $QueryCap),
         |scored AS (SELECT e.vec_id, c.cent_id,
         |             ${cosSql("e.embedding", "c.cent_emb")} AS cs
         |           FROM embeddings e CROSS JOIN cents c),
         |ranks AS (SELECT vec_id, cent_id, cs,
         |            ROW_NUMBER() OVER (PARTITION BY vec_id
         |              ORDER BY cs DESC NULLS LAST, cent_id) AS crnk
         |          FROM scored),
         |asg AS (SELECT vec_id, cent_id, cs FROM ranks WHERE crnk = 1),
         |st AS (SELECT cent_id, AVG(cs) AS mu, STDDEV_SAMP(cs) AS sd
         |       FROM asg GROUP BY 1)
         |SELECT a.vec_id, a.cent_id, ROUND(a.cs, 6) AS cos_centroid,
         |  COALESCE(a.cs < st.mu - $OutlierSigma * st.sd, FALSE) AS outlier
         |FROM asg a JOIN st USING (cent_id) ORDER BY a.vec_id""".stripMargin,

    "q130_hard_negatives" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb,
         |                  label AS q_label FROM embeddings
         |           WHERE vec_id % $QueryMod = 0 AND vec_id < $QueryCap),
         |scored AS (SELECT q.query_id, c.vec_id, c.label,
         |             ${cosSql("q.q_emb", "c.embedding")} AS cos
         |           FROM embeddings c CROSS JOIN q
         |           WHERE c.vec_id <> q.query_id AND c.label <> q.q_label),
         |rk AS (SELECT query_id, vec_id, label, cos,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |       FROM scored)
         |SELECT query_id, vec_id, label, ROUND(cos, 6) AS cos FROM rk
         |WHERE rnk <= $K ORDER BY 1, 4 DESC NULLS LAST, 2""".stripMargin,

    "q131_knn_eval" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb,
         |                  label AS q_label FROM embeddings
         |           WHERE vec_id % $QueryMod = 0 AND vec_id < $QueryCap),
         |scored AS (SELECT q.query_id, q.q_label, c.vec_id, c.label,
         |             ${cosSql("q.q_emb", "c.embedding")} AS cos
         |           FROM embeddings c CROSS JOIN q WHERE c.vec_id <> q.query_id),
         |top AS (SELECT query_id, q_label, label FROM (
         |          SELECT query_id, q_label, label,
         |            ROW_NUMBER() OVER (PARTITION BY query_id
         |                               ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |          FROM scored) WHERE rnk <= $K),
         |votes AS (SELECT query_id, q_label, label, COUNT(*) AS v
         |          FROM top GROUP BY 1, 2, 3),
         |pick AS (SELECT query_id, q_label, label AS pred,
         |           ROW_NUMBER() OVER (PARTITION BY query_id
         |                              ORDER BY v DESC, label) AS vr
         |         FROM votes)
         |SELECT q_label AS label, CAST(COUNT(*) AS BIGINT) AS n_queries,
         |  ROUND(SUM(CASE WHEN pred = q_label THEN 1 ELSE 0 END)::DOUBLE
         |        / COUNT(*), 6) AS acc
         |FROM pick WHERE vr = 1 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q128_hybrid_rrf" ->
      s"""WITH tk AS (SELECT doc_id,
         |  CASE WHEN length(trim(text)) = 0 THEN []
         |       ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk
         |  FROM documents),
         |dl AS (SELECT doc_id, len(tk)::DOUBLE AS dl FROM tk),
         |stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
         |tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
         |       FROM (SELECT doc_id, unnest(tk) AS term FROM tk)
         |       WHERE term IN (${HybridTerms.map(t => s"'$t'").mkString(", ")})
         |       GROUP BY 1, 2),
         |df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tf GROUP BY 1),
         |bm AS (SELECT doc_id,
         |         ROUND(SUM(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
         |               * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6)
         |           AS score
         |       FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
         |       GROUP BY doc_id),
         |sr AS (SELECT doc_id,
         |         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk FROM bm),
         |q AS (SELECT embedding AS q_emb FROM embeddings
         |      WHERE vec_id = $HybridQueryId),
         |dtop AS (SELECT c.vec_id AS doc_id,
         |           ROUND(${cosSql("q.q_emb", "c.embedding")}, 6) AS score
         |         FROM embeddings c CROSS JOIN q WHERE c.vec_id <> $HybridQueryId),
         |dr AS (SELECT doc_id,
         |         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk FROM dtop),
         |u AS (SELECT doc_id, 1.0 / (60 + rnk) AS contrib FROM sr
         |      WHERE rnk <= $HybridTopL
         |      UNION ALL
         |      SELECT doc_id, 1.0 / (60 + rnk) FROM dr WHERE rnk <= $HybridTopL)
         |SELECT doc_id, ROUND(SUM(contrib), 6) AS rrf,
         |       CAST(COUNT(*) AS BIGINT) AS n_lists
         |FROM u GROUP BY 1
         |ORDER BY rrf DESC, doc_id LIMIT $HybridK""".stripMargin,

    "q124_embed_pool" ->
      s"""WITH ex AS (SELECT vec_id // $PoolChunks AS doc, p.dim AS dim,
         |                   p.v AS v FROM (
         |  SELECT vec_id, unnest(list_transform(range(1, len(embedding) + 1),
         |           i -> {'dim': i - 1, 'v': embedding[i]::DOUBLE})) AS p
         |  FROM embeddings)),
         |pooled AS (SELECT doc, dim, AVG(v) AS v,
         |                  CAST(COUNT(*) AS BIGINT) AS n_chunks
         |           FROM ex GROUP BY 1, 2),
         |nrm AS (SELECT doc, sqrt(SUM(v * v)) AS nrm FROM pooled GROUP BY 1)
         |SELECT pooled.doc, CAST(dim AS BIGINT) AS dim, n_chunks,
         |       ROUND(v / NULLIF(nrm, 0.0), 6) AS v
         |FROM pooled JOIN nrm USING (doc)
         |ORDER BY doc, dim""".stripMargin,

    "q123_rp_reduce" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
         |           WHERE vec_id % $QueryMod = 0 AND vec_id < $QueryCap),
         |scored AS (SELECT q.query_id, c.vec_id, ${cosSql("q.q_emb", "c.embedding")} AS cos
         |           FROM embeddings c CROSS JOIN q WHERE c.vec_id <> q.query_id),
         |rk AS (SELECT query_id, vec_id, cos,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |       FROM scored),
         |panel AS (SELECT query_id, vec_id, cos FROM rk WHERE rnk <= $K),
         |red AS (SELECT vec_id,
         |          list_transform($rpPlanesSql, p ->
         |            ((list_reduce(list_prepend(0.0,
         |                list_transform(range(1, len(embedding) + 1),
         |                  i -> embedding[i]::DOUBLE * p[i])), (x, y) -> x + y))
         |             * ${1.0 / math.sqrt(rpPlanes.length.toDouble)})::REAL) AS remb
         |        FROM embeddings),
         |e AS (SELECT panel.query_id, panel.vec_id, panel.cos,
         |        ${cosSql("a.remb", "b.remb")} AS crp
         |      FROM panel JOIN red a ON a.vec_id = panel.query_id
         |                 JOIN red b ON b.vec_id = panel.vec_id),
         |f AS (SELECT query_id, vec_id, cos, crp, abs(cos - crp) AS err FROM e),
         |m AS (SELECT AVG(err) AS me FROM f)
         |SELECT query_id, vec_id, ROUND(cos, 6) AS cos_orig,
         |       ROUND(crp, 6) AS cos_rp, ROUND(err, 6) AS abs_err,
         |       ROUND(me, 6) AS mean_err
         |FROM f, m ORDER BY 1, 2""".stripMargin,

    // Feature-hashing replay: whitespace tokens → 60-bit md5 bucket mod
    // dim → counts → L2-normalize → ::REAL (float32 truncation exactly
    // where the engine truncates), dense list in bucket order, then the
    // standard ascending-fold cosine + rank. Zero-token docs get the
    // zero vector → NULL cosine on either side, ranked last like q25.
    "q178_text_encode_ann" ->
      s"""WITH tkd AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
         |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk
         |       FROM documents),
         |tok AS (SELECT doc_id, unnest(tk) AS t FROM tkd),
         |bc AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT % $TextEncDim AS b,
         |         CAST(COUNT(*) AS DOUBLE) AS c FROM tok GROUP BY 1, 2),
         |l2 AS (SELECT doc_id, SQRT(SUM(c*c)) AS nrm FROM bc GROUP BY 1),
         |dims AS (SELECT d.doc_id, i.i FROM (SELECT doc_id FROM tkd) d
         |         CROSS JOIN (SELECT unnest(range(0, $TextEncDim)) AS i) i),
         |cell AS (SELECT dims.doc_id, dims.i, COALESCE(bc.c, 0.0) AS c
         |         FROM dims LEFT JOIN bc ON bc.doc_id = dims.doc_id AND bc.b = dims.i),
         |vec AS (SELECT cell.doc_id,
         |          list(COALESCE(cell.c / NULLIF(l2.nrm, 0.0), 0.0)::REAL
         |               ORDER BY cell.i) AS embedding,
         |          COALESCE(MAX(l2.nrm), 0.0) AS nrm
         |        FROM cell LEFT JOIN l2 ON l2.doc_id = cell.doc_id
         |        GROUP BY cell.doc_id),
         |q AS (SELECT doc_id AS query_id, embedding AS q_emb, nrm AS q_nrm FROM vec
         |      WHERE doc_id % $TextEncQueryMod = 0 AND doc_id < $QueryCap),
         |scored AS (SELECT q.query_id, c.doc_id AS vec_id,
         |             CASE WHEN q.q_nrm = 0.0 OR c.nrm = 0.0 THEN NULL
         |                  ELSE ${cosSql("q.q_emb", "c.embedding")} END AS cos
         |           FROM vec c CROSS JOIN q WHERE c.doc_id <> q.query_id),
         |rk AS (SELECT query_id, vec_id, cos,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |       FROM scored)
         |SELECT query_id, vec_id, ROUND(cos, 6) AS cos FROM rk WHERE rnk <= $K
         |ORDER BY 1, 3 DESC NULLS LAST, 2""".stripMargin,

    "q25_ann_brute" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
         |           WHERE vec_id % $QueryMod = 0 AND vec_id < $QueryCap),
         |scored AS (SELECT q.query_id, c.vec_id, ${cosSql("q.q_emb", "c.embedding")} AS cos
         |           FROM embeddings c CROSS JOIN q WHERE c.vec_id <> q.query_id),
         |rk AS (SELECT query_id, vec_id, cos,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |       FROM scored)
         |SELECT query_id, vec_id, ROUND(cos, 6) AS cos FROM rk WHERE rnk <= $K
         |ORDER BY 1, 3 DESC NULLS LAST, 2""".stripMargin,

    // Auto-tune replay: brute truth over the panel, IVF assignment +
    // probe ranks (q34's CTEs) kept to crnk ≤ maxNProbe with the probe
    // rank riding as m, per-candidate top-k cuts from the same scored
    // table, exact-integer decision (hits·10 ≥ total·9, min/argmax).
    "q179_ann_tune" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
         |           WHERE vec_id % $QueryMod = 0 AND vec_id < $QueryCap),
         |bscored AS (SELECT q.query_id, c.vec_id, ${cosSql("q.q_emb", "c.embedding")} AS cos
         |            FROM embeddings c CROSS JOIN q WHERE c.vec_id <> q.query_id),
         |bt AS MATERIALIZED (SELECT query_id, vec_id FROM (
         |         SELECT query_id, vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY query_id
         |                              ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |         FROM bscored) WHERE rnk <= $K),
         |cents AS (SELECT vec_id AS cent_id, embedding AS cent_emb
         |          FROM embeddings WHERE vec_id % $CentroidMod = 1),
         |ranks AS (SELECT e.vec_id, e.embedding, c.cent_id,
         |            ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |              ORDER BY ${cosSql("e.embedding", "c.cent_emb")} DESC NULLS LAST,
         |                       c.cent_id) AS crnk
         |          FROM embeddings e CROSS JOIN cents c),
         |lists AS (SELECT cent_id, vec_id, embedding FROM ranks WHERE crnk = 1),
         |probes AS (SELECT vec_id AS query_id, embedding AS q_emb, cent_id,
         |             crnk AS m
         |           FROM ranks WHERE vec_id % $QueryMod = 0 AND vec_id < $QueryCap
         |             AND crnk <= $TuneMaxNProbe),
         |scored AS (SELECT p.query_id, l.vec_id, p.m,
         |             ${cosSql("p.q_emb", "l.embedding")} AS cos
         |           FROM lists l JOIN probes p ON l.cent_id = p.cent_id
         |           WHERE l.vec_id <> p.query_id),
         |ps AS (SELECT unnest(range(1, ${TuneMaxNProbe + 1})) AS p),
         |topp AS (SELECT p, query_id, vec_id FROM (
         |           SELECT ps.p, s.query_id, s.vec_id,
         |             ROW_NUMBER() OVER (PARTITION BY ps.p, s.query_id
         |               ORDER BY s.cos DESC NULLS LAST, s.vec_id) AS rnk
         |           FROM scored s JOIN ps ON s.m <= ps.p) WHERE rnk <= $K),
         |h AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS hits
         |      FROM topp JOIN bt USING (query_id, vec_id) GROUP BY 1),
         |stats AS (SELECT ps.p, COALESCE(h.hits, 0) AS hits,
         |            (SELECT CAST(COUNT(*) AS BIGINT) FROM bt) AS total
         |          FROM ps LEFT JOIN h USING (p)),
         |dec AS (SELECT MIN(CASE WHEN hits * $TuneTargetDen >= total * $TuneTargetNum
         |                        THEN p END) AS min_ok,
         |               MAX(hits) AS max_hits FROM stats),
         |dec2 AS (SELECT min_ok,
         |           (SELECT MIN(p) FROM stats, dec WHERE hits = max_hits) AS best_p
         |         FROM dec)
         |SELECT p::INT AS nprobe, hits, total,
         |  ROUND(hits::DOUBLE / total::DOUBLE, 6) AS recall,
         |  p = COALESCE(min_ok, best_p) AS chosen
         |FROM stats, dec2 ORDER BY 1""".stripMargin,

    // k-center replay: seed = min id, then the unrolled greedy steps.
    "q188_kcenter_coreset" ->
      s"""WITH kcand AS (SELECT vec_id, embedding FROM embeddings
         |               WHERE vec_id % $QueryMod = 0 AND vec_id < $QueryCap),
         |sel1 AS (SELECT 1::BIGINT AS step, MIN(vec_id) AS vec_id,
         |                NULL::DOUBLE AS max_cos FROM kcand),
         |${(2 to KCenterK).map(kcStep).mkString(",\n")}
         |SELECT step, vec_id, max_cos FROM sel$KCenterK ORDER BY step""".stripMargin,

    // Matryoshka replay: full-dim truth ranks, per-width sliced cosine
    // ranks (one dims-list join), exact-integer hit counts per width.
    "q186_matryoshka_eval" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
         |           WHERE vec_id % $QueryMod = 0 AND vec_id < $QueryCap),
         |bscored AS (SELECT q.query_id, c.vec_id, ${cosSql("q.q_emb", "c.embedding")} AS cos
         |            FROM embeddings c CROSS JOIN q WHERE c.vec_id <> q.query_id),
         |bt AS MATERIALIZED (SELECT query_id, vec_id FROM (
         |         SELECT query_id, vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY query_id
         |                              ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |         FROM bscored) WHERE rnk <= $K),
         |ms AS (SELECT unnest([${TruncDims.mkString(", ")}]) AS m),
         |tq AS (SELECT ms.m, vec_id AS query_id,
         |         list_slice(embedding, 1, ms.m) AS q_emb
         |       FROM embeddings, ms
         |       WHERE vec_id % $QueryMod = 0 AND vec_id < $QueryCap),
         |tscored AS (SELECT tq.m, tq.query_id, c.vec_id,
         |              ${cosSql("tq.q_emb", "list_slice(c.embedding, 1, tq.m)")} AS cos
         |            FROM embeddings c JOIN tq ON c.vec_id <> tq.query_id),
         |topm AS (SELECT m, query_id, vec_id FROM (
         |           SELECT m, query_id, vec_id,
         |             ROW_NUMBER() OVER (PARTITION BY m, query_id
         |                                ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |           FROM tscored) WHERE rnk <= $K),
         |h AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS hits
         |      FROM topm JOIN bt USING (query_id, vec_id) GROUP BY 1)
         |SELECT ms.m, COALESCE(h.hits, 0) AS hits,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM bt) AS total,
         |  ROUND(COALESCE(h.hits, 0)::DOUBLE /
         |        (SELECT COUNT(*) FROM bt)::DOUBLE, 6) AS recall
         |FROM ms LEFT JOIN h USING (m) ORDER BY ms.m""".stripMargin,

    // Margin-mining replay: SRP buckets, blocked candidates, per-endpoint
    // top-k ranks, ORDERED-fold means, rounded-margin argmax + threshold.
    "q184_bitext_margin" ->
      s"""WITH bk AS MATERIALIZED (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket
         |            FROM embeddings),
         |sb AS (SELECT vec_id AS src_id, embedding AS s_emb, bucket FROM bk
         |       WHERE vec_id % 2 = 0),
         |tb AS (SELECT vec_id AS tgt_id, embedding AS t_emb, bucket FROM bk
         |       WHERE vec_id % 2 = 1),
         |cand AS (SELECT src_id, tgt_id, ${cosSql("s_emb", "t_emb")} AS cos
         |         FROM sb JOIN tb USING (bucket)),
         |fr AS (SELECT src_id, tgt_id, cos,
         |         ROW_NUMBER() OVER (PARTITION BY src_id
         |           ORDER BY cos DESC NULLS LAST, tgt_id) AS r FROM cand),
         |fwd AS (SELECT src_id,
         |          list_reduce(list_prepend(0.0, list_sort(list(cos))),
         |            (x, y) -> x + y) / COUNT(*) AS avg_s
         |        FROM fr WHERE r <= $MarginK GROUP BY src_id),
         |br AS (SELECT src_id, tgt_id, cos,
         |         ROW_NUMBER() OVER (PARTITION BY tgt_id
         |           ORDER BY cos DESC NULLS LAST, src_id) AS r FROM cand),
         |bwd AS (SELECT tgt_id,
         |          list_reduce(list_prepend(0.0, list_sort(list(cos))),
         |            (x, y) -> x + y) / COUNT(*) AS avg_t
         |        FROM br WHERE r <= $MarginK GROUP BY tgt_id),
         |m AS (SELECT src_id, tgt_id,
         |        ROUND(cos / ((avg_s + avg_t) / 2), 6) AS margin
         |      FROM cand JOIN fwd USING (src_id) JOIN bwd USING (tgt_id)),
         |best AS (SELECT src_id, tgt_id, margin,
         |           ROW_NUMBER() OVER (PARTITION BY src_id
         |             ORDER BY margin DESC NULLS LAST, tgt_id) AS rb FROM m)
         |SELECT src_id, tgt_id, margin FROM best
         |WHERE rb = 1 AND margin >= $MarginThreshold ORDER BY src_id""".stripMargin,

    // Sentence-bitext replay: the shared q234 sentence chain, the q178
    // hashed-BoW vector chain per sentence, then the q184 margin chain
    // over even-vs-odd document sides.
    "q235_sentence_bitext" ->
      s"""WITH ${graft.queries.TextQueries.sentenceCtes},
         |sidd AS (SELECT doc_id * 1000 + sent_no AS sid, sentence FROM sents),
         |stk AS (SELECT sid, CASE WHEN length(trim(sentence)) = 0 THEN []
         |          ELSE regexp_split_to_array(trim(sentence), '\\s+') END AS tk
         |        FROM sidd),
         |stok AS (SELECT sid, unnest(tk) AS t FROM stk),
         |sbc AS (SELECT sid, ('0x' || substr(md5(t), 1, 15))::BIGINT % $TextEncDim AS b,
         |          CAST(COUNT(*) AS DOUBLE) AS c FROM stok GROUP BY 1, 2),
         |sl2 AS (SELECT sid, SQRT(SUM(c*c)) AS nrm FROM sbc GROUP BY 1),
         |sdims AS (SELECT d.sid, i.i FROM (SELECT sid FROM stk) d
         |          CROSS JOIN (SELECT unnest(range(0, $TextEncDim)) AS i) i),
         |scell AS (SELECT sdims.sid, sdims.i, COALESCE(sbc.c, 0.0) AS c
         |          FROM sdims LEFT JOIN sbc ON sbc.sid = sdims.sid AND sbc.b = sdims.i),
         |svec AS MATERIALIZED (SELECT scell.sid,
         |          list(COALESCE(scell.c / NULLIF(sl2.nrm, 0.0), 0.0)::REAL
         |               ORDER BY scell.i) AS embedding
         |        FROM scell LEFT JOIN sl2 ON sl2.sid = scell.sid
         |        GROUP BY scell.sid),
         |sbk AS MATERIALIZED (SELECT sid, embedding,
         |          ${bucketSqlOver("embedding", sentPlanesSql)} AS bucket FROM svec),
         |ssb AS (SELECT sid AS src_id, embedding AS s_emb, bucket FROM sbk
         |        WHERE (sid // 1000) % 2 = 0),
         |stb AS (SELECT sid AS tgt_id, embedding AS t_emb, bucket FROM sbk
         |        WHERE (sid // 1000) % 2 = 1),
         |cand AS MATERIALIZED (SELECT src_id, tgt_id, ${cosSql("s_emb", "t_emb")} AS cos
         |         FROM ssb JOIN stb USING (bucket)),
         |fr AS (SELECT src_id, tgt_id, cos,
         |         ROW_NUMBER() OVER (PARTITION BY src_id
         |           ORDER BY cos DESC NULLS LAST, tgt_id) AS r FROM cand),
         |fwd AS (SELECT src_id,
         |          list_reduce(list_prepend(0.0, list_sort(list(cos))),
         |            (x, y) -> x + y) / COUNT(*) AS avg_s
         |        FROM fr WHERE r <= $MarginK GROUP BY src_id),
         |br AS (SELECT src_id, tgt_id, cos,
         |         ROW_NUMBER() OVER (PARTITION BY tgt_id
         |           ORDER BY cos DESC NULLS LAST, src_id) AS r FROM cand),
         |bwd AS (SELECT tgt_id,
         |          list_reduce(list_prepend(0.0, list_sort(list(cos))),
         |            (x, y) -> x + y) / COUNT(*) AS avg_t
         |        FROM br WHERE r <= $MarginK GROUP BY tgt_id),
         |m AS (SELECT src_id, tgt_id,
         |        ROUND(cos / ((avg_s + avg_t) / 2), 6) AS margin
         |      FROM cand JOIN fwd USING (src_id) JOIN bwd USING (tgt_id)),
         |best AS (SELECT src_id, tgt_id, margin,
         |           ROW_NUMBER() OVER (PARTITION BY src_id
         |             ORDER BY margin DESC NULLS LAST, tgt_id) AS rb FROM m)
         |SELECT src_id, tgt_id, margin FROM best
         |WHERE rb = 1 AND margin >= $MarginThreshold ORDER BY src_id""".stripMargin,

    "q34_ann_ivf" ->
      s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cent_emb
         |               FROM embeddings WHERE vec_id % $CentroidMod = 1),
         |ranks AS MATERIALIZED (SELECT e.vec_id, e.embedding, c.cent_id,
         |            ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |              ORDER BY ${cosSql("e.embedding", "c.cent_emb")} DESC NULLS LAST,
         |                       c.cent_id) AS crnk
         |          FROM embeddings e CROSS JOIN cents c),
         |lists AS (SELECT cent_id, vec_id, embedding FROM ranks WHERE crnk = 1),
         |probes AS (SELECT vec_id AS query_id, embedding AS q_emb, cent_id
         |           FROM ranks WHERE vec_id % $QueryMod = 0 AND vec_id < $QueryCap AND crnk <= $NProbe),
         |scored AS (SELECT p.query_id, l.vec_id,
         |             ${cosSql("p.q_emb", "l.embedding")} AS cos
         |           FROM lists l JOIN probes p ON l.cent_id = p.cent_id
         |           WHERE l.vec_id <> p.query_id),
         |rk AS (SELECT query_id, vec_id, cos,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |       FROM scored)
         |SELECT query_id, vec_id, ROUND(cos, 6) AS cos FROM rk WHERE rnk <= $K
         |ORDER BY 1, 3 DESC NULLS LAST, 2""".stripMargin,

    "q26_ann_lsh" ->
      s"""WITH bk AS MATERIALIZED (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket
         |            FROM embeddings),
         |q AS (SELECT vec_id AS query_id, embedding AS q_emb, bucket FROM bk
         |      WHERE vec_id % $QueryMod = 0 AND vec_id < $QueryCap),
         |scored AS (SELECT q.query_id, c.vec_id, ${cosSql("q.q_emb", "c.embedding")} AS cos
         |           FROM bk c JOIN q ON c.bucket = q.bucket WHERE c.vec_id <> q.query_id),
         |rk AS (SELECT query_id, vec_id, cos,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |       FROM scored)
         |SELECT query_id, vec_id, ROUND(cos, 6) AS cos FROM rk WHERE rnk <= $K
         |ORDER BY 1, 3 DESC NULLS LAST, 2""".stripMargin,

    "q40_ann_ivf_trained" ->
      s"""WITH $TrainedCentsCtes,
         |ranks AS (SELECT e.vec_id, e.embedding, c.cent_id,
         |            ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |              ORDER BY ${cosSql("e.embedding", "c.cent_emb")} DESC NULLS LAST,
         |                       c.cent_id) AS crnk
         |          FROM embeddings e CROSS JOIN tc c),
         |lists AS (SELECT cent_id, vec_id, embedding FROM ranks WHERE crnk = 1),
         |probes AS (SELECT vec_id AS query_id, embedding AS q_emb, cent_id
         |           FROM ranks WHERE vec_id % $QueryMod = 0 AND vec_id < $QueryCap AND crnk <= $NProbe),
         |scored AS (SELECT p.query_id, l.vec_id,
         |             ${cosSql("p.q_emb", "l.embedding")} AS cos
         |           FROM lists l JOIN probes p ON l.cent_id = p.cent_id
         |           WHERE l.vec_id <> p.query_id),
         |rk AS (SELECT query_id, vec_id, cos,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |       FROM scored)
         |SELECT query_id, vec_id, ROUND(cos, 6) AS cos FROM rk WHERE rnk <= $K
         |ORDER BY 1, 3 DESC NULLS LAST, 2""".stripMargin,

    "q101_ann_lloyd3" ->
      s"""WITH ${trainedCentsCtes(LloydIters)},
         |ranks AS (SELECT e.vec_id, e.embedding, c.cent_id,
         |            ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |              ORDER BY ${cosSql("e.embedding", "c.cent_emb")} DESC NULLS LAST,
         |                       c.cent_id) AS crnk
         |          FROM embeddings e CROSS JOIN tc c),
         |lists AS (SELECT cent_id, vec_id, embedding FROM ranks WHERE crnk = 1),
         |probes AS (SELECT vec_id AS query_id, embedding AS q_emb, cent_id
         |           FROM ranks WHERE vec_id % $QueryMod = 0 AND vec_id < $QueryCap AND crnk <= $NProbe),
         |scored AS (SELECT p.query_id, l.vec_id,
         |             ${cosSql("p.q_emb", "l.embedding")} AS cos
         |           FROM lists l JOIN probes p ON l.cent_id = p.cent_id
         |           WHERE l.vec_id <> p.query_id),
         |rk AS (SELECT query_id, vec_id, cos,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |       FROM scored)
         |SELECT query_id, vec_id, ROUND(cos, 6) AS cos FROM rk WHERE rnk <= $K
         |ORDER BY 1, 3 DESC NULLS LAST, 2""".stripMargin,

    "q99_ann_pq" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
         |           WHERE vec_id % $QueryMod = 0 AND vec_id < $QueryCap),
         |bscored AS (SELECT q.query_id, c.vec_id, ${cosSql("q.q_emb", "c.embedding")} AS cos
         |            FROM embeddings c CROSS JOIN q WHERE c.vec_id <> q.query_id),
         |bt AS MATERIALIZED (SELECT query_id, vec_id FROM (
         |         SELECT query_id, vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY query_id
         |                              ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |         FROM bscored) WHERE rnk <= $K),
         |$PqRecCtes,
         |pscored AS (SELECT q.query_id, c.vec_id, ${cosSql("q.q_emb", "c.embedding")} AS cos
         |            FROM rec c CROSS JOIN q WHERE c.vec_id <> q.query_id),
         |pt AS (SELECT query_id, vec_id FROM (
         |         SELECT query_id, vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY query_id
         |                              ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |         FROM pscored) WHERE rnk <= $K)
         |SELECT b.query_id,
         |  ROUND(COUNT(t.vec_id)::DOUBLE / $K, 6) AS recall_pq
         |FROM bt b LEFT JOIN pt t
         |  ON b.query_id = t.query_id AND b.vec_id = t.vec_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q104_ann_ivf_pq" ->
      s"""WITH ${pqCtesFrom("embeddings", "", Some(QueryCap))},
         |cents AS (SELECT vec_id AS cent_id, embedding AS cent_emb FROM rec
         |          WHERE vec_id % $CentroidMod = 1 AND vec_id < $QueryCap),
         |ranks AS (SELECT r.vec_id, r.embedding, c.cent_id,
         |            ROW_NUMBER() OVER (PARTITION BY r.vec_id
         |              ORDER BY ${cosSql("r.embedding", "c.cent_emb")} DESC NULLS LAST,
         |                       c.cent_id) AS crnk
         |          FROM rec r CROSS JOIN cents c),
         |lists AS (SELECT cent_id, vec_id, embedding FROM ranks WHERE crnk = 1),
         |probes AS (SELECT query_id, q_emb, cent_id FROM (
         |             SELECT q.vec_id AS query_id, q.embedding AS q_emb, c.cent_id,
         |               ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |                 ORDER BY ${cosSql("q.embedding", "c.cent_emb")} DESC NULLS LAST,
         |                          c.cent_id) AS crnk
         |             FROM embeddings q CROSS JOIN cents c
         |             WHERE q.vec_id % $QueryMod = 0 AND q.vec_id < $QueryCap) WHERE crnk <= $NProbe),
         |scored AS (SELECT p.query_id, l.vec_id,
         |             ${cosSql("p.q_emb", "l.embedding")} AS cos
         |           FROM lists l JOIN probes p ON l.cent_id = p.cent_id
         |           WHERE l.vec_id <> p.query_id),
         |rk AS (SELECT query_id, vec_id, cos,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |       FROM scored)
         |SELECT query_id, vec_id, ROUND(cos, 6) AS cos FROM rk WHERE rnk <= $K
         |ORDER BY 1, 3 DESC NULLS LAST, 2""".stripMargin,

    "q105_ann_pq_residual" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
         |           WHERE vec_id % $QueryMod = 0 AND vec_id < $QueryCap),
         |bscored AS (SELECT q.query_id, c.vec_id, ${cosSql("q.q_emb", "c.embedding")} AS cos
         |            FROM embeddings c CROSS JOIN q WHERE c.vec_id <> q.query_id),
         |bt AS MATERIALIZED (SELECT query_id, vec_id FROM (
         |         SELECT query_id, vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY query_id
         |                              ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |         FROM bscored) WHERE rnk <= $K),
         |${pqCtesFrom("embeddings", "", Some(QueryCap))},
         |cents AS (SELECT vec_id AS cent_id, embedding AS cent_emb FROM rec
         |          WHERE vec_id % $CentroidMod = 1 AND vec_id < $QueryCap),
         |ranks AS (SELECT r.vec_id, r.embedding, c.cent_id,
         |            ROW_NUMBER() OVER (PARTITION BY r.vec_id
         |              ORDER BY ${cosSql("r.embedding", "c.cent_emb")} DESC NULLS LAST,
         |                       c.cent_id) AS crnk
         |          FROM rec r CROSS JOIN cents c),
         |lists AS (SELECT cent_id, vec_id, embedding FROM ranks WHERE crnk = 1),
         |probes AS (SELECT query_id, q_emb, cent_id FROM (
         |             SELECT q.vec_id AS query_id, q.embedding AS q_emb, c.cent_id,
         |               ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |                 ORDER BY ${cosSql("q.embedding", "c.cent_emb")} DESC NULLS LAST,
         |                          c.cent_id) AS crnk
         |             FROM embeddings q CROSS JOIN cents c
         |             WHERE q.vec_id % $QueryMod = 0 AND q.vec_id < $QueryCap) WHERE crnk <= $NProbe),
         |scored AS (SELECT p.query_id, l.vec_id,
         |             ${cosSql("p.q_emb", "l.embedding")} AS cos
         |           FROM lists l JOIN probes p ON l.cent_id = p.cent_id
         |           WHERE l.vec_id <> p.query_id),
         |rawt AS (SELECT query_id, vec_id FROM (
         |           SELECT query_id, vec_id,
         |             ROW_NUMBER() OVER (PARTITION BY query_id
         |                                ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |           FROM scored) WHERE rnk <= $K),
         |$ResidualServeCtes,
         |rest AS (SELECT query_id, vec_id FROM (
         |           SELECT query_id, vec_id,
         |             ROW_NUMBER() OVER (PARTITION BY query_id
         |                                ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |           FROM rscored) WHERE rnk <= $K),
         |rr1 AS (SELECT b.query_id, ROUND(COUNT(t.vec_id)::DOUBLE / $K, 6) AS recall_pq_raw
         |        FROM bt b LEFT JOIN rawt t
         |          ON b.query_id = t.query_id AND b.vec_id = t.vec_id GROUP BY 1),
         |rr2 AS (SELECT b.query_id, ROUND(COUNT(t.vec_id)::DOUBLE / $K, 6) AS recall_pq_res
         |        FROM bt b LEFT JOIN rest t
         |          ON b.query_id = t.query_id AND b.vec_id = t.vec_id GROUP BY 1)
         |SELECT rr1.query_id, rr1.recall_pq_raw, rr2.recall_pq_res
         |FROM rr1 JOIN rr2 ON rr1.query_id = rr2.query_id ORDER BY 1""".stripMargin,

    "q107_ann_pq_res_store" ->
      s"""WITH $ResidualServeCtes,
         |rrk AS (SELECT query_id, vec_id, cos,
         |          ROW_NUMBER() OVER (PARTITION BY query_id
         |                             ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |        FROM rscored)
         |SELECT query_id, vec_id, ROUND(cos, 6) AS cos FROM rrk WHERE rnk <= $K
         |ORDER BY 1, 3 DESC NULLS LAST, 2""".stripMargin,

    "q106_ann_pq_trained" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
         |           WHERE vec_id % $QueryMod = 0 AND vec_id < $QueryCap),
         |bscored AS (SELECT q.query_id, c.vec_id, ${cosSql("q.q_emb", "c.embedding")} AS cos
         |            FROM embeddings c CROSS JOIN q WHERE c.vec_id <> q.query_id),
         |bt AS MATERIALIZED (SELECT query_id, vec_id FROM (
         |         SELECT query_id, vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY query_id
         |                              ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |         FROM bscored) WHERE rnk <= $K),
         |${pqCtesFrom("embeddings", "", Some(QueryCap))},
         |sscored AS (SELECT q.query_id, c.vec_id, ${cosSql("q.q_emb", "c.embedding")} AS cos
         |            FROM rec c CROSS JOIN q WHERE c.vec_id <> q.query_id),
         |st AS (SELECT query_id, vec_id FROM (
         |         SELECT query_id, vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY query_id
         |                              ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |         FROM sscored) WHERE rnk <= $K),
         |tps AS (SELECT e.sub_id, e.code_id,
         |          list(c.sub_emb ORDER BY c.vec_id) AS vs, COUNT(*) AS n
         |        FROM enc e JOIN cs c ON e.vec_id = c.vec_id AND e.sub_id = c.sub_id
         |        GROUP BY 1, 2),
         |tcw AS (SELECT sub_id, code_id, list_transform(
         |          list_reduce(
         |            list_prepend(list_transform(range(1, ${Dim / PqM + 1}), i -> 0.0), vs),
         |            (acc, v) -> list_transform(range(1, ${Dim / PqM + 1}),
         |                                       i -> acc[i] + v[i]::DOUBLE)),
         |          x -> (x / n)::REAL) AS code_emb FROM tps),
         |tenc AS (SELECT vec_id, sub_id, code_id FROM (
         |           SELECT c.vec_id, c.sub_id, w.code_id,
         |             ROW_NUMBER() OVER (PARTITION BY c.vec_id, c.sub_id
         |               ORDER BY ${d2Sql("c.sub_emb", "w.code_emb")} ASC,
         |                        w.code_id) AS crnk
         |           FROM cs c JOIN tcw w ON c.sub_id = w.sub_id) WHERE crnk = 1),
         |trec AS (SELECT e.vec_id,
         |           flatten(list(w.code_emb ORDER BY e.sub_id)) AS embedding
         |         FROM tenc e JOIN tcw w
         |           ON e.sub_id = w.sub_id AND e.code_id = w.code_id
         |         GROUP BY 1),
         |tscored AS (SELECT q.query_id, c.vec_id, ${cosSql("q.q_emb", "c.embedding")} AS cos
         |            FROM trec c CROSS JOIN q WHERE c.vec_id <> q.query_id),
         |tt AS (SELECT query_id, vec_id FROM (
         |         SELECT query_id, vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY query_id
         |                              ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |         FROM tscored) WHERE rnk <= $K),
         |rr1 AS (SELECT b.query_id, ROUND(COUNT(t.vec_id)::DOUBLE / $K, 6) AS recall_pq
         |        FROM bt b LEFT JOIN st t
         |          ON b.query_id = t.query_id AND b.vec_id = t.vec_id GROUP BY 1),
         |rr2 AS (SELECT b.query_id, ROUND(COUNT(t.vec_id)::DOUBLE / $K, 6) AS recall_pq_trained
         |        FROM bt b LEFT JOIN tt t
         |          ON b.query_id = t.query_id AND b.vec_id = t.vec_id GROUP BY 1)
         |SELECT rr1.query_id, rr1.recall_pq, rr2.recall_pq_trained
         |FROM rr1 JOIN rr2 ON rr1.query_id = rr2.query_id ORDER BY 1""".stripMargin,

    "q59_ann_multiprobe" ->
      s"""WITH bk AS MATERIALIZED (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket
         |            FROM embeddings),
         |q0 AS (SELECT vec_id AS query_id, embedding AS q_emb, bucket FROM bk
         |       WHERE vec_id % $QueryMod = 0 AND vec_id < $QueryCap),
         |probes AS (SELECT query_id, q_emb,
         |             CASE WHEN t.j = -1 THEN bucket
         |                  ELSE xor(bucket, 1::BIGINT << t.j) END AS bucket
         |           FROM q0, unnest(range(-1, $Planes)) AS t(j)),
         |scored AS (SELECT p.query_id, c.vec_id, ${cosSql("p.q_emb", "c.embedding")} AS cos
         |           FROM bk c JOIN probes p ON c.bucket = p.bucket
         |           WHERE c.vec_id <> p.query_id),
         |rk AS (SELECT query_id, vec_id, cos,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |       FROM scored)
         |SELECT query_id, vec_id, ROUND(cos, 6) AS cos FROM rk WHERE rnk <= $K
         |ORDER BY 1, 3 DESC NULLS LAST, 2""".stripMargin,

    "q55_ann_store_roundtrip" ->
      s"""WITH bk AS MATERIALIZED (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket
         |            FROM embeddings),
         |lq AS (SELECT vec_id AS query_id, embedding AS q_emb, bucket FROM bk
         |       WHERE vec_id % $QueryMod = 0 AND vec_id < $QueryCap),
         |lscored AS (SELECT lq.query_id, c.vec_id, ${cosSql("lq.q_emb", "c.embedding")} AS cos
         |            FROM bk c JOIN lq ON c.bucket = lq.bucket WHERE c.vec_id <> lq.query_id),
         |lrk AS (SELECT query_id, vec_id, cos,
         |          ROW_NUMBER() OVER (PARTITION BY query_id
         |                             ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |        FROM lscored),
         |cents AS (SELECT vec_id AS cent_id, embedding AS cent_emb
         |          FROM embeddings WHERE vec_id % $CentroidMod = 1),
         |ranks AS MATERIALIZED (SELECT e.vec_id, e.embedding, c.cent_id,
         |            ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |              ORDER BY ${cosSql("e.embedding", "c.cent_emb")} DESC NULLS LAST,
         |                       c.cent_id) AS crnk
         |          FROM embeddings e CROSS JOIN cents c),
         |lists AS (SELECT cent_id, vec_id, embedding FROM ranks WHERE crnk = 1),
         |probes AS (SELECT vec_id AS query_id, embedding AS q_emb, cent_id
         |           FROM ranks WHERE vec_id % $QueryMod = 0 AND vec_id < $QueryCap AND crnk <= $NProbe),
         |iscored AS (SELECT p.query_id, l.vec_id, ${cosSql("p.q_emb", "l.embedding")} AS cos
         |            FROM lists l JOIN probes p ON l.cent_id = p.cent_id
         |            WHERE l.vec_id <> p.query_id),
         |irk AS (SELECT query_id, vec_id, cos,
         |          ROW_NUMBER() OVER (PARTITION BY query_id
         |                             ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |        FROM iscored)
         |SELECT 'srp' AS method, query_id, vec_id, ROUND(cos, 6) AS cos
         |FROM lrk WHERE rnk <= $K
         |UNION ALL
         |SELECT 'ivf' AS method, query_id, vec_id, ROUND(cos, 6) AS cos
         |FROM irk WHERE rnk <= $K
         |ORDER BY 1, 2, 4 DESC NULLS LAST, 3""".stripMargin,

    "q75_ann_store_refresh" ->
      s"""WITH bk AS MATERIALIZED (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket
         |            FROM embeddings),
         |lq AS (SELECT vec_id AS query_id, embedding AS q_emb, bucket FROM bk
         |       WHERE vec_id % $QueryMod = 0 AND vec_id < $QueryCap),
         |lscored AS (SELECT lq.query_id, c.vec_id, ${cosSql("lq.q_emb", "c.embedding")} AS cos
         |            FROM bk c JOIN lq ON c.bucket = lq.bucket WHERE c.vec_id <> lq.query_id),
         |lrk AS (SELECT query_id, vec_id, cos,
         |          ROW_NUMBER() OVER (PARTITION BY query_id
         |                             ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |        FROM lscored),
         |cents AS (SELECT vec_id AS cent_id, embedding AS cent_emb
         |          FROM embeddings
         |          WHERE vec_id % $CentroidMod = 1 AND vec_id % 5 <> 3),
         |ranks AS MATERIALIZED (SELECT e.vec_id, e.embedding, c.cent_id,
         |            ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |              ORDER BY ${cosSql("e.embedding", "c.cent_emb")} DESC NULLS LAST,
         |                       c.cent_id) AS crnk
         |          FROM embeddings e CROSS JOIN cents c),
         |lists AS (SELECT cent_id, vec_id, embedding FROM ranks WHERE crnk = 1),
         |probes AS (SELECT vec_id AS query_id, embedding AS q_emb, cent_id
         |           FROM ranks WHERE vec_id % $QueryMod = 0 AND vec_id < $QueryCap AND crnk <= $NProbe),
         |iscored AS (SELECT p.query_id, l.vec_id, ${cosSql("p.q_emb", "l.embedding")} AS cos
         |            FROM lists l JOIN probes p ON l.cent_id = p.cent_id
         |            WHERE l.vec_id <> p.query_id),
         |irk AS (SELECT query_id, vec_id, cos,
         |          ROW_NUMBER() OVER (PARTITION BY query_id
         |                             ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |        FROM iscored)
         |SELECT 'srp' AS method, query_id, vec_id, ROUND(cos, 6) AS cos
         |FROM lrk WHERE rnk <= $K
         |UNION ALL
         |SELECT 'ivf' AS method, query_id, vec_id, ROUND(cos, 6) AS cos
         |FROM irk WHERE rnk <= $K
         |ORDER BY 1, 2, 4 DESC NULLS LAST, 3""".stripMargin,

    "q78_embed_standardize" ->
      """WITH dims AS (SELECT vec_id, CAST(t.i AS BIGINT) AS dim,
        |                     embedding[t.i]::DOUBLE AS x
        |              FROM embeddings,
        |                   unnest(range(1, len(embedding) + 1)) AS t(i)),
        |st AS (SELECT dim, AVG(x) AS mu, STDDEV_SAMP(x) AS sd
        |       FROM dims GROUP BY 1)
        |SELECT d.vec_id, d.dim,
        |  ROUND(CASE WHEN sd IS NULL OR sd = 0 THEN 0.0
        |             ELSE (x - mu) / sd END, 6) AS z
        |FROM dims d JOIN st USING (dim)
        |WHERE d.vec_id % 25 = 0
        |ORDER BY 1, 2""".stripMargin,

    "q97_ann_ivf_quantized" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
         |           WHERE vec_id % $QueryMod = 0 AND vec_id < $QueryCap),
         |sc AS (SELECT vec_id, embedding,
         |         list_reduce(list_prepend(0.0,
         |           list_transform(embedding, e -> abs(e::DOUBLE))),
         |           (a, b) -> GREATEST(a, b)) AS s
         |       FROM embeddings),
         |dq AS (SELECT vec_id,
         |         CASE WHEN s = 0 THEN embedding
         |              ELSE list_transform(embedding,
         |                e -> (floor(e::DOUBLE / s * 127 + 0.5) * s / 127)::REAL)
         |         END AS embedding
         |       FROM sc),
         |cents AS (SELECT vec_id AS cent_id, embedding AS cent_emb
         |          FROM dq WHERE vec_id % $CentroidMod = 1),
         |ranks AS (SELECT e.vec_id, e.embedding, c.cent_id,
         |            ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |              ORDER BY ${cosSql("e.embedding", "c.cent_emb")} DESC NULLS LAST,
         |                       c.cent_id) AS crnk
         |          FROM dq e CROSS JOIN cents c),
         |lists AS (SELECT cent_id, vec_id, embedding FROM ranks WHERE crnk = 1),
         |qr AS (SELECT q.query_id, q.q_emb, c.cent_id,
         |         ROW_NUMBER() OVER (PARTITION BY q.query_id
         |           ORDER BY ${cosSql("q.q_emb", "c.cent_emb")} DESC NULLS LAST,
         |                    c.cent_id) AS crnk
         |       FROM q CROSS JOIN cents c),
         |probes AS (SELECT query_id, q_emb, cent_id FROM qr WHERE crnk <= $NProbe),
         |iscored AS (SELECT p.query_id, l.vec_id,
         |              ${cosSql("p.q_emb", "l.embedding")} AS cos
         |            FROM lists l JOIN probes p ON l.cent_id = p.cent_id
         |            WHERE l.vec_id <> p.query_id),
         |irk AS (SELECT query_id, vec_id, cos,
         |          ROW_NUMBER() OVER (PARTITION BY query_id
         |                             ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |        FROM iscored)
         |SELECT query_id, vec_id, ROUND(cos, 6) AS cos FROM irk WHERE rnk <= $K
         |ORDER BY 1, 3 DESC NULLS LAST, 2""".stripMargin,

    "q94_ann_quantized" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
         |           WHERE vec_id % $QueryMod = 0 AND vec_id < $QueryCap),
         |bscored AS (SELECT q.query_id, c.vec_id, ${cosSql("q.q_emb", "c.embedding")} AS cos
         |            FROM embeddings c CROSS JOIN q WHERE c.vec_id <> q.query_id),
         |bt AS MATERIALIZED (SELECT query_id, vec_id FROM (
         |         SELECT query_id, vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY query_id
         |                              ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |         FROM bscored) WHERE rnk <= $K),
         |sc AS (SELECT vec_id, embedding,
         |         list_reduce(list_prepend(0.0,
         |           list_transform(embedding, e -> abs(e::DOUBLE))),
         |           (a, b) -> GREATEST(a, b)) AS s
         |       FROM embeddings),
         |dq AS (SELECT vec_id,
         |         CASE WHEN s = 0 THEN embedding
         |              ELSE list_transform(embedding,
         |                e -> (floor(e::DOUBLE / s * 127 + 0.5) * s / 127)::REAL)
         |         END AS embedding
         |       FROM sc),
         |qscored AS (SELECT q.query_id, c.vec_id, ${cosSql("q.q_emb", "c.embedding")} AS cos
         |            FROM dq c CROSS JOIN q WHERE c.vec_id <> q.query_id),
         |qt AS (SELECT query_id, vec_id FROM (
         |         SELECT query_id, vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY query_id
         |                              ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |         FROM qscored) WHERE rnk <= $K)
         |SELECT b.query_id,
         |  ROUND(COUNT(t.vec_id)::DOUBLE / $K, 6) AS recall_q8
         |FROM bt b LEFT JOIN qt t
         |  ON b.query_id = t.query_id AND b.vec_id = t.vec_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q41_ann_recall" ->
      s"""WITH $annRecallCtes
         |SELECT rl.query_id, rl.recall_lsh, ri.recall_ivf
         |FROM rl JOIN ri ON rl.query_id = ri.query_id ORDER BY 1""".stripMargin,

    // Sign-test replay: q41's per-query recall chain, strict-win counts,
    // then the exact binomial tail via a Pascal-triangle recursion
    // (BIGINT-exact — n_diff is panel-bounded) and the two-sided cap.
    "q211_sign_test" ->
      s"""WITH RECURSIVE $annRecallCtes,
         |pr AS (SELECT rl.query_id, recall_lsh, recall_ivf
         |       FROM rl JOIN ri ON rl.query_id = ri.query_id),
         |ag AS (SELECT count(*)::BIGINT AS n_pairs,
         |         SUM(CASE WHEN recall_lsh > recall_ivf THEN 1 ELSE 0 END)::BIGINT
         |           AS wins_a,
         |         SUM(CASE WHEN recall_ivf > recall_lsh THEN 1 ELSE 0 END)::BIGINT
         |           AS wins_b
         |       FROM pr),
         |pas(i, vals) AS (
         |  SELECT 0, [1::BIGINT]
         |  UNION ALL
         |  SELECT i + 1, list_transform(range(1, i + 3),
         |    j -> COALESCE(vals[(j - 1)::INT], 0) + COALESCE(vals[j::INT], 0))
         |  FROM pas, ag WHERE i < wins_a + wins_b),
         |lastrow AS (SELECT vals FROM pas, ag WHERE i = wins_a + wins_b),
         |ts AS (SELECT list_sum(list_slice(vals, 1,
         |         (LEAST(wins_a, wins_b) + 1)::INT))::BIGINT AS s
         |       FROM lastrow, ag)
         |SELECT n_pairs, wins_a + wins_b AS n_diff, wins_a, wins_b,
         |  ROUND(CASE WHEN wins_a + wins_b = 0 THEN 1.0
         |        ELSE LEAST(1.0, 2 * ts.s::DOUBLE
         |                        / power(2, wins_a + wins_b)) END, 9) AS p_value
         |FROM ag, ts""".stripMargin,

    // Bootstrap replay: q41's LSH-recall panel as an ordered list, the
    // keyed-hash draw for each of reps × n slots (static range bound +
    // filter — DuckDB's range() takes no lateral column), 1e-9-rounded
    // resample means, quantile_cont CI bounds.
    "q212_bootstrap_ci" ->
      s"""WITH $annRecallCtes,
         |arr AS (SELECT list(recall_lsh ORDER BY query_id) AS ms,
         |          count(*)::BIGINT AS n, ROUND(AVG(recall_lsh), 6) AS mean
         |        FROM rl),
         |draws AS (SELECT g.range // arr.n AS rep,
         |    ms[(((('0x' || substr(md5(g.range::VARCHAR), 1, 15))::BIGINT
         |          % 2147483647) + 1000003) % 2147483647 % arr.n + 1)::INT] AS m
         |  FROM arr, range(0, $BootReps * $BootMaxN) g
         |  WHERE g.range < $BootReps * arr.n),
         |means AS (SELECT rep, ROUND(AVG(m), 9) AS mm FROM draws GROUP BY 1)
         |SELECT arr.n AS n_units, CAST($BootReps AS BIGINT) AS n_reps,
         |  arr.mean AS mean,
         |  ROUND(quantile_cont(mm, 0.025), 6) AS ci_lo,
         |  ROUND(quantile_cont(mm, 0.975), 6) AS ci_hi
         |FROM means, arr GROUP BY 1, 2, 3""".stripMargin,

    // Permutation replay: the same recall panel as q211, keyed-hash sign
    // flips per (rep, unit index), 1e-9-rounded resample means, add-one
    // tail. The static range bound is the q212 convention.
    "q217_perm_test" ->
      s"""WITH $annRecallCtes,
         |pnl AS (SELECT rl.query_id, recall_lsh - recall_ivf AS d
         |        FROM rl JOIN ri USING (query_id)),
         |arr AS (SELECT list(d ORDER BY query_id) AS ds,
         |          count(*)::BIGINT AS n, ROUND(AVG(d), 9) AS obs
         |        FROM pnl),
         |draws AS (SELECT g.range // arr.n AS rep,
         |    (CASE WHEN ('0x' || substr(md5((g.range // arr.n)::VARCHAR
         |            || ':' || (g.range % arr.n)::VARCHAR), 1, 15))::BIGINT
         |          % 2 = 0 THEN 1.0 ELSE -1.0 END)
         |      * ds[(g.range % arr.n + 1)::INT] AS sd
         |  FROM arr, range(0, $BootReps * $BootMaxN) g
         |  WHERE g.range < $BootReps * arr.n),
         |means AS (SELECT rep, ROUND(AVG(sd), 9) AS m FROM draws GROUP BY 1)
         |SELECT arr.n AS n_units, CAST($BootReps AS BIGINT) AS n_reps,
         |  ROUND(arr.obs, 6) AS mean_diff,
         |  ROUND((1 + SUM(CASE WHEN ABS(m) >= ABS(arr.obs) THEN 1 ELSE 0 END))
         |        / ($BootReps + 1.0), 6) AS p_value
         |FROM means, arr GROUP BY 1, 2, 3""".stripMargin,

    "q198_embed_cov" ->
      s"""WITH $covCtes
         |SELECT CAST(di AS BIGINT) AS dim_i, CAST(dj AS BIGINT) AS dim_j,
         |       nb AS n, cov
         |FROM cvu ORDER BY dim_i, dim_j""".stripMargin,

    // The ledger's base ∪ delta is the whole corpus and the fold is
    // additive, so the served matrix replays as the one-shot q198 chain.
    "q209_moments_ledger" ->
      s"""WITH $covCtes
         |SELECT CAST(di AS BIGINT) AS dim_i, CAST(dj AS BIGINT) AS dim_j,
         |       nb AS n, cov
         |FROM cvu ORDER BY dim_i, dim_j""".stripMargin,

    // Power-iteration replay: symmetrize the rounded covariance, uniform
    // 1e-9-rounded init, PcaRounds unrolled (A·v, λ, normalize) rounds.
    "q199_pca_power" ->
      s"""WITH $covCtes,
         |cvf AS (SELECT di, dj, cov FROM cvu
         |        UNION ALL SELECT dj, di, cov FROM cvu WHERE di <> dj),
         |pv0 AS (SELECT i AS dim, ROUND(1.0 / sqrt(${Dim}.0), 9) AS v
         |        FROM range(1, ${Dim + 1}) t(i)),
         |${(1 to PcaRounds).map(pcaRoundCte).mkString(",\n")}
         |SELECT round, CAST(dim AS BIGINT) AS dim, v, lambda FROM (
         |  SELECT CAST(0 AS BIGINT) AS round, dim, v, 0.0 AS lambda FROM pv0
         |  ${(1 to PcaRounds).map(r =>
              s"UNION ALL SELECT CAST($r AS BIGINT), dim, v, lam FROM pv$r, pl$r")
             .mkString("\n  ")})
         |ORDER BY round, dim""".stripMargin
  )
}
