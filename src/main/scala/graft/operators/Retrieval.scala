package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokensWs

/**
 * Ranked keyword retrieval over a document corpus — the query-side face
 * of a training-data pipeline (benchmark-overlap scoring, targeted
 * curation pulls, "find me documents about X" corpus forensics). The
 * reference has no retrieval operator; this extends its text surface
 * (SURVEY §2.11 EXT-T23) with the standard BM25 ranking function
 * [Robertson & Zaragoza 2009, "The Probabilistic Relevance Framework"].
 *
 * Scale shape (the reason this is NOT "explode everything and join"):
 *
 *  - Document length and the corpus stats (N, avgdl) come from a
 *    MAP-ONLY projection (`size(tokens)`) plus one tiny global
 *    aggregate — the corpus body is never exploded for them.
 *  - Only tokens matching the query terms are exploded and shuffled:
 *    the `array_intersect`-style prefilter happens inside the same
 *    codegen stage as the tokenizer, so the exchange after it carries
 *    (doc, term) rows for matching docs only — at 100 TB with a
 *    handful of query terms that is a vanishing fraction of the scan.
 *  - Per-term document frequencies are an aggregate over that same
 *    small exchange, broadcast back; the final score join keys on
 *    doc_id against the map-side length projection, so Catalyst
 *    broadcasts the (small) scored side.
 *
 * Scoring: idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5));
 * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
 */
object Retrieval {

  /** Exploded (id, term, tf) for tokens ∈ `terms` only — the filter sits
    * below the aggregation exchange. */
  private def termFreqs(docs: DataFrame, terms: Seq[String],
                        idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(filter(tokensWs(col(textCol)), t => t.isInCollection(terms)))
          .as("term"))
      .groupBy("id", "term").agg(count(lit(1)).cast("double").as("tf"))

  /** BM25 scores for every document matching ≥1 query term:
    * (id, bm25), unordered and unrounded — callers own presentation.
    * `terms` must be non-empty and is deduplicated. */
  def bm25(docs: DataFrame, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "bm25: empty query")
    val qTerms = terms.distinct
    // Map-only per-doc length; one scalar aggregate for (N, avgdl).
    val dl = docs.select(col(idCol).as("id"),
      size(tokensWs(col(textCol))).cast("double").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = termFreqs(docs, qTerms, idCol, textCol)
    val df = tf.groupBy("term")
      .agg(countDistinct(col("id")).cast("double").as("df"))
    // tf ⋈ df (broadcast: ≤|terms| rows) ⋈ dl (keyed on id; the tf side
    // is the small one after the term prefilter) × stats (1 row).
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") * (k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    tf.join(broadcast(df), Seq("term"))
      .join(dl, Seq("id"))
      .crossJoin(broadcast(stats))
      .groupBy(col("id"))
      .agg(sum(idf * norm).as("bm25"))
      .select(col("id").as(idCol), col("bm25"))
  }

  /** Presentation face: top-`k` docs by BM25 desc (rounded 1e-6 BEFORE
    * ranking so the order is engine-reproducible), doc id ascending on
    * ties. Output: (idCol, bm25). */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    bm25(docs, terms, k1, b, idCol, textCol)
      .select(col(idCol), round(col("bm25"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)

  /** Reciprocal-rank fusion [Cormack, Clarke & Büttcher 2009] of bounded
    * ranked lists — the standard hybrid-retrieval combiner (sparse BM25 +
    * dense embedding ranks, no score calibration needed):
    * rrf(d) = Σ_lists 1/(rrfK + rank_d), over docs in each list's top
    * `topL`; absence from a list contributes nothing.
    *
    * Each input is (`idCol`, "score") with scores ALREADY rounded to the
    * caller's presentation precision — ranks come from the rounded value
    * (id-ascending tiebreak) so the fused order is engine-reproducible.
    *
    * Scale shape: each list is first capped to `topL` via TakeOrdered (no
    * global sort partition); ranks come from a broadcast theta self-join
    * over the ≤ topL surviving rows — NOT an unpartitioned window — so
    * nothing here ever funnels corpus-sized data through one task. The
    * expensive part of hybrid search is producing the lists, and those
    * operators carry their own scale gates. */
  /** Maximal-Marginal-Relevance diversification [Carbonell & Goldstein
    * 1998] of a BOUNDED candidate list: greedily pick k items maximizing
    * λ·rel − (1−λ)·max_sim-to-already-picked — the reranker that stops a
    * near-dup cluster from filling the whole result page (or the whole
    * few-shot prompt).
    *
    * `candidates` is (vec_id, rel) with rel already presentation-rounded;
    * `vectors` supplies (vec_id, embedding) for the pairwise cosine.
    * Each greedy step is a crossJoin of the ≤|candidates| remaining rows
    * against the ≤k picked vectors (both broadcast-bounded) plus one
    * TakeOrdered(1) whose single winning row comes back to the driver —
    * the Lloyd-round pattern (one bounded row per round), which keeps
    * each step one job over the CACHED candidate panel instead of a
    * lineage that re-evaluates every earlier pick O(k²) times. MMR is
    * inherently sequential, which is why it must only ever run AFTER a
    * top-L cut, never against the corpus.
    * Scores round 1e-6 before each argmax (vec_id tie-break) so the
    * greedy trajectory is engine-reproducible.
    * Output: (step, vec_id, rel, mmr), step 1..k in pick order. */
  def mmrDiversify(candidates: DataFrame, vectors: DataFrame, k: Int,
                   lam: Double = 0.7): DataFrame = {
    require(k >= 1, "mmrDiversify: k must be >= 1")
    require(lam > 0 && lam <= 1, "mmrDiversify: lambda must be in (0, 1]")
    import graft.operators.SimilaritySearch.{cosineWithNorms, l2Norm}
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = candidates.sparkSession
    val cand = graft.core.Caches.cacheOnce(
      candidates.select(col("vec_id"), col("rel"))
        .join(vectors.select(col("vec_id"), col("embedding")), Seq("vec_id"))
        .select(col("vec_id"), col("rel"), col("embedding"),
          l2Norm(col("embedding")).as("nrm")))
    val picked = scala.collection.mutable.ArrayBuffer.empty[Row]
    var outSchema: StructType = null
    var exhausted = false
    for (step <- 1 to k if !exhausted) {
      val ids = picked.map(_.get(1))
      val scored =
        if (ids.isEmpty)
          cand.select(col("vec_id"), col("rel"),
            round(lit(lam) * col("rel"), 6).as("mmr"))
        else {
          val selVecs = broadcast(cand.where(col("vec_id").isin(ids.toSeq: _*))
            .select(col("embedding").as("s_emb"), col("nrm").as("s_nrm")))
          cand.where(!col("vec_id").isin(ids.toSeq: _*))
            .crossJoin(selVecs)
            .select(col("vec_id"), col("rel"),
              cosineWithNorms(col("embedding"), col("s_emb"),
                col("nrm"), col("s_nrm")).as("sim"))
            .groupBy(col("vec_id"), col("rel"))
            .agg(round(lit(lam) * col("rel") -
              lit(1.0 - lam) * max(col("sim")), 6).as("mmr"))
        }
      if (outSchema == null)
        outSchema = StructType(StructField("step", LongType, nullable = false)
          +: scored.schema.fields)
      val win = scored
        .orderBy(col("mmr").desc_nulls_last, col("vec_id")).limit(1)
        .collect() // exactly one bounded row per round, by construction
      if (win.isEmpty) exhausted = true
      else picked += Row.fromSeq(step.toLong +: win(0).toSeq)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .BufferHasAsJava(picked).asJava), outSchema)
  }

  /** (id, rank) over a list's top `topL` by (score desc, id asc): the cap
    * is a TakeOrdered, the rank a broadcast theta self-join over the
    * ≤ topL survivors — never an unpartitioned window. Callers pass
    * scores already rounded to presentation precision so rank boundaries
    * are engine-reproducible. */
  private def rankBounded(l: DataFrame, topL: Int, idCol: String): DataFrame = {
    val capped = l.select(col(idCol).as("id"), col("score"))
      .orderBy(col("score").desc, col("id")).limit(topL)
    val better = (col("b.score") > col("a.score")) ||
      (col("b.score") === col("a.score") && col("b.id") < col("a.id"))
    capped.as("a").join(broadcast(capped.as("b")), better, "left")
      .groupBy(col("a.id").as("id"))
      .agg((count(col("b.id")) + 1L).as("rank"))
  }

  def rrfFuse(lists: Seq[DataFrame], topL: Int, k: Int, rrfK: Int = 60,
              idCol: String = "doc_id"): DataFrame = {
    require(lists.nonEmpty, "rrfFuse: no lists")
    val contribs = lists.map { l =>
      rankBounded(l, topL, idCol)
        .select(col("id"), (lit(1.0) / (lit(rrfK) + col("rank"))).as("contrib"))
    }
    contribs.reduce(_ unionAll _)
      .groupBy(col("id"))
      .agg(round(sum(col("contrib")), 6).as("rrf"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf").desc, col("id"))
      .limit(k)
      .select(col("id").as(idCol), col("rrf"), col("n_lists"))
  }

  /** NDCG@k ranking evaluation [Järvelin & Kekäläinen 2002] of one or
    * more rankers against a graded relevance table — the metric face
    * that decides WHICH retriever serves (beside the ANN tier's
    * recall@k and the kNN tier's accuracy):
    * DCG = Σ_{r≤k} (2^rel − 1)/log2(r + 1), IDCG over the global ideal
    * ordering (rel desc, id asc), NDCG = DCG/IDCG (0 when IDCG = 0).
    *
    * `lists` are (name, (idCol, "score")) with scores rounded; `rel` is
    * (idCol, "rel") with integer grades — docs absent from it grade 0.
    * Ranks ride `rankBounded` (TakeOrdered + broadcast theta join); the
    * ideal head is itself a TakeOrdered over the relevance table, so
    * the whole metric touches corpus-sized data only in that one cut.
    * Output: one row per ranker — (list, dcg, idcg, ndcg). */
  def ndcgAt(lists: Seq[(String, DataFrame)], rel: DataFrame, k: Int,
             idCol: String = "doc_id"): DataFrame = {
    require(lists.nonEmpty, "ndcgAt: no lists")
    require(k >= 1, "ndcgAt: k must be >= 1")
    def gain(relC: Column, rankC: Column): Column =
      (pow(lit(2.0), relC.cast("double")) - 1.0) /
        (log(rankC.cast("double") + 1.0) / math.log(2.0))
    val relTbl = rel.select(col(idCol).as("id"), col("rel"))
    val ideal = rankBounded(
      relTbl.select(col("id"), col("rel").as("score")), k, "id")
      .join(relTbl, Seq("id"))
    val idcg = ideal.agg(coalesce(sum(gain(col("rel"), col("rank"))), lit(0.0))
      .as("idcg"))
    val perList = lists.map { case (name, l) =>
      rankBounded(l, k, idCol)
        .join(relTbl, Seq("id"), "left")
        .select(gain(coalesce(col("rel"), lit(0)), col("rank")).as("g"))
        .agg(coalesce(sum(col("g")), lit(0.0)).as("dcg"))
        .select(lit(name).as("list"), col("dcg"))
    }
    perList.reduce(_ unionAll _)
      .crossJoin(broadcast(idcg))
      .select(col("list"), round(col("dcg"), 6).as("dcg"),
        round(col("idcg"), 6).as("idcg"),
        round(when(col("idcg") > 0.0, col("dcg") / col("idcg"))
          .otherwise(lit(0.0)), 6).as("ndcg"))
  }
}
