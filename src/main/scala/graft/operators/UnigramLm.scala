package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Caches

/**
 * Unigram-LM (SentencePiece-style) tokenizer training — the BPE sibling
 * production tokenizers actually ship (Kudo 2018, "Subword
 * Regularization", public algorithm), trained corpus-side with the same
 * scale shape as `Bpe`: the corpus collapses ONCE to the saturating
 * (word, freq) vocabulary table; every EM round then runs over that
 * bounded table only, with the evolving piece vocabulary as bounded
 * driver state shipped back as a literal map (the Lloyd-round pattern
 * q116/q133/q137 already use).
 *
 * The variant here is deterministic hard-EM: per round, every word is
 * segmented by VITERBI under the current piece log-probabilities
 * (dp[i] = max_j dp[j] + logp(word[j..i)), j scanned ascending, strict
 * improvement so ties keep the smallest j = the longest piece), piece
 * counts re-aggregate weighted by word frequency, zero-count multi-char
 * pieces drop (single characters always survive — segmentation
 * coverage), and probabilities re-estimate add-one smoothed:
 * p = (cnt + 1) / (total + |kept|), log rounded 1e-9 so the whole
 * trajectory is engine-reproducible. After the EM rounds the vocabulary
 * prunes to `targetVocab`: all single characters + the top multi-char
 * pieces by (count desc, piece asc), renormalized the same way.
 *
 * The Viterbi is ONE pure Column expression (nested HOF folds over
 * ≤ maxWordLen positions, vocab lookups against the broadcast literal
 * map) — no shuffle, no UDF; it runs interpreted, but only over the
 * vocabulary-sized word table, never the corpus. The DuckDB oracle
 * replays every round with recursive-CTE DP + backtrack walks.
 *
 * Unseedable pieces score -1e9 per lookup miss, so Viterbi never picks
 * a non-vocab piece while any all-single-char segmentation exists —
 * counts are bounded by |vocab| and the per-round driver collect with
 * them.
 */
object UnigramLm {

  private def rnd9(x: Double): Double = math.rint(x * 1e9) / 1e9

  /** Add-one-smoothed log-probs over the kept (piece, cnt) set:
    * ln((cnt + 1) / (total + |kept|)), rounded 1e-9. */
  private def logProbs(kept: Seq[(String, Long)]): Map[String, Double] = {
    val total = kept.map(_._2).sum.toDouble
    val k = kept.size.toDouble
    kept.map { case (p, c) => p -> rnd9(math.log((c + 1.0) / (total + k))) }.toMap
  }

  /** Viterbi segmentation of `w` under the literal piece→logp map
    * `vlit`, as a pure Column: the piece array of the best-scoring
    * segmentation. dp/backpointer arrays build in one fold over the
    * positions; the cut walk is a second bounded fold. Requires
    * length(w) ≥ 1. */
  def viterbiPieces(w: Column, vlit: Column, maxPieceLen: Int): Column = {
    val n = length(w)
    val dpbp = aggregate(
      sequence(lit(1), n),
      struct(array(lit(0.0)).as("dp"), array(lit(0)).as("bp")),
      (acc, i) => {
        val jmin = greatest(i - maxPieceLen, lit(0))
        val best = aggregate(
          sequence(jmin, i - 1),
          struct(lit(-1e18).as("s"), lit(-1).as("j")),
          (b, j) => {
            val sc = element_at(acc.getField("dp"), j + 1) +
              coalesce(element_at(vlit, w.substr(j + 1, i - j)), lit(-1e9))
            when(sc > b.getField("s"), struct(sc.as("s"), j.as("j"))).otherwise(b)
          })
        struct(
          concat(acc.getField("dp"), array(best.getField("s"))).as("dp"),
          concat(acc.getField("bp"), array(best.getField("j"))).as("bp"))
      })
    val bp = dpbp.getField("bp")
    val cuts = aggregate(
      sequence(lit(1), n),
      array(n),
      (accC, _) => when(element_at(accC, 1) > 0,
          concat(array(element_at(bp, element_at(accC, 1) + 1)), accC))
        .otherwise(accC))
    zip_with(
      slice(cuts, lit(1), size(cuts) - 1),
      slice(cuts, lit(2), size(cuts) - 1),
      (a, b) => w.substr(a + 1, b - a))
  }

  /** One EM count pass: Viterbi-segment every word under `vocab`,
    * aggregate piece counts weighted by word frequency. ≤ |vocab| rows
    * back to the driver. */
  private def emCounts(words: DataFrame, vocab: Map[String, Double],
                       maxPieceLen: Int): Map[String, Long] = {
    val vlit = typedlit(vocab)
    words
      .select(col("freq"),
        explode(viterbiPieces(col("word"), vlit, maxPieceLen)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** The full trajectory: (per-round kept pieces, final pruned vocab).
    * Rounds 1..emRounds are hard-EM; round emRounds+1 is the pruned,
    * renormalized final vocabulary. All driver state is ≤ |vocab|. */
  private def emTrajectory(docs: DataFrame, emRounds: Int, seedMulti: Int,
                           targetVocab: Int, maxPieceLen: Int,
                           maxWordLen: Int, textCol: String)
      : (Seq[(Long, String, Long, Double)], Map[String, Double]) = {
    require(emRounds >= 1, "emRounds must be >= 1")
    val words = Caches.cacheOnce(
      Bpe.wordTable(docs, textCol, maxWordLen).select(col("word"), col("freq")))
    // seed: every substring occurrence of length 1..maxPieceLen, weighted
    // by word frequency; ALL single characters + the top `seedMulti`
    // multi-char pieces (count desc, piece asc). Both collects bounded:
    // the alphabet and the explicit top-k.
    val seedc = Caches.cacheOnce(words
      .select(col("word"), col("freq"),
        explode(sequence(lit(0), length(col("word")) - 1)).as("i"))
      .select(col("word"), col("freq"), col("i"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("l"))
      .where(col("i") + col("l") <= length(col("word")))
      .select(col("word").substr(col("i") + 1, col("l")).as("piece"), col("freq"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt")))
    val chars = seedc.where(length(col("piece")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val multi = seedc.where(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc).limit(seedMulti)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // seedc/words stay cached (r13): both are bounded (piece-vocabulary /
    // word-vocabulary sized, saturating with corpus growth), and the
    // q139/q140/q164 family re-invokes this trajectory with identical
    // plans — releasing per call forced each to rebuild the corpus
    // substring explode from scratch. Session lifecycle (clearAll) owns
    // the release, the cacheOnce contract everywhere else.
    var kept: Seq[(String, Long)] = (chars ++ multi).sortBy(_._1)
    var vocab = logProbs(kept)
    val traj = Seq.newBuilder[(Long, String, Long, Double)]
    for (r <- 1 to emRounds) {
      val cnts = emCounts(words, vocab, maxPieceLen)
      kept = vocab.keys.toSeq.sorted
        .map(p => p -> cnts.getOrElse(p, 0L))
        .filter { case (p, c) => c > 0 || p.length == 1 }
      vocab = logProbs(kept)
      kept.foreach { case (p, c) => traj += ((r.toLong, p, c, vocab(p))) }
    }
    // prune: all single chars + top (targetVocab − #chars) multi-char by
    // (final-round count desc, piece asc), renormalized
    val keptMap = kept.toMap
    val singles = kept.filter(_._1.length == 1)
    val finalMulti = kept.filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(targetVocab - singles.size, 0))
    val fk = (singles ++ finalMulti).sortBy(_._1)
    val vFinal = logProbs(fk)
    fk.foreach { case (p, _) =>
      traj += (((emRounds + 1).toLong, p, keptMap(p), vFinal(p))) }
    (traj.result(), vFinal)
  }

  /** TRAIN face: the full vocabulary trajectory as a driver-sized
    * DataFrame (round, piece, cnt, logp) — rounds 1..emRounds are the
    * hard-EM re-estimates, round emRounds+1 the pruned final vocab. */
  def trainVocab(spark: SparkSession, docs: DataFrame, emRounds: Int,
                 seedMulti: Int, targetVocab: Int, maxPieceLen: Int = 4,
                 maxWordLen: Int = 12, textCol: String = "text"): DataFrame = {
    val (traj, _) = emTrajectory(docs, emRounds, seedMulti, targetVocab,
      maxPieceLen, maxWordLen, textCol)
    val schema = StructType(Seq(
      StructField("round", LongType, nullable = false),
      StructField("piece", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("logp", DoubleType, nullable = false)))
    val rows = traj.map { case (r, p, c, lp) => Row(r, p, c, lp) }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** The trained final vocabulary (piece → logp) — what a deployment
    * freezes and ships into the encode face. */
  def trainedVocab(docs: DataFrame, emRounds: Int, seedMulti: Int,
                   targetVocab: Int, maxPieceLen: Int = 4,
                   maxWordLen: Int = 12,
                   textCol: String = "text"): Map[String, Double] =
    emTrajectory(docs, emRounds, seedMulti, targetVocab,
      maxPieceLen, maxWordLen, textCol)._2

  /** ENCODE face: per-document Viterbi sequence length under a frozen
    * vocabulary — `Bpe.encodedLengths`' shape: pieces are counted once
    * per VOCABULARY word and joined back to the document word stream,
    * so the corpus text is scanned once and the DP never touches it.
    * Output: (idCol, n_words, n_pieces); documents with no qualifying
    * words produce no row. */
  def encodedLengths(docs: DataFrame, vocab: Map[String, Double],
                     maxPieceLen: Int = 4, maxWordLen: Int = 12,
                     textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    require(vocab.nonEmpty, "encodedLengths: vocabulary is empty")
    val vlit = typedlit(vocab)
    val lens = Bpe.wordTable(docs, textCol, maxWordLen)
      .select(col("word"),
        size(viterbiPieces(col("word"), vlit, maxPieceLen)).cast("long").as("n_sub"))
    docs
      .select(col(idCol),
        explode(split(lower(col(textCol)), "[^a-z]+")).as("word"))
      .where(length(col("word")).between(1, maxWordLen))
      .join(lens, Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_pieces"))
  }

  /** WordPiece-style GREEDY longest-match-first segmentation (the BERT
    * tokenizer's algorithm, Devlin et al. 2019 / Song et al. 2021
    * "Fast WordPiece Tokenization"): at each cursor the LONGEST vocab
    * piece starting there is taken — no DP, no scores, just membership.
    * A position with no matching piece (an unseen character) maps the
    * WHOLE word to the single piece "[UNK]" — WordPiece's word-level
    * failure convention, which Viterbi (soft-scoring every piece) does
    * not have. Pure Column: one bounded fold over ≤ length(w) cursor
    * steps, each probing lengths maxPieceLen..1 against the broadcast
    * literal vocab map. Requires length(w) ≥ 1. */
  def greedyPieces(w: Column, vlit: Column, maxPieceLen: Int): Column = {
    val n = length(w)
    val st = aggregate(
      sequence(lit(1), n),
      struct(lit(0).as("pos"),
        array().cast("array<string>").as("ps"), lit(false).as("bad")),
      (acc, _) => {
        val pos = acc.getField("pos")
        val done = acc.getField("bad") || pos >= n
        // longest match: scan maxPieceLen..1, keep the first hit (the
        // sequence bound is clamped to stay valid even when consumed —
        // expressions evaluate eagerly on both branches of the `when`)
        val lbest = aggregate(
          sequence(greatest(least(lit(maxPieceLen), n - pos), lit(1)),
            lit(1), lit(-1)),
          lit(0),
          (b, l) => when(b > 0, b).otherwise(
            when(element_at(vlit, w.substr(pos + 1, l)).isNotNull, l)
              .otherwise(lit(0))))
        when(done, acc).otherwise(
          when(lbest === 0,
            struct(n.as("pos"), array(lit("[UNK]")).as("ps"), lit(true).as("bad")))
            .otherwise(struct((pos + lbest).as("pos"),
              concat(acc.getField("ps"),
                array(w.substr(pos + 1, lbest))).as("ps"),
              lit(false).as("bad"))))
      })
    st.getField("ps")
  }

  /** ENCODE face of `greedyPieces` — `encodedLengths`' exact shape
    * (segment the vocabulary word table once, join back to the document
    * word stream) with greedy longest-match instead of Viterbi. The two
    * faces share a frozen vocabulary, so their per-document piece
    * counts are directly comparable — the tokenizer-selection signal.
    * Output: (idCol, n_words, n_pieces). */
  def greedyEncodedLengths(docs: DataFrame, vocab: Map[String, Double],
                           maxPieceLen: Int = 4, maxWordLen: Int = 12,
                           textCol: String = "text",
                           idCol: String = "doc_id"): DataFrame = {
    require(vocab.nonEmpty, "greedyEncodedLengths: vocabulary is empty")
    val vlit = typedlit(vocab)
    val lens = Bpe.wordTable(docs, textCol, maxWordLen)
      .select(col("word"),
        size(greedyPieces(col("word"), vlit, maxPieceLen)).cast("long").as("n_sub"))
    docs
      .select(col(idCol),
        explode(split(lower(col(textCol)), "[^a-z]+")).as("word"))
      .where(length(col("word")).between(1, maxWordLen))
      .join(lens, Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_pieces"))
  }
}
