package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Caches

/**
 * Distributed byte-pair-encoding merge training — the tokenizer-building
 * step of an LLM data pipeline, run corpus-side.
 *
 * Classic BPE (Sennrich et al. 2016, public algorithm) trains on the
 * WORD-FREQUENCY table, not the raw corpus: the corpus collapses to
 * (word, freq) once — a vocabulary-sized table that SATURATES as the
 * corpus grows (new data mostly re-weights existing words), which is why
 * this is tractable at 100 TB: the heavy step is one distributed
 * tokenize + groupBy over the corpus; each merge round then runs over
 * the (cached, vocabulary-sized) word table only.
 *
 * Per round: count adjacent symbol pairs (weighted by word frequency,
 * overlapping slots counted — "aaa" contributes (a,a) twice), pick the
 * most frequent pair (ties broken lexicographically), and rewrite every
 * word, merging occurrences greedily left-to-right ("aaaa" under (a,a)
 * → [aa, aa]; an occurrence is skipped iff its left symbol was consumed
 * by the previous merge). The argmax is a 1-row driver probe (the same
 * bounded-collect class as the Lloyd centroid refinements).
 *
 * The rewrite is TOKEN-level, not string-level: words are arrays of
 * symbols, and greedy occurrence selection is the per-word window
 * recurrence "match AND even offset within its run of consecutive
 * matches" (runs only arise for self-pairs like (a,a); for l ≠ r every
 * match merges). A delimiter-string `replace` — the tempting one-liner —
 * is WRONG here: replacing ";l;r;" with ";lr;" consumes the trailing
 * delimiter that is also the NEXT occurrence's leading delimiter, so
 * adjacent occurrences ("abab" under (a,b), or any run) are silently
 * skipped; the seeded fuzz witness against a reference implementation
 * (FuzzOpsSpec) is what caught exactly that. All windows partition by
 * word — vocabulary-sized, no unpartitioned stage — and the DuckDB
 * oracle replays the same recurrence round by round.
 */
object Bpe {

  /** The (word, freq, toks) table: lower-cased [a-z]+ words of `textCol`,
    * length-capped (BPE vocabularies cap word length; also bounds the
    * per-word window work), with the initial per-character symbol
    * array. */
  def wordTable(docs: DataFrame, textCol: String = "text",
                maxWordLen: Int = 12): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "[^a-z]+")).as("word"))
      .where(length(col("word")).between(1, maxWordLen))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("toks", expr("filter(split(word, ''), x -> x <> '')"))

  /** GPT-2-style category pre-tokenization pattern (Radford et al. 2019;
    * the public tiktoken pattern family): contraction suffixes, then
    * space-prefixed letter runs, digit runs, punctuation runs, then bare
    * whitespace runs. Deliberately LOOKAHEAD-FREE (the original's
    * `\s+(?!\S)` clause is dropped) so RE2-based engines — DuckDB's
    * regexp_extract_all, the oracle — replay it byte-identically with
    * Java's regex. Case-PRESERVING, space-preserving: " The" and "the"
    * are distinct pre-tokens, exactly the property whitespace
    * tokenization cannot express. */
  val PreTokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** The pre-tokenized (word, freq, toks) table for the production BPE
    * shape: regex category matches instead of whitespace words, and
    * BYTE FALLBACK for the initial alphabet — ASCII chars seed as
    * themselves, any other char seeds as its UTF-8 bytes rendered
    * `<0xNN>` (the SentencePiece byte-fallback convention), so no
    * corpus character is ever OOV and the merge machinery
    * (`pairCounts`/`applyMerge`/`trainMergesFrom`) carries over
    * UNCHANGED. Pure Column plan: regexp_extract_all → explode →
    * count, symbol seeding via hex(encode(·)) — no UDF. `maxTokLen` is
    * in UTF-16 units engine-side vs codepoints oracle-side; identical
    * for every BMP string (astral chars would need a codepoint-length
    * Column — not worth it for a length cap). */
  def preTokenTable(docs: DataFrame, textCol: String = "text",
                    maxTokLen: Int = 16): DataFrame = {
    val chars = filter(split(col("word"), ""), c => c =!= "")
    val toks = flatten(transform(chars, c =>
      when(ascii(c) < 128, array(c))
        .otherwise(transform(
          sequence(lit(0), (length(hex(encode(c, "UTF-8"))) / 2).cast("int") - 1),
          b => concat(lit("<0x"),
            hex(encode(c, "UTF-8")).substr(b * 2 + 1, lit(2)), lit(">"))))))
    docs
      .select(explode(regexp_extract_all(col(textCol),
        lit(PreTokenPattern), lit(0))).as("word"))
      .where(length(col("word")).between(1, maxTokLen))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("toks", toks)
  }

  /** Adjacent-pair frequencies of a symbol-array word table: map-only
    * extraction (transform → explode; no join) then one hash aggregate
    * on the pair. Overlapping slots count ("aaa" → (a,a) twice). */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("freq"),
        explode(expr(
          """CASE WHEN size(toks) >= 2
            |THEN transform(sequence(1, size(toks) - 1),
            |               i -> struct(toks[i - 1] AS l, toks[i] AS r))
            |ELSE array() END""".stripMargin)).as("p"))
      .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
      .agg(sum(col("freq")).as("cnt"))

  /** One greedy merge of (l, r) applied to every word: occurrence i
    * merges iff (toks[i], toks[i+1]) = (l, r) and occurrence i−1 did not
    * merge — equivalently, iff its offset within its run of consecutive
    * matches is even (runs only exist for l = r). Window work is
    * per-word; result preserves (word, freq). */
  def applyMerge(words: DataFrame, l: String, r: String): DataFrame = {
    val wOrd = Window.partitionBy(col("word")).orderBy(col("pos"))
    val ex = words.select(col("word"), col("freq"),
      posexplode(col("toks")).as(Seq("pos", "tok")))
    val m0 = ex.withColumn("mtch",
      col("tok") === l &&
        coalesce(lead(col("tok"), 1).over(wOrd) === r, lit(false)))
    // Gaps-and-islands: consecutive matching positions share a group id;
    // even offset from the group head = the greedy-selected occurrences.
    val wm = Window.partitionBy(col("word"), col("mtch")).orderBy(col("pos"))
    val g = m0.withColumn("grp",
      when(col("mtch"), col("pos") - row_number().over(wm)))
    val wg = Window.partitionBy(col("word"), col("grp"))
    val mm = g.withColumn("m",
      col("mtch") && (col("pos") - min(col("pos")).over(wg)) % 2 === 0)
    val pv = mm.withColumn("pm",
      coalesce(lag(col("m"), 1).over(wOrd), lit(false)))
    pv.where(!col("pm"))
      .withColumn("ntok", when(col("m"), lit(l + r)).otherwise(col("tok")))
      .groupBy(col("word"), col("freq"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, ntok))), s -> s.ntok)")
        .as("toks"))
  }

  /** ENCODE face: sequence length of every document under the learned
    * merges — the budgeting number (packing, pricing, context windows) a
    * pipeline needs after training a tokenizer. Applies the merge list
    * in rank order to the VOCABULARY (each distinct word merged once,
    * however often it occurs) and joins per-word subword counts back to
    * the document word stream — corpus text is scanned once, the merge
    * rounds never touch it. Output: (idCol, n_words, n_subwords);
    * documents whose words are all filtered (non-alphabetic or over
    * `maxWordLen`) produce no row. */
  def encodedLengths(docs: DataFrame, merges: Seq[(String, String)],
                     textCol: String = "text", idCol: String = "doc_id",
                     maxWordLen: Int = 12): DataFrame = {
    var words = wordTable(docs, textCol, maxWordLen)
    for ((l, r) <- merges) words = applyMerge(words, l, r)
    val lens = words.select(col("word"), size(col("toks")).cast("long").as("n_sub"))
    docs.select(col(idCol), explode(split(lower(col(textCol)), "[^a-z]+")).as("word"))
      .where(length(col("word")).between(1, maxWordLen))
      .join(lens, Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_subwords"))
  }

  /** Tokenizer EVALUATION face: per-language fertility and compression
    * of a trained merge list — the two numbers tokenizer papers report
    * (fertility = pieces per word, Ács 2019; compression = characters
    * per piece) and the go/no-go gate before committing a vocabulary to
    * a training run: a language with outlier fertility is under-served
    * by the merges and will burn context window. Same shape as
    * `encodedLengths` (merges apply to the VOCABULARY once; the corpus
    * word stream joins per-word subword counts back) with the aggregate
    * keyed by language instead of document — output is one row per
    * language, so the result is driver-sized regardless of corpus scale.
    * Output: (langCol, n_words, n_subwords, n_chars, fertility,
    * chars_per_piece), ratios rounded 1e-6. */
  def tokenizerEval(docs: DataFrame, merges: Seq[(String, String)],
                    textCol: String = "text", langCol: String = "lang",
                    maxWordLen: Int = 12): DataFrame = {
    var words = wordTable(docs, textCol, maxWordLen)
    for ((l, r) <- merges) words = applyMerge(words, l, r)
    val lens = words.select(col("word"), size(col("toks")).cast("long").as("n_sub"))
    docs.select(col(langCol),
        explode(split(lower(col(textCol)), "[^a-z]+")).as("word"))
      .where(length(col("word")).between(1, maxWordLen))
      .join(lens, Seq("word"))
      .groupBy(col(langCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_subwords"),
        sum(length(col("word")).cast("long")).as("n_chars"))
      .select(col(langCol), col("n_words"), col("n_subwords"), col("n_chars"),
        round(col("n_subwords").cast("double") / col("n_words").cast("double"), 6)
          .as("fertility"),
        round(col("n_chars").cast("double") / col("n_subwords").cast("double"), 6)
          .as("chars_per_piece"))
  }

  /** Tokenizer evaluation under the PRE-TOKENIZED face: per-language
    * fertility/compression of merges trained on `preTokenTable` — the
    * q148 report shape over the production tokenizer. The corpus stream
    * here is the regex pre-token stream (case/space-preserving) and
    * `n_chars` counts pre-token CHARACTERS (not byte-fallback symbols),
    * so compression stays comparable with the whitespace face's
    * chars-per-piece. */
  def preTokenizerEval(docs: DataFrame, merges: Seq[(String, String)],
                       textCol: String = "text", langCol: String = "lang",
                       maxTokLen: Int = 16): DataFrame = {
    var words = preTokenTable(docs, textCol, maxTokLen)
    for ((l, r) <- merges) words = applyMerge(words, l, r)
    val lens = words.select(col("word"),
      size(col("toks")).cast("long").as("n_sub"))
    docs.select(col(langCol),
        explode(regexp_extract_all(col(textCol),
          lit(PreTokenPattern), lit(0))).as("word"))
      .where(length(col("word")).between(1, maxTokLen))
      .join(lens, Seq("word"))
      .groupBy(col(langCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_subwords"),
        sum(length(col("word")).cast("long")).as("n_chars"))
      .select(col(langCol), col("n_words"), col("n_subwords"), col("n_chars"),
        round(col("n_subwords").cast("double") / col("n_words").cast("double"), 6)
          .as("fertility"),
        round(col("n_chars").cast("double") / col("n_subwords").cast("double"), 6)
          .as("chars_per_piece"))
  }

  /** ENCODE face with CONTENT: per-document token-ID sequences under the
    * learned merges — what sequence packing and shard materialization
    * actually consume (`encodedLengths` stops at counts). Merges apply to
    * the VOCABULARY once (corpus text scanned once, as `encodedLengths`);
    * piece ids are the dense 0-based lexicographic rank of the distinct
    * final subwords, assigned by the two-phase distributed rank
    * (`Ids.denseIds` — no single-partition stage); per-word id arrays
    * join back to the positioned document word stream and flatten in
    * word order. Output: (idCol, ids array<long>); documents whose words
    * are all filtered produce no row. The id table is vocabulary-sized —
    * it saturates, and the per-word join broadcasts when it fits. */
  def encodedIds(docs: DataFrame, merges: Seq[(String, String)],
                 textCol: String = "text", idCol: String = "doc_id",
                 maxWordLen: Int = 12): DataFrame = {
    var words = wordTable(docs, textCol, maxWordLen)
    for ((l, r) <- merges) words = applyMerge(words, l, r)
    val pieces = Ids.denseIds(
      words.select(explode(col("toks")).as("piece")).distinct(),
      Seq(col("piece")), "piece_id")
    val wids = words
      .select(col("word"), posexplode(col("toks")).as(Seq("tp", "piece")))
      .join(pieces, Seq("piece"))
      .groupBy(col("word"))
      .agg(transform(
        array_sort(collect_list(struct(col("tp"), col("piece_id")))),
        s => s.getField("piece_id")).as("wids"))
    docs
      .select(col(idCol),
        posexplode(split(lower(col(textCol)), "[^a-z]+")).as(Seq("wp", "word")))
      .where(length(col("word")).between(1, maxWordLen))
      .join(wids, Seq("word"))
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("wp"), col("wids")))),
        s => s.getField("wids"))).as("ids"))
  }

  /** Train `nMerges` BPE merges over `docs` on the whitespace/[a-z]
    * word table. Returns the merge table (round, lhs, rhs, merged, cnt)
    * — driver-sized by definition (one row per merge), like a centroid
    * table. Stops early if the corpus runs out of pairs. */
  def trainMerges(spark: SparkSession, docs: DataFrame, nMerges: Int,
                  textCol: String = "text", maxWordLen: Int = 12,
                  checkpointEvery: Int = 0): DataFrame =
    trainMergesFrom(spark, wordTable(docs, textCol, maxWordLen), nMerges,
      checkpointEvery)

  /** Train over ANY (word, freq, toks) table — the whitespace face
    * (`wordTable`) and the regex/byte-fallback face (`preTokenTable`)
    * share every merge-round mechanism. */
  def trainMergesFrom(spark: SparkSession, table: DataFrame, nMerges: Int,
                      checkpointEvery: Int = 0): DataFrame = {
    require(checkpointEvery >= 0, "trainMerges: checkpointEvery must be >= 0")
    var words = Caches.cacheOnce(table)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var round = 1
    var exhausted = false
    while (round <= nMerges && !exhausted) {
      // 1-row bounded driver probe: TakeOrderedAndProject, no global sort.
      val best = pairCounts(words)
        .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Row(round.toLong, l, r, l + r, c)
        val prev = words
        // caching pins the DATA each round, but the logical tree still
        // nests one applyMerge rewrite per round — at production vocab
        // sizes (thousands of merges) the driver's per-action analysis
        // cost grows with it. checkpointEvery > 0 seals the lineage
        // behind a leaf scan every K rounds (the q57 pinPlan move);
        // values are unchanged — the checkpoint materializes exactly the
        // table count() was about to build anyway. After materializing,
        // the pre-checkpoint cache entry is released too (the checkpoint
        // partitions hold the data; a lost executor recomputes from the
        // surviving lineage, slower but correct).
        val cached = Caches.cacheOnce(applyMerge(prev, l, r))
        words =
          if (checkpointEvery > 0 && round % checkpointEvery == 0)
            cached.localCheckpoint(eager = false)
          else cached
        words.count() // materialize (the per-round probe reads it next)
        // Release discipline is gated on checkpointEvery (r13): DEEP
        // production runs (thousands of merges, checkpointEvery > 0)
        // must not pin one vocabulary table per round, so they release
        // as before. SHALLOW runs keep the round caches — every word
        // table is vocabulary-sized (saturating), and releasing them
        // forced each re-invocation (bench reps; the q116/q126/q146/q148
        // family trains the identical chain) to rebuild the corpus word
        // table and every merge round from scratch. cacheOnce keys on
        // the canonical plan, so the family shares ONE chain per session.
        if (checkpointEvery > 0) {
          Caches.release(prev)
          if (words ne cached) Caches.release(cached)
        }
        round += 1
      }
    }
    if (checkpointEvery > 0) Caches.release(words)
    val schema = StructType(Seq(
      StructField("round", LongType, nullable = false),
      StructField("lhs", StringType, nullable = false),
      StructField("rhs", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(merges.toSeq: _*), schema)
  }
}
