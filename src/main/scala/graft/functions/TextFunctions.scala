package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text analysis for large-scale training-data pipelines: tokenization,
 * quality scoring, language identification, document fingerprinting.
 *
 * Everything here is a PURE Column expression built from
 * `org.apache.spark.sql.functions` — no UDFs, so the whole pipeline stays
 * inside whole-stage codegen and is embarrassingly parallel over document
 * partitions (no shuffle at all for per-document scoring; 100 TB of text
 * is a map-only job). Each primitive is deliberately restricted to
 * operations with identical semantics in ANSI SQL engines (verified
 * against DuckDB in the oracle gate).
 */
object TextFunctions {

  /** 60-bit deterministic string hash: first 15 hex digits of md5.
    * Stable across engines (md5 is md5 everywhere) and fits a BIGINT with
    * headroom for modular arithmetic without overflow. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Prime modulus for the MinHash permutation family: 2^31−1 (Mersenne).
    * Reducing hash60 into [0, M) FIRST keeps every intermediate product
    * under 2^37 — no int64 overflow in ANSI engines. */
  val HashPermMod = 2147483647L

  /** Keyed variant for MinHash permutation families:
    * h_i(x) = (a_i·(hash60(x) mod M) + b_i) mod M with a_i = 2i+1 (odd),
    * b_i = 1000003·(i+1). Reproducible in plain SQL. */
  def hashPerm(c: Column, perm: Int): Column =
    hashPermOf(hash60(c) % HashPermMod, lit(perm))

  /** Permutation hash over an ALREADY-REDUCED base hash g ∈ [0, M); the
    * permutation index may itself be a column (for signature arrays built
    * with `transform(sequence(...))`). */
  def hashPermOf(g: Column, perm: Column): Column =
    pmod(g * (perm * 2L + 1L) + (perm + 1L) * 1000003L, lit(HashPermMod))

  /** Canonical text form for dedup: trim, lowercase, collapse whitespace
    * runs to single spaces. Punctuation-preserving (canonicalization must
    * not merge genuinely different documents); engine-identical semantics
    * (the oracle applies the same regex with the global flag). */
  def canonicalText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Whitespace tokens of trimmed text; empty/blank text → empty array. */
  def tokensWs(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** Whitespace token count. */
  def tokenCountWs(c: Column): Column = size(tokensWs(c))

  // --- sentence segmentation (rule-based, lookaround-free) ---------------

  /** Abbreviations whose trailing period never ends a sentence. Shared
    * verbatim with the oracle SQL (RE2-safe: \b + capture groups, no
    * lookaround — the q153 pattern-sharing stance). */
  val SentAbbrevPattern = "(?i)\\b(mr|mrs|ms|dr|prof|sr|jr|etc|vs|st|no|fig|al)\\."
  val SentEgPattern = "(?i)\\b(e)\\.(g)\\."
  val SentIePattern = "(?i)\\b(i)\\.(e)\\."
  val SentDecimalPattern = "([0-9])\\.([0-9])"
  val SentInitialPattern = "(^|[\\s])([A-Za-z])\\."
  val SentBreakPattern = "([.!?]+)[\\s]+"

  /** Sentinels for the protect-then-split rewrite: control chars that
    * cannot occur in tokenized text (chr(1)/chr(2) in the oracle SQL). */
  val SentDot = "\u0001"
  val SentBreak = "\u0002"

  /**
   * Rule-based sentence segmentation as ONE pure-Column rewrite chain —
   * the granularity upgrade under bitext mining, ROUGE, and dedup
   * (production MT curation mines SENTENCES, not documents). A
   * deterministic closed form (the EXT-T38 stance: no model, no UDF, no
   * lookaround so the identical patterns replay in RE2/DuckDB):
   *
   *  1. protect non-terminal periods by rewriting them to a sentinel —
   *     e.g./i.e., the abbreviation list, decimals (3.14), and
   *     single-letter initials (J. Smith);
   *  2. rewrite every remaining terminator run followed by whitespace
   *     ([.!?]+\s+) to a break sentinel;
   *  3. split on the break, trim, restore protected periods, and drop
   *     empty fragments.
   *
   * Rewrites scan left-to-right non-overlapping in both engines, so the
   * edge behavior (e.g. "1.2.3" protecting only the first dot) is
   * identical by construction. Map-only; order within the array is
   * document order. Returns array<string>.
   */
  def sentences(c: Column): Column = {
    val p1 = regexp_replace(c, SentEgPattern, s"$$1$SentDot$$2$SentDot")
    val p2 = regexp_replace(p1, SentIePattern, s"$$1$SentDot$$2$SentDot")
    val p3 = regexp_replace(p2, SentAbbrevPattern, s"$$1$SentDot")
    val p4 = regexp_replace(p3, SentDecimalPattern, s"$$1$SentDot$$2")
    val p5 = regexp_replace(p4, SentInitialPattern, s"$$1$$2$SentDot")
    val p6 = regexp_replace(p5, SentBreakPattern, s"$$1$SentBreak")
    filter(
      transform(split(p6, SentBreak),
        s => trim(regexp_replace(s, SentDot, "."))),
      s => s =!= "")
  }

  /** BPE-ish subword count: lowercase runs, capitalized runs, single
    * digits, and isolated symbols each count as one token — a cheap,
    * deterministic proxy for byte-pair-encoded sequence length. */
  val BpeTokenPattern = "[a-z]+|[A-Z][a-z]*|[0-9]|[^a-zA-Z0-9\\s]"
  def tokenCountBpe(c: Column): Column =
    regexp_count(c, lit(BpeTokenPattern)).cast("long")

  /** Count of punctuation/symbol characters. */
  def punctCount(c: Column): Column =
    regexp_count(c, lit("[^a-zA-Z0-9\\s]")).cast("long")

  /** Punctuation chars per character of text (0 for empty text). */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, 0.0)
      .otherwise(punctCount(c).cast("double") / length(c).cast("double"))

  /** Number of tokens that appear in `words` (exact token match — no
    * substring false-positives). Tokens are lowercased before the hit
    * test, so sentence-initial "The" counts like "the"; the marker lists
    * are expected lowercase. */
  def wordHits(c: Column, words: Seq[String]): Column =
    size(filter(tokensWs(c), t => lower(t).isin(words.map(_.asInstanceOf[Any]): _*)))

  /** English-ish stopword list used by the default quality score. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "for", "on", "with")

  /** Fraction of tokens that are stopwords (0 for empty text). */
  def stopwordRatio(c: Column, words: Seq[String] = Stopwords): Column = {
    val n = tokenCountWs(c)
    when(n === 0, 0.0).otherwise(wordHits(c, words).cast("double") / n.cast("double"))
  }

  /**
   * Heuristic document quality in [0,1]: rewards reasonable length and a
   * natural-language stopword rate, penalizes symbol noise. The exact
   * formula (including evaluation order) is part of the contract — the
   * oracle recomputes it verbatim:
   *
   *   q = max(0, 0.5·min(1, tokens/50) + 0.5·min(1, 4·stopRatio)
   *              − 0.25·min(1, 10·punctRatio))
   */
  def qualityScore(c: Column): Column = {
    val lenScore = least(lit(1.0), tokenCountWs(c).cast("double") / 50.0)
    val stopScore = least(lit(1.0), stopwordRatio(c) * 4.0)
    val punctPen = least(lit(1.0), punctRatio(c) * 10.0)
    greatest(lit(0.0), lenScore * 0.5 + stopScore * 0.5 - punctPen * 0.25)
  }

  /**
   * Gopher-style quality rule battery (after Rae et al. 2021,
   * "Scaling Language Models: ... Gopher", Appendix A — the standard
   * rule-based pre-filter the quality classifiers run AFTER): one
   * struct of per-document statistics, per-rule pass flags, and the
   * conjunction. Column-pure (codegen'd HOFs over the token array) —
   * map-only, streams unchanged, oracle replays every rule in SQL.
   *
   * Rules (pass conditions):
   *  - words:    minWords ≤ token count ≤ maxWords
   *  - meanlen:  mean word length in [3, 10] characters
   *  - symbol:   (# of '#' or '...' occurrences) / words ≤ 0.1
   *  - bullet:   ≤ 90% of lines start with a bullet ([-*•])
   *  - ellipsis: ≤ 30% of lines end with '...' or '…'
   *  - alpha:    ≥ 80% of words contain an alphabetic character
   *  - stop:     ≥ 2 distinct stopwords present
   *
   * Ratios round 1e-6 BEFORE the threshold comparison so the flag
   * boundary is engine-reproducible. Empty text: n_words = 0,
   * mean_word_len NULL, every frac 0 or NULL, pass false (words rule).
   */
  def gopherStats(c: Column, minWords: Int = 20, maxWords: Int = 100000,
                  stopwords: Seq[String] = Stopwords): Column = {
    val tk = tokensWs(c)
    val n = size(tk)
    val nD = n.cast("double")
    val meanLen = when(n === 0, lit(null).cast("double"))
      .otherwise(round(aggregate(tk, lit(0L), (a, t) => a + length(t))
        .cast("double") / nD, 6))
    val symbolRatio = when(n === 0, lit(null).cast("double"))
      .otherwise(round(regexp_count(c, lit("#|\\.\\.\\.")).cast("double") / nD, 6))
    val lines = split(c, "\n")
    val nl = size(lines).cast("double")
    val bulletFrac = round(
      size(filter(lines, l => l.rlike("^\\s*[-*•]"))).cast("double") / nl, 6)
    val ellipsisFrac = round(
      size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("double") / nl, 6)
    val alphaFrac = when(n === 0, lit(null).cast("double"))
      .otherwise(round(
        size(filter(tk, t => t.rlike("[a-zA-Z]"))).cast("double") / nD, 6))
    val nStop = size(array_intersect(transform(tk, lower _), typedlit(stopwords)))
    // every rule coalesces to false: on NULL text the stat columns are
    // NULL by design, but a NULL `pass` (or per-rule flag) would leak to
    // non-filter consumers — NULL text deterministically fails
    val rWords = coalesce(n >= minWords && n <= maxWords, lit(false))
    val rMeanLen = coalesce(meanLen >= 3.0 && meanLen <= 10.0, lit(false))
    val rSymbol = coalesce(symbolRatio <= 0.1, lit(false))
    val rBullet = coalesce(bulletFrac <= 0.9, lit(false))
    val rEllipsis = coalesce(ellipsisFrac <= 0.3, lit(false))
    val rAlpha = coalesce(alphaFrac >= 0.8, lit(false))
    val rStop = coalesce(nStop >= 2, lit(false))
    struct(
      n.cast("long").as("n_words"), meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"), bulletFrac.as("bullet_frac"),
      ellipsisFrac.as("ellipsis_frac"), alphaFrac.as("alpha_frac"),
      nStop.cast("long").as("n_stop"),
      rWords.as("r_words"), rMeanLen.as("r_meanlen"), rSymbol.as("r_symbol"),
      rBullet.as("r_bullet"), rEllipsis.as("r_ellipsis"), rAlpha.as("r_alpha"),
      rStop.as("r_stop"),
      (rWords && rMeanLen && rSymbol && rBullet && rEllipsis && rAlpha && rStop)
        .as("pass"))
  }

  /**
   * Deflate compression ratio (compressed/raw bytes) — the Gopher-family
   * quality signal that catches what token statistics miss: machine-
   * generated or template text compresses far below natural prose.
   *
   * Deliberately a Scala UDF, not a Catalyst expression: the kernel is
   * the JVM's zlib Deflater — there is no SQL-expressible form to
   * codegen, and the exact byte count varies across zlib builds, so no
   * cross-engine oracle exists either. Spec-gated instead (ordering
   * properties: repetitive < prose < ratio ≤ ~1, empty → 1.0,
   * null-safe), and thresholds on it should be calibrated per
   * deployment, not hard-coded. Map-only like the rest of the scoring
   * tier — streams unchanged.
   */
  def compressionRatio(c: Column): Column = compressionRatioUdf(c)

  private lazy val compressionRatioUdf =
    udf { (s: String) =>
      if (s == null) null
      else {
        val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        if (bytes.isEmpty) java.lang.Double.valueOf(1.0)
        else {
          val d = new java.util.zip.Deflater()
          try {
            d.setInput(bytes); d.finish()
            val buf = new Array[Byte](8192)
            var n = 0L
            while (!d.finished()) n += d.deflate(buf)
            java.lang.Double.valueOf(n.toDouble / bytes.length)
          } finally d.end()
        }
      }
    }

  /** Marker function-words per language for the n-gram/word language-ID
    * heuristic — the highest-frequency closed-class words of each
    * language, which a marker-count classifier leans on. Extend freely;
    * langId is generic over the profile map, and q96's confusion-matrix
    * gate pins accuracy whenever this table changes. Words shared across
    * languages (es/fr "la", es/pt "de") are fine: argmax decides, and
    * exact ties break to the alphabetically-first language. */
  val LangProfiles: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "und", "ist", "nicht", "das", "ein", "eine",
      "mit", "von", "auf", "sich", "dem", "den", "zu", "auch"),
    "en" -> Seq("the", "and", "of", "is", "to", "that", "a", "in", "it",
      "for", "with", "was", "are", "this", "not", "have"),
    "es" -> Seq("el", "la", "de", "que", "los", "una", "en", "se", "por",
      "con", "para", "las", "del", "como", "más", "pero"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une", "dans", "pour",
      "qui", "sur", "pas", "par", "au", "est", "plus", "avec"),
    "it" -> Seq("il", "di", "che", "non", "per", "con", "sono", "del",
      "si", "gli", "anche", "come", "alla", "della"),
    "nl" -> Seq("het", "een", "van", "niet", "aan", "ook", "voor", "naar",
      "zijn", "maar", "bij", "dat", "met", "hij"),
    "pl" -> Seq("nie", "się", "jest", "oraz", "ale", "czy", "tak", "jako",
      "przez", "tylko", "być", "już", "tym", "które"),
    "pt" -> Seq("não", "uma", "os", "das", "dos", "são", "como", "mais",
      "foi", "pelo", "pela", "você", "está", "também"),
    "sv" -> Seq("och", "att", "det", "som", "på", "är", "av", "för",
      "till", "inte", "med", "han", "om", "ett"),
    "tr" -> Seq("bir", "ve", "bu", "için", "ile", "olarak", "gibi",
      "daha", "çok", "ama", "kadar", "sonra", "var", "ben"),
    "vi" -> Seq("của", "và", "là", "có", "không", "được", "trong", "cho",
      "người", "những", "một", "các", "đã", "này"))

  /**
   * Language ID: argmax of per-language marker-token hits; ties break to
   * the alphabetically-first language; zero hits everywhere → "und".
   * Implemented as a sort over (−score, lang) structs so it stays a single
   * codegen'd expression for any profile map.
   */
  def langId(c: Column, profiles: Map[String, Seq[String]] = LangProfiles): Column = {
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct((-wordHits(c, markers)).cast("long").as("neg"), lit(lang).as("lang"))
    }
    val best = element_at(sort_array(array(scored: _*)), 1)
    when(best.getField("neg") === 0L, lit("und")).otherwise(best.getField("lang"))
  }

  /** Bulk face of [[langId]] — row-identical results, scan-shaped plan:
    * the Column face runs one interpreted HOF filter PER LANGUAGE per
    * row (11 re-tokenizations of every document — HOF lambdas never
    * enter codegen); this face tokenizes once, explodes, broadcast-joins
    * the ≤ |langs|·|markers| marker table, and takes the per-doc argmax
    * (max hits, alphabetical tie-break — the same order the sorted
    * struct array encodes). Zero-hit and empty documents come back
    * "und" through the left join. Use this for corpus scoring; the
    * Column face stays for ad-hoc row-level use. */
  def langIdBulk(docs: org.apache.spark.sql.DataFrame,
                 profiles: Map[String, Seq[String]] = LangProfiles,
                 idCol: String = "doc_id",
                 textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val markers = profiles.toSeq
      .flatMap { case (l, ws) => ws.map(w => (w, l)) }
      .toDF("__tok", "__lang")
    val hits = docs
      .select(col(idCol), explode(tokensWs(col(textCol))).as("__t"))
      .select(col(idCol), lower(col("__t")).as("__tok"))
      .join(broadcast(markers), Seq("__tok"))
      .groupBy(col(idCol), col("__lang")).agg(count(lit(1)).as("__hits"))
    val best = hits.groupBy(col(idCol))
      .agg(min(struct((-col("__hits")).as("neg"), col("__lang").as("lang")))
        .as("__best"))
      .select(col(idCol), col("__best").getField("lang").as("__pred"))
    docs.join(best, Seq(idCol), "left")
      .withColumn("lang_pred", coalesce(col("__pred"), lit("und")))
      .drop("__pred")
  }

  /** Rolling polynomial fingerprint over the characters of the text:
    * acc ← (31·acc + codepoint) mod 1e9+7. Order-sensitive (anagram-safe),
    * exact in 64-bit arithmetic, reproducible in any engine with a fold.
    * Evaluated by the native codegen'd `RollingFingerprint` expression —
    * the interpreted per-character fold (`fingerprintFold`) computes the
    * identical value ~10× slower and exists as the spec cross-witness. */
  def fingerprint(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.RollingFingerprint(
        org.apache.spark.sql.GraftColumnBridge.expression(c)))

  /** Unicode NFC normalization (UAX #15 canonical composition) — the
    * multilingual front step before ANY content keying: precomposed and
    * decomposed forms of the same text are byte-different but
    * canonically equal, so digests, line hashes, and shingles split
    * without it. Evaluated by the native codegen'd `UnicodeNormalize`
    * expression (ASCII fast path returns the input bytes untouched);
    * DuckDB's `nfc_normalize` is the oracle twin. */
  def nfcNormalize(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.UnicodeNormalize(
        org.apache.spark.sql.GraftColumnBridge.expression(c)))

  /** Declarative-fold witness for `fingerprint` (see above). */
  def fingerprintFold(c: Column): Column =
    aggregate(
      filter(split(c, ""), ch => ch =!= ""),
      lit(0L),
      (acc, ch) => (acc * 31L + ascii(ch).cast("long")) % 1000000007L)

  /** Word n-gram shingles: ["a b c", "b c d", ...]; fewer than n tokens →
    * empty array. */
  def wordShingles(c: Column, n: Int): Column = {
    val toks = tokensWs(c)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Winnowing-style compact fingerprint: min hash60 over the n-gram
    * shingles (null when the doc has fewer than n tokens). Row-level
    * Column form — fine for ad-hoc use, but the md5 runs inside an
    * interpreted HOF; bulk scoring should use `minShingleHashAgg`. */
  def minShingleHash(c: Column, n: Int): Column =
    array_min(transform(wordShingles(c, n), s => hash60(s)))

  /**
   * Bulk n-gram shingle stream: (idCol, sh) — one row per shingle, built
   * with posexplode + window `lead` instead of the `wordShingles` HOF.
   * The HOF form inlines the token-split into its lambda, re-evaluating
   * it PER ELEMENT (O(tokens²) — measured 3.8s just to explode sf0.1's
   * shingles vs 0.3s for the tokens); the window form tokenizes once and
   * stays in codegen. One partition-sort on (id, pos) — free when the
   * input is already id-partitioned.
   */
  def shingleStream(docs: org.apache.spark.sql.DataFrame, n: Int,
                    idCol: String = "doc_id",
                    textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    docs
      .select(col(idCol), posexplode(tokensWs(col(textCol))).as(Seq("pos", "tk")))
      .select(col(idCol),
        concat_ws(" ", (0 until n).map(j =>
          if (j == 0) col("tk") else lead(col("tk"), j).over(w)): _*).as("sh"),
        lead(col("tk"), n - 1).over(w).as("last"))
      .where(col("last").isNotNull) // concat_ws skips NULLs: drop tail stubs
      .select(col(idCol), col("sh"))
  }

  /** Bulk form of `minShingleHash`: shingle stream + codegen'd md5 + one
    * min-aggregate. Returns (idCol, min_shingle); docs with fewer than n
    * tokens are absent (join back with "left" for the NULL the Column
    * form produces). */
  def minShingleHashAgg(docs: org.apache.spark.sql.DataFrame, n: Int,
                        idCol: String = "doc_id",
                        textCol: String = "text"): org.apache.spark.sql.DataFrame =
    shingleStream(docs, n, idCol, textCol)
      .groupBy(idCol).agg(min(hash60(col("sh"))).as("min_shingle"))

  /**
   * TF-IDF-weighted token crosstab (SURVEY §7.5's weighted term
   * similarity): tokens are items, documents are contexts, each cell
   * carries tf · idf_q instead of the raw count, so boilerplate terms
   * stop dominating the correlation core they feed.
   *
   * idf is QUANTIZED to integer milli-nats — idf_q = round(1000·ln(N/df))
   * — because the downstream co-moment sums must stay EXACT in binary64
   * (SURVEY §5.3): integer cell weights keep Σcnt, Σcnt², Σcnt_a·cnt_b
   * order-independent across shuffle layouts, where raw-double idf would
   * make partial-aggregation order observable. Terms in every document
   * (idf_q = 0) carry no signal and are dropped.
   *
   * Scale: two hash aggregates (tf cells, then df per term) and a
   * broadcast of the 1-row doc count — same shuffle shape as
   * `Crosstab.build`. Output: (item, ctx, cnt) with item = hash60(token),
   * ctx = the document id, cnt = tf·idf_q as double.
   */
  def tfidfCrosstab(docs: org.apache.spark.sql.DataFrame,
                    idCol: String = "doc_id",
                    textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol).as("ctx"),
      explode(tokensWs(col(textCol))).as("tok"))
    val tf = toks.groupBy(hash60(col("tok")).as("item"), col("ctx"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("item").agg(count(lit(1)).as("df"))
    val nd = docs.agg(countDistinct(col(idCol)).as("ndocs"))
    tf.join(dfreq, Seq("item"))
      .crossJoin(broadcast(nd))
      .withColumn("idf_q",
        round(log(col("ndocs").cast("double") / col("df").cast("double")) * 1000.0, 0))
      .where(col("idf_q") > 0.0)
      .select(col("item"), col("ctx"), (col("tf") * col("idf_q")).cast("double").as("cnt"))
  }

  // ── PII detection / redaction ──────────────────────────────────────────
  //
  // Pre-training corpora are routinely scrubbed of contact-like strings.
  // The patterns below are deliberately restricted to regex constructs
  // with IDENTICAL semantics in Java regex (Spark codegen) and RE2
  // (DuckDB, Go): character classes, bounded/unbounded greedy repetition,
  // literal anchors — no backreferences, no lookaround. Counts are
  // computed independently on the RAW text; redaction applies the three
  // patterns IN ORDER (email → phone → IPv4), which is part of the
  // contract (the placeholders contain no digits, so later patterns never
  // match inside earlier replacements). Everything is a pure Column
  // expression — map-only, no shuffle, whole-stage codegen.

  /** Email-shaped spans: local@domain.tld (ASCII, 2+ letter TLD). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone-shaped spans: optional +, then 8+ chars of digits/space/()/-,
    * first and last char a digit. Greedy and dot-free, so it never crosses
    * into emails or IPv4s. */
  val PhonePattern = "\\+?[0-9][0-9 ()-]{6,}[0-9]"

  /** IPv4-shaped spans: four 1-3 digit runs joined by dots (no range
    * check — a scrubber over-matches rather than under-matches). */
  val Ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  def emailCount(c: Column): Column = regexp_count(c, lit(EmailPattern)).cast("long")
  def phoneCount(c: Column): Column = regexp_count(c, lit(PhonePattern)).cast("long")
  def ipv4Count(c: Column): Column = regexp_count(c, lit(Ipv4Pattern)).cast("long")

  /** Redacted text: emails → `<EMAIL>`, then phones → `<PHONE>`, then
    * IPv4s → `<IP>` (global replacement, order as documented above). */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>"),
      Ipv4Pattern, "<IP>")

  // ── Encoding-artifact (mojibake) detection ─────────────────────────────
  //
  // The ftfy-tier curation signal: crawl text that was UTF-8 but got
  // decoded as Latin-1/cp1252 somewhere upstream carries characteristic
  // two-byte ghosts ("Ã©" for é, "â€™" for ’), and lossy decodes leave
  // U+FFFD replacement chars. A document full of these is corrupt at the
  // BYTES level — no amount of downstream quality scoring fixes it, so
  // pipelines gate on it early. The pattern is a pure literal alternation
  // (identical in Java regex and RE2); scoring is map-only Column math.

  /** Common double-decode ghosts + the replacement character. Written as
    * explicit code points (NOT source literals — a transcoding editor
    * would silently corrupt the very bytes this detects): "Ã·" pairs are
    * U+00C3 + the é/è/ü/ä/ö/ñ/ï/á/ó Latin-1 low byte, the cp1252
    * three-char ghosts are â (U+00E2) € (U+20AC) + ™/œ/“ for ’/“/–,
    * and U+FFFD is the replacement character. */
  val MojibakePattern: String = Seq(
    "\u00C3\u00A9", "\u00C3\u00A8", "\u00C3\u00BC", "\u00C3\u00A4",
    "\u00C3\u00B6", "\u00C3\u00B1", "\u00C3\u00AF", "\u00C3\u00A1",
    "\u00C3\u00B3",
    "\u00E2\u20AC\u2122", "\u00E2\u20AC\u0153", "\u00E2\u20AC\u201C",
    "\u00C2\u00B7", "\u00C2\u00B0", "\uFFFD").mkString("|")

  def mojibakeCount(c: Column): Column =
    regexp_count(c, lit(MojibakePattern)).cast("long")

  /** Artifacts per character (0.0 on empty text), 1e-6-rounded so the
    * flag boundary is engine-reproducible. */
  def mojibakeRatio(c: Column): Column =
    round(when(length(c) === 0, 0.0)
      .otherwise(mojibakeCount(c).cast("double") / length(c).cast("double")), 6)

  /** Ghost → intended character, same explicit-code-point discipline as
    * [[MojibakePattern]] (é è ü ä ö ñ ï á ó, then ’ “ – · °; U+FFFD has
    * no recoverable intent and is dropped). Ordered map: Ã-pairs, the
    * â€-triples, and Â-pairs start with distinct lead bytes, so the
    * replacements never overlap and the chain order is immaterial —
    * but it is fixed here so engine and oracle replay identically. */
  val MojibakeRepairs: Seq[(String, String)] = Seq(
    "\u00C3\u00A9" -> "\u00E9",
    "\u00C3\u00A8" -> "\u00E8",
    "\u00C3\u00BC" -> "\u00FC",
    "\u00C3\u00A4" -> "\u00E4",
    "\u00C3\u00B6" -> "\u00F6",
    "\u00C3\u00B1" -> "\u00F1",
    "\u00C3\u00AF" -> "\u00EF",
    "\u00C3\u00A1" -> "\u00E1",
    "\u00C3\u00B3" -> "\u00F3",
    "\u00E2\u20AC\u2122" -> "\u2019",
    "\u00E2\u20AC\u0153" -> "\u201C",
    "\u00E2\u20AC\u201C" -> "\u2013",
    "\u00C2\u00B7" -> "\u00B7",
    "\u00C2\u00B0" -> "\u00B0",
    "\uFFFD" -> "")

  /** Mojibake REPAIR — the fix-side twin of the detector (the ftfy
    * stance: a recoverable double-decode ghost should be repaired, not
    * cost the document): one chained LITERAL `replace` per ghost (the
    * codegen'd StringReplace, semantics identical to SQL `replace`),
    * map-only; `mojibakeCount(mojibakeRepair(c))` is 0 by construction
    * for every pattern the detector knows. */
  def mojibakeRepair(c: Column): Column =
    MojibakeRepairs.foldLeft(c) { case (acc, (ghost, fix)) =>
      replace(acc, lit(ghost), lit(fix))
    }
}
