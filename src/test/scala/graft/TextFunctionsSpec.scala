package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("v")).collect()(0).getAs[T]("v")

  test("tokenCountWs handles blanks, runs of whitespace, and empties") {
    one[Int](tokenCountWs(col("t")), "a b  c") shouldBe 3
    one[Int](tokenCountWs(col("t")), "  lead trail  ") shouldBe 2
    one[Int](tokenCountWs(col("t")), "") shouldBe 0
    one[Int](tokenCountWs(col("t")), "   ") shouldBe 0
  }

  test("tokenCountBpe splits case runs, digits, and symbols") {
    // "Hello" + "world" + "9" + "9" + "!" = 5
    one[Long](tokenCountBpe(col("t")), "Hello world99!") shouldBe 5L
  }

  test("punctRatio and stopwordRatio") {
    one[Double](punctRatio(col("t")), "ab,!") shouldBe 0.5
    one[Double](punctRatio(col("t")), "") shouldBe 0.0
    // 2 stopwords ("the", "of") out of 4 tokens
    one[Double](stopwordRatio(col("t")), "the cat of doom") shouldBe 0.5
    // exact token match only: "theater" is not "the"
    one[Double](stopwordRatio(col("t")), "theater cat") shouldBe 0.0
    // case-insensitive: sentence-initial "The" counts as a stopword
    one[Double](stopwordRatio(col("t")), "The cat OF doom") shouldBe 0.5
  }

  test("qualityScore stays in [0,1] and rewards stopword-rich text") {
    val good = one[Double](qualityScore(col("t")),
      ("the cat sat on the mat and it was a fine day in the sun " * 4))
    val noise = one[Double](qualityScore(col("t")), "@#$% ^&* !!! ???")
    assert(good > noise)
    for (t <- Seq("", "a", "!!!", "the the the")) {
      val q = one[Double](qualityScore(col("t")), t)
      assert(q >= 0.0 && q <= 1.0, s"quality($t) = $q")
    }
  }

  test("langId picks marker-majority language, alphabetical ties, und on zero hits") {
    one[String](langId(col("t")), "el que la casa de") shouldBe "es"
    one[String](langId(col("t")), "der hund ist und die") shouldBe "de"
    one[String](langId(col("t")), "xyzzy plugh") shouldBe "und"
    // "la" ∈ es and fr; tie at 1 hit each → alphabetical → "es"
    one[String](langId(col("t")), "la maison") shouldBe "es"
    // case-insensitive markers: "The" / "AND" count as English hits
    one[String](langId(col("t")), "The cat AND the dog") shouldBe "en"
  }

  test("widened profiles identify 11 languages; diagonal never below the legacy 4-language map") {
    val legacy = Map(
      "de" -> Seq("der", "die", "und", "ist", "nicht", "das"),
      "en" -> Seq("the", "and", "of", "is", "to", "that"),
      "es" -> Seq("el", "la", "de", "que", "los", "una"),
      "fr" -> Seq("le", "la", "et", "les", "des", "une"))
    val samples = Seq(
      ("de", "der hund ist nicht auf dem tisch und die katze schläft"),
      ("en", "the cat is on the table and it was not a problem"),
      ("es", "el gato está en la mesa y no es un problema para los niños"),
      ("fr", "le chat est sur la table et les enfants ne sont pas dans la maison"),
      ("it", "il gatto non sono sulla tavola anche per gli amici della casa"),
      ("nl", "het huis van een man is niet ook voor zijn vrienden maar bij hem"),
      ("pl", "nie jest tak ale tylko przez tym się oraz czy dom"),
      ("pt", "não é uma casa dos amigos mas também está pela rua"),
      ("sv", "det är ett hus som inte för han och att med om till"),
      ("tr", "bu bir ev için ve daha çok ama gibi sonra var"),
      ("vi", "của và là có không được trong cho người những"))
    val df = samples.toDF("truth", "text")
    def diagonal(profiles: Map[String, Seq[String]]): Long =
      df.select(col("truth"), langId(col("text"), profiles).as("p"))
        .where(col("truth") === col("p")).count()
    diagonal(LangProfiles) shouldBe samples.size.toLong // every language correct
    assert(diagonal(LangProfiles) >= diagonal(legacy))
  }

  test("fingerprint is order-sensitive and matches the fold definition") {
    def poly(s: String): Long = s.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L)
    for (t <- Seq("abc", "cba", "hello world", ""))
      one[Long](fingerprint(col("t")), t) shouldBe poly(t)
    assert(poly("abc") != poly("cba"))
  }

  test("native fingerprint equals the declarative fold, incl. non-ASCII") {
    for (t <- Seq("abc", "", "héllo wörld", "über café ñ", "a b\tc\nd",
        "the quick brown fox jumps over the lazy dog" * 5)) {
      val r = Seq(t).toDF("t")
        .select(fingerprint(col("t")).as("nat"), fingerprintFold(col("t")).as("fold"))
        .collect()(0)
      assert(r.getLong(0) == r.getLong(1), s"native != fold for '$t'")
    }
  }

  test("rolling_fp is registered in SQL and NULL-propagates") {
    spark.sql("SELECT rolling_fp('abc') AS fp").collect()(0).getLong(0) shouldBe
      "abc".foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L)
    spark.sql("SELECT rolling_fp(CAST(NULL AS STRING)) AS fp")
      .collect()(0).isNullAt(0) shouldBe true
  }

  test("wordShingles produces n-grams; short docs → empty; minShingleHash null") {
    val sh = one[collection.Seq[String]](wordShingles(col("t"), 3), "a b c d")
    sh.toSeq shouldBe Seq("a b c", "b c d")
    one[collection.Seq[String]](wordShingles(col("t"), 3), "a b").toSeq shouldBe Seq.empty
    val r = Seq("a b").toDF("t").select(minShingleHash(col("t"), 3).as("v")).collect()(0)
    r.isNullAt(0) shouldBe true
  }

  test("minShingleHashAgg equals the Column form per document") {
    val docs = Seq((1L, "a b c d e"), (2L, "x y"), (3L, "p q r"), (4L, ""))
      .toDF("doc_id", "text")
    val agg = minShingleHashAgg(docs, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val colForm = docs.select(col("doc_id"), minShingleHash(col("text"), 3).as("m"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    colForm.foreach { case (id, v) => agg.get(id) shouldBe v }
  }

  test("hash60 and hashPerm are deterministic and non-negative") {
    val h1 = one[Long](hash60(col("t")), "hello world")
    h1 shouldBe 426544247714475757L // int(md5('hello world')[:15], 16)
    val hp = one[Long](hashPerm(col("t"), 3), "hello world")
    assert(hp >= 0L)
    one[Long](hashPerm(col("t"), 3), "hello world") shouldBe hp
  }

  test("compressionRatio orders repetitive < prose, is null-safe, empty -> 1.0") {
    val repetitive = "spam spam spam spam spam spam spam spam spam spam " * 20
    val prose = "A rather more varied sentence, with digits 427 and mixed " +
      "punctuation; entropy stays comparatively high throughout this text. " +
      "Further clauses introduce fresh vocabulary: zephyr, quixotic, jumble."
    val rRep = one[Double](compressionRatio(col("t")), repetitive)
    val rProse = one[Double](compressionRatio(col("t")), prose)
    assert(rRep < rProse, s"repetitive $rRep !< prose $rProse")
    assert(rRep > 0.0 && rProse < 1.1)
    one[Double](compressionRatio(col("t")), "") shouldBe 1.0
    // null-safe and deterministic across evaluations
    Seq(Option.empty[String]).toDF("t")
      .select(compressionRatio(col("t"))).collect().head.isNullAt(0) shouldBe true
    one[Double](compressionRatio(col("t")), prose) shouldBe rProse
  }

  test("gopherStats flags each rule and conjoins pass") {
    def g(text: String, minWords: Int = 5) =
      Seq(text).toDF("t").select(gopherStats(col("t"), minWords).as("g"))
        .select("g.*").collect()(0)
    // a clean natural sentence: every rule passes
    val ok = g("the quick brown fox jumps over the lazy dog in a field of rye")
    ok.getAs[Boolean]("pass") shouldBe true
    ok.getAs[Long]("n_words") shouldBe 14L
    // too short
    g("the cat of doom").getAs[Boolean]("r_words") shouldBe false
    g("the cat of doom").getAs[Boolean]("pass") shouldBe false
    // symbol spam: 3 of '#|...' per 6 words > 0.1
    val sym = g("the # cat # of # doom today friend", 5)
    sym.getAs[Boolean]("r_symbol") shouldBe false
    // all-bullet lines fail the bullet rule
    val bul = g("- the cat\n- of doom\n- is here", 2)
    bul.getAs[Boolean]("r_bullet") shouldBe false
    // ellipsis-heavy lines fail the ellipsis rule
    val ell = g("the cat...\nof doom...\nis here", 2)
    ell.getAs[Boolean]("r_ellipsis") shouldBe false
    // numeric tokens fail the alphabetic rule (2 of 6 alpha < 0.8)
    val num = g("1 2 3 4 the of", 2)
    num.getAs[Boolean]("r_alpha") shouldBe false
    // fewer than 2 distinct stopwords (repeated 'the' counts once)
    val stop = g("the cat the dog the bird runs", 2)
    stop.getAs[Long]("n_stop") shouldBe 1L
    stop.getAs[Boolean]("r_stop") shouldBe false
    // empty text: zero words, NULL stats, fails via the words rule
    val emp = g("")
    emp.getAs[Long]("n_words") shouldBe 0L
    assert(emp.isNullAt(emp.fieldIndex("mean_word_len")))
    emp.getAs[Boolean]("pass") shouldBe false
    // NULL text: stats stay NULL but every flag (and pass) is a
    // deterministic false, never NULL — non-filter consumers of `pass`
    // must not see three-valued logic
    val nul = Seq(Option.empty[String]).toDF("t")
      .select(gopherStats(col("t"), 5).as("g")).select("g.*").collect()(0)
    assert(nul.isNullAt(nul.fieldIndex("mean_word_len")))
    for (f <- Seq("r_words", "r_meanlen", "r_symbol", "r_bullet",
                  "r_ellipsis", "r_alpha", "r_stop", "pass")) {
      assert(!nul.isNullAt(nul.fieldIndex(f)), s"$f is NULL on NULL text")
      nul.getAs[Boolean](f) shouldBe false
    }
  }

  test("nfcNormalize composes decomposed forms, passes ASCII/NFC through, keeps NULL, runs from SQL") {
    val rows = Seq(
      (1L, "café"), // decomposed → composes
      (2L, "caf\u00e9"), // already NFC → unchanged
      (3L, "plain ascii"), // ASCII fast path
      (4L, null)).toDF("id", "t")
    val out = rows.select(col("id"), nfcNormalize(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    out(1L) shouldBe Some("caf\u00e9")
    out(2L) shouldBe Some("caf\u00e9")
    out(3L) shouldBe Some("plain ascii")
    out(4L) shouldBe None
    // canonically-equal variants now share one digest
    rows.where(col("t").isNotNull)
      .select(md5(nfcNormalize(col("t"))))
      .distinct().count() shouldBe 2L // café + plain ascii
    // registered for SQL via GraftExtensions
    spark.sql("SELECT nfc('cafe\u0301')").collect()(0)
      .getString(0) shouldBe "caf\u00e9"
    // idempotence
    rows.where(col("id") === 1L)
      .select(nfcNormalize(nfcNormalize(col("t"))))
      .collect()(0).getString(0) shouldBe "caf\u00e9"
  }

  test("rougeN: identical pairs score 1; disjoint 0; clipped multiset counts; empty sides 0") {
    import graft.operators.TextMetrics
    val pairs = Seq(
      (1L, "a b c d", "a b c d"), // identical
      (2L, "a b c", "x y z"), // disjoint
      (3L, "a b a b a b", "a b"), // clipping: ov=1, ct=5, rt=1
      (4L, "", "a b"), // empty candidate
      (5L, "x", "")) // BOTH sides shorter than n: zero gram rows anywhere
      .toDF("pair_id", "cand", "ref")
    val m = TextMetrics.rougeN(pairs, 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    m(1L) shouldBe ((1.0, 1.0, 1.0))
    m(2L) shouldBe ((0.0, 0.0, 0.0))
    m(3L) shouldBe ((0.2, 1.0, 0.333333))
    m(4L) shouldBe ((0.0, 0.0, 0.0))
    // the no-gram pair must still APPEAR (all-zero), not silently vanish
    m(5L) shouldBe ((0.0, 0.0, 0.0))
    m.size shouldBe 5
  }

  test("mojibake: clean text scores 0, ghosts and U+FFFD are counted, ratio rounds") {
    import org.apache.spark.sql.functions.col
    val ghostE = "\u00C3\u00A9" // é double-decoded
    val ghostQ = "\u00E2\u20AC\u2122" // \u2019 double-decoded (cp1252)
    val rows = Seq(
      (1L, "a perfectly clean line of text"),
      (2L, s"caf$ghostE latte"), // 1 artifact, 11 chars
      (3L, s"it${ghostQ}s \uFFFD broken $ghostE$ghostE"),
      (4L, "")).toDF("doc_id", "text")
    val got = rows.select(col("doc_id"),
        mojibakeCount(col("text")).as("n"),
        mojibakeRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    got(1L) shouldBe ((0L, 0.0))
    got(2L)._1 shouldBe 1L
    got(2L)._2 shouldBe 1.0 / 11.0 +- 1e-6
    got(3L)._1 shouldBe 4L
    got(4L) shouldBe ((0L, 0.0))
  }

  test("mojibakeRepair: every known ghost repairs to its intended char; detector reads 0 after") {
    import org.apache.spark.sql.functions.col
    val ghostE = "Ã©" // é double-decoded
    val ghostQ = "â€™" // ’ double-decoded (cp1252)
    val rows = Seq(
      (1L, s"caf$ghostE latte"),
      (2L, s"it${ghostQ}s � gone"),
      (3L, "already clean"),
      (4L, MojibakeRepairs.map(_._1).mkString(" "))
    ).toDF("doc_id", "text")
    val got = rows.select(col("doc_id"),
        mojibakeRepair(col("text")).as("fixed"),
        mojibakeCount(mojibakeRepair(col("text"))).as("after"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    got(1L)._1 shouldBe "café latte"
    got(2L)._1 shouldBe "it’s  gone" // U+FFFD dropped, not replaced
    got(3L)._1 shouldBe "already clean"
    // the full ghost inventory repairs to the full intent inventory
    got(4L)._1 shouldBe MojibakeRepairs.map(_._2).mkString(" ")
    got.values.foreach(_._2 shouldBe 0L)
  }

  test("bleuN: hand-computed witnesses — clipping, brevity penalty, zero-order") {
    import graft.operators.TextMetrics
    val pairs = Seq(
      (1L, "the cat sat", "the cat sat on the mat"), // exact prefix
      (2L, "a a a b", "a b"), // clipping + long candidate
      (3L, "", "a b") // empty candidate
    ).toDF("pair_id", "cand", "ref")
    val m3 = TextMetrics.bleuN(pairs, 3).collect()
      .map(r => r.getLong(0) -> r).toMap
    // pair 1: p1 = p2 = p3 = 1, c = 3, r = 6 → BLEU = BP = e^(1−2)
    m3(1L).getAs[Double]("bp") shouldBe 0.367879
    m3(1L).getAs[Double]("bleu") shouldBe 0.367879
    m3(1L).getAs[Double]("p_3") shouldBe 1.0
    // pair 2: p1 = min(3,1)+min(1,1) over 4 = 0.5 (clipped); p3 has
    // candidate grams but zero overlap → the geometric mean zeroes out
    m3(2L).getAs[Double]("p_1") shouldBe 0.5
    m3(2L).getAs[Double]("bleu") shouldBe 0.0
    m3(2L).getAs[Double]("p_3") shouldBe 0.0
    // pair 3: empty candidate → everything 0
    m3(3L).getAs[Double]("bp") shouldBe 0.0
    m3(3L).getAs[Double]("bleu") shouldBe 0.0
    // BLEU-2 of pair 2: exp((ln 1/2 + ln 1/3) / 2) = √(1/6), BP = 1
    val m2 = TextMetrics.bleuN(pairs.where(col("pair_id") === 2L), 2)
      .collect().head
    m2.getAs[Double]("bp") shouldBe 1.0
    m2.getAs[Double]("p_2") shouldBe 0.333333
    m2.getAs[Double]("bleu") shouldBe 0.408248
  }

  test("chrF: hand-computed witnesses — strip, per-order average, F_beta") {
    import graft.operators.TextMetrics
    val pairs = Seq(
      (1L, "a b", "ab"), // whitespace strips → identical
      (2L, "ab", "ba"), // order-1 perfect, order-2 zero → P̄ = R̄ = 1/2
      (3L, "", "ab") // empty candidate
    ).toDF("pair_id", "cand", "ref")
    val m = TextMetrics.chrF(pairs, 2).collect()
      .map(r => r.getLong(0) -> r).toMap
    m(1L).getAs[Double]("chrf") shouldBe 1.0
    m(2L).getAs[Double]("precision") shouldBe 0.5
    m(2L).getAs[Double]("recall") shouldBe 0.5
    // F_2 = 5·(1/2)(1/2) / (4·1/2 + 1/2) = 0.5
    m(2L).getAs[Double]("chrf") shouldBe 0.5
    m(3L).getAs[Double]("chrf") shouldBe 0.0
    m(3L).getAs[Double]("precision") shouldBe 0.0
  }

  test("sentences: terminators split, guards protect, empties drop") {
    import graft.functions.TextFunctions.sentences
    def split(t: String): Seq[String] =
      Seq(t).toDF("t").select(sentences(col("t")).as("s"))
        .collect().head.getSeq[String](0)
    split("One here. Two there! Three up? Four") shouldBe
      Seq("One here.", "Two there!", "Three up?", "Four")
    // abbreviation, initial, e.g./i.e., decimal — none break
    split("Dr. Who met J. Doe, e.g. at 3.14 st. vs. it. Next one.") shouldBe
      Seq("Dr. Who met J. Doe, e.g. at 3.14 st. vs. it.", "Next one.")
    // i.e. and multi-terminator runs
    split("It holds, i.e. always. Sure?! Done.") shouldBe
      Seq("It holds, i.e. always.", "Sure?!", "Done.")
    // trailing terminator without whitespace ends the last sentence
    split("Tail stays.") shouldBe Seq("Tail stays.")
    // blank and empty inputs yield no sentences
    split("   ") shouldBe Seq.empty
    split("") shouldBe Seq.empty
  }
}
