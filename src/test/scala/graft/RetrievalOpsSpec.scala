package graft

import graft.operators.{Dedup, FuzzyJoin, Retrieval}
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** Round-6 extension operators: BM25 retrieval (EXT-T23), the FastSS
  * edit-distance join (EXT-T24), daily resample + forward fill
  * (EXT-S14), and group-level shingle Jaccard (EXT-D19). */
class RetrievalOpsSpec extends SparkSpec {
  import spark.implicits._

  // --- BM25 ----------------------------------------------------------------

  private val corpus = Seq(
    (1L, "spark shuffles data fast"),
    (2L, "spark spark spark"),
    (3L, "slow tables and rows and columns and keys"),
    (4L, "fast vector search")).toDF("doc_id", "text")

  /** Textbook BM25 witness (second implementation, scalar). */
  private def bm25Ref(terms: Seq[String], docs: Seq[(Long, String)],
                      k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
    val n = docs.size.toDouble
    val avgdl = toks.values.map(_.size).sum / n
    val dfs = terms.map(t => t -> toks.values.count(_.contains(t)).toDouble).toMap
    docs.flatMap { case (id, _) =>
      val score = terms.map { t =>
        val tf = toks(id).count(_ == t).toDouble
        if (tf == 0 || dfs(t) == 0) 0.0
        else math.log(1 + (n - dfs(t) + 0.5) / (dfs(t) + 0.5)) *
          tf * (k1 + 1) / (tf + k1 * (1 - b + b * toks(id).size / avgdl))
      }.sum
      if (score > 0) Some(id -> score) else None
    }.toMap
  }

  test("bm25 matches the textbook scalar witness") {
    val got = Retrieval.bm25(corpus, Seq("spark", "vector"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = bm25Ref(Seq("spark", "vector"),
      Seq((1L, "spark shuffles data fast"), (2L, "spark spark spark"),
        (3L, "slow tables and rows and columns and keys"), (4L, "fast vector search")))
    got.keySet shouldBe want.keySet
    got.foreach { case (id, s) => assert(approx(s, want(id)), s"doc $id") }
  }

  test("bm25TopK ranks by rounded score desc with id tiebreak and caps at k") {
    val top = Retrieval.bm25TopK(corpus, Seq("spark"), 2).collect()
    top.length shouldBe 2
    // doc 2 has the highest tf of 'spark' and the shortest length
    top.head.getLong(0) shouldBe 2L
    assert(top(0).getDouble(1) >= top(1).getDouble(1))
  }

  test("bm25 rejects an empty query") {
    an[IllegalArgumentException] should be thrownBy Retrieval.bm25(corpus, Nil)
  }

  // --- Reciprocal-rank fusion ----------------------------------------------

  test("rrfFuse matches the hand-computed fusion of two lists") {
    // list A ranks: 10 (1st), 20 (2nd), 30 (3rd); list B: 20 (1st), 40 (2nd)
    val a = Seq((10L, 3.0), (20L, 2.0), (30L, 1.0)).toDF("doc_id", "score")
    val b = Seq((20L, 9.0), (40L, 8.0)).toDF("doc_id", "score")
    val got = Retrieval.rrfFuse(Seq(a, b), topL = 10, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val w = Map( // 1/(60+rank) per appearance
      20L -> (1.0 / 62 + 1.0 / 61), 10L -> 1.0 / 61,
      40L -> 1.0 / 62, 30L -> 1.0 / 63)
    got.map(_._1).toSeq shouldBe Seq(20L, 10L, 40L, 30L) // fused order
    got.foreach { case (id, rrf, n) =>
      rrf shouldBe (math.rint(w(id) * 1e6) / 1e6) +- 1e-9
      n shouldBe (if (id == 20L) 2L else 1L)
    }
  }

  test("rrfFuse caps each list at topL before fusing and ties break by id") {
    // with topL = 1 only each list's head survives; equal contributions
    // 1/61 tie-break by doc id ascending
    val a = Seq((10L, 3.0), (20L, 2.0)).toDF("doc_id", "score")
    val b = Seq((40L, 9.0), (10L, 8.0)).toDF("doc_id", "score")
    val got = Retrieval.rrfFuse(Seq(a, b), topL = 1, k = 10)
      .collect().map(r => r.getLong(0))
    got.toSeq shouldBe Seq(10L, 40L)
  }

  // --- NDCG ----------------------------------------------------------------

  test("ndcgAt scores the perfect ranking 1.0 and a swap below it") {
    val rel = Seq((1L, 3), (2L, 2), (3L, 1), (4L, 0)).toDF("doc_id", "rel")
    val perfect = Seq((1L, 9.0), (2L, 8.0)).toDF("doc_id", "score")
    val swapped = Seq((2L, 9.0), (1L, 8.0)).toDF("doc_id", "score")
    val got = Retrieval.ndcgAt(
      Seq("perfect" -> perfect, "swapped" -> swapped), rel, 2)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // idcg@2 = 7/log2(2) + 3/log2(3)
    val idcg = 7.0 + 3.0 / (math.log(3.0) / math.log(2.0))
    got("perfect")._2 shouldBe (math.rint(idcg * 1e6) / 1e6) +- 1e-9
    got("perfect")._3 shouldBe 1.0 +- 1e-9
    val dcgSwap = 3.0 + 7.0 / (math.log(3.0) / math.log(2.0))
    got("swapped")._1 shouldBe (math.rint(dcgSwap * 1e6) / 1e6) +- 1e-9
    assert(got("swapped")._3 < 1.0)
  }

  test("ndcgAt grades unknown docs 0 and survives an all-zero ideal") {
    val rel = Seq((1L, 0)).toDF("doc_id", "rel")
    val l = Seq((9L, 1.0)).toDF("doc_id", "score")
    val row = Retrieval.ndcgAt(Seq("l" -> l), rel, 5).collect()(0)
    row.getDouble(1) shouldBe 0.0 // dcg: unknown doc -> rel 0
    row.getDouble(3) shouldBe 0.0 // idcg 0 -> ndcg pinned 0, not NaN
  }

  // --- MMR diversification -------------------------------------------------

  test("mmrDiversify picks diversity over a redundant higher-rel candidate") {
    // ids 1 and 2 point the same way (sim = 1), id 3 is orthogonal.
    // λ=0.7: step1 picks 1 (rel 1.0). step2: id2 scores .63−.3·1=.33,
    // id3 scores .35−0=.35 → 3 beats the more-relevant-but-redundant 2.
    // step3 takes the leftover 2 at .33.
    val cand = Seq((1L, 1.0), (2L, 0.9), (3L, 0.5)).toDF("vec_id", "rel")
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)), (3L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = Retrieval.mmrDiversify(cand, vecs, 3)
      .orderBy(col("step")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    got.map(_._2).toSeq shouldBe Seq(1L, 3L, 2L)
    got(0)._3 shouldBe 0.7 +- 1e-9
    got(1)._3 shouldBe 0.35 +- 1e-9
    got(2)._3 shouldBe 0.33 +- 1e-9
  }

  test("mmrDiversify returns fewer rows when k exceeds the candidates") {
    val cand = Seq((1L, 1.0)).toDF("vec_id", "rel")
    val vecs = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    Retrieval.mmrDiversify(cand, vecs, 4).count() shouldBe 1L
  }

  // --- FastSS levenshtein-1 join -------------------------------------------

  test("levenshtein1Pairs finds substitution, deletion, and duplicate-free equal names") {
    val names = Seq("gear", "bear", "ear", "gears", "pump", "jump", "stone")
      .toDF("p_name")
    val got = FuzzyJoin.levenshtein1Pairs(names, "p_name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    got shouldBe Set(
      ("bear", "gear"), // substitution
      ("ear", "gear"), ("bear", "ear"), // deletion
      ("gear", "gears"), // insertion
      ("jump", "pump")) // substitution
  }

  test("levenshtein1Pairs equals the naive all-pairs join on a random vocabulary") {
    val rnd = new scala.util.Random(7)
    val vocab = (1 to 120).map(_ =>
      (1 to (3 + rnd.nextInt(4))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      .distinct
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val naive = (for (a <- vocab; b <- vocab if a < b && lev(a, b) <= 1) yield (a, b)).toSet
    val got = FuzzyJoin.levenshtein1Pairs(vocab.toDF("p_name"), "p_name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    got shouldBe naive
  }

  test("levenshtein1Pairs excludes transpositions (distance 2)") {
    val got = FuzzyJoin.levenshtein1Pairs(Seq("ab", "ba").toDF("p_name"), "p_name")
      .collect()
    got shouldBe empty
  }

  test("levenshtein1Pairs hot-variant cap drops boilerplate fragments") {
    // every name shares the deletion variant "x" via 2-char names
    val names = Seq("xa", "xb", "xc", "xd").toDF("p_name")
    val uncapped = FuzzyJoin.levenshtein1Pairs(names, "p_name").count()
    val capped = FuzzyJoin.levenshtein1Pairs(names, "p_name", maxVariantDegree = Some(3)).count()
    assert(uncapped == 6) // all pairs are substitutions at position 2
    assert(capped < uncapped)
  }

  // --- Daily resample + forward fill ---------------------------------------

  private def ev(id: Long, user: Long, ts: String, v: Double) =
    (id, java.sql.Timestamp.valueOf(ts), user, "e", v)

  test("resampleDailyFfill fills gap days with the prior close and zero events") {
    val events = Seq(
      ev(1, 1, "2024-01-01 10:00:00", 5.0),
      ev(2, 1, "2024-01-01 18:00:00", 7.0), // closing value of day 1
      ev(3, 1, "2024-01-03 09:00:00", 9.0), // day 2 is a gap
      ev(4, 2, "2024-01-02 12:00:00", 1.0)  // user 2 starts on day 2
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventStreams.resampleDailyFfill(events)
      .orderBy("user_id", "day").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    got shouldBe Array(
      (1L, "2024-01-01", 2L, Some(7.0)),
      (1L, "2024-01-02", 0L, Some(7.0)), // gap day carries the close
      (1L, "2024-01-03", 1L, Some(9.0)),
      (2L, "2024-01-01", 0L, None), // before user 2's first event
      (2L, "2024-01-02", 1L, Some(1.0)),
      (2L, "2024-01-03", 0L, Some(1.0)))
  }

  test("resampleDailyFfill breaks same-timestamp ties by event id") {
    val t = "2024-01-01 10:00:00"
    val events = Seq(ev(2, 1, t, 20.0), ev(1, 1, t, 10.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventStreams.resampleDailyFfill(events).collect()
    got.length shouldBe 1
    got.head.getDouble(3) shouldBe 20.0 // highest event_id wins
  }

  // --- Group-level shingle Jaccard -----------------------------------------

  test("groupShingleJaccard: exact values match hand-computed set overlap") {
    // 3-shingles: g1 = {a b c, b c d} ∪ {b c d, c d e}; g2 = {a b c, b c d}
    val docs = Seq(
      (1L, "a b c d", "g1"), (2L, "b c d e", "g1"),
      (3L, "a b c d", "g2"), (4L, "x y z w", "g3")).toDF("doc_id", "text", "source")
    val rows = Dedup.groupShingleJaccard(docs, 3, 16)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    // g1 = {abc,bcd,cde}, g2 = {abc,bcd}: |∩| = 2, |∪| = 3
    assert(approx(rows(("g1", "g2"))._1, 2.0 / 3.0))
    // g3 shares nothing — absent from the pair table (zero intersection)
    rows.keySet shouldBe Set(("g1", "g2"))
    // the 16-perm estimate is a probability — bounded and sane
    val est = rows(("g1", "g2"))._2
    assert(est >= 0.0 && est <= 1.0)
  }

  // --- CDC apply + SCD2 history --------------------------------------------

  private lazy val cdcLog = Seq(
    ev(1, 1, "2024-01-01 10:00:00", 1.0),
    ev(2, 1, "2024-01-02 10:00:00", 2.0),
    (3L, java.sql.Timestamp.valueOf("2024-01-03 10:00:00"), 1L, "error", 0.0), // tombstone
    ev(4, 1, "2024-01-04 10:00:00", 4.0), // reopens after delete
    ev(5, 2, "2024-01-01 10:00:00", 9.0),
    (6L, java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 2L, "error", 0.0)  // latest = delete
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("latestSnapshot: latest wins; a trailing tombstone removes the key") {
    val got = graft.operators.ChangeData
      .latestSnapshot(cdcLog, col("event_type") === "error")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    got shouldBe Map(1L -> 4.0) // user 2's latest change is a delete
  }

  test("scd2History: intervals chain, tombstones close, current row matches snapshot") {
    val rows = graft.operators.ChangeData
      .scd2History(cdcLog, col("event_type") === "error")
      .orderBy("user_id", "valid_from").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        Option(r.getTimestamp(3)).map(_.toString), r.getBoolean(4)))
    rows shouldBe Array(
      (1L, 1.0, Some("2024-01-02 10:00:00.0"), false),
      (1L, 2.0, Some("2024-01-03 10:00:00.0"), false), // closed by the tombstone
      (1L, 4.0, None, true), // reopened — the only current row
      (2L, 9.0, Some("2024-01-02 10:00:00.0"), false)) // closed, never current
  }

  test("groupShingleJaccard: identical groups estimate exactly 1") {
    val docs = Seq(
      (1L, "a b c d e", "g1"), (2L, "a b c d e", "g2")).toDF("doc_id", "text", "source")
    val r = Dedup.groupShingleJaccard(docs, 3, 16).collect().head
    r.getDouble(2) shouldBe 1.0 // exact
    r.getDouble(3) shouldBe 1.0 // every permutation minimum agrees
  }
}
