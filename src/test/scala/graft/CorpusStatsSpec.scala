package graft

import org.apache.spark.sql.functions._
import graft.operators.{Drift, LanguageModel, SparseSim}

/** Witnesses for the corpus-statistics operators: unigram LM scoring,
  * PSI drift, and the sparse tf-idf cosine join. */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  // ---- LanguageModel -----------------------------------------------------

  test("unigramNegLogProb scores rare-token docs higher than common-token docs") {
    // "a" appears 9×, "zzz" once → doc 3 (all rare) must outscore doc 1.
    val docs = Seq(
      (1L, "a a a a"), (2L, "a a a a a"), (3L, "zzz"), (4L, "")
    ).toDF("doc_id", "text")
    val got = LanguageModel.unigramNegLogProb(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // N = 10 tokens; p(a) = 9/10, p(zzz) = 1/10.
    approx(got(1L)._2, -math.log(0.9), 1e-6) shouldBe true
    approx(got(3L)._2, -math.log(0.1), 1e-6) shouldBe true
    got(3L)._2 should be > got(1L)._2
    got.contains(4L) shouldBe false // empty doc: no row
    got(1L)._1 shouldBe 4L
  }

  test("bigramNegLogProb rewards in-context tokens over surprising ones") {
    // "a b" always follows: p(b|a) high in doc 1; doc 2 pairs "a z"
    // which never repeats → higher surprise.
    val docs = Seq(
      (1L, "a b a b a b"), (2L, "a z b a"), (3L, "x")
    ).toDF("doc_id", "text")
    val got = graft.operators.LanguageModel.bigramNegLogProb(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    got(1L)._1 shouldBe 5L
    got(2L)._1 shouldBe 3L
    got(2L)._2 should be > got(1L)._2
    got.contains(3L) shouldBe false // single token: no bigrams, no row
  }

  test("kneserNeyBigramNll matches the hand-walked interpolated-discount arithmetic") {
    // bigrams: (a,b)×2, (b,a)×1, (a,c)×1 → ctx a: c1=3 nf=2; b: c1=1 nf=1
    // cont: nb=1 for each of a,b,c; btypes=3; D=0.75:
    //   p(b|a) = (2−.75 + .75·2·(1/3))/3 = 1.75/3
    //   p(a|b) = (1−.75 + .75·1·(1/3))/1 = 0.5
    //   p(c|a) = (1−.75 + .75·2·(1/3))/3 = 0.25
    // sanity: Σ_w p(w|a) over the full vocab (incl. clipped p(a|a) = 0.5/3)
    // is exactly 1 — the context-count denominator keeps KN normalized.
    val docs = Seq((1L, "a b a b"), (2L, "a c"), (3L, "x")).toDF("doc_id", "text")
    val got = LanguageModel.kneserNeyBigramNll(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    got(1L)._1 shouldBe 3L
    approx(got(1L)._2,
      -(2 * math.log(1.75 / 3) + math.log(0.5)) / 3, 1e-6) shouldBe true
    got(2L)._1 shouldBe 1L
    approx(got(2L)._2, -math.log(0.25), 1e-6) shouldBe true
    got.contains(3L) shouldBe false // single token: no bigrams, no row
    // the continuation distinction: after "a", the frequent follower b is
    // cheaper than the one-off c
    got(2L)._2 should be > -(math.log(1.75 / 3))
  }

  test("perplexityTiers splits each language at its own tercile cutoffs") {
    // en: doc i = one token repeated (7−i)× → nll strictly increases
    // with i (rarer token). m = 6 → cut1 = 2nd-smallest nll, cut2 = 4th:
    // head {1,2}, middle {3,4}, tail {5,6}.
    val en = Seq(
      (1L, "a a a a a a"), (2L, "b b b b b"), (3L, "c c c c"),
      (4L, "d d d"), (5L, "e e"), (6L, "f")).map { case (i, t) => (i, t, "en") }
    // fr: doc 12 and 13 TIE on nll (both singleton tokens). m = 3 →
    // cut1 = the smallest value, cut2 = the tied value → ties share
    // 'middle'; the fr model is independent of en's counts.
    val fr = Seq((11L, "x x"), (12L, "y"), (13L, "z"))
      .map { case (i, t) => (i, t, "fr") }
    val docs = (en ++ fr).toDF("doc_id", "text", "lang")
    val got = LanguageModel.perplexityTiers(docs)
      .collect().map(r => r.getLong(0) -> (r.getString(4), r.getDouble(3))).toMap
    got.keySet shouldBe Set(1L, 2L, 3L, 4L, 5L, 6L, 11L, 12L, 13L)
    Seq(1L, 2L).foreach(got(_)._1 shouldBe "head")
    Seq(3L, 4L).foreach(got(_)._1 shouldBe "middle")
    Seq(5L, 6L).foreach(got(_)._1 shouldBe "tail")
    got(11L)._1 shouldBe "head"
    got(12L)._1 shouldBe "middle"
    got(13L)._1 shouldBe "middle"
    got(12L)._2 shouldBe got(13L)._2 // the tie that shares the tier
    // fr scores come from fr's own 4-token model, not the pooled corpus
    approx(got(11L)._2, -math.log(0.5), 1e-6) shouldBe true
  }

  test("perplexityTiers keeps unsampled languages visible as tier='unsampled'") {
    // sampleMod=4 with single-doc languages: some languages' only doc
    // falls outside the hash sample → no cutoffs exist for them; they
    // must surface with tier='unsampled', not silently drop.
    val docs = (1L to 12L).map(i => (i, s"t$i t$i", s"lang$i"))
      .toDF("doc_id", "text", "lang")
    val got = LanguageModel.perplexityTiers(docs, sampleMod = 4L)
      .select("lang", "tier").as[(String, String)].collect()
    got.length shouldBe 12 // every language present
    val unsampled = got.filter(_._2 == "unsampled")
    unsampled should not be empty // mod-4 leaves most single-doc langs out
    got.filterNot(_._2 == "unsampled").foreach { case (_, t) =>
      Seq("head", "middle", "tail") should contain(t)
    }
  }

  test("trigramBackoffNll: each backoff branch fires on hand-computed counts") {
    // train: uni a:2 b:2 c:1 d:1 (N=6, V=4); bi (a,b):2 (b,c):1 (c,a):1
    // (b,d):1; tri (a,b,c) (b,c,a) (c,a,b) (a,b,d) once each
    val train = Seq((1L, "a b c a b d")).toDF("doc_id", "text")
    val score = Seq(
      (10L, "a b c x"), // (a,b,c) seen → 1/2; (b,c,x) → OOV unigram tier
      (20L, "b c a"),   // (b,c,a) seen → 1/1
      (30L, "c a d"),   // tri+bi unseen, d seen → α²·(1+1)/(N+V+1)
      (40L, "x a b"),   // tri unseen, (a,b) seen → α·2/2
      (50L, "a b"))     // < 3 tokens: no row
      .toDF("doc_id", "text")
    val got = LanguageModel.trigramBackoffNll(train, score)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val a2 = 0.4 * 0.4
    approx(got(10L)._2,
      -(math.log(0.5) + math.log(a2 * (1.0 / 11.0))) / 2.0, 2e-6) shouldBe true
    got(10L)._1 shouldBe 2L
    approx(got(20L)._2, 0.0, 2e-6) shouldBe true
    approx(got(30L)._2, -math.log(a2 * (2.0 / 11.0)), 2e-6) shouldBe true
    approx(got(40L)._2, -math.log(0.4), 2e-6) shouldBe true
    got.contains(50L) shouldBe false
  }

  test("trigramBackoffNll self-scoring never leaves the trigram branch") {
    // scored on its own training corpus every trigram is seen, so nll is
    // exactly the mean -ln(c3/cctx): (a,b,*) contexts split 1/2 twice
    val d = Seq((1L, "a b c a b d")).toDF("doc_id", "text")
    val got = LanguageModel.trigramBackoffNll(d, d).collect()(0)
    got.getLong(1) shouldBe 4L
    approx(got.getDouble(2), -2.0 * math.log(0.5) / 4.0, 2e-6) shouldBe true
  }

  test("meanPoolNormalized pools to the exact normalized mean") {
    import graft.operators.SimilaritySearch
    val embs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)), // doc 0: mean (.5,.5)
      (2L, Array(2.0f, 0.0f))                            // doc 1: (1,0)
    ).toDF("vec_id", "embedding")
    val got = SimilaritySearch.meanPoolNormalized(embs, expr("vec_id div 2"))
      .select("grp", "dim", "n_chunks", "v").as[(Long, Long, Long, Double)]
      .collect().sortBy(t => (t._1, t._2))
    got(0)._3 shouldBe 2L
    approx(got(0)._4, 1.0 / math.sqrt(2), 1e-9) shouldBe true
    approx(got(1)._4, 1.0 / math.sqrt(2), 1e-9) shouldBe true
    approx(got(2)._4, 1.0, 1e-9) shouldBe true
    approx(got(3)._4, 0.0, 1e-9) shouldBe true
  }

  test("meanPoolNormalized yields NULL components for a zero pooled vector") {
    import graft.operators.SimilaritySearch
    val embs = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val rows = SimilaritySearch.meanPoolNormalized(embs, lit(0L))
      .select("v").collect()
    all(rows.map(_.isNullAt(0))) shouldBe true
  }

  // ---- Drift -------------------------------------------------------------

  test("psiBins is ~0 for identical snapshots and grows under shift") {
    val base = spark.range(1000).select((col("id") % 500).as("v"))
    val same = Drift.psiBins(base, base, "v", 50L, 10)
    same.select(max(abs(col("psi_total")))).head().getDouble(0) should be < 1e-9
    val shifted = base.select((col("v") + 200).as("v"))
    val moved = Drift.psiBins(base, shifted, "v", 50L, 10)
    moved.select(max(col("psi_total"))).head().getDouble(0) should be > 0.25
    moved.count() shouldBe 10L // every bin present, including empty ones
  }

  test("psiBins clamps out-of-range values into the edge bins") {
    val base = Seq(-5L, 0L, 10L, 9999L).toDF("v")
    val bins = Drift.psiBins(base, base, "v", 10L, 4)
      .select("bin", "n_base").as[(Long, Long)].collect().toMap
    bins(0L) shouldBe 2L // -5 clamped up, 0
    bins(1L) shouldBe 1L // 10
    bins(3L) shouldBe 1L // 9999 clamped down
  }

  // ---- SparseSim ---------------------------------------------------------

  test("tfidfCosinePairs pairs shared-content docs and ignores boilerplate") {
    // Docs 1/2 share distinctive trigrams; doc 3 shares only the
    // boilerplate header, which the df cap excludes (df = 3 of 4 docs).
    val header = "terms of service apply here"
    val docs = Seq(
      (1L, s"$header unique alpha beta gamma delta"),
      (2L, s"$header unique alpha beta gamma epsilon"),
      (3L, s"$header totally different content now"),
      (4L, "no overlap with anything else at all")
    ).toDF("doc_id", "text")
    val pairs = SparseSim.tfidfCosinePairs(docs, shingleN = 3, minCos = 0.1,
        maxDfFrac = 0.6)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    pairs should contain((1L, 2L))
    pairs.exists(p => p._1 == 3L || p._2 == 3L) shouldBe false
  }

  test("tfidfCosinePairs matches the dense cosine on a hand computation") {
    // Two 1-shingle docs sharing their only shingle → cosine exactly 1.
    val docs = Seq((1L, "x y z"), (2L, "x y z")).toDF("doc_id", "text")
    val got = SparseSim.tfidfCosinePairs(docs, 3, 0.5, maxDfFrac = 1.0)
      .select("doc_a", "doc_b", "cos").as[(Long, Long, Double)].collect()
    got.toSeq shouldBe Seq((1L, 2L, 1.0))
  }

  // ---- sourceTokenKl ------------------------------------------------------

  test("sourceTokenKl's closed form equals the dense definition") {
    val docs = Seq(
      (1L, "a a b c", "s1"), (2L, "a b b", "s1"),
      (3L, "c c d", "s2"), (4L, "d e e e", "s2"),
      (5L, "a b c d e", "s3")).toDF("doc_id", "text", "source")
    // dense KL over the full vocabulary, straight from the definition
    // (independently computed: vocab a:4 b:4 c:4 d:3 e:4, N=19, |V|=5;
    // KL(s) = Σ_{t∈V} p_s ln(p_s/q) with add-one smoothing both sides)
    val want = Map("s1" -> 0.142025, "s2" -> 0.150899, "s3" -> 0.003807)
    val got = Drift.sourceTokenKl(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    got.keySet shouldBe Set("s1", "s2", "s3")
    got("s1")._1 shouldBe 7L // tokens in s1
    got("s1")._2 shouldBe 3L // distinct tokens in s1
    for ((src, kl) <- want) got(src)._3 shouldBe kl +- 2e-6
    // a source matching the corpus mixture drifts less than a skewed one
    assert(got("s3")._3 < got("s2")._3)
  }

  test("madOutliers: Hampel fence flags the spike, survives the outlier itself") {
    import spark.implicits._
    // series A: steady 10s with one spike — mean/σ would be dragged by
    // the spike; the median fence must not be. med=10, dev(100)=90,
    // MAD=0? values: 10,10,10,11,9,100 → med 10, devs 0,0,0,1,1,90 →
    // MAD = 0.5 → fence 4.4478·0.5 ≈ 2.2 → only the spike flags.
    val a = Seq(10L, 10L, 10L, 11L, 9L, 100L).zipWithIndex
      .map { case (v, i) => ("A", s"d$i", v) }
    // series B: constant — zero MAD; any deviation at all must flag
    val b = Seq(5L, 5L, 5L, 7L).zipWithIndex.map { case (v, i) => ("B", s"d$i", v) }
    val got = graft.operators.Drift.madOutliers(
        (a ++ b).toDF("k", "day", "n"), "k", "n")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    got(("A", "d5"))._3 shouldBe true // the spike
    Seq("d0", "d1", "d2", "d3", "d4").foreach(d => got(("A", d))._3 shouldBe false)
    got(("A", "d0"))._1 shouldBe 10.0
    got(("A", "d0"))._2 shouldBe 0.5
    got(("B", "d3"))._3 shouldBe true // zero-MAD series: any deviation flags
    got(("B", "d0"))._3 shouldBe false
  }

  test("madOutliers rejects a non-positive fence") {
    import spark.implicits._
    an[IllegalArgumentException] should be thrownBy
      graft.operators.Drift.madOutliers(
        Seq(("A", 1L)).toDF("k", "n"), "k", "n", 0.0)
  }

  test("zipfFit matches an independent least-squares witness; head honors rank ties") {
    import spark.implicits._
    // vocabulary a×8 b×4 c×2 d×1 → ranks 1..4 on (count desc, term asc)
    val docs = Seq(
      (1L, "a a a a b b c d"),
      (2L, "a a a a b b c")).toDF("doc_id", "text")
    val got = graft.operators.Profiling.zipfFit(docs, topK = 4).collect()(0)
    // independent witness: plain-Scala regression over (ln r, ln f)
    val pts = Seq((1, 8), (2, 4), (3, 2), (4, 1))
      .map { case (r, f) => (math.log(r), math.log(f)) }
    val n = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    got.getAs[Long]("n_terms") shouldBe 4L
    assert(approx(got.getAs[Double]("slope"), slope, 1e-6))
    assert(approx(got.getAs[Double]("intercept"), (sy - slope * sx) / n, 1e-6))
    assert(approx(got.getAs[Double]("r2"),
      math.pow(n * sxy - sx * sy, 2) /
        ((n * sxx - sx * sx) * (n * syy - sy * sy)), 1e-6))
    // exponentially decaying frequencies are steeper than Zipf and bend
    // the line — r² reflects the bend but the fit is still strong
    got.getAs[Double]("slope") should be < -1.0
    got.getAs[Double]("r2") should be > 0.9
    // topK truncates the head deterministically (count desc, term asc)
    graft.operators.Profiling.zipfFit(docs, topK = 2).collect()(0)
      .getAs[Long]("n_terms") shouldBe 2L
  }

  test("entropyReport matches the hand-computed unigram/conditional entropies") {
    import spark.implicits._
    // tokens a×4 b×2; bigrams (a,b)×2 (b,a)×1 (a,a)×1, left counts a=3 b=1
    val docs = Seq((1L, "a b a b"), (2L, "a a")).toDF("doc_id", "text")
    val r = graft.operators.Profiling.entropyReport(docs).collect()(0)
    r.getAs[Long]("n_tokens") shouldBe 6L
    r.getAs[Long]("n_bigrams") shouldBe 4L
    r.getAs[Long]("vocab") shouldBe 2L
    val h1 = -(4.0 / 6 * math.log(4.0 / 6) + 2.0 / 6 * math.log(2.0 / 6))
    val h2 = -(2.0 / 4 * math.log(2.0 / 3) + 1.0 / 4 * math.log(1.0) +
      1.0 / 4 * math.log(1.0 / 3))
    assert(approx(r.getAs[Double]("h_unigram"), h1, 1e-6))
    assert(approx(r.getAs[Double]("h_cond"), h2, 1e-6))
    assert(approx(r.getAs[Double]("redundancy"), 1.0 - h1 / math.log(2.0), 1e-6))
    // context predicts: the conditional entropy sits below the unigram
    r.getAs[Double]("h_cond") should be < r.getAs[Double]("h_unigram")
    // degenerate corpora: single-token vocab → NULL redundancy, 0 bigrams
    val one = graft.operators.Profiling.entropyReport(
      Seq((1L, "x")).toDF("doc_id", "text")).collect()(0)
    one.getAs[Long]("n_bigrams") shouldBe 0L
    one.isNullAt(one.fieldIndex("redundancy")) shouldBe true
  }

  test("heapsFit matches a plain-Scala replay of the growth curve") {
    import spark.implicits._
    def h60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 15), 16)
    val docs = Seq(
      (1L, "a b c"),
      (2L, "a b d d"),
      (3L, ""),          // empty doc: contributes a duplicate x point
      (4L, "e a"),
      (5L, "f g h i j k")).toDF("doc_id", "text")
    // independent witness: simulate consumption in (hash60(id), id) order
    val order = Seq(1L, 2L, 3L, 4L, 5L).sortBy(i => (h60(i.toString), i))
    val texts = Map(1L -> "a b c", 2L -> "a b d d", 3L -> "",
      4L -> "e a", 5L -> "f g h i j k")
    var seen = Set.empty[String]; var nTok = 0L
    val pts = scala.collection.mutable.Buffer.empty[(Double, Double)]
    for (id <- order) {
      val tk = texts(id).split("\\s+").filter(_.nonEmpty)
      nTok += tk.length; seen ++= tk
      if (nTok > 0) pts += ((math.log(nTok.toDouble), math.log(seen.size.toDouble)))
    }
    val n = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val got = graft.operators.Profiling.heapsFit(docs).collect()(0)
    got.getAs[Long]("n_points") shouldBe pts.size.toLong
    assert(approx(got.getAs[Double]("slope"), slope, 1e-6))
    assert(approx(got.getAs[Double]("intercept"), (sy - slope * sx) / n, 1e-6))
    // growth exponent lands inside (0, 1): vocabulary grows, sub-linearly
    got.getAs[Double]("slope") should (be > 0.0 and be < 1.0)
    // layout independence: repartitioned input, identical report
    graft.operators.Profiling.heapsFit(docs.repartition(7)).collect()(0)
      .toSeq shouldBe got.toSeq
  }
}
