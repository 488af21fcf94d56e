package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels chains, rings, and separate clusters by min id") {
    // two components: a 5-chain (worst diameter) and a triangle
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("doc_a", "doc_b")
    val comp = graft.operators.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 5L).foreach(id => comp(id) shouldBe 1L)
    Seq(10L, 11L, 12L).foreach(id => comp(id) shouldBe 10L)
    comp.size shouldBe 8
  }

  test("connectedComponents converges on a long chain in O(log d) rounds") {
    // a 3000-node path has diameter 2999 — plain min propagation would
    // need 2999 rounds; the pointer-jumping step makes ~log2(3000) ≈ 12,
    // so the default 25-round cap must succeed (the sf10 probe found a
    // real near-dup graph whose chains exceeded the cap before the jump)
    val n = 3000L
    val chain = spark.range(1L, n).select(col("id").as("doc_a"),
      (col("id") + 1L).as("doc_b"))
    val comp = graft.operators.Dedup.connectedComponents(chain)
    comp.select(countDistinct(col("component"))).as[Long].collect().head shouldBe 1L
    comp.agg(min(col("component")), max(col("component")), count(lit(1)))
      .as[(Long, Long, Long)].collect().head shouldBe ((1L, 1L, n))
  }

  test("survivors keeps the argmax-quality member, ties to the smaller id") {
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "component")
    val qual = Seq((1L, 0.2), (2L, 0.9), (3L, 0.9), (10L, 0.5), (11L, 0.5))
      .toDF("id", "quality")
    val s = Dedup.survivors(comps, qual).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    s(1L) shouldBe ((2L, 0.9, 3L)) // 2 beats 3 on the id tie-break
    s(10L) shouldBe ((10L, 0.5, 2L))
    s.size shouldBe 2
  }

  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup of 1
    (4L, "completely different words entirely here now"),
    (5L, "x")) // too short for 3-gram shingles
    .toDF("doc_id", "text")

  test("exactGroups collapses identical texts to the min doc_id") {
    val g = Dedup.exactGroups(docs).collect()
      .map(r => r.getAs[Long]("canonical_id") -> r.getAs[Long]("n_dups")).toMap
    g(1L) shouldBe 2L // docs 1+2
    g.keySet shouldBe Set(1L, 3L, 4L, 5L)
    Dedup.exactDedup(docs).select("doc_id").as[Long].collect().sorted shouldBe
      Array(1L, 3L, 4L, 5L)
  }

  test("jaccardPairs finds near-dups and gives exact dups jaccard 1.0") {
    val pairs = Dedup.jaccardPairs(Dedup.shingleSets(docs, 3), 0.3).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("jaccard")).toMap
    pairs((1L, 2L)) shouldBe 1.0
    // 1 vs 3: 7 shingles each, 5 shared ("over the lazy|sleepy" breaks 2)
    assert(pairs((1L, 3L)) > 0.4 && pairs((1L, 3L)) < 1.0)
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("minhash signatures are identical for identical docs; LSH finds them") {
    val sig = Dedup.minHashSignatures(docs, 3, 16)
    // doc 5 has no shingles → excluded
    sig.select("id").as[Long].collect().sorted shouldBe Array(1L, 2L, 3L, 4L)
    val cand = Dedup.lshCandidates(sig, 4, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("est_sim")).toMap
    cand((1L, 2L)) shouldBe 1.0 // identical docs always collide, est 1
  }

  test("simhash of identical docs is equal; near-dups are close in Hamming space") {
    val sh = Dedup.simHashes(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sh(1L) shouldBe sh(2L)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(3L)) < ham(sh(1L), sh(4L)))
    val pairs = Dedup.simHashPairs(Dedup.simHashes(docs), 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((1L, 2L))
  }

  test("spanDedup keeps first span occurrence, rebuilds docs, empties full dups") {
    // 3-token spans: doc 1 = [a b c][d e f]; doc 2 repeats both spans
    // (drops to '') plus a fresh tail span; doc 3 repeats ITS OWN first
    // span — the within-doc repeat drops too.
    val d = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f g h i"),
      (3L, "p q r p q r")).toDF("doc_id", "text")
    val got = Dedup.spanDedup(d, 3).orderBy("doc_id")
      .as[(Long, String)].collect()
    got shouldBe Array((1L, "a b c d e f"), (2L, "g h i"), (3L, "p q r"))
  }

  test("spanDedup is idempotent") {
    val once = Dedup.spanDedup(docs, 3)
    val twice = Dedup.spanDedup(once, 3).orderBy("doc_id")
      .as[(Long, String)].collect()
    once.orderBy("doc_id").as[(Long, String)].collect() shouldBe twice
  }

  test("exactSubstrDedup removes shared runs at ANY offset, in full") {
    // doc 2 repeats doc 1's whole run at offset 2 — a placement span
    // boundaries can't catch; doc 3 shares only 2 < L tokens (kept);
    // doc 4 repeats ITS OWN first window; doc 5 is a full exact dup.
    val d = Seq(
      (1L, "a b c d e f"),
      (2L, "x y a b c d e f z"),
      (3L, "a b q q q"),
      (4L, "m n o m n o"),
      (5L, "a b c d e f")).toDF("doc_id", "text")
    val got = Dedup.exactSubstrDedup(d, 3).orderBy("doc_id")
      .as[(Long, String, Long)].collect()
    got shouldBe Array(
      (1L, "a b c d e f", 0L),
      (2L, "x y z", 6L), // interval [2, 8) = the whole shared run
      (3L, "a b q q q", 0L),
      (4L, "m n o", 3L), // within-doc repeat drops
      (5L, "", 6L))
    // the contrast witness: span dedup's fixed [x y a][b c d][e f z]
    // boundaries never align with doc 1's [a b c][d e f], so the SAME
    // corpus keeps doc 2 intact under q74's protocol
    Dedup.spanDedup(d, 3).where(col("doc_id") === 2L)
      .as[(Long, String)].collect() shouldBe Array((2L, "x y a b c d e f z"))
  }

  test("exactSubstrDedup coalesces overlapping removals into maximal intervals") {
    // doc 2 contains doc 1's run TWICE, separated by one fresh token:
    // two islands whose windows overlap internally but not across the gap
    val d = Seq(
      (1L, "a b c d"),
      (2L, "a b c d u a b c d")).toDF("doc_id", "text")
    val got = Dedup.exactSubstrDedup(d, 3).orderBy("doc_id")
      .as[(Long, String, Long)].collect()
    got shouldBe Array((1L, "a b c d", 0L), (2L, "u", 8L))
  }

  test("exactSubstrDedup second pass removes zero tokens") {
    val once = Dedup.exactSubstrDedup(docs, 3)
    val twice = Dedup.exactSubstrDedup(once, 3).orderBy("doc_id")
    twice.agg(sum(col("n_removed"))).as[Long].collect().head shouldBe 0L
    once.orderBy("doc_id").select("doc_id", "text").as[(Long, String)].collect() shouldBe
      twice.select("doc_id", "text").as[(Long, String)].collect()
  }

  // a template crawled 20× (the hot-band-bucket source), genuine near-dups,
  // distinct content, and short exact dups (below the shingle floor)
  private val planted = (Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup of 1
    (4L, "completely different words entirely here now"),
    (5L, "x"), (6L, "x")) ++ // short exact dups: no shingles, no signature
    (100L to 119L).map(i => (i, "spam template boilerplate lorem ipsum dolor sit amet")))
    .toDF("doc_id", "text")

  test("exact-first: one-call dedups collapse the planted mega-cluster; laws preserved") {
    val kept = Dedup.dedupCorpus(planted, 3, 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // mega-cluster → its min id only; short docs both pass (no shingles =
    // no evidence at this tier); exactly one of the near-dup pair survives
    kept.filter(_ >= 100L) shouldBe Seq(100L)
    kept should contain allOf (4L, 5L, 6L)
    kept.count(Set(1L, 3L)) shouldBe 1

    val keptLsh = Dedup.dedupCorpusLsh(planted, 3, 16, 4, 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    keptLsh.filter(_ >= 100L) shouldBe Seq(100L)
    keptLsh should contain allOf (4L, 5L, 6L)

    // SimHash tier: every doc carries a signature, so the short exact
    // dups collapse too (5 beats 6) — same answer the dist-0 pair gave
    val keptSh = Dedup.dedupCorpusSimHash(planted, 1)
      .select("doc_id").as[Long].collect().sorted.toSeq
    keptSh.filter(_ >= 100L) shouldBe Seq(100L)
    keptSh should contain(5L)
    keptSh should not contain 6L
  }

  test("maxBandDegree: capped and uncapped one-call dedups agree once exact dups collapse first") {
    val uncapped = Dedup.dedupCorpusLsh(planted, 3, 16, 4, 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // cap of 2 would have dismembered the 20-doc template cluster's
    // buckets — after the exact collapse it only ever sees singletons
    val capped = Dedup.dedupCorpusLsh(planted, 3, 16, 4, 0.5,
      maxBandDegree = Some(2))
      .select("doc_id").as[Long].collect().sorted.toSeq
    capped shouldBe uncapped
    val uncappedSh = Dedup.dedupCorpusSimHash(planted, 1)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val cappedSh = Dedup.dedupCorpusSimHash(planted, 1, maxBandDegree = Some(2))
      .select("doc_id").as[Long].collect().sorted.toSeq
    cappedSh shouldBe uncappedSh
  }

  test("exact-first shrinks the candidate stage: rep signatures generate far fewer pairs") {
    val allCand = Dedup.lshCandidates(
      Dedup.minHashSignatures(planted, 3, 16), 4, 4).count()
    val reps = planted.join(
      Dedup.exactDroppedIds(planted, Some(3), "doc_id", "text")
        .withColumnRenamed("id", "doc_id"),
      Seq("doc_id"), "left_anti")
    val repCand = Dedup.lshCandidates(
      Dedup.minHashSignatures(reps, 3, 16), 4, 4).count()
    // 20 identical docs alone contribute C(20,2) = 190 candidate pairs
    assert(allCand >= 190L, s"expected the planted cluster to dominate, got $allCand")
    assert(repCand <= allCand - 190L, s"rep candidates $repCand vs all $allCand")
  }

  test("cdcDedup removes shifted duplicates that fixed spans miss; exact dups empty; idempotent") {
    def words(seed: Int, n: Int): String = {
      val r = new scala.util.Random(seed)
      Seq.fill(n)(s"w${r.nextInt(40)}").mkString(" ")
    }
    val body = words(11, 240)
    val corpus = Seq(
      (1L, body),
      (2L, body), // exact dup → fully removed
      (3L, "totally different shifted " + body)) // shifted dup → re-aligns
      .toDF("doc_id", "text")
    val out = Dedup.cdcDedup(corpus, 4, 16)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    out(1L) shouldBe ((body, 0L))
    out(2L) shouldBe (("", 240L))
    // content-defined boundaries re-align after the 4-token prefix: the
    // bulk of doc 3's copy dedups despite the offset shift...
    out(3L)._2 should be > 120L
    // ...where fixed 16-token spans catch NOTHING of the shifted copy
    val spans = Dedup.spanDedup(
        corpus.where(col("doc_id").isin(1L, 3L)), 16)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    spans(3L) shouldBe ("totally different shifted " + body)
    // idempotence: a second pass removes zero tokens
    val again = Dedup.cdcDedup(
      Dedup.cdcDedup(corpus, 4, 16), 4, 16)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    again.values.sum shouldBe 0L
  }

  test("lineDedup strikes corpus-frequent lines, keeps order, counts by DOC frequency") {
    // 'nav bar' is in 3 distinct docs (> maxDocFreq=2) ⇒ struck everywhere,
    // including BOTH its occurrences in doc 4; 'twice here' repeats within
    // one doc only (df=1) ⇒ kept — doc frequency, not occurrence count.
    val lined = Seq(
      (1L, "nav bar\nalpha body one\nbeta body two"),
      (2L, "nav bar\ngamma body\ntwice here\ntwice here"),
      (3L, "delta body\nnav bar"),
      (4L, "nav bar\nnav bar"),
      (5L, "epsilon body")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(lined, maxDocFreq = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    out(1L) shouldBe ((3L, 1L, "alpha body one\nbeta body two"))
    out(2L) shouldBe ((4L, 1L, "gamma body\ntwice here\ntwice here"))
    out(3L) shouldBe ((2L, 1L, "delta body"))
    out(4L) shouldBe ((2L, 2L, "")) // fully-boilerplate doc keeps ''
    out(5L) shouldBe ((1L, 0L, "epsilon body"))
    out.size shouldBe 5
  }

  test("lineNllFilter strikes the corpus-worst lines; blank lines carry no evidence and stay") {
    // vocab over line tokens: the×7 cat×4 dog×3 zzq×1 xxv×1 (N=16).
    // NLLs: [zzq xxv]=ln16≈2.77 > [the dog]≈1.25 > [the cat]≈1.11.
    // 8 scored lines, dropFrac 0.2 ⇒ ⌈1.6⌉=2 strikes: [zzq xxv] and the
    // FIRST [the dog] by (doc, line) tie-break — doc 1 line 1.
    val docs = Seq(
      (1L, "the cat\nthe dog\nzzq xxv"),
      (2L, "the cat\nthe dog"),
      (3L, "the cat"),
      (4L, "the cat\n\nthe dog")).toDF("doc_id", "text")
    val out = graft.operators.LanguageModel.lineNllFilter(docs, 0.2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    out(1L) shouldBe ((3L, 2L, "the cat"))
    out(2L) shouldBe ((2L, 0L, "the cat\nthe dog"))
    out(3L) shouldBe ((1L, 0L, "the cat"))
    out(4L) shouldBe ((3L, 0L, "the cat\n\nthe dog")) // blank line kept
  }

  test("lineDedup boundary: df == maxDocFreq survives, df == maxDocFreq+1 is struck") {
    val lined = Seq(
      (1L, "edge line\nover line"), (2L, "edge line\nover line"),
      (3L, "over line\nown body")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(lined, maxDocFreq = 2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    out(1L) shouldBe "edge line" // df('edge line')=2 kept; df('over line')=3 struck
    out(3L) shouldBe "own body"
  }

  test("rejectionLedger: first rejecting stage wins in declared order; untouched docs keep") {
    import graft.operators.CurationLedger
    val docs = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val stageA = Seq(2L, 3L).toDF("doc_id") // rejects 2 and 3
    val stageB = Seq(3L, 4L).toDF("doc_id") // 3 already rejected upstream
    val out = CurationLedger.rejectionLedger(docs,
        Seq("rule_a" -> stageA, "rule_b" -> stageB))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out shouldBe Map(1L -> "kept", 2L -> "rule_a",
      3L -> "rule_a", // short-circuit: the FIRST stage owns the verdict
      4L -> "rule_b")
    an[IllegalArgumentException] should be thrownBy
      CurationLedger.rejectionLedger(docs, Seq("x" -> stageA, "x" -> stageB))
    an[IllegalArgumentException] should be thrownBy
      CurationLedger.rejectionLedger(docs, Seq.empty)
  }

  test("winnowFingerprints: rightmost-min tie rule and ~1/window density on a constant doc") {
    import graft.operators.Dedup
    // all tokens equal → every 2-gram hashes identically → every window's
    // minimum ties → the rule must pick the RIGHTMOST position, so the
    // selected positions are exactly W-1..m-1 under ONE distinct hash
    val doc = Seq((1L, "a a a a a a a a")).toDF("doc_id", "text") // 8 toks, m=7 2-grams
    val fp = Dedup.winnowFingerprints(doc, 2, 3)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    fp.map(_._1).distinct.length shouldBe 1 // one gram content, one hash
    fp.map(_._2).sorted.toSeq shouldBe (2L to 6L) // rightmost per window
  }

  test("winnowPairs: a shared run of window+k-1 tokens is guaranteed a shared fingerprint") {
    import graft.operators.Dedup
    val run = "copied span of text goes exactly here now" // 8 tokens ≥ w+k-1 = 8
    val docs = Seq(
      (1L, s"alpha beta gamma $run"),
      (2L, s"$run delta epsilon zeta eta theta iota kappa"),
      (3L, "completely unrelated words with zero overlap present")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, 4, 5, 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the guarantee: (1,2) share the run → at least one shared fingerprint
    pairs.keySet should contain((1L, 2L))
    pairs((1L, 2L)) should be >= 1L
    // doc 3 shares no k-gram with anyone → never reported
    pairs.keySet.foreach { case (a, b) => Seq(a, b) should not contain 3L }
  }

  test("winnowPairs: minShared floors the report and maxHashDegree drops boilerplate hashes") {
    import graft.operators.Dedup
    val banner = "standard license header line one two three four"
    val docs = (1L to 4L).map(i => (i, s"$banner unique$i tail$i word$i after$i"))
      .toDF("doc_id", "text")
    // every doc shares only the banner fingerprints; with the degree cap
    // below the 4-doc fan-out those hashes drop and NO pair is reported
    Dedup.winnowPairs(docs, 4, 5, 1L, maxHashDegree = Some(3))
      .count() shouldBe 0L
    // without the cap the banner makes every pair; a high minShared floor
    // keeps only pairs sharing at least 2 fingerprints
    val all = Dedup.winnowPairs(docs, 4, 5, 1L)
    all.count() should be >= 1L
    val floored = Dedup.winnowPairs(docs, 4, 5, 100L)
    floored.count() shouldBe 0L
  }

  test("containmentPairs: embedded document scores 1.0 as inner, asymmetric") {
    import graft.operators.Dedup
    val short = "alpha beta gamma delta epsilon" // 3 trigram shingles
    val docs = Seq(
      (1L, short), // fully embedded in 2
      (2L, s"prefix words here $short and a long suffix tail follows now"),
      (3L, "totally different content with no shared runs at all")
    ).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(Dedup.shingleSets(docs, 3), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    pairs((1L, 2L)) shouldBe 1.0 +- 1e-9 // all of 1's shingles appear in 2
    // the reverse direction is diluted by 2's extra shingles → below 0.5
    pairs.keySet should not contain ((2L, 1L))
    pairs.keySet.flatMap(k => Set(k._1, k._2)) should not contain 3L
  }

  test("tuneLshPlan: S-curve feasibility is two-sided; cheapest feasible wins") {
    import graft.operators.Dedup
    val grid = Dedup.tuneLshPlan(spark, 16, 0.5, 0.1, 0.85, 0.2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4),
          r.getBoolean(5)))).toMap
    grid.keySet shouldBe Set(1L, 2L, 4L, 8L, 16L)
    // hand-computed: p(s) = 1 − (1 − s^r)^b, rounded 1e-6
    grid(8L)._2 shouldBe 0.899887 // 1 − (1 − 0.25)^8
    grid(8L)._3 shouldBe 0.077255 // 1 − (1 − 0.01)^8
    grid(8L)._4 shouldBe true
    grid(8L)._5 shouldBe true // only feasible split
    // r = 1 catches everything but floods with noise — infeasible
    grid(16L)._2 should be > 0.99
    grid(16L)._4 shouldBe false
    // r = 4 misses the catch floor — infeasible from the other side
    grid(4L)._4 shouldBe false
    grid.values.count(_._5) shouldBe 1
  }

  test("tuneLshPlan errors when no split is feasible") {
    import graft.operators.Dedup
    an[IllegalArgumentException] should be thrownBy
      Dedup.tuneLshPlan(spark, 4, 0.5, 0.4, 0.99, 0.01)
  }

  test("containmentPairs rejects a zero threshold") {
    import graft.operators.Dedup
    val sh = Seq((1L, "a b c d")).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy
      Dedup.containmentPairs(Dedup.shingleSets(sh, 3), 0.0)
  }

  test("cdcOverlapPairs: containment over distinct fps, minShared, degree guard") {
    import graft.operators.Dedup
    // hand-built chunk table (the q168 chunker is gated separately):
    // doc 1 = {A, B, C, D} with A repeated, doc 2 = {C, D, E}, doc 3 = {F}
    val ch = Seq(
      (1L, 0L, "A"), (1L, 1L, "B"), (1L, 2L, "C"), (1L, 3L, "D"), (1L, 4L, "A"),
      (2L, 0L, "C"), (2L, 1L, "D"), (2L, 2L, "E"),
      (3L, 0L, "F")).toDF("doc_id", "chunk_no", "chunk_md5")
    // shared {C, D} of min(4, 3) → containment 2/3; the repeated A must
    // not inflate doc 1's size (distinct fps)
    Dedup.cdcOverlapPairs(ch, minShared = 2, minContainment = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq shouldBe Seq((1L, 2L, 2L, 0.666667))
    // minShared = 3 suppresses the pair; a 0.7 containment floor does too
    Dedup.cdcOverlapPairs(ch, 3, 0.0).collect() shouldBe empty
    Dedup.cdcOverlapPairs(ch, 2, 0.7).collect() shouldBe empty
    // degree guard: C and D sit in 2 docs — a cap of 1 drops both
    Dedup.cdcOverlapPairs(ch, 1, 0.0, maxChunkDegree = Some(1))
      .collect() shouldBe empty
  }

  test("cdcOverlapPairs end-to-end: a planted partial copy surfaces; unrelated docs do not") {
    import graft.operators.{Chunking, Dedup}
    // doc 2 embeds doc 1's full body (200 shared tokens) inside its own
    // distinct prefix/suffix; doc 3 is unrelated
    val sharedBlock = (0 until 200).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, sharedBlock),
      (2L, (0 until 40).map(i => s"p$i").mkString(" ") + " " + sharedBlock +
        " " + (0 until 40).map(i => s"q$i").mkString(" ")),
      (3L, (0 until 200).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val pairs = Dedup.cdcOverlapPairs(
        Chunking.cdcChunks(docs, windowTokens = 4, modK = 16),
        minShared = 2, minContainment = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    pairs.map(p => (p._1, p._2)).toSeq shouldBe Seq((1L, 2L))
    // CDC boundaries re-align inside the shared block, so the embedded
    // copy carries most of doc 1's chunks despite the offset
    pairs.head._3 should be >= 0.5
  }
}
