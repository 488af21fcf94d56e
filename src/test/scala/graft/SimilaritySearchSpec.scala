package graft

import graft.operators.SimilaritySearch
import org.apache.spark.sql.functions._

class SimilaritySearchSpec extends SparkSpec {
  import spark.implicits._

  private val embs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f)),
    (2L, Seq(0.9f, 0.1f, 0.0f)),  // near 1
    (3L, Seq(0.0f, 1.0f, 0.0f)),  // orthogonal to 1
    (4L, Seq(-1.0f, 0.0f, 0.0f)), // opposite of 1
    (5L, Seq(0.0f, 0.0f, 0.0f)))  // zero vector
    .toDF("vec_id", "embedding")

  test("cosine: exact values, zero-norm → NULL") {
    val c = embs.as("a").crossJoin(embs.as("b"))
      .select(col("a.vec_id").as("x"), col("b.vec_id").as("y"),
        SimilaritySearch.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    c((1L, 1L)).get shouldBe 1.0 +- 1e-12
    c((1L, 3L)).get shouldBe 0.0 +- 1e-12
    c((1L, 4L)).get shouldBe -1.0 +- 1e-12
    assert(c((1L, 2L)).get > 0.99)
    c((1L, 5L)) shouldBe None
  }

  test("bruteForceTopK ranks by cosine desc, excludes self") {
    val q = embs.where(col("vec_id") === 1L)
    val top = SimilaritySearch.bruteForceTopK(q, embs, 2).collect()
      .map(r => r.getLong(1))
    top.toSeq shouldBe Seq(2L, 3L) // nearest first; zero-vec NULL sorts last
  }

  test("SRP buckets put identical vectors together and opposite vectors apart") {
    val planes = SimilaritySearch.hyperplanes(8, 3)
    val b = SimilaritySearch.withBucket(embs, planes).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("bucket")).toMap
    b(1L) shouldBe b(2L) // near-identical directions share all sign bits here
    assert(b(1L) != b(4L)) // opposite direction flips every nonzero-dot bit
    // bucket is deterministic across evaluations
    SimilaritySearch.withBucket(embs, planes).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("bucket")).toMap shouldBe b
  }

  test("lshTopK returns a subset of brute-force candidates with same scores") {
    val planes = SimilaritySearch.hyperplanes(8, 3)
    val q = embs.where(col("vec_id") === 1L)
    val brute = SimilaritySearch.bruteForceTopK(q, embs, 5).collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val lsh = SimilaritySearch.lshTopK(q, embs, planes, 5).collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(lsh.keySet.subsetOf(brute.keySet))
    lsh.foreach { case (id, c) => c shouldBe brute(id) }
    lsh.keySet should contain(2L) // the true near neighbor shares the bucket
  }

  test("multiProbeTopK supersets the single-bucket candidates with identical scores") {
    val planes = SimilaritySearch.hyperplanes(8, 3)
    val q = embs.where(col("vec_id") === 1L)
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val single = toMap(SimilaritySearch.lshTopK(q, embs, planes, 5))
    val multi = toMap(SimilaritySearch.multiProbeTopK(q, embs, planes, 5))
    assert(single.keySet.subsetOf(multi.keySet))
    single.keySet.foreach(id => multi(id) shouldBe single(id))
    // scores are the exact cosines (re-rank is exact in both)
    val brute = toMap(SimilaritySearch.bruteForceTopK(q, embs, 5))
    multi.foreach { case (id, c) => c shouldBe brute(id) }
  }

  test("trainedCentroids: streaming ordered-fold mean, no collect_list in the plan") {
    // 6 unit-ish vectors, seeds = vec_id % 3 == 1 → seeds {1, 4}
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.8f, 0.2f)), (3L, Seq(0.9f, 0.1f)),
      (4L, Seq(0.0f, 1.0f)), (5L, Seq(0.2f, 0.8f)), (6L, Seq(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val tc = SimilaritySearch.trainedCentroids(corpus, 3, 2)
    // bounded-state pipeline: the cluster materialization is gone
    val plan = tc.queryExecution.executedPlan.toString
    plan should not include "collect_list"
    // cluster {1,2,3} → mean of the ordered binary64 fold, float32-rounded
    val got = tc.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1)).toMap
    def mean(vs: Seq[Seq[Float]]): Seq[Float] = {
      val acc = new Array[Double](2)
      vs.foreach(v => (0 until 2).foreach(i => acc(i) += v(i).toDouble))
      acc.map(x => (x / vs.size).toFloat).toSeq
    }
    got(1L) shouldBe mean(Seq(Seq(1.0f, 0.0f), Seq(0.8f, 0.2f), Seq(0.9f, 0.1f)))
    got(4L) shouldBe mean(Seq(Seq(0.0f, 1.0f), Seq(0.2f, 0.8f), Seq(0.1f, 0.9f)))
  }

  test("multi-iteration Lloyd: centroid movement shrinks per round; iters=1 unchanged") {
    val rnd = new scala.util.Random(41)
    val corpus = (1L to 80L).map { i =>
      // three loose direction clusters + noise
      val base = (i % 3).toInt match {
        case 0 => Seq(1.0f, 0.1f, 0.0f, 0.1f)
        case 1 => Seq(0.0f, 1.0f, 0.1f, 0.0f)
        case _ => Seq(0.1f, 0.0f, 1.0f, 0.1f)
      }
      (i, base.map(x => x + rnd.nextFloat() * 0.4f - 0.2f))
    }.toDF("vec_id", "embedding")
    def cents(iters: Int) =
      SimilaritySearch.trainedCentroids(corpus, 7, 4, iters).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val seeds = SimilaritySearch.ivfCentroids(corpus, 7).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val byIter = (1 to 3).map(cents)
    byIter.head shouldBe cents(1) // deterministic, and iters defaults compose
    def movement(a: Map[Long, collection.Seq[Float]],
                 b: Map[Long, collection.Seq[Float]]): Double = {
      val shared = a.keySet intersect b.keySet
      shared.toSeq.map { id =>
        math.sqrt(a(id).zip(b(id)).map { case (x, y) =>
          (x - y).toDouble * (x - y) }.sum)
      }.sum / shared.size
    }
    val m1 = movement(seeds, byIter(0))
    val m2 = movement(byIter(0), byIter(1))
    val m3 = movement(byIter(1), byIter(2))
    assert(m1 > 0.0, "first refinement must move the sampled seeds")
    assert(m2 <= m1, s"movement grew: round2 $m2 > round1 $m1")
    assert(m3 <= m2, s"movement grew: round3 $m3 > round2 $m2")
  }

  test("pqRoundtrip: reconstruction is codebook rows, bounded distortion, codes well-formed") {
    val rnd = new scala.util.Random(43)
    val corpus = (1L to 60L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val m = 4
    val books = SimilaritySearch.pqCodebooks(corpus, m, 8, 11)
    // every (sub_id, code_id) slice matches the sampled source vector
    val src = corpus.where(col("vec_id") % 11 === 1).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    books.collect().foreach { r =>
      val (sub, code, emb) = (r.getInt(0), r.getLong(1), r.getSeq[Float](2))
      emb shouldBe src(code).slice(sub * 2, sub * 2 + 2)
    }
    val codes = SimilaritySearch.pqEncode(corpus, books, m, 8)
    codes.count() shouldBe 60L * m // one code per (vec, sub)
    // a sampled codebook vector reconstructs to itself exactly
    val rt = SimilaritySearch.pqRoundtrip(corpus, m, 8, 11).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    src.foreach { case (id, v) => rt(id) shouldBe v }
    // every reconstruction has full dimension and finite values
    rt.values.foreach { v => v.size shouldBe 8; v.foreach(x => assert(!x.isNaN)) }
    // reconstruction error is bounded by the worst in-sample distance
    val all = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def d2(a: collection.Seq[Float], b: collection.Seq[Float]) =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    all.foreach { case (id, v) =>
      val nearestPerSub = (0 until m).map { j =>
        src.values.map(s => d2(v.slice(j * 2, j * 2 + 2), s.slice(j * 2, j * 2 + 2))).min
      }.sum
      d2(v, rt(id)) shouldBe nearestPerSub +- 1e-9
    }
  }

  test("nearDupPairs respects threshold and optional blocking") {
    val withBlk = embs.withColumn("label", (col("vec_id") % 2).cast("int"))
    val all = SimilaritySearch.nearDupPairs(withBlk, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    all shouldBe Set((1L, 2L))
    // blocking by label parity separates 1 (odd) from 2 (even) → no pairs
    SimilaritySearch.nearDupPairs(withBlk, 0.9, Some("label")).count() shouldBe 0L
  }

  test("int8Roundtrip: bounded error, zero vectors pass through, idempotent") {
    val rt = SimilaritySearch.int8Roundtrip(embs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val orig = embs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // error per element bounded by half a quantization step (s/127/2 + float eps)
    orig.foreach { case (id, v) =>
      val s = v.map(x => math.abs(x.toDouble)).foldLeft(0.0)(math.max)
      v.zip(rt(id)).foreach { case (x, q) =>
        math.abs(x.toDouble - q.toDouble) should be <=
          (if (s == 0) 0.0 else s / 127 / 2 + 1e-6) }
    }
    rt(5L) shouldBe orig(5L) // the zero vector is unchanged
    // a second round-trip is a fixed point (codes re-quantize to themselves)
    val twice = SimilaritySearch.int8Roundtrip(SimilaritySearch.int8Roundtrip(embs))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    twice shouldBe rt
  }

  test("ANN store refresh serves identically to a full rebuild") {
    val rnd = new scala.util.Random(23)
    val all = (1L to 40L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val base = all.where(col("vec_id") % 4 =!= 0)
    val delta = all.where(col("vec_id") % 4 === 0)
    val queries = all.where(col("vec_id") % 9 === 1)
    val planes = SimilaritySearch.hyperplanes(6, 8)
    val cents = SimilaritySearch.ivfCentroids(base, 7)

    val refreshed = java.nio.file.Files.createTempDirectory("graft_annref_spec").toString
    graft.store.AnnStore.writeSrp(base, planes, refreshed)
    graft.store.AnnStore.writeIvf(base, cents, refreshed)
    graft.store.AnnStore.appendSrp(delta, refreshed)
    graft.store.AnnStore.appendIvf(delta, refreshed)

    val rebuilt = java.nio.file.Files.createTempDirectory("graft_annreb_spec").toString
    graft.store.AnnStore.writeSrp(all, planes, rebuilt)
    graft.store.AnnStore.writeIvf(all, cents, rebuilt)

    def dump(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("vec_id"), round(col("cos"), 9).as("cos"))
        .orderBy("query_id", "cos", "vec_id").collect().toSeq
    dump(graft.store.AnnStore.srpTopK(spark, refreshed, queries, 3)) shouldBe
      dump(graft.store.AnnStore.srpTopK(spark, rebuilt, queries, 3))
    dump(graft.store.AnnStore.ivfTopK(spark, refreshed, queries, 2, 3)) shouldBe
      dump(graft.store.AnnStore.ivfTopK(spark, rebuilt, queries, 2, 3))
  }

  test("residual IVF-PQ store round-trip: persisted serving == in-memory compose; compaction preserves it") {
    val rnd = new scala.util.Random(17)
    val corpus = (1L to 60L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val queries = corpus.where(col("vec_id") % 9 === 1)
    val (m, dim, codeMod, centMod) = (4, 8, 11, 7)
    val store = java.nio.file.Files.createTempDirectory("graft_ivfpqres_spec").toString
    graft.store.AnnStore.writeIvfPqResidual(corpus, m, dim, codeMod, centMod, store)

    def dump(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("vec_id"), round(col("cos"), 9).as("cos"))
        .orderBy("query_id", "cos", "vec_id").collect().toSeq

    val expected = dump(SimilaritySearch.ivfPqResidualTopK(
      queries, corpus, m, dim, codeMod, centMod, 2, 3))
    expected should not be empty
    dump(graft.store.AnnStore.ivfPqResidualTopK(spark, store, queries, 2, 3)) shouldBe expected

    // compaction: version advances, serving identical, open reader survives
    val root = s"$store/${graft.store.AnnStore.IvfPqResLists}"
    val openedBefore = graft.store.AnnStore.ivfPqResidualTopK(spark, store, queries, 2, 3)
    graft.store.AnnStore.compactIvfPqResidual(spark, store)
    graft.store.Compaction.currentVersion(spark, root) shouldBe Some(1L)
    dump(graft.store.AnnStore.ivfPqResidualTopK(spark, store, queries, 2, 3)) shouldBe expected
    dump(openedBefore) shouldBe expected // pinned to its resolved version
  }

  test("trainedPqCodebooks: per-subspace Lloyd monotonically lowers the quantization objective") {
    val rnd = new scala.util.Random(11)
    val corpus = (1L to 80L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val (m, dim, codeMod) = (4, 8, 9)
    // Σ ||x − decode(encode(x))||² — the k-means objective summed over
    // subspaces; each Lloyd round (assign, then mean) cannot increase it
    def sse(books: org.apache.spark.sql.DataFrame): Double = {
      val rec = SimilaritySearch.pqRoundtripFrom(corpus, books, m, dim)
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      corpus.collect().map { r =>
        val x = r.getSeq[Float](1); val y = rec(r.getLong(0))
        x.zip(y).map { case (a, b) => (a - b).toDouble * (a - b) }.sum
      }.sum
    }
    val sampled = SimilaritySearch.pqCodebooks(corpus, m, dim, codeMod)
    val t1 = SimilaritySearch.trainedPqCodebooks(corpus, m, dim, codeMod, 1)
    val t2 = SimilaritySearch.trainedPqCodebooks(corpus, m, dim, codeMod, 2)
    val (s0, s1, s2) = (sse(sampled), sse(t1), sse(t2))
    assert(s1 <= s0, s"one Lloyd round should not raise the objective: $s1 > $s0")
    assert(s2 <= s1, s"round 2 should not raise the objective: $s2 > $s1")
    // codeword ids remain seed ids; every subspace keeps >= 1 codeword
    val subIds = t1.select("sub_id").distinct().collect().map(_.getInt(0)).sorted
    subIds.toSeq shouldBe (0 until m)
    val seedIds = sampled.select("code_id").distinct().collect().map(_.getLong(0)).toSet
    t1.select("code_id").distinct().collect().map(_.getLong(0))
      .foreach(id => assert(seedIds.contains(id)))
  }

  test("ivfPqResidualTopK: exact when every vector is its own codeword; residual decode adds back the centroid") {
    val rnd = new scala.util.Random(13)
    // odd ids only → vec_id % 2 == 1 samples EVERY vector: each residual
    // subvector is its own codeword, decode is exact, so residual IVF-PQ
    // must equal plain exact IVF on the same centroids/probes
    val corpus = (1L to 60L).filter(_ % 2 == 1).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val queries = corpus.where(col("vec_id") % 9 === 1)
    val (m, dim, codeMod, centMod) = (4, 8, 2, 7)
    // fl(fl(x−c)+c) reconstructs x up to one rounding step per element,
    // not bit-exactly — compare membership and 4-decimal scores
    def dump(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("vec_id"), round(col("cos"), 4).as("cos"))
        .orderBy("query_id", "vec_id").collect().toSeq
    val res = dump(SimilaritySearch.ivfPqResidualTopK(
      queries, corpus, m, dim, codeMod, centMod, 2, 3))
    val exact = dump(SimilaritySearch.ivfTopK(queries, corpus, centMod, 2, 3))
    res shouldBe exact
  }

  test("IVF-PQ store round-trip: persisted serving == in-memory compose; compaction preserves it") {
    val rnd = new scala.util.Random(7)
    val corpus = (1L to 60L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val queries = corpus.where(col("vec_id") % 9 === 1)
    val (m, dim, codeMod, centMod) = (4, 8, 11, 7)
    val store = java.nio.file.Files.createTempDirectory("graft_ivfpq_spec").toString
    graft.store.AnnStore.writeIvfPq(corpus, m, dim, codeMod, centMod, store)

    def dump(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("vec_id"), round(col("cos"), 9).as("cos"))
        .orderBy("query_id", "cos", "vec_id").collect().toSeq

    // reference: IVF over the PQ reconstruction with centroids sampled
    // from the reconstruction — exactly what the persisted index encodes
    val rec = SimilaritySearch.pqRoundtrip(corpus, m, dim, codeMod)
    val expected = dump(SimilaritySearch.ivfTopKFrom(
      SimilaritySearch.ivfCentroids(rec, centMod), queries, rec, 2, 3))
    expected should not be empty
    val served = dump(graft.store.AnnStore.ivfPqTopK(spark, store, queries, 2, 3))
    served shouldBe expected

    // compaction: version advances, serving identical, open reader survives
    val root = s"$store/${graft.store.AnnStore.IvfPqLists}"
    val openedBefore = graft.store.AnnStore.ivfPqTopK(spark, store, queries, 2, 3)
    graft.store.AnnStore.compactIvfPq(spark, store)
    graft.store.Compaction.currentVersion(spark, root) shouldBe Some(1L)
    dump(graft.store.AnnStore.ivfPqTopK(spark, store, queries, 2, 3)) shouldBe expected
    dump(openedBefore) shouldBe expected // pinned to its resolved version
  }

  test("centroidOutliers flags the far member per cluster; σ=0 clusters and singletons never flag") {
    import spark.implicits._
    // centroids (id % 100 == 1): id 1 → [1,0], id 101 → [0,1].
    // Cluster A: 7 exact [1,0] members (cos 1.0) + id 9 at [0.8,0.6]
    // (cos 0.8): z = 7/√8 ≈ 2.47 > 2 ⇒ id 9 flagged, inliers not.
    // Cluster B: two exact [0,1] members — sd = 0, fence = mean ⇒
    // cs < mean is false for everyone (identical members never flag).
    val a = Array(1f, 0f); val b = Array(0f, 1f)
    val vecs = (Seq(1L, 2L, 3L, 5L, 6L, 7L, 8L).map(_ -> a) ++
      Seq(9L -> Array(0.8f, 0.6f), 101L -> b, 10L -> b))
      .toDF("vec_id", "embedding")
    val out = SimilaritySearch.centroidOutliers(vecs, 100, 2.0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap
    out(9L) shouldBe ((1L, true))
    Seq(1L, 2L, 3L, 5L, 6L, 7L, 8L).foreach(id => out(id) shouldBe ((1L, false)))
    out(101L) shouldBe ((101L, false))
    out(10L) shouldBe ((101L, false))
    out.size shouldBe 10
  }

  test("prefixDims: prefix slice; full-width truncation is the identity for serving") {
    import graft.operators.SimilaritySearch
    val e = Seq((1L, Array(1.0f, 2.0f, 3.0f, 4.0f)), (2L, Array(4.0f, 3.0f, 2.0f, 1.0f)),
      (3L, Array(1.0f, 2.0f, 2.9f, 4.1f))).toDF("vec_id", "embedding")
    SimilaritySearch.prefixDims(e, 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap shouldBe Map(
      1L -> Seq(1.0f, 2.0f), 2L -> Seq(4.0f, 3.0f), 3L -> Seq(1.0f, 2.0f))
    def top(df: org.apache.spark.sql.DataFrame) =
      SimilaritySearch.bruteForceTopK(df, df, 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    top(SimilaritySearch.prefixDims(e, 4)) shouldBe top(e)
  }

  test("kCenterSelect walks the farthest-point traversal: seed = min id, then max-spread picks") {
    import graft.operators.SimilaritySearch
    // 2-D panel: a=[1,0], b=[0,1], c=diag, d≈a. Greedy: seed a (min id);
    // step 2 picks b (cos 0 to a — the farthest); step 3 picks c (0.707
    // beats d's ≈1); d (the near-duplicate of a) goes LAST — exactly the
    // redundancy the coreset exists to defer.
    val cand = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.7071068f, 0.7071068f)), (4L, Array(0.999f, 0.0447f)))
      .toDF("vec_id", "embedding")
    val out = SimilaritySearch.kCenterSelect(cand, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
    out.map(_._2).toSeq shouldBe Seq(1L, 2L, 3L, 4L)
    out(0)._3.isNaN shouldBe true // seed carries no distance
    out(1)._3 shouldBe 0.0 +- 1e-6
    out(2)._3 shouldBe 0.7071068 +- 1e-4
    out(3)._3 should be > 0.99 // the near-dup's max cos to the selected set
    // k beyond the panel: selection exhausts gracefully
    SimilaritySearch.kCenterSelect(cand, 10).count() shouldBe 4L
  }

  test("marginMinePairs: hub targets lose to margin, best pair per source, threshold gates") {
    // single shared bucket (one all-positive plane); k = 2. Hand-walked:
    //   cos(s1,·) = (t1 1.0, t2 0.8, t3 0.0); cos(s2,·) = (0.6, 0.96, 0.8)
    //   avg_s = (0.9, 0.88); avg_t = (0.8, 0.88, 0.4)
    //   s1 → t1 (margin ≈ 1.176); s2 → t3 (1.25) — the MARGIN picks t3
    //   over the higher-cosine hub t2 (0.96 cos but margin ≈ 1.091),
    //   which is exactly the hubness correction the criterion exists for.
    val onePlane = Seq(Seq(1, 1))
    val src = Seq((10L, Array(1.0f, 0.0f)), (20L, Array(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val tgt = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.8f, 0.6f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    def mine(thr: Double) =
      graft.operators.SimilaritySearch.marginMinePairs(src, tgt, onePlane, 2, thr)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val got = mine(1.0)
    got.keySet shouldBe Set(10L, 20L)
    got(10L)._1 shouldBe 1L
    got(10L)._2 shouldBe 1.176471 +- 1e-3
    got(20L)._1 shouldBe 3L // margin beats the hub t2 despite lower cosine
    got(20L)._2 shouldBe 1.25 +- 1e-3
    // a higher threshold gates s1 out, keeps s2
    mine(1.2).keySet shouldBe Set(20L)
  }

  test("marginMinePairs: zero-norm vectors follow the oracle's NULL algebra (no ANSI divide)") {
    // z (all-zero, the hashing encoder's token-free-sentence output) has
    // NULL cosine to everything: DuckDB's list() keeps the NULL, so any
    // source/target whose top-k window admits z gets a NULL k-mean and a
    // NULL margin — it must silently emit nothing, not throw. A zero
    // vector always lands in SRP bucket 0 (no dot is > 0), so the panel
    // uses vectors whose plane dot is ≤ 0 — everyone shares bucket 0 and
    // z really is a candidate. k = 3 admits z into every neighborhood;
    // s1→t1 would win on cosine but its poisoned margin is NULL, so no
    // row survives the threshold.
    val onePlane = Seq(Seq(1, 1))
    val src = Seq((10L, Array(1.0f, -1.0f))).toDF("vec_id", "embedding")
    val tgt = Seq((1L, Array(0.6f, -0.8f)), (2L, Array(0.0f, -1.0f)),
      (3L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    graft.operators.SimilaritySearch.marginMinePairs(src, tgt, onePlane, 3, 0.0)
      .count() shouldBe 0L
    // with k = 2 the zero vector ranks LAST (NULLS LAST) and stays out of
    // both neighborhoods: the mined pair is unchanged by z's presence
    val got = graft.operators.SimilaritySearch
      .marginMinePairs(src, tgt, onePlane, 2, 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    got shouldBe Seq((10L, 1L))
  }

  test("tuneNProbe: cheapest candidate clearing the rational target; argmax fallback when unreachable") {
    // hand-walked 2-D fixture — centroids c100=[1,0], c200=[0,1];
    // a=[1,0]→list 100, b=[.6,.8] and c=[0,1]→list 200;
    // query [.8,.6] probes c100 first (cos .8) then c200 (cos .6).
    // Brute truth top-2 = {b (cos .96), a (cos .8)}.
    // nprobe 1 → candidates {a} → hits 1/2; nprobe 2 → {a,b,c} → hits 2/2.
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.6f, 0.8f)), (3L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((100L, Array(1.0f, 0.0f)), (200L, Array(0.0f, 1.0f)))
      .toDF("cent_id", "cent_emb")
      .withColumn("cent_nrm", SimilaritySearch.l2Norm(col("cent_emb")))
    val queries = Seq((50L, Array(0.8f, 0.6f))).toDF("vec_id", "embedding")
    val lists = SimilaritySearch.ivfLists(corpus, cents)
    def run(num: Int, den: Int) =
      SimilaritySearch.tuneNProbe(lists, cents, queries, 2, 2, num, den)
        .collect().map(r => r.getInt(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    // target 9/10: nprobe 1 misses (recall .5), nprobe 2 clears → chosen 2
    val strict = run(9, 10)
    strict(1) shouldBe ((1L, 2L, 0.5, false))
    strict(2) shouldBe ((2L, 2L, 1.0, true))
    // target 1/2: nprobe 1 already clears (exact-integer 1·2 ≥ 2·1) → chosen 1
    val loose = run(1, 2)
    loose(1)._4 shouldBe true
    loose(2)._4 shouldBe false
    // unreachable target 11/10: fall back to best measured recall → 2
    val unreach = run(11, 10)
    unreach(1)._4 shouldBe false
    unreach(2)._4 shouldBe true
  }
}
