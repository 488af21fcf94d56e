package graft

import org.apache.spark.sql.functions._
import graft.operators.{Chunking, Decontamination, Joins}

/** Witnesses for the scale-machinery operators: benchmark
  * decontamination, bloom-pruned semi-join, sequence packing, and the
  * ORC round-trip. */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    (1L, "the quick brown fox jumps"), // shares "quick brown fox" with bench
    (2L, "totally unrelated words here"),
    (3L, "quick brown fox quick brown fox runs"), // same shared gram, once distinct
    (4L, "ab cd") // too short for a 3-gram
  ).toDF("doc_id", "text")
  private val bench = Seq(
    (100L, "a quick brown fox story")
  ).toDF("doc_id", "text")

  test("contaminated finds exactly the gram-sharing train docs") {
    val hits = Decontamination.contaminated(train, bench, 3)
      .orderBy("doc_id").as[(Long, Long)].collect()
    hits shouldBe Array((1L, 1L), (3L, 1L))
  }

  test("scrub keeps the clean corpus") {
    Decontamination.scrub(train, bench, 3)
      .select("doc_id").as[Long].collect().sorted shouldBe Array(2L, 4L)
  }

  test("fuzzy decontamination flags similarity-level leakage, not one shared phrase") {
    val benchDoc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = Seq((100L, benchDoc)).toDF("doc_id", "text")
    val t = Seq(
      // near-dup of the benchmark: one word changed -> high Jaccard
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      // shares exactly one trigram, otherwise unrelated: exact protocol
      // flags it, the similarity threshold does not
      (2L, "alpha beta gamma completely different tail words here now"),
      (3L, "nothing in common with anything at all truly")).toDF("doc_id", "text")
    val fuzzy = Decontamination.contaminatedFuzzy(t, b, 3, 16, 4, 0.5)
      .select("doc_id").as[Long].collect().toSet
    fuzzy shouldBe Set(1L)
    val exact = Decontamination.contaminated(t, b, 3)
      .select("doc_id").as[Long].collect().toSet
    exact shouldBe Set(1L, 2L) // the phrase-level protocol flags doc 2 too
    Decontamination.scrubFuzzy(t, b, 3, 16, 4, 0.5)
      .select("doc_id").as[Long].collect().sorted shouldBe Array(2L, 3L)
  }

  test("bloomSemiJoin equals the plain semi-join (false positives removed)") {
    val big = (1L to 500L).map(i => (i, i % 7)).toDF("k", "v")
    val keys = Seq(3L, 17L, 400L, 999L).toDF("key") // 999 matches nothing
    val got = Joins.bloomSemiJoin(big, keys, "k", "key", expectedKeys = 100L)
      .orderBy("k").as[(Long, Long)].collect()
    val want = big.join(keys.select(col("key").as("k")), Seq("k"), "left_semi")
      .orderBy("k").as[(Long, Long)].collect()
    got shouldBe want
    got.map(_._1) shouldBe Array(3L, 17L, 400L)
  }

  test("bloomSemiJoin keeps null keys out") {
    val big = Seq(Some(1L), None, Some(2L)).toDF("k")
    val keys = Seq(1L).toDF("key")
    Joins.bloomSemiJoin(big, keys, "k", "key", expectedKeys = 10L)
      .as[Long].collect() shouldBe Array(1L)
  }

  test("packSequences hand-computed intervals, one stratum") {
    // tokens 60, 64, 64, 12 laid end to end, budget 100:
    // cum_before 0, 60, 124, 188 -> packs 0,0,1,1; offsets 0,60,24,88
    val chunks = Seq(
      ("en", 1L, 0L, 60L), ("en", 1L, 1L, 64L),
      ("en", 2L, 0L, 64L), ("en", 2L, 1L, 12L)
    ).toDF("lang", "doc_id", "chunk_id", "n_tokens")
    val got = Chunking.packSequences(chunks, 100, "lang", Seq("doc_id", "chunk_id"))
      .select("doc_id", "chunk_id", "cum_before", "pack_id", "pack_offset", "straddles")
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    got shouldBe Array(
      (1L, 0L, 0L, 0L, 0L, false),
      (1L, 1L, 60L, 0L, 60L, true),  // 60+64 > 100: straddles the boundary
      (2L, 0L, 124L, 1L, 24L, false),
      (2L, 1L, 188L, 1L, 88L, false))
  }

  test("packSequences strata pack independently and ignore input order") {
    val chunks = Seq(
      ("de", 5L, 0L, 30L), ("en", 1L, 0L, 30L), ("de", 6L, 0L, 30L),
      ("en", 2L, 0L, 30L), ("en", 3L, 0L, 30L)
    ).toDF("lang", "doc_id", "chunk_id", "n_tokens")
    val packed = Chunking.packSequences(
        chunks.orderBy(rand(7)), 50, "lang", Seq("doc_id", "chunk_id"))
      .select("lang", "doc_id", "cum_before", "pack_id")
      .orderBy("lang", "doc_id")
      .as[(String, Long, Long, Long)].collect()
    packed shouldBe Array(
      ("de", 5L, 0L, 0L), ("de", 6L, 30L, 0L),
      ("en", 1L, 0L, 0L), ("en", 2L, 30L, 0L), ("en", 3L, 60L, 1L))
  }

  test("packIdSequences slices straddling docs at the boundary, content end to end") {
    val docIds = Seq(
      ("en", 1L, Seq(1L, 2L, 3L)),
      ("en", 2L, Seq(4L, 5L, 6L, 7L)), // straddles packs 0/1 at offset 3
      ("en", 3L, Seq(8L)),
      ("en", 4L, Seq.empty[Long]), // no ids: contributes nothing
      ("de", 9L, Seq(40L, 41L, 42L, 43L, 44L))) // own stratum, own packs
      .toDF("lang", "doc_id", "ids")
    val got = Chunking.packIdSequences(docIds.orderBy(rand(3)), 4, "lang")
      .orderBy("lang", "pack_id")
      .select("lang", "pack_id", "seq").as[(String, Long, Seq[Long])].collect()
    got shouldBe Array(
      ("de", 0L, Seq(40L, 41L, 42L, 43L)),
      ("de", 1L, Seq(44L)), // final pack may be short
      ("en", 0L, Seq(1L, 2L, 3L, 4L)),
      ("en", 1L, Seq(5L, 6L, 7L, 8L)))
    // conservation: packs laid back end to end reproduce the doc stream
    got.filter(_._1 == "en").flatMap(_._3).toSeq shouldBe (1L to 8L)
  }

  test("packIdSequencesWithSpans: boundaries, straddle splits, Σlen = pack size, seq matches") {
    val docIds = Seq(
      ("en", 1L, Seq(1L, 2L, 3L)),
      ("en", 2L, Seq(4L, 5L, 6L, 7L)), // straddles packs 0/1
      ("en", 3L, Seq(8L)),
      ("de", 9L, Seq(40L, 41L, 42L, 43L, 44L)))
      .toDF("lang", "doc_id", "ids")
    val got = Chunking.packIdSequencesWithSpans(
        docIds.orderBy(rand(7)), 4, Seq("lang"), "doc_id", "ids")
      .orderBy("lang", "pack_id")
      .select("lang", "pack_id", "seq", "spans")
      .as[(String, Long, Seq[Long], Seq[(Long, Int, Int)])].collect()
    got.map(g => (g._1, g._2, g._4.toList)).toSeq shouldBe Seq(
      ("de", 0L, List((9L, 0, 4))),
      ("de", 1L, List((9L, 0, 1))), // tail of the straddler opens pack 1
      ("en", 0L, List((1L, 0, 3), (2L, 3, 1))),
      ("en", 1L, List((2L, 0, 3), (3L, 3, 1))))
    // spans tile each pack exactly: Σ len = len(seq), offsets contiguous
    got.foreach { case (_, _, seq, spans) =>
      spans.map(_._3).sum shouldBe seq.size
      spans.scanLeft(0)(_ + _._3).init shouldBe spans.map(_._2)
    }
    // seq agrees with the span-free packer on the same input
    val plain = Chunking.packIdSequences(docIds, 4, "lang")
      .orderBy("lang", "pack_id").select("seq").as[Seq[Long]].collect()
    got.map(_._3.toList).toSeq shouldBe plain.map(_.toList).toSeq
  }

  test("packIdSequences lang×shard strata: window partitions on both axes, shards split the stream") {
    import graft.functions.TextFunctions.hash60
    val docs = (1L to 40L).map(i => (if (i % 2 == 0) "en" else "de", i,
      Seq(i * 10, i * 10 + 1))).toDF("lang", "doc_id", "ids")
    val sharded = docs.withColumn("shard",
      pmod(hash60(col("doc_id").cast("string")), lit(4L)))
    val packed = Chunking.packIdSequences(
      sharded.orderBy(rand(5)), 4, Seq("lang", "shard"), "doc_id", "ids")
    // The stratum axis must reach the physical window: a plan that
    // partitions on lang alone funnels a language's whole token stream
    // through one partition at 100×.
    val plan = packed.queryExecution.executedPlan.toString
    val winLine = plan.linesIterator.find(_.contains("Window")).get
    winLine should include("lang")
    winLine should include("shard")
    val rows = packed
      .select(col("lang"), col("shard"), col("pack_id"), col("seq"))
      .as[(String, Long, Long, Seq[Long])].collect()
    // sharding actually splits: each language spreads over >1 shard stratum
    rows.groupBy(_._1).foreach { case (_, rs) =>
      rs.map(_._2).distinct.size should be > 1
    }
    // per-stratum correctness: packs concatenated in pack order reproduce
    // the stratum's id stream in doc order (conservation under sharding)
    val byStratum = rows.groupBy(r => (r._1, r._2))
    val docRows = sharded.select(col("lang"), col("shard"), col("doc_id"), col("ids"))
      .as[(String, Long, Long, Seq[Long])].collect()
    docRows.groupBy(r => (r._1, r._2)).foreach { case (k, ds) =>
      val expected = ds.sortBy(_._3).flatMap(_._4).toSeq
      val gotStream = byStratum(k).sortBy(_._3).flatMap(_._4).toSeq
      gotStream shouldBe expected
      // every pack but the stratum's last is exactly seqLen long
      byStratum(k).sortBy(_._3).dropRight(1).foreach(_._4.size shouldBe 4)
    }
  }

  test("lengthBatches: bucket widths, batch sizing by budget, over-long exclusion") {
    val rows = (Seq(3L, 10L, 16L, 17L, 30L, 33L, 64L, 65L, 0L)).zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toDF("doc_id", "n_tokens")
    val got = Chunking.lengthBatches(rows, tokenBudget = 64,
        boundaries = Seq(16, 32, 64), idCol = "doc_id")
      .select("doc_id", "bucket_upper", "batch_id", "pad_tokens")
      .as[(Long, Int, Long, Long)].collect().sortBy(_._1)
    // 65-token and 0-token rows are excluded (ids 7, 8)
    got.map(_._1).toSeq shouldBe Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L)
    val byId = got.map(r => r._1 -> r).toMap
    byId(0L)._2 shouldBe 16 // 3 tokens -> 16-wide bucket
    byId(3L)._2 shouldBe 32 // 17 -> 32
    byId(6L)._2 shouldBe 64
    byId(0L)._4 shouldBe 13L // pad = 16 - 3
    // budget 64 -> 4 rows/batch in the 16 bucket: ids 0,1,2 fit batch 0
    Seq(0L, 1L, 2L).map(byId(_)._3).toSet shouldBe Set(0L)
    // 64-wide bucket (33- and 64-token rows): 1 row per batch, length order
    byId(5L)._3 shouldBe 0L
    byId(6L)._3 shouldBe 1L
    // every batch's padded volume respects the budget
    got.groupBy(r => (r._2, r._3)).foreach { case ((w, _), rs) =>
      (rs.length.toLong * w) should be <= 64L
    }
  }

  test("intervalJoin equals the naive theta join on random data") {
    val rnd = new scala.util.Random(11)
    val ranges = (1L to 60L).map { i =>
      val lo = rnd.nextInt(500).toLong - 100 // negative lows exercised too
      (i, lo, lo + rnd.nextInt(90).toLong)   // empty when width = 0
    }.toDF("range_id", "lo", "hi")
    val points = (1L to 300L).map(i => (i, rnd.nextInt(700).toLong - 200))
      .toDF("p_id", "v")
    for (w <- Seq(7L, 64L, 1000L)) {
      val got = Joins.intervalJoin(points, ranges, "v", "lo", "hi", w)
        .select("p_id", "range_id").orderBy("p_id", "range_id")
        .as[(Long, Long)].collect()
      val want = points.crossJoin(ranges)
        .where(col("v") >= col("lo") && col("v") < col("hi"))
        .select("p_id", "range_id").orderBy("p_id", "range_id")
        .as[(Long, Long)].collect()
      got shouldBe want
    }
  }

  test("intervalJoin drops null points and null-bounded ranges") {
    val ranges = Seq((1L, Some(0L), Some(10L)), (2L, None, Some(10L)))
      .toDF("range_id", "lo", "hi")
    val points = Seq((1L, Some(5L)), (2L, None)).toDF("p_id", "v")
    Joins.intervalJoin(points, ranges, "v", "lo", "hi", 4L)
      .select("p_id", "range_id").as[(Long, Long)].collect() shouldBe
      Array((1L, 1L))
  }

  test("histQuantiles matches Spark's exact percentile on random grouped data") {
    val rnd = new scala.util.Random(19)
    val df = (1 to 2000).map(i =>
      (if (i % 3 == 0) "a" else "b", rnd.nextInt(40).toDouble)).toDF("g", "x")
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val got = graft.operators.Profiling.histQuantiles(df, "g", "x", ps)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val want = df.groupBy("g")
      .agg(percentile(col("x"), lit(ps.toArray)).as("qs"))
      .collect().flatMap(r => ps.zip(r.getSeq[Double](1)).map {
        case (p, q) => (r.getString(0), p) -> q }).toMap
    got.keySet shouldBe want.keySet
    got.foreach { case (k, v) => v shouldBe want(k) +- 1e-9 }
  }

  test("histQuantiles ignores NULL values (percentile semantics)") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", None)).toDF("g", "x")
    val got = graft.operators.Profiling.histQuantiles(df, "g", "x", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    got shouldBe Map("a" -> 2.0) // NULLs neither count nor rank; all-NULL group emits nothing
  }

  test(".npy matrix round-trip; reads a numpy-written file byte-for-byte") {
    val dir = java.nio.file.Files.createTempDirectory("graft_npy").toString
    // pair table → dense float32 .npy → back to the long form
    val pairs = Seq((1L, 5L, 0.75), (5L, 1L, 0.75), (1L, 9L, -0.25), (9L, 5L, 0.5))
      .toDF("item_a", "item_b", "corr")
    val ids = graft.sources.Sources.saveNpyMatrix(pairs, s"$dir/m.npy")
    ids shouldBe Seq(1L, 5L, 9L)
    val back = graft.sources.Sources.loadNpyMatrix(spark, s"$dir/m.npy", ids)
      .orderBy("item_a", "item_b")
      .as[(Long, Long, Double)].collect().toSeq
    back shouldBe Seq((1L, 5L, 0.75), (1L, 9L, -0.25), (5L, 1L, 0.75), (9L, 5L, 0.5))
    // the maxItems guard refuses a driver-side densify beyond bound
    an[IllegalArgumentException] should be thrownBy
      graft.sources.Sources.saveNpyMatrix(pairs, s"$dir/m2.npy", maxItems = 2)

    // interop: this fixture was written by numpy itself
    // (np.save of [[1,.25,-.5],[.25,1,.125],[-.5,.125,1]], dtype <f4>)
    val numpyBytes: Array[Byte] = Array[Int](
      -109, 78, 85, 77, 80, 89, 1, 0, 118, 0, 123, 39, 100, 101, 115, 99, 114, 39,
      58, 32, 39, 60, 102, 52, 39, 44, 32, 39, 102, 111, 114, 116, 114, 97, 110,
      95, 111, 114, 100, 101, 114, 39, 58, 32, 70, 97, 108, 115, 101, 44, 32, 39,
      115, 104, 97, 112, 101, 39, 58, 32, 40, 51, 44, 32, 51, 41, 44, 32, 125, 32,
      32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32,
      32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32,
      32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32,
      10, 0, 0, -128, 63, 0, 0, -128, 62, 0, 0, 0, -65, 0, 0, -128, 62, 0, 0, -128,
      63, 0, 0, 0, 62, 0, 0, 0, -65, 0, 0, 0, 62, 0, 0, -128, 63).map(_.toByte)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/numpy.npy"), numpyBytes)
    val (r, c, vals) = graft.sources.Npy.read(spark, s"$dir/numpy.npy")
    (r, c) shouldBe ((3, 3))
    vals.toSeq shouldBe Seq(1.0, 0.25, -0.5, 0.25, 1.0, 0.125, -0.5, 0.125, 1.0)
    // and our writer's output parses back identically (same header scheme)
    graft.sources.Npy.write(spark, s"$dir/ours.npy", 3, 3, vals.map(_.toFloat))
    graft.sources.Npy.read(spark, s"$dir/ours.npy")._3.toSeq shouldBe vals.toSeq
  }

  test("ORC round-trip is exact") {
    val out = java.nio.file.Files.createTempDirectory("graft_orc_spec").toString
    val d = Seq((1L, "a", 1.5), (2L, "b", -0.25)).toDF("id", "s", "x")
    graft.sources.Sources.saveOrc(d, out)
    graft.sources.Sources.orc(spark, out).orderBy("id")
      .as[(Long, String, Double)].collect() shouldBe
      Array((1L, "a", 1.5), (2L, "b", -0.25))
  }

  test("keySkew matches the hand-computed report; uniform keys have gini 0") {
    // counts: a×6, b×2, c×1, d×1 → ranks asc (c,key): c,d,b,a ⇒
    // Σ r·c = 1+2+6+24 = 33; G = 2·33/(4·10) − 5/4 = 0.4
    // counts histogram [1,1,2,6]: p50 = 1.5, p99 = 2 + 0.97·4 = 5.88
    val skewed = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d")).toDF("k")
    val r = graft.operators.Profiling.keySkew(skewed, "k", topK = 10).collect()(0)
    (r.getLong(0), r.getLong(1)) shouldBe ((10L, 4L))
    r.getDouble(2) shouldBe 0.6 // top1_share
    r.getDouble(3) shouldBe 1.0 // topk_share (k=10 covers all)
    r.getDouble(4) shouldBe 3.92 +- 1e-9 // 5.88 / 1.5
    r.getDouble(5) shouldBe 0.4 // gini
    val uniform = Seq("e", "e", "f", "f").toDF("k")
    graft.operators.Profiling.keySkew(uniform, "k")
      .collect()(0).getDouble(5) shouldBe 0.0
  }

  test("cdcChunks tile each document exactly; boundaries re-align after a prefix edit") {
    // deterministic pseudo-text long enough to contain several cuts
    def words(seed: Int, n: Int): String = {
      val r = new scala.util.Random(seed)
      Seq.fill(n)(s"w${r.nextInt(40)}").mkString(" ")
    }
    val bodyA = words(7, 240)
    val docs = Seq((1L, bodyA), (2L, "pre fix ins " + bodyA), (3L, bodyA))
      .toDF("doc_id", "text")
    val ch = Chunking.cdcChunks(docs, 4, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    val byDoc = ch.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // tiling law: dense chunk_no, contiguous spans, full coverage
    for ((id, cs) <- byDoc) {
      cs.map(_._2).toSeq shouldBe cs.indices.map(_.toLong).toSeq
      cs.sliding(2).foreach {
        case Array((_, _, s1, n1, _), (_, _, s2, _, _)) => s2 shouldBe s1 + n1
        case _ => ()
      }
      val total = if (id == 2L) 243L else 240L
      cs.map(_._4).sum shouldBe total
    }
    byDoc(1L).length should be > 3 // several content cuts at modK=16
    // identical docs chunk identically
    byDoc(3L).map(c => (c._2, c._3, c._4, c._5)) shouldBe
      byDoc(1L).map(c => (c._2, c._3, c._4, c._5))
    // CONTENT-DEFINED: a 3-token prefix edit may change only the chunks
    // touching the edit — every later boundary re-aligns, so doc 1's
    // chunk hashes survive in doc 2 except at most the first
    val a = byDoc(1L).map(_._5)
    val b = byDoc(2L).map(_._5).toSet
    a.count(h => !b.contains(h)) should be <= 1
  }

  test("DataQuality checks flag planted nulls, dup keys, orphans, and bound violations") {
    import graft.operators.DataQuality._
    val child = Seq((1L, Option(10L), 5.0), (2L, Option(10L), -1.0),
      (2L, Option(99L), 3.0), (4L, None, 2.0))
      .toDF("id", "parent_id", "price")
    val parent = Seq(10L, 11L).toDF("pid")
    val rep = report(Seq(
        nullFracCheck(child, "parent_id", "child.parent_id"),
        uniqueCheck(child, "id", "child.id"),
        fkCheck(child, "parent_id", parent, "pid", "child->parent"),
        minBoundCheck(child, "price", 0.0, "child.price"),
        rowCountCheck(child, 1L, "child")))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    rep("null_frac:child.parent_id") shouldBe ((0.25, false)) // 1 of 4 null
    rep("unique:child.id") shouldBe ((0.75, false)) // id 2 duplicated
    rep("fk:child->parent") shouldBe ((2.0, false)) // orphan 99 + NULL ref
    rep("min_bound:child.price") shouldBe ((1.0, false)) // one ≤ 0
    rep("row_count:child") shouldBe ((4.0, true))
    rep.size shouldBe 5
  }

  test("DataQuality passes a clean table, every verdict true") {
    import graft.operators.DataQuality._
    val child = Seq((1L, 10L, 5.0), (2L, 11L, 3.0)).toDF("id", "parent_id", "price")
    val parent = Seq(10L, 11L).toDF("pid")
    val rep = report(Seq(
        nullFracCheck(child, "parent_id", "t"),
        uniqueCheck(child, "id", "t"),
        fkCheck(child, "parent_id", parent, "pid", "t"),
        minBoundCheck(child, "price", 0.0, "t"),
        rowCountCheck(child, 2L, "t")))
      .collect()
    rep.map(_.getBoolean(2)).forall(identity) shouldBe true
    rep.length shouldBe 5
  }

  test("DataQuality on an EMPTY table: passed is a concrete boolean, never NULL") {
    import graft.operators.DataQuality._
    val empty = Seq.empty[(Long, Double)].toDF("id", "price")
    val rep = report(Seq(
        nullFracCheck(empty, "id", "e"),
        uniqueCheck(empty, "id", "e"),
        minBoundCheck(empty, "price", 0.0, "e"),
        rowCountCheck(empty, 1L, "e")))
      .collect().map(r => r.getString(0) ->
        ((r.isNullAt(2), r.getBoolean(2)))).toMap
    // a scheduler gating on `passed = false` must see real booleans: the
    // vacuous checks pass (zero nulls / zero dups / zero violations), the
    // row-count check fails — and none of them is NULL
    rep.values.foreach { case (isNull, _) => isNull shouldBe false }
    rep("null_frac:e")._2 shouldBe true
    rep("unique:e")._2 shouldBe true
    rep("min_bound:e")._2 shouldBe true
    rep("row_count:e")._2 shouldBe false
  }
}
