package graft

import graft.operators.{Chunking, Sampling}
import org.apache.spark.sql.functions._

/** Unit coverage for the corpus-pipeline operators whose main gate is the
  * DuckDB oracle (q49/q50): edge cases and the determinism contract. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hash sampling is deterministic and roughly proportional") {
    val docs = (1L to 2000L).map(i => (i, "x")).toDF("doc_id", "text")
    val once = Sampling.sample(docs, "doc_id", 250).select("doc_id").as[Long].collect().toSet
    val twice = Sampling.sample(docs, "doc_id", 250).select("doc_id").as[Long].collect().toSet
    once shouldBe twice // layout/rerun-stable
    assert(once.size > 350 && once.size < 650, s"${once.size} of 2000 at 250 permille")
    // slices nest: a 100 permille slice is a subset of the 250 permille slice
    val smaller = Sampling.sample(docs, "doc_id", 100).select("doc_id").as[Long].collect().toSet
    assert(smaller.subsetOf(once))
  }

  test("stratified sampling applies per-stratum rates with a default") {
    val docs = (1L to 3000L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"))
      .toDF("doc_id", "lang")
    val kept = Sampling.stratified(docs, "doc_id", "lang",
      Map("en" -> 1000, "de" -> 0), defaultPermille = 1000)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang("en") shouldBe 1000L  // keep all
    byLang.get("de") shouldBe None // drop all
    byLang("fr") shouldBe 1000L  // default keeps all
  }

  test("tfidfCrosstab: integer milli-nat weights, ubiquitous terms dropped") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha gamma"), (3L, "alpha beta delta"))
      .toDF("doc_id", "text")
    val cells = graft.functions.TextFunctions.tfidfCrosstab(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // "alpha" appears in all 3 docs → idf_q = round(1000·ln(1)) = 0 → dropped
    cells.size shouldBe 4 // beta×2, gamma×1, delta×1 — alpha gone
    // every weight is a positive integer (tf · milli-nat idf)
    cells.values.foreach { w =>
      assert(w > 0.0 && w == math.rint(w), s"non-integer weight $w")
    }
    // beta (df=2): idf_q = round(1000·ln(3/2)) = 405
    assert(cells.values.toSeq.sorted.take(2) == Seq(405.0, 405.0))
    // gamma/delta (df=1): idf_q = round(1000·ln(3)) = 1099
    assert(cells.values.toSeq.sorted.drop(2) == Seq(1099.0, 1099.0))
  }

  test("chunkDocuments windows with overlap; short and empty docs behave") {
    val docs = Seq(
      (1L, "a b c d e f g"), // 7 tokens → starts 0,3,6 at stride 3
      (2L, "x y"),           // shorter than one chunk → one short chunk
      (3L, "")               // empty → no rows
    ).toDF("doc_id", "text")
    val out = Chunking.chunkDocuments(docs, chunkTokens = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    out.filter(_._1 == 1L).sortBy(_._2).toSeq shouldBe Seq(
      (1L, 0L, 4L, "a b c d"), (1L, 1L, 4L, "d e f g"), (1L, 2L, 1L, "g"))
    out.filter(_._1 == 2L).toSeq shouldBe Seq((2L, 0L, 2L, "x y"))
    out.count(_._1 == 3L) shouldBe 0
  }

  test("neymanAllocation: budget follows N·σ, sums exactly, flags infeasible strata") {
    import graft.operators.Sampling
    // stratum a: 4 rows, sd = sqrt(variance of 0,0,10,10 sample) ≈ 5.773503
    // stratum b: 4 rows, constant → sd 0 (earns nothing under Neyman)
    // stratum c: 2 rows, sd of (0, 20) = 14.142136 — small but wild
    val rows = Seq(("a", 0.0), ("a", 0.0), ("a", 10.0), ("a", 10.0),
      ("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 5.0),
      ("c", 0.0), ("c", 20.0)).toDF("s", "v")
    val got = Sampling.neymanAllocation(rows, "s", "v", 10L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(4), r.getBoolean(5)))).toMap
    got("b")._3 shouldBe 0L // zero spread, zero budget
    got("a")._3 + got("c")._3 shouldBe 10L // exact apportionment
    // weights: a = 4·5.7735 = 23.094, c = 2·14.1421 = 28.284 → c gets more
    got("c")._3 should be > got("a")._3
    // c's allocation exceeds its 2 rows → infeasible flag
    got("c")._4 shouldBe false
    got("a")._4 shouldBe true
  }

  test("neymanAllocation: all-constant strata fall back to proportional") {
    import graft.operators.Sampling
    val rows = Seq.fill(6)(("a", 1.0)) ++ Seq.fill(2)(("b", 2.0))
    val got = Sampling.neymanAllocation(rows.toDF("s", "v"), "s", "v", 8L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    got shouldBe Map("a" -> 6L, "b" -> 2L)
  }

  test("apportion: over-floor takeback skips zero-base strata, never negative") {
    import graft.operators.Sampling
    // under-floor (normal): leftover unit to the largest fractional part,
    // the a/b tie at .4 broken to the alphabetically-first stratum
    Sampling.apportion(Seq("a" -> 1.4, "b" -> 1.4, "c" -> 0.2), 3L) shouldBe
      Seq(2L, 1L, 0L)
    // over-floor (1e-6-rounding pathology): quotas rounded UP to integers
    // so Σfloor = 3 > budget 2; the zero-base stratum z (quota 0.0, the
    // smallest fractional part) must NOT be decremented to -1 — takeback
    // lands on base>0 strata only, alphabetically-first on frac ties
    val over = Sampling.apportion(
      Seq("a" -> 1.0, "b" -> 1.0, "c" -> 1.0, "z" -> 0.0), 2L)
    over shouldBe Seq(0L, 1L, 1L, 0L)
    over.foreach(_ should be >= 0L)
    over.sum shouldBe 2L
    // a takeback one unit deep is absorbed by the lone base>0 stratum…
    Sampling.apportion(Seq("a" -> 1.0, "z" -> 0.0), 0L) shouldBe Seq(0L, 0L)
    // …but one deeper than the base>0 strata can absorb raises instead
    // of going negative
    an[IllegalArgumentException] should be thrownBy
      Sampling.apportion(Seq("a" -> 2.0, "z" -> 0.0), 0L)
  }
}
