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
}
