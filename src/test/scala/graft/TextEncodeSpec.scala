package graft

import graft.operators.TextEncode
import org.apache.spark.sql.functions._

/** The embedding inference hook: batch shape (size bound, order
  * alignment, exactly-one-vector-per-text enforcement), the hashing
  * stand-in's arithmetic, and the map-only plan. */
class TextEncodeSpec extends SparkSpec {
  import spark.implicits._

  // token buckets mod 8 (md5-60): delta→1, epsilon→0, zeta→5, eta→7,
  // theta→4 — all distinct, so the count arithmetic below is collision-free
  private val docs = Seq(
    (1L, "delta epsilon delta"),
    (2L, "epsilon zeta"),
    (3L, ""), // zero tokens → zero vector
    (4L, "  delta   epsilon\tdelta  "), // whitespace-insensitive: same as doc 1
    (5L, "theta"),
    (6L, "zeta eta"),
    (7L, "delta zeta theta")).toDF("doc_id", "text")

  test("hashingEncoder: bucket counts L2-normalized; same token multiset → same vector") {
    val out = TextEncode.encodeDocuments(docs, TextEncode.hashingEncoder(8))
      .collect().map(v => v.doc_id -> v.embedding).toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 4L, 5L, 6L, 7L)
    out.values.foreach(_.length shouldBe 8)
    // doc 1: counts {delta: 2, epsilon: 1} → norm √5; entries 2/√5, 1/√5
    val v1 = out(1L).map(_.toDouble)
    math.sqrt(v1.map(x => x * x).sum) shouldBe 1.0 +- 1e-6
    v1.filter(_ != 0.0).sorted.toSeq shouldBe
      Seq(1.0 / math.sqrt(5), 2.0 / math.sqrt(5)).map(_.toFloat.toDouble)
    // whitespace runs don't matter: doc 4 ≡ doc 1
    out(4L).toSeq shouldBe out(1L).toSeq
    // empty text → exact zero vector (NOT absent)
    out(3L).toSeq shouldBe Seq.fill(8)(0.0f)
    // single token lands one bucket with weight exactly 1
    out(5L).count(_ != 0.0f) shouldBe 1
    out(5L).max shouldBe 1.0f
  }

  test("batching: encoder sees ≤ batchSize texts per call, order-aligned, all texts exactly once") {
    val seen = spark.sparkContext.collectionAccumulator[Int]("batchSizes")
    val enc: TextEncode.Encoder = { texts =>
      seen.add(texts.length)
      // vector encodes the text's own length → output must align 1:1
      texts.map(t => Array(Option(t).getOrElse("").length.toFloat))
    }
    val one = docs.repartition(1) // single partition → deterministic batching
    val got = TextEncode.encodeDocuments(one, enc, batchSize = 3)
      .collect().map(v => v.doc_id -> v.embedding(0)).toMap
    val want = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).length.toFloat).toMap
    got shouldBe want // order alignment: each id got ITS text's vector
    val sizes = seen.value
    sizes.forEach(s => assert(s <= 3 && s >= 1))
    sizes.size() shouldBe 3 // 7 rows / batch 3 → 3, 3, 1
  }

  test("a miscounting encoder fails the task loudly, never misaligns") {
    val bad: TextEncode.Encoder = texts => texts.drop(1).map(_ => Array(0.0f))
    val ex = intercept[org.apache.spark.SparkException] {
      TextEncode.encodeDocuments(docs, bad, batchSize = 4).collect()
    }
    ex.getMessage should include("vectors for")
  }

  test("plan is map-only: no exchange between the scan and the encode") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = TextEncode.encodeDocuments(docs, TextEncode.hashingEncoder())
      .queryExecution.executedPlan
    def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int =
      (p.collect {
        case _: ShuffleExchangeExec => 1
        case a: AdaptiveSparkPlanExec => shuffles(a.initialPlan)
      }).sum
    shuffles(plan) shouldBe 0
  }
}
