package graft

import graft.operators.UnigramLm
import org.apache.spark.sql.functions._

/** Hand-computed unigram-LM witnesses (q139/q140). */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def viterbi(word: String, vocab: Map[String, Double],
                      maxPiece: Int = 4): Seq[String] =
    Seq(word).toDF("w")
      .select(UnigramLm.viterbiPieces(col("w"), typedlit(vocab), maxPiece).as("p"))
      .as[Seq[String]].collect().head

  test("viterbiPieces picks the max-probability segmentation") {
    val v = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -1.0)
    viterbi("ab", v) shouldBe Seq("ab") // -1 beats [a,b] = -2
    viterbi("aba", v) shouldBe Seq("ab", "a") // -2 beats [a,b,a] = -3
    viterbi("b", v) shouldBe Seq("b")
  }

  test("viterbiPieces breaks score ties toward the longer piece") {
    // [ab] = -2 exactly ties [a, b] = -1 + -1; the strict-improvement
    // scan keeps the smallest j = the longest final piece
    val v = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -2.0)
    viterbi("ab", v) shouldBe Seq("ab")
  }

  test("trainVocab replays the hand-computed EM trajectory") {
    // words: "aa" freq 2, "b" freq 1. Seed: a=4, aa=2, b=1 (total 7,
    // k=3). Round 1: Viterbi picks [aa] (ln(3/10) > 2·ln(5/10)) and [b]
    // → counts aa=2, b=1, a=0 (kept: char) → total 3, k=3 →
    // lp(a)=ln(1/6), lp(aa)=ln(3/6), lp(b)=ln(2/6). Round 2 repeats
    // identically; the prune to 3 keeps everything.
    val docs = Seq((1L, "aa aa b")).toDF("doc_id", "text")
    val got = UnigramLm.trainVocab(spark, docs, 2, 40, 3)
      .orderBy("round", "piece")
      .as[(Long, String, Long, Double)].collect()
    def r9(x: Double) = math.rint(x * 1e9) / 1e9
    val expRound = Seq(
      ("a", 0L, r9(math.log(1.0 / 6))),
      ("aa", 2L, r9(math.log(3.0 / 6))),
      ("b", 1L, r9(math.log(2.0 / 6))))
    got shouldBe (for (r <- 1L to 3L; (p, c, lp) <- expRound)
      yield (r, p, c, lp)).toArray
  }

  test("trainVocab drops zero-count multi pieces but keeps every char") {
    // seed includes "xy" but Viterbi never uses pieces of the unseen
    // char combos — chars always survive with cnt 0
    val docs = Seq((1L, "xy yx")).toDF("doc_id", "text")
    val r1 = UnigramLm.trainVocab(spark, docs, 1, 40, 10)
      .where(col("round") === 1).select("piece").as[String].collect().toSet
    r1 should contain allOf ("x", "y")
  }

  test("encodedLengths counts Viterbi pieces per document under a frozen vocab") {
    val v = Map("a" -> -2.0, "b" -> -2.0, "c" -> -2.0, "ab" -> -1.0)
    val docs = Seq((1L, "ab c"), (2L, "abc"), (3L, "...")).toDF("doc_id", "text")
    val got = UnigramLm.encodedLengths(docs, v).orderBy("doc_id")
      .as[(Long, Long, Long)].collect()
    // doc 1: "ab"→[ab], "c"→[c] = 2 words, 2 pieces;
    // doc 2: "abc"→[ab, c] = 1 word, 2 pieces; doc 3: no words, no row
    got shouldBe Array((1L, 2L, 2L), (2L, 1L, 2L))
  }

  test("trainVocab prunes to the target size, chars first") {
    val docs = Seq((1L, "abab baba abab cc")).toDF("doc_id", "text")
    val fin = UnigramLm.trainVocab(spark, docs, 2, 40, 5)
      .where(col("round") === 3).select("piece").as[String].collect()
    fin.length should be <= 5
    fin.filter(_.length == 1).toSet shouldBe Set("a", "b", "c")
  }

  private def greedy(word: String, vocab: Map[String, Double],
                     maxPiece: Int = 4): Seq[String] =
    Seq(word).toDF("w")
      .select(UnigramLm.greedyPieces(col("w"), typedlit(vocab), maxPiece).as("p"))
      .as[Seq[String]].collect().head

  test("greedyPieces takes the longest match at each cursor; [UNK] on dead-ends") {
    val v = Map("a" -> -1.0, "b" -> -1.0, "c" -> -1.0,
      "ab" -> -0.5, "bc" -> -0.5)
    greedy("abc", v) shouldBe Seq("ab", "c") // ab beats a at pos 0
    greedy("bc", v) shouldBe Seq("bc")
    greedy("cab", v) shouldBe Seq("c", "ab")
    greedy("axb", v) shouldBe Seq("[UNK]") // x unseen → whole word fails
    // scores are ignored: greedy differs from Viterbi where longest-first
    // is suboptimal — [ab, c] vs Viterbi's max-prob choice
    val v2 = Map("a" -> -1.0, "b" -> -9.0, "c" -> -9.0,
      "ab" -> -1.0, "bc" -> -1.0)
    greedy("abc", v2) shouldBe Seq("ab", "c") // greedy: -1 + -9
    viterbi("abc", v2) shouldBe Seq("a", "bc") // viterbi: -1 + -1
  }

  test("greedyEncodedLengths counts pieces per doc under a frozen vocab") {
    val v = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -0.5)
    val docs = Seq((1L, "ab aab b"), (2L, "ba")).toDF("doc_id", "text")
    val out = UnigramLm.greedyEncodedLengths(docs, v, maxPieceLen = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1: ab→[ab]=1, aab→[a,ab]=2, b→[b]=1 ⇒ 3 words, 4 pieces
    out(1L) shouldBe ((3L, 4L))
    out(2L) shouldBe ((1L, 2L)) // ba→[b,a]
  }
}
