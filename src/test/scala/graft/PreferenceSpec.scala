package graft

import org.apache.spark.sql.functions._
import graft.operators.Preference

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  private def scored(rows: (Long, Long, java.lang.Double)*) =
    rows.toDF("prompt_id", "doc_id", "score")

  test("preferencePairs picks argmax/argmin with margin gate") {
    val df = scored(
      (1L, 10L, 0.9), (1L, 11L, 0.2), (1L, 12L, 0.5), // clear pair
      (2L, 20L, 0.5), (2L, 21L, 0.48),                // margin 0.02 < 0.05
      (3L, 30L, 0.7))                                  // single candidate
    val out = Preference.preferencePairs(df, "prompt_id", "doc_id", "score", 0.05)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(5)))
    out.toSeq shouldBe Seq((1L, 10L, 11L, 0.7))
  }

  test("preferencePairs tie-breaks: chosen lowest id, rejected highest id") {
    val df = scored(
      (1L, 10L, 0.9), (1L, 11L, 0.9), // chosen tie → 10
      (1L, 12L, 0.1), (1L, 13L, 0.1)) // rejected tie → 13
    val r = Preference.preferencePairs(df, "prompt_id", "doc_id", "score", 0.05)
      .collect().head
    r.getLong(r.fieldIndex("chosen_id")) shouldBe 10L
    r.getLong(r.fieldIndex("rejected_id")) shouldBe 13L
  }

  test("preferencePairs excludes NULL scores from both sides") {
    val df = scored((1L, 10L, 0.9), (1L, 11L, null), (1L, 12L, 0.3))
    val r = Preference.preferencePairs(df, "prompt_id", "doc_id", "score", 0.05)
      .collect().head
    r.getLong(r.fieldIndex("chosen_id")) shouldBe 10L
    r.getLong(r.fieldIndex("rejected_id")) shouldBe 12L
    // a group whose only other candidate is NULL emits nothing
    val solo = scored((2L, 20L, 0.8), (2L, 21L, null))
    Preference.preferencePairs(solo, "prompt_id", "doc_id", "score", 0.05)
      .count() shouldBe 0L
  }

  test("preferencePairs carries payload columns without affecting selection") {
    val df = Seq(
      (1L, 10L, 0.9, "zzz"), // payload sorts OPPOSITE to the id tie-break
      (1L, 11L, 0.9, "aaa"),
      (1L, 12L, 0.1, "mmm"))
      .toDF("prompt_id", "doc_id", "score", "source")
    val r = Preference.preferencePairs(df, "prompt_id", "doc_id", "score",
      0.05, Seq("source")).collect().head
    r.getLong(r.fieldIndex("chosen_id")) shouldBe 10L
    r.getString(r.fieldIndex("chosen_source")) shouldBe "zzz"
    r.getString(r.fieldIndex("rejected_source")) shouldBe "mmm"
  }

  test("bradleyTerry: hand-computed first MM round on a 2-player matrix") {
    // A beats B 3 times, B beats A once. W_A=3, W_B=1, n_AB=4.
    val g = (Seq.fill(3)(("A", "B")) :+ (("B", "A"))).toDF("winner", "loser")
    val out = Preference.bradleyTerry(spark, g, "winner", "loser", 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val w0 = out.filter(_._1 == 0L).map(x => x._2 -> x._3).toMap
    w0("A") shouldBe 0.5
    w0("B") shouldBe 0.5
    // round 1: den = 4/(0.5+0.5) = 4 for both; raw_A = 3.5/4, raw_B = 1.5/4
    // normalized: A = 3.5/5 = 0.7, B = 1.5/5 = 0.3
    val w1 = out.filter(_._1 == 1L).map(x => x._2 -> x._3).toMap
    w1("A") shouldBe 0.7 +- 1e-9
    w1("B") shouldBe 0.3 +- 1e-9
  }

  test("bradleyTerry: strengths stay positive and normalized; order follows dominance") {
    // C loses everything — the ½ pseudo-win must keep it positive.
    val g = Seq(("A", "B"), ("A", "B"), ("A", "C"), ("B", "C"), ("A", "C"))
      .toDF("winner", "loser")
    val rounds = 5
    val out = Preference.bradleyTerry(spark, g, "winner", "loser", rounds).collect()
    val last = out.filter(_.getLong(0) == rounds.toLong)
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    all(last.values) should be > 0.0
    last.values.sum shouldBe 1.0 +- 1e-6
    last("A") should be > last("B")
    last("B") should be > last("C")
  }

  test("bradleyTerry drops self-matches and rejects an all-self log") {
    val g = Seq(("A", "A"), ("A", "B")).toDF("winner", "loser")
    val out = Preference.bradleyTerry(spark, g, "winner", "loser", 1)
    out.where(col("round") === 1L).count() shouldBe 2L
    val selfOnly = Seq(("A", "A")).toDF("winner", "loser")
    an[IllegalArgumentException] should be thrownBy
      Preference.bradleyTerry(spark, selfOnly, "winner", "loser", 1)
  }

  test("bradleyTerry raises on a player set past maxPlayers before collecting") {
    val g = Seq(("A", "B"), ("B", "C"), ("C", "A")).toDF("winner", "loser")
    val e = the[IllegalArgumentException] thrownBy
      Preference.bradleyTerry(spark, g, "winner", "loser", 1, maxPlayers = 2)
    e.getMessage should include("players² count matrix")
    // at the cap the fit runs
    Preference.bradleyTerry(spark, g, "winner", "loser", 1, maxPlayers = 3)
      .where(col("round") === 1L).count() shouldBe 3L
  }

  test("preferencePairs plan is one hash aggregate — no window, no join") {
    val df = scored((1L, 10L, 0.9), (1L, 11L, 0.2))
    val plan = Preference.preferencePairs(df, "prompt_id", "doc_id", "score", 0.05)
      .queryExecution.executedPlan.toString
    plan should not include "Window"
    plan should not include "Join"
  }
}
