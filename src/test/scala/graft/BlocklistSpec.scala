package graft

import org.apache.spark.sql.functions._
import graft.operators.Blocklist

class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  private val words = Seq("bad", "worse")

  private def docsDf = Seq(
    (1L, "a Bad day but fine"),          // 1 hit (case-folded)
    (2L, "bad bad worse ok"),            // 3 hits, 2 distinct
    (3L, "badge embedded badness"),      // substring must NOT match
    (4L, ""),                            // empty text
    (5L, "clean text entirely")).toDF("doc_id", "text")

  test("flags: token-exact hits, case-folded, substring-safe") {
    val out = Blocklist.flags(docsDf, "text", Seq("doc_id"), words)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    out.toSeq shouldBe Seq(
      (1L, 5L, 1L, 1L, true),
      (2L, 4L, 3L, 2L, true),
      (3L, 3L, 0L, 0L, false),
      (4L, 0L, 0L, 0L, false),
      (5L, 3L, 0L, 0L, false))
  }

  test("flags plan is map-only — no exchange") {
    val plan = Blocklist.flags(docsDf, "text", Seq("doc_id"), words)
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  test("equality law: hitsJoin agrees with flags on the flagged subset") {
    val bl = words.toDF("word")
    val viaJoin = Blocklist.hitsJoin(docsDf, "text", "doc_id", bl)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val viaFlags = Blocklist.flags(docsDf, "text", Seq("doc_id"), words)
      .where(col("flagged"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    viaJoin.toSeq shouldBe viaFlags.toSeq
  }

  test("hitsJoin broadcasts the list side") {
    val bl = words.toDF("word")
    val plan = Blocklist.hitsJoin(docsDf, "text", "doc_id", bl)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("empty word list is rejected") {
    an[IllegalArgumentException] should be thrownBy
      Blocklist.flags(docsDf, "text", Seq("doc_id"), Nil)
  }
}
