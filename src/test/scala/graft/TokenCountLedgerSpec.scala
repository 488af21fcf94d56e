package graft

import org.apache.spark.sql.functions._
import graft.store.TokenCountLedger
import graft.operators.Profiling

/** Token-count ledger: split-invariant additive fold, ledger-served
  * Zipf/entropy equal to the one-shot laws over the union, redelivery
  * idempotence, compaction invariance. */
class TokenCountLedgerSpec extends SparkSpec {
  import spark.implicits._

  /** A small corpus with real structure: repeated function words (a
    * Zipf head), varied content words, multi-token docs (bigrams). */
  private def corpus = (1L to 60L).map { i =>
    val common = Seq("the", "of", "and").take(1 + (i % 3).toInt)
    val rare = Seq(s"w${i % 17}", s"x${i % 7}", s"y${i % 5}")
    (i, (common ++ rare ++ common).mkString(" "))
  }.toDF("doc_id", "text")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  private def countMap(store: String) =
    TokenCountLedger.counts(spark, store).collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2))) ->
        r.getLong(3)).toMap

  test("split appends serve the one-shot Zipf and entropy; redelivery and compaction no-ops") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tok1").toString
    val store = s"$dir/store"
    val all = corpus
    TokenCountLedger.write(all.where(col("doc_id") % 3 === 1), store)
    val d2 = all.where(col("doc_id") % 3 === 2)
    TokenCountLedger.append(d2, store, batchName = Some("d2"))
    TokenCountLedger.append(all.where(col("doc_id") % 3 === 0), store)
    val zipfWant = rows(Profiling.zipfFit(all, topK = 10))
    val entWant = rows(Profiling.entropyReport(all))
    rows(TokenCountLedger.zipf(spark, store, 10)) shouldBe zipfWant
    rows(TokenCountLedger.entropy(spark, store)) shouldBe entWant
    val before = countMap(store)
    TokenCountLedger.append(d2, store, batchName = Some("d2")) // crash retry
    countMap(store) shouldBe before
    TokenCountLedger.compact(spark, store)
    countMap(store) shouldBe before
    rows(TokenCountLedger.zipf(spark, store, 10)) shouldBe zipfWant
    // post-compaction appends keep folding
    val extra = (61L to 80L).map(i => (i, s"the z${i % 9} of")).toDF("doc_id", "text")
    TokenCountLedger.append(extra, store)
    rows(TokenCountLedger.entropy(spark, store)) shouldBe
      rows(Profiling.entropyReport(all.unionByName(extra)))
  }

  test("the fold is split-invariant: any batch partition yields the same counts") {
    val all = corpus
    def build(splitMod: Long): Map[(String, String, Option[String]), Long] = {
      val dir = java.nio.file.Files.createTempDirectory("graft_tok2").toString
      val store = s"$dir/store"
      TokenCountLedger.write(all.where(col("doc_id") % splitMod === 0), store)
      (1L until splitMod).foreach { k =>
        TokenCountLedger.append(all.where(col("doc_id") % splitMod === k),
          store, batchName = Some(s"k$k"))
      }
      countMap(store)
    }
    val one = build(2)
    build(5) shouldBe one
    // and the counts are the direct aggregates of the union corpus
    import graft.functions.TextFunctions.tokensWs
    val uni = all.select(explode(tokensWs(col("text"))).as("w"))
      .groupBy("w").count().collect()
      .map(r => ("uni", r.getString(0), None: Option[String]) -> r.getLong(1))
    uni.toMap.foreach { case (k, v) => one(k) shouldBe v }
  }

  test("reserved and malformed batch names are rejected") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tok3").toString
    val store = s"$dir/store"
    TokenCountLedger.write(corpus, store)
    an[IllegalArgumentException] should be thrownBy
      TokenCountLedger.append(corpus, store, batchName = Some("base"))
    an[IllegalArgumentException] should be thrownBy
      TokenCountLedger.append(corpus, store, batchName = Some("bad/name"))
  }
}
