package graft

import org.apache.spark.sql.functions._
import graft.operators.LangId
import graft.functions.TextFunctions

/** Trained language-ID witnesses: recovery on separable synthetic
  * corpora, the und path, and the accuracy gate vs the marker-word
  * heuristic on the real fixture. */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  test("recovers languages with disjoint character statistics") {
    val docs = (1L to 40L).map { i =>
      if (i % 2 == 0) (i, "aa", "kala pala mala sala tala " * 3)
      else (i, "bb", "zorro borro corro dorro " * 3)
    }.toDF("doc_id", "lang", "text")
    val model = LangId.train(docs, 3, 128)
    val langs = LangId.langTable(docs, 3, 128)
    val pred = LangId.classify(docs, model, langs, 3, 128)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    pred.where(col("predicted") =!= col("lang")).count() shouldBe 0L
  }

  test("documents shorter than n predict und") {
    val train = Seq((1L, "aa", "kala pala mala")).toDF("doc_id", "lang", "text")
    val tiny = Seq((9L, "aa", "ab")).toDF("doc_id", "lang", "text")
    val pred = LangId.classify(tiny,
      LangId.train(train, 3, 64), LangId.langTable(train, 3, 64), 3, 64)
    pred.select("predicted").as[String].head() shouldBe "und"
  }

  test("ties break alphabetically (deterministic argmax)") {
    // two languages trained on IDENTICAL text → identical scores
    val train = Seq((1L, "bb", "same text here"), (2L, "aa", "same text here"))
      .toDF("doc_id", "lang", "text")
    val pred = LangId.classify(
      Seq((9L, "same text here")).toDF("doc_id", "text"),
      LangId.train(train, 3, 64), LangId.langTable(train, 3, 64), 3, 64)
    pred.select("predicted").as[String].head() shouldBe "aa"
  }

  test("langIdBulk equals the Column-face heuristic row for row") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((90001L, ""), (90002L, "zz qq xx")) // und paths
        .toDF("doc_id", "text"))
    val bulk = TextFunctions.langIdBulk(d)
      .select(col("doc_id"), col("lang_pred")).as[(Long, String)]
      .collect().toMap
    val colFace = d.select(col("doc_id"),
        TextFunctions.langId(col("text")).as("p")).as[(Long, String)]
      .collect().toMap
    bulk shouldBe colFace
    bulk(90001L) shouldBe "und"
  }

  test("held-out accuracy on the fixture >= the marker-word heuristic's") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fold = pmod(TextFunctions.hash60(col("doc_id").cast("string")), lit(4L))
    val tr = d.where(fold =!= 0L)
    val ev = d.where(fold === 0L)
    val trained = LangId.classify(ev,
        LangId.train(tr, 3, 512), LangId.langTable(tr, 3, 512), 3, 512)
      .join(ev.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val n = ev.count().toDouble
    val accTrained =
      trained.where(col("predicted") === col("lang")).count() / n
    val accHeuristic = ev
      .where(TextFunctions.langId(col("text")) === col("lang")).count() / n
    withClue(s"trained=$accTrained heuristic=$accHeuristic: ") {
      accTrained should be >= accHeuristic
    }
  }
}
