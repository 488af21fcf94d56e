package graft

import graft.api.SimilarityModel
import graft.core.Crosstab
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end EP-1 → EP-2 → EP-3: train on an occurrence log, persist the
  * store, serve lookups from the persisted parquet (SURVEY §5.2.1). */
class StoreRoundTripSpec extends SparkSpec {
  import spark.implicits._

  test("fit → storeIn → retrieve round-trip preserves thresholded neighbors") {
    val dir = Files.createTempDirectory("graft-store").toString
    val occ = Tables10.occ.toDF("item_id", "reference_id")
    val dict = (1L to 6L).map(i => (i, s"item-$i")).toDF("id", "key")

    val model = SimilarityModel.fit(occ)
    model.storeIn(dir, dict, k = 1.0)

    val store = SimilarityModel.Store(spark, dir)

    // the persisted pair table equals the in-memory store pipeline
    val expected = graft.core.Neighbors
      .scaledStdDevThreshold(model.fullPairs(lit(true)), 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val persisted = graft.store.SimilarityStore.readSimilarItems(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    persisted shouldBe expected
    persisted should not be empty

    // EP-3 serving over the persisted store
    val someItem = persisted.head._1
    val served = store.retrieve(someItem, Some(10)).collect()
    served.foreach(_.getAs[String]("key") should startWith("item-"))
    served.map(_.getAs[Double]("scaled_score")).toSeq shouldBe
      served.map(_.getAs[Double]("scaled_score")).sortBy(-_).toSeq

    store.itemInfo(Seq(1L, 2L)).count() shouldBe 2L
    store.search("item-3").collect().map(_.getLong(0)).toSeq shouldBe Seq(3L)
    val st = store.stats.collect()(0)
    st.getAs[Long]("correlated_items") shouldBe 6L
    st.getAs[Long]("similar_items") shouldBe expected.size.toLong
  }

  test("JDBC store face: DDL + unique indexes + bulk append round-trip on embedded Derby") {
    import graft.store.JdbcStore
    val dir = java.nio.file.Files.createTempDirectory("graft_jdbc").toString
    val url = s"jdbc:derby:$dir/db;create=true"
    val dict = Seq((1L, "apple"), (2L, "banana"), (3L, "cherry")).toDF("id", "key")
    val pairs = Seq((1L, 2L, 0.9), (1L, 3L, 0.4), (2L, 3L, 0.7))
      .toDF("item_a_id", "item_b_id", "scaled_score")
    JdbcStore.storeIn(dict, pairs, url)
    // read-back equals what was written; human_label rides along NULL
    val items = JdbcStore.readCorrelatedItems(spark, url).orderBy("id").collect()
    items.map(r => (r.getLong(0), r.getString(1))).toSeq shouldBe
      Seq((1L, "apple"), (2L, "banana"), (3L, "cherry"))
    items.foreach(r => assert(r.isNullAt(2)))
    JdbcStore.readSimilarItems(spark, url).orderBy("item_a_id", "item_b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq shouldBe
      Seq((1L, 2L, 0.9), (1L, 3L, 0.4), (2L, 3L, 0.7))
    // the unique index keeps the reference's contract: a duplicate pair
    // append fails loudly instead of double-serving
    intercept[Exception] {
      pairs.limit(1).write.mode("append")
        .jdbc(url, JdbcStore.SimilarItems, new java.util.Properties)
    }
    // re-store is a full refresh (drop + recreate), not an accumulation
    JdbcStore.storeIn(dict, pairs, url)
    JdbcStore.readSimilarItems(spark, url).count() shouldBe 3L
  }

  test("Crosstab.build is stream-capable: the same transform runs under readStream") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, Long)]
    val ct = Crosstab.build(mem.toDF().toDF("item_id", "reference_id"))
    val sq = ct.writeStream.format("memory").queryName("ct_stream")
      .outputMode("complete").start()
    try {
      mem.addData(Tables10.occ: _*)
      sq.processAllAvailable()
      val streamed = spark.table("ct_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = Crosstab.build(Tables10.occ.toDF("item_id", "reference_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      streamed shouldBe batch
    } finally sq.stop()
  }
}

/** Small shared occurrence fixture: 6 items over 8 contexts with overlap. */
object Tables10 {
  val occ: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(11)
    Seq.fill(120)((1L + rnd.nextInt(6).toLong, 1L + rnd.nextInt(8).toLong))
  }
}
