package graft

import graft.core.Crosstab
import org.apache.spark.sql.functions._

class CrosstabSpec extends SparkSpec {
  import spark.implicits._

  test("build sums duplicate (item, ctx) cells into counts (SURVEY §7.4.5)") {
    val occ = Seq((1L, 10L), (1L, 10L), (1L, 11L), (2L, 10L))
      .toDF("item_id", "reference_id")
    val ct = Crosstab.build(occ).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    ct shouldBe Map((1L, 10L) -> 2L, (1L, 11L) -> 1L, (2L, 10L) -> 1L)
  }

  test("build accepts custom column names and casts to long") {
    val occ = Seq((7, "3"), (7, "3")).toDF("pk", "ok")
    val ct = Crosstab.build(occ, "pk", "ok").collect()
    ct.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq shouldBe Seq((7L, 3L, 2L))
  }

  test("vstack unions two crosstabs and re-aggregates shared cells (OP-27)") {
    val a = Crosstab.build(Seq((1L, 10L)).toDF("item_id", "reference_id"))
    val b = Crosstab.build(Seq((1L, 10L), (5L, 11L)).toDF("item_id", "reference_id"))
    val v = Crosstab.vstack(a, b).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    v shouldBe Map((1L, 10L) -> 2L, (5L, 11L) -> 1L)
  }

  test("gap item ids are kept as opaque keys — no dense 1-based assumption (SURVEY §7.4.6)") {
    val occ = Seq((100L, 1L), (500L, 1L)).toDF("item_id", "reference_id")
    Crosstab.build(occ).select("item").as[Long].collect().sorted shouldBe Array(100L, 500L)
  }
}
