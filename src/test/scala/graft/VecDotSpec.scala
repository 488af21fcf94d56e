package graft

import graft.operators.SimilaritySearch
import org.apache.spark.sql.functions._

class VecDotSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
    (2L, Seq(0.5f, -0.5f), Seq(2.0f, 2.0f))).toDF("id", "a", "b")

  test("vec_dot equals the declarative fold bit-for-bit") {
    val fold = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x)
    val rows = df.select(SimilaritySearch.dot(col("a"), col("b")).as("nat"), fold.as("ref"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"native ${r.getDouble(0)} != fold ${r.getDouble(1)}"))
    rows(0).getDouble(0) shouldBe 32.0
  }

  test("null array propagates to NULL") {
    val withNull = Seq((Some(Seq(1.0f)), Option.empty[Seq[Float]]))
      .toDF("a", "b")
    withNull.select(SimilaritySearch.dot(col("a"), col("b"))).collect()(0).isNullAt(0) shouldBe true
  }

  test("vec_dot is registered in SQL via GraftExtensions") {
    df.createOrReplaceTempView("vecdot_test")
    val r = spark.sql("SELECT vec_dot(a, b) AS d FROM vecdot_test WHERE id = 1").collect()
    r(0).getDouble(0) shouldBe 32.0
  }

  test("length mismatch yields NULL, matching the zip_with fold") {
    val mismatched = Seq((Seq(1.0f, 2.0f), Seq(3.0f))).toDF("a", "b")
    val fold = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x)
    val r = mismatched.select(SimilaritySearch.dot(col("a"), col("b")), fold).collect()(0)
    r.isNullAt(0) shouldBe true
    r.isNullAt(1) shouldBe true // the fold the doc claims identity with
  }

  test("null element yields NULL, matching the zip_with fold") {
    val withNullElem = Seq((Seq(Some(1.0f), None, Some(3.0f)), Seq(Some(4.0f), Some(5.0f), Some(6.0f))))
      .toDF("a", "b")
    withNullElem.select(SimilaritySearch.dot(col("a"), col("b")))
      .collect()(0).isNullAt(0) shouldBe true
  }

  test("type check rejects non-float arrays") {
    val bad = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    an[Exception] should be thrownBy
      bad.select(SimilaritySearch.dot(col("a"), col("b"))).collect()
  }
}
