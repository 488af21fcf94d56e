package graft

import graft.operators.{Multimodal, MediaRow, MediaMeta, MediaFeatures}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "hello world", 11L),
    (2L, "a", 1L),
    (3L, "frame sample video doc", 22L))
    .toDF("doc_id", "text", "n_chars")

  test("synthesize produces binary payloads with typed metadata") {
    val m = Multimodal.synthesize(docs)
    m.schema("data").dataType.typeName shouldBe "binary"
    val r = m.where(col("media_id") === 1L).collect()(0)
    new String(r.getAs[Array[Byte]]("data"), "UTF-8") shouldBe "hello world"
    r.getAs[String]("kind") shouldBe "audio" // 1 % 3 + 1 = 2
  }

  test("describe reads payload size without decoding") {
    val d = Multimodal.describe(Multimodal.synthesize(docs)).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_bytes")).toMap
    d(1L) shouldBe 11L
    d(2L) shouldBe 1L
  }

  test("mapPartitions decoder equals the Column-expression fake, row for row") {
    val m = Multimodal.synthesize(docs)
    val viaDs = Multimodal.decodeFeatures(m).collect()
      .map(f => f.mediaId -> f.features.toSeq).toMap
    val viaExpr = m.select(col("media_id"),
        Multimodal.fakeFeatureExpr(col("data")).as("fs")).collect()
      .map(r => r.getLong(0) -> r.getAs[collection.Seq[Double]]("fs").toSeq).toMap
    viaDs shouldBe viaExpr
    viaDs.values.flatten.foreach(f => assert(f >= 0.0 && f < 1.0))
  }

  test("sampleFrames explodes only videos at the step implied by fps") {
    // only doc 2 is 'video' (2 % 3 + 1 = 3); n_chars=1 → duration 1001 ms;
    // fps=2 → frames 0,1,2 at 0/500/1000 ms
    val fr = Multimodal.sampleFrames(Multimodal.synthesize(docs), 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    fr.toSeq.sorted shouldBe Seq((2L, 0L, 0L), (2L, 1L, 500L), (2L, 2L, 1000L))
  }

  test("sampleFrames rational timestamps: fps=3 does not drift, fps=24 lands exactly, fps>1000 is defined") {
    def media(durationMs: Long) =
      Seq((1L, "video", durationMs)).toDF("media_id", "kind", "durationMs")
        .withColumn("meta", struct(col("durationMs").as("durationMs")))
    // fps=3 over 1 s: frames at 0,333,666,1000 — an integer 333 ms step
    // would drift to 999 and emit a phantom frame index
    Multimodal.sampleFrames(media(1000L), 3).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq.sorted shouldBe
      Seq((0L, 0L), (1L, 333L), (2L, 666L), (3L, 1000L))
    // fps=24 over 1 s: 25 frames, last exactly at 1000 ms
    val f24 = Multimodal.sampleFrames(media(1000L), 24).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq.sorted
    f24.size shouldBe 25
    f24.last shouldBe (24L, 1000L)
    // fps>1000: the old 1000/fps step floored to zero — now well-defined
    Multimodal.sampleFrames(media(10L), 1001).count() shouldBe 11L
    an[IllegalArgumentException] should be thrownBy
      Multimodal.sampleFrames(media(10L), 0)
  }

  test("resizeMeta preserves aspect ratio and never upscales") {
    val m = Multimodal.synthesize(docs)
    val r = Multimodal.resizeMeta(m, 256, 256)
      .select(col("media_id"), col("meta.width"), col("meta.height"),
        col("resized.width"), col("resized.height")).collect()
    for (row <- r) {
      val (w, h, rw, rh) = (row.getInt(1), row.getInt(2), row.getInt(3), row.getInt(4))
      assert(rw <= 256 && rh <= 256)
      assert(rw <= w && rh <= h)
    }
  }

  test("stubDecoder is pure and deterministic on raw bytes") {
    val row = MediaRow(7L, "image", "payload".getBytes("UTF-8"), MediaMeta(64, 48, 22050, 1000))
    val a = Multimodal.stubDecoder(row)
    val b = Multimodal.stubDecoder(row)
    a.features.toSeq shouldBe b.features.toSeq
    a.nBytes shouldBe 7L
  }
}
