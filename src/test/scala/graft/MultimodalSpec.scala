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


  test("imageDecoder really decodes planted PNG and BMP bytes (dims + channel means)") {
    def png(w: Int, h: Int, rgb: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bo = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bo)
      bo.toByteArray
    }
    // solid red 8x5 PNG and solid mid-gray 3x3 BMP, plus junk bytes
    val rows = Seq(
      MediaRow(1L, "image", png(8, 5, 0xff0000, "png"), MediaMeta(0, 0, 0, 0)),
      MediaRow(2L, "image", png(3, 3, 0x808080, "bmp"), MediaMeta(0, 0, 0, 0)),
      MediaRow(3L, "image", Array[Byte](1, 2, 3), MediaMeta(0, 0, 0, 0)))
    val out = Multimodal.decodeFeatures(
        spark.createDataset(rows)(org.apache.spark.sql.Encoders.product[MediaRow])
          .toDF()
          .select(col("mediaId").as("media_id"), col("kind"), col("data"),
            col("meta")),
        Multimodal.imageDecoder)
      .collect().map(f => f.mediaId -> f).toMap
    val red = out(1L).features
    red(0) shouldBe 8.0; red(1) shouldBe 5.0
    red(3) shouldBe 1.0 +- 0.01 // mean R = 255/255
    red(4) shouldBe 0.0 +- 0.01
    red(5) shouldBe 0.0 +- 0.01
    val gray = out(2L).features
    gray(0) shouldBe 3.0; gray(1) shouldBe 3.0
    gray(3) shouldBe (0x80 / 255.0) +- 0.01
    out(3L).features shouldBe empty // junk bytes: visible, not fatal
    out(3L).nBytes shouldBe 3L
  }


  test("audioDecoder really decodes planted WAV bytes (rate, channels, frames, RMS)") {
    def wav(rate: Float, amplitude: Short, nFrames: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
      val pcm = new Array[Byte](nFrames * 2)
      for (i <- 0 until nFrames) { // constant-amplitude square-ish signal
        pcm(2 * i) = (amplitude & 0xff).toByte
        pcm(2 * i + 1) = ((amplitude >> 8) & 0xff).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val bo = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bo)
      bo.toByteArray
    }
    val half = (32768 / 2).toShort // amplitude 0.5
    val rows = Seq(
      MediaRow(1L, "audio", wav(8000f, half, 1000), MediaMeta(0, 0, 0, 0)),
      MediaRow(2L, "audio", Array[Byte](9, 9, 9), MediaMeta(0, 0, 0, 0)))
    val out = rows.map(Multimodal.audioDecoder).map(f => f.mediaId -> f).toMap
    val a = out(1L).features
    a(0) shouldBe 8000.0
    a(1) shouldBe 1.0
    a(2) shouldBe 1000.0
    a(3) shouldBe 0.5 +- 0.001 // RMS of a constant 0.5-amplitude signal
    out(2L).features shouldBe empty
  }

  test("stubDecoder is pure and deterministic on raw bytes") {
    val row = MediaRow(7L, "image", "payload".getBytes("UTF-8"), MediaMeta(64, 48, 22050, 1000))
    val a = Multimodal.stubDecoder(row)
    val b = Multimodal.stubDecoder(row)
    a.features.toSeq shouldBe b.features.toSeq
    a.nBytes shouldBe 7L
  }

  test("imageDHash: re-encode/brightness land near, different images far, junk None") {
    def png(f: (Int, Int) => Int, fmt: String = "png"): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 48,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 64) img.setRGB(x, y, f(x, y))
      val bo = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bo)
      bo.toByteArray
    }
    def gray(v: Int) = (v << 16) | (v << 8) | v
    // a horizontal gradient (structured content, not solid)
    val base = (x: Int, y: Int) => gray((x * 4 + y) % 256)
    val h0 = Multimodal.imageDHash(png(base)).get
    def dist(h: Long) = java.lang.Long.bitCount(h0 ^ h)
    // identical content, different container → identical hash
    dist(Multimodal.imageDHash(png(base, "bmp")).get) shouldBe 0
    // +10 brightness preserves almost every adjacent-pixel ordering
    val bright = (x: Int, y: Int) => gray(math.min((x * 4 + y) % 256 + 10, 255))
    dist(Multimodal.imageDHash(png(bright)).get) should be <= 6
    // the REVERSED gradient flips almost every adjacent-pixel ordering
    val rev = (x: Int, y: Int) => gray(((63 - x) * 4 + y) % 256)
    dist(Multimodal.imageDHash(png(rev)).get) should be > 15
    Multimodal.imageDHash(Array[Byte](9, 9, 9)) shouldBe None
  }

  test("dHashPairs: exact payload dups pair at dist 0 through the banded tier") {
    import spark.implicits._
    val payload = "the same bytes".getBytes("UTF-8")
    val other = "completely different content here".getBytes("UTF-8")
    val media = Seq((1L, payload), (2L, payload), (3L, other))
      .toDF("media_id", "data")
    val got = Multimodal.dHashPairs(media, maxDist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got should contain((1L, 2L, 0L))
    // stub hashes of unrelated payloads are ~random 60-bit words: a
    // dist ≤ 4 collision with doc 3 would be astronomically unlikely
    got.map(p => (p._1, p._2)) should not contain ((1L, 3L))
  }

  test("envHashPairs: exact payload dups pair at dist 0 through the banded tier") {
    import spark.implicits._
    val payload = "the same audio bytes".getBytes("UTF-8")
    val other = "completely different signal content".getBytes("UTF-8")
    val media = Seq((1L, payload), (2L, payload), (3L, other))
      .toDF("media_id", "data")
    val got = Multimodal.envHashPairs(media, maxDist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got should contain((1L, 2L, 0L))
    got.map(p => (p._1, p._2)) should not contain ((1L, 3L))
  }

  test("videoHashPairs: exact payload dups pair at dist 0 through the banded tier") {
    import spark.implicits._
    val payload = "the same video bytes".getBytes("UTF-8")
    val other = "completely different clip content".getBytes("UTF-8")
    val media = Seq((1L, payload, 5L), (2L, payload, 5L), (3L, other, 7L))
      .toDF("media_id", "data", "n_frames")
    val got = Multimodal.videoHashPairs(media, maxDist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got should contain((1L, 2L, 0L))
    got.map(p => (p._1, p._2)) should not contain ((1L, 3L))
  }

  test("videoHashFromFrames: majority pooling outvotes edited frames; reversed far; junk None") {
    def png(f: (Int, Int) => Int, fmt: String = "png"): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 48,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 64) img.setRGB(x, y, f(x, y))
      val bo = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bo)
      bo.toByteArray
    }
    def gray(v: Int) = (v << 16) | (v << 8) | v
    val base = (x: Int, y: Int) => gray((x * 4 + y) % 256)
    val rev = (x: Int, y: Int) => gray(((63 - x) * 4 + y) % 256)
    val frames = Seq.fill(5)(png(base))
    val h0 = Multimodal.videoHashFromFrames(frames).get
    def dist(h: Long) = java.lang.Long.bitCount(h0 ^ h)
    // container re-encode of every frame → identical hash
    dist(Multimodal.videoHashFromFrames(Seq.fill(5)(png(base, "bmp"))).get) shouldBe 0
    // a MINORITY of frames replaced by a very different image is OUTVOTED
    // (3 of 5 base frames still carry every bit) — dist exactly 0
    dist(Multimodal.videoHashFromFrames(
      frames.take(3) ++ Seq(png(rev), png(rev))).get) shouldBe 0
    // every frame reversed → far
    dist(Multimodal.videoHashFromFrames(Seq.fill(5)(png(rev))).get) should be > 15
    // undecodable frames are skipped, not fatal; all-junk → None
    Multimodal.videoHashFromFrames(Seq(Array[Byte](1, 2), frames.head)).get shouldBe h0
    Multimodal.videoHashFromFrames(Seq(Array[Byte](1, 2))) shouldBe None
  }

  test("audioEnvHash: re-encode/gain/resample land near, reversed far, junk None") {
    // per-window amplitude = the (w·37 mod 61) permutation scaled to
    // (0,1] — every adjacent ordering strict and varied
    def amp(w: Int) = (((w * 37) % 61) + 1) / 62.0
    def wavOf(samples: Array[Short]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val pcm = new Array[Byte](samples.length * 2)
      for (i <- samples.indices) {
        pcm(2 * i) = (samples(i) & 0xff).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val bo = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bo)
      bo.toByteArray
    }
    // 61 windows × 100 samples; square wave so window RMS == amplitude
    def signal(gain: Double, step: Int): Array[Short] =
      (for (w <- 0 until 61; i <- 0 until 100 / step) yield {
        val v = (amp(w) * gain * 30000).toInt
        (if (i % 2 == 0) v else -v).toShort
      }).toArray
    val h0 = Multimodal.audioEnvHash(wavOf(signal(1.0, 1))).get
    def dist(h: Long) = java.lang.Long.bitCount(h0 ^ h)
    // constant gain preserves EVERY energy ordering → identical hash
    dist(Multimodal.audioEnvHash(wavOf(signal(0.5, 1))).get) shouldBe 0
    // 2:1 decimation (the naive resample) preserves the envelope shape
    dist(Multimodal.audioEnvHash(wavOf(signal(1.0, 2))).get) should be <= 4
    // the REVERSED signal flips the envelope — orderings scatter
    dist(Multimodal.audioEnvHash(wavOf(signal(1.0, 1).reverse)).get) should be > 10
    // junk, too-short, and non-16-bit payloads are None, never fatal
    Multimodal.audioEnvHash(Array[Byte](9, 9, 9)) shouldBe None
    Multimodal.audioEnvHash(wavOf(Array.fill(30)(100.toShort))) shouldBe None
    // a stereo re-encode (same signal duplicated L/R) downmixes to the
    // SAME mono envelope → identical hash, not an interleaving artifact
    def stereoWav(samples: Array[Short]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
      val pcm = new Array[Byte](samples.length * 4)
      for (i <- samples.indices; c <- 0 to 1) {
        val k = 4 * i + 2 * c
        pcm(k) = (samples(i) & 0xff).toByte
        pcm(k + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val bo = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bo)
      bo.toByteArray
    }
    dist(Multimodal.audioEnvHash(stereoWav(signal(1.0, 1))).get) shouldBe 0
  }
}
