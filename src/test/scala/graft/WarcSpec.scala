package graft

import org.apache.spark.sql.functions._
import graft.sources.Warc
import java.nio.charset.StandardCharsets.UTF_8

/** WARC-lite source/sink witnesses: byte-exact round-trip, Content-Length
  * (not magic-scanning) framing, damage resync, and gzip. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def record(url: String, ts: String, payload: String): String =
    "WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      s"WARC-Date: $ts\r\n" +
      s"Content-Length: ${payload.getBytes(UTF_8).length}\r\n" +
      "\r\n" + payload + "\r\n\r\n"

  test("save → read round-trips payload bytes exactly, including CRLFs and embedded magic") {
    val docs = Seq(
      ("http://ex.com/1", "2026-01-01T00:00:00Z", "plain body"),
      // a crawled page that EMBEDS a WARC example: framing must be driven
      // by Content-Length, or the parser splits mid-payload here
      ("http://ex.com/2", "2026-01-02T00:00:00Z",
        "tricky\r\n\r\nWARC/1.0\r\nContent-Length: 3\r\n\r\nxyz\r\n\r\n tail"),
      ("http://ex.com/3", "2026-01-03T00:00:00Z", ""), // empty payload
      ("http://ex.com/4", "2026-01-04T00:00:00Z", "unicode é中 body"))
      .toDF("url", "ts", "payload")
    val dir = graft.core.Scratch.dir("warc_rt")
    Warc.save(docs.repartition(2), dir)
    val got = Warc.read(spark, dir)
      .select(col("url"), col("ts"), col("warc_type"), col("content_length"),
        col("payload").cast("string").as("body"))
      .as[(String, String, String, Long, String)].collect().sortBy(_._1)
    got.map(_._1).toSeq shouldBe docs.select("url").as[String].collect().sorted.toSeq
    val expected = Seq(
      ("http://ex.com/1", "plain body"),
      ("http://ex.com/2",
        "tricky\r\n\r\nWARC/1.0\r\nContent-Length: 3\r\n\r\nxyz\r\n\r\n tail"),
      ("http://ex.com/3", ""),
      ("http://ex.com/4", "unicode é中 body"))
    got.map(r => (r._1, r._5)).toSeq shouldBe expected
    got.foreach { r =>
      r._3 shouldBe "response"
      r._4 shouldBe r._5.getBytes(UTF_8).length.toLong
    }
  }

  test("malformed records are skipped with resync, not fatal") {
    val good1 = record("http://a/", "t1", "first ok")
    val noLen = "WARC/1.0\r\nWARC-Target-URI: http://broken/\r\n\r\npayload??\r\n\r\n"
    val badLen = "WARC/1.0\r\nWARC-Target-URI: http://broken2/\r\nContent-Length: zz\r\n\r\nx\r\n\r\n"
    val good2 = record("http://b/", "t2", "second ok")
    val truncated = "WARC/1.0\r\nWARC-Target-URI: http://c/\r\nContent-Length: 9999\r\n\r\nshort"
    val bytes = (good1 + noLen + badLen + good2 + truncated).getBytes(UTF_8)
    val got = Warc.parseAll(bytes).toSeq
    got.map(_.url) shouldBe Seq("http://a/", "http://b/")
    got.map(p => new String(p.payload, UTF_8)) shouldBe Seq("first ok", "second ok")
  }

  test("junk prefix and inter-record garbage are tolerated") {
    val bytes = ("garbage garbage " + record("http://a/", "t", "one") +
      "NOISE between records " + record("http://b/", "t", "two")).getBytes(UTF_8)
    Warc.parseAll(bytes).map(_.url).toSeq shouldBe Seq("http://a/", "http://b/")
  }

  test("gzip files decompress (whole-file and concatenated members)") {
    def gzip(s: String): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(s.getBytes(UTF_8)); g.close(); bo.toByteArray
    }
    val r1 = record("http://a/", "t", "alpha")
    val r2 = record("http://b/", "t", "beta")
    // whole-file gzip
    new String(Warc.gunzipAll(gzip(r1 + r2)), UTF_8) shouldBe r1 + r2
    // per-record members concatenated (the CommonCrawl layout)
    val members = gzip(r1) ++ gzip(r2)
    Warc.parseAll(Warc.gunzipAll(members)).map(_.url).toSeq shouldBe
      Seq("http://a/", "http://b/")
    // end-to-end through read(): write a .gz file into a dir and scan it
    val dir = graft.core.Scratch.dir("warc_gz")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "crawl-0.warc.gz"), members)
    Warc.read(spark, dir).select(col("url")).as[String].collect().sorted.toSeq shouldBe
      Seq("http://a/", "http://b/")
  }

  test("readStream ingests dropped warc files incrementally, batch-identical parse") {
    val dir = graft.core.Scratch.dir("warc_stream")
    def drop(name: String, recs: String*): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
        recs.mkString.getBytes(UTF_8))
    drop("crawl-0.warc", record("http://a/", "t1", "alpha"))
    val q = Warc.readStream(spark, dir)
      .select(col("url"), col("payload").cast("string").as("body"))
      .writeStream.format("memory").queryName("warc_stream_t")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.table("warc_stream_t").select("url").as[String].collect().sorted.toSeq shouldBe
        Seq("http://a/")
      // a later fetch batch lands as a NEW file — only its records append
      drop("crawl-1.warc",
        record("http://b/", "t2", "beta"), record("http://c/", "t3", "gamma"))
      q.processAllAvailable()
      val all = spark.table("warc_stream_t")
        .select("url", "body").as[(String, String)].collect().sortBy(_._1)
      all.map(_._1).toSeq shouldBe Seq("http://a/", "http://b/", "http://c/")
      all.map(_._2).toSeq shouldBe Seq("alpha", "beta", "gamma")
    } finally q.stop()
  }

  test("empty directory and empty file yield zero records") {
    val dir = graft.core.Scratch.dir("warc_empty")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "empty.warc"),
      Array.emptyByteArray)
    Warc.read(spark, dir).count() shouldBe 0L
  }
}
