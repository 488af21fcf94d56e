package graft

import org.apache.spark.sql.functions._
import graft.operators.Frontier

class FrontierSpec extends SparkSpec {
  import spark.implicits._

  private def frontier = Seq(
    ("u1", "a.com", 10L), ("u2", "a.com", 30L), ("u3", "a.com", 30L),
    ("u4", "a.com", 5L), ("u5", "b.com", 1L))
    .toDF("url", "host", "priority")

  test("slots follow priority desc with url tie-break; fetch times step by delay") {
    val got = Frontier.schedule(frontier, delayMs = 250L)
      .select("url", "slot", "fetch_at_ms").as[(String, Long, Long)]
      .collect().sortBy(_._1)
    got.toSeq shouldBe Seq(
      ("u1", 2L, 500L), // 10 after the tied 30s
      ("u2", 0L, 0L),   // 30, url tie-break u2 < u3
      ("u3", 1L, 250L),
      ("u4", 3L, 750L),
      ("u5", 0L, 0L))   // b.com schedules independently
  }

  test("maxPerHost caps each host's queue depth") {
    val kept = Frontier.schedule(frontier, 100L, maxPerHost = Some(2L))
      .select("url").as[String].collect().toSet
    kept shouldBe Set("u2", "u3", "u5") // a.com keeps its top 2; b.com its 1
  }

  test("rescheduling the same frontier reproduces the identical assignment") {
    val a = Frontier.schedule(frontier.orderBy(rand(1)), 100L).collect().toSet
    val b = Frontier.schedule(frontier.orderBy(rand(2)), 100L).collect().toSet
    a shouldBe b
  }
}
