package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.{HostCuration, Repetition, Sampling}
import graft.streaming.EventStreams

/** Hand-computed witnesses for the round-3 pipeline extras: repetition
  * quality filters, PII redaction, the as-of join, and quota sampling. */
class PipelineExtrasSpec extends SparkSpec {
  import spark.implicits._

  private def repRow(text: String): (Double, Double, Double) = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r = Repetition.repetitionStats(df).collect()(0)
    (r.getAs[Double]("dup_token_frac"),
      r.getAs[Double]("top2_char_frac"),
      r.getAs[Double]("dup5_char_frac"))
  }

  test("repetitionStats matches hand computation") {
    // "a b a b a": 5 tokens, 2 distinct -> dup 0.6; 2-grams "a b"x2,
    // "b a"x2 -> argmax ties to "a b" (len 3): 2*3/9 chars; one 5-gram -> 0
    val (d1, t1, f1) = repRow("a b a b a")
    d1 shouldBe 0.6 +- 1e-9
    t1 shouldBe (6.0 / 9.0) +- 1e-9
    f1 shouldBe 0.0
    // "w w w w w w": top 2-gram covers 5*3/11 > 1 -> capped; 5-gram
    // "w w w w w" occurs twice -> 2*9/11 > 1 -> capped
    val (d2, t2, f2) = repRow("w w w w w w")
    d2 shouldBe (5.0 / 6.0) +- 1e-9
    t2 shouldBe 1.0
    f2 shouldBe 1.0
    // all-distinct short doc: zero dup signals, top 2-gram covers all chars
    val (d3, t3, f3) = repRow("x y")
    d3 shouldBe 0.0
    t3 shouldBe 1.0
    f3 shouldBe 0.0
    // empty text: all zeros (no NaN, no divide-by-zero)
    val (d4, t4, f4) = repRow("")
    (d4, t4, f4) shouldBe ((0.0, 0.0, 0.0))
  }

  test("PII counts and ordered redaction") {
    val t = "write user.1@ex-a.com or +1 (555) 010-1234, server 10.0.3.77 ok"
    val df = Seq(t).toDF("t").select(
      emailCount(col("t")).as("e"), phoneCount(col("t")).as("p"),
      ipv4Count(col("t")).as("i"), redactPii(col("t")).as("r"))
    val r = df.collect()(0)
    r.getAs[Long]("e") shouldBe 1L
    r.getAs[Long]("p") shouldBe 1L
    r.getAs[Long]("i") shouldBe 1L
    r.getAs[String]("r") shouldBe "write <EMAIL> or <PHONE>, server <IP> ok"
    // clean text passes through untouched, zero counts
    val clean = "no contact information in this sentence at all"
    val c = Seq(clean).toDF("t").select(
      emailCount(col("t")).as("e"), phoneCount(col("t")).as("p"),
      ipv4Count(col("t")).as("i"), redactPii(col("t")).as("r")).collect()(0)
    (c.getAs[Long]("e"), c.getAs[Long]("p"), c.getAs[Long]("i")) shouldBe ((0L, 0L, 0L))
    c.getAs[String]("r") shouldBe clean
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOfJoin: at-or-before semantics, max-id ties, null when unmatched") {
    val views = Seq(
      (10L, ts("2024-01-01 01:00:00"), 1L, "view", 5.0),
      (11L, ts("2024-01-01 01:00:00"), 1L, "view", 6.0), // same ts: id 11 wins
      (12L, ts("2024-01-01 03:00:00"), 1L, "view", 7.0),
      (13L, ts("2024-01-01 09:00:00"), 2L, "view", 8.0))
    val clicks = Seq(
      (100L, ts("2024-01-01 00:30:00"), 1L, "click", 0.0), // before any view
      (101L, ts("2024-01-01 01:00:00"), 1L, "click", 0.0), // equal ts: visible
      (102L, ts("2024-01-01 04:00:00"), 1L, "click", 0.0), // latest view wins
      (103L, ts("2024-01-01 08:00:00"), 2L, "click", 0.0)) // other user's views invisible
    def df(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]) =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventStreams.asOfJoin(df(clicks), df(views))
      .orderBy("left_event_id")
      .select("left_event_id", "asof_event_id", "asof_value")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    out shouldBe Array(
      (100L, None, None),
      (101L, Some(11L), Some(6.0)),
      (102L, Some(12L), Some(7.0)),
      (103L, None, None))
  }

  test("asOfJoinWithin NULLs stale matches as one unit; fresh and boundary matches carry") {
    val views = Seq(
      (10L, ts("2024-01-01 01:00:00"), 1L, "view", 5.0),
      (13L, ts("2024-01-01 09:00:00"), 2L, "view", 8.0))
    val clicks = Seq(
      (101L, ts("2024-01-01 02:00:00"), 1L, "click", 0.0), // exactly 3600 s: fresh
      (102L, ts("2024-01-01 04:00:00"), 1L, "click", 0.0), // 3 h stale → NULLs
      (103L, ts("2024-01-01 09:30:00"), 2L, "click", 0.0)) // 30 min: fresh
    def df(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]) =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventStreams.asOfJoinWithin(df(clicks), df(views), 3600L)
      .orderBy("left_event_id")
      .collect().map(r => (r.getLong(1),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.isNullAt(4), Option(r.get(5)).map(_.asInstanceOf[Double])))
    out shouldBe Array(
      (101L, Some(10L), false, Some(5.0)),
      (102L, None, true, None), // all three as-of columns NULL together
      (103L, Some(13L), false, Some(8.0)))
  }

  test("quotaPerStratum honors caps and nests as caps shrink") {
    val df = (1L to 100L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val big = Sampling.quotaPerStratum(df, "doc_id", "lang", Map("en" -> 10), 7)
    big.where(col("lang") === "en").count() shouldBe 10L
    big.where(col("lang") === "de").count() shouldBe 7L
    // caps above the stratum size keep everything
    Sampling.quotaPerStratum(df, "doc_id", "lang", Map.empty, 1000)
      .count() shouldBe 100L
    // shrinking a cap yields a SUBSET (budget tightening never resamples)
    val small = Sampling.quotaPerStratum(df, "doc_id", "lang", Map("en" -> 4), 3)
    val bigIds = big.select("doc_id").collect().map(_.getLong(0)).toSet
    val smallIds = small.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(smallIds.subsetOf(bigIds))
    // layout-independence: same kept set under a different partitioning
    val repart = Sampling.quotaPerStratum(
      df.repartition(13), "doc_id", "lang", Map("en" -> 10), 7)
    repart.select("doc_id").collect().map(_.getLong(0)).toSet shouldBe bigIds
  }

  test("shardAssignment: dense 0-based positions, uniform-ish shards, layout-stable") {
    val df = (1L to 300L).map(i => Tuple1(i)).toDF("doc_id")
    val sh = Sampling.shardAssignment(df, "doc_id", 8)
    sh.count() shouldBe 300L
    // every shard's positions are exactly 0..n-1
    sh.groupBy("shard").agg(count(lit(1)).as("n"), max(col("pos")).as("mx"),
        min(col("pos")).as("mn"), countDistinct(col("pos")).as("nd"))
      .collect().foreach { r =>
        r.getAs[Long]("mn") shouldBe 0L
        r.getAs[Long]("mx") shouldBe r.getAs[Long]("n") - 1
        r.getAs[Long]("nd") shouldBe r.getAs[Long]("n")
      }
    // deterministic under a different layout
    val again = Sampling.shardAssignment(df.repartition(11), "doc_id", 8)
    again.select("doc_id", "shard", "pos").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet shouldBe
      sh.select("doc_id", "shard", "pos").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("tokenBudgetPerStratum: crossing doc included, budgets nest") {
    val df = (1L to 50L).map(i => (i, "en", 10L)).toDF("doc_id", "lang", "nt")
    // budget 35 with 10-token docs: cum_before 0,10,20,30 kept (4 docs)
    val kept = Sampling.tokenBudgetPerStratum(df, "doc_id", "lang", "nt",
      Map("en" -> 35L), 1L)
    kept.count() shouldBe 4L
    // a tighter budget keeps a SUBSET
    val tight = Sampling.tokenBudgetPerStratum(df, "doc_id", "lang", "nt",
      Map("en" -> 15L), 1L)
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val tightIds = tight.select("doc_id").collect().map(_.getLong(0)).toSet
    tightIds.size shouldBe 2
    assert(tightIds.subsetOf(keptIds))
    // every stratum with data meets its budget even when one doc exceeds it
    Sampling.tokenBudgetPerStratum(df, "doc_id", "lang", "nt", Map.empty, 1L)
      .count() shouldBe 1L
  }

  test("strataRunningSum: two-phase form is row-identical and plans no stratum-wide sort") {
    // uneven strata, varied token counts — every bucket boundary case the
    // top-8-bit range bucketing can hit at this size
    val df = ((1L to 400L).map(i => (i, "en", (i % 7) + 1)) ++
      (401L to 500L).map(i => (i, "fr", (i % 11) + 1)) ++
      Seq((501L, "de", 3L))).toDF("doc_id", "lang", "nt")
    def rows(two: Boolean) =
      Sampling.strataRunningSum(df, "doc_id", "lang", "nt", "cumb", two)
        .select("doc_id", "cumb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows(two = true) shouldBe rows(two = false)

    // budgets computed through the gate are identical too
    val one = Sampling.tokenBudgetPerStratum(df, "doc_id", "lang", "nt",
        Map("en" -> 120L), 40L, largeInput = Some(false))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val two = Sampling.tokenBudgetPerStratum(df, "doc_id", "lang", "nt",
        Map("en" -> 120L), 40L, largeInput = Some(true))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    two shouldBe one

    // plan guard: above the gate, NO corpus-sized sort is partitioned by
    // the stratum alone — the only single-column window runs over the
    // ≤ 256·|strata|-row bucket-sum aggregate (reduced input), and the
    // corpus window is partitioned stratum × bucket
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val saved = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Sampling.strataRunningSum(
        df, "doc_id", "lang", "nt", "cumb", twoPhase = true)
        .queryExecution.executedPlan
      val wins = plan.collect { case w: WindowExec => w }
      assert(wins.exists(_.partitionSpec.size == 2),
        "two-phase must sort partitioned by stratum AND bucket")
      wins.filter(_.partitionSpec.size < 2).foreach { w =>
        assert(w.child.collectFirst { case a: BaseAggregateExec => a }.isDefined,
          s"stratum-only window over unreduced input: ${w.simpleStringWithNodeId()}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }

  test("tierQuotas allocates budget by tierWeight x cellTokens with implied epochs") {
    // en/head 100 tokens, en/tail 100, fr/middle 100:
    // wt = 60, 10, 30 → wtot = 100; budget 1000 → quotas 600/100/300,
    // epochs 6/1/3, shares 0.6/0.1/0.3.
    val tiers = Seq(
      (1L, "en", 40L, "head"), (2L, "en", 60L, "head"),
      (3L, "en", 100L, "tail"), (4L, "fr", 100L, "middle"))
      .toDF("doc_id", "lang", "n_tokens", "tier")
    val got = Sampling.tierQuotas(tiers, 1000L)
      .orderBy("lang", "tier")
      .select("lang", "tier", "n_docs", "n_tokens", "share", "quota_tokens",
        "epochs")
      .as[(String, String, Long, Long, Double, Long, Double)].collect()
    got(0) shouldBe (("en", "head", 2L, 100L, 0.6, 600L, 6.0))
    got(1) shouldBe (("en", "tail", 1L, 100L, 0.1, 100L, 1.0))
    got(2) shouldBe (("fr", "middle", 1L, 100L, 0.3, 300L, 3.0))
    // quotas sum to ≤ budget by construction (floor)
    got.map(_._6).sum should be <= 1000L
  }

  test("tierQuotas rejects unknown or NULL tiers instead of pricing them as tail") {
    val bad = Seq((1L, "en", 10L, "head"), (2L, "en", 10L, "tial"))
      .toDF("doc_id", "lang", "n_tokens", "tier")
    val e = intercept[Exception] {
      Sampling.tierQuotas(bad, 100L).collect()
    }
    e.getMessage should include("unknown tier")
  }

  test("tierQuotas emits NULL epochs for 0-token cells (no NaN)") {
    val tiers = Seq((1L, "en", 100L, "head"), (2L, "en", 0L, "tail"))
      .toDF("doc_id", "lang", "n_tokens", "tier")
    val rows = Sampling.tierQuotas(tiers, 100L).orderBy("tier")
      .select("tier", "epochs").collect()
    rows(0).getString(0) shouldBe "head"
    rows(0).isNullAt(1) shouldBe false
    rows(1).getString(0) shouldBe "tail"
    rows(1).isNullAt(1) shouldBe true
  }

  test("Snapshots.diff classifies added/removed/changed/unchanged") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val cur = Seq((2L, "b"), (3L, "C2"), (4L, "d")).toDF("doc_id", "text")
    graft.operators.Snapshots.diff(base, cur).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))) shouldBe Array(
        (1L, "removed"), (2L, "unchanged"), (3L, "changed"), (4L, "added"))
  }

  test("Snapshots.diff: NULL text is presence, not absence") {
    val base = Seq((1L, null: String), (2L, null: String), (3L, "c"), (5L, null: String))
      .toDF("doc_id", "text")
    val cur = Seq((1L, null: String), (2L, "b2"), (3L, null: String), (4L, null: String))
      .toDF("doc_id", "text")
    graft.operators.Snapshots.diff(base, cur).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))) shouldBe Array(
        (1L, "unchanged"), // NULL → NULL: same (absent) content
        (2L, "changed"),   // NULL → text
        (3L, "changed"),   // text → NULL
        (4L, "added"),     // absent → present-with-NULL
        (5L, "removed"))   // present-with-NULL → absent
  }

  test("Snapshots.diff laws: self-diff is all-unchanged; statuses partition both id sets") {
    val rnd = new scala.util.Random(53)
    val base = (1L to 120L).filter(_ => rnd.nextBoolean())
      .map(i => (i, s"text-$i-${rnd.nextInt(3)}")).toDF("doc_id", "text")
    val cur = (1L to 120L).filter(_ => rnd.nextBoolean())
      .map(i => (i, s"text-$i-${rnd.nextInt(3)}")).toDF("doc_id", "text")
    // self-diff: every id unchanged
    graft.operators.Snapshots.diff(base, base)
      .select("status").distinct().collect().map(_.getString(0)) shouldBe
      Array("unchanged")
    val d = graft.operators.Snapshots.diff(base, cur).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val baseIds = base.select("doc_id").collect().map(_.getLong(0)).toSet
    val curIds = cur.select("doc_id").collect().map(_.getLong(0)).toSet
    // exactly the union of both id sets, one status each
    d.keySet shouldBe (baseIds ++ curIds)
    d.foreach { case (id, st) =>
      st match {
        case "added"     => assert(!baseIds(id) && curIds(id))
        case "removed"   => assert(baseIds(id) && !curIds(id))
        case "changed" | "unchanged" => assert(baseIds(id) && curIds(id))
        case other => fail(s"unexpected status $other")
      }
    }
  }

  test("mixEpochs: integral weights replay exactly, fractions slice, 0 drops") {
    val df = (1L to 200L).map(i =>
      (i, if (i % 2 == 0) "en" else "de")).toDF("doc_id", "lang")
    val mixed = Sampling.mixEpochs(df, "doc_id", "lang",
      Map("en" -> 2.0, "de" -> 0.5), defaultWeight = 1.0)
    // en: every doc exactly twice, epochs 0 and 1
    mixed.where(col("lang") === "en").groupBy("doc_id").count()
      .select("count").distinct().collect().map(_.getLong(0)) shouldBe Array(2L)
    // de: roughly half the docs once (hash slice), each at epoch 0
    val de = mixed.where(col("lang") === "de")
    val deCount = de.count()
    assert(deCount > 20 && deCount < 80, s"de kept $deCount of 100")
    de.select("epoch").distinct().collect().map(_.getLong(0)) shouldBe Array(0L)
    // raising a weight only ADDS copies: 0.5 kept set ⊆ 0.9 kept set
    val more = Sampling.mixEpochs(df, "doc_id", "lang",
      Map("en" -> 2.0, "de" -> 0.9), defaultWeight = 1.0)
    val deIds = de.select("doc_id").collect().map(_.getLong(0)).toSet
    val moreIds = more.where(col("lang") === "de")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(deIds.subsetOf(moreIds))
    // weight 0 drops the stratum entirely
    Sampling.mixEpochs(df, "doc_id", "lang", Map("en" -> 0.0), 1.0)
      .where(col("lang") === "en").count() shouldBe 0L
    // deterministic across reruns and layouts
    val again = Sampling.mixEpochs(df.repartition(17), "doc_id", "lang",
      Map("en" -> 2.0, "de" -> 0.5), defaultWeight = 1.0)
    again.select("doc_id", "epoch").collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe
      mixed.select("doc_id", "epoch").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("doremiWeights: identical domains stay uniform, weights sum to 1") {
    // same content distribution per domain → equal mixture losses →
    // equal excess → the multiplicative update preserves uniformity
    val docs = Seq(
      (1L, "a", "x y x y"), (2L, "a", "x y"),
      (3L, "b", "x y x y"), (4L, "b", "x y")).toDF("doc_id", "source", "text")
    val t = Sampling.doremiWeights(spark, docs, 3)
      .as[(Long, String, Double, Double)].collect()
    t.foreach { case (_, _, _, w) => w shouldBe 0.5 +- 2e-9 }
    t.groupBy(_._1).values.foreach(rs => rs.map(_._4).sum shouldBe 1.0 +- 4e-9)
  }

  test("doremiWeights: the worse-modeled domain gains weight monotonically") {
    // domain b's distribution is far from the uniform mixture (skewed to
    // one token + its own vocab), a's is close — b's excess exceeds a's
    // every round, so b's weight strictly rises and a's strictly falls
    val docs = Seq(
      (1L, "a", "x y z x y z x y z"),
      (2L, "b", "q q q q q q q q r")).toDF("doc_id", "source", "text")
    val t = Sampling.doremiWeights(spark, docs, 3)
      .orderBy("round", "source")
      .as[(Long, String, Double, Double)].collect()
    val (wa, wb) = (t.filter(_._2 == "a").map(_._4), t.filter(_._2 == "b").map(_._4))
    val (ea, eb) = (t.filter(_._2 == "a").map(_._3), t.filter(_._2 == "b").map(_._3))
    // identify which domain carries more excess in round 1, then demand
    // the ordering is persistent and its weight path monotone
    val (hiW, loW) = if (eb.head > ea.head) (wb, wa) else (wa, wb)
    val (hiE, loE) = if (eb.head > ea.head) (eb, ea) else (ea, eb)
    hiE.zip(loE).foreach { case (h, l) => assert(h > l) }
    (0.5 +: hiW.toSeq).sliding(2).foreach { case Seq(p, n) => assert(n > p) }
    (0.5 +: loW.toSeq).sliding(2).foreach { case Seq(p, n) => assert(n < p) }
    t.groupBy(_._1).values.foreach(rs => rs.map(_._4).sum shouldBe 1.0 +- 4e-9)
  }

  test("hostQualityGate flags the bottom-fraction hosts; gateDocs drops exactly their docs") {
    // 4 hosts by mean quality: spam=0.1, low=0.3, mid=0.6, good=0.9
    // bottomFrac=0.25 ⇒ ⌈0.25·4⌉ = 1 flagged host: spam
    val docs = Seq(
      ("spam", 0.1), ("spam", 0.1),
      ("low", 0.2), ("low", 0.4),
      ("mid", 0.6),
      ("good", 0.8), ("good", 1.0)).toDF("host", "q")
    val gate = HostCuration.hostQualityGate(docs, "host", "q", 0.25)
    val m = gate.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    m("spam") shouldBe ((2L, 0.1, true))
    m("low") shouldBe ((2L, 0.3, false))
    m("mid") shouldBe ((1L, 0.6, false))
    m("good") shouldBe ((2L, 0.9, false))
    val kept = HostCuration.gateDocs(docs, gate, "host")
      .select("host").as[String].collect()
    kept should contain noneOf ("spam", "nope")
    kept.length shouldBe 5
  }

  test("hostQualityGate: mean ties break by host name; half fraction flags the bottom half") {
    val docs = Seq(("b", 0.5), ("a", 0.5), ("c", 0.9), ("d", 0.9))
      .toDF("host", "q")
    // ties at 0.5: order (a, b) — frac 0.5 ⇒ 2 flagged: a and b
    val m = HostCuration.hostQualityGate(docs, "host", "q", 0.5)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    m shouldBe Map("a" -> true, "b" -> true, "c" -> false, "d" -> false)
  }
}
