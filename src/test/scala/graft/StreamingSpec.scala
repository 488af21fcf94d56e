package graft

import graft.streaming.{Event, EventStreams, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val batch = Seq(
    Event(1L, ts(0), 1L, "click", 1.0),
    Event(2L, ts(5), 1L, "click", 2.0),
    Event(3L, ts(40), 1L, "view", 4.0), // >30min gap for user 1 → new session
    Event(4L, ts(2), 2L, "click", 8.0))

  private val EventCols = Seq("event_id", "ts", "user_id", "event_type", "value")

  test("tumblingCounts in batch mode aggregates per aligned hour window") {
    val out = EventStreams.tumblingCounts(batch.toDF(EventCols: _*), "1 hour")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    out((Timestamp.valueOf("2024-01-01 10:00:00"), "click")) shouldBe ((3L, 11.0))
    out((Timestamp.valueOf("2024-01-01 10:00:00"), "view")) shouldBe ((1L, 4.0))
  }

  test("the SAME tumblingCounts transform runs as a streaming query (MemoryStream)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val sq = EventStreams.tumblingCounts(mem.toDF().toDF(EventCols: _*), "1 hour", Some("10 minutes"))
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode("update").start()
    try {
      mem.addData(batch: _*)
      sq.processAllAvailable()
      val rows = spark.table("tumbling_test").collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      rows((Timestamp.valueOf("2024-01-01 10:00:00"), "click")) shouldBe ((3L, 11.0))
      rows((Timestamp.valueOf("2024-01-01 10:00:00"), "view")) shouldBe ((1L, 4.0))
    } finally sq.stop()
  }

  test("sessionizeBatch splits on gap, keeps within-gap runs together") {
    val out = EventStreams.sessionizeBatch(
        batch.toDF("event_id", "ts", "user_id", "event_type", "value")
          .withColumnRenamed("eventId", "event_id"), 30 * 60L)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4)))
    out.sortBy(r => (r._1, r._2.getTime)).toSeq shouldBe Seq(
      (1L, ts(0), ts(5), 2L, 3.0),
      (1L, ts(40), ts(40), 1L, 4.0),
      (2L, ts(2), ts(2), 1L, 8.0))
  }

  test("assembleConversations renders ordered head-truncated transcripts with relative offsets") {
    // user 1, session 1: 6 events 1 minute apart — maxTurns=5 keeps the
    // first five; offsets are relative to session start. Session 2 (>30
    // min later) restarts offsets at 0. User 2: single-event session.
    val evs = (0 to 5).map(i =>
      Event(i.toLong, ts(i), 1L, s"e$i", 1.0)) ++ Seq(
      Event(10L, ts(50), 1L, "late", 1.0),
      Event(11L, ts(7), 2L, "solo", 1.0))
    val out = EventStreams.assembleConversations(
        evs.toDF(EventCols: _*), 30 * 60L, maxTurns = 5)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    out((1L, ts(0))) shouldBe ((6L, 5L, "e0@0 e1@60 e2@120 e3@180 e4@240"))
    out((1L, ts(50))) shouldBe ((1L, 1L, "late@0"))
    out((2L, ts(7))) shouldBe ((1L, 1L, "solo@0"))
    out.size shouldBe 3
  }

  test("assembleConversations turn order follows (ts, event_id), not arrival") {
    val evs = Seq( // same timestamp: event_id breaks the tie
      Event(2L, ts(1), 1L, "b", 1.0),
      Event(1L, ts(1), 1L, "a", 1.0),
      Event(3L, ts(2), 1L, "c", 1.0))
    val t = EventStreams.assembleConversations(
        evs.toDF(EventCols: _*), 30 * 60L, maxTurns = 10)
      .collect().map(_.getString(4))
    t.toSeq shouldBe Seq("a@0 b@0 c@60")
  }

  test("unrollDialogues emits one (context, target) pair per turn ≥ 2 under the bounded window") {
    // user 1: 5-turn session 1 minute apart, then a new session after the
    // gap; user 2: single-turn session (no pairs). maxContext = 2.
    val evs = (0 to 4).map(i => Event(i.toLong, ts(i), 1L, s"e$i", 1.0)) ++ Seq(
      Event(10L, ts(50), 1L, "s2a", 1.0), Event(11L, ts(51), 1L, "s2b", 1.0),
      Event(20L, ts(7), 2L, "solo", 1.0))
    val out = EventStreams.unrollDialogues(evs.toDF(EventCols: _*), 30 * 60L, 2)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)) ->
        ((r.getString(3), r.getString(4)))).toMap
    // turn 2 sees 1 turn of context; turns 3+ exactly the trailing 2
    out((1L, ts(0), 2L)) shouldBe (("e0@0", "e1@60"))
    out((1L, ts(0), 3L)) shouldBe (("e0@0 e1@60", "e2@120"))
    out((1L, ts(0), 4L)) shouldBe (("e1@60 e2@120", "e3@180"))
    out((1L, ts(0), 5L)) shouldBe (("e2@120 e3@180", "e4@240"))
    // the second session restarts offsets AND context at its own start
    out.values.map(_._2) should contain("s2b@60")
    out.filter(_._2._2 == "s2b@60").head._2._1 shouldBe "s2a@0"
    // 5-turn session → 4 pairs; 2-turn session → 1; solo → 0
    out.size shouldBe 5
  }

  test("sessionizeStream (flatMapGroupsWithState) emits the same closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val sq = EventStreams.sessionizeStream(mem.toDS(), 30 * 60L)
      .writeStream.format("memory").queryName("sessions_test")
      .outputMode("append").start()
    try {
      mem.addData(batch: _*)
      sq.processAllAvailable()
      // flush: an event far in the future advances the watermark past every
      // session's gap horizon, timing out all open sessions
      mem.addData(Event(99L, Timestamp.valueOf("2024-01-02 10:00:00"), 9L, "x", 0.0))
      sq.processAllAvailable()
      mem.addData(Event(100L, Timestamp.valueOf("2024-01-03 10:00:00"), 9L, "x", 0.0))
      sq.processAllAvailable()
      val got = spark.table("sessions_test").as[Session].collect()
        .filter(_.userId != 9L)
        .map(s => (s.userId, s.sessionStart, s.sessionEnd, s.nEvents, s.sumValue))
        .sortBy(r => (r._1, r._2.getTime)).toSeq
      got shouldBe Seq(
        (1L, ts(0), ts(5), 2L, 3.0),
        (1L, ts(40), ts(40), 1L, 4.0),
        (2L, ts(2), ts(2), 1L, 8.0))
    } finally sq.stop()
  }

  test("assembleConversationsStream matches the batch assembly (bounded state, head truncation)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // maxTurns=2 exercises the state cap: user 1's first session has 3
    // turns but state carries only 2 rendered tokens
    val evs = Seq(
      Event(1L, ts(0), 1L, "a", 1.0), Event(2L, ts(3), 1L, "b", 1.0),
      Event(3L, ts(5), 1L, "c", 1.0),
      Event(4L, ts(50), 1L, "late", 1.0),
      Event(5L, ts(7), 2L, "solo", 1.0))
    val sq = EventStreams.assembleConversationsStream(mem.toDS(), 30 * 60L, 2)
      .writeStream.format("memory").queryName("conv_test")
      .outputMode("append").start()
    try {
      mem.addData(evs: _*)
      sq.processAllAvailable()
      mem.addData(Event(99L, Timestamp.valueOf("2024-01-02 10:00:00"), 9L, "x", 0.0))
      sq.processAllAvailable()
      mem.addData(Event(100L, Timestamp.valueOf("2024-01-03 10:00:00"), 9L, "x", 0.0))
      sq.processAllAvailable()
      val got = spark.table("conv_test")
        .as[graft.streaming.ConversationRec].collect()
        .filter(_.userId != 9L)
        .map(c => (c.userId, c.sessionStart, c.nTurns, c.nKept, c.transcript))
        .sortBy(r => (r._1, r._2.getTime)).toSeq
      val expected = EventStreams.assembleConversations(
          evs.toDF(EventCols: _*), 30 * 60L, 2)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
          r.getLong(3), r.getString(4)))
        .sortBy(r => (r._1, r._2.getTime)).toSeq
      got shouldBe expected
      got.head shouldBe ((1L, ts(0), 3L, 2L, "a@0 b@180")) // capped at 2 of 3
    } finally sq.stop()
  }

  test("joinWithin runs as a STREAM-STREAM join and matches the batch interval join") {
    implicit val sqlCtx = spark.sqlContext
    val views = Seq(
      Event(1L, ts(0), 1L, "view", 0.0),
      Event(2L, ts(20), 1L, "view", 0.0),
      Event(3L, ts(1), 2L, "view", 0.0))
    val clicks = Seq(
      Event(10L, ts(3), 1L, "click", 0.0),  // within 10min of view 1
      Event(11L, ts(25), 1L, "click", 0.0), // within 10min of view 2
      Event(12L, ts(45), 2L, "click", 0.0)) // 44min after view 3 → no match
    val within = 600L
    def df(es: Seq[Event]) = es.toDF(EventCols: _*)
    val expected = EventStreams.joinWithin(df(views), df(clicks), within)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    expected shouldBe Set((1L, 1L, 10L), (1L, 2L, 11L))

    val memV = MemoryStream[Event]
    val memC = MemoryStream[Event]
    val sq = EventStreams.joinWithin(
        memV.toDF().toDF(EventCols: _*), memC.toDF().toDF(EventCols: _*),
        within, watermark = Some("1 minute"))
      .writeStream.format("memory").queryName("funnel_test")
      .outputMode("append").start()
    try {
      memV.addData(views: _*)
      memC.addData(clicks: _*)
      sq.processAllAvailable()
      // advance both watermarks past every buffered row so the join flushes
      memV.addData(Event(98L, Timestamp.valueOf("2024-01-02 10:00:00"), 9L, "view", 0.0))
      memC.addData(Event(99L, Timestamp.valueOf("2024-01-02 10:00:00"), 9L, "click", 0.0))
      sq.processAllAvailable()
      val got = spark.table("funnel_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
        .filter(_._1 != 9L).toSet
      got shouldBe expected
    } finally sq.stop()
  }

  test("batch and streaming sessionization agree on random event logs (seed=7)") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(7)
    val events = (1 to 120).map { i =>
      Event(i.toLong, new Timestamp(
        Timestamp.valueOf("2024-01-01 00:00:00").getTime + rnd.nextInt(6 * 3600) * 1000L),
        1L + rnd.nextInt(4), "e" + rnd.nextInt(2), rnd.nextInt(10).toDouble)
    }
    val gap = 600L
    val expected = EventStreams.sessionizeBatch(
        events.toDF("event_id", "ts", "user_id", "event_type", "value"), gap)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet

    val mem = MemoryStream[Event]
    val sq = EventStreams.sessionizeStream(mem.toDS(), gap)
      .writeStream.format("memory").queryName("sessions_rand")
      .outputMode("append").start()
    try {
      // feed in event-time order so no in-gap event arrives after its
      // session was closed by the advancing watermark
      events.sortBy(_.ts.getTime).grouped(40).foreach { chunk =>
        mem.addData(chunk: _*); sq.processAllAvailable()
      }
      mem.addData(Event(999L, Timestamp.valueOf("2024-03-01 00:00:00"), 99L, "x", 0.0))
      sq.processAllAvailable()
      mem.addData(Event(1000L, Timestamp.valueOf("2024-04-01 00:00:00"), 99L, "x", 0.0))
      sq.processAllAvailable()
      val got = spark.table("sessions_rand").as[Session].collect()
        .filter(_.userId != 99L)
        .map(s => (s.userId, s.sessionStart, s.sessionEnd, s.nEvents, s.sumValue)).toSet
      got shouldBe expected
    } finally sq.stop()
  }

  test("dedupKeepFirst streams with bounded state and matches the batch face on id-ordered arrival") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, ts(0), "alpha"), (2L, ts(1), "beta"), (3L, ts(2), "alpha"),
      (4L, ts(3), "gamma"), (5L, ts(4), "beta"), (6L, ts(5), "alpha"))
    val mem = MemoryStream[(Long, Timestamp, String)]
    val sq = graft.operators.Dedup.dedupKeepFirst(
        mem.toDF().toDF("doc_id", "ts", "text"), "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData(docs.take(4): _*)
      sq.processAllAvailable()
      mem.addData(docs.drop(4): _*) // dups arriving in a LATER batch still drop
      sq.processAllAvailable()
      val kept = spark.table("dedup_stream").collect().map(_.getLong(0)).sorted
      kept shouldBe Array(1L, 2L, 4L)
      // batch face: deterministic min-id per digest — same set here because
      // the stream arrived in id order
      val batchKept = graft.operators.Dedup.dedupKeepFirst(
          docs.toDF("doc_id", "ts", "text"), "10 minutes")
        .collect().map(_.getLong(0)).sorted
      batchKept shouldBe kept
    } finally sq.stop()
  }

  test("debounce keeps the leading edge of each per-key burst") {
    val ev = Seq(
      Event(1L, ts(0), 1L, "click", 1.0),  // leading edge
      Event(2L, ts(2), 1L, "click", 1.0),  // within 5 min of #1 → dropped
      Event(3L, ts(9), 1L, "click", 1.0),  // >5 min after #2 → kept
      Event(4L, ts(1), 1L, "view", 1.0),   // different type → own burst
      Event(5L, ts(3), 2L, "click", 1.0))  // different user → own burst
    val kept = EventStreams.debounce(
        ev.toDF(EventCols: _*), Seq("user_id", "event_type"), 300L)
      .select("event_id").as[Long].collect().sorted
    kept shouldBe Array(1L, 3L, 4L, 5L)
    // debounced survivors == first event of each gap-session on the key
    val bySession = EventStreams.sessionizeBatch(
      ev.toDF(EventCols: _*).where(col("event_type") === "click")
        .where(col("user_id") === 1L), 300L).count()
    bySession shouldBe 2L // two bursts → two debounce survivors for that key
  }

  test("the curation tier (quality/langId/tokens/PII) streams unchanged — map-only transforms") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.TextFunctions._
    // the SAME transform serves batch backfill and the online path — the
    // payoff of keeping per-document scoring as pure Column expressions
    def curate(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      langId(col("text")).as("lang"),
      round(qualityScore(col("text")), 6).as("quality"),
      tokenCountWs(col("text")).as("n_tokens"),
      redactPii(col("text")).as("redacted"))
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog and the cat"),
      (2L, "der hund und die katze sind nicht hier aber das ist gut"),
      (3L, "contact me at someone@example.com right away"),
      (4L, ""))
    val batchRows = curate(docs.toDF("doc_id", "text"))
      .collect().map(_.toSeq).toSet
    val mem = MemoryStream[(Long, String)]
    val sq = curate(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("curation_test")
      .outputMode("append").start()
    try {
      mem.addData(docs: _*)
      sq.processAllAvailable()
      spark.table("curation_test").collect().map(_.toSeq).toSet shouldBe batchRows
      batchRows.size shouldBe 4
    } finally sq.stop()
  }

  test("DSIR scoring streams unchanged under a frozen log-ratio model") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Selection
    // train the model in batch (bounded: 64 rows), freeze it as the
    // literal the map-only streaming column carries
    val train = Seq(
      (1L, "the cat sat on the mat", "seed"),
      (2L, "a cat and another cat", "seed"),
      (10L, "the cat sat quietly", "web"),
      (11L, "quantum flux capacitor array", "web"))
      .toDF("doc_id", "text", "source")
    val lr = Selection.dsirLogRatios(train, col("source") === "seed", 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def score(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"), Selection.dsirScoreColumn(col("text"), lr, 64).as("logw"))
    val arriving = Seq((20L, "the cat sat on a mat"),
      (21L, "flux array of capacitors"), (22L, ""))
    val batchRows = score(arriving.toDF("doc_id", "text"))
      .collect().map(_.toSeq).toSet
    val mem = MemoryStream[(Long, String)]
    val sq = score(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("dsir_stream_test")
      .outputMode("append").start()
    try {
      mem.addData(arriving: _*)
      sq.processAllAvailable()
      spark.table("dsir_stream_test").collect().map(_.toSeq).toSet shouldBe batchRows
      batchRows.size shouldBe 3
    } finally sq.stop()
  }

  test("PSI drift monitors online: streaming bin counts feed psiFromCounts") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Drift
    // EXT-S15: the online face of the drift monitor — a streaming
    // groupBy over the SAME binning column (bounded state: one row per
    // bin, complete mode), whose state table snapshot + the frozen
    // baseline reproduce the batch PSI exactly.
    val baseVals = (0L until 400L).map(i => i % 200)          // uniform-ish
    val curVals = (0L until 400L).map(i => 100L + i % 100)    // shifted
    val baseline = baseVals.toDF("v")
      .groupBy(Drift.binOf(col("v"), 50L, 4).as("bin"))
      .agg(count(lit(1)).as("n_base"))
    val mem = MemoryStream[Long]
    val sq = mem.toDF().toDF("v")
      .groupBy(Drift.binOf(col("v"), 50L, 4).as("bin"))
      .agg(count(lit(1)).as("n_cur"))
      .writeStream.format("memory").queryName("psi_bins")
      .outputMode("complete").start()
    try {
      mem.addData(curVals.take(150): _*)
      sq.processAllAvailable()
      mem.addData(curVals.drop(150): _*)
      sq.processAllAvailable()
      val online = Drift.psiFromCounts(baseline, spark.table("psi_bins"), 4)
      val batch = Drift.psiBins(baseVals.toDF("v"), curVals.toDF("v"), "v", 50L, 4)
      online.orderBy("bin").collect().map(_.toSeq).toSeq shouldBe
        batch.orderBy("bin").collect().map(_.toSeq).toSeq
      online.select(max(col("psi_total"))).head().getDouble(0) should be > 0.1
    } finally sq.stop()
  }

  test("retentionCohorts: hand-computed matrix, duplicate events collapse") {
    import spark.implicits._
    def ts(day: Int, h: Int = 9) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    // cohort d1: users 1,2 — u1 returns d2 and d3, u2 returns d3 (twice)
    // cohort d2: user 3 — never returns
    val events = Seq(
      (1L, ts(1)), (1L, ts(2)), (1L, ts(3)),
      (2L, ts(1)), (2L, ts(3)), (2L, ts(3, 15)),
      (3L, ts(2))).toDF("user_id", "ts")
    val got = graft.streaming.EventStreams.retentionCohorts(events)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    got shouldBe Map(
      ("2024-01-01", 0L) -> ((2L, 2L, 1.0)),
      ("2024-01-01", 1L) -> ((1L, 2L, 0.5)),
      ("2024-01-01", 2L) -> ((2L, 2L, 1.0)),
      ("2024-01-02", 0L) -> ((1L, 1L, 1.0)))
  }
}
