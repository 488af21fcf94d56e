package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event for the stateful-streaming paths. */
case class Event(eventId: Long, ts: java.sql.Timestamp, userId: Long,
                 eventType: String, value: Double)

/** A closed (or flushed) user session. */
case class Session(userId: Long, sessionStart: java.sql.Timestamp,
                   sessionEnd: java.sql.Timestamp, nEvents: Long, sumValue: Double)

/** Open-conversation state: the first `maxTurns` rendered turn tokens
  * plus the running total (state stays bounded by maxTurns whatever the
  * session length). */
case class ConvState(userId: Long, sessionStart: java.sql.Timestamp,
                     sessionEnd: java.sql.Timestamp, nTurns: Long,
                     turns: Seq[String])

/** A closed (or flushed) assembled conversation — the streaming twin of
  * `assembleConversations`' output row. */
case class ConversationRec(userId: Long, sessionStart: java.sql.Timestamp,
                           nTurns: Long, nKept: Long, transcript: String)

/**
 * Event-time processing over the `events` stream (EXT operators,
 * SURVEY §2.11). Every transform here is written against the UNIFIED
 * DataFrame API: applied to a batch DataFrame it runs as a normal
 * aggregation; applied to a `readStream` source it becomes an incremental
 * Structured Streaming query (the spec proves both paths produce the same
 * rows via MemoryStream). Watermarks bound state; windowed aggregations
 * shuffle on (window, key) exactly like any groupBy.
 *
 * Sessionization exists twice ON PURPOSE:
 *  - `sessionizeBatch`: pure window functions (lag → gap flags → running
 *    sum → groupBy) — oracle-checkable SQL, the batch/backfill path;
 *  - `sessionizeStream`: `flatMapGroupsWithState` with event-time timeout
 *    — the online path, emitting a session when the watermark passes its
 *    gap horizon. Same gap semantics; the spec cross-checks them.
 */
object EventStreams {

  /** Tumbling-window counts per event type. `watermark` (e.g. "10 minutes")
    * is required for append-mode streaming; pass None for batch. */
  def tumblingCounts(events: DataFrame, windowDur: String,
                     watermark: Option[String] = None): DataFrame = {
    val e = watermark.fold(events)(w => events.withWatermark("ts", w))
    e.groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value"))
  }

  /** Sliding-window counts per event type (window `windowDur`, hop
    * `slideDur`) — each event lands in windowDur/slideDur windows. */
  def slidingCounts(events: DataFrame, windowDur: String, slideDur: String,
                    watermark: Option[String] = None): DataFrame = {
    val e = watermark.fold(events)(w => events.withWatermark("ts", w))
    e.groupBy(window(col("ts"), windowDur, slideDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value"))
  }

  /**
   * Interval join (funnel primitive): pair each LEFT event with RIGHT
   * events of the same user landing within [0, withinSec] seconds AFTER
   * it. UNIFIED shape: on batch frames it plans a plain equi+range join
   * (oracle-gated as q44); on streaming frames — both sides watermarked —
   * it becomes a Spark stream-stream join whose buffered state is bounded
   * by the watermark plus the interval (the spec cross-checks the two
   * paths on the same events). At scale both sides shuffle once on
   * user_id; the range predicate prunes inside each key group.
   */
  def joinWithin(left: DataFrame, right: DataFrame, withinSec: Long,
                 watermark: Option[String] = None): DataFrame = {
    val l = watermark.fold(left)(w => left.withWatermark("ts", w))
      .select(col("user_id"), col("event_id").as("left_event_id"),
        col("ts").as("left_ts"))
    val r = watermark.fold(right)(w => right.withWatermark("ts", w))
      .select(col("user_id").as("r_user"), col("event_id").as("right_event_id"),
        col("ts").as("right_ts"))
    l.join(r, col("user_id") === col("r_user") &&
        col("right_ts") >= col("left_ts") &&
        col("right_ts") <= col("left_ts") + expr(s"INTERVAL $withinSec SECONDS"))
      .select(col("user_id"), col("left_event_id"), col("left_ts"),
        col("right_event_id"), col("right_ts"))
  }

  /** Gap-based sessionization, batch path: a session breaks when the gap
    * to the previous event (per user, in whole epoch seconds — the
    * cross-engine-stable comparison) exceeds `gapSec`. */
  def sessionizeBatch(events: DataFrame, gapSec: Long): DataFrame =
    withSessionIds(events, gapSec)
      .groupBy(col("user_id"), col("sess"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .drop("sess")

  /** Gap-session ids (user_id, …, sess) — the shared kernel of
    * sessionization, funnel rates, and conversation assembly: one
    * user-keyed exchange; the lag flag and the running sum share its
    * partition sort. Gap compares floor-second epochs (engine-identical
    * and oracle-expressible). */
  private[graft] def withSessionIds(events: DataFrame, gapSec: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val prev = lag(col("ts"), 1).over(w)
    val isNew = when(prev.isNull ||
      col("ts").cast("long") - prev.cast("long") > gapSec, 1L).otherwise(0L)
    events.withColumn("sess", sum(isNew).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /**
   * Conversation/transcript assembly — the chat-log → training-example
   * step: each gap-session becomes ONE ordered record whose transcript
   * is the first `maxTurns` turns rendered as "type@offsetSec" tokens
   * in (ts, event_id) order, with total and kept turn counts. Head
   * truncation (keep the FIRST turns) is the context-window assembly
   * convention; offsets are relative to the session start, so
   * transcripts are translation-invariant — two identical dialogues at
   * different wall-clock times render identically (what dedup over
   * assembled conversations needs).
   *
   * Scale: the SAME single user-keyed exchange as sessionization — the
   * session-id running sum, the turn rank, the session-start first(),
   * and the final per-session aggregate all share the user partition.
   * Per-session state is bounded by the session length (and the
   * transcript by `maxTurns` tokens).
   */
  def assembleConversations(events: DataFrame, gapSec: Long, maxTurns: Int): DataFrame = {
    require(maxTurns > 0, "maxTurns must be positive")
    val wTurn = Window.partitionBy(col("user_id"), col("sess"))
      .orderBy(col("ts"), col("event_id"))
    withSessionIds(events, gapSec)
      .withColumn("turn_no", row_number().over(wTurn))
      .withColumn("off", col("ts").cast("long") - first(col("ts")).over(wTurn).cast("long"))
      .groupBy(col("user_id"), col("sess"))
      .agg(
        min(col("ts")).as("session_start"),
        count(lit(1)).as("n_turns"),
        sum(when(col("turn_no") <= maxTurns, 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("turn_no") <= maxTurns,
              struct(col("turn_no"),
                concat(col("event_type"), lit("@"), col("off")).as("tok"))))),
            x => x.getField("tok")),
          " ").as("transcript"))
      .drop("sess")
  }

  /**
   * Dialogue UNROLLING — conversations → supervised training pairs: for
   * every turn t ≥ 2 of each gap-session, emit (context = the up-to-
   * `maxContext` turns preceding t rendered as "type@offsetSec" tokens,
   * target = turn t's token) — the standard SFT-example expansion of a
   * chat log, where one n-turn conversation yields n−1 next-turn
   * prediction examples under a bounded context window. Offsets stay
   * relative to the session start (the `assembleConversations`
   * translation-invariance, so identical dialogues at different
   * wall-clocks unroll identically — what dedup over examples keys on).
   *
   * Scale: the SAME single user-keyed exchange as sessionization — the
   * session ids, turn ranks, offsets, and the bounded-frame context
   * aggregate all share the user partition sort; per-row state is
   * bounded by `maxContext` tokens. Output: (user_id, session_start,
   * turn_no, context, target).
   */
  def unrollDialogues(events: DataFrame, gapSec: Long,
                      maxContext: Int): DataFrame = {
    require(maxContext > 0, "maxContext must be positive")
    val wTurn = Window.partitionBy(col("user_id"), col("sess"))
      .orderBy(col("ts"), col("event_id"))
    // bounded trailing frame = the context window; collect_list over a
    // window frame has no order guarantee, so tokens carry their turn_no
    // and sort structurally (the assembleConversations trick)
    val wCtx = wTurn.rowsBetween(-maxContext, -1)
    withSessionIds(events, gapSec)
      .withColumn("turn_no", row_number().over(wTurn).cast("long"))
      .withColumn("session_start", first(col("ts")).over(wTurn))
      .withColumn("off",
        col("ts").cast("long") - col("session_start").cast("long"))
      .withColumn("tok", concat(col("event_type"), lit("@"), col("off")))
      .withColumn("context", array_join(
        transform(
          array_sort(collect_list(struct(col("turn_no"), col("tok"))).over(wCtx)),
          x => x.getField("tok")),
        " "))
      .where(col("turn_no") >= 2)
      .select(col("user_id"), col("session_start"), col("turn_no"),
        col("context"), col("tok").as("target"))
  }

  /**
   * Event debouncing — keep only the LEADING EDGE of each burst: an
   * event survives iff the previous event of the same key is more than
   * `debounceSec` behind (or absent). Equivalent to keeping each
   * gap-session's first event per key, so it composes with
   * `sessionizeBatch`'s session definition; the standard guard against
   * double-fire/retry storms before event-level aggregation.
   *
   * Scale: one key shuffle + partition sort (the lag window), map-only
   * otherwise; keys include the event type, so partitions are finer
   * than per-user. Gap compares floor-second epochs — engine-identical
   * and oracle-expressible.
   */
  def debounce(events: DataFrame, keyCols: Seq[String], debounceSec: Long,
               tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    require(keyCols.nonEmpty, "debounce needs at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol), col(idCol))
    val prev = lag(col(tsCol), 1).over(w)
    events
      .withColumn("__prev_ts", prev)
      .where(col("__prev_ts").isNull ||
        col(tsCol).cast("long") - col("__prev_ts").cast("long") > debounceSec)
      .drop("__prev_ts")
  }

  /**
   * Gap-based sessionization, streaming path: per-user state holds the
   * open session; an event-time timeout at (session end + gap) closes and
   * emits it. Late events inside the gap extend the session. State is one
   * tiny tuple per active user — bounded by the watermark, not by history.
   */
  def sessionizeStream(events: Dataset[Event], gapSec: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.userId)
      .flatMapGroupsWithState[Session, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[Session]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            val closed = state.get
            state.remove()
            Iterator.single(closed)
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.eventId))
            var open = state.getOption
            val out = Seq.newBuilder[Session]
            for (e <- sorted) {
              open match {
                case Some(s) if e.ts.getTime / 1000 - s.sessionEnd.getTime / 1000 <= gapSec =>
                  open = Some(s.copy(
                    sessionEnd = if (e.ts.after(s.sessionEnd)) e.ts else s.sessionEnd,
                    nEvents = s.nEvents + 1, sumValue = s.sumValue + e.value))
                case Some(s) =>
                  out += s
                  open = Some(Session(userId, e.ts, e.ts, 1L, e.value))
                case None =>
                  open = Some(Session(userId, e.ts, e.ts, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.sessionEnd.getTime + gapSec * 1000 + 1)
            }
            out.result().iterator
          }
      }
  }

  /**
   * Streaming conversation assembly — `assembleConversations`' twin on
   * the `sessionizeStream` state machine: per user, an open conversation
   * accumulates its first `maxTurns` rendered "type@offsetSec" tokens
   * (STATE IS BOUNDED by maxTurns however long the session runs — only
   * the total count keeps growing); a gap beyond `gapSec` or an
   * event-time timeout closes it and emits one record. Emits match the
   * batch face row-for-row on id-ordered arrival (spec-gated).
   */
  def assembleConversationsStream(events: Dataset[Event], gapSec: Long,
                                  maxTurns: Int): Dataset[ConversationRec] = {
    require(maxTurns > 0, "maxTurns must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    def close(s: ConvState): ConversationRec =
      ConversationRec(s.userId, s.sessionStart, s.nTurns,
        s.turns.size.toLong, s.turns.mkString(" "))
    def append(s: ConvState, e: Event): ConvState = {
      val off = e.ts.getTime / 1000 - s.sessionStart.getTime / 1000
      val turns = if (s.turns.size < maxTurns)
        s.turns :+ s"${e.eventType}@$off" else s.turns
      ConvState(s.userId, s.sessionStart,
        if (e.ts.after(s.sessionEnd)) e.ts else s.sessionEnd,
        s.nTurns + 1, turns)
    }
    def fresh(userId: Long, e: Event): ConvState =
      ConvState(userId, e.ts, e.ts, 1L, Seq(s"${e.eventType}@0"))
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.userId)
      .flatMapGroupsWithState[ConvState, ConversationRec](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[ConvState]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            val closed = state.get
            state.remove()
            Iterator.single(close(closed))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.eventId))
            var open = state.getOption
            val out = Seq.newBuilder[ConversationRec]
            for (e <- sorted) {
              open match {
                case Some(s)
                  if e.ts.getTime / 1000 - s.sessionEnd.getTime / 1000 <= gapSec =>
                  open = Some(append(s, e))
                case Some(s) =>
                  out += close(s)
                  open = Some(fresh(userId, e))
                case None =>
                  open = Some(fresh(userId, e))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.sessionEnd.getTime + gapSec * 1000 + 1)
            }
            out.result().iterator
          }
      }
  }

  /**
   * As-of join: attach to each LEFT event the most recent RIGHT event of
   * the same key at-or-before its timestamp (the point-in-time lookup of
   * feature stores and attribution pipelines — "the last `view` as of
   * this `click`").
   *
   * Implemented as a union-merge, NOT a join: both sides union into one
   * stream tagged (side 0 = right, 1 = left), then a running
   * `last(..., ignoreNulls)` over (ts, side, id) within each key carries
   * the latest right row forward. ONE shuffle on the key and one
   * partition sort — no per-row range probe, no key×key blowup, state
   * bounded by a single carried row. Equal timestamps: the right event IS
   * visible to a left event at the same ts (side 0 sorts first); multiple
   * right events on the same (key, ts) resolve to the largest id —
   * deterministic.
   *
   * Output: (key, left_event_id, left_ts, asof_event_id, asof_ts,
   * asof_value) — asof_* NULL when no right event precedes.
   */
  def asOfJoin(left: DataFrame, right: DataFrame,
               keyCol: String = "user_id", tsCol: String = "ts",
               idCol: String = "event_id", valueCol: String = "value"): DataFrame = {
    val r = right.select(col(keyCol), col(tsCol), lit(0).as("side"),
      col(idCol), col(valueCol).cast("double").as("v"))
    val l = left.select(col(keyCol), col(tsCol), lit(1).as("side"),
      col(idCol), lit(null).cast("double").as("v"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("side"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def carried(c: org.apache.spark.sql.Column) =
      last(when(col("side") === 0, c), ignoreNulls = true).over(w)
    l.unionByName(r)
      .select(col(keyCol), col("side"), col(idCol).as("left_event_id"),
        col(tsCol).as("left_ts"),
        carried(col(idCol)).as("asof_event_id"),
        carried(col(tsCol)).as("asof_ts"),
        carried(col("v")).as("asof_value"))
      .where(col("side") === 1)
      .drop("side")
  }

  /**
   * As-of join with a STALENESS bound — production feature-store
   * semantics (a "last known balance" that is three weeks old is not a
   * feature, it is a leak of absence): the carried right row only
   * attaches if it is at most `maxStalenessSec` behind the left event
   * (floor-second epochs, the gap convention everywhere in this file);
   * staler matches NULL out all three as-of columns together, exactly
   * like no match at all. Same single key shuffle + partition sort as
   * `asOfJoin` — the bound is a pure post-projection, not a range probe.
   */
  def asOfJoinWithin(left: DataFrame, right: DataFrame, maxStalenessSec: Long,
                     keyCol: String = "user_id", tsCol: String = "ts",
                     idCol: String = "event_id",
                     valueCol: String = "value"): DataFrame = {
    require(maxStalenessSec >= 0, "maxStalenessSec must be non-negative")
    val base = asOfJoin(left, right, keyCol, tsCol, idCol, valueCol)
    val fresh = col("asof_ts").isNotNull &&
      col("left_ts").cast("long") - col("asof_ts").cast("long") <= maxStalenessSec
    base.select(col(keyCol), col("left_event_id"), col("left_ts"),
      when(fresh, col("asof_event_id")).as("asof_event_id"),
      when(fresh, col("asof_ts")).as("asof_ts"),
      when(fresh, col("asof_value")).as("asof_value"))
  }

  /**
   * Time-series resample + forward fill: regularize an irregular event
   * stream onto a fixed daily grid per key — the gap-filling step before
   * any per-period comparison (DAU panels, balance snapshots, feature
   * backfills). Every key gets one row per day of the GLOBAL observed
   * span; a day with no events carries the most recent prior day's
   * closing value forward; days before the key's first event stay NULL.
   *
   * Scale shape: the daily closing value is a per-(key, day) reduction
   * (row_number window — partitions are key×day, so no single fat
   * partition), the grid is a broadcast cross join of the distinct-key
   * projection against one driver-bounded day sequence (span/day rows —
   * a decade is ~3.7k), and the fill is one running `last(ignoreNulls)`
   * window per key over ≤span rows. The event body never shuffles twice.
   *
   * Output: (key, day DATE, n_events BIGINT — 0 on filled days,
   * v_close DOUBLE — forward-filled, NULL before first event).
   */
  def resampleDailyFfill(events: DataFrame,
                         keyCol: String = "user_id", tsCol: String = "ts",
                         idCol: String = "event_id",
                         valueCol: String = "value"): DataFrame = {
    val day = to_date(col(tsCol))
    // Closing value per (key, day): latest ts, event id breaking ties —
    // deterministic by construction, not by fixture accident.
    val wDay = Window.partitionBy(col(keyCol), col("day"))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    val daily = events
      .select(col(keyCol), day.as("day"), col(tsCol), col(idCol),
        col(valueCol).cast("double").as("v"))
      .withColumn("rn", row_number().over(wDay))
      .groupBy(col(keyCol), col("day"))
      .agg(count(lit(1)).as("n_events"),
        max(when(col("rn") === 1, col("v"))).as("v_day"))
    // One-row global span → exploded day sequence, cross-joined against
    // the distinct keys (both sides broadcast-small next to the events).
    val span = events.agg(to_date(min(col(tsCol))).as("d0"),
      to_date(max(col(tsCol))).as("d1"))
    val days = span.select(
      explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val grid = events.select(col(keyCol)).distinct().crossJoin(broadcast(days))
    val wFill = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq(keyCol, "day"), "left")
      .select(col(keyCol), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("v_day"), ignoreNulls = true).over(wFill).as("v_close"))
  }

  /**
   * Retention cohort matrix — the standard product-analytics rollup:
   * users cohorted by first-seen day, each cohort's later activity
   * reported as (cohort_date, day_offset, n_active, n_cohort,
   * retention). Offset 0 is the cohort itself (retention 1 by
   * construction); only offsets with activity appear.
   *
   * Plan shape: the first-seen aggregate and the distinct (user, day)
   * activity table share the user key, so Catalyst reuses one exchange
   * for their join; the matrix aggregate is (cohorts × offsets) rows —
   * tiny — and cohort sizes broadcast back onto it. The event body
   * never shuffles twice.
   */
  def retentionCohorts(events: DataFrame, userCol: String = "user_id",
                       tsCol: String = "ts"): DataFrame = {
    val acts = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("day"))
      .distinct()
    val first = acts.groupBy(col("u")).agg(min(col("day")).as("cohort_date"))
    val matrix = acts.join(first, Seq("u"))
      .groupBy(col("cohort_date"),
        datediff(col("day"), col("cohort_date")).as("day_offset"))
      .agg(countDistinct(col("u")).as("n_active"))
    val sizes = first.groupBy(col("cohort_date"))
      .agg(countDistinct(col("u")).as("n_cohort"))
    matrix.join(broadcast(sizes), Seq("cohort_date"))
      .select(col("cohort_date"), col("day_offset").cast("long").as("day_offset"),
        col("n_active"), col("n_cohort"),
        round(col("n_active").cast("double") / col("n_cohort").cast("double"), 6)
          .as("retention"))
  }
}
