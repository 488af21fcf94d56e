package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/**
 * Event-time windowing queries over `events` (EXT operators, SURVEY
 * §2.11), running the UNIFIED transforms from EventStreams in batch mode —
 * identical code serves `readStream` (spec-verified). Oracles use
 * time_bucket (DuckDB's epoch-aligned bucketing matches Spark's
 * epoch-aligned `window()` for sub-day durations).
 */
object StreamingQueries extends QueryPack {

  private val SessionGapSec = 21600L // 6 hours
  private val ConvMaxTurns = 5 // q163 transcript head-truncation
  private val SftMaxContext = 3 // q183 context window (turns)
  private val AsofStaleSec = 7200L // q176 max as-of staleness (2 h)
  private val FunnelWithinSec = 86400L // view → click attribution window
  private val MadK = 4.4478 // q207 Hampel fence (≈3σ-equivalent: 3·1.4826)

  private def events(s: SparkSession, dir: String) = Tables.events(s, dir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // EXT-S1: tumbling 1-hour window per event type.
    "q31_tumbling_window" -> ((s, dir) =>
      EventStreams.tumblingCounts(events(s, dir), "1 hour")
        .select(col("ws"), col("event_type"), col("n"),
          round(col("sum_value"), 6).as("sum_value"))
        .orderBy(col("ws"), col("event_type"))),

    // EXT-S2: sliding 1-hour window, 30-minute hop.
    "q32_sliding_window" -> ((s, dir) =>
      EventStreams.slidingCounts(events(s, dir), "1 hour", "30 minutes")
        .select(col("ws"), col("event_type"), col("n"),
          round(col("sum_value"), 6).as("sum_value"))
        .orderBy(col("ws"), col("event_type"))),

    // EXT-S3: gap-based sessionization (batch twin of the
    // flatMapGroupsWithState path).
    "q33_sessions" -> ((s, dir) =>
      EventStreams.sessionizeBatch(events(s, dir), SessionGapSec)
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), round(col("sum_value"), 6).as("sum_value"))
        .orderBy(col("user_id"), col("session_start"))),

    // EXT-S18: conversation/transcript assembly — each gap-session
    // renders as ONE training record: the first ConvMaxTurns turns as
    // "type@offsetSec" tokens (offsets relative to session start, so
    // identical dialogues at different wall-clocks render identically),
    // plus total/kept turn counts. Same single user-keyed exchange as
    // q33's sessionization.
    "q163_conversations" -> ((s, dir) =>
      EventStreams.assembleConversations(events(s, dir), SessionGapSec, ConvMaxTurns)
        .orderBy(col("user_id"), col("session_start"))),

    // EXT-S22: dialogue unrolling — conversations → SFT training pairs:
    // every turn t ≥ 2 becomes (context = up to maxContext preceding
    // turns as "type@offsetSec" tokens, target = turn t), offsets
    // session-relative so identical dialogues unroll identically. Same
    // single user-keyed exchange as q163's assembly.
    "q183_sft_pairs" -> ((s, dir) =>
      EventStreams.unrollDialogues(events(s, dir), SessionGapSec, SftMaxContext)
        .orderBy(col("user_id"), col("session_start"), col("turn_no"))),

    // EXT-S11: weekly cohort retention — users grouped by first-seen
    // epoch-week, distinct-user counts at each week offset since the
    // cohort. Week arithmetic is floor-division on epoch seconds, so it
    // is timezone-free and engine-identical. Two aggregates over the
    // same user_id partitioning + one broadcast-size join (cohort table
    // = one row per user).
    "q87_cohort_retention" -> ((s, dir) => {
      val wk = expr("CAST(ts AS LONG) DIV 604800")
      val weeks = events(s, dir).select(col("user_id"), wk.as("wk")).distinct()
      val cohorts = weeks.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
      weeks.join(cohorts, Seq("user_id"))
        .groupBy(col("cohort"), (col("wk") - col("cohort")).as("offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort"), col("offset"))
    }),

    // EXT-S12: session conversion rate — sessions (q33's gap definition)
    // containing a view, and among those the ones with a click at or
    // after the first view; one summary row. The same single user_id
    // shuffle serves the session numbering and the per-session
    // aggregate; the rate is one division of exact counts.
    "q93_funnel_rate" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val prev = lag(col("ts"), 1).over(w)
      val isNew = when(prev.isNull ||
        col("ts").cast("long") - prev.cast("long") > SessionGapSec, 1L).otherwise(0L)
      events(s, dir)
        .withColumn("sess", sum(isNew).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess"))
        .agg(min(when(col("event_type") === "view", col("ts"))).as("fv"),
          max(when(col("event_type") === "click", col("ts"))).as("lc"))
        .agg(count(lit(1)).as("n_sessions"),
          count(col("fv")).as("n_view_sessions"),
          count(when(col("lc") >= col("fv"), 1)).as("n_converted"))
        .select(col("n_sessions"), col("n_view_sessions"), col("n_converted"),
          round(col("n_converted").cast("double") /
            col("n_view_sessions"), 6).as("conv_rate"))
    }),

    // EXT-S10: event debouncing — keep the leading edge of each
    // (user, event_type) burst (gap > 5 min), the double-fire/retry
    // guard; one key shuffle + partition sort.
    "q85_debounce" -> ((s, dir) =>
      EventStreams.debounce(events(s, dir), Seq("user_id", "event_type"), 300L)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .orderBy(col("event_id"))),

    // EXT-S8: as-of join — each click attributed to the most recent view
    // at-or-before it per user (point-in-time lookup). Union-merge shape:
    // one shuffle on user_id, one partition sort, no range probe.
    "q64_asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
      EventStreams.asOfJoin(
          ev.where(col("event_type") === "click"),
          ev.where(col("event_type") === "view"))
        .select(col("user_id"), col("left_event_id"), col("left_ts"),
          col("asof_event_id"), col("asof_ts"),
          round(col("asof_value"), 6).as("asof_value"),
          (unix_micros(col("left_ts")) - unix_micros(col("asof_ts"))).as("lag_us"))
        .orderBy(col("user_id"), col("left_event_id"))
    }),

    // EXT-S21: as-of join with a STALENESS bound — production
    // feature-store semantics over q64's exact machinery: a carried
    // "last view" older than AsofStaleSec behind the click NULLs out
    // (a three-week-old last-known value is a leak of absence, not a
    // feature). Same single key shuffle; the bound is a projection.
    "q176_asof_within" -> ((s, dir) => {
      val ev = events(s, dir)
      EventStreams.asOfJoinWithin(
          ev.where(col("event_type") === "click"),
          ev.where(col("event_type") === "view"), AsofStaleSec)
        .select(col("user_id"), col("left_event_id"), col("left_ts"),
          col("asof_event_id"), col("asof_ts"),
          round(col("asof_value"), 6).as("asof_value"))
        .orderBy(col("user_id"), col("left_event_id"))
    }),

    // EXT-S5: view→click funnel via the unified interval join — the batch
    // face of the stream-stream join (streaming face spec-verified on the
    // same transform).
    "q44_event_funnel" -> ((s, dir) => {
      val ev = events(s, dir)
      EventStreams.joinWithin(
          ev.where(col("event_type") === "view"),
          ev.where(col("event_type") === "click"), FunnelWithinSec)
        .orderBy(col("user_id"), col("left_event_id"), col("right_event_id"))
    }),

    // EXT-S14: daily resample + forward fill — regularize the irregular
    // event stream onto the global daily grid per user, carrying each
    // day's closing value across gap days. One (user, day) reduction +
    // a broadcast grid + one running-last window per user.
    "q111_resample_ffill" -> ((s, dir) =>
      EventStreams.resampleDailyFfill(events(s, dir))
        .select(col("user_id"), col("day"), col("n_events"),
          round(col("v_close"), 6).as("v_close"))
        .orderBy(col("user_id"), col("day"))),

    // EXT-C21: CDC apply — collapse the event log to latest-wins state
    // per user, honoring delete markers ('error' events are the
    // deterministic tombstone of this fixture). One key shuffle.
    "q113_cdc_snapshot" -> ((s, dir) =>
      graft.operators.ChangeData.latestSnapshot(
          events(s, dir), col("event_type") === "error")
        .select(col("user_id"), col("ts"), round(col("value"), 6).as("value"))
        .orderBy(col("user_id"))),

    // EXT-C22: SCD type-2 history — interval-versioned rows per change
    // (valid_from/valid_to/is_current); tombstones close the prior row
    // and leave no current row, consistent with q113's snapshot.
    "q114_scd2_history" -> ((s, dir) =>
      graft.operators.ChangeData.scd2History(
          events(s, dir), col("event_type") === "error")
        .select(col("user_id"), round(col("value"), 6).as("value"),
          col("valid_from"), col("valid_to"), col("is_current"))
        .orderBy(col("user_id"), col("valid_from"), col("value"))),

    // EXT-S25: retention cohort matrix — the standard product-analytics
    // rollup: users cohorted by first-seen day, later activity per
    // (cohort, day-offset) with cohort-size-normalized retention. The
    // first-seen aggregate and the distinct activity table share the
    // user key (one exchange serves both); the matrix is cohorts ×
    // offsets rows and cohort sizes broadcast onto it.
    "q206_retention" -> ((s, dir) =>
      EventStreams.retentionCohorts(events(s, dir))
        .select(date_format(col("cohort_date"), "yyyy-MM-dd").as("cohort"),
          col("day_offset"), col("n_active"), col("n_cohort"), col("retention"))
        .orderBy(col("cohort"), col("day_offset"))),

    // EXT-X13: robust daily-volume anomaly flags (Hampel/MAD) — the
    // ops-monitoring face of the drift tier: PSI compares two snapshots,
    // this watches one series for outlier points with a fence that
    // survives the very outliers it hunts (a mean/σ fence does not).
    // The corpus-sized work is the daily rollup; the percentile windows
    // run over bounded (type × day) series rows.
    "q207_event_anomalies" -> ((s, dir) => {
      val series = events(s, dir).groupBy(col("event_type"),
          date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"))
      graft.operators.Drift.madOutliers(series, "event_type", "n", MadK)
        .orderBy(col("event_type"), col("day"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q113_cdc_snapshot" ->
      """WITH ranked AS (
        |  SELECT user_id, ts, value, event_type = 'error' AS del,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, ts, ROUND(value, 6) AS value
        |FROM ranked WHERE rn = 1 AND NOT del
        |ORDER BY user_id""".stripMargin,

    "q114_scd2_history" ->
      """WITH h AS (
        |  SELECT user_id, ts, value, event_type = 'error' AS del,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM events)
        |SELECT user_id, ROUND(value, 6) AS value, ts AS valid_from, valid_to,
        |       valid_to IS NULL AS is_current
        |FROM h WHERE NOT del
        |ORDER BY user_id, valid_from, value""".stripMargin,

    "q111_resample_ffill" ->
      """WITH ranked AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, value,
        |    row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |daily AS (
        |  SELECT user_id, day, CAST(count(*) AS BIGINT) AS n_events,
        |    max(CASE WHEN rn = 1 THEN value END) AS v_day
        |  FROM ranked GROUP BY 1, 2),
        |span AS (SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
        |         FROM events),
        |days AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        |         FROM span),
        |grid AS (SELECT user_id, day
        |         FROM (SELECT DISTINCT user_id FROM events) CROSS JOIN days)
        |SELECT user_id, day, COALESCE(n_events, 0) AS n_events,
        |  ROUND(last_value(v_day IGNORE NULLS)
        |          OVER (PARTITION BY user_id ORDER BY day
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |        6) AS v_close
        |FROM grid LEFT JOIN daily USING (user_id, day)
        |ORDER BY user_id, day""".stripMargin,

    "q93_funnel_rate" ->
      s"""WITH flagged AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT
         |              > $SessionGapSec
         |         THEN 1 ELSE 0 END AS is_new
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |numbered AS (
         |  SELECT user_id, ts, event_type,
         |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                      ROWS UNBOUNDED PRECEDING) AS sess
         |  FROM flagged),
         |ps AS (SELECT user_id, sess,
         |         MIN(CASE WHEN event_type = 'view' THEN ts END) AS fv,
         |         MAX(CASE WHEN event_type = 'click' THEN ts END) AS lc
         |       FROM numbered GROUP BY 1, 2)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
         |  CAST(COUNT(fv) AS BIGINT) AS n_view_sessions,
         |  CAST(SUM(CASE WHEN lc >= fv THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
         |  ROUND(SUM(CASE WHEN lc >= fv THEN 1 ELSE 0 END)::DOUBLE
         |        / COUNT(fv)::DOUBLE, 6) AS conv_rate
         |FROM ps""".stripMargin,

    "q87_cohort_retention" ->
      """WITH weeks AS (SELECT DISTINCT user_id,
        |                 floor(epoch(ts))::BIGINT // 604800 AS wk FROM events),
        |cohorts AS (SELECT user_id, MIN(wk) AS cohort FROM weeks GROUP BY 1)
        |SELECT c.cohort, w.wk - c.cohort AS offset,
        |       CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS n_users
        |FROM weeks w JOIN cohorts c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q85_debounce" ->
      """WITH d AS (SELECT event_id, user_id, event_type, ts,
        |  lag(ts) OVER (PARTITION BY user_id, event_type
        |                ORDER BY ts, event_id) AS prev
        |  FROM events)
        |SELECT event_id, user_id, event_type FROM d
        |WHERE prev IS NULL
        |   OR floor(epoch(ts))::BIGINT - floor(epoch(prev))::BIGINT > 300
        |ORDER BY event_id""".stripMargin,

    "q31_tumbling_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 6) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q32_sliding_window" ->
      """WITH hops AS (
        |  SELECT event_type, value, ws FROM events,
        |    unnest([time_bucket(INTERVAL '30 minutes', ts),
        |            time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
        |    AS t(ws))
        |SELECT ws, event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       ROUND(SUM(value), 6) AS sum_value
        |FROM hops GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q33_sessions" ->
      s"""WITH flagged AS (
         |  SELECT user_id, ts, event_id, value,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT
         |              > $SessionGapSec
         |         THEN 1 ELSE 0 END AS is_new
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |numbered AS (
         |  SELECT user_id, ts, value,
         |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                      ROWS UNBOUNDED PRECEDING) AS sess
         |  FROM flagged)
         |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
         |       CAST(COUNT(*) AS BIGINT) AS n_events, ROUND(SUM(value), 6) AS sum_value
         |FROM numbered GROUP BY user_id, sess
         |ORDER BY user_id, session_start""".stripMargin,

    // Conversation replay: q33's session CTEs, then per-session turn
    // ranks + offsets and an ordered FILTERed string_agg transcript.
    // Unrolling replay: q163's session/turn CTEs + a bounded trailing
    // window string_agg as the context, turns t ≥ 2 only.
    "q183_sft_pairs" ->
      s"""WITH flagged AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT
         |              > $SessionGapSec
         |         THEN 1 ELSE 0 END AS is_new
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |numbered AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                      ROWS UNBOUNDED PRECEDING) AS sess
         |  FROM flagged),
         |turns AS (
         |  SELECT user_id, sess, ts, event_id,
         |    ROW_NUMBER() OVER ws AS turn_no,
         |    FIRST_VALUE(ts) OVER ws AS session_start,
         |    event_type || '@' ||
         |      (floor(epoch(ts))::BIGINT
         |        - floor(epoch(FIRST_VALUE(ts) OVER ws))::BIGINT) AS tok
         |  FROM numbered WINDOW ws AS (PARTITION BY user_id, sess
         |                              ORDER BY ts, event_id)),
         |ctx AS (
         |  SELECT user_id, session_start, turn_no, tok,
         |    string_agg(tok, ' ') OVER (
         |      PARTITION BY user_id, sess ORDER BY turn_no
         |      ROWS BETWEEN $SftMaxContext PRECEDING AND 1 PRECEDING) AS context
         |  FROM turns)
         |SELECT user_id, session_start, turn_no, context, tok AS target
         |FROM ctx WHERE turn_no >= 2
         |ORDER BY user_id, session_start, turn_no""".stripMargin,

    "q163_conversations" ->
      s"""WITH flagged AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT
         |              > $SessionGapSec
         |         THEN 1 ELSE 0 END AS is_new
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |numbered AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                      ROWS UNBOUNDED PRECEDING) AS sess
         |  FROM flagged),
         |turns AS (
         |  SELECT user_id, sess, ts, event_type,
         |    ROW_NUMBER() OVER ws AS turn_no,
         |    floor(epoch(ts))::BIGINT
         |      - floor(epoch(FIRST_VALUE(ts) OVER ws))::BIGINT AS off
         |  FROM numbered WINDOW ws AS (PARTITION BY user_id, sess
         |                              ORDER BY ts, event_id))
         |SELECT user_id, MIN(ts) AS session_start,
         |  CAST(COUNT(*) AS BIGINT) AS n_turns,
         |  CAST(COUNT(*) FILTER (WHERE turn_no <= $ConvMaxTurns) AS BIGINT) AS n_kept,
         |  string_agg(event_type || '@' || off, ' ' ORDER BY turn_no)
         |    FILTER (WHERE turn_no <= $ConvMaxTurns) AS transcript
         |FROM turns GROUP BY user_id, sess
         |ORDER BY user_id, session_start""".stripMargin,

    "q64_asof_join" ->
      """WITH u AS (
        |  SELECT user_id, ts, 0 AS side, event_id, value AS v
        |  FROM events WHERE event_type = 'view'
        |  UNION ALL
        |  SELECT user_id, ts, 1 AS side, event_id, NULL AS v
        |  FROM events WHERE event_type = 'click'),
        |w AS (SELECT user_id, side, event_id AS left_event_id, ts AS left_ts,
        |  last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
        |    OVER win AS asof_event_id,
        |  last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
        |    OVER win AS asof_ts,
        |  last_value(CASE WHEN side = 0 THEN v END IGNORE NULLS)
        |    OVER win AS asof_value
        |  FROM u WINDOW win AS (PARTITION BY user_id ORDER BY ts, side, event_id
        |                        ROWS UNBOUNDED PRECEDING))
        |SELECT user_id, left_event_id, left_ts, asof_event_id, asof_ts,
        |  ROUND(asof_value, 6) AS asof_value,
        |  epoch_us(left_ts) - epoch_us(asof_ts) AS lag_us
        |FROM w WHERE side = 1 ORDER BY user_id, left_event_id""".stripMargin,

    // Staleness-bounded as-of replay: q64's union-merge window, then the
    // floor-second freshness gate NULLing all three as-of columns.
    "q176_asof_within" ->
      s"""WITH u AS (
        |  SELECT user_id, ts, 0 AS side, event_id, value AS v
        |  FROM events WHERE event_type = 'view'
        |  UNION ALL
        |  SELECT user_id, ts, 1 AS side, event_id, NULL AS v
        |  FROM events WHERE event_type = 'click'),
        |w AS (SELECT user_id, side, event_id AS left_event_id, ts AS left_ts,
        |  last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
        |    OVER win AS asof_event_id,
        |  last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
        |    OVER win AS asof_ts,
        |  last_value(CASE WHEN side = 0 THEN v END IGNORE NULLS)
        |    OVER win AS asof_value
        |  FROM u WINDOW win AS (PARTITION BY user_id ORDER BY ts, side, event_id
        |                        ROWS UNBOUNDED PRECEDING)),
        |f AS (SELECT *, asof_ts IS NOT NULL AND
        |        floor(epoch(left_ts))::BIGINT - floor(epoch(asof_ts))::BIGINT
        |          <= $AsofStaleSec AS fresh
        |      FROM w WHERE side = 1)
        |SELECT user_id, left_event_id, left_ts,
        |  CASE WHEN fresh THEN asof_event_id END AS asof_event_id,
        |  CASE WHEN fresh THEN asof_ts END AS asof_ts,
        |  ROUND(CASE WHEN fresh THEN asof_value END, 6) AS asof_value
        |FROM f ORDER BY user_id, left_event_id""".stripMargin,

    "q44_event_funnel" ->
      s"""SELECT v.user_id, v.event_id AS left_event_id, v.ts AS left_ts,
         |       c.event_id AS right_event_id, c.ts AS right_ts
         |FROM events v JOIN events c ON v.user_id = c.user_id
         |WHERE v.event_type = 'view' AND c.event_type = 'click'
         |  AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL '$FunnelWithinSec seconds'
         |ORDER BY 1, 2, 4""".stripMargin,

    "q206_retention" ->
      """WITH acts AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day
        |              FROM events),
        |fs AS (SELECT u, MIN(day) AS cohort_date FROM acts GROUP BY 1),
        |mx AS (SELECT cohort_date,
        |         date_diff('day', cohort_date, day)::BIGINT AS day_offset,
        |         COUNT(DISTINCT u)::BIGINT AS n_active
        |       FROM acts JOIN fs USING (u) GROUP BY 1, 2),
        |sz AS (SELECT cohort_date, COUNT(DISTINCT u)::BIGINT AS n_cohort
        |       FROM fs GROUP BY 1)
        |SELECT strftime(mx.cohort_date, '%Y-%m-%d') AS cohort,
        |  day_offset, n_active, n_cohort,
        |  ROUND(n_active::DOUBLE / n_cohort::DOUBLE, 6) AS retention
        |FROM mx JOIN sz USING (cohort_date)
        |ORDER BY cohort, day_offset""".stripMargin,

    // MAD replay: per-type median of daily counts, median absolute
    // deviation, Hampel fence on the UNROUNDED med/mad (rounding is
    // presentation only — the flag must not move with it).
    "q207_event_anomalies" ->
      s"""WITH s AS (SELECT event_type,
         |             strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         |             count(*)::BIGINT AS n
         |           FROM events GROUP BY 1, 2),
         |m AS (SELECT event_type, quantile_cont(n::DOUBLE, 0.5) AS med
         |      FROM s GROUP BY 1),
         |d AS (SELECT s.event_type, day, n, med,
         |        ABS(n::DOUBLE - med) AS dev
         |      FROM s JOIN m USING (event_type)),
         |md AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
         |       FROM d GROUP BY 1)
         |SELECT d.event_type, day, n, ROUND(med, 6) AS med,
         |  ROUND(mad, 6) AS mad,
         |  CASE WHEN mad = 0 THEN dev > 0 ELSE dev > $MadK * mad END AS flagged
         |FROM d JOIN md USING (event_type)
         |ORDER BY event_type, day""".stripMargin
  )
}
