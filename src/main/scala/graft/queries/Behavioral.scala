package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fns._

/** Behavioral / product analytics over the event stream: ordered
  * funnels, state transitions, cohort retention, time-weighted
  * averages — the query shapes a reference user runs daily on event
  * data (the reference's validation notebooks do the same
  * first-event anchoring and period bucketing on revisions, e.g.
  * 04-quarterly-update.Rmd's vintage comparisons).
  *
  * Scale notes (why these hold at 100 TB):
  *   - every query here is ONE hash shuffle on `user_id` (or one on
  *     the grouping key); consecutive window specs share the same
  *     partitioning, so Catalyst plans a single exchange with stacked
  *     Window operators — no per-stage re-shuffle;
  *   - funnels use conditional window minima, not self-joins: a
  *     3-stage funnel over 100 TB is 3 Window ops on one exchange,
  *     not 3 joins;
  *   - retention counts distinct (user, week) pairs AFTER collapsing
  *     events map-side — the heavy stream never reaches the distinct;
  *   - time-weighted sums accumulate as exact integer cents × µs
  *     (BIGINT→DOUBLE is one correctly-rounded conversion everywhere;
  *     a wide DECIMAL would cost DuckDB a second rounding), so results
  *     are order-insensitive and match the oracle bit-for-bit; the
  *     double divisions happen once, last, in a fixed order.
  */
object Behavioral {
  type Q = (SparkSession, String) => DataFrame

  private def byUser = Window.partitionBy(col("user_id"))
  private def userOrder =
    Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))

  val queries: Map[String, Q] = Map(
    "events_funnel" -> ((s, d) => {
      // Ordered 3-stage funnel signup → click → purchase: each stage's
      // anchor is the earliest qualifying event within 48 h AFTER the
      // previous stage's anchor. Conditional minima over the same user
      // partition — one shuffle, three stacked Window ops, no
      // self-joins (each stage of a join-based funnel would re-shuffle
      // the full stream).
      //
      // The 48 h window is LOAD-BEARING for the gate, not decoration:
      // unwindowed, the synthetic stream saturates — every user
      // completed every stage at sf0.01 (150/150/150/150) and
      // 15000/15000/15000/14999 at sf1, so the row verified four
      // equal constants and an r17 mutation kill-test (stage-2 type
      // click→view) PASSED the oracle gate. The signup→click gap is
      // median ~29 h / p90 ~91 h on this stream, so 48 h puts the
      // cut inside the distribution and the funnel has real erosion
      // at every SF (tools/adjudications/r17_mutations.json).
      val winUs = 48L * 3600 * 1000000
      val ev = Tables.events(s, d)
      val staged = ev
        .withColumn("t1",
          min(when(col("event_type") === "signup", col("ts"))).over(byUser))
        .withColumn("t2",
          min(when(col("event_type") === "click" && col("ts") > col("t1") &&
            unix_micros(col("ts")) - unix_micros(col("t1")) <= winUs,
            col("ts"))).over(byUser))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" && col("ts") > col("t2") &&
            unix_micros(col("ts")) - unix_micros(col("t2")) <= winUs,
            col("ts"))).over(byUser))
      staged
        .groupBy(col("user_id"))
        .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"),
             max(col("t3")).as("t3"))
        .agg(count(lit(1)).as("n_users"),
             count(col("t1")).as("n_signup"),
             count(col("t2")).as("n_click_after_signup"),
             count(col("t3")).as("n_purchase_after_click"))
    }),
    "events_transition_counts" -> ((s, d) => {
      // Markov transition census: (previous event type → event type)
      // counts plus the exact total dwell time between them. lag()
      // over the user timeline — one shuffle on user_id, then a tiny
      // 25-row aggregate.
      val ev = Tables.events(s, d)
      ev.withColumn("prev_type", lag(col("event_type"), 1).over(userOrder))
        .withColumn("gap_us",
          unix_micros(col("ts")) -
            unix_micros(lag(col("ts"), 1).over(userOrder)))
        .where(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("cnt"), sum(col("gap_us")).as("sum_gap_us"))
        .orderBy("prev_type", "next_type")
    }),
    "events_time_weighted_avg" -> ((s, d) => {
      // Time-weighted average value per user: each event's value is
      // held until the next event (lead); the last event carries no
      // weight. The weighted sum accumulates as EXACT integer
      // cents × µs (order-insensitive, and BIGINT→DOUBLE is a single
      // correctly-rounded conversion in every engine — a DECIMAL(38,2)
      // here would take two roundings on the DuckDB side); the two
      // double divisions happen once, at the end, in a fixed order.
      val ev = Tables.events(s, d)
      ev.withColumn("dur_us",
          unix_micros(lead(col("ts"), 1).over(userOrder)) -
            unix_micros(col("ts")))
        .where(col("dur_us").isNotNull)
        .groupBy(col("user_id"))
        .agg(sum(col("dur_us")).as("total_dur_us"),
             sum(round(col("value") * 100).cast("long") * col("dur_us"))
               .as("wsum_cents"))
        .select(col("user_id"), col("total_dur_us"),
                (dbl(col("wsum_cents")) / dbl(col("total_dur_us")) /
                  lit(100.0)).as("time_weighted_value"))
        .orderBy("user_id")
    }),
    "cohort_retention_weeks" -> ((s, d) => {
      // Cohort retention: users grouped by first-event week; for each
      // cohort, how many distinct users were active k weeks later.
      // The (user, week) grid collapses map-side before the distinct —
      // the raw stream never reaches the count-distinct shuffle.
      val ev = Tables.events(s, d)
      ev.withColumn("cohort_week",
          date_trunc("week", min(col("ts")).over(byUser)).cast("date"))
        .withColumn("week", date_trunc("week", col("ts")).cast("date"))
        .select(col("user_id"), col("cohort_week"), col("week"))
        .distinct()
        .withColumn("week_index",
          (datediff(col("week"), col("cohort_week")) / lit(7)).cast("int"))
        .groupBy(col("cohort_week"), col("week_index"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "week_index")
    }),
    "conversion_by_channel" -> ((s, d) => {
      // B8: conversion rate by acquisition channel — users grouped by
      // their FIRST event type (the acquisition touch), conversion =
      // first purchase within 48 HOURS of the first touch. One user
      // exchange derives both facts (first event via a min-struct
      // aggregate — no window needed — and the first purchase ts via a
      // conditional min) in a single pass; the per-channel rollup is
      // channel-count-sized. Rate fixed-point e6 from exact counts.
      //
      // The 48 h window is load-bearing for the GATE, not just the
      // metric (r18 saturation audit): unwindowed "ever purchased"
      // saturates on this stream — ~67 events/user over 30 days puts
      // P(no purchase) ≈ (4/5)^67 ≈ 3e-7 at EVERY SF, so conv_fp_e6
      // verified the constant 1000000 five times and a mutation of
      // the conversion predicate passed trivially (the events_funnel
      // class, r17). The median first-touch→first-purchase gap is
      // ~2 days, so the 48 h cut sits inside the distribution and the
      // rate has real per-channel erosion at both gate SFs.
      val perUser = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          min(struct(col("ts"), col("event_id"), col("event_type")))
            .as("first_ev"),
          min(when(col("event_type") === "purchase", col("ts")))
            .as("first_purchase_ts"))
        .select(col("first_ev.event_type").as("channel"),
          when(col("first_purchase_ts").isNotNull &&
            col("first_purchase_ts") <=
              col("first_ev.ts") + expr("INTERVAL 48 HOURS"), 1L)
            .otherwise(0L).as("converted"))
      perUser.groupBy(col("channel"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("converted")).as("n_converted"))
        .select(col("channel"), col("n_users"), col("n_converted"),
          round(lit(1000000.0) * col("n_converted").cast("double")
            / col("n_users").cast("double"), 0).cast("long")
            .as("conv_fp_e6"))
        .orderBy("channel")
    }),
    "engagement_stickiness" -> ((s, d) => {
      // B9: DAU/MAU stickiness per calendar month — mean daily active
      // users over monthly active users, the habit-formation metric.
      // Both cardinalities are exact distinct counts on the (day,
      // user) grid, which collapses map-side before any distinct
      // shuffle; the ratio is one shaped division fixed-pointed e6
      // (avg DAU = Σ per-day DAU / days-in-month-with-traffic).
      val g = Tables.events(s, d)
        .select(date_trunc("month", col("ts")).cast("date").as("month"),
          col("ts").cast("date").as("day"), col("user_id"))
        .distinct()
        .localCheckpoint() // feeds the DAU and MAU aggregates
      val dau = g.groupBy(col("month"), col("day"))
        .agg(countDistinct(col("user_id")).as("dau"))
        .groupBy(col("month"))
        .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("sum_dau"))
      val mau = g.groupBy(col("month"))
        .agg(countDistinct(col("user_id")).as("mau"))
      dau.join(mau, "month")
        .select(col("month"), col("n_days"), col("sum_dau"), col("mau"),
          round(lit(1000000.0) * col("sum_dau").cast("double")
            / (col("n_days") * col("mau")).cast("double"), 0).cast("long")
            .as("stickiness_fp_e6"))
        .orderBy("month")
    }),
    "events_bounce_rate" -> ((s, d) => {
      // B7: daily bounce rate — share of sessions (30-minute-gap
      // islands, the events_sessionize semantics) containing exactly
      // one event, keyed by the day the session STARTED. One user
      // exchange builds sessions (lag + running island id over the
      // same sort), the session frame is session-count-sized, and
      // the rate is one shaped division fixed-pointed e6.
      val wU = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val sess = Tables.events(s, d)
        .withColumn("gap_s",
          unix_timestamp(col("ts"))
            - unix_timestamp(lag(col("ts"), 1).over(wU)))
        .withColumn("ns",
          when(col("gap_s").isNull || col("gap_s") > 1800L, 1L)
            .otherwise(0L))
        .withColumn("sid", sum(col("ns")).over(
          wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).as("n_events"), min(col("ts")).as("start_ts"))
      sess.groupBy(col("start_ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1L, 1L).otherwise(0L))
            .as("n_bounced"))
        .select(col("day"), col("n_sessions"), col("n_bounced"),
          round(lit(1000000.0) * col("n_bounced").cast("double")
            / col("n_sessions").cast("double"), 0).cast("long")
            .as("bounce_fp_e6"))
        .orderBy("day")
    }),
    "cohort_ltv_cumulative" -> ((s, d) => {
      // B6: cohort LTV matrix — cumulative purchase revenue per
      // first-event-week cohort at each week offset, the
      // payback-period readout next to cohort_retention_weeks' user
      // counts. Weekly revenue collapses to the (cohort, week_index)
      // grid first (exact cents), then ONE ordered window turns the
      // grid into running LTV — the running sum is over the tiny
      // cohort×week grid, never the raw stream.
      val ev = Tables.events(s, d)
      val grid = ev.withColumn("cohort_week",
          date_trunc("week", min(col("ts")).over(byUser)).cast("date"))
        .withColumn("week_index",
          (datediff(date_trunc("week", col("ts")).cast("date"),
                    col("cohort_week")) / lit(7)).cast("int"))
        .groupBy(col("cohort_week"), col("week_index"))
        .agg(sum(when(col("event_type") === "purchase",
            round(col("value") * 100, 0).cast("long")).otherwise(0L))
          .as("rev_cents"))
      val wCum = Window.partitionBy(col("cohort_week"))
        .orderBy(col("week_index"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.withColumn("cum_rev_cents", sum(col("rev_cents")).over(wCum))
        .orderBy("cohort_week", "week_index")
    }),
    "events_session_window_fn" -> ((s, d) =>
      // Spark's NATIVE session_window() (vs the manual gaps-and-islands
      // of events_sessionize): events merge while the gap to the
      // previous event is <= gap (an EXACT-boundary gap still merges —
      // verified against Spark 4.1.2; the oracle's new-session test is
      // therefore strictly >); session end = last event + gap. Same
      // single shuffle on user_id; this form also runs under
      // Structured Streaming with watermark-evicted state.
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("cnt"), moneySum(col("value")).as("sum_value"))
        .select(col("user_id"),
                col("session_window.start").as("session_start"),
                col("session_window.end").as("session_end"),
                col("cnt"), col("sum_value"))
        .orderBy("user_id", "session_start")),
    "agg_multi_distinct" -> ((s, d) =>
      // A23: several COUNT(DISTINCT) over different columns in ONE
      // aggregate — Catalyst plans an Expand (one replica of each row
      // per distinct clause) + two-stage aggregation, not one job per
      // distinct. The daily-KPI shape: volume, reach, active days,
      // and an exact-operand conversion ratio in a single pass.
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
             countDistinct(col("user_id")).as("n_users"),
             countDistinct(to_date(col("ts"))).as("n_days"),
             moneySum(col("value")).as("sum_value"))
        .withColumn("events_per_user",
          dbl(col("n_events")) / dbl(col("n_users")))
        .orderBy("event_type")),
    "window_ignore_nulls" -> ((s, d) => {
      // Last-observation-carried-forward (LOCF): error events carry no
      // reading, so the last non-null value fills forward —
      // last(..., ignoreNulls) over a running frame, the sensor-data
      // densification primitive. One shuffle on user_id; no self-join
      // back to the last valid row.
      val ev = Tables.events(s, d)
      ev.withColumn("v",
          when(col("event_type") === "error", lit(null))
            .otherwise(col("value")))
        .withColumn("v_locf",
          last(col("v"), ignoreNulls = true)
            .over(userOrder.rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)))
        .select(col("user_id"), col("event_id"), col("v"), col("v_locf"))
        .orderBy("user_id", "event_id")
    }),
    "window_lead_lag_ignore_nulls" -> ((s, d) => {
      // lead/lag IGNORE NULLS: for every event, the nearest non-null
      // reading BEFORE and AFTER it (error events carry no reading) —
      // the gap-bridging primitive for sensor interpolation.
      // lag/lead(ignoreNulls = true) skip null rows inside the frame
      // scan; no self-join back to the nearest valid row, one shuffle
      // on user_id.
      val ev = Tables.events(s, d)
      ev.withColumn("v",
          when(col("event_type") === "error", lit(null))
            .otherwise(col("value")))
        .withColumn("prev_v", lag(col("v"), 1, null, ignoreNulls = true)
          .over(userOrder))
        .withColumn("next_v", lead(col("v"), 1, null, ignoreNulls = true)
          .over(userOrder))
        .select(col("user_id"), col("event_id"), col("v"),
          col("prev_v"), col("next_v"))
        .orderBy("user_id", "event_id")
    }),
    "window_rolling_median" -> ((s, d) => {
      // Rolling exact median over a trailing 5-row frame. Restricted
      // to full frames (rn >= 5) so the median is a pure element pick
      // of the sorted window — no interpolation arithmetic to drift
      // across engines. percentile() rides the window frame; no
      // self-join, one shuffle.
      val ev = Tables.events(s, d)
      ev.withColumn("rn", row_number().over(userOrder))
        .withColumn("med5",
          percentile(col("value"), lit(0.5))
            .over(userOrder.rowsBetween(-4, 0)))
        .where(col("rn") >= 5)
        .select(col("user_id"), col("event_id"), col("value"), col("med5"))
        .orderBy("user_id", "event_id")
    })
  )

  private val evSql =
    """ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
      |              event_type, value, props FROM events)""".stripMargin

  val oracles: Map[String, String] = Map(
    "events_funnel" ->
      s"""WITH $evSql,
         |x AS (SELECT user_id, ts, event_type,
         |        min(CASE WHEN event_type = 'signup' THEN ts END)
         |          OVER (PARTITION BY user_id) AS t1
         |      FROM ev),
         |y AS (SELECT *,
         |        min(CASE WHEN event_type = 'click' AND ts > t1
         |                  AND epoch_us(ts) - epoch_us(t1) <= 172800000000
         |             THEN ts END)
         |          OVER (PARTITION BY user_id) AS t2
         |      FROM x),
         |z AS (SELECT *,
         |        min(CASE WHEN event_type = 'purchase' AND ts > t2
         |                  AND epoch_us(ts) - epoch_us(t2) <= 172800000000
         |             THEN ts END)
         |          OVER (PARTITION BY user_id) AS t3
         |      FROM y),
         |u AS (SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
         |      FROM z GROUP BY 1)
         |SELECT count(*) AS n_users, count(t1) AS n_signup,
         |       count(t2) AS n_click_after_signup,
         |       count(t3) AS n_purchase_after_click
         |FROM u""".stripMargin,
    "events_transition_counts" ->
      s"""WITH $evSql,
         |x AS (SELECT event_type,
         |        lag(event_type) OVER
         |          (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
         |        epoch_us(ts) - epoch_us(lag(ts) OVER
         |          (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
         |      FROM ev)
         |SELECT prev_type, event_type AS next_type, count(*) AS cnt,
         |       CAST(sum(gap_us) AS BIGINT) AS sum_gap_us
         |FROM x WHERE prev_type IS NOT NULL
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_time_weighted_avg" ->
      s"""WITH $evSql,
         |x AS (SELECT user_id, value,
         |        epoch_us(lead(ts) OVER
         |          (PARTITION BY user_id ORDER BY ts, event_id))
         |          - epoch_us(ts) AS dur_us
         |      FROM ev),
         |g AS (SELECT user_id,
         |        CAST(sum(dur_us) AS BIGINT) AS total_dur_us,
         |        CAST(sum(CAST(round(value * 100) AS BIGINT) * dur_us)
         |          AS BIGINT) AS wsum_cents
         |      FROM x WHERE dur_us IS NOT NULL GROUP BY 1)
         |SELECT user_id, total_dur_us,
         |       CAST(wsum_cents AS DOUBLE) / CAST(total_dur_us AS DOUBLE)
         |         / 100.0 AS time_weighted_value
         |FROM g ORDER BY 1""".stripMargin,
    "conversion_by_channel" ->
      s"""WITH $evSql,
         |f AS (
         |  SELECT user_id, event_type, ts,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS rn
         |  FROM ev),
         |fp AS (
         |  SELECT user_id,
         |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS fpts
         |  FROM ev GROUP BY 1),
         |ch AS (SELECT user_id, event_type AS channel, ts AS first_ts
         |       FROM f WHERE rn = 1),
         |conv AS (
         |  SELECT ch.user_id, ch.channel,
         |    CASE WHEN fp.fpts IS NOT NULL
         |           AND fp.fpts <= ch.first_ts + INTERVAL 48 HOUR
         |         THEN 1 ELSE 0 END AS converted
         |  FROM ch JOIN fp USING (user_id))
         |SELECT channel, count(*) AS n_users,
         |  CAST(sum(converted) AS BIGINT) AS n_converted,
         |  CAST(round(1000000.0 * CAST(sum(converted) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS conv_fp_e6
         |FROM conv
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "engagement_stickiness" ->
      s"""WITH $evSql,
         |g AS (
         |  SELECT DISTINCT CAST(date_trunc('month', ts) AS DATE) AS month,
         |    CAST(ts AS DATE) AS day, user_id
         |  FROM ev),
         |dau AS (
         |  SELECT month, count(*) AS n_days,
         |    CAST(sum(dau) AS BIGINT) AS sum_dau
         |  FROM (SELECT month, day, count(DISTINCT user_id) AS dau
         |        FROM g GROUP BY 1, 2)
         |  GROUP BY 1),
         |mau AS (SELECT month, count(DISTINCT user_id) AS mau
         |        FROM g GROUP BY 1)
         |SELECT dau.month, n_days, sum_dau, mau,
         |  CAST(round(1000000.0 * CAST(sum_dau AS DOUBLE)
         |    / CAST(n_days * mau AS DOUBLE)) AS BIGINT)
         |    AS stickiness_fp_e6
         |FROM dau JOIN mau ON dau.month = mau.month
         |ORDER BY dau.month""".stripMargin,
    "events_bounce_rate" ->
      s"""WITH $evSql,
         |g AS (
         |  SELECT user_id, ts, event_id,
         |    CASE WHEN floor(epoch(ts)) - floor(epoch(lag(ts) OVER
         |        (PARTITION BY user_id ORDER BY ts, event_id))) > 1800
         |      OR lag(ts) OVER (PARTITION BY user_id
         |                       ORDER BY ts, event_id) IS NULL
         |    THEN 1 ELSE 0 END AS ns
         |  FROM ev),
         |s AS (
         |  SELECT user_id,
         |    sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                  ROWS UNBOUNDED PRECEDING) AS sid,
         |    ts
         |  FROM g),
         |sess AS (
         |  SELECT user_id, sid, count(*) AS n_events,
         |    min(ts) AS start_ts
         |  FROM s GROUP BY 1, 2)
         |SELECT CAST(start_ts AS DATE) AS day,
         |  count(*) AS n_sessions,
         |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_bounced,
         |  CAST(round(1000000.0 *
         |    CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS bounce_fp_e6
         |FROM sess GROUP BY 1 ORDER BY 1""".stripMargin,
    "cohort_ltv_cumulative" ->
      s"""WITH $evSql,
         |x AS (SELECT user_id, event_type, value,
         |        CAST(date_trunc('week', min(ts) OVER (PARTITION BY user_id))
         |          AS DATE) AS cohort_week,
         |        CAST(date_trunc('week', ts) AS DATE) AS week
         |      FROM ev),
         |g AS (SELECT cohort_week,
         |        CAST(date_diff('day', cohort_week, week) // 7 AS INT)
         |          AS week_index,
         |        CAST(sum(CASE WHEN event_type = 'purchase'
         |                 THEN CAST(round(value * 100) AS BIGINT)
         |                 ELSE 0 END) AS BIGINT) AS rev_cents
         |      FROM x GROUP BY 1, 2)
         |SELECT cohort_week, week_index, rev_cents,
         |  CAST(sum(rev_cents) OVER (PARTITION BY cohort_week
         |    ORDER BY week_index ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |    AS cum_rev_cents
         |FROM g ORDER BY 1, 2""".stripMargin,
    "cohort_retention_weeks" ->
      s"""WITH $evSql,
         |x AS (SELECT user_id,
         |        CAST(date_trunc('week', min(ts) OVER (PARTITION BY user_id))
         |          AS DATE) AS cohort_week,
         |        CAST(date_trunc('week', ts) AS DATE) AS week
         |      FROM ev),
         |g AS (SELECT DISTINCT user_id, cohort_week, week FROM x)
         |SELECT cohort_week,
         |       CAST(date_diff('day', cohort_week, week) // 7 AS INT)
         |         AS week_index,
         |       count(*) AS n_users
         |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_session_window_fn" ->
      s"""WITH $evSql,
         |x AS (SELECT *, CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
         |        (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
         |      THEN 1 ELSE 0 END AS ns
         |      FROM ev),
         |s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id
         |        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
         |      FROM x)
         |SELECT user_id, min(ts) AS session_start,
         |       max(ts) + INTERVAL 30 MINUTE AS session_end,
         |       count(*) AS cnt,
         |       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
         |FROM s GROUP BY user_id, sid ORDER BY 1, 2""".stripMargin,
    "agg_multi_distinct" ->
      s"""WITH $evSql
         |SELECT event_type, count(*) AS n_events,
         |  count(DISTINCT user_id) AS n_users,
         |  count(DISTINCT CAST(ts AS DATE)) AS n_days,
         |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
         |  CAST(count(*) AS DOUBLE) / CAST(count(DISTINCT user_id) AS DOUBLE)
         |    AS events_per_user
         |FROM ev GROUP BY 1 ORDER BY 1""".stripMargin,
    "window_ignore_nulls" ->
      s"""WITH $evSql,
         |x AS (SELECT user_id, event_id, ts,
         |        CASE WHEN event_type = 'error' THEN NULL
         |             ELSE value END AS v
         |      FROM ev)
         |SELECT user_id, event_id, v,
         |  last_value(v IGNORE NULLS) OVER
         |    (PARTITION BY user_id ORDER BY ts, event_id
         |     ROWS UNBOUNDED PRECEDING) AS v_locf
         |FROM x ORDER BY 1, 2""".stripMargin,
    "window_lead_lag_ignore_nulls" ->
      s"""WITH $evSql,
         |x AS (SELECT user_id, event_id, ts,
         |        CASE WHEN event_type = 'error' THEN NULL
         |             ELSE value END AS v
         |      FROM ev)
         |SELECT user_id, event_id, v,
         |  lag(v, 1 IGNORE NULLS) OVER
         |    (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v,
         |  lead(v, 1 IGNORE NULLS) OVER
         |    (PARTITION BY user_id ORDER BY ts, event_id) AS next_v
         |FROM x ORDER BY 1, 2""".stripMargin,
    "window_rolling_median" ->
      s"""WITH $evSql,
         |x AS (SELECT user_id, event_id, value,
         |        row_number() OVER
         |          (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         |        quantile_cont(value, 0.5) OVER
         |          (PARTITION BY user_id ORDER BY ts, event_id
         |           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med5
         |      FROM ev)
         |SELECT user_id, event_id, value, med5
         |FROM x WHERE rn >= 5 ORDER BY 1, 2""".stripMargin
  )
}
