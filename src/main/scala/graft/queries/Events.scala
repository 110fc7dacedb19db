package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fns._

/** Event-stream analytics in batch form over `events` (the streaming-
  * shaped surface: tumbling windows, sessionization, JSON props).
  * The same transforms run under Structured Streaming (see
  * graft.streaming); batch keeps them oracle-checkable.
  *
  * `events.ts` is TIMESTAMP(NANOS) parquet: Spark reads it via
  * Tables.events (ns -> us truncation), DuckDB oracles CAST to
  * microsecond TIMESTAMP so both engines agree.
  */
object Events {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "events_tumbling_window" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), moneySum(col("value")).as("sum_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
                col("cnt"), col("sum_value"))
        .orderBy("window_start", "event_type")),
    "events_tumbling_stream" -> ((s, d) => {
      // The STREAMING tumbling aggregate driven through a real file
      // source and parquet sink (EventStreams.tumblingCountsViaDisk),
      // read back and compared to the batch DuckDB oracle — closing
      // the gap where streaming ≡ batch was pinned only over
      // MemoryStream. Both sides keep only windows whose end is one
      // FULL window below the 2h watermark (end <= max_ts - 3h): every
      // such window is provably emitted under either eviction-boundary
      // convention (end <= wm or end < wm), so the compare never rides
      // on an engine-internal boundary choice.
      val sink = graft.streaming.EventStreams.tumblingCountsViaDisk(s, d)
      val maxTs = Tables.events(s, d)
        .agg(max(unix_micros(col("ts")))).head().getLong(0)
      val cutoff = maxTs - 4L * 3600L * 1000000L // start+1h <= max-3h
      sink.where(unix_micros(col("window_start")) <= cutoff)
        .select(col("window_start"), col("event_type"), col("cnt"),
          dbl(col("sum_value")).as("sum_value"))
        .orderBy("window_start", "event_type")
    }),
    "events_session_stream" -> ((s, d) => {
      // The STREAMING session-window aggregate driven through a real
      // file source and parquet sink (EventStreams.
      // sessionWindowsViaDisk) — the second stateful mode with a
      // disk-level oracle: session-MERGE state + watermark eviction
      // end-to-end, not just keyed window counting. Both sides keep
      // only sessions whose END is one full gap below the 2h
      // watermark (end <= max_ts - 2h - 30min): every such session is
      // provably emitted under either eviction-boundary convention,
      // and no event arriving later could have merged into it.
      val sink = graft.streaming.EventStreams.sessionWindowsViaDisk(s, d)
      val maxTs = Tables.events(s, d)
        .agg(max(unix_micros(col("ts")))).head().getLong(0)
      val cutoff = maxTs - 2L * 3600L * 1000000L - 1800L * 1000000L
      sink.where(unix_micros(col("session_end")) <= cutoff)
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("cnt"), dbl(col("sum_value")).as("sum_value"))
        .orderBy("user_id", "session_start")
    }),
    "events_interval_stream" -> ((s, d) => {
      // The stream-stream interval JOIN driven through the disk-level
      // harness (EventStreams.intervalJoinViaDisk) — the third
      // stateful mode with an on-disk oracle, and the first two-input
      // one: click and purchase legs are filters of the same staged
      // file source. Inner matches emit eagerly and the watermark
      // only advances after the single AvailableNow batch, so the
      // sink equals the batch join exactly — no horizon filter.
      graft.streaming.EventStreams.intervalJoinViaDisk(s, d)
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          col("click_ts"), col("purchase_ts"))
        .orderBy("user_id", "click_id", "purchase_id")
    }),
    "events_interval_left_stream" -> ((s, d) => {
      // LEFT OUTER stream-stream interval join through the disk-level
      // harness (EventStreams.intervalJoinLeftOuterViaDisk) — the
      // watermark-proven null-emission case: a click's null row exists
      // in the sink only once the final watermark passes
      // click_ts + 5min. Horizon filter, derived like the session
      // mode's: final global wm = least(max click_ts, max purchase_ts)
      // − 1h (min over the two legs' per-input watermarks); a click at
      // wm − 5min is the emission boundary, so both sides keep null
      // rows only for clicks a further full maxDelay + 1min below it
      // (click_ts <= wm − 11min) — provably emitted under any
      // eviction-boundary convention (strict/non-strict, ±ms
      // state-watermark adjustments). Matched rows emit eagerly like
      // the inner mode and carry no horizon clause.
      val sink = graft.streaming.EventStreams
        .intervalJoinLeftOuterViaDisk(s, d)
      val ev = Tables.events(s, d)
      val maxClick = ev.where(col("event_type") === "click")
        .agg(max(unix_micros(col("ts")))).head().getLong(0)
      val maxPurchase = ev.where(col("event_type") === "purchase")
        .agg(max(unix_micros(col("ts")))).head().getLong(0)
      val cutoff = math.min(maxClick, maxPurchase) -
        3600L * 1000000L - 660L * 1000000L // wm − (10min + 1min) slack
      sink.where(col("purchase_id").isNotNull ||
          unix_micros(col("click_ts")) <= cutoff)
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          col("click_ts"), col("purchase_ts"))
        .orderBy("user_id", "click_id", "purchase_id")
    }),
    "events_interval_full_stream" -> ((s, d) => {
      // FULL OUTER stream-stream interval join through the disk-level
      // harness — null rows on BOTH sides, each under its own derived
      // horizon: unmatched clicks emit once wm > click_ts + 5min,
      // unmatched purchases once wm > purchase_ts (candidate clicks
      // lie in [purchase_ts − 5min, purchase_ts]); both sides keep
      // null rows only 11min of slack below the final wm so the
      // compare is independent of any eviction-boundary convention.
      val sink = graft.streaming.EventStreams
        .intervalJoinFullOuterViaDisk(s, d)
      val ev = Tables.events(s, d)
      val maxClick = ev.where(col("event_type") === "click")
        .agg(max(unix_micros(col("ts")))).head().getLong(0)
      val maxPurchase = ev.where(col("event_type") === "purchase")
        .agg(max(unix_micros(col("ts")))).head().getLong(0)
      val cutoff = math.min(maxClick, maxPurchase) -
        3600L * 1000000L - 660L * 1000000L
      sink.where(
          (col("purchase_id").isNotNull && col("click_id").isNotNull) ||
          (col("purchase_id").isNull &&
            unix_micros(col("click_ts")) <= cutoff) ||
          (col("click_id").isNull &&
            unix_micros(col("purchase_ts")) <= cutoff))
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          col("click_ts"), col("purchase_ts"))
        .orderBy("user_id", "click_id", "purchase_id")
    }),
    "events_interval_semi_stream" -> ((s, d) =>
      // LEFT SEMI through the disk-level harness: matched clicks emit
      // eagerly on first match (at most once, no purchase columns, no
      // inner fanout) and unmatched clicks are dropped silently at
      // eviction — the sink equals the batch semi join exactly, no
      // horizon clause, same reasoning as the inner mode.
      graft.streaming.EventStreams.intervalJoinLeftSemiViaDisk(s, d)
        .select(col("user_id"), col("click_id"), col("click_ts"))
        .orderBy("user_id", "click_id")),
    "events_sessionize" -> ((s, d) => {
      // 30-min-gap sessionization via lag + running sum — the batch
      // analog of flatMapGroupsWithState session windows.
      val order = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val gap = unix_micros(col("ts")) -
        unix_micros(lag(col("ts"), 1).over(order))
      val newSession = when(gap > 1800L * 1000000L, 1).otherwise(0)
      Tables.events(s, d)
        .withColumn("session_id",
          sum(newSession).over(order.rowsBetween(Window.unboundedPreceding,
                                                 Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("cnt"),
             min(col("ts")).as("session_start"),
             max(col("ts")).as("session_end"),
             moneySum(col("value")).as("sum_value"))
        .orderBy("user_id", "session_id")
    }),
    "events_range_join" -> ((s, d) => {
      // banded interval join: (click, purchase) pairs of the same user
      // within 5 minutes — equi-join on tolerance-sized time bands, no
      // per-key cross product (graft.operators.RangeJoin).
      val ev = Tables.events(s, d)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      graft.operators.RangeJoin.bandJoin(clicks, purchases, "user_id",
          "ts", "ts", 5L * 60 * 1000000)
        .select(col("l_user_id").as("user_id"),
          col("l_event_id").as("click_id"),
          col("r_event_id").as("purchase_id"))
        .orderBy("user_id", "click_id", "purchase_id")
    }),
    "events_asof_join" -> ((s, d) => {
      // as-of join: each purchase joined to the user's latest prior
      // click (graft.operators.AsofJoin; DuckDB's native ASOF JOIN is
      // the oracle). (user_id, ts) is unique in the data, so the
      // carried row is deterministic.
      val ev = Tables.events(s, d)
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"),
          col("event_id").as("click_id"))
      graft.operators.AsofJoin.asofJoin(purchases, clicks, "user_id",
          "ts", "click_ts", Seq("click_id", "click_ts"))
        .orderBy("event_id")
    }),
    "events_top_type_per_hour" -> ((s, d) => {
      // windowed top-1: dominant event type per hour (grouped count +
      // rank with deterministic tiebreak).
      val hourly = Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("hour"))
        .orderBy(col("cnt").desc, col("event_type"))
      hourly.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("hour"), col("event_type"), col("cnt"))
        .orderBy("hour")
    }),
    "events_json_extract" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k_val"))
        .orderBy("event_id")),
    "events_sliding_window" -> ((s, d) =>
      // overlapping 10-min windows sliding by 5 min: every event lands
      // in exactly windowDuration/slide = 2 windows; Spark expands them
      // map-side (no self-join), one shuffle for the aggregate.
      Tables.events(s, d)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"), moneySum(col("value")).as("sum_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
                col("cnt"), col("sum_value"))
        .orderBy("window_start", "event_type")),
    "events_interval_overlap" -> ((s, d) => {
      // J14: interval overlap join (operators/IntervalJoin) — user
      // co-activity: pairs of users whose weekly active spans
      // [first event, last event] overlapped in time. Bucketized to
      // day-sized bands + canonical-bucket dedup — an equi-join whose
      // cost follows match density, not the O(n²) theta join the
      // oracle runs.
      val iv = Tables.events(s, d)
        .where(col("user_id") < 40)
        .groupBy(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("week"))
        .agg(min(unix_micros(col("ts"))).as("start_us"),
             max(unix_micros(col("ts"))).as("end_us"))
      graft.operators.IntervalJoin
        .overlapJoin(iv, iv, "start_us", "end_us", 86400L * 1000000L)
        .where(col("l_user_id") < col("r_user_id"))
        .select(col("l_user_id"), col("l_week"),
                col("r_user_id"), col("r_week"))
        .orderBy("l_user_id", "l_week", "r_user_id", "r_week")
    })
  )

  private val evSql =
    """ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
      |              event_type, value, props FROM events)""".stripMargin

  val oracles: Map[String, String] = Map(
    "events_tumbling_window" ->
      s"""WITH $evSql
         |SELECT date_trunc('hour', ts) AS window_start, event_type,
         |  count(*) AS cnt,
         |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
         |FROM ev GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_tumbling_stream" ->
      // batch mirror of the streaming disk path, restricted to the
      // same closed-window horizon (window end <= max_ts - 3h, i.e.
      // one full window below the 2h watermark)
      s"""WITH $evSql
         |SELECT date_trunc('hour', ts) AS window_start, event_type,
         |  count(*) AS cnt,
         |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
         |FROM ev
         |WHERE epoch_us(date_trunc('hour', ts)) <=
         |      (SELECT max(epoch_us(ts)) - 14400000000 FROM ev)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_interval_stream" ->
      // batch mirror of the streaming interval-join disk path: each
      // purchase pairs with the same user's clicks from the preceding
      // 5 minutes; inner matches are watermark-independent, so the
      // mirror is the plain time-bound join with no horizon clause
      s"""WITH $evSql,
         |c AS (SELECT user_id, ts AS click_ts, event_id AS click_id
         |      FROM ev WHERE event_type = 'click'),
         |p AS (SELECT user_id, ts AS purchase_ts, event_id AS purchase_id
         |      FROM ev WHERE event_type = 'purchase')
         |SELECT c.user_id, click_id, purchase_id, click_ts, purchase_ts
         |FROM c JOIN p ON c.user_id = p.user_id
         | AND purchase_ts >= click_ts
         | AND purchase_ts <= click_ts + INTERVAL 5 MINUTE
         |ORDER BY c.user_id, click_id, purchase_id""".stripMargin,
    "events_interval_left_stream" ->
      // batch mirror of the streaming LEFT OUTER interval-join disk
      // path: matched pairs carry no horizon clause (emitted eagerly);
      // null rows only for clicks below the same derived cutoff the
      // Spark side applies — final wm = least(max click, max purchase)
      // − 1h, null-emission boundary wm − 5min, kept only at
      // click_ts <= wm − 11min (a full extra maxDelay + 1min of slack)
      s"""WITH $evSql,
         |c AS (SELECT user_id, ts AS click_ts, event_id AS click_id
         |      FROM ev WHERE event_type = 'click'),
         |p AS (SELECT user_id, ts AS purchase_ts, event_id AS purchase_id
         |      FROM ev WHERE event_type = 'purchase'),
         |wm AS (SELECT least((SELECT max(epoch_us(click_ts)) FROM c),
         |                    (SELECT max(epoch_us(purchase_ts)) FROM p))
         |              - 3600000000 AS w)
         |SELECT c.user_id, click_id, purchase_id, click_ts, purchase_ts
         |FROM c LEFT JOIN p ON c.user_id = p.user_id
         | AND purchase_ts >= click_ts
         | AND purchase_ts <= click_ts + INTERVAL 5 MINUTE
         |WHERE purchase_id IS NOT NULL
         |   OR epoch_us(click_ts) <= (SELECT w - 660000000 FROM wm)
         |ORDER BY c.user_id, click_id, purchase_id""".stripMargin,
    "events_interval_full_stream" ->
      // batch mirror of the streaming FULL OUTER interval-join disk
      // path: matched rows unconditionally; click-side null rows below
      // the wm − 11min horizon (null-emission boundary wm − 5min);
      // purchase-side null rows below the same cutoff (boundary wm,
      // since candidate clicks lie within 5min at or before the
      // purchase) — both with a full extra maxDelay + 1min of slack
      s"""WITH $evSql,
         |c AS (SELECT user_id, ts AS click_ts, event_id AS click_id
         |      FROM ev WHERE event_type = 'click'),
         |p AS (SELECT user_id, ts AS purchase_ts, event_id AS purchase_id
         |      FROM ev WHERE event_type = 'purchase'),
         |wm AS (SELECT least((SELECT max(epoch_us(click_ts)) FROM c),
         |                    (SELECT max(epoch_us(purchase_ts)) FROM p))
         |              - 3600000000 AS w)
         |SELECT coalesce(c.user_id, p.user_id) AS user_id,
         |       click_id, purchase_id, click_ts, purchase_ts
         |FROM c FULL JOIN p ON c.user_id = p.user_id
         | AND purchase_ts >= click_ts
         | AND purchase_ts <= click_ts + INTERVAL 5 MINUTE
         |WHERE (purchase_id IS NOT NULL AND click_id IS NOT NULL)
         |   OR (purchase_id IS NULL AND
         |       epoch_us(click_ts) <= (SELECT w - 660000000 FROM wm))
         |   OR (click_id IS NULL AND
         |       epoch_us(purchase_ts) <= (SELECT w - 660000000 FROM wm))
         |ORDER BY user_id, click_id, purchase_id""".stripMargin,
    "events_interval_semi_stream" ->
      // batch mirror of the streaming LEFT SEMI disk path: matched
      // clicks at most once, watermark-independent (semi rows emit
      // eagerly), so the mirror is the plain semi join — no horizon
      s"""WITH $evSql,
         |c AS (SELECT user_id, ts AS click_ts, event_id AS click_id
         |      FROM ev WHERE event_type = 'click'),
         |p AS (SELECT user_id, ts AS purchase_ts, event_id AS purchase_id
         |      FROM ev WHERE event_type = 'purchase')
         |SELECT c.user_id, click_id, click_ts
         |FROM c WHERE EXISTS (SELECT 1 FROM p
         |  WHERE p.user_id = c.user_id
         |    AND purchase_ts >= click_ts
         |    AND purchase_ts <= click_ts + INTERVAL 5 MINUTE)
         |ORDER BY c.user_id, click_id""".stripMargin,
    "events_session_stream" ->
      // batch gaps-and-islands mirror of the streaming session-window
      // disk path, restricted to the same closed-session horizon
      // (session end <= max_ts - 2h - 30min, one full gap below the
      // watermark); session end = last event + gap, the
      // session_window() convention
      s"""WITH $evSql,
         |x AS (SELECT *, CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
         |        (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
         |      THEN 1 ELSE 0 END AS ns
         |      FROM ev),
         |s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id
         |        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
         |      FROM x),
         |g AS (SELECT user_id, min(ts) AS session_start,
         |        max(ts) + INTERVAL 30 MINUTE AS session_end,
         |        count(*) AS cnt,
         |        CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
         |          AS sum_value
         |      FROM s GROUP BY user_id, sid)
         |SELECT user_id, session_start, session_end, cnt, sum_value
         |FROM g
         |WHERE epoch_us(session_end) <=
         |      (SELECT max(epoch_us(ts)) - 9000000000 FROM ev)
         |ORDER BY 1, 2""".stripMargin,
    "events_sessionize" ->
      s"""WITH $evSql,
         |x AS (SELECT *, CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
         |        (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
         |      THEN 1 ELSE 0 END AS ns
         |      FROM ev),
         |s AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id
         |        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         |      FROM x)
         |SELECT user_id, session_id, count(*) AS cnt,
         |  min(ts) AS session_start, max(ts) AS session_end,
         |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
         |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_range_join" ->
      s"""WITH $evSql,
         |c AS (SELECT user_id, ts, event_id FROM ev WHERE event_type = 'click'),
         |p AS (SELECT user_id, ts, event_id FROM ev WHERE event_type = 'purchase')
         |SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
         |FROM c JOIN p ON c.user_id = p.user_id
         |  AND abs(epoch_us(c.ts) - epoch_us(p.ts)) <= 300000000
         |ORDER BY 1, 2, 3""".stripMargin,
    "events_asof_join" ->
      s"""WITH $evSql,
         |p AS (SELECT event_id, user_id, ts, value FROM ev
         |      WHERE event_type = 'purchase'),
         |c AS (SELECT user_id, ts AS click_ts, event_id AS click_id FROM ev
         |      WHERE event_type = 'click')
         |SELECT p.event_id, p.user_id, p.ts, p.value,
         |  c.click_id AS asof_click_id, c.click_ts AS asof_click_ts
         |FROM p ASOF LEFT JOIN c
         |  ON p.user_id = c.user_id AND p.ts >= c.click_ts
         |ORDER BY p.event_id""".stripMargin,
    "events_top_type_per_hour" ->
      s"""WITH $evSql,
         |hourly AS (SELECT date_trunc('hour', ts) AS hour, event_type,
         |                  count(*) AS cnt
         |           FROM ev GROUP BY 1, 2),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY hour
         |             ORDER BY cnt DESC, event_type) AS rn FROM hourly)
         |SELECT hour, event_type, cnt FROM ranked WHERE rn = 1
         |ORDER BY hour""".stripMargin,
    "events_json_extract" ->
      """SELECT event_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,
    "events_sliding_window" ->
      // each event belongs to starts {bucket5(ts), bucket5(ts) - 5min};
      // time_bucket aligns to the same 5-minute grid as Spark's window().
      s"""WITH $evSql,
         |w AS (SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
         |                     time_bucket(INTERVAL '5 minutes', ts) - INTERVAL 5 MINUTE])
         |        AS window_start,
         |      event_type, value FROM ev)
         |SELECT window_start, event_type, count(*) AS cnt,
         |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
         |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_interval_overlap" ->
      s"""WITH $evSql,
         |iv AS (SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week,
         |         CAST(min(epoch_us(ts)) AS BIGINT) AS start_us,
         |         CAST(max(epoch_us(ts)) AS BIGINT) AS end_us
         |       FROM ev WHERE user_id < 40 GROUP BY 1, 2)
         |SELECT a.user_id AS l_user_id, a.week AS l_week,
         |       b.user_id AS r_user_id, b.week AS r_week
         |FROM iv a JOIN iv b ON a.user_id < b.user_id
         |  AND a.start_us <= b.end_us AND b.start_us <= a.end_us
         |ORDER BY 1, 2, 3, 4""".stripMargin
  )
}
