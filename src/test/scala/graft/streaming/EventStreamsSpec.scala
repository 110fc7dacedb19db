package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.EventStreams._

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  /** Same ts normalization as Tables.events, applied to a staged raw
    * scan (batch or streaming): the driver's generator has shipped
    * `ts` as long nanos (nanosAsLong) and as TIMESTAMP_NTZ; downstream
    * streaming code expects a plain TIMESTAMP.
    */
  private def normalizeTs(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  test("tumblingCounts is source-agnostic: batch frame gets the same " +
       "answer as a plain groupBy") {
    val ev = graft.Tables.events(spark, sf("sf0.001"))
    val got = tumblingCounts(ev)
    val want = ev.groupBy(date_trunc("hour", col("ts")).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    assert(got.count() === want.count())
    assert(got.agg(sum("cnt")).as[Long].head() === ev.count())
  }

  test("corpusIntake on a MemoryStream gates, tags, and redacts " +
       "append-mode, identical to the batch run") {
    implicit val sq = spark.sqlContext
    val docs = Seq(
      // 32 words, uniq ~0.4, 'the'/'and' dominate → en keeper
      (1L, (("the quick brown fox and the lazy dog jump over a fence " +
            "near the old mill ") * 2).trim),
      // 8 distinct words × 5 (uniq = 0.2 passes), 'der und' dominate
      (2L, ("der und haus baum berg fluss wald tal " * 5).trim),
      (3L, "short doc"),                                    // too_short
      (4L, ("the quick brown fox and lazy dog near a mill " * 4).trim +
           " mail me u1@x.io now"))
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("doc_id", "text")
    val q = corpusIntake(df).writeStream
      .format("memory").queryName("intake_test").outputMode("append").start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT doc_id, lang_guess, drop_reason, text FROM intake_test " +
        "ORDER BY doc_id").as[(Long, String, String, String)].collect().toSeq
      // streaming answer == batch answer over the same frame
      val batch = corpusIntake(docs.toDF("doc_id", "text"))
        .select("doc_id", "lang_guess", "drop_reason", "text")
        .orderBy("doc_id").as[(Long, String, String, String)].collect().toSeq
      assert(got === batch)
      assert(got.map(r => r._1 -> r._3).toMap ===
        Map(1L -> null, 2L -> "language", 3L -> "too_short", 4L -> null))
      assert(got.find(_._1 == 4L).get._4.contains("<EMAIL>"))
    } finally q.stop()
  }

  test("sessionWindows on a MemoryStream splits at the 30-minute gap") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val df = input.toDF().toDF("ts", "user_id", "value")
    val q = sessionWindows(df).writeStream
      .format("memory").queryName("sess_test").outputMode("complete").start()
    try {
      // user 7: events at :00, :10 (one session), then :50 (new session)
      input.addData((ts(0), 7L, 1.0), (ts(10), 7L, 2.0), (ts(110), 7L, 4.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT cnt, sum_value FROM sess_test WHERE user_id = 7 " +
        "ORDER BY session_start").as[(Long, Double)].collect().toSeq
      assert(rows === Seq((2L, 3.0), (1L, 4.0)))
    } finally q.stop()
  }

  test("session_window merges a gap of EXACTLY the session timeout " +
       "(boundary pins the batch oracle's strict > condition)") {
    import org.apache.spark.sql.functions.{col, count, session_window}
    // events exactly 30:00 apart: one merged session, end = last + gap
    val df = Seq((ts(0), 7L), (ts(30), 7L)).toDF("ts", "user_id")
    val got = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(col("*")).as("cnt"))
      .select(col("cnt"), col("session_window.end").cast("long").as("end_s"))
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((2L, ts(30).getTime / 1000 + 1800)), s"got $got")
  }

  test("tumblingCounts over a real file stream (readStream.parquet) " +
       "matches the batch answer") {
    val dir = sf("sf0.001")
    val batch = graft.Tables.events(spark, dir)
    // file streams want a directory; stage the single parquet into one
    val staged = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    // raw schema carries ts as long nanos (nanosAsLong); rebuild the
    // timestamp exactly like Tables.events
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val stream = normalizeTs(spark.readStream
      .schema(raw.schema)
      .parquet(staged.toString))
    val q = tumblingCounts(stream).writeStream
      .format("memory").queryName("file_tumble").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT sum(cnt) FROM file_tumble")
        .as[Long].head()
      assert(got === batch.count())
    } finally q.stop()
  }

  test("slidingCounts on a MemoryStream: every event lands in exactly " +
       "two 10-min/5-min windows") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val q = slidingCounts(df).writeStream
      .format("memory").queryName("slide_test").outputMode("complete").start()
    try {
      input.addData((ts(7), "click", 1.0), (ts(12), "click", 2.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT window_start, cnt FROM slide_test ORDER BY window_start")
        .as[(Timestamp, Long)].collect().toSeq
      // event@:07 -> windows [:00, :05]; event@:12 -> [:05, :10]
      assert(rows === Seq((ts(0), 1L), (ts(5), 2L), (ts(10), 1L)))
      assert(rows.map(_._2).sum === 2 * 2)
    } finally q.stop()
  }

  test("dedupWithinWatermark drops re-delivered event ids inside the " +
       "watermark horizon") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val df = input.toDF().toDF("event_id", "ts", "value")
    val q = dedupWithinWatermark(df).writeStream
      .format("memory").queryName("dedup_test").outputMode("append").start()
    try {
      input.addData((1L, ts(0), 1.0), (1L, ts(1), 1.0), (2L, ts(2), 5.0))
      q.processAllAvailable()
      input.addData((1L, ts(3), 1.0)) // re-delivery, still in horizon
      q.processAllAvailable()
      val got = spark.sql("SELECT event_id FROM dedup_test ORDER BY event_id")
        .as[Long].collect().toSeq
      assert(got === Seq(1L, 2L))
    } finally q.stop()
  }

  test("enrichWithDim joins a stream against a static broadcast " +
       "dimension without state or watermark") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val df = input.toDF().toDF("user_id", "ts", "value")
    val dim = Seq((7L, "gold"), (8L, "silver")).toDF("user_id", "tier")
    val q = enrichWithDim(df, dim, "user_id").writeStream
      .format("memory").queryName("enrich_test").outputMode("append").start()
    try {
      input.addData((7L, ts(0), 1.0), (9L, ts(1), 2.0))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT user_id, tier FROM enrich_test ORDER BY user_id")
        .as[(Long, Option[String])].collect().toSeq
      assert(got === Seq((7L, Some("gold")), (9L, None)))
    } finally q.stop()
  }

  test("idempotent parquet sink: replaying a batch id overwrites its " +
       "partition instead of appending duplicates") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val df = input.toDF().toDF("event_id", "ts", "value")
    val out = java.nio.file.Files.createTempDirectory("idemp_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("idemp_ckpt").toString
    val q = startIdempotentParquetSink(df, out, ckpt)
    try {
      input.addData((1L, ts(0), 1.0), (2L, ts(1), 2.0))
      q.processAllAvailable()
      input.addData((3L, ts(2), 3.0))
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() === 3)
      // simulate at-least-once redelivery: replay batch 0 with the
      // same rows — the partition is overwritten, not appended
      writeBatch(out)(
        Seq((1L, ts(0), 1.0), (2L, ts(1), 2.0))
          .toDF("event_id", "ts", "value"), 0L)
      assert(spark.read.parquet(out).count() === 3)
    } finally q.stop()
  }

  test("startUpsertTotalsSink maintains a parquet serving table of " +
       "per-user totals across micro-batches (update-mode MERGE)") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val df = input.toDF().toDF("user_id", "ts", "value")
    val table = java.nio.file.Files.createTempDirectory("upsert_tbl")
      .resolve("t").toString
    val ckpt = java.nio.file.Files.createTempDirectory("upsert_ckpt").toString
    val q = startUpsertTotalsSink(df, table, ckpt)
    try {
      input.addData((7L, ts(0), 1.0), (7L, ts(1), 2.0), (8L, ts(2), 5.0))
      q.processAllAvailable()
      val first = spark.read.parquet(table)
        .as[(Long, Long, Double)].collect().toSet
      assert(first === Set((7L, 2L, 3.0), (8L, 1L, 5.0)))
      // second trigger updates user 7, leaves 8 untouched, inserts 9
      input.addData((7L, ts(3), 4.0), (9L, ts(4), 0.5))
      q.processAllAvailable()
      val second = spark.read.parquet(table)
        .as[(Long, Long, Double)].collect().toSet
      assert(second === Set((7L, 3L, 7.0), (8L, 1L, 5.0), (9L, 1L, 0.5)))
    } finally q.stop()
  }

  test("intervalJoin pairs purchases with same-user clicks within the " +
       "delay bound on two MemoryStreams") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    val cdf = clicks.toDF().toDF("user_id", "ts", "event_id")
    val pdf = purchases.toDF().toDF("user_id", "ts", "event_id")
    val q = intervalJoin(cdf, pdf).writeStream
      .format("memory").queryName("ij_test").outputMode("append").start()
    try {
      // user 1: click@:00 → purchase@:03 matches (≤5m), purchase@:09
      //   does not; user 2's purchase@:03 must not match user 1's click.
      clicks.addData((1L, ts(0), 100L))
      purchases.addData((1L, ts(3), 200L), (1L, ts(9), 201L),
                        (2L, ts(3), 202L))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT click_id, purchase_id FROM ij_test ORDER BY purchase_id")
        .as[(Long, Long)].collect().toSeq
      assert(got === Seq((100L, 200L)))
    } finally q.stop()
  }

  test("intervalJoinLeftOuter emits unmatched clicks with null purchase " +
       "once the watermark passes the delay bound") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    val cdf = clicks.toDF().toDF("user_id", "ts", "event_id")
    val pdf = purchases.toDF().toDF("user_id", "ts", "event_id")
    val q = intervalJoinLeftOuter(cdf, pdf).writeStream
      .format("memory").queryName("loj_test").outputMode("append").start()
    try {
      // user 1 clicks and purchases in-bound; user 2 clicks, never buys
      clicks.addData((1L, ts(0), 100L), (2L, ts(0), 101L))
      purchases.addData((1L, ts(3), 200L))
      q.processAllAvailable()
      // advance both watermarks far past click_ts + 5m + 1h horizon so
      // the unmatched click is provably final and the null row emits
      clicks.addData((9L, ts(600), 900L))
      purchases.addData((9L, ts(600), 901L))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT click_id, purchase_id FROM loj_test WHERE user_id <= 2 " +
        "ORDER BY click_id")
        .as[(Long, Option[Long])].collect().toSeq
      assert(got === Seq((100L, Some(200L)), (101L, None)))
    } finally q.stop()
  }

  test("intervalJoinFullOuter emits unmatched rows from BOTH sides " +
       "once watermarks finalize them") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    val cdf = clicks.toDF().toDF("user_id", "ts", "event_id")
    val pdf = purchases.toDF().toDF("user_id", "ts", "event_id")
    val q = EventStreams.intervalJoinFullOuter(cdf, pdf).writeStream
      .format("memory").queryName("foj_test").outputMode("append").start()
    try {
      // user 1 matches; user 2 clicks and never buys; user 3 buys with
      // no click — the reconciliation must surface all three
      clicks.addData((1L, ts(0), 100L), (2L, ts(0), 101L))
      purchases.addData((1L, ts(3), 200L), (3L, ts(2), 201L))
      q.processAllAvailable()
      clicks.addData((9L, ts(600), 900L))
      purchases.addData((9L, ts(600), 901L))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT user_id, click_id, purchase_id FROM foj_test " +
        "WHERE user_id <= 3 ORDER BY user_id")
        .as[(Long, Option[Long], Option[Long])].collect().toSeq
      assert(got === Seq((1L, Some(100L), Some(200L)),
        (2L, Some(101L), None), (3L, None, Some(201L))))
    } finally q.stop()
  }

  test("intervalJoinLeftSemi emits a matched click exactly once even " +
       "with multiple matching purchases, and drops unmatched clicks") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    val cdf = clicks.toDF().toDF("user_id", "ts", "event_id")
    val pdf = purchases.toDF().toDF("user_id", "ts", "event_id")
    val q = EventStreams.intervalJoinLeftSemi(cdf, pdf).writeStream
      .format("memory").queryName("lsj_test").outputMode("append").start()
    try {
      // user 1's click has TWO in-bound purchases (inner join would
      // fan out to 2 rows — semi must emit 1); user 2 clicks and never
      // buys; user 3's purchase is out of the 5-minute bound
      clicks.addData((1L, ts(0), 100L), (2L, ts(0), 101L),
                     (3L, ts(0), 102L))
      purchases.addData((1L, ts(2), 200L), (1L, ts(3), 201L),
                        (3L, ts(9), 202L))
      q.processAllAvailable()
      // advance watermarks so any pending outer-ish state finalizes —
      // semi rows for unmatched clicks must STILL never appear
      clicks.addData((9L, ts(600), 900L))
      purchases.addData((9L, ts(600), 901L))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT user_id, click_id FROM lsj_test WHERE user_id <= 3 " +
        "ORDER BY user_id")
        .as[(Long, Long)].collect().toSeq
      assert(got === Seq((1L, 100L)))
      // state is bounded: the watermark chain is present in progress
      val p = q.lastProgress
      assert(p.stateOperators.nonEmpty &&
        p.stateOperators.head.numRowsTotal >= 0)
    } finally q.stop()
  }

  test("dedupedConvertedClicks: a replayed click id cannot double-emit " +
       "through the dedup + semi-join composition") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    val cdf = clicks.toDF().toDF("user_id", "ts", "event_id")
    val pdf = purchases.toDF().toDF("user_id", "ts", "event_id")
    val q = EventStreams.dedupedConvertedClicks(cdf, pdf).writeStream
      .format("memory").queryName("dcc_test").outputMode("append").start()
    try {
      // click 100 delivered twice (at-least-once replay) + two
      // matching purchases: naive inner join over the raw stream
      // would emit up to 4 rows; the composition must emit exactly 1
      clicks.addData((1L, ts(0), 100L), (1L, ts(0), 100L))
      purchases.addData((1L, ts(2), 200L), (1L, ts(3), 201L))
      q.processAllAvailable()
      clicks.addData((9L, ts(600), 900L))
      purchases.addData((9L, ts(600), 901L))
      q.processAllAvailable()
      // one more batch AFTER the watermark has advanced past
      // minute 0 + horizon: state eviction runs at batch end, so the
      // dedup map must now DROP the minute-0 click ids (this is the
      // dropDuplicatesWithinWatermark guarantee; plain dropDuplicates
      // would hold them forever)
      clicks.addData((9L, ts(610), 902L))
      purchases.addData((9L, ts(610), 903L))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT user_id, click_id FROM dcc_test WHERE user_id = 1")
        .as[(Long, Long)].collect().toSeq
      assert(got === Seq((1L, 100L)))
      // two stateful operators share the chain: dedup + join
      assert(q.lastProgress.stateOperators.length >= 2)
      val removed = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
        .filter(_.operatorName.toLowerCase.contains("dedup"))
        .map(_.numRowsRemoved).sum
      assert(removed >= 1,
        s"dedup state must be watermark-evicted; progress: ${q.lastProgress}")
    } finally q.stop()
  }

  test("dedupedConvertedClicks streaming == batch: the same composition " +
       "run source-agnostically over static frames gives identical rows") {
    implicit val sq = spark.sqlContext
    // duplicated click, fanout purchases, one never-converting click,
    // one out-of-bound purchase — every edge the composition handles
    val clickRows = Seq((1L, ts(0), 100L), (1L, ts(0), 100L),
      (2L, ts(0), 101L), (3L, ts(0), 102L), (9L, ts(600), 900L))
    val purchRows = Seq((1L, ts(2), 200L), (1L, ts(3), 201L),
      (3L, ts(9), 202L), (9L, ts(600), 901L))
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    val q = EventStreams.dedupedConvertedClicks(
        clicks.toDF().toDF("user_id", "ts", "event_id"),
        purchases.toDF().toDF("user_id", "ts", "event_id")).writeStream
      .format("memory").queryName("dcc_eq_test").outputMode("append").start()
    try {
      clicks.addData(clickRows: _*); purchases.addData(purchRows: _*)
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT user_id, click_id, click_ts FROM dcc_eq_test")
        .as[(Long, Long, Timestamp)].collect().toSeq.sorted
      val batch = EventStreams.dedupedConvertedClicks(
          clickRows.toDF("user_id", "ts", "event_id"),
          purchRows.toDF("user_id", "ts", "event_id"))
        .as[(Long, Long, Timestamp)].collect().toSeq.sorted
      assert(got === batch)
      assert(got.map(r => (r._1, r._2)) === Seq((1L, 100L), (9L, 900L)))
    } finally q.stop()
  }

  test("late events beyond the watermark are DROPPED and the drop is " +
       "observable in the query's state-operator metrics") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.tumblingCounts(df).writeStream
      .format("memory").queryName("late_test").outputMode("update").start()
    try {
      // watermark = max(ts) - 2h; an event 3h older than the max is late
      input.addData((ts(300), "click", 1.0))
      q.processAllAvailable()
      input.addData((ts(60), "click", 1.0)) // 4h behind → beyond watermark
      q.processAllAvailable()
      val dropped = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
        .map(_.numRowsDroppedByWatermark).sum
      assert(dropped >= 1,
        s"late row must be dropped AND counted; progress: ${q.lastProgress}")
      // and it must not have contaminated the aggregate
      val hours = spark.sql(
        "SELECT window_start FROM late_test").as[Timestamp].collect().toSet
      assert(!hours.contains(Timestamp.valueOf("2024-01-01 01:00:00")),
        "the late event's window must not appear")
    } finally q.stop()
  }

  test("streamingHeavyHitters keeps bounded MG state per shard and its " +
       "emissions cover every frequent word across triggers") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[String]
    val q = EventStreams.streamingHeavyHitters(input.toDS(), capacity = 4,
        shards = 2)
      .toDF("word", "mincount")
      .writeStream.format("memory").queryName("shh_test")
      .outputMode("update").start()
    try {
      // skewed stream: "hot" dominates both batches among noise words
      input.addData(Seq.fill(30)("hot") ++ (1 to 10).map(i => s"w$i"): _*)
      q.processAllAvailable()
      input.addData(Seq.fill(25)("hot") ++ Seq.fill(20)("warm") ++
        (11 to 18).map(i => s"w$i"): _*)
      q.processAllAvailable()
      // the LAST emission per word reflects the final sketch state;
      // both heavy words must have survived with mincount <= true count
      val last = spark.sql(
        "SELECT word, max(mincount) FROM shh_test GROUP BY word")
        .as[(String, Long)].collect().toMap
      assert(last.contains("hot") && last("hot") <= 55 && last("hot") > 30,
        s"hot undercount bound violated: ${last.get("hot")}")
      assert(last.contains("warm"), "warm must survive the sketch")
    } finally q.stop()
  }

  test("streamingQuantiles keeps one bounded t-digest per key and its " +
       "running p50/p95 track the values seen so far") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val q = EventStreams.streamingQuantiles(input.toDS(), compression = 100)
      .toDF("key", "n", "p50", "p95")
      .writeStream.format("memory").queryName("sq_test")
      .outputMode("update").start()
    try {
      val rnd = new scala.util.Random(9)
      val batch1 = Array.fill(2000)(rnd.nextDouble() * 100)
      input.addData(batch1.map(("lat", _)).toSeq: _*)
      q.processAllAvailable()
      val batch2 = Array.fill(2000)(rnd.nextDouble() * 100 + 50) // shifted
      input.addData(batch2.map(("lat", _)).toSeq: _*)
      input.addData(("other", 1.0), ("other", 2.0), ("other", 3.0))
      q.processAllAvailable()
      val rows = spark.sql(
        """SELECT key, n, p50, p95 FROM sq_test
          |WHERE n = (SELECT max(n) FROM sq_test s2
          |           WHERE s2.key = sq_test.key)""".stripMargin)
        .as[(String, Long, Double, Double)].collect()
        .map(r => r._1 -> r).toMap
      // state accumulated ACROSS triggers: n covers both batches
      assert(rows("lat")._2 === 4000L)
      val all = (batch1 ++ batch2).sorted
      def rankOf(v: Double) = all.count(_ <= v).toDouble / all.length
      assert(math.abs(rankOf(rows("lat")._3) - 0.5) <= 0.02,
        s"p50 drifted: ${rows("lat")._3}")
      assert(math.abs(rankOf(rows("lat")._4) - 0.95) <= 0.02,
        s"p95 drifted: ${rows("lat")._4}")
      // tiny key: exact
      assert(rows("other")._2 === 3L && rows("other")._3 === 2.0)
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the backlog in rate-limited " +
       "micro-batches and then stops on its own") {
    // the production catch-up pattern: process everything currently in
    // the source (respecting maxFilesPerTrigger back-pressure), then
    // terminate — batch economics with streaming exactly-once.
    val dir = sf("sf0.001")
    val staged = java.nio.file.Files.createTempDirectory("avnow")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val stream = normalizeTs(spark.readStream.schema(raw.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged.toString))
    val q = EventStreams.tumblingCounts(stream).writeStream
      .format("memory").queryName("avnow_test").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      // terminates WITHOUT stop(): AvailableNow ends after the drain
      assert(q.awaitTermination(120000), "query did not self-terminate")
      val got = spark.sql("SELECT sum(cnt) FROM avnow_test").as[Long].head()
      assert(got === graft.Tables.events(spark, dir).count())
    } finally if (q.isActive) q.stop()
  }

  test("checkpointed restart resumes from recorded offsets — already-" +
       "committed files are not reprocessed") {
    // the operational contract that makes streaming restartable: the
    // checkpoint records which source files are committed, so a new
    // run with the SAME checkpoint picks up only the backlog. A
    // reprocessing bug triples the count here; a lost-offset bug
    // halves it.
    val dir = sf("sf0.001")
    val staged = java.nio.file.Files.createTempDirectory("ckpt_src")
    val sink = java.nio.file.Files.createTempDirectory("ckpt_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt_meta").toString
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val n = raw.count()
    def drain(): Unit = {
      val stream = normalizeTs(spark.readStream.schema(raw.schema)
        .parquet(staged.toString))
      val q = stream.writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "query did not self-terminate")
    }
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("batch1.parquet"))
    drain()
    assert(spark.read.parquet(sink).count() === n)
    // backlog lands while the query is DOWN; restart must process
    // exactly the new file
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("batch2.parquet"))
    drain()
    assert(spark.read.parquet(sink).count() === 2 * n,
      "restart must process only the backlog: 3n = batch1 reprocessed, " +
        "n = offsets lost")
  }

  test("transformWithState (state v2, RocksDB) accumulates per-user " +
       "running totals across micro-batches") {
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event]
    val q = EventStreams.runningTotals(input.toDS())
      .writeStream.format("memory").queryName("tws_test")
      .outputMode("update").start()
    try {
      input.addData(Event(1L, ts(0), 2.0), Event(1L, ts(1), 3.0),
        Event(2L, ts(0), 7.0))
      q.processAllAvailable()
      input.addData(Event(1L, ts(2), 5.0))
      q.processAllAvailable()
      // last update per user reflects the cumulative state
      val got = spark.sql(
        "SELECT user_id, max(n), max(sum_value) FROM tws_test GROUP BY 1")
        .as[(Long, Long, Double)].collect().toSet
      assert(got === Set((1L, 3L, 10.0), (2L, 1L, 7.0)))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("sessionizeStateful (flatMapGroupsWithState) closes a session " +
       "when the in-batch gap exceeds 30 minutes") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    val q = sessionizeStateful(
        input.toDS().withWatermark("ts", "2 hours"))
      .writeStream.format("memory").queryName("stateful_sess")
      .outputMode("append").start()
    try {
      input.addData(
        Event(9L, ts(0), 1.0), Event(9L, ts(5), 2.0), // session 1
        Event(9L, ts(120), 7.0))                      // opens session 2
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT cnt, sum_value FROM stateful_sess WHERE user_id = 9")
        .as[(Long, Double)].collect().toSeq
      assert(rows === Seq((2L, 3.0))) // first session closed; second open
    } finally q.stop()
  }
}
