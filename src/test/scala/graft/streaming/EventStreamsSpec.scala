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
    val stream = spark.readStream
      .schema(raw.schema)
      .parquet(staged.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val q = tumblingCounts(stream).writeStream
      .format("memory").queryName("file_tumble").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT sum(cnt) FROM file_tumble")
        .as[Long].head()
      assert(got === batch.count())
    } finally q.stop()
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
