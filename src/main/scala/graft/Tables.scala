package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver testdata layout
  * (`TESTDATA.md`: one parquet per table under the sf dir).
  *
  * All reads go through here so scan-level concerns (nanosecond
  * timestamp handling, future bucketing/partitioning hints) live in
  * one place.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` timestamp handling. The driver's generator has
    * shipped `ts` as TIMESTAMP(NANOS) (which vanilla Spark 4 rejects —
    * read as long nanos and rebuild) and as plain timestamp[us] with
    * isAdjustedToUTC=false (which Spark reads as TIMESTAMP_NTZ — cast
    * to TIMESTAMP so `unix_micros`/instant arithmetic resolves; the
    * session time zone is pinned to UTC everywhere, so the cast keeps
    * the same instant). All downstream code sees one type: TIMESTAMP.
    */
  private val eventsLock = new Object
  def events(spark: SparkSession, dir: String): DataFrame = eventsLock.synchronized {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // Left set for the session: it only affects TIMESTAMP(NANOS)
    // columns, and restoring it would break the lazy plan's later
    // (re-)analysis of this scan.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        // NB: integer division (`div`), not `/` — Long `/` promotes to
        // double, which cannot represent 2024-epoch nanos exactly.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
}
