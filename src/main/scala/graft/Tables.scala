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

  /** `events.parquet` carries TIMESTAMP(NANOS) which vanilla Spark 4
    * rejects; read it as long nanos and rebuild a microsecond
    * timestamp (DuckDB likewise truncates ns->us on read, so the two
    * engines agree).
    */
  private val eventsLock = new Object
  def events(spark: SparkSession, dir: String): DataFrame = eventsLock.synchronized {
    import org.apache.spark.sql.functions._
    // Left set for the session: it only affects TIMESTAMP(NANOS)
    // columns, and restoring it would break the lazy plan's later
    // (re-)analysis of this scan.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // NB: integer division (`div`), not `/` — Long `/` promotes to
      // double, which cannot represent 2024-epoch nanos exactly.
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
}
