package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.SparkSpec

/** JSONL source surface (the north-star formats are CSV/JSON/parquet):
  * explicit schemas — never inference, same rule as the CSV sources —
  * plus PERMISSIVE corrupt-record capture so one bad line quarantines
  * instead of failing a 100 TB ingest job.
  */
class JsonSourceSpec extends SparkSpec {
  import spark.implicits._

  test("explicit-schema JSONL reads, quarantines corrupt lines, and " +
       "round-trips through the JSON sink") {
    val dir = Files.createTempDirectory("jsonl_src")
    Files.write(dir.resolve("part-0.jsonl"), java.util.Arrays.asList(
      """{"event_id": 1, "event_type": "click", "value": 1.5}""",
      """{"event_id": 2, "event_type": "view", "value": 2.25}""",
      """{"event_id": 3, "event_type": "purchase", "value": """, // truncated
      """{"event_id": 4, "event_type": "error", "value": 0.5}"""))

    val schema = StructType.fromDDL(
      "event_id BIGINT, event_type STRING, value DOUBLE, " +
        "_corrupt_record STRING")
    val read = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString)
      .cache() // corrupt-record column requires the full row materialized

    assert(read.count() === 4)
    val bad = read.where(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").as[String].collect().toSeq
    assert(bad.size === 1 && bad.head.contains("\"event_id\": 3"))
    val good = read.where(col("_corrupt_record").isNull)
      .select("event_id", "event_type", "value")
      .orderBy("event_id").as[(Long, String, Double)].collect().toSeq
    assert(good === Seq((1L, "click", 1.5), (2L, "view", 2.25),
                        (4L, "error", 0.5)))

    // sink roundtrip: write good rows as JSONL, read back identically
    val out = Files.createTempDirectory("jsonl_sink").toString + "/out"
    read.where(col("_corrupt_record").isNull)
      .select("event_id", "event_type", "value")
      .write.json(out)
    val back = spark.read
      .schema(StructType.fromDDL(
        "event_id BIGINT, event_type STRING, value DOUBLE"))
      .json(out)
      .orderBy("event_id").as[(Long, String, Double)].collect().toSeq
    assert(back === good)
    read.unpersist()
  }
}
